#!/usr/bin/env bash
# Multi-host TPU pod training (reference multi_node_train.sh equivalent).
# Run this same script on every host of the pod slice; jax.distributed picks up
# the topology from the TPU runtime (or set JAX_COORDINATOR_ADDRESS/NUM_PROCESSES
# PROCESS_ID manually for CPU/GPU clusters).
set -euo pipefail
DATA_DIR=${1:?usage: train_multi_host.sh DATA_DIR OUT_DIR [INIT_CKPT]}
OUT_DIR=${2:?}
INIT_CKPT=${3:-}
ARGS=(--data_dir "$DATA_DIR" --out_dir "$OUT_DIR" --epochs 100 --num_frames 4 \
      --max_num_objects 5 --curriculum quantum --temporal_loss consistency)
[ -n "$INIT_CKPT" ] && ARGS+=(--init_ckpt "$INIT_CKPT")
python -m us_video_medsam2_tpu.apps.train "${ARGS[@]}"
