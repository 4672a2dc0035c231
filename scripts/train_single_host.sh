#!/usr/bin/env bash
# Single-host TPU fine-tune (reference single_node_train_medsam2.sh equivalent).
# All chips on the host form one data-parallel mesh automatically.
set -euo pipefail
DATA_DIR=${1:?usage: train_single_host.sh DATA_DIR OUT_DIR [INIT_CKPT]}
OUT_DIR=${2:?}
INIT_CKPT=${3:-}
ARGS=(--data_dir "$DATA_DIR" --out_dir "$OUT_DIR" --epochs 100 --num_frames 4 \
      --max_num_objects 5 --curriculum quantum --temporal_loss consistency)
[ -n "$INIT_CKPT" ] && ARGS+=(--init_ckpt "$INIT_CKPT")
python -m us_video_medsam2_tpu.apps.train "${ARGS[@]}"
