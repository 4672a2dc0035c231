"""Training launcher.

Replaces reference training/train.py:28-296: no per-GPU process spawning — one
process per host, `jax.distributed.initialize` for multi-host, one mesh over all
chips. Config comes from a YAML (model + scratch/trainer sections mirroring the
reference's, e.g. sam2/configs/GFTE_3.yaml) or CLI defaults; a resolved-config
snapshot is persisted to the experiment dir (reference train.py:142-153).

Usage:
  python -m us_video_medsam2_tpu.apps.train --data_dir data/train_npz \
      --out_dir work_dir/exp1 [--init_ckpt sam2.1_hiera_tiny.pt] \
      [--num_frames 4] [--epochs 100] [--temporal_loss consistency]
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--cfg", default="sam2.1_hiera_t512")
    ap.add_argument("--init_ckpt", default=None, help="SAM2.1/MedSAM2 .pt or native ckpt")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--num_frames", type=int, default=4)
    ap.add_argument("--max_num_objects", type=int, default=5)
    ap.add_argument("--batch_size", type=int, default=1, help="videos per device")
    ap.add_argument("--base_lr", type=float, default=5e-5)
    ap.add_argument("--vision_lr", type=float, default=3e-5)
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--temporal_loss", default="none",
                    choices=["none", "consistency", "graph", "spectral"])
    ap.add_argument("--temporal_loss_weight", type=float, default=0.5)
    ap.add_argument("--temporal_fusion", default="none",
                    choices=["none", "tce", "gfte", "atsf", "gp"])
    ap.add_argument("--curriculum", default="quantum",
                    choices=["none", "quantum", "aes", "neurospectral"])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp

    from us_video_medsam2_tpu.core.build import load_params, resolve_config
    from us_video_medsam2_tpu.core.config import TemporalFusionConfig, snapshot_config
    from us_video_medsam2_tpu.models.sam2 import SAM2Model
    from us_video_medsam2_tpu.parallel.mesh import maybe_initialize_distributed
    from us_video_medsam2_tpu.training.data import (
        AESCurriculumNPZRawDataset,
        NeuroSpectralNPZRawDataset,
        NPZRawDataset,
        QuantumNPZRawDataset,
        RandomUniformSampler,
        TrainMixedVideoLoader,
        VOSDataset,
        default_train_transforms,
    )
    from us_video_medsam2_tpu.training.losses import LossConfig
    from us_video_medsam2_tpu.training.optimizer import OptimConfig
    from us_video_medsam2_tpu.training.train_model import TrainSimConfig
    from us_video_medsam2_tpu.training.train_step import TrainConfig
    from us_video_medsam2_tpu.training.trainer import Trainer, TrainerConfig

    maybe_initialize_distributed()

    cfg = resolve_config(args.cfg)
    if args.resolution != cfg.image_size:
        # keep the memory-attention RoPE grid in lockstep with the feature
        # map (the reference recomputes freqs when the feat size changes,
        # sam2/modeling/sam/transformer.py:330-333; ours are config-sized)
        feat = args.resolution // cfg.backbone_stride
        cfg = dataclasses.replace(
            cfg,
            image_size=args.resolution,
            memory_attention=dataclasses.replace(
                cfg.memory_attention, rope_feat_sizes=(feat, feat)
            ),
        )
    if args.temporal_fusion != "none":
        cfg = dataclasses.replace(
            cfg,
            temporal_fusion=TemporalFusionConfig(
                variant=args.temporal_fusion, channels=cfg.hidden_dim
            ),
        )
    model = SAM2Model(cfg, dtype=jnp.bfloat16)
    params = load_params(model, cfg, args.init_ckpt, strict=False)

    raw_cls = {
        "none": NPZRawDataset,
        "quantum": QuantumNPZRawDataset,
        "aes": AESCurriculumNPZRawDataset,
        "neurospectral": NeuroSpectralNPZRawDataset,
    }[args.curriculum]
    raw = raw_cls(args.data_dir)
    dataset = VOSDataset(
        raw,
        RandomUniformSampler(args.num_frames, args.max_num_objects),
        transforms=default_train_transforms(cfg.image_size),
        max_num_objects=args.max_num_objects,
    )
    n_dev = jax.device_count()
    loader = TrainMixedVideoLoader(
        [dataset],
        [args.batch_size * jax.local_device_count()],
        max_num_objects=args.max_num_objects,
        seed=args.seed,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )

    steps_per_epoch = max(len(loader), 1)
    train_cfg = TrainConfig(
        sim=TrainSimConfig(),
        loss=LossConfig(
            weight_temporal=args.temporal_loss_weight if args.temporal_loss != "none" else 0.0,
            temporal_variant=args.temporal_loss if args.temporal_loss != "none" else "consistency",
        ),
        optim=OptimConfig(
            base_lr=args.base_lr,
            vision_lr=args.vision_lr,
            total_steps=steps_per_epoch * args.epochs,
        ),
    )
    trainer_cfg = TrainerConfig(
        max_epochs=args.epochs, save_dir=args.out_dir, seed=args.seed
    )
    os.makedirs(args.out_dir, exist_ok=True)
    snapshot_config(cfg, os.path.join(args.out_dir, "config_resolved.json"))
    snapshot_config(train_cfg, os.path.join(args.out_dir, "train_config_resolved.json"))

    trainer = Trainer(model, params, train_cfg, trainer_cfg, loader)
    best = trainer.run()
    print(f"training done; best {trainer_cfg.best_meter_key}={best:.4f}")


if __name__ == "__main__":
    main()
