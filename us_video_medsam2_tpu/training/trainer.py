"""Training loop: epochs, meters, logging, checkpoints, resume, best-ckpt tracking.

Re-provides reference training/trainer.py:141-1106 TPU-natively:
- components built from typed configs instead of Hydra instantiate
- DDP wrap -> sharded-batch jit step (parallel/mesh.py); AMP autocast -> bf16
  compute dtype in the model; GradScaler is unnecessary with bf16 (no inf scaling)
- NaN-loss guard (trainer.py:865-871), gradient clipping inside the optimizer,
- per-epoch curriculum stage propagation (trainer.py:704-716),
- rank-0 JSON stats (train_stats.json / best_stats.json, trainer.py:536-560),
  optional TensorBoard, atomic checkpoints + auto-resume.
"""

from __future__ import annotations

import json
import logging
import os
import signal
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from us_video_medsam2_tpu.core import checkpoint as ckpt_lib
from us_video_medsam2_tpu.models.sam2 import SAM2Model
from us_video_medsam2_tpu.parallel.mesh import (
    create_mesh,
    replicate_pytree,
    shard_pytree_batch,
)
from us_video_medsam2_tpu.training.data import TrainMixedVideoLoader
from us_video_medsam2_tpu.training.train_step import (
    TrainBatch,
    TrainConfig,
    TrainState,
    create_train_state,
    make_train_step,
)
from us_video_medsam2_tpu.utils.metrics import AverageMeter, DurationMeter, MemMeter


@dataclass
class TrainerConfig:
    max_epochs: int = 100
    save_dir: str = "work_dir"
    save_freq: int = 10
    save_epochs: List[int] = field(default_factory=list)  # extra named ckpts
    log_freq: int = 10
    seed: int = 0
    val_epoch_freq: int = 1
    best_meter_key: str = "core_loss"  # lower is better
    skip_saving_parameters: List[str] = field(default_factory=list)
    # 'npz' (single file, host-gathered) or 'orbax' (directory, sharding-aware
    # StandardCheckpointer — for very large params/optimizer states)
    checkpoint_backend: str = "npz"
    # checkpoint-and-exit on these signals (preemption handling: the reference
    # relies on submitit's Checkpointable requeue, training/train.py:65-111;
    # here the sbatch script requeues and this trainer guarantees a fresh
    # checkpoint exists to auto-resume from)
    checkpoint_signals: tuple = (signal.SIGTERM, signal.SIGUSR1)


class Trainer:
    def __init__(
        self,
        model: SAM2Model,
        params,
        train_cfg: TrainConfig,
        trainer_cfg: TrainerConfig,
        train_loader: TrainMixedVideoLoader,
        val_loader: Optional[TrainMixedVideoLoader] = None,
    ):
        self.model = model
        self.cfg = trainer_cfg
        self.train_cfg = train_cfg
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.mesh = create_mesh(("data",))
        self.state: TrainState = replicate_pytree(
            create_train_state(model, params, train_cfg), self.mesh
        )
        self.step_fn = make_train_step(model, train_cfg)
        self.epoch = 0
        self.best = float("inf")
        self.time_meter = DurationMeter()
        self.mem_meter = MemMeter()
        os.makedirs(self.cfg.save_dir, exist_ok=True)
        self.tb = self._make_tb_writer()
        self._maybe_resume()
        self._preempted = False
        for sig in self.cfg.checkpoint_signals:
            try:
                signal.signal(sig, self._on_preempt_signal)
            except ValueError:  # not on the main thread (e.g. inside a test runner)
                pass

    def _on_preempt_signal(self, signum, frame):
        logging.warning("received signal %d: will checkpoint and exit", signum)
        self._preempted = True

    def _make_tb_writer(self):
        """rank-0 TensorBoard writer (reference training/utils/logger.py:27-150)."""
        try:
            import jax

            if jax.process_index() != 0:
                return None
            from torch.utils.tensorboard import SummaryWriter

            return SummaryWriter(
                log_dir=os.path.join(self.cfg.save_dir, "tensorboard"), flush_secs=120
            )
        except Exception:  # noqa: BLE001
            return None

    # ----------------------------------------------------------- persistence
    def _ckpt_state(self):
        return {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
            "epoch": np.asarray(self.epoch),
            "best": np.asarray(self.best),
        }

    def save_checkpoint(self, name="checkpoint"):
        path = os.path.join(self.cfg.save_dir, name)
        skip = [f"params/{p}" for p in self.cfg.skip_saving_parameters]
        ckpt_lib.save_checkpoint_any(
            path, self._ckpt_state(), skip_patterns=skip,
            backend=self.cfg.checkpoint_backend,
        )
        logging.info("saved checkpoint %s (%s)", path, self.cfg.checkpoint_backend)

    def _maybe_resume(self):
        resume = ckpt_lib.get_resume_checkpoint(self.cfg.save_dir)
        if resume is None:
            return
        from flax import serialization

        loaded = ckpt_lib.restore_checkpoint_any(resume)
        # restore into the live structure (optax namedtuple states etc.)
        template = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }
        restored = serialization.from_state_dict(
            template,
            {k: loaded[k] for k in ("params", "opt_state", "step")},
        )
        self.state = TrainState(
            params=jax.tree.map(jnp.asarray, restored["params"]),
            opt_state=jax.tree.map(jnp.asarray, restored["opt_state"]),
            step=jnp.asarray(restored["step"]),
        )
        self.state = replicate_pytree(self.state, self.mesh)
        self.epoch = int(loaded.get("epoch", 0))
        self.best = float(loaded.get("best", float("inf")))
        logging.info("resumed from %s at epoch %d", resume, self.epoch)

    # ------------------------------------------------------------------ loops
    def _to_device(self, batch: Dict) -> TrainBatch:
        return TrainBatch(
            images=shard_pytree_batch(jnp.asarray(batch["images"]), self.mesh, axis=1),
            masks=shard_pytree_batch(jnp.asarray(batch["masks"]), self.mesh, axis=1),
            obj_valid=shard_pytree_batch(
                jnp.asarray(batch["obj_valid"]), self.mesh, axis=0
            ),
        )

    LOSS_KEYS = (
        "core_loss", "loss_mask", "loss_dice", "loss_iou", "loss_class",
        "loss_temporal", "grad_norm",
    )

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        meters: Dict[str, AverageMeter] = {}
        data_time = AverageMeter("data_time")
        batch_time = AverageMeter("batch_time")
        rng = jax.random.PRNGKey(self.cfg.seed * 100003 + epoch)
        t_last = time.monotonic()
        for it, batch in enumerate(self.train_loader.get_loader(epoch)):
            data_time.update(time.monotonic() - t_last)
            rng, step_rng = jax.random.split(rng)
            self.state, metrics = self.step_fn(
                self.state, self._to_device(batch), step_rng
            )
            core = float(metrics["core_loss"])
            if not np.isfinite(core):
                raise FloatingPointError(
                    f"loss is {core} at epoch {epoch} iter {it}"
                )  # NaN guard (reference trainer.py:865-871)
            for k in self.LOSS_KEYS:
                if k in metrics:
                    meters.setdefault(k, AverageMeter(k)).update(float(metrics[k]))
            if self.tb is not None and it % self.cfg.log_freq == 0:
                step = int(self.state.step)
                self.tb.add_scalar("Losses/train_all_loss", core, step)
                for k in ("loss_mask", "loss_dice", "loss_iou", "loss_class", "loss_temporal"):
                    if k in metrics:
                        self.tb.add_scalar(f"Losses/{k}", float(metrics[k]), step)
            batch_time.update(time.monotonic() - t_last)
            t_last = time.monotonic()
            self.mem_meter.update()
            if it % self.cfg.log_freq == 0:
                logging.info(
                    "epoch %d it %d | loss %.4f | %s | %s | peak %.2f GiB",
                    epoch,
                    it,
                    core,
                    batch_time,
                    data_time,
                    self.mem_meter.peak_gib,
                )
            if self._preempted:
                self.save_checkpoint()
                logging.warning(
                    "preemption checkpoint at epoch %d iter %d; exiting", epoch, it
                )
                raise SystemExit(0)
        return {k: m.avg for k, m in meters.items()}

    def val_epoch(self, epoch: int) -> Dict[str, float]:
        if self.val_loader is None:
            return {}
        from us_video_medsam2_tpu.training.train_step import make_eval_step

        if not hasattr(self, "_eval_step"):
            self._eval_step = make_eval_step(self.model, self.train_cfg)
        meter = AverageMeter("val_core_loss")
        rng = jax.random.PRNGKey(7777 + epoch)
        for batch in self.val_loader.get_loader(epoch):
            rng, step_rng = jax.random.split(rng)
            losses = self._eval_step(self.state.params, self._to_device(batch), step_rng)
            meter.update(float(losses["core_loss"]))
        logging.info("epoch %d val loss %.4f", epoch, meter.avg)
        return {"val_core_loss": meter.avg}

    def run(self):
        stats_path = os.path.join(self.cfg.save_dir, "train_stats.json")
        best_path = os.path.join(self.cfg.save_dir, "best_stats.json")
        start_epoch = self.epoch
        while self.epoch < self.cfg.max_epochs:
            epoch = self.epoch
            stats = self.train_epoch(epoch)
            if "core_loss" not in stats:
                raise RuntimeError(
                    f"epoch {epoch} produced no batches — check dataset size "
                    "vs batch size and curriculum stage filters"
                )
            self.time_meter.update()
            record = {
                "epoch": epoch,
                "Losses/train_all_loss": stats["core_loss"],
                "steps": int(self.state.step),
                "time_elapsed": self.time_meter.elapsed,
            }
            record.update(
                {f"Losses/{k}": v for k, v in stats.items() if k != "core_loss"}
            )
            if self.val_loader is not None and epoch % self.cfg.val_epoch_freq == 0:
                record.update(self.val_epoch(epoch))
            with open(stats_path, "a") as f:
                f.write(json.dumps(record) + "\n")
            if stats[self.cfg.best_meter_key] < self.best:
                self.best = stats[self.cfg.best_meter_key]
                self.save_checkpoint("best_checkpoint")
                with open(best_path, "a") as f:
                    f.write(json.dumps(record) + "\n")
            self.epoch += 1
            if self.cfg.save_freq and epoch % self.cfg.save_freq == 0:
                self.save_checkpoint()
            if epoch in self.cfg.save_epochs:  # epoch-list checkpoints
                self.save_checkpoint(f"checkpoint_epoch_{epoch}")
            done_frac = (epoch + 1 - start_epoch) / max(
                self.cfg.max_epochs - start_epoch, 1
            )
            eta = self.time_meter.elapsed * (1.0 / done_frac - 1.0)
            logging.info(
                "epoch %d done | loss %.4f | elapsed %.0fs | ETA %.0fs",
                epoch, stats["core_loss"], self.time_meter.elapsed, eta,
            )
        self.save_checkpoint()
        return self.best
