"""The jitted training step: prompt-simulated tracking forward + loss + AdamW.

Data parallelism: the step is written over the GLOBAL batch; inputs arrive with
their video axis sharded over the mesh's 'data' axis and params replicated, so
XLA partitions the computation and inserts gradient all-reduces — the TPU
equivalent of the reference's DDP wrap + loss-side all_reduce(num_objects)
(reference trainer.py:291-311, loss_fns.py:169-174).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from us_video_medsam2_tpu.models.sam2 import SAM2Model
from us_video_medsam2_tpu.training.losses import (
    CORE_LOSS_KEY,
    LossConfig,
    multi_step_loss_stacked,
)
from us_video_medsam2_tpu.training.optimizer import OptimConfig, build_optimizer
from us_video_medsam2_tpu.training.train_model import TrainSimConfig, train_forward


class TrainBatch(NamedTuple):
    """The collated video batch (reference BatchedVideoDatapoint, data_utils.py:72-179)."""

    images: jnp.ndarray  # [T, B, H, W, 3] float normalized
    masks: jnp.ndarray  # [T, B, O, H, W] bool
    obj_valid: jnp.ndarray  # [B, O] bool — padded object slots


class TrainState(NamedTuple):
    params: Dict
    opt_state: Dict
    step: jnp.ndarray


@dataclass(frozen=True)
class TrainConfig:
    sim: TrainSimConfig = field(default_factory=TrainSimConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)


def create_train_state(model: SAM2Model, params, cfg: TrainConfig) -> TrainState:
    tx = build_optimizer(params, cfg.optim)
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


def make_train_step(
    model: SAM2Model, cfg: TrainConfig, donate: bool = True, return_grads: bool = False
):
    """return_grads=True adds the raw gradient tree to the metrics dict —
    diagnostic path used by the DP-equivalence tests/dryrun to assert the
    sharded step reproduces the single-device gradients exactly (the property
    DDP guarantees by construction, reference trainer.py:291-311)."""
    def loss_fn(params, batch: TrainBatch, rng):
        rng, drop_rng = jax.random.split(rng)
        stacked, finals = train_forward(
            model, params, rng, batch.images, batch.masks, cfg.sim,
            is_training=True, dropout_rng=drop_rng,
        )
        obj_valid = batch.obj_valid.reshape(-1)
        losses = multi_step_loss_stacked(
            cfg.loss, stacked, obj_valid, final_logits_by_frame=finals
        )
        return losses[CORE_LOSS_KEY], losses

    def train_step(state: TrainState, batch: TrainBatch, rng):
        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        if cfg.optim.grad_dtype == "bfloat16":
            # gradient-compression analogue of the reference's bf16 comm hook
            # (trainer.py:300-311): cast before the (sharding-induced) all-reduce
            grads = jax.tree.map(lambda g: g.astype(jnp.bfloat16).astype(g.dtype), grads)
        opt = build_optimizer(state.params, cfg.optim)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        metrics = {k: v for k, v in losses.items()}
        metrics["grad_norm"] = optax_global_norm(grads)
        if return_grads:
            metrics["grads"] = grads
        return new_state, metrics

    kwargs = {"donate_argnums": (0,)} if donate else {}
    return jax.jit(train_step, **kwargs)


def make_eval_step(model: SAM2Model, cfg: TrainConfig):
    """Validation step: eval-mode prompt simulation + loss, no grads
    (reference trainer.py:583-701 val loop)."""

    def eval_step(params, batch: TrainBatch, rng):
        stacked, finals = train_forward(
            model, params, rng, batch.images, batch.masks, cfg.sim, is_training=False
        )
        obj_valid = batch.obj_valid.reshape(-1)
        return multi_step_loss_stacked(
            cfg.loss, stacked, obj_valid, final_logits_by_frame=finals
        )

    return jax.jit(eval_step)


def optax_global_norm(tree):
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))
