"""Optimizer: AdamW with per-param-group cosine schedules, layer-wise LR decay,
weight-decay masking, and global-norm clipping.

Mirrors reference training/optimizer.py:52-502 + GFTE_3.yaml:246-289:
- lr: cosine start->start/10; separate (lower) schedule for `image_encoder.*`
- weight decay 0.1, but 0 for biases and LayerNorm params
- layer_decay_param_modifier (optimizer.py:422-471): 0.9^(L+1-layer_id) over
  `image_encoder.trunk` blocks, with pos_embed overridden to multiplier 1.0
- GradientClipper max_norm 0.1 (optimizer.py:380-398)

Everything is a single optax GradientTransformation; per-leaf group ids and
multipliers are computed once from the parameter tree paths.
"""

from __future__ import annotations

import fnmatch
import re
from dataclasses import dataclass


import jax
import jax.numpy as jnp
import optax


@dataclass(frozen=True)
class OptimConfig:
    base_lr: float = 5.0e-5
    vision_lr: float = 3.0e-5
    lr_end_factor: float = 0.1  # cosine end = start * factor
    total_steps: int = 1000
    weight_decay: float = 0.1
    clip_norm: float = 0.1
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    layer_decay: float = 0.9
    layer_decay_min: float | None = None
    # unix patterns of params to freeze (EfficientTAMTrain's freeze_image_encoder/
    # freeze_memory_encoder/freeze_memory_attention/train_only_decoder,
    # reference training/model/efficienttam.py:70-129)
    freeze_patterns: tuple = ()
    grad_dtype: str = "float32"  # 'bfloat16' casts grads before the DP all-reduce
    accum_steps: int = 1  # gradient accumulation micro-steps per optimizer step


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)


def _trunk_layer_id(path: str, num_layers: int) -> int:
    """reference Hiera.get_layer_id (hieradet.py:301-314)."""
    if "pos_embed" in path or "patch_embed" in path:
        return 0
    m = re.search(r"blocks_(\d+)", path)
    if m:
        return int(m.group(1)) + 1
    return num_layers + 1


def _num_trunk_layers(params) -> int:
    mx = -1
    for path, _ in jax.tree_util.tree_leaves_with_path(params):
        p = _path_str(path)
        m = re.search(r"image_encoder/trunk/blocks_(\d+)", p)
        if m:
            mx = max(mx, int(m.group(1)))
    return mx + 1


def compute_param_meta(params, cfg: OptimConfig):
    """Per-leaf (lr_group, lr_mult, wd_on) pytrees."""
    num_layers = _num_trunk_layers(params)

    def meta(path, leaf):
        p = _path_str(path)
        group = 1 if "image_encoder" in p else 0
        mult = 1.0
        if cfg.layer_decay != 1.0 and "image_encoder/trunk" in p:
            if fnmatch.fnmatch(p, "*pos_embed*"):
                mult = 1.0  # config override (GFTE_3.yaml:266-268)
            else:
                lid = _trunk_layer_id(p, num_layers)
                mult = cfg.layer_decay ** (num_layers + 1 - lid)
                if cfg.layer_decay_min is not None:
                    mult = max(mult, cfg.layer_decay_min)
        if any(fnmatch.fnmatch(p, pat) for pat in cfg.freeze_patterns):
            mult = 0.0  # frozen params take precedence over any lr modifier
        # no weight decay on biases and norm/affine params (GFTE_3.yaml:283-289)
        is_bias = p.endswith("/bias")
        is_norm = "/norm" in p or p.endswith("/scale") or "_ln" in p
        is_embed_like = leaf.ndim <= 1
        wd_on = not (is_bias or is_norm or is_embed_like)
        return (group, float(mult), wd_on)

    metas = jax.tree_util.tree_map_with_path(meta, params)
    groups = jax.tree.map(lambda m: m[0], metas, is_leaf=lambda x: isinstance(x, tuple))
    mults = jax.tree.map(lambda m: m[1], metas, is_leaf=lambda x: isinstance(x, tuple))
    wd_on = jax.tree.map(lambda m: m[2], metas, is_leaf=lambda x: isinstance(x, tuple))
    return groups, mults, wd_on


def cosine_value(start: float, end: float, frac):
    return end + 0.5 * (start - end) * (1.0 + jnp.cos(jnp.pi * frac))


def build_optimizer(params, cfg: OptimConfig) -> optax.GradientTransformation:
    groups, mults, wd_on = compute_param_meta(params, cfg)

    adam = optax.scale_by_adam(b1=cfg.b1, b2=cfg.b2, eps=cfg.eps)
    clip = optax.clip_by_global_norm(cfg.clip_norm)

    def lr_at(count):
        frac = jnp.clip(count / max(cfg.total_steps, 1), 0.0, 1.0)
        lr0 = cosine_value(cfg.base_lr, cfg.base_lr * cfg.lr_end_factor, frac)
        lr1 = cosine_value(cfg.vision_lr, cfg.vision_lr * cfg.lr_end_factor, frac)
        return lr0, lr1

    def init_fn(params):
        return {"adam": adam.init(params), "count": jnp.zeros((), jnp.int32)}

    def update_fn(grads, state, params):
        grads, _ = clip.update(grads, None, params)
        updates, adam_state = adam.update(grads, state["adam"], params)
        lr0, lr1 = lr_at(state["count"].astype(jnp.float32))

        def apply(u, p, g, m, w):
            lr = jnp.where(g == 1, lr1, lr0) * m
            step = u + (cfg.weight_decay * p if w else 0.0)
            return (-lr * step).astype(p.dtype)

        updates = jax.tree.map(apply, updates, params, groups, mults, wd_on)
        return updates, {"adam": adam_state, "count": state["count"] + 1}

    tx = optax.GradientTransformation(init_fn, update_fn)
    if cfg.accum_steps > 1:
        # gradient accumulation: average grads over k micro-steps, apply once
        # (capability parity with large-batch recipes; schedules advance per
        # OPTIMIZER step, as the reference's fractional-epoch "where" does)
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_steps)
    return tx
