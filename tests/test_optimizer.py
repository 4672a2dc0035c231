"""Optimizer semantics: param groups, layer decay, wd masking, cosine schedules."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from us_video_medsam2_tpu.training.optimizer import (
    OptimConfig,
    build_optimizer,
    compute_param_meta,
    cosine_value,
)


def _toy_params():
    return {
        "params": {
            "image_encoder": {
                "trunk": {
                    "patch_embed": {"kernel": jnp.ones((3, 3, 3, 8)), "bias": jnp.zeros(8)},
                    "pos_embed": jnp.zeros((1, 2, 2, 8)),
                    "blocks_0": {"norm1": {"scale": jnp.ones(8), "bias": jnp.zeros(8)},
                                 "attn": {"qkv": {"kernel": jnp.ones((8, 24)), "bias": jnp.zeros(24)}}},
                    "blocks_3": {"mlp": {"layers_0": {"kernel": jnp.ones((8, 8)), "bias": jnp.zeros(8)}}},
                },
                "neck": {"convs_0": {"kernel": jnp.ones((1, 1, 8, 4)), "bias": jnp.zeros(4)}},
            },
            "sam_mask_decoder": {"iou_head": {"layers_0": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros(4)}}},
        }
    }


def test_param_meta_groups_and_layer_decay():
    cfg = OptimConfig(layer_decay=0.9)
    params = _toy_params()
    groups, mults, wd_on = compute_param_meta(params, cfg)
    p = params["params"]

    g = groups["params"]
    assert g["sam_mask_decoder"]["iou_head"]["layers_0"]["kernel"] == 0  # default lr
    assert g["image_encoder"]["trunk"]["blocks_0"]["attn"]["qkv"]["kernel"] == 1  # vision lr

    m = mults["params"]["image_encoder"]["trunk"]
    num_layers = 4  # blocks_0..blocks_3 -> max idx 3 -> +1
    # reference layer_decay_param_modifier: 0.9 ** (L+1 - layer_id)
    assert np.isclose(m["blocks_0"]["attn"]["qkv"]["kernel"], 0.9 ** (num_layers + 1 - 1))
    assert np.isclose(m["blocks_3"]["mlp"]["layers_0"]["kernel"], 0.9 ** (num_layers + 1 - 4))
    assert m["patch_embed"]["kernel"] == 0.9 ** (num_layers + 1)
    assert m["pos_embed"] == 1.0  # config override '*pos_embed*' -> 1.0

    w = wd_on["params"]
    assert w["image_encoder"]["trunk"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert not w["image_encoder"]["trunk"]["blocks_0"]["attn"]["qkv"]["bias"]
    assert not w["image_encoder"]["trunk"]["blocks_0"]["norm1"]["scale"]


def test_cosine_schedule_endpoints():
    assert np.isclose(float(cosine_value(1.0, 0.1, 0.0)), 1.0)
    assert np.isclose(float(cosine_value(1.0, 0.1, 1.0)), 0.1)
    assert np.isclose(float(cosine_value(1.0, 0.1, 0.5)), 0.55)


def test_optimizer_moves_params_with_group_lrs():
    cfg = OptimConfig(base_lr=1e-2, vision_lr=1e-3, total_steps=100, weight_decay=0.0,
                      clip_norm=1e9, layer_decay=1.0)
    params = _toy_params()
    tx = build_optimizer(params, cfg)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, state = tx.update(grads, state, params)
    up_dec = float(updates["params"]["sam_mask_decoder"]["iou_head"]["layers_0"]["kernel"][0, 0])
    up_vis = float(updates["params"]["image_encoder"]["trunk"]["blocks_0"]["attn"]["qkv"]["kernel"][0, 0])
    # adam first step: update magnitude = lr (grad/sqrt(grad^2) = 1)
    assert np.isclose(abs(up_dec), 1e-2, rtol=1e-3)
    assert np.isclose(abs(up_vis), 1e-3, rtol=1e-3)
