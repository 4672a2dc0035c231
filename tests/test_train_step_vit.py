"""Training-step coverage for the ViT (EfficientTAM) trunk.

The reference trains the EfficientTAM family through EfficientTAMTrain
(training/model/efficienttam.py:26-129) with finer freezing controls; this
exercises the same path here: a tiny ViT-trunk config through the one-jit
train step (windowed + global blocks, patch-16 pure-fold embed, no high-res
SAM features) and the freeze patterns that implement
freeze_image_encoder/train_only_decoder.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from us_video_medsam2_tpu.core.config import (
    FpnNeckConfig,
    MemoryAttentionConfig,
    MemoryEncoderConfig,
    SAM2Config,
    ViTDetConfig,
)
from us_video_medsam2_tpu.models.sam2 import SAM2Model
from us_video_medsam2_tpu.training.optimizer import OptimConfig
from us_video_medsam2_tpu.training.train_model import TrainSimConfig
from us_video_medsam2_tpu.training.train_step import (
    TrainBatch,
    TrainConfig,
    create_train_state,
    make_train_step,
)

SIZE = 64
TINY_VIT = SAM2Config(
    image_size=SIZE,
    hiera=None,
    vitdet=ViTDetConfig(
        img_size=SIZE,
        patch_size=16,
        embed_dim=32,
        depth=2,
        num_heads=2,
        window_size=2,
        window_block_indexes=(0,),
    ),
    neck=FpnNeckConfig(
        d_model=32, backbone_channel_list=(32,), fpn_top_down_levels=(),
        neck_norm="LN",
    ),
    neck_scalp=0,
    use_high_res_features_in_sam=False,
    add_tpos_enc_to_obj_ptrs=False,
    proj_tpos_enc_in_obj_ptrs=False,
    use_signed_tpos_enc_to_obj_ptrs=False,
    no_obj_embed_spatial=False,
    memory_attention=MemoryAttentionConfig(
        d_model=32, num_layers=1, dim_feedforward=64, rope_feat_sizes=(4, 4),
        kv_in_dim=8,
    ),
    memory_encoder=MemoryEncoderConfig(
        out_dim=8, in_dim=32, mask_downsampler_embed_dim=32, pos_channels=8
    ),
)


def _batch(t, b, o):
    rng = np.random.default_rng(0)
    masks = np.zeros((t, b, o, SIZE, SIZE), bool)
    masks[:, :, 0, 20:45, 15:40] = True
    masks[:, :, 1, 5:18, 40:60] = True
    return TrainBatch(
        images=jnp.asarray(rng.standard_normal((t, b, SIZE, SIZE, 3)), jnp.float32),
        masks=jnp.asarray(masks),
        obj_valid=jnp.ones((b, o), bool),
    )


@pytest.fixture(scope="module")
def setup():
    model = SAM2Model(TINY_VIT)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3))
    )
    return model, params


def test_vit_train_step_runs_and_updates(setup):
    model, params = setup
    cfg = TrainConfig(
        sim=TrainSimConfig(num_correction_pt_per_frame=1),
        optim=OptimConfig(total_steps=10),
    )
    state = create_train_state(model, params, cfg)
    step = make_train_step(model, cfg, donate=False)
    new_state, metrics = step(state, _batch(t=2, b=1, o=2), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["core_loss"])) and float(metrics["core_loss"]) > 0
    assert float(metrics["grad_norm"]) > 0
    diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params
    )
    moved = [v for v in jax.tree.leaves(diff) if v > 0]
    assert len(moved) > 0.9 * len(jax.tree.leaves(diff)), "most params should update"


def test_vit_freeze_image_encoder(setup):
    """EfficientTAMTrain's freeze_image_encoder: trunk+neck params must not
    move while the rest trains (reference training/model/efficienttam.py:70-129
    -> OptimConfig.freeze_patterns)."""
    model, params = setup
    cfg = TrainConfig(
        sim=TrainSimConfig(num_correction_pt_per_frame=1),
        optim=OptimConfig(total_steps=10, freeze_patterns=("*image_encoder*",)),
    )
    state = create_train_state(model, params, cfg)
    step = make_train_step(model, cfg, donate=False)
    new_state, metrics = step(state, _batch(t=2, b=1, o=2), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["core_loss"]))

    flat_old = jax.tree_util.tree_leaves_with_path(state.params)
    flat_new = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_leaves_with_path(new_state.params)
    )
    frozen_checked = moved_checked = 0
    for path, old in flat_old:
        key = jax.tree_util.keystr(path)
        delta = float(jnp.abs(flat_new[key] - old).max())
        if "image_encoder" in key:
            assert delta == 0.0, f"frozen param moved: {key}"
            frozen_checked += 1
        elif delta > 0:
            moved_checked += 1
    assert frozen_checked > 0 and moved_checked > 0
