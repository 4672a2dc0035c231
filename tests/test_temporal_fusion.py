"""Temporal-fusion modules (the fork's signature additions) vs reference
fixtures: eval-mode output parity with imported torch weights (incl.
BatchNorm3d running stats), plus shape/grad/jit coverage for all variants and
the wired train path (reference sam2/modeling/sam2_base.py:25-758,
1249-1262)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import require_fixture
from us_video_medsam2_tpu.core.config import TemporalFusionConfig
from us_video_medsam2_tpu.core.import_torch import convert_fusion_module
from us_video_medsam2_tpu.models.temporal_fusion import VARIANTS

T = 4
C = 32


def nchw2nhwc(x):
    return np.ascontiguousarray(np.transpose(x, (0, 2, 3, 1)))


def _run_variant(fx, variant):
    sd = {
        k[len(f"{variant}_sd.") :]: fx[k]
        for k in fx.files
        if k.startswith(f"{variant}_sd.")
    }
    params, stats = convert_fusion_module(sd, variant)
    mod = VARIANTS[variant](channels=C)
    x = jnp.asarray(nchw2nhwc(fx["x"]))
    out = mod.apply(
        {"params": params, "batch_stats": stats}, x, int(fx["t"]), True
    )
    return np.asarray(out)


@pytest.mark.parametrize("variant", ["tce", "gfte", "atsf"])
def test_fusion_eval_parity_vs_reference(variant):
    """Exact eval-mode parity: imported weights + running stats reproduce the
    reference module's outputs (safeTCE :697-758, GFTE :372-527, ATSF :233-361)."""
    fx = np.load(require_fixture("temporal_fusion.npz"))
    got = _run_variant(fx, variant)
    ref = nchw2nhwc(fx[f"{variant}_out"])
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("variant", ["tce", "gfte", "atsf", "gp"])
def test_fusion_train_mode_shapes_and_grads(variant):
    """Training path: batch-stat BN + dropout/Gumbel rngs under jit; gradients
    flow to every parameter (the reference trains these modules end-to-end)."""
    mod = VARIANTS[variant](channels=C)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2 * T, 8, 8, C))
    variables = mod.init({"params": rng, "dropout": rng}, x, T, False)

    @jax.jit
    def loss_fn(params, x):
        y = mod.apply(
            {"params": params, **{k: v for k, v in variables.items() if k != "params"}},
            x,
            T,
            False,
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        return jnp.sum(y**2), y

    (val, y), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"], x)
    assert y.shape == x.shape
    assert np.isfinite(float(val))
    leaves = jax.tree.leaves(grads)
    assert leaves and all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # residual modules must start near-identity (alpha/residual weights ~0.1)
    assert float(jnp.abs(y - x).mean()) < 1.0


def test_fusion_identity_on_single_frame_or_channel_mismatch():
    """Reference modules skip on channel mismatch (safeTCE :740-742) and are
    meaningless at T=1; ours must return the input unchanged in both cases."""
    mod = VARIANTS["tce"](channels=C)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, C))
    variables = mod.init(jax.random.PRNGKey(1), x, 1, True)
    np.testing.assert_array_equal(mod.apply(variables, x, 1, True), x)
    x_bad = jax.random.normal(jax.random.PRNGKey(0), (2 * T, 8, 8, C + 1))
    np.testing.assert_array_equal(mod.apply(variables, x_bad, T, True), x_bad)


def test_gfte_wired_train_step():
    """One jitted train step with --temporal_fusion gfte: the wired path
    (forward_image fusion hook, sam2.py) runs under jit+remat with finite loss
    and gradients reaching the fusion parameters."""
    from us_video_medsam2_tpu.core.config import (
        FpnNeckConfig,
        HieraConfig,
        MemoryAttentionConfig,
        MemoryEncoderConfig,
        SAM2Config,
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

    size = 128
    cfg = SAM2Config(
        image_size=size,
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
            d_model=32, num_layers=1, dim_feedforward=64, rope_feat_sizes=(8, 8),
            kv_in_dim=8,
        ),
        memory_encoder=MemoryEncoderConfig(
            out_dim=8, in_dim=32, mask_downsampler_embed_dim=32, pos_channels=8
        ),
        temporal_fusion=TemporalFusionConfig(variant="gfte", channels=32, num_levels=3),
    )
    model = SAM2Model(cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((2, size, size, 3))
    )
    assert "batch_stats" in params, "fusion BN stats collection must exist"
    fusion_params = [k for k in params["params"] if k.startswith("temporal_fusion")]
    assert len(fusion_params) == 3

    tcfg = TrainConfig(
        sim=TrainSimConfig(num_correction_pt_per_frame=1),
        optim=OptimConfig(total_steps=10),
    )
    state = create_train_state(model, params, tcfg)
    t, b, o = 2, 1, 2
    masks = np.zeros((t, b, o, size, size), bool)
    masks[:, :, :, 40:90, 30:80] = True
    batch = TrainBatch(
        images=jnp.asarray(
            np.random.default_rng(0).standard_normal((t, b, size, size, 3)),
            jnp.float32,
        ),
        masks=jnp.asarray(masks),
        obj_valid=jnp.ones((b, o), bool),
    )
    step = make_train_step(model, tcfg, donate=False)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["core_loss"]))
    # fusion params must have moved (gradients reached them)
    moved = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        {k: state.params["params"][k] for k in fusion_params},
        {k: new_state.params["params"][k] for k in fusion_params},
    )
    assert max(jax.tree.leaves(moved)) > 0.0, moved
    # BN running stats must NOT have been optimized away from their init
    np.testing.assert_array_equal(
        jax.tree.leaves(state.params["batch_stats"])[0],
        jax.tree.leaves(new_state.params["batch_stats"])[0],
    )


def test_gfte_spectral_roundtrip_identity():
    """The GFTE spectral branch's literal two-projection form
    (U (U^T x) * filt with a k-INDEPENDENT per-channel filter,
    reference sam2_base.py:434-460) equals x * filt exactly because the
    path-Laplacian eigh basis is orthonormal — the identity the module
    relies on since round 3 (models/temporal_fusion.py::GFTE branch 1)."""
    from us_video_medsam2_tpu.models.temporal_fusion import _gfte_eigenbasis

    rng = np.random.default_rng(0)
    for t in (2, 4, 7):
        evecs = np.asarray(_gfte_eigenbasis(t), np.float64)
        # orthonormality of the trace-time basis itself
        np.testing.assert_allclose(evecs @ evecs.T, np.eye(t), atol=1e-6)
        x = rng.standard_normal((2, t, 3, 3, 8)).astype(np.float32)
        filt = rng.standard_normal(8).astype(np.float32)
        spec = np.einsum("kt,bthwc->bkhwc", evecs.T, x)
        literal = np.einsum("tk,bkhwc->bthwc", evecs, spec * filt)
        np.testing.assert_allclose(literal, x * filt, atol=1e-5)
