"""Parity tests for the v2 fused windowed-attention kernel
(kernels/fused_window_attention.py) against its XLA reference, in Pallas
interpret mode on CPU, over every hiera-t@512 block geometry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from us_video_medsam2_tpu.kernels.fused_window_attention import (
    _run,
    _run_qkv,
    _xla_ref,
    _xla_ref_qkv,
    fused_window_attention,
)

# (Hp, Wp, ws, nh, q_pool) — the nine windowed t512 trunk blocks:
# blocks_0 (128², ws8), blocks_1 (128², ws8, pool), blocks_2 (64², ws4),
# blocks_3 (64², ws4, pool), blocks_4/6/8 (42² padded, ws14),
# blocks_10 (42² padded, ws14, pool), blocks_11 (21² padded, ws7).
GEOMETRIES = [
    (128, 128, 8, 1, False),
    (128, 128, 8, 2, True),
    (64, 64, 4, 2, False),
    (64, 64, 4, 4, True),
    (42, 42, 14, 4, False),
    (42, 42, 14, 8, True),
    (21, 21, 7, 8, False),
]

HD = 128


def _mk(hp, wp, nh, seed=0, dtype=jnp.bfloat16):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((2, hp, wp, 3 * nh * HD)), dtype)


@pytest.mark.parametrize("hp,wp,ws,nh,q_pool", GEOMETRIES)
def test_forward_matches_xla_ref(hp, wp, ws, nh, q_pool):
    qkv = _mk(hp, wp, nh)
    got = _run(qkv, ws=ws, nh=nh, hd=HD, q_pool=q_pool, interpret=True)
    want = _xla_ref(qkv, ws, nh, HD, q_pool)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=2e-2, atol=2e-2
    )
    # bf16 in/out with identical op order: should in fact be (near-)exact
    mismatch = np.mean(np.asarray(got) != np.asarray(want))
    assert mismatch < 0.02


# hd=64 runs NATIVE (no 128-lane pad) since round 4 — the EfficientTAM ViT
# trunk's head dim (vitdet.py: 384/6 and 192/3). Same kernel, half-vreg head
# slices: cover the ViT-S ws=14 v1-path shape, a raster-path shape, and ws=7.
HD64_GEOMETRIES = [
    (42, 42, 14, 6, False),  # ViT-S/TI windowed blocks (32² padded to 42²)
    (32, 32, 8, 6, False),  # raster-packed path at hd=64
    (21, 21, 7, 8, False),
    (64, 64, 4, 4, True),  # raster + q-pool at hd=64
]


@pytest.mark.parametrize("hp,wp,ws,nh,q_pool", HD64_GEOMETRIES)
def test_forward_matches_xla_ref_hd64(hp, wp, ws, nh, q_pool):
    rng = np.random.default_rng(21)
    qkv = jnp.asarray(rng.standard_normal((2, hp, wp, 3 * nh * 64)), jnp.bfloat16)
    got = _run(qkv, ws=ws, nh=nh, hd=64, q_pool=q_pool, interpret=True)
    want = _xla_ref(qkv, ws, nh, 64, q_pool)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=2e-2, atol=2e-2
    )
    mismatch = np.mean(np.asarray(got) != np.asarray(want))
    assert mismatch < 0.02


def test_full_relayout_paths_are_bitwise_equal(monkeypatch):
    """The hd=64 default (one full-width window relayout, round-5 A/B) and
    the per-head relayout must produce BITWISE identical outputs — the
    variant only reorders data movement, never arithmetic."""
    rng = np.random.default_rng(5)
    qkv = jnp.asarray(rng.standard_normal((1, 42, 42, 3 * 6 * 64)), jnp.bfloat16)
    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("US_MEDSAM2_WINATTN_FULL_RELAYOUT", flag)
        outs[flag] = np.asarray(
            _run(qkv, ws=14, nh=6, hd=64, q_pool=False, interpret=True)
        )
    assert (outs["0"] == outs["1"]).all()


# real_h cut: maps bottom-padded for the window grid (32² -> 42² at ws=14)
# skip the last strip's pad-query rows — outputs there come back zero and the
# model slices them off. (real_h, hp, wp, ws, nh, hd, q_pool)
CUT_GEOMETRIES = [
    (32, 42, 42, 14, 6, 64, False),  # ViT-S/TI windowed blocks
    (32, 42, 42, 14, 4, 128, False),  # hiera-t512 blocks_4/6/8
    (32, 42, 42, 14, 8, 128, True),  # hiera-t512 blocks_10 (q-pool)
    (16, 21, 21, 7, 8, 128, False),  # hiera-t512 blocks_11
]


@pytest.mark.parametrize("rh,hp,wp,ws,nh,hd,q_pool", CUT_GEOMETRIES)
def test_real_h_cut_matches_on_real_rows(rh, hp, wp, ws, nh, hd, q_pool):
    rng = np.random.default_rng(31)
    qkv = jnp.asarray(rng.standard_normal((2, hp, wp, 3 * nh * hd)), jnp.bfloat16)
    got = _run(qkv, ws=ws, nh=nh, hd=hd, q_pool=q_pool, real_h=rh, interpret=True)
    full = _run(qkv, ws=ws, nh=nh, hd=hd, q_pool=q_pool, interpret=True)
    assert got.shape == full.shape
    ro = rh // 2 if q_pool else rh  # real output rows
    np.testing.assert_array_equal(
        np.asarray(got[:, :ro]), np.asarray(full[:, :ro])
    ), "real rows must be bit-identical with and without the cut"
    # the skipped rows of the LAST strip are exact zeros
    wso = ws // 2 if q_pool else ws
    n_rows = hp // ws
    last = np.asarray(got[:, (n_rows - 1) * wso :])
    rr_out = ro - (n_rows - 1) * wso
    assert (last[:, rr_out:] == 0).all()


def test_forward_f32_exactish():
    # f32 end-to-end: only reassociation-free ops -> tight tolerance
    qkv = _mk(64, 64, 2, seed=3, dtype=jnp.float32)
    got = _run(qkv, ws=4, nh=2, hd=HD, q_pool=False, interpret=True)
    want = _xla_ref(qkv, 4, 2, HD, False)
    # packed groups sum 128 softmax lanes (with exact zeros) where the
    # unpacked path sums 16 — pure f32 reassociation, measured <= 2e-6
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=5e-6
    )


def test_packed_grouping_matches_per_window():
    # g>1 packing (ws=4 -> g=8) must equal unpacked per-window attention
    qkv = _mk(16, 16, 1, seed=5, dtype=jnp.float32)
    got = _run(qkv, ws=4, nh=1, hd=HD, q_pool=False, interpret=True)
    # per-window reference without packing
    t = qkv.reshape(2, 4, 4, 4, 4, 3, 1, HD).transpose(5, 0, 1, 3, 6, 2, 4, 7)
    t = t.reshape(3, 2 * 16, 16, HD)
    q, k, v = t[0], t[1], t[2]
    s = jnp.einsum("nqd,nkd->nqk", q, k) * (HD**-0.5)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("nqk,nkd->nqd", p, v)
    o = o.reshape(2, 4, 4, 1, 4, 4, HD).transpose(0, 1, 4, 2, 5, 3, 6)
    want = o.reshape(2, 16, 16, HD)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


# (Hp, Wp, ws, nh, q_pool, cin) — dense-fused variant over the same blocks,
# with each block's true input width (96/192/384/768)
QKV_GEOMETRIES = [
    (128, 128, 8, 1, False, 96),
    (128, 128, 8, 2, True, 96),
    (64, 64, 4, 2, False, 192),
    (64, 64, 4, 4, True, 192),
    (42, 42, 14, 4, False, 384),
    (42, 42, 14, 8, True, 384),
    (21, 21, 7, 8, False, 768),
]


@pytest.mark.parametrize("hp,wp,ws,nh,q_pool,cin", QKV_GEOMETRIES)
def test_qkv_fused_matches_xla_ref(hp, wp, ws, nh, q_pool, cin):
    rng = np.random.default_rng(11)
    y = jnp.asarray(rng.standard_normal((2, hp, wp, cin)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((cin, 3 * nh * HD)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(3 * nh * HD) * 0.1, jnp.float32)
    got = _run_qkv(y, w, b, ws=ws, nh=nh, hd=HD, q_pool=q_pool, interpret=True)
    want = _xla_ref_qkv(y, w, b, ws, nh, HD, q_pool)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=2e-2, atol=2e-2
    )
    mismatch = np.mean(np.asarray(got) != np.asarray(want))
    assert mismatch < 0.02


def test_qkv_fused_f32_exactish():
    rng = np.random.default_rng(13)
    y = jnp.asarray(rng.standard_normal((1, 64, 64, 192)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((192, 3 * 2 * HD)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(3 * 2 * HD) * 0.1, jnp.float32)
    got = _run_qkv(y, w, b, ws=4, nh=2, hd=HD, q_pool=True, interpret=True)
    want = _xla_ref_qkv(y, w, b, 4, 2, HD, True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=5e-6
    )


def test_grad_flows_through_xla_recompute():
    qkv = _mk(16, 16, 2, seed=7, dtype=jnp.float32)

    def loss(a):
        return jnp.sum(jnp.square(fused_window_attention(a, 4, 2, HD, True)))

    # interpret-mode forward via monkeypatched _run is awkward; on CPU the
    # custom_vjp backward is pure XLA, so check it against direct autodiff of
    # the reference instead.
    def loss_ref(a):
        return jnp.sum(jnp.square(_xla_ref(a, 4, 2, HD, True)))

    g_ref = jax.grad(loss_ref)(qkv)
    _, vjp = jax.vjp(lambda a: _xla_ref(a, 4, 2, HD, True), qkv)
    (g_man,) = vjp(2.0 * _xla_ref(qkv, 4, 2, HD, True))
    np.testing.assert_allclose(
        np.asarray(g_ref), np.asarray(g_man), rtol=1e-5, atol=1e-6
    )
