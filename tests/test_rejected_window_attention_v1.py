"""Fused windowed-attention Pallas kernel vs the XLA module math.

The kernel (kernels/rejected/window_attention_v1.py — A/B-rejected, unwired; kept for the measurement record) replaces the Hiera block attention
half (reference hieradet.py:39-157) on TPU at bf16; here it runs in Pallas
interpret mode on CPU and must match the module-path numerics, including the
q-pool transition blocks and the global-attention (single window) blocks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from us_video_medsam2_tpu.kernels.rejected import window_attention_v1 as wa


def _params(rng, c, n_heads, co):
    dh = co // n_heads
    wq = jnp.asarray(rng.standard_normal((n_heads, c, dh)) / np.sqrt(c), jnp.float32)
    wk = jnp.asarray(rng.standard_normal((n_heads, c, dh)) / np.sqrt(c), jnp.float32)
    wv = jnp.asarray(rng.standard_normal((n_heads, c, dh)) / np.sqrt(c), jnp.float32)
    bq = jnp.asarray(rng.standard_normal((n_heads, dh)) * 0.1, jnp.float32)
    bk = jnp.asarray(rng.standard_normal((n_heads, dh)) * 0.1, jnp.float32)
    bv = jnp.asarray(rng.standard_normal((n_heads, dh)) * 0.1, jnp.float32)
    wo = jnp.asarray(rng.standard_normal((n_heads, dh, co)) / np.sqrt(dh), jnp.float32)
    bo = jnp.asarray(rng.standard_normal((co,)) * 0.1, jnp.float32)
    gamma = jnp.asarray(rng.standard_normal((c,)) * 0.1 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    return gamma, beta, wq, wk, wv, bq, bk, bv, wo, bo


# (hp, wp, c, heads, co, ws, q_pool, ln_inside) — the t512 block geometries
CASES = [
    (32, 32, 96, 1, 96, 8, False, True),     # stage-1 windowed (block 0)
    (32, 32, 96, 2, 192, 8, True, False),    # stage-1->2 transition (block 1)
    (16, 16, 192, 2, 192, 4, False, True),   # stage-2 windowed (block 2)
    (42, 42, 384, 4, 384, 14, False, True),  # stage-3 windowed ws14 (blocks 4/6/8)
    (16, 16, 384, 4, 384, 16, False, True),  # global attention as one window
    (14, 14, 384, 8, 768, 14, True, False),  # stage-3->4 transition (block 10)
]


@pytest.mark.parametrize("hp,wp,c,h,co,ws,q_pool,ln_inside", CASES)
def test_kernel_matches_xla_ref(hp, wp, c, h, co, ws, q_pool, ln_inside):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, hp, wp, c)), jnp.bfloat16)
    params = _params(rng, c, h, co)
    out_k = wa._run(x, *params, ws=ws, q_pool=q_pool, ln_inside=ln_inside,
                    eps=1e-6, interpret=True)
    out_r = wa._xla_ref(x, *params, ws, q_pool, ln_inside, 1e-6)
    assert out_k.shape == out_r.shape
    np.testing.assert_allclose(
        np.asarray(out_k, np.float32), np.asarray(out_r, np.float32),
        rtol=3e-2, atol=3e-2,
    )


def test_xla_ref_matches_module_path():
    """_xla_ref must reproduce the current module composition: LN -> qkv Dense
    -> window partition -> sdpa -> proj Dense -> unpartition (hiera.py
    MultiScaleBlock/MultiScaleAttention), including zero-pad windows."""
    import flax.linen as nn

    from us_video_medsam2_tpu.models.layers import LayerNorm
    from us_video_medsam2_tpu.ops.attention import sdpa
    from us_video_medsam2_tpu.ops.window import window_partition, window_unpartition

    c, heads, ws = 96, 2, 8
    h_sp = w_sp = 24

    class AttnHalf(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = LayerNorm(eps=1e-6, dtype=jnp.bfloat16, name="norm1")(x)
            win, pad_hw = window_partition(y, ws)
            b, wh, ww, _ = win.shape
            qkv = nn.Dense(c * 3, dtype=jnp.bfloat16, name="qkv")(win)
            qkv = qkv.reshape(b, wh * ww, 3, heads, c // heads)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            o = sdpa(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3), allow_flash=False,
            )
            o = o.transpose(0, 2, 1, 3).reshape(b, wh, ww, c)
            o = nn.Dense(c, dtype=jnp.bfloat16, name="proj")(o)
            return window_unpartition(o, ws, pad_hw, (h_sp, w_sp))

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, h_sp, w_sp, c)), jnp.bfloat16)
    m = AttnHalf()
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    params = jax.tree.map(
        lambda p: jnp.asarray(
            rng.standard_normal(p.shape) / np.sqrt(max(p.shape[0], 4)), p.dtype
        ),
        params,
    )
    out_mod = m.apply({"params": params}, x)

    wq, wk, wv, bq, bk, bv, wo = wa.split_qkv_params(
        params["qkv"]["kernel"], params["qkv"]["bias"], params["proj"]["kernel"], heads
    )
    out_ref = wa._xla_ref(
        x, params["norm1"]["scale"], params["norm1"]["bias"],
        wq, wk, wv, bq, bk, bv, wo, params["proj"]["bias"],
        ws, False, True, 1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out_mod, np.float32), np.asarray(out_ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_gradients_flow():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 96)), jnp.bfloat16)
    params = _params(rng, 96, 1, 96)

    def loss(x, wq):
        p = list(params)
        p[2] = wq
        out = wa._xla_ref(x, *p, 8, False, True, 1e-6)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gx, gw = jax.grad(loss, argnums=(0, 1))(x, params[2])
    assert np.isfinite(np.asarray(gx, np.float32)).all()
    assert np.isfinite(np.asarray(gw)).all()
    assert float(jnp.abs(gw).sum()) > 0
