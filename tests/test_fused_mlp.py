"""Fused LN->MLP->residual Pallas kernel vs the XLA module math.

The kernel (kernels/fused_mlp.py) replaces the trunk block tail
(reference hieradet.py:158-166) on TPU at bf16; here it runs in Pallas
interpret mode on CPU and must match the exact module-path numerics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from us_video_medsam2_tpu.kernels import fused_mlp


@pytest.mark.parametrize("n,d,f,act", [(512, 96, 384, "gelu"), (300, 256, 2048, "relu")])
def test_fused_matches_xla_ref(n, d, f, act):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.bfloat16)
    gamma = jnp.asarray(rng.standard_normal((d,)) * 0.1 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.standard_normal((d,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((d, f)) / np.sqrt(d), jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((f,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((f, d)) / np.sqrt(f), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((d,)) * 0.1, jnp.float32)

    out_k = fused_mlp._run(
        x, gamma, beta, w1, b1, w2, b2, eps=1e-6, act=act, block_n=256, interpret=True
    )
    out_ref = fused_mlp._xla_ref(x, gamma, beta, w1, b1, w2, b2, 1e-6, act)
    assert out_k.shape == out_ref.shape
    np.testing.assert_allclose(
        np.asarray(out_k, np.float32), np.asarray(out_ref, np.float32), rtol=2e-2, atol=2e-2
    )


@pytest.mark.parametrize("f_chunks", [2, 4])
def test_f_chunked_matches_monolithic(f_chunks):
    """Splitting the hidden f axis into accumulation chunks (round-4 VMEM
    optimization, ViT-S d=384/f=1536 -> bn=1024/ch=4) only reassociates the
    final f32 adds: f32 inputs must agree to ~1 ulp with the ch=1 kernel."""
    rng = np.random.default_rng(7)
    n, d, f = 256, 384, 1536
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal((d,)) * 0.1 + 1.0, jnp.float32)
    beta = jnp.asarray(rng.standard_normal((d,)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((d, f)) / np.sqrt(d), jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((f,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((f, d)) / np.sqrt(f), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((d,)) * 0.1, jnp.float32)
    kw = dict(eps=1e-6, act="gelu", block_n=256, interpret=True)
    mono = fused_mlp._run(x, gamma, beta, w1, b1, w2, b2, **kw)
    chunked = fused_mlp._run(x, gamma, beta, w1, b1, w2, b2, f_chunks=f_chunks, **kw)
    np.testing.assert_allclose(  # measured max 1.7e-6 abs / 1.6e-4 rel
        np.asarray(chunked), np.asarray(mono), rtol=2e-4, atol=5e-6
    )


def test_pick_block_n_shapes():
    """The tile picker must split f exactly where the monolithic tile caps:
    ViT-S (384/1536) gets a 1024 tile via chunking; hiera stage-1 (96/384)
    stays monolithic at 2048."""
    assert fused_mlp.pick_block_n(1024, 384, 1536) == (1024, 2)
    assert fused_mlp.pick_block_n(16384, 96, 384) == (2048, 1)
    bn, ch = fused_mlp.pick_block_n(441, 768, 3072)
    assert bn == 256 and ch >= 1


def test_fused_matches_module_path():
    """The _xla_ref used for the VJP must itself match the module composition
    (LayerNorm + MLP + residual) that the fused path replaces in hiera.py."""
    from us_video_medsam2_tpu.models.layers import MLP, LayerNorm, gelu_exact

    import flax.linen as nn

    class Tail(nn.Module):
        d: int = 96
        f: int = 384

        @nn.compact
        def __call__(self, x):
            y = LayerNorm(eps=1e-6, dtype=jnp.bfloat16, name="norm2")(x)
            y = MLP(
                hidden_dim=self.f, output_dim=self.d, num_layers=2,
                activation=gelu_exact, dtype=jnp.bfloat16, name="mlp",
            )(y)
            return x + y

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((64, 96)), jnp.bfloat16)
    m = Tail()
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    # replace init weights with non-trivial values so the comparison has teeth
    params = jax.tree.map(
        lambda p: jnp.asarray(rng.standard_normal(p.shape) * 0.1, p.dtype), params
    )
    out_mod = m.apply({"params": params}, x)
    out_ref = fused_mlp._xla_ref(
        x,
        params["norm2"]["scale"],
        params["norm2"]["bias"],
        params["mlp"]["layers_0"]["kernel"],
        params["mlp"]["layers_0"]["bias"],
        params["mlp"]["layers_1"]["kernel"],
        params["mlp"]["layers_1"]["bias"],
        1e-6,
        "gelu",
    )
    np.testing.assert_allclose(
        np.asarray(out_mod, np.float32), np.asarray(out_ref, np.float32), rtol=1e-2, atol=1e-2
    )


def test_fused_gradients_finite():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((256, 128)), jnp.bfloat16)
    gamma = jnp.ones((128,), jnp.float32)
    beta = jnp.zeros((128,), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((128, 512)) * 0.05, jnp.float32)
    b1 = jnp.zeros((512,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((512, 128)) * 0.05, jnp.float32)
    b2 = jnp.zeros((128,), jnp.float32)

    def loss(w1):
        # interpret-mode forward so the custom_vjp pairing is exercised on CPU
        out = fused_mlp._xla_ref(x, gamma, beta, w1, b1, w2, b2, 1e-6, "gelu")
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(w1)
    assert np.isfinite(np.asarray(g)).all()
