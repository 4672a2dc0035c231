"""Pallas one-pass LayerNorm (kernels/fused_ln.py) vs the XLA-form LayerNorm.

The kernel computes the identical f32 fast-variance op sequence per row, so
forward results must match the models/layers.py::LayerNorm math to roundoff
and gradients must match the XLA reference exactly (the backward IS the XLA
reference via custom_vjp).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from us_video_medsam2_tpu.kernels import fused_ln


@pytest.mark.parametrize("rows,d", [(1024, 96), (2048, 384), (4096, 256), (12288, 96)])
def test_forward_matches_xla_ref(rows, d):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((rows, d)) * 2 + 0.5, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal(d), jnp.float32)
    b = jnp.asarray(rng.standard_normal(d), jnp.float32)
    got = fused_ln._run(x, w, b, 1e-6, interpret=True)
    ref = fused_ln._xla_ref(x, w, b, 1e-6, x.dtype)
    # the mean/E[x²] reduction tree differs between the Pallas interpreter and
    # XLA's reduce lowering, so ~1e-7-relative stat differences round a few
    # outputs to the neighbouring bf16 value: allow exactly that (1 ulp of
    # bf16 = 2^-8 relative), nothing more
    g = np.asarray(got, np.float32)
    r = np.asarray(ref, np.float32)
    np.testing.assert_allclose(g, r, rtol=2 ** -7, atol=1e-5)
    assert np.mean(g != r) < 1e-3  # bit-identical except rare rounding ties


def test_grad_is_xla_reference():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1024, 96)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal(96), jnp.float32)
    b = jnp.asarray(rng.standard_normal(96), jnp.float32)

    # forward routes through the pallas_call; on CPU run it in interpret mode
    # by monkeypatching _run's default (the public entry has interpret baked
    # off — exercise the vjp wiring, whose backward never touches Pallas)
    import functools

    orig = fused_ln._run
    fused_ln._run = functools.partial(orig, interpret=True)
    try:
        def loss_pallas(x, w, b):
            return jnp.sum(fused_ln.layer_norm_pallas(x, w, b, 1e-6).astype(jnp.float32) ** 2)

        def loss_ref(x, w, b):
            return jnp.sum(fused_ln._xla_ref(x, w, b, 1e-6, x.dtype).astype(jnp.float32) ** 2)

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, w, b)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
        # the backward is literally the XLA reference's vjp; the only
        # difference enters through the forward's 1-ulp output rounding
        # (squared-loss cotangent = 2*out), so gradients agree to that
        for a, r, name in zip(gp, gr, ("dx", "dw", "db")):
            np.testing.assert_allclose(
                np.asarray(a, np.float32),
                np.asarray(r, np.float32),
                rtol=2 ** -6,
                atol=1e-3,
                err_msg=name,
            )
    finally:
        fused_ln._run = orig


def test_availability_gate():
    # tiny maps and misaligned row counts stay on the XLA path
    assert not fused_ln.layer_norm_pallas_available((5, 256), jnp.bfloat16)
    assert fused_ln._pick_bn(16384) == 4096
    assert fused_ln._pick_bn(256 * 3) in (0, 256, 512, 1024, 2048)  # 768 rows
