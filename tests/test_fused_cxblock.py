"""Fused ConvNeXt-block Pallas kernel vs the XLA module math.

The kernel (kernels/fused_cxblock.py) replaces the memory-encoder fuser block
(reference sam2/modeling/memory_encoder.py:62-117) on TPU at bf16; here it runs
in Pallas interpret mode on CPU and must match the module-path numerics.
The module path itself (CXBlock -> _xla_ref) stays covered by the
memory-encoder golden-fixture test in test_parity.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from us_video_medsam2_tpu.kernels import fused_cxblock


def _params(rng, c):
    return dict(
        dw_w=jnp.asarray(rng.standard_normal((7, 7, 1, c)) * 0.1, jnp.float32),
        dw_b=jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32),
        ln_s=jnp.asarray(rng.standard_normal((c,)) * 0.1 + 1.0, jnp.float32),
        ln_b=jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32),
        w1=jnp.asarray(rng.standard_normal((c, 4 * c)) / np.sqrt(c), jnp.float32),
        b1=jnp.asarray(rng.standard_normal((4 * c,)) * 0.1, jnp.float32),
        w2=jnp.asarray(rng.standard_normal((4 * c, c)) / np.sqrt(4 * c), jnp.float32),
        b2=jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32),
        gamma=jnp.asarray(rng.standard_normal((c,)) * 0.01, jnp.float32),
    )


@pytest.mark.parametrize("b,h,w,c", [(1, 32, 32, 256), (2, 16, 16, 128)])
def test_fused_cxblock_matches_xla_ref(b, h, w, c):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.bfloat16)
    p = _params(rng, c)
    out_k = fused_cxblock._run(x, *p.values(), eps=1e-6, interpret=True)
    out_ref = fused_cxblock._xla_ref(x, *p.values(), 1e-6)
    assert out_k.shape == out_ref.shape
    np.testing.assert_allclose(
        np.asarray(out_k, np.float32),
        np.asarray(out_ref, np.float32),
        rtol=2e-2,
        atol=2e-2,
    )


def test_fused_cxblock_grad_is_xla_recompute():
    """custom_vjp backward must equal the XLA reference gradient exactly
    (it IS the reference composition, recomputed)."""
    rng = np.random.default_rng(3)
    c = 128
    x = jnp.asarray(rng.standard_normal((1, 8, 8, c)), jnp.float32)
    p = _params(rng, c)

    # the defvjp backward rule recomputes _xla_ref: its cotangents must equal
    # jax.vjp of the reference composition on the same inputs
    _, vjp = jax.vjp(
        lambda a, *r: fused_cxblock._xla_ref(a, *r, 1e-6), x, *p.values()
    )
    grad = 2 * fused_cxblock._xla_ref(x, *p.values(), 1e-6)
    cot_ref = vjp(grad)
    cot_bwd = fused_cxblock._bwd(1e-6, (x, *p.values()), grad)
    assert len(cot_ref) == len(cot_bwd) == 10
    for a, b_ in zip(cot_ref, cot_bwd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-6, atol=1e-6)
