"""Pallas flash-attention parity vs the XLA sdpa reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from us_video_medsam2_tpu.ops.attention import sdpa


def _run_interpret(q, k, v, mask, block_q=128, block_k=128):
    """Run the kernel in interpreter mode (tests run on CPU)."""
    from jax.experimental.pallas import tpu as pltpu

    from us_video_medsam2_tpu.kernels import flash_attention as fa

    with pltpu.force_tpu_interpret_mode():
        return fa.flash_attention_masked(
            q, k, v, mask, block_q=block_q, block_k=block_k
        )


@pytest.mark.parametrize("lq,lk", [(128, 384), (256, 512)])
def test_flash_matches_sdpa(lq, lk):
    rng = np.random.default_rng(0)
    b, h, d = 2, 1, 128
    q = jnp.asarray(rng.standard_normal((b, h, lq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, lk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, lk, d)), jnp.float32)
    mask = jnp.asarray(rng.random((b, lk)) > 0.3)
    ref = sdpa(q, k, v, key_mask=mask)
    got = _run_interpret(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_unaligned_lengths_padded():
    rng = np.random.default_rng(1)
    b, h, d = 1, 2, 128
    lq, lk = 200, 300  # not multiples of the blocks
    q = jnp.asarray(rng.standard_normal((b, h, lq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, lk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, lk, d)), jnp.float32)
    mask = jnp.ones((b, lk), bool)
    ref = sdpa(q, k, v, key_mask=mask)
    got = _run_interpret(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)
