"""Parity + gradient tests for the dropout-capable training flash kernel.

Reference semantics: dropout applied to the softmax probabilities
(reference sam2/modeling/sam/transformer.py:340-344). The kernel's dropout
mask is the coordinate-hash `keep_mask_reference`, so an XLA reference using
the SAME mask must match the kernel bitwise-modulo-float-rounding in both the
forward and all three input gradients. Runs in Pallas interpret mode on CPU.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from us_video_medsam2_tpu.kernels import flash_dropout as fd


def _xla_reference(q, k, v, mask, seed, rate):
    """Dropout-after-softmax attention with the kernel's exact keep mask."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * (
        d**-0.5
    )
    if mask is not None:
        s = jnp.where(mask[:, None, None, :], s, fd.NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    if rate > 0.0:
        keep = fd.keep_mask_reference(b * h, lq, lk, seed, rate).reshape(b, h, lq, lk)
        p = jnp.where(keep, p / (1.0 - rate), 0.0)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


def _inputs(b=2, h=1, lq=256, lk=640, d=128, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, h, lq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, lk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, lk, d)), jnp.float32)
    mask = jnp.asarray(rng.random((b, lk)) > 0.2)
    return q, k, v, mask


def test_keep_mask_rate_and_determinism():
    m1 = np.asarray(fd.keep_mask_reference(3, 64, 512, 42, 0.1))
    m2 = np.asarray(fd.keep_mask_reference(3, 64, 512, 42, 0.1))
    m3 = np.asarray(fd.keep_mask_reference(3, 64, 512, 43, 0.1))
    assert (m1 == m2).all(), "same seed must give an identical mask"
    assert (m1 != m3).any(), "different seed must change the mask"
    assert abs(m1.mean() - 0.9) < 0.01, f"keep rate {m1.mean()} != 0.9"


@pytest.mark.parametrize("rate", [0.0, 0.1])
def test_forward_matches_reference(rate):
    q, k, v, mask = _inputs()
    ref = _xla_reference(q, k, v, mask, 7, rate)
    got = fd.flash_attention_train(
        q, k, v, mask, 7, rate, 128, 128, True  # interpret mode
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("rate", [0.0, 0.1])
def test_gradients_match_reference(rate):
    """dq/dk/dv of the custom VJP vs jax.grad through the XLA reference with
    the identical dropout mask — verifies the backward-kernel math incl. the
    delta identity under dropout."""
    q, k, v, mask = _inputs(b=1, h=2, lq=200, lk=384)  # unaligned lq: pad path

    def loss_kernel(q, k, v):
        out = fd.flash_attention_train(q, k, v, mask, 7, rate, 128, 128, True)
        return jnp.sum(out * jnp.cos(out))  # non-trivial cotangent

    def loss_ref(q, k, v):
        out = _xla_reference(q, k, v, mask, 7, rate)
        return jnp.sum(out * jnp.cos(out))

    g_k = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for got, ref, name in zip(g_k, g_r, "qkv"):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=5e-4, atol=5e-4,
            err_msg=f"d{name} mismatch",
        )


def test_tiling_invariance_of_dropout():
    """The mask is a function of global coordinates only: different block
    sizes must produce the identical forward output."""
    q, k, v, mask = _inputs(lq=256, lk=512)
    a = fd.flash_attention_train(q, k, v, mask, 3, 0.1, 128, 128, True)
    b = fd.flash_attention_train(q, k, v, mask, 3, 0.1, 256, 256, True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


def test_bf16_path_runs():
    q, k, v, mask = _inputs()
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    ref = _xla_reference(qb, kb, vb, mask, 5, 0.1)
    got = fd.flash_attention_train(qb, kb, vb, mask, 5, 0.1, 128, 128, True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2
    )


def test_remat_form_matches_train_form():
    """flash_attention_train_remat under jax.checkpoint with the
    save_only_these_names(FLASH_RESID) policy (the train-step configuration,
    train_model.py::_remat_policy) must produce the identical forward and
    identical q/k/v gradients as the plain custom_vjp form — the saved
    (out, lse) replace the backward's fwd-kernel re-run, nothing else."""
    q, k, v, mask = _inputs(lq=256, lk=512)
    policy = jax.checkpoint_policies.save_only_these_names(fd.FLASH_RESID)

    def loss_plain(q, k, v):
        out = fd.flash_attention_train(q, k, v, mask, 7, 0.1, 128, 128, True)
        return jnp.sum(out * jnp.cos(out))

    @functools.partial(jax.checkpoint, policy=policy)
    def loss_remat(q, k, v):
        out = fd.flash_attention_train_remat(q, k, v, mask, 7, 0.1, 128, 128, True)
        return jnp.sum(out * jnp.cos(out))

    np.testing.assert_array_equal(
        np.asarray(loss_plain(q, k, v)), np.asarray(loss_remat(q, k, v))
    )
    g_p = jax.grad(loss_plain, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_remat, argnums=(0, 1, 2))(q, k, v)
    for got, ref, name in zip(g_r, g_p, "qkv"):
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(ref), err_msg=f"d{name} mismatch"
        )
