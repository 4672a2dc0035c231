"""Dropout-capable Pallas flash attention for the TRAINING memory cross-attention.

The reference applies attention-weight dropout inside memory attention
(sam2/modeling/sam/transformer.py:340-344, p=0.1 via memory_attention.py). On
the training path that forced ops/attention.py's manual branch: XLA
materializes the [B, H, Lq, Lk] probability matrix AND its dropout mask in HBM
for both the forward and the jvp — the round-2 training trace attributed
~36 ms/step to exactly this. This kernel keeps everything tile-resident:

- forward: online-softmax flash attention; dropout is applied to the
  UNNORMALIZED tile probabilities and the normalizer accumulates undropped
  sums, which equals dropout-after-softmax exactly. Emits the logsumexp row
  statistics for the backward.
- backward: one Pallas kernel over (batch*head, k-block) programs recomputes
  each probability tile from the saved logsumexp, regenerates the identical
  dropout mask, and accumulates dq across k-blocks in a VMEM-resident output
  while emitting dk/dv per block. Uses the flash identity
  delta_i = sum_d g_id * out_id = sum_k dP_ik P_ik, which still holds under
  dropout (the mask transfers between the two factors).

Reproducible dropout WITHOUT pltpu.prng_random_bits: the keep decision for
logical element (bh, q, kcol) is a murmur3-finalizer hash of its GLOBAL
coordinates mixed with the seed. That makes the mask (a) bitwise identical
between forward and backward regardless of tiling, (b) independent of padding
and block sizes, and (c) computable in plain jnp — the XLA fallback path
(ops/attention) and the parity tests use the same `keep_mask_reference`, so
training draws the same dropout pattern on CPU and TPU. (The in-kernel TPU
PRNG (pltpu.prng_seed) has no CPU lowering in jax 0.9, which would have made
the fallback/test paths diverge.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# murmur3 fmix32 constants as int32 (wrapping arithmetic)
_M1 = -2048144789  # 0x85ebca6b
_M2 = -1028477387  # 0xc2b2ae35
_GOLD = -1640531527  # 0x9e3779b9
_SIGN = -2147483648  # 0x80000000


def _srl(x, n):
    return jax.lax.shift_right_logical(x, jnp.int32(n))


def _keep_from_idx(idx, seed, thr_i32):
    """Bernoulli keep decision per int32 element index (wrapping int32 math).

    murmur3 finalizer over idx ^ (seed * golden-ratio); unsigned threshold
    compare done in int32 by flipping the sign bit of both sides.
    """
    h = idx ^ (seed * jnp.int32(_GOLD))
    h = h ^ _srl(h, 16)
    h = h * jnp.int32(_M1)
    h = h ^ _srl(h, 13)
    h = h * jnp.int32(_M2)
    h = h ^ _srl(h, 16)
    return (h ^ jnp.int32(_SIGN)) >= jnp.int32(thr_i32)


def _thr_i32(rate: float) -> int:
    """Static signed-int32 threshold: P(keep) = 1 - rate."""
    thr_u = min(int(round(rate * 2.0**32)), 2**32 - 1)
    return thr_u - 2**31


def keep_mask_reference(bh: int, lq: int, lk: int, seed, rate: float):
    """[bh, lq, lk] bool keep mask — the exact mask the kernels draw, built in
    plain jnp (used by the XLA fallback and the parity tests)."""
    thr = _thr_i32(rate)
    row = jax.lax.broadcasted_iota(jnp.int32, (bh, lq, lk), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (bh, lq, lk), 2)
    b = jax.lax.broadcasted_iota(jnp.int32, (bh, lq, lk), 0)
    idx = (b * jnp.int32(lq) + row) * jnp.int32(lk) + col
    return _keep_from_idx(idx, jnp.asarray(seed, jnp.int32), thr)


def _tile_keep(i, q0, k0, bq, bk, lq, lk, seed, thr):
    """Keep tile [bq, bk] for global q rows q0..q0+bq, key cols k0..k0+bk of
    batch-head i. Logical strides (lq, lk) — padded coords alias harmlessly
    into masked/ignored territory."""
    r = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + q0
    c = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + k0
    idx = (i * jnp.int32(lq) + r) * jnp.int32(lk) + c
    return _keep_from_idx(idx, seed, thr)


# ------------------------------------------------------------------- forward
def _fwd_kernel(
    seed_ref,  # [1, 1] int32 SMEM
    q_ref,  # [BQ, D]
    k_ref,  # [Lkp, D]
    v_ref,  # [Lkp, D]
    mask_ref,  # [1, Lkp] int32
    out_ref,  # [BQ, D]
    lse_ref,  # [BQ, 1] f32
    *,
    block_k: int,
    scale: float,
    rate: float,
    lq: int,
    lk: int,
):
    bq, d = q_ref.shape
    lkp = k_ref.shape[0]
    i = pl.program_id(0)
    j = pl.program_id(1)
    seed = seed_ref[0, 0]
    thr = _thr_i32(rate)
    inv_keep = 1.0 / (1.0 - rate)

    q = q_ref[:]

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[pl.ds(kb * block_k, block_k), :]
        v = v_ref[pl.ds(kb * block_k, block_k), :]
        s = (
            jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            * scale
        )  # [BQ, BK] f32
        mask = mask_ref[:, pl.ds(kb * block_k, block_k)]  # [1, BK]
        s = jnp.where(mask != 0, s, NEG_INF)

        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        # normalizer accumulates UNDROPPED sums (dropout acts after softmax)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        if rate > 0.0:
            keep = _tile_keep(i, j * bq, kb * block_k, bq, block_k, lq, lk, seed, thr)
            p = jnp.where(keep, p * inv_keep, 0.0)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, lkp // block_k, body, (acc0, m0, l0))
    l_safe = jnp.maximum(l, 1e-30)
    out_ref[:] = (acc / l_safe).astype(out_ref.dtype)
    lse_ref[:] = m + jnp.log(l_safe)


# ------------------------------------------------------------------ backward
def _bwd_kernel(
    seed_ref,  # [1, 1] int32 SMEM
    q_ref,  # [Lqp, D]   (resident across k-blocks)
    k_ref,  # [BK, D]
    v_ref,  # [BK, D]
    g_ref,  # [Lqp, D]
    lse_ref,  # [Lqp, 1] f32
    delta_ref,  # [Lqp, 1] f32
    mask_ref,  # [1, BK] int32
    dq_ref,  # [Lqp, D] f32  (accumulated across k-block programs)
    dk_ref,  # [BK, D]
    dv_ref,  # [BK, D]
    *,
    block_q: int,
    scale: float,
    rate: float,
    lq: int,
    lk: int,
):
    lqp, d = q_ref.shape
    bk = k_ref.shape[0]
    i = pl.program_id(0)
    j = pl.program_id(1)
    seed = seed_ref[0, 0]
    thr = _thr_i32(rate)
    inv_keep = 1.0 / (1.0 - rate)

    @pl.when(j == 0)
    def _():
        dq_ref[:] = jnp.zeros_like(dq_ref)

    k = k_ref[:]
    v = v_ref[:]
    mask = mask_ref[:]  # [1, BK]

    dk_acc = jnp.zeros((bk, d), jnp.float32)
    dv_acc = jnp.zeros((bk, d), jnp.float32)
    for qb in range(lqp // block_q):
        sl = pl.ds(qb * block_q, block_q)
        q = q_ref[sl, :]
        g = g_ref[sl, :]  # stays in the activation dtype: bf16 MXU operands
        lse = lse_ref[sl, :]  # [BQ, 1]
        delta = delta_ref[sl, :]  # [BQ, 1]

        s = (
            jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            * scale
        )
        s = jnp.where(mask != 0, s, NEG_INF)
        # p <= 1 mathematically (lse >= max s); the min() guards fully-masked
        # rows whose lse is at the NEG_INF floor
        p = jnp.exp(jnp.minimum(s - lse, 0.0))  # [BQ, BK]

        dpd = jax.lax.dot_general(  # d(out)/d(dropped probs): g @ v^T
            g.astype(v.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if rate > 0.0:
            keep = _tile_keep(i, qb * block_q, j * bk, block_q, bk, lq, lk, seed, thr)
            scaled = jnp.where(keep, inv_keep, 0.0)
            pd = p * scaled
            dp = dpd * scaled
        else:
            pd = p
            dp = dpd
        dv_acc = dv_acc + jax.lax.dot_general(
            pd.astype(g.dtype), g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)  # softmax jacobian, [BQ, BK] f32
        ds_c = ds.astype(q.dtype)
        dq_ref[sl, :] = dq_ref[sl, :] + jax.lax.dot_general(
            ds_c, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * jnp.float32(scale)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds_c, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * jnp.float32(scale)

    dk_ref[:] = dk_acc.astype(dk_ref.dtype)
    dv_ref[:] = dv_acc.astype(dv_ref.dtype)


def _pad_to(x, axis, mult):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(
    jax.jit, static_argnames=("rate", "block_q", "block_k", "interpret")
)
def _fwd_call(q, k, v, key_mask, seed, rate, block_q, block_k, interpret):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    scale = d**-0.5

    qp = _pad_to(q, 2, block_q)
    kp = _pad_to(k, 2, block_k)
    vp = _pad_to(v, 2, block_k)
    lqp, lkp = qp.shape[2], kp.shape[2]
    if key_mask is None:
        key_mask = jnp.ones((b, lk), bool)
    mask = jnp.pad(key_mask.astype(jnp.int32), ((0, 0), (0, lkp - lk)))

    qf = qp.reshape(b * h, lqp, d)
    kf = kp.reshape(b * h, lkp, d)
    vf = vp.reshape(b * h, lkp, d)
    maskf = (jnp.repeat(mask, h, axis=0) if h > 1 else mask).reshape(b * h, 1, lkp)
    seed2 = jnp.asarray(seed, jnp.int32).reshape(1, 1)

    grid = (b * h, lqp // block_q)
    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel, block_k=block_k, scale=scale, rate=rate, lq=lq, lk=lk
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, lkp, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, lkp, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, lkp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_q, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, lqp, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, lqp, 1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * lqp * lkp * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * q.dtype.itemsize,
            transcendentals=b * h * lqp * lkp,
        ),
        interpret=interpret,
    )(seed2, qf, kf, vf, maskf)
    return out.reshape(b, h, lqp, d)[:, :, :lq], lse


@functools.partial(
    jax.jit, static_argnames=("rate", "block_q", "block_k", "interpret")
)
def _bwd_call(q, k, v, key_mask, seed, lse, out, g, rate, block_q, block_k, interpret):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    scale = d**-0.5

    qp = _pad_to(q, 2, block_q)
    gp = _pad_to(g, 2, block_q)  # zero-padded rows contribute nothing
    op = _pad_to(out, 2, block_q)
    kp = _pad_to(k, 2, block_k)
    vp = _pad_to(v, 2, block_k)
    lqp, lkp = qp.shape[2], kp.shape[2]
    if key_mask is None:
        key_mask = jnp.ones((b, lk), bool)
    mask = jnp.pad(key_mask.astype(jnp.int32), ((0, 0), (0, lkp - lk)))

    # flash identity: delta_i = sum_d g_id out_id = sum_k dP_ik P_ik (holds
    # under dropout — the keep/scale factor transfers between the factors)
    delta = jnp.sum(gp.astype(jnp.float32) * op.astype(jnp.float32), -1, keepdims=True)

    qf = qp.reshape(b * h, lqp, d)
    gf = gp.reshape(b * h, lqp, d)
    kf = kp.reshape(b * h, lkp, d)
    vf = vp.reshape(b * h, lkp, d)
    deltaf = delta.reshape(b * h, lqp, 1)
    maskf = (jnp.repeat(mask, h, axis=0) if h > 1 else mask).reshape(b * h, 1, lkp)
    seed2 = jnp.asarray(seed, jnp.int32).reshape(1, 1)

    grid = (b * h, lkp // block_k)
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_kernel, block_q=block_q, scale=scale, rate=rate, lq=lq, lk=lk
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((None, lqp, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_k, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_k, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, lqp, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, lqp, 1), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, lqp, 1), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, block_k), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, lqp, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_k, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_k, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, lqp, d), jnp.float32),
            jax.ShapeDtypeStruct((b * h, lkp, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, lkp, d), v.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * h * lqp * lkp * d,
            bytes_accessed=2 * (qf.size + kf.size + vf.size) * q.dtype.itemsize,
            transcendentals=b * h * lqp * lkp,
        ),
        interpret=interpret,
    )(seed2, qf, kf, vf, gf, lse, deltaf, maskf)
    dq = dq.reshape(b, h, lqp, d)[:, :, :lq].astype(q.dtype)
    dk = dk.reshape(b, h, lkp, d)[:, :, :lk]
    dv = dv.reshape(b, h, lkp, d)[:, :, :lk]
    return dq, dk, dv


# -------------------------------------------------------------- public entry
@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8)
)
def flash_attention_train(
    q, k, v, key_mask, seed, rate=0.0, block_q=256, block_k=512, interpret=False
):
    """Flash attention with reproducible attention-weight dropout.

    q [B,H,Lq,D], k/v [B,H,Lk,D], key_mask [B,Lk] bool or None, seed: int32
    scalar (traced ok), rate: static dropout probability. Both passes are
    Pallas kernels; no [Lq, Lk] matrix ever reaches HBM.
    """
    out, _ = _fwd_call(q, k, v, key_mask, seed, rate, block_q, block_k, interpret)
    return out


def _train_fwd(q, k, v, key_mask, seed, rate, block_q, block_k, interpret):
    out, lse = _fwd_call(q, k, v, key_mask, seed, rate, block_q, block_k, interpret)
    return out, (q, k, v, key_mask, seed, lse, out)


def _train_bwd(rate, block_q, block_k, interpret, res, g):
    q, k, v, key_mask, seed, lse, out = res
    dq, dk, dv = _bwd_call(
        q, k, v, key_mask, seed, lse, out, g, rate, block_q, block_k, interpret
    )
    dmask = (
        None if key_mask is None else jnp.zeros(key_mask.shape, jax.dtypes.float0)
    )
    dseed = jnp.zeros((), jax.dtypes.float0)
    return dq, dk, dv, dmask, dseed


flash_attention_train.defvjp(_train_fwd, _train_bwd)


# ------------------------------------------------- remat-savable entry
# Under jax.checkpoint, a custom_vjp's residuals are produced by re-running
# its fwd rule in the backward pass — so the fwd Pallas kernel executed
# fwd + recompute + bwd per layer (~11 ms/step over the 4 memory-attention
# layers, round-3 trace). This split form computes (out, lse) with a PLAIN
# stop-gradient forward whose values are checkpoint_name'd; autodiff routes
# through an identity-forward custom_vjp that takes them as inputs. With
# jax.checkpoint(policy=save_only_these_names(FLASH_RESID)), the saved values
# satisfy the residuals and the fwd kernel is DCE'd from the recompute —
# verified to produce bit-identical gradients (tests/test_flash_dropout.py).
FLASH_RESID = "flash_dropout_resid"


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _flash_apply(
    q, k, v, key_mask, seed, out, lse, rate, block_q, block_k, interpret
):
    return out


def _apply_fwd(q, k, v, key_mask, seed, out, lse, rate, block_q, block_k, interpret):
    return out, (q, k, v, key_mask, seed, lse, out)


def _apply_bwd(rate, block_q, block_k, interpret, res, g):
    q, k, v, key_mask, seed, lse, out = res
    dq, dk, dv = _bwd_call(
        q, k, v, key_mask, seed, lse, out, g, rate, block_q, block_k, interpret
    )
    dmask = (
        None if key_mask is None else jnp.zeros(key_mask.shape, jax.dtypes.float0)
    )
    dseed = jnp.zeros((), jax.dtypes.float0)
    # out/lse enter via stop_gradient — zero cotangent by construction
    return dq, dk, dv, dmask, dseed, jnp.zeros_like(out), jnp.zeros_like(lse)


_flash_apply.defvjp(_apply_fwd, _apply_bwd)


def flash_attention_train_remat(
    q, k, v, key_mask, seed, rate=0.0, block_q=256, block_k=512, interpret=False
):
    """flash_attention_train whose fwd outputs survive an enclosing
    jax.checkpoint when its policy saves FLASH_RESID-named values."""
    from jax.ad_checkpoint import checkpoint_name

    out, lse = _fwd_call(
        jax.lax.stop_gradient(q),
        jax.lax.stop_gradient(k),
        jax.lax.stop_gradient(v),
        key_mask,
        seed,
        rate,
        block_q,
        block_k,
        interpret,
    )
    out = checkpoint_name(out, FLASH_RESID)
    lse = checkpoint_name(lse, FLASH_RESID)
    return _flash_apply(
        q, k, v, key_mask, seed, out, lse, rate, block_q, block_k, interpret
    )


def flash_train_available(q_shape, k_shape, dtype=None) -> bool:
    """Gate for the training kernel: TPU backend, lane-aligned head dim,
    full K/V per batch-head resident in VMEM, enough rows to tile."""
    import os

    if os.environ.get("US_MEDSAM2_DISABLE_FLASH_DROPOUT"):  # A/B escape hatch
        return False
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False
    d = q_shape[-1]
    lk = k_shape[-2]
    itemsize = jnp.dtype(dtype).itemsize if dtype is not None else 4
    kv_bytes = 2 * lk * d * itemsize
    return on_tpu and d % 128 == 0 and q_shape[-2] >= 128 and kv_bytes <= 11 * 2**20
