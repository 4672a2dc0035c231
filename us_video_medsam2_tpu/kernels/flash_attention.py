"""Pallas TPU flash attention with per-key boolean masking.

The memory-attention hot path (SURVEY §3: 2nd hottest op) cross-attends 1024
query tokens to ~10k memory-bank keys per frame. The XLA path materializes the
[B, H, Lq, Lk] logits and probabilities in HBM; this kernel keeps everything in
VMEM with online softmax (never materializing the score matrix), fusing the
key-validity mask of the fixed-shape memory bank.

Used by ops.attention.sdpa when shapes qualify (TPU, aligned dims); every call
site keeps the XLA fallback, and parity is tested in tests/test_flash_kernel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(
    q_ref,  # [BQ, D]
    k_ref,  # [Lk, D]
    v_ref,  # [Lk, D]
    mask_ref,  # [1, Lk] int32 (1 = attend)  — leading singleton from the block
    out_ref,  # [BQ, D]
    *,
    block_k: int,
    scale: float,
):
    bq, d = q_ref.shape
    lk = k_ref.shape[0]
    num_kb = lk // block_k

    # matmul inputs stay in the activation dtype (bf16) with f32 MXU
    # accumulation — identical numerics to ops/attention.py::sdpa and 4-8x the
    # MXU rate of f32 operands; only softmax statistics are f32
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

        m_cur = jnp.max(s, axis=1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new[:, None])
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    out_ref[:] = (acc / jnp.maximum(l, 1e-30)[:, None]).astype(out_ref.dtype)


def _pad_to(x, axis, mult):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x, size
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), size


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention_masked(
    q: jnp.ndarray,  # [B, H, Lq, D]
    k: jnp.ndarray,  # [B, H, Lk, D]
    v: jnp.ndarray,  # [B, H, Lk, D]
    key_mask: jnp.ndarray | None = None,  # [B, Lk] bool
    block_q: int = 256,
    block_k: int = 512,
) -> jnp.ndarray:
    b, h, lq, d = q.shape
    lk = k.shape[2]
    scale = d**-0.5

    q, lq0 = _pad_to(q, 2, block_q)
    k, _ = _pad_to(k, 2, block_k)
    v, _ = _pad_to(v, 2, block_k)
    lkp = k.shape[2]
    if key_mask is None:
        key_mask = jnp.ones((b, lk), bool)
    mask = jnp.pad(key_mask.astype(jnp.int32), ((0, 0), (0, lkp - lk)))
    lqp = q.shape[2]

    qf = q.reshape(b * h, lqp, d)
    kf = k.reshape(b * h, lkp, d)
    vf = v.reshape(b * h, lkp, d)
    maskf = (jnp.repeat(mask, h, axis=0) if h > 1 else mask).reshape(b * h, 1, lkp)

    grid = (b * h, lqp // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, lkp, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, lkp, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, lkp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, lqp, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * lqp * lkp * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * q.dtype.itemsize,
            transcendentals=b * h * lqp * lkp,
        ),
    )(qf, kf, vf, maskf)
    return out.reshape(b, h, lqp, d)[:, :, :lq0]


def flash_attention_available(q_shape, k_shape, dtype=None, min_batch: int = 2) -> bool:
    """Whether the Pallas path applies: TPU backend, lane-aligned head dim, and
    K/V fitting comfortably in VMEM (current kernel keeps full K/V resident).

    `min_batch` tunes only the heuristic batch gate (force_flash callers pass 1
    to engage at batch 1); the hard VMEM/alignment requirements always hold."""
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False
    d = q_shape[-1]
    lk = k_shape[-2]
    itemsize = jnp.dtype(dtype).itemsize if dtype is not None else 4
    kv_bytes = 2 * lk * d * itemsize
    batch = q_shape[0] * q_shape[1]
    # batch 1 long-KV was A/B-tested in round 2: the kernel hits 73% MFU but
    # XLA's fusions are already ~85% MFU there and the pad/reshape formatting
    # around the call costs more than the fusion saves (bench 317 -> 299 FPS);
    # it wins only from batch 2 upward (multi-object tracking, batched prompts)
    return (
        on_tpu
        and batch >= min_batch
        and d % 128 == 0
        and q_shape[-2] >= 128
        and kv_bytes <= 11 * 2**20
    )


# ---------------------------------------------------------------- custom vjp
# forward = Pallas kernel; backward = standard attention gradients recomputed in
# XLA (flash backward kernels land later; recompute keeps training correct).
@functools.partial(jax.custom_vjp, nondiff_argnums=())
def flash_attention(q, k, v, key_mask):
    return flash_attention_masked(q, k, v, key_mask)


def _flash_fwd(q, k, v, key_mask):
    return flash_attention_masked(q, k, v, key_mask), (q, k, v, key_mask)


def _flash_bwd(res, g):
    q, k, v, key_mask = res
    d = q.shape[-1]
    scale = d**-0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if key_mask is not None:
        s = jnp.where(key_mask[:, None, None, :], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    gf = g.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, gf)
    dp = jnp.einsum("bhqd,bhkd->bhqk", gf, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32)) * scale
    dmask = (
        None
        if key_mask is None
        else jnp.zeros(key_mask.shape, dtype=jax.dtypes.float0)
    )
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), dmask


flash_attention.defvjp(_flash_fwd, _flash_bwd)
