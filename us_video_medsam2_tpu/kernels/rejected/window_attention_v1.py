"""Fused windowed-attention Pallas TPU kernel for the Hiera trunk.

Replaces the whole attention half of a Hiera block (reference
sam2/modeling/backbones/hieradet.py:39-157): LayerNorm -> qkv projection ->
window partition -> (optional 2x2 q max-pool) -> SDPA -> head merge -> output
projection -> window unpartition, in ONE pass over HBM.

Why: the XLA lowering of this sequence is dominated by data formatting — the
window partition/unpartition transposes, qkv head-split reshapes, and the f32
softmax materialization together cost ~30% of propagation device time (see
docs/ROADMAP.md round-2 trace). Here windows are never materialized: the grid
walks window rows straight out of the spatial [B, H, W, C] layout, tokens are
formed by an in-VMEM reshape, per-head projections are separate small MXU dots
(wq/wk/wv pre-split per head outside), softmax runs in f32 registers, and heads
accumulate into an f32 VMEM scratch that is written back once as bf16 in the
spatial layout.

Numerics match the XLA module path: f32 LN statistics, bf16 matmul inputs with
f32 MXU accumulation, f32 softmax with max subtraction, probabilities rounded
to bf16 before the value dot (as ops/attention.py::sdpa does), f32 head
accumulation rounded once at the end. Zero-padded window tokens participate in
softmax exactly like the reference (hieradet pads with zeros and does not mask).

Backward = XLA recompute of the same math via custom_vjp (the trunk is
remat'd in training anyway, so only the forward is hot).

STATUS: A/B-tested on v5e and NOT wired into the model — XLA's batched-window
einsums (one dot over all 256 windows) beat this kernel's per-window
serialization 607us vs 1979us per frame across the 8 t512 block geometries
(docs/ROADMAP.md round-2 outcomes). Kept because the fused form wins when
window counts are small and weights are large (future bigger-backbone configs)
and as the reference implementation for _xla_ref's layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_f32(x, gamma, beta, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * gamma + beta).astype(x.dtype)


def _kernel(
    x_ref,      # [1, ws, Wp, C]
    g_ref,      # [1, C] f32 (LN scale; unused if not ln_inside)
    b_ref,      # [1, C] f32
    wq_ref,     # [1, C, Dh]
    wk_ref,     # [1, C, Dh]
    wv_ref,     # [1, C, Dh]
    bq_ref,     # [1, 1, Dh] f32
    bk_ref,     # [1, 1, Dh] f32
    bv_ref,     # [1, 1, Dh] f32
    wo_ref,     # [1, Dh, Co]
    bo_ref,     # [1, Co] f32
    out_ref,    # [1, wso, Wpo, Co]
    acc_ref,    # scratch [wso, Wpo, Co] f32
    *,
    ws: int,
    n_win: int,
    n_heads: int,
    q_pool: bool,
    ln_inside: bool,
    eps: float,
):
    h_idx = pl.program_id(2)
    n = ws * ws
    dh = wq_ref.shape[2]
    scale = dh ** -0.5
    wso = ws // 2 if q_pool else ws
    nq = wso * wso
    dtype = x_ref.dtype

    wq = wq_ref[0]
    wk = wk_ref[0]
    wv = wv_ref[0]

    for j in range(n_win):
        xw = x_ref[0, :, j * ws : (j + 1) * ws, :].reshape(n, x_ref.shape[3])
        if ln_inside:
            y = _ln_f32(xw, g_ref[0, :], b_ref[0, :], eps)
        else:
            y = xw
        q = (
            jax.lax.dot_general(
                y, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            + bq_ref[0, 0, :]
        ).astype(dtype)
        k = (
            jax.lax.dot_general(
                y, wk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            + bk_ref[0, 0, :]
        ).astype(dtype)
        v = (
            jax.lax.dot_general(
                y, wv, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            + bv_ref[0, 0, :]
        ).astype(dtype)
        if q_pool:
            q = q.reshape(ws // 2, 2, ws // 2, 2, dh).max(axis=(1, 3)).reshape(nq, dh)
        logits = (
            jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            * scale
        )
        p = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        contrib = jax.lax.dot_general(
            o, wo_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        contrib = contrib.reshape(wso, wso, out_ref.shape[3])
        sl = (slice(None), slice(j * wso, (j + 1) * wso), slice(None))

        @pl.when(h_idx == 0)
        def _init():
            acc_ref[sl] = contrib

        @pl.when(h_idx > 0)
        def _acc():
            acc_ref[sl] = acc_ref[sl] + contrib

    @pl.when(h_idx == n_heads - 1)
    def _flush():
        out_ref[0] = (acc_ref[...] + bo_ref[0, :]).astype(out_ref.dtype)


def _run(
    x, gamma, beta, wq, wk, wv, bq, bk, bv, wo, bo,
    *, ws, q_pool, ln_inside, eps, interpret=False,
):
    b, hp, wp, c = x.shape
    n_heads, _, dh = wq.shape
    co = wo.shape[2]
    n_rows, n_win = hp // ws, wp // ws
    wso = ws // 2 if q_pool else ws
    dt = x.dtype

    def wcast(w):
        return w.astype(dt)

    kern = functools.partial(
        _kernel, ws=ws, n_win=n_win, n_heads=n_heads,
        q_pool=q_pool, ln_inside=ln_inside, eps=eps,
    )
    flops_win = 2 * (ws * ws) * c * dh * 3 + 2 * (wso * wso) * (ws * ws) * dh * 2
    out = pl.pallas_call(
        kern,
        grid=(b, n_rows, n_heads),
        in_specs=[
            pl.BlockSpec((1, ws, wp, c), lambda bi, i, h: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, i, h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda bi, i, h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, dh), lambda bi, i, h: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, dh), lambda bi, i, h: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, dh), lambda bi, i, h: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dh), lambda bi, i, h: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dh), lambda bi, i, h: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dh), lambda bi, i, h: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh, co), lambda bi, i, h: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda bi, i, h: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, wso, n_win * wso, co), lambda bi, i, h: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_rows * wso, n_win * wso, co), dt),
        scratch_shapes=[pltpu.VMEM((wso, n_win * wso, co), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=b * n_rows * n_win * n_heads * flops_win,
            bytes_accessed=(x.size + b * n_rows * n_win * wso * wso * co)
            * x.dtype.itemsize,
            transcendentals=b * n_rows * n_win * n_heads * (wso * wso) * (ws * ws),
        ),
        interpret=interpret,
    )(
        x,
        gamma.reshape(1, c).astype(jnp.float32),
        beta.reshape(1, c).astype(jnp.float32),
        wcast(wq), wcast(wk), wcast(wv),
        bq.reshape(n_heads, 1, dh).astype(jnp.float32),
        bk.reshape(n_heads, 1, dh).astype(jnp.float32),
        bv.reshape(n_heads, 1, dh).astype(jnp.float32),
        wcast(wo),
        bo.reshape(1, co).astype(jnp.float32),
    )
    return out


def _xla_ref(x, gamma, beta, wq, wk, wv, bq, bk, bv, wo, bo, ws, q_pool, ln_inside, eps):
    """Same math in XLA — numerical reference and VJP body."""
    b, hp, wp, c = x.shape
    n_heads, _, dh = wq.shape
    co = wo.shape[2]
    dt = x.dtype
    if ln_inside:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = ((xf - mean) * jax.lax.rsqrt(var + eps) * gamma + beta).astype(dt)
    else:
        y = x
    # windows [B, nH, nW, ws, ws, C] -> tokens
    nh, nw = hp // ws, wp // ws
    yw = y.reshape(b, nh, ws, nw, ws, c).transpose(0, 1, 3, 2, 4, 5)
    yw = yw.reshape(b * nh * nw, ws * ws, c)
    q = jnp.einsum("bnc,hcd->bhnd", yw, wq.astype(dt),
                   preferred_element_type=jnp.float32) + bq[None, :, None, :]
    k = jnp.einsum("bnc,hcd->bhnd", yw, wk.astype(dt),
                   preferred_element_type=jnp.float32) + bk[None, :, None, :]
    v = jnp.einsum("bnc,hcd->bhnd", yw, wv.astype(dt),
                   preferred_element_type=jnp.float32) + bv[None, :, None, :]
    q, k, v = q.astype(dt), k.astype(dt), v.astype(dt)
    wso = ws
    if q_pool:
        wso = ws // 2
        q = q.reshape(-1, n_heads, ws // 2, 2, ws // 2, 2, dh).max(axis=(3, 5))
        q = q.reshape(-1, n_heads, wso * wso, dh)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (dh ** -0.5)
    p = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(dt), v,
                   preferred_element_type=jnp.float32).astype(dt)
    out = jnp.einsum("bhqd,hdc->bqc", o, wo.astype(dt),
                     preferred_element_type=jnp.float32) + bo
    out = out.astype(dt).reshape(b, nh, nw, wso, wso, co)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, nh * wso, nw * wso, co)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14))
def window_attention(x, gamma, beta, wq, wk, wv, bq, bk, bv, wo, bo,
                     ws, q_pool, ln_inside, eps):
    """Fused Hiera attention half over spatial [B, Hp, Wp, C] (pre-padded to
    multiples of ws). Returns [B, Hp(/2), Wp(/2), Co]. Forward: Pallas;
    backward: XLA recompute."""
    return _run(x, gamma, beta, wq, wk, wv, bq, bk, bv, wo, bo,
                ws=ws, q_pool=q_pool, ln_inside=ln_inside, eps=eps)


def _fwd(x, gamma, beta, wq, wk, wv, bq, bk, bv, wo, bo, ws, q_pool, ln_inside, eps):
    out = _run(x, gamma, beta, wq, wk, wv, bq, bk, bv, wo, bo,
               ws=ws, q_pool=q_pool, ln_inside=ln_inside, eps=eps)
    return out, (x, gamma, beta, wq, wk, wv, bq, bk, bv, wo, bo)


def _bwd(ws, q_pool, ln_inside, eps, res, g):
    _, vjp = jax.vjp(
        lambda *a: _xla_ref(*a, ws, q_pool, ln_inside, eps), *res
    )
    return vjp(g)


window_attention.defvjp(_fwd, _bwd)


def window_attention_available(hp: int, wp: int, c: int, n_heads: int, ws: int, dtype) -> bool:
    """TPU + bf16 + even pooling + VMEM fit (x row block + logits + weights)."""
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False
    if not on_tpu or dtype != jnp.bfloat16 or ws <= 0:
        return False
    if hp % ws or wp % ws:
        return False
    n = ws * ws
    dh_pad = 128  # lane padding of the 96-dim heads
    row_bytes = ws * wp * c * 2
    logit_bytes = n * max(n, 8) * 4
    qkv_bytes = 3 * n * dh_pad * 2
    weight_bytes = 3 * c * dh_pad * 2 + dh_pad * c * 2
    acc_bytes = ws * wp * c * 4  # upper bound (co >= c transition handled below)
    total = row_bytes + logit_bytes + qkv_bytes + weight_bytes + 2 * acc_bytes
    return total <= 12 * 2 ** 20


def split_qkv_params(wqkv: jnp.ndarray, bqkv: jnp.ndarray, wproj: jnp.ndarray,
                     n_heads: int):
    """[C, 3*Do], [3*Do], [Do, Do] -> per-head wq/wk/wv [H, C, Dh], bq/bk/bv
    [H, Dh], wo [H, Dh, Do]. Loop-invariant — XLA hoists it out of the frame
    scan."""
    c, three_do = wqkv.shape
    do = three_do // 3
    dh = do // n_heads
    w = wqkv.reshape(c, 3, n_heads, dh)
    bqkv_ = bqkv.reshape(3, n_heads, dh)
    wq = w[:, 0].transpose(1, 0, 2)
    wk = w[:, 1].transpose(1, 0, 2)
    wv = w[:, 2].transpose(1, 0, 2)
    wo = wproj.reshape(n_heads, dh, wproj.shape[1])
    return wq, wk, wv, bqkv_[0], bqkv_[1], bqkv_[2], wo
