"""Fused windowed-attention Pallas TPU kernel, v2 (natural-layout IO).

Replaces the window partition -> (2x2 q max-pool) -> packed SDPA -> window
unpartition sequence of a Hiera block (reference
sam2/modeling/backbones/hieradet.py:39-81 plus the packed-window execution
documented in models/hiera.py::MultiScaleAttention), taking the qkv projection
output EXACTLY as the dense layer lays it out in HBM — [B, Hp, Wp, 3*nh*hd] —
and writing the attention output back in the spatial layout the out-projection
wants — [B, Hpo, Wpo, nh*hd]. The qkv/proj matmuls stay in XLA where they run
as single large MXU dots.

Why v2: the round-2 kernel (kernels/rejected/window_attention_v1.py) lost 3x to XLA
because it re-read the input once per head, did the q/k/v PROJECTIONS as
per-window [ws², C]x[C, 96] dots (lane-misaligned head_dim), and serialized
windows. But the round-3 propagation trace shows the XLA lowering of the
partition+softmax+unpartition itself costs ~24 ms/64f across the nine
windowed t512 blocks — almost all of it HBM traffic for the partition
transposes and the materialized f32 score matrices — against a ~9 ms floor of
reading qkv once and writing o once. This kernel hits that floor shape: one
grid program per (batch, window-row strip), windows re-laid out in VMEM
(batch-dim moves, no HBM), heads looped in-register, scores/probabilities
never leaving VMEM, with the same G = 128//Lk block-diagonal window packing
as the XLA path so the MXU sees [<=128, 128]x[128, <=128] dots.

Numerics match the XLA module path (models/hiera.py): f32 scores scaled after
the dot, f32 softmax with max subtraction, -1e30 block-diagonal bias whose
masked probabilities underflow to exact zeros, probabilities rounded to bf16
before the value dot, f32 AV accumulation rounded once. The only reassociation
difference is none — the per-window math is identical; packing groups differ
from the XLA path's flat-n grouping but masked terms are exact zeros either
way. Backward = XLA recompute via custom_vjp (the trunk is remat'd in
training, so only the forward is hot).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _pick_group(n_win: int, lk: int) -> int:
    """Largest divisor of n_win with g*lk <= 128 (g=1 when lk > 64)."""
    best = 1
    for g in range(2, n_win + 1):
        if n_win % g == 0 and g * lk <= 128:
            best = g
    return best


def _pick_raster_gc(ws: int, wp: int) -> int:
    """Column-consecutive window group size for the raster-packed path, or 0.

    Raster packing keeps tokens in the strip's native (row, col) order — every
    reshape is tile-exact (sublane counts stay multiples of 8), so the kernel
    does ZERO data reordering; windows are isolated by an index-arithmetic
    mask instead. Requires even ws (for the 2x2 q-pool slicing), ws² <= 128
    keys per window, group width a multiple of the 8-sublane tile, and the
    strip splitting evenly into groups. For t512 this covers ws ∈ {4, 8}
    (blocks 0-3, where the transpose-based v1 path lost to XLA) and leaves
    ws ∈ {14, 7} on the v1 path (where v1 already wins — round-3 trace)."""
    if ws % 2 or ws * ws > 128:
        return 0
    gc = 128 // (ws * ws)
    while gc > 0 and ((gc * ws) % 8 or wp % (gc * ws)):
        gc -= 1
    return gc


def _softmax_av(s, v, out_dtype):
    p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    return jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)


def _qk(q, k, scale):
    return (
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        * scale
    )


def _kernel(
    qkv_ref,  # [1, ws, Wp, 3*nh*hd]  (or [1, ws, Wp, Cin] when w_ref given)
    out_ref,  # [1, wso, Wpo, nh*hd]
    *,
    ws: int,
    nh: int,
    hd: int,
    q_pool: bool,
    q_lq: int = 0,  # >0: only the first q_lq query tokens per window are
    # real (last strip of a padded map); the rest are computed as zeros —
    # their outputs are sliced off by the caller, so skipping them is exact
    # and halves the strip's MXU row-tiles at ws=14 (196 -> 56 rows)
    w_ref=None,  # [Cin, 3*nh*hd] qkv weight (in-kernel dense variant)
    b_ref=None,  # [1, 3*nh*hd] f32 bias
):
    wp = qkv_ref.shape[2]
    n_win = wp // ws
    lk = ws * ws
    wso = ws // 2 if q_pool else ws
    lq = wso * wso
    scale = jnp.float32(hd**-0.5)
    strip = qkv_ref[0]  # [ws, Wp, 3*nh*hd or Cin]
    if w_ref is not None:
        # qkv projection in-kernel: ONE strip-wide MXU dot — the full qkv
        # tensor (3-6x the input bytes) never round-trips through HBM
        cin = strip.shape[-1]
        ys = strip.reshape(ws * wp, cin)
        qkv = jax.lax.dot_general(
            ys,
            w_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        qkv = (qkv + b_ref[0]).astype(out_ref.dtype)
        strip = qkv.reshape(ws, wp, 3 * nh * hd)
    gc = _pick_raster_gc(ws, wp)

    if gc > 0:
        # ---- raster-packed path: no data reordering at all ----
        gw = gc * ws
        tq, tk = wso * gc * wso, ws * gc * ws
        iq = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
        jk = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
        # token i of the group, in raster order (row, window, col): its
        # window id is (i // row_width) % gc on each side
        bias = jnp.where(
            (iq // wso) % gc == (jk // ws) % gc, 0.0, NEG_INF
        ).astype(jnp.float32)
        for h in range(nh):
            for t in range(wp // gw):
                cols = slice(t * gw, (t + 1) * gw)
                q = strip[:, cols, (0 * nh + h) * hd : (0 * nh + h + 1) * hd]
                k = strip[:, cols, (1 * nh + h) * hd : (1 * nh + h + 1) * hd]
                v = strip[:, cols, (2 * nh + h) * hd : (2 * nh + h + 1) * hd]
                if q_pool:
                    # 2x2 max-pool via reshape + static-index maxima (Mosaic
                    # has no strided gather; these lower to plain slices)
                    q = q.reshape(wso, 2, gw, hd)
                    q = jnp.maximum(q[:, 0], q[:, 1])  # row pairs
                    q = q.reshape(wso, gc, wso, 2, hd)
                    q = jnp.maximum(q[:, :, :, 0, :], q[:, :, :, 1, :])
                q = q.reshape(tq, hd)
                s = _qk(q, k.reshape(tk, hd), scale) + bias
                o = _softmax_av(s, v.reshape(tk, hd), out_ref.dtype)
                out_ref[
                    0, :, t * gc * wso : (t + 1) * gc * wso, h * hd : (h + 1) * hd
                ] = o.reshape(wso, gc * wso, hd)
        return

    # ---- v1 path (odd/large windows, ws ∈ {14, 7} at t512): windows to the
    # batch dim in VMEM, per-window (g=1) or block-diag-packed attention ----
    g = _pick_group(n_win, lk)

    if g > 1:
        rows = jax.lax.broadcasted_iota(jnp.int32, (g * lq, g * lk), 0) // lq
        cols = jax.lax.broadcasted_iota(jnp.int32, (g * lq, g * lk), 1) // lk
        bias = jnp.where(rows == cols, 0.0, NEG_INF).astype(jnp.float32)

    def _towin(a):
        # [ws, wp, hd] -> [n_win, lk, hd]: sublane-only window relayout (the
        # lane dim never splits, so hd=64 half-vreg heads compile — Mosaic
        # rejects multi-dim lane splits like 1152 -> (3, nh, 64))
        a = a.reshape(ws, n_win, ws, hd)
        return jnp.transpose(a, (1, 0, 2, 3)).reshape(n_win, lk, hd)

    win_all = None
    env = os.environ.get("US_MEDSAM2_WINATTN_FULL_RELAYOUT")
    use_full = (env == "1") if env is not None else (hd == 64)
    if use_full:
        # ONE full-width window relayout of the whole strip (sublane retile +
        # leading-dim tile moves), then per-head lane slices — 1 big Mosaic
        # relayout instead of 3*nh small ones. Same bytes moved; at hd=64 the
        # per-head half-vreg relayouts carry enough per-op overhead that the
        # single pass wins (ViT-S kernels 20.88 -> 20.39 ms/64f, total 104.76
        # -> 103.93), while at hd_pad=128 full-vreg per-head slices are
        # marginally better (hiera 14.65 vs 14.92) — round-5 A/B, so this
        # engages only for native-64 heads. Env US_MEDSAM2_WINATTN_FULL_RELAYOUT
        # =0/1 forces either path for A/Bs.
        aw = strip.reshape(ws, n_win, ws, 3 * nh * hd)
        win_all = jnp.transpose(aw, (1, 0, 2, 3)).reshape(n_win, lk, 3 * nh * hd)

    lq_eff = q_lq if (q_lq and g == 1) else lq
    for h in range(nh):
        # per-(qkv, head) 2D lane slices at hd-multiple offsets, then the
        # window transpose per head — same total relayout volume as one big
        # 6D transpose, in lane-split-free pieces
        if win_all is not None:
            q = win_all[:, :, (0 * nh + h) * hd : (0 * nh + h + 1) * hd]
            k = win_all[:, :, (1 * nh + h) * hd : (1 * nh + h + 1) * hd]
            v = win_all[:, :, (2 * nh + h) * hd : (2 * nh + h + 1) * hd]
        else:
            q = _towin(strip[:, :, (0 * nh + h) * hd : (0 * nh + h + 1) * hd])
            k = _towin(strip[:, :, (1 * nh + h) * hd : (1 * nh + h + 1) * hd])
            v = _towin(strip[:, :, (2 * nh + h) * hd : (2 * nh + h + 1) * hd])
        if q_pool:
            q = (
                q.reshape(n_win, wso, 2, wso, 2, hd)
                .max(axis=(2, 4))
                .reshape(n_win, lq, hd)
            )
        if lq_eff < lq:  # keep only the real (leading, row-major) queries
            q = q[:, :lq_eff]
        qg = q.reshape(n_win // g, g * lq_eff, hd)
        kg = k.reshape(n_win // g, g * lk, hd)
        vg = v.reshape(n_win // g, g * lk, hd)
        outs = []
        for t in range(n_win // g):
            s = _qk(qg[t], kg[t], scale)
            if g > 1:
                s = s + bias
            o = _softmax_av(s, vg[t], out_ref.dtype)
            outs.append(o.reshape(g, lq_eff, hd))
        o_h = jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
        if lq_eff < lq:  # zero-fill the discarded query rows
            o_h = jnp.pad(o_h, ((0, 0), (0, lq - lq_eff), (0, 0)))
        # inverse: [n_win, wso, wso, hd] -> [wso, n_win*wso, hd]
        o_h = o_h.reshape(n_win, wso, wso, hd)
        o_h = jnp.transpose(o_h, (1, 0, 2, 3)).reshape(wso, n_win * wso, hd)
        out_ref[0, :, :, h * hd : (h + 1) * hd] = o_h


def _kernel_qkv(y_ref, w_ref, b_ref, out_ref, *, ws, nh, hd, q_pool):
    _kernel(y_ref, out_ref, ws=ws, nh=nh, hd=hd, q_pool=q_pool, w_ref=w_ref, b_ref=b_ref)


def _run_qkv(y, w, b, *, ws, nh, hd, q_pool, interpret=False):
    """y [B, Hp, Wp, Cin] (post-norm1, padded), w [Cin, 3*nh*hd] (lane-padded
    per head), b [3*nh*hd] -> [B, Hpo, Wpo, nh*hd]."""
    bsz, hp, wp, cin = y.shape
    wso = ws // 2 if q_pool else ws
    n_rows = hp // ws
    n_win = wp // ws
    kern = functools.partial(_kernel_qkv, ws=ws, nh=nh, hd=hd, q_pool=q_pool)
    lk = ws * ws
    lq = wso * wso
    flops = 2 * bsz * hp * wp * cin * 3 * nh * hd + (
        2 * bsz * n_rows * n_win * nh * lq * lk * hd * 2
    )
    return pl.pallas_call(
        kern,
        grid=(bsz, n_rows),
        in_specs=[
            pl.BlockSpec(
                (1, ws, wp, cin), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (cin, 3 * nh * hd), lambda bi, i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 3 * nh * hd), lambda bi, i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, wso, n_win * wso, nh * hd),
            lambda bi, i: (bi, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (bsz, n_rows * wso, n_win * wso, nh * hd), y.dtype
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(y.size + bsz * n_rows * wso * n_win * wso * nh * hd)
            * y.dtype.itemsize
            + cin * 3 * nh * hd * 2,
            transcendentals=bsz * n_rows * n_win * nh * lq * lk,
        ),
        interpret=interpret,
    )(y, w.astype(y.dtype), b.reshape(1, -1).astype(jnp.float32))


def _last_strip_q_rows(hp, ws, q_pool, real_h, gc) -> int:
    """Real query ROWS in the last window strip of a bottom-padded map, or 0
    when no cut applies (map unpadded, raster path, or odd rows under q-pool).
    Exact: the cut rows' outputs are sliced off by the caller (hieradet pads
    32² maps to 42² at ws=14 — 10 of the last strip's 14 rows are pad)."""
    if real_h is None or real_h >= hp or gc > 0:
        return 0
    rr = real_h - (hp // ws - 1) * ws
    if rr <= 0 or rr >= ws or (q_pool and rr % 2):
        return 0
    return rr


def _run(qkv, *, ws, nh, hd, q_pool, real_h=None, interpret=False):
    b, hp, wp, _ = qkv.shape
    wso = ws // 2 if q_pool else ws
    n_rows = hp // ws
    n_win = wp // ws
    lk = ws * ws
    lq = wso * wso

    def call(grid_rows, row_off, q_lq):
        kern = functools.partial(
            _kernel, ws=ws, nh=nh, hd=hd, q_pool=q_pool, q_lq=q_lq
        )
        q_eff = q_lq or lq
        flops = 2 * b * grid_rows * n_win * nh * q_eff * lk * hd * 2
        return pl.pallas_call(
            kern,
            grid=(b, grid_rows),
            in_specs=[
                pl.BlockSpec(
                    (1, ws, wp, 3 * nh * hd),
                    lambda bi, i, row_off=row_off: (bi, row_off + i, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (1, wso, n_win * wso, nh * hd),
                lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (b, grid_rows * wso, n_win * wso, nh * hd), qkv.dtype
            ),
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=(
                    b * grid_rows * ws * wp * 3 * nh * hd
                    + b * grid_rows * wso * n_win * wso * nh * hd
                )
                * qkv.dtype.itemsize,
                transcendentals=b * grid_rows * n_win * nh * q_eff * lk,
            ),
            interpret=interpret,
        )(qkv)

    rr = _last_strip_q_rows(hp, ws, q_pool, real_h, _pick_raster_gc(ws, wp))
    if not rr:
        return call(n_rows, 0, 0)
    # shape-specialized last strip: only rr of its ws query rows are real
    rr_out = rr // 2 if q_pool else rr
    main = call(n_rows - 1, 0, 0)
    last = call(1, n_rows - 1, rr_out * wso)
    return jnp.concatenate([main, last], axis=1)


def fused_window_attention_available(
    hp: int, wp: int, ws: int, nh: int, hd: int, dtype
) -> bool:
    """TPU, bf16, lane-aligned head dim (a multiple of 64: full- or half-vreg
    slices — hd=64 runs NATIVE, halving the in-VMEM relayout volume vs the
    128-lane pad), whole-multiple window grid, and the qkv strip (plus its
    in-VMEM window relayout) fitting scoped VMEM."""
    if os.environ.get("US_MEDSAM2_DISABLE_FUSED_WINDOW_ATTN"):
        return False
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False
    strip_bytes = ws * wp * 3 * nh * hd * 2
    return (
        on_tpu
        and dtype == jnp.bfloat16
        and hd % 64 == 0
        and ws > 0
        and hp % ws == 0
        and wp % ws == 0
        and 2 * strip_bytes + (1 << 20) <= 10 * 2**20
    )


def _xla_ref(qkv, ws, nh, hd, q_pool):
    """Same math composed in XLA (VJP path + numerical reference). Mirrors the
    packed-window composition in models/hiera.py::MultiScaleAttention."""
    b, hp, wp, _ = qkv.shape
    nwh, nww = hp // ws, wp // ws
    lk = ws * ws
    wso = ws // 2 if q_pool else ws
    lq = wso * wso
    scale = hd**-0.5
    t = qkv.reshape(b, nwh, ws, nww, ws, 3, nh, hd)
    t = t.transpose(5, 0, 1, 3, 6, 2, 4, 7)
    t = t.reshape(3, b * nwh * nww * nh, lk, hd)
    q, k, v = t[0], t[1], t[2]
    n = q.shape[0]
    if q_pool:
        q = q.reshape(n, wso, 2, wso, 2, hd).max(axis=(2, 4)).reshape(n, lq, hd)
    s = (
        jnp.einsum("nqd,nkd->nqk", q, k, preferred_element_type=jnp.float32)
        * scale
    )
    p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum(
        "nqk,nkd->nqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(qkv.dtype)
    o = o.reshape(b, nwh, nww, nh, wso, wso, hd)
    o = o.transpose(0, 1, 4, 2, 5, 3, 6)
    return o.reshape(b, nwh * wso, nww * wso, nh * hd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def fused_window_attention(qkv, ws, nh, hd, q_pool, real_h=None):
    """[B, Hp, Wp, 3*nh*hd] -> [B, Hpo, Wpo, nh*hd] windowed attention
    (forward: Pallas; backward: XLA recompute). real_h = the UNPADDED map
    height: pad-query rows in the last window strip are skipped (their rows
    come back zero — the caller slices them off)."""
    return _run(qkv, ws=ws, nh=nh, hd=hd, q_pool=q_pool, real_h=real_h)


def _fwd(qkv, ws, nh, hd, q_pool, real_h):
    return _run(qkv, ws=ws, nh=nh, hd=hd, q_pool=q_pool, real_h=real_h), (qkv,)


def _bwd(ws, nh, hd, q_pool, real_h, res, grad):
    # grads on the skipped pad rows are zero (the model discards those rows),
    # so differentiating the full-map reference is exact
    (qkv,) = res
    _, vjp = jax.vjp(lambda a: _xla_ref(a, ws, nh, hd, q_pool), qkv)
    return vjp(grad)


fused_window_attention.defvjp(_fwd, _bwd)


def fused_qkv_window_attention_available(
    hp: int, wp: int, ws: int, nh: int, hd: int, cin: int, dtype
) -> bool:
    """As fused_window_attention_available, plus the qkv weight and the
    in-VMEM qkv strip fitting scoped VMEM alongside the input strip."""
    if os.environ.get("US_MEDSAM2_DISABLE_FUSED_WINDOW_ATTN"):
        return False
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False
    vmem = (
        ws * wp * cin * 2  # y strip
        + ws * wp * 3 * nh * hd * (2 + 4)  # qkv strip bf16 + f32 dense accum
        + cin * 3 * nh * hd * 2  # weight
        + (1 << 20)
    )
    return (
        on_tpu
        and dtype == jnp.bfloat16
        and hd % 64 == 0
        and ws > 0
        and hp % ws == 0
        and wp % ws == 0
        and vmem <= 12 * 2**20
    )


def _xla_ref_qkv(y, w, b, ws, nh, hd, q_pool):
    """Dense (f32 accum + f32 bias, as _QKVDense applies it) then windowed
    attention — the VJP path and numerical reference for the fused variant."""
    qkv = jax.lax.dot_general(
        y.astype(y.dtype),
        w.astype(y.dtype),
        (((y.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    qkv = (qkv + b.astype(jnp.float32)).astype(y.dtype)
    return _xla_ref(qkv, ws, nh, hd, q_pool)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_qkv_window_attention(y, w, b, ws, nh, hd, q_pool):
    """[B, Hp, Wp, Cin] post-norm tokens -> [B, Hpo, Wpo, nh*hd]: qkv
    projection + window partition + q-pool + packed softmax + AV in one Pallas
    pass (forward: Pallas; backward: XLA recompute). w is the lane-padded
    [Cin, 3*nh*hd] qkv weight, b its bias."""
    return _run_qkv(y, w, b, ws=ws, nh=nh, hd=hd, q_pool=q_pool)


def _fwd_qkv(y, w, b, ws, nh, hd, q_pool):
    return _run_qkv(y, w, b, ws=ws, nh=nh, hd=hd, q_pool=q_pool), (y, w, b)


def _bwd_qkv(ws, nh, hd, q_pool, res, grad):
    y, w, b = res
    _, vjp = jax.vjp(
        lambda a, ww, bb: _xla_ref_qkv(a, ww, bb, ws, nh, hd, q_pool), y, w, b
    )
    return vjp(grad)


fused_qkv_window_attention.defvjp(_fwd_qkv, _bwd_qkv)
