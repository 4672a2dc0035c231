"""Strided NHWC convolutions re-expressed as space-to-depth + one MXU matmul.

XLA's conv lowering is pathological for small-channel strided convs on TPU: a
3x3/s2 conv over a 1-channel 512^2 mask (the memory encoder's first
MaskDownSampler layer, reference sam2/modeling/memory_encoder.py:17-58) uses
1/128th of the lane width and costs ~92us/frame; the same math as a matmul over
space-to-depth cells is bandwidth-bound (~5us). The identity (also used by the
Hiera patch embed, models/hiera.py):

  With stride s and kernel k <= 2s, fold [B, H, W, C] -> [B, H/s, W/s, s*s*C]
  cells; every output pixel then depends on a 2x2 neighbourhood of cells, so
  the conv is a 2x2 cell conv whose kernel is the original [k, k, C, Co]
  kernel scattered into a [2, 2, s, s, C, Co] layout — computed as 4 shifted
  cell slices concatenated + one [.., 4*s*s*C] @ [4*s*s*C, Co] matmul.

Requires k <= 2*s, pad == k//2, H % s == 0, W % s == 0, groups == 1. Numerics
are identical to lax.conv_general_dilated (f32 accumulation; verified in
tests/test_ops.py and the memory-encoder parity fixtures).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def s2d_conv_applicable(kh: int, kw: int, stride: int, pad: int,
                        h: int, w: int, groups: int = 1) -> bool:
    if groups != 1 or stride <= 1 or kh != kw or h % stride or w % stride:
        return False
    # shifted 2x2-cell form (overlapping windows) or pure-fold form (k <= s,
    # each output reads exactly one cell, e.g. k2/s2 and k4/s4 downsamplers)
    return (kh <= 2 * stride and pad == kh // 2) or (kh <= stride and pad == 0)


def scatter_conv_weights(w: jnp.ndarray, stride: int, pad: int) -> jnp.ndarray:
    """[kh, kw, C, Co] -> [4*s*s*C, Co] in the 2x2-cell layout.

    Output pixel (i, j) reads input row s*i + ki - pad; solving for the cell
    layout: cell i-1 holds rows ri = ki + pad - s, cell i rows ri = ki + pad,
    i.e. ki = ri - pad + s*di for di in {0, 1} (same for columns).
    Loop-invariant — XLA hoists it out of frame scans.
    """
    kh, kw, cin, co = w.shape
    s = stride
    w2 = jnp.zeros((2, 2, s, s, cin, co), w.dtype)
    for di in range(2):
        for dj in range(2):
            for ri in range(s):
                ki = ri + pad - s + s * di
                if not 0 <= ki < kh:
                    continue
                for rj in range(s):
                    kj = rj + pad - s + s * dj
                    if 0 <= kj < kw:
                        w2 = w2.at[di, dj, ri, rj].set(w[ki, kj])
    return w2.reshape(4 * s * s * cin, co)


def depthwise_conv_shifted(
    x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None, pad: int, dtype=None
) -> jnp.ndarray:
    """Depthwise KxK/s1 conv as K^2 shifted multiply-accumulates.

    XLA lowers feature_group_count=C convs to a VPU path that costs ~2ms for
    the memory encoder's 7x7 CXBlock dwconv (25 MFLOP) on v5e; K^2 static
    slices of the padded input with fused multiply-adds are pure elementwise
    traffic (~50us). x [B, H, W, C]; w [kh, kw, 1, C] (HWIO depthwise);
    identical numerics (f32 accumulation)."""
    kh, kw, _, c = w.shape
    b_, h, wd, _ = x.shape
    dtype = dtype or x.dtype
    xp = jnp.pad(x.astype(dtype), ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    acc = None
    for ki in range(kh):
        for kj in range(kw):
            term = xp[:, ki : ki + h, kj : kj + wd, :].astype(jnp.float32) * w[
                ki, kj, 0
            ].astype(jnp.float32)
            acc = term if acc is None else acc + term
    if b is not None:
        acc = acc + b
    return acc.astype(dtype)


def s2d_conv(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray | None,
    stride: int,
    pad: int,
    dtype=None,
    prefolded: bool = False,
) -> jnp.ndarray:
    """Strided conv as one matmul. x [B, H, W, C] (or the space-to-depth folded
    [B, H/s, W/s, s*s*C] when prefolded); w [kh, kw, C, Co]; returns
    [B, H/s, W/s, Co] in compute dtype with f32 accumulation."""
    s = stride
    kh, kw, cin, co = w.shape
    dtype = dtype or x.dtype
    if prefolded:
        b_, n, m, _ = x.shape
        xs = x
    else:
        b_, h, wd, _ = x.shape
        n, m = h // s, wd // s
        xs = (
            x.reshape(b_, n, s, m, s, cin)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b_, n, m, s * s * cin)
        )
    if pad == 0 and kh <= s:
        # pure-fold form: output (i, j) reads only cell (i, j), kernel tap
        # (ki, kj) sits at cell position (ki, kj)
        w2 = jnp.zeros((s, s, cin, co), w.dtype)
        w2 = w2.at[:kh, :kw].set(w)
        out = jax.lax.dot_general(
            xs.reshape(-1, s * s * cin).astype(dtype),
            w2.reshape(s * s * cin, co).astype(dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(b_, n, m, co)
        if b is not None:
            out = out + b
        return out.astype(dtype)
    xs = jnp.pad(xs, ((0, 0), (1, 0), (1, 0), (0, 0)))
    patches = jnp.concatenate(
        [xs[:, :n, :m], xs[:, :n, 1:], xs[:, 1:, :m], xs[:, 1:, 1:]], axis=-1
    ).astype(dtype)  # cells (i-1,j-1), (i-1,j), (i,j-1), (i,j)
    wmat = scatter_conv_weights(w, s, pad).astype(dtype)
    out = jax.lax.dot_general(
        patches.reshape(-1, 4 * s * s * cin),
        wmat,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(b_, n, m, co)
    if b is not None:
        out = out + b
    return out.astype(dtype)
