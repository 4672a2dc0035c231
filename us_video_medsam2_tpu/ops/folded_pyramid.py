"""Mask-downsampler conv pyramid computed entirely in a folded cell layout.

The memory encoder's MaskDownSampler (reference sam2/modeling/memory_encoder.py
:17-58) runs four 3x3/s2 convs over a 1-channel 512^2 mask with channels
1->4->16->64->256. On TPU every layer before the last is pathological: 1-16
channel tensors use a sliver of the 128-lane VPU/MXU width, and the per-token
LayerNorms at 256^2x4 cost more in layout conversions than arithmetic (~0.15
ms/frame total, round-2 xprof trace).

Here the mask is space-to-depth folded ONCE to the final 32^2 grid
([B, 32, 32, 256] cells of 16x16 pixels) and every layer stays in that layout:

- conv layer l (grid 2^(9-l) -> 2^(8-l)) becomes a 2x2-cell shifted concat +
  one [B*32*32, 1024] @ [1024, 256] MXU matmul whose effective weight is the
  original [3, 3, cin, cout] kernel scattered over (cell-offset, in-pixel,
  out-pixel) positions — same identity as ops/conv_matmul.py, evaluated at the
  fixed 32^2 cell grid so EVERY layer is a full-width matmul;
- the per-pixel LayerNorm over cout channels is a reshape to
  [..., g_out^2, cout] (a few hundred KB at 32^2 — negligible, unlike at
  256^2) followed by the standard LN;
- after the last layer the folded layout IS the true [B, 32, 32, 256] layout.

Numerics are identical to the direct conv path (f32 accumulation, same LN/GELU
per layer); verified against the memory-encoder golden fixture and a direct
XLA-conv comparison in tests/test_ops.py.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def folded_pyramid_applicable(h: int, w: int, kernel: int, stride: int,
                              pad: int, num_layers: int) -> bool:
    total = stride**num_layers
    return (
        kernel == 3 and stride == 2 and pad == 1
        and h == w and h % total == 0
    )


def _tap_selector(g_in: int) -> np.ndarray:
    """Static 0/1 tensor A[ki, di, ri, p] = 1 iff output pixel p's tap ki
    reads in-cell row ri of neighbour cell di (di=0 is the previous cell —
    the kernel-3/stride-2/pad-1 geometry never reaches further).
    Row identity: g_in*di + ri == g_in + 2p + ki - 1."""
    g_out = g_in // 2
    a = np.zeros((3, 2, g_in, g_out), np.float32)
    for ki in range(3):
        for p in range(g_out):
            r = 2 * p + ki - 1
            di, ri = (1, r) if r >= 0 else (0, g_in - 1)
            a[ki, di, ri, p] = 1.0
    return a


_SEL_CACHE: dict = {}


def _eff_weight(w: jnp.ndarray, g_in: int) -> jnp.ndarray:
    """[3, 3, cin, cout] -> [4*g_in^2*cin, g_out^2*cout] effective cell-matmul
    weight. Built with static 0/1 selection tensors and one einsum — NO
    gather/scatter: the construction sits inside the tracking scan's cond
    branch where XLA cannot hoist it, so it must be trivially fusable (a
    scatter formulation here cost 2 ms/frame — round-2 lesson)."""
    _, _, cin, cout = w.shape
    g_out = g_in // 2
    if g_in not in _SEL_CACHE:
        _SEL_CACHE[g_in] = _tap_selector(g_in)
    sel = jnp.asarray(_SEL_CACHE[g_in], w.dtype)
    # rows (di, dj, ri, rj, ci) x cols (p, q, co)
    eff = jnp.einsum("kdrp,lesq,klco->derscpqo", sel, sel, w)
    return eff.reshape(4 * g_in * g_in * cin, g_out * g_out * cout)


def folded_conv_layer(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                      g_in: int, dtype) -> jnp.ndarray:
    """One pyramid conv on the folded [B, N, M, g_in^2*cin] cell grid ->
    [B, N, M, g_out^2*cout]."""
    bsz, n, m, feat = x.shape
    _, _, cin, cout = w.shape
    g_out = g_in // 2
    xs = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
    win = jnp.concatenate(
        [xs[:, :n, :m], xs[:, :n, 1:], xs[:, 1:, :m], xs[:, 1:, 1:]], axis=-1
    ).astype(dtype)
    eff = _eff_weight(w, g_in).astype(dtype)
    out = jax.lax.dot_general(
        win.reshape(-1, 4 * feat), eff, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(bsz, n, m, g_out * g_out * cout)
    # bias per output channel co, tiled over the g_out^2 sub-pixels
    return (out + jnp.tile(b, g_out * g_out)).astype(dtype)
