"""Window partition/unpartition for windowed attention (NHWC, static shapes).

Mirrors reference sam2/modeling/backbones/utils.py:17-61 but as pure reshapes that
XLA folds into the surrounding attention; padding amounts are static.
"""

from __future__ import annotations

import jax.numpy as jnp


def window_partition(x: jnp.ndarray, window_size: int):
    """[B, H, W, C] -> ([B * nWin, ws, ws, C], (Hp, Wp))."""
    b, h, w, c = x.shape
    pad_h = (window_size - h % window_size) % window_size
    pad_w = (window_size - w % window_size) % window_size
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window_size, window_size, wp // window_size, window_size, c)
    windows = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size, window_size, c)
    return windows, (hp, wp)


def window_unpartition(
    windows: jnp.ndarray, window_size: int, pad_hw: tuple[int, int], hw: tuple[int, int]
) -> jnp.ndarray:
    """Inverse of window_partition; crops padding back to (H, W)."""
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // (hp * wp // window_size // window_size)
    x = windows.reshape(
        b, hp // window_size, wp // window_size, window_size, window_size, -1
    )
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    if hp > h or wp > w:
        x = x[:, :h, :w, :]
    return x


def space_to_depth(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """[..., H, W, C] -> [..., H/s, W/s, s*s*C], cell order (ri, rj, c).

    Used to pre-fold video frames once (outside the per-frame tracking scan) so
    the Hiera patch embed's s2d relayout is not paid per frame — the fold is the
    only layout-changing step of the patch-embed matmul formulation.
    """
    *b, h, w, c = x.shape
    n, m = h // s, w // s
    x = x.reshape(*b, n, s, m, s, c)
    perm = tuple(range(len(b))) + tuple(
        len(b) + i for i in (0, 2, 1, 3, 4)
    )
    return x.transpose(*perm).reshape(*b, n, m, s * s * c)
