"""Static-shape 2D resampling as separable matrix contractions.

TPU-first design: instead of gather-based interpolation, every resize with static
input/output shapes is lowered to two small dense matmuls (one per spatial axis),
which XLA places on the MXU and fuses with surrounding ops. The interpolation
weight matrices are built once per (in, out, mode) in numpy and cached.

Semantics match `torch.nn.functional.interpolate` (the oracle used throughout the
reference pipeline, e.g. reference sam2/modeling/sam2_base.py:1126 bilinear mask
upsampling, sam2/modeling/backbones/hieradet.py:276 bicubic pos-embed resize,
sam2/modeling/backbones/image_encoder.py:118 nearest FPN upsample):

- half-pixel sampling grid (``align_corners=False``)
- bicubic kernel with a = -0.75 (torch's coefficient; PIL/jax.image use -0.5)
- optional antialiasing for downscale (kernel stretched by the scale factor)
- edge clamping (out-of-range taps accumulate onto the border pixel)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _kernel_linear(t: np.ndarray) -> np.ndarray:
    t = np.abs(t)
    return np.where(t < 1.0, 1.0 - t, 0.0)


def _kernel_cubic(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    # Keys cubic convolution kernel with torch's a=-0.75.
    t = np.abs(t)
    t2, t3 = t * t, t * t * t
    out = np.where(
        t <= 1.0,
        (a + 2.0) * t3 - (a + 3.0) * t2 + 1.0,
        np.where(t < 2.0, a * t3 - 5.0 * a * t2 + 8.0 * a * t - 4.0 * a, 0.0),
    )
    return out


_KERNELS = {
    "linear": (_kernel_linear, 1.0),
    "cubic": (_kernel_cubic, 2.0),
}


@functools.lru_cache(maxsize=256)
def _resize_matrix(
    in_size: int, out_size: int, mode: str, antialias: bool
) -> np.ndarray:
    """[out_size, in_size] weight matrix for one axis."""
    if mode == "nearest":
        # torch's legacy 'nearest': src = floor(i * in / out)
        w = np.zeros((out_size, in_size), dtype=np.float32)
        src = np.floor(np.arange(out_size) * (in_size / out_size)).astype(np.int64)
        w[np.arange(out_size), np.clip(src, 0, in_size - 1)] = 1.0
        return w

    kernel_fn, radius = _KERNELS[mode]
    scale = in_size / out_size
    kscale = scale if (antialias and scale > 1.0) else 1.0
    support = radius * kscale

    w = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        if antialias:
            # PIL/torch-AA semantics: window clipped to the valid range, weights
            # evaluated at pixel centers, normalized over the clipped window.
            center = (i + 0.5) * scale
            lo = max(int(center - support + 0.5), 0)
            hi = min(int(center + support + 0.5), in_size)
            taps = np.arange(lo, hi)
            vals = kernel_fn((taps + 0.5 - center) / kscale)
            s = vals.sum()
            if s != 0:
                vals = vals / s
            w[i, taps] = vals
        else:
            # torch non-AA semantics: fixed tap count around the source position,
            # out-of-range taps replicate the border pixel.
            center = (i + 0.5) * scale - 0.5
            lo = int(np.floor(center)) - (int(radius) - 1)
            taps = np.arange(lo, lo + 2 * int(radius))
            vals = kernel_fn(taps - center)
            s = vals.sum()
            if s != 0:
                vals = vals / s
            np.add.at(w[i], np.clip(taps, 0, in_size - 1), vals)
    return w.astype(np.float32)


def resize2d(
    x: jnp.ndarray,
    out_hw: tuple[int, int],
    mode: str = "linear",
    antialias: bool = False,
) -> jnp.ndarray:
    """Resize the two spatial axes of an NHWC (or HWC / ...HWC) array.

    Args:
      x: [..., H, W, C]
      out_hw: target (H', W')
      mode: 'nearest' | 'linear' | 'cubic' (torch 'bilinear'/'bicubic',
        align_corners=False)
      antialias: match torch's antialias=True for downscale.
    """
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    wy = jnp.asarray(_resize_matrix(h, oh, mode, antialias))
    wx = jnp.asarray(_resize_matrix(w, ow, mode, antialias))
    # [..., H, W, C] -> [..., H', W, C] -> [..., H', W', C]
    # HIGHEST: these weights define mask values / position embeddings — keep f32
    # even on TPU (where default f32 matmul is a single bf16 pass).
    hp = jax.lax.Precision.HIGHEST
    xf = jnp.einsum("oh,...hwc->...owc", wy, xf, precision=hp)
    xf = jnp.einsum("ow,...hwc->...hoc", wx, xf, precision=hp)
    return xf.astype(orig_dtype)


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Exact 2x nearest upsample of [..., H, W, C] (torch scale_factor=2 nearest)."""
    x = jnp.repeat(x, 2, axis=-3)
    x = jnp.repeat(x, 2, axis=-2)
    return x
