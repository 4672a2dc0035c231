"""Positional encodings: 2D sine grids, 1D sine, and axial RoPE (real-valued).

Numerics mirror the reference (sam2/modeling/position_encoding.py:79-112 sine grid,
sam2/modeling/sam2_utils.py:64-74 1D sine, position_encoding.py:167-221 axial RoPE),
but everything here is static-shape, channels-last, and precomputable at trace time.
RoPE is carried as (cos, sin) float32 tables rather than complex numbers — TPUs have
no complex MXU path, and the pairwise rotation maps to two fused multiplies.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _sine_pos_embed_2d_np(
    h: int, w: int, channels: int, temperature: float, normalize: bool, scale: float
) -> np.ndarray:
    half = channels // 2
    y = np.arange(1, h + 1, dtype=np.float32)[:, None] * np.ones((1, w), np.float32)
    x = np.arange(1, w + 1, dtype=np.float32)[None, :] * np.ones((h, 1), np.float32)
    if normalize:
        eps = 1e-6
        y = y / (y[-1:, :] + eps) * scale
        x = x / (x[:, -1:] + eps) * scale
    dim_t = np.arange(half, dtype=np.float32)
    dim_t = temperature ** (2.0 * (dim_t // 2) / half)
    pos_x = x[:, :, None] / dim_t  # [H, W, half]
    pos_y = y[:, :, None] / dim_t
    # interleave sin(even) / cos(odd)
    pos_x = np.stack([np.sin(pos_x[..., 0::2]), np.cos(pos_x[..., 1::2])], axis=-1)
    pos_x = pos_x.reshape(h, w, half)
    pos_y = np.stack([np.sin(pos_y[..., 0::2]), np.cos(pos_y[..., 1::2])], axis=-1)
    pos_y = pos_y.reshape(h, w, half)
    return np.concatenate([pos_y, pos_x], axis=-1)  # [H, W, channels]


def sine_pos_embed_2d(
    h: int,
    w: int,
    channels: int,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float | None = None,
) -> jnp.ndarray:
    """[H, W, channels] sine position grid (channels-last; ref outputs CHW)."""
    if scale is None:
        scale = 2.0 * np.pi
    return jnp.asarray(
        _sine_pos_embed_2d_np(h, w, channels, float(temperature), normalize, scale)
    )


def sine_pe_1d(pos: jnp.ndarray, dim: int, temperature: float = 10000.0) -> jnp.ndarray:
    """1D sine embedding of (possibly fractional) positions. pos: [...]; -> [..., dim]."""
    pe_dim = dim // 2
    dim_t = jnp.arange(pe_dim, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * (dim_t // 2) / pe_dim)
    emb = pos.astype(jnp.float32)[..., None] / dim_t
    return jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)


@functools.lru_cache(maxsize=64)
def _axial_rope_np(dim: int, end_x: int, end_y: int, theta: float):
    """cos/sin tables for axial RoPE over an (end_x * end_y) grid, head dim `dim`."""
    nf = dim // 4
    freqs = 1.0 / (theta ** (np.arange(0, dim, 4, dtype=np.float32)[:nf] / dim))
    t = np.arange(end_x * end_y, dtype=np.float32)
    t_x = t % end_x
    t_y = np.floor(t / end_x)
    ang_x = np.outer(t_x, freqs)  # [L, dim//4]
    ang_y = np.outer(t_y, freqs)
    ang = np.concatenate([ang_x, ang_y], axis=-1)  # [L, dim//2]
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def compute_axial_rope(
    dim: int, end_x: int, end_y: int, theta: float = 10000.0
) -> tuple[jnp.ndarray, jnp.ndarray]:
    cos, sin = _axial_rope_np(dim, end_x, end_y, float(theta))
    return jnp.asarray(cos), jnp.asarray(sin)


def apply_rope(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray, repeat_to_len: int | None = None
) -> jnp.ndarray:
    """Rotate adjacent channel pairs of x by the axial RoPE angles.

    Args:
      x: [..., L, dim]
      cos/sin: [L0, dim//2] tables; if repeat_to_len is given, the tables are tiled
        along the length axis to cover L = repeat_to_len (the reference's
        `rope_k_repeat` for spatial memories, position_encoding.py:212-219).
    """
    orig_dtype = x.dtype
    L = x.shape[-2]
    if repeat_to_len is not None and cos.shape[0] != repeat_to_len:
        # broadcast over repeated slots instead of materializing tiled tables:
        # view [..., r*L0, dim] as [..., r, L0, dim] (free reshape — slots are
        # contiguous) and let the [L0, dim//2] tables broadcast. Measured ~25%
        # faster than jnp.tile on the memory-attention K path (v5e).
        r = repeat_to_len // cos.shape[0]
        l0 = cos.shape[0]
        assert r * l0 == L, f"rope repeat {r}x{l0} != seq len {L}"
        xf = x.astype(jnp.float32).reshape(*x.shape[:-2], r, l0, -1, 2)
    else:
        assert cos.shape[0] == L, f"rope table len {cos.shape[0]} != seq len {L}"
        xf = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 2)
    x0, x1 = xf[..., 0], xf[..., 1]
    out0 = x0 * cos - x1 * sin
    out1 = x0 * sin + x1 * cos
    out = jnp.stack([out0, out1], axis=-1).reshape(x.shape)
    return out.astype(orig_dtype)


def rope_halfsplit_perm(dim: int, n_heads: int):
    """Permutation of projection output channels turning torch's interleaved
    RoPE pairs (2j, 2j+1) into half-split form (j, d/2+j) per head.

    q.k is permutation-invariant when q_proj and k_proj are permuted together,
    so applying this to imported q/k projection weights lets `apply_rope` use
    contiguous half-slices instead of stride-2 lane shuffles — the interleaved
    even/odd lane selection costs ~1ms/layer of relayout on v5e (round-2 trace,
    docs/ROADMAP.md). Returns indices `perm` with new[:, i] = old[:, perm[i]].
    """
    import numpy as np

    dh = dim // n_heads
    perm = np.empty(dim, np.int64)
    for h in range(n_heads):
        base = h * dh
        for j in range(dh // 2):
            perm[base + j] = base + 2 * j
            perm[base + dh // 2 + j] = base + 2 * j + 1
    return perm


def apply_rope_halfsplit(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """RoPE in half-split channel layout: rotates (x[..., j], x[..., d/2+j])
    pairs. Requires projections permuted by `rope_halfsplit_perm` (done by the
    torch importer); numerically equivalent to `apply_rope` modulo that
    permutation, but lowers to two contiguous lane slices + elementwise math.
    Computes in x.dtype (f32 models stay exact; bf16 avoids f32 round-trips).

    x: [..., L, dim]; cos/sin: [L, dim//2] (length-matched; tile/extend for
    repeated or unrotated keys before calling)."""
    d2 = x.shape[-1] // 2
    cos = cos.astype(x.dtype)
    sin = sin.astype(x.dtype)
    x0 = x[..., :d2]
    x1 = x[..., d2:]
    return jnp.concatenate([x0 * cos - x1 * sin, x0 * sin + x1 * cos], axis=-1)
