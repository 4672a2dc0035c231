"""Scaled dot-product attention (XLA path).

Batched multi-head SDPA with optional key masking, computed with f32 logits and
softmax regardless of input dtype (bf16-safe). This is the portable baseline used
by every attention site; hot sites can swap in the Pallas kernels from
us_video_medsam2_tpu.kernels when available (same signature).

Replaces torch F.scaled_dot_product_attention in the reference
(sam2/modeling/sam/transformer.py:270, backbones/hieradet.py:70).
"""

from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -1e30


def sdpa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: jnp.ndarray | None = None,
    scale: float | None = None,
    allow_flash: bool = True,
    force_flash: bool = False,
    attn_bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Attention over [B, H, L, D] tensors.

    Dispatches to the Pallas flash kernel (kernels/flash_attention.py) when on
    TPU with qualifying shapes; XLA einsum otherwise.

    Args:
      q: [B, H, Lq, D]
      k, v: [B, H, Lk, D] / [B, H, Lk, Dv]
      key_mask: optional boolean [B, Lk] (True = attend); used to mask invalid
        memory-bank slots in the fixed-shape memory attention.
      scale: defaults to 1/sqrt(D).
      attn_bias: optional additive f32 bias broadcastable to [B, H, Lq, Lk],
        added to the scaled logits before softmax. Used by the packed
        windowed-attention path (models/hiera.py) as a block-diagonal -inf
        mask; entries at -1e30 produce exact-zero probabilities, so masked
        keys contribute exact zeros to the output. Forces the XLA path.
    """
    d = q.shape[-1]
    if scale is None:
        scale = d ** -0.5
    if (
        attn_bias is None
        and allow_flash
        and scale == d ** -0.5
        and v.shape[-1] == d
    ):
        from us_video_medsam2_tpu.kernels.flash_attention import (
            flash_attention,
            flash_attention_available,
        )

        # force_flash: opt-in override of the batch>=2 heuristic gate (e.g. for
        # vmapped layouts where XLA's softmax+AV fusion degenerates into
        # per-tile recompute — 619 of 759 ms in the round-2 serve trace). It
        # only skips the batch/query-length heuristics; the hard requirements
        # (TPU backend, lane-aligned head dim, K/V fits in VMEM) still apply —
        # flash_attention_available(min_batch=1) keeps those guards.
        if flash_attention_available(
            q.shape, k.shape, k.dtype, min_batch=1 if force_flash else 2
        ):
            return flash_attention(q, k, v, key_mask)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if attn_bias is not None:
        logits = logits + attn_bias
    if key_mask is not None:
        logits = jnp.where(key_mask[:, None, None, :], logits, NEG_INF)
    probs = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


def sdpa_blhd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    attn_bias: jnp.ndarray | None = None,
    scale: float | None = None,
) -> jnp.ndarray:
    """Attention over [B, L, H, D]-layout tensors, no head transposes.

    Same math as `sdpa`, but the head axis stays in place and enters the
    matmuls as a dot_general batch dim ("bqhd,bkhd->bhqk" / "bhqk,bkhd->bqhd"),
    so XLA folds the head split into the matmul layouts instead of
    materializing [B,H,L,D] copies — the round-3 trace showed those transposes
    costing ~9 ms/64f across the trunk's windowed-attention blocks. Output is
    [B, Lq, H, D] (token-major), which reshapes back to windows for the
    output projection with contiguous reshapes only.
    """
    d = q.shape[-1]
    if scale is None:
        scale = d ** -0.5
    logits = (
        jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        * scale
    )
    if attn_bias is not None:
        logits = logits + attn_bias
    probs = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)
