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
    """
    d = q.shape[-1]
    if scale is None:
        scale = d ** -0.5
    if allow_flash and scale == d ** -0.5 and v.shape[-1] == d:
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
    if key_mask is not None:
        logits = jnp.where(key_mask[:, None, None, :], logits, NEG_INF)
    probs = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)
