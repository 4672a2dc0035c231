"""Fixed-shape streaming memory bank.

The reference keeps per-frame memories in python dicts keyed by frame index
(`output_dict["cond_frame_outputs"] / ["non_cond_frame_outputs"]`,
sam2/modeling/sam2_base.py:1296-1422) and concatenates a data-dependent list of
tensors per tracked frame. That is unjittable. Here the bank is a pytree of
static-shape arrays indexed by absolute frame index, and per-frame memory
selection is a vectorized index computation + gather + validity mask, so the whole
`propagate_in_video` loop compiles once and runs as a single `lax.scan`.

Slot layout of the memory keys fed to memory attention (always the same order):
  [cond-frame slots (K) | non-cond slots (num_maskmem-1) | obj-ptr tokens]
Attention is permutation-invariant over keys, so this fixed order is equivalent
to the reference's dynamic concatenation as long as each slot carries the right
temporal-position embedding and invalid slots are masked out.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.struct
import jax
import jax.numpy as jnp

from us_video_medsam2_tpu.core.config import SAM2Config


@flax.struct.dataclass
class MemoryBank:
    """Per-object-video memory store; S = max number of frames (static)."""

    maskmem: jnp.ndarray  # [B, S, Hm*Wm, mem_dim]
    obj_ptr: jnp.ndarray  # [B, S, C]
    valid: jnp.ndarray  # [B, S] bool
    is_cond: jnp.ndarray  # [B, S] bool

    @property
    def num_slots(self) -> int:
        return self.maskmem.shape[1]


def init_memory_bank(
    batch: int, num_frames: int, mem_hw: int, mem_dim: int, hidden_dim: int,
    dtype=jnp.float32, ptr_dtype=None,
) -> MemoryBank:
    """ptr_dtype defaults to dtype; the reference predictor stores maskmem in
    bfloat16 (`sam2_video_predictor.py:944`) but object pointers at compute dtype."""
    return MemoryBank(
        maskmem=jnp.zeros((batch, num_frames, mem_hw, mem_dim), dtype),
        obj_ptr=jnp.zeros((batch, num_frames, hidden_dim), ptr_dtype or dtype),
        valid=jnp.zeros((batch, num_frames), bool),
        is_cond=jnp.zeros((batch, num_frames), bool),
    )


def write_memory(
    bank: MemoryBank,
    frame_idx: jnp.ndarray,
    maskmem: jnp.ndarray,  # [B, Hm*Wm, mem_dim]
    obj_ptr: jnp.ndarray,  # [B, C]
    is_cond,
) -> MemoryBank:
    """Store frame_idx's memory (dynamic index is fine: lowers to dynamic-update-slice)."""
    b = bank.maskmem.shape[0]
    is_cond = jnp.broadcast_to(jnp.asarray(is_cond, bool), (b,))
    return MemoryBank(
        maskmem=bank.maskmem.at[:, frame_idx].set(maskmem.astype(bank.maskmem.dtype)),
        obj_ptr=bank.obj_ptr.at[:, frame_idx].set(obj_ptr.astype(bank.obj_ptr.dtype)),
        valid=bank.valid.at[:, frame_idx].set(True),
        is_cond=bank.is_cond.at[:, frame_idx].set(is_cond),
    )


class MemorySelection(NamedTuple):
    """Gather plan for one tracked frame (all shapes static)."""

    mem_idx: jnp.ndarray  # [B, K + R] frame indices into the bank
    mem_valid: jnp.ndarray  # [B, K + R] bool
    mem_tpos: jnp.ndarray  # [K + R] int — index into maskmem_tpos_enc
    ptr_idx: jnp.ndarray  # [B, P] frame indices
    ptr_valid: jnp.ndarray  # [B, P] bool
    ptr_pos: jnp.ndarray  # [B, P] float temporal distance values
    t_diff_max: int | jnp.ndarray  # pointer sine-embedding normalizer (static
    # int, or a traced scalar when num_frames is traced — same value either way)


def select_memories(
    bank: MemoryBank,
    frame_idx: jnp.ndarray,
    cfg: SAM2Config,
    num_frames: int,
    track_in_reverse: bool = False,
    is_training: bool = False,
    max_cond_slots: int | None = None,
) -> MemorySelection:
    """Reproduces the reference's memory-frame selection as a static gather plan.

    Non-conditioning slots follow the stride-r schedule of
    sam2_base.py:1308-1342; conditioning slots are the K temporally-closest
    conditioning frames (sam2_utils.py:19-61 with max_cond_frames_in_attn ≈ K);
    pointer slots follow sam2_base.py:1360-1422.

    max_cond_slots overrides cfg.max_cond_frame_slots: when the caller knows the
    session holds fewer conditioning frames than the config cap (e.g. a single
    prompted frame), shrinking K is exact — the extra slots could never be valid
    — and removes their keys from every memory-attention matmul.

    num_frames may be a static int (training; exact-shape predictor) or a traced
    scalar (T-bucketed predictor: one compiled program per bank bucket instead of
    one per video length). The traced form sizes the pointer slots at the config
    cap and relies on the validity masks — masked keys contribute exact zeros in
    attention (ops/attention.py NEG_INF), so both forms are numerically
    identical.
    """
    B = bank.maskmem.shape[0]
    S = bank.num_slots
    K = min(
        cfg.max_cond_frame_slots if max_cond_slots is None else max_cond_slots, S
    )
    K = max(K, 1)
    R = cfg.num_maskmem - 1
    frame_idx = jnp.asarray(frame_idx, jnp.int32)
    sign = -1 if track_in_reverse else 1

    # --- conditioning slots: K closest valid cond frames ---
    all_t = jnp.arange(S, dtype=jnp.int32)
    dist = jnp.abs(all_t[None, :] - frame_idx)  # [B?, S] — frame_idx scalar => [1, S]
    dist = jnp.broadcast_to(dist, (B, S))
    cond_ok = bank.valid & bank.is_cond
    score = jnp.where(cond_ok, -dist.astype(jnp.float32), -jnp.inf)
    top_scores, cond_idx = jax.lax.top_k(score, K)  # [B, K]
    cond_valid = jnp.isfinite(top_scores)

    # per-frame mask of cond frames that made the top-K. Cond frames that did
    # NOT make it remain eligible as non-cond memories / pointers below — the
    # reference's unselected_cond_outputs fallback (sam2_base.py:1296-1342:
    # non-cond lookups fall back to unselected conditioning frames).
    selected_as_cond = (
        jnp.zeros((B, S), jnp.int32)
        .at[jnp.arange(B)[:, None], cond_idx]
        .max(cond_valid.astype(jnp.int32))
        .astype(bool)
    )

    # --- non-conditioning slots: stride-r schedule, t_pos = 1..num_maskmem-1 ---
    r = 1 if is_training else max(1, cfg.memory_temporal_stride_for_eval)
    t_pos = jnp.arange(1, cfg.num_maskmem, dtype=jnp.int32)  # [R]
    t_rel = cfg.num_maskmem - t_pos
    if not track_in_reverse:
        last = frame_idx - 1
        base = ((frame_idx - 2) // r) * r
        strided = base - (t_rel - 2) * r
    else:
        last = frame_idx + 1
        base = -(-(frame_idx + 2) // r) * r
        strided = base + (t_rel - 2) * r
    noncond_idx = jnp.where(t_rel == 1, last, strided)  # [R]
    noncond_idx = jnp.broadcast_to(noncond_idx[None, :], (B, R))
    in_range = (noncond_idx >= 0) & (noncond_idx < num_frames)
    safe = jnp.clip(noncond_idx, 0, S - 1)
    noncond_valid = (
        in_range
        & jnp.take_along_axis(bank.valid, safe, axis=1)
        & ~jnp.take_along_axis(selected_as_cond, safe, axis=1)
    )

    mem_idx = jnp.concatenate([jnp.clip(cond_idx, 0, S - 1), safe], axis=1)
    mem_valid = jnp.concatenate([cond_valid, noncond_valid], axis=1)
    # cond frames use t_pos=0 -> enc index num_maskmem-1; non-cond t_pos=p -> num_maskmem-p-1
    mem_tpos = jnp.concatenate(
        [
            jnp.full((K,), cfg.num_maskmem - 1, jnp.int32),
            (cfg.num_maskmem - t_pos - 1).astype(jnp.int32),
        ]
    )

    # --- object-pointer slots ---
    if isinstance(num_frames, int):
        max_ptrs = min(num_frames, cfg.max_obj_ptrs_in_encoder)
        t_diff_max = max(max_ptrs - 1, 1)
    else:  # traced num_frames: static slot count at the cap, masked below
        max_ptrs = cfg.max_obj_ptrs_in_encoder
        t_diff_max = jnp.maximum(
            jnp.minimum(num_frames, cfg.max_obj_ptrs_in_encoder) - 1, 1
        ).astype(jnp.float32)
    # cond pointers (optionally restricted to the past at eval)
    cond_t = cond_idx.astype(jnp.int32)
    cond_ptr_valid = cond_valid
    if (not is_training) and cfg.only_obj_ptrs_in_the_past_for_eval:
        in_past = (cond_t >= frame_idx) if track_in_reverse else (cond_t <= frame_idx)
        cond_ptr_valid = cond_ptr_valid & in_past
    if cfg.use_signed_tpos_enc_to_obj_ptrs:
        cond_pos = ((frame_idx - cond_t) * sign).astype(jnp.float32)
    else:
        cond_pos = jnp.abs(frame_idx - cond_t).astype(jnp.float32)

    # non-cond pointers at t_diff = 1 .. max_ptrs-1
    t_diff = jnp.arange(1, max_ptrs, dtype=jnp.int32)  # [P_nc]
    nc_t = frame_idx + t_diff if track_in_reverse else frame_idx - t_diff
    nc_t = jnp.broadcast_to(nc_t[None, :], (B, t_diff.shape[0]))
    nc_in = (nc_t >= 0) & (nc_t < num_frames)
    nc_safe = jnp.clip(nc_t, 0, S - 1)
    nc_valid = (
        nc_in
        & jnp.take_along_axis(bank.valid, nc_safe, axis=1)
        & ~jnp.take_along_axis(selected_as_cond, nc_safe, axis=1)
    )
    nc_pos = jnp.broadcast_to(
        t_diff.astype(jnp.float32)[None, :], nc_t.shape
    )

    ptr_idx = jnp.concatenate([jnp.clip(cond_t, 0, S - 1), nc_safe], axis=1)
    ptr_valid = jnp.concatenate([cond_ptr_valid, nc_valid], axis=1)
    ptr_pos = jnp.concatenate([cond_pos, nc_pos], axis=1)

    return MemorySelection(
        mem_idx=mem_idx,
        mem_valid=mem_valid,
        mem_tpos=mem_tpos,
        ptr_idx=ptr_idx,
        ptr_valid=ptr_valid,
        ptr_pos=ptr_pos,
        t_diff_max=t_diff_max,
    )


def gather_memories(bank: MemoryBank, sel: MemorySelection):
    """Gather the selected memories.

    Returns:
      mem: [B, M, HW, mem_dim] spatial memories (M = K + R slots)
      ptrs: [B, P, C] object pointers
    """
    mem = jnp.take_along_axis(bank.maskmem, sel.mem_idx[:, :, None, None], axis=1)
    ptrs = jnp.take_along_axis(bank.obj_ptr, sel.ptr_idx[:, :, None], axis=1)
    return mem, ptrs
