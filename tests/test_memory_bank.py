"""Memory-bank frame selection vs a literal re-evaluation of the reference's
schedule (sam2_base.py:1296-1422), including eval stride r>1 and reverse
tracking — the paths not covered by the tracking fixtures."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from us_video_medsam2_tpu.core.config import SAM2Config
from us_video_medsam2_tpu.models.memory_bank import (
    init_memory_bank,
    select_memories,
    write_memory,
)


def ref_noncond_schedule(frame_idx, num_maskmem, stride, track_in_reverse):
    """Literal port of reference sam2_base.py:1313-1342."""
    out = []
    for t_pos in range(1, num_maskmem):
        t_rel = num_maskmem - t_pos
        if t_rel == 1:
            prev = frame_idx - t_rel if not track_in_reverse else frame_idx + t_rel
        else:
            if not track_in_reverse:
                prev = ((frame_idx - 2) // stride) * stride
                prev = prev - (t_rel - 2) * stride
            else:
                prev = -(-(frame_idx + 2) // stride) * stride
                prev = prev + (t_rel - 2) * stride
        out.append((t_pos, prev))
    return out


def _bank_with_history(cfg, num_frames, cond_frames, tracked_until):
    bank = init_memory_bank(1, num_frames, 4, cfg.mem_dim, cfg.hidden_dim)
    for t in range(tracked_until + 1):
        bank = write_memory(
            bank,
            jnp.asarray(t),
            jnp.full((1, 4, cfg.mem_dim), float(t)),
            jnp.full((1, cfg.hidden_dim), float(t)),
            t in cond_frames,
        )
    return bank


@pytest.mark.parametrize("stride", [1, 2, 5])
@pytest.mark.parametrize("frame_idx", [7, 12, 30])
def test_noncond_selection_matches_reference_schedule(stride, frame_idx):
    cfg = dataclasses.replace(SAM2Config(), memory_temporal_stride_for_eval=stride)
    num_frames = 40
    bank = _bank_with_history(cfg, num_frames, {0}, tracked_until=frame_idx - 1)
    sel = select_memories(
        bank, jnp.asarray(frame_idx), cfg, num_frames, track_in_reverse=False,
        is_training=False,
    )
    k = cfg.max_cond_frame_slots
    got = {}
    for slot in range(k, k + cfg.num_maskmem - 1):
        t_pos = int(sel.mem_tpos[slot])
        t_pos = cfg.num_maskmem - 1 - t_pos  # enc index -> t_pos
        if bool(sel.mem_valid[0, slot]):
            got[t_pos] = int(sel.mem_idx[0, slot])
    ref = {}
    for t_pos, prev in ref_noncond_schedule(frame_idx, cfg.num_maskmem, stride, False):
        # reference: entry exists iff that frame was tracked as non-cond
        if 0 < prev < frame_idx and prev != 0:  # frame 0 is cond
            ref[t_pos] = prev
    assert got == ref, (stride, frame_idx, got, ref)


def test_reverse_selection_matches_reference_schedule():
    cfg = SAM2Config()
    num_frames = 20
    start = 10
    # reverse pass: cond at frame `start`, frames start+1.. tracked already? No —
    # reverse tracks downward: frames 11..19 untouched, frames 10 cond, 11+ valid
    bank = init_memory_bank(1, num_frames, 4, cfg.mem_dim, cfg.hidden_dim)
    bank = write_memory(bank, jnp.asarray(start), jnp.zeros((1, 4, cfg.mem_dim)),
                        jnp.zeros((1, cfg.hidden_dim)), True)
    for t in range(start + 1, 15):  # some frames tracked in reverse already
        bank = write_memory(bank, jnp.asarray(t), jnp.zeros((1, 4, cfg.mem_dim)),
                            jnp.zeros((1, cfg.hidden_dim)), False)
    frame_idx = 12
    sel = select_memories(
        bank, jnp.asarray(frame_idx), cfg, num_frames, track_in_reverse=True,
        is_training=False,
    )
    k = cfg.max_cond_frame_slots
    got = {}
    for slot in range(k, k + cfg.num_maskmem - 1):
        t_pos = cfg.num_maskmem - 1 - int(sel.mem_tpos[slot])
        if bool(sel.mem_valid[0, slot]):
            got[t_pos] = int(sel.mem_idx[0, slot])
    ref = {}
    for t_pos, prev in ref_noncond_schedule(frame_idx, cfg.num_maskmem, 1, True):
        if start < prev < 15:
            ref[t_pos] = prev
    assert got == ref, (got, ref)
    # cond slot selects frame `start`
    assert bool(sel.mem_valid[0, 0]) and int(sel.mem_idx[0, 0]) == start
    # pointer window looks FORWARD in reverse tracking
    ptr_frames = {
        int(sel.ptr_idx[0, i])
        for i in range(sel.ptr_idx.shape[1])
        if bool(sel.ptr_valid[0, i])
    }
    assert all(f >= frame_idx or f == start for f in ptr_frames)


def test_obj_ptr_window_forward():
    cfg = SAM2Config()
    num_frames = 30
    bank = _bank_with_history(cfg, num_frames, {0}, tracked_until=25)
    sel = select_memories(bank, jnp.asarray(26), cfg, num_frames, is_training=False)
    ptr_frames = sorted(
        int(sel.ptr_idx[0, i])
        for i in range(sel.ptr_idx.shape[1])
        if bool(sel.ptr_valid[0, i])
    )
    # cond frame 0 + t_diff 1..15 strictly prior non-cond frames (reference
    # sam2_base.py:1360-1394 with max_obj_ptrs_in_encoder=16)
    assert ptr_frames == [0] + list(range(26 - 15, 26))


def test_unselected_cond_frames_fall_back_to_noncond_slots():
    """With more valid cond frames than max_cond_frame_slots, the cond frames
    that miss the top-K must remain attendable as non-cond memories/pointers —
    the reference's unselected_cond_outputs fallback (sam2_base.py:1296-1342)."""
    cfg = SAM2Config()
    assert cfg.max_cond_frame_slots == 4
    num_frames = 20
    # frames 4..9 are ALL conditioning frames; nothing else tracked yet
    bank = _bank_with_history(cfg, num_frames, set(range(4, 10)), tracked_until=9)
    sel = select_memories(bank, jnp.asarray(10), cfg, num_frames, is_training=False)

    k = cfg.max_cond_frame_slots
    cond_selected = {
        int(sel.mem_idx[0, i]) for i in range(k) if bool(sel.mem_valid[0, i])
    }
    assert cond_selected == {6, 7, 8, 9}  # the 4 temporally closest cond frames

    # non-cond schedule for frame 10 at stride 1 covers frames 4..9; of those,
    # 4 and 5 are cond-but-unselected -> must be valid non-cond slots, while
    # 6..9 are already attended as cond slots -> must stay excluded
    noncond = {
        int(sel.mem_idx[0, i]): bool(sel.mem_valid[0, i])
        for i in range(k, k + cfg.num_maskmem - 1)
    }
    assert noncond == {4: True, 5: True, 6: False, 7: False, 8: False, 9: False}

    # pointers: unselected cond frames also qualify through the non-cond window
    ptr_frames = {
        int(sel.ptr_idx[0, i])
        for i in range(sel.ptr_idx.shape[1])
        if bool(sel.ptr_valid[0, i])
    }
    assert {4, 5} <= ptr_frames
