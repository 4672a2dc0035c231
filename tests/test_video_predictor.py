"""Full interactive-predictor parity vs the reference SAM2VideoPredictorNPZ fixture:
mask + point prompts on a middle frame, consolidation, forward + reverse propagation."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import require_fixture
from tests.test_parity import MINI, nchw2nhwc
from us_video_medsam2_tpu.core.import_torch import convert_reference_state_dict
from us_video_medsam2_tpu.inference.video_predictor import SAM2VideoPredictor
from us_video_medsam2_tpu.models.sam2 import SAM2Model


@pytest.fixture(scope="module")
def predictor():
    sd = dict(np.load(require_fixture("mini_state_dict.npz")))
    params = convert_reference_state_dict(sd, MINI)
    model = SAM2Model(MINI)
    return SAM2VideoPredictor(model, params, fill_hole_area=0)


def _iou(a, b):
    a, b = a > 0, b > 0
    inter = (a & b).sum()
    union = (a | b).sum()
    return 1.0 if union == 0 else inter / union


def test_predictor_video_parity(predictor):
    fx = np.load(require_fixture("predictor_video.npz"))
    images = nchw2nhwc(fx["images"])  # [5, 256, 256, 3]
    vh, vw = 200, 180

    state = predictor.init_state(images, vh, vw, max_objects=2)
    predictor.add_new_mask(state, 1, 1, jnp.asarray(fx["mask_prompt"]))
    _, obj_ids, prompt_masks = predictor.add_new_points_or_box(
        state, 1, 2, points=np.array([[30.0, 150.0]]), labels=np.array([1])
    )
    assert obj_ids == [1, 2]
    ref_prompt = fx["prompt_masks"]  # [2, 1, vh, vw]
    np.testing.assert_allclose(prompt_masks, ref_prompt, rtol=0.05, atol=0.05)

    got = {}
    for t, _, masks in predictor.propagate_in_video(state):
        got[("fwd", t)] = masks
    for t, _, masks in predictor.propagate_in_video(state, reverse=True):
        got[("rev", t)] = masks

    ref_keys = sorted(k for k in fx.files if k.startswith(("fwd_", "rev_")))
    assert {(k.split("_")[0], int(k.split("_")[1])) for k in ref_keys} == set(got)
    for k in ref_keys:
        d, t = k.split("_")
        mine = got[(d, int(t))]
        ref = fx[k]
        assert mine.shape == ref.shape, (k, mine.shape, ref.shape)
        # logits tolerance is loose (bf16 memory bank on both sides, 4 attention
        # layers deep); the binarized masks must agree almost exactly
        for o in range(ref.shape[0]):
            iou = _iou(mine[o, 0], ref[o, 0])
            assert iou > 0.99, (k, o, iou)
        np.testing.assert_allclose(mine, ref, rtol=0.15, atol=0.15, err_msg=k)


def test_chunked_streaming_matches_full_scan(predictor):
    """chunk_size streaming must produce identical masks to the one-scan path."""
    fx = np.load(require_fixture("predictor_video.npz"))
    images = nchw2nhwc(fx["images"])

    def run(chunk):
        state = predictor.init_state(images, 200, 180, max_objects=2)
        predictor.add_new_mask(state, 1, 1, jnp.asarray(fx["mask_prompt"]))
        predictor.add_new_points_or_box(
            state, 1, 2, points=np.array([[30.0, 150.0]]), labels=np.array([1])
        )
        fwd = {
            t: m for t, _, m in predictor.propagate_in_video(state, chunk_size=chunk)
        }
        rev = {
            t: m
            for t, _, m in predictor.propagate_in_video(
                state, reverse=True, chunk_size=chunk
            )
        }
        return fwd, rev

    fwd_full, rev_full = run(None)
    fwd_chunk, rev_chunk = run(2)
    assert set(fwd_full) == set(fwd_chunk)
    assert set(rev_full) == set(rev_chunk)
    for t in fwd_full:
        np.testing.assert_array_equal(fwd_chunk[t], fwd_full[t])
    for t in rev_full:
        np.testing.assert_array_equal(rev_chunk[t], rev_full[t])


def test_max_frame_num_to_track_bounds_tracking_and_bank(predictor):
    """Frames past the requested window must be neither yielded NOR tracked
    into the bank (reference only iterates the window,
    sam2_video_predictor.py:663-746). Both scan and chunked paths."""
    fx = np.load(require_fixture("predictor_video.npz"))
    images = nchw2nhwc(fx["images"])  # 5 frames

    for chunk in (None, 2):
        state = predictor.init_state(images, 200, 180, max_objects=2)
        predictor.add_new_mask(state, 1, 1, jnp.asarray(fx["mask_prompt"]))
        yielded = [
            t
            for t, _, _ in predictor.propagate_in_video(
                state, max_frame_num_to_track=2, chunk_size=chunk
            )
        ]
        assert yielded == [1, 2, 3], (chunk, yielded)
        valid = np.asarray(state.bank.valid[0])
        assert not valid[4], f"frame 4 is outside the window (chunk={chunk})"
        assert valid[1] and valid[2] and valid[3]


def _prompt_two_objects(predictor, fx, images):
    state = predictor.init_state(images, 200, 180, max_objects=2)
    predictor.add_new_mask(state, 1, 1, jnp.asarray(fx["mask_prompt"]))
    predictor.add_new_points_or_box(
        state, 1, 2, points=np.array([[30.0, 150.0]]), labels=np.array([1])
    )
    return state


def test_remove_object_before_propagation_matches_fresh_session(predictor):
    """Removing an object pre-propagation must leave the session bitwise
    indistinguishable from one where the object was never prompted
    (reference remove_object, sam2_video_predictor.py:1042-1153)."""
    fx = np.load(require_fixture("predictor_video.npz"))
    images = nchw2nhwc(fx["images"])

    state = _prompt_two_objects(predictor, fx, images)
    obj_ids, updated = predictor.remove_object(state, 2)
    assert obj_ids == [1]
    assert [f for f, _ in updated] == [1]
    assert updated[0][1].shape == (2, 1, 200, 180)
    got = {t: m for t, _, m in predictor.propagate_in_video(state)}

    ref_state = predictor.init_state(images, 200, 180, max_objects=2)
    predictor.add_new_mask(ref_state, 1, 1, jnp.asarray(fx["mask_prompt"]))
    want = {t: m for t, _, m in predictor.propagate_in_video(ref_state)}

    assert set(got) == set(want)
    for t in want:
        np.testing.assert_array_equal(got[t], want[t])


def test_remove_object_after_propagation(predictor):
    """Removing a tracked object drops its bank rows/prompts; the surviving
    object's re-propagation matches a fresh single-object session row-for-row."""
    fx = np.load(require_fixture("predictor_video.npz"))
    images = nchw2nhwc(fx["images"])

    state = _prompt_two_objects(predictor, fx, images)
    for _ in predictor.propagate_in_video(state):
        pass
    obj_ids, updated = predictor.remove_object(state, 1)
    assert obj_ids == [2]
    assert [f for f, _ in updated] == [1]
    # object 2 now occupies row 0; its memories moved with it
    assert bool(np.asarray(state.bank.valid[0]).any())
    got = {t: m for t, _, m in predictor.propagate_in_video(state)}

    ref_state = predictor.init_state(images, 200, 180, max_objects=2)
    predictor.add_new_points_or_box(
        ref_state, 1, 2, points=np.array([[30.0, 150.0]]), labels=np.array([1])
    )
    want = {t: m for t, _, m in predictor.propagate_in_video(ref_state)}

    assert set(got) == set(want)
    for t in want:
        # compare the surviving object's row; the padding row differs (blanked
        # here vs placeholder-encoded in the fresh session) by design
        np.testing.assert_array_equal(got[t][0], want[t][0])


def test_remove_object_edge_cases(predictor):
    fx = np.load(require_fixture("predictor_video.npz"))
    images = nchw2nhwc(fx["images"])
    state = _prompt_two_objects(predictor, fx, images)

    # unknown id: no-op unless strict (reference :1049-1056)
    obj_ids, updated = predictor.remove_object(state, 99)
    assert obj_ids == [1, 2] and updated == []
    with pytest.raises(RuntimeError):
        predictor.remove_object(state, 99, strict=True)

    # removing the last object resets the whole state (reference :1088-1091)
    predictor.remove_object(state, 2)
    obj_ids, _ = predictor.remove_object(state, 1)
    assert obj_ids == []
    assert not np.asarray(state.bank.valid).any()
    assert state.pending == {} and state.prompt_frames == {}


def test_clear_all_prompts_in_frame(predictor):
    """Clearing a frame's last prompt downgrades it to non-cond; clearing all
    prompts resets tracking (reference clear_all_prompts_in_frame:777-845)."""
    fx = np.load(require_fixture("predictor_video.npz"))
    images = nchw2nhwc(fx["images"])

    state = predictor.init_state(images, 200, 180, max_objects=2)
    predictor.add_new_mask(state, 1, 1, jnp.asarray(fx["mask_prompt"]))
    predictor.add_new_points_or_box(
        state, 3, 1, points=np.array([[30.0, 150.0]]), labels=np.array([1])
    )
    for _ in predictor.propagate_in_video(state):
        pass
    assert bool(np.asarray(state.bank.is_cond[0, 3]))

    out = predictor.clear_all_prompts_in_frame(state, 3, 1)
    assert out[0] == 3 and out[1] == [1]
    # downgraded: memory still valid, no longer conditioning
    assert not bool(np.asarray(state.bank.is_cond[0, 3]))
    assert bool(np.asarray(state.bank.valid[0, 3]))
    assert 3 not in state.cond_low_res and 3 not in state.frames_tracked

    predictor.clear_all_prompts_in_frame(state, 1, 1)
    # last conditioning frame gone -> full tracking reset (reference :823-825)
    assert not np.asarray(state.bank.valid).any()
    assert state.cond_low_res == {} and state.frames_tracked == {}
    assert state.obj_ids == [1]  # ids survive a tracking reset


def test_clear_non_cond_mem_around_input(predictor):
    """clear_non_cond_mem_around_input scrubs non-cond memories around prompted
    frames at preflight AND when propagation passes a cond frame
    (reference sam2_video_predictor.py:627-632, 708-714, 1155-1172)."""
    fx = np.load(require_fixture("predictor_video.npz"))
    images = nchw2nhwc(fx["images"])
    pred = SAM2VideoPredictor(
        predictor.model, predictor.params, fill_hole_area=0,
        clear_non_cond_mem_around_input=True,
    )
    # MINI: num_maskmem=7, stride r=1 -> radius 7 covers the whole 5-frame video
    assert pred._clear_radius() == 7

    state = pred.init_state(images, 200, 180, max_objects=1)
    pred.add_new_mask(state, 1, 1, jnp.asarray(fx["mask_prompt"]))
    for _ in pred.propagate_in_video(state):
        pass
    valid = np.asarray(state.bank.valid[0])
    assert valid[1] and valid[2] and valid[3] and valid[4]

    # re-prompt frame 3: preflight must scrub every surrounding non-cond memory
    pred.add_new_points_or_box(
        state, 3, 1, points=np.array([[30.0, 150.0]]), labels=np.array([1])
    )
    pred.propagate_in_video_preflight(state)
    valid = np.asarray(state.bank.valid[0])
    is_cond = np.asarray(state.bank.is_cond[0])
    assert valid[1] and is_cond[1] and valid[3] and is_cond[3]
    assert not valid[0] and not valid[2] and not valid[4]

    # propagate: frame 2 is re-tracked, then scrubbed again when the scan passes
    # cond frame 3; frame 4 (tracked after 3) survives
    for _ in pred.propagate_in_video(state):
        pass
    valid = np.asarray(state.bank.valid[0])
    assert valid[1] and valid[3] and valid[4]
    assert not valid[2], "in-scan clearing must scrub frame 2 at cond frame 3"


# ------------------------------- long-video support (T-bucketing + offload)


def _session_masks(predictor, fx, images, **init_kw):
    state = predictor.init_state(images, 200, 180, max_objects=2, **init_kw)
    predictor.add_new_mask(state, 1, 1, jnp.asarray(fx["mask_prompt"]))
    _, _, prompt_masks = predictor.add_new_points_or_box(
        state, 1, 2, points=np.array([[30.0, 150.0]]), labels=np.array([1])
    )
    fwd = {t: m for t, _, m in predictor.propagate_in_video(state)}
    rev = {t: m for t, _, m in predictor.propagate_in_video(state, reverse=True)}
    return state, prompt_masks, fwd, rev


def test_bucketed_session_matches_exact(predictor):
    """t_bucket pads the bank's slot axis; invalid slots are masked with exact
    zeros in attention, so a bucketed session must reproduce the exact-shape
    session's outputs."""
    fx = np.load(require_fixture("predictor_video.npz"))
    images = nchw2nhwc(fx["images"])  # 5 frames

    s_exact, pm_exact, fwd_e, rev_e = _session_masks(predictor, fx, images)
    s_buck, pm_buck, fwd_b, rev_b = _session_masks(
        predictor, fx, images, t_bucket="auto"
    )
    assert s_buck.bank.num_slots == 16 and s_exact.bank.num_slots == 5
    np.testing.assert_allclose(pm_buck, pm_exact, rtol=1e-4, atol=1e-4)
    assert set(fwd_b) == set(fwd_e) and set(rev_b) == set(rev_e)
    for t in fwd_e:
        np.testing.assert_allclose(fwd_b[t], fwd_e[t], rtol=1e-3, atol=1e-3)
        assert _iou(fwd_b[t][0, 0], fwd_e[t][0, 0]) > 0.999
    for t in rev_e:
        np.testing.assert_allclose(rev_b[t], rev_e[t], rtol=1e-3, atol=1e-3)


def test_offloaded_session_matches_device(predictor):
    """offload_video_to_host keeps frames in host RAM and feeds the device per
    chunk; with host_dtype=float32 the results must match the device-resident
    session numerically."""
    fx = np.load(require_fixture("predictor_video.npz"))
    images = nchw2nhwc(fx["images"])

    s_dev, pm_dev, fwd_d, rev_d = _session_masks(predictor, fx, images)
    s_off = predictor.init_state(
        images, 200, 180, max_objects=2,
        offload_video_to_host=True, io_chunk=4, host_dtype=np.float32,
    )
    assert s_off.images is None and s_off.images_host.shape[0] == 5
    assert s_off.bank.num_slots == 16  # offload implies bucketing
    predictor.add_new_mask(s_off, 1, 1, jnp.asarray(fx["mask_prompt"]))
    _, _, pm_off = predictor.add_new_points_or_box(
        s_off, 1, 2, points=np.array([[30.0, 150.0]]), labels=np.array([1])
    )
    np.testing.assert_allclose(pm_off, pm_dev, rtol=1e-4, atol=1e-4)
    fwd_o = {t: m for t, _, m in predictor.propagate_in_video(s_off, chunk_size=2)}
    rev_o = {
        t: m
        for t, _, m in predictor.propagate_in_video(s_off, reverse=True, chunk_size=2)
    }
    assert set(fwd_o) == set(fwd_d) and set(rev_o) == set(rev_d)
    for t in fwd_d:
        np.testing.assert_allclose(fwd_o[t], fwd_d[t], rtol=1e-3, atol=1e-3)
        assert _iou(fwd_o[t][0, 0], fwd_d[t][0, 0]) > 0.999
    for t in rev_d:
        np.testing.assert_allclose(rev_o[t], rev_d[t], rtol=1e-3, atol=1e-3)


def test_long_video_program_sharing(predictor):
    """Distinct video lengths inside one slot bucket must share ONE compiled
    chunk program; a longer video adds at most one more (the round-5 long-video
    contract: <=2 programs across e.g. 37/64/1000 frames)."""
    fx = np.load(require_fixture("predictor_video.npz"))
    base = np.asarray(nchw2nhwc(fx["images"]))  # [5, 256, 256, 3]

    pred = SAM2VideoPredictor(predictor.model, predictor.params, fill_hole_area=0)

    def run(nf):
        images = np.concatenate([base] * ((nf + 4) // 5))[:nf]
        state = pred.init_state(
            images, 200, 180, max_objects=1,
            offload_video_to_host=True, io_chunk=4,
        )
        pred.add_new_mask(state, 0, 1, jnp.asarray(fx["mask_prompt"]))
        got = [t for t, _, _ in pred.propagate_in_video(state, chunk_size=4)]
        assert got == list(range(nf)), (nf, got)
        return state

    s5 = run(5)
    s9 = run(9)
    assert s5.bank.num_slots == s9.bank.num_slots == 16
    assert pred._propagate_chunk._cache_size() == 1, "same bucket must share"
    s20 = run(20)
    assert s20.bank.num_slots == 32
    assert pred._propagate_chunk._cache_size() == 2
    # the per-chunk host->device feed program is shared across ALL lengths
    assert pred._prep_chunk._cache_size() == 1
    # prompting compiles once per bank bucket (the bank is a traced argument),
    # never per video length
    assert pred._prompt_frame._cache_size() == 2


def test_offloaded_uint8_store_matches_device(predictor):
    """A model-resolution uint8 video offloads as RAW bytes (normalize+fold run
    on device per chunk); results must match the device-resident session, whose
    init preprocesses the same way."""
    rng = np.random.default_rng(7)
    video = rng.integers(0, 255, (5, 256, 256, 3), np.uint8)
    video[:, 60:140, 80:160] = 240  # a bright square to track

    def session(**kw):
        state = predictor.init_state(video, 200, 180, max_objects=1, **kw)
        predictor.add_new_points_or_box(
            state, 0, 1, points=np.array([[120.0, 100.0]]), labels=np.array([1])
        )
        fwd = {t: m for t, _, m in predictor.propagate_in_video(state, chunk_size=2)}
        return state, fwd

    s_dev, fwd_dev = session()
    s_off, fwd_off = session(offload_video_to_host=True)
    assert s_off.images_host.dtype == np.uint8
    assert s_off.images_host.shape == video.shape  # raw store, no fold
    assert set(fwd_off) == set(fwd_dev)
    for t in fwd_dev:
        np.testing.assert_allclose(fwd_off[t], fwd_dev[t], rtol=1e-3, atol=1e-3)
        assert _iou(fwd_off[t][0, 0], fwd_dev[t][0, 0]) > 0.999
