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
