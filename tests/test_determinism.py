"""Determinism: the reference relies on seeded deterministic eval
(medsam2_infer_video.py:240-249); here identical seeds must give identical
results bitwise — propagation, training steps, and prompt samplers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_parity import MINI
from tests.test_train_step import TINY, _batch
from us_video_medsam2_tpu.models.sam2 import SAM2Model


def test_propagation_bitwise_deterministic():
    from tests.conftest import require_fixture
    from us_video_medsam2_tpu.core.import_torch import convert_reference_state_dict
    from us_video_medsam2_tpu.inference.video_predictor import SAM2VideoPredictor

    sd = dict(np.load(require_fixture("mini_state_dict.npz")))
    params = convert_reference_state_dict(sd, MINI)
    predictor = SAM2VideoPredictor(SAM2Model(MINI), params, fill_hole_area=4)
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.standard_normal((4, 256, 256, 3)), jnp.float32)

    def run():
        state = predictor.init_state(video, 256, 256, 1)
        predictor.add_new_points_or_box(
            state, 0, 1, points=np.array([[100.0, 120.0]]), labels=np.array([1])
        )
        return np.concatenate(
            [np.asarray(m) for _, _, m in predictor.propagate_in_video(state)]
        )

    a, b = run(), run()
    np.testing.assert_array_equal(a, b)


def test_train_step_deterministic_given_rng():
    from us_video_medsam2_tpu.training.optimizer import OptimConfig
    from us_video_medsam2_tpu.training.train_model import TrainSimConfig
    from us_video_medsam2_tpu.training.train_step import (
        TrainConfig,
        create_train_state,
        make_train_step,
    )

    model = SAM2Model(TINY)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    cfg = TrainConfig(
        sim=TrainSimConfig(num_correction_pt_per_frame=1),
        optim=OptimConfig(total_steps=10),
    )
    batch = _batch(t=2, b=1, o=2)
    step = make_train_step(model, cfg, donate=False)
    s0 = create_train_state(model, params, cfg)
    _, m1 = step(s0, batch, jax.random.PRNGKey(3))
    _, m2 = step(s0, batch, jax.random.PRNGKey(3))
    assert float(m1["core_loss"]) == float(m2["core_loss"])
    _, m3 = step(s0, batch, jax.random.PRNGKey(4))
    assert float(m3["core_loss"]) != float(m1["core_loss"])  # rng actually matters


def test_point_samplers_match_reference_semantics():
    """sample_random_points_from_errors: literal numpy port of the reference's
    argmax-of-noise construction must agree given the same noise field."""
    import us_video_medsam2_tpu.training.prompt_sampling as ps

    rng = jax.random.PRNGKey(0)
    b, h, w = 3, 24, 20
    nrng = np.random.default_rng(1)
    gt = jnp.asarray(nrng.random((b, 1, h, w)) > 0.7)
    pred = jnp.asarray(nrng.random((b, 1, h, w)) > 0.7)

    pts, lbls = ps.sample_random_points_from_errors(gt, pred, rng)
    pts, lbls = np.asarray(pts), np.asarray(lbls)

    # reference semantics (sam2_utils.py:202-249: interleave FP/FN noise,
    # flat argmax over [H*W*2]) re-evaluated in numpy with the same noise
    noise = np.asarray(jax.random.uniform(rng, (2, b, 1, h, w)))
    gt_np, pred_np = np.asarray(gt), np.asarray(pred)
    fp = ~gt_np & pred_np
    fn = gt_np & ~pred_np
    all_correct = (gt_np == pred_np).reshape(b, 1, -1).all(-1)[..., None, None]
    n0 = noise[0] * (fp | (all_correct & ~gt_np))
    n1 = noise[1] * fn
    stacked = np.stack([n0, n1], axis=-1).reshape(b, 1, -1)
    idx = stacked.argmax(axis=2)
    exp_lbl = (idx % 2).astype(np.int32)
    pix = idx // 2
    exp_pts = np.stack([(pix % w), (pix // w)], axis=2).astype(np.float32)
    np.testing.assert_array_equal(lbls, exp_lbl)
    np.testing.assert_array_equal(pts, exp_pts)

    # labels: clicks in FN regions are positive, FP regions negative
    for i in range(b):
        x, y = int(pts[i, 0, 0]), int(pts[i, 0, 1])
        if lbls[i, 0] == 1:
            assert fn[i, 0, y, x]
        else:
            assert fp[i, 0, y, x] or all_correct[i, 0, 0]


def test_box_sampler_bounds_and_labels():
    from us_video_medsam2_tpu.training.prompt_sampling import mask_to_box, sample_box_points

    mask = np.zeros((2, 1, 50, 60), bool)
    mask[0, 0, 10:30, 5:25] = True
    mask[1, 0, 0:8, 50:60] = True
    box = np.asarray(mask_to_box(jnp.asarray(mask)))
    np.testing.assert_array_equal(box[0, 0], [5, 10, 24, 29])
    np.testing.assert_array_equal(box[1, 0], [50, 0, 59, 7])

    pts, lbls = sample_box_points(jnp.asarray(mask), jax.random.PRNGKey(0))
    pts, lbls = np.asarray(pts), np.asarray(lbls)
    np.testing.assert_array_equal(lbls, [[2, 3], [2, 3]])
    assert (pts[..., 0] >= 0).all() and (pts[..., 0] <= 59).all()
    assert (pts[..., 1] >= 0).all() and (pts[..., 1] <= 49).all()
    # noise bounded by 10% of box size (clamped to noise_bound)
    assert abs(pts[0, 0, 0] - 5) <= 2.0 and abs(pts[0, 1, 0] - 24) <= 2.0
