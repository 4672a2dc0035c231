"""Batched mesh-sharded serving path vs the interactive predictor.

batched_propagate (inference/serve.py) must reproduce propagate_in_video's
per-video results exactly (same jit bodies composed), and actually shard the
video axis over the 8-fake-device mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import require_fixture
from tests.test_parity import MINI, nchw2nhwc
from us_video_medsam2_tpu.core.import_torch import convert_reference_state_dict
from us_video_medsam2_tpu.inference.serve import batched_propagate
from us_video_medsam2_tpu.inference.video_predictor import SAM2VideoPredictor
from us_video_medsam2_tpu.models.sam2 import SAM2Model
from us_video_medsam2_tpu.parallel.mesh import create_mesh


@pytest.fixture(scope="module")
def predictor():
    sd = dict(np.load(require_fixture("mini_state_dict.npz")))
    params = convert_reference_state_dict(sd, MINI)
    return SAM2VideoPredictor(SAM2Model(MINI), params, fill_hole_area=0)


def _videos(n, t, size):
    rng = np.random.default_rng(0)
    vids = rng.standard_normal((n, t, size, size, 3)).astype(np.float32)
    for i in range(n):
        yy, xx = np.mgrid[0:size, 0:size]
        blob = ((yy - 100 - 5 * i) ** 2 + (xx - 120 + 4 * i) ** 2) < 40**2
        vids[i, :, blob] += 3.0
    return vids


def test_batched_matches_interactive(predictor):
    size = MINI.image_size
    vids = _videos(2, 3, size)
    pts = np.array([[[120.0, 100.0]], [[116.0, 105.0]]], np.float32)
    lbl = np.ones((2, 1), np.int32)

    lows = np.asarray(batched_propagate(predictor, vids, pts, lbl))
    assert lows.shape == (2, 3, 4 * MINI.feat_size, 4 * MINI.feat_size)

    for i in range(2):
        state = predictor.init_state(jnp.asarray(vids[i]), size, size, 1)
        predictor.add_new_points_or_box(
            state, 0, 1, points=pts[i], labels=lbl[i], normalize_coords=False
        )
        got = {}
        for fi, _, logits in predictor.propagate_in_video(state):
            got[fi] = np.asarray(logits[0, 0])
        for fi in range(3):
            mine = lows[i, fi]
            # compare at video res? interactive yields video-res; compare masks
            ref_mask = got[fi] > 0
            # upsample batched low-res to video res the same way
            from us_video_medsam2_tpu.ops.resize import resize2d

            up = np.asarray(
                resize2d(jnp.asarray(mine)[None, ..., None].astype(jnp.float32),
                         (size, size), mode="linear")[0, ..., 0]
            )
            inter = ((up > 0) & ref_mask).sum()
            union = ((up > 0) | ref_mask).sum()
            iou = 1.0 if union == 0 else inter / union
            assert iou > 0.99, (i, fi, iou)


def test_batched_shards_over_mesh(predictor):
    size = MINI.image_size
    n_dev = jax.device_count()
    vids = _videos(n_dev, 2, size)
    pts = np.tile(np.array([[[120.0, 100.0]]], np.float32), (n_dev, 1, 1))
    lbl = np.ones((n_dev, 1), np.int32)
    mesh = create_mesh()
    out = batched_propagate(predictor, vids, pts, lbl, mesh=mesh)
    assert out.shape[0] == n_dev
    # the video axis must actually be sharded across devices
    assert len(out.sharding.device_set) == n_dev
    assert np.isfinite(np.asarray(out)).all()
