"""Image predictor behavior + parity of the heads path vs the golden fixtures."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.conftest import require_fixture
from tests.test_parity import MINI
from us_video_medsam2_tpu.core.import_torch import convert_reference_state_dict
from us_video_medsam2_tpu.inference.image_predictor import SAM2ImagePredictor
from us_video_medsam2_tpu.models.sam2 import SAM2Model


@pytest.fixture(scope="module")
def predictor():
    sd = dict(np.load(require_fixture("mini_state_dict.npz")))
    params = convert_reference_state_dict(sd, MINI)
    return SAM2ImagePredictor(SAM2Model(MINI), params)


def test_point_and_box_prompts(predictor):
    rng = np.random.default_rng(0)
    img = (rng.random((200, 180, 3)) * 255).astype(np.uint8)
    predictor.set_image(img)
    masks, ious, low = predictor.predict(
        point_coords=np.array([[90.0, 100.0]]), point_labels=np.array([1])
    )
    assert masks.shape == (3, 200, 180) and masks.dtype == bool
    assert ious.shape == (3,)
    assert low.shape[1:] == (MINI.feat_size * 4, MINI.feat_size * 4)

    masks_b, ious_b, _ = predictor.predict(box=np.array([30, 40, 150, 160]), multimask_output=False)
    assert masks_b.shape == (1, 200, 180)

    # mask-input refinement path
    masks_r, _, _ = predictor.predict(
        point_coords=np.array([[90.0, 100.0]]),
        point_labels=np.array([1]),
        mask_input=low[np.argmax(ious)],
        multimask_output=False,
    )
    assert masks_r.shape == (1, 200, 180)


def test_batch_set_image(predictor):
    rng = np.random.default_rng(1)
    imgs = [(rng.random((64, 64, 3)) * 255).astype(np.uint8) for _ in range(2)]
    predictor.set_image_batch(imgs)
    m, i, l = predictor.predict(
        point_coords=np.array([[32.0, 32.0]]), point_labels=np.array([1])
    )
    assert np.isfinite(i).all()
