"""connected_components vs cv2 (the behavior contract of the reference CUDA kernel)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp  # noqa: E402

from us_video_medsam2_tpu.ops.connected_components import (  # noqa: E402
    connected_components,
    fill_holes_in_mask_scores,
)


def _ref_label_areas(mask_np):
    """cv2 8-connectivity labels + per-pixel component area."""
    n, labels = cv2.connectedComponents(mask_np.astype(np.uint8), connectivity=8)
    areas = np.zeros_like(labels)
    for lbl in range(1, n):
        areas[labels == lbl] = (labels == lbl).sum()
    return labels, areas


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("density", [0.2, 0.5, 0.8])
def test_component_areas_match_cv2(seed, density):
    rng = np.random.default_rng(seed)
    mask = rng.random((64, 64)) < density
    _, areas = connected_components(jnp.asarray(mask[None]))
    _, ref_areas = _ref_label_areas(mask)
    np.testing.assert_array_equal(np.asarray(areas[0]), ref_areas)


def test_component_labels_are_consistent():
    rng = np.random.default_rng(3)
    mask = rng.random((48, 48)) < 0.5
    labels, _ = connected_components(jnp.asarray(mask[None]))
    labels = np.asarray(labels[0])
    ref_labels, _ = _ref_label_areas(mask)
    # same partition: bijection between label ids
    assert (labels > 0).sum() == (ref_labels > 0).sum()
    pairs = set(zip(labels[mask].tolist(), ref_labels[mask].tolist()))
    assert len(pairs) == len({a for a, _ in pairs}) == len({b for _, b in pairs})


def test_fill_holes():
    """A 2x2 hole inside a blob gets flipped to +0.1; big background untouched."""
    mask = -np.ones((1, 32, 32), np.float32)
    mask[0, 8:24, 8:24] = 5.0
    mask[0, 14:16, 14:16] = -3.0  # 4-px hole
    out = np.asarray(fill_holes_in_mask_scores(jnp.asarray(mask), max_area=8))
    assert (out[0, 14:16, 14:16] == np.float32(0.1)).all()
    assert out[0, 0, 0] == -1.0
    out2 = np.asarray(fill_holes_in_mask_scores(jnp.asarray(mask), max_area=2))
    assert (out2[0, 14:16, 14:16] == -3.0).all()  # hole bigger than max_area stays
