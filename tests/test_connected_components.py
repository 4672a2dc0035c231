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


@pytest.mark.parametrize("method", ["fast", "exact"])
def test_fill_holes(method):
    """A 2x2 hole inside a blob gets flipped to +0.1; big background untouched."""
    mask = -np.ones((1, 32, 32), np.float32)
    mask[0, 8:24, 8:24] = 5.0
    mask[0, 14:16, 14:16] = -3.0  # 4-px hole
    out = np.asarray(fill_holes_in_mask_scores(jnp.asarray(mask), 8, method=method))
    assert (out[0, 14:16, 14:16] == np.float32(0.1)).all()
    assert out[0, 0, 0] == -1.0
    out2 = np.asarray(fill_holes_in_mask_scores(jnp.asarray(mask), 2, method=method))
    assert (out2[0, 14:16, 14:16] == -3.0).all()  # hole bigger than max_area stays


@pytest.mark.parametrize("method", ["fast", "exact"])
def test_fill_holes_keeps_large_interior_pocket(method):
    """Ring-shaped masks: the big interior pocket must never be filled."""
    mask = -np.ones((1, 64, 64), np.float32)
    mask[0, 6:58, 6:58] = 4.0
    mask[0, 30:42, 30:42] = -2.0  # 12x12 interior pocket (donut)
    mask[0, 12:14, 12:14] = -1.5  # small true hole (4 px), >8 px from the pocket
    out = np.asarray(fill_holes_in_mask_scores(jnp.asarray(mask), 8, method=method))
    assert (out[0, 30:42, 30:42] == -2.0).all()
    assert (out[0, 12:14, 12:14] == np.float32(0.1)).all()


def test_fill_holes_fast_matches_exact_on_isolated_holes():
    rng = np.random.default_rng(0)
    mask = -np.ones((2, 64, 64), np.float32) * 3
    mask[:, 8:56, 8:56] = 5.0
    # scatter isolated small holes (far apart)
    for b in range(2):
        for cy, cx in [(16, 16), (16, 44), (44, 16), (44, 44)]:
            s = int(rng.integers(1, 3))
            mask[b, cy : cy + s, cx : cx + s] = -2.0
    fast = np.asarray(fill_holes_in_mask_scores(jnp.asarray(mask), 8, method="fast"))
    exact = np.asarray(fill_holes_in_mask_scores(jnp.asarray(mask), 8, method="exact"))
    np.testing.assert_array_equal(fast, exact)


# ------------------------------------------------- small_component_mask (r3)
def _ref_small(mask_np, max_area):
    labels, areas = _ref_label_areas(mask_np)
    return (labels > 0) & (areas <= max_area)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("density", [0.1, 0.3, 0.5, 0.7])
@pytest.mark.parametrize("max_area", [1, 4, 8])
def test_small_component_mask_exact_vs_cv2(seed, density, max_area):
    """The bounded-propagation predicate is EXACT on random topologies —
    including border-touching components and snake-shaped large components
    (the cases the round-2 fast path deviated on)."""
    from us_video_medsam2_tpu.ops.connected_components import small_component_mask

    rng = np.random.default_rng(seed)
    mask = rng.random((64, 64)) < density
    got = np.asarray(small_component_mask(jnp.asarray(mask[None]), max_area))[0]
    np.testing.assert_array_equal(got, _ref_small(mask, max_area))


def test_small_component_mask_adversarial_shapes():
    """Targeted topologies: thin snake area>A (must NOT match even though its
    pseudo-labels could have small counts), border-touching small pocket (the
    fast path misses it; exact must fill), adjacent small pockets."""
    from us_video_medsam2_tpu.ops.connected_components import small_component_mask

    m = np.zeros((48, 48), bool)
    # 1-px-wide snake of length 30 (area 30 > 8)
    m[5, 2:32] = True
    # small component touching the border (area 4)
    m[0:2, 40:42] = True
    # two 4-px pockets two pixels apart (both exactly small)
    m[30:32, 10:12] = True
    m[30:32, 14:16] = True
    # single pixel
    m[44, 44] = True
    got = np.asarray(small_component_mask(jnp.asarray(m[None]), 8))[0]
    np.testing.assert_array_equal(got, _ref_small(m, 8))
    assert not got[5, 2:32].any()          # snake excluded
    assert got[0:2, 40:42].all()           # border component included
    assert got[30:32, 10:12].all() and got[30:32, 14:16].all()
    assert got[44, 44]


def test_exact_fill_holes_fills_border_pockets():
    """method='exact' (now the default) fills small border-touching pockets
    exactly like the reference CUDA path; 'fast' documents the deviation."""
    mask = np.full((1, 32, 32), 5.0, np.float32)
    mask[0, 0:2, 10:12] = -1.0  # small pocket on the border
    exact = np.asarray(fill_holes_in_mask_scores(jnp.asarray(mask), 8, method="exact"))
    assert (exact[0, 0:2, 10:12] == np.float32(0.1)).all()
    default = np.asarray(fill_holes_in_mask_scores(jnp.asarray(mask), 8))
    np.testing.assert_array_equal(default, exact)  # exact IS the default


def test_remove_small_sprinkles_exact():
    from us_video_medsam2_tpu.ops.connected_components import remove_small_sprinkles

    rng = np.random.default_rng(5)
    logits = np.where(rng.random((1, 64, 64)) < 0.25, 2.0, -2.0).astype(np.float32)
    out = np.asarray(remove_small_sprinkles(jnp.asarray(logits), 6))
    ref = _ref_small(logits[0] > 0, 6)
    np.testing.assert_array_equal(out[0] == np.float32(-10.0), ref)
    # untouched elsewhere
    np.testing.assert_array_equal(out[0][~ref], logits[0][~ref])
