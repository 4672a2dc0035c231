"""Image/coordinate transforms for inference (reference sam2/utils/transforms.py).

Resize-to-square + ImageNet normalization, coordinate/box transforms, and mask
postprocessing (hole filling + sprinkle removal + resize to original resolution).
All pieces are jittable; the predictor composes them on device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from us_video_medsam2_tpu.ops.connected_components import (
    fill_holes_in_mask_scores,
    remove_small_sprinkles,
)
from us_video_medsam2_tpu.ops.resize import resize2d

IMG_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMG_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess_images(images: jnp.ndarray, image_size: int) -> jnp.ndarray:
    """uint8/float [..., H, W, 3] -> normalized float32 [..., S, S, 3]."""
    x = images.astype(jnp.float32)
    x = x / 255.0 if images.dtype == jnp.uint8 else x
    if x.shape[-3] != image_size or x.shape[-2] != image_size:
        x = resize2d(x, (image_size, image_size), mode="linear")
    return (x - IMG_MEAN) / IMG_STD


def transform_coords(
    coords: np.ndarray, orig_hw: tuple[int, int], image_size: int
) -> np.ndarray:
    """Scale (x, y) pixel coords from original resolution to model resolution."""
    h, w = orig_hw
    out = np.asarray(coords, np.float32).copy()
    out[..., 0] *= image_size / w
    out[..., 1] *= image_size / h
    return out


def transform_boxes(
    boxes: np.ndarray, orig_hw: tuple[int, int], image_size: int
) -> np.ndarray:
    """[..., 4] XYXY boxes -> [..., 2, 2] corner points at model resolution."""
    pts = np.asarray(boxes, np.float32).reshape(*boxes.shape[:-1], 2, 2)
    return transform_coords(pts, orig_hw, image_size)


def postprocess_masks(
    mask_logits: jnp.ndarray,
    orig_hw: tuple[int, int],
    max_hole_area: float = 0.0,
    max_sprinkle_area: float = 0.0,
) -> jnp.ndarray:
    """Hole fill + sprinkle removal on low-res logits, then resize to orig_hw.

    mask_logits: [..., h, w] float logits. (reference SAM2Transforms.postprocess_masks)
    """
    x = mask_logits
    if max_hole_area > 0:
        x = fill_holes_in_mask_scores(x, int(max_hole_area))
    if max_sprinkle_area > 0:
        x = remove_small_sprinkles(x, int(max_sprinkle_area))
    lead = x.shape[:-2]
    xh = x.reshape(-1, x.shape[-2], x.shape[-1])[..., None]
    xh = resize2d(xh.astype(jnp.float32), orig_hw, mode="linear")[..., 0]
    return xh.reshape(*lead, *orig_hw)
