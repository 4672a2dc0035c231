"""Single-image SAM predictor (reference sam2/sam2_image_predictor.py:20-468).

set_image precomputes embeddings once; predict() runs prompt encoder + decoder
only — the per-click path is a single small jitted call.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from us_video_medsam2_tpu.inference.transforms import (
    postprocess_masks,
    preprocess_images,
    transform_boxes,
    transform_coords,
)
from us_video_medsam2_tpu.models.sam2 import SAM2Model


class SAM2ImagePredictor:
    def __init__(
        self,
        model: SAM2Model,
        params,
        mask_threshold: float = 0.0,
        max_hole_area: float = 0.0,
        max_sprinkle_area: float = 0.0,
    ):
        self.model = model
        self.params = params
        self.cfg = model.cfg
        self.mask_threshold = mask_threshold
        self.max_hole_area = max_hole_area
        self.max_sprinkle_area = max_sprinkle_area
        self._features = None
        self._orig_hw: Optional[Tuple[int, int]] = None
        self._encode = jax.jit(self._encode_impl)
        self._predict = jax.jit(
            self._predict_impl, static_argnames=("multimask", "has_mask")
        )

    def _encode_impl(self, params, image):
        out = self.model.apply(params, image, method=self.model.forward_image)
        fpn = out["backbone_fpn"]
        # images are segmented SAM-style: no memory, so add the no-mem embedding
        # (reference sam2_image_predictor.py set_image / directly_add_no_mem_embed)
        no_mem = params["params"]["no_mem_embed"]
        feats = {"top": fpn[-1] + no_mem.astype(fpn[-1].dtype)}
        if self.cfg.use_high_res_features_in_sam:
            feats["s0"], feats["s1"] = fpn[0], fpn[1]
        return feats

    def _predict_impl(
        self, params, feats, coords, labels, mask_input, *, multimask, has_mask
    ):
        b_prompt = coords.shape[0]
        if feats["top"].shape[0] == 1 and b_prompt > 1:
            # repeat_image semantics: many prompts against one image
            # (reference mask_decoder.py:199-204)
            feats = {
                k: jnp.broadcast_to(v, (b_prompt, *v.shape[1:])) for k, v in feats.items()
            }
        high_res = (
            [feats["s0"], feats["s1"]]
            if self.cfg.use_high_res_features_in_sam
            else None
        )
        out = self.model.apply(
            params,
            feats["top"],
            coords,
            labels,
            mask_input if has_mask else None,
            high_res,
            multimask,
            method=self.model.sam_heads,
        )
        return out

    def set_image(self, image: np.ndarray):
        """image: [H, W, 3] uint8 (RGB) or float in [0, 1]."""
        self._orig_hw = (image.shape[0], image.shape[1])
        x = jnp.asarray(image)[None]
        x = preprocess_images(x, self.cfg.image_size)
        self._features = self._encode(self.params, x)

    def set_image_batch(self, images: List[np.ndarray]):
        assert all(i.shape == images[0].shape for i in images)
        self._orig_hw = (images[0].shape[0], images[0].shape[1])
        x = preprocess_images(jnp.asarray(np.stack(images)), self.cfg.image_size)
        self._features = self._encode(self.params, x)

    def predict_batch_points(
        self,
        point_coords: np.ndarray,  # [N, P, 2] at original resolution
        point_labels: np.ndarray,  # [N, P]
        multimask_output: bool = True,
    ):
        """Batched point prompts against the current image (AMG path).

        Returns (mask_logits [N, M, H, W] at original res, ious [N, M],
        low_res_logits [N, M, h, w]).
        """
        assert self._features is not None, "call set_image first"
        cfg = self.cfg
        coords = transform_coords(
            np.asarray(point_coords, np.float32), self._orig_hw, cfg.image_size
        )
        out = self._predict(
            self.params,
            self._features,
            jnp.asarray(coords),
            jnp.asarray(point_labels, jnp.int32),
            jnp.zeros((coords.shape[0], 4 * cfg.feat_size, 4 * cfg.feat_size, 1)),
            multimask=multimask_output,
            has_mask=False,
        )
        low = out["low_res_multimasks"]  # [N, M, h, w]
        masks = postprocess_masks(
            low, self._orig_hw, self.max_hole_area, self.max_sprinkle_area
        )
        return np.asarray(masks), np.asarray(out["ious"]), np.asarray(low)

    def predict(
        self,
        point_coords: Optional[np.ndarray] = None,
        point_labels: Optional[np.ndarray] = None,
        box: Optional[np.ndarray] = None,
        mask_input: Optional[np.ndarray] = None,
        multimask_output: bool = True,
        return_logits: bool = False,
        normalize_coords: bool = True,
    ):
        """Returns (masks [M, H, W], ious [M], low_res_logits [M, 256, 256])."""
        assert self._features is not None, "call set_image first"
        cfg = self.cfg
        pts, lbl = [], []
        if box is not None:
            b = np.asarray(box, np.float32).reshape(1, 4)
            bp = (
                transform_boxes(b, self._orig_hw, cfg.image_size)
                if normalize_coords
                else b.reshape(1, 2, 2)
            )
            pts.append(bp.reshape(1, 2, 2))
            lbl.append(np.array([[2, 3]], np.int32))
        if point_coords is not None:
            p = np.asarray(point_coords, np.float32).reshape(1, -1, 2)
            if normalize_coords:
                p = transform_coords(p, self._orig_hw, cfg.image_size)
            pts.append(p)
            lbl.append(np.asarray(point_labels, np.int32).reshape(1, -1))
        assert pts, "provide a prompt"
        coords = jnp.asarray(np.concatenate(pts, axis=1))
        labels = jnp.asarray(np.concatenate(lbl, axis=1))
        # broadcast one prompt across a batched set_image_batch
        b_feat = self._features["top"].shape[0]
        if b_feat > 1 and coords.shape[0] == 1:
            coords = jnp.tile(coords, (b_feat, 1, 1))
            labels = jnp.tile(labels, (b_feat, 1))

        has_mask = mask_input is not None
        if has_mask:
            mi = jnp.asarray(mask_input, jnp.float32).reshape(
                1, 4 * cfg.feat_size, 4 * cfg.feat_size, 1
            )
        else:
            mi = jnp.zeros((1, 4 * cfg.feat_size, 4 * cfg.feat_size, 1))
        if b_feat > 1 and mi.shape[0] == 1:
            mi = jnp.tile(mi, (b_feat, 1, 1, 1))

        out = self._predict(
            self.params,
            self._features,
            coords,
            labels,
            mi,
            multimask=multimask_output,
            has_mask=has_mask,
        )
        low = out["low_res_multimasks"][0]  # [M, h, w]
        masks = postprocess_masks(
            low, self._orig_hw, self.max_hole_area, self.max_sprinkle_area
        )
        if not return_logits:
            masks = masks > self.mask_threshold
        return (
            np.asarray(masks),
            np.asarray(out["ious"][0]),
            np.asarray(low),
        )
