"""SAM mask decoder (reference sam2/modeling/sam/mask_decoder.py:15-295).

NHWC; the two transposed convs of the upscaler are Dense+depth-to-space (MXU
matmuls). `multimask_output` is a static flag per call site. The dynamic
stability fallback (reference mask_decoder.py:259-295) is a pure function on the
returned multimask logits, applied by the predictor at inference.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from us_video_medsam2_tpu.models.layers import MLP, ConvTranspose2x, LayerNorm, gelu_exact
from us_video_medsam2_tpu.models.transformer import TwoWayTransformer


class MaskDecoder(nn.Module):
    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    use_high_res_features: bool = False
    iou_prediction_use_sigmoid: bool = False
    pred_obj_scores: bool = False
    pred_obj_scores_mlp: bool = False
    use_multimask_token_for_obj_ptr: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        d = self.transformer_dim
        self.num_mask_tokens = self.num_multimask_outputs + 1
        self.transformer = TwoWayTransformer(
            depth=2, embedding_dim=d, num_heads=8, mlp_dim=2048, dtype=self.dtype,
            name="transformer",
        )
        self.iou_token = self.param(
            "iou_token", nn.initializers.normal(stddev=1.0), (1, d)
        )
        self.mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(stddev=1.0), (self.num_mask_tokens, d)
        )
        if self.pred_obj_scores:
            self.obj_score_token = self.param(
                "obj_score_token", nn.initializers.normal(stddev=1.0), (1, d)
            )
        self.upscale_dc1 = ConvTranspose2x(d // 4, dtype=self.dtype, name="upscale_dc1")
        self.upscale_ln = LayerNorm(eps=1e-6, dtype=self.dtype, name="upscale_ln")
        self.upscale_dc2 = ConvTranspose2x(d // 8, dtype=self.dtype, name="upscale_dc2")
        self.hyper_mlps = [
            MLP(d, d // 8, 3, dtype=self.dtype, name=f"hyper_mlps_{i}")
            for i in range(self.num_mask_tokens)
        ]
        self.iou_head = MLP(
            self.iou_head_hidden_dim,
            self.num_mask_tokens,
            self.iou_head_depth,
            sigmoid_output=self.iou_prediction_use_sigmoid,
            dtype=self.dtype,
            name="iou_head",
        )
        if self.pred_obj_scores:
            if self.pred_obj_scores_mlp:
                self.obj_score_head = MLP(d, 1, 3, dtype=self.dtype, name="obj_score_head")
            else:
                self.obj_score_head = nn.Dense(1, dtype=self.dtype, name="obj_score_head")

    def __call__(
        self,
        image_embeddings: jnp.ndarray,  # [B, H, W, C]
        image_pe: jnp.ndarray,  # [H, W, C]
        sparse_prompt_embeddings: jnp.ndarray,  # [B, N, C]
        dense_prompt_embeddings: jnp.ndarray,  # [B, H, W, C]
        multimask_output: bool,
        high_res_features: Optional[List[jnp.ndarray]] = None,  # NHWC, [s0, s1]
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Returns (masks, iou_pred, sam_tokens_out, object_score_logits).

        masks: [B, M, 4H, 4W] logits with M = 3 (multimask) or 1.
        """
        masks, iou_pred, mask_tokens_out, object_score_logits = self.predict_masks(
            image_embeddings,
            image_pe,
            sparse_prompt_embeddings,
            dense_prompt_embeddings,
            high_res_features,
        )
        if multimask_output:
            out_masks = masks[:, 1:]
            out_ious = iou_pred[:, 1:]
        else:
            out_masks = masks[:, 0:1]
            out_ious = iou_pred[:, 0:1]
        if multimask_output and self.use_multimask_token_for_obj_ptr:
            sam_tokens_out = mask_tokens_out[:, 1:]
        else:
            sam_tokens_out = mask_tokens_out[:, 0:1]
        return out_masks, out_ious, sam_tokens_out, object_score_logits, masks, iou_pred

    def predict_masks(
        self,
        image_embeddings,
        image_pe,
        sparse_prompt_embeddings,
        dense_prompt_embeddings,
        high_res_features=None,
    ):
        b, h, w, c = image_embeddings.shape
        tok = [self.iou_token, self.mask_tokens]
        s = 0
        if self.pred_obj_scores:
            tok = [self.obj_score_token] + tok
            s = 1
        output_tokens = jnp.concatenate(tok, axis=0).astype(self.dtype)
        output_tokens = jnp.broadcast_to(
            output_tokens[None], (b, *output_tokens.shape)
        )
        tokens = jnp.concatenate([output_tokens, sparse_prompt_embeddings], axis=1)

        src = image_embeddings + dense_prompt_embeddings
        src_seq = src.reshape(b, h * w, c)
        pe_seq = jnp.broadcast_to(image_pe.reshape(1, h * w, c), (b, h * w, c)).astype(
            self.dtype
        )

        hs, src_seq = self.transformer(src_seq, pe_seq, tokens)
        iou_token_out = hs[:, s]
        mask_tokens_out = hs[:, s + 1 : s + 1 + self.num_mask_tokens]

        src = src_seq.reshape(b, h, w, c)
        up = self.upscale_dc1(src)
        if self.use_high_res_features:
            feat_s0, feat_s1 = high_res_features
            up = up + feat_s1
        up = gelu_exact(self.upscale_ln(up))
        up = self.upscale_dc2(up)
        if self.use_high_res_features:
            up = up + feat_s0
        up = gelu_exact(up)  # [B, 4H, 4W, C//8]

        hyper_in = jnp.stack(
            [self.hyper_mlps[i](mask_tokens_out[:, i]) for i in range(self.num_mask_tokens)],
            axis=1,
        )  # [B, M, C//8]
        uh, uw = up.shape[1:3]
        masks = jnp.einsum(
            "bmc,bhwc->bmhw", hyper_in, up, preferred_element_type=jnp.float32
        ).astype(self.dtype)

        iou_pred = self.iou_head(iou_token_out)
        if self.pred_obj_scores:
            object_score_logits = self.obj_score_head(hs[:, 0])
        else:
            object_score_logits = 10.0 * jnp.ones((b, 1), self.dtype)
        return masks, iou_pred, mask_tokens_out, object_score_logits


def get_stability_scores(mask_logits: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IoU between +delta / -delta thresholdings (reference mask_decoder.py:247-257)."""
    flat = mask_logits.reshape(*mask_logits.shape[:-2], -1)
    area_i = jnp.sum(flat > delta, axis=-1).astype(jnp.float32)
    area_u = jnp.sum(flat > -delta, axis=-1).astype(jnp.float32)
    return jnp.where(area_u > 0, area_i / area_u, 1.0)


def dynamic_multimask_via_stability(
    all_mask_logits: jnp.ndarray,  # [B, 4, H, W]
    all_iou_scores: jnp.ndarray,  # [B, 4]
    stability_delta: float = 0.05,
    stability_thresh: float = 0.98,
):
    """Fall back from the single-mask token to the best multimask when unstable.

    (reference mask_decoder.py:259-295; injected for inference by build_sam.py:113-117)
    """
    multimask_logits = all_mask_logits[:, 1:]
    multimask_iou = all_iou_scores[:, 1:]
    best = jnp.argmax(multimask_iou, axis=-1)
    best_logits = jnp.take_along_axis(
        multimask_logits, best[:, None, None, None], axis=1
    )
    best_iou = jnp.take_along_axis(multimask_iou, best[:, None], axis=1)

    single_logits = all_mask_logits[:, 0:1]
    single_iou = all_iou_scores[:, 0:1]
    stability = get_stability_scores(single_logits, stability_delta)
    is_stable = stability >= stability_thresh

    out_logits = jnp.where(is_stable[..., None, None], single_logits, best_logits)
    out_iou = jnp.where(is_stable, single_iou, best_iou)
    return out_logits, out_iou
