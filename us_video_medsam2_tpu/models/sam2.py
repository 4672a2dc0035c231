"""SAM2 core model: promptable video segmentation with a streaming memory bank.

TPU-native recast of reference sam2/modeling/sam2_base.py:764-1682. The tracking
runtime is a set of pure methods over explicit state:

- `forward_image`       — trunk + FPN (+ decoder high-res projections), batched over frames
- `track_step`          — one frame: memory-conditioned features -> SAM heads ->
                          memory encode -> bank write. All branches static, so the
                          video propagation loop is a single `lax.scan` body.
- `use_mask_as_output`  — mask-prompted frames bypass the SAM heads
                          (reference sam2_base.py:1168-1218)

Conventions: NHWC features, [B, N, C] token sequences, f32 params with a
configurable compute dtype, NO_OBJ_SCORE = -1024 (reference sam2_base.py:19).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from us_video_medsam2_tpu.core.config import SAM2Config
from us_video_medsam2_tpu.models.hiera import Hiera
from us_video_medsam2_tpu.models.layers import MLP, Conv2d
from us_video_medsam2_tpu.models.mask_decoder import (
    MaskDecoder,
    dynamic_multimask_via_stability,
)
from us_video_medsam2_tpu.models.memory import MemoryAttention, MemoryEncoder
from us_video_medsam2_tpu.models.memory_bank import (
    MemoryBank,
    gather_memories,
    select_memories,
    write_memory,
)
from us_video_medsam2_tpu.models.neck import FpnNeck, ImageEncoder, ViTDetNeck
from us_video_medsam2_tpu.models.prompt_encoder import PromptEncoder
from us_video_medsam2_tpu.models.temporal_fusion import build_temporal_fusion
from us_video_medsam2_tpu.ops.posenc import sine_pe_1d, sine_pos_embed_2d
from us_video_medsam2_tpu.ops.resize import resize2d

NO_OBJ_SCORE = -1024.0


class SAM2Model(nn.Module):
    cfg: SAM2Config
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        if c.hiera is not None:
            trunk = Hiera(c.hiera, dtype=self.dtype)
            neck = FpnNeck(c.neck, dtype=self.dtype)
        else:
            from us_video_medsam2_tpu.models.vitdet import ViTDet

            trunk = ViTDet(c.vitdet, dtype=self.dtype)
            neck = ViTDetNeck(c.neck, dtype=self.dtype)
        self.image_encoder = ImageEncoder(trunk=trunk, neck=neck, scalp=c.neck_scalp)
        self.memory_attention = MemoryAttention(c.memory_attention, dtype=self.dtype)
        self.memory_encoder = MemoryEncoder(c.memory_encoder, dtype=self.dtype)
        self.sam_prompt_encoder = PromptEncoder(
            embed_dim=c.hidden_dim,
            image_embedding_size=c.feat_size,
            input_image_size=c.image_size,
            mask_in_chans=16,
            dtype=self.dtype,
        )
        self.sam_mask_decoder = MaskDecoder(
            transformer_dim=c.hidden_dim,
            use_high_res_features=c.use_high_res_features_in_sam,
            iou_prediction_use_sigmoid=c.iou_prediction_use_sigmoid,
            pred_obj_scores=c.pred_obj_scores,
            pred_obj_scores_mlp=c.pred_obj_scores_mlp,
            use_multimask_token_for_obj_ptr=c.use_multimask_token_for_obj_ptr,
            dtype=self.dtype,
        )
        if c.use_high_res_features_in_sam:
            self.conv_s0 = Conv2d(c.hidden_dim // 8, 1, dtype=self.dtype)
            self.conv_s1 = Conv2d(c.hidden_dim // 4, 1, dtype=self.dtype)
        if c.use_obj_ptrs_in_encoder:
            self.mask_downsample = Conv2d(1, 4, stride=4, dtype=self.dtype)
            if c.use_mlp_for_obj_ptr_proj:
                self.obj_ptr_proj = MLP(
                    c.hidden_dim, c.hidden_dim, 3, dtype=self.dtype
                )
            else:
                self.obj_ptr_proj = nn.Dense(c.hidden_dim, dtype=self.dtype)
        if c.proj_tpos_enc_in_obj_ptrs:
            self.obj_ptr_tpos_proj = nn.Dense(c.mem_dim, dtype=self.dtype)

        tn = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)
        self.maskmem_tpos_enc = self.param(
            "maskmem_tpos_enc", tn, (c.num_maskmem, c.mem_dim)
        )
        self.no_mem_embed = self.param("no_mem_embed", tn, (c.hidden_dim,))
        self.no_mem_pos_enc = self.param("no_mem_pos_enc", tn, (c.hidden_dim,))
        if c.pred_obj_scores and c.use_obj_ptrs_in_encoder:
            self.no_obj_ptr = self.param("no_obj_ptr", tn, (c.hidden_dim,))
        if c.no_obj_embed_spatial:
            self.no_obj_embed_spatial_p = self.param(
                "no_obj_embed_spatial", tn, (c.mem_dim,)
            )
        self.temporal_fusion = build_temporal_fusion(c.temporal_fusion, self.dtype)

    def __call__(self, images: jnp.ndarray):
        """Initialization-only pass that exercises every parameterized path.

        (flax creates params lazily; `model.init(rng, images)` with a tiny batch
        touches the encoder, both track_step branches, and the mask-prompt path
        so the full parameter tree exists.)
        """
        from us_video_medsam2_tpu.models.memory_bank import init_memory_bank

        c = self.cfg
        out = self.forward_image(images, num_frames=images.shape[0])
        fpn = out["backbone_fpn"]
        if self.temporal_fusion is not None and images.shape[0] < 2:
            # single-image init never reaches the num_frames>1 fusion path;
            # touch the fusion params on a tiny dummy so they exist in the tree
            dummy = jnp.zeros((2, 2, 2, c.temporal_fusion.channels), self.dtype)
            for tf in self.temporal_fusion:
                tf(dummy, 2, True)
        feats = {"top": fpn[-1]}
        if c.use_high_res_features_in_sam:
            feats["s0"], feats["s1"] = fpn[0], fpn[1]
        b = images.shape[0]
        th, tw = feats["top"].shape[1:3]
        bank = init_memory_bank(b, 2, th * tw, c.mem_dim, c.hidden_dim, self.dtype)
        pc = jnp.zeros((b, 1, 2), jnp.float32)
        pl = jnp.ones((b, 1), jnp.int32)
        o, bank = self.track_step(
            jnp.asarray(0),
            feats,
            bank,
            2,
            pc,
            pl,
            is_init_cond_frame=True,
            is_cond_frame=True,
            multimask_output=True,
        )
        o, bank = self.track_step(jnp.asarray(1), feats, bank, 2)
        if c.use_mask_input_as_output_without_sam:
            dummy_mask = jnp.zeros((b, c.image_size, c.image_size, 1), jnp.float32)
            hr = [feats["s0"], feats["s1"]] if c.use_high_res_features_in_sam else None
            self.use_mask_as_output(feats["top"], hr, dummy_mask)
        return o

    # ------------------------------------------------------------------ images
    def prepare_images(self, images: jnp.ndarray) -> jnp.ndarray:
        """Pre-fold frames into the trunk's preferred input layout.

        For the Hiera trunk this is a one-time space-to-depth by the patch
        stride (ops/window.space_to_depth) so the patch-embed relayout is not
        paid once per frame inside the tracking scan; identity otherwise.
        forward_image accepts both raw and folded inputs.
        """
        c = self.cfg
        hc = c.hiera
        if (
            hc is not None
            and images.shape[-1] == 3
            and hc.patch_kernel <= 2 * hc.patch_stride
            and hc.patch_padding == hc.patch_kernel // 2
            and images.shape[-2] % hc.patch_stride == 0
            and images.shape[-3] % hc.patch_stride == 0
        ):
            from us_video_medsam2_tpu.ops.window import space_to_depth

            return space_to_depth(images, hc.patch_stride)
        vc = c.vitdet
        if (
            hc is None
            and vc is not None
            and images.shape[-1] == 3
            and images.shape[-2] % vc.patch_size == 0
            and images.shape[-3] % vc.patch_size == 0
        ):
            # non-overlapping patch-16 embed: the fold IS the conv's input
            # relayout (models/vitdet.py::_PatchEmbed16)
            from us_video_medsam2_tpu.ops.window import space_to_depth

            return space_to_depth(images, vc.patch_size)
        return images

    def forward_image(
        self,
        images: jnp.ndarray,
        deterministic: bool = True,
        num_frames: int = 1,
    ) -> Dict:
        """images [B(*T), H, W, 3] -> feature dict (reference sam2_base.py:1220-1232).

        When temporal fusion is configured and num_frames > 1, the FPN maps are
        mixed across the frame axis (reference sam2_base.py:1249-1262).
        """
        out = self.image_encoder(images.astype(self.dtype), deterministic)
        fpn = list(out["backbone_fpn"])
        if self.temporal_fusion is not None and num_frames > 1:
            # fuse the top len(temporal_fusion) levels in place, keeping any
            # lower levels untouched (reference applies one module per used
            # feature level, sam2_base.py:1249-1262)
            n = len(self.temporal_fusion)
            fused = [
                tf(f, num_frames, deterministic)
                for tf, f in zip(self.temporal_fusion, fpn[-n:])
            ]
            fpn = fpn[:-n] + fused
        if self.cfg.use_high_res_features_in_sam:
            fpn[0] = self.conv_s0(fpn[0])
            fpn[1] = self.conv_s1(fpn[1])
        out["backbone_fpn"] = fpn
        return out

    # ------------------------------------------------------- memory attention
    def condition_on_memory(
        self,
        frame_idx: jnp.ndarray,
        curr_feat: jnp.ndarray,  # [B, H, W, C] top-level feature
        bank: MemoryBank,
        num_frames: int,
        track_in_reverse: bool = False,
        is_training: bool = False,
        deterministic: bool = True,
        max_cond_slots: Optional[int] = None,
    ) -> jnp.ndarray:
        """Cross-attend the current frame to the memory bank (sam2_base.py:1271-1448)."""
        c = self.cfg
        b, h, w, ch = curr_feat.shape
        hw = h * w
        sel = select_memories(
            bank, frame_idx, c, num_frames, track_in_reverse, is_training,
            max_cond_slots=max_cond_slots,
        )
        mem, ptrs = gather_memories(bank, sel)  # [B,M,HWm,md], [B,P,C]
        B, M, HWm, md = mem.shape

        mem_tokens = mem.reshape(B, M * HWm, md).astype(self.dtype)
        mem_h = mem_w = int(round(HWm ** 0.5))
        spatial_pe = sine_pos_embed_2d(
            mem_h, mem_w, md, self.cfg.memory_encoder.pos_temperature
        ).reshape(HWm, md)
        tpos = self.maskmem_tpos_enc[sel.mem_tpos]  # [M, md]
        mem_pos = (spatial_pe[None, :, :] + tpos[:, None, :]).astype(self.dtype)
        mem_pos = jnp.broadcast_to(mem_pos[None], (B, M, HWm, md)).reshape(
            B, M * HWm, md
        )
        mem_mask = jnp.repeat(sel.mem_valid, HWm, axis=1)

        num_obj_ptr_tokens = 0
        if c.use_obj_ptrs_in_encoder:
            P = ptrs.shape[1]
            tok = c.tokens_per_obj_ptr
            if c.add_tpos_enc_to_obj_ptrs:
                tpos_dim = c.hidden_dim if c.proj_tpos_enc_in_obj_ptrs else md
                ptr_pos = sine_pe_1d(sel.ptr_pos / sel.t_diff_max, tpos_dim)
                if c.proj_tpos_enc_in_obj_ptrs:
                    ptr_pos = self.obj_ptr_tpos_proj(ptr_pos.astype(self.dtype))
                ptr_pos = ptr_pos.astype(self.dtype)  # [B, P, md]
            else:
                ptr_pos = jnp.zeros((B, P, md), self.dtype)
            ptr_tokens = ptrs.reshape(B, P, tok, md).reshape(B, P * tok, md)
            ptr_pos = jnp.repeat(ptr_pos, tok, axis=1)
            ptr_mask = jnp.repeat(sel.ptr_valid, tok, axis=1)
            num_obj_ptr_tokens = P * tok
            memory = jnp.concatenate([mem_tokens, ptr_tokens.astype(self.dtype)], 1)
            memory_pos = jnp.concatenate([mem_pos, ptr_pos], 1)
            key_mask = jnp.concatenate([mem_mask, ptr_mask], 1)
        else:
            memory, memory_pos, key_mask = mem_tokens, mem_pos, mem_mask

        curr_pos = sine_pos_embed_2d(h, w, ch, c.neck.pos_temperature).reshape(hw, ch)
        curr_pos = jnp.broadcast_to(curr_pos[None], (b, hw, ch)).astype(self.dtype)
        out = self.memory_attention(
            curr_feat.reshape(b, hw, ch),
            memory,
            curr_pos,
            memory_pos,
            num_obj_ptr_tokens=num_obj_ptr_tokens,
            key_mask=key_mask,
            deterministic=deterministic,
        )
        return out.reshape(b, h, w, ch)

    def no_mem_features(self, curr_feat: jnp.ndarray) -> jnp.ndarray:
        """Initial conditioning frames skip memory attention (sam2_base.py:1423-1429)."""
        assert self.cfg.directly_add_no_mem_embed
        return curr_feat + self.no_mem_embed.astype(curr_feat.dtype)

    # -------------------------------------------------------------- SAM heads
    def sam_heads(
        self,
        backbone_features: jnp.ndarray,  # [B, H, W, C]
        point_coords: Optional[jnp.ndarray] = None,  # [B, P, 2]
        point_labels: Optional[jnp.ndarray] = None,  # [B, P]
        mask_inputs: Optional[jnp.ndarray] = None,  # [B, 512, 512, 1] or [B,128,128,1]
        high_res_features: Optional[List[jnp.ndarray]] = None,
        multimask_output: bool = False,
        is_training: bool = False,
    ) -> Dict:
        """Prompt encoder + mask decoder (reference sam2_base.py:1010-1166)."""
        c = self.cfg
        b = backbone_features.shape[0]
        if point_coords is None:
            point_coords = jnp.zeros((b, 1, 2), jnp.float32)
            point_labels = -jnp.ones((b, 1), jnp.int32)
        sam_mask_prompt = None
        if mask_inputs is not None:
            target = 4 * c.feat_size
            if mask_inputs.shape[1] != target:
                sam_mask_prompt = resize2d(
                    mask_inputs.astype(jnp.float32),
                    (target, target),
                    mode="linear",
                    antialias=True,
                )
            else:
                sam_mask_prompt = mask_inputs
        sparse, dense = self.sam_prompt_encoder(
            point_coords, point_labels, sam_mask_prompt
        )
        (
            out_masks,
            out_ious,
            sam_tokens_out,
            object_score_logits,
            all_masks,
            all_ious,
        ) = self.sam_mask_decoder(
            backbone_features,
            self.sam_prompt_encoder.dense_pe(),
            sparse,
            dense,
            multimask_output=multimask_output,
            high_res_features=high_res_features,
        )
        if (
            not multimask_output
            and not is_training
            and c.dynamic_multimask_via_stability
        ):
            out_masks, out_ious = dynamic_multimask_via_stability(
                all_masks,
                all_ious,
                c.dynamic_multimask_stability_delta,
                c.dynamic_multimask_stability_thresh,
            )

        if c.pred_obj_scores:
            is_obj_appearing = object_score_logits > 0  # [B, 1]
            out_masks = jnp.where(
                is_obj_appearing[..., None, None], out_masks, NO_OBJ_SCORE
            )
        low_res_multimasks = out_masks.astype(jnp.float32)

        def upsample(masks):  # [B,M,h,w] logits -> image resolution
            hi = resize2d(
                masks.transpose(0, 2, 3, 1), (c.image_size, c.image_size), mode="linear"
            )
            return hi.transpose(0, 3, 1, 2)

        sam_output_token = sam_tokens_out[:, 0]
        if multimask_output:
            best = jnp.argmax(out_ious, axis=-1)  # [B]
            low_res_masks = jnp.take_along_axis(
                low_res_multimasks, best[:, None, None, None], axis=1
            )
            if sam_tokens_out.shape[1] > 1:
                sam_output_token = jnp.take_along_axis(
                    sam_tokens_out, best[:, None, None], axis=1
                )[:, 0]
            if is_training:
                # training loss needs every channel at image resolution
                high_res_multimasks = upsample(low_res_multimasks)
                high_res_masks = jnp.take_along_axis(
                    high_res_multimasks, best[:, None, None, None], axis=1
                )
            else:
                # eval: select at low resolution (selection is resolution-
                # independent: bilinear upsampling commutes with the per-batch
                # channel gather), upsample only the chosen mask
                high_res_masks = upsample(low_res_masks)
                high_res_multimasks = high_res_masks
        else:
            high_res_multimasks = upsample(low_res_multimasks)
            low_res_masks, high_res_masks = low_res_multimasks, high_res_multimasks

        obj_ptr = self.obj_ptr_proj(sam_output_token)
        if c.pred_obj_scores:
            if c.soft_no_obj_ptr:
                lam = jax.nn.sigmoid(object_score_logits)
            else:
                lam = is_obj_appearing.astype(obj_ptr.dtype)
            if c.fixed_no_obj_ptr:
                obj_ptr = lam * obj_ptr
            obj_ptr = obj_ptr + (1.0 - lam) * self.no_obj_ptr.astype(obj_ptr.dtype)

        return {
            "low_res_multimasks": low_res_multimasks,
            "high_res_multimasks": high_res_multimasks,
            "ious": out_ious,
            "low_res_masks": low_res_masks,
            "high_res_masks": high_res_masks,
            "obj_ptr": obj_ptr,
            "object_score_logits": object_score_logits,
        }

    def use_mask_as_output(
        self,
        backbone_features: jnp.ndarray,
        high_res_features: Optional[List[jnp.ndarray]],
        mask_inputs: jnp.ndarray,  # [B, image, image, 1] float/bool
    ) -> Dict:
        """Directly adopt a mask prompt as the output (reference sam2_base.py:1168-1218)."""
        c = self.cfg
        out_scale, out_bias = 20.0, -10.0
        mask_f = mask_inputs.astype(jnp.float32)
        high_res_masks = (mask_f * out_scale + out_bias).transpose(0, 3, 1, 2)
        low = resize2d(
            mask_f * out_scale + out_bias,
            (mask_inputs.shape[1] // 4, mask_inputs.shape[2] // 4),
            mode="linear",
            antialias=True,
        )
        low_res_masks = low.transpose(0, 3, 1, 2)
        b = mask_inputs.shape[0]
        ious = jnp.ones((b, 1), jnp.float32)
        if not c.use_obj_ptrs_in_encoder:
            obj_ptr = jnp.zeros((b, c.hidden_dim), self.dtype)
        else:
            heads = self.sam_heads(
                backbone_features,
                mask_inputs=self.mask_downsample(mask_f),
                high_res_features=high_res_features,
            )
            obj_ptr = heads["obj_ptr"]
        is_obj_appearing = jnp.any(mask_f.reshape(b, -1) > 0.0, axis=1)[:, None]
        lam = is_obj_appearing.astype(jnp.float32)
        object_score_logits = out_scale * lam + out_bias
        if c.pred_obj_scores:
            if c.fixed_no_obj_ptr:
                obj_ptr = lam * obj_ptr
            obj_ptr = obj_ptr + (1.0 - lam) * self.no_obj_ptr.astype(obj_ptr.dtype)
        return {
            "low_res_multimasks": low_res_masks,
            "high_res_multimasks": high_res_masks,
            "ious": ious,
            "low_res_masks": low_res_masks,
            "high_res_masks": high_res_masks,
            "obj_ptr": obj_ptr,
            "object_score_logits": object_score_logits,
        }

    # ---------------------------------------------------------- memory encode
    def encode_memory(
        self,
        curr_feat: jnp.ndarray,  # [B, H, W, C] raw (unconditioned) top-level feature
        high_res_masks: jnp.ndarray,  # [B, 1, image, image] logits
        object_score_logits: jnp.ndarray,  # [B, 1]
        is_mask_from_pts: bool = False,
        is_training: bool = False,
    ) -> jnp.ndarray:
        """Predicted mask + pixels -> new memory feature (sam2_base.py:1450-1498)."""
        c = self.cfg
        masks = high_res_masks.transpose(0, 2, 3, 1)  # NHWC
        if c.non_overlap_masks_for_mem_enc and not is_training:
            masks = apply_non_overlapping_constraints(
                masks.transpose(0, 3, 1, 2)
            ).transpose(0, 2, 3, 1)
        # is_mask_from_pts may be a static bool or a traced bool (training-time
        # prompt simulation decides the prompt mode on device)
        if isinstance(is_mask_from_pts, bool):
            binarize = (
                c.binarize_mask_from_pts_for_mem_enc
                and is_mask_from_pts
                and not is_training
            )
            if binarize:
                mask_for_mem = (masks > 0).astype(jnp.float32)
            else:
                mask_for_mem = jax.nn.sigmoid(masks.astype(jnp.float32))
        else:
            soft = jax.nn.sigmoid(masks.astype(jnp.float32))
            if c.binarize_mask_from_pts_for_mem_enc and not is_training:
                mask_for_mem = jnp.where(
                    is_mask_from_pts, (masks > 0).astype(jnp.float32), soft
                )
            else:
                mask_for_mem = soft
        mask_for_mem = (
            mask_for_mem * c.sigmoid_scale_for_mem_enc + c.sigmoid_bias_for_mem_enc
        )
        maskmem, _ = self.memory_encoder(curr_feat, mask_for_mem.astype(self.dtype))
        if c.no_obj_embed_spatial:
            is_obj = (object_score_logits > 0).astype(maskmem.dtype)  # [B,1]
            maskmem = maskmem + (1.0 - is_obj[:, :, None, None]) * (
                self.no_obj_embed_spatial_p.astype(maskmem.dtype)[None, None, None, :]
            )
        return maskmem

    # --------------------------------------------------------------- one step
    def track_step(
        self,
        frame_idx: jnp.ndarray,
        feats: Dict[str, jnp.ndarray],
        bank: MemoryBank,
        num_frames: int,
        point_coords: Optional[jnp.ndarray] = None,
        point_labels: Optional[jnp.ndarray] = None,
        mask_inputs: Optional[jnp.ndarray] = None,
        prev_sam_mask_logits: Optional[jnp.ndarray] = None,
        is_init_cond_frame: bool = False,
        is_cond_frame: bool = False,
        multimask_output: bool = False,
        track_in_reverse: bool = False,
        is_training: bool = False,
        run_mem_encoder: bool = True,
        write_bank: bool = True,
        deterministic: bool = True,
        max_cond_slots: Optional[int] = None,
    ):
        """One tracking step (reference sam2_base.py:1586-1651). All flags static.

        write_bank=False returns the encoded memory in out['maskmem'] instead of
        writing it — lets scan bodies keep the (large) bank out of lax.cond
        branches, avoiding whole-bank copies per frame.

        feats: {'top': [B,Hc,Wc,C] top-level FPN feature,
                's0','s1': decoder-projected high-res features (if configured)}
        Returns (out dict, updated bank).
        """
        c = self.cfg
        high_res_feats = (
            [feats["s0"], feats["s1"]] if c.use_high_res_features_in_sam else None
        )
        if mask_inputs is not None and c.use_mask_input_as_output_without_sam:
            out = self.use_mask_as_output(feats["top"], high_res_feats, mask_inputs)
        else:
            if is_init_cond_frame and c.directly_add_no_mem_embed:
                pix_feat = self.no_mem_features(feats["top"])
            else:
                pix_feat = self.condition_on_memory(
                    frame_idx,
                    feats["top"],
                    bank,
                    num_frames,
                    track_in_reverse,
                    is_training,
                    deterministic,
                    max_cond_slots=max_cond_slots,
                )
            mi = prev_sam_mask_logits if prev_sam_mask_logits is not None else (
                mask_inputs
            )
            out = self.sam_heads(
                pix_feat,
                point_coords,
                point_labels,
                mi,
                high_res_feats,
                multimask_output=multimask_output,
                is_training=is_training,
            )

        if run_mem_encoder and c.num_maskmem > 0:
            maskmem = self.encode_memory(
                feats["top"],
                out["high_res_masks"],
                out["object_score_logits"],
                is_mask_from_pts=point_coords is not None,
                is_training=is_training,
            )
            b, hm, wm, md = maskmem.shape
            out["maskmem"] = maskmem.reshape(b, hm * wm, md)
            if write_bank:
                bank = write_memory(
                    bank,
                    frame_idx,
                    out["maskmem"],
                    out["obj_ptr"],
                    is_cond_frame or is_init_cond_frame,
                )
        return out, bank


def apply_non_overlapping_constraints(pred_masks: jnp.ndarray) -> jnp.ndarray:
    """Keep only the argmax object per pixel (reference sam2_base.py:1663-1681).

    pred_masks: [O, 1, H, W] logits across objects of one video.
    """
    if pred_masks.shape[0] == 1:
        return pred_masks
    max_obj = jnp.argmax(pred_masks, axis=0, keepdims=True)
    obj_ids = jnp.arange(pred_masks.shape[0])[:, None, None, None]
    keep = max_obj == obj_ids
    return jnp.where(keep, pred_masks, jnp.clip(pred_masks, max=-10.0))
