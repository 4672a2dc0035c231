"""FPN neck + image-encoder wrapper (reference backbones/image_encoder.py:16-200).

NHWC throughout. Position encodings are trace-time constants ([H, W, C] sine
grids) — they never touch HBM as separate tensors after XLA constant-folding.
"""

from __future__ import annotations

from typing import List, Optional

import flax.linen as nn
import jax.numpy as jnp

from us_video_medsam2_tpu.core.config import FpnNeckConfig
from us_video_medsam2_tpu.models.layers import LayerNorm
from us_video_medsam2_tpu.ops.posenc import sine_pos_embed_2d
from us_video_medsam2_tpu.ops.resize import resize2d, upsample_nearest_2x


class FpnNeck(nn.Module):
    """Modified FPN: 1x1 laterals, top-down sum on selected levels only."""

    cfg: FpnNeckConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray]):
        cfg = self.cfg
        n = len(cfg.backbone_channel_list) - 1
        assert len(xs) == len(cfg.backbone_channel_list)
        out: list = [None] * len(xs)
        pos: list = [None] * len(xs)
        prev = None
        # top-down order: low resolution (i = n) to high (i = 0);
        # conv j handles channel backbone_channel_list[j] (reference image_encoder.py:114-116)
        for i in range(n, -1, -1):
            lateral = nn.Conv(
                cfg.d_model,
                (1, 1),
                dtype=self.dtype,
                name=f"convs_{n - i}",
            )(xs[i])
            if i in cfg.fpn_top_down_levels and prev is not None:
                if cfg.fpn_interp_model == "nearest":
                    top_down = upsample_nearest_2x(prev.astype(jnp.float32))
                else:
                    th, tw = prev.shape[1] * 2, prev.shape[2] * 2
                    top_down = resize2d(
                        prev.astype(jnp.float32), (th, tw), mode="linear"
                    )
                prev = lateral + top_down.astype(lateral.dtype)
                if cfg.fuse_type == "avg":
                    prev = prev / 2
            else:
                prev = lateral
            out[i] = prev
            pos[i] = sine_pos_embed_2d(
                prev.shape[1], prev.shape[2], cfg.d_model, cfg.pos_temperature
            ).astype(prev.dtype)
        return out, pos


class ViTDetNeck(nn.Module):
    """Single-level neck for plain-ViT trunks (reference image_encoder.py:139-200).

    With `neck_norm` set (the EfficientMedSAM configs use 'LN',
    efficientmedsam_s_512_FLARE_RECIST.yaml:96-105), convs are bias-free and
    each is followed by LayerNorm2d.
    """

    cfg: FpnNeckConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs: List[jnp.ndarray]):
        cfg = self.cfg
        use_norm = cfg.neck_norm is not None
        x = xs[0]
        x = nn.Conv(
            cfg.d_model, (1, 1), use_bias=not use_norm, dtype=self.dtype,
            name="convs_0_conv_1x1",
        )(x)
        if use_norm:
            x = LayerNorm(eps=1e-6, dtype=self.dtype, name="convs_0_norm_0")(x)
        x = nn.Conv(
            cfg.d_model,
            (3, 3),
            padding=((1, 1), (1, 1)),
            use_bias=not use_norm,
            dtype=self.dtype,
            name="convs_0_conv_3x3",
        )(x)
        if use_norm:
            x = LayerNorm(eps=1e-6, dtype=self.dtype, name="convs_0_norm_1")(x)
        pos = sine_pos_embed_2d(
            x.shape[1], x.shape[2], cfg.d_model, cfg.pos_temperature
        ).astype(x.dtype)
        return [x], [pos]


class ImageEncoder(nn.Module):
    """trunk -> neck -> (features, positions); scalp drops lowest-res levels."""

    trunk: nn.Module
    neck: nn.Module
    scalp: int = 0

    def __call__(self, sample, deterministic: bool = True):
        features, pos = self.neck(self.trunk(sample, deterministic))
        if self.scalp > 0:
            features, pos = features[: -self.scalp], pos[: -self.scalp]
        return {
            "vision_features": features[-1],
            "vision_pos_enc": pos,
            "backbone_fpn": features,
        }
