"""Plain ViT (ViTDet) trunk — the EfficientTAM image encoder.

Capability parity with reference sam2/modeling/backbones/vitdet.py:24-299 /
efficient_track_anything/modeling/backbones (EfficientMedSAM-S config at
sam2/configs/efficientmedsam_s_512_FLARE_RECIST.yaml:79-105): patch-16 embed,
absolute pos embeddings interpolated from the pretrain grid (cls token dropped),
windowed blocks interleaved with global blocks, last-global-block output.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from us_video_medsam2_tpu.core.config import ViTDetConfig
from us_video_medsam2_tpu.models.layers import MLP, LayerNorm, gelu_exact
from us_video_medsam2_tpu.ops.attention import sdpa_blhd
from us_video_medsam2_tpu.ops.resize import resize2d
from us_video_medsam2_tpu.ops.window import window_partition, window_unpartition


class ViTAttention(nn.Module):
    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, hd)
        # [B, L, H, D]-layout attention: head split folds into the matmul
        # layouts instead of materializing [B, H, L, D] transposes.
        out = sdpa_blhd(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
        out = out.reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        shortcut = x
        x = LayerNorm(eps=1e-6, dtype=self.dtype, name="norm1")(x)
        if self.window_size > 0:
            h, w = x.shape[1], x.shape[2]
            x, pad_hw = window_partition(x, self.window_size)
        x = ViTAttention(self.dim, self.num_heads, dtype=self.dtype, name="attn")(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, (h, w))
        x = shortcut + x
        y = LayerNorm(eps=1e-6, dtype=self.dtype, name="norm2")(x)
        y = MLP(
            int(self.dim * self.mlp_ratio),
            self.dim,
            2,
            activation=gelu_exact,
            dtype=self.dtype,
            name="mlp",
        )(y)
        return x + y


class ViTDet(nn.Module):
    cfg: ViTDetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg
        ps = cfg.patch_size
        x = nn.Conv(
            cfg.embed_dim,
            (ps, ps),
            strides=(ps, ps),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        h, w = x.shape[1:3]

        # absolute pos embed from the pretrain grid (reference backbones/utils.py:97-128)
        grid = cfg.pretrain_img_size // ps
        n_pos = grid * grid + (1 if cfg.pretrain_use_cls_token else 0)
        pos_embed = self.param(
            "pos_embed", nn.initializers.zeros, (1, n_pos, cfg.embed_dim)
        )
        pe = pos_embed[:, 1:] if cfg.pretrain_use_cls_token else pos_embed
        pe = pe.reshape(1, grid, grid, cfg.embed_dim)
        if (grid, grid) != (h, w):
            pe = resize2d(pe, (h, w), mode="cubic")
        x = x + pe.astype(x.dtype)

        last_global = max(
            i for i in range(cfg.depth) if i not in cfg.window_block_indexes
        )
        outputs = []
        for i in range(cfg.depth):
            ws = cfg.window_size if i in cfg.window_block_indexes else 0
            x = ViTBlock(
                cfg.embed_dim,
                cfg.num_heads,
                ws,
                cfg.mlp_ratio,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, deterministic)
            if i == last_global:
                outputs.append(x)
        return outputs
