"""Plain ViT (ViTDet) trunk — the EfficientTAM image encoder.

Capability parity with reference sam2/modeling/backbones/vitdet.py:24-299 /
efficient_track_anything/modeling/backbones (EfficientMedSAM-S config at
sam2/configs/efficientmedsam_s_512_FLARE_RECIST.yaml:79-105): patch-16 embed,
absolute pos embeddings interpolated from the pretrain grid (cls token dropped),
windowed blocks interleaved with global blocks, last-global-block output.

TPU execution (round 3): the blocks run on the same engine as the Hiera trunk —
MultiScaleAttention (models/hiera.py) with head-lane padding (hd 64 -> 128), the
fused windowed-attention Pallas kernel for the ws=14 blocks, [B, L, H, D]-layout
global attention, and the fused LN+MLP+residual Pallas kernel; the
non-overlapping patch-16 embed is one space-to-depth matmul (ops/conv_matmul.py
pure-fold form) whose fold the video predictor hoists out of the tracking scan
(SAM2Model.prepare_images). Param names/shapes are unchanged (attn/{qkv,proj},
patch_embed/{kernel,bias}) so checkpoints and the torch importer are unaffected.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from us_video_medsam2_tpu.core.config import ViTDetConfig
from us_video_medsam2_tpu.kernels.fused_mlp import (
    ln_mlp_residual,
    ln_mlp_residual_available,
    pick_block_n,
)
from us_video_medsam2_tpu.models.hiera import MultiScaleAttention
from us_video_medsam2_tpu.models.layers import MLP, LayerNorm, gelu_exact
from us_video_medsam2_tpu.ops.conv_matmul import s2d_conv
from us_video_medsam2_tpu.ops.resize import resize2d


class _PatchEmbed16(nn.Module):
    """Non-overlapping patch embed (kernel == stride, VALID) as one matmul.

    Space-to-depth folds [B, H, W, 3] -> [B, H/ps, W/ps, ps*ps*3]; the conv is
    then exactly `fold @ kernel.reshape(ps*ps*3, C)` (cell channel order
    (ri, rj, c) matches the kernel's (ki, kj, c) row-major order). Accepts
    already-folded input (SAM2Model.prepare_images folds the whole clip once so
    the per-frame tracking scan skips the relayout — the conv lowering plus its
    input copy cost 15.3 ms/64f in the round-3 EfficientTAM trace). Param
    names/shapes match nn.Conv ('kernel' [ps, ps, 3, C], 'bias' [C]).
    """

    features: int
    patch_size: int
    in_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ps = self.patch_size
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (ps, ps, self.in_channels, self.features),
            jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        folded_ch = ps * ps * self.in_channels
        prefolded = x.shape[-1] == folded_ch and x.shape[-1] != self.in_channels
        return s2d_conv(
            x, w, b, stride=ps, pad=0, dtype=self.dtype, prefolded=prefolded
        )


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        shortcut = x
        x = LayerNorm(eps=1e-6, dtype=self.dtype, pallas_ok=True, name="norm1")(x)
        # same attention engine as the Hiera trunk (q_pool off): window
        # partition/pad handled inside, fused Pallas kernel when available
        x = MultiScaleAttention(
            dim_out=self.dim,
            num_heads=self.num_heads,
            q_pool=False,
            dtype=self.dtype,
            name="attn",
        )(x, window_size=self.window_size)
        x = shortcut + x

        hidden = int(self.dim * self.mlp_ratio)
        norm2 = LayerNorm(eps=1e-6, dtype=self.dtype, name="norm2")
        mlp = MLP(
            hidden_dim=hidden,
            output_dim=self.dim,
            num_layers=2,
            activation=gelu_exact,
            dtype=self.dtype,
            name="mlp",
        )
        n_tok = x.shape[0] * x.shape[1] * x.shape[2]
        use_fused = not self.is_initializing() and ln_mlp_residual_available(
            n_tok, self.dim, hidden, self.dtype
        )
        if use_fused:
            # same params, same math, one Pallas pass (kernels/fused_mlp.py)
            p = self.variables["params"]
            out = ln_mlp_residual(
                x.reshape(n_tok, self.dim),
                p["norm2"]["scale"],
                p["norm2"]["bias"],
                p["mlp"]["layers_0"]["kernel"],
                p["mlp"]["layers_0"]["bias"],
                p["mlp"]["layers_1"]["kernel"],
                p["mlp"]["layers_1"]["bias"],
                1e-6,
                "gelu",
                *pick_block_n(n_tok, self.dim, hidden),
            )
            return out.reshape(x.shape)
        y = mlp(norm2(x))
        return x + y


class ViTDet(nn.Module):
    cfg: ViTDetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg
        ps = cfg.patch_size
        x = _PatchEmbed16(
            features=cfg.embed_dim,
            patch_size=ps,
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
