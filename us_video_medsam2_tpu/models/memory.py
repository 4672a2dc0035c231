"""Memory attention (RoPE self/cross transformer) and memory encoder.

Parity targets: reference sam2/modeling/memory_attention.py:17-169 and
memory_encoder.py:17-181. Batch-first, NHWC, static shapes:

- The memory keys are a fixed-shape concatenation of spatial memory-slot tokens
  and object-pointer tokens; invalid slots are excluded with a boolean key mask
  instead of the reference's dynamic python-list concatenation.
- `num_obj_ptr_tokens` (keys excluded from RoPE, memory_attention.py:152-153) is a
  static layout constant here: spatial tokens first, pointer tokens last.
- Optional landmark pooling of the spatial memory K/V reproduces EfficientTAM's
  efficient cross-attention (efficient_track_anything/modeling/sam/transformer.py:378-415).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from us_video_medsam2_tpu.core.config import MemoryAttentionConfig, MemoryEncoderConfig
from us_video_medsam2_tpu.models.layers import ACTIVATIONS, Conv2d, LayerNorm, gelu_exact
from us_video_medsam2_tpu.models.transformer import RoPEAttention
from us_video_medsam2_tpu.ops.posenc import compute_axial_rope, sine_pos_embed_2d


class MemoryAttentionLayer(nn.Module):
    cfg: MemoryAttentionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,  # [B, Lq, C]
        memory: jnp.ndarray,  # [B, Lk, kv_dim]
        pos: jnp.ndarray,  # [B, Lk, kv_dim]
        query_pos: jnp.ndarray,  # [B, Lq, C]
        num_obj_ptr_tokens: int,
        key_mask: Optional[jnp.ndarray] = None,  # [B, Lk]
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)
        rope_cos, rope_sin = compute_axial_rope(
            cfg.d_model // cfg.num_heads,
            cfg.rope_feat_sizes[0],
            cfg.rope_feat_sizes[1],
            cfg.rope_theta,
        )

        drop = lambda name: nn.Dropout(cfg.dropout, name=name)

        # Self-attention (RoPE; pos only if pos_enc_at_attn)
        tgt2 = ln("norm1")(tgt)
        q = k = tgt2 + query_pos if cfg.pos_enc_at_attn else tgt2
        tgt2 = RoPEAttention(
            embedding_dim=cfg.d_model,
            num_heads=cfg.num_heads,
            dropout=cfg.dropout,
            dtype=self.dtype,
            name="self_attn",
        )(q, k, tgt2, rope_cos, rope_sin, deterministic=deterministic)
        tgt = tgt + drop("dropout1")(tgt2, deterministic=deterministic)

        # Cross-attention to memories (RoPE with k-repeat; ptr tokens unrotated)
        tgt2 = ln("norm2")(tgt)
        num_k_rope = memory.shape[1] - num_obj_ptr_tokens
        tgt2 = RoPEAttention(
            embedding_dim=cfg.d_model,
            num_heads=cfg.num_heads,
            kv_in_dim=cfg.kv_in_dim,
            dropout=cfg.dropout,
            force_flash=getattr(cfg, "force_flash", False),
            dtype=self.dtype,
            name="cross_attn_image",
        )(
            tgt2 + query_pos if cfg.pos_enc_at_cross_attn_queries else tgt2,
            memory + pos if cfg.pos_enc_at_cross_attn_keys else memory,
            memory,
            rope_cos,
            rope_sin,
            rope_k_len=num_k_rope,
            rope_k_repeat=True,
            key_mask=key_mask,
            deterministic=deterministic,
            landmark_pool=cfg.efficient_pool_size,
            spatial_hw=cfg.rope_feat_sizes,
            landmark_variant=getattr(cfg, "efficient_pool_variant", 1),
        )
        tgt = tgt + drop("dropout2")(tgt2, deterministic=deterministic)

        # FFN (dropout placement per reference memory_attention.py:96-98)
        tgt2 = ln("norm3")(tgt)
        act = ACTIVATIONS[cfg.activation]
        tgt2 = nn.Dense(cfg.dim_feedforward, dtype=self.dtype, name="linear1")(tgt2)
        tgt2 = drop("dropout")(act(tgt2), deterministic=deterministic)
        tgt2 = nn.Dense(cfg.d_model, dtype=self.dtype, name="linear2")(tgt2)
        return tgt + drop("dropout3")(tgt2, deterministic=deterministic)


class MemoryAttention(nn.Module):
    """Stack of MemoryAttentionLayers + final norm (reference memory_attention.py:102-169)."""

    cfg: MemoryAttentionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        curr: jnp.ndarray,  # [B, Lq, C]
        memory: jnp.ndarray,  # [B, Lk, kv_dim]
        curr_pos: jnp.ndarray,  # [B or 1, Lq, C]
        memory_pos: jnp.ndarray,  # [B, Lk, kv_dim]
        num_obj_ptr_tokens: int = 0,
        key_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.cfg
        output = curr
        if cfg.pos_enc_at_input:
            output = output + 0.1 * curr_pos
        for i in range(cfg.num_layers):
            output = MemoryAttentionLayer(
                cfg, dtype=self.dtype, name=f"layers_{i}"
            )(
                output,
                memory,
                memory_pos,
                curr_pos,
                num_obj_ptr_tokens,
                key_mask,
                deterministic,
            )
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(output)


class _ConvParams(nn.Module):
    """Parameter holder matching nn.Conv's names for paths computed manually."""

    shape: tuple

    @nn.compact
    def __call__(self):
        w = self.param("kernel", nn.initializers.lecun_normal(), self.shape, jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.shape[-1],), jnp.float32)
        return w, b


class _ConvHolder(nn.Module):
    shape: tuple

    @nn.compact
    def __call__(self):
        return _ConvParams(self.shape, name="conv")()


class MaskDownSampler(nn.Module):
    """Stride-16 conv pyramid over the predicted mask (reference memory_encoder.py:17-58).

    For the shipped k3/s2/p1 geometry the whole pyramid runs in a folded cell
    layout (ops/folded_pyramid.py): the 1-16-channel early layers otherwise
    spend ~0.15 ms/frame in lane-sliver convs and layout conversions on TPU.
    Param tree and numerics are identical to the direct path (which remains
    for other geometries)."""

    cfg: MemoryEncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, H, W, 1]
        import math

        from us_video_medsam2_tpu.ops.folded_pyramid import (
            folded_conv_layer,
            folded_pyramid_applicable,
        )
        from us_video_medsam2_tpu.ops.window import space_to_depth

        cfg = self.cfg
        stride = cfg.mask_downsampler_stride
        num_layers = int(
            math.log2(cfg.mask_downsampler_total_stride) // math.log2(stride)
        )
        if x.shape[-1] == 1 and folded_pyramid_applicable(
            x.shape[1], x.shape[2], cfg.mask_downsampler_kernel, stride,
            cfg.mask_downsampler_padding, num_layers,
        ):
            total = stride**num_layers
            xf = space_to_depth(x, total)  # [B, H/16, W/16, 256]
            g_in, cin = total, 1
            for i in range(num_layers):
                cout = cin * stride**2
                w, b = _ConvHolder((3, 3, cin, cout), name=f"encoder_{i}")()
                xf = folded_conv_layer(xf, w, b, g_in, self.dtype)
                g_out = g_in // 2
                bsz, n, m, _ = xf.shape
                xf = xf.reshape(bsz, n, m, g_out * g_out, cout)
                xf = LayerNorm(eps=1e-6, dtype=self.dtype, name=f"encoder_ln_{i}")(xf)
                xf = gelu_exact(xf).reshape(bsz, n, m, g_out * g_out * cout)
                g_in, cin = g_out, cout
            return Conv2d(
                cfg.mask_downsampler_embed_dim, 1, dtype=self.dtype,
                name="encoder_out",
            )(xf)
        chans = 1
        for i in range(num_layers):
            chans = chans * stride**2
            x = Conv2d(
                chans,
                cfg.mask_downsampler_kernel,
                stride=stride,
                padding=cfg.mask_downsampler_padding,
                dtype=self.dtype,
                name=f"encoder_{i}",
            )(x)
            x = LayerNorm(eps=1e-6, dtype=self.dtype, name=f"encoder_ln_{i}")(x)
            x = gelu_exact(x)
        return Conv2d(
            cfg.mask_downsampler_embed_dim, 1, dtype=self.dtype, name="encoder_out"
        )(x)


class _LNParams(nn.Module):
    """Parameter holder matching LayerNorm's names for manually computed paths."""

    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        return s, b


class _DenseParams(nn.Module):
    """Parameter holder matching nn.Dense's names for manually computed paths."""

    din: int
    dout: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.din, self.dout),
            jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.dout,), jnp.float32)
        return k, b


class CXBlock(nn.Module):
    """ConvNeXt block, NHWC (reference memory_encoder.py:62-117).

    The chain is composed functionally (kernels/fused_cxblock.py::_xla_ref)
    with the identical lowerings the submodules used (shifted-MAC dwconv,
    fast-variance LN, bf16 Dense dots, exact GELU); param tree unchanged.
    US_MEDSAM2_ENABLE_FUSED_CXBLOCK=1 opts TPU/bf16 into the one-pass Pallas
    block kernel — A/B-tested and REJECTED as the default: it wins its module
    (13.2 -> 10.8 ms/64f) but nonlocally regresses the memory-attention LN
    fusions by +9 ms (kernels/fused_cxblock.py STATUS note).

    NOTE: a partial Pallas LN here was A/B-tested too and REGRESSES badly
    (109 -> 136 ms/64f device, round-4): it displaces XLA's fusion of the
    shifted-MAC dwconv + LN + pwconv1 chain. Fuse the whole block or nothing
    — and on this evidence, nothing.
    """

    dim: int
    kernel_size: int = 7
    padding: int = 3
    layer_scale_init: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from us_video_medsam2_tpu.kernels.fused_cxblock import (
            _xla_ref,
            fused_cxblock,
            fused_cxblock_available,
        )

        k = self.kernel_size
        dw_w, dw_b = _ConvHolder((k, k, 1, self.dim), name="dwconv")()
        ln_s, ln_b = _LNParams(self.dim, name="norm")()
        w1, b1 = _DenseParams(self.dim, 4 * self.dim, name="pwconv1")()
        w2, b2 = _DenseParams(4 * self.dim, self.dim, name="pwconv2")()
        gamma = self.param(
            "gamma",
            nn.initializers.constant(self.layer_scale_init),
            (self.dim,),
        )
        args = (dw_w, dw_b, ln_s, ln_b, w1, b1, w2, b2, gamma)
        if (
            not self.is_initializing()
            and self.padding == k // 2
            and fused_cxblock_available(x.shape, x.dtype)
        ):
            return fused_cxblock(x, *args, 1e-6)
        return _xla_ref(x, *args, 1e-6)


class MemoryEncoder(nn.Module):
    """Fuse pixel features with the downsampled predicted mask into a memory.

    (reference memory_encoder.py:138-181)
    """

    cfg: MemoryEncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        pix_feat: jnp.ndarray,  # [B, H, W, in_dim]
        masks: jnp.ndarray,  # [B, 16H, 16W, 1] (already sigmoid-scaled by caller)
    ):
        cfg = self.cfg
        m = MaskDownSampler(cfg, dtype=self.dtype, name="mask_downsampler")(masks)
        x = Conv2d(cfg.in_dim, 1, dtype=self.dtype, name="pix_feat_proj")(pix_feat)
        x = x + m
        for i in range(cfg.fuser_layers):
            x = CXBlock(
                dim=cfg.in_dim,
                kernel_size=cfg.fuser_kernel,
                padding=cfg.fuser_padding,
                layer_scale_init=cfg.fuser_layer_scale_init,
                dtype=self.dtype,
                name=f"fuser_{i}",
            )(x)
        if cfg.out_dim != cfg.in_dim:
            x = Conv2d(cfg.out_dim, 1, dtype=self.dtype, name="out_proj")(x)
        pos = sine_pos_embed_2d(
            x.shape[1], x.shape[2], cfg.pos_channels, cfg.pos_temperature
        ).astype(x.dtype)
        return x, pos
