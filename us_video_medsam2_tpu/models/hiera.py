"""Hiera: hierarchical windowed ViT trunk (TPU/NHWC re-design).

Capability parity with reference sam2/modeling/backbones/hieradet.py:169-317:
4 stages with dim/head doubling, windowed attention everywhere except the
designated global blocks, and max-pool Q-downsampling at stage transitions.
Window partition/unpartition are static reshapes; attention runs on
[num_windows*B, heads, tokens, 96] batches that XLA tiles onto the MXU.

The windowed background position embedding (reference hieradet.py:273-281) is
interpolated with torch-compatible bicubic weights (ops/resize.py) so imported
SAM2.1 checkpoints reproduce reference features bit-closely.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from us_video_medsam2_tpu.core.config import HieraConfig
from us_video_medsam2_tpu.kernels.fused_mlp import (
    ln_mlp_residual,
    ln_mlp_residual_available,
    pick_block_n,
)
from us_video_medsam2_tpu.kernels.fused_window_attention import (
    fused_qkv_window_attention,
    fused_qkv_window_attention_available,
    fused_window_attention,
    fused_window_attention_available,
)
from us_video_medsam2_tpu.models.layers import MLP, DropPath, LayerNorm, gelu_exact
from us_video_medsam2_tpu.ops.attention import sdpa_blhd
from us_video_medsam2_tpu.ops.resize import resize2d


class PatchEmbed(nn.Module):
    """Overlapping patch embed (7x7/s4 conv) via space-to-depth + one matmul.

    The 7x7/s4 3-channel conv is re-expressed exactly: space-to-depth by the
    stride folds [B, H, W, 3] -> [B, H/4, W/4, 48]; each output pixel then
    depends on a 2x2 neighbourhood of s2d cells (kernel 7 <= 2*stride), so the
    conv becomes a 2x2 cell conv whose kernel is the 7x7 kernel scattered into
    a [2, 2, stride, stride, cin, cout] layout — computed as 4 shifted slices
    concatenated + a single [.., 4*s2d_ch] @ [4*s2d_ch, cout] MXU matmul.
    Measured 37% faster than XLA's conv lowering on v5e (tools/microbench.py);
    numerics identical. Requires kernel <= 2*stride and H, W % stride == 0.
    Param names/shapes match nn.Conv ('kernel' [kh, kw, cin, cout], 'bias').
    """

    features: int
    kernel: int
    stride: int
    pad: int
    in_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh = self.kernel
        s = self.stride
        cin = self.in_channels
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kh, cin, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        b, h, wd, c_actual = x.shape
        prefolded = c_actual == s * s * cin and cin != s * s * cin
        if not prefolded and (
            kh > 2 * s or h % s or wd % s or self.pad != kh // 2
        ):
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                w.astype(self.dtype),
                (s, s),
                ((self.pad, self.pad), (self.pad, self.pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + bias.astype(self.dtype)
        if prefolded:
            # input already space-to-depth folded (ops/window.space_to_depth) —
            # the video predictor folds the whole clip once outside the scan
            xs, n, m = x, h, wd
        else:
            n, m = h // s, wd // s
            xs = (
                x.reshape(b, n, s, m, s, cin)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(b, n, m, s * s * cin)
            )
        xs = jnp.pad(xs, ((0, 0), (1, 0), (1, 0), (0, 0)))
        patches = jnp.concatenate(
            [xs[:, :n, :m], xs[:, :n, 1:], xs[:, 1:, :m], xs[:, 1:, 1:]], axis=-1
        ).astype(self.dtype)  # cells (i-1,j-1), (i-1,j), (i,j-1), (i,j)
        # scatter w[ki,kj,c,o] into cell layout: output pixel (i,j) reads input
        # row s*i + ki - pad, i.e. cell i-1 rows ri = ki+pad-s, cell i rows
        # ri = ki+pad ... solved as ki = ri - pad + s*di for di in {0,1}.
        w2 = jnp.zeros((2, 2, s, s, cin, self.features), jnp.float32)
        for di in range(2):
            for dj in range(2):
                for ri in range(s):
                    ki = ri + self.pad - s + s * di
                    if not 0 <= ki < kh:
                        continue
                    for rj in range(s):
                        kj = rj + self.pad - s + s * dj
                        if 0 <= kj < kh:
                            w2 = w2.at[di, dj, ri, rj].set(w[ki, kj])
        wmat = w2.reshape(4 * s * s * cin, self.features).astype(self.dtype)
        out = jax.lax.dot_general(
            patches.reshape(-1, 4 * s * s * cin),
            wmat,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(b, n, m, self.features)
        return (out + bias).astype(self.dtype)


def _max_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 max pool over [..., H, W, C]."""
    b = x.shape[:-3]
    h, w, c = x.shape[-3:]
    x = x.reshape(*b, h // 2, 2, w // 2, 2, c)
    return x.max(axis=(-2, -4))


def _block_diag_bias(g: int, lq: int, lk: int) -> jnp.ndarray:
    """[1, 1, g*lq, g*lk] additive mask: 0 on the g diagonal (lq, lk) blocks,
    -1e30 elsewhere. Trace-time constant (numpy), folded by jit."""
    import numpy as np

    from us_video_medsam2_tpu.ops.attention import NEG_INF

    mask = np.full((g * lq, g * lk), NEG_INF, np.float32)
    for i in range(g):
        mask[i * lq : (i + 1) * lq, i * lk : (i + 1) * lk] = 0.0
    return jnp.asarray(mask)[None, None]


class _QKVDense(nn.Module):
    """Dense with the checkpoint's [in, 3*H*hd] param shape whose applied
    weight is lane-padded per head to [in, 3*H*hd_pad] (zero columns).

    head_dim 96 is lane-misaligned on TPU (vregs are 8x128): splitting the
    qkv output's minor dim into (3, H, 96) forces a real lane-shuffle copy —
    the round-3 trace showed ~9 ms/64f of such copies across the trunk. With
    hd padded to 128 in the weights, every downstream reshape/slice lands on
    vreg boundaries and is free, while the MXU cost is unchanged (it pads
    96 -> 128 contraction depth in hardware anyway) and the pad lanes are
    exact zeros through qk/av (0-weight columns -> 0 logit terms, 0 outputs).
    """

    features: int  # 3 * H * hd — the stored param shape
    num_heads: int
    head_dim: int
    hd_pad: int
    in_features: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_features, self.features),
            jnp.float32,
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )

    def padded(self):
        """(weight [in, 3*H*hd_pad], bias [3*H*hd_pad]) with zero pad lanes."""
        hd, hp = self.head_dim, self.hd_pad
        w = jnp.pad(
            self.kernel.reshape(self.in_features, 3, self.num_heads, hd),
            ((0, 0), (0, 0), (0, 0), (0, hp - hd)),
        ).reshape(self.in_features, 3 * self.num_heads * hp)
        b = jnp.pad(
            self.bias.reshape(3, self.num_heads, hd), ((0, 0), (0, 0), (0, hp - hd))
        ).reshape(-1)
        return w, b

    def __call__(self, x):
        w, bias = self.padded()
        y = jax.lax.dot_general(
            x.astype(self.dtype),
            w.astype(self.dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (y + bias).astype(self.dtype)


class _ProjDense(nn.Module):
    """Output projection accepting lane-padded [.., H*hd_pad] inputs with the
    checkpoint's [H*hd, dim_out] param shape (zero rows on the pad lanes —
    they multiply exact-zero activations, see _QKVDense)."""

    dim_out: int
    num_heads: int
    head_dim: int
    hd_pad: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.num_heads * self.head_dim, self.dim_out),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.dim_out,), jnp.float32)
        hd, hp = self.head_dim, self.hd_pad
        w = jnp.pad(
            w.reshape(self.num_heads, hd, self.dim_out),
            ((0, 0), (0, hp - hd), (0, 0)),
        ).reshape(self.num_heads * hp, self.dim_out)
        y = jax.lax.dot_general(
            x.astype(self.dtype),
            w.astype(self.dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (y + bias).astype(self.dtype)


class MultiScaleAttention(nn.Module):
    """Windowed MHSA with optional Q max-pooling (reference hieradet.py:39-81).

    Packed-window execution: each window has only ws² keys (16-64 for this
    model family), so the per-window softmax runs on quarter-to-eighth-filled
    128-lane vregs and the qk/av matmuls on mostly-empty MXU tiles. When
    Lk <= 64, G = 128//Lk windows are packed into one attention over G*Lk keys
    with a block-diagonal -1e30 bias: masked logits exp to exact zero, so every
    valid probability and output element is identical to the per-window
    computation (windows from different images may share a group — the mask
    isolates them exactly). Lane occupancy goes to >= 128/(128//Lk * Lk)
    and batched-matmul tile count drops G-fold for the same useful FLOPs.

    Head dims that are lane-misaligned (96 % 128 != 0) run with weight-level
    zero-padding to 128 (_QKVDense/_ProjDense) so the head split never moves
    data; attention itself runs in [B, L, H, D] layout (ops/attention.py::
    sdpa_blhd) so the head axis enters the matmuls as a batch dim with no
    [B, H, L, D] transpose.
    """

    dim_out: int
    num_heads: int
    q_pool: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, window_size: int = 0):
        import os

        b, h, w, _ = x.shape
        nh_heads = self.num_heads
        head_dim = self.dim_out // nh_heads
        hd_pad = head_dim if head_dim % 128 == 0 else -(-head_dim // 128) * 128
        if os.environ.get("US_MEDSAM2_DISABLE_HEAD_PAD"):
            hd_pad = head_dim
        scale = head_dim**-0.5

        pad_h = pad_w = 0
        if window_size > 0:
            ws = window_size
            pad_h = (ws - h % ws) % ws
            pad_w = (ws - w % ws) % ws
            hs, wsp = h + pad_h, w + pad_w
            if (
                hd_pad != head_dim
                and head_dim % 64 == 0
                and not os.environ.get("US_MEDSAM2_DISABLE_HD64_NATIVE")
                and fused_window_attention_available(
                    hs, wsp, ws, nh_heads, head_dim, self.dtype
                )
            ):
                # the fused kernel slices heads in-kernel, so a half-vreg
                # head dim (64) needs no 128-lane weight pad: running native
                # halves the qkv/O HBM bytes and the kernel's in-VMEM window
                # relayout volume (ViT-S ws=14 blocks, hd 64)
                hd_pad = head_dim
        qkv_mod = _QKVDense(
            features=self.dim_out * 3,
            num_heads=nh_heads,
            head_dim=head_dim,
            hd_pad=hd_pad,
            in_features=x.shape[-1],
            dtype=self.dtype,
            name="qkv",
        )

        if window_size > 0 and not self.is_initializing() and (
            os.environ.get("US_MEDSAM2_FUSE_QKV_WINDOW_ATTN")
            and fused_qkv_window_attention_available(
                hs, wsp, window_size, nh_heads, hd_pad, x.shape[-1], self.dtype
            )
        ):
            # A/B-TESTED AND REJECTED (off by default): folding the qkv
            # projection into the window-attention kernel removes the qkv
            # HBM round-trip but the per-strip in-kernel dense loses more
            # than that saves (116.1 vs 114.5 ms/64f device — XLA's single
            # large fused dot beats Mosaic's per-program dense + f32 store).
            # Kept behind US_MEDSAM2_FUSE_QKV_WINDOW_ATTN for bigger configs.
            if pad_h or pad_w:  # the in-kernel dense consumes the padded map
                x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            pw, pb = qkv_mod.padded()
            o = fused_qkv_window_attention(
                x.astype(self.dtype), pw, pb, window_size, nh_heads, hd_pad,
                self.q_pool,
            )
            ho, wo = (h // 2, w // 2) if self.q_pool else (h, w)
            if o.shape[1] > ho or o.shape[2] > wo:
                o = o[:, :ho, :wo]
            return _ProjDense(
                dim_out=self.dim_out,
                num_heads=nh_heads,
                head_dim=head_dim,
                hd_pad=hd_pad,
                dtype=self.dtype,
                name="proj",
            )(o)

        qkv = qkv_mod(x)
        if pad_h or pad_w:
            # Project the UNPADDED map, then fill the window-grid pad region
            # with the projection bias: the reference zero-pads the
            # pre-projection tokens (window_partition before attn,
            # hieradet.py:143-148), so its pad tokens carry Dense(0) = bias
            # exactly — bias-filling the qkv output is the identical tensor at
            # 1/(hs*wsp / (h*w)) of the dense FLOPs (1.72x at ws=14 on 32²
            # maps: qkv was the trunk's biggest non-kernel bucket, 8.7 ms/64f
            # on EfficientTAM-S). Rounding matches the dense epilogue:
            # (0 + bias_f32).astype(dtype) == bias_f32.astype(dtype).
            _, pb = qkv_mod.padded()
            full = jnp.broadcast_to(
                pb.astype(self.dtype), (b, hs, wsp, qkv.shape[-1])
            )
            qkv = jax.lax.dynamic_update_slice(full, qkv, (0, 0, 0, 0))

        if window_size == 0:
            # global attention: [B, L, H, D] layout, head axis as dot batch dim
            qkv = qkv.reshape(b, h * w, 3, nh_heads, hd_pad)
            q = qkv[:, :, 0]
            if self.q_pool:  # 2x2 max-pool over the full map (hieradet do_pool)
                q = _max_pool_2x(q.reshape(b, h, w, nh_heads * hd_pad))
                h, w = q.shape[1:3]
                q = q.reshape(b, h * w, nh_heads, hd_pad)
            out = sdpa_blhd(q, qkv[:, :, 1], qkv[:, :, 2], scale=scale).reshape(
                b, h, w, nh_heads * hd_pad
            )
        elif fused_window_attention_available(
            hs, wsp, ws, nh_heads, hd_pad, self.dtype
        ) and not self.is_initializing():
            # one Pallas pass: window partition + q-pool + packed softmax +
            # AV + unpartition entirely in VMEM, qkv consumed in its natural
            # dense-output layout (kernels/fused_window_attention.py) — the
            # XLA lowering of the same sequence costs ~24 ms/64f in HBM
            # transpose/score traffic (round-3 trace)
            o = fused_window_attention(qkv, ws, nh_heads, hd_pad, self.q_pool, h)
            ho, wo = (h // 2, w // 2) if self.q_pool else (h, w)
            if o.shape[1] > ho or o.shape[2] > wo:
                o = o[:, :ho, :wo]
            out = o
        else:
            # head-major window partition: ONE transpose carries the window
            # split AND the head split, so q/k/v land directly in canonical
            # [N = B*nWin*H, L, D] batch form and the attention einsums need
            # no batch-dim normalization copies.
            nwh, nww = hs // ws, wsp // ws
            t = qkv.reshape(b, nwh, ws, nww, ws, 3, nh_heads, hd_pad)
            t = t.transpose(5, 0, 1, 3, 6, 2, 4, 7)
            t = t.reshape(3, b * nwh * nww * nh_heads, ws * ws, hd_pad)
            q, k, v = t[0], t[1], t[2]
            n = q.shape[0]
            lq = lk = ws * ws
            wso = ws
            if self.q_pool:
                wso = ws // 2
                lq = wso * wso
                q = (
                    q.reshape(n, wso, 2, wso, 2, hd_pad)
                    .max(axis=(2, 4))
                    .reshape(n, lq, hd_pad)
                )
            g = 128 // lk if lk <= 64 else 1
            if os.environ.get("US_MEDSAM2_DISABLE_PACKED_ATTN"):
                g = 1
            pad_n = (-n) % g
            if pad_n:  # zero dummy windows; outputs sliced off below
                q, k, v = (
                    jnp.pad(a, ((0, pad_n), (0, 0), (0, 0))) for a in (q, k, v)
                )
            if g > 1:
                # pack G windows per attention with a block-diagonal -inf
                # bias: adjacent N entries may be different heads/windows —
                # the mask isolates them exactly (masked probs are exact 0)
                q = q.reshape((n + pad_n) // g, g * lq, hd_pad)
                k = k.reshape((n + pad_n) // g, g * lk, hd_pad)
                v = v.reshape((n + pad_n) // g, g * lk, hd_pad)
            s = (
                jnp.einsum("nqd,nkd->nqk", q, k, preferred_element_type=jnp.float32)
                * scale
            )
            if g > 1:
                s = s + _block_diag_bias(g, lq, lk)[0]
            p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o = jnp.einsum(
                "nqk,nkd->nqd",
                p.astype(v.dtype),
                v,
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)
            o = o.reshape(n + pad_n, lq, hd_pad)[:n]
            # inverse transpose: window unpartition + head merge in one move
            o = o.reshape(b, nwh, nww, nh_heads, wso, wso, hd_pad)
            o = o.transpose(0, 1, 4, 2, 5, 3, 6)
            o = o.reshape(b, nwh * wso, nww * wso, nh_heads * hd_pad)
            ho, wo = (h // 2, w // 2) if self.q_pool else (h, w)
            if o.shape[1] > ho or o.shape[2] > wo:
                o = o[:, :ho, :wo]
            out = o
        return _ProjDense(
            dim_out=self.dim_out,
            num_heads=nh_heads,
            head_dim=head_dim,
            hd_pad=hd_pad,
            dtype=self.dtype,
            name="proj",
        )(out)


class MultiScaleBlock(nn.Module):
    """Hiera block (reference hieradet.py:84-166)."""

    dim: int
    dim_out: int
    num_heads: int
    window_size: int
    q_stride: Optional[Tuple[int, int]] = None
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        shortcut = x
        x = LayerNorm(eps=1e-6, dtype=self.dtype, pallas_ok=True, name="norm1")(x)

        if self.dim != self.dim_out:
            shortcut = nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(x)
            if self.q_stride:
                shortcut = _max_pool_2x(shortcut)

        x = MultiScaleAttention(
            dim_out=self.dim_out,
            num_heads=self.num_heads,
            q_pool=self.q_stride is not None,
            dtype=self.dtype,
            name="attn",
        )(x, window_size=self.window_size)

        dp = DropPath(self.drop_path, name="drop_path")
        x = shortcut + dp(x, deterministic)

        hidden = int(self.dim_out * self.mlp_ratio)
        norm2 = LayerNorm(eps=1e-6, dtype=self.dtype, name="norm2")
        mlp = MLP(
            hidden_dim=hidden,
            output_dim=self.dim_out,
            num_layers=2,
            activation=gelu_exact,
            dtype=self.dtype,
            name="mlp",
        )
        n_tok = x.shape[0] * x.shape[1] * x.shape[2]
        use_fused = (
            not self.is_initializing()
            and (deterministic or self.drop_path == 0.0)
            and ln_mlp_residual_available(n_tok, self.dim_out, hidden, self.dtype)
        )
        if use_fused:
            # same params, same math, one Pallas pass (kernels/fused_mlp.py)
            p = self.variables["params"]
            out = ln_mlp_residual(
                x.reshape(n_tok, self.dim_out),
                p["norm2"]["scale"],
                p["norm2"]["bias"],
                p["mlp"]["layers_0"]["kernel"],
                p["mlp"]["layers_0"]["bias"],
                p["mlp"]["layers_1"]["kernel"],
                p["mlp"]["layers_1"]["bias"],
                1e-6,
                "gelu",
                *pick_block_n(n_tok, self.dim_out, hidden),
            )
            return out.reshape(x.shape)
        y = mlp(norm2(x))
        return x + dp(y, deterministic)


class Hiera(nn.Module):
    """Trunk producing one feature map per stage, high→low resolution."""

    cfg: HieraConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg
        depth = sum(cfg.stages)
        stage_ends = [sum(cfg.stages[: i + 1]) - 1 for i in range(len(cfg.stages))]
        q_pool_blocks = [e + 1 for e in stage_ends[:-1]][: cfg.q_pool]

        # Patch embed: 7x7/s4 conv computed as space-to-depth + one MXU matmul
        x = PatchEmbed(
            features=cfg.embed_dim,
            kernel=cfg.patch_kernel,
            stride=cfg.patch_stride,
            pad=cfg.patch_padding,
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        h, w = x.shape[1:3]

        # Windowed background pos embed (reference hieradet.py:273-281)
        bkg_h, bkg_w = cfg.window_pos_embed_bkg_spatial_size
        pos_embed = self.param(
            "pos_embed", nn.initializers.zeros, (1, bkg_h, bkg_w, cfg.embed_dim)
        )
        win = cfg.window_spec[0]
        pos_embed_window = self.param(
            "pos_embed_window", nn.initializers.zeros, (1, win, win, cfg.embed_dim)
        )
        pe = resize2d(pos_embed, (h, w), mode="cubic")
        pe = pe + jnp.tile(pos_embed_window, (1, h // win, w // win, 1))
        x = x + pe.astype(x.dtype)

        dpr = [cfg.drop_path_rate * i / max(depth - 1, 1) for i in range(depth)]

        outputs = []
        dim = cfg.embed_dim
        num_heads = cfg.num_heads
        cur_stage = 1
        for i in range(depth):
            dim_out = dim
            window_size = cfg.window_spec[cur_stage - 1]
            if cfg.global_att_blocks and i in cfg.global_att_blocks:
                window_size = 0
            if i - 1 in stage_ends:
                dim_out = int(dim * cfg.dim_mul)
                num_heads = int(num_heads * cfg.head_mul)
                cur_stage += 1
            x = MultiScaleBlock(
                dim=dim,
                dim_out=dim_out,
                num_heads=num_heads,
                window_size=window_size,
                q_stride=cfg.q_stride if i in q_pool_blocks else None,
                mlp_ratio=cfg.mlp_ratio,
                drop_path=dpr[i],
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, deterministic)
            dim = dim_out
            if i in stage_ends:
                outputs.append(x)  # NHWC

        return outputs
