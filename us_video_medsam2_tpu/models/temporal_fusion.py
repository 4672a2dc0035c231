"""Temporal fusion modules — the fork's inter-frame feature mixers.

Capability parity with the `######## jimin ########` modules in reference
sam2/modeling/sam2_base.py:25-758 and TemporalContextExchange.py:5-56, applied to
FPN feature maps across the frame axis when training on videos
(sam2_base.py:1249-1262, selected by editing line 855 in the reference; here by
`TemporalFusionConfig.variant`).

TPU deviations (documented, these are experimental research modules):
- BatchNorm3d -> GroupNorm (stateless; no cross-replica batch stats needed).
- Features are NHWC: [B*T, H, W, C]; the temporal conv is a depthwise conv over
  a [B, T, H, W, C] view.
- GFTE's path-graph Laplacian eigenbasis (reference sam2_base.py:421-476 computes
  `torch.linalg.eigh` per forward) is a trace-time numpy constant — for a path
  graph of T nodes it is the DCT-II basis, so no runtime eigendecomposition.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from us_video_medsam2_tpu.core.config import TemporalFusionConfig
from us_video_medsam2_tpu.models.layers import gelu_exact


def _group_norm(x, scale, bias, groups: int, eps: float = 1e-5):
    """GroupNorm over channel axis of [..., C] (stateless BatchNorm3d stand-in)."""
    c = x.shape[-1]
    orig = x.shape
    xf = x.astype(jnp.float32).reshape(-1, c)
    xf = xf.reshape(xf.shape[0], groups, c // groups)
    mean = xf.mean(axis=(0, 2), keepdims=True)
    var = jnp.var(xf, axis=(0, 2), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(-1, c) * scale + bias
    return xf.reshape(orig)


class TemporalContextExchange(nn.Module):
    """Depthwise temporal conv + channel attention + alpha residual.

    (reference TemporalContextExchange.py:5-56 / safeTemporalContextExchange,
    sam2_base.py:697-758)
    """

    channels: int
    alpha_init: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, num_frames: int, deterministic: bool = True):
        bt, h, w, c = x.shape
        if c != self.channels or num_frames <= 1:
            return x
        b = bt // num_frames
        t = num_frames
        identity = x
        xt = x.reshape(b, t, h, w, c)

        # depthwise temporal conv, kernel (3,) over T, per channel, no bias
        dw = self.param(
            "depthwise", nn.initializers.lecun_normal(), (3, 1, c)
        )  # [kt, 1, C]
        pad = jnp.pad(xt, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        out = (
            pad[:, :-2] * dw[0, 0] + pad[:, 1:-1] * dw[1, 0] + pad[:, 2:] * dw[2, 0]
        )

        gn1_s = self.param("gn1_scale", nn.initializers.ones, (c,))
        gn1_b = self.param("gn1_bias", nn.initializers.zeros, (c,))
        out = _group_norm(out, gn1_s, gn1_b, groups=min(32, c))

        # channel attention: global avg pool over (T,H,W) -> bottleneck MLP -> sigmoid
        hidden = max(c // 16, 8)
        pooled = out.mean(axis=(1, 2, 3))  # [B, C]
        attn = nn.Dense(hidden, dtype=self.dtype, name="attn_fc1")(pooled)
        attn = jax.nn.relu(attn)
        attn = nn.Dense(c, dtype=self.dtype, name="attn_fc2")(attn)
        attn = jax.nn.sigmoid(attn)
        out = out * attn[:, None, None, None, :]

        out = nn.Dense(c, use_bias=False, dtype=self.dtype, name="pointwise")(out)
        gn2_s = self.param("gn2_scale", nn.initializers.ones, (c,))
        gn2_b = self.param("gn2_bias", nn.initializers.zeros, (c,))
        out = _group_norm(out, gn2_s, gn2_b, groups=min(32, c))

        alpha = self.param(
            "alpha", nn.initializers.constant(self.alpha_init), ()
        )
        out = out.reshape(bt, h, w, c)
        return identity + alpha.astype(x.dtype) * out.astype(x.dtype)


@functools.lru_cache(maxsize=16)
def _path_laplacian_eigh(t: int):
    """Eigendecomposition of the T-node path-graph Laplacian (trace-time constant).

    Reference GFTE builds L = D - A for the temporal path graph and eigh's it per
    forward (sam2_base.py:421-476); for a path graph this basis is closed-form.
    """
    lap = np.zeros((t, t), np.float64)
    for i in range(t):
        deg = (1 if i > 0 else 0) + (1 if i < t - 1 else 0)
        lap[i, i] = deg
        if i > 0:
            lap[i, i - 1] = -1
        if i < t - 1:
            lap[i, i + 1] = -1
    evals, evecs = np.linalg.eigh(lap)
    return evals.astype(np.float32), evecs.astype(np.float32)


class GFTE(nn.Module):
    """Graph-Fourier temporal exchange (reference sam2_base.py:372-527).

    Spectral filtering of per-frame global descriptors on the temporal path
    graph + temporal MHA + multi-scale depthwise temporal convs, 0.1-scaled
    residual.
    """

    channels: int
    num_heads: int = 4
    alpha: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, num_frames: int, deterministic: bool = True):
        bt, h, w, c = x.shape
        if c != self.channels or num_frames <= 1:
            return x
        b, t = bt // num_frames, num_frames
        identity = x
        xt = x.reshape(b, t, h, w, c)

        # --- spectral branch on global temporal signal ---
        evals, evecs = _path_laplacian_eigh(t)
        evecs_j = jnp.asarray(evecs)  # [T, T]
        sig = xt.mean(axis=(2, 3))  # [B, T, C]
        spec = jnp.einsum("kt,btc->bkc", evecs_j.T, sig)
        # learned spectral gate (low-pass init: ones)
        gate = self.param("spectral_gate", nn.initializers.ones, (t, 1))
        spec = spec * gate
        sig_f = jnp.einsum("tk,bkc->btc", evecs_j, spec)
        sig_f = nn.Dense(c, dtype=self.dtype, name="spec_proj")(sig_f)

        # --- temporal multi-head attention over frames ---
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="tattn_qkv")(sig + sig_f)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = c // self.num_heads
        q = q.reshape(b, t, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, self.num_heads, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hd**-0.5)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        tsig = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        tsig = tsig.transpose(0, 2, 1, 3).reshape(b, t, c)
        tsig = nn.Dense(c, dtype=self.dtype, name="tattn_proj")(tsig)

        # --- multi-scale depthwise temporal convs (k in {3,5,7}) ---
        mixed = jnp.zeros_like(xt)
        for ki, ksz in enumerate((3, 5, 7)):
            dw = self.param(
                f"msdw_{ksz}", nn.initializers.lecun_normal(), (ksz, 1, c)
            )
            p = ksz // 2
            pad = jnp.pad(xt, ((0, 0), (p, p), (0, 0), (0, 0), (0, 0)))
            acc = sum(pad[:, i : i + t] * dw[i, 0] for i in range(ksz))
            mixed = mixed + acc / 3.0

        out = mixed + (sig_f + tsig)[:, :, None, None, :]
        out = gelu_exact(nn.Dense(c, dtype=self.dtype, name="fuse")(out))
        out = out.reshape(bt, h, w, c)
        return identity + self.alpha * out.astype(x.dtype)


class AdaptiveTemporalSemanticFusion(nn.Module):
    """Local/global temporal conv branches + fusion gate (reference sam2_base.py:233-361)."""

    channels: int
    alpha: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, num_frames: int, deterministic: bool = True):
        bt, h, w, c = x.shape
        if c != self.channels or num_frames <= 1:
            return x
        b, t = bt // num_frames, num_frames
        identity = x
        xt = x.reshape(b, t, h, w, c)

        # local branch: depthwise temporal conv k=3
        dw = self.param("local_dw", nn.initializers.lecun_normal(), (3, 1, c))
        pad = jnp.pad(xt, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        local = pad[:, :-2] * dw[0, 0] + pad[:, 1:-1] * dw[1, 0] + pad[:, 2:] * dw[2, 0]
        local = gelu_exact(local)

        # global branch: temporal mean broadcast
        g = xt.mean(axis=1, keepdims=True)
        glob = nn.Dense(c, dtype=self.dtype, name="global_proj")(g)
        glob = jnp.broadcast_to(glob, xt.shape)

        gate_in = jnp.concatenate([local, glob], axis=-1)
        gate = jax.nn.sigmoid(nn.Dense(c, dtype=self.dtype, name="gate")(gate_in))
        out = gate * local + (1.0 - gate) * glob
        out = out.reshape(bt, h, w, c)
        return identity + self.alpha * out.astype(x.dtype)


VARIANTS = {
    "tce": TemporalContextExchange,
    "gfte": GFTE,
    "atsf": AdaptiveTemporalSemanticFusion,
}


def build_temporal_fusion(cfg: TemporalFusionConfig, dtype=jnp.float32):
    """One module per FPN level (reference sam2_base.py:854-857), or None."""
    if cfg.variant == "none":
        return None
    cls = VARIANTS[cfg.variant]
    return [
        cls(channels=cfg.channels, dtype=dtype, name=f"temporal_fusion_{i}")
        for i in range(cfg.num_levels)
    ]


class SpatioTemporalGPAttention(nn.Module):
    """Gaussian-process temporal attention (reference sam2_base.py:25-211).

    TPU recast of the fork's GP module: RBF-mixture temporal kernel over the
    frame axis, depthwise temporal diffusion, uncertainty-weighted Bayesian
    fusion, tanh-temperature residual. BatchNorm3d -> GroupNorm; spectral-norm
    output projection -> plain Dense (spectral norm is a training-time power
    iteration the stateless recast omits, noted in docs/PARITY.md).
    """

    channels: int
    num_components: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, num_frames: int, deterministic: bool = True):
        bt, h, w, c = x.shape
        if c != self.channels or num_frames <= 1:
            return x
        b, t = bt // num_frames, num_frames
        identity = x
        xt = x.reshape(b, t, h, w, c)

        # --- RBF-mixture temporal kernel attention (reference :98-123) ---
        kernels = self.param(
            "temporal_kernels",
            nn.initializers.normal(0.02),
            (self.num_components, c),
        )
        kw = self.param("kernel_weights", nn.initializers.ones, (self.num_components,))
        ls = self.param("length_scales", nn.initializers.ones, (self.num_components,))
        tg = jnp.arange(t, dtype=jnp.float32)
        time_grid = tg[:, None] - tg[None, :]  # [T, T]
        weights = jax.nn.softmax(kw)
        attended = jnp.zeros_like(xt)
        for i in range(self.num_components):
            rbf = jnp.exp(-(time_grid**2) / (2.0 * ls[i] ** 2))  # [T, T]
            rbf = rbf / jnp.clip(rbf.sum(-1, keepdims=True), 1e-6)
            mixed = jnp.einsum("st,bthwc->bshwc", rbf, xt)
            attended = attended + weights[i] * mixed * kernels[i]

        # --- depthwise temporal diffusion (reference :62-71, k=(3,1,1)) ---
        dw = self.param("diffusion_dw", nn.initializers.lecun_normal(), (3, 1, c))
        pad = jnp.pad(attended, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        diffused = pad[:, :-2] * dw[0, 0] + pad[:, 1:-1] * dw[1, 0] + pad[:, 2:] * dw[2, 0]
        gn_s = self.param("gn_scale", nn.initializers.ones, (c,))
        gn_b = self.param("gn_bias", nn.initializers.zeros, (c,))
        diffused = gelu_exact(_group_norm(diffused, gn_s, gn_b, groups=min(32, c)))

        # --- uncertainty-aware Bayesian fusion (reference :73-91) ---
        u = nn.Dense(c // 4, dtype=self.dtype, name="unc_fc1")(diffused)
        u = gelu_exact(u)
        u = nn.Dense(2, dtype=self.dtype, name="unc_fc2")(u)
        mean, variance = u[..., 0:1], u[..., 1:2]
        precision = 1.0 / (jax.nn.softplus(variance) + 1e-6)
        fused = (mean * precision + diffused) / (precision + 1.0)

        out = nn.Dense(c, use_bias=False, dtype=self.dtype, name="output_proj")(fused)
        temperature = self.param("temperature", nn.initializers.ones, ())
        out = out.reshape(bt, h, w, c)
        return identity + jnp.tanh(temperature) * out.astype(x.dtype)


VARIANTS["gp"] = SpatioTemporalGPAttention
