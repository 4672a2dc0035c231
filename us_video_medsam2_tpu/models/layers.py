"""Shared neural building blocks (flax.linen, NHWC / batch-first).

Numerics notes vs the torch reference:
- GELU is the exact erf form (torch nn.GELU default); flax's tanh approximation is
  explicitly disabled.
- LayerNorm epsilon is site-specific in the reference: 1e-6 inside Hiera blocks and
  LayerNorm2d, torch-default 1e-5 everywhere else — so `eps` is always explicit here.
- torch LayerNorm2d (reference sam2/modeling/sam2_utils.py:141-153) normalizes the
  channel axis of NCHW; in NHWC that is a plain last-axis LayerNorm.
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


ACTIVATIONS: dict[str, Callable] = {
    "relu": jax.nn.relu,
    "gelu": gelu_exact,
}


class MLP(nn.Module):
    """Stacked Dense with activation between layers (reference sam2_utils.py:112-136)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    activation: Callable = jax.nn.relu
    sigmoid_output: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = self.activation(x)
        if self.sigmoid_output:
            x = jax.nn.sigmoid(x)
        return x


class LayerNorm(nn.Module):
    """LayerNorm over the last axis with explicit eps, f32 statistics.

    pallas_ok opts a site into the one-pass Pallas lowering
    (kernels/fused_ln.py — one HBM read instead of XLA's two-to-three) for
    large bf16 token maps. Opt-in per site, NOT automatic: at sites whose
    input/output fuse with neighboring elementwise work (e.g. the
    memory-attention residual chain), displacing XLA's fusion is a net loss
    (round-3 fused LN+MLP A/B)."""

    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    pallas_ok: bool = False

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        if self.pallas_ok and not self.is_initializing():
            from us_video_medsam2_tpu.kernels.fused_ln import (
                layer_norm_pallas,
                layer_norm_pallas_available,
            )

            if layer_norm_pallas_available(x.shape, x.dtype):
                return layer_norm_pallas(x, scale, bias, self.eps).astype(
                    self.dtype
                )
        xf = x.astype(jnp.float32)
        # fast-variance form: mean and E[x²] come from ONE pass over x (XLA
        # fuses the two independent reduces into a single loop fusion; the
        # two-pass form var = E[(x-μ)²] needs a second dependent pass — it
        # showed up as ~2 extra kernels per LN site in the round-3 trace).
        # f32 activations are O(1-10) here, so cancellation error is ~1e-7
        # relative — far inside the checkpoint-parity tolerances.
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        meansq = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        var = jnp.maximum(meansq - jnp.square(mean), 0.0)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(self.dtype)


class DropPath(nn.Module):
    """Per-sample stochastic depth (reference sam2_utils.py:92-107)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class _S2DConv(nn.Module):
    """Strided conv as space-to-depth + one MXU matmul (ops/conv_matmul.py).
    Param names/shapes identical to nn.Conv so checkpoints are unaffected."""

    features: int
    kernel_size: tuple[int, int]
    stride: int
    padding: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from us_video_medsam2_tpu.ops.conv_matmul import s2d_conv

        kh, kw = self.kernel_size
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features),
            jnp.float32,
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        return s2d_conv(x, w, b, self.stride, self.padding, dtype=self.dtype)


class _DepthwiseConv(nn.Module):
    """Same-padding stride-1 depthwise conv as shifted multiply-accumulates
    (ops/conv_matmul.py::depthwise_conv_shifted). Param names/shapes identical
    to nn.Conv(feature_group_count=C)."""

    features: int
    kernel_size: tuple[int, int]
    padding: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from us_video_medsam2_tpu.ops.conv_matmul import depthwise_conv_shifted

        kh, kw = self.kernel_size
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, 1, self.features),
            jnp.float32,
        )
        b = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        return depthwise_conv_shifted(x, w, b, self.padding, dtype=self.dtype)


class Conv2d(nn.Module):
    """NHWC conv with torch-compatible explicit padding.

    Strided small-kernel convs (k <= 2s, pad = k//2) lower to a space-to-depth
    matmul instead of XLA's conv — the memory encoder's tiny-channel mask
    pyramid is ~20x faster that way on TPU (see ops/conv_matmul.py)."""

    features: int
    kernel_size: int | tuple[int, int]
    stride: int = 1
    padding: int = 0
    groups: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from us_video_medsam2_tpu.ops.conv_matmul import s2d_conv_applicable

        ks = (
            self.kernel_size
            if isinstance(self.kernel_size, tuple)
            else (self.kernel_size, self.kernel_size)
        )
        if s2d_conv_applicable(
            ks[0], ks[1], self.stride, self.padding,
            x.shape[1], x.shape[2], self.groups,
        ):
            return _S2DConv(
                self.features, ks, self.stride, self.padding,
                use_bias=self.use_bias, dtype=self.dtype, name="conv",
            )(x)
        if (
            self.groups == x.shape[-1] == self.features
            and self.stride == 1
            and self.padding == ks[0] // 2 == ks[1] // 2
        ):
            return _DepthwiseConv(
                self.features, ks, self.padding,
                use_bias=self.use_bias, dtype=self.dtype, name="conv",
            )(x)
        return nn.Conv(
            self.features,
            ks,
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)


class ConvTranspose2x(nn.Module):
    """2x2-stride-2 transposed conv as Dense + depth-to-space.

    Mathematically identical to torch ConvTranspose2d(k=2, s=2) — each input pixel
    independently produces a 2x2 output block — but lowers to a single MXU matmul
    instead of a strided transposed convolution. Used by the mask-decoder upscaler
    (reference sam/mask_decoder.py:65-75).
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        # weight laid out [in, 2, 2, out] so the import from torch [in,out,2,2] is a pure transpose
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (c, 2, 2, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = jnp.einsum(
            "bhwc,cuvf->bhuwvf",
            x.astype(self.dtype),
            kernel.astype(self.dtype),
        )
        y = y.reshape(b, h * 2, w * 2, self.features) + bias.astype(self.dtype)
        return y


def patchify_conv(x, kernel, bias, stride: int, padding: int, dtype=jnp.float32):
    """Conv2d expressed for importers; kernel [kh, kw, in, out]."""
    y = jax.lax.conv_general_dilated(
        x.astype(dtype),
        kernel.astype(dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(dtype)
