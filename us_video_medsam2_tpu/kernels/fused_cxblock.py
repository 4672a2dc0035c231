"""Fused ConvNeXt (CXBlock) Pallas TPU kernel for the memory-encoder fuser.

One pass per image over the whole block (reference sam2/modeling/
memory_encoder.py:62-117): depthwise 7x7 conv + LayerNorm + pwconv1 + exact
GELU + pwconv2 + layer-scale + residual, entirely in VMEM.

Why: the round-5 propagation trace (hiera t512, 64f) shows the XLA lowering of
this chain costs ~36 us/frame/block at [1, 32, 32, 256] against a ~10 us
compute floor — the dwconv-laden LayerNorm convert_reduce fusions (17 us) and
the pwconv2+GELU loop fusion (18 us) round-trip every layer boundary through
HBM. Here the dwconv accumulates ONCE as a 49-slice sum expression Mosaic
tiles in registers, LN statistics are one VMEM pass, and the two MXU dots
([HW, C] x [C, 4C] and back) run at full 128-lane occupancy with the hidden
tensor never leaving VMEM. HBM traffic drops to the floor: read x + weights,
write y. Measured in-module: memory encoder 13.2 -> 10.8 ms/64f.

STATUS — OPT-IN, rejected as the default (see fused_cxblock_available): the
in-module win is real but the opaque custom-call flips XLA's fusion decisions
NONLOCALLY (memory-attention LayerNorms 0.89 -> 9.8 ms/64f), a net +10.8 ms.
Unlike the round-3/4 partial fusions that lost by displacing the fusions
AROUND them (models/memory.py note), the whole-block kernel displaces nothing
locally — the regression is a global compiler-heuristic interaction,
reproduced twice on v5e.

Numerics mirror the XLA module path boundary-for-boundary (all dots f32
accumulation rounded to bf16 at layer outputs, fast-variance f32 LayerNorm,
degree-17 polynomial erf |err| <= 1.3e-4 — below bf16 resolution 2^-8):
verified against the module path and the reference golden fixture in
tests/test_kernels.py. Backward = XLA recompute via custom_vjp (the memory
encoder is remat'd in training; only the forward is hot).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from us_video_medsam2_tpu.kernels.fused_mlp import _erf_pallas


def _kernel(
    x_ref,      # [1, H, W, C] bf16
    dw_w_ref,   # [kh*kw, C] f32 (depthwise taps, flattened)
    dw_b_ref,   # [1, C] f32
    ln_s_ref,   # [1, C] f32
    ln_b_ref,   # [1, C] f32
    w1_ref,     # [C, F] bf16
    b1_ref,     # [1, F] bf16
    w2_ref,     # [F, C] bf16
    b2_ref,     # [1, C] bf16
    gamma_ref,  # [1, C] bf16
    out_ref,    # [1, H, W, C] bf16
    *,
    kh: int,
    kw: int,
    pad: int,
    eps: float,
):
    _, h, w, c = x_ref.shape
    x = x_ref[0]  # [H, W, C]
    # ---- depthwise conv as one 49-slice sum expression (zero padding via a
    # padded VMEM buffer; Mosaic tiles the whole sum so the accumulator stays
    # in registers — a sequential read-modify-write loop would round-trip the
    # f32 accumulator through VMEM 49 times)
    xp = jnp.pad(x, ((pad, pad), (pad, pad), (0, 0)))
    dw = sum(
        xp[ki : ki + h, kj : kj + w, :].astype(jnp.float32)
        * dw_w_ref[ki * kw + kj, :]
        for ki in range(kh)
        for kj in range(kw)
    )
    dw = (dw + dw_b_ref[0]).astype(x.dtype)  # depthwise_conv_shifted epilogue
    # ---- fast-variance f32 LayerNorm (models/layers.py::LayerNorm)
    t = dw.reshape(h * w, c).astype(jnp.float32)
    mean = jnp.mean(t, axis=-1, keepdims=True)
    meansq = jnp.mean(jnp.square(t), axis=-1, keepdims=True)
    var = jnp.maximum(meansq - jnp.square(mean), 0.0)
    y = (t - mean) * jax.lax.rsqrt(var + eps)
    y = (y * ln_s_ref[0] + ln_b_ref[0]).astype(x.dtype)  # [HW, C] bf16
    # ---- pwconv1 (+ exact-erf GELU) — Dense-in-bf16 semantics: f32-accum dot
    # rounded to bf16, bias added in bf16
    hdn = jax.lax.dot_general(
        y, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + b1_ref[0]
    hf = hdn.astype(jnp.float32)
    hdn = (hf * 0.5 * (1.0 + _erf_pallas(hf * (2.0**-0.5)))).astype(x.dtype)
    # ---- pwconv2 + layer scale + residual
    o = jax.lax.dot_general(
        hdn, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + b2_ref[0]
    o = x.reshape(h * w, c) + gamma_ref[0] * o
    out_ref[0] = o.reshape(h, w, c)


def fused_cxblock_available(shape, dtype) -> bool:
    """TPU, bf16, lane-aligned channels, and the block (x + padded copy + f32
    hidden [HW, 4C]) fitting scoped VMEM. The shipped geometry is
    [B, 32, 32, 256] (hidden [1024, 1024] f32 = 4 MB).

    OPT-IN (US_MEDSAM2_ENABLE_FUSED_CXBLOCK=1), A/B-TESTED AND REJECTED as the
    default on v5e: the kernel itself wins its module (memory encoder
    13.2 -> 10.8 ms/64f in the round-5 hiera trace) but the opaque custom-call
    flips XLA's fusion decisions NONLOCALLY — the 12 memory-attention
    LayerNorms went from near-free residual-chain fusions (0.89 ms/64f total)
    to producer-recompute convert_reduce fusions (9.8 ms/64f), a net +10.8 ms
    regression reproduced twice (docs/ROADMAP.md round-5 log). The XLA path
    below + an optimization_barrier after the dwconv captures most of the
    kernel's win without perturbing the rest of the program."""
    if not os.environ.get("US_MEDSAM2_ENABLE_FUSED_CXBLOCK"):
        return False
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False
    _, h, w, c = shape
    f = 4 * c
    vmem = (
        2 * h * w * c * 2              # x + dw result
        + (h + 6) * (w + 6) * c * 4    # padded f32 tap expression headroom
        + h * w * f * (2 + 4)          # hidden bf16 + f32 accum
        + c * f * 2 * 2                # the two pw weights
        + (1 << 20)
    )
    return (
        on_tpu
        and dtype == jnp.bfloat16
        and c % 128 == 0
        and h * w % 8 == 0
        and vmem <= 14 * 2**20
    )


def _run(x, dw_w, dw_b, ln_s, ln_b, w1, b1, w2, b2, gamma, *, eps, interpret=False):
    b, h, w, c = x.shape
    kh, kw = dw_w.shape[0], dw_w.shape[1]
    f = w1.shape[-1]
    kern = functools.partial(_kernel, kh=kh, kw=kw, pad=kh // 2, eps=eps)
    row = lambda bi: (bi, 0, 0, 0)  # noqa: E731
    fixed = lambda bi: (0, 0)  # noqa: E731
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((kh * kw, c), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, f), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((f, c), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), fixed, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c * kh * kw + 4 * b * h * w * c * f,
            bytes_accessed=2 * b * h * w * c * 2 + 2 * c * f * 2,
            transcendentals=b * h * w * f,
        ),
        interpret=interpret,
    )(
        x,
        dw_w.reshape(kh * kw, c).astype(jnp.float32),
        dw_b.reshape(1, c).astype(jnp.float32),
        ln_s.reshape(1, c).astype(jnp.float32),
        ln_b.reshape(1, c).astype(jnp.float32),
        w1.astype(x.dtype),
        b1.reshape(1, f).astype(x.dtype),
        w2.astype(x.dtype),
        b2.reshape(1, c).astype(x.dtype),
        gamma.reshape(1, c).astype(x.dtype),
    )


def _xla_ref(x, dw_w, dw_b, ln_s, ln_b, w1, b1, w2, b2, gamma, eps):
    """The module-path composition (models/memory.py::CXBlock lowerings) — the
    numerical reference and the custom_vjp backward."""
    from us_video_medsam2_tpu.ops.conv_matmul import depthwise_conv_shifted

    dtype = x.dtype
    kh = dw_w.shape[0]
    dw = depthwise_conv_shifted(x, dw_w, dw_b, kh // 2, dtype=dtype)
    # (an optimization_barrier here to stop the dwconv chain fusing into the
    # LN reduces was A/B-tested: 13.02 vs 12.95 ms/64f — the chain is fused
    # into the reduce fusions but NOT recomputed per consumer; barrier-free
    # is marginally better, docs/ROADMAP.md round-5 log)
    xf = dw.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    meansq = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    var = jnp.maximum(meansq - jnp.square(mean), 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = (y * ln_s + ln_b).astype(dtype)
    hdn = (
        jax.lax.dot_general(
            y, w1.astype(dtype), (((y.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        + b1.astype(dtype)
    )
    hdn = jax.nn.gelu(hdn, approximate=False)
    o = (
        jax.lax.dot_general(
            hdn, w2.astype(dtype), (((hdn.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        + b2.astype(dtype)
    )
    return x + gamma.astype(dtype) * o


@functools.partial(jax.custom_vjp, nondiff_argnums=(10,))
def fused_cxblock(x, dw_w, dw_b, ln_s, ln_b, w1, b1, w2, b2, gamma, eps=1e-6):
    """[B, H, W, C] bf16 -> [B, H, W, C]: the whole ConvNeXt block in one
    Pallas pass (forward: Pallas; backward: XLA recompute)."""
    return _run(x, dw_w, dw_b, ln_s, ln_b, w1, b1, w2, b2, gamma, eps=eps)


def _fwd(x, dw_w, dw_b, ln_s, ln_b, w1, b1, w2, b2, gamma, eps):
    args = (x, dw_w, dw_b, ln_s, ln_b, w1, b1, w2, b2, gamma)
    return _run(*args, eps=eps), args


def _bwd(eps, res, grad):
    _, vjp = jax.vjp(lambda *a: _xla_ref(*a, eps), *res)
    return vjp(grad)


fused_cxblock.defvjp(_fwd, _bwd)
