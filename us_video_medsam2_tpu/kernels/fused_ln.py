"""One-pass Pallas LayerNorm for large token maps.

XLA lowers the f32-statistics LayerNorm over a big bf16 tensor as separate
reduce and normalize fusions that read the input from HBM two-to-three times
(round-4 hiera-t512 trace: the twelve trunk norm1 sites cost ~5.8 ms/64f
against a ~1.9 ms two-pass bandwidth floor). This kernel tiles the rows and
keeps each tile resident in VMEM: ONE bf16 read, in-register f32 statistics,
ONE bf16 write — the true one-read floor.

Math is identical to models/layers.py::LayerNorm (fast-variance form, f32
stats, f32 scale/bias, downcast once): same op sequence in f32, so results
match the XLA path to roundoff. Backward is XLA recompute via custom_vjp —
the trunk is remat'd in training, so only the forward is hot (same pattern as
kernels/fused_window_attention.py).

The torch reference applies plain nn.LayerNorm inside Hiera blocks
(sam2/modeling/backbones/hieradet.py:98-136); this kernel changes only the
lowering, not the math.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(x_ref, w_ref, b_ref, o_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)  # [bn, d]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    meansq = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    var = jnp.maximum(meansq - jnp.square(mean), 0.0)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    o_ref[...] = (y * w_ref[...] + b_ref[...]).astype(o_ref.dtype)


def _pick_bn(rows: int) -> int:
    """Largest power-of-two row tile <= 4096 dividing rows (token maps here
    are powers of two: 256 .. 16384 rows per frame)."""
    bn = 4096
    while bn > 8 and rows % bn:
        bn //= 2
    return bn if rows % bn == 0 else 0


def _run(x2, scale, bias, eps, interpret=False):
    rows, d = x2.shape
    bn = _pick_bn(rows)
    kern = functools.partial(_ln_kernel, eps=eps)
    return pl.pallas_call(
        kern,
        grid=(rows // bn,),
        in_specs=[
            pl.BlockSpec((bn, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, d), x2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * rows * d,
            bytes_accessed=2 * rows * d * x2.dtype.itemsize,
            transcendentals=rows,  # rsqrt
        ),
        interpret=interpret,
    )(x2, scale.reshape(1, d).astype(jnp.float32), bias.reshape(1, d).astype(jnp.float32))


def _xla_ref(x, scale, bias, eps, out_dtype):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    meansq = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    var = jnp.maximum(meansq - jnp.square(mean), 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layer_norm_pallas(x, scale, bias, eps):
    """LayerNorm over the last axis of x [..., d] (forward: Pallas one-pass;
    backward: XLA recompute). scale/bias are the f32 [d] params."""
    shp = x.shape
    out = _run(x.reshape(-1, shp[-1]), scale, bias, eps)
    return out.reshape(shp)


def _fwd(x, scale, bias, eps):
    return layer_norm_pallas(x, scale, bias, eps), (x, scale, bias)


def _bwd(eps, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda a, w, b: _xla_ref(a, w, b, eps, x.dtype), x, scale, bias)
    return vjp(g)


layer_norm_pallas.defvjp(_fwd, _bwd)


def layer_norm_pallas_available(shape, dtype) -> bool:
    """TPU backend, bf16 activations, enough rows to tile (>= 1024 — tiny
    maps stay on the XLA path, whose fusion with neighbors wins there), and
    a power-of-two row count so one tile size covers the grid."""
    if os.environ.get("US_MEDSAM2_DISABLE_PALLAS_LN"):
        return False
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False
    import math

    rows = math.prod(shape[:-1])
    d = shape[-1]
    bn = _pick_bn(rows) if rows >= 1024 else 0
    return (
        on_tpu
        and dtype == jnp.bfloat16
        and bn >= 256
        and bn * d * (2 * 2 + 4) + (1 << 19) <= 8 * 2**20  # in/out bf16 + f32 tile
    )
