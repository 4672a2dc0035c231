"""Fused LayerNorm -> MLP -> residual Pallas TPU kernel.

The trunk's transformer-block tail (LN, Dense(4d), GELU, Dense(d), +residual —
reference sam2/modeling/backbones/hieradet.py:158-166) is bandwidth-bound under
XLA: the LN output, the 4d hidden, and the activation are each written to and
re-read from HBM (~6x the minimum traffic; measured ~0.6 ms/frame of the 512^2
propagation step). This kernel streams token tiles through VMEM: per tile it
reads x once, computes the f32 LN statistics, both matmuls and the activation
in VMEM, and writes only the residual-added output.

Numerics match the XLA module path within bf16 rounding (not bit-exactly): f32
LN statistics and f32 MXU accumulation like XLA, but GELU uses a clamped
polynomial erf (|err| ~1.2e-4, below bf16 resolution), f32 biases are added to
the f32 accumulator before the bf16 round (flax Dense rounds first, then adds
a bf16 bias), and the custom-VJP backward recomputes through _xla_ref rather
than the forward's exact ops — all sub-bf16-ulp drift in practice, and the
test tolerances in tests/test_fused_mlp.py reflect exactly this contract.
Used only when dtype is bf16 on TPU; every call site keeps the XLA fallback
(models/layers.py MLP) and parity is tested in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf_pallas(x):
    """erf as a clamped odd degree-17 Chebyshev polynomial (|err| <= 1.3e-4,
    far below bf16 resolution 2^-8) — Pallas TPU has no erf lowering, and the
    usual exp/divide rational approximations cost ~35 VPU ops/element, which
    the round-2 trace showed dominating the fused-MLP kernels (~86us/frame on
    the stage-1 block alone); this is ~12 FMAs."""
    c = (
        1.1281654451903445,
        -0.37472615036745416,
        0.11010893973506318,
        -0.024391530045192435,
        0.003961105574335665,
        -0.00045142591842303585,
        3.372498596183472e-05,
        -1.468167940973911e-06,
        2.8041776452684204e-08,
    )
    z = jnp.clip(x, -3.2, 3.2)  # |erf| saturates: err at the clamp is 6e-6
    z2 = z * z
    acc = jnp.full_like(z, c[-1])
    for coef in c[-2::-1]:
        acc = acc * z2 + coef
    return z * acc


def _act_f32(name: str, x, *, in_kernel: bool = False):
    if name == "gelu":
        # exact erf GELU (torch nn.GELU default — load-bearing for parity)
        erf = _erf_pallas if in_kernel else jax.lax.erf
        return x * 0.5 * (1.0 + erf(x * (2.0**-0.5)))
    if name == "relu":
        return jnp.maximum(x, 0.0)
    raise ValueError(name)


def _kernel(
    x_ref,  # [TN, D] bf16
    g_ref,  # [1, D] f32   LN scale
    b_ref,  # [1, D] f32   LN bias
    w1_ref,  # [D, F]
    b1_ref,  # [1, F] f32
    w2_ref,  # [F, D]
    b2_ref,  # [1, D] f32
    out_ref,  # [TN, D]
    *,
    eps: float,
    act: str,
    f_chunks: int = 1,
):
    x = x_ref[:]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[0, :] + b_ref[0, :]
    y = y.astype(x_ref.dtype)  # module casts LN out to compute dtype

    # f axis in chunks: peak VMEM residency drops from [TN, F] f32 to
    # [TN, F/chunks] f32 + a [TN, D] f32 accumulator, buying token tiles
    # >= 1024 at d=384/f=1536 where the monolithic form capped at 512.
    # Per-element math is identical; only the D2 contraction splits into
    # f_chunks f32 partial sums (the MXU accumulates in f32 either way, so
    # the reassociation is one f32 add per chunk boundary — sub-bf16-ulp).
    fc = w1_ref.shape[1] // f_chunks
    o = None
    for c in range(f_chunks):
        h = jax.lax.dot_general(
            y,
            w1_ref[:, c * fc : (c + 1) * fc],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        h = h + b1_ref[0, c * fc : (c + 1) * fc]
        # flax Dense rounds the f32 accumulator to the output dtype, and the
        # activation is evaluated on those rounded values (in f32 internally)
        h = _act_f32(
            act, h.astype(x_ref.dtype).astype(jnp.float32), in_kernel=True
        ).astype(x_ref.dtype)
        oc = jax.lax.dot_general(
            h,
            w2_ref[c * fc : (c + 1) * fc, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o = oc if o is None else o + oc
    o = o + b2_ref[0, :]
    out_ref[:] = x + o.astype(x_ref.dtype)


def _run(
    x, gamma, beta, w1, b1, w2, b2, *, eps, act, block_n, f_chunks=1, interpret=False
):
    n, d = x.shape
    f = w1.shape[1]
    pad = (-n) % block_n
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    np_ = xp.shape[0]
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, act=act, f_chunks=f_chunks),
        grid=(np_ // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * np_ * d * f,
            bytes_accessed=(2 * x.size + 2 * d * f) * x.dtype.itemsize,
            transcendentals=np_ * f,
        ),
        interpret=interpret,
    )(
        xp,
        gamma.reshape(1, d).astype(jnp.float32),
        beta.reshape(1, d).astype(jnp.float32),
        w1.astype(x.dtype),
        b1.reshape(1, f).astype(jnp.float32),
        w2.astype(x.dtype),
        b2.reshape(1, d).astype(jnp.float32),
    )
    return out[:n] if pad else out


def pick_block_n(n: int, d: int, f: int) -> tuple[int, int]:
    """(token tile, f chunks): the largest tile fitting scoped VMEM (hidden
    f32 tile + bf16 weights + in/out tiles), splitting the hidden f axis when
    that buys a bigger tile. Measured on v5e: bn=1024-2048 is 30-40% faster
    than 256 at the trunk shapes (round-2); at the ViT-S d=384/f=1536 shape
    (round-4, in-model) bn=1024/ch=2 runs 1.17 ms/block vs 1.23 at (1024,1),
    1.22 at (512,1) and 1.30 at (1024,4) — wide tile first, minimal split
    second — and (2048,4) OOMs scoped VMEM at 16.02M/16M."""
    import os

    ov = os.environ.get("US_MEDSAM2_MLP_TILE")  # A/B tuning override "bn,ch"
    if ov:
        bn, ch = (int(v) for v in ov.split(","))
        return bn, ch
    # Measured winners first: the VMEM model below is deliberately
    # conservative (Mosaic double-buffers the token tiles whenever the grid
    # has >1 program, and both f chunks can be live at once — (2048,2) at
    # d=192/f=768 OOMs scoped VMEM at 16.22M even though the naive model says
    # it fits), so shapes we have profiled in-model are pinned here.
    measured = {(384, 1536): (1024, 2)}
    if (d, f) in measured and measured[(d, f)][0] <= max(n, 256):
        return measured[(d, f)]
    budget = 8 * 2**20 - 2 * d * f * 2
    for bn in (2048, 1024, 512, 256):
        if bn <= max(n, 256) and bn * (f * 4 + d * 8) <= budget:
            return bn, 1
    return 256, 1


def ln_mlp_residual_available(n: int, d: int, f: int, dtype) -> bool:
    """TPU, bf16, lane-aligned dims, weights + hidden tile fitting VMEM."""
    import os

    if os.environ.get("US_MEDSAM2_DISABLE_FUSED_MLP"):  # A/B escape hatch
        return False
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False
    weight_bytes = 2 * d * f * 2
    return (
        on_tpu
        and dtype == jnp.bfloat16
        and f % 128 == 0
        and n >= 256
        and weight_bytes <= 6 * 2**20
    )


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10)
)
def ln_mlp_residual(x, gamma, beta, w1, b1, w2, b2, eps, act, block_n, f_chunks=1):
    """out = x + Dense2(act(Dense1(LN(x)))) over [N, D] tokens (forward: Pallas;
    backward: XLA recompute of the same math)."""
    return _run(
        x, gamma, beta, w1, b1, w2, b2,
        eps=eps, act=act, block_n=block_n, f_chunks=f_chunks,
    )


def _xla_ref(x, gamma, beta, w1, b1, w2, b2, eps, act):
    """Same math in XLA (used for the VJP and as the numerical reference)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = (y * gamma + beta).astype(x.dtype)
    h = jnp.dot(y, w1.astype(x.dtype), preferred_element_type=jnp.float32)
    h = (h + b1).astype(x.dtype)
    hf = h.astype(jnp.float32)
    h = _act_f32(act, hf).astype(x.dtype)
    o = jnp.dot(h, w2.astype(x.dtype), preferred_element_type=jnp.float32)
    o = (o + b2).astype(x.dtype)
    return x + o


def _fwd(x, gamma, beta, w1, b1, w2, b2, eps, act, block_n, f_chunks=1):
    out = _run(
        x, gamma, beta, w1, b1, w2, b2,
        eps=eps, act=act, block_n=block_n, f_chunks=f_chunks,
    )
    return out, (x, gamma, beta, w1, b1, w2, b2)


def _bwd(eps, act, block_n, f_chunks, res, g):
    x, gamma, beta, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: _xla_ref(*a, eps=eps, act=act), x, gamma, beta, w1, b1, w2, b2
    )
    return vjp(g)


ln_mlp_residual.defvjp(_fwd, _bwd)
