"""Analytic MXU FLOP counting by walking jaxprs.

XLA's own `compiled.cost_analysis()` counts a `lax.scan`/`while` body ONCE
regardless of trip count, so for the propagation loop (one scan over frames,
inference/video_predictor.py) it reports ~1 frame's FLOPs for a 64-frame
program. This walker multiplies scan bodies by their static `length`, giving
the true analytic matmul+conv FLOPs of the whole program — the numerator of
MFU. Only dot_general / conv_general_dilated are counted (elementwise work is
not MXU work and is the usual convention for model FLOPs / MFU).

Pallas kernels hide their dots inside `pallas_call`; count with the XLA
fallback paths enabled instead (`flops_env()` sets the kernels' disable gates
plus US_MEDSAM2_DISABLE_HEAD_PAD so lane-padding columns — mathematically
zero — don't inflate the count). The fallbacks compute the identical math
with plain dots, so the count is the model's true FLOP floor.

The reference has no FLOPs accounting at all (its benchmark reports wall FPS
only, efficient_track_anything/benchmark.py:86-106).
"""

from __future__ import annotations

import contextlib
import functools
import math
import os

import jax
from jax.extend import core as jcore

# values counted per output element
_DOT_PRIMS = {"dot_general"}
_CONV_PRIMS = {"conv_general_dilated"}

# env gates that reroute Pallas kernels to their pure-XLA fallbacks and drop
# mathematically-zero lane padding, so the jaxpr contains every real dot
_FLOPS_ENV = {
    "US_MEDSAM2_DISABLE_FUSED_WINDOW_ATTN": "1",
    "US_MEDSAM2_DISABLE_FUSED_MLP": "1",
    "US_MEDSAM2_DISABLE_FLASH_DROPOUT": "1",
    "US_MEDSAM2_DISABLE_HEAD_PAD": "1",
}


@contextlib.contextmanager
def flops_env():
    """Trace-time env that replaces Pallas kernels with XLA-math equivalents."""
    saved = {k: os.environ.get(k) for k in _FLOPS_ENV}
    os.environ.update(_FLOPS_ENV)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def _prod(xs) -> int:
    return math.prod(int(x) for x in xs)


def _eqn_flops(eqn) -> float:
    name = eqn.primitive.name
    if name in _DOT_PRIMS:
        (lhs_c, _), _ = eqn.params["dimension_numbers"]
        lhs_shape = eqn.invars[0].aval.shape
        contract = _prod(lhs_shape[d] for d in lhs_c)
        return 2.0 * _prod(eqn.outvars[0].aval.shape) * contract
    if name in _CONV_PRIMS:
        dn = eqn.params["dimension_numbers"]
        rhs_shape = eqn.invars[1].aval.shape
        # rhs_spec = (out_feature, in_feature, *spatial) position indices
        in_c = rhs_shape[dn.rhs_spec[1]]  # already per-group (rhs carries C_in/G)
        k_spatial = _prod(rhs_shape[d] for d in dn.rhs_spec[2:])
        return 2.0 * _prod(eqn.outvars[0].aval.shape) * in_c * k_spatial
    return 0.0


def _sub_jaxprs(eqn):
    """(multiplier, jaxpr) pairs for an eqn's inner jaxprs.

    scan bodies are multiplied by their static trip count; cond/switch
    branches contribute their MAX (the propagation path is the expensive
    branch); everything else (pjit, remat, custom_vjp, while bodies — trip
    count unknowable, counted once) is summed."""
    name = eqn.primitive.name
    params = eqn.params
    if name == "scan":
        return [(int(params["length"]), params["jaxpr"])]
    if name == "cond":
        branches = params["branches"]
        counts = [jaxpr_flops(b) for b in branches]
        # encode the max via a 0/1 multiplier list
        best = max(range(len(counts)), key=lambda i: counts[i])
        return [(1, branches[best])]
    out = []
    for v in params.values():
        if isinstance(v, (jcore.ClosedJaxpr, jcore.Jaxpr)):
            out.append((1, v))
        elif isinstance(v, (tuple, list)):
            out.extend(
                (1, x) for x in v if isinstance(x, (jcore.ClosedJaxpr, jcore.Jaxpr))
            )
    return out


def jaxpr_flops(jaxpr) -> float:
    """Total dot+conv FLOPs of a (Closed)Jaxpr, scan bodies × trip count."""
    if isinstance(jaxpr, jcore.ClosedJaxpr):
        jaxpr = jaxpr.jaxpr
    total = 0.0
    for eqn in jaxpr.eqns:
        total += _eqn_flops(eqn)
        for mult, sub in _sub_jaxprs(eqn):
            total += mult * jaxpr_flops(sub)
    return total


def fn_flops(fn, *args, **kwargs) -> float:
    """Analytic dot+conv FLOPs of `fn(*args, **kwargs)` (no compile, no run).

    Traces under `flops_env()` so Pallas-kernel call sites contribute their
    XLA-fallback dots. `fn` may be jitted or plain; **kwargs are bound as
    STATIC (make_jaxpr would otherwise trace them even when the jit declares
    them static_argnames)."""
    if kwargs:
        fn = functools.partial(fn, **kwargs)
    with flops_env():
        closed = jax.make_jaxpr(fn)(*args)
    return jaxpr_flops(closed)
