"""Profiling/tracing hooks (SURVEY §5: the reference has only timing meters;
here we expose jax.profiler traces + per-step timing as first-class)."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an xprof/perfetto trace of the enclosed block.

    View with tensorboard (`tensorboard --logdir <log_dir>`) or xprof.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def step_timer(name: str = "step", sync=None):
    """Wall-clock a block, blocking on `sync` (a pytree) before stopping."""
    t0 = time.perf_counter()
    box = {}
    try:
        yield box
    finally:
        if sync is not None:
            jax.block_until_ready(sync)
        box["seconds"] = time.perf_counter() - t0
        box["name"] = name


def device_memory_summary() -> dict:
    """Peak/current HBM usage of device 0 (MemMeter backend)."""
    try:
        stats = jax.devices()[0].memory_stats() or {}
        return {
            "bytes_in_use": stats.get("bytes_in_use", 0),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
            "bytes_limit": stats.get("bytes_limit", 0),
        }
    except Exception:  # noqa: BLE001
        return {}
