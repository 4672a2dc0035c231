"""Parse jax.profiler trace-viewer dumps into device self-time tallies.

The reference ships no profiling tooling (timing meters only,
efficient_track_anything/benchmark.py); on TPU the stable perf metric is XLA
op device self-time from an xprof trace — wall clock through the remote-TPU
tunnel swings with per-dispatch RTT (±40% observed), device self-time does
not. Used by bench.py (headline device_ms_per_frame / MFU) and
tools/profile_propagation.py (per-module breakdowns).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re


def _module_of(tf_op: str) -> str:
    tf = re.sub(r"^jit\([^)]*\)/", "", tf_op)
    tf = re.sub(r"(while|body|closed_call|cond|branch_\d+_fun)/", "", tf)
    parts = tf.split("/")
    keep = parts[: min(4, len(parts))]
    return "/".join(keep[:-1]) if len(keep) > 1 else tf


def parse_trace(trace_dir: str):
    """Self-time tallies from the newest trace.json.gz under `trace_dir`.

    Returns (self_op, self_mod, self_cat, args_of): Counters of device
    self-time in MICROSECONDS keyed by op name / model module / HLO category,
    plus each op's trace args. Self-time = exclusive time on the device's
    "XLA Ops" track (children subtracted), so the values sum to total device
    busy time regardless of op nesting.
    """
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    )
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    all_evs = data.get("traceEvents", [])
    dev_pid = None
    for e in all_evs:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            if "TPU" in e["args"]["name"] or "device:" in e["args"]["name"]:
                dev_pid = e["pid"]
    ops_tid = None
    for e in all_evs:
        if (
            e.get("ph") == "M"
            and e.get("name") == "thread_name"
            and e.get("pid") == dev_pid
            and e["args"]["name"] == "XLA Ops"
        ):
            ops_tid = e["tid"]
    evs = [
        e
        for e in all_evs
        if e.get("ph") == "X" and e.get("pid") == dev_pid and e.get("tid") == ops_tid
    ]
    evs.sort(key=lambda e: (e["ts"], -e["dur"]))

    stack: list = []  # (end_ts, name, module, category)
    self_op: collections.Counter = collections.Counter()
    self_mod: collections.Counter = collections.Counter()
    self_cat: collections.Counter = collections.Counter()
    args_of: dict = {}
    for e in evs:
        while stack and stack[-1][0] <= e["ts"] + 1e-9:
            stack.pop()
        if stack:
            _, pn, pm, pc = stack[-1]
            self_op[pn] -= e["dur"]
            self_mod[pm] -= e["dur"]
            self_cat[pc] -= e["dur"]
        a = e.get("args") or {}
        mod = _module_of(a.get("tf_op", "?"))
        cat = a.get("hlo_category", "?")
        self_op[e["name"]] += e["dur"]
        self_mod[mod] += e["dur"]
        self_cat[cat] += e["dur"]
        args_of.setdefault(e["name"], a)
        stack.append((e["ts"] + e["dur"], e["name"], mod, cat))
    return self_op, self_mod, self_cat, args_of


def device_self_time_ms(trace_dir: str) -> float:
    """Total device busy time (ms) across the newest trace under trace_dir."""
    self_op, _, _, _ = parse_trace(trace_dir)
    return sum(self_op.values()) / 1e3


# bf16 MXU peak per chip, dense FLOP/s (vendor specs; used for MFU only).
_PEAK_BF16_FLOPS = {
    "TPU v2": 45e12,
    "TPU v3": 123e12,
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5": 459e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}


def peak_bf16_flops(device_kind: str) -> float | None:
    """Dense bf16 peak FLOP/s for a jax device_kind string, or None."""
    for key, peak in sorted(_PEAK_BF16_FLOPS.items(), key=lambda kv: -len(kv[0])):
        if key.lower() in device_kind.lower():
            return peak
    return None
