"""Batched-serving throughput on the real TPU (inference/serve.py).

Measures aggregate tracked frames/s for N independent single-prompt videos
propagated concurrently through `batched_propagate` — the production serving
shape the reference has no counterpart for (its predictor is stateful per
video, sam2_video_predictor.py). Videos are device-resident before timing
(re-uploading ~200 MB per call dominates on remote-tunnel setups).

Usage: python tools/bench_serve.py [--cfg sam2.1_hiera_t512] [--videos 4]
       [--frames 16] [--runs 3] [--trace /tmp/serve_trace]

With --trace, one timed call is captured under jax.profiler and the xprof
device self-time breakdown (per HLO category / module) is printed via
utils/traceparse.py — the per-batch device numbers behind the batched-serving
saturation analysis in docs/ROADMAP.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="sam2.1_hiera_t512")
    ap.add_argument("--videos", type=int, default=4)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--trace", default=None, help="xprof trace output dir")
    ap.add_argument(
        "--json", action="store_true",
        help="emit one machine-readable JSON line (the SERVE_BENCH_r{N} artifact)",
    )
    args = ap.parse_args(argv)

    from bench import load_real_video
    from us_video_medsam2_tpu.core.build import resolve_config
    from us_video_medsam2_tpu.inference.serve import batched_propagate
    from us_video_medsam2_tpu.inference.video_predictor import SAM2VideoPredictor
    from us_video_medsam2_tpu.models.sam2 import SAM2Model

    cfg = resolve_config(args.cfg)
    model = SAM2Model(cfg, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    )
    predictor = SAM2VideoPredictor(model, params, fill_hole_area=8)

    video, click = load_real_video(args.frames, cfg.image_size)
    if video is None:
        rng = np.random.default_rng(0)
        video = rng.standard_normal(
            (args.frames, cfg.image_size, cfg.image_size, 3)
        ).astype(np.float32)
        click = np.array([[256.0, 256.0]], np.float32)
    n = args.videos
    videos = jax.device_put(jnp.broadcast_to(jnp.asarray(video), (n, *video.shape)))
    coords = jnp.broadcast_to(jnp.asarray(click, jnp.float32)[None], (n, 1, 2))
    labels = jnp.ones((n, 1), jnp.int32)

    out = batched_propagate(predictor, videos, coords, labels)  # compile
    np.asarray(out[-1, -1, :2, :2])  # host fetch = true completion
    times = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        out = batched_propagate(predictor, videos, coords, labels)
        np.asarray(out[-1, -1, :2, :2])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    agg_fps = n * args.frames / dt
    print(
        f"serve {args.cfg}: {n} videos x {args.frames} frames @{cfg.image_size}² "
        f"in {dt * 1e3:.1f} ms/call = {agg_fps:.1f} aggregate frames/s/chip"
    )
    device_us_per_frame = None
    if args.trace:
        jax.profiler.start_trace(args.trace)
        out = batched_propagate(predictor, videos, coords, labels)
        np.asarray(out[-1, -1, :2, :2])
        jax.profiler.stop_trace()
        from us_video_medsam2_tpu.utils.traceparse import parse_trace

        self_op, self_mod, self_cat, _ = parse_trace(args.trace)
        total = sum(self_op.values())
        nt = n * args.frames
        device_us_per_frame = total / nt
        print(
            f"device self time: {total/1e3:.2f} ms/call "
            f"({total/nt:.1f} us/frame, {nt/(total/1e6):.1f} device-bound agg FPS)"
        )
        print("-- by HLO category --")
        for c, d in self_cat.most_common(12):
            print(f"{d/1e3:9.2f} ms {100*d/total:5.1f}%  {c}")
        print("-- by module --")
        for m, d in self_mod.most_common(15):
            print(f"{d/1e3:9.2f} ms {100*d/total:5.1f}%  {m[:110]}")
    if args.json:
        import json

        rec = {
            "metric": f"serve_aggregate_fps_{args.cfg}",
            "value": round(agg_fps, 1),
            "unit": "frames/s/chip",
            "videos": n,
            "frames_per_video": args.frames,
            "wall_ms_per_call": round(dt * 1e3, 1),
        }
        if device_us_per_frame is not None:
            rec["device_ms_per_frame"] = round(device_us_per_frame / 1e3, 4)
            rec["device_bound_agg_fps"] = round(1e6 / device_us_per_frame, 1)
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
