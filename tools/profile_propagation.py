"""Capture a jax.profiler trace of the video-propagation scan on the real TPU
and print self-time breakdowns (per HLO category, per model module, per op).

The reference has no profiling tooling at all (timing meters only,
efficient_track_anything/benchmark.py); this is the TPU-native analogue:
xprof device traces attributed back to model modules via XLA op metadata.

Usage:
    python tools/profile_propagation.py [--frames 64] [--out /tmp/prop_trace]
    python tools/profile_propagation.py --analyze-only --out /tmp/prop_trace
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(out_dir: str, num_frames: int, cfg_name: str = "sam2.1_hiera_t512") -> None:
    import jax

    # persistent compilation cache (same recipe as bench.py): propagation
    # compiles for the big configs take minutes on this 1-vCPU host
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache_tpu",
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp
    import numpy as np

    from us_video_medsam2_tpu.core.build import resolve_config
    from us_video_medsam2_tpu.inference.video_predictor import SAM2VideoPredictor
    from us_video_medsam2_tpu.models.sam2 import SAM2Model

    cfg = resolve_config(cfg_name)
    model = SAM2Model(cfg, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    )
    predictor = SAM2VideoPredictor(model, params, fill_hole_area=8)
    rng = np.random.default_rng(0)
    video = jnp.asarray(
        rng.standard_normal((num_frames, cfg.image_size, cfg.image_size, 3)),
        jnp.float32,
    )
    state = predictor.init_state(video, cfg.image_size, cfg.image_size, 1)
    predictor.add_new_points_or_box(
        state, 0, 1, points=np.array([[256.0, 256.0]]), labels=np.array([1])
    )
    predictor.propagate_in_video_preflight(state)

    def run():
        _, lows, _ = predictor._propagate(
            predictor.params,
            state.images,
            state.bank,
            jnp.asarray(0),
            jnp.asarray(state.num_frames - 1),
            num_frames=state.num_frames,
            reverse=False,
            max_cond_slots=1,
        )
        np.asarray(lows[-1, 0, :2, :2])  # host fetch => true completion

    run()  # compile + warm
    run()
    jax.profiler.start_trace(out_dir)
    run()
    jax.profiler.stop_trace()
    print(f"trace written to {out_dir}", file=sys.stderr)


def analyze(out_dir: str, top: int = 30, frames: int = 64) -> None:
    """Parse the trace-viewer JSON: self-time per HLO category / module / op."""
    from us_video_medsam2_tpu.utils.traceparse import parse_trace

    try:
        self_op, self_mod, self_cat, args_of = parse_trace(out_dir)
    except FileNotFoundError as e:
        print(e, file=sys.stderr)
        return

    total = sum(self_op.values())
    print(f"total device self time: {total/1e3:.2f} ms  ({total/frames/1e3:.3f} ms/frame)")
    print("\n-- by HLO category --")
    for c, d in self_cat.most_common(15):
        print(f"{d/1e3:9.2f} ms {100*d/total:5.1f}%  {c}")
    print("\n-- by module --")
    for m, d in self_mod.most_common(20):
        print(f"{d/1e3:9.2f} ms {100*d/total:5.1f}%  {m[:110]}")
    print(f"\n-- top {top} ops (self) --")
    for n, d in self_op.most_common(top):
        a = args_of.get(n, {})
        print(f"{d/1e3:9.2f} ms {100*d/total:5.1f}%  {n[:40]:40s} {a.get('tf_op','')[-90:]}")
    summary = {
        "total_ms": total / 1e3,
        "ms_per_frame": total / frames / 1e3,
        "by_category": {c: d / 1e3 for c, d in self_cat.most_common()},
        "by_module": {m: d / 1e3 for m, d in self_mod.most_common(25)},
        "top_ops": [
            {"name": n, "ms": d / 1e3, "tf_op": args_of.get(n, {}).get("tf_op", "")}
            for n, d in self_op.most_common(top)
        ],
    }
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--out", default="/tmp/prop_trace")
    ap.add_argument("--analyze-only", action="store_true")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--cfg", default="sam2.1_hiera_t512")
    args = ap.parse_args()
    if not args.analyze_only:
        capture(args.out, args.frames, args.cfg)
    analyze(args.out, args.top, args.frames)
