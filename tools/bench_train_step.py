"""Train-step wall/device timing on the real TPU for the GFTE recipe.

The VERDICT round-3 target: <=180 ms wall / <=110 ms device per step on the
GFTE recipe (reference hot loop: training/trainer.py:836-880 — batch 1 video
x 4 frames x <=5 objects, 512², bf16). Times a scan of STEPS train steps
(amortizes the ~40 ms tunnel RTT) plus a single-dispatch wall time.

Usage: python tools/bench_train_step.py [--steps 10] [--objects 3]
A/B the dropout flash kernel with US_MEDSAM2_DISABLE_FLASH_DROPOUT=1.
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

# Persistent compilation cache (bench.py's recipe): the GFTE train-step
# compile costs minutes cold; warm entries from earlier in-round runs on the
# same chip make re-timing cheap.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache_tpu",
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--objects", type=int, default=3)
    ap.add_argument("--cfg", default="sam2.1_hiera_t512",
                    help="config preset or YAML (e.g. efficientmedsam_s_512 "
                         "for the reference's FLARE finetune recipe)")
    ap.add_argument("--fusion", default="gfte",
                    choices=["none", "tce", "gfte", "atsf", "gp"])
    ap.add_argument("--profile", default=None, help="xprof trace dir")
    ap.add_argument("--json", default=None, help="write the JSON record here")
    args = ap.parse_args(argv)

    import dataclasses

    from us_video_medsam2_tpu.core.build import resolve_config
    from us_video_medsam2_tpu.core.config import TemporalFusionConfig
    from us_video_medsam2_tpu.models.sam2 import SAM2Model
    from us_video_medsam2_tpu.training.losses import LossConfig
    from us_video_medsam2_tpu.training.optimizer import OptimConfig
    from us_video_medsam2_tpu.training.train_model import TrainSimConfig
    from us_video_medsam2_tpu.training.train_step import (
        TrainBatch,
        TrainConfig,
        create_train_state,
        make_train_step,
    )

    cfg = resolve_config(args.cfg)
    if args.fusion != "none":
        cfg = dataclasses.replace(
            cfg,
            temporal_fusion=TemporalFusionConfig(
                variant=args.fusion, channels=cfg.hidden_dim
            ),
        )
    model = SAM2Model(cfg, dtype=jnp.bfloat16)
    size = cfg.image_size
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))

    tcfg = TrainConfig(
        sim=TrainSimConfig(),
        loss=LossConfig(weight_temporal=0.5, temporal_variant="consistency"),
        optim=OptimConfig(total_steps=1000),
    )
    state = create_train_state(model, params, tcfg)
    step = make_train_step(model, tcfg, donate=False)

    t, b, o = args.frames, 1, args.objects
    rng = np.random.default_rng(0)
    masks = np.zeros((t, b, o, size, size), bool)
    masks[:, :, :, 140:360, 120:330] = True
    batch = TrainBatch(
        images=jnp.asarray(rng.standard_normal((t, b, size, size, 3)), jnp.float32),
        masks=jnp.asarray(masks),
        obj_valid=jnp.ones((b, o), bool),
    )

    @jax.jit
    def multi(state, batch, key):
        def body(carry, i):
            st, k = carry
            k, sub = jax.random.split(k)
            st, m = step(st, batch, sub)
            return (st, k), m["core_loss"]

        (state, _), losses = jax.lax.scan(
            body, (state, key), jnp.arange(args.steps)
        )
        return state, losses

    # single-step wall (incl. dispatch RTT)
    st1, m1 = step(state, batch, jax.random.PRNGKey(1))
    np.asarray(m1["core_loss"])  # compile + fetch
    t0 = time.perf_counter()
    st1, m1 = step(state, batch, jax.random.PRNGKey(2))
    np.asarray(m1["core_loss"])
    single_ms = (time.perf_counter() - t0) * 1e3

    # scanned steps (amortized device time)
    stN, losses = multi(state, batch, jax.random.PRNGKey(3))
    np.asarray(losses[-1])
    if args.profile:
        jax.profiler.start_trace(args.profile)
    t0 = time.perf_counter()
    stN, losses = multi(state, batch, jax.random.PRNGKey(4))
    np.asarray(losses[-1])
    scan_ms = (time.perf_counter() - t0) * 1e3 / args.steps
    if args.profile:
        jax.profiler.stop_trace()

    # device self-time + MFU (same machinery as bench.py: xprof self-time is
    # the tunnel-RTT-free number; FLOPs counted analytically over the jaxpr)
    device_ms = mfu_pct = flops_g = None
    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        try:
            import shutil
            import tempfile

            from us_video_medsam2_tpu.utils.flops import fn_flops
            from us_video_medsam2_tpu.utils.traceparse import (
                device_self_time_ms,
                peak_bf16_flops,
            )

            tdir = tempfile.mkdtemp(prefix="train_bench_trace_")
            try:
                jax.profiler.start_trace(tdir)
                stN, losses = multi(state, batch, jax.random.PRNGKey(5))
                np.asarray(losses[-1])
                jax.profiler.stop_trace()
                device_ms = device_self_time_ms(tdir) / args.steps
            finally:
                shutil.rmtree(tdir, ignore_errors=True)
            total_flops = fn_flops(multi, state, batch, jax.random.PRNGKey(5))
            flops_g = total_flops / args.steps / 1e9
            peak = peak_bf16_flops(jax.devices()[0].device_kind)
            if peak and total_flops > 0 and device_ms:
                mfu_pct = round(
                    100.0 * (total_flops / args.steps) / (device_ms / 1e3) / peak, 2
                )
        except Exception:  # noqa: BLE001 — never fail the timing on profiling
            import traceback

            traceback.print_exc()

    flash = "off" if os.environ.get("US_MEDSAM2_DISABLE_FLASH_DROPOUT") else "on"
    print(
        f"train_step {args.cfg}/{args.fusion} {t}f x {o}obj @{size}² "
        f"(flash_dropout={flash}): "
        f"single-dispatch {single_ms:.1f} ms wall, scanned {scan_ms:.1f} ms/step "
        f"(core_loss {float(losses[-1]):.4f})"
    )
    import json

    record = {
        "metric": f"train_step_ms_{args.cfg}_{args.fusion}",
        "value": round(scan_ms, 2),
        "unit": "ms/step (wall, scanned)",
        "single_dispatch_ms": round(single_ms, 1),
        "device_ms_per_step": round(device_ms, 2) if device_ms else None,
        "mfu_pct": mfu_pct,
        "flops_per_step_gflop": round(flops_g, 1) if flops_g else None,
        "frames": t,
        "objects": o,
        "image_size": size,
        "flash_dropout": flash,
        "core_loss": round(float(losses[-1]), 4),
    }
    print(json.dumps(record))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(record, f, indent=1)


if __name__ == "__main__":
    main()
