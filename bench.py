"""Video-propagation FPS benchmark (the reference's headline harness).

Port of reference efficient_track_anything/benchmark.py:44-106: prompt frame 0
with a click, propagate through the video, report frames/sec. Here the whole
propagation is one compiled lax.scan on device, bf16 compute, over REAL frames:
the bundled RECIST CT-lesion NPZ cases (the reference ships them under
data/RECIST_train_npz and evaluates on them, medsam2_infer_CT_lesion_npz_recist.py)
so hole filling and all mask-dependent postprocessing see realistic masks, not
noise. Falls back to synthetic frames only when the reference data dir is absent.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
p50_frame_latency_ms (streaming per-frame latency) and click_p50_ms (p50
interactive click latency through the one-dispatch prompt path, incl. the
~30-50 ms per-dispatch tunnel RTT of this environment).
vs_baseline is against SAM2.1-tiny's published ~47 FPS at 512² on A100-class
GPUs (reference README.md:156-181 citations; the repo itself commits no numbers,
BASELINE.md).
"""

import glob
import json
import os
import time

import jax

# Persistent compilation cache: the driver runs this file cold every round;
# warm entries (written by in-round runs on the same chip) cut the ~20-40 s
# propagation compile to near-zero. Same recipe as __graft_entry__'s dryrun.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache_tpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

import jax.numpy as jnp
import numpy as np

A100_BASELINE_FPS = 47.0
RECIST_DIR = "/root/reference/data/RECIST_train_npz"
IMG_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMG_STD = np.array([0.229, 0.224, 0.225], np.float32)


def load_real_video(num_frames, image_size):
    """[T,H,W,3] ImageNet-normalized frames from the bundled RECIST cases plus
    a frame-0 positive click at the lesion GT centroid (the reference prompts
    at the key slice; the first case is rotated so its largest-GT slice leads).
    Cases are concatenated until `num_frames` frames are available."""
    files = sorted(glob.glob(os.path.join(RECIST_DIR, "*.npz")))
    if not files:
        return None, None
    frames, click = [], None
    for f in files:
        case = np.load(f)
        imgs, gts = case["imgs"], case["gts"]
        if click is None:  # first case: start at the RECIST key slice
            start = int(np.argmax((gts > 0).sum(axis=(1, 2))))
            imgs, gts = imgs[start:], gts[start:]
            ys, xs = np.nonzero(gts[0])
            click = np.array([[xs.mean(), ys.mean()]], np.float32)
        frames.append(imgs)
        if sum(len(x) for x in frames) >= num_frames:
            break
    imgs = np.concatenate(frames)[:num_frames].astype(np.float32) / 255.0
    if imgs.shape[1:] != (image_size, image_size):
        raise ValueError(f"RECIST frames are {imgs.shape[1:]}, not {image_size}²")
    video = (imgs[..., None] - IMG_MEAN) / IMG_STD  # grayscale -> 3ch + normalize
    return video.astype(np.float32), click


def main(cfg_name="sam2.1_hiera_t512"):
    from us_video_medsam2_tpu.core.build import resolve_config
    from us_video_medsam2_tpu.core.config import SAM2Config
    from us_video_medsam2_tpu.inference.video_predictor import SAM2VideoPredictor
    from us_video_medsam2_tpu.models.sam2 import SAM2Model

    on_tpu = jax.devices()[0].platform != "cpu"
    num_frames = 64 if on_tpu else 4
    warmup_runs, timed_runs = (2, 5) if on_tpu else (1, 1)

    if cfg_name == "sam2.1_hiera_t512":
        cfg, metric = SAM2Config(), "video_propagation_fps_512_hiera_tiny"
    else:
        # e.g. efficientmedsam_s_512 — the config whose FPS harness the
        # reference actually ships (efficient_track_anything/benchmark.py)
        cfg = resolve_config(cfg_name)
        metric = f"video_propagation_fps_{cfg.image_size}_{cfg_name}"
    model = SAM2Model(cfg, dtype=jnp.bfloat16)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    )

    predictor = SAM2VideoPredictor(model, params, fill_hole_area=8)
    video_np, click = load_real_video(num_frames, cfg.image_size)
    if video_np is None:  # no reference data on this machine — synthetic fallback
        rng = np.random.default_rng(0)
        video_np = rng.standard_normal(
            (num_frames, cfg.image_size, cfg.image_size, 3)
        ).astype(np.float32)
        click = np.array([[256.0, 256.0]], np.float32)
    video = jnp.asarray(video_np)

    # setup once; timed runs re-propagate over the same session (the reference
    # harness times propagate_in_video only, benchmark.py:86-106)
    state = predictor.init_state(video, cfg.image_size, cfg.image_size, 1)
    predictor.add_new_points_or_box(
        state, 0, 1, points=click, labels=np.array([1])
    )
    predictor.propagate_in_video_preflight(state)

    def run():
        _, lows, ran = predictor._propagate(
            predictor.params,
            state.images,
            state.bank,
            jnp.asarray(0),
            jnp.asarray(state.num_frames - 1),
            num_frames=state.num_frames,
            reverse=False,
            max_cond_slots=1,  # single prompted frame (what propagate_in_video derives)
        )
        # force TRUE completion with a host fetch — block_until_ready alone can
        # return early through remote-TPU tunnels
        np.asarray(lows[-1, 0, :2, :2])
        return lows

    for _ in range(warmup_runs):
        run()
    # Per-run FPS, MEDIAN over timed_runs: the remote-TPU tunnel's
    # per-dispatch RTT occasionally spikes 2x+ (measured 40 -> 80+ ms within
    # one session), and a single spiked run in a summed-time measurement
    # misreports the chip by tens of percent. The median rejects such
    # outliers while still charging every run its full dispatch+fetch cost
    # (the reference harness averages 25 runs on local hardware,
    # efficient_track_anything/benchmark.py:86-106 — it has no tunnel).
    fps = 0.0
    for attempt in range(3):
        run_fps, lows = [], None
        for _ in range(timed_runs):
            t0 = time.perf_counter()
            lows = run()
            run_fps.append((num_frames - 1) / (time.perf_counter() - t0))
        sane = np.isfinite(np.asarray(lows[1:3])).all() and all(
            f < 1e5 for f in run_fps
        )
        if sane:
            fps = float(np.median(run_fps))
            break

    # Device self-time + MFU: wall FPS through the remote-TPU tunnel swings
    # with per-dispatch RTT (±40% observed across sessions, docs/ROADMAP.md);
    # the STABLE number is XLA op self-time from an xprof trace of the same
    # compiled propagation, and MFU positions it against the chip's bf16
    # peak. FLOPs are counted analytically by walking the program's jaxpr
    # (utils/flops.py — scan bodies × trip count, Pallas sites counted via
    # their XLA-math fallbacks; XLA's own cost_analysis counts loop bodies
    # once and would under-report 64x here). The reference harness reports
    # wall FPS only (efficient_track_anything/benchmark.py:86-106).
    device_ms_per_frame = mfu_pct = flops_per_frame_g = None
    if on_tpu:
        try:
            import shutil
            import tempfile

            from us_video_medsam2_tpu.utils.flops import fn_flops
            from us_video_medsam2_tpu.utils.traceparse import (
                device_self_time_ms,
                peak_bf16_flops,
            )

            tdir = tempfile.mkdtemp(prefix="bench_trace_")
            try:
                jax.profiler.start_trace(tdir)
                run()
                jax.profiler.stop_trace()
                dev_ms_total = device_self_time_ms(tdir)
            finally:
                shutil.rmtree(tdir, ignore_errors=True)
            total_flops = fn_flops(
                predictor._propagate,
                predictor.params,
                state.images,
                state.bank,
                jnp.asarray(0),
                jnp.asarray(state.num_frames - 1),
                num_frames=state.num_frames,
                reverse=False,
                max_cond_slots=1,
            )
            device_ms_per_frame = round(dev_ms_total / (num_frames - 1), 3)
            flops_per_frame_g = round(total_flops / (num_frames - 1) / 1e9, 2)
            peak = peak_bf16_flops(jax.devices()[0].device_kind)
            if peak and total_flops > 0 and dev_ms_total > 0:
                mfu_pct = round(
                    100.0 * total_flops / (dev_ms_total / 1e3) / peak, 2
                )
        except Exception:  # noqa: BLE001 — never fail the headline on profiling
            import traceback

            traceback.print_exc()

    # p50 per-frame latency through the STREAMING path (chunked scan), the
    # latency a consumer of propagate_in_video(chunk_size=K) observes per frame
    # (BASELINE.md tracks p50 per-frame latency alongside FPS). Includes the
    # per-dispatch tunnel RTT amortized over the chunk.
    chunk = 8 if on_tpu else 2
    lat_state = predictor.init_state(video, cfg.image_size, cfg.image_size, 1)
    predictor.add_new_points_or_box(
        lat_state, 0, 1, points=click, labels=np.array([1])
    )
    for _ in list(predictor.propagate_in_video(lat_state, chunk_size=chunk)):
        pass  # compile warmup
    per_frame_ms = []
    lat_runs = 3 if on_tpu else 1
    for _ in range(lat_runs):
        s2 = predictor.init_state(video, cfg.image_size, cfg.image_size, 1)
        predictor.add_new_points_or_box(
            s2, 0, 1, points=click, labels=np.array([1])
        )
        tprev = time.perf_counter()
        n_since = 0
        for _ in predictor.propagate_in_video(s2, chunk_size=chunk):
            n_since += 1
            if n_since == chunk:  # a chunk boundary: amortized per-frame latency
                now = time.perf_counter()
                per_frame_ms.append(1e3 * (now - tprev) / n_since)
                tprev, n_since = now, 0
    p50_ms = float(np.median(per_frame_ms)) if per_frame_ms else float("nan")

    # interactive click latency: one add_new_points_or_box call on a warmed
    # predictor = one fused dispatch (prompt + decode + video-res upsample) +
    # one host fetch (_store_prompt_output), the latency an app.py user feels
    # per click (reference re-runs track_step per click and fetches every
    # object's mask, sam2_video_predictor.py:173-314). Clicks land on distinct
    # fresh frames — identical shapes, so no recompiles after warmup.
    click_state = predictor.init_state(video, cfg.image_size, cfg.image_size, 1)
    n_clicks = 12 if on_tpu else 2
    predictor.add_new_points_or_box(  # warmup (compile)
        click_state, 0, 1, points=click, labels=np.array([1])
    )
    click_ms = []
    for i in range(1, n_clicks + 1):
        t0 = time.perf_counter()
        predictor.add_new_points_or_box(
            click_state, i % num_frames, 1, points=click, labels=np.array([1])
        )
        click_ms.append(1e3 * (time.perf_counter() - t0))
    click_p50 = float(np.median(click_ms))

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(fps, 2),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps / A100_BASELINE_FPS, 3),
                "p50_frame_latency_ms": round(p50_ms, 2),
                "click_p50_ms": round(click_p50, 2),
                # stable device-side metrics (None off-TPU / if tracing failed)
                "device_ms_per_frame": device_ms_per_frame,
                "mfu_pct": mfu_pct,
                "flops_per_frame_gflop": flops_per_frame_g,
            }
        )
    )


if __name__ == "__main__":
    import sys
    import traceback

    cfg_name = "sam2.1_hiera_t512"
    if len(sys.argv) > 2 and sys.argv[1] == "--cfg":
        cfg_name = sys.argv[2]

    for attempt in range(2):
        try:
            main(cfg_name)
            break
        except Exception:  # noqa: BLE001 — remote-TPU tunnels flake transiently
            if attempt == 1:
                raise
            traceback.print_exc()
            time.sleep(10)
