"""One-command Dice verification of a REAL checkpoint against the reference
evaluation protocol.

The #1 tracked parity risk (docs/PARITY.md "Known gaps") is that no pretrained
MedSAM2/SAM2.1 weights are reachable from this machine — implementation parity
is proven (docs/FULLSIZE_PARITY.md) but trained-weights Dice parity is not.
This tool closes that gap the day weights appear: given a checkpoint path, it
imports the weights, propagates every bundled RECIST NPZ case with the fork's
deterministic video-eval protocol (reference medsam2_infer_video.py:390-469 —
GT-mask prompt on the first annotated frame, objects sorted by id, per-frame
FairSegMetrics, per-video CSV + video-balanced ALL row), and prints a PASS/FAIL
line against an expected Dice.

Accepted checkpoints: reference torch .pt/.pth (incl. fork training ckpts whose
weights live under "model" — routed through core/import_torch.py), this
framework's .npz, or an Orbax directory.

Usage (the one-liner):
  python tools/verify_real_ckpt.py checkpoints/MedSAM2_latest.pt
  # options:
  #   --data_dir DIR     NPZ cases (default: the bundled RECIST_train_npz)
  #   --cfg NAME         config preset (default sam2.1_hiera_t512)
  #   --out_dir DIR      CSV/vis output (default /tmp/verify_real_ckpt)
  #   --expect_dice X    fail (exit 1) if mean Dice of class 1 < X
  #   --cases N          only the first N cases (smoke runs)
  #   --save_vis         dump pred/gt/overlay PNGs per frame

Tested end-to-end by tests/test_e2e_pipeline.py::test_verify_real_ckpt_harness
(tiny config + saved native checkpoint) and at full t512 scale via the
fixed-seed checkpoint flow in tools/run_fullsize_parity.py.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DEFAULT_DATA = "/root/reference/data/RECIST_train_npz"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", help=".pt/.pth (torch), .npz, or orbax dir")
    ap.add_argument("--data_dir", default=DEFAULT_DATA)
    ap.add_argument("--cfg", default="sam2.1_hiera_t512")
    ap.add_argument("--out_dir", default="/tmp/verify_real_ckpt")
    ap.add_argument("--expect_dice", type=float, default=None)
    ap.add_argument("--cases", type=int, default=0, help="0 = all")
    ap.add_argument("--save_vis", action="store_true")
    args = ap.parse_args(argv)

    if not os.path.exists(args.checkpoint):
        ap.error(f"checkpoint not found: {args.checkpoint}")
    if not os.path.isdir(args.data_dir):
        ap.error(
            f"data dir not found: {args.data_dir} (pass --data_dir with NPZ "
            "cases holding 'imgs' [T,H,W] uint8 + 'gts' [T,H,W] int labels)"
        )

    import random
    from glob import glob

    import numpy as np

    from us_video_medsam2_tpu.apps import infer_video
    from us_video_medsam2_tpu.core.build import build_sam2_video_predictor_npz
    from us_video_medsam2_tpu.utils.metrics import VideoMetricAggregator

    # global determinism (reference medsam2_infer_video.py:240-249)
    random.seed(infer_video.SEED)
    np.random.seed(infer_video.SEED)

    predictor = build_sam2_video_predictor_npz(args.cfg, args.checkpoint)
    os.makedirs(args.out_dir, exist_ok=True)
    agg = VideoMetricAggregator(infer_video.ALL_CLASSES)
    cases = sorted(glob(os.path.join(args.data_dir, "*.npz")))
    if args.cases:
        cases = cases[: args.cases]
    if not cases:
        ap.error(f"no .npz cases in {args.data_dir}")
    for npz in cases:
        infer_video.evaluate_video(predictor, npz, agg, args)
    csv_path = os.path.join(args.out_dir, "evaluation_summary.csv")
    agg.to_csv(csv_path)
    gm = agg.global_means()
    summary = {
        "checkpoint": args.checkpoint,
        "cfg": args.cfg,
        "cases": len(cases),
        "csv": csv_path,
        "global_means": {str(c): m for c, m in gm.items()},
    }
    print(json.dumps(summary))

    if args.expect_dice is not None:
        got = gm.get(1, {}).get("dice", 0.0)
        if got < args.expect_dice:
            print(f"FAIL: class-1 Dice {got:.4f} < expected {args.expect_dice}")
            return 1
        print(f"PASS: class-1 Dice {got:.4f} >= {args.expect_dice}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
