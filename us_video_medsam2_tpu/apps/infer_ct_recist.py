"""FLARE25 RECIST 3D-CT lesion segmentation.

Port of reference medsam2_infer_CT_lesion_npz_recist.py:100-462: per-case NPZ
with `imgs` (D,H,W uint8-ranged), `recist` (D,H,W line markers), `spacing`;
a RECIST diameter line on one slice becomes a box (or sampled points) prompt on
that slice; the resulting mask is handed to add_new_mask and propagated forward
then (after reset) backward through the volume. Saves segs NPZ + timing CSV.

Usage:
  python -m us_video_medsam2_tpu.apps.infer_ct_recist \
      --imgs_path data/RECIST_npz --pred_save_dir out [--checkpoint ckpt.pt]
"""

from __future__ import annotations

import argparse
import csv
import os
import time
from glob import glob
from os.path import basename, join

import numpy as np


def get_diameter_bbox(recist_slice: np.ndarray, shift: int = 0) -> np.ndarray:
    """RECIST line -> enclosing square box (reference recist.py:124-151)."""
    h, w = recist_slice.shape
    ys, xs = np.where(recist_slice > 0)
    coords = np.stack([xs, ys], axis=1)
    p1, p2 = coords[0], coords[-1]
    center = ((p1 + p2) / 2).astype(int)
    half = int(np.linalg.norm(p1 - p2) / 2)
    x_min = max(0, center[0] - half - shift)
    y_min = max(0, center[1] - half - shift)
    x_max = min(w - 1, center[0] + half + shift)
    y_max = min(h - 1, center[1] + half + shift)
    return np.array([x_min, y_min, x_max, y_max])


def sample_points_in_bbox_grid(bbox: np.ndarray, n: int = 9) -> np.ndarray:
    """(reference recist.py:153-186)"""
    x_min, y_min, x_max, y_max = bbox
    side = int(np.ceil(np.sqrt(n)))
    xs = np.linspace(x_min, x_max, side + 2)[1:-1]
    ys = np.linspace(y_min, y_max, side + 2)[1:-1]
    pts = np.array([(x, y) for y in ys for x in xs])[:n]
    return pts


def resize_grayscale_to_rgb(imgs: np.ndarray, size: int) -> np.ndarray:
    """(D, H, W) -> (D, size, size, 3) float [0,1]."""
    import cv2

    d = imgs.shape[0]
    out = np.empty((d, size, size, 3), np.float32)
    for i in range(d):
        s = cv2.resize(imgs[i].astype(np.float32), (size, size), interpolation=cv2.INTER_LINEAR)
        out[i] = np.repeat(s[..., None], 3, axis=-1)
    return out / 255.0


def infer_case(predictor, npz_file: str, args):
    from us_video_medsam2_tpu.inference.transforms import IMG_MEAN, IMG_STD

    t_start = time.time()
    data = np.load(npz_file, "r", allow_pickle=True)
    spacing = data["spacing"]
    recist = data["recist"]
    img3d = data["imgs"]
    assert img3d.max() < 256, "input should be in [0, 255]"
    segs = np.zeros(img3d.shape, np.uint8)
    vh, vw = img3d.shape[1:3]

    size = predictor.cfg.image_size
    if (vh, vw) != (size, size):
        img = resize_grayscale_to_rgb(img3d, size)
    else:
        img = np.repeat(img3d[..., None].astype(np.float32) / 255.0, 3, axis=-1)
    img = (img - IMG_MEAN) / IMG_STD

    for ulab in np.unique(recist)[np.unique(recist) != 0]:
        rl = (recist == ulab) * ulab
        z_indices = np.where((rl > 0).any(axis=(1, 2)))[0]
        if len(z_indices) == 0:
            continue
        z_mid = int(z_indices[0])
        box2d = get_diameter_bbox(rl[z_mid], shift=args.shift)

        state = predictor.init_state(img, vh, vw, max_objects=1)
        if args.propagate_with_box:
            _, _, logits = predictor.add_new_points_or_box(
                state, frame_idx=z_mid, obj_id=1, box=box2d
            )
        else:
            pts = sample_points_in_bbox_grid(box2d, n=9)
            _, _, logits = predictor.add_new_points_or_box(
                state, frame_idx=z_mid, obj_id=1, points=pts, labels=np.ones(len(pts)),
            )
        mask_prompt = (logits[0, 0] > 0.0).astype(np.uint8)

        # mask handoff + forward propagation (reference recist.py:380-383)
        predictor.reset_state(state)
        _, _, masks = predictor.add_new_mask(state, z_mid, 1, mask_prompt)
        segs[z_mid][masks[0, 0] > 0.0] = ulab
        for fi, _, logits in predictor.propagate_in_video(state, start_frame_idx=z_mid):
            segs[fi][np.asarray(logits[0, 0]) > 0.0] = ulab
        # reverse pass with a fresh state (reference recist.py:384-389)
        predictor.reset_state(state)
        predictor.add_new_mask(state, z_mid, 1, mask_prompt)
        for fi, _, logits in predictor.propagate_in_video(
            state, start_frame_idx=z_mid, reverse=True
        ):
            segs[fi][np.asarray(logits[0, 0]) > 0.0] = ulab

    np.savez_compressed(join(args.pred_save_dir, basename(npz_file)), segs=segs, spacing=spacing)
    return time.time() - t_start


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--cfg", default="sam2.1_hiera_t512")
    ap.add_argument("--imgs_path", required=True)
    ap.add_argument("--pred_save_dir", required=True)
    ap.add_argument("--propagate_with_box", action="store_true", default=True)
    ap.add_argument("--no-box", dest="propagate_with_box", action="store_false")
    ap.add_argument("--shift", type=int, default=0)
    ap.add_argument("--sample_points", default="from_box")
    args = ap.parse_args(argv)

    from us_video_medsam2_tpu.core.build import build_sam2_video_predictor_npz

    predictor = build_sam2_video_predictor_npz(args.cfg, args.checkpoint)
    os.makedirs(args.pred_save_dir, exist_ok=True)
    cases = sorted(glob(join(args.imgs_path, "*.npz")))
    rows = []
    for case in cases:
        dur = infer_case(predictor, case, args)
        print(f"finished {basename(case)} in {dur:.2f}s")
        rows.append((basename(case), dur))
    with open(join(args.pred_save_dir, "inference_time.csv"), "w", newline="") as f:
        wr = csv.writer(f)
        wr.writerow(["case", "seconds"])
        wr.writerows(rows)


if __name__ == "__main__":
    main()
