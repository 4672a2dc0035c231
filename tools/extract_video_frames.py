"""Video -> JPEG frame extraction for VOS training data.

Port of reference training/scripts/sav_frame_extraction_submitit.py without the
SLURM/submitit array machinery: a local multiprocessing pool over mp4 files
(cluster scheduling belongs to the launcher, not the tool).

Usage: python tools/extract_video_frames.py --video_dir vids/ --out_dir frames/
"""

from __future__ import annotations

import argparse
import os
from glob import glob
from multiprocessing import Pool


def extract_one(args):
    video_path, out_root, stride = args
    import cv2

    name = os.path.splitext(os.path.basename(video_path))[0]
    out_dir = os.path.join(out_root, name)
    os.makedirs(out_dir, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    i = saved = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if i % stride == 0:
            cv2.imwrite(os.path.join(out_dir, f"{saved:05d}.jpg"), frame)
            saved += 1
        i += 1
    cap.release()
    return name, saved


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--video_dir", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args(argv)

    videos = sorted(glob(os.path.join(args.video_dir, "*.mp4")))
    os.makedirs(args.out_dir, exist_ok=True)
    with Pool(args.workers) as pool:
        for name, n in pool.imap_unordered(
            extract_one, [(v, args.out_dir, args.stride) for v in videos]
        ):
            print(f"{name}: {n} frames")


if __name__ == "__main__":
    main()
