"""Crop ablation-figure PNGs around the mask centroid (reference niche/cropFile.py).

Walks <src>/<model_name>/*.png prediction masks, centers a fixed-size crop on
the mask's bounding-box center (image center when the mask is empty), clamps
the window to the image with edge correction so the crop keeps its full size
whenever the image allows, and writes <dst>/<model_name>/<name>.png.

Unlike the reference (hardcoded absolute paths, cv2), paths are CLI arguments
and IO is imageio/PIL-free numpy+png via cv2 when available, else pillow.

Usage:
  python tools/crop_ablation_figures.py --src abl --dst abl_cropped --size 256
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _imread_gray(path: str) -> np.ndarray | None:
    try:
        import cv2

        return cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    except ImportError:
        from PIL import Image

        try:
            return np.asarray(Image.open(path).convert("L"))
        except OSError:
            return None


def _imwrite(path: str, img: np.ndarray) -> None:
    try:
        import cv2

        cv2.imwrite(path, img)
    except ImportError:
        from PIL import Image

        Image.fromarray(img).save(path)


def crop_window(mask: np.ndarray, size: int) -> tuple[int, int, int, int]:
    """(y1, y2, x1, x2) of the size x size window centred on the mask bbox
    centre (image centre when empty), clamped with the reference's edge
    correction (niche/cropFile.py:44-63)."""
    h, w = mask.shape
    ys, xs = np.where(mask > 0)
    if len(xs) > 0:
        cx = int((xs.min() + xs.max()) // 2)
        cy = int((ys.min() + ys.max()) // 2)
    else:
        cx, cy = w // 2, h // 2
    half = size // 2
    x1, y1 = max(0, cx - half), max(0, cy - half)
    x2, y2 = min(w, cx + half), min(h, cy + half)
    if (x2 - x1) < size:
        if x1 == 0:
            x2 = min(w, x1 + size)
        elif x2 == w:
            x1 = max(0, x2 - size)
    if (y2 - y1) < size:
        if y1 == 0:
            y2 = min(h, y1 + size)
        elif y2 == h:
            y1 = max(0, y2 - size)
    return y1, y2, x1, x2


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True, help="root with <model_name>/*.png")
    ap.add_argument("--dst", required=True)
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()

    os.makedirs(args.dst, exist_ok=True)
    for model_name in sorted(os.listdir(args.src)):
        model_dir = os.path.join(args.src, model_name)
        if not os.path.isdir(model_dir):
            continue
        out_dir = os.path.join(args.dst, model_name)
        os.makedirs(out_dir, exist_ok=True)
        saved = 0
        for fname in sorted(os.listdir(model_dir)):
            if not fname.endswith(".png"):
                continue
            mask = _imread_gray(os.path.join(model_dir, fname))
            if mask is None:
                continue
            y1, y2, x1, x2 = crop_window(mask, args.size)
            _imwrite(os.path.join(out_dir, fname), mask[y1:y2, x1:x2])
            saved += 1
        print(f"[DONE] {model_name} -> saved {saved} images")


if __name__ == "__main__":
    main()
