"""NIfTI -> NPZ preprocessing for video training data.

Port of reference datacheck.py: load image+label NIfTI volumes, normalize axis
order so slices are the leading axis, intensity-normalize to uint8, and save
the `imgs`/`gts` NPZ pairs the NPZ datasets expect. nibabel is optional in the
baked image; SimpleITK is tried as a fallback.

Usage: python tools/datacheck.py --img_dir <nii_dir> --gt_dir <nii_dir> --out_dir <npz_dir>
"""

from __future__ import annotations

import argparse
import os
from glob import glob

import numpy as np


def _load_nii(path: str) -> np.ndarray:
    try:
        import nibabel as nib

        return np.asanyarray(nib.load(path).dataobj)
    except ImportError:
        pass
    try:
        import SimpleITK as sitk  # type: ignore

        return sitk.GetArrayFromImage(sitk.ReadImage(path))
    except ImportError as e:
        raise ImportError("need nibabel or SimpleITK for NIfTI input") from e


def normalize_axes(vol: np.ndarray) -> np.ndarray:
    """Put the slice axis first (smallest extent heuristic, as datacheck.py)."""
    slice_axis = int(np.argmin(vol.shape))
    return np.moveaxis(vol, slice_axis, 0)


def to_uint8(vol: np.ndarray, lower_pct=0.5, upper_pct=99.5) -> np.ndarray:
    lo, hi = np.percentile(vol, [lower_pct, upper_pct])
    x = np.clip(vol.astype(np.float32), lo, hi)
    return ((x - lo) / max(hi - lo, 1e-6) * 255).astype(np.uint8)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--img_dir", required=True)
    ap.add_argument("--gt_dir", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--suffix", default=".nii.gz")
    args = ap.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    for img_path in sorted(glob(os.path.join(args.img_dir, f"*{args.suffix}"))):
        name = os.path.basename(img_path)[: -len(args.suffix)]
        gt_path = os.path.join(args.gt_dir, name + args.suffix)
        if not os.path.exists(gt_path):
            print(f"skip {name}: no label volume")
            continue
        img = normalize_axes(_load_nii(img_path))
        gt = normalize_axes(_load_nii(gt_path))
        assert img.shape == gt.shape, f"{name}: {img.shape} vs {gt.shape}"
        np.savez_compressed(
            os.path.join(args.out_dir, f"{name}.npz"),
            imgs=to_uint8(img),
            gts=gt.astype(np.uint8),
        )
        print(f"{name}: {img.shape} ok")


if __name__ == "__main__":
    main()
