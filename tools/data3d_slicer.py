"""Prediction PNG frames -> 3D NIfTI volume for 3D Slicer review.

Port of reference data3dSlicer.py: stacks per-frame prediction masks
(<frame:04d>_pred*.png) into a [D, H, W] volume and writes NIfTI (nibabel) or
NPZ fallback.

Usage: python tools/data3d_slicer.py --pred_dir results/videoX --out vol.nii.gz
"""

from __future__ import annotations

import argparse
import os
import re
from glob import glob

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pred_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--pattern", default="*_pred*.png")
    args = ap.parse_args(argv)

    from PIL import Image

    files = sorted(glob(os.path.join(args.pred_dir, args.pattern)))
    assert files, f"no prediction PNGs under {args.pred_dir}"
    by_frame = {}
    for f in files:
        m = re.match(r"(\d+)_pred(?:_c(\d+))?", os.path.basename(f))
        if not m:
            continue
        frame = int(m.group(1))
        cls = int(m.group(2) or 1)
        mask = np.array(Image.open(f)) > 127
        canvas = by_frame.setdefault(frame, None)
        if canvas is None:
            by_frame[frame] = np.zeros(mask.shape, np.uint8)
        by_frame[frame][mask] = cls
    frames = [by_frame[k] for k in sorted(by_frame)]
    vol = np.stack(frames)
    if args.out.endswith((".nii", ".nii.gz")):
        try:
            import nibabel as nib

            nib.save(nib.Nifti1Image(vol, np.eye(4)), args.out)
        except ImportError:
            alt = os.path.splitext(args.out)[0] + ".npz"
            np.savez_compressed(alt, vol=vol)
            print(f"nibabel unavailable; wrote {alt}")
            return
    else:
        np.savez_compressed(args.out, vol=vol)
    print(f"wrote {args.out}: {vol.shape}")


if __name__ == "__main__":
    main()
