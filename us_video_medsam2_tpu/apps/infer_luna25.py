"""LUNA25 lung-nodule segmentation from CT volumes.

Port of reference examples/infer_CT_LUNA25.py: load a .mha/.nii/.npz volume,
apply the lung window (level -750, width 1500, reference infer_CT_LUNA25.py:80),
convert a world/voxel nodule coordinate to a point prompt on its key slice, and
propagate bidirectionally. SimpleITK/nibabel are optional; NPZ input always works.

Usage:
  python -m us_video_medsam2_tpu.apps.infer_luna25 --input case.npz \
      --coord_zyx 42 230 180 --out_dir out
"""

from __future__ import annotations

import argparse
import os
from os.path import basename, join

import numpy as np

from us_video_medsam2_tpu.apps.infer_3d_ct import largest_component, window_ct


def load_volume(path: str) -> np.ndarray:
    if path.endswith(".npz"):
        return np.load(path, allow_pickle=True)["imgs"]
    if path.endswith((".mha", ".mhd")):
        try:
            import SimpleITK as sitk  # type: ignore

            return sitk.GetArrayFromImage(sitk.ReadImage(path))
        except ImportError as e:
            raise ImportError(".mha input needs SimpleITK; convert to npz") from e
    if path.endswith((".nii", ".nii.gz")):
        import nibabel as nib

        return np.moveaxis(np.asanyarray(nib.load(path).dataobj), -1, 0)
    raise ValueError(f"unsupported volume format: {path}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--cfg", default="sam2.1_hiera_t512")
    ap.add_argument("--input", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--coord_zyx", type=float, nargs=3, required=True,
                    help="nodule center voxel coordinate (z, y, x)")
    ap.add_argument("--window_level", type=float, default=-750.0)
    ap.add_argument("--window_width", type=float, default=1500.0)
    args = ap.parse_args(argv)

    from us_video_medsam2_tpu.apps.infer_ct_recist import resize_grayscale_to_rgb
    from us_video_medsam2_tpu.core.build import build_sam2_video_predictor_npz
    from us_video_medsam2_tpu.inference.transforms import IMG_MEAN, IMG_STD

    predictor = build_sam2_video_predictor_npz(args.cfg, args.checkpoint)
    vol = load_volume(args.input)
    vol8 = window_ct(vol, args.window_level, args.window_width)
    d, vh, vw = vol8.shape
    img = (resize_grayscale_to_rgb(vol8, predictor.cfg.image_size) - IMG_MEAN) / IMG_STD

    z, y, x = (int(round(c)) for c in args.coord_zyx)
    segs = np.zeros(vol8.shape, bool)
    for reverse in (False, True):
        state = predictor.init_state(img, vh, vw, max_objects=1)
        predictor.add_new_points_or_box(
            state, z, 1, points=np.array([[float(x), float(y)]]), labels=np.array([1])
        )
        for fi, _, logits in predictor.propagate_in_video(
            state, start_frame_idx=z, reverse=reverse
        ):
            segs[fi] |= np.asarray(logits[0, 0]) > 0
        predictor.reset_state(state)
    segs = largest_component(segs)

    os.makedirs(args.out_dir, exist_ok=True)
    stem = basename(args.input).split(".")[0]
    np.savez_compressed(join(args.out_dir, f"{stem}_nodule.npz"), segs=segs.astype(np.uint8))
    print(f"{stem}: {int(segs.sum())} voxels across {int((segs.any(axis=(1, 2))).sum())} slices")


if __name__ == "__main__":
    main()
