"""Golden fixture for the full interactive video-predictor workflow.

Runs the reference SAM2VideoPredictorNPZ (oracle) at the mini config:
5-frame video, two objects prompted on frame 1 (mask + point), consolidation,
forward propagation then reverse propagation — the RECIST/video-eval usage
pattern. Saves per-frame video-res mask logits.

Usage: python tools/gen_predictor_fixture.py
"""

import pathlib
import sys

import numpy as np
import torch

sys.path.insert(0, str(pathlib.Path(__file__).parent))
from gen_reference_fixtures import OUT, build_mini_sam2, install_reference_packages


def main():
    install_reference_packages()
    from sam2.sam2_video_predictor_npz import SAM2VideoPredictorNPZ

    predictor = build_mini_sam2(
        cls=SAM2VideoPredictorNPZ, fill_hole_area=0, non_overlap_masks=False
    )

    rng = np.random.default_rng(11)
    T, S = 5, 256
    images = rng.standard_normal((T, 3, S, S)).astype(np.float32) * 0.5
    vh, vw = 200, 180

    with torch.inference_mode():
        state = predictor.init_state(
            torch.from_numpy(images), video_height=vh, video_width=vw
        )
        # object 1: mask prompt on frame 1
        mask = np.zeros((vh, vw), bool)
        mask[60:120, 50:110] = True
        predictor.add_new_mask(state, frame_idx=1, obj_id=1, mask=torch.from_numpy(mask))
        # object 2: point prompt on frame 1
        _, _, masks_prompt = predictor.add_new_points_or_box(
            state,
            frame_idx=1,
            obj_id=2,
            points=np.array([[30.0, 150.0]], np.float32),
            labels=np.array([1], np.int32),
            normalize_coords=True,
        )
        out = {"images": images, "prompt_masks": masks_prompt.cpu().numpy()}
        for t, obj_ids, vmasks in predictor.propagate_in_video(state):
            out[f"fwd_{t}"] = vmasks.cpu().numpy()
        for t, obj_ids, vmasks in predictor.propagate_in_video(state, reverse=True):
            out[f"rev_{t}"] = vmasks.cpu().numpy()
        out["mask_prompt"] = mask
    np.savez_compressed(OUT / "predictor_video.npz", **out)
    print("wrote", OUT / "predictor_video.npz")


if __name__ == "__main__":
    main()
