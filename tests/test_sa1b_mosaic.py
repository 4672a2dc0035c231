"""SA1B dataset (lazy RLE images-as-videos) + mosaic augmentation."""

import json

import numpy as np
import pytest


def test_sa1b_dataset(tmp_path):
    from PIL import Image

    from us_video_medsam2_tpu.inference.amg import mask_to_rle
    from us_video_medsam2_tpu.training.data import SA1BRawDataset

    img_dir = tmp_path / "imgs"
    gt_dir = tmp_path / "gts"
    img_dir.mkdir()
    gt_dir.mkdir()
    rng = np.random.default_rng(0)
    h, w = 48, 64
    for i in range(2):
        Image.fromarray((rng.random((h, w, 3)) * 255).astype(np.uint8)).save(
            img_dir / f"sa_{i}.jpg"
        )
        m1 = np.zeros((h, w), bool)
        m1[10:30, 15:40] = True
        m2 = np.zeros((h, w), bool)
        m2[5:12, 50:60] = True
        annots = [
            {"segmentation": mask_to_rle(m1), "area": int(m1.sum())},
            {"segmentation": mask_to_rle(m2), "area": int(m2.sum())},
        ]
        (gt_dir / f"sa_{i}.json").write_text(json.dumps({"annotations": annots}))

    ds = SA1BRawDataset(str(img_dir), str(gt_dir))
    assert len(ds) == 2
    video, loader = ds.get_video(0)
    assert len(video.frames) == 1
    segs = loader.load(0)
    assert len(segs) == 2
    assert segs[0].sum() == 20 * 25


def test_mosaic_augmentation():
    from us_video_medsam2_tpu.training.data import RandomMosaicVideoAPI, VideoDatapoint

    rng = np.random.default_rng(0)
    imgs = [rng.random((64, 64, 3)).astype(np.float32) for _ in range(2)]
    mask = np.zeros((64, 64), bool)
    mask[20:40, 20:40] = True
    dp = VideoDatapoint(list(imgs), [{1: mask.copy()} for _ in range(2)])
    aug = RandomMosaicVideoAPI(prob=1.0)
    out = aug(dp)
    for fi in range(2):
        assert out.images[fi].shape == (64, 64, 3)
        m = out.masks[fi][1]
        # target mask confined to a single 32x32 cell with the same relative blob
        assert m.sum() == 10 * 10
        ys, xs = np.where(m)
        assert ys.max() - ys.min() < 32 and xs.max() - xs.min() < 32
