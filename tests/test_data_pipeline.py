"""Dataset machinery: curricula staging, mixing loader, collation, transforms."""

import numpy as np
import pytest

from us_video_medsam2_tpu.training.data import (
    AESCurriculumNPZRawDataset,
    EvalSampler,
    FAPCurriculumNPZRawDataset,
    NPZRawDataset,
    QuantumNPZRawDataset,
    RandomUniformSampler,
    SignalCurriculumNPZRawDataset,
    TrainMixedVideoLoader,
    VOSDataset,
    collate_video_batch,
    default_train_transforms,
)


@pytest.fixture(scope="module")
def npz_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("npz")
    rng = np.random.default_rng(0)
    for i in range(6):
        t, h, w = 8, 40, 48
        # vary entropy: low-i videos are flat (low entropy), later ones noisy
        if i < 3:
            imgs = np.full((t, h, w), 60 + i, np.uint8)
        else:
            imgs = (rng.random((t, h, w)) * 255).astype(np.uint8)
        gts = np.zeros((t, h, w), np.uint8)
        gts[:, 10:25, 12:30] = 1
        np.savez_compressed(root / f"v{i}.npz", imgs=imgs, gts=gts)
    return str(root)


def test_quantum_curriculum_stages(npz_dir):
    ds = QuantumNPZRawDataset(npz_dir, milestones={"expand": 5, "full": 10})
    dense_n = len(ds)
    ds.set_epoch(5)
    expand_n = len(ds)
    ds.set_epoch(10)
    full_n = len(ds)
    assert full_n == 6
    assert dense_n <= expand_n <= full_n
    ds.force_stage("dense")
    assert len(ds) == dense_n


def test_aes_fap_signal_curricula(npz_dir):
    for cls in (AESCurriculumNPZRawDataset, FAPCurriculumNPZRawDataset):
        ds = cls(npz_dir)
        n0 = len(ds)
        ds.set_epoch(100)
        assert len(ds) == 6 and n0 <= 6
    ds = SignalCurriculumNPZRawDataset(npz_dir, max_epochs=10)
    ds.set_epoch(4)  # expand: stochastic stride 2
    assert ds.temporal_stride == 2 and ds.use_stochastic
    video, loader = ds.get_video(0)
    assert len(video.frames) in (4, 8)  # stochastic stride 1 or 2


def test_mixed_loader_batches(npz_dir):
    ds = VOSDataset(
        NPZRawDataset(npz_dir),
        RandomUniformSampler(num_frames=4, max_num_objects=2),
        transforms=default_train_transforms(64),
        max_num_objects=2,
    )
    loader = TrainMixedVideoLoader([ds], [2], max_num_objects=2, seed=0)
    batches = list(loader.get_loader(epoch=0))
    assert len(batches) >= 1
    b = batches[0]
    assert b["images"].shape == (4, 2, 64, 64, 3)
    assert b["masks"].shape == (4, 2, 2, 64, 64)
    assert b["obj_valid"].shape == (2, 2)
    assert b["obj_valid"][:, 0].all()  # first object slot always filled
    # host sharding splits batches
    l0 = TrainMixedVideoLoader([ds], [1], 2, seed=0, process_index=0, process_count=2)
    l1 = TrainMixedVideoLoader([ds], [1], 2, seed=0, process_index=1, process_count=2)
    n0, n1 = len(list(l0.get_loader(0))), len(list(l1.get_loader(0)))
    assert n0 + n1 >= 4


def test_eval_sampler_and_collate(npz_dir):
    ds = NPZRawDataset(npz_dir)
    video, loader = ds.get_video(0)
    sampled = EvalSampler().sample(video, loader)
    assert len(sampled.frames) == 8
    assert sampled.object_ids == [1]


def test_transforms_keep_consistency(npz_dir):
    ds = VOSDataset(
        NPZRawDataset(npz_dir),
        RandomUniformSampler(num_frames=3, max_num_objects=2),
        transforms=default_train_transforms(48),
    )
    dp = ds.get_datapoint(3)
    assert len(dp.images) == 3
    for img, masks in zip(dp.images, dp.masks):
        assert img.shape == (48, 48, 3)
        for m in masks.values():
            assert m.shape == (48, 48)
    out = collate_video_batch([dp], max_num_objects=3)
    assert out["masks"].shape == (3, 1, 3, 48, 48)


@pytest.fixture(scope="module")
def timevarying_npz_dir(tmp_path_factory):
    """Videos whose GT mask location encodes the frame index, so any
    frame/mask temporal misalignment is detectable."""
    root = tmp_path_factory.mktemp("npz_tv")
    rng = np.random.default_rng(1)
    for i in range(2):
        t, h, w = 10, 40, 48
        imgs = (rng.random((t, h, w)) * 255).astype(np.uint8)
        gts = np.zeros((t, h, w), np.uint8)
        for f in range(t):
            gts[f, f : f + 3, 5:15] = 1  # mask row == frame index
        np.savez_compressed(root / f"v{i}.npz", imgs=imgs, gts=gts)
    return str(root)


def _mask_row(mask):
    return int(np.nonzero(mask.any(axis=1))[0][0])


def test_signal_curriculum_stride_keeps_frame_mask_alignment(timevarying_npz_dir):
    ds = SignalCurriculumNPZRawDataset(timevarying_npz_dir, max_epochs=10)
    ds.set_epoch(4)  # expand stage: stride 2 (stochastically 1 or 2)
    ds.use_stochastic = False  # force stride 2 deterministically
    video, loader = ds.get_video(0)
    assert [f.frame_idx for f in video.frames] == [0, 2, 4, 6, 8]
    for f in video.frames:
        segs = loader.load(f.frame_idx)  # must not IndexError past T/2
        assert _mask_row(segs[1]) == f.frame_idx  # image & GT from SAME frame


def test_npz_sample_rate_keeps_frame_mask_alignment(timevarying_npz_dir):
    ds = NPZRawDataset(timevarying_npz_dir, sample_rate=2)
    video, loader = ds.get_video(0)
    assert [f.frame_idx for f in video.frames] == [0, 2, 4, 6, 8]
    for f in video.frames:
        assert _mask_row(loader.load(f.frame_idx)[1]) == f.frame_idx


def test_host_sharding_equal_batch_counts(npz_dir):
    # 6 videos over 4 hosts: naive striding gives hosts 2,2,1,1 batches; the
    # loader must pad (wrap) so every host yields the SAME count (a straggler
    # would deadlock the grad all-reduce at epoch end)
    def mk(rank, world):
        ds = VOSDataset(
            NPZRawDataset(npz_dir),
            RandomUniformSampler(num_frames=2, max_num_objects=1),
            transforms=default_train_transforms(32),
            max_num_objects=1,
        )
        return TrainMixedVideoLoader(
            [ds], [1], 1, seed=0, process_index=rank, process_count=world
        )

    counts = [len(list(mk(r, 4).get_loader(0))) for r in range(4)]
    assert len(set(counts)) == 1, counts
    assert counts[0] == 2  # ceil(6/4) = 2 with wrap padding


def test_random_resize_api_samples_per_call():
    from us_video_medsam2_tpu.training.data import RandomResizeAPI, VideoDatapoint

    tr = RandomResizeAPI([16, 32, 64])
    import random as _random

    _random.seed(0)
    seen = set()
    for _ in range(30):
        dp = VideoDatapoint(
            images=[np.zeros((40, 40, 3), np.float32)],
            masks=[{1: np.ones((40, 40), bool)}],
        )
        dp = tr(dp)
        seen.add(dp.images[0].shape[0])
    assert len(seen) > 1, "size must be drawn per datapoint, not once at init"


def test_vertical_flip_and_flare_stack(npz_dir):
    from us_video_medsam2_tpu.training.data import (
        RandomVerticalFlip,
        VideoDatapoint,
        flare_train_transforms,
    )
    import random as _random

    img = np.zeros((20, 20, 3), np.float32)
    img[2, :, :] = 1.0  # marker row near the top
    mask = np.zeros((20, 20), bool)
    mask[2, :] = True
    _random.seed(1)
    flipped = False
    for _ in range(20):
        dp = VideoDatapoint(images=[img.copy()], masks=[{1: mask.copy()}])
        dp = RandomVerticalFlip(p=0.5)(dp)
        if dp.images[0][17].sum() > 0:
            flipped = True
            assert dp.masks[1 - 1][1][17].all()  # mask flips WITH the image
            assert not dp.masks[0][1][2].any()
    assert flipped

    # the full FLARE stack runs end-to-end through VOSDataset
    ds = VOSDataset(
        NPZRawDataset(npz_dir),
        RandomUniformSampler(num_frames=3, max_num_objects=2),
        transforms=flare_train_transforms(48),
    )
    dp = ds.get_datapoint(3)
    assert len(dp.images) == 3 and dp.images[0].shape == (48, 48, 3)
