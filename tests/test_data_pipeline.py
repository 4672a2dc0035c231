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
