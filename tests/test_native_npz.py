"""Native C++ NPZ reader: exactness vs numpy, prefetcher behavior."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module", autouse=True)
def enable_native():
    os.environ["UVMS2_NATIVE_NPZ"] = "1"
    # reset the module-level lib cache so the env var takes effect
    import us_video_medsam2_tpu.training.native_npz as nn

    nn._lib = None
    nn._tried = False
    yield
    os.environ.pop("UVMS2_NATIVE_NPZ", None)
    nn._lib = None
    nn._tried = False


def test_native_matches_numpy(tmp_path):
    from us_video_medsam2_tpu.training.native_npz import load_npz, native_available

    if not native_available():
        pytest.skip("native npz reader not built (no g++/zlib)")
    rng = np.random.default_rng(0)
    p = str(tmp_path / "x.npz")
    arrays = {
        "imgs": (rng.random((7, 33, 41)) * 255).astype(np.uint8),
        "gts": (rng.random((7, 33, 41)) * 3).astype(np.uint8),
        "spacing": np.array([1.0, 0.7, 0.7], np.float64),
        "recist": rng.integers(0, 2, (7, 33, 41)).astype(np.int32),
    }
    np.savez_compressed(p, **arrays)
    out = load_npz(p)
    assert set(out) == set(arrays)
    for k in arrays:
        np.testing.assert_array_equal(out[k], arrays[k], err_msg=k)

    # uncompressed npz too (stored entries)
    p2 = str(tmp_path / "y.npz")
    np.savez(p2, a=arrays["imgs"])
    np.testing.assert_array_equal(load_npz(p2)["a"], arrays["imgs"])


def test_prefetching_loader(tmp_path):
    from us_video_medsam2_tpu.training.native_npz import PrefetchingNPZLoader

    rng = np.random.default_rng(1)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"v{i}.npz")
        np.savez_compressed(p, imgs=(rng.random((4, 16, 16)) * 255).astype(np.uint8))
        paths.append(p)
    loader = PrefetchingNPZLoader(num_workers=2, ahead=2)
    for p in paths:
        loader.schedule(p)
    for p in paths:
        out = loader.get(p)
        assert out["imgs"].shape == (4, 16, 16)


def test_npz_dataset_with_prefetcher(tmp_path):
    """NPZRawDataset(prefetch_workers>0) yields identical videos to the
    synchronous path (read-ahead wiring, training/data.py)."""
    import numpy as np

    from us_video_medsam2_tpu.training.data import NPZRawDataset

    rng = np.random.default_rng(0)
    for i in range(3):
        np.savez(
            tmp_path / f"case{i}.npz",
            imgs=(rng.random((4, 16, 16)) * 255).astype(np.uint8),
            gts=(rng.random((4, 16, 16)) > 0.7).astype(np.uint8),
        )
    ds_sync = NPZRawDataset(str(tmp_path))
    ds_pre = NPZRawDataset(str(tmp_path), prefetch_workers=2)
    assert len(ds_sync) == len(ds_pre) == 3
    for i in range(3):
        v1, l1 = ds_sync.get_video(i)
        v2, l2 = ds_pre.get_video(i)
        assert v1.video_name == v2.video_name
        np.testing.assert_array_equal(v1.frames[0].data, v2.frames[0].data)
        np.testing.assert_array_equal(l1.masks, l2.masks)
