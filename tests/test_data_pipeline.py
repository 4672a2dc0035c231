"""Dataset machinery: curricula staging, mixing loader, collation, transforms."""

import os
import random

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


def test_quantum_curriculum_matches_reference_fixture(tmp_path):
    """Stage populations replayed against the REFERENCE QuantumNPZRawDataset
    run on the identical synthetic corpus (tools/gen_curriculum_fixture.py →
    tests/fixtures/curriculum_quantum.json; reference
    vos_raw_dataset.py:746-894). Covers the GT-presence parent filter, the
    dense entropy threshold, the destructive expand/full narrowing, the
    epoch→stage schedule, and the <5-survivor floor."""
    import json

    from curriculum_corpus import build_corpus

    fix_path = os.path.join(os.path.dirname(__file__), "fixtures", "curriculum_quantum.json")
    with open(fix_path) as f:
        fix = json.load(f)
    folder = str(tmp_path / "corpus")
    build_corpus(folder)

    ds = QuantumNPZRawDataset(folder, milestones={"expand": 20, "full": 50})
    assert sorted(ds.video_names) == fix["dense"]
    ds.set_epoch(19)
    assert ds.stage == fix["epoch19_stage"]
    ds.set_epoch(20)
    assert ds.stage == fix["epoch20_stage"]
    ds.set_epoch(25)
    assert sorted(ds.video_names) == fix["expand"]
    ds.set_epoch(60)
    assert sorted(ds.video_names) == fix["full"]

    floor_list = str(tmp_path / "floor.txt")
    with open(floor_list, "w") as f:
        f.write("\n".join(
            ["vid_a_k4", "vid_l_k10", "vid_d_k16", "vid_e_k20", "vid_f_k28", "vid_j_k28"]
        ))
    ds3 = QuantumNPZRawDataset(
        folder, milestones={"expand": 20, "full": 50}, file_list_txt=floor_list
    )
    assert sorted(ds3.video_names) == fix["floor_dense"]

    # the opt-in intended-monotone mode DOES grow back to the full GT'd list
    ds4 = QuantumNPZRawDataset(
        folder, milestones={"expand": 20, "full": 50}, refilter_from_all=True
    )
    dense_n = len(ds4.video_names)
    ds4.set_epoch(60)
    assert len(ds4.video_names) == 10 >= dense_n


def test_neurospectral_matches_reference_fixture(tmp_path):
    """Score formula (full FFT of the frame-mean signal, DC in the low band),
    ascending order, and the 30/60/100% stage slices — replayed against the
    reference class (vos_raw_dataset.py:638-744) via the shared fixture."""
    import json

    from curriculum_corpus import build_corpus

    from us_video_medsam2_tpu.training.data import NeuroSpectralNPZRawDataset

    fix_path = os.path.join(os.path.dirname(__file__), "fixtures", "curriculum_quantum.json")
    with open(fix_path) as f:
        fix = json.load(f)
    folder = str(tmp_path / "corpus")
    build_corpus(folder)
    ds = NeuroSpectralNPZRawDataset(folder, milestones={"expand": 20, "full": 50})
    for name, score in fix["neuro_scores"].items():
        assert ds.video_scores[name] == pytest.approx(score, rel=1e-9)
    assert list(ds.video_names) == fix["neuro_dense"]
    ds.set_epoch(25)
    assert list(ds.video_names) == fix["neuro_expand"]
    ds.set_epoch(60)
    assert list(ds.video_names) == fix["neuro_full"]


def test_aes_curriculum_matches_reference_fixture(tmp_path):
    """Entropy formula (range=(0,1) histogram, log2, /5), per-stage thresholds,
    and the adaptive-factor trajectory — replayed against the reference class
    (vos_raw_dataset.py:470-636) via the shared fixture. Mask complexity takes
    its exact empty-mask 0.0 branch (the nonzero branch needs skimage, absent
    in both environments; our numpy port of perimeter/euler is separately
    smoke-tested below)."""
    import json

    from curriculum_corpus import build_aes_corpus

    fix_path = os.path.join(os.path.dirname(__file__), "fixtures", "curriculum_quantum.json")
    with open(fix_path) as f:
        fix = json.load(f)
    folder = str(tmp_path / "aes")
    build_aes_corpus(folder)
    ds = AESCurriculumNPZRawDataset(folder, milestones={"expand": 20, "full": 50})
    for name, ent in fix["aes_entropies"].items():
        assert ds.sample_entropies[name] == pytest.approx(ent, rel=1e-9)
    assert list(ds.video_names) == fix["aes_dense"]
    ds.set_epoch(25)
    assert list(ds.video_names) == fix["aes_expand"]
    ds.set_epoch(60)
    assert list(ds.video_names) == fix["aes_full"]
    ds2 = AESCurriculumNPZRawDataset(folder, milestones={"expand": 20, "full": 50})
    for loss in (0.5, 0.05, 0.05, 0.5):
        ds2.set_epoch(0, training_loss=loss)
    assert ds2.adaptive_factor == pytest.approx(fix["aes_adaptive_factor"], rel=1e-12)
    # a video is loadable through the stage-aware path (conditional scaling)
    video, seg = ds.get_video(0)
    assert video.frames[0].data.max() <= 1.0


class TestMaskComplexityTruthTable:
    """Hand-computed truth table for the numpy ports of
    skimage.measure.perimeter(neighbourhood=4) / euler_number — the functions
    the reference AES curriculum calls (sam2_datasets.py:1014-1027,
    vos_raw_dataset.py:592-595; skimage is not installed in this image).
    Every expected value below is derived by hand from skimage's published
    algorithms: perimeter = weighted border-pixel codes after 4-connected
    erosion (weights 1 / sqrt2 / (1+sqrt2)/2, isolated px -> 0); Euler number
    = Gray's bit-quad counts, 8-connectivity default."""

    def test_perimeter_truth_table(self):
        from us_video_medsam2_tpu.training.data import _perimeter_2d

        rt2 = np.sqrt(2.0)
        # (mask builder, expected perimeter, why)
        cases = []
        px = np.zeros((5, 5), np.uint8)
        px[2, 2] = 1
        cases.append((px, 0.0, "isolated pixel: border code 1 -> weight 0"))
        ln = np.zeros((5, 5), np.uint8)
        ln[2, 1:4] = 1
        cases.append((ln, 1.0, "1x3 line: ends code 3 -> 0, middle code 5 -> 1"))
        for n, grid in ((3, 7), (4, 8), (10, 20)):
            sq = np.zeros((grid, grid), np.uint8)
            sq[2 : 2 + n, 2 : 2 + n] = 1
            cases.append((sq, 4.0 * (n - 1), f"{n}x{n} square: 4*(n-1)"))
        ring = np.zeros((7, 7), np.uint8)
        ring[2:5, 2:5] = 1
        ring[3, 3] = 0
        cases.append((ring, 8.0, "3x3 ring: hole doesn't change border codes"))
        two = np.zeros((12, 12), np.uint8)
        two[1:4, 1:4] = 1
        two[7:10, 7:10] = 1
        cases.append((two, 16.0, "two 3x3 blobs: 8 + 8"))
        corner = np.zeros((6, 6), np.uint8)
        corner[0:3, 0:3] = 1
        cases.append((corner, 8.0, "border-touching: image edge = background"))
        dp = np.zeros((4, 4), np.uint8)
        dp[1, 1] = dp[2, 2] = 1
        cases.append((dp, 0.0, "diagonal pair: both code 11 -> weight 0"))
        plus = np.zeros((5, 5), np.uint8)
        plus[2, 1:4] = 1
        plus[1:4, 2] = 1
        cases.append((plus, 4 * rt2, "plus: 4 arm tips at code 21 -> sqrt2"))
        d4 = np.zeros((6, 6), np.uint8)
        for i in range(4):
            d4[i + 1, i + 1] = 1
        cases.append((d4, 2 * rt2, "diag line of 4: middles code 21, ends 11"))
        for mask, want, why in cases:
            got = _perimeter_2d(mask)
            assert got == pytest.approx(want, abs=1e-9), f"{why}: {got} != {want}"

    def test_euler_truth_table(self):
        from us_video_medsam2_tpu.training.data import _euler_number_2d

        sq = np.zeros((7, 7), np.uint8)
        sq[2:5, 2:5] = 1
        assert _euler_number_2d(sq) == 1  # one component, no hole
        ring = sq.copy()
        ring[3, 3] = 0
        assert _euler_number_2d(ring) == 0  # one component, one hole
        two = np.zeros((12, 12), np.uint8)
        two[1:4, 1:4] = 1
        two[7:10, 7:10] = 1
        assert _euler_number_2d(two) == 2  # two components
        px = np.zeros((5, 5), np.uint8)
        px[2, 2] = 1
        assert _euler_number_2d(px) == 1
        assert _euler_number_2d(px, connectivity=1) == 1
        dp = np.zeros((4, 4), np.uint8)
        dp[1, 1] = dp[2, 2] = 1
        # 8-conn: one component; 4-conn: two components (Qd flips sign)
        assert _euler_number_2d(dp) == 1
        assert _euler_number_2d(dp, connectivity=1) == 2
        d4 = np.zeros((6, 6), np.uint8)
        for i in range(4):
            d4[i + 1, i + 1] = 1
        assert _euler_number_2d(d4) == 1
        assert _euler_number_2d(d4, connectivity=1) == 4

    def test_complexity_end_to_end(self):
        from us_video_medsam2_tpu.training.data import AESCurriculumNPZRawDataset

        sq = np.zeros((7, 7), np.uint8)
        sq[2:5, 2:5] = 1
        # perim/area*0.1 + |E|*0.1 = 8/9*0.1 + 0.1 (reference :592-595)
        got = AESCurriculumNPZRawDataset._mask_complexity(sq)
        assert got == pytest.approx(8.0 / 9.0 * 0.1 + 0.1, rel=1e-6)
        assert AESCurriculumNPZRawDataset._mask_complexity(np.zeros((7, 7))) == 0.0


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


# ------------------------------------------------------------- RandomAffine
class TestRandomAffineFidelity:
    """Parity with reference transforms.py:332-441 / torchvision F.affine:
    the matrix math is checked against an independent torch grid_sample
    implementation of torchvision's documented tensor path."""

    def _dp(self, t=2, h=64, w=64, seed=0):
        from us_video_medsam2_tpu.training.data import VideoDatapoint

        rng = np.random.default_rng(seed)
        # smooth image so interpolation-backend differences stay small
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        base = 0.5 + 0.3 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
        imgs = [np.repeat(base[:, :, None], 3, axis=2) + 0.01 * i for i in range(t)]
        masks = []
        for _ in range(t):
            m = np.zeros((h, w), bool)
            m[20:40, 25:45] = True
            masks.append({1: m})
        return VideoDatapoint(images=imgs, masks=masks)

    def test_matrix_matches_torch_grid_sample(self):
        """cv2 warp with our inverse matrix == torchvision's tensor-path warp
        (affine_grid semantics, align_corners=False) on interior pixels."""
        import torch
        import torch.nn.functional as F

        from us_video_medsam2_tpu.training.data import affine_inverse_matrix

        h = w = 64
        dp = self._dp(t=1, h=h, w=w)
        img = dp.images[0]
        angle, translate, scale, shear = 17.0, (3, -2), 1.15, (8.0, 0.0)

        import cv2

        m = affine_inverse_matrix(
            (w * 0.5 - 0.5, h * 0.5 - 0.5), angle, translate, scale, shear
        )
        ours = cv2.warpAffine(
            img, m, (w, h), flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
            borderValue=(0, 0, 0),
        )

        # torchvision tensor path: same inverse matrix about center-origin,
        # sampled through grid_sample in normalized coords
        m0 = affine_inverse_matrix((0.0, 0.0), angle, translate, scale, shear)
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        xc = xs - (w - 1) / 2.0
        yc = ys - (h - 1) / 2.0
        xin = m0[0, 0] * xc + m0[0, 1] * yc + m0[0, 2]
        yin = m0[1, 0] * xc + m0[1, 1] * yc + m0[1, 2]
        grid = torch.from_numpy(
            np.stack([xin / (w * 0.5), yin / (h * 0.5)], -1)[None]
        ).float()
        timg = torch.from_numpy(np.ascontiguousarray(img)).permute(2, 0, 1)[None]
        ref = F.grid_sample(
            timg, grid, mode="bilinear", padding_mode="zeros", align_corners=False
        )[0].permute(1, 2, 0).numpy()

        # compare where the sample came from well inside the source image
        interior = (
            (xin > 2) & (xin < w - 3) & (yin > 2) & (yin < h - 3)
        )[:, :, None] & np.ones((1, 1, 3), bool)
        assert interior.sum() > 3 * h * w // 8  # enough coverage to be meaningful
        np.testing.assert_allclose(ours[interior], ref[interior], atol=2e-2)
        # and they agree to high precision on average (catches any half-pixel
        # center-convention error, which shifts everything by >= 0.5 px)
        assert float(np.abs(ours[interior] - ref[interior]).mean()) < 2e-3

    def test_integer_translate_exact_and_mean_fill(self):
        from us_video_medsam2_tpu.training.data import RandomAffine

        dp = self._dp(t=1)
        img0 = dp.images[0].copy()
        aff = RandomAffine(
            degrees=0.0, shear=None, translate=(0.25, 0.25), num_retries=50
        )
        random.seed(3)
        out = aff(dp)
        # find the applied integer shift from the mask
        m0 = np.zeros((64, 64), bool)
        m0[20:40, 25:45] = True
        got = out.masks[0][1]
        ys, xs = np.where(got)
        ty, tx = ys.min() - 20, xs.min() - 25
        assert (abs(int(tx)), abs(int(ty))) != (0, 0)
        expect = np.roll(np.roll(img0, int(ty), axis=0), int(tx), axis=1)
        hh, ww = img0.shape[:2]
        inner = np.zeros((hh, ww), bool)
        ys0 = slice(max(0, ty), min(hh, hh + ty))
        xs0 = slice(max(0, tx), min(ww, ww + tx))
        inner[ys0, xs0] = True
        np.testing.assert_allclose(
            out.images[0][inner], expect[inner], atol=1e-5
        )
        # border fill = reference image_mean scaled to the 0-1 pipeline
        fill = np.asarray([123, 116, 103], np.float32) / 255.0
        outer = ~inner
        assert outer.sum() > 0
        np.testing.assert_allclose(
            out.images[0][outer], np.broadcast_to(fill, (outer.sum(), 3)), atol=1e-5
        )

    def test_inconsistent_transform_varies_per_frame(self):
        from us_video_medsam2_tpu.training.data import RandomAffine

        dp = self._dp(t=4)
        for i in range(1, 4):
            dp.images[i] = dp.images[0].copy()  # identical frames in
        aff = RandomAffine(
            degrees=20.0, shear=10.0, consistent_transform=False, num_retries=50
        )
        random.seed(0)
        out = aff(dp)
        diffs = [
            float(np.abs(out.images[0] - out.images[i]).max()) for i in range(1, 4)
        ]
        assert max(diffs) > 1e-3, "per-frame affines must differ"

        # consistent_transform=True keeps identical frames identical
        dp2 = self._dp(t=3)
        for i in range(1, 3):
            dp2.images[i] = dp2.images[0].copy()
        aff2 = RandomAffine(degrees=20.0, shear=10.0, num_retries=50)
        random.seed(0)
        out2 = aff2(dp2)
        for i in range(1, 3):
            np.testing.assert_allclose(out2.images[0], out2.images[i], atol=1e-6)

    def test_invalid_interpolation_raises(self):
        from us_video_medsam2_tpu.training.data import RandomAffine

        with pytest.raises(NotImplementedError):
            RandomAffine(image_interpolation="nearest")

    def test_first_frame_visibility_retry_returns_original(self):
        from us_video_medsam2_tpu.training.data import RandomAffine, VideoDatapoint

        h = w = 64
        img = np.random.default_rng(0).random((h, w, 3)).astype(np.float32)
        mask = np.zeros((h, w), bool)
        mask[0:2, 0:2] = True  # corner object: large translates push it out
        dp = VideoDatapoint(images=[img.copy()], masks=[{1: mask.copy()}])
        aff = RandomAffine(
            degrees=0.0, shear=None, translate=(0.9, 0.9), num_retries=3
        )
        random.seed(1)
        for _ in range(40):
            out = aff(dp)
            ok = out.masks[0][1].any()
            if not ok:
                break
            # either untouched (gave up -> original mask) or still visible
            assert out.masks[0][1].any()

    def test_get_params_distribution(self):
        """Sampling semantics of torchvision get_params: integer-pixel
        translations bounded by fraction*size, scalar shear is x-only."""
        from us_video_medsam2_tpu.training.data import affine_get_params

        random.seed(0)
        for _ in range(200):
            angle, (tx, ty), scale, (sx, sy) = affine_get_params(
                [-25, 25], (0.1, 0.2), (0.7, 1.4), [-20, 20], (64, 32)
            )
            assert -25 <= angle <= 25
            assert isinstance(tx, int) and isinstance(ty, int)
            assert abs(tx) <= round(0.1 * 64) and abs(ty) <= round(0.2 * 32)
            assert 0.7 <= scale <= 1.4
            assert -20 <= sx <= 20 and sy == 0.0


# --------------------------------------------- MedSAM2 curriculum datasets
class TestMedSAM2CurriculumDatasets:
    """reference vos_raw_dataset.py:70-194: stage-directory curriculum +
    stochastic temporal jittering."""

    @pytest.fixture()
    def tree(self, tmp_path):
        rng = np.random.default_rng(0)
        for stage, n in [("dense", 2), ("expand", 3), ("full", 2)]:
            d = tmp_path / stage / "uterine_niche"
            d.mkdir(parents=True)
            for i in range(n):
                t = 12
                np.savez(
                    d / f"case_{i}.npz",
                    imgs=(rng.random((t, 8, 8, 3)) * 255).astype(np.uint8),
                    masks=(rng.random((t, 8, 8)) > 0.5).astype(np.uint8),
                )
        # 'full' stage also present WITHOUT the uterine_niche subdir elsewhere
        return str(tmp_path)

    def test_stage_switching_and_lengths(self, tree):
        from us_video_medsam2_tpu.training.data import MedSAM2CurriculumDataset2

        ds = MedSAM2CurriculumDataset2(tree, {"expand": 5, "full": 10})
        assert ds.stage == "dense" and len(ds) == 2
        assert ds.update_curriculum_stage(4) is False
        assert ds.update_curriculum_stage(5) is True and ds.stage == "expand"
        assert len(ds) == 3
        assert ds.update_curriculum_stage(10) is True and ds.stage == "full"
        assert ds.update_curriculum_stage(11) is False

    def test_dense_takes_first_frame_full_takes_all(self, tree):
        from us_video_medsam2_tpu.training.data import MedSAM2CurriculumDataset2

        ds = MedSAM2CurriculumDataset2(tree, {})
        item = ds[0]
        assert item["num_frames"] == 1 and item["images"].shape == (1, 8, 8, 3)
        ds.update_curriculum_stage(60)  # full
        item = ds[0]
        assert item["num_frames"] == 12
        assert item["images"].dtype == np.float32
        assert item["video_id"] == "case_0"

    def test_expand_deterministic_vs_stochastic_stride(self, tree):
        from us_video_medsam2_tpu.training.data import (
            MedSAM2CurriculumDataset,
            MedSAM2CurriculumDataset2,
        )

        base = MedSAM2CurriculumDataset(tree, {"expand": 0, "full": 99})
        base.update_curriculum_stage(1)
        base.temporal_stride = 3
        assert base._sample_indices(12) == [0, 3, 6, 9]

        ds = MedSAM2CurriculumDataset2(tree, {"expand": 0, "full": 99})
        ds.update_curriculum_stage(1)
        ds.temporal_stride = 3
        random.seed(0)
        draws = [tuple(ds._sample_indices(12)) for _ in range(50)]
        assert len(set(draws)) > 1, "jittering must vary the indices"
        for d in draws:
            assert len(d) == 4
            for slot, idx in enumerate(d):
                lo = slot * 3
                assert lo <= idx <= min(lo + 2, 11)

    def test_jitter_sampling_distribution_uniform_in_window(self, tree):
        """Each stride window picks uniformly among its offsets (reference
        :160-171 torch.randint(0, stride))."""
        from us_video_medsam2_tpu.training.data import MedSAM2CurriculumDataset2

        ds = MedSAM2CurriculumDataset2(tree, {"expand": 0, "full": 99})
        ds.update_curriculum_stage(1)
        ds.temporal_stride = 4
        random.seed(123)
        n = 4000
        counts = np.zeros(4, np.int64)
        for _ in range(n):
            idx = ds._sample_indices(16)[1]  # window [4, 8)
            counts[idx - 4] += 1
        freq = counts / n
        np.testing.assert_allclose(freq, 0.25, atol=0.03)
        # clamped tail window: offsets past T-1 pile onto the last frame
        random.seed(7)
        tail = [ds._sample_indices(14)[3] for _ in range(2000)]  # window [12, 14)
        tail = np.asarray(tail)
        assert set(tail.tolist()) <= {12, 13}
        # offsets 1,2,3 clamp to 13 -> P(13) ~ 3/4
        assert abs((tail == 13).mean() - 0.75) < 0.05

    def test_error_fallthrough_to_next_index(self, tree):
        from us_video_medsam2_tpu.training.data import MedSAM2CurriculumDataset2

        ds = MedSAM2CurriculumDataset2(tree, {})
        # corrupt sample 0
        with open(os.path.join(ds.target_path, ds.samples[0]), "wb") as f:
            f.write(b"not an npz")
        item = ds[0]
        assert item is not None and item["video_id"] == "case_1"


def test_mixed_epoch_order_follows_multinomial_law():
    """The per-step dataset draw must follow the reference's multinomial
    mixing law (sam2_datasets.py:141-178): each slot is an independent draw
    from dataset_prob, the epoch stopping the first time an exhausted dataset
    is drawn."""
    from us_video_medsam2_tpu.training.data import mixed_epoch_order

    from itertools import islice

    prob = [0.8, 0.2]
    counts = [10**9, 10**9]  # effectively inexhaustible
    first_draws = []
    draws = []
    for ep in range(400):
        rng = np.random.default_rng(ep)
        order = list(islice(mixed_epoch_order(counts, prob, rng), 50))
        first_draws.append(order[0])
        draws.extend(order)
    f0 = draws.count(0) / len(draws)
    assert abs(f0 - 0.8) < 0.02, f0  # 20k draws: CI(0.8) ~ +-0.006
    # independence of the first draw across epochs
    f_first = first_draws.count(0) / len(first_draws)
    assert abs(f_first - 0.8) < 0.07, f_first

    # stop semantics: drawing an exhausted dataset ends the epoch, so a run
    # can never contain more than `count` picks of a dataset and it stops
    # exactly when one side runs dry and is drawn again
    rng = np.random.default_rng(123)
    order = list(mixed_epoch_order([5, 5], prob, rng, exhaustion="stop"))
    assert order.count(0) <= 5 and order.count(1) <= 5
    assert order.count(0) == 5 or order.count(1) == 5

    # renormalize semantics (upstream __next__, sam2_datasets.py:180-201):
    # every batch of every dataset is consumed exactly once
    rng = np.random.default_rng(123)
    order = list(mixed_epoch_order([5, 3], prob, rng, exhaustion="renormalize"))
    assert order.count(0) == 5 and order.count(1) == 3 and len(order) == 8


def test_mixed_loader_two_datasets_multinomial(npz_dir):
    """End-to-end: two datasets with distinct batch sizes are interleaved by
    per-step draws; 'stop' truncates at the first exhausted draw while
    'renormalize' drains both."""

    def mk(bs):
        return VOSDataset(
            NPZRawDataset(npz_dir),
            RandomUniformSampler(num_frames=2, max_num_objects=1),
            transforms=default_train_transforms(32),
            max_num_objects=1,
        )

    def provenance(loader):
        # batch size identifies the source dataset
        return [b["images"].shape[1] for b in loader.get_loader(0)]

    kw = dict(max_num_objects=1, seed=3, dataset_prob=[0.5, 0.5])
    stop = TrainMixedVideoLoader([mk(1), mk(2)], [1, 2], **kw)
    sizes = provenance(stop)
    # 6 videos: 6 bs-1 batches + 3 bs-2 batches available
    assert sizes.count(1) <= 6 and sizes.count(2) <= 3
    assert sizes.count(1) == 6 or sizes.count(2) == 3, sizes

    renorm = TrainMixedVideoLoader(
        [mk(1), mk(2)], [1, 2], exhaustion="renormalize", **kw
    )
    sizes = provenance(renorm)
    assert sizes.count(1) == 6 and sizes.count(2) == 3, sizes
    assert sorted(set(sizes)) == [1, 2]
