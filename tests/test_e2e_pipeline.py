"""End-to-end smoke: synthetic NPZ videos -> training CLI -> video-eval CLI.

Mirrors the reference's two main workflows (train on NPZ videos with curriculum
+ prompt simulation; deterministic Dice eval with CSVs) on the tiny64 config.
"""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def npz_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("npz_videos")
    rng = np.random.default_rng(0)
    for vi in range(3):
        t, h, w = 6, 96, 80
        imgs = (rng.random((t, h, w)) * 255).astype(np.uint8)
        gts = np.zeros((t, h, w), np.uint8)
        for ti in range(t):
            y, x = 30 + ti, 25 + ti
            gts[ti, y : y + 25, x : x + 20] = 1
            gts[ti, 5 : 20, 50 : 70] = 2
            imgs[ti][gts[ti] == 1] = 220  # make the object visually distinct
        np.savez_compressed(root / f"video_{vi}.npz", imgs=imgs, gts=gts)
    return str(root)


def test_train_cli_runs(npz_dataset, tmp_path):
    from us_video_medsam2_tpu.apps.train import main

    out = tmp_path / "work"
    main(
        [
            "--data_dir", npz_dataset,
            "--out_dir", str(out),
            "--cfg", "tiny64_test",
            "--epochs", "1",
            "--num_frames", "2",
            "--max_num_objects", "2",
            "--resolution", "64",
            "--batch_size", "1",
            "--curriculum", "quantum",
            "--temporal_loss", "consistency",
        ]
    )
    stats = [
        json.loads(line) for line in open(out / "train_stats.json")
    ]
    assert len(stats) == 1
    assert np.isfinite(stats[0]["Losses/train_all_loss"])
    assert os.path.exists(out / "checkpoint.npz")
    assert os.path.exists(out / "config_resolved.json")


def test_eval_cli_runs(npz_dataset, tmp_path):
    from us_video_medsam2_tpu.apps.infer_video import main

    out = tmp_path / "eval"
    main(
        [
            "--data_dir", npz_dataset,
            "--out_dir", str(out),
            "--cfg", "tiny64_test",
        ]
    )
    csv_path = out / "metrics.csv"
    assert csv_path.exists()
    rows = open(csv_path).read().strip().splitlines()
    assert rows[0].startswith("video,class")
    assert any(r.startswith("ALL,") for r in rows)


def test_recist_cli_runs(tmp_path):
    from us_video_medsam2_tpu.apps.infer_ct_recist import main

    rng = np.random.default_rng(1)
    data_dir = tmp_path / "recist"
    data_dir.mkdir()
    d, h, w = 6, 96, 96
    imgs = (rng.random((d, h, w)) * 255).astype(np.uint8)
    recist = np.zeros((d, h, w), np.uint8)
    recist[3, 40, 30:60] = 1  # horizontal diameter line on slice 3
    np.savez_compressed(
        data_dir / "case0.npz", imgs=imgs, recist=recist, spacing=np.array([1.0, 1.0, 1.0])
    )
    out = tmp_path / "pred"
    main(
        [
            "--imgs_path", str(data_dir),
            "--pred_save_dir", str(out),
            "--cfg", "tiny64_test",
        ]
    )
    seg = np.load(out / "case0.npz")["segs"]
    assert seg.shape == (d, h, w)
    assert (out / "inference_time.csv").exists()


def test_checkpoint_reload_through_build(npz_dataset, tmp_path):
    """Native training checkpoints load back through the predictor builders
    (regression: .npz routing between torch-importer and native restore)."""
    from us_video_medsam2_tpu.apps.train import main as train_main
    from us_video_medsam2_tpu.core.build import build_sam2_video_predictor_npz

    out = tmp_path / "work"
    train_main(
        [
            "--data_dir", npz_dataset,
            "--out_dir", str(out),
            "--cfg", "tiny64_test",
            "--epochs", "1",
            "--num_frames", "2",
            "--max_num_objects", "2",
            "--resolution", "64",
            "--curriculum", "none",
        ]
    )
    # resume: re-invoking with more epochs continues from the saved state
    # (reference auto-resume, train_utils.py:281-288)
    train_main(
        [
            "--data_dir", npz_dataset,
            "--out_dir", str(out),
            "--cfg", "tiny64_test",
            "--epochs", "2",
            "--num_frames", "2",
            "--max_num_objects", "2",
            "--resolution", "64",
            "--curriculum", "none",
        ]
    )
    import json
    stats = [json.loads(l) for l in open(out / "train_stats.json")]
    assert [s_["epoch"] for s_ in stats] == [0, 1]  # second run resumed at epoch 1

    predictor = build_sam2_video_predictor_npz(
        "tiny64_test", str(out / "checkpoint.npz")
    )
    import numpy as np

    video = (np.random.default_rng(0).random((3, 96, 80, 3)) * 255).astype(np.uint8)
    state = predictor.init_state(video, 96, 80, max_objects=1)
    predictor.add_new_points_or_box(
        state, 0, 1, points=np.array([[40.0, 48.0]]), labels=np.array([1])
    )
    frames = [fi for fi, _, _ in predictor.propagate_in_video(state)]
    assert frames == [0, 1, 2]


def test_verify_real_ckpt_harness(npz_dataset, tmp_path):
    """tools/verify_real_ckpt.py end to end: train a tiny checkpoint, then the
    one-command verifier imports it, runs the reference video-eval protocol
    (medsam2_infer_video.py:390-469), writes the CSV, and gates on Dice."""
    import sys

    from us_video_medsam2_tpu.apps.train import main as train_main

    out = tmp_path / "work"
    train_main(
        [
            "--data_dir", npz_dataset,
            "--out_dir", str(out),
            "--cfg", "tiny64_test",
            "--epochs", "1",
            "--num_frames", "2",
            "--max_num_objects", "2",
            "--resolution", "64",
            "--curriculum", "none",
        ]
    )
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import verify_real_ckpt

    eval_dir = tmp_path / "verify"
    rc = verify_real_ckpt.main(
        [
            str(out / "checkpoint.npz"),
            "--data_dir", npz_dataset,
            "--cfg", "tiny64_test",
            "--out_dir", str(eval_dir),
            "--cases", "2",
        ]
    )
    assert rc == 0
    csv_path = eval_dir / "evaluation_summary.csv"
    rows = open(csv_path).read().strip().splitlines()
    assert rows[0].startswith("video,class")
    assert any(r.startswith("ALL,") for r in rows)
    # an untrained tiny model cannot hit Dice 0.99 -> the gate must FAIL
    rc = verify_real_ckpt.main(
        [
            str(out / "checkpoint.npz"),
            "--data_dir", npz_dataset,
            "--cfg", "tiny64_test",
            "--out_dir", str(eval_dir),
            "--cases", "1",
            "--expect_dice", "0.999",
        ]
    )
    assert rc == 1
