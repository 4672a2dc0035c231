"""Deterministic synthetic NPZ corpus for curriculum cross-checks.

Shared between tools/gen_curriculum_fixture.py (which runs the REFERENCE
QuantumNPZRawDataset over it, /root/reference/training/dataset/
vos_raw_dataset.py:746-894) and tests/test_data_pipeline.py (which replays
the same corpus through this framework's port and compares stage
populations). First-frame entropy is controlled via the number of distinct
gray levels k: a 32-bin histogram of k equiprobable levels has entropy
~ln(k) nats, placed safely on either side of the dense threshold (2.5).
"""

from __future__ import annotations

import os

import numpy as np

# (name, gray levels k, has_gt) — ln(k): 4->1.39, 8->2.08, 10->2.30 (dense);
# 16->2.77, 20->3.00, 28->3.33 (expand-only; note ln(32)=3.47 < 3.5, so the
# reference's expand stage admits every video — faithful ports reproduce it)
SPEC = [
    ("vid_a_k4", 4, True),
    ("vid_b_k8", 8, True),
    ("vid_c_k10", 10, True),
    ("vid_d_k16", 16, True),
    ("vid_e_k20", 20, True),
    ("vid_f_k28", 28, True),
    ("vid_g_k4_nogt", 4, False),
    ("vid_h_k20_nogt", 20, False),
    ("vid_i_k8", 8, True),
    ("vid_j_k28", 28, True),
    ("vid_k_k4", 4, True),
    ("vid_l_k10", 10, True),
]

T, H, W = 4, 64, 64


def build_corpus(folder: str) -> list[str]:
    """Write the corpus; returns the video names."""
    os.makedirs(folder, exist_ok=True)
    rng = np.random.default_rng(20260818)
    for name, k, has_gt in SPEC:
        levels = np.linspace(10, 240, k).astype(np.uint8)
        imgs = levels[rng.integers(0, k, size=(T, H, W))]
        gts = np.zeros((T, H, W), np.uint8)
        if has_gt:
            gts[:, 20:40, 20:40] = 1
        np.savez(os.path.join(folder, f"{name}.npz"), imgs=imgs, gts=gts)
    return [s[0] for s in SPEC]


# AES corpus: [0, 1]-float images (the reference's entropy histogram uses
# range=(0, 1), vos_raw_dataset.py:583 — uint8 corpora all score ~0) with
# EMPTY first-frame masks so mask_complexity takes its exact 0.0 branch
# (:589-590; the nonzero branch needs skimage, absent both here and in the
# fixture generator's environment). Entropy = bits/5: k=2 -> 0.2 (dense),
# k=4 -> 0.4 (expand), k=16 -> 0.8 (full-only).
AES_SPEC = [
    ("aes_a_k2", 2),
    ("aes_b_k2", 2),
    ("aes_c_k4", 4),
    ("aes_d_k4", 4),
    ("aes_e_k16", 16),
    ("aes_f_k16", 16),
]


def build_aes_corpus(folder: str) -> list[str]:
    os.makedirs(folder, exist_ok=True)
    rng = np.random.default_rng(20260819)
    for name, k in AES_SPEC:
        levels = np.linspace(0.02, 0.95, k).astype(np.float32)
        imgs = levels[rng.integers(0, k, size=(T, H, W))]
        gts = np.zeros((T, H, W), np.uint8)
        gts[1:, 20:40, 20:40] = 1  # frame 0 empty
        np.savez(os.path.join(folder, f"{name}.npz"), imgs=imgs, gts=gts)
    return [s[0] for s in AES_SPEC]
