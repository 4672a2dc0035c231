"""Loss parity vs literal torch re-evaluations of reference training/loss_fns[J].py."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from us_video_medsam2_tpu.training.losses import (  # noqa: E402
    CORE_LOSS_KEY,
    LossConfig,
    multi_step_multimasks_and_ious,
    spectral_temporal_regularizer,
    temporal_consistency_loss,
)


def _torch_focal(inputs, targets, alpha, gamma):
    prob = inputs.sigmoid()
    ce = F.binary_cross_entropy_with_logits(inputs, targets, reduction="none")
    p_t = prob * targets + (1 - prob) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        loss = (alpha * targets + (1 - alpha) * (1 - targets)) * loss
    return loss


def _torch_step_losses(src, tgt, ious, score, num_objects, w_mask=20.0, w_dice=1.0):
    """reference loss_fns.py:222-299 (_update_losses) for one step."""
    tgt = tgt.expand_as(src)
    lm = _torch_focal(src, tgt, 0.25, 2.0).flatten(2).mean(-1) / num_objects
    p = src.sigmoid().flatten(2)
    t = tgt.flatten(2)
    ld = (1 - (2 * (p * t).sum(-1) + 1) / (p.sum(-1) + t.sum(-1) + 1)) / num_objects
    pm = src.flatten(2) > 0
    gm = tgt.flatten(2) > 0
    ai = (pm & gm).sum(-1).float()
    au = (pm | gm).sum(-1).float()
    actual = ai / au.clamp(min=1.0)
    li = (ious - actual).abs() / num_objects
    tobj = torch.any((tgt[:, 0] > 0).flatten(1), dim=-1)[..., None].float()
    lc = _torch_focal(score, tobj, -1.0, 0.0).mean(-1) / num_objects

    if lm.size(1) > 1:
        combo = lm * w_mask + ld * w_dice
        best = torch.argmin(combo, dim=-1)
        bi = torch.arange(combo.size(0))
        lm_s, ld_s = lm[bi, best][:, None], ld[bi, best][:, None]
        li_s = li.mean(dim=-1)[:, None]  # supervise_all_iou
    else:
        lm_s, ld_s, li_s = lm, ld, li
    return (
        (lm_s * tobj).sum(),
        (ld_s * tobj).sum(),
        (li_s * tobj).sum(),
        lc.sum(),
    )


def test_multistep_loss_matches_reference_math():
    torch.manual_seed(0)
    o, m, h = 3, 3, 32
    num_objects = float(o)
    steps_t = []
    frames = 2
    outs, tgts = [], []
    total = {"loss_mask": 0.0, "loss_dice": 0.0, "loss_iou": 0.0, "loss_class": 0.0}
    for _ in range(frames):
        tgt = (torch.rand(o, 1, h, h) > 0.6).float()
        steps = []
        for si, mm in enumerate([m, 1]):
            src = torch.randn(o, mm, h, h) * 3
            ious = torch.rand(o, mm)
            score = torch.randn(o, 1)
            lm, ld, li, lc = _torch_step_losses(src, tgt, ious, score, num_objects)
            total["loss_mask"] += lm.item()
            total["loss_dice"] += ld.item()
            total["loss_iou"] += li.item()
            total["loss_class"] += lc.item()
            steps.append(
                {
                    "multimasks": jnp.asarray(src.numpy()),
                    "ious": jnp.asarray(ious.numpy()),
                    "score": jnp.asarray(score.numpy()),
                    "valid": jnp.asarray(True),
                }
            )
        outs.append(steps)
        tgts.append(jnp.asarray(tgt[:, 0].numpy()))

    cfg = LossConfig()
    got = multi_step_multimasks_and_ious(
        cfg, outs, tgts, jnp.ones((o,), bool)
    )
    for k in total:
        np.testing.assert_allclose(float(got[k]), total[k], rtol=2e-4, atol=1e-5, err_msg=k)
    expected_core = (
        total["loss_mask"] * 20 + total["loss_dice"] + total["loss_iou"] + total["loss_class"]
    )
    np.testing.assert_allclose(float(got[CORE_LOSS_KEY]), expected_core, rtol=2e-4)


def test_step_valid_masks_out_steps():
    o, h = 2, 16
    src = jnp.asarray(np.random.default_rng(0).standard_normal((o, 1, h, h)), jnp.float32)
    step = {
        "multimasks": src,
        "ious": jnp.ones((o, 1)) * 0.5,
        "score": jnp.ones((o, 1)),
        "valid": jnp.asarray(False),
    }
    tgt = jnp.zeros((o, h, h))
    got = multi_step_multimasks_and_ious(
        LossConfig(), [[step]], [tgt], jnp.ones((o,), bool)
    )
    assert float(got[CORE_LOSS_KEY]) == 0.0


def _torch_temporal_consistency(logits, alpha=0.1, beta=0.05, threshold=0.1,
                                low_p=0.1, high_p=1.0):
    """literal re-eval of reference loss_fnsJ.py:74-170 on [T,H,W]."""
    x = logits.unsqueeze(0).unsqueeze(0)
    B, C, T, H, W = x.shape
    probs = torch.sigmoid(x)

    def flex(d):
        return torch.where(d < threshold, d * low_p, d * high_p)

    basic = (probs[:, :, 1:] - probs[:, :, :-1]).abs().mean(dim=[-1, -2])
    basic_loss = flex(basic).mean()
    graph_loss = torch.tensor(0.0)
    if T > 2:
        c, l, r = probs[:, :, 1:-1], probs[:, :, :-2], probs[:, :, 2:]
        gd = ((c - l).abs() + (c - r).abs()) / 2.0
        graph_loss = flex(gd.mean(dim=[-1, -2])).mean()
    conf = 1.0 - 2.0 * (probs - 0.5).abs()
    wts = F.softmax(conf.mean(dim=[-1, -2]) * 5.0, dim=-1).unsqueeze(-1).unsqueeze(-1)
    wl = (probs[:, :, 1:] * wts[:, :, 1:] - probs[:, :, :-1] * wts[:, :, :-1]).abs().mean()
    return alpha * basic_loss + beta * graph_loss + 0.05 * wl


def test_temporal_consistency_matches_reference():
    torch.manual_seed(1)
    x = torch.randn(5, 24, 24) * 2
    ref = _torch_temporal_consistency(x)
    got = temporal_consistency_loss(jnp.asarray(x.numpy()))
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-4, atol=1e-6)


def test_spectral_regularizer_finite():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((6, 16, 16)), jnp.float32)
    v = spectral_temporal_regularizer(x)
    assert np.isfinite(float(v))
    assert float(v) >= 0.0
