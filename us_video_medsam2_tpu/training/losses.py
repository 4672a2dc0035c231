"""Training losses.

Upstream multi-step multi-mask loss (reference training/loss_fns.py:20-306) plus
the fork's temporal-consistency losses (reference training/loss_fnsJ.py:74-389),
as pure jittable functions.

Structural recast for fixed shapes: per-frame outputs always carry `num_steps`
prediction steps (initial prompt + correction clicks); steps that did not run on
a frame are masked via `step_valid`, and padded object rows are masked via
`obj_valid`. `num_objects` is the valid-object count, `psum`-reduced across the
data-parallel mesh axis when present (reference loss_fns.py:169-174 all_reduce).

Note on the fork's temporal loss wiring: loss_fnsJ.py:457-460 applies the
temporal loss within each frame's `_forward` call, where the leading axis is the
object axis — despite the module docstrings describing smoothing across frames
([T,H,W]). Here we implement the documented intent: the temporal term runs over
the frame axis of the final-step mask logits, per object.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import jax
import jax.numpy as jnp

CORE_LOSS_KEY = "core_loss"


def _bce_with_logits(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def sigmoid_focal_loss(inputs, targets, alpha=0.25, gamma=2.0):
    """Per-element focal loss (reference loss_fns.py:52-92). [..., H, W] -> [..., H, W]."""
    prob = jax.nn.sigmoid(inputs)
    ce = _bce_with_logits(inputs, targets)
    p_t = prob * targets + (1 - prob) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss


def dice_loss_multimask(inputs, targets):
    """[N, M, H, W] -> [N, M] (reference loss_fns.py:20-49)."""
    p = jax.nn.sigmoid(inputs).reshape(*inputs.shape[:2], -1)
    t = targets.reshape(*targets.shape[:2], -1)
    numerator = 2 * (p * t).sum(-1)
    denominator = p.sum(-1) + t.sum(-1)
    return 1 - (numerator + 1) / (denominator + 1)


def iou_loss_multimask(inputs, targets, pred_ious, use_l1_loss=True):
    """[N, M, H, W], [N, M] -> [N, M] (reference loss_fns.py:95-123)."""
    pred = inputs.reshape(*inputs.shape[:2], -1) > 0
    gt = targets.reshape(*targets.shape[:2], -1) > 0
    area_i = (pred & gt).sum(-1).astype(jnp.float32)
    area_u = (pred | gt).sum(-1).astype(jnp.float32)
    actual = area_i / jnp.clip(area_u, min=1.0)
    if use_l1_loss:
        return jnp.abs(pred_ious - actual)
    return jnp.square(pred_ious - actual)


@dataclass(frozen=True)
class LossConfig:
    """weight_dict + options (reference GFTE_3.yaml:305-317, loss_fns.py:126-165)."""

    weight_mask: float = 20.0
    weight_dice: float = 1.0
    weight_iou: float = 1.0
    weight_class: float = 1.0
    weight_temporal: float = 0.0  # fork default 0.5 when temporal loss enabled
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    focal_alpha_obj_score: float = -1.0
    focal_gamma_obj_score: float = 0.0
    supervise_all_iou: bool = True
    iou_use_l1_loss: bool = True
    pred_obj_scores: bool = True
    temporal_variant: str = "consistency"  # 'consistency' | 'graph' | 'spectral'


def _step_losses(cfg: LossConfig, src_masks, target_masks, ious, object_score_logits):
    """One prediction step: [N, M, H, W] masks -> dict of [N] losses."""
    n, m = src_masks.shape[:2]
    tgt = jnp.broadcast_to(target_masks, src_masks.shape).astype(jnp.float32)
    src = src_masks.astype(jnp.float32)

    loss_multimask = sigmoid_focal_loss(
        src, tgt, cfg.focal_alpha, cfg.focal_gamma
    ).reshape(n, m, -1).mean(-1)
    loss_multidice = dice_loss_multimask(src, tgt)
    loss_multiiou = iou_loss_multimask(src, tgt, ious.astype(jnp.float32), cfg.iou_use_l1_loss)

    target_obj = jnp.any(tgt[:, 0].reshape(n, -1) > 0, axis=-1, keepdims=True).astype(
        jnp.float32
    )  # [N, 1]
    if cfg.pred_obj_scores:
        loss_class = sigmoid_focal_loss(
            object_score_logits.astype(jnp.float32),
            target_obj,
            cfg.focal_alpha_obj_score,
            cfg.focal_gamma_obj_score,
        ).mean(-1)  # [N]
    else:
        loss_class = jnp.zeros((n,), jnp.float32)

    if m > 1:
        combo = loss_multimask * cfg.weight_mask + loss_multidice * cfg.weight_dice
        best = jnp.argmin(combo, axis=-1)
        take = lambda x: jnp.take_along_axis(x, best[:, None], axis=1)[:, 0]
        loss_mask, loss_dice = take(loss_multimask), take(loss_multidice)
        loss_iou = loss_multiiou.mean(-1) if cfg.supervise_all_iou else take(loss_multiiou)
    else:
        loss_mask = loss_multimask[:, 0]
        loss_dice = loss_multidice[:, 0]
        loss_iou = loss_multiiou[:, 0]

    return {
        "loss_mask": loss_mask * target_obj[:, 0],
        "loss_dice": loss_dice * target_obj[:, 0],
        "loss_iou": loss_iou * target_obj[:, 0],
        "loss_class": loss_class,
    }


# --------------------------------------------------------------------- temporal
def temporal_consistency_loss(
    logits,  # [T, H, W]
    alpha=0.1,
    beta=0.05,
    threshold=0.1,
    low_penalty=0.1,
    high_penalty=1.0,
    use_semantic_weight=True,
):
    """Hybrid pairwise/graph/confidence-weighted loss (reference loss_fnsJ.py:74-170)."""
    t = logits.shape[0]
    if t < 2:
        return jnp.asarray(0.0, jnp.float32)
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))

    def flexible(d):
        return jnp.where(d < threshold, d * low_penalty, d * high_penalty)

    basic = jnp.abs(probs[1:] - probs[:-1]).mean(axis=(-1, -2))
    basic_loss = flexible(basic).mean()

    graph_loss = 0.0
    if t > 2:
        center, left, right = probs[1:-1], probs[:-2], probs[2:]
        gd = ((jnp.abs(center - left) + jnp.abs(center - right)) / 2.0).mean(
            axis=(-1, -2)
        )
        graph_loss = flexible(gd).mean()

    weighted_loss = 0.0
    if use_semantic_weight:
        confidence = 1.0 - 2.0 * jnp.abs(probs - 0.5)
        spatial_conf = confidence.mean(axis=(-1, -2))
        weights = jax.nn.softmax(spatial_conf * 5.0)[:, None, None]
        wp = probs * weights
        weighted_loss = jnp.abs(wp[1:] - wp[:-1]).mean()

    return alpha * basic_loss + beta * graph_loss + 0.05 * weighted_loss


def temporal_graph_consistency_loss(logits, alpha=0.1, beta=0.05, use_semantic_weight=True):
    """(reference loss_fnsJ.py:173-218)"""
    t = logits.shape[0]
    if t < 2:
        return jnp.asarray(0.0, jnp.float32)
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    basic = jnp.abs(probs[1:] - probs[:-1]).mean()
    graph = 0.0
    if t > 2:
        center, left, right = probs[1:-1], probs[:-2], probs[2:]
        graph = (jnp.abs(center - left) + jnp.abs(center - right)).mean() / 2.0
    weighted = 0.0
    if use_semantic_weight:
        conf = (1.0 - 2.0 * jnp.abs(probs - 0.5)).mean(axis=(-1, -2))
        w = jax.nn.softmax(conf * 5.0)[:, None, None]
        wp = probs * w
        weighted = jnp.abs(wp[1:] - wp[:-1]).mean()
    return alpha * basic + beta * graph + 0.05 * weighted


def spectral_temporal_regularizer(
    logits,  # [T, H, W]
    alpha=0.1,
    beta=0.05,
    phase_weight=0.02,
    freq_cutoff=0.3,
    adaptive_temp=0.1,
):
    """Chebyshev smoothness + rFFT high-freq + sliced Wasserstein + phase
    consistency with JS-confidence weights (reference loss_fnsJ.py:221-389)."""
    t = logits.shape[0]
    if t < 2:
        return jnp.asarray(0.0, jnp.float32)
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))[None, None]  # [1,1,T,H,W]

    # JS-divergence confidence weighting
    kl1 = probs * jnp.log((probs + 1e-8) / 0.5)
    kl2 = (1 - probs) * jnp.log((1 - probs + 1e-8) / 0.5)
    js = 0.5 * (kl1 + kl2).mean(axis=(-1, -2))  # [1,1,T]
    conf = jnp.exp(-adaptive_temp * js)
    weights = jax.nn.softmax(conf, axis=-1)[..., None, None]
    wp = probs * weights

    # spectral: 2nd-order Chebyshev of the temporal signal + rFFT high-freq term
    spectral = 0.0
    if t >= 3:
        sig = wp[0, 0].transpose(1, 2, 0).reshape(-1, t)  # [HW, T]
        x1 = jnp.zeros_like(sig)
        x1 = x1.at[:, 1 : t - 1].set(sig[:, 2:] + sig[:, :-2] - 2 * sig[:, 1:-1])
        lf = 1.0 * sig + (-2.0) * x1
        spectral = jnp.mean(lf**2)
        fft_vals = jnp.fft.rfft(sig, axis=1)
        freqs = jnp.fft.rfftfreq(t, d=1.0)
        mask = freqs > freq_cutoff
        if bool(mask.any()):
            high = jnp.mean(jnp.abs(fft_vals[:, mask]) ** 2)
            spectral = spectral + 0.5 * high

    # sliced Wasserstein between consecutive frames
    flat = wp[0, 0].reshape(t, -1)
    srt = jnp.sort(flat, axis=1)
    wasserstein = jnp.abs(srt[1:] - srt[:-1]).mean()

    # phase consistency
    phase_loss = 0.0
    if t >= 3:
        center = wp[0, 0][1:-1]
        grad = (wp[0, 0][2:] - wp[0, 0][:-2]) / 2.0
        phase = jnp.arctan2(grad, center + 1e-8)
        pd = jnp.abs(phase[1:] - phase[:-1])
        pd = jnp.where(pd > jnp.pi, 2 * jnp.pi - pd, pd)
        phase_loss = pd.mean()

    return alpha * spectral + beta * wasserstein + phase_weight * phase_loss


TEMPORAL_LOSSES = {
    "consistency": temporal_consistency_loss,
    "graph": temporal_graph_consistency_loss,
    "spectral": spectral_temporal_regularizer,
}


def multi_step_multimasks_and_ious(
    cfg: LossConfig,
    frame_outputs,  # list over processed frames: each a list over steps of
    #   dicts {"multimasks": [O, M, H, W] high-res logits, "ious": [O, M],
    #          "score": [O, 1], "valid": scalar bool}
    frame_targets,  # list over processed frames of [O, H, W] masks
    obj_valid,  # [O] bool — padded object rows
    final_logits_by_frame=None,  # [T, O, H, W] final-step logits in frame order
    num_objects: Optional[jnp.ndarray] = None,  # override (e.g. psum across DP)
) -> Dict[str, jnp.ndarray]:
    """Multi-step loss over all frames and prediction steps.

    Mirrors reference loss_fns.py:167-306 / loss_fnsJ.py:391-508: losses are
    divided by the (global) object count, summed over frames and steps. Steps
    that did not run (uncorrected frames under fixed-shape simulation) carry
    valid=False and contribute zero.
    """
    if num_objects is None:
        num_objects = jnp.clip(obj_valid.sum().astype(jnp.float32), min=1.0)
    ow = obj_valid.astype(jnp.float32)

    losses = {k: 0.0 for k in ("loss_mask", "loss_dice", "loss_iou", "loss_class")}
    for steps, target in zip(frame_outputs, frame_targets):
        tgt = target[:, None].astype(jnp.float32)  # [O, 1, H, W]
        for step in steps:
            out = _step_losses(cfg, step["multimasks"], tgt, step["ious"], step["score"])
            w = jnp.asarray(step["valid"], jnp.float32) * ow  # [O]
            for k in losses:
                losses[k] = losses[k] + (out[k] * w).sum() / num_objects

    if cfg.weight_temporal != 0.0 and final_logits_by_frame is not None:
        tl_fn = TEMPORAL_LOSSES[cfg.temporal_variant]
        per_obj = jax.vmap(tl_fn, in_axes=1)(final_logits_by_frame)  # [O]
        losses["loss_temporal"] = (per_obj * ow).sum() / jnp.clip(ow.sum(), min=1.0)
    else:
        losses["loss_temporal"] = jnp.asarray(0.0, jnp.float32)

    core = (
        losses["loss_mask"] * cfg.weight_mask
        + losses["loss_dice"] * cfg.weight_dice
        + losses["loss_iou"] * cfg.weight_iou
        + losses["loss_class"] * cfg.weight_class
        + losses["loss_temporal"] * cfg.weight_temporal
    )
    losses[CORE_LOSS_KEY] = core
    return losses


def multi_step_loss_stacked(
    cfg: LossConfig,
    stacked: Dict[str, jnp.ndarray],
    obj_valid: jnp.ndarray,  # [Bo] bool
    final_logits_by_frame: Optional[jnp.ndarray] = None,  # [T, Bo, H, W]
    num_objects: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Loss over the scan-stacked outputs of train_model.train_forward.

    stacked: step0_multimasks [T, Bo, 3, H, W], step0_ious [T, Bo, 3],
             step0_score [T, Bo, 1], corr_* with an extra step axis
             [T, S, Bo, ...], corr_valid [T, S], target [T, Bo, H, W].
    Identical math to the per-step reference loss, fully vectorized over
    (frame, step) by folding them into the object axis.
    """
    t, bo = stacked["target"].shape[:2]
    if num_objects is None:
        num_objects = jnp.clip(obj_valid.sum().astype(jnp.float32), min=1.0)
    ow = obj_valid.astype(jnp.float32)

    tgt = stacked["target"].astype(jnp.float32)[:, :, None]  # [T, Bo, 1, H, W]
    h, w = tgt.shape[-2:]

    # step-0 (always valid)
    l0 = _step_losses(
        cfg,
        stacked["step0_multimasks"].reshape(t * bo, 3, h, w),
        tgt.reshape(t * bo, 1, h, w),
        stacked["step0_ious"].reshape(t * bo, 3),
        stacked["step0_score"].reshape(t * bo, 1),
    )
    w0 = jnp.tile(ow, (t,))
    losses = {k: (v * w0).sum() / num_objects for k, v in l0.items()}

    # correction steps (masked by corr_valid)
    s = stacked["corr_multimasks"].shape[1]
    if s > 0:
        tgt_s = jnp.broadcast_to(tgt[:, None], (t, s, bo, 1, h, w))
        lc = _step_losses(
            cfg,
            stacked["corr_multimasks"].reshape(t * s * bo, 1, h, w),
            tgt_s.reshape(t * s * bo, 1, h, w),
            stacked["corr_ious"].reshape(t * s * bo, 1),
            stacked["corr_score"].reshape(t * s * bo, 1),
        )
        wc = (
            stacked["corr_valid"].astype(jnp.float32)[:, :, None] * ow[None, None, :]
        ).reshape(t * s * bo)
        for k in losses:
            losses[k] = losses[k] + (lc[k] * wc).sum() / num_objects

    if cfg.weight_temporal != 0.0 and final_logits_by_frame is not None:
        tl_fn = TEMPORAL_LOSSES[cfg.temporal_variant]
        per_obj = jax.vmap(tl_fn, in_axes=1)(final_logits_by_frame)
        losses["loss_temporal"] = (per_obj * ow).sum() / jnp.clip(ow.sum(), min=1.0)
    else:
        losses["loss_temporal"] = jnp.asarray(0.0, jnp.float32)

    losses[CORE_LOSS_KEY] = (
        losses["loss_mask"] * cfg.weight_mask
        + losses["loss_dice"] * cfg.weight_dice
        + losses["loss_iou"] * cfg.weight_iou
        + losses["loss_class"] * cfg.weight_class
        + losses["loss_temporal"] * cfg.weight_temporal
    )
    return losses
