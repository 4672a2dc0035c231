"""Training-time forward: interactive-prompt simulation + video tracking.

TPU recast of reference training/model/sam2.py:25-541 (SAM2Train). The reference
drives prompt randomness with a host-side numpy RNG and python control flow;
here EVERYTHING is on-device and jit-stable:

- prompt mode (mask / box / point), number of initial conditioning frames,
  processing order, and correction-frame choice are traced values derived from
  the step's PRNG key; structural branches are `lax.cond`/`lax.switch`, so ONE
  compiled train step covers every simulation outcome (no per-plan recompiles).
- point prompts live in a fixed [B, 2 + num_correction_pt, 2] slot array with
  label -1 padding (the prompt encoder's own padding convention), so the
  correction-click loop is a static 7-iteration unroll with constant shapes.
- every prediction step emits a fixed number of outputs; steps that didn't run
  carry valid=False and are masked in the loss.

Known deviation from the reference (documented): SAM-head calls always see the
full padded point-slot count, while the reference grows the token count per
click. Padding tokens are the prompt encoder's standard not-a-point tokens, so
the model family is identical; the token count is just constant.
"""

from __future__ import annotations

from dataclasses import dataclass


import jax
import jax.numpy as jnp

from us_video_medsam2_tpu.core.config import SAM2Config
from us_video_medsam2_tpu.models.memory_bank import init_memory_bank, write_memory
from us_video_medsam2_tpu.models.sam2 import SAM2Model
from us_video_medsam2_tpu.training.prompt_sampling import (
    get_next_point,
    sample_box_points,
)


@dataclass(frozen=True)
class TrainSimConfig:
    """SAM2Train's simulation knobs (reference training/model/sam2.py:25-105;
    values from sam2/configs/GFTE_3.yaml:183-201)."""

    prob_to_use_pt_input: float = 0.5
    prob_to_use_box_input: float = 1.0
    num_frames_to_correct: int = 2
    rand_frames_to_correct: bool = True
    num_init_cond_frames: int = 2
    rand_init_cond_frames: bool = True
    add_all_frames_to_correct_as_cond: bool = True
    num_correction_pt_per_frame: int = 7
    pt_sampling_for_eval: str = "center"
    prob_to_sample_from_gt: float = 0.0
    # eval-time variants
    prob_to_use_pt_input_for_eval: float = 0.0
    num_init_cond_frames_for_eval: int = 1
    num_frames_to_correct_for_eval: int = 1


def _remat_policy():
    """Remat policy for the frame/correction checkpoints: recompute everything
    EXCEPT the flash-dropout fwd outputs (kernels/flash_dropout.py::FLASH_RESID)
    — the custom-vjp backward needs its (out, lse) anyway, so saving them
    removes one full fwd Pallas pass per memory-attention layer per step
    (round-3 trace: fwd+recompute+bwd was ~11 ms/step over 4 layers)."""
    from us_video_medsam2_tpu.kernels.flash_dropout import FLASH_RESID

    return jax.checkpoint_policies.save_only_these_names(FLASH_RESID)


def _sample_plan(rng, sim: TrainSimConfig, t: int, is_training: bool):
    """Traced prompt plan (reference prepare_prompt_inputs, model/sam2.py:146-267)."""
    k_pt, k_box, k_ninit, k_init, k_ncorr, k_corr = jax.random.split(rng, 6)
    p_pt = sim.prob_to_use_pt_input if is_training else sim.prob_to_use_pt_input_for_eval
    n_init_max = (
        sim.num_init_cond_frames if is_training else sim.num_init_cond_frames_for_eval
    )
    n_corr_max = (
        sim.num_frames_to_correct if is_training else sim.num_frames_to_correct_for_eval
    )
    if t == 1:
        p_pt, n_init_max, n_corr_max = 1.0, 1, 1

    use_pt = jax.random.bernoulli(k_pt, p_pt)
    use_box = jax.random.bernoulli(k_box, sim.prob_to_use_box_input)
    mode = jnp.where(use_pt, jnp.where(use_box, 1, 0), 2)  # 0=point 1=box 2=mask

    if sim.rand_init_cond_frames and n_init_max > 1 and is_training:
        n_init = jax.random.randint(k_ninit, (), 1, n_init_max + 1)
    else:
        n_init = jnp.asarray(n_init_max, jnp.int32)

    # init frames: frame 0 + (n_init - 1) random others
    r = jax.random.uniform(k_init, (t,)).at[0].set(-1.0)
    rank = jnp.argsort(jnp.argsort(r))  # rank[frame] among random keys; frame0 rank 0
    is_init = rank < n_init  # [T]

    # processing order: init frames (ascending), then the rest ascending
    order = jnp.argsort(jnp.where(is_init, 0, 1) * t + jnp.arange(t))

    # correction frames: init frames + extra random non-init (point input only);
    # uniform in [n_init, n_corr_max] (reference model/sam2.py:196-203)
    if sim.rand_frames_to_correct and n_corr_max > 1 and is_training:
        n_corr = jax.random.randint(k_ncorr, (), n_init, n_corr_max + 1)
        n_corr = jnp.maximum(n_corr, n_init)
    else:
        n_corr = jnp.maximum(jnp.asarray(n_corr_max, jnp.int32), n_init)
    r2 = jnp.where(is_init, jnp.inf, jax.random.uniform(k_corr, (t,)))
    rank2 = jnp.argsort(jnp.argsort(r2))
    extra = rank2 < (n_corr - n_init)
    should_correct = (is_init | extra) & use_pt

    return {
        "mode": mode,
        "use_pt": use_pt,
        "n_init": n_init,
        "is_init": is_init,
        "order": order,
        "should_correct": should_correct,
    }


def _tile3(x):
    """Replicate a single-mask channel to 3 — loss-equivalent to the reference's
    single-channel case (argmin/mean over identical channels is identity)."""
    return jnp.repeat(x, 3, axis=1) if x.shape[1] == 1 else x


def train_forward(
    model: SAM2Model,
    params,
    rng: jax.Array,
    images: jnp.ndarray,  # [T, B, H, W, 3] normalized
    masks: jnp.ndarray,  # [T, B, O, H, W] bool
    sim: TrainSimConfig,
    is_training: bool = True,
    dropout_rng: jax.Array = None,
):
    """Returns (frame_outputs, frame_targets, final_logits_by_frame [T,Bo,H,W]).

    frame_outputs/targets are indexed by processing position (loss is a sum over
    frames, so ordering is irrelevant there); final logits are scattered back to
    frame order for the temporal-consistency loss.
    """
    cfg: SAM2Config = model.cfg
    t, b, h, w, _ = images.shape
    o = masks.shape[2]
    bo = b * o
    n_corr_pts = sim.num_correction_pt_per_frame
    p_slots = 2 + n_corr_pts
    pt_method = "uniform" if is_training else sim.pt_sampling_for_eval

    k_plan, k_loop = jax.random.split(rng)
    plan = _sample_plan(k_plan, sim, t, is_training)

    # ---- image features for all frames at once (hottest compute, one batch) ----
    be = model.apply(
        params,
        images.reshape(t * b, h, w, 3),
        not is_training,
        t,
        method=model.forward_image,
        rngs={"dropout": dropout_rng} if dropout_rng is not None else None,
    )
    fpn = be["backbone_fpn"]

    def per_obj(x):  # [T*B, ...] -> [T, B*O, ...] sharing features across objects
        x = x.reshape(t, b, *x.shape[1:])
        return jnp.repeat(x, o, axis=1)

    top_all = per_obj(fpn[-1])
    if cfg.use_high_res_features_in_sam:
        s0_all, s1_all = per_obj(fpn[0]), per_obj(fpn[1])

    bank = init_memory_bank(
        bo, t, cfg.feat_size**2, cfg.mem_dim, cfg.hidden_dim
    )

    def heads(pix, coords, labels, mask_in, hr, multimask):
        return model.apply(
            params,
            pix,
            coords,
            labels,
            mask_in,
            hr,
            multimask,
            is_training,
            method=model.sam_heads,
        )

    # ------------------------------------------------------------------------
    # Frame loop as lax.scan (bank is the carry); the correction-click loop is a
    # nested scan. Each model subgraph (heads/memory-attention/...) appears once
    # in the HLO instead of T*(3 + n_corr) times — an order of magnitude less
    # compile work than a python-unrolled loop, identical numerics.
    # ------------------------------------------------------------------------
    pos_keys = jax.random.split(k_loop, t)
    is_init_pos = jnp.arange(t) < plan["n_init"]

    def pack(out, pix, coords, labels):
        ious = out["ious"]
        if ious.shape[1] == 1:
            ious = jnp.repeat(ious, 3, axis=1)
        return {
            "multimasks": _tile3(out["high_res_multimasks"]).astype(jnp.float32),
            "ious": ious.astype(jnp.float32),
            "score": out["object_score_logits"].astype(jnp.float32),
            "low": out["low_res_masks"].astype(jnp.float32),
            "high": out["high_res_masks"].astype(jnp.float32),
            "obj_ptr": out["obj_ptr"].astype(jnp.float32),
            "pix": pix,
            "coords": coords,
            "labels": labels,
        }

    def frame_body(bank, xs):
        i, ti, is_init, key = xs
        keys = jax.random.split(key, 3 + n_corr_pts)
        top = jnp.take(top_all, ti, axis=0)
        hr = None
        if cfg.use_high_res_features_in_sam:
            hr = [jnp.take(s0_all, ti, axis=0), jnp.take(s1_all, ti, axis=0)]
        gt = jnp.take(masks, ti, axis=0).reshape(bo, 1, h, w)  # [Bo,1,H,W] bool
        should_correct = plan["should_correct"][ti]

        coords0 = jnp.zeros((bo, p_slots, 2), jnp.float32)
        labels0 = -jnp.ones((bo, p_slots), jnp.int32)

        def init_branch(bank_):
            no_mem = model.apply(params, top, method=model.no_mem_features)

            def point_fn():
                pts, lbls = get_next_point(gt, None, pt_method, keys[0])
                c = coords0.at[:, 0].set(pts[:, 0])
                l = labels0.at[:, 0].set(lbls[:, 0])
                out = heads(no_mem, c, l, None, hr, True)
                return pack(out, no_mem, c, l)

            def box_fn():
                pts, lbls = sample_box_points(gt, keys[1])
                c = coords0.at[:, 0:2].set(pts)
                l = labels0.at[:, 0:2].set(lbls)
                out = heads(no_mem, c, l, None, hr, False)
                return pack(out, no_mem, c, l)

            def mask_fn():
                out = model.apply(
                    params,
                    top,
                    hr,
                    gt[:, 0, :, :, None].astype(jnp.float32),
                    method=model.use_mask_as_output,
                )
                return pack(out, no_mem, coords0, labels0)

            return jax.lax.switch(plan["mode"], [point_fn, box_fn, mask_fn])

        def track_branch(bank_):
            pix = model.apply(
                params,
                ti,
                top,
                bank_,
                t,
                False,
                is_training,
                not is_training,  # deterministic=False in training (dropout 0.1,
                # reference memory_attention dropout)
                method=model.condition_on_memory,
                rngs={"dropout": keys[2]} if is_training else None,
            )
            out = heads(pix, coords0, labels0, None, hr, True)
            return pack(out, pix, coords0, labels0)

        step0 = jax.lax.cond(is_init, init_branch, track_branch, bank)

        # ---- correction-click scan (reference _iter_correct_pt_sampling:448-541) ----
        def corr_body(carry, xs2):
            j, kj = xs2

            def corr_fn(carry):
                pred = carry["high"] > 0  # [Bo,1,H,W]
                if is_training and sim.prob_to_sample_from_gt > 0:
                    kg, ks = jax.random.split(kj)
                    from_gt = jax.random.bernoulli(kg, sim.prob_to_sample_from_gt)
                    pred = pred & ~from_gt
                else:
                    ks = kj
                new_pts, new_lbls = get_next_point(gt, pred, pt_method, ks)
                c = carry["coords"].at[:, 2 + j].set(new_pts[:, 0])
                l = carry["labels"].at[:, 2 + j].set(new_lbls[:, 0])
                mask_in = carry["low"][:, 0, :, :, None]  # prev logits as mask prompt
                out = heads(carry["pix"], c, l, mask_in, hr, False)
                return pack(out, carry["pix"], c, l)

            carry = jax.lax.cond(should_correct, corr_fn, lambda c: c, carry)
            step_out = {
                "multimasks": carry["multimasks"][:, :1],
                "ious": carry["ious"][:, :1],
                "score": carry["score"],
            }
            return carry, step_out

        # remat: recompute each correction step's activations in backward instead
        # of storing S copies (reference use_act_ckpt_iterative_pt_sampling,
        # training/model/sam2.py:493-501)
        carry, corr_steps = jax.lax.scan(
            jax.checkpoint(corr_body, prevent_cse=False, policy=_remat_policy()),
            step0,
            (jnp.arange(n_corr_pts), keys[3 : 3 + n_corr_pts]),
        )

        # ---- memory encoding + bank write ----
        maskmem = model.apply(
            params,
            top,
            carry["high"],
            carry["score"],
            plan["use_pt"],
            is_training,
            method=model.encode_memory,
        )
        bhm, hm, wm, md = maskmem.shape
        is_cond = plan["is_init"][ti]
        if sim.add_all_frames_to_correct_as_cond:
            is_cond = is_cond | should_correct
        bank = write_memory(
            bank,
            ti,
            maskmem.reshape(bhm, hm * wm, md),
            carry["obj_ptr"],
            is_cond,
        )

        outputs = {
            "step0_multimasks": step0["multimasks"],
            "step0_ious": step0["ious"],
            "step0_score": step0["score"],
            "corr_multimasks": corr_steps["multimasks"],  # [S, Bo, 1, H, W]
            "corr_ious": corr_steps["ious"],
            "corr_score": corr_steps["score"],
            "corr_valid": jnp.broadcast_to(should_correct, (n_corr_pts,)),
            "target": gt[:, 0],
            "final_high": carry["high"][:, 0],
            "frame_idx": ti,
        }
        return bank, outputs

    xs = (jnp.arange(t), plan["order"], is_init_pos, pos_keys)
    bank, stacked = jax.lax.scan(
        jax.checkpoint(frame_body, prevent_cse=False, policy=_remat_policy()), bank, xs
    )

    # finals scattered back to frame order for the temporal loss
    finals = jnp.zeros((t, bo, cfg.image_size, cfg.image_size), jnp.float32)
    finals = finals.at[stacked["frame_idx"]].set(stacked["final_high"])
    return stacked, finals
