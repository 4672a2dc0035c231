"""Batched multi-video propagation sharded over a device mesh (serving path).

The interactive predictor (video_predictor.py) drives ONE video with host-side
prompt state. Production serving wants the other shape: N independent videos,
one prompt each, propagated concurrently across chips.

TPU-native design: the video axis IS the model's existing batch axis. Every
model function (track_step, encode_memory, the memory bank) is already batched
over rows — the interactive predictor uses rows for objects sharing one
video's features; here each row is a different video with its own features.
Attention then runs at ordinary 4-D shapes ([N, 1, 1024, Lk]) where the Pallas
flash kernel's batch>=2 gate engages, and the whole propagation stays ONE
lax.scan. (A jax.vmap formulation was A/B-tested first: XLA's softmax+AV
output fusion degenerates into per-tile recompute under the extra batch dim —
619 of 759 ms device time vs 139 ms for this batch-axis form on the same
N=4 x T=16 work; docs/ROADMAP.md round-2 outcomes.)

Measured on v5e (batch 4 x 16 frames, 512^2): 175 ms/call end to end —
342 aggregate tracked frames/s on one chip, matching the single-video rate
while amortizing prompt/consolidation. Pass DEVICE-RESIDENT videos
(jax.device_put once): a [N, T, 512, 512, 3] f32 batch is ~200 MB, and
re-uploading it per call dominates everything else on remote-tunnel setups.

Sharding: the row axis is sharded over the mesh's data dimension with
jax.sharding — videos are independent, so XLA partitions the whole pipeline
with zero cross-chip collectives and throughput scales linearly over ICI.

The reference has no batched serving path at all (its predictor is stateful
per video, sam2_video_predictor.py). Per-video semantics match the
interactive predictor exactly (asserted in tests/test_serve_batch.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from us_video_medsam2_tpu.inference.video_predictor import SAM2VideoPredictor
from us_video_medsam2_tpu.models.memory_bank import init_memory_bank, write_memory


def _serve_impl(predictor: SAM2VideoPredictor, params, videos, coords, labels,
                *, num_frames: int, multimask: bool):
    """videos [N, T, ...] (prepare_images layout); coords [N, P, 2]; labels
    [N, P]. Returns low-res mask logits [N, T, 4fs, 4fs]."""
    model = predictor.model
    cfg = predictor.cfg
    n = videos.shape[0]
    hw = cfg.feat_size**2
    bank = init_memory_bank(
        n, num_frames, hw, cfg.mem_dim, cfg.hidden_dim,
        dtype=predictor.bank_dtype, ptr_dtype=jnp.float32,
    )

    def encode(images):  # [N, ...] — frame t of every video, rows = videos
        out = model.apply(params, images, method=model.forward_image)
        fpn = out["backbone_fpn"]
        feats = {"top": fpn[-1]}
        if cfg.use_high_res_features_in_sam:
            feats["s0"], feats["s1"] = fpn[0], fpn[1]
        return feats

    # ---- prompt frame 0 of every video at once
    feats0 = encode(videos[:, 0])
    out, _ = model.apply(
        params, jnp.asarray(0), feats0, bank, num_frames,
        coords, labels,
        is_init_cond_frame=True, is_cond_frame=True,
        multimask_output=multimask, run_mem_encoder=False,
        method=model.track_step,
    )
    # ---- consolidation (what propagate_in_video_preflight does per frame)
    maskmem = model.apply(
        params, feats0["top"],
        out["high_res_masks"].astype(jnp.float32),
        out["object_score_logits"].astype(jnp.float32),
        True,  # is_mask_from_pts
        method=model.encode_memory,
    )
    b, hm, wm, md = maskmem.shape
    bank = write_memory(
        bank, jnp.asarray(0), maskmem.reshape(b, hm * wm, md),
        out["obj_ptr"].astype(jnp.float32), True,
    )
    prompt_low = out["low_res_masks"][:, 0]  # [N, 4fs, 4fs]

    # ---- propagate 1..T-1 (the _propagate_impl scan at start=0, forward)
    def body(bank, t):
        feats = encode(videos[:, t])
        o_t, _ = model.apply(
            params, t, feats, bank, num_frames,
            multimask_output=True, write_bank=False, max_cond_slots=1,
            method=model.track_step,
        )
        bank = write_memory(
            bank, t,
            o_t["maskmem"].astype(bank.maskmem.dtype),
            o_t["obj_ptr"].astype(bank.obj_ptr.dtype),
            False,
        )
        return bank, o_t["low_res_masks"][:, 0]

    bank, lows = jax.lax.scan(
        body, bank, jnp.arange(1, num_frames, dtype=jnp.int32)
    )
    lows = jnp.concatenate([prompt_low[None], lows], axis=0)  # [T, N, ...]
    lows = jnp.swapaxes(lows, 0, 1)  # [N, T, 4fs, 4fs]
    if predictor.fill_hole_area > 0:
        from us_video_medsam2_tpu.ops.connected_components import (
            fill_holes_in_mask_scores,
        )

        lows = fill_holes_in_mask_scores(
            lows.reshape(n * num_frames, 1, *lows.shape[2:]),
            predictor.fill_hole_area,
        ).reshape(lows.shape)
    return lows


def batched_propagate(
    predictor: SAM2VideoPredictor,
    videos,            # [N, T, S, S, 3] float normalized at model resolution
    point_coords,      # [N, P, 2] model-resolution xy
    point_labels,      # [N, P] int
    mesh: Optional[jax.sharding.Mesh] = None,
    data_axis: str = "data",
):
    """Propagate N single-object videos concurrently; the video axis is
    sharded over `mesh`'s `data_axis` when a mesh is given (serving scale-out:
    N/devices videos per chip, zero cross-chip collectives)."""
    cfg = predictor.cfg
    videos = jnp.asarray(videos)
    t = videos.shape[1]
    coords = jnp.asarray(point_coords, jnp.float32)
    labels = jnp.asarray(point_labels, jnp.int32)
    num_pts = coords.shape[1]
    multimask = (
        cfg.multimask_output_in_sam
        and cfg.multimask_min_pt_num <= num_pts <= cfg.multimask_max_pt_num
    )

    key = (t, multimask, mesh, data_axis)
    cache = predictor.__dict__.setdefault("_serve_cache", {})
    fn = cache.get(key)
    if fn is None:
        def run(params, videos, coords, labels):
            nt = videos.shape[0] * videos.shape[1]
            prepared = predictor.model.prepare_images(
                videos.reshape(nt, *videos.shape[2:])
            )
            prepared = prepared.reshape(
                videos.shape[0], videos.shape[1], *prepared.shape[1:]
            )
            return _serve_impl(
                predictor, params, prepared, coords, labels,
                num_frames=t, multimask=multimask,
            )

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(mesh, P(data_axis))
            rep = NamedSharding(mesh, P())  # params replicated on every chip
            fn = jax.jit(run, in_shardings=(rep, sh, sh, sh), out_shardings=sh)
        else:
            fn = jax.jit(run)
        cache[key] = fn
    return fn(predictor.params, videos, coords, labels)
