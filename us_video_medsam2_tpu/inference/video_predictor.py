"""Interactive video predictor — the TPU recast of SAM2VideoPredictor[NPZ].

API mirrors reference sam2/sam2_video_predictor_npz.py (init_state /
add_new_points_or_box / add_new_mask / propagate_in_video / reset_state), but the
inference state is an explicit pytree and whole-video propagation is ONE compiled
`lax.scan` over frames — no per-frame dispatch, no host round-trips, no
recompilation across frames (the memory bank is fixed-shape, SURVEY §5).

Workflow parity notes:
- prompt calls run track_step with run_mem_encoder=False; memories for prompted
  (conditioning) frames are encoded once at propagation preflight with
  is_mask_from_pts=True — exactly the reference's consolidation behavior
  (sam2_video_predictor.py:593-660, `_run_memory_encoder`).
- hole filling (fill_hole_area) applies to low-res logits after each tracked
  frame (reference `_run_single_frame_inference`, misc.py:312-339) — on device
  via ops/connected_components.py instead of the CUDA `_C` extension.
- every object is tracked as a batch row; the same frame features are shared
  across objects (reference `_get_image_feature` expand, predictor:879-910).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from us_video_medsam2_tpu.core.config import SAM2Config
from us_video_medsam2_tpu.inference.transforms import (
    preprocess_images,
    transform_boxes,
    transform_coords,
)
from us_video_medsam2_tpu.models.memory_bank import (
    MemoryBank,
    init_memory_bank,
    write_memory,
)
from us_video_medsam2_tpu.models.sam2 import SAM2Model, apply_non_overlapping_constraints
from us_video_medsam2_tpu.ops.connected_components import fill_holes_in_mask_scores
from us_video_medsam2_tpu.ops.resize import resize2d

NO_OBJ_SCORE = -1024.0


@dataclasses.dataclass
class VideoPredictorState:
    """Mutable host-side handle; device arrays inside are replaced functionally."""

    images: Optional[jnp.ndarray]  # [Tb, S, S, 3] device frames (None if offloaded)
    video_height: int
    video_width: int
    num_frames: int
    max_objects: int
    bank: MemoryBank
    # long-video support (reference offload_video_to_cpu/offload_state_to_cpu,
    # sam2_video_predictor.py:47-77): host-resident folded frame store + a bank
    # whose slot axis is padded to a size bucket so videos of different lengths
    # share compiled programs
    bucket: int = 0  # bank slot count (== num_frames when not bucketed)
    images_host: Optional[np.ndarray] = None  # [T, ...folded...] host frames
    offloaded: bool = False
    obj_ids: List[int] = dataclasses.field(default_factory=list)
    # per cond frame: obj_idx -> dict(high_res_masks, obj_ptr, score) pending memory encode
    pending: Dict[int, Dict[int, Dict]] = dataclasses.field(default_factory=dict)
    # per cond frame low-res logits for yielding without recompute
    cond_low_res: Dict[int, jnp.ndarray] = dataclasses.field(default_factory=dict)
    frames_tracked: Dict[int, Dict] = dataclasses.field(default_factory=dict)
    # obj_idx -> set of frames that received point/mask input — the reference's
    # point_inputs_per_obj/mask_inputs_per_obj record (predictor:79-80), needed
    # by clear_all_prompts_in_frame / remove_object
    prompt_frames: Dict[int, set] = dataclasses.field(default_factory=dict)

    def obj_idx(self, obj_id: int) -> int:
        if obj_id in self.obj_ids:
            return self.obj_ids.index(obj_id)
        assert len(self.obj_ids) < self.max_objects, (
            f"too many objects: allocate init_state(..., max_objects>{self.max_objects})"
        )
        self.obj_ids.append(obj_id)
        return len(self.obj_ids) - 1


class SAM2VideoPredictor:
    def __init__(
        self,
        model: SAM2Model,
        params,
        fill_hole_area: int = 8,
        non_overlap_masks: bool = False,
        bank_dtype=jnp.bfloat16,
        precompute_features_batch: int = 0,
        clear_non_cond_mem_around_input: bool = False,
        clear_non_cond_mem_for_multi_obj: bool = False,
    ):
        self.model = model
        self.params = params
        self.cfg: SAM2Config = model.cfg
        self.fill_hole_area = fill_hole_area
        self.non_overlap_masks = non_overlap_masks
        # correction-click memory scrubbing (reference predictor:27-30): when on,
        # prompting a frame invalidates surrounding non-conditioning memories so
        # stale appearance info can't contradict the correction (single-object
        # only unless clear_non_cond_mem_for_multi_obj)
        self.clear_non_cond_mem_around_input = clear_non_cond_mem_around_input
        self.clear_non_cond_mem_for_multi_obj = clear_non_cond_mem_for_multi_obj
        # reference predictor stores spatial memories in bf16 (predictor:944)
        self.bank_dtype = bank_dtype
        # 0/1 = encode per frame inside the scan (lowest memory); N>1 = encode
        # all frames in batches of N before the scan (fastest)
        self.precompute_batch = precompute_features_batch
        self._encode_frame = jax.jit(self._encode_frame_impl)
        # num_frames is a TRACED argument throughout (the bank's static slot
        # count comes from its shape): distinct video lengths within one slot
        # bucket share compiled programs instead of recompiling per length
        prompt_statics = ("multimask", "is_init", "use_mask", "has_prev", "video_hw")
        self._prompt = jax.jit(self._prompt_full_impl, static_argnames=prompt_statics)
        self._prompt_frame = jax.jit(self._prompt_impl, static_argnames=prompt_statics)
        self._finalize = jax.jit(self._finalize_full_impl)
        self._finalize_frame = jax.jit(self._finalize_impl)
        self._propagate = jax.jit(
            self._propagate_impl,
            static_argnames=("reverse", "max_cond_slots", "clear_radius"),
        )
        self._propagate_chunk = jax.jit(
            self._propagate_chunk_impl,
            static_argnames=(
                "chunk_len", "reverse", "max_cond_slots", "clear_radius",
                "images_are_chunk",
            ),
        )
        self._prep_chunk = jax.jit(self._prep_chunk_impl)
        self._to_video_res = jax.jit(self._to_video_res_impl, static_argnames=("hw",))
        self._clear_window = jax.jit(
            self._clear_window_impl, static_argnames=("radius",)
        )
        self._downgrade_frame = jax.jit(self._downgrade_frame_impl)
        self._permute_rows = jax.jit(self._permute_rows_impl)

    # ------------------------------------------------------------- state mgmt
    @staticmethod
    def _round_bucket(t: int) -> int:
        """Next power-of-two slot bucket, min 16 (37 -> 64, 64 -> 64, 1000 -> 1024)."""
        b = 16
        while b < t:
            b *= 2
        return b

    def _prep_chunk_impl(self, chunk):
        """Device preprocessing for one host chunk: normalize (if uint8) + fold."""
        x = chunk
        if x.dtype == jnp.uint8:
            x = preprocess_images(x, self.cfg.image_size)
        return self.model.prepare_images(x)

    def init_state(
        self,
        images,
        video_height: int,
        video_width: int,
        max_objects: int = 1,
        t_bucket=None,
        offload_video_to_host: bool = False,
        io_chunk: int = 32,
        host_dtype=np.float16,
    ) -> VideoPredictorState:
        """images: [T, S, S, 3] float normalized at model resolution (the NPZ
        predictor contract, reference sam2_video_predictor_npz.py:44-63), or
        [T, H, W, 3] uint8 to be preprocessed here.

        Long-video options (reference offload_video_to_cpu / offload_state_to_cpu,
        sam2_video_predictor.py:47-77):
        - t_bucket: None keeps the exact-shape session (bank slots == T).
          "auto" pads the bank's slot axis (and the device video, if resident)
          to the next power-of-two bucket, so every video length in a bucket
          reuses one compiled propagation program. An int pins the bucket.
        - offload_video_to_host: keep the (folded, preprocessed) frames in host
          RAM as `host_dtype` and feed them to the device chunk-by-chunk during
          propagation — HBM holds only one chunk of frames + the fixed-shape
          bank. Implies t_bucket="auto". host_dtype=np.float16 halves host RAM
          (~1e-3 relative quantization on normalized pixels); use np.float32
          for bit-exactness vs the device-resident path.
        - The reference's offload_state_to_cpu has no separate switch here: all
          per-frame outputs already stream to host numpy, and the bank is a
          fixed-shape bf16 store bounded by the bucket
          (O x bucket x (mem_hw x mem_dim + hidden) — ~134 MB/object at a
          1024 bucket for hiera-t512), so there is nothing video-length-shaped
          left in HBM to offload.
        """
        t = int(images.shape[0]) if hasattr(images, "shape") else len(images)
        if offload_video_to_host and t_bucket is None:
            t_bucket = "auto"
        bucket = (
            t if t_bucket is None
            else self._round_bucket(t) if t_bucket == "auto"
            else int(t_bucket)
        )
        assert bucket >= t, f"t_bucket {bucket} < num_frames {t}"

        images_host = None
        if offload_video_to_host:
            src = np.asarray(images)
            images = None
            if src.dtype == np.uint8 and src.shape[1:3] == (
                self.cfg.image_size, self.cfg.image_size,
            ):
                # model-resolution uint8 video: keep the RAW bytes as the host
                # store (1 byte/px — half a float16 folded store, which matters
                # when host->device bandwidth bounds streaming) and
                # normalize+fold on device per chunk/frame
                images_host = src
            else:
                # float (already-normalized) input: preprocess+fold ON THE HOST
                # (the same jitted code, pinned to the CPU backend) in
                # fixed-size chunks; the accelerator never sees the full video
                # and — critically on remote-tunnel TPUs, where device->host
                # fetch is orders of magnitude slower than upload — nothing is
                # ever fetched back from the device
                cpu = jax.devices("cpu")[0]
                pad = (-t) % io_chunk
                with jax.default_device(cpu):
                    for a in range(0, t + pad, io_chunk):
                        chunk = src[a : a + io_chunk]
                        if chunk.shape[0] < io_chunk:  # pad the tail chunk
                            chunk = np.concatenate(
                                [chunk, np.zeros((io_chunk - chunk.shape[0], *chunk.shape[1:]), chunk.dtype)]
                            )
                        out = np.asarray(self._prep_chunk(jnp.asarray(chunk)), host_dtype)
                        if images_host is None:
                            images_host = np.empty((t, *out.shape[1:]), host_dtype)
                        images_host[a : min(a + io_chunk, t)] = out[: min(io_chunk, t - a)]
        else:
            images = jnp.asarray(images)
            if images.dtype == jnp.uint8:
                images = preprocess_images(images, self.cfg.image_size)
            # fold to the trunk's preferred layout ONCE (e.g. Hiera space-to-depth)
            # so the per-frame tracking scan skips the patch-embed relayout
            images = jax.jit(self.model.prepare_images)(images)
            if bucket > t:
                images = jnp.pad(images, ((0, bucket - t),) + ((0, 0),) * (images.ndim - 1))

        hw = self.cfg.feat_size**2
        bank = init_memory_bank(
            max_objects, bucket, hw, self.cfg.mem_dim, self.cfg.hidden_dim,
            dtype=self.bank_dtype, ptr_dtype=jnp.float32,
        )
        return VideoPredictorState(
            images=images,
            video_height=video_height,
            video_width=video_width,
            num_frames=t,
            max_objects=max_objects,
            bank=bank,
            bucket=bucket,
            images_host=images_host,
            offloaded=offload_video_to_host,
        )

    def reset_state(self, state: VideoPredictorState) -> VideoPredictorState:
        hw = self.cfg.feat_size**2
        state.bank = init_memory_bank(
            state.max_objects, state.bank.num_slots, hw, self.cfg.mem_dim,
            self.cfg.hidden_dim, dtype=self.bank_dtype, ptr_dtype=jnp.float32,
        )
        state.obj_ids = []
        state.pending = {}
        state.cond_low_res = {}
        state.frames_tracked = {}
        state.prompt_frames = {}
        return state

    def _reset_tracking_results(self, state: VideoPredictorState):
        """Clear all inputs/outputs but keep object ids (reference
        `_reset_tracking_results`, sam2_video_predictor.py:860-877)."""
        hw = self.cfg.feat_size**2
        state.bank = init_memory_bank(
            state.max_objects, state.bank.num_slots, hw, self.cfg.mem_dim,
            self.cfg.hidden_dim, dtype=self.bank_dtype, ptr_dtype=jnp.float32,
        )
        state.pending = {}
        state.cond_low_res = {}
        state.frames_tracked = {}
        for frames in state.prompt_frames.values():
            frames.clear()

    # ------------------------------------------------------------ jit bodies
    def _encode_frame_impl(self, params, image):
        out = self.model.apply(params, image, method=self.model.forward_image)
        fpn = out["backbone_fpn"]
        feats = {"top": fpn[-1]}
        if self.cfg.use_high_res_features_in_sam:
            feats["s0"], feats["s1"] = fpn[0], fpn[1]
        return feats

    def _prompt_full_impl(
        self, params, images, bank, frame_idx, obj_idx, coords, labels,
        mask_input, prev_logits, num_frames, *, multimask, is_init, use_mask,
        has_prev, video_hw=None,
    ):
        """Device-resident video: slice the frame inside the jit (one dispatch)."""
        return self._prompt_impl(
            params, images[frame_idx][None], bank, frame_idx, obj_idx, coords,
            labels, mask_input, prev_logits, num_frames, multimask=multimask,
            is_init=is_init, use_mask=use_mask, has_prev=has_prev,
            video_hw=video_hw,
        )

    def _prompt_impl(
        self,
        params,
        frame_image,
        bank,
        frame_idx,
        obj_idx,
        coords,
        labels,
        mask_input,
        prev_logits,
        num_frames,
        *,
        multimask,
        is_init,
        use_mask,
        has_prev,
        video_hw=None,
    ):
        if frame_image.dtype == jnp.uint8:  # raw-uint8 offloaded host store
            frame_image = self._prep_chunk_impl(frame_image)
        feats = self._encode_frame_impl(params, frame_image.astype(jnp.float32))
        bank1 = jax.tree.map(
            lambda x: jax.lax.dynamic_slice_in_dim(x, obj_idx, 1, 0), bank
        )
        out, _ = self.model.apply(
            params,
            frame_idx,
            feats,
            bank1,
            num_frames,
            coords if not use_mask else None,
            labels if not use_mask else None,
            mask_input if use_mask else None,
            prev_logits if has_prev else None,
            is_init_cond_frame=is_init,
            is_cond_frame=True,
            multimask_output=multimask,
            run_mem_encoder=False,
            method=self.model.track_step,
        )
        if video_hw is not None:
            # fuse the video-resolution upsample into the same dispatch: the
            # interactive click path then costs ONE device round trip (the
            # reference app pays a fresh inference dispatch per click,
            # app.py:143-178; the ~40ms tunnel RTT per dispatch dominates here)
            out = dict(out)
            out["video_res_masks"] = self._to_video_res_impl(
                out["low_res_masks"][:, 0], hw=video_hw
            )
        return out

    def _finalize_full_impl(
        self, params, images, bank, frame_idx, high_res_masks, scores, obj_ptrs,
        obj_valid,
    ):
        return self._finalize_impl(
            params, images[frame_idx][None], bank, frame_idx, high_res_masks,
            scores, obj_ptrs, obj_valid,
        )

    def _finalize_impl(self, params, frame_image, bank, frame_idx, high_res_masks, scores, obj_ptrs, obj_valid):
        """Encode consolidated cond-frame memory for all objects, write bank."""
        if frame_image.dtype == jnp.uint8:  # raw-uint8 offloaded host store
            frame_image = self._prep_chunk_impl(frame_image)
        feats = self._encode_frame_impl(params, frame_image.astype(jnp.float32))
        o = high_res_masks.shape[0]
        top = jnp.broadcast_to(feats["top"], (o, *feats["top"].shape[1:]))
        if self.cfg.non_overlap_masks_for_mem_enc:
            high_res_masks = apply_non_overlapping_constraints(high_res_masks)
        maskmem = self.model.apply(
            params,
            top,
            high_res_masks,
            scores,
            True,  # is_mask_from_pts: consolidation binarizes (predictor flag)
            method=self.model.encode_memory,
        )
        b, hm, wm, md = maskmem.shape
        bank = write_memory(
            bank, frame_idx, maskmem.reshape(b, hm * wm, md), obj_ptrs, True
        )
        # objects never prompted on this frame keep slots valid (reference
        # consolidation fills placeholders) but masked by NO_OBJ content
        del obj_valid
        return bank

    def _propagate_chunk_impl(
        self, params, images, bank, start_idx, end_idx, chunk_start, num_frames,
        *, chunk_len, reverse, max_cond_slots=None, clear_radius=None,
        images_are_chunk=False,
    ):
        """Scan a window of `chunk_len` processing positions beginning at the
        (traced) position chunk_start — streaming propagation: one compiled
        program reused per chunk, results yielded chunk by chunk.

        images_are_chunk=True: `images` holds exactly this chunk's frames in
        processing order ([chunk_len, ...], gathered on host from the offloaded
        store) and is indexed by the relative scan position; otherwise it is
        the whole resident video indexed by absolute frame."""
        cfg = self.cfg
        o = bank.maskmem.shape[0]
        fs = cfg.feat_size
        hw_mem = cfg.feat_size**2
        md = cfg.mem_dim

        def body(bank, i):
            pos = chunk_start + i
            t = jnp.where(reverse, num_frames - 1 - pos, pos)
            t = jnp.clip(t, 0, bank.num_slots - 1)

            def run(_):
                if images_are_chunk:
                    frame = images[i][None]
                    if images.dtype == jnp.uint8:
                        # raw uint8 host store (half the host->device bytes of
                        # a float16 folded store): normalize+fold on device
                        frame = self._prep_chunk_impl(frame)
                else:
                    frame = images[t][None]
                feats1 = self._encode_frame_impl(params, frame.astype(jnp.float32))
                feats = {
                    k: jnp.broadcast_to(v, (o, *v.shape[1:])) for k, v in feats1.items()
                }
                out, _ = self.model.apply(
                    params, t, feats, bank, num_frames,
                    multimask_output=True, track_in_reverse=reverse,
                    write_bank=False, max_cond_slots=max_cond_slots,
                    method=self.model.track_step,
                )
                return (
                    out["maskmem"].astype(bank.maskmem.dtype),
                    out["obj_ptr"].astype(bank.obj_ptr.dtype),
                    out["low_res_masks"][:, 0],
                )

            def skip(_):
                return (
                    jnp.zeros((o, hw_mem, md), bank.maskmem.dtype),
                    jnp.zeros((o, self.cfg.hidden_dim), bank.obj_ptr.dtype),
                    jnp.full((o, 4 * fs, 4 * fs), NO_OBJ_SCORE, jnp.float32),
                )

            in_window = pos < num_frames
            # (start, end] window: frames past the requested tracking window
            # must not run NOR write bank state (reference tracks only the
            # max_frame_num_to_track window, sam2_video_predictor.py:663-746)
            in_range = jnp.where(
                reverse,
                (t < start_idx) & (t >= end_idx),
                (t > start_idx) & (t <= end_idx),
            )
            is_cond = jnp.any(bank.is_cond[:, t] & bank.valid[:, t])
            do_run = in_window & in_range & ~is_cond
            mem_row, ptr_row, low = jax.lax.cond(do_run, run, skip, None)
            valid = bank.valid
            if clear_radius is not None:
                # passing a cond frame scrubs surrounding non-cond memories
                # (reference propagate loop, sam2_video_predictor.py:708-714)
                s = valid.shape[1]
                in_order = jnp.where(
                    reverse,
                    (t <= start_idx) & (t >= end_idx),
                    (t >= start_idx) & (t <= end_idx),
                )
                tt = jnp.arange(s, dtype=jnp.int32)
                win = (tt >= t - clear_radius) & (tt <= t + clear_radius)
                valid = valid & ~(
                    (is_cond & in_order & in_window) & win[None, :] & ~bank.is_cond
                )
            bank = MemoryBank(
                maskmem=bank.maskmem.at[:, t].set(
                    jnp.where(do_run, mem_row, bank.maskmem[:, t])
                ),
                obj_ptr=bank.obj_ptr.at[:, t].set(
                    jnp.where(do_run, ptr_row, bank.obj_ptr[:, t])
                ),
                valid=valid.at[:, t].set(valid[:, t] | do_run),
                is_cond=bank.is_cond,
            )
            return bank, (low, do_run, t)

        bank, outs = jax.lax.scan(body, bank, jnp.arange(chunk_len, dtype=jnp.int32))
        if self.fill_hole_area > 0:
            lows, ran, ts = outs
            lows = fill_holes_in_mask_scores(lows, self.fill_hole_area)
            outs = (lows, ran, ts)
        return bank, outs

    def _propagate_impl(
        self, params, images, bank, start_idx, end_idx, num_frames, *, reverse,
        max_cond_slots=None, clear_radius=None,
    ):
        cfg = self.cfg
        o = bank.maskmem.shape[0]
        fs = cfg.feat_size
        s_total = images.shape[0]  # static scan length (== bank slot bucket)

        feats_all = None
        nb = self.precompute_batch
        if nb > 1:
            # encode all frames in MXU-friendly batches before the tracking scan
            # (the reference encodes per frame inside its python loop; batching
            # the encoder is free accuracy-wise and much better utilization)
            pad = (-s_total) % nb
            imgs = jnp.pad(images, ((0, pad), (0, 0), (0, 0), (0, 0)))
            chunks = imgs.reshape(-1, nb, *images.shape[1:])
            feats_all = jax.lax.map(
                lambda c: self._encode_frame_impl(params, c), chunks
            )
            feats_all = jax.tree.map(
                lambda x: x.reshape(-1, *x.shape[2:])[:s_total], feats_all
            )

        hw_mem = self.cfg.feat_size**2
        md = self.cfg.mem_dim

        def body(bank, i):
            t = jnp.where(reverse, num_frames - 1 - i, i)
            t = jnp.clip(t, 0, s_total - 1)
            in_window = i < num_frames  # positions past T in a padded bucket

            # the (large) bank stays OUT of the cond branches: branches return
            # only this frame's memory row, merged below — avoids whole-bank
            # copies that XLA inserts for cond-carried buffers
            def run(_):
                if feats_all is None:
                    feats1 = self._encode_frame_impl(params, images[t][None])
                else:
                    feats1 = jax.tree.map(lambda x: x[t][None], feats_all)
                feats = {
                    k: jnp.broadcast_to(v, (o, *v.shape[1:])) for k, v in feats1.items()
                }
                out, _ = self.model.apply(
                    params,
                    t,
                    feats,
                    bank,
                    num_frames,
                    multimask_output=True,
                    track_in_reverse=reverse,
                    write_bank=False,
                    max_cond_slots=max_cond_slots,
                    method=self.model.track_step,
                )
                low = out["low_res_masks"][:, 0]  # [O, 4fs, 4fs]
                return out["maskmem"].astype(bank.maskmem.dtype), out[
                    "obj_ptr"
                ].astype(bank.obj_ptr.dtype), low

            def skip(_):
                return (
                    jnp.zeros((o, hw_mem, md), bank.maskmem.dtype),
                    jnp.zeros((o, self.cfg.hidden_dim), bank.obj_ptr.dtype),
                    jnp.full((o, 4 * fs, 4 * fs), NO_OBJ_SCORE, jnp.float32),
                )

            in_range = (
                ((t > start_idx) & (t <= end_idx))
                if not reverse
                else ((t < start_idx) & (t >= end_idx))
            )  # frames outside the tracking window neither run nor touch the bank
            is_cond = jnp.any(bank.is_cond[:, t] & bank.valid[:, t])
            do_run = in_window & in_range & ~is_cond
            mem_row, ptr_row, low = jax.lax.cond(do_run, run, skip, None)
            valid = bank.valid
            if clear_radius is not None:
                # passing a cond frame scrubs surrounding non-cond memories
                # (reference propagate loop, sam2_video_predictor.py:708-714)
                s = valid.shape[1]
                in_order = jnp.where(
                    reverse,
                    (t <= start_idx) & (t >= end_idx),
                    (t >= start_idx) & (t <= end_idx),
                )
                tt = jnp.arange(s, dtype=jnp.int32)
                win = (tt >= t - clear_radius) & (tt <= t + clear_radius)
                valid = valid & ~(
                    (is_cond & in_order & in_window) & win[None, :] & ~bank.is_cond
                )
            bank = MemoryBank(
                maskmem=bank.maskmem.at[:, t].set(
                    jnp.where(do_run, mem_row, bank.maskmem[:, t])
                ),
                obj_ptr=bank.obj_ptr.at[:, t].set(
                    jnp.where(do_run, ptr_row, bank.obj_ptr[:, t])
                ),
                valid=valid.at[:, t].set(valid[:, t] | do_run),
                is_cond=bank.is_cond,
            )
            return bank, (low, do_run)

        bank, (lows, ran) = jax.lax.scan(
            body, bank, jnp.arange(s_total, dtype=jnp.int32)
        )
        if self.fill_hole_area > 0:
            # one batched connected-components pass over ALL frames/objects —
            # far better MXU/VPU utilization than per-frame filling inside the
            # scan (the CUDA reference fills per frame; on TPU the tiny per-frame
            # scatter/gathers would dominate the whole propagation)
            lows = fill_holes_in_mask_scores(lows, self.fill_hole_area)
        return bank, lows, ran

    def _to_video_res_impl(self, low_res, *, hw):
        x = resize2d(low_res[..., None].astype(jnp.float32), hw, mode="linear")[..., 0]
        if self.non_overlap_masks:
            x = apply_non_overlapping_constraints(x[:, None])[:, 0]
        return x

    def _clear_window_impl(self, bank, frame_idx, *, radius):
        """Invalidate non-conditioning memories within ±radius of frame_idx.

        The reference pops the dict entries (`_clear_non_cond_mem_around_input`,
        sam2_video_predictor.py:1155-1172); here validity is a mask, so clearing
        is a bitwise update — gathers never attend invalid slots."""
        s = bank.num_slots
        tt = jnp.arange(s, dtype=jnp.int32)
        win = (tt >= frame_idx - radius) & (tt <= frame_idx + radius)
        return bank.replace(valid=bank.valid & ~(win[None, :] & ~bank.is_cond))

    def _downgrade_frame_impl(self, bank, frame_idx):
        """Cond frame -> non-cond: the reference moves the frame's consolidated
        output from cond_frame_outputs to non_cond_frame_outputs when its last
        prompt is cleared (clear_all_prompts_in_frame:804-821). Content stays."""
        return bank.replace(is_cond=bank.is_cond.at[:, frame_idx].set(False))

    def _permute_rows_impl(self, bank, perm, keep):
        """Gather bank object rows by perm and blank rows where keep is False —
        the TPU recast of the reference's per-object tensor re-slicing in
        remove_object Step 3 (sam2_video_predictor.py:1110-1131)."""
        def g(x):
            out = jnp.take(x, perm, axis=0)
            m = keep.reshape((-1,) + (1,) * (x.ndim - 1))
            return jnp.where(m, out, jnp.zeros_like(out))

        return MemoryBank(
            maskmem=g(bank.maskmem),
            obj_ptr=g(bank.obj_ptr),
            valid=g(bank.valid),
            is_cond=g(bank.is_cond),
        )

    # -------------------------------------------------------------- prompting
    def _host_frame(self, state: VideoPredictorState, frame_idx: int) -> jnp.ndarray:
        """One frame from the offloaded host store -> device [1, ...folded...]."""
        return jnp.asarray(state.images_host[frame_idx][None])

    def _dispatch_prompt(
        self, state, frame_idx, obj_idx, coords, labels, mask_input, prev,
        *, multimask, is_init, use_mask, has_prev,
    ):
        common = dict(
            multimask=multimask, is_init=is_init, use_mask=use_mask,
            has_prev=has_prev, video_hw=(state.video_height, state.video_width),
        )
        nf = jnp.asarray(state.num_frames)
        if state.offloaded:
            return self._prompt_frame(
                self.params, self._host_frame(state, frame_idx), state.bank,
                jnp.asarray(frame_idx), obj_idx, coords, labels, mask_input,
                prev, nf, **common,
            )
        return self._prompt(
            self.params, state.images, state.bank, jnp.asarray(frame_idx),
            obj_idx, coords, labels, mask_input, prev, nf, **common,
        )

    def add_new_points_or_box(
        self,
        state: VideoPredictorState,
        frame_idx: int,
        obj_id: int,
        points=None,
        labels=None,
        box=None,
        normalize_coords: bool = True,
        prev_low_res_mask=None,
    ):
        """Returns (frame_idx, obj_ids, video_res_masks [O, 1, H, W] logits)."""
        cfg = self.cfg
        pts_list = []
        lbl_list = []
        if box is not None:
            b = np.asarray(box, np.float32).reshape(1, 4)
            if normalize_coords:
                bpts = transform_boxes(b, (state.video_height, state.video_width), cfg.image_size)
            else:
                bpts = b.reshape(1, 2, 2)
            pts_list.append(bpts.reshape(1, 2, 2))
            lbl_list.append(np.array([[2, 3]], np.int32))
        if points is not None:
            p = np.asarray(points, np.float32).reshape(1, -1, 2)
            if normalize_coords:
                p = transform_coords(p, (state.video_height, state.video_width), cfg.image_size)
            pts_list.append(p)
            lbl_list.append(np.asarray(labels, np.int32).reshape(1, -1))
        assert pts_list, "provide points and/or box"
        coords = np.concatenate(pts_list, axis=1)
        lbls = np.concatenate(lbl_list, axis=1)
        num_pts = coords.shape[1]
        multimask = (
            cfg.multimask_output_in_sam
            and cfg.multimask_min_pt_num <= num_pts <= cfg.multimask_max_pt_num
        )
        obj_idx = state.obj_idx(obj_id)
        is_init = frame_idx not in state.frames_tracked

        has_prev = prev_low_res_mask is not None
        prev = (
            jnp.asarray(prev_low_res_mask, jnp.float32).reshape(
                1, 4 * cfg.feat_size, 4 * cfg.feat_size, 1
            )
            if has_prev
            else jnp.zeros((1, 4 * cfg.feat_size, 4 * cfg.feat_size, 1))
        )
        out = self._dispatch_prompt(
            state,
            frame_idx,
            jnp.asarray(obj_idx),
            jnp.asarray(coords),
            jnp.asarray(lbls),
            jnp.zeros((1, cfg.image_size, cfg.image_size, 1)),
            prev,
            multimask=multimask,
            is_init=is_init,
            use_mask=False,
            has_prev=has_prev,
        )
        self._store_prompt_output(state, frame_idx, obj_idx, out)
        return self._prompt_return(state, frame_idx)

    def add_new_mask(self, state: VideoPredictorState, frame_idx: int, obj_id: int, mask):
        """mask: [H, W] bool/float at any resolution (reference add_new_mask:321-408)."""
        cfg = self.cfg
        m = jnp.asarray(mask)
        m = m.astype(jnp.float32)[..., None]
        if m.shape[0] != cfg.image_size or m.shape[1] != cfg.image_size:
            m = resize2d(m[None], (cfg.image_size, cfg.image_size), mode="linear", antialias=True)[0]
            m = (m >= 0.5).astype(jnp.float32)
        obj_idx = state.obj_idx(obj_id)
        is_init = frame_idx not in state.frames_tracked
        out = self._dispatch_prompt(
            state,
            frame_idx,
            jnp.asarray(obj_idx),
            jnp.zeros((1, 1, 2)),
            -jnp.ones((1, 1), jnp.int32),
            m[None],
            jnp.zeros((1, 4 * cfg.feat_size, 4 * cfg.feat_size, 1)),
            multimask=False,
            is_init=is_init,
            use_mask=True,
            has_prev=False,
        )
        self._store_prompt_output(state, frame_idx, obj_idx, out)
        return self._prompt_return(state, frame_idx)

    def _store_prompt_output(self, state, frame_idx, obj_idx, out):
        state.prompt_frames.setdefault(obj_idx, set()).add(frame_idx)
        state.pending.setdefault(frame_idx, {})[obj_idx] = {
            "high_res_masks": out["high_res_masks"],
            "low_res_masks": out["low_res_masks"],
            "obj_ptr": out["obj_ptr"],
            "score": out["object_score_logits"],
            # host copy of the fused video-res upsample (one fetch per click;
            # other objects' masks come from this cache, not a new dispatch)
            "video_res": np.asarray(out["video_res_masks"][0]),
        }

    def _prompt_return(self, state, frame_idx):
        """One host fetch per click: the prompted object's video-res mask was
        computed inside the _prompt dispatch and cached; peers are assembled
        from their cached copies (reference re-dispatches per click,
        app.py:143-178)."""
        o = state.max_objects
        vh, vw = state.video_height, state.video_width
        video = np.full((o, vh, vw), NO_OBJ_SCORE, np.float32)
        for oi, rec in state.pending.get(frame_idx, {}).items():
            video[oi] = rec["video_res"]
        if self.non_overlap_masks:
            video = np.asarray(
                apply_non_overlapping_constraints(jnp.asarray(video)[:, None])
            )[:, 0]
        return frame_idx, list(state.obj_ids), video[:, None]

    # --------------------------------------------------------------- editing
    def _clear_enabled(self, state: VideoPredictorState) -> bool:
        """Reference gate: single-object only unless the multi-obj flag is set
        (sam2_video_predictor.py:627-629, 680-682)."""
        return self.clear_non_cond_mem_around_input and (
            self.clear_non_cond_mem_for_multi_obj or len(state.obj_ids) <= 1
        )

    def _clear_radius(self) -> int:
        r = max(1, self.cfg.memory_temporal_stride_for_eval)
        return r * self.cfg.num_maskmem

    def _clear_non_cond_mem_around_input(self, state: VideoPredictorState, frame_idx: int):
        """Scrub non-conditioning memories around a (re-)prompted frame
        (reference sam2_video_predictor.py:1155-1172)."""
        state.bank = self._clear_window(
            state.bank, jnp.asarray(frame_idx), radius=self._clear_radius()
        )

    def _assemble_frame_masks(self, state: VideoPredictorState, frame_idx: int) -> np.ndarray:
        """Video-res mask logits [O, 1, H, W] for one frame from the cached
        consolidated/pending outputs (no re-inference — reference
        `_consolidate_temp_output_across_obj(..., run_mem_encoder=False)`)."""
        o, vh, vw = state.max_objects, state.video_height, state.video_width
        low = state.cond_low_res.get(frame_idx)
        if low is not None:
            video = np.asarray(self._to_video_res(jnp.asarray(low), hw=(vh, vw)))
        else:
            video = np.full((o, vh, vw), NO_OBJ_SCORE, np.float32)
        for oi, rec in state.pending.get(frame_idx, {}).items():
            video[oi] = rec["video_res"]
        if self.non_overlap_masks:
            video = np.asarray(
                apply_non_overlapping_constraints(jnp.asarray(video)[:, None])
            )[:, 0]
        return video[:, None]

    def clear_all_prompts_in_frame(
        self, state: VideoPredictorState, frame_idx: int, obj_id: int,
        need_output: bool = True,
    ):
        """Remove all point/mask input on `frame_idx` for `obj_id`
        (reference sam2_video_predictor.py:777-845)."""
        assert obj_id in state.obj_ids, f"unknown object id {obj_id}"
        obj_idx = state.obj_ids.index(obj_id)

        # drop the pending ("temp") prompt output and the input record
        per = state.pending.get(frame_idx, {})
        per.pop(obj_idx, None)
        if not per:
            state.pending.pop(frame_idx, None)
        state.prompt_frames.get(obj_idx, set()).discard(frame_idx)

        # does any object still have input on this frame? (reference :791-800)
        frame_has_input = any(
            frame_idx in frames for frames in state.prompt_frames.values()
        )
        if not frame_has_input:
            # downgrade the consolidated cond output to non-cond (:804-821)
            if frame_idx in state.cond_low_res:
                state.cond_low_res.pop(frame_idx)
                state.bank = self._downgrade_frame(state.bank, jnp.asarray(frame_idx))
                state.frames_tracked.pop(frame_idx, None)
            # no conditioning outputs left anywhere -> full tracking reset (:823-825)
            if not state.cond_low_res:
                self._reset_tracking_results(state)

        if not need_output:
            return None
        return frame_idx, list(state.obj_ids), self._assemble_frame_masks(state, frame_idx)

    def remove_object(
        self, state: VideoPredictorState, obj_id: int,
        strict: bool = False, need_output: bool = True,
    ):
        """Remove an object id from the tracking state
        (reference sam2_video_predictor.py:1042-1153). Returns
        (obj_ids, updated_frames) where updated_frames lists
        (frame_idx, video_res_masks) for frames this object had prompts on."""
        updated_frames: List[Tuple[int, np.ndarray]] = []
        if obj_id not in state.obj_ids:
            if not strict:
                return list(state.obj_ids), updated_frames
            raise RuntimeError(
                f"Cannot remove object id {obj_id} as it doesn't exist. "
                f"All existing object ids: {state.obj_ids}."
            )
        # last remaining object: plain state reset (reference :1088-1091)
        if len(state.obj_ids) == 1:
            self.reset_state(state)
            return list(state.obj_ids), updated_frames

        rm = state.obj_ids.index(obj_id)
        # Step 0: clear this object's inputs frame by frame — may downgrade
        # conditioning frames whose only prompt was this object (:1097-1107)
        obj_input_frames = sorted(state.prompt_frames.get(rm, set()))
        for f in obj_input_frames:
            self.clear_all_prompts_in_frame(state, f, obj_id, need_output=False)

        # Step 1: remap object ids / indices (:1109-1121)
        old_n = len(state.obj_ids)
        remain = [i for i in range(old_n) if i != rm]
        state.obj_ids = [state.obj_ids[i] for i in remain]
        old2new = {o: n for n, o in enumerate(remain)}

        # Step 2: remap per-object host dicts (:1123-1137)
        state.pending = {
            f: {old2new[oi]: rec for oi, rec in per.items() if oi in old2new}
            for f, per in state.pending.items()
        }
        state.pending = {f: per for f, per in state.pending.items() if per}
        state.prompt_frames = {
            old2new[oi]: frames
            for oi, frames in state.prompt_frames.items()
            if oi in old2new
        }

        # Step 3: shift packed row storage — bank rows + cached cond logits
        o = state.max_objects
        perm = np.zeros(o, np.int32)
        keep = np.zeros(o, bool)
        perm[: len(remain)] = remain
        keep[: len(remain)] = True
        state.bank = self._permute_rows(
            state.bank, jnp.asarray(perm), jnp.asarray(keep)
        )
        for f, low in list(state.cond_low_res.items()):
            nl = np.asarray(low)[perm].copy()
            nl[~keep] = NO_OBJ_SCORE
            state.cond_low_res[f] = nl

        # Step 4: updated masks on the frames that lost this object's prompts
        if need_output:
            for f in obj_input_frames:
                updated_frames.append((f, self._assemble_frame_masks(state, f)))
        return list(state.obj_ids), updated_frames

    # ------------------------------------------------------------ propagation
    def propagate_in_video_preflight(self, state: VideoPredictorState):
        """Encode memories for all pending prompted frames (consolidation)."""
        cfg = self.cfg
        o = state.max_objects
        for frame_idx, per_obj in sorted(state.pending.items()):
            high = jnp.full(
                (o, 1, cfg.image_size, cfg.image_size), NO_OBJ_SCORE, jnp.float32
            )
            scores = jnp.full((o, 1), NO_OBJ_SCORE, jnp.float32)
            ptrs = jnp.zeros((o, cfg.hidden_dim), jnp.float32)
            valid = np.zeros((o,), bool)
            for oi, rec in per_obj.items():
                high = high.at[oi].set(rec["high_res_masks"][0].astype(jnp.float32))
                scores = scores.at[oi].set(rec["score"][0].astype(jnp.float32))
                ptrs = ptrs.at[oi].set(rec["obj_ptr"][0].astype(jnp.float32))
                valid[oi] = True
            if state.offloaded:
                state.bank = self._finalize_frame(
                    self.params, self._host_frame(state, frame_idx), state.bank,
                    jnp.asarray(frame_idx), high, scores, ptrs, jnp.asarray(valid),
                )
            else:
                state.bank = self._finalize(
                    self.params,
                    state.images,
                    state.bank,
                    jnp.asarray(frame_idx),
                    high,
                    scores,
                    ptrs,
                    jnp.asarray(valid),
                )
            low = np.full((o, 4 * cfg.feat_size, 4 * cfg.feat_size), NO_OBJ_SCORE, np.float32)
            for oi, rec in per_obj.items():
                low[oi] = np.asarray(rec["low_res_masks"][0, 0])
            state.cond_low_res[frame_idx] = low
            if self._clear_enabled(state):
                # scrub stale non-cond memories around the (re-)prompted frame
                # (reference preflight, sam2_video_predictor.py:627-632)
                self._clear_non_cond_mem_around_input(state, frame_idx)
        state.pending = {}

    def propagate_in_video(
        self,
        state: VideoPredictorState,
        start_frame_idx: Optional[int] = None,
        max_frame_num_to_track: Optional[int] = None,
        reverse: bool = False,
        chunk_size: Optional[int] = None,
    ) -> Iterator[Tuple[int, List[int], np.ndarray]]:
        """Yields (frame_idx, obj_ids, video_res_mask_logits [O, 1, H, W]).

        chunk_size=None runs the whole video as one compiled scan (maximum
        throughput — the benchmark path); chunk_size=K streams results every K
        frames (interactive latency), reusing one compiled chunk program.
        """
        self.propagate_in_video_preflight(state)
        cond_frames = sorted(state.cond_low_res)
        if not cond_frames:
            raise RuntimeError("No prompts provided; add points/boxes/masks first")
        if start_frame_idx is None:
            start_frame_idx = min(cond_frames)
        t0 = start_frame_idx
        nf = state.num_frames
        if reverse:
            end = max(t0 - (max_frame_num_to_track or nf), 0)
            order = range(t0, end - 1, -1) if t0 > 0 else []
        else:
            end = min(t0 + (max_frame_num_to_track or nf), nf - 1)
            order = range(t0, end + 1)
        hw = (state.video_height, state.video_width)
        # exact specialization: with N prompted frames only N cond slots can
        # ever be valid, so shrink the static slot count (fewer memory-attention
        # keys; the selection math is unchanged for the slots that remain)
        mcs = max(1, min(self.cfg.max_cond_frame_slots, len(cond_frames)))
        clear_radius = self._clear_radius() if self._clear_enabled(state) else None

        def emit(t, low):
            video = self._to_video_res(jnp.asarray(low), hw=hw)
            return t, list(state.obj_ids), np.asarray(video)[:, None]

        if state.offloaded and chunk_size is None:
            # offloaded video: only the streaming path exists (HBM never holds
            # more than one chunk of frames)
            chunk_size = 64

        if chunk_size is None:
            bank, lows, ran = self._propagate(
                self.params,
                state.images,
                state.bank,
                jnp.asarray(t0),
                jnp.asarray(end),
                jnp.asarray(nf),
                reverse=reverse,
                max_cond_slots=mcs,
                clear_radius=clear_radius,
            )
            state.bank = bank
            lows_np = np.asarray(lows)  # scan order
            ran_np = np.asarray(ran)
            for t in order:
                i = (nf - 1 - t) if reverse else t  # scan index of frame t
                if ran_np[i]:
                    state.frames_tracked[t] = {"reverse": reverse}
                    yield emit(t, lows_np[i])
                elif t in state.cond_low_res:
                    yield emit(t, state.cond_low_res[t])
            return

        # streaming: process positions in chunks, yield after each chunk
        pending = list(order)
        pos = (nf - 1 - t0) if reverse else t0  # processing position of t0
        while pending:
            if state.offloaded:
                # host gather of this chunk's frames in processing order; the
                # device only ever holds chunk_size frames of video
                idxs = np.zeros(chunk_size, np.int64)
                for i in range(chunk_size):
                    t = (nf - 1 - (pos + i)) if reverse else (pos + i)
                    idxs[i] = t if 0 <= t < nf else 0  # clamped rows are masked
                imgs = jnp.asarray(state.images_host[idxs])
            else:
                imgs = state.images
            state.bank, (lows, ran, ts) = self._propagate_chunk(
                self.params,
                imgs,
                state.bank,
                jnp.asarray(t0),
                jnp.asarray(end),
                jnp.asarray(pos),
                jnp.asarray(nf),
                chunk_len=chunk_size,
                reverse=reverse,
                max_cond_slots=mcs,
                clear_radius=clear_radius,
                images_are_chunk=state.offloaded,
            )
            lows_np, ran_np, ts_np = np.asarray(lows), np.asarray(ran), np.asarray(ts)
            # a tail chunk can contain both a real row for frame t and masked
            # rows whose clamped position collides with t — keep the row that ran
            covered = {}
            for i in range(chunk_size):
                t_i = int(ts_np[i])
                if t_i not in covered or ran_np[i]:
                    covered[t_i] = i
            while pending:
                t = pending[0]
                if t in state.cond_low_res:
                    pending.pop(0)
                    yield emit(t, state.cond_low_res[t])
                elif t in covered and ran_np[covered[t]]:
                    pending.pop(0)
                    state.frames_tracked[t] = {"reverse": reverse}
                    yield emit(t, lows_np[covered[t]])
                else:
                    break  # next chunk
            pos += chunk_size
            if pos >= nf:
                break
