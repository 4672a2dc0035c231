"""Model/predictor builders — the reference's build_sam.py facade.

`build_sam2_video_predictor(config, ckpt)` mirrors reference sam2/build_sam.py:
63-207: resolve a named config preset (or YAML path), apply the predictor
postprocessing overrides (dynamic multimask stability, binarized click memories,
fill_hole_area=8 — build_sam.py:110-123), load weights (torch .pt via the
importer, or an Orbax/npz native checkpoint), and return the predictor.
"""

from __future__ import annotations

import dataclasses
import logging
import os

import jax
import jax.numpy as jnp

from us_video_medsam2_tpu.core.config import PRESETS, SAM2Config, load_yaml_config
from us_video_medsam2_tpu.models.sam2 import SAM2Model


def resolve_config(config: str | SAM2Config) -> SAM2Config:
    if isinstance(config, SAM2Config):
        return config
    if config in PRESETS:
        return PRESETS[config]()
    if os.path.exists(config):
        return load_yaml_config(config)
    raise ValueError(f"unknown config {config!r}; presets: {sorted(PRESETS)}")


def load_params(model: SAM2Model, cfg: SAM2Config, ckpt_path: str | None, strict=True):
    if ckpt_path is None:
        logging.warning("no checkpoint given — randomly initialized weights")
        return jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
        )
    if ckpt_path.endswith(".pt") or ckpt_path.endswith(".pth"):
        from us_video_medsam2_tpu.core.import_torch import load_torch_checkpoint

        params = load_torch_checkpoint(ckpt_path, cfg)
    elif ckpt_path.endswith(".npz"):
        import numpy as np

        data = dict(np.load(ckpt_path))
        if any(k.startswith("params/") for k in data):
            # native training checkpoint (core/checkpoint.py flat layout)
            from us_video_medsam2_tpu.core.checkpoint import restore_params

            params = restore_params(ckpt_path)
        else:
            # a torch state_dict exported to npz (fixtures / converted ckpts)
            from us_video_medsam2_tpu.core.import_torch import (
                convert_reference_state_dict,
            )

            params = convert_reference_state_dict(data, cfg)
    else:
        from us_video_medsam2_tpu.core.checkpoint import restore_params

        params = restore_params(ckpt_path)
    if strict:
        ref = jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
            )
        )
        # shape check against the expected tree (reference build_sam.py:197-207
        # raises on missing/unexpected keys)
        import jax.tree_util as jtu

        ref_paths = {jtu.keystr(p) for p, _ in jtu.tree_leaves_with_path(ref)}
        got_paths = {jtu.keystr(p) for p, _ in jtu.tree_leaves_with_path(params)}
        missing, extra = ref_paths - got_paths, got_paths - ref_paths
        if missing or extra:
            raise RuntimeError(
                f"checkpoint mismatch: missing {sorted(missing)[:5]}, extra {sorted(extra)[:5]}"
            )
    params = jax.tree.map(jnp.asarray, params)
    return params


def build_sam2(
    config: str | SAM2Config = "sam2.1_hiera_t512",
    ckpt_path: str | None = None,
    dtype=jnp.float32,
    apply_postprocessing: bool = True,
    **overrides,
):
    cfg = resolve_config(config)
    if apply_postprocessing:
        overrides.setdefault("dynamic_multimask_via_stability", True)
        overrides.setdefault("binarize_mask_from_pts_for_mem_enc", True)
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    model = SAM2Model(cfg, dtype=dtype)
    params = load_params(model, cfg, ckpt_path)
    return model, params


def build_sam2_video_predictor(
    config: str | SAM2Config = "sam2.1_hiera_t512",
    ckpt_path: str | None = None,
    dtype=jnp.bfloat16,
    apply_postprocessing: bool = True,
    fill_hole_area: int = 8,
    non_overlap_masks: bool = False,
    **overrides,
):
    from us_video_medsam2_tpu.inference.video_predictor import SAM2VideoPredictor

    model, params = build_sam2(config, ckpt_path, dtype, apply_postprocessing, **overrides)
    return SAM2VideoPredictor(
        model,
        params,
        fill_hole_area=fill_hole_area if apply_postprocessing else 0,
        non_overlap_masks=non_overlap_masks,
    )


# the NPZ variant is the same class here (init_state takes arrays natively)
build_sam2_video_predictor_npz = build_sam2_video_predictor


def build_sam2_image_predictor(
    config: str | SAM2Config = "sam2.1_hiera_t512",
    ckpt_path: str | None = None,
    dtype=jnp.bfloat16,
    apply_postprocessing: bool = True,
    **overrides,
):
    from us_video_medsam2_tpu.inference.image_predictor import SAM2ImagePredictor

    model, params = build_sam2(config, ckpt_path, dtype, apply_postprocessing, **overrides)
    kwargs = {}
    if apply_postprocessing:
        kwargs = dict(max_hole_area=8, max_sprinkle_area=8)
    return SAM2ImagePredictor(model, params, **kwargs)


def build_efficienttam_video_predictor(
    config: str | SAM2Config = "efficientmedsam_s_512",
    ckpt_path: str | None = None,
    **kwargs,
):
    """EfficientTAM family (reference efficient_track_anything/build_efficienttam.py)."""
    return build_sam2_video_predictor(config, ckpt_path, **kwargs)
