"""Typed configuration system.

The reference drives everything through Hydra YAML `_target_` instantiation
(reference sam2/configs/*.yaml, training/train.py:40). Here the component tree is
plain frozen dataclasses — hashable, so they can be closed over by jitted functions
without retracing — with YAML load/override/snapshot helpers for the same workflow
(resolved-config snapshots per run mirror reference training/train.py:142-153).

Defaults reproduce sam2.1_hiera_t512.yaml (the hiera-tiny 512² video config used by
every fork experiment, reference sam2/configs/sam2.1_hiera_t512.yaml:1-135).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple


def _tuplify(x):
    return tuple(x) if isinstance(x, (list, tuple)) else x


@dataclass(frozen=True)
class HieraConfig:
    """Hierarchical windowed ViT trunk (reference backbones/hieradet.py:169-317)."""

    embed_dim: int = 96
    num_heads: int = 1
    stages: Tuple[int, ...] = (1, 2, 7, 2)
    dim_mul: float = 2.0
    head_mul: float = 2.0
    q_pool: int = 3
    q_stride: Tuple[int, int] = (2, 2)
    window_spec: Tuple[int, ...] = (8, 4, 14, 7)
    global_att_blocks: Tuple[int, ...] = (5, 7, 9)
    window_pos_embed_bkg_spatial_size: Tuple[int, int] = (7, 7)
    drop_path_rate: float = 0.0
    mlp_ratio: float = 4.0
    patch_kernel: int = 7
    patch_stride: int = 4
    patch_padding: int = 3

    @property
    def channel_list(self) -> Tuple[int, ...]:
        """Per-stage output dims, high→low stage order like trunk outputs reversed."""
        dims = []
        d = self.embed_dim
        for i in range(len(self.stages)):
            if i > 0:
                d = int(d * self.dim_mul)
            dims.append(d)
        return tuple(dims[::-1])  # [768, 384, 192, 96] for tiny


@dataclass(frozen=True)
class ViTDetConfig:
    """Plain ViT trunk used by the EfficientTAM family (reference backbones/vitdet.py)."""

    img_size: int = 512
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    window_size: int = 14
    window_block_indexes: Tuple[int, ...] = (0, 1, 3, 4, 6, 7, 9, 10)
    use_rel_pos: bool = False
    pretrain_img_size: int = 224
    pretrain_use_cls_token: bool = True


@dataclass(frozen=True)
class FpnNeckConfig:
    """FPN neck (reference backbones/image_encoder.py:47-137)."""

    d_model: int = 256
    backbone_channel_list: Tuple[int, ...] = (768, 384, 192, 96)
    fpn_top_down_levels: Tuple[int, ...] = (2, 3)
    fpn_interp_model: str = "nearest"
    fuse_type: str = "sum"
    pos_temperature: float = 10000.0
    neck_norm: str | None = None  # 'LN' for the EfficientMedSAM ViTDetNeck


@dataclass(frozen=True)
class MemoryAttentionConfig:
    """4-layer RoPE self/cross transformer (reference memory_attention.py:17-169)."""

    d_model: int = 256
    num_layers: int = 4
    num_heads: int = 1
    dim_feedforward: int = 2048
    dropout: float = 0.1
    pos_enc_at_input: bool = True
    pos_enc_at_attn: bool = False
    pos_enc_at_cross_attn_keys: bool = True
    pos_enc_at_cross_attn_queries: bool = False
    activation: str = "relu"
    rope_theta: float = 10000.0
    rope_feat_sizes: Tuple[int, int] = (32, 32)
    kv_in_dim: int = 64
    # opt-in: engage the Pallas flash kernel for the memory cross-attention at
    # batch 1 (skips only the batch>=2 heuristic gate; the VMEM/alignment
    # guards in kernels/flash_attention.py::flash_attention_available still
    # apply). The batched serving path (inference/serve.py) does NOT need this:
    # its batch>=2 shapes pass the default gate.
    force_flash: bool = False
    # EfficientTAM-style landmark pooling of spatial memory K/V (0 = off); mirrors
    # efficient_track_anything/modeling/sam/transformer.py:378-415.
    efficient_pool_size: int = 0
    # landmark area-compensation variant: 1 = logit bias (EfficientRoPEAttention1,
    # the one wired in shipped configs), 2 = value offset on pooled keys
    # (EfficientRoPEAttention2, transformer.py:430-532)
    efficient_pool_variant: int = 1


@dataclass(frozen=True)
class MemoryEncoderConfig:
    """Mask downsampler + ConvNeXt fuser (reference memory_encoder.py:17-181)."""

    out_dim: int = 64
    in_dim: int = 256
    mask_downsampler_embed_dim: int = 256
    mask_downsampler_kernel: int = 3
    mask_downsampler_stride: int = 2
    mask_downsampler_padding: int = 1
    mask_downsampler_total_stride: int = 16
    fuser_layers: int = 2
    fuser_kernel: int = 7
    fuser_padding: int = 3
    fuser_layer_scale_init: float = 1e-6
    pos_channels: int = 64
    pos_temperature: float = 10000.0


@dataclass(frozen=True)
class TemporalFusionConfig:
    """Fork's inter-frame feature-mixing modules (reference sam2_base.py:25-758).

    variant: 'none' | 'tce' (TemporalContextExchange) | 'gfte' | 'atsf' | 'gp'
    Applied to the top FPN level(s) over the frame axis when num_frames > 1
    (reference sam2_base.py:1249-1262, gated by `temporalVideo`).
    """

    variant: str = "none"
    channels: int = 256
    num_levels: int = 3
    alpha: float = 0.1  # residual mixing weight


@dataclass(frozen=True)
class SAM2Config:
    """Full model config == reference SAM2Base kwargs (sam2_base.py:764-948)."""

    image_size: int = 512
    backbone_stride: int = 16
    # trunk selection: exactly one of hiera / vitdet
    hiera: Optional[HieraConfig] = field(default_factory=HieraConfig)
    vitdet: Optional[ViTDetConfig] = None
    neck: FpnNeckConfig = field(default_factory=FpnNeckConfig)
    neck_scalp: int = 1
    memory_attention: MemoryAttentionConfig = field(
        default_factory=MemoryAttentionConfig
    )
    memory_encoder: MemoryEncoderConfig = field(default_factory=MemoryEncoderConfig)
    temporal_fusion: TemporalFusionConfig = field(default_factory=TemporalFusionConfig)

    num_maskmem: int = 7
    sigmoid_scale_for_mem_enc: float = 20.0
    sigmoid_bias_for_mem_enc: float = -10.0
    binarize_mask_from_pts_for_mem_enc: bool = False
    use_mask_input_as_output_without_sam: bool = True
    max_cond_frames_in_attn: int = -1
    directly_add_no_mem_embed: bool = True
    use_high_res_features_in_sam: bool = True
    multimask_output_in_sam: bool = True
    multimask_min_pt_num: int = 0
    multimask_max_pt_num: int = 1
    multimask_output_for_tracking: bool = True
    use_multimask_token_for_obj_ptr: bool = True
    iou_prediction_use_sigmoid: bool = True
    memory_temporal_stride_for_eval: int = 1
    non_overlap_masks_for_mem_enc: bool = False
    use_obj_ptrs_in_encoder: bool = True
    max_obj_ptrs_in_encoder: int = 16
    add_tpos_enc_to_obj_ptrs: bool = True
    proj_tpos_enc_in_obj_ptrs: bool = True
    use_signed_tpos_enc_to_obj_ptrs: bool = True
    only_obj_ptrs_in_the_past_for_eval: bool = True
    pred_obj_scores: bool = True
    pred_obj_scores_mlp: bool = True
    fixed_no_obj_ptr: bool = True
    soft_no_obj_ptr: bool = False
    use_mlp_for_obj_ptr_proj: bool = True
    no_obj_embed_spatial: bool = True
    # mask decoder extras
    dynamic_multimask_via_stability: bool = True
    dynamic_multimask_stability_delta: float = 0.05
    dynamic_multimask_stability_thresh: float = 0.98
    # fixed-shape memory machinery (TPU recast of reference's dict-keyed memory bank)
    max_cond_frame_slots: int = 4  # static slot count for conditioning-frame memories

    @property
    def hidden_dim(self) -> int:
        return self.neck.d_model

    @property
    def mem_dim(self) -> int:
        return self.memory_encoder.out_dim

    @property
    def feat_size(self) -> int:
        return self.image_size // self.backbone_stride

    @property
    def num_feature_levels(self) -> int:
        return 3 if self.use_high_res_features_in_sam else 1

    @property
    def tokens_per_obj_ptr(self) -> int:
        return max(1, self.hidden_dim // self.mem_dim)


def _from_dict(cls, data: Any):
    if data is None or not dataclasses.is_dataclass(cls):
        return data
    kwargs = {}
    hints = {f.name: f for f in dataclasses.fields(cls)}
    for key, val in data.items():
        if key not in hints:
            raise KeyError(f"unknown config key {key!r} for {cls.__name__}")
        f = hints[key]
        sub = _CONFIG_TYPES.get(key)
        if sub is not None and isinstance(val, dict):
            kwargs[key] = _from_dict(sub, val)
        else:
            kwargs[key] = _tuplify(val)
    return cls(**kwargs)


_CONFIG_TYPES = {
    "hiera": HieraConfig,
    "vitdet": ViTDetConfig,
    "neck": FpnNeckConfig,
    "memory_attention": MemoryAttentionConfig,
    "memory_encoder": MemoryEncoderConfig,
    "temporal_fusion": TemporalFusionConfig,
}


def sam2_config_from_dict(data: dict) -> SAM2Config:
    return _from_dict(SAM2Config, data)


def _resolve_refs(node, root):
    """OmegaConf-style interpolation: ${times:a,b}, ${divide:a,b}, ${path.to.key}
    (reference training/utils/train_utils.py:52-63 resolvers)."""
    import re

    def lookup(path: str):
        cur = root
        for part in path.split("."):
            cur = cur[part]
        return cur

    def resolve_str(s: str):
        m = re.fullmatch(r"\$\{([a-z_]+):([^}]+)\}", s)
        if m:
            fn, argstr = m.group(1), m.group(2)
            args = [
                _resolve_refs(a.strip(), root)
                if a.strip().startswith("${")
                else (lookup(a.strip()) if not _is_num(a.strip()) else _num(a.strip()))
                for a in argstr.split(",")
            ]
            if fn == "times":
                out = 1
                for a in args:
                    out *= a
                return out
            if fn == "divide":
                return args[0] / args[1]
            if fn == "minus":
                return args[0] - args[1]
            if fn == "add":
                return sum(args)
            raise ValueError(f"unknown resolver {fn}")
        m = re.fullmatch(r"\$\{([^}:]+)\}", s)
        if m:
            return lookup(m.group(1))
        return s

    def _is_num(s):
        try:
            float(s)
            return True
        except ValueError:
            return False

    def _num(s):
        f = float(s)
        return int(f) if f.is_integer() else f

    if isinstance(node, dict):
        return {k: _resolve_refs(v, root) for k, v in node.items()}
    if isinstance(node, list):
        return [_resolve_refs(v, root) for v in node]
    if isinstance(node, str) and "${" in node:
        return resolve_str(node)
    return node


def load_yaml_dict(path: str) -> dict:
    import yaml

    with open(path) as f:
        data = yaml.safe_load(f) or {}
    return _resolve_refs(data, data)


def load_yaml_config(path: str) -> SAM2Config:
    data = load_yaml_dict(path)
    return sam2_config_from_dict(data.get("model", data))


def snapshot_config(cfg, path: str) -> None:
    """Persist a resolved-config snapshot (reference training/train.py:142-153)."""
    with open(path, "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2, default=str)


# Named presets mirroring the reference config zoo (sam2/configs/).
def sam21_hiera_tiny_512() -> SAM2Config:
    return SAM2Config()


def efficienttam_s_512() -> SAM2Config:
    """EfficientMedSAM-S (reference configs/efficientmedsam_s_512_FLARE_RECIST.yaml:79-105)."""
    return SAM2Config(
        hiera=None,
        vitdet=ViTDetConfig(),
        neck=FpnNeckConfig(
            backbone_channel_list=(384,), fpn_top_down_levels=(), neck_norm="LN"
        ),
        neck_scalp=0,
        use_high_res_features_in_sam=False,
        add_tpos_enc_to_obj_ptrs=False,
        proj_tpos_enc_in_obj_ptrs=False,
        use_signed_tpos_enc_to_obj_ptrs=False,
        no_obj_embed_spatial=False,
        # the shipped EfficientMedSAM config uses the plain RoPE memory attention
        # (efficientmedsam_s_512_FLARE_RECIST.yaml:106-137); set
        # efficient_pool_size=2 for the efficient_track_anything landmark variant
        memory_attention=MemoryAttentionConfig(),
    )


def efficienttam_ti_512() -> SAM2Config:
    """EfficientMedSAM/EfficientTAM-TI — ViT-tiny trunk (reference
    sam2/configs/efficientmedsam_ti_512_FLARE_RECIST.yaml:79-105 and
    efficient_track_anything/configs/efficienttam_ti_512x512.yaml:11-30; the
    two differ from the -S family only by embed_dim 192 / num_heads 3)."""
    cfg = efficienttam_s_512()
    return dataclasses.replace(
        cfg,
        vitdet=dataclasses.replace(cfg.vitdet, embed_dim=192, num_heads=3),
        neck=dataclasses.replace(cfg.neck, backbone_channel_list=(192,)),
    )


def tiny64_test() -> SAM2Config:
    """Structurally complete micro config for CI / CPU smoke runs."""
    return SAM2Config(
        image_size=64,
        hiera=HieraConfig(
            embed_dim=8,
            stages=(1, 1, 1, 1),
            q_pool=3,
            global_att_blocks=(),
            window_spec=(4, 2, 2, 2),
            window_pos_embed_bkg_spatial_size=(2, 2),
        ),
        neck=FpnNeckConfig(d_model=32, backbone_channel_list=(64, 32, 16, 8)),
        memory_attention=MemoryAttentionConfig(
            d_model=32, num_layers=1, dim_feedforward=64, rope_feat_sizes=(4, 4),
            kv_in_dim=8,
        ),
        memory_encoder=MemoryEncoderConfig(
            out_dim=8, in_dim=32, mask_downsampler_embed_dim=32, pos_channels=8
        ),
    )


PRESETS = {
    "sam2.1_hiera_t512": sam21_hiera_tiny_512,
    "efficientmedsam_s_512": efficienttam_s_512,
    "efficientmedsam_ti_512": efficienttam_ti_512,
    "efficienttam_ti_512": efficienttam_ti_512,
    "tiny64_test": tiny64_test,
}
