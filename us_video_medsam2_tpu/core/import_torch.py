"""PyTorch → JAX checkpoint importer.

Maps a reference SAM2/MedSAM2 state_dict (e.g. sam2.1_hiera_tiny.pt, MedSAM2
fine-tunes, or the fork's training checkpoints whose model weights live under
"model") onto this framework's parameter pytree. Covers every parameter of the
reference SAM2Base graph (reference sam2/modeling/sam2_base.py:764-1008 and its
submodules); used both for serving real checkpoints and for numerical-parity
fixtures in tests/.

Layout conversions:
  Linear  [out,in]        -> Dense kernel [in,out]
  Conv2d  [out,in,kh,kw]  -> Conv kernel [kh,kw,in,out] (also depthwise)
  ConvT2d [in,out,2,2]    -> ConvTranspose2x kernel [in,2,2,out]
  NCHW param buffers      -> NHWC
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _lin(w):  # torch Linear weight -> Dense kernel
    return np.ascontiguousarray(w.T)


def _conv(w):  # torch Conv2d weight -> flax Conv kernel
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _convT(w):  # torch ConvTranspose2d(k=2,s=2) -> ConvTranspose2x kernel
    return np.ascontiguousarray(np.transpose(w, (0, 2, 3, 1)))


def _put(out: Dict, path: str, value: np.ndarray):
    out[tuple(path.split("/"))] = np.asarray(value)


def _map_attention(out, prefix_t, prefix_j, sd, rope_heads: int = 0):
    """rope_heads > 0 marks a RoPEAttention module: q/k projection output
    channels are permuted from torch's interleaved RoPE-pair layout to the
    half-split layout our apply_rope_halfsplit uses (ops/posenc.py) — q.k is
    invariant since q and k get the same permutation."""
    perm = None
    if rope_heads:
        from us_video_medsam2_tpu.ops.posenc import rope_halfsplit_perm

        dim = sd[f"{prefix_t}.q_proj.weight"].shape[0]
        perm = rope_halfsplit_perm(dim, rope_heads)
    for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
        kern = _lin(sd[f"{prefix_t}.{p}.weight"])
        bias = sd[f"{prefix_t}.{p}.bias"]
        if perm is not None and p in ("q_proj", "k_proj"):
            kern = kern[:, perm]
            bias = bias[perm]
        _put(out, f"{prefix_j}/{p}/kernel", kern)
        _put(out, f"{prefix_j}/{p}/bias", bias)


def _map_mlp(out, prefix_t, prefix_j, sd, n_layers):
    for i in range(n_layers):
        _put(out, f"{prefix_j}/layers_{i}/kernel", _lin(sd[f"{prefix_t}.layers.{i}.weight"]))
        _put(out, f"{prefix_j}/layers_{i}/bias", sd[f"{prefix_t}.layers.{i}.bias"])


def _map_norm(out, prefix_t, prefix_j, sd):
    _put(out, f"{prefix_j}/scale", sd[f"{prefix_t}.weight"])
    _put(out, f"{prefix_j}/bias", sd[f"{prefix_t}.bias"])


def _conv3d_1x1(w):  # torch Conv3d 1x1x1 weight [out,in,1,1,1] -> Dense kernel [in,out]
    return np.ascontiguousarray(w[:, :, 0, 0, 0].T)


def _dw3d(w):  # depthwise Conv3d (k,1,1) weight [C,1,k,1,1] -> [k, C]
    return np.ascontiguousarray(np.transpose(w[:, 0, :, 0, 0], (1, 0)))


def convert_fusion_module(sd: Dict[str, np.ndarray], variant: str, prefix: str = ""):
    """Map ONE reference temporal-fusion module's state_dict onto the
    corresponding flax module's (params, batch_stats) trees.

    Covers safeTemporalContextExchange (sam2_base.py:697-758), GFTE (:372-527)
    and AdaptiveTemporalSemanticFusion (:233-361). BatchNorm3d running stats go
    to the 'batch_stats' collection (eval-mode parity).
    """
    params: Dict[tuple, np.ndarray] = {}
    stats: Dict[tuple, np.ndarray] = {}

    def g(key):
        return np.asarray(sd[prefix + key])

    def bn(tname, jname):
        params[(jname, "scale")] = g(f"{tname}.weight")
        params[(jname, "bias")] = g(f"{tname}.bias")
        stats[(jname, "mean")] = g(f"{tname}.running_mean")
        stats[(jname, "var")] = g(f"{tname}.running_var")

    def dense(tname, jname, transpose=_lin, bias=True):
        w = g(f"{tname}.weight")
        params[(jname, "kernel")] = transpose(w)
        if bias:
            params[(jname, "bias")] = g(f"{tname}.bias")

    if variant == "tce":
        params[("depthwise",)] = _dw3d(g("depthwise_conv.weight"))
        dense("pointwise", "pointwise", _conv3d_1x1, bias=False)
        bn("bn1", "bn1")
        bn("bn2", "bn2")
        dense("attention.1", "attn_fc1", _conv3d_1x1)
        dense("attention.3", "attn_fc2", _conv3d_1x1)
        params[("alpha",)] = g("alpha")
    elif variant == "gfte":
        params[("tattn_in_proj", "kernel")] = _lin(g("temporal_attention.in_proj_weight"))
        params[("tattn_in_proj", "bias")] = g("temporal_attention.in_proj_bias")
        dense("temporal_attention.out_proj", "tattn_out_proj")
        params[("spectral_filters",)] = g("spectral_filters").reshape(-1)
        for i, k in enumerate((3, 5, 7)):
            params[(f"msdw_{k}",)] = _dw3d(g(f"temporal_convs.{i}.weight"))
            params[(f"msdw_{k}_bias",)] = g(f"temporal_convs.{i}.bias")
        dense("refinement.0", "refine_fc1", _conv3d_1x1)
        dense("refinement.2", "refine_fc2", _conv3d_1x1)
        for nm in ("alpha", "beta", "gamma"):
            params[(nm,)] = g(nm)
        dense("spectral_gate.1", "gate_fc1", _conv3d_1x1)
        dense("spectral_gate.3", "gate_fc2", _conv3d_1x1)
        bn("norm1", "norm1")
        bn("norm2", "norm2")
    elif variant == "atsf":
        params[("local_dw",)] = _dw3d(g("local_temp.0.weight"))
        bn("local_temp.1", "local_bn")
        dense("global_temp.1", "global_proj", _conv3d_1x1, bias=False)
        bn("global_temp.2", "global_bn")
        dense("cross_temp_attn.0", "ctattn_fc1", _conv3d_1x1)
        dense("cross_temp_attn.2", "ctattn_fc2", _conv3d_1x1)
        params[("scale_selector",)] = g("scale_selector").reshape(-1)
        dense("fusion_gate.1", "fgate_fc1", _conv3d_1x1)
        dense("fusion_gate.3", "fgate_fc2", _conv3d_1x1)
        dense("output_proj.0", "out_proj", _conv3d_1x1, bias=False)
        bn("output_proj.1", "out_bn")
        params[("residual_weight",)] = g("residual_weight")
    else:
        raise ValueError(f"no torch mapping for fusion variant {variant!r}")

    def unflatten(flat):
        tree: Dict = {}
        for path, val in flat.items():
            node = tree
            for p in path[:-1]:
                node = node.setdefault(p, {})
            node[path[-1]] = np.asarray(val)
        return tree

    return unflatten(params), unflatten(stats)


def convert_reference_state_dict(sd: Dict[str, np.ndarray], cfg) -> Dict:
    """Convert a reference SAM2Base state_dict (numpy values) to a flax param dict."""
    out: Dict[tuple, np.ndarray] = {}
    consumed = set()

    def take(key):
        consumed.add(key)
        return sd[key]

    def has(key):
        return key in sd

    # ---------------- trunk (Hiera) ----------------
    if has("image_encoder.trunk.pos_embed_window"):
        _put(
            out,
            "image_encoder/trunk/patch_embed/kernel",
            _conv(take("image_encoder.trunk.patch_embed.proj.weight")),
        )
        _put(
            out,
            "image_encoder/trunk/patch_embed/bias",
            take("image_encoder.trunk.patch_embed.proj.bias"),
        )
        _put(
            out,
            "image_encoder/trunk/pos_embed",
            np.transpose(take("image_encoder.trunk.pos_embed"), (0, 2, 3, 1)),
        )
        _put(
            out,
            "image_encoder/trunk/pos_embed_window",
            np.transpose(take("image_encoder.trunk.pos_embed_window"), (0, 2, 3, 1)),
        )
        block_re = re.compile(r"image_encoder\.trunk\.blocks\.(\d+)\.")
        block_ids = sorted(
            {int(m.group(1)) for k in sd if (m := block_re.match(k))}
        )
        for i in block_ids:
            t = f"image_encoder.trunk.blocks.{i}"
            j = f"image_encoder/trunk/blocks_{i}"
            _map_norm(out, f"{t}.norm1", f"{j}/norm1", sd)
            _map_norm(out, f"{t}.norm2", f"{j}/norm2", sd)
            for suffix in ("qkv", "proj"):
                _put(out, f"{j}/attn/{suffix}/kernel", _lin(sd[f"{t}.attn.{suffix}.weight"]))
                _put(out, f"{j}/attn/{suffix}/bias", sd[f"{t}.attn.{suffix}.bias"])
            _map_mlp(out, f"{t}.mlp", f"{j}/mlp", sd, 2)
            if has(f"{t}.proj.weight"):
                _put(out, f"{j}/proj/kernel", _lin(sd[f"{t}.proj.weight"]))
                _put(out, f"{j}/proj/bias", sd[f"{t}.proj.bias"])

    # ---------------- trunk (ViTDet — EfficientTAM family) ----------------
    if not has("image_encoder.trunk.pos_embed_window") and has(
        "image_encoder.trunk.pos_embed"
    ):
        # plain-ViT trunk: pos_embed [1, N(+cls), C] kept as-is
        _put(out, "image_encoder/trunk/pos_embed", take("image_encoder.trunk.pos_embed"))
        if has("image_encoder.trunk.patch_embed.proj.weight"):
            # overwrite the hiera-style mapping above isn't possible (hiera has
            # pos_embed_window); for ViT this is the only patch_embed mapping
            _put(
                out,
                "image_encoder/trunk/patch_embed/kernel",
                _conv(take("image_encoder.trunk.patch_embed.proj.weight")),
            )
            _put(
                out,
                "image_encoder/trunk/patch_embed/bias",
                take("image_encoder.trunk.patch_embed.proj.bias"),
            )
        vit_block_re = re.compile(r"image_encoder\.trunk\.blocks\.(\d+)\.")
        for i in sorted({int(m.group(1)) for k in sd if (m := vit_block_re.match(k))}):
            t = f"image_encoder.trunk.blocks.{i}"
            j = f"image_encoder/trunk/blocks_{i}"
            _map_norm(out, f"{t}.norm1", f"{j}/norm1", sd)
            _map_norm(out, f"{t}.norm2", f"{j}/norm2", sd)
            for suffix in ("qkv", "proj"):
                _put(out, f"{j}/attn/{suffix}/kernel", _lin(sd[f"{t}.attn.{suffix}.weight"]))
                _put(out, f"{j}/attn/{suffix}/bias", sd[f"{t}.attn.{suffix}.bias"])
            _map_mlp(out, f"{t}.mlp", f"{j}/mlp", sd, 2)

    # ---------------- neck ----------------
    neck_re = re.compile(r"image_encoder\.neck\.convs\.(\d+)\.conv\.weight")
    for k in list(sd):
        m = neck_re.match(k)
        if m:
            j = int(m.group(1))
            _put(out, f"image_encoder/neck/convs_{j}/kernel", _conv(sd[k]))
            _put(
                out,
                f"image_encoder/neck/convs_{j}/bias",
                sd[f"image_encoder.neck.convs.{j}.conv.bias"],
            )
    # ViTDetNeck: convs.0.conv_1x1 / norm_0 / conv_3x3 / norm_1
    if has("image_encoder.neck.convs.0.conv_1x1.weight"):
        base = "image_encoder.neck.convs.0"
        _put(out, "image_encoder/neck/convs_0_conv_1x1/kernel", _conv(sd[f"{base}.conv_1x1.weight"]))
        if has(f"{base}.conv_1x1.bias"):
            _put(out, "image_encoder/neck/convs_0_conv_1x1/bias", sd[f"{base}.conv_1x1.bias"])
        _put(out, "image_encoder/neck/convs_0_conv_3x3/kernel", _conv(sd[f"{base}.conv_3x3.weight"]))
        if has(f"{base}.conv_3x3.bias"):
            _put(out, "image_encoder/neck/convs_0_conv_3x3/bias", sd[f"{base}.conv_3x3.bias"])
        if has(f"{base}.norm_0.weight"):
            _map_norm(out, f"{base}.norm_0", "image_encoder/neck/convs_0_norm_0", sd)
            _map_norm(out, f"{base}.norm_1", "image_encoder/neck/convs_0_norm_1", sd)

    # ---------------- core params ----------------
    _put(out, "maskmem_tpos_enc", take("maskmem_tpos_enc").reshape(cfg.num_maskmem, -1))
    _put(out, "no_mem_embed", take("no_mem_embed").reshape(-1))
    _put(out, "no_mem_pos_enc", take("no_mem_pos_enc").reshape(-1))
    if has("no_obj_ptr"):
        _put(out, "no_obj_ptr", take("no_obj_ptr").reshape(-1))
    if has("no_obj_embed_spatial"):
        _put(out, "no_obj_embed_spatial", take("no_obj_embed_spatial").reshape(-1))
    if has("mask_downsample.weight"):
        _put(out, "mask_downsample/conv/kernel", _conv(take("mask_downsample.weight")))
        _put(out, "mask_downsample/conv/bias", take("mask_downsample.bias"))

    # ---------------- memory attention ----------------
    ma_layers = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(r"memory_attention\.layers\.(\d+)\.", k))
        }
    )
    for i in ma_layers:
        t = f"memory_attention.layers.{i}"
        j = f"memory_attention/layers_{i}"
        ma_heads = cfg.memory_attention.num_heads
        _map_attention(out, f"{t}.self_attn", f"{j}/self_attn", sd, rope_heads=ma_heads)
        _map_attention(
            out, f"{t}.cross_attn_image", f"{j}/cross_attn_image", sd,
            rope_heads=ma_heads,
        )
        for n in ("norm1", "norm2", "norm3"):
            _map_norm(out, f"{t}.{n}", f"{j}/{n}", sd)
        for n in ("linear1", "linear2"):
            _put(out, f"{j}/{n}/kernel", _lin(sd[f"{t}.{n}.weight"]))
            _put(out, f"{j}/{n}/bias", sd[f"{t}.{n}.bias"])
    _map_norm(out, "memory_attention.norm", "memory_attention/norm", sd)

    # ---------------- memory encoder ----------------
    md_conv_re = re.compile(r"memory_encoder\.mask_downsampler\.encoder\.(\d+)\.weight")
    md_ids = sorted({int(m.group(1)) for k in sd if (m := md_conv_re.match(k))})
    conv_count = 0
    for idx in md_ids:
        t = f"memory_encoder.mask_downsampler.encoder.{idx}"
        w = sd[f"{t}.weight"]
        if w.ndim == 4:  # conv
            if idx == md_ids[-1]:
                _put(out, "memory_encoder/mask_downsampler/encoder_out/conv/kernel", _conv(w))
                _put(out, "memory_encoder/mask_downsampler/encoder_out/conv/bias", sd[f"{t}.bias"])
            else:
                _put(
                    out,
                    f"memory_encoder/mask_downsampler/encoder_{conv_count}/conv/kernel",
                    _conv(w),
                )
                _put(
                    out,
                    f"memory_encoder/mask_downsampler/encoder_{conv_count}/conv/bias",
                    sd[f"{t}.bias"],
                )
        else:  # LayerNorm2d
            _put(
                out,
                f"memory_encoder/mask_downsampler/encoder_ln_{conv_count}/scale",
                w,
            )
            _put(
                out,
                f"memory_encoder/mask_downsampler/encoder_ln_{conv_count}/bias",
                sd[f"{t}.bias"],
            )
            conv_count += 1
    _put(out, "memory_encoder/pix_feat_proj/conv/kernel", _conv(sd["memory_encoder.pix_feat_proj.weight"]))
    _put(out, "memory_encoder/pix_feat_proj/conv/bias", sd["memory_encoder.pix_feat_proj.bias"])
    fuser_ids = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(r"memory_encoder\.fuser\.layers\.(\d+)\.", k))
        }
    )
    for i in fuser_ids:
        t = f"memory_encoder.fuser.layers.{i}"
        j = f"memory_encoder/fuser_{i}"
        _put(out, f"{j}/dwconv/conv/kernel", _conv(sd[f"{t}.dwconv.weight"]))
        _put(out, f"{j}/dwconv/conv/bias", sd[f"{t}.dwconv.bias"])
        _map_norm(out, f"{t}.norm", f"{j}/norm", sd)
        _put(out, f"{j}/pwconv1/kernel", _lin(sd[f"{t}.pwconv1.weight"]))
        _put(out, f"{j}/pwconv1/bias", sd[f"{t}.pwconv1.bias"])
        _put(out, f"{j}/pwconv2/kernel", _lin(sd[f"{t}.pwconv2.weight"]))
        _put(out, f"{j}/pwconv2/bias", sd[f"{t}.pwconv2.bias"])
        _put(out, f"{j}/gamma", sd[f"{t}.gamma"])
    if has("memory_encoder.out_proj.weight"):
        _put(out, "memory_encoder/out_proj/conv/kernel", _conv(sd["memory_encoder.out_proj.weight"]))
        _put(out, "memory_encoder/out_proj/conv/bias", sd["memory_encoder.out_proj.bias"])

    # ---------------- prompt encoder ----------------
    _put(
        out,
        "sam_prompt_encoder/pe_gaussian",
        sd["sam_prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"],
    )
    point_embed = np.concatenate(
        [sd["sam_prompt_encoder.not_a_point_embed.weight"]]
        + [sd[f"sam_prompt_encoder.point_embeddings.{i}.weight"] for i in range(4)],
        axis=0,
    )
    _put(out, "sam_prompt_encoder/point_embed", point_embed)
    _put(out, "sam_prompt_encoder/no_mask_embed", sd["sam_prompt_encoder.no_mask_embed.weight"].reshape(-1))
    md = "sam_prompt_encoder.mask_downscaling"
    _put(out, "sam_prompt_encoder/mask_down_conv1/conv/kernel", _conv(sd[f"{md}.0.weight"]))
    _put(out, "sam_prompt_encoder/mask_down_conv1/conv/bias", sd[f"{md}.0.bias"])
    _map_norm(out, f"{md}.1", "sam_prompt_encoder/mask_down_ln1", sd)
    _put(out, "sam_prompt_encoder/mask_down_conv2/conv/kernel", _conv(sd[f"{md}.3.weight"]))
    _put(out, "sam_prompt_encoder/mask_down_conv2/conv/bias", sd[f"{md}.3.bias"])
    _map_norm(out, f"{md}.4", "sam_prompt_encoder/mask_down_ln2", sd)
    _put(out, "sam_prompt_encoder/mask_down_conv3/conv/kernel", _conv(sd[f"{md}.6.weight"]))
    _put(out, "sam_prompt_encoder/mask_down_conv3/conv/bias", sd[f"{md}.6.bias"])

    # ---------------- mask decoder ----------------
    dec = "sam_mask_decoder"
    j = "sam_mask_decoder"
    _put(out, f"{j}/iou_token", sd[f"{dec}.iou_token.weight"])
    _put(out, f"{j}/mask_tokens", sd[f"{dec}.mask_tokens.weight"])
    if has(f"{dec}.obj_score_token.weight"):
        _put(out, f"{j}/obj_score_token", sd[f"{dec}.obj_score_token.weight"])
    for i in range(2):
        t = f"{dec}.transformer.layers.{i}"
        jj = f"{j}/transformer/layers_{i}"
        for attn in (
            "self_attn",
            "cross_attn_token_to_image",
            "cross_attn_image_to_token",
        ):
            _map_attention(out, f"{t}.{attn}", f"{jj}/{attn}", sd)
        for n in ("norm1", "norm2", "norm3", "norm4"):
            _map_norm(out, f"{t}.{n}", f"{jj}/{n}", sd)
        _map_mlp(out, f"{t}.mlp", f"{jj}/mlp", sd, 2)
    _map_attention(
        out,
        f"{dec}.transformer.final_attn_token_to_image",
        f"{j}/transformer/final_attn_token_to_image",
        sd,
    )
    _map_norm(out, f"{dec}.transformer.norm_final_attn", f"{j}/transformer/norm_final_attn", sd)
    _put(out, f"{j}/upscale_dc1/kernel", _convT(sd[f"{dec}.output_upscaling.0.weight"]))
    _put(out, f"{j}/upscale_dc1/bias", sd[f"{dec}.output_upscaling.0.bias"])
    _map_norm(out, f"{dec}.output_upscaling.1", f"{j}/upscale_ln", sd)
    _put(out, f"{j}/upscale_dc2/kernel", _convT(sd[f"{dec}.output_upscaling.3.weight"]))
    _put(out, f"{j}/upscale_dc2/bias", sd[f"{dec}.output_upscaling.3.bias"])
    n_mask_tokens = sd[f"{dec}.mask_tokens.weight"].shape[0]
    for i in range(n_mask_tokens):
        _map_mlp(out, f"{dec}.output_hypernetworks_mlps.{i}", f"{j}/hyper_mlps_{i}", sd, 3)
    _map_mlp(out, f"{dec}.iou_prediction_head", f"{j}/iou_head", sd, 3)
    if has(f"{dec}.pred_obj_score_head.layers.0.weight"):
        _map_mlp(out, f"{dec}.pred_obj_score_head", f"{j}/obj_score_head", sd, 3)
    elif has(f"{dec}.pred_obj_score_head.weight"):
        _put(out, f"{j}/obj_score_head/kernel", _lin(sd[f"{dec}.pred_obj_score_head.weight"]))
        _put(out, f"{j}/obj_score_head/bias", sd[f"{dec}.pred_obj_score_head.bias"])
    # decoder high-res projections live at the model top level here
    if has(f"{dec}.conv_s0.weight"):
        _put(out, "conv_s0/conv/kernel", _conv(sd[f"{dec}.conv_s0.weight"]))
        _put(out, "conv_s0/conv/bias", sd[f"{dec}.conv_s0.bias"])
        _put(out, "conv_s1/conv/kernel", _conv(sd[f"{dec}.conv_s1.weight"]))
        _put(out, "conv_s1/conv/bias", sd[f"{dec}.conv_s1.bias"])

    # ---------------- object pointers ----------------
    if has("obj_ptr_proj.layers.0.weight"):
        _map_mlp(out, "obj_ptr_proj", "obj_ptr_proj", sd, 3)
    elif has("obj_ptr_proj.weight"):
        _put(out, "obj_ptr_proj/kernel", _lin(sd["obj_ptr_proj.weight"]))
        _put(out, "obj_ptr_proj/bias", sd["obj_ptr_proj.bias"])
    if has("obj_ptr_tpos_proj.weight"):
        _put(out, "obj_ptr_tpos_proj/kernel", _lin(sd["obj_ptr_tpos_proj.weight"]))
        _put(out, "obj_ptr_tpos_proj/bias", sd["obj_ptr_tpos_proj.bias"])

    # ---------------- temporal fusion (fork modules) ----------------
    stats_modules: Dict[str, Dict] = {}
    fusion_variant = getattr(getattr(cfg, "temporal_fusion", None), "variant", "none")
    i = 0
    while any(k.startswith(f"temporal_fusion.{i}.") for k in sd):
        p_tree, s_tree = convert_fusion_module(
            sd, fusion_variant, prefix=f"temporal_fusion.{i}."
        )
        name = f"temporal_fusion_{i}"

        def _flatten(prefix_tuple, node, dst):
            for k, v in node.items():
                if isinstance(v, dict):
                    _flatten(prefix_tuple + (k,), v, dst)
                else:
                    dst[prefix_tuple + (k,)] = v

        _flatten((name,), p_tree, out)
        if s_tree:
            stats_modules[name] = s_tree
        i += 1

    # unflatten
    tree: Dict = {}
    for path, val in out.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = val
    result = {"params": tree}
    if stats_modules:
        result["batch_stats"] = stats_modules
    return result


def load_torch_checkpoint(path: str, cfg):
    """Load a .pt checkpoint (strict key handling as build_sam.py:197-207)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt.get("model", ckpt)
    sd_np = {k: v.float().numpy() for k, v in sd.items()}
    return convert_reference_state_dict(sd_np, cfg)
