"""Full-size tracking parity: ours vs the reference torch models.

The round-1 parity fixtures exercise reduced-but-structurally-identical configs;
this tool closes the remaining gap by running the FULL production architectures
on real RECIST CT-lesion NPZ cases end to end through the torch importer:

  run          model                         case                                  prompt
  hiera_box    sam2.1_hiera_t512             CT_Lesion_000001_02_01_008-023.npz    box
  hiera_point  sam2.1_hiera_t512             CT_Lesion_000002_03_01_035-047.npz    point
  etam_box     efficientmedsam_s_512         CT_Lesion_000009_03_01_036-048.npz    box
  etam_point   efficientmedsam_s_512         CT_Lesion_000010_01_01_078-090.npz    point

Model configs mirror reference sam2/configs/sam2.1_hiera_t512.yaml and
efficientmedsam_s_512_FLARE_RECIST.yaml:79-215 (EfficientTAMBase, ViT-S trunk);
the box prompt follows medsam2_infer_CT_lesion_npz_recist.py (corner points,
labels 2/3) and the point prompt is a single positive click at the key-slice GT
centroid (training prompt protocol, labels 1).

No pretrained weights are reachable from this machine (zero egress), so each
checkpoint is a fixed-seed random init shared bit-exactly by both sides — the
comparison demonstrates implementation parity at full scale, which is the part
the reduced fixtures could not: full 512^2 resolution, 128-token RoPE tables,
7-slot memory bank at real KV lengths, the production importer path.

Usage:
  python tools/run_fullsize_parity.py torch [run ...]  # needs /root/reference; writes /tmp/fullsize_parity
  python tools/run_fullsize_parity.py jax   [run ...]  # runs ours on CPU f32; writes docs/FULLSIZE_PARITY.md
"""

import json
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
WORK = pathlib.Path("/tmp/fullsize_parity")
DATA = "/root/reference/data/RECIST_train_npz"
N_FRAMES = 8
IMG_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMG_STD = np.array([0.229, 0.224, 0.225], np.float32)

RUNS = {
    "hiera_box": dict(
        model="hiera", prompt="box",
        case=f"{DATA}/CT_Lesion_000001_02_01_008-023.npz",
    ),
    "hiera_point": dict(
        model="hiera", prompt="point",
        case=f"{DATA}/CT_Lesion_000002_03_01_035-047.npz",
    ),
    "etam_box": dict(
        model="etam", prompt="box",
        case=f"{DATA}/CT_Lesion_000009_03_01_036-048.npz",
    ),
    "etam_point": dict(
        model="etam", prompt="point",
        case=f"{DATA}/CT_Lesion_000010_01_01_078-090.npz",
    ),
}
MODEL_LABEL = {"hiera": "sam2.1_hiera_t512", "etam": "efficientmedsam_s_512"}


def load_case(case_path, prompt):
    """Normalized frames [T,3,512,512] + GT masks + prompt from frame-0 GT.

    The window starts at the largest-GT slice (the RECIST key slice — the
    reference CLI also prompts at the lesion's key slice and tracks outward)."""
    case = np.load(case_path)
    areas = (case["gts"] > 0).sum(axis=(1, 2))
    start = int(np.argmax(areas))
    start = min(start, case["imgs"].shape[0] - N_FRAMES)
    sl = slice(start, start + N_FRAMES)
    imgs = case["imgs"][sl].astype(np.float32) / 255.0  # [T,512,512]
    gts = (case["gts"][sl] > 0).astype(np.uint8)
    frames = (imgs[:, None] - IMG_MEAN[None, :, None, None]) / IMG_STD[None, :, None, None]
    ys, xs = np.nonzero(gts[0])
    if prompt == "box":
        # RECIST-style box prompt (corner points, labels 2/3 — reference
        # medsam2_infer_CT_lesion_npz_recist.py uses add_new_points_or_box(box=...))
        coords = np.array(
            [[[xs.min(), ys.min()], [xs.max() + 1, ys.max() + 1]]], np.float32
        )
        labels = np.array([[2, 3]], np.int32)
    else:
        # single positive click at the GT centroid; snap to the nearest
        # in-mask pixel so concave lesions still get an in-lesion click
        cy, cx = float(ys.mean()), float(xs.mean())
        i = int(np.argmin((ys - cy) ** 2 + (xs - cx) ** 2))
        coords = np.array([[[float(xs[i]), float(ys[i])]]], np.float32)
        labels = np.array([[1]], np.int32)
    return frames.astype(np.float32), gts, coords, labels


def init_weights_torch(model, seed=7):
    """Fixed-seed random weights (no pretrained checkpoints reachable; see
    module doc). Fan-in scaling keeps activations O(1) through the full model
    so mask logits stay non-saturated and the comparison has teeth (a flat
    0.04 std saturates the mask decoder at this scale)."""
    import torch

    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in sorted(model.named_parameters()):
            if p.ndim >= 2:
                fan_in = int(np.prod(p.shape[1:]))
                std = 1.0 / max(1.0, fan_in) ** 0.5
                p.copy_(torch.randn(p.shape, generator=gen) * std)
            elif name.endswith("weight") or "norm" in name or "gamma" in name:
                p.copy_(1.0 + 0.05 * torch.randn(p.shape, generator=gen))
            else:
                p.copy_(0.02 * torch.randn(p.shape, generator=gen))
    model.eval()


def build_torch_hiera():
    """Reference SAM2Base at sam2/configs/sam2.1_hiera_t512.yaml."""
    from sam2.modeling.backbones.hieradet import Hiera
    from sam2.modeling.backbones.image_encoder import FpnNeck, ImageEncoder
    from sam2.modeling.position_encoding import PositionEmbeddingSine
    from sam2.modeling.sam2_base import SAM2Base

    trunk = Hiera(
        embed_dim=96,
        num_heads=1,
        stages=[1, 2, 7, 2],
        global_att_blocks=[5, 7, 9],
        window_pos_embed_bkg_spatial_size=[7, 7],
    )
    neck = FpnNeck(
        position_encoding=PositionEmbeddingSine(
            num_pos_feats=256, normalize=True, scale=None, temperature=10000
        ),
        d_model=256,
        backbone_channel_list=[768, 384, 192, 96],
        fpn_top_down_levels=[2, 3],
        fpn_interp_model="nearest",
    )
    return SAM2Base(
        image_encoder=ImageEncoder(trunk=trunk, neck=neck, scalp=1),
        memory_attention=_torch_memory_attention(),
        memory_encoder=_torch_memory_encoder(),
        num_maskmem=7,
        image_size=512,
        sigmoid_scale_for_mem_enc=20.0,
        sigmoid_bias_for_mem_enc=-10.0,
        use_mask_input_as_output_without_sam=True,
        directly_add_no_mem_embed=True,
        no_obj_embed_spatial=True,
        use_high_res_features_in_sam=True,
        multimask_output_in_sam=True,
        iou_prediction_use_sigmoid=True,
        use_obj_ptrs_in_encoder=True,
        add_tpos_enc_to_obj_ptrs=True,
        proj_tpos_enc_in_obj_ptrs=True,
        use_signed_tpos_enc_to_obj_ptrs=True,
        only_obj_ptrs_in_the_past_for_eval=True,
        pred_obj_scores=True,
        pred_obj_scores_mlp=True,
        fixed_no_obj_ptr=True,
        multimask_output_for_tracking=True,
        use_multimask_token_for_obj_ptr=True,
        multimask_min_pt_num=0,
        multimask_max_pt_num=1,
        use_mlp_for_obj_ptr_proj=True,
        sam_mask_decoder_extra_args=dict(
            dynamic_multimask_via_stability=True,
            dynamic_multimask_stability_delta=0.05,
            dynamic_multimask_stability_thresh=0.98,
        ),
    )


def build_torch_etam():
    """Reference EfficientTAMBase at efficientmedsam_s_512_FLARE_RECIST.yaml:79-215
    (ViT-S trunk, ViTDetNeck, scalp 0, no high-res SAM features); the stability
    extra args mirror build_efficienttam's apply_postprocessing overrides
    (sam2/build_sam.py:111-117), matching our efficienttam_s_512() defaults."""
    from sam2.modeling.backbones.image_encoder import ImageEncoder, ViTDetNeck
    from sam2.modeling.backbones.vitdet import ViT
    from sam2.modeling.efficienttam_base import EfficientTAMBase
    from sam2.modeling.position_encoding import PositionEmbeddingSine

    trunk = ViT(
        img_size=512,
        patch_size=16,
        embed_dim=384,
        depth=12,
        num_heads=6,
        mlp_ratio=4.0,
        qkv_bias=True,
        drop_path_rate=0.0,
        use_rel_pos=False,
        window_size=14,
        window_block_indexes=[0, 1, 3, 4, 6, 7, 9, 10],
    )
    neck = ViTDetNeck(
        position_encoding=PositionEmbeddingSine(
            num_pos_feats=256, normalize=True, scale=None, temperature=10000
        ),
        d_model=256,
        backbone_channel_list=[384],
        neck_norm="LN",
    )
    return EfficientTAMBase(
        image_encoder=ImageEncoder(trunk=trunk, neck=neck, scalp=0),
        memory_attention=_torch_memory_attention(),
        memory_encoder=_torch_memory_encoder(),
        num_maskmem=7,
        image_size=512,
        sigmoid_scale_for_mem_enc=20.0,
        sigmoid_bias_for_mem_enc=-10.0,
        use_mask_input_as_output_without_sam=True,
        directly_add_no_mem_embed=True,
        use_high_res_features_in_sam=False,
        multimask_output_in_sam=True,
        iou_prediction_use_sigmoid=True,
        use_obj_ptrs_in_encoder=True,
        add_tpos_enc_to_obj_ptrs=False,
        only_obj_ptrs_in_the_past_for_eval=True,
        pred_obj_scores=True,
        pred_obj_scores_mlp=True,
        fixed_no_obj_ptr=True,
        multimask_output_for_tracking=True,
        use_multimask_token_for_obj_ptr=True,
        multimask_min_pt_num=0,
        multimask_max_pt_num=1,
        use_mlp_for_obj_ptr_proj=True,
        sam_mask_decoder_extra_args=dict(
            dynamic_multimask_via_stability=True,
            dynamic_multimask_stability_delta=0.05,
            dynamic_multimask_stability_thresh=0.98,
        ),
    )


def _torch_memory_attention():
    """Shared between both configs (efficientmedsam_s_512_FLARE_RECIST.yaml:106-137)."""
    from sam2.modeling.memory_attention import MemoryAttention, MemoryAttentionLayer
    from sam2.modeling.sam.transformer import RoPEAttention

    def rope_self():
        return RoPEAttention(
            rope_theta=10000.0, feat_sizes=[32, 32], embedding_dim=256,
            num_heads=1, downsample_rate=1, dropout=0.1,
        )

    def rope_cross():
        return RoPEAttention(
            rope_theta=10000.0, feat_sizes=[32, 32], rope_k_repeat=True,
            embedding_dim=256, num_heads=1, downsample_rate=1, dropout=0.1,
            kv_in_dim=64,
        )

    layer = MemoryAttentionLayer(
        activation="relu", dim_feedforward=2048, dropout=0.1,
        pos_enc_at_attn=False, self_attention=rope_self(), d_model=256,
        pos_enc_at_cross_attn_keys=True, pos_enc_at_cross_attn_queries=False,
        cross_attention=rope_cross(),
    )
    return MemoryAttention(
        d_model=256, pos_enc_at_input=True, layer=layer, num_layers=4
    )


def _torch_memory_encoder():
    from sam2.modeling.memory_encoder import (
        CXBlock,
        Fuser,
        MaskDownSampler,
        MemoryEncoder,
    )
    from sam2.modeling.position_encoding import PositionEmbeddingSine

    return MemoryEncoder(
        out_dim=64,
        position_encoding=PositionEmbeddingSine(
            num_pos_feats=64, normalize=True, scale=None, temperature=10000
        ),
        mask_downsampler=MaskDownSampler(kernel_size=3, stride=2, padding=1),
        fuser=Fuser(
            CXBlock(dim=256, kernel_size=7, padding=3, layer_scale_init_value=1e-6, use_dwconv=True),
            num_layers=2,
        ),
    )


def multimask_for(prompt, t):
    """Reference SAM2Base._use_multimask: multimask unless the prompted frame
    carries more points than multimask_max_pt_num=1 (the 2-corner box)."""
    return not (prompt == "box" and t == 0)


def run_torch(names):
    import torch

    sys.path.insert(0, str(REPO / "tools"))
    from gen_reference_fixtures import install_reference_packages

    install_reference_packages()
    for name in names:
        spec = RUNS[name]
        torch.manual_seed(1234)
        model = build_torch_hiera() if spec["model"] == "hiera" else build_torch_etam()
        init_weights_torch(model)

        rundir = WORK / name
        rundir.mkdir(parents=True, exist_ok=True)
        sd = {k: v.detach().float().numpy() for k, v in model.state_dict().items()}
        np.savez(rundir / "state_dict.npz", **sd)
        n_params = sum(v.size for v in sd.values())
        print(f"[{name}] state_dict: {len(sd)} tensors, {n_params/1e6:.1f}M params", flush=True)

        frames, gts, coords, labels = load_case(spec["case"], spec["prompt"])
        out_data = {"coords": coords, "labels": labels, "n_params": np.int64(n_params)}
        with torch.no_grad():
            be = model.forward_image(torch.from_numpy(frames))
            _, vis_feats, vis_pos, feat_sizes = model._prepare_backbone_features(be)
            output_dict = {"cond_frame_outputs": {}, "non_cond_frame_outputs": {}}
            for t in range(N_FRAMES):
                cvf = [x[:, t : t + 1] for x in vis_feats]
                cvp = [x[:, t : t + 1] for x in vis_pos]
                point_inputs = None
                if t == 0:
                    point_inputs = {
                        "point_coords": torch.from_numpy(coords),
                        "point_labels": torch.from_numpy(labels),
                    }
                current_out = model.track_step(
                    frame_idx=t,
                    is_init_cond_frame=(t == 0),
                    current_vision_feats=cvf,
                    current_vision_pos_embeds=cvp,
                    feat_sizes=feat_sizes,
                    point_inputs=point_inputs,
                    mask_inputs=None,
                    output_dict=output_dict,
                    num_frames=N_FRAMES,
                )
                store = "cond_frame_outputs" if t == 0 else "non_cond_frame_outputs"
                output_dict[store][t] = current_out
                out_data[f"pred_masks_{t}"] = current_out["pred_masks"].numpy()
                out_data[f"obj_ptr_{t}"] = current_out["obj_ptr"].numpy()
                out_data[f"score_{t}"] = current_out["object_score_logits"].numpy()
                # full-res mask the reference eval uses (medsam2_infer_video.py: F.interpolate
                # of pred_masks to video resolution, threshold 0)
                hi = torch.nn.functional.interpolate(
                    current_out["pred_masks"], size=(512, 512),
                    mode="bilinear", align_corners=False,
                )
                out_data[f"mask512_{t}"] = (hi[0, 0].numpy() > 0).astype(np.uint8)
                print(f"[{name}] frame {t} done", flush=True)
        np.savez_compressed(rundir / "ref_outputs.npz", **out_data)
        print("wrote", rundir / "ref_outputs.npz", flush=True)


def dice(a, b):
    inter = float(np.sum((a > 0) & (b > 0)))
    s = float(np.sum(a > 0) + np.sum(b > 0))
    return 2 * inter / s if s else 1.0


def run_jax(names):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp

    from us_video_medsam2_tpu.core.config import (
        efficienttam_s_512,
        sam21_hiera_tiny_512,
    )
    from us_video_medsam2_tpu.core.import_torch import convert_reference_state_dict
    from us_video_medsam2_tpu.models.memory_bank import init_memory_bank
    from us_video_medsam2_tpu.models.sam2 import SAM2Model
    from us_video_medsam2_tpu.ops.resize import resize2d

    for name in names:
        spec = RUNS[name]
        rundir = WORK / name
        cfg = sam21_hiera_tiny_512() if spec["model"] == "hiera" else efficienttam_s_512()
        sd = dict(np.load(rundir / "state_dict.npz"))
        params = convert_reference_state_dict(sd, cfg)
        model = SAM2Model(cfg, dtype=jnp.float32)

        frames, gts, coords, labels = load_case(spec["case"], spec["prompt"])
        ref = np.load(rundir / "ref_outputs.npz")
        frames_nhwc = jnp.asarray(np.transpose(frames, (0, 2, 3, 1)))

        be = model.apply(params, frames_nhwc, method=model.forward_image)
        fpn = be["backbone_fpn"]
        hw = cfg.image_size // 16
        bank = init_memory_bank(1, N_FRAMES, hw * hw, cfg.mem_dim, cfg.hidden_dim)

        rows = []
        for t in range(N_FRAMES):
            if spec["model"] == "hiera":
                feats = {
                    "top": fpn[2][t : t + 1],
                    "s0": fpn[0][t : t + 1],
                    "s1": fpn[1][t : t + 1],
                }
            else:
                feats = {"top": fpn[-1][t : t + 1]}
            kwargs = dict(multimask_output=multimask_for(spec["prompt"], t))
            pc = pl = None
            if t == 0:
                kwargs.update(is_init_cond_frame=True, is_cond_frame=True)
                pc = jnp.asarray(coords)
                pl = jnp.asarray(labels, jnp.int32)
            out, bank = model.apply(
                params, jnp.asarray(t), feats, bank, N_FRAMES, pc, pl,
                method=model.track_step, **kwargs,
            )
            ours_low = np.asarray(out["low_res_masks"], np.float32)
            ref_low = ref[f"pred_masks_{t}"]
            hi = resize2d(
                jnp.asarray(ours_low).transpose(0, 2, 3, 1), (512, 512),
                mode="linear", antialias=False,
            )
            ours512 = (np.asarray(hi)[0, :, :, 0] > 0).astype(np.uint8)
            ref512 = ref[f"mask512_{t}"]
            rows.append(
                dict(
                    frame=t,
                    mask_dice=dice(ours512, ref512),
                    logit_mae=float(np.abs(ours_low - ref_low).mean()),
                    logit_scale=float(np.abs(ref_low).mean()),
                    obj_ptr_maxerr=float(
                        np.abs(np.asarray(out["obj_ptr"]) - ref[f"obj_ptr_{t}"]).max()
                    ),
                    dice_ours_gt=dice(ours512, gts[t]),
                    dice_ref_gt=dice(ref512, gts[t]),
                )
            )
            print(f"[{name}]", rows[-1], flush=True)
        (rundir / "result.json").write_text(
            json.dumps(dict(run=name, n_params=int(ref["n_params"]), rows=rows))
        )
    write_doc()


def write_doc():
    results = {}
    for name in RUNS:
        p = WORK / name / "result.json"
        if p.exists():
            results[name] = json.loads(p.read_text())
    lines = [
        "# Full-size parity: production configs, real RECIST cases",
        "",
        "Per run: identical fixed-seed random checkpoint loaded on both sides —",
        "torch reference via its own `SAM2Base.track_step` / `EfficientTAMBase.track_step`,",
        "ours through `core/import_torch.py` (the production importer) into",
        "`SAM2Model.track_step` at f32, 8 frames from the RECIST key slice.",
        "Generated by `tools/run_fullsize_parity.py` (reference",
        "sam2/configs/sam2.1_hiera_t512.yaml + efficientmedsam_s_512_FLARE_RECIST.yaml,",
        "medsam2_infer_CT_lesion_npz_recist.py box protocol / centroid-click point protocol).",
        "",
    ]
    for name, res in results.items():
        spec = RUNS[name]
        rows = res["rows"]
        lines += [
            f"## {name}: {MODEL_LABEL[spec['model']]}, {spec['prompt']} prompt "
            f"({res['n_params']/1e6:.1f}M params)",
            "",
            f"Case: `{spec['case']}`",
            "",
            "| frame | mask Dice (ours vs ref) | logit MAE | mean |logit| | obj_ptr max err | Dice ours/GT | Dice ref/GT |",
            "|---|---|---|---|---|---|---|",
        ]
        for r in rows:
            lines.append(
                f"| {r['frame']} | {r['mask_dice']:.4f} | {r['logit_mae']:.2e} | "
                f"{r['logit_scale']:.3f} | {r['obj_ptr_maxerr']:.2e} | "
                f"{r['dice_ours_gt']:.4f} | {r['dice_ref_gt']:.4f} |"
            )
        lines += [
            "",
            f"Mean mask Dice ours-vs-reference: "
            f"**{np.mean([r['mask_dice'] for r in rows]):.4f}**; "
            f"Dice-vs-GT agreement gap: "
            f"**{max(abs(r['dice_ours_gt'] - r['dice_ref_gt']) for r in rows):.4f}**.",
            "",
        ]
    out_path = REPO / "docs" / "FULLSIZE_PARITY.md"
    out_path.write_text("\n".join(lines))
    print("wrote", out_path)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "torch"
    names = sys.argv[2:] or list(RUNS)
    bad = [n for n in names if n not in RUNS]
    if bad:
        raise SystemExit(f"unknown runs {bad}; choose from {list(RUNS)}")
    if mode == "torch":
        run_torch(names)
    elif mode == "jax":
        run_jax(names)
    else:
        raise SystemExit(f"unknown mode {mode!r}")
