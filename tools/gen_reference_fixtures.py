"""Generate numerical-parity golden fixtures from the reference torch implementation.

Runs the reference SAM2 model (loaded directly from /root/reference as a test
ORACLE — no code is copied) at a reduced but structurally-identical configuration,
and saves inputs/outputs + the torch state_dict to tests/fixtures/. Tests then
import the state_dict through our torch->JAX converter and compare outputs.

Mini config mirrors sam2/configs/sam2.1_hiera_t512.yaml with:
  image 256², hiera embed 24 (stages 1,2,7,2, global blocks 5/7/9, q_pool 3),
  d_model 64, mem_dim 16, rope feat 16x16 — every structural feature of the
  full t512 model is present (high-res decoder feats, obj ptrs, signed tpos, ...).

Usage: python tools/gen_reference_fixtures.py
"""

import sys
import types
import pathlib

import numpy as np
import torch

REF = "/root/reference"
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "fixtures"
OUT.mkdir(parents=True, exist_ok=True)


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install_reference_packages():
    # namespace packages pointing into the read-only reference (skips their
    # hydra-importing __init__.py)
    for pkg, path in [
        ("sam2", f"{REF}/sam2"),
        ("sam2.modeling", f"{REF}/sam2/modeling"),
        ("sam2.modeling.sam", f"{REF}/sam2/modeling/sam"),
        ("sam2.modeling.backbones", f"{REF}/sam2/modeling/backbones"),
        ("sam2.utils", f"{REF}/sam2/utils"),
        ("efficient_track_anything", f"{REF}/efficient_track_anything"),
        ("efficient_track_anything.modeling", f"{REF}/efficient_track_anything/modeling"),
        ("efficient_track_anything.utils", f"{REF}/efficient_track_anything/utils"),
    ]:
        mod = types.ModuleType(pkg)
        mod.__path__ = [path]
        sys.modules[pkg] = mod
    # stub iopath (only used for optional weight loading)
    io_common = _stub("iopath.common")
    _stub("iopath", common=io_common)
    _stub("iopath.common.file_io", g_pathmgr=None)


def build_mini_sam2(cls=None, **extra_kwargs):
    from sam2.modeling.backbones.hieradet import Hiera
    from sam2.modeling.backbones.image_encoder import FpnNeck, ImageEncoder
    from sam2.modeling.memory_attention import MemoryAttention, MemoryAttentionLayer
    from sam2.modeling.memory_encoder import (
        CXBlock,
        Fuser,
        MaskDownSampler,
        MemoryEncoder,
    )
    from sam2.modeling.position_encoding import PositionEmbeddingSine
    from sam2.modeling.sam.transformer import RoPEAttention
    from sam2.modeling.sam2_base import SAM2Base

    torch.manual_seed(1234)
    trunk = Hiera(
        embed_dim=24,
        num_heads=1,
        stages=[1, 2, 7, 2],
        global_att_blocks=[5, 7, 9],
        window_pos_embed_bkg_spatial_size=[7, 7],
    )
    neck = FpnNeck(
        position_encoding=PositionEmbeddingSine(num_pos_feats=64, normalize=True, scale=None, temperature=10000),
        d_model=64,
        backbone_channel_list=[192, 96, 48, 24],
        fpn_top_down_levels=[2, 3],
        fpn_interp_model="nearest",
    )
    image_encoder = ImageEncoder(trunk=trunk, neck=neck, scalp=1)

    def rope_self():
        return RoPEAttention(
            rope_theta=10000.0, feat_sizes=[16, 16], embedding_dim=64,
            num_heads=1, downsample_rate=1, dropout=0.1,
        )

    def rope_cross():
        return RoPEAttention(
            rope_theta=10000.0, feat_sizes=[16, 16], rope_k_repeat=True,
            embedding_dim=64, num_heads=1, downsample_rate=1, dropout=0.1,
            kv_in_dim=16,
        )

    layer = MemoryAttentionLayer(
        activation="relu", dim_feedforward=128, dropout=0.1,
        pos_enc_at_attn=False, self_attention=rope_self(), d_model=64,
        pos_enc_at_cross_attn_keys=True, pos_enc_at_cross_attn_queries=False,
        cross_attention=rope_cross(),
    )
    memory_attention = MemoryAttention(
        d_model=64, pos_enc_at_input=True, layer=layer, num_layers=4
    )
    memory_encoder = MemoryEncoder(
        out_dim=16,
        position_encoding=PositionEmbeddingSine(num_pos_feats=16, normalize=True, scale=None, temperature=10000),
        mask_downsampler=MaskDownSampler(embed_dim=64, kernel_size=3, stride=2, padding=1),
        fuser=Fuser(CXBlock(dim=64, kernel_size=7, padding=3, layer_scale_init_value=1e-6, use_dwconv=True), num_layers=2),
        in_dim=64,
    )
    if cls is None:
        cls = SAM2Base
    model = cls(
        **extra_kwargs,
        image_encoder=image_encoder,
        memory_attention=memory_attention,
        memory_encoder=memory_encoder,
        num_maskmem=7,
        image_size=256,
        sigmoid_scale_for_mem_enc=20.0,
        sigmoid_bias_for_mem_enc=-10.0,
        binarize_mask_from_pts_for_mem_enc=True,
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
    # randomize every parameter deterministically (default inits leave many zeros)
    gen = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for name, p in sorted(model.named_parameters()):
            p.copy_(torch.randn(p.shape, generator=gen) * 0.04)
    model.eval()
    return model


def gen_temporal_fusion_fixtures():
    """Golden fixtures for the fork's temporal-fusion modules (eval mode):
    safeTemporalContextExchange, GFTE, AdaptiveTemporalSemanticFusion
    (reference sam2_base.py:233-361, 372-527, 697-758). BatchNorm running
    stats are randomized so eval-mode BN is non-trivial."""
    from sam2.modeling.sam2_base import (
        GFTE,
        AdaptiveTemporalSemanticFusion,
        safeTemporalContextExchange,
    )

    c, b, t, h, w = 32, 2, 4, 8, 8
    rng = np.random.default_rng(42)
    x = rng.standard_normal((b * t, c, h, w)).astype(np.float32)
    data = {"x": x, "t": np.array(t)}

    for key, module in [
        ("tce", safeTemporalContextExchange(channels=c)),
        ("gfte", GFTE(channels=c)),
        ("atsf", AdaptiveTemporalSemanticFusion(channels=c)),
    ]:
        gen = torch.Generator().manual_seed(hash(key) % (2**31))
        with torch.no_grad():
            for _, p in sorted(module.named_parameters()):
                p.copy_(torch.randn(p.shape, generator=gen) * 0.2)
            for name, buf in sorted(module.named_buffers()):
                if name.endswith("running_mean"):
                    buf.copy_(torch.randn(buf.shape, generator=gen) * 0.1)
                elif name.endswith("running_var"):
                    buf.copy_(torch.rand(buf.shape, generator=gen) + 0.5)
        module.eval()
        with torch.no_grad():
            out = module(torch.from_numpy(x), t)
        data[f"{key}_out"] = out.numpy()
        for k, v in module.state_dict().items():
            data[f"{key}_sd.{k}"] = v.detach().float().numpy()

    np.savez_compressed(OUT / "temporal_fusion.npz", **data)
    print("wrote", OUT / "temporal_fusion.npz")


def gen_efficient_rope_fixture():
    """Golden fixtures for EfficientTAM's landmark-pooled cross-attention
    (reference efficient_track_anything/modeling/sam/transformer.py):
      variant 1 (:317-425): +2*log(2) LOGIT bias on landmark columns;
      variant 2 (:430-532): 2*log(2) VALUE offset on pooled keys, plain SDPA.
    Rotated spatial K/V avg-pooled 2x per memory slot, object-pointer keys
    unpooled/unrotated."""
    from efficient_track_anything.modeling.sam.transformer import (
        EfficientRoPEAttention1,
        EfficientRoPEAttention2,
    )

    for variant, cls in ((1, EfficientRoPEAttention1), (2, EfficientRoPEAttention2)):
        _gen_one_efficient_rope(variant, cls)


def _gen_one_efficient_rope(variant, cls):
    dim, heads, kv_dim, hw, n_slots, n_ptr = 64, 1, 16, 16, 3, 8
    mod = cls(
        embedding_dim=dim,
        num_heads=heads,
        downsample_rate=1,
        dropout=0.1,
        kv_in_dim=kv_dim,
        rope_theta=10000.0,
        rope_k_repeat=True,
        feat_sizes=(hw, hw),
    )
    gen = torch.Generator().manual_seed(99)
    with torch.no_grad():
        for _, p in sorted(mod.named_parameters()):
            p.copy_(torch.randn(p.shape, generator=gen) * (1.0 / p.shape[-1] ** 0.5))
    mod.eval()

    rng = np.random.default_rng(11)
    lq = hw * hw
    q = rng.standard_normal((1, lq, dim)).astype(np.float32) * 0.5
    k = rng.standard_normal((1, n_slots * lq + n_ptr, kv_dim)).astype(np.float32) * 0.5
    with torch.no_grad():
        out = mod(
            torch.from_numpy(q),
            torch.from_numpy(k.copy()),
            torch.from_numpy(k.copy()),
            num_k_exclude_rope=n_ptr,
        )
    data = {"q": q, "k": k, "out": out.numpy(), "n_ptr": np.array(n_ptr)}
    for key, val in mod.state_dict().items():
        data[f"sd.{key}"] = val.detach().float().numpy()
    np.savez_compressed(OUT / f"efficient_rope{variant}.npz", **data)
    print("wrote", OUT / f"efficient_rope{variant}.npz")


def main():
    install_reference_packages()
    model = build_mini_sam2()

    sd = {k: v.detach().float().numpy() for k, v in model.state_dict().items()}
    np.savez_compressed(OUT / "mini_state_dict.npz", **sd)

    rng = np.random.default_rng(0)
    with torch.no_grad():
        # ---------- 1. image encoder ----------
        img = rng.standard_normal((1, 3, 256, 256)).astype(np.float32)
        be = model.forward_image(torch.from_numpy(img))
        np.savez_compressed(
            OUT / "image_encoder.npz",
            img=img,
            fpn0=be["backbone_fpn"][0].numpy(),
            fpn1=be["backbone_fpn"][1].numpy(),
            fpn2=be["backbone_fpn"][2].numpy(),
            pos2=be["vision_pos_enc"][2].numpy(),
        )

        # ---------- 2. SAM heads (multimask point prompt) ----------
        bf = rng.standard_normal((2, 64, 16, 16)).astype(np.float32) * 0.5
        s0 = rng.standard_normal((2, 8, 64, 64)).astype(np.float32) * 0.5
        s1 = rng.standard_normal((2, 16, 32, 32)).astype(np.float32) * 0.5
        pts = np.array([[[100.0, 150.0]], [[40.0, 60.0]]], np.float32)
        lbl = np.array([[1], [1]], np.int32)
        outs = model._forward_sam_heads(
            backbone_features=torch.from_numpy(bf),
            point_inputs={
                "point_coords": torch.from_numpy(pts),
                "point_labels": torch.from_numpy(lbl),
            },
            high_res_features=[torch.from_numpy(s0), torch.from_numpy(s1)],
            multimask_output=True,
        )
        np.savez_compressed(
            OUT / "sam_heads_point.npz",
            bf=bf, s0=s0, s1=s1, pts=pts, lbl=lbl,
            low_res_multimasks=outs[0].numpy(),
            high_res_multimasks=outs[1].numpy(),
            ious=outs[2].numpy(),
            low_res_masks=outs[3].numpy(),
            obj_ptr=outs[5].numpy(),
            object_score_logits=outs[6].numpy(),
        )
        # box prompt (2 points, labels 2/3) -> single-mask + stability path
        bpts = np.array([[[60.0, 70.0], [180.0, 200.0]], [[30.0, 20.0], [120.0, 110.0]]], np.float32)
        blbl = np.array([[2, 3], [2, 3]], np.int32)
        outs_b = model._forward_sam_heads(
            backbone_features=torch.from_numpy(bf),
            point_inputs={
                "point_coords": torch.from_numpy(bpts),
                "point_labels": torch.from_numpy(blbl),
            },
            high_res_features=[torch.from_numpy(s0), torch.from_numpy(s1)],
            multimask_output=False,
        )
        np.savez_compressed(
            OUT / "sam_heads_box.npz",
            bf=bf, s0=s0, s1=s1, pts=bpts, lbl=blbl,
            low_res_masks=outs_b[3].numpy(),
            ious=outs_b[2].numpy(),
            obj_ptr=outs_b[5].numpy(),
            object_score_logits=outs_b[6].numpy(),
        )

        # ---------- 3. memory encoder ----------
        feats16 = rng.standard_normal((1, 64, 16, 16)).astype(np.float32) * 0.5
        mask_logits = (rng.standard_normal((1, 1, 256, 256)).astype(np.float32) * 4.0)
        mm_feats, mm_pos = model._encode_new_memory(
            current_vision_feats=[torch.from_numpy(feats16).flatten(2).permute(2, 0, 1)],
            feat_sizes=[(16, 16)],
            pred_masks_high_res=torch.from_numpy(mask_logits),
            object_score_logits=torch.tensor([[5.0]]),
            is_mask_from_pts=False,
        )
        np.savez_compressed(
            OUT / "memory_encoder.npz",
            feats=feats16, mask_logits=mask_logits,
            maskmem=mm_feats.numpy(), maskmem_pos=mm_pos[-1].numpy(),
        )

        # ---------- 4. memory attention (raw module) ----------
        curr = rng.standard_normal((256, 1, 64)).astype(np.float32) * 0.5
        curr_pe = rng.standard_normal((256, 1, 64)).astype(np.float32) * 0.1
        n_spatial, n_ptr = 2 * 256, 8
        memory = rng.standard_normal((n_spatial + n_ptr, 1, 16)).astype(np.float32) * 0.5
        memory_pe = rng.standard_normal((n_spatial + n_ptr, 1, 16)).astype(np.float32) * 0.1
        out = model.memory_attention(
            curr=torch.from_numpy(curr),
            memory=torch.from_numpy(memory),
            curr_pos=torch.from_numpy(curr_pe),
            memory_pos=torch.from_numpy(memory_pe),
            num_obj_ptr_tokens=n_ptr,
        )
        np.savez_compressed(
            OUT / "memory_attention.npz",
            curr=curr, curr_pe=curr_pe, memory=memory, memory_pe=memory_pe,
            n_ptr=np.array(n_ptr), out=out.numpy(),
        )

        # ---------- 5. full video tracking (4 frames, point prompt frame 0) ----------
        frames = rng.standard_normal((4, 3, 256, 256)).astype(np.float32)
        be = model.forward_image(torch.from_numpy(frames))
        _, vis_feats, vis_pos, feat_sizes = model._prepare_backbone_features(be)
        output_dict = {"cond_frame_outputs": {}, "non_cond_frame_outputs": {}}
        track = {}
        num_frames = 4
        for t in range(num_frames):
            cvf = [x[:, t : t + 1] for x in vis_feats]
            cvp = [x[:, t : t + 1] for x in vis_pos]
            point_inputs = None
            if t == 0:
                point_inputs = {
                    "point_coords": torch.from_numpy(np.array([[[130.0, 120.0]]], np.float32)),
                    "point_labels": torch.from_numpy(np.array([[1]], np.int32)),
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
                num_frames=num_frames,
            )
            store = "cond_frame_outputs" if t == 0 else "non_cond_frame_outputs"
            output_dict[store][t] = current_out
            track[f"pred_masks_{t}"] = current_out["pred_masks"].numpy()
            track[f"obj_ptr_{t}"] = current_out["obj_ptr"].numpy()
            track[f"maskmem_{t}"] = current_out["maskmem_features"].numpy()
            track[f"score_{t}"] = current_out["object_score_logits"].numpy()
        np.savez_compressed(OUT / "track_video.npz", frames=frames, **track)

    print("fixtures written to", OUT)
    for f in sorted(OUT.glob("*.npz")):
        print(f"  {f.name}: {f.stat().st_size/1e6:.2f} MB")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "fusion":
        install_reference_packages()
        gen_temporal_fusion_fixtures()
    elif len(sys.argv) > 1 and sys.argv[1] == "efficient_rope":
        install_reference_packages()
        gen_efficient_rope_fixture()
    else:
        main()
        gen_temporal_fusion_fixtures()
        gen_efficient_rope_fixture()
