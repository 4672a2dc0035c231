"""Golden fixture for the EfficientTAM family (ViT trunk + ViTDetNeck).

Builds the reference EfficientTAMBase (the sam2-vendored variant the shipped
EfficientMedSAM configs train, sam2/modeling/efficienttam_base.py) at a mini
config mirroring efficientmedsam_s_512_FLARE_RECIST.yaml:79-215, runs a 3-frame
tracking sequence, and saves state dict + outputs.

Usage: python tools/gen_efficienttam_fixture.py
"""

import pathlib
import sys

import numpy as np
import torch

sys.path.insert(0, str(pathlib.Path(__file__).parent))
from gen_reference_fixtures import OUT, install_reference_packages


def main():
    install_reference_packages()
    from sam2.modeling.backbones.image_encoder import ImageEncoder, ViTDetNeck
    from sam2.modeling.backbones.vitdet import ViT
    from sam2.modeling.efficienttam_base import EfficientTAMBase
    from sam2.modeling.memory_attention import MemoryAttention, MemoryAttentionLayer
    from sam2.modeling.memory_encoder import (
        CXBlock,
        Fuser,
        MaskDownSampler,
        MemoryEncoder,
    )
    from sam2.modeling.position_encoding import PositionEmbeddingSine
    from sam2.modeling.sam.transformer import RoPEAttention

    torch.manual_seed(5)
    trunk = ViT(
        img_size=256,
        patch_size=16,
        embed_dim=48,
        depth=4,
        num_heads=2,
        mlp_ratio=4.0,
        qkv_bias=True,
        use_rel_pos=False,
        window_size=4,
        window_block_indexes=[0, 1],
        pretrain_img_size=224,
    )
    neck = ViTDetNeck(
        position_encoding=PositionEmbeddingSine(num_pos_feats=64, normalize=True, scale=None, temperature=10000),
        d_model=64,
        backbone_channel_list=[48],
        neck_norm="LN",
    )
    image_encoder = ImageEncoder(trunk=trunk, neck=neck, scalp=0)

    def rope(**kw):
        return RoPEAttention(
            rope_theta=10000.0, feat_sizes=[16, 16], embedding_dim=64,
            num_heads=1, downsample_rate=1, dropout=0.1, **kw,
        )

    layer = MemoryAttentionLayer(
        activation="relu", dim_feedforward=128, dropout=0.1,
        pos_enc_at_attn=False, self_attention=rope(), d_model=64,
        pos_enc_at_cross_attn_keys=True, pos_enc_at_cross_attn_queries=False,
        cross_attention=rope(rope_k_repeat=True, kv_in_dim=16),
    )
    memory_attention = MemoryAttention(d_model=64, pos_enc_at_input=True, layer=layer, num_layers=2)
    memory_encoder = MemoryEncoder(
        out_dim=16,
        position_encoding=PositionEmbeddingSine(num_pos_feats=16, normalize=True, scale=None, temperature=10000),
        mask_downsampler=MaskDownSampler(embed_dim=64, kernel_size=3, stride=2, padding=1),
        fuser=Fuser(CXBlock(dim=64, kernel_size=7, padding=3, layer_scale_init_value=1e-6, use_dwconv=True), num_layers=2),
        in_dim=64,
    )
    model = EfficientTAMBase(
        image_encoder=image_encoder,
        memory_attention=memory_attention,
        memory_encoder=memory_encoder,
        num_maskmem=7,
        image_size=256,
        sigmoid_scale_for_mem_enc=20.0,
        sigmoid_bias_for_mem_enc=-10.0,
        use_mask_input_as_output_without_sam=True,
        directly_add_no_mem_embed=True,
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
    )
    gen = torch.Generator().manual_seed(17)
    with torch.no_grad():
        for name, p in sorted(model.named_parameters()):
            p.copy_(torch.randn(p.shape, generator=gen) * 0.04)
    model.eval()

    sd = {k: v.detach().float().numpy() for k, v in model.state_dict().items()}
    np.savez_compressed(OUT / "efftam_state_dict.npz", **sd)

    rng = np.random.default_rng(3)
    with torch.no_grad():
        frames = rng.standard_normal((3, 3, 256, 256)).astype(np.float32) * 0.5
        be = model.forward_image(torch.from_numpy(frames))
        _, vis_feats, vis_pos, feat_sizes = model._prepare_backbone_features(be)
        output_dict = {"cond_frame_outputs": {}, "non_cond_frame_outputs": {}}
        track = {}
        for t in range(3):
            cvf = [x[:, t : t + 1] for x in vis_feats]
            cvp = [x[:, t : t + 1] for x in vis_pos]
            point_inputs = None
            if t == 0:
                point_inputs = {
                    "point_coords": torch.from_numpy(np.array([[[120.0, 135.0]]], np.float32)),
                    "point_labels": torch.from_numpy(np.array([[1]], np.int32)),
                }
            out = model.track_step(
                frame_idx=t,
                is_init_cond_frame=(t == 0),
                current_vision_feats=cvf,
                current_vision_pos_embeds=cvp,
                feat_sizes=feat_sizes,
                point_inputs=point_inputs,
                mask_inputs=None,
                output_dict=output_dict,
                num_frames=3,
            )
            key = "cond_frame_outputs" if t == 0 else "non_cond_frame_outputs"
            output_dict[key][t] = out
            track[f"pred_masks_{t}"] = out["pred_masks"].numpy()
            track[f"obj_ptr_{t}"] = out["obj_ptr"].numpy()
            track[f"maskmem_{t}"] = out["maskmem_features"].numpy()
        np.savez_compressed(OUT / "efftam_track.npz", frames=frames, **track)
    print("wrote efftam fixtures")


if __name__ == "__main__":
    main()
