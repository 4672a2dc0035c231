"""Preemption/elastic-recovery machinery: SIGTERM checkpoint-and-exit,
SLURM-style per-task rendezvous env, gradient accumulation
(reference training/train.py:65-111 submitit Checkpointable,
trainer.py:110-125; multi_node_train.sh)."""

import os
import signal
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_sbatch_sets_process_id_inside_srun_task():
    """The rendezvous vars must be evaluated per srun task: the batch step's
    SLURM_PROCID is always 0, so an `export JAX_PROCESS_ID=$SLURM_PROCID`
    outside srun gives every host process id 0 and breaks the rendezvous."""
    script = open(
        os.path.join(os.path.dirname(__file__), "..", "scripts", "slurm_train.sbatch")
    ).read()
    pre_srun = script.split("srun")[0]
    assert "JAX_PROCESS_ID" not in pre_srun, (
        "JAX_PROCESS_ID must not be exported in the batch step"
    )
    assert "JAX_PROCESS_ID=$SLURM_PROCID" in script  # set inside the srun'd shell
    assert "--requeue" in script and "--signal" in script

    # simulate two srun tasks: each shell evaluates its own SLURM_PROCID
    inner = script.split("srun bash -c '")[1].rsplit("'", 1)[0]
    inner = inner.replace("exec python", "echo python")  # don't actually train
    ids = []
    for procid in (0, 1):
        env = dict(
            os.environ,
            SLURM_NTASKS="2",
            SLURM_PROCID=str(procid),
            DATA_DIR="/tmp",
            OUT_DIR="/tmp",
        )
        r = subprocess.run(
            ["bash", "-c", inner + "\necho PROCID=$JAX_PROCESS_ID"],
            env=env,
            capture_output=True,
            text=True,
        )
        for line in r.stdout.splitlines():
            if line.startswith("PROCID="):
                ids.append(line.split("=")[1])
    assert ids == ["0", "1"], ids


def test_sigterm_checkpoints_and_exits(tmp_path, monkeypatch):
    """Delivering SIGTERM mid-training must write a checkpoint and exit 0 so
    the requeued job can auto-resume."""
    from us_video_medsam2_tpu.core.config import (
        FpnNeckConfig,
        HieraConfig,
        MemoryAttentionConfig,
        MemoryEncoderConfig,
        SAM2Config,
    )
    from us_video_medsam2_tpu.models.sam2 import SAM2Model
    from us_video_medsam2_tpu.training.data import (
        NPZRawDataset,
        RandomUniformSampler,
        TrainMixedVideoLoader,
        VOSDataset,
        default_train_transforms,
    )
    from us_video_medsam2_tpu.training.optimizer import OptimConfig
    from us_video_medsam2_tpu.training.train_model import TrainSimConfig
    from us_video_medsam2_tpu.training.train_step import TrainConfig
    from us_video_medsam2_tpu.training import trainer as trainer_mod
    from us_video_medsam2_tpu.training.trainer import Trainer, TrainerConfig
    from us_video_medsam2_tpu.parallel.mesh import create_mesh

    # batch of 1 video: run on a 1-device mesh (the 8-virtual-device default
    # would need batch % 8 == 0)
    monkeypatch.setattr(
        trainer_mod, "create_mesh",
        lambda axes: create_mesh(axes, devices=jax.devices()[:1]),
    )

    root = tmp_path / "npz"
    root.mkdir()
    rng = np.random.default_rng(0)
    imgs = (rng.random((4, 64, 64)) * 255).astype(np.uint8)
    gts = np.zeros((4, 64, 64), np.uint8)
    gts[:, 20:40, 20:40] = 1
    np.savez_compressed(root / "v0.npz", imgs=imgs, gts=gts)

    size = 64
    cfg = SAM2Config(
        image_size=size,
        hiera=HieraConfig(
            embed_dim=8, stages=(1, 1, 1, 1), q_pool=3, global_att_blocks=(),
            window_spec=(4, 2, 2, 2), window_pos_embed_bkg_spatial_size=(2, 2),
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
    model = SAM2Model(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)))
    ds = VOSDataset(
        NPZRawDataset(str(root)),
        RandomUniformSampler(num_frames=2, max_num_objects=1),
        transforms=default_train_transforms(size),
        max_num_objects=1,
    )
    loader = TrainMixedVideoLoader([ds], [1], 1, seed=0)
    trainer = Trainer(
        model,
        jax.tree.map(jnp.array, params),  # step donation must not eat `params`
        TrainConfig(
            sim=TrainSimConfig(num_correction_pt_per_frame=1),
            optim=OptimConfig(total_steps=4),
        ),
        TrainerConfig(max_epochs=50, save_dir=str(tmp_path / "work"), save_freq=0),
        loader,
    )
    # deliver the signal "mid-epoch": the handler sets the flag; the loop must
    # checkpoint and SystemExit(0) at the next iteration boundary
    trainer._on_preempt_signal(signal.SIGTERM, None)
    with pytest.raises(SystemExit) as e:
        trainer.run()
    assert e.value.code == 0
    assert os.path.exists(tmp_path / "work" / "checkpoint.npz")

    # the requeued job resumes from the preemption checkpoint
    trainer2 = Trainer(
        model,
        jax.tree.map(jnp.array, params),
        trainer.train_cfg,
        TrainerConfig(max_epochs=50, save_dir=str(tmp_path / "work"), save_freq=0),
        loader,
    )
    assert int(trainer2.state.step) == int(trainer.state.step)


def test_gradient_accumulation_matches_large_batch():
    """optax.MultiSteps wiring: k accumulated micro-steps == one step on the
    concatenated batch (same grads average)."""
    from us_video_medsam2_tpu.training.optimizer import OptimConfig, build_optimizer

    params = {"w": jnp.ones((4,), jnp.float32)}
    g1 = {"w": jnp.full((4,), 1.0)}
    g2 = {"w": jnp.full((4,), 3.0)}
    gavg = {"w": jnp.full((4,), 2.0)}

    tx_plain = build_optimizer(params, OptimConfig(total_steps=10))
    s = tx_plain.init(params)
    up_ref, _ = tx_plain.update(gavg, s, params)

    tx_acc = build_optimizer(params, OptimConfig(total_steps=10, accum_steps=2))
    s = tx_acc.init(params)
    up_a, s = tx_acc.update(g1, s, params)
    assert float(jnp.abs(up_a["w"]).max()) == 0.0  # micro-step: no update yet
    up_b, s = tx_acc.update(g2, s, params)
    np.testing.assert_allclose(up_b["w"], up_ref["w"], rtol=1e-6)


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Orbax backend round-trips nested pytrees incl. optax-like namedtuples
    and honours skip patterns (core/checkpoint.py orbax backend)."""
    import collections

    import jax.numpy as jnp
    import numpy as np

    from us_video_medsam2_tpu.core.checkpoint import (
        restore_checkpoint_any,
        save_checkpoint_any,
    )

    Adam = collections.namedtuple("Adam", ["mu", "nu"])
    state = {
        "params": {"layer": {"kernel": jnp.arange(6.0).reshape(2, 3)}},
        "opt": Adam(mu={"layer": {"kernel": jnp.ones((2, 3))}},
                    nu={"layer": {"kernel": jnp.full((2, 3), 2.0)}}),
        "step": jnp.asarray(7),
    }
    path = str(tmp_path / "ckpt_orbax")
    save_checkpoint_any(path, state, backend="orbax")
    got = restore_checkpoint_any(path)
    np.testing.assert_array_equal(got["params"]["layer"]["kernel"],
                                  np.arange(6.0).reshape(2, 3))
    np.testing.assert_array_equal(got["opt"]["mu"]["layer"]["kernel"], np.ones((2, 3)))
    assert int(got["step"]) == 7

    # skip patterns drop matching subtrees
    path2 = str(tmp_path / "ckpt_orbax2")
    save_checkpoint_any(path2, state, skip_patterns=["opt/*"], backend="orbax")
    got2 = restore_checkpoint_any(path2)
    assert "opt" not in got2 or not got2["opt"]


def test_checkpoint_rope_layout_marker(tmp_path):
    """Saved checkpoints carry a rope-layout format marker; restoring an
    UNMARKED checkpoint that contains RoPE q/k projections raises instead of
    silently loading torch-interleaved weights (ADVICE r2, docs/PARITY.md #13),
    and assume_rope_layout='interleaved' migrates them exactly like the torch
    importer (core/import_torch.py::_map_attention)."""
    import json

    from us_video_medsam2_tpu.core.checkpoint import (
        read_checkpoint_format,
        restore_checkpoint,
        restore_params,
        save_checkpoint,
    )
    from us_video_medsam2_tpu.ops.posenc import rope_halfsplit_perm

    rng = np.random.default_rng(0)
    dim, heads = 16, 2
    kern = rng.normal(size=(dim, dim)).astype(np.float32)
    bias = rng.normal(size=(dim,)).astype(np.float32)
    params = {
        "memory_attention": {
            "layers_0": {
                "self_attn": {"q_proj": {"kernel": kern, "bias": bias}},
                "cross_attn_image": {"k_proj": {"kernel": kern * 2, "bias": bias * 2}},
            }
        },
        # decoder self_attn is NOT under memory_attention -> never permuted
        "mask_decoder": {"transformer": {"layers_0": {"self_attn": {
            "q_proj": {"kernel": kern * 3, "bias": bias * 3}}}}},
    }
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, {"params": params})
    fmt = read_checkpoint_format(path)
    assert fmt["rope_layout"] == "halfsplit" and fmt["version"] >= 2

    got = restore_params(path)  # marked -> loads clean, marker stripped
    assert "_ckpt_format" not in got
    np.testing.assert_array_equal(
        got["memory_attention"]["layers_0"]["self_attn"]["q_proj"]["kernel"], kern
    )

    # strip the marker to simulate a pre-marker checkpoint
    meta = json.loads(open(path[:-4] + ".meta.json").read())
    meta = {k: v for k, v in meta.items() if not k.startswith("_ckpt_format/")}
    json.dump(meta, open(path[:-4] + ".meta.json", "w"))
    with pytest.raises(RuntimeError, match="RoPE"):
        restore_checkpoint(path)
    # explicit halfsplit assumption -> accepted as-is
    got = restore_params(path, assume_rope_layout="halfsplit")
    np.testing.assert_array_equal(
        got["memory_attention"]["layers_0"]["self_attn"]["q_proj"]["kernel"], kern
    )
    # interleaved assumption -> permuted like the importer
    got = restore_params(path, assume_rope_layout="interleaved", rope_num_heads=heads)
    perm = rope_halfsplit_perm(dim, heads)
    np.testing.assert_array_equal(
        got["memory_attention"]["layers_0"]["self_attn"]["q_proj"]["kernel"],
        kern[:, perm],
    )
    np.testing.assert_array_equal(
        got["memory_attention"]["layers_0"]["cross_attn_image"]["k_proj"]["bias"],
        (bias * 2)[perm],
    )
    # non-RoPE module untouched
    np.testing.assert_array_equal(
        got["mask_decoder"]["transformer"]["layers_0"]["self_attn"]["q_proj"]["kernel"],
        kern * 3,
    )


def test_resume_prefers_newer_artifact(tmp_path):
    """After switching checkpoint backends mid-run, resume picks the NEWER of
    checkpoint.npz vs the orbax directory by mtime (ADVICE r2)."""
    import time

    from us_video_medsam2_tpu.core.checkpoint import (
        get_resume_checkpoint,
        save_checkpoint,
        save_checkpoint_any,
    )

    save_dir = str(tmp_path)
    state = {"params": {"w": np.ones((2,), np.float32)}, "step": 1}
    save_checkpoint(os.path.join(save_dir, "checkpoint.npz"), state)
    assert get_resume_checkpoint(save_dir).endswith("checkpoint.npz")

    time.sleep(0.05)
    save_checkpoint_any(os.path.join(save_dir, "checkpoint"), state, backend="orbax")
    assert get_resume_checkpoint(save_dir).endswith(os.sep + "checkpoint")

    time.sleep(0.05)
    save_checkpoint(os.path.join(save_dir, "checkpoint.npz"), state)
    assert get_resume_checkpoint(save_dir).endswith("checkpoint.npz")
