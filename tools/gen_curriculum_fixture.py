"""Generate the curriculum stage-population fixture from the REFERENCE
implementation (/root/reference/training/dataset/vos_raw_dataset.py:746-894,
QuantumNPZRawDataset — the curriculum wired in the shipped GFTE_3.yaml:221).

Builds the deterministic synthetic corpus (tests/curriculum_corpus.py), runs
the reference class through its real epoch schedule, and records the exact
video population at each stage to tests/fixtures/curriculum_quantum.json.
tests/test_data_pipeline.py replays the same corpus through this framework's
QuantumNPZRawDataset and asserts identical populations.

Usage: python tools/gen_curriculum_fixture.py   (needs /root/reference)
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import tempfile
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

REF = "/root/reference"
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "fixtures"


def install_reference_training_package():
    for pkg, path in [
        ("training", f"{REF}/training"),
        ("training.dataset", f"{REF}/training/dataset"),
    ]:
        mod = types.ModuleType(pkg)
        mod.__path__ = [path]
        sys.modules[pkg] = mod
    # stubs for deps the curriculum classes never exercise
    io_common = types.ModuleType("iopath.common")
    iopath = types.ModuleType("iopath")
    iopath.common = io_common
    file_io = types.ModuleType("iopath.common.file_io")
    file_io.g_pathmgr = None
    sys.modules["iopath"] = iopath
    sys.modules["iopath.common"] = io_common
    sys.modules["iopath.common.file_io"] = file_io
    listconfig = types.ModuleType("omegaconf.listconfig")

    class ListConfig(list):  # noqa: D401 - isinstance target only
        pass

    listconfig.ListConfig = ListConfig
    omegaconf = types.ModuleType("omegaconf")
    omegaconf.listconfig = listconfig
    sys.modules["omegaconf"] = omegaconf
    sys.modules["omegaconf.listconfig"] = listconfig


def main():
    from curriculum_corpus import build_aes_corpus, build_corpus

    install_reference_training_package()
    from training.dataset.vos_raw_dataset import (
        AESCurriculumNPZRawDataset,
        NeuroSpectralNPZRawDataset,
        QuantumNPZRawDataset,
    )

    with tempfile.TemporaryDirectory() as folder:
        names = build_corpus(folder)
        ds = QuantumNPZRawDataset(folder=folder, milestones={"expand": 20, "full": 50})
        stages = {}
        stages["dense"] = sorted(ds.video_names)  # init applies the dense filter
        ds.update_curriculum_stage(25)
        stages["expand"] = sorted(ds.video_names)
        ds.update_curriculum_stage(60)
        stages["full"] = sorted(ds.video_names)
        # stage schedule sanity straight from the reference
        ds2 = QuantumNPZRawDataset(folder=folder, milestones={"expand": 20, "full": 50})
        ds2.update_curriculum_stage(19)
        stages["epoch19_stage"] = ds2.stage
        ds2.update_curriculum_stage(20)
        stages["epoch20_stage"] = ds2.stage
        # <5-survivor floor scenario: restrict to 2 dense + 4 expand-only
        # videos via file_list_txt (reference floor: video_names[:10], :861)
        floor_list = os.path.join(folder, "floor.txt")
        with open(floor_list, "w") as f:
            f.write("\n".join(
                ["vid_a_k4", "vid_l_k10", "vid_d_k16", "vid_e_k20", "vid_f_k28", "vid_j_k28"]
            ))
        ds3 = QuantumNPZRawDataset(
            folder=folder, milestones={"expand": 20, "full": 50},
            file_list_txt=floor_list,
        )
        stages["floor_dense"] = sorted(ds3.video_names)
        del names

        # NeuroSpectral over the same corpus: exact score-ordered 30/60/100
        # slices (ORDER matters, so record lists unsorted)
        nds = NeuroSpectralNPZRawDataset(
            folder=folder, milestones={"expand": 20, "full": 50}
        )
        stages["neuro_scores"] = {
            k: float(v) for k, v in sorted(nds.video_scores.items())
        }
        stages["neuro_dense"] = list(nds.video_names)
        nds.update_curriculum_stage(25)
        stages["neuro_expand"] = list(nds.video_names)
        nds.update_curriculum_stage(60)
        stages["neuro_full"] = list(nds.video_names)

    with tempfile.TemporaryDirectory() as folder:
        build_aes_corpus(folder)
        ads = AESCurriculumNPZRawDataset(
            folder=folder, milestones={"expand": 20, "full": 50}
        )
        stages["aes_entropies"] = {
            k: float(v) for k, v in sorted(ads.sample_entropies.items())
        }
        stages["aes_dense"] = list(ads.video_names)
        ads.update_curriculum_stage(25)
        stages["aes_expand"] = list(ads.video_names)
        ads.update_curriculum_stage(60)
        stages["aes_full"] = list(ads.video_names)
        # adaptive factor trajectory (reference :512-516)
        ads2 = AESCurriculumNPZRawDataset(
            folder=folder, milestones={"expand": 20, "full": 50}
        )
        for loss in (0.5, 0.05, 0.05, 0.5):
            ads2.update_curriculum_stage(0, training_loss=loss)
        stages["aes_adaptive_factor"] = round(ads2.adaptive_factor, 10)

    OUT.mkdir(parents=True, exist_ok=True)
    with open(OUT / "curriculum_quantum.json", "w") as f:
        json.dump(stages, f, indent=1, sort_keys=True)
    print(json.dumps(stages, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
