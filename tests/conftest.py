"""Test configuration: force CPU with 8 virtual devices so sharding/pjit tests run
anywhere (the reference's multi-GPU paths are exercised on a fake mesh, SURVEY §4).
Must run before jax is imported anywhere."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin overrides JAX_PLATFORMS at import time; force CPU explicitly.
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

import pathlib

# Persistent XLA compilation cache — the same recipe bench.py and
# __graft_entry__.py use. Without it every pytest run recompiles every jitted
# program from scratch on this 1-vCPU box (cold fast-suite ~9 min vs ~3 min
# warm). Cache entries are host-flavor-keyed; `rm -rf .jax_cache` if a
# cpu_aot_loader feature-mismatch warning appears (see CLAUDE.md).
jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import pytest

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.fixture(scope="session")
def fixtures_dir():
    return FIXTURES


def require_fixture(name: str):
    path = FIXTURES / name
    if not path.exists():
        pytest.skip(f"fixture {name} not generated (run tools/gen_reference_fixtures.py)")
    return path


# ----------------------------------------------------------- suite splitting
# `pytest -m "not slow"` = fast unit suite (~2-3 min on this 1-vCPU box);
# the full run (~15-20 min) adds the golden-fixture parity suites and e2e
# pipelines whose XLA CPU compiles dominate. Registered in pyproject.toml.
SLOW_MODULES = {
    "test_parity",
    "test_efficienttam",
    "test_video_predictor",
    "test_image_predictor",
    "test_temporal_fusion",
    "test_e2e_pipeline",
    "test_train_step",
    "test_train_step_vit",
    "test_trainer_resilience",
    "test_determinism",
    "test_rejected_window_attention_v1",
}


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest

    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in SLOW_MODULES:
            item.add_marker(_pytest.mark.slow)
