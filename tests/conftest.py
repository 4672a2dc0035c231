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
