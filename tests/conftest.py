"""Test configuration.

The suite runs on whatever backend jax selects (the TPU chip when tunneled,
CPU otherwise). Multi-device sharding tests force the CPU platform with 8
virtual devices in a subprocess (see test_parallel.py) because the platform
cannot change after backend init.

Environment notes for this box (see .claude/skills/verify/SKILL.md):
  * JAX_PLATFORMS env is ignored by this jax build — use JAX_PLATFORM_NAME or
    jax.config.update('jax_platforms', ...) before first jax use;
  * TPU default matmul precision is bf16-class — geometry code passes
    precision=HIGHEST explicitly;
  * compiles are slow → persistent compilation cache.
"""

import os

os.environ.setdefault("JAX_CPU_ENABLE_ASYNC_DISPATCH", "false")

import pathlib

import jax
import pytest

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

FIXTURES = pathlib.Path(__file__).parent / "fixtures"
REPO = pathlib.Path(__file__).parent.parent
REFERENCE_MODELS = pathlib.Path("/root/reference/3D_model_prep")

STICK_PKL = str(REFERENCE_MODELS / "SMILy_STICK.pkl")
MOUSE_PKL = str(REFERENCE_MODELS / "SMILy_Mouse_static_joints.pkl")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running integration tests")


@pytest.fixture(scope="session")
def stick_spec():
    from smilify_tpu.core.spec import load_model_spec

    return load_model_spec(STICK_PKL, align_symmetry=False)


@pytest.fixture(scope="session")
def mouse_spec():
    from smilify_tpu.core.spec import load_model_spec

    return load_model_spec(MOUSE_PKL, align_symmetry=False)


@pytest.fixture(scope="session")
def mouse_repose_long_spec():
    from smilify_tpu.core.spec import load_model_spec

    return load_model_spec(
        str(REFERENCE_MODELS / "SMILy_Mouse_static_joints_REPOSE_LONG.pkl"),
        align_symmetry=False,
    )
