"""Test configuration: run on CPU with 8 virtual devices so sharding tests
exercise real collectives without TPU hardware (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize registers the axon TPU backend and forces
# jax_platforms="axon,cpu"; tests must run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

import pathlib  # noqa: E402

import pytest  # noqa: E402

# Tiered suite (reference CI runs CPU matrices in minutes,
# .github/workflows/python.yml): model-oracle tests re-jit large models and
# dominate the 500+-test runtime, so everything under tests/models/ is
# auto-marked `slow` except one canonical family (RAFT — it exercises the
# shared encoder/corr/GRU stack) and the always-cheap checkpoint gate.
# Fast tier: `pytest -m "not slow"` (infra + data + ops + parallel +
# script e2e + RAFT oracle), ~15 min on CPU.
_FAST_MODEL_FILES = {"test_raft.py", "test_checkpoints_gate.py",
                     "test_all_models.py"}


def pytest_collection_modifyitems(config, items):
    for item in items:
        p = pathlib.Path(str(item.fspath))
        if p.parent.name == "models" and p.name not in _FAST_MODEL_FILES:
            item.add_marker(pytest.mark.slow)
