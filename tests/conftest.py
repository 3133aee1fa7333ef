"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes. Multi-chip sharding tests use
these 8 virtual devices; TPU-hardware behavior is exercised by bench.py and
the driver's compile checks.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin (sitecustomize) pins jax_platforms="axon,cpu" at
# interpreter start, overriding the env var — force it back before any
# backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import numpy as np
import pytest

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def golden():
    def _load(name: str):
        path = GOLDEN_DIR / f"{name}.npz"
        if not path.exists():
            pytest.skip(f"golden fixture {name}.npz missing (run tools/make_golden.py)")
        return np.load(path)

    return _load
