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

# Keep SUBPROCESSES spawned by tests (CLI smokes, multihost dryruns) off the
# axon TPU plugin: its sitecustomize registration probes the relay at
# interpreter start and blocks for minutes when the relay is down, turning
# CPU-only tests into timeouts. TPU-gated tests restore the stashed value
# for their children explicitly.
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    os.environ["_SAVED_PALLAS_AXON_POOL_IPS"] = os.environ["PALLAS_AXON_POOL_IPS"]
    os.environ["PALLAS_AXON_POOL_IPS"] = ""

# The axon TPU plugin (sitecustomize) pins jax_platforms="axon,cpu" at
# interpreter start, overriding the env var — force it back before any
# backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA compiles dominate suite wall-clock on this
# 1-CPU box; cache them across runs (repo-local dir, gitignored).
_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

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
