"""Test harness: run on CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (the driver separately dry-runs the
multi-chip path and benches on a real chip)."""

import os

# Force CPU: the ambient environment may export JAX_PLATFORMS=axon (the TPU
# tunnel), but the test suite must run on the virtual 8-device CPU mesh.
# XLA_FLAGS must land before the CPU backend initializes; jax itself may
# already be imported (the jaxtyping pytest plugin imports it before
# conftest), so the platform override goes through jax.config.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def gist_1000():
    """The bundled 1000 x 960-d Gist slice used throughout the reference's
    tests (reference: data/gist_1000.bin, config/gist_1000.toml)."""
    path = os.path.join(os.path.dirname(__file__), "..", "data", "gist_1000.bin")
    data = np.fromfile(path, dtype=np.float32).reshape(-1, 960)
    assert data.shape == (1000, 960)
    return data


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
