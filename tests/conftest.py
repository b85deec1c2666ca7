"""Test harness setup: run everything on an 8-device virtual CPU mesh.

Tests never touch the TPU tunnel — they force the CPU backend with 8 virtual
devices so multi-chip sharding paths execute for real (collectives included)
without hardware, per the standard JAX testing recipe.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # the session env pins JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# jax may already be partially imported at interpreter startup (sitecustomize),
# in which case it captured JAX_PLATFORMS=axon from the session env before we
# could override it — force the config directly as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"
FIXTURE_SINGLE = os.path.join(REFERENCE_ROOT, "ref/pytorch_reference_single.hdf5")
FIXTURE_MULTI = os.path.join(REFERENCE_ROOT, "ref/pytorch_reference_multi.hdf5")


def has_fixtures() -> bool:
    return os.path.exists(FIXTURE_SINGLE) and os.path.exists(FIXTURE_MULTI)


requires_fixtures = pytest.mark.skipif(
    not has_fixtures(), reason="PyTorch reference HDF5 fixtures not available")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running end-to-end tests (bench smoke)")


@pytest.fixture
def rng():
    return np.random.default_rng(51234)
