"""Test harness config: run everything on CPU with an 8-device virtual mesh.

This is the TPU-native answer to "test multi-node without a cluster"
(SURVEY.md §4): sharding/collective logic is validated on
xla_force_host_platform_device_count=8 virtual devices; numerical kernels run
the same XLA graphs CPU-side. Real-TPU runs happen via bench.py.
"""

import os
import zlib

# Force CPU even when the environment pins JAX_PLATFORMS to a TPU platform
# (e.g. the axon tunnel, whose sitecustomize imports jax at interpreter start,
# making env vars here too late): unit tests must be fast and deterministic;
# real-TPU runs go through bench.py. jax.config.update works post-import.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"
ALEXNET_BIN_DIR = os.path.join(REFERENCE_DIR, "AlexNet", "Bin.Files")


@pytest.fixture(scope="session")
def reference_dir():
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference checkout not available")
    return REFERENCE_DIR


@pytest.fixture(scope="session")
def alexnet_bin_dir(reference_dir):
    if not os.path.isdir(ALEXNET_BIN_DIR):
        pytest.skip("AlexNet/Bin.Files not present in the reference checkout")
    return ALEXNET_BIN_DIR


@pytest.fixture()
def rng(request):
    """Fresh generator per test, seeded from the test's node id: margin-
    sensitive assertions (quantizer error ratios etc.) see the SAME draws
    whether the test runs alone, in the full suite, or after new tests are
    added — a shared session generator made pass/fail depend on collection
    order."""
    seed = zlib.crc32(request.node.nodeid.encode()) ^ 20260816
    return np.random.default_rng(seed)
