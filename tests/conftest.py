"""Test harness: force a virtual 8-device CPU mesh so sharding paths compile
and execute without TPU hardware, and enable x64 (the reference math is f64).
"""

import os

# hard-set: the environment presets JAX_PLATFORMS=axon (tunneled TPU), which
# must never be used for unit tests
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

DEMO_BAM = "/root/reference/demo/demo.bam"


@pytest.fixture(scope="session")
def demo_bam_path():
    if not os.path.exists(DEMO_BAM):
        pytest.skip("demo.bam not available")
    return DEMO_BAM


@pytest.fixture()
def rng(request):
    # deterministic per test and independent of execution order
    import zlib
    seed = zlib.crc32(request.node.nodeid.encode()) & 0x7FFFFFFF
    return np.random.default_rng([2025, seed])
