"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip hardware is unavailable in CI, so sharding tests run on a virtual
8-device CPU mesh (the JAX analogue of the reference suite's headless
PyBullet DIRECT mode, ref: tests/conftest.py:45-61). Must run before the
first jax import in the session.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# the persistent compilation cache (tvc_ai_tpu/__init__.py) exists for the
# expensive remote-TPU compiles; under the CPU test platform the XLA:CPU
# AOT loader spams machine-feature-mismatch errors (prefer-no-scatter
# pseudo-features) on every cached reload and warns about SIGILL — keep
# unit tests on fresh in-process compiles
os.environ.setdefault("TVC_NO_COMPILE_CACHE", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon environment's sitecustomize overrides JAX_PLATFORMS with
# "axon,cpu", which would silently route unit tests through the TPU tunnel;
# force the virtual 8-device CPU platform explicitly.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    for marker in ("slow", "integration", "benchmark", "tpu"):
        config.addinivalue_line("markers", f"{marker}: {marker} tests")


@pytest.fixture(autouse=True)
def deterministic_seeds():
    """Mirror the reference's autouse determinism fixture (tests/conftest.py:45-55)."""
    import random

    random.seed(42)
    np.random.seed(42)
    yield


@pytest.fixture
def rng_key():
    import jax

    return jax.random.PRNGKey(42)
