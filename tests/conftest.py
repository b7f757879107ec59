"""Test harness: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's strategy of testing distribution without a cluster
(SURVEY.md §4: Spark local mode with multiple partitions). Multi-chip paths
are exercised on XLA's host platform with 8 virtual devices.
"""

import os

# Force CPU for tests even if the session env points at a TPU tunnel.
# NOTE: this machine's sitecustomize imports jax at interpreter start, so the
# JAX_PLATFORMS env var is already snapshotted — we must also update the live
# jax config, not just os.environ.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
