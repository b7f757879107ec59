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


def sorted_rows(df, ndigits=6):
    """Order-insensitive row multiset for differential comparison.

    Normalizes -0.0 to 0.0 (sign of zero is not SQL-significant; Spark has
    normalize_nan_and_zero for the same reason) and rounds floats.
    """
    df = df.reindex(sorted(df.columns), axis=1)
    out = []
    for t in df.itertuples(index=False):
        row = []
        for v in t:
            if v is None or (isinstance(v, float) and np.isnan(v)):
                row.append(None)
            elif isinstance(v, float):
                # relative rounding (significant digits): large aggregates
                # must compare under double tolerance, not absolute decimals
                row.append(float(f"%.{ndigits}g" % v) + 0.0)
            else:
                row.append(v)
        out.append(tuple(row))
    return sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))
