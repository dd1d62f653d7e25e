"""Test harness: force an 8-virtual-device CPU platform before JAX starts.

TPU hardware in CI is a single chip; all distributed tests run against a
simulated mesh (per the project test strategy, SURVEY.md §4).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"  # override any ambient TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The ambient sitecustomize may pre-import jax._src before this conftest
# runs, snapshotting JAX_PLATFORMS from the environment — force the value
# through the config API too (works any time before backend init).
jax.config.update("jax_platforms", "cpu")

# Parity tests compare against float64 numpy; keep f32 matmuls exact.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest

# Ambient GNNOME_* perf knobs (batch/subtile/slots overrides an operator
# may have exported for sweeps) would silently change which kernel
# variants the parity pins compile — strip them so CI always tests the
# auto policies plus whatever each test sets explicitly (ADVICE r4 #3).
for _k in [k for k in os.environ if k.startswith("GNNOME_")]:
    if _k not in ("GNNOME_NATIVE_LIB", "GNNOME_FORCE_PYTHON"):
        del os.environ[_k]


@pytest.fixture
def rng():
    return np.random.default_rng(0)
