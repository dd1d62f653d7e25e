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


# Long-running tests (>= ~10 s each on an idle 4-core host, measured
# 2026-08-21, runs/pytest_full_r5.log), marked centrally so
# `pytest -m "not slow"` is a genuine <5 min smoke subset. The full
# suite (~16 min idle) remains the merge gate; everything here is
# deep-parity/interpret-mode coverage that the fast subset still
# exercises at smaller scale elsewhere.
_SLOW_TESTS = {
    ("test_graft_entry.py", "test_dryrun_multichip_8"),
    ("test_halo.py", "test_sharded_backward_is_scatter_free"),
    ("test_halo.py", "test_sharded_unroll_group_matches_single_device"),
    ("test_sharded.py", "test_sharded_band_plans_built_and_exact"),
    ("test_sharded.py", "test_sharded_reverse_unsorted_dispatch"),
    ("test_sharded.py", "test_sharded_fused_suite_matches_single_device"),
    ("test_sharded.py", "test_sharded_train_step_matches_single_device"),
    ("test_reverse_unsorted.py", "test_reverse_unsorted_model_grad_parity"),
    ("test_reverse_unsorted.py", "test_dispatch_precedence"),
    ("test_banded.py", "test_model_grads_match_across_backends"),
    ("test_train_loop.py", "test_cluster_minibatch_regime"),
    ("test_flagship_smoke.py", "test_flagship_driver_end_to_end"),
    ("test_scatter_free_grads.py", "test_narrow_path_backend_grad_parity"),
    ("test_subtile_accumulate.py", "test_subtile_off_matches"),
    ("test_subtile_accumulate.py", "test_subtile_matches_xla"),
    ("test_segsum_sub.py", "test_rev_bwd_fused_dispatch_and_parity"),
    ("test_model_parity.py", "test_wide_gathers_exact"),
    ("test_segsum_stream.py", "test_gate_front_bwd_dual_stream"),
    ("test_segment_ops.py", "test_gated_aggregate_opposite_matches"),
    ("test_segment_ops.py", "test_fused_sigma_opposite_matches"),
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if (os.path.basename(str(item.fspath)), base) in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
