"""Banded windowed-gather kernel (ops/banded.py): planner + kernel parity.

The kernel's contract is ``banded_take(table, ids, plan) == table[ids]`` for
every planned id, zero rows for out-of-range (PAD) ids. Interpret mode runs
the real Pallas lowering (DMA + one-hot matmuls) on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnnome_tpu.ops.banded import (
    LANE,
    banded_take_pallas,
    plan_cost,
    plan_windows,
    plan_windows_auto,
    take_rows,
)


def _banded_ids(rng, n_ids, n_rows, span=100, jump_every=7):
    """Ids that crawl along the row range with occasional far jumps — the
    two-cluster-per-subrow structure of locality-ordered assembly graphs."""
    base = np.linspace(0, n_rows - span - 1, n_ids).astype(np.int64)
    ids = base + rng.integers(0, span, n_ids)
    # every jump_every-th subrow gets a second far cluster
    for s in range(0, n_ids // LANE, jump_every):
        lo = s * LANE
        far = rng.integers(0, n_rows - span)
        ids[lo : lo + 13] = far + rng.integers(0, span, 13)
    return ids.astype(np.int32)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_banded_take_matches_take(dtype):
    rng = np.random.default_rng(0)
    n_rows, n_ids, d = 2048, 4 * 1024, 128
    ids = _banded_ids(rng, n_ids, n_rows)
    plan = plan_windows(ids, n_rows)
    assert plan.ok, "planner must cover two-cluster banded ids"
    table = jnp.asarray(rng.standard_normal((n_rows, d)), dtype=dtype)
    out = banded_take_pallas(table, jnp.asarray(ids), plan, interpret=True)
    ref = jnp.take(table, jnp.asarray(ids), axis=0)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=0, atol=(0 if dtype == jnp.bfloat16 else 1e-6),
    )


def test_masked_pad_ids_yield_zero_rows():
    rng = np.random.default_rng(1)
    n_rows, n_ids, d = 1024, 2 * 1024, 128
    ids = _banded_ids(rng, n_ids, n_rows)
    pad = np.int32(2**30)
    raw = ids.copy()
    raw[::5] = pad  # mark every 5th id as padding
    # the plan is built on the clamped array (pad -> 0), as build_graph does
    plan = plan_windows(np.where(raw < n_rows, raw, 0), n_rows)
    assert plan.ok
    table = jnp.asarray(rng.standard_normal((n_rows, d)), np.float32)
    out = take_rows(table, jnp.asarray(raw), plan, "pallas_interpret",
                    masked=True)
    ref = np.take(np.asarray(table), np.where(raw < n_rows, raw, 0), axis=0)
    ref[raw >= n_rows] = 0.0
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)
    # and the same plan serves the unmasked/clamped convention exactly
    clamped = np.where(raw < n_rows, raw, 0).astype(np.int32)
    out2 = take_rows(table, jnp.asarray(clamped), plan, "pallas_interpret")
    np.testing.assert_allclose(
        np.asarray(out2), np.take(np.asarray(table), clamped, axis=0),
        atol=1e-6,
    )


def test_planner_falls_back_on_scattered_ids():
    rng = np.random.default_rng(2)
    n_rows = 1 << 16
    ids = rng.integers(0, n_rows, 2048).astype(np.int32)  # 3+ clusters/subrow
    plan = plan_windows(ids, n_rows)
    assert not plan.ok
    table = jnp.asarray(rng.standard_normal((n_rows, 8)), np.float32)
    out = take_rows(table, jnp.asarray(ids), plan, "pallas_interpret")
    np.testing.assert_array_equal(
        np.asarray(out), np.take(np.asarray(table), ids, axis=0)
    )


def test_narrow_feature_dim_is_lane_padded():
    rng = np.random.default_rng(3)
    n_rows, n_ids, d = 1024, 1024, 72  # d % 128 != 0
    ids = _banded_ids(rng, n_ids, n_rows)
    plan = plan_windows(ids, n_rows)
    assert plan.ok
    table = jnp.asarray(rng.standard_normal((n_rows, d)), np.float32)
    out = banded_take_pallas(table, jnp.asarray(ids), plan, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.take(np.asarray(table), ids, axis=0), atol=1e-6
    )


@pytest.mark.parametrize("group", [2, 4, 8])
def test_grouped_plan_take_matches_take(group):
    """Window reuse: one window pair serving ``group`` consecutive subrows
    must produce bit-identical gathers (the plan covers more ids per DMA,
    the selection math is unchanged)."""
    rng = np.random.default_rng(6)
    # realistic slope: ~0.25 rows/id (assembly graphs: n_edges ~ 7 n_nodes)
    n_rows, n_ids, d = 1024, 4 * 1024, 128
    ids = _banded_ids(rng, n_ids, n_rows, span=60, jump_every=100)
    plan = plan_windows(ids, n_rows, group=group)
    assert plan.ok and plan.group == group
    assert plan.w0.shape[0] == n_ids // (LANE * group)
    table = jnp.asarray(rng.standard_normal((n_rows, d)), np.float32)
    out = banded_take_pallas(table, jnp.asarray(ids), plan, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.take(np.asarray(table), ids, axis=0), atol=1e-6
    )


def test_auto_planner_groups_chain_ids():
    """On chain-like (assembly-graph) ids the auto planner must pick a
    grouped plan whose window bytes/id beat the per-subrow plan."""
    rng = np.random.default_rng(7)
    # dst ids of a mean-degree-~7 chain graph: ~0.15 rows per edge slot
    n_rows, n_ids = 1 << 10, 8 * 1024
    base = np.linspace(0, n_rows - 40, n_ids).astype(np.int64)
    ids = np.clip(base + rng.integers(-8, 9, n_ids), 0, n_rows - 1).astype(np.int32)
    auto = plan_windows_auto(ids, n_rows)
    base_plan = plan_windows(ids, n_rows)
    assert auto.ok and base_plan.ok
    assert auto.group > 1
    bytes_auto = auto.wr / (auto.group * LANE)
    bytes_base = base_plan.wr / LANE
    assert bytes_auto < bytes_base
    # masked-pad contract survives grouping
    raw = ids.copy()
    raw[:: 3] = np.int32(2**30)
    plan = plan_windows_auto(np.where(raw < n_rows, raw, 0), n_rows)
    assert plan.ok
    table = jnp.asarray(rng.standard_normal((n_rows, 128)), np.float32)
    out = take_rows(table, jnp.asarray(raw), plan, "pallas_interpret",
                    masked=True)
    ref = np.take(np.asarray(table), np.where(raw < n_rows, raw, 0), axis=0)
    ref[raw >= n_rows] = 0.0
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_build_graph_plans_cover_canonical_keys():
    """build_graph's key/expand plans must cover the exact arrays the
    segment ops gather with (the single-plan-two-conventions contract)."""
    from gnnome_tpu.core.graph import build_graph

    rng = np.random.default_rng(4)
    n = 600
    src = np.arange(n - 1) + (rng.integers(0, 2, n - 1))
    dst = np.minimum(src + 1 + rng.integers(0, 3, n - 1), n - 1)
    g = build_graph(src, dst, n)
    for csr, key in ((g.by_dst, g.dst), (g.by_src, g.src)):
        plan = csr.key_plan
        if plan is None or not plan.ok:
            continue
        ids = np.asarray(key)
        w0 = np.asarray(plan.w0)
        ids2 = ids.reshape(-1, plan.group * LANE)
        cov = np.zeros_like(ids2, bool)
        for wi in range(2):
            lo = w0[:, wi][:, None]
            cov |= (ids2 >= lo) & (ids2 < lo + plan.wr)
        assert cov.all()


def test_model_grads_match_across_backends():
    """End-to-end: full layer fwd+grad, banded/pallas-interpret vs xla."""
    from gnnome_tpu.core.graph import build_graph
    from gnnome_tpu.models.gated_gcn import gated_gcn_layer, init_gated_gcn_layer

    rng = np.random.default_rng(5)
    n = 600
    src = np.arange(n - 1, dtype=np.int32)
    dst = (src + 1 + rng.integers(0, 2, n - 1)).clip(max=n - 1).astype(np.int32)
    g = build_graph(src, dst, n)
    assert g.by_dst.key_plan.ok and g.by_src.key_plan.ok
    d = 64
    params = init_gated_gcn_layer(jax.random.PRNGKey(0), d)
    h = jnp.asarray(rng.standard_normal((g.n_nodes_padded, d)), np.float32)
    e = jnp.asarray(rng.standard_normal((g.n_edges_padded, d)), np.float32)

    def loss(p, backend):
        h2, e2 = gated_gcn_layer(p, g, h, e, backend=backend)
        m_n = g.node_mask[:, None]
        m_e = g.edge_mask[:, None]
        return jnp.sum(jnp.where(m_n, h2, 0) ** 2) + jnp.sum(
            jnp.where(m_e, e2, 0) ** 2
        )

    l_ref, g_ref = jax.value_and_grad(loss)(params, "xla")
    l_pal, g_pal = jax.value_and_grad(loss)(params, "pallas_interpret")
    np.testing.assert_allclose(float(l_pal), float(l_ref), rtol=2e-5)
    flat_r = jax.tree_util.tree_leaves(g_ref)
    flat_p = jax.tree_util.tree_leaves(g_pal)
    for a, b in zip(flat_r, flat_p):
        # atol floor: near-zero grad leaves (norm biases) are cancellation-
        # dominated sums whose value depends on reduction order
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4,
                                   atol=1e-4)


def _high_span_ids(n_reps=2):
    """Ids where only group=1 covers at wr=128 while every larger group
    needs wr=512: each subrow has two 64-wide clusters, with even/odd
    subrows drawing from DIFFERENT base pairs ({0, 1024} vs {448, 1472})
    — any multi-subrow group unions to four clusters that two windows
    only span at 512 rows. This is the configuration where the bytes-only
    cost model over-widens: (8, 512) halves the window bytes of (1, 128)
    but costs 4× the selector-MXU work (measured slower,
    runs/plan_calibration.log)."""
    sub_even = np.concatenate([np.arange(64), 1024 + np.arange(64),
                               np.arange(64), 1024 + np.arange(64)])
    sub_odd = np.concatenate([448 + np.arange(64), 1472 + np.arange(64),
                              448 + np.arange(64), 1472 + np.arange(64)])
    pat = np.concatenate([sub_even[:128], sub_odd[:128]] * 4)  # 1024 ids
    return np.tile(pat.astype(np.int32), n_reps)


def test_plan_cost_model_prefers_narrow_windows(monkeypatch):
    """The calibrated time model (plan_cost): on high-span ids the picker
    must stop trading a halving of window bytes for a 4× widening of the
    selector matmuls (VERDICT r4 #2)."""
    ids = _high_span_ids()
    n_rows = 2048
    # feasibility as constructed: group 1 covers at 128; larger groups
    # union four distant clusters and need 512-row windows
    assert plan_windows(ids, n_rows, widths=(128,), group=1).ok
    assert not plan_windows(ids, n_rows, widths=(256,), group=2).ok
    assert plan_windows(ids, n_rows, widths=(512,), group=8).ok

    auto = plan_windows_auto(ids, n_rows)
    assert (auto.group, auto.wr) == (1, 128), (auto.group, auto.wr)

    # bytes-only ranking (κ=0) restores the old over-widening choice
    monkeypatch.setenv("GNNOME_PLAN_MXU_WEIGHT", "0")
    auto0 = plan_windows_auto(ids, n_rows)
    assert (auto0.group, auto0.wr) == (8, 512), (auto0.group, auto0.wr)

    # malformed env values fall back to the default weight, not a crash
    monkeypatch.setenv("GNNOME_PLAN_MXU_WEIGHT", "not-a-float")
    autod = plan_windows_auto(ids, n_rows)
    assert (autod.group, autod.wr) == (1, 128)


def test_plan_cost_monotonicity():
    """Sanity pins on the cost model itself: wider windows cost more at
    fixed group; larger groups cost less at fixed width; doubling both
    (same bytes/id, double the MXU term) costs more."""
    assert plan_cost(256, 4) > plan_cost(128, 4)
    assert plan_cost(128, 8) < plan_cost(128, 4)
    assert plan_cost(256, 8) > plan_cost(128, 4)


def test_sharded_plan_rows_cost_model():
    """_plan_rows (the shard-uniform planner) applies the same time model:
    on the high-span ids stack it must pick (group=1, wr=128) over the
    byte-cheaper (group=8, wr=512)."""
    from gnnome_tpu.parallel.sharded import _plan_rows

    ids = _high_span_ids()
    stack = np.stack([ids, ids])
    w0, wr, group = _plan_rows(stack, 2048)
    assert (group, wr) == (1, 128), (group, wr)
