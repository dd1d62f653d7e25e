"""Batched (lane-concatenated) select/accumulate matmuls in the fused
forward kernels.

``GNNOME_{EPILOG,SIGMA,GATE}_BATCH`` fuse ``batch`` consecutive 128-edge
subrows into one wide one-hot select per window and one wide accumulate
per half (ops/spmm_pallas.py): the ids tiles are lane-concatenated to
[1, batch*128], so the MXU sees 1/batch as many issues at identical
FLOPs. The knob is clamped to a divisor of the band-plan ``group`` —
batched rows must share a window pair.

Parity target: batch=1 (the original per-subrow form). The gate and the
e_new epilog are bit-exact (selection is exact, elementwise math is
row-local); the f32 sum accumulators (sigma sums, BN moments) may differ
by f32 re-association only.

Reference math unchanged: /root/reference/layers/gated_gcn_full.py:120-143.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnnome_tpu.core.graph import PAD_SEGMENT, build_graph
from gnnome_tpu.ops.segment import (
    _fused_sigma_reverse_unsorted,
    fused_gate_sigma_gather,
)
from gnnome_tpu.ops.spmm_pallas import gate_front_pallas

D = 128


@pytest.fixture(scope="module")
def graph():
    """Chain + branch graph large enough that the auto planner picks
    grouped plans (group >= 2), so the batch knob actually engages."""
    rng = np.random.default_rng(3)
    n = 4_000
    base = np.arange(n - 1, dtype=np.int32)
    extra = rng.integers(0, n - 16, 3 * n).astype(np.int32)
    src = np.concatenate([base, extra])
    dst = np.concatenate([base + 1, extra + rng.integers(1, 12, len(extra))])
    g = build_graph(src, dst.astype(np.int32), n)
    assert g.by_src.key_plan.group >= 2, "fixture must exercise batching"
    assert g.by_dst.key_plan.group >= 2
    return g


@pytest.fixture(scope="module")
def feats(graph):
    rng = np.random.default_rng(0)
    n_pad, e_pad = graph.n_nodes_padded, graph.n_edges_padded
    dt = jnp.bfloat16
    return dict(
        g=jnp.asarray(rng.standard_normal((e_pad, D)) * 0.1, dt),
        e=jnp.asarray(rng.standard_normal((e_pad, D)) * 0.1, dt),
        v=jnp.asarray(rng.standard_normal((n_pad, D)) * 0.1, dt),
        w3=jnp.asarray(rng.standard_normal((D, D)) * 0.1, dt),
        b3=jnp.asarray(rng.standard_normal(D) * 0.1, dt),
        affine=jnp.asarray(
            np.stack([rng.uniform(0.8, 1.2, D), rng.standard_normal(D) * 0.1]),
            jnp.float32),
    )


def _with_batch(monkeypatch, name, value):
    monkeypatch.setenv(name, str(value))


@pytest.mark.parametrize("batch", [2, 4])
def test_epilog_batched_matches_batch1(graph, feats, monkeypatch, batch):
    n_pad = graph.n_nodes_padded
    dst_key = jnp.where(graph.edge_mask, graph.dst, PAD_SEGMENT)

    def run():
        return fused_gate_sigma_gather(
            feats["g"], feats["e"], feats["v"], feats["affine"],
            (dst_key, graph.src), graph.by_dst, graph.by_src, n_pad,
            "pallas_interpret")

    _with_batch(monkeypatch, "GNNOME_EPILOG_BATCH", 1)
    sums_ref, enew_ref = run()
    _with_batch(monkeypatch, "GNNOME_EPILOG_BATCH", batch)
    sums, enew = run()
    # e_new is row-local elementwise math: bit-exact
    np.testing.assert_array_equal(np.asarray(enew), np.asarray(enew_ref))
    # f32 sums: re-association only
    np.testing.assert_allclose(
        np.asarray(sums), np.asarray(sums_ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("batch", [2, 4])
def test_reverse_unsorted_batched_matches_batch1(graph, feats, monkeypatch,
                                                 batch):
    if not graph.by_src.canon_banded:
        pytest.skip("fixture not banded for the unsorted path")
    n_pad = graph.n_nodes_padded
    src_key = jnp.where(graph.edge_mask, graph.src, PAD_SEGMENT)

    def run():
        return _fused_sigma_reverse_unsorted(
            feats["v"], feats["e"], src_key, graph.dst, graph.by_src,
            graph.by_dst, n_pad, "pallas_interpret")

    _with_batch(monkeypatch, "GNNOME_SIGMA_BATCH", 1)
    ref = run()
    _with_batch(monkeypatch, "GNNOME_SIGMA_BATCH", batch)
    out = run()
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("batch", [2, 4])
def test_gate_front_batched_matches_batch1(graph, feats, monkeypatch, batch):
    n_pad = graph.n_nodes_padded
    e_real = int(graph.edge_mask.sum())
    src = jnp.minimum(graph.src, n_pad - 1)
    dst = jnp.minimum(graph.dst, n_pad - 1)

    def run():
        return gate_front_pallas(
            feats["v"], feats["v"], feats["e"], feats["w3"], feats["b3"],
            src, dst, graph.by_src.key_plan, graph.by_dst.key_plan,
            e_real, interpret=True)

    _with_batch(monkeypatch, "GNNOME_GATE_BATCH", 1)
    gate_ref, mom_ref = run()
    _with_batch(monkeypatch, "GNNOME_GATE_BATCH", batch)
    gate, mom = run()
    # the gate rows are bit-exact (selects + row-local B3 tile matmul)
    np.testing.assert_array_equal(np.asarray(gate), np.asarray(gate_ref))
    # BN moment sums: f32 re-association over the wider row tiles
    np.testing.assert_allclose(
        np.asarray(mom), np.asarray(mom_ref),
        rtol=1e-4, atol=1e-3 * max(1.0, e_real / 1e4))
