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


@pytest.mark.parametrize("batch", [2, 4])
def test_epilog_bwd_batched_matches_batch1(graph, feats, monkeypatch, batch):
    """ADVICE r4: the fused epilog backward under GNNOME_EPILOG_BATCH —
    the per-edge grads are row-local (selects + elementwise chains), so
    batch>1 must be bit-equal on d_gate/d_enew/d_vals; d_affine is an f32
    running sum over wider row tiles (re-association only)."""
    from gnnome_tpu.ops.spmm_pallas import epilog_bwd_pallas

    rng = np.random.default_rng(7)
    n_pad, e_pad = graph.n_nodes_padded, graph.n_edges_padded
    dt = jnp.bfloat16
    gate_raw = jnp.asarray(rng.standard_normal((e_pad, D)) * 0.1, dt)
    e_new = jnp.asarray(rng.standard_normal((e_pad, D)) * 0.1, dt)
    g_enew = jnp.asarray(rng.standard_normal((e_pad, D)) * 0.1, dt)
    g_sums = jnp.asarray(rng.standard_normal((n_pad, 2 * D)) * 0.1, dt)
    dst_key = jnp.where(graph.edge_mask, graph.dst, PAD_SEGMENT)

    def run():
        return epilog_bwd_pallas(
            gate_raw, e_new, g_enew, g_sums, feats["v"], feats["affine"],
            dst_key, graph.src, graph.by_dst.key_plan,
            graph.by_src.key_plan, interpret=True)

    _with_batch(monkeypatch, "GNNOME_EPILOG_BATCH", 1)
    ref = run()
    _with_batch(monkeypatch, "GNNOME_EPILOG_BATCH", batch)
    out = run()
    for a, b in zip(out[:3], ref[:3]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(
        np.asarray(out[3]), np.asarray(ref[3]), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("batch", [2, 4])
def test_rev_bwd_batched_matches_batch1(graph, feats, monkeypatch, batch):
    """rev_bwd_pallas (reverse-unsorted backward) under the batch knob:
    both outputs are per-edge (row-local) — bit-equal."""
    from gnnome_tpu.ops.spmm_pallas import rev_bwd_pallas

    rng = np.random.default_rng(8)
    n_pad, e_pad = graph.n_nodes_padded, graph.n_edges_padded
    dt = jnp.bfloat16
    e_new = jnp.asarray(rng.standard_normal((e_pad, D)) * 0.1, dt)
    g_sums = jnp.asarray(rng.standard_normal((n_pad, 2 * D)) * 0.1, dt)
    src_key = jnp.where(graph.edge_mask, graph.src, PAD_SEGMENT)

    def run():
        return rev_bwd_pallas(
            e_new, g_sums, feats["v"], src_key, graph.dst,
            graph.by_src.key_plan, graph.by_dst.key_plan, interpret=True)

    _with_batch(monkeypatch, "GNNOME_EPILOG_BATCH", 1)
    ref = run()
    _with_batch(monkeypatch, "GNNOME_EPILOG_BATCH", batch)
    out = run()
    for a, b in zip(out, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("batch", [2, 4])
def test_segsum_stream_batched_matches_batch1(monkeypatch, batch):
    """GNNOME_SEGSUM_BATCH > 1 in the streaming segment-sum (an opt-in
    knob that had never been executed — VERDICT r4 weak #4): the wider
    contraction re-associates the f32 sums, so parity is allclose, not
    bit-equal."""
    from gnnome_tpu.ops.segment import segment_sum_csr
    from tests.test_segsum_stream import _graph

    g = _graph("chain", seed=11)
    assert g.by_dst.stream_w > 0
    rng = np.random.default_rng(9)
    data = jnp.asarray(rng.standard_normal((g.n_edges_padded, 128)),
                       jnp.float32)
    _with_batch(monkeypatch, "GNNOME_SEGSUM_BATCH", 1)
    ref = segment_sum_csr(data, g.by_dst, g.n_nodes_padded,
                          backend="pallas_interpret")
    _with_batch(monkeypatch, "GNNOME_SEGSUM_BATCH", batch)
    out = segment_sum_csr(data, g.by_dst, g.n_nodes_padded,
                          backend="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    xla = segment_sum_csr(data, g.by_dst, g.n_nodes_padded, backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(xla),
                               rtol=1e-4, atol=2e-4)


@pytest.mark.parametrize("batch", [2, 4])
def test_gate_front_bwd_stream_batched(monkeypatch, batch):
    """GNNOME_SEGSUM_BATCH > 1 through the dual-key streaming gate-front
    backward (ops/spmm_pallas.gate_front_bwd_stream_pallas)."""
    from gnnome_tpu.core.graph import build_graph as _bg
    from gnnome_tpu.ops.segment import fused_gate_front

    rng = np.random.default_rng(12)
    src = rng.integers(0, 300, 3000).astype(np.int32)
    d_ = np.minimum(src + rng.integers(1, 9, 3000), 299).astype(np.int32)
    keep = src != d_
    g = _bg(src[keep], d_[keep], 300)
    assert g.by_dst.stream_w > 0 and g.by_src.stream_w > 0
    E, Dd = g.n_edges_padded, 128
    e = jnp.asarray(rng.standard_normal((E, Dd)).astype(np.float32))
    b1h = jnp.asarray(
        rng.standard_normal((g.n_nodes_padded, Dd)).astype(np.float32))
    b2h = jnp.asarray(
        rng.standard_normal((g.n_nodes_padded, Dd)).astype(np.float32))
    w3 = jnp.asarray(rng.standard_normal((Dd, Dd)).astype(np.float32) * 0.1)
    b3 = jnp.asarray(rng.standard_normal(Dd).astype(np.float32) * 0.1)

    def loss(b1h, b2h, e, w3, b3):
        gate, mom = fused_gate_front(
            b1h, b2h, e, w3, b3, g.src, g.dst, (g.by_src, g.by_dst),
            g.n_nodes_padded, g.n_edges, "pallas_interpret")
        return (jnp.sum(jnp.sin(gate.astype(jnp.float32)))
                + jnp.sum(mom * jnp.arange(2)[:, None]))

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))
    _with_batch(monkeypatch, "GNNOME_SEGSUM_BATCH", 1)
    ref = grads(b1h, b2h, e, w3, b3)
    _with_batch(monkeypatch, "GNNOME_SEGSUM_BATCH", batch)
    out = grads(b1h, b2h, e, w3, b3)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
