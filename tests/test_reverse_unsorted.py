"""The permutation-free reverse-unsorted aggregation path.

Round-2 shipped ``gated_aggregate_reverse_unsorted`` (the canonical-order
σ-aggregate keyed on UNSORTED src ids — ``ops/segment.py``, kernel
``ops/spmm_pallas.fused_sigma_unsorted_pallas``) untested: it needs a banded
graph with ``n_pad % 512 == 0`` that no random small fixture could provide.
This file adds that fixture (a locality-ordered chain with short-range
tangles, exactly the structure real assembly graphs have) and pins:

- ``canon_lo``/``canon_hi`` against a brute-force per-node min/max over
  canonical edge positions — including the regression where the last real
  node's final sorted edge was dropped when trailing padded/isolated nodes
  exist (the round-2 advisor's high-severity off-by-one in
  ``core/graph.py``);
- forward + gradient parity of the op against the plain ``gated_aggregate``
  lowering, xla vs pallas_interpret;
- full-model loss/grad parity through the real dispatch (same tolerances as
  ``test_narrow_path_backend_grad_parity``);
- dispatch precedence: on a banded graph the layer takes the
  reverse-unsorted branch ahead of the mega-fused opposite path
  (``models/gated_gcn.py``).

Reference math being reproduced: the reverse-direction aggregation of
``layers/gated_gcn_full.py:133-143`` (σ-weighted mean over out-edges).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnnome_tpu.core.graph import PAD_SEGMENT, build_graph, pad_features, \
    prepare_edge_features
from gnnome_tpu.ops.segment import (
    gated_aggregate,
    gated_aggregate_reverse_unsorted,
    reverse_unsorted_supported,
)


def banded_graph(rng, n=510):
    """Locality-ordered chain + short-range tangles: n_pad == 512 (multiple
    of the 512-node kernel block), canonical (dst-sorted) edge positions
    banded per src block -> ``canon_banded`` is True."""
    src, dst = [], []
    for i in range(n - 1):
        src.append(i)
        dst.append(i + 1)
    for i in range(0, n - 4, 3):
        src.append(i)
        dst.append(i + 2)
        src.append(i + 2)
        dst.append(i)
    for i in rng.integers(0, n - 16, 200):
        src.append(int(i))
        dst.append(int(i) + int(rng.integers(1, 12)))
    src = np.array(src, np.int32)
    dst = np.array(dst, np.int32)
    g = build_graph(src, dst, n)
    assert g.n_nodes_padded % 512 == 0
    assert g.by_src.canon_banded
    assert reverse_unsorted_supported(g, 128, 4, "pallas_interpret")
    return g, src, dst


def _brute_canon_bounds(g, canon_src, n_edges):
    lo = np.full(g.n_nodes_padded, np.int32(2**30 - 1), np.int32)
    hi = np.full(g.n_nodes_padded, -1, np.int32)
    for k in range(n_edges):
        s = canon_src[k]
        lo[s] = min(lo[s], k)
        hi[s] = max(hi[s], k)
    return lo, hi


def test_canon_bounds_brute_force(rng):
    """canon_lo/canon_hi == per-node min/max canonical edge position, on
    random graphs of many shapes (trailing isolated nodes always exist
    because n_pad rounds up)."""
    for _ in range(20):
        n = int(rng.integers(3, 120))
        e = int(rng.integers(1, 400))
        src = rng.integers(0, n, e).astype(np.int32)
        dst = rng.integers(0, n, e).astype(np.int32)
        g = build_graph(src, dst, n)
        csr = g.by_src
        if csr.canon_lo is None:
            continue
        lo, hi = _brute_canon_bounds(g, np.asarray(g.src)[:e], e)
        got_hi = np.asarray(csr.canon_hi)
        got_lo = np.asarray(csr.canon_lo)
        np.testing.assert_array_equal(got_hi, hi)
        np.testing.assert_array_equal(got_lo[hi >= 0], lo[hi >= 0])


def test_canon_bounds_last_segment_regression():
    """The off-by-one the round-2 advisor found: when the highest-id node
    with edges is followed only by padding, its segment must still extend
    to the final sorted edge.  Node 3 here owns sorted positions 7..9; the
    clamped-reduceat version reduced over [7, 9) and dropped position 9."""
    # 4 nodes with out-degrees [3, 4, 0, 3]; node 3 is last with edges
    src = np.array([0, 0, 0, 1, 1, 1, 1, 3, 3, 3], np.int32)
    dst = np.array([1, 2, 3, 0, 2, 3, 3, 0, 1, 2], np.int32)
    g = build_graph(src, dst, 4)
    lo, hi = _brute_canon_bounds(g, np.asarray(g.src)[:10], 10)
    np.testing.assert_array_equal(np.asarray(g.by_src.canon_hi), hi)
    got_lo = np.asarray(g.by_src.canon_lo)
    np.testing.assert_array_equal(got_lo[hi >= 0], lo[hi >= 0])
    # structural pin on the fixture: node 3 IS the last src-sorted segment
    # (positions 7..9) and trailing padded nodes exist, so the clamped
    # reduceat would have reduced over positions [7, 9) only — its hi would
    # have missed whichever canonical position ord[9] holds
    assert int(np.asarray(g.by_src.offsets)[4]) == 10


def test_reverse_unsorted_op_parity(rng):
    """Forward AND gradients of the fused op equal the generic
    gated_aggregate lowering, xla vs pallas_interpret."""
    g, src, dst = banded_graph(rng)
    n_pad, e_pad = g.n_nodes_padded, g.n_edges_padded
    d = 128
    vals = jnp.asarray(rng.standard_normal((n_pad, d)).astype(np.float32))
    gate = jnp.asarray(rng.standard_normal((e_pad, d)).astype(np.float32))
    src_key = jnp.where(g.edge_mask, g.src, PAD_SEGMENT)

    def f_new(v, e, backend):
        out = gated_aggregate_reverse_unsorted(
            v, e, src_key, g.dst, g, n_pad, backend=backend)
        return jnp.sum(out ** 2), out

    def f_ref(v, e):
        out = gated_aggregate(v, e, g.dst, g.by_dst, g.by_src, n_pad,
                              key=src_key, backend="xla")
        return jnp.sum(out ** 2), out

    for backend in ("xla", "pallas_interpret"):
        (loss, out), grads = jax.value_and_grad(
            lambda v, e: f_new(v, e, backend), argnums=(0, 1), has_aux=True
        )(vals, gate)
        (loss_r, out_r), grads_r = jax.value_and_grad(
            f_ref, argnums=(0, 1), has_aux=True)(vals, gate)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_r),
                                   rtol=1e-5, atol=1e-5)
        for a, b in zip(grads, grads_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)


def test_reverse_unsorted_model_grad_parity(rng):
    """Full-model loss + grads agree xla vs pallas_interpret on the banded
    fixture — this executes the real headline dispatch chain including the
    reverse-unsorted branch (the path BENCH_r02's 715k number runs)."""
    from gnnome_tpu.config import ModelConfig
    from gnnome_tpu.evaluation.metrics import bce_with_logits
    from gnnome_tpu.models.model import init_model_params, model_forward

    g, src, dst = banded_graph(rng)
    n_edges = len(src)
    cfg = ModelConfig(num_gnn_layers=2, hidden_features=128,
                      hidden_edge_features=8, hidden_edge_scores=16,
                      nb_pos_enc=8)
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    e_feat = prepare_edge_features(
        g, rng.standard_normal((n_edges, 2)).astype(np.float32))
    pe = jnp.asarray(pad_features(
        rng.standard_normal((510, cfg.nb_pos_enc + 2)).astype(np.float32),
        g.n_nodes_padded))
    y = prepare_edge_features(
        g, (rng.random(n_edges) < 0.3).astype(np.float32))

    def loss(p, backend):
        logits = model_forward(p, g, e_feat, pe, batch_norm=True,
                               backend=backend)
        return bce_with_logits(logits, y, g.edge_mask, 1.0)

    l_x, g_x = jax.value_and_grad(loss)(params, "xla")
    l_p, g_p = jax.value_and_grad(loss)(params, "pallas_interpret")
    np.testing.assert_allclose(float(l_p), float(l_x), rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_p),
                    jax.tree_util.tree_leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_dispatch_precedence(rng, monkeypatch):
    """On a banded graph with pallas dispatch, the layer must take the
    reverse-unsorted branch (it outran the mega-fused opposite path in the
    round-2 bench); on a non-banded graph it must NOT."""
    import gnnome_tpu.models.gated_gcn as gg
    from gnnome_tpu.config import ModelConfig
    from gnnome_tpu.models.model import init_model_params, model_forward

    calls = []
    real = gg.gated_aggregate_reverse_unsorted

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(gg, "gated_aggregate_reverse_unsorted", spy)
    cfg = ModelConfig(num_gnn_layers=1, hidden_features=128,
                      hidden_edge_features=8, hidden_edge_scores=16,
                      nb_pos_enc=8)
    params = init_model_params(jax.random.PRNGKey(0), cfg)

    g, src, dst = banded_graph(rng)
    e_feat = prepare_edge_features(
        g, rng.standard_normal((len(src), 2)).astype(np.float32))
    pe = jnp.asarray(pad_features(
        rng.standard_normal((510, cfg.nb_pos_enc + 2)).astype(np.float32),
        g.n_nodes_padded))
    model_forward(params, g, e_feat, pe, batch_norm=True,
                  backend="pallas_interpret")
    assert calls, "banded graph did not dispatch reverse-unsorted"

    # negative control: a LARGE random graph spreads each src block's
    # canonical positions over many 1024-chunks, so canon_banded must be
    # False and the support gate must refuse (small random graphs fit one
    # chunk and are trivially banded — that dispatch is fine)
    src2 = rng.integers(0, 4000, 20000).astype(np.int32)
    dst2 = rng.integers(0, 4000, 20000).astype(np.int32)
    g2 = build_graph(src2, dst2, 4000)
    assert not g2.by_src.canon_banded
    assert not reverse_unsorted_supported(g2, 128, 4, "pallas_interpret")
