"""Streaming (edge-major) segment-sum: the single-pipeline kernel that
replaces the block-major kernel's per-node-block DMA pipeline restarts
(ops/spmm_pallas._segment_sum_stream_kernel, plan in
core/graph._stream_plan).

The interpret-mode runs here exercise the real ring-window mechanics:
zero-frontier extension, modulo window wrap, flush-semaphore reuse, the
narrow-subtile vs full-window paths, and the trailing-pad epilogue.
"""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gnnome_tpu.core.graph import _stream_plan, build_graph, PAD_SEGMENT
from gnnome_tpu.ops.segment import segment_sum_csr


def _graph(style, seed=0):
    rng = np.random.default_rng(seed)
    if style == "chain":  # banded assembly-like: wraps the window many times
        n, e = 3000, 9000
        s = rng.integers(0, n, e)
        d = np.minimum(s + rng.integers(1, 9, e), n - 1)
    elif style == "hub":  # one node collects 30% of all edges
        n, e = 500, 3000
        s = rng.integers(0, n, e)
        d = np.where(rng.random(e) < 0.3, 7, np.minimum(s + 1, n - 1))
    elif style == "gaps":  # clusters separated by edge-less id ranges
        n, e = 900, 2500
        base = rng.integers(0, 4, e) * 200
        s = base + rng.integers(0, 5, e)
        d = np.minimum(base + rng.integers(0, 5, e), n - 1)
    keep = s != d
    return build_graph(s[keep], d[keep], n)


@pytest.mark.parametrize("style", ["chain", "hub", "gaps"])
def test_stream_matches_xla(style):
    g = _graph(style)
    assert g.by_dst.stream_w > 0, "plan should support these graphs"
    rng = np.random.default_rng(1)
    data = jnp.asarray(rng.standard_normal((g.n_edges_padded, 256)), jnp.float32)
    for csr in (g.by_dst, g.by_src):
        ref = segment_sum_csr(data, csr, g.n_nodes_padded, backend="xla")
        out = segment_sum_csr(data, csr, g.n_nodes_padded,
                              backend="pallas_interpret")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-4, rtol=1e-4)


def test_stream_bf16_and_env_off():
    g = _graph("chain", seed=3)
    rng = np.random.default_rng(2)
    data = jnp.asarray(
        rng.standard_normal((g.n_edges_padded, 128)).astype(np.float32)
    ).astype(jnp.bfloat16)
    ref = segment_sum_csr(data, g.by_dst, g.n_nodes_padded, backend="xla")
    out = segment_sum_csr(data, g.by_dst, g.n_nodes_padded,
                          backend="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)
    # env kill-switch falls back to the block-major kernel, same numbers
    os.environ["GNNOME_SEGSUM_STREAM"] = "0"
    try:
        out2 = segment_sum_csr(data, g.by_dst, g.n_nodes_padded,
                               backend="pallas_interpret")
    finally:
        del os.environ["GNNOME_SEGSUM_STREAM"]
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_stream_plan_invariants():
    g = _graph("chain", seed=5)
    e_pad = g.n_edges_padded
    ids = np.asarray(g.by_dst.segment_ids)
    meta, w = _stream_plan(ids, g.n_nodes_padded)
    assert w & (w - 1) == 0 and w >= 256
    assert meta.shape == (e_pad // 1024, 4)
    safe, zt, off, span = meta.T
    # flush/zero targets are F-aligned, monotone; flush ends at n_pad
    assert (safe % 128 == 0).all() and (zt % 128 == 0).all()
    assert (np.diff(safe) >= 0).all() and (np.diff(zt) >= 0).all()
    assert safe[-1] == g.n_nodes_padded
    idm = ids.reshape(-1, 1024).astype(np.int64)
    valid = idm < g.n_nodes_padded
    lo = np.where(valid, idm, 2**40).min(axis=1)
    hi = np.where(valid, idm, -1).max(axis=1)
    # no chunk > c writes a row below safe[c]; zero target covers id_hi;
    # (off, span) bound each chunk's ids
    for c in range(len(safe) - 1):
        assert lo[c + 1 :].min() >= safe[c]
    real = hi >= 0
    assert (zt[real] >= hi[real] + 1).all()
    assert (off % 8 == 0).all()
    assert (off[real] <= lo[real]).all()
    assert (off[real] + span[real] == hi[real] + 1).all()
    assert (span[~real] == 0).all()
    # random / non-monotone ids exceed the window cap -> unsupported
    rng = np.random.default_rng(0)
    rand_ids = rng.integers(0, 100_000, 64 * 1024).astype(np.int32)
    safe_r, w_r = _stream_plan(rand_ids, 102_400)
    assert w_r == 0 and safe_r is None


def test_gate_front_bwd_dual_stream():
    """The dual-key streaming gate-front backward (one pass: d_total
    in-register, both endpoint tables, staged d_total, f32 d_bias3) is
    bit-identical to the composed fallback on every endpoint/edge grad,
    and at xla-tolerance on d_bias3 (different f32 summation order)."""
    import jax
    import jax.numpy as jnp

    from gnnome_tpu.ops.segment import fused_gate_front

    rng = np.random.default_rng(0)
    src = rng.integers(0, 300, 3000).astype(np.int32)
    d_ = np.minimum(src + rng.integers(1, 9, 3000), 299).astype(np.int32)
    keep = src != d_
    g = build_graph(src[keep], d_[keep], 300)
    assert g.by_dst.stream_w > 0 and g.by_src.stream_w > 0
    E, D = g.n_edges_padded, 128
    e = jnp.asarray(rng.standard_normal((E, D)).astype(np.float32))
    b1h = jnp.asarray(
        rng.standard_normal((g.n_nodes_padded, D)).astype(np.float32))
    b2h = jnp.asarray(
        rng.standard_normal((g.n_nodes_padded, D)).astype(np.float32))
    w3 = jnp.asarray(rng.standard_normal((D, D)).astype(np.float32) * 0.1)
    b3 = jnp.asarray(rng.standard_normal(D).astype(np.float32) * 0.1)

    def loss(b1h, b2h, e, w3, b3, backend):
        gate, mom = fused_gate_front(
            b1h, b2h, e, w3, b3, g.src, g.dst, (g.by_src, g.by_dst),
            g.n_nodes_padded, g.n_edges, backend)
        return (jnp.sum(jnp.sin(gate.astype(jnp.float32)))
                + jnp.sum(mom * jnp.arange(2)[:, None]))

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))
    g_stream = grads(b1h, b2h, e, w3, b3, "pallas_interpret")
    os.environ["GNNOME_SEGSUM_STREAM"] = "0"
    try:
        g_fb = grads(b1h, b2h, e, w3, b3, "pallas_interpret")
    finally:
        del os.environ["GNNOME_SEGSUM_STREAM"]
    for i, (a, b) in enumerate(zip(g_stream, g_fb)):
        atol = 1e-3 if i == 4 else 0.0
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol)


def test_stream_window_wrap_exact():
    """A graph long enough that the 256-row minimum window wraps dozens of
    times, with f32 data — exact per-row check vs numpy."""
    n, deg = 8192, 3
    s = np.repeat(np.arange(n - 1), deg)
    d = np.minimum(s + np.tile(np.arange(1, deg + 1), n - 1), n - 1)
    g = build_graph(s, d, n)
    rng = np.random.default_rng(7)
    data = rng.standard_normal((g.n_edges_padded, 128)).astype(np.float32)
    out = segment_sum_csr(jnp.asarray(data), g.by_dst, g.n_nodes_padded,
                          backend="pallas_interpret")
    ids = np.asarray(g.by_dst.segment_ids)
    ref = np.zeros((g.n_nodes_padded, 128), np.float32)
    np.add.at(ref, np.where(ids < g.n_nodes_padded, ids, 0),
              np.where((ids < g.n_nodes_padded)[:, None], data, 0.0))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-4)
