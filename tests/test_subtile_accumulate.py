"""The subtile accumulate of the gather-fused epilog kernel.

``_fused_gate_gather_kernel`` (ops/spmm_pallas.py) exploits that segment
ids are SORTED within a 1024-edge chunk: at assembly-graph degree the ids
span ~154 of the 512 block rows, so the one-hot accumulate runs on a
[256, LANE] window at a dynamic 8-aligned row offset instead of the full
[512, LANE] — half the accumulate MXU flops and half the accumulator
read-modify-write traffic. Chunks whose in-block id span exceeds the
window (low-degree stretches, hubs at the pad boundary) take the
full-block path under ``pl.when``.

These tests need ``n_pad % 512 == 0`` (the subtile only arms at
block_nodes > 256) — the random small fixtures elsewhere keep n_pad=128
and never reach it. Two graph shapes pin both branches:

- dense tangles (mean degree ~6): most chunks fit the 256-row window
  (the narrow branch does the work);
- a near-pure chain (mean degree ~2): a 1024-edge chunk spans ~500 ids,
  so most chunks overflow the window (the fallback branch does the work).

A host-side replica of the kernel's off/narrow math asserts each fixture
actually exercises its branch. Parity target: the XLA composed lowering,
same contract as tests/test_segment_ops.py.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnnome_tpu.core.graph import PAD_SEGMENT, build_graph
from gnnome_tpu.ops.segment import fused_gate_sigma_gather

D = 128
CHUNK = 1024
BN = 512
SUB = 256


def _graph(rng, n, extra_per_node):
    src, dst = [], []
    for i in range(n - 1):
        src.append(i)
        dst.append(i + 1)
        src.append(i + 1)
        dst.append(i)
    for i in rng.integers(0, n - 16, int(n * extra_per_node)):
        src.append(int(i))
        dst.append(int(i) + int(rng.integers(1, 12)))
    g = build_graph(np.array(src, np.int32), np.array(dst, np.int32), n)
    assert g.n_nodes_padded % BN == 0
    return g


def _narrow_fraction(g):
    """Host replica of the kernel's subtile placement: fraction of
    (block, chunk) iterations whose real in-block ids fit the window."""
    ids = np.asarray(g.by_dst.segment_ids)
    e_pad = ids.shape[0]
    ids_ch = ids.reshape(e_pad // CHUNK, CHUNK)
    real = ids_ch != PAD_SEGMENT
    cfirst = np.where(real, ids_ch, PAD_SEGMENT).min(axis=1)
    clast = np.where(real, ids_ch, -1).max(axis=1)
    offsets = np.asarray(g.by_dst.offsets)
    narrow = []
    for b in range(g.n_nodes_padded // BN):
        lo = offsets[b * BN] // CHUNK
        hi = -(-offsets[min((b + 1) * BN, len(offsets) - 1)] // CHUNK)
        blo = b * BN
        for c in range(lo, hi):
            off = min(max(int(cfirst[c]) - blo, 0), BN - SUB) & ~7
            narrow.append(min(int(clast[c]), blo + BN - 1) < blo + off + SUB)
    return float(np.mean(narrow)) if narrow else 0.0


def _run(g, backend):
    rng = np.random.default_rng(0)
    e_pad, n_pad = g.n_edges_padded, g.n_nodes_padded
    gate = jnp.asarray(rng.standard_normal((e_pad, D)), jnp.float32)
    e_in = jnp.asarray(rng.standard_normal((e_pad, D)), jnp.float32)
    vals = jnp.asarray(rng.standard_normal((n_pad, D)), jnp.float32)
    affine = jnp.asarray(
        np.stack([rng.uniform(0.5, 1.5, D), rng.standard_normal(D)]),
        jnp.float32)
    dst_key = jnp.where(g.edge_mask, g.dst, PAD_SEGMENT)

    def loss(gate, e_in, vals):
        sums, e_new = fused_gate_sigma_gather(
            gate, e_in, vals, affine, (dst_key, g.src), g.by_dst, g.by_src,
            n_pad, backend)
        return (jnp.sum(sums[: g.n_nodes]) * 1e-3
                + jnp.sum(e_new[: g.n_edges]) * 1e-3)

    val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(gate, e_in, vals)
    sums, e_new = fused_gate_sigma_gather(
        gate, e_in, vals, affine, (dst_key, g.src), g.by_dst, g.by_src,
        n_pad, backend)
    return val, grads, sums, e_new


@pytest.mark.parametrize(
    "env",
    [
        {},
        {"GNNOME_EPILOG_SLOTS": "4"},
        {"GNNOME_EPILOG_SPLIT": "1"},
        {"GNNOME_EPILOG_SLOTS": "3", "GNNOME_EPILOG_SPLIT": "1"},
    ],
    ids=["default", "slots4", "split", "slots3_split"],
)
@pytest.mark.parametrize("extra,branch", [(5.0, "narrow"), (0.05, "fallback")])
def test_subtile_matches_xla(rng, monkeypatch, extra, branch, env):
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    g = _graph(rng, 500, extra)
    frac = _narrow_fraction(g)
    if branch == "narrow":
        assert frac > 0.6, f"dense fixture should mostly fit: {frac}"
    else:
        assert frac < 0.6, f"chain fixture should mostly overflow: {frac}"

    v_x, g_x, s_x, e_x = _run(g, "xla")
    v_p, g_p, s_p, e_p = _run(g, "pallas_interpret")
    np.testing.assert_allclose(float(v_x), float(v_p), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(s_x)[: g.n_nodes],
                               np.asarray(s_p)[: g.n_nodes],
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(e_x)[: g.n_edges],
                               np.asarray(e_p)[: g.n_edges],
                               rtol=2e-3, atol=2e-3)
    for a, b in zip(g_x, g_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_unsorted_segment_sum_by_src(rng):
    """segment_sum_csr over by_src takes the permutation-free unsorted
    kernel on banded graphs (csr.key_canonical + canon_lo/hi) and matches
    the xla permute+sorted lowering."""
    from gnnome_tpu.ops.segment import segment_sum_csr

    for extra in (5.0, 0.05):
        g = _graph(rng, 500, extra)
        data = jnp.asarray(
            np.random.default_rng(1).standard_normal(
                (g.n_edges_padded, D)), jnp.float32)
        ref = segment_sum_csr(data, g.by_src, g.n_nodes_padded,
                              backend="xla")
        if g.by_src.canon_banded:
            assert g.by_src.key_canonical is not None
        got = segment_sum_csr(data, g.by_src, g.n_nodes_padded,
                              backend="pallas_interpret")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


def test_subtile_off_matches(rng, monkeypatch):
    """GNNOME_SUBTILE=0 (full-block accumulate) agrees with the default."""
    monkeypatch.setenv("GNNOME_SUBTILE", "0")
    g = _graph(rng, 500, 5.0)
    _, _, s_off, e_off = _run(g, "pallas_interpret")
    monkeypatch.setenv("GNNOME_SUBTILE", "1")
    _, _, s_on, e_on = _run(g, "pallas_interpret")
    np.testing.assert_allclose(np.asarray(s_off), np.asarray(s_on),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(e_off), np.asarray(e_on),
                               rtol=0, atol=0)
