"""Round-3 segment-sum family levers: subtile accumulate + fused reverse
backward.

``_segment_sum_sub_kernel`` derives each chunk's in-block id span IN-KERNEL
(min/max of the ids tile clamped to the block) so the same subtile fast
path serves both callers of the one-hot segment-sum: sorted ids (identity
CSR) and unsorted canonical ids (the permutation-free transpose
reduction). Chunks that fit a [sub, LANE] window accumulate at a dynamic
8-aligned offset; chunks that overflow take the full-block path; chunks
with no in-block ids are skipped. Two fixtures pin all three branches
(same strategy as tests/test_subtile_accumulate.py):

- dense tangles (mean degree ~6): spans fit the window → narrow branch;
- a near-pure chain (mean degree ~2): a 1024-edge chunk spans ~500 ids →
  full-block fallback.

``rev_bwd_pallas`` fuses the reverse-unsorted backward's two gathers
(cotangent on near-sorted src ids, value regather on sorted dst ids) and
the σ′ chain into one pass; parity target is the XLA-composed backward
(fusion level 2), which tests/test_reverse_unsorted.py already pins
against the generic lowering.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnnome_tpu.core.graph import PAD_SEGMENT, build_graph
from gnnome_tpu.ops.segment import (
    gated_aggregate_reverse_unsorted,
    reverse_unsorted_supported,
    segment_sum_csr,
)

D = 128
BN = 512


@pytest.fixture
def rng():
    return np.random.default_rng(7)


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


def _segsum_refs(g, x):
    gsrc = np.asarray(g.src)[: g.n_edges]
    gdst = np.asarray(g.dst)[: g.n_edges]
    ref_d = np.zeros((g.n_nodes_padded, D), np.float32)
    np.add.at(ref_d, gdst, x[: g.n_edges])
    ref_s = np.zeros((g.n_nodes_padded, D), np.float32)
    np.add.at(ref_s, gsrc, x[: g.n_edges])
    return ref_d, ref_s


@pytest.mark.parametrize("extra", [4.0, 0.02], ids=["dense", "chain"])
@pytest.mark.parametrize(
    "env",
    [
        {"GNNOME_SEGSUM_SUB": "192", "GNNOME_SEGSUM_SLOTS": "4"},
        {"GNNOME_SEGSUM_SUB": "256", "GNNOME_SEGSUM_SLOTS": "2",
         "GNNOME_SEGSUM_SPLIT": "1"},
    ],
    ids=["sub192_slots4", "sub256_split"],
)
def test_segsum_subtile_parity(rng, monkeypatch, extra, env):
    """Both segment-sum callers match numpy add.at under the subtile
    kernel, on a narrow-branch fixture (dense) and on one that overflows
    the window (chain, span ~500 > sub)."""
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    g = _graph(rng, 500, extra)
    x = rng.standard_normal((g.n_edges_padded, D)).astype(np.float32)
    x[g.n_edges :] = 0
    ref_d, ref_s = _segsum_refs(g, x)
    out_d = np.asarray(segment_sum_csr(
        jnp.asarray(x), g.by_dst, g.n_nodes_padded,
        backend="pallas_interpret"))
    np.testing.assert_allclose(out_d, ref_d, rtol=0, atol=2e-5)
    out_s = np.asarray(segment_sum_csr(
        jnp.asarray(x), g.by_src, g.n_nodes_padded,
        backend="pallas_interpret"))
    np.testing.assert_allclose(out_s, ref_s, rtol=0, atol=2e-5)


def test_policy_sub_span_keyed():
    """The per-graph subtile policy picks the smallest window with ~20%
    headroom over the expected 1024-edge chunk span (1024·N/E), and
    disables the subtile on low-degree graphs where typical chunks would
    overflow every window."""
    from gnnome_tpu.ops.spmm_pallas import _policy_sub

    # bench-graph ratio (deg ~6.7 → span ~154) → 192, the measured best
    assert _policy_sub(150_016, 1_000_448, 512) == 192
    # dense tangles (deg ~12 → span ~85) → 128
    assert _policy_sub(12_800, 153_600, 512) == 128
    # near-chain (deg ~2 → span ~512) → full-block accumulate
    assert _policy_sub(4_096, 8_192, 512) == 0
    # window must stay below the block height
    assert _policy_sub(150_016, 1_000_448, 128) == 0


def test_segsum_subtile_branch_coverage(rng):
    """The two fixtures really exercise opposite branches: host replica of
    the kernel's span math (sorted caller, sub=192, bn=512)."""
    sub = 192
    fracs = {}
    for name, extra in (("dense", 4.0), ("chain", 0.02)):
        g = _graph(rng, 500, extra)
        ids = np.asarray(g.by_dst.segment_ids)
        e_pad = ids.shape[0]
        ids_ch = ids.reshape(e_pad // 1024, 1024)
        narrow = total = 0
        for b in range(g.n_nodes_padded // BN):
            blo = b * BN
            offs = np.asarray(g.by_dst.offsets)
            lo_c = offs[blo] // 1024
            hi_c = -(-offs[min(blo + BN, len(offs) - 1)] // 1024)
            for c in range(lo_c, max(hi_c, lo_c)):
                inb = (ids_ch[c] >= blo) & (ids_ch[c] < blo + BN)
                if not inb.any():
                    continue
                lo_id, hi_id = ids_ch[c][inb].min(), ids_ch[c][inb].max()
                off = min(max(lo_id - blo, 0), BN - sub) & ~7
                narrow += int(hi_id < blo + off + sub)
                total += 1
        fracs[name] = narrow / max(total, 1)
    assert fracs["dense"] > 0.9, fracs
    assert fracs["chain"] < 0.5, fracs


def test_rev_bwd_fused_dispatch_and_parity(rng, monkeypatch):
    """The fused reverse backward (level 3) dispatches on the banded
    fixture and its grads equal the XLA-composed backward (level 2)."""
    import gnnome_tpu.ops.spmm_pallas as sp

    g = _graph(rng, 500, 4.0)
    assert reverse_unsorted_supported(g, D, 4, "pallas_interpret")
    n_pad = g.n_nodes_padded
    src_key = jnp.where(g.edge_mask, g.src, PAD_SEGMENT)
    v = jnp.asarray(rng.standard_normal((n_pad, D)), jnp.float32)
    e = jnp.asarray(rng.standard_normal((g.n_edges_padded, D)), jnp.float32)

    def loss(v, e):
        out = gated_aggregate_reverse_unsorted(
            v, e, src_key, g.dst, g, n_pad, backend="pallas_interpret")
        return jnp.sum(out ** 2)

    calls = {"n": 0}
    orig = sp.rev_bwd_pallas

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(sp, "rev_bwd_pallas", spy)
    monkeypatch.setenv("GNNOME_FUSION_LEVEL", "3")
    gv3, ge3 = jax.grad(loss, argnums=(0, 1))(v, e)
    assert calls["n"] == 1, "fused reverse backward did not dispatch"

    monkeypatch.setenv("GNNOME_FUSION_LEVEL", "2")
    gv2, ge2 = jax.grad(loss, argnums=(0, 1))(v, e)
    assert calls["n"] == 1, "level 2 must use the composed backward"
    np.testing.assert_allclose(np.asarray(gv3), np.asarray(gv2),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ge3), np.asarray(ge2),
                               rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize(
    "env",
    [
        {"GNNOME_SIGMA_SUB": "0"},
        {"GNNOME_SIGMA_SUB": "256"},
        {"GNNOME_SIGMA_SUB": "256", "GNNOME_SIGMA_SLOTS": "4"},
        {"GNNOME_SIGMA_SUB": "0", "GNNOME_SIGMA_SLOTS": "3",
         "GNNOME_SIGMA_SPLIT": "1"},
        {"GNNOME_SIGMA_SUB": "256", "GNNOME_SIGMA_SPLIT": "1"},
    ],
    ids=["sub0", "sub256", "sub256_slots4", "sub0_slots3_split",
         "sub256_split"],
)
def test_sigma_unsorted_subtile_parity(rng, monkeypatch, env):
    """The unsorted σ-aggregate forward is unchanged by its subtile
    accumulate (GNNOME_SIGMA_SUB), pipeline depth (GNNOME_SIGMA_SLOTS),
    and split accumulate chains (GNNOME_SIGMA_SPLIT), on both branch-mix
    fixtures."""
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    for extra in (4.0, 0.02):
        g = _graph(rng, 500, extra)
        if not reverse_unsorted_supported(g, D, 4, "pallas_interpret"):
            continue
        n_pad = g.n_nodes_padded
        src_key = jnp.where(g.edge_mask, g.src, PAD_SEGMENT)
        v = jnp.asarray(rng.standard_normal((n_pad, D)), jnp.float32)
        e = jnp.asarray(rng.standard_normal((g.n_edges_padded, D)), jnp.float32)
        out = gated_aggregate_reverse_unsorted(
            v, e, src_key, g.dst, g, n_pad, backend="pallas_interpret")
        ref = gated_aggregate_reverse_unsorted(
            v, e, src_key, g.dst, g, n_pad, backend="xla")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-4)
