"""Locality node reordering: invariance of per-edge outputs + band shrink."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnnome_tpu.parallel.partition import band_statistics, locality_order_pairs


def test_locality_order_preserves_pairing(rng):
    n = 60
    src = (2 * rng.integers(0, n // 2, 200)).astype(np.int32)
    dst = (2 * rng.integers(0, n // 2, 200) + 1).astype(np.int32)
    m = locality_order_pairs(src, dst, n)
    assert sorted(m.tolist()) == list(range(n))
    # pairing preserved: mate of 2i maps to mate of map(2i)
    for i in range(0, n, 2):
        assert m[i + 1] == m[i] + 1
        assert m[i] % 2 == 0


def test_reorder_shrinks_band(rng):
    # chain of reads in scrambled parser order
    n_reads = 300
    perm = rng.permutation(n_reads)
    # consecutive genome reads overlap: edge between scrambled ids
    src = np.array([2 * perm[i] for i in range(n_reads - 1)], np.int32)
    dst = np.array([2 * perm[i + 1] for i in range(n_reads - 1)], np.int32)
    before = band_statistics(src, dst)
    m = locality_order_pairs(src, dst, 2 * n_reads)
    after = band_statistics(m[src], m[dst])
    assert after["p99"] <= 8, after  # chain becomes near-diagonal
    assert after["p99"] < before["p99"]


def test_scores_invariant_under_reordering(rng, tmp_path):
    """load_sample(reorder=True/False) gives identical per-edge scores in
    parser order — the reordering must be purely an internal layout."""
    from gnnome_tpu.config import ModelConfig
    from gnnome_tpu.core.graph import extract_edge_values
    from gnnome_tpu.data.dataset import load_sample, save_processed
    from gnnome_tpu.data.parser import ParsedGraph
    from gnnome_tpu.models.model import init_model_params, model_forward

    n_reads, e = 40, 180
    n = 2 * n_reads
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    e = len(src)
    parsed = ParsedGraph(
        src=src, dst=dst,
        read_length=rng.integers(500, 2000, n),
        read_idx=np.repeat(np.arange(n_reads), 2),
        read_strand=np.tile([1, -1], n_reads),
        read_start=np.repeat(rng.integers(0, 10_000, n_reads), 2),
        read_end=np.repeat(rng.integers(10_000, 20_000, n_reads), 2),
        read_trim_start=np.zeros(n, np.int64),
        read_trim_end=np.zeros(n, np.int64),
        prefix_length=rng.integers(100, 1000, e),
        overlap_similarity=rng.random(e).astype(np.float32),
        overlap_length=rng.integers(100, 1000, e),
        reads=["ACGT"] * n,
    )
    y = (rng.random(e) < 0.4).astype(np.float32)
    npz = str(tmp_path / "0.npz")
    save_processed(parsed, y, npz)

    cfg = ModelConfig(num_gnn_layers=2, hidden_features=32, hidden_edge_features=8,
                      hidden_edge_scores=16, nb_pos_enc=8)
    params = init_model_params(jax.random.PRNGKey(0), cfg)

    outs = []
    for reorder in (False, True):
        s = load_sample(npz, 0, nb_pos_enc=8, locality_reorder=reorder)
        logits = model_forward(params, s.graph, s.e_feat, s.pe, backend="xla")
        outs.append(extract_edge_values(s.graph, logits))
        # labels in parser order must agree too
        assert np.allclose(extract_edge_values(s.graph, s.y), y)
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-4, atol=2e-4)
