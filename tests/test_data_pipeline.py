"""End-to-end data path: genome → reads → overlap graph → parse → labels.

Fixture strategy per SURVEY.md §4: tiny synthetic genomes with known
coordinates make the DFS oracle's output exactly checkable.
"""
import os

import numpy as np
import pytest

from gnnome_tpu.data import oracle
from gnnome_tpu.data.builder import build_overlap_graph, parse_fasta
from gnnome_tpu.data.dataset import AssemblyGraphDataset, process_raw_graph
from gnnome_tpu.data.parser import adjacency_dicts, parse_csv
from gnnome_tpu.data.simulate import simulate_reads, write_fasta


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    rng = np.random.default_rng(7)
    genome = "".join(rng.choice(list("ACGT"), size=30_000))
    lengths = np.full(500, 2_000, dtype=np.int64)
    records = simulate_reads(genome, coverage=15.0, lengths=lengths, seed=3)
    os.makedirs(root / "raw", exist_ok=True)
    write_fasta(str(root / "raw" / "0.fasta"), records)
    return str(root), genome


def test_builder_and_parser_roundtrip(tiny_dataset, tmp_path):
    root, genome = tiny_dataset
    reads_path = os.path.join(root, "raw", "0.fasta")
    csv_path = str(tmp_path / "0_graph_1.csv")
    build_overlap_graph(reads_path, csv_path, k=15, w=5, min_overlap=300)

    parsed = parse_csv(csv_path, reads_path)
    assert parsed.n_nodes > 0 and parsed.n_nodes % 2 == 0
    assert parsed.n_edges > 0

    # node-pair / strand invariants (graph_parser.py:252-262)
    rs = parsed.read_strand
    for i in range(0, parsed.n_nodes, 2):
        assert rs[i] == -rs[i + 1]
        assert parsed.read_start[i] == parsed.read_start[i + 1]
        assert parsed.read_idx[i] == parsed.read_idx[i + 1]

    # every edge has its reverse-complement mirror
    succ, pred, edges = adjacency_dicts(parsed.src, parsed.dst, parsed.n_nodes)
    for (u, v) in edges:
        assert (v ^ 1, u ^ 1) in edges

    # sequences: node 2i+1 is the reverse complement of node 2i
    from gnnome_tpu.data.parser import reverse_complement
    for i in range(0, min(parsed.n_nodes, 20), 2):
        assert parsed.reads[i + 1] == reverse_complement(parsed.reads[i])


def test_oracle_labels(tiny_dataset, tmp_path):
    root, genome = tiny_dataset
    reads_path = os.path.join(root, "raw", "0.fasta")
    csv_path = str(tmp_path / "0_graph_1.csv")
    build_overlap_graph(reads_path, csv_path, k=15, w=5, min_overlap=300)
    parsed = parse_csv(csv_path, reads_path)
    succ, pred, edges = adjacency_dicts(parsed.src, parsed.dst, parsed.n_nodes)
    y = oracle.edge_labels(parsed, succ, edges)

    assert y.shape == (parsed.n_edges,)
    assert y.sum() > 0, "oracle found no correct edges on a covered genome"
    # mirror symmetry: edge labeled 1 => its rc mirror labeled 1
    # (algorithms.py:139 adds both)
    for (u, v), eid in edges.items():
        if y[eid] == 1:
            assert y[edges[(v ^ 1, u ^ 1)]] == 1

    # positive edges must advance genome coordinates consistently
    for (u, v), eid in edges.items():
        if y[eid] == 1 and parsed.read_strand[u] == 1 and parsed.read_strand[v] == 1:
            assert parsed.read_start[v] < parsed.read_end[u]  # overlap exists


def test_dataset_cache_and_load(tiny_dataset):
    root, _ = tiny_dataset
    ds = AssemblyGraphDataset(root, nb_pos_enc=8, specs={"threads": 2, "filter": 0.99})
    assert len(ds) == 1
    idx, sample = ds[0]
    assert idx == 0
    g = sample.graph
    assert sample.pe.shape == (g.n_nodes_padded, 8 + 2)
    assert sample.e_feat.shape == (g.n_edges_padded, 2)
    assert sample.y.shape[0] == g.n_edges_padded
    # features are z-normalized over real edges
    ef = np.asarray(sample.e_feat)[: g.n_edges]
    assert abs(ef[:, 0].mean()) < 1e-3
    # second construction hits the cache (no builder run)
    ds2 = AssemblyGraphDataset(root, nb_pos_enc=8)
    assert len(ds2) == 1


def test_resolve_distribution_vendored(tmp_path):
    """Vendored reference length distributions inflate on demand."""
    from gnnome_tpu.data.simulate import load_length_distribution, resolve_distribution

    p = resolve_distribution("chr19", str(tmp_path))
    assert p is not None and p.endswith("chr19.txt")
    lengths = load_length_distribution(p)
    assert len(lengths) == 110836  # reference data/references/lengths/chr19.txt
    assert lengths.min() > 0
    # second call reuses the inflated file
    assert resolve_distribution("chr19", str(tmp_path)) == p
    # unknown chromosome -> None (clipped-normal fallback)
    assert resolve_distribution("chrNOPE", str(tmp_path)) is None


def test_oracle_bounded_gap_jump():
    """The gap-jump bound stops repeat teleports from poisoning labels.

    Chain A (nodes 0..2) dead-ends at node 2 whose only remaining graph
    child teleports 1 Mb ahead to chain B (nodes 3..5). Unbounded
    (reference semantics), the accepted walk jumps A->B and the monotone
    acceptance rule then discards the middle chain C (nodes 6..8) living
    between them -- its edges get labeled negative. Bounded, the walk ends
    at the dead-end and every chain keeps its true-positive edges."""
    import numpy as np
    from gnnome_tpu.data.oracle import get_gt_edges

    # positive-strand nodes at even ids (mirrors use ^1)
    starts = {0: 0, 2: 800, 4: 1600,            # chain A
              6: 2400, 8: 3200, 10: 4000,       # chain C (after A)
              12: 1_000_000, 14: 1_000_800}     # chain B (teleport target)
    n = 16
    read_start = np.zeros(n, np.int64)
    read_end = np.zeros(n, np.int64)
    read_strand = np.full(n, -1, np.int8)
    for node, s in starts.items():
        read_start[node] = s
        read_end[node] = s + 1000
        read_strand[node] = 1
    neighbors = {
        0: [2], 2: [4], 4: [12],        # A dead-ends into the teleport
        6: [8], 8: [10], 10: [],
        12: [14], 14: [],
    }
    neighbors = {k: v for k, v in neighbors.items()}
    edges = {}
    for srcn, dsts in neighbors.items():
        for dstn in dsts:
            edges[(srcn, dstn)] = len(edges)
            edges[(dstn ^ 1, srcn ^ 1)] = len(edges)

    pos_unbounded, _ = get_gt_edges(
        read_start, read_end, read_strand, neighbors, edges, max_gap=np.inf)
    pos_bounded, _ = get_gt_edges(
        read_start, read_end, read_strand, neighbors, edges, max_gap=10_000)

    c_edges = {edges[(6, 8)], edges[(8, 10)]}
    # reference semantics: the teleporting walk A->B sets largest_visited
    # to 1 Mb; chain C is then discarded (the poisoning this test pins)
    assert not (c_edges & pos_unbounded)
    # bounded: A ends at its dead-end; C and B get their own walks
    assert c_edges <= pos_bounded
    assert edges[(0, 2)] in pos_bounded and edges[(2, 4)] in pos_bounded
    assert edges[(12, 14)] in pos_bounded
    # the teleport edge itself is never a positive label
    assert edges[(4, 12)] not in pos_bounded
