"""Small parity surfaces: config JSON roundtrip, reference-compat metrics,
native-vs-python builder equivalence, info loaders."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from gnnome_tpu.config import Config, ModelConfig
from gnnome_tpu.evaluation.metrics import classification_metrics


def test_config_json_roundtrip(tmp_path):
    cfg = Config(model=ModelConfig(num_gnn_layers=4))
    cfg.split.train = {"chr19": 7}
    path = str(tmp_path / "cfg.json")
    cfg.to_json(path)
    cfg2 = Config.from_json(path)
    assert cfg2.model.num_gnn_layers == 4
    assert cfg2.split.train == {"chr19": 7}
    assert cfg2.train.lr == cfg.train.lr


def test_reference_compat_swaps_precision_recall():
    counts = {"tp": jnp.float32(10), "tn": jnp.float32(70),
              "fp": jnp.float32(5), "fn": jnp.float32(15)}
    std = classification_metrics(counts)
    ref = classification_metrics(counts, reference_compat=True)
    # standard: precision = 10/15, recall = 10/25
    assert float(std["precision"]) == pytest.approx(10 / 15)
    assert float(std["recall"]) == pytest.approx(10 / 25)
    # reference (utils.py:228,232) swaps them
    assert float(ref["precision"]) == pytest.approx(10 / 25)
    assert float(ref["recall"]) == pytest.approx(10 / 15)


def test_native_builder_matches_python(tmp_path):
    from gnnome_tpu.data import native_bridge

    if not native_bridge.available():
        pytest.skip("native library not built")
    from gnnome_tpu.data.builder import build_overlap_graph
    from gnnome_tpu.data.parser import parse_csv
    from gnnome_tpu.data.simulate import simulate_reads, write_fasta

    rng = np.random.default_rng(13)
    genome = "".join(rng.choice(list("ACGT"), size=20_000))
    records = simulate_reads(genome, coverage=10.0,
                             lengths=np.full(100, 1_500, dtype=np.int64), seed=2)
    reads = str(tmp_path / "r.fasta")
    write_fasta(reads, records)

    csv_nat = str(tmp_path / "nat_graph_1.csv")
    build_overlap_graph(reads, csv_nat, k=15, w=5, min_overlap=300)
    os.environ["GNNOME_FORCE_PYTHON"] = "1"
    try:
        csv_py = str(tmp_path / "pyy_graph_1.csv")
        build_overlap_graph(reads, csv_py, k=15, w=5, min_overlap=300)
    finally:
        del os.environ["GNNOME_FORCE_PYTHON"]

    p_nat = parse_csv(csv_nat, reads)
    p_py = parse_csv(csv_py, reads)
    assert p_nat.n_nodes == p_py.n_nodes
    assert p_nat.n_edges == p_py.n_edges
    # same edge set (order may differ)
    e_nat = set(zip(p_nat.src.tolist(), p_nat.dst.tolist()))
    e_py = set(zip(p_py.src.tolist(), p_py.dst.tolist()))
    assert e_nat == e_py


def test_info_loaders(tmp_path):
    import pickle

    from gnnome_tpu.data.dataset import get_info, load_graph_data

    os.makedirs(tmp_path / "info")
    for kind, val in (("pred", {0: [1]}), ("succ", {1: [0]}),
                      ("edges", {(0, 1): 0}), ("reads", ["ACGT"])):
        with open(tmp_path / "info" / f"0_{kind}.pkl", "wb") as f:
            pickle.dump(val, f)
    assert get_info(0, str(tmp_path), "succ") == {1: [0]}
    info = load_graph_data(1, str(tmp_path), use_reads=True)
    assert info["reads"][0] == ["ACGT"]
    assert info["edges"][0] == {(0, 1): 0}


def test_oracle_debug_asserts():
    from gnnome_tpu.data.oracle import assert_overlap, assert_strand, interval_union

    rs = np.array([1, -1, 1, -1])
    start = np.array([0, 0, 50, 50])
    end = np.array([100, 100, 150, 150])
    msgs = []
    assert assert_strand(rs, [0, 2], log_fn=msgs.append)
    assert not assert_strand(rs, [0, 1], log_fn=msgs.append)
    assert assert_overlap(start, end, rs, [0, 2], log_fn=msgs.append)
    assert not assert_overlap(np.array([0, 0, 200, 0]), end, rs, [0, 2],
                              log_fn=msgs.append)
    # merged positive-strand coverage intervals (algorithms.py:42-57)
    assert interval_union(rs, start, end) == [[0, 150]]


def test_degrees_and_device_pe(rng):
    import jax.numpy as jnp2

    from gnnome_tpu.core.graph import build_graph, degrees
    from gnnome_tpu.data.pe import pagerank_pe_jnp, pagerank_pe_np

    n = 30
    src = rng.integers(0, n, 150).astype(np.int32)
    dst = rng.integers(0, n, 150).astype(np.int32)
    g = build_graph(src, dst, n)
    in_d, out_d = degrees(g)
    np.testing.assert_array_equal(
        np.asarray(in_d)[:n], np.bincount(dst, minlength=n).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(out_d)[:n], np.bincount(src, minlength=n).astype(np.float32))

    # on-device PageRank PE matches the numpy spec
    pe_np = pagerank_pe_np(src, dst, n, 4)
    # build canonical-order inputs for the jnp version
    src_c = np.asarray(g.src)
    dst_c = np.asarray(g.dst)
    pe_dev = pagerank_pe_jnp(jnp2.asarray(src_c), jnp2.asarray(dst_c),
                             g.edge_mask, g.n_nodes_padded, 4, n)
    np.testing.assert_allclose(np.asarray(pe_dev)[:n], pe_np, rtol=1e-5, atol=1e-6)


def test_native_builder_deterministic(tmp_path):
    """Byte-identical CSV across repeated multithreaded runs (the dynamic
    OMP schedule must not leak into edge order / transitive-reduction
    tie-breaks)."""
    from gnnome_tpu.data import native_bridge

    if not native_bridge.available():
        pytest.skip("native library not built")
    from gnnome_tpu.data.simulate import simulate_reads, write_fasta

    rng = np.random.default_rng(21)
    g = rng.choice(list("ACGT"), size=40_000)
    g[30_000:34_000] = g[5_000:9_000]  # planted repeat: branchy graph
    records = simulate_reads("".join(g), coverage=12.0,
                             lengths=np.full(150, 1_800, dtype=np.int64), seed=4)
    reads = str(tmp_path / "r.fasta")
    write_fasta(reads, records)

    outs = []
    for i in range(3):
        csv = str(tmp_path / f"g{i}_graph_1.csv")
        native_bridge.build_overlap_graph(reads, csv, threads=4,
                                          identity=0.99, k=15, w=5,
                                          min_overlap=300)
        with open(csv, "rb") as f:
            outs.append(f.read())
    assert outs[0] == outs[1] == outs[2]


def test_repeat_phantom_paths_dont_delete_true_edges():
    """Interspersed-repeat regression: two loci sharing a sub-read-length
    repeat interior must NOT produce cross-locus overlaps, and transitive
    reduction must keep every true consecutive edge.

    Without overlap-span verification, repeat-interior minimizer votes
    create cross-locus edges anchored to the same repeat coordinates;
    the phantom A→other-locus→A paths they form have exactly-summing
    prefix lengths, so Myers reduction deletes the TRUE local edges and
    the oracle walk teleports (observed at 10 Mb: every missing true edge
    was explained only by paths through the repeat's other copy).
    """
    from gnnome_tpu.data.builder import find_overlaps, transitive_reduction

    rng = np.random.default_rng(11)
    genome = rng.integers(0, 4, size=60_000, dtype=np.int8)
    # one 3 kb repeat planted at 10k and 40k (reads are 6 kb: sub-read)
    genome[40_000:43_000] = genome[10_000:13_000]
    gseq = "".join("ACGT"[c] for c in genome)

    # forward-only tiling reads: 6 kb every 1.5 kb → 4x, always-true chain
    starts = list(range(0, 54_000, 1_500))
    reads = [gseq[s : s + 6_000] for s in starts]

    overlaps, contained = find_overlaps(
        reads, k=15, w=5, min_overlap=500, max_gap=500
    )
    assert not any(contained), "no read is genuinely contained in this tiling"
    # cross-locus edges may exist ONLY as genuine repeat-boundary overlaps
    # (one read's suffix entering the repeat = the other's prefix leaving
    # it — real sequence identity, the tangles the GNN untangles). What
    # must NOT exist: claimed overlaps extending beyond the 3 kb repeat,
    # supported only by its interior.
    saw_cross = False
    for o in overlaps:
        i, j = o.u // 2, o.v // 2
        if abs(starts[i] - starts[j]) < 6_000:
            continue  # same-locus: genuine
        saw_cross = True
        assert o.overlap_len <= 3_000 + 2 * 500, (
            f"phantom overlap {i}({starts[i]})→{j}({starts[j]}) claims "
            f"{o.overlap_len} bp, beyond the 3 kb repeat"
        )
    assert saw_cross, "expected genuine repeat-boundary tangle edges"
    reduced = transitive_reduction(overlaps, 2 * len(reads))
    kept = {(o.u, o.v) for o in reduced}
    for i in range(len(reads) - 1):
        assert (2 * i, 2 * (i + 1)) in kept, (
            f"true consecutive edge {i}→{i + 1} deleted by reduction"
        )


def test_reduction_preserves_mirror_symmetry(tmp_path):
    """Every emitted edge u→v must have its strand mirror v^1→u^1 (the
    invariant the oracle's ``edges[(dst^1, src^1)]`` lookup and the
    decoder's mate-masking rely on, ``algorithms.py:139``). Myers
    reduction orders mid candidates by prefix length — start-order on one
    strand, END-order on the mirror — so with variable-length reads an
    unsymmetrized reduction drops one member of a pair (observed at
    flagship scale as an oracle KeyError). Both builders must symmetrize."""
    from gnnome_tpu.data import native_bridge
    from gnnome_tpu.data.builder import (find_overlaps, parse_fasta,
                                         transitive_reduction)
    from gnnome_tpu.data.simulate import simulate_reads, write_fasta

    rng = np.random.default_rng(7)
    g = rng.choice(list("ACGT"), size=50_000)
    g[35_000:38_000] = g[8_000:11_000]  # planted repeat
    # variable read lengths: the trigger for start-order != end-order
    lens = rng.integers(1_200, 3_000, size=260).astype(np.int64)
    records = simulate_reads("".join(g), coverage=14.0, lengths=lens, seed=9)

    reads = [s for _, s in records]
    overlaps, contained = find_overlaps(reads, k=15, w=5, min_overlap=300)
    overlaps = [o for o in overlaps
                if not (contained[o.u // 2] or contained[o.v // 2])]
    reduced = transitive_reduction(overlaps, 2 * len(reads))
    kept = {(o.u, o.v) for o in reduced}
    for u, v in kept:
        assert (v ^ 1, u ^ 1) in kept, f"mirror of {u}->{v} missing (python)"

    if native_bridge.available():
        fasta = str(tmp_path / "r.fasta")
        write_fasta(fasta, records)
        csv = str(tmp_path / "n_graph_1.csv")
        native_bridge.build_overlap_graph(fasta, csv, threads=4,
                                          identity=0.99, k=15, w=5,
                                          min_overlap=300)
        edges = set()
        with open(csv) as f:
            for line in f:
                a, b, typ, payload = line.rsplit(",", 3)
                if typ != "1":
                    continue
                u = int(a.split()[0])
                v = int(b.split()[0])
                edges.add((u, v))
        assert edges, "native builder emitted no edges"
        for u, v in edges:
            assert (v ^ 1, u ^ 1) in edges, f"mirror of {u}->{v} missing (native)"
