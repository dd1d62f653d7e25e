"""Noisy-read front end: identity gate + pile trimming, end-to-end.

The reference assembles real PacBio HiFi reads (~0.1-1% error) through
Raven (``graph_dataset.py:118-122``, ``--identity 0.99``); these tests
exercise the equivalent capability: reads with injected sequencing errors
must still produce an assemblable overlap graph, and the assembly metrics
must stay within a stated margin of the error-free run on the same genome.
"""
import os
import pickle

import numpy as np
import pytest

from gnnome_tpu.data.dataset import AssemblyGraphDataset
from gnnome_tpu.data.simulate import inject_errors, simulate_reads, write_fasta
from gnnome_tpu.decode import greedy
from gnnome_tpu.evaluation import assembly as asm

ERROR_RATE = 0.005  # 0.5% per-base, HiFi-error-profile mix


def _genome(rng, n=25_000, repeat=2_000):
    g = "".join(rng.choice(list("ACGT"), size=n))
    # planted repeat: without one every edge is positive and labels degenerate
    return g[: n // 3] + g[1000 : 1000 + repeat] + g[n // 3 :]


def _build(root, genome, error_rate, noisy, seed=5, identity=0.95):
    records = simulate_reads(
        genome, coverage=16.0, lengths=np.full(400, 1_800, dtype=np.int64),
        seed=seed, error_rate=error_rate,
    )
    os.makedirs(os.path.join(root, "raw"), exist_ok=True)
    write_fasta(os.path.join(root, "raw", "0.fasta"), records)
    specs = {"threads": 4, "filter": identity, "noisy": noisy}
    return AssemblyGraphDataset(root, nb_pos_enc=8, specs=specs)


def _oracle_assembly_total(root, ds):
    """Genome bases reconstructed by oracle-scored greedy decode."""
    idx, sample = ds[0]

    def info(kind):
        with open(os.path.join(root, "info", f"0_{kind}.pkl"), "rb") as f:
            return pickle.load(f)

    y = np.asarray(sample.y)[: sample.graph.n_edges]
    scores = np.where(y == 1, 8.0, -8.0)
    walks = greedy.get_contigs(
        sample.src, sample.dst, scores, info("succ"), info("pred"),
        info("edges"), sample.prefix_length, sample.read_length,
        nb_paths=20, len_threshold=10, seed=0,
    )
    contigs = asm.walk_to_sequence(
        walks, info("reads"), sample.prefix_length, info("edges"))
    return sum(len(seq) for _, seq in contigs), sample


def test_inject_errors_rate_and_content():
    rng = np.random.default_rng(0)
    seq = "".join(rng.choice(list("ACGT"), size=50_000))
    out = inject_errors(seq, 0.01, rng)
    assert set(out) <= set("ACGT")
    # ~1% errors; length shifts only from the 5%/5% indel mix
    assert abs(len(out) - len(seq)) < 0.005 * len(seq)
    diffs = sum(a != b for a, b in zip(seq, out))
    assert 0.004 * len(seq) < diffs  # substitutions landed


def test_noisy_graph_assembles_within_margin(tmp_path):
    """0.5%-error reads through the noisy front end reconstruct the genome
    within margin of the error-free run (VERDICT #4's done-criterion)."""
    rng = np.random.default_rng(11)
    genome = _genome(rng)

    clean_root = str(tmp_path / "clean")
    ds_clean = _build(clean_root, genome, 0.0, noisy=False)
    total_clean, sample_clean = _oracle_assembly_total(clean_root, ds_clean)

    noisy_root = str(tmp_path / "noisy")
    ds_noisy = _build(noisy_root, genome, ERROR_RATE, noisy=True)
    total_noisy, sample_noisy = _oracle_assembly_total(noisy_root, ds_noisy)

    assert total_clean >= 0.9 * len(genome)
    # stated margin: noisy assembly reconstructs >= 85% of what the
    # error-free run does (error-displaced minimizers thin the overlap set)
    assert total_noisy >= 0.85 * total_clean, (total_noisy, total_clean)

    # graph stays comparable in size (no edge blow-up or collapse)
    e_clean, e_noisy = sample_clean.graph.n_edges, sample_noisy.graph.n_edges
    assert 0.5 * e_clean <= e_noisy <= 2.0 * e_clean, (e_clean, e_noisy)

    # labels stay non-degenerate (the planted repeat survives the gate)
    y = np.asarray(sample_noisy.y)[: sample_noisy.graph.n_edges]
    assert 0 < y.sum() < len(y)

    # similarity column now carries the identity estimate: ~1 - 2*error
    sim = np.asarray(sample_noisy.overlap_similarity)
    assert 0.95 <= float(np.median(sim)) <= 1.0


def test_identity_gate_bites_on_noisy_reads(tmp_path):
    """A strict identity threshold must reject noisy overlaps that a
    permissive one accepts — the gate actually consumes ``identity``."""
    from gnnome_tpu.data.builder import build_overlap_graph, parse_fasta

    rng = np.random.default_rng(3)
    genome = "".join(rng.choice(list("ACGT"), size=15_000))
    records = simulate_reads(
        genome, coverage=12.0, lengths=np.full(200, 1_500, np.int64),
        seed=2, error_rate=0.01,
    )
    fasta = str(tmp_path / "r.fasta")
    write_fasta(fasta, records)

    def n_edges(identity):
        csv = str(tmp_path / f"g_{identity}_graph_1.csv")
        build_overlap_graph(fasta, csv, threads=4, identity=identity,
                            k=15, w=5, min_overlap=300, noisy=True)
        with open(csv) as f:
            return sum(1 for line in f if line.split(",")[2] == "1")

    permissive = n_edges(0.90)
    strict = n_edges(0.999)  # ~2% pairwise divergence cannot pass 99.9%
    assert permissive > 0
    assert strict < 0.2 * permissive, (strict, permissive)


def test_native_matches_python_noisy(tmp_path):
    """Native and Python-spec noisy front ends agree on the edge set
    (identity gate + pile trims included)."""
    from gnnome_tpu.data import native_bridge

    if not native_bridge.available():
        pytest.skip("native library not built")
    from gnnome_tpu.data.builder import build_overlap_graph
    from gnnome_tpu.data.parser import parse_csv

    rng = np.random.default_rng(13)
    genome = "".join(rng.choice(list("ACGT"), size=20_000))
    records = simulate_reads(
        genome, coverage=10.0, lengths=np.full(100, 1_500, np.int64),
        seed=2, error_rate=ERROR_RATE,
    )
    reads = str(tmp_path / "r.fasta")
    write_fasta(reads, records)

    csv_nat = str(tmp_path / "nat_graph_1.csv")
    build_overlap_graph(reads, csv_nat, k=15, w=5, min_overlap=300,
                        identity=0.95, noisy=True)
    os.environ["GNNOME_FORCE_PYTHON"] = "1"
    try:
        csv_py = str(tmp_path / "pyy_graph_1.csv")
        build_overlap_graph(reads, csv_py, k=15, w=5, min_overlap=300,
                            identity=0.95, noisy=True)
    finally:
        del os.environ["GNNOME_FORCE_PYTHON"]

    p_nat = parse_csv(csv_nat, reads)
    p_py = parse_csv(csv_py, reads)
    assert p_nat.n_nodes == p_py.n_nodes
    assert p_nat.n_edges == p_py.n_edges
    e_nat = set(zip(p_nat.src.tolist(), p_nat.dst.tolist()))
    e_py = set(zip(p_py.src.tolist(), p_py.dst.tolist()))
    assert e_nat == e_py
    np.testing.assert_array_equal(
        np.sort(p_nat.read_trim_start), np.sort(p_py.read_trim_start))


def test_trim_payload_roundtrip(tmp_path):
    """Trimmed node rows carry "t0 t1" payloads the parser applies; GFA
    sequences are the trimmed ones (graph_parser.py:123,241-250)."""
    from gnnome_tpu.data.builder import emit_graph, find_overlaps
    from gnnome_tpu.data.parser import parse_csv

    rng = np.random.default_rng(7)
    genome = "".join(rng.choice(list("ACGT"), size=12_000))
    records = simulate_reads(
        genome, coverage=14.0, lengths=np.full(150, 1_200, np.int64), seed=4)
    # graft junk tails onto two reads: pile trimming must cut them
    headers = [h for h, _ in records]
    reads = [s for _, s in records]
    junk = "".join(rng.choice(list("ACGT"), size=400))
    reads[0] = reads[0] + junk
    reads[1] = junk + reads[1]
    fasta = str(tmp_path / "r.fasta")
    write_fasta(fasta, list(zip(headers, reads)))

    overlaps, contained, trims = find_overlaps(
        reads, k=15, w=5, min_overlap=300, identity=0.9, trim_min_cov=3,
        return_trims=True,
    )
    trimmed = [
        r for r, t in enumerate(trims)
        if t is not None and (t[0] > 0 or t[1] < len(reads[r]))
    ]
    assert trimmed, "no read was trimmed"

    csv = str(tmp_path / "t_graph_1.csv")
    emit_graph(headers, reads, overlaps, contained, csv, trims=trims)
    # the CSV carries at least one real "t0 t1" node payload
    with open(csv) as f:
        node_payloads = [
            line.rsplit(",", 1)[1].strip()
            for line in f if line.split(",")[2] == "0"
        ]
    assert any(p != "-" for p in node_payloads), node_payloads

    parsed = parse_csv(csv, fasta)
    # parser must see trimmed node lengths == trimmed GFA sequence lengths
    for node in range(parsed.n_nodes):
        assert len(parsed.reads[node]) == int(parsed.read_length[node])
