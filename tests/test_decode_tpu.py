"""The device-side lockstep decode engine (decode/tpu_walker.py) produces
the same walks as the host engines — same seeds, same tie-breaks, same
min_prob floor. Scores are cast to f32 before ALL engines since the
device adjacency tables are f32 (greedy/batched compare at f64)."""
import os
import pickle

import numpy as np
import pytest

from gnnome_tpu.data.dataset import AssemblyGraphDataset
from gnnome_tpu.data.simulate import simulate_reads, write_fasta
from gnnome_tpu.decode import greedy


@pytest.fixture(scope="module")
def ds_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("decode_tpu_ds")
    rng = np.random.default_rng(13)
    genome = "".join(rng.choice(list("ACGT"), size=22_000))
    records = simulate_reads(
        genome, coverage=13.0, lengths=np.full(380, 1_700, dtype=np.int64),
        seed=6,
    )
    os.makedirs(root / "raw", exist_ok=True)
    write_fasta(str(root / "raw" / "0.fasta"), records)
    ds = AssemblyGraphDataset(str(root), nb_pos_enc=8)
    return str(root), ds


def load_info(root, idx, kind):
    with open(os.path.join(root, "info", f"{idx}_{kind}.pkl"), "rb") as f:
        return pickle.load(f)


@pytest.mark.parametrize("min_prob", [0.0, 0.4])
def test_tpu_engine_equals_batched(ds_root, min_prob):
    root, ds = ds_root
    idx, sample = ds[0]
    succs = load_info(root, 0, "succ")
    preds = load_info(root, 0, "pred")
    edges = load_info(root, 0, "edges")

    rng = np.random.default_rng(4)
    y = np.asarray(sample.y)[: sample.graph.n_edges]
    scores = (np.where(y == 1, 2.5, -2.5)
              + rng.standard_normal(len(y)) * 2.0).astype(np.float32)

    kwargs = dict(nb_paths=10, len_threshold=5, min_prob=min_prob)
    for trial_seed in (7, 11):
        w_host = greedy.get_contigs(
            sample.src, sample.dst, scores, succs, preds, edges,
            sample.prefix_length, sample.read_length,
            engine="batched", seed=trial_seed, **kwargs,
        )
        w_tpu = greedy.get_contigs(
            sample.src, sample.dst, scores, succs, preds, edges,
            sample.prefix_length, sample.read_length,
            engine="tpu", seed=trial_seed, **kwargs,
        )
        assert w_host == w_tpu
