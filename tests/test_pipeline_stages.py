"""Pipeline orchestration stage tests: structure setup, split, idempotency."""
import os
import pickle

import numpy as np
import pytest

from gnnome_tpu import pipeline
from gnnome_tpu.config import Config
from gnnome_tpu.data.simulate import write_fasta


def test_merge_dicts():
    out = pipeline.merge_dicts({"chr19": 3}, {"chr19": 1, "chr21": 2}, {"chr21": 1})
    assert out == {"chr19": 4, "chr21": 3}


def test_file_structure_setup(tmp_path):
    data, refs = str(tmp_path / "data"), str(tmp_path / "refs")
    pipeline.file_structure_setup(data, refs)
    assert os.path.isdir(os.path.join(data, "simulated", "chr19", "raw"))
    assert os.path.isdir(os.path.join(data, "real", "chrX", "info"))
    assert os.path.isdir(os.path.join(refs, "chromosomes"))
    # idempotent
    pipeline.file_structure_setup(data, refs)


def test_simulate_stage_idempotent(tmp_path):
    data, refs = str(tmp_path / "data"), str(tmp_path / "refs")
    pipeline.file_structure_setup(data, refs)
    rng = np.random.default_rng(0)
    genome = "".join(rng.choice(list("ACGT"), size=8_000))
    chr_dir = os.path.join(refs, "chromosomes")
    write_fasta(os.path.join(chr_dir, "chr21.fasta"), [("chr21", genome)])

    cfg = Config()
    cfg.data.coverage = 3.0
    pipeline.simulate_reads(data, refs, {"chr21": 2}, cfg)
    raw = os.path.join(data, "simulated", "chr21", "raw")
    assert sorted(os.listdir(raw)) == ["0.fasta", "1.fasta"]
    mtimes = {f: os.path.getmtime(os.path.join(raw, f)) for f in os.listdir(raw)}
    # second run: nothing to do (resume-by-counting, pipeline.py:153-157)
    pipeline.simulate_reads(data, refs, {"chr21": 2}, cfg)
    assert {f: os.path.getmtime(os.path.join(raw, f)) for f in os.listdir(raw)} == mtimes
    # asking for one more only simulates the delta
    pipeline.simulate_reads(data, refs, {"chr21": 3}, cfg)
    assert sorted(os.listdir(raw)) == ["0.fasta", "1.fasta", "2.fasta"]


def test_train_valid_split(tmp_path):
    data = str(tmp_path / "data")
    sim = os.path.join(data, "simulated", "chr19")
    for sub in ("processed", "info"):
        os.makedirs(os.path.join(sim, sub))
    # fake processed graphs 0..3 + info pickles
    for i in range(4):
        open(os.path.join(sim, "processed", f"{i}.npz"), "w").write("x")
        for kind in ("succ", "pred", "edges", "reads"):
            with open(os.path.join(sim, "info", f"{i}_{kind}.pkl"), "wb") as f:
                pickle.dump({}, f)
    os.makedirs(os.path.join(data, "experiments"))

    train_p, valid_p, test_p = pipeline.train_valid_split(
        data, {"chr19": 2}, {"chr19": 1}, {"chr19": 1}, out="t"
    )
    # train gets graphs 0,1; valid gets 2; test gets 3 (pipeline.py:284,314)
    assert sorted(os.listdir(os.path.join(train_p, "processed"))) == ["0.npz", "1.npz"]
    assert sorted(os.listdir(os.path.join(valid_p, "processed"))) == ["0.npz"]
    assert sorted(os.listdir(os.path.join(test_p, "processed"))) == ["0.npz"]
    with open(os.path.join(train_p, "info", "g_to_chr.pkl"), "rb") as f:
        assert pickle.load(f) == {0: "chr19", 1: "chr19"}
    with open(os.path.join(valid_p, "info", "g_to_org_g.pkl"), "rb") as f:
        assert pickle.load(f) == {0: 2}
