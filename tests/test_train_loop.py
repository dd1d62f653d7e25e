"""Training-loop integration tests: full-graph regime, cluster-minibatch
regime, checkpoint/resume, plateau scheduler."""
import os

import numpy as np
import pytest

from gnnome_tpu.config import Config, ModelConfig, TrainConfig
from gnnome_tpu.data.dataset import AssemblyGraphDataset
from gnnome_tpu.data.simulate import simulate_reads, write_fasta
from gnnome_tpu.train.loop import ReduceLROnPlateau, train


@pytest.fixture(scope="module")
def train_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_ds")
    rng = np.random.default_rng(21)
    base = "".join(rng.choice(list("ACGT"), size=30_000))
    genome = base[:12_000] + base[4_000:8_000] + base[12_000:]  # repeat
    records = simulate_reads(
        genome, coverage=12.0, lengths=np.full(300, 1_800, dtype=np.int64), seed=9
    )
    os.makedirs(root / "raw", exist_ok=True)
    write_fasta(str(root / "raw" / "0.fasta"), records)
    AssemblyGraphDataset(str(root), nb_pos_enc=8)  # build cache once
    return str(root)


def small_cfg(tmp_path, **train_kw):
    return Config(
        model=ModelConfig(num_gnn_layers=2, hidden_features=32,
                          hidden_edge_features=8, hidden_edge_scores=16,
                          nb_pos_enc=8),
        train=TrainConfig(
            num_epochs=2, checkpoint_dir=str(tmp_path / "ckpt"),
            pretrained_dir=str(tmp_path / "pre"), **train_kw,
        ),
    )


def test_full_graph_regime(train_root, tmp_path):
    cfg = small_cfg(tmp_path, batch_size_train=1)
    out = train(train_root, None, out="fg", overfit=True, cfg=cfg)
    assert len(out["loss_train"]) == 2
    assert os.path.exists(out["checkpoint"])
    assert os.path.exists(out["best_model"])
    # metrics JSONL written
    assert os.path.exists(os.path.join(str(tmp_path / "ckpt"), "runs", "fg.metrics.jsonl"))


def test_cluster_minibatch_regime(train_root, tmp_path):
    cfg = small_cfg(tmp_path, batch_size_train=2, num_parts_train=6)
    out = train(train_root, None, out="cl", overfit=True, cfg=cfg)
    assert len(out["loss_train"]) == 2
    assert np.isfinite(out["loss_train"]).all()


def test_resume_continues(train_root, tmp_path):
    cfg = small_cfg(tmp_path, batch_size_train=1)
    out1 = train(train_root, None, out="res", overfit=True, cfg=cfg)
    cfg.train.num_epochs = 4
    out2 = train(train_root, None, out="res", overfit=True, cfg=cfg)
    assert len(out2["loss_train"]) == 4
    assert out2["loss_train"][:2] == pytest.approx(out1["loss_train"], abs=1e-9)


def test_path_like_out_stays_in_pretrained_dir(train_root, tmp_path):
    """A path-like run name must not nest artifacts outside the configured
    dirs (regression: ``pretrained/model_/tmp/<...>`` trees)."""
    cfg = small_cfg(tmp_path, batch_size_train=1)
    out = train(train_root, None, out="/tmp/verify_run/train_out",
                overfit=True, cfg=cfg)
    assert os.path.dirname(out["best_model"]) == str(tmp_path / "pre")
    assert os.path.dirname(out["checkpoint"]) == str(tmp_path / "ckpt")
    assert os.path.basename(out["best_model"]) == "model_train_out.npz"
    assert os.path.exists(out["best_model"])


def test_plateau_scheduler():
    s = ReduceLROnPlateau(factor=0.5, patience=1)
    lr = 1.0
    lr = s.step(1.0, lr)  # best=1.0
    assert lr == 1.0
    lr = s.step(1.1, lr)  # bad 1
    assert lr == 1.0
    lr = s.step(1.2, lr)  # bad 2 > patience -> decay
    assert lr == 0.5
    lr = s.step(0.5, lr)  # improvement resets
    assert lr == 0.5
