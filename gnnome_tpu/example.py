"""Quick-start example: train on chr19 graphs, assemble chr21.

Reference: ``example.py:4-29`` (train 3× chr19, valid 1× chr19, test
1× chr21, then the full train→assemble flow). Requires the CHM13
chromosomes (``pipeline.download_reference``) or runs on a synthetic
mini-genome with ``--synthetic`` for an offline smoke-run.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from gnnome_tpu.config import Config, ModelConfig, SplitConfig, TrainConfig
from gnnome_tpu import pipeline


def example(data_path: str = "data", refs_path: str = "data/references") -> None:
    cfg = Config(split=SplitConfig(
        train={"chr19": 3}, valid={"chr19": 1}, test={"chr21": 1}
    ))
    pipeline.run_pipeline(data_path, refs_path, out="example", cfg=cfg)


def synthetic_example(root: str = "data/synthetic_example") -> None:
    """Offline variant: two synthetic mini-chromosomes stand in for
    chr19/chr21 so the whole flow runs with zero downloads."""
    from gnnome_tpu.data.simulate import write_fasta

    refs = os.path.join(root, "references", "chromosomes")
    os.makedirs(refs, exist_ok=True)
    rng = np.random.default_rng(0)
    for chr_n, size in (("chr19", 120_000), ("chr21", 90_000)):
        base = "".join(rng.choice(list("ACGT"), size=size))
        # plant a repeat so the graph has negative edges to learn
        genome = base[: size // 3] + base[size // 6 : size // 6 + 8000] + base[size // 3 :]
        write_fasta(os.path.join(refs, f"{chr_n}.fasta"), [(chr_n, genome)])

    cfg = Config(
        model=ModelConfig(num_gnn_layers=8, hidden_features=128),
        train=TrainConfig(
            num_epochs=15, batch_size_train=1,
            checkpoint_dir=os.path.join(root, "checkpoints"),
            pretrained_dir=os.path.join(root, "pretrained"),
        ),
        split=SplitConfig(train={"chr19": 2}, valid={"chr19": 1}, test={"chr21": 1}),
    )
    cfg.data.coverage = 12.0
    data = os.path.join(root, "data")
    ref_root = os.path.join(root, "references")
    pipeline.file_structure_setup(data, ref_root)
    pipeline.simulate_reads(
        data, ref_root,
        pipeline.merge_dicts(cfg.split.train, cfg.split.valid, cfg.split.test),
        cfg,
    )
    all_chr = pipeline.merge_dicts(cfg.split.train, cfg.split.valid, cfg.split.test)
    pipeline.generate_graphs(data, all_chr, cfg)
    train_path, valid_path, test_path = pipeline.train_valid_split(
        data, cfg.split.train, cfg.split.valid, cfg.split.test, "example"
    )
    pipeline.train_model(train_path, valid_path, "example", False, cfg)
    pipeline.predict(test_path, "example", cfg=cfg)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", default="data")
    parser.add_argument("--refs", default="data/references")
    parser.add_argument("--synthetic", action="store_true",
                        help="offline run on synthetic mini-chromosomes")
    args = parser.parse_args()
    if args.synthetic:
        synthetic_example()
    else:
        example(args.data, args.refs)
