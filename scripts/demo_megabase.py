#!/usr/bin/env python
"""Megabase-scale end-to-end demo: genome → reads → graph → train → contigs.

Reproduces the round-1 validation run (PERFORMANCE.md): a 20.3 Mb synthetic
genome with a planted 300 kb segmental duplication, 30× simulated HiFi
coverage, the native overlap-graph builder, oracle labeling, GNN training,
and greedy decoding. Expected outcome: ~2 contigs covering ≥95% of the
genome, N50 in the tens of megabases.

Usage:
  python scripts/demo_megabase.py --root /tmp/demo20m [--size 20000000]
                                  [--coverage 30] [--epochs 20] [--tpu]
"""
from __future__ import annotations

import argparse
import os
import pickle
import shutil
import sys
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default="/tmp/demo_megabase")
    parser.add_argument("--size", type=int, default=20_000_000)
    parser.add_argument("--coverage", type=float, default=30.0)
    parser.add_argument("--epochs", type=int, default=20)
    parser.add_argument("--layers", type=int, default=8)
    parser.add_argument("--tpu", action="store_true",
                        help="train on TPU (pallas backend, bf16)")
    args = parser.parse_args()

    if not args.tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import numpy as np

    from gnnome_tpu.config import Config, DecodeConfig, ModelConfig, TrainConfig
    from gnnome_tpu.data.builder import build_overlap_graph
    from gnnome_tpu.data.dataset import AssemblyGraphDataset, process_raw_graph
    from gnnome_tpu.data.simulate import simulate_to_file, write_fasta
    from gnnome_tpu.evaluation import assembly as asm
    from gnnome_tpu.pipeline import predict
    from gnnome_tpu.train.loop import train

    root = args.root
    shutil.rmtree(root, ignore_errors=True)
    for sub in ("raw", "builder_output"):
        os.makedirs(os.path.join(root, sub))

    print("[1/5] synthesizing genome with a segmental duplication...", flush=True)
    rng = np.random.default_rng(5)
    base = "".join(np.array(list("ACGT"))[
        rng.integers(0, 4, size=args.size, dtype=np.int8)].tolist())
    rep = args.size // 67  # ~300 kb at 20 Mb
    genome = base[: args.size // 2] + base[args.size // 10 : args.size // 10 + rep] \
        + base[args.size // 2 :]
    genome_path = os.path.join(root, "genome.fasta")
    write_fasta(genome_path, [("demo", genome)])

    print("[2/5] simulating reads (native)...", flush=True)
    t0 = time.time()
    n = simulate_to_file(genome_path, os.path.join(root, "raw", "0.fasta"),
                         coverage=args.coverage, seed=11)
    print(f"      {n} reads in {time.time()-t0:.1f}s", flush=True)

    print("[3/5] building overlap graph (native)...", flush=True)
    t0 = time.time()
    csv = os.path.join(root, "builder_output", "0_graph_1.csv")
    build_overlap_graph(os.path.join(root, "raw", "0.fasta"), csv,
                        threads=os.cpu_count() or 8, k=29, w=9, min_overlap=2000)
    print(f"      built in {time.time()-t0:.1f}s", flush=True)

    print("[4/5] parsing + oracle labeling + training...", flush=True)
    process_raw_graph(csv, os.path.join(root, "raw", "0.fasta"), root, 0)
    cfg = Config(
        model=ModelConfig(num_gnn_layers=args.layers, hidden_features=128),
        train=TrainConfig(
            num_epochs=args.epochs, batch_size_train=1,
            checkpoint_dir=os.path.join(root, "ckpt"),
            pretrained_dir=os.path.join(root, "pre"),
            backend="pallas" if args.tpu else None,
            compute_dtype="bfloat16" if args.tpu else "float32",
        ),
        decode=DecodeConfig(num_decoding_paths=30, len_threshold=10),
    )
    out = train(root, None, out="demo", overfit=True, cfg=cfg)
    print(f"      loss {out['loss_train'][0]:.4f} -> {out['loss_train'][-1]:.4f}",
          flush=True)

    print("[5/5] decoding + evaluating...", flush=True)
    with open(os.path.join(root, "info", "g_to_chr.pkl"), "wb") as f:
        pickle.dump({0: "demo"}, f)
    asm.CHR_LENS["demo"] = len(genome)
    results = predict(root, "demo", cfg=cfg)
    n_contigs, longest, frac, n50, ng50 = results[0]
    print(f"\nASSEMBLY: {n_contigs} contigs, longest {longest:,} bp, "
          f"{frac:.1%} of genome, N50 {n50:,}, NG50 {ng50:,}")


if __name__ == "__main__":
    main()
