#!/usr/bin/env python
"""Decode-engine timing at hard-benchmark scale: sequential (reference
restatement) vs batched (host, optimized layout) vs tpu (device lockstep
walks, decode/tpu_walker.py) on a scored test graph.

Usage:
  python scripts/bench_decode.py --root runs/hardfull/test \
      --model pretrained/model_hardfull.npz [--tpu] [--engines seq bat tpu]
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", required=True)
    parser.add_argument("--model", required=True)
    parser.add_argument("--idx", type=int, default=0)
    parser.add_argument("--tpu", action="store_true",
                        help="score + walk on the TPU (default: CPU jax)")
    parser.add_argument("--engines", nargs="+",
                        default=["sequential", "batched", "tpu"])
    parser.add_argument("--repeats", type=int, default=2)
    args = parser.parse_args()

    if not args.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from gnnome_tpu.config import Config, TrainConfig
    from gnnome_tpu.core.graph import extract_edge_values
    from gnnome_tpu.data.dataset import AssemblyGraphDataset
    from gnnome_tpu.decode import greedy
    from gnnome_tpu.decode.inference import load_model, score_graph

    cfg = Config(train=TrainConfig(
        backend="pallas" if args.tpu else None,
        compute_dtype="bfloat16" if args.tpu else "float32",
        remat="unroll_group" if args.tpu else "layer",
    ))
    ds = AssemblyGraphDataset(args.root, nb_pos_enc=cfg.model.nb_pos_enc)
    sample = dict((i, s) for i, s in ds)[args.idx]
    g = sample.graph

    params = load_model(args.model, cfg)
    t0 = time.time()
    logits = score_graph(params, g, sample.e_feat, sample.pe,
                         batch_norm=cfg.model.batch_norm,
                         backend=cfg.train.backend)
    scores = extract_edge_values(g, logits).astype(np.float64)
    print(f"scored {g.n_edges} edges in {time.time()-t0:.2f}s "
          f"({g.n_nodes} nodes)")

    info = os.path.join(args.root, "info")
    with open(os.path.join(info, f"{args.idx}_succ.pkl"), "rb") as f:
        succs = pickle.load(f)
    with open(os.path.join(info, f"{args.idx}_pred.pkl"), "rb") as f:
        preds = pickle.load(f)
    with open(os.path.join(info, f"{args.idx}_edges.pkl"), "rb") as f:
        edges = pickle.load(f)

    ref_walks = None
    for engine in args.engines:
        times = []
        for _ in range(args.repeats):
            t0 = time.time()
            walks = greedy.get_contigs(
                sample.src, sample.dst, scores.astype(np.float32), succs,
                preds, edges, sample.prefix_length, sample.read_length,
                nb_paths=cfg.decode.num_decoding_paths,
                len_threshold=cfg.decode.len_threshold,
                seed=cfg.train.seed, engine=engine,
            )
            times.append(time.time() - t0)
        if ref_walks is None:
            ref_walks = walks
        match = "walks identical" if walks == ref_walks else "WALK MISMATCH"
        print(f"{engine:10s}: {min(times):7.2f}s best of {args.repeats} "
              f"({len(walks)} walks; {match})")


if __name__ == "__main__":
    main()
