#!/usr/bin/env python
"""Sweep the decoder confidence floor (DecodeConfig.min_prob) on a scored
test graph and report the misassembly / NGA50 / genome-fraction tradeoff.

Companion to scripts/postmortem.py: the post-mortem showed the hard
benchmark's misassembly breaks are mostly LOW-confidence extensions
(11/17 walked at prob<=0.5), so a floor on walk extension is the decoder
lever. This measures what each floor buys.

Usage:
  python scripts/sweep_minprob.py --root runs/hardpost/test \
      --model pretrained/model_hard15xchr19.npz \
      --thresholds 0 0.1 0.3 0.5 0.7
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", required=True)
    parser.add_argument("--model", required=True)
    parser.add_argument("--idx", type=int, default=0)
    parser.add_argument("--ref-length", type=int, default=0)
    parser.add_argument("--thresholds", type=float, nargs="+",
                        default=[0.0, 0.1, 0.3, 0.5, 0.7])
    parser.add_argument("--check-engines", action="store_true",
                        help="also run the sequential engine and assert "
                             "identical walks at each threshold")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from gnnome_tpu.config import Config
    from gnnome_tpu.core.graph import extract_edge_values
    from gnnome_tpu.data.dataset import AssemblyGraphDataset
    from gnnome_tpu.decode import greedy
    from gnnome_tpu.decode.inference import load_model, score_graph
    from gnnome_tpu.evaluation import assembly as asm

    cfg = Config()
    ds = AssemblyGraphDataset(args.root, nb_pos_enc=cfg.model.nb_pos_enc)
    sample = dict((i, s) for i, s in ds)[args.idx]
    g = sample.graph

    params = load_model(args.model, cfg)
    logits = score_graph(params, g, sample.e_feat, sample.pe,
                         batch_norm=cfg.model.batch_norm, backend=None)
    scores = extract_edge_values(g, logits).astype(np.float64)

    info = os.path.join(args.root, "info")
    with open(os.path.join(info, f"{args.idx}_succ.pkl"), "rb") as f:
        succs = pickle.load(f)
    with open(os.path.join(info, f"{args.idx}_pred.pkl"), "rb") as f:
        preds = pickle.load(f)
    with open(os.path.join(info, f"{args.idx}_edges.pkl"), "rb") as f:
        edges = pickle.load(f)

    strand = np.asarray(sample.read_strand)
    start = np.asarray(sample.read_start)
    end = np.asarray(sample.read_end)

    print(f"{'min_prob':>8} {'contigs':>7} {'misasm':>6} {'NGA50':>12} "
          f"{'genome_frac':>11} {'longest_ok':>12}")
    for t in args.thresholds:
        walks = greedy.get_contigs(
            sample.src, sample.dst, scores, succs, preds, edges,
            sample.prefix_length, sample.read_length,
            nb_paths=cfg.decode.num_decoding_paths,
            len_threshold=cfg.decode.len_threshold,
            seed=cfg.train.seed, min_prob=t,
        )
        if args.check_engines:
            walks_seq = greedy.get_contigs(
                sample.src, sample.dst, scores, succs, preds, edges,
                sample.prefix_length, sample.read_length,
                nb_paths=cfg.decode.num_decoding_paths,
                len_threshold=cfg.decode.len_threshold,
                seed=cfg.train.seed, min_prob=t, engine="sequential",
            )
            assert walks == walks_seq, f"engine mismatch at min_prob={t}"
        cm = asm.coordinate_evaluation(
            walks, strand, start, end, ref_length=args.ref_length)
        print(f"{t:8.2f} {len(walks):7d} {cm['n_misassemblies']:6d} "
              f"{cm['nga50']:12,} {cm['genome_fraction']:11.4f} "
              f"{cm['longest_correct']:12,}")


if __name__ == "__main__":
    main()
