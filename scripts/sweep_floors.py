#!/usr/bin/env python
"""Sweep confidence floors for ALL THREE decoders on one scored graph —
the fair-comparison protocol for the hard benchmark (VERDICT r4 #1).

The GNN decoder sweeps ``min_prob`` (sigmoid floor on its logit scores);
the two non-learned controls (raw overlap_length / overlap_similarity,
``/root/reference/inference.py:280-401``) sweep a QUANTILE floor on their
raw feature (their scores are not logits — sigmoid saturates at
overlap-length scale — so the equivalent floor is the q-th feature
quantile over the graph's real edges, passed as a raw-score floor).
Every (decoder, threshold) point gets the coordinate (Quast-role)
metrics. Results go to a JSON for threshold SELECTION on the validation
graph; the test graph is then reported once at the selected thresholds.

Usage:
  python scripts/sweep_floors.py --root runs/hardfull40/valid \
      --model pretrained/model_hardfull20.npz --ref-length 61707364 \
      --out runs/floors_valid.json
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GNN_GRID = (0.0, 0.05, 0.1, 0.2, 0.3, 0.5, 0.7)
QUANT_GRID = (0.0, 0.02, 0.05, 0.1, 0.2, 0.3, 0.5)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", required=True)
    parser.add_argument("--model", required=True)
    parser.add_argument("--idx", type=int, default=0)
    parser.add_argument("--ref-length", type=int, default=0)
    parser.add_argument("--out", default=None)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu or jax.default_backend() != "tpu":
        jax.config.update("jax_platforms", "cpu")

    from gnnome_tpu.config import Config
    from gnnome_tpu.core.graph import extract_edge_values
    from gnnome_tpu.data.dataset import AssemblyGraphDataset
    from gnnome_tpu.decode import greedy
    from gnnome_tpu.decode.inference import load_model, score_graph
    from gnnome_tpu.evaluation import assembly as asm
    from gnnome_tpu.evaluation.metrics import (classification_metrics,
                                               confusion_counts)

    cfg = Config()
    ds = AssemblyGraphDataset(args.root, nb_pos_enc=cfg.model.nb_pos_enc)
    sample = dict((i, s) for i, s in ds)[args.idx]
    g = sample.graph

    params = load_model(args.model, cfg)
    t0 = time.time()
    logits = score_graph(params, g, sample.e_feat, sample.pe,
                         batch_norm=cfg.model.batch_norm,
                         backend=cfg.train.backend)
    scores = extract_edge_values(g, logits).astype(np.float64)
    labels = np.asarray(sample.y)[: g.n_edges]
    m = {k: float(v) for k, v in classification_metrics(
        confusion_counts(logits[: g.n_edges], labels)).items()}
    print(f"scored {g.n_edges} edges in {time.time() - t0:.1f}s  "
          f"f1={m['f1']:.4f} acc={m['accuracy']:.4f}", flush=True)

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
    not_self = sample.src != sample.dst

    def decode(metric, min_prob=0.0, min_score=None):
        walks = greedy.get_contigs(
            sample.src, sample.dst, metric, succs, preds, edges,
            sample.prefix_length, sample.read_length,
            nb_paths=cfg.decode.num_decoding_paths,
            len_threshold=cfg.decode.len_threshold,
            seed=cfg.train.seed, min_prob=min_prob, min_score=min_score,
        )
        cm = asm.coordinate_evaluation(
            walks, strand, start, end, ref_length=args.ref_length)
        cm["n_contigs"] = len(walks)
        return cm

    results = {"edge_f1": m["f1"], "root": args.root, "model": args.model}
    rows = []
    print(f"{'decoder':>8} {'floor':>6} {'contigs':>7} {'misasm':>6} "
          f"{'NGA50':>12} {'genome_frac':>11} {'longest_ok':>12}", flush=True)

    def report(decoder, floor, cm):
        rows.append(dict(decoder=decoder, floor=floor, **cm))
        print(f"{decoder:>8} {floor:6.2f} {cm['n_contigs']:7d} "
              f"{cm['n_misassemblies']:6d} {cm['nga50']:12,} "
              f"{cm['genome_fraction']:11.4f} {cm['longest_correct']:12,}",
              flush=True)

    for t in GNN_GRID:
        report("gnn", t, decode(scores, min_prob=t))
    for feat_name, feat in (
        ("ol_len", sample.overlap_length.astype(np.float64)),
        ("ol_sim", sample.overlap_similarity.astype(np.float64)),
    ):
        for q in QUANT_GRID:
            ms = float(np.quantile(feat[not_self], q)) if q > 0 else None
            report(feat_name, q, decode(feat, min_score=ms))

    results["rows"] = rows
    out = args.out or os.path.join(args.root, "floor_sweep.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
