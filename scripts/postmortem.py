#!/usr/bin/env python
"""Misassembly post-mortem: do decode breaks coincide with score errors?

For every coordinate-inconsistent edge in the decoded walks
(``evaluation.assembly.edge_coordinate_consistent`` — the Quast-role
misassembly definition), classify the break:

- ``score_error``: the walked edge is ground-truth FALSE but the model
  scored it positive (sigmoid > 0.5) — better training/calibration is the
  lever;
- ``decoder_forced``: the model scored the walked edge negative, yet the
  greedy walker took it (no better unvisited option, or seed placement) —
  the decoder is the lever;
- for each break, whether node ``a`` had a ground-truth-TRUE alternative
  successor and how its score compared.

Usage:
  python scripts/postmortem.py --root <test dir> --model pretrained/model_X.npz [--tpu]

Requires a prior predict run (``<root>/inference/0_walks.pkl``); rescoring
is done in-process so per-edge scores are available.
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
    parser.add_argument("--tpu", action="store_true")
    args = parser.parse_args()

    if not args.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from gnnome_tpu.config import Config, TrainConfig
    from gnnome_tpu.core.graph import extract_edge_values
    from gnnome_tpu.data.dataset import AssemblyGraphDataset
    from gnnome_tpu.decode.inference import load_model, score_graph
    from gnnome_tpu.evaluation.assembly import edge_coordinate_consistent

    cfg = Config(train=TrainConfig(
        backend="pallas" if args.tpu else None,
        compute_dtype="bfloat16" if args.tpu else "float32",
        remat="unroll_group" if args.tpu else "layer",
    ))
    ds = AssemblyGraphDataset(args.root, nb_pos_enc=cfg.model.nb_pos_enc)
    sample = dict((i, s) for i, s in ds)[args.idx]
    g = sample.graph

    params = load_model(args.model, cfg)
    logits = score_graph(params, g, sample.e_feat, sample.pe,
                         batch_norm=cfg.model.batch_norm,
                         backend=cfg.train.backend)
    scores = extract_edge_values(g, logits).astype(np.float64)
    prob = 1.0 / (1.0 + np.exp(-scores))
    y = np.asarray(sample.y)[: g.n_edges]

    info = os.path.join(args.root, "info")
    with open(os.path.join(info, f"{args.idx}_succ.pkl"), "rb") as f:
        succs = pickle.load(f)
    with open(os.path.join(info, f"{args.idx}_edges.pkl"), "rb") as f:
        edges = pickle.load(f)
    with open(os.path.join(args.root, "inference",
                           f"{args.idx}_walks.pkl"), "rb") as f:
        walks = pickle.load(f)

    strand = np.asarray(sample.read_strand)
    start = np.asarray(sample.read_start)
    end = np.asarray(sample.read_end)

    n_breaks = 0
    score_errors = 0       # walked edge: label 0, prob > 0.5
    decoder_forced = 0     # walked edge: prob <= 0.5 (decoder knew better)
    label_true_breaks = 0  # walked edge labeled TRUE yet inconsistent
    had_true_alt = 0       # a true-labeled alternative successor existed
    alt_outscored = 0      # ... and the model scored it HIGHER (decoder
    #                        visited-masking/seeding chose otherwise)
    rows = []
    for w in walks:
        for a, b in zip(w[:-1], w[1:]):
            if edge_coordinate_consistent(strand, start, end, a, b):
                continue
            n_breaks += 1
            eid = edges[(a, b)]
            p_ab = prob[eid]
            lab = y[eid]
            if lab == 0 and p_ab > 0.5:
                score_errors += 1
            if p_ab <= 0.5:
                decoder_forced += 1
            if lab == 1:
                label_true_breaks += 1
            best_alt = None
            for c in succs.get(a, []):
                if c == b:
                    continue
                e2 = edges.get((a, c))
                if e2 is None or e2 >= len(y):
                    continue
                if y[e2] == 1 and edge_coordinate_consistent(
                        strand, start, end, a, c):
                    if best_alt is None or prob[e2] > best_alt:
                        best_alt = prob[e2]
            if best_alt is not None:
                had_true_alt += 1
                if best_alt > p_ab:
                    alt_outscored += 1
            rows.append((a, b, float(p_ab), int(lab),
                         None if best_alt is None else float(best_alt)))

    print(f"walks: {len(walks)}, breaks (misassembly edges): {n_breaks}")
    print(f"  score errors (label 0, prob>0.5):      {score_errors}")
    print(f"  decoder-forced (prob<=0.5 walked):     {decoder_forced}")
    print(f"  label-TRUE yet inconsistent (oracle):  {label_true_breaks}")
    print(f"  had a true alternative successor:      {had_true_alt}")
    print(f"    ...which the model scored HIGHER:    {alt_outscored}")
    for a, b, p, lab, alt in rows[:40]:
        print(f"  break {a}->{b}: prob={p:.3f} label={lab} "
              f"best_true_alt={'-' if alt is None else f'{alt:.3f}'}")


if __name__ == "__main__":
    main()
