#!/usr/bin/env python
"""Parallel gen worker: build a subset of the flagship train graphs.

The flagship gen stage is sequential (one graph at a time); at full
chromosome scale each hard-regime graph takes ~8-9 min on this host, so a
40-graph dataset needs parallel workers. Each worker owns a disjoint
index subset (gen_graph is idempotent via done-markers, and all paths are
per-index, so disjoint workers never collide). Seeds match
scripts/flagship.py exactly (train graph idx -> seed idx).

Usage:
  python scripts/gen_worker.py --root runs/hardfull40 --chr chr19 \
      --indices 1:40:2 --threads 3 --error-rate 0.005
"""
from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.flagship import gen_graph  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", required=True)
    parser.add_argument("--chr", dest="chr_n", default="chr19")
    parser.add_argument("--indices", required=True,
                        help="start:stop[:step] (python range syntax)")
    parser.add_argument("--threads", type=int, default=3)
    parser.add_argument("--error-rate", type=float, default=0.005)
    args = parser.parse_args()

    parts = [int(x) for x in args.indices.split(":")]
    idxs = list(range(*parts))
    genome = os.path.join(args.root, "genomes", f"{args.chr_n}.fasta")
    assert os.path.exists(genome), genome
    lengths = os.path.join(args.root, "lengths")
    t0 = time.time()
    for i in idxs:
        gen_graph(os.path.join(args.root, "train"), i, genome, args.chr_n,
                  seed=i, lengths_dir=lengths, threads=args.threads,
                  keep_reads=False, error_rate=args.error_rate)
    print(f"worker done: {len(idxs)} graphs in {(time.time()-t0)/60:.1f} min",
          flush=True)


if __name__ == "__main__":
    main()
