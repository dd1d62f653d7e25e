#!/usr/bin/env python
"""Per-chromosome held-out evaluation of a trained flagship artifact.

For each trained chromosome type, generate ONE fresh test graph with a
simulation seed never used in training (201/202/203 by convention; train
seeds are 0..N-1, valid 100, test 0) and run the full predict leg
(TPU scoring -> greedy decode -> quick + coordinate evaluation) against a
committed pretrained model.  Reference anchor: ``reproduce.py:40`` (the
``model_5xchr91922`` artifact) and the per-chromosome tables in
docs/FLAGSHIP.md.

Usage:
  python scripts/flagship_heldout.py --root /root/repo/runs/flagship2 \
      --out 5xchr91922 --chrs chr19:201,chr22:202,chr9:203 --tpu
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from flagship import gen_graph, log, make_config  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", required=True,
                        help="flagship run root (has genomes/, lengths/, meta.json)")
    parser.add_argument("--out", default="5xchr91922")
    parser.add_argument("--chrs", default="chr19:201,chr22:202,chr9:203",
                        help="comma list of chrN:sim_seed")
    parser.add_argument("--threads", type=int, default=os.cpu_count() or 4)
    parser.add_argument("--tpu", action="store_true")
    parser.add_argument("--epochs", type=int, default=60)  # unused; make_config wants it
    args = parser.parse_args()

    if not args.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    with open(os.path.join(args.root, "meta.json")) as f:
        meta = json.load(f)
    from gnnome_tpu.evaluation import assembly as asm
    from gnnome_tpu.pipeline import predict

    for key, val in meta.items():
        if key.endswith("_len"):
            asm.CHR_LENS[key[: -len("_len")]] = val

    specs = []
    for part in args.chrs.split(","):
        chr_n, _, seed = part.strip().partition(":")
        specs.append((chr_n, int(seed)))

    for chr_n, seed in specs:
        t0 = time.time()
        test_root = os.path.join(args.root, "heldout", f"{chr_n}_s{seed}")
        gen_graph(test_root, 0, os.path.join(args.root, "genomes", f"{chr_n}.fasta"),
                  chr_n, seed=seed,
                  lengths_dir=os.path.join(args.root, "lengths"),
                  threads=args.threads, keep_reads=True,
                  error_rate=meta.get("error_rate", 0.0))
        with open(os.path.join(test_root, "info", "g_to_chr.pkl"), "wb") as f:
            pickle.dump({0: chr_n}, f)
        results = predict(test_root, args.out, cfg=make_config(args))
        n_contigs, longest, frac, n50, ng50 = results[0]
        coord_path = os.path.join(test_root, "inference", "0_coord.json")
        coord = {}
        if os.path.exists(coord_path):
            with open(coord_path) as f:
                coord = json.load(f)
        log(f"HELDOUT {chr_n} (seed {seed}): {n_contigs} contigs, longest "
            f"{longest:,} bp, {frac:.1%} reconstructed, NG50 {ng50:,}, "
            f"misassemblies={coord.get('n_misassemblies')} "
            f"NGA50={coord.get('nga50', 0):,} "
            f"genome_fraction={coord.get('genome_fraction')} "
            f"({(time.time() - t0) / 60:.1f} min)")


if __name__ == "__main__":
    main()
