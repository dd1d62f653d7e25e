"""Measure banded-ness of REAL builder graphs after the BFS reorder.

docs/ROADMAP.md #4 asks whether the permutation-plan window traffic
(paid only when ``canon_banded`` is False) matters in practice: if real
overlap-graph builder output stays banded after ``locality_order_pairs``
at chromosome scale, the non-banded fallback path is a synthetic-graph
concern only. This script loads processed graphs through the exact
device path (``data/dataset.load_sample``) and reports, per CSR:

  * ``canon_banded`` (the dispatch guard: streamed chunks <= 1.7x ideal)
  * the streamed-chunk ratio itself (1.0 = perfectly banded)
  * band-plan window widths for every plan the layer actually uses

Usage: JAX_PLATFORMS=cpu python scripts/banded_report.py <npz> [...]
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stream_ratio(csr, n_pad: int, e_real: int) -> float:
    """The canon_banded guard's streamed/ideal chunk ratio (graph.py:
    ideal = real EDGES / 1024, matching ``_build_csr``'s ``n_real``)."""
    if csr.canon_lo is None:
        return float("nan")
    lo = np.asarray(csr.canon_lo)
    hi = np.asarray(csr.canon_hi)
    bn, ch = 512, 1024
    if n_pad % bn != 0:
        return float("nan")
    lo_b = lo.reshape(-1, bn).min(axis=1).astype(np.int64)
    hi_b = hi.reshape(-1, bn).max(axis=1).astype(np.int64)
    c_lo = lo_b // ch
    c_hi = np.where(hi_b >= 0, (hi_b // ch) + 1, 0)
    streamed = int(np.maximum(c_hi - np.minimum(c_lo, c_hi), 0).sum())
    ideal = max(1, -(-e_real // ch))
    return streamed / ideal


def report(npz_path: str) -> None:
    from gnnome_tpu.data.dataset import load_sample

    s = load_sample(npz_path, 0)
    g = s.graph
    n_pad, e_pad = g.n_nodes_padded, g.n_edges_padded
    print(f"{npz_path}: {g.n_nodes} nodes ({n_pad} pad), "
          f"{len(s.src)} edges ({e_pad} pad)")
    for name, csr in (("by_dst", g.by_dst), ("by_src", g.by_src)):
        plans = {
            "expand": csr.expand_plan, "key": csr.key_plan,
            "order": csr.order_plan, "inv": csr.inv_plan,
            "opp": csr.opp_plan,
        }
        pw = {k: (f"wr={p.wr} g={p.group}" if p is not None and p.ok
                  else ("miss" if p is not None else "-"))
              for k, p in plans.items()}
        print(f"  {name}: identity={csr.identity} "
              f"canon_banded={csr.canon_banded} "
              f"stream_ratio={stream_ratio(csr, n_pad, len(s.src)):.3f} "
              f"stream_w={csr.stream_w} plans={pw}")


def main() -> None:
    for p in sys.argv[1:]:
        report(p)


if __name__ == "__main__":
    main()
