"""Offline experiment: which node ordering makes REAL builder graphs banded?

Computes the canon_banded stream ratio (streamed chunks / ideal, 1.0 =
perfectly banded; dispatch gate 1.7) for the by_src CSR under candidate
node orderings of a processed graph, without building device arrays:

  bfs      current locality_order_pairs (undirected BFS over reads)
  coord    ground-truth read_start order (synthetic-only UPPER BOUND: if
           even this is not banded, ordering cannot fix it and the
           kernels need block-robustness instead)
  defer    BFS over the low-degree (non-repeat) subgraph, repeat reads
           placed at the median BFS position of their neighbors

Usage: python scripts/order_experiment.py <processed.npz>
"""
from __future__ import annotations

import os
import sys
import time
from collections import deque

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stream_ratio_for(src, dst, n, node_map):
    """canon_banded guard ratio for the by_src CSR under node_map."""
    s, d = node_map[src].astype(np.int64), node_map[dst].astype(np.int64)
    n_pad = -(-n // 512) * 512
    e = len(s)
    e_pad = -(-e // 1024) * 1024
    # canonical order = dst-sorted (by_dst is the canonical layout);
    # by_src's canonical positions of each src node's edges
    canon = np.argsort(d, kind="stable")  # canonical pos -> edge
    pos_of_edge = np.empty(e, dtype=np.int64)
    pos_of_edge[canon] = np.arange(e)
    order_src = np.argsort(s, kind="stable")
    src_sorted = s[order_src]
    cpos_in_src_order = pos_of_edge[order_src]
    offsets = np.searchsorted(src_sorted, np.arange(n_pad + 1))
    lo = np.full(n_pad, np.int64(2**60), np.int64)
    hi = np.full(n_pad, -1, np.int64)
    lens = offsets[1:] - offsets[:-1]
    nz = lens > 0
    starts_nz = offsets[:-1][nz]
    lo[nz] = np.minimum.reduceat(cpos_in_src_order, starts_nz)
    hi[nz] = np.maximum.reduceat(cpos_in_src_order, starts_nz)
    bn, ch = 512, 1024
    lo_b = np.where(lo.reshape(-1, bn).min(axis=1) > 2**59, 0,
                    lo.reshape(-1, bn).min(axis=1)) // ch
    hi_raw = hi.reshape(-1, bn).max(axis=1)
    hi_b = np.where(hi_raw >= 0, hi_raw // ch + 1, 0)
    streamed = int(np.maximum(hi_b - np.minimum(lo_b, hi_b), 0).sum())
    ideal = max(1, -(-n // ch))
    return streamed / ideal


def bfs_reads(rsrc, rdst, nr, mask=None):
    """BFS order over reads; ``mask``=False reads are never enqueued."""
    u = np.concatenate([rsrc, rdst])
    v = np.concatenate([rdst, rsrc])
    oe = np.argsort(u, kind="stable")
    us, vs = u[oe], v[oe]
    offs = np.searchsorted(us, np.arange(nr + 1))
    visited = np.zeros(nr, dtype=bool)
    if mask is not None:
        visited[~mask] = True  # excluded from traversal
    order = []
    for root in range(nr):
        if visited[root]:
            continue
        visited[root] = True
        q = deque([root])
        while q:
            x = q.popleft()
            order.append(x)
            for y in vs[offs[x]:offs[x + 1]]:
                if not visited[y]:
                    visited[y] = True
                    q.append(y)
    return np.array(order, dtype=np.int64)


def pairmap_from_read_pos(read_pos, nr):
    """float read key -> pair-aligned node map."""
    order = np.argsort(read_pos, kind="stable")
    node_map = np.empty(2 * nr, dtype=np.int64)
    inv = np.empty(nr, dtype=np.int64)
    inv[order] = np.arange(nr)
    node_map[0::2] = 2 * inv
    node_map[1::2] = 2 * inv + 1
    return node_map


def main() -> None:
    z = np.load(sys.argv[1])
    src, dst, n = z["src"], z["dst"], int(z["n_nodes"])
    nr = n // 2
    rsrc, rdst = src // 2, dst // 2
    print(f"{sys.argv[1]}: {n} nodes ({nr} reads), {len(src)} edges")

    t0 = time.time()
    # (a) current BFS
    ro = bfs_reads(rsrc, rdst, nr)
    pos = np.empty(nr, dtype=np.float64)
    pos[ro] = np.arange(nr)
    r_bfs = stream_ratio_for(src, dst, n, pairmap_from_read_pos(pos, nr))
    print(f"  bfs   : ratio {r_bfs:8.3f}   ({time.time()-t0:.0f}s)")

    # (b) coordinate order (upper bound)
    st = z["read_start"][0::2].astype(np.float64)  # per-read genome start
    r_coord = stream_ratio_for(src, dst, n, pairmap_from_read_pos(st, nr))
    print(f"  coord : ratio {r_coord:8.3f}")

    # (c) high-degree deferral BFS
    deg = np.bincount(rsrc, minlength=nr) + np.bincount(rdst, minlength=nr)
    med = np.median(deg[deg > 0])
    for mult in (2.0, 3.0, 5.0):
        keep = deg <= mult * med
        ro = bfs_reads(rsrc, rdst, nr, mask=keep)
        pos = np.full(nr, -1.0)
        pos[ro] = np.arange(len(ro))
        # repeat reads: median neighbor position + 0.5
        rest = np.where(pos < 0)[0]
        nbr = {r: [] for r in rest}
        rest_set = set(rest.tolist())
        for a, b in ((rsrc, rdst), (rdst, rsrc)):
            sel = np.isin(a, rest)
            for x, y in zip(a[sel], b[sel]):
                if pos[y] >= 0:
                    nbr[x].append(pos[y])
        for r in rest:
            pos[r] = (np.median(nbr[r]) + 0.5) if nbr[r] else len(ro)
        r_def = stream_ratio_for(src, dst, n, pairmap_from_read_pos(pos, nr))
        print(f"  defer x{mult}: ratio {r_def:8.3f} "
              f"(excluded {int((~keep).sum())}/{nr} reads, med deg {med:.0f})")


if __name__ == "__main__":
    main()


def spill_analysis(npz_path: str) -> None:
    """For the CURRENT (BFS) order: per-512-node-block, how many edges
    must spill so the block's canonical window fits various chunk caps?
    Reports total streamed-chunk ratio + spill fraction per cap."""
    z = np.load(npz_path)
    src, dst, n = z["src"], z["dst"], int(z["n_nodes"])
    nr = n // 2
    rsrc, rdst = src // 2, dst // 2
    ro = bfs_reads(rsrc, rdst, nr)
    pos = np.empty(nr, dtype=np.float64)
    pos[ro] = np.arange(nr)
    nm = pairmap_from_read_pos(pos, nr)
    s, d = nm[src].astype(np.int64), nm[dst].astype(np.int64)
    e = len(s)
    canon = np.argsort(d, kind="stable")
    pos_of_edge = np.empty(e, dtype=np.int64)
    pos_of_edge[canon] = np.arange(e)
    n_pad = -(-n // 512) * 512
    blk = s // 512
    ch = 1024
    ideal = max(1, -(-e // ch))
    print(f"spill analysis (BFS order): {e} edges, ideal {ideal} chunks")
    for cap_chunks in (2, 3, 4, 6, 8):
        cap = cap_chunks * ch
        streamed = 0
        spilled = 0
        for b in range(n_pad // 512):
            p = np.sort(pos_of_edge[blk == b])
            if len(p) == 0:
                continue
            # widest coverage by a cap-wide interval (slide over sorted p)
            j = np.searchsorted(p, p + cap, side="left")
            cover = j - np.arange(len(p))
            i0 = int(np.argmax(cover))
            inside = int(cover[i0])
            spilled += len(p) - inside
            lo_c, hi_c = p[i0] // ch, p[min(i0 + inside - 1, len(p)-1)] // ch + 1
            streamed += hi_c - lo_c
        print(f"  cap {cap_chunks:2d} chunks: ratio {streamed/ideal:6.2f}  "
              f"spill {spilled}/{e} ({spilled/e:.2%})")


if __name__ == "__main__" and len(sys.argv) > 2 and sys.argv[2] == "spill":
    spill_analysis(sys.argv[1])
