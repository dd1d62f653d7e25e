"""Fast greedy decoding: optimized data layout for the candidate walks.

The reference walks its candidate paths with per-step dict lookups, list
comprehensions and set membership tests (``inference.py:31-77``). This
drop-in engine keeps the exact control flow but swaps the data
structures: adjacency as aligned lists-of-lists (neighbor / score / edge
id), visited sets as bytearrays (O(1) scalar access at ~40ns vs ~1µs for
numpy scalars / python set hashing). Results are bit-identical to
``greedy.get_contigs`` — same neighbor order, same first-max
tie-breaking, same rng consumption; equality is asserted in
tests/test_decode_eval.py.

A safety cap (``n_nodes + 2`` steps per walk) bounds walks on degenerate
single-successor cycles, which would loop forever in the reference.
"""
from __future__ import annotations

from math import inf
from typing import Dict, List, Tuple

import numpy as np

from gnnome_tpu.decode.greedy import sample_edges


class ListAdjacency:
    """Aligned per-node neighbor / score / edge-id lists built from the
    successor (or predecessor) dicts + the (u, v) -> eid edge dict."""

    __slots__ = ("nbrs", "scores", "eids")

    def __init__(
        self,
        neighbors: Dict[int, List[int]],
        edges: Dict[Tuple[int, int], int],
        scores: np.ndarray,
        n_nodes: int,
        reverse: bool,
    ):
        self.nbrs: List[List[int]] = [[] for _ in range(n_nodes)]
        self.scores: List[List[float]] = [[] for _ in range(n_nodes)]
        self.eids: List[List[int]] = [[] for _ in range(n_nodes)]
        for node, nbrs in neighbors.items():
            if node >= n_nodes:
                continue
            row_n, row_s, row_e = [], [], []
            for nb in nbrs:
                e = edges[(nb, node)] if reverse else edges[(node, nb)]
                row_n.append(nb)
                row_s.append(float(scores[e]))
                row_e.append(e)
            self.nbrs[node] = row_n
            self.scores[node] = row_s
            self.eids[node] = row_e


def _walk(
    start: int,
    adj: ListAdjacency,
    vg: bytearray,  # global visited
    vw: bytearray,  # this walk's visited — updated in place
    max_steps: int,
    min_score: float = -inf,
) -> List[int]:
    """One greedy walk (``inference.py:31-52``): single-neighbor hops are
    taken unconditionally (no visited check), multi-neighbor hops first-max
    the score over neighbors absent from both visited sets. ``min_score``
    (raw-logit floor, -inf = reference semantics) halts the walk before
    taking any edge scoring below it — single-neighbor hops included."""
    node = start
    lst: List[int] = []
    nbrs_all, scores_all = adj.nbrs, adj.scores
    while True:
        lst.append(node)
        vw[node] = 1
        vw[node ^ 1] = 1
        nbrs = nbrs_all[node]
        k = len(nbrs)
        if k == 0 or len(lst) >= max_steps:
            break
        if k == 1:
            if scores_all[node][0] < min_score:
                break
            node = nbrs[0]
            continue
        scs = scores_all[node]
        best = -1
        best_s = -inf
        for j in range(k):
            nb = nbrs[j]
            if not vg[nb] and not vw[nb]:
                s = scs[j]
                if s > best_s:
                    best_s = s
                    best = nb
        if best < 0 or best_s < min_score:
            break
        node = best
    return lst


def _walk_length(
    walk: List[int],
    adj_f: ListAdjacency,
    prefix_length: np.ndarray,
    read_length: np.ndarray,
) -> int:
    """``get_contig_length`` via the aligned lists (``inference.py:20-28``)."""
    total = 0
    pl = prefix_length
    for u, v in zip(walk[:-1], walk[1:]):
        row = adj_f.nbrs[u]
        total += int(pl[adj_f.eids[u][row.index(v)]])
    return total + int(read_length[walk[-1]])


def get_contigs_batched(
    src: np.ndarray,
    dst: np.ndarray,
    scores: np.ndarray,
    succs: Dict[int, List[int]],
    preds: Dict[int, List[int]],
    edges: Dict[Tuple[int, int], int],
    prefix_length: np.ndarray,
    read_length: np.ndarray,
    nb_paths: int = 50,
    len_threshold: int = 20,
    seed: int = 0,
    min_score: float = -inf,
) -> List[List[int]]:
    """Drop-in replacement for ``greedy.get_contigs`` (fast data layout)."""
    rng = np.random.default_rng(seed)
    scores = np.asarray(scores, dtype=np.float64)
    probs = 1.0 / (1.0 + np.exp(-scores))
    not_self = src != dst  # dgl.remove_self_loop (inference.py:184)
    n_nodes = len(read_length)
    # ^1 strand mates index one past the end when n_nodes is odd
    nn = n_nodes + (n_nodes & 1)
    max_steps = n_nodes + 2

    adj_f = ListAdjacency(succs, edges, scores, n_nodes, reverse=False)
    adj_b = ListAdjacency(preds, edges, scores, n_nodes, reverse=True)

    visited_global = bytearray(nn)
    vg_np = np.frombuffer(visited_global, dtype=np.uint8)
    all_contigs: List[List[int]] = []

    while True:
        keep = vg_np == 0
        edge_alive = not_self & keep[src] & keep[dst]
        if min_score > -inf:
            # the confidence floor also gates SEED edges: a sub-floor seed
            # would otherwise enter the walk unchecked (the seed edge is
            # the one edge the walkers never score-test)
            edge_alive &= scores >= min_score
        alive_ids = np.nonzero(edge_alive)[0]
        if len(alive_ids) == 0:
            break

        seed_ids = alive_ids[sample_edges(probs[alive_ids], nb_paths, rng)]

        best_walk: List[int] | None = None
        best_len = -1
        best_vw: bytearray | None = None
        for eid in seed_ids:
            s, d = int(src[eid]), int(dst[eid])
            vw = bytearray(nn)
            walk_f = _walk(d, adj_f, visited_global, vw, max_steps, min_score)
            walk_b = _walk(s, adj_b, visited_global, vw, max_steps, min_score)
            walk = walk_b[::-1] + walk_f
            length = _walk_length(walk, adj_f, prefix_length, read_length)
            if length > best_len:
                best_len = length
                best_walk = walk
                best_vw = vw

        assert best_walk is not None and best_vw is not None
        # transitively skipped nodes + mates (inference.py:233-239)
        trans: set = set()
        for ss, dd in zip(best_walk[:-1], best_walk[1:]):
            t1 = set(succs[ss]) & set(preds[dd])
            trans |= t1 | {t ^ 1 for t in t1}

        if len(best_walk) < len_threshold:
            break
        all_contigs.append(best_walk)
        vg_np |= np.frombuffer(best_vw, dtype=np.uint8)
        for t in trans:
            if t < nn:
                visited_global[t] = 1

    return all_contigs
