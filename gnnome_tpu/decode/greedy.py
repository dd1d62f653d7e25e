"""Greedy probability-guided decoding: edge scores → contig walks.

Host-side (numpy) implementation of the reference decoder
(``inference.py:20-277``). Scoring runs on TPU; the walk itself is
inherently sequential (each step depends on the visited set) so it stays on
host, exactly as the reference runs it on CPU (``inference.py:490``).

Semantics preserved:
  * iterative outer loop: sample ``nb_paths`` seed edges ∝ sigmoid(score)
    among edges of the *remaining* subgraph (``inference.py:256-277``),
    walk greedily forward from dst and backward from src
    (``inference.py:31-77``), keep the walk reconstructing the most bases
    (``inference.py:228``), mark its nodes + their ``^1`` strand mates +
    transitively skipped nodes visited (``inference.py:233-239``), repeat
    until the best walk is shorter than ``len_threshold`` nodes
    (``inference.py:245-247``);
  * self-loops are dropped before decoding (``inference.py:184``).

Vectorization note: the ``nb_paths`` candidate walks per iteration are
independent and could run as a batched TPU walk; kept host-side for exact
reference parity first (SURVEY.md §7 "hard parts").
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Set, Tuple

import numpy as np


def get_contig_length(
    walk: Sequence[int],
    prefix_length: np.ndarray,
    read_length: np.ndarray,
    edges: Dict[Tuple[int, int], int],
) -> int:
    """Reconstructed bases of a walk (``inference.py:20-28``)."""
    total = 0
    for src, dst in zip(walk[:-1], walk[1:]):
        total += int(prefix_length[edges[(src, dst)]])
    total += int(read_length[walk[-1]])
    return total


def walk_forwards(
    start: int,
    edge_scores: np.ndarray,
    neighbors: Dict[int, List[int]],
    edges: Dict[Tuple[int, int], int],
    visited_old: Set[int],
    min_score: float = float("-inf"),
) -> Tuple[List[int], Set[int]]:
    """Greedy forward walk (``inference.py:31-52``).

    ``min_score`` (raw-logit confidence floor, default -inf = reference
    semantics) halts the walk when the edge about to be taken scores
    below it — including the single-neighbor unconditional hop.
    """
    current = start
    walk: List[int] = []
    visited: Set[int] = set()
    while True:
        walk.append(current)
        visited.add(current)
        visited.add(current ^ 1)
        nbrs = neighbors.get(current, [])
        if len(nbrs) == 0:
            break
        if len(nbrs) == 1:
            if edge_scores[edges[(current, nbrs[0])]] < min_score:
                break
            current = nbrs[0]
            continue
        masked = [n for n in nbrs if n not in visited_old and n not in visited]
        if not masked:
            break
        scores = [edge_scores[edges[(current, n)]] for n in masked]
        j = int(np.argmax(scores))
        if scores[j] < min_score:
            break
        current = masked[j]
    return walk, visited


def walk_backwards(
    start: int,
    edge_scores: np.ndarray,
    predecessors: Dict[int, List[int]],
    edges: Dict[Tuple[int, int], int],
    visited_old: Set[int],
    min_score: float = float("-inf"),
) -> Tuple[List[int], Set[int]]:
    """Greedy backward walk (``inference.py:55-77``); ``min_score`` as in
    :func:`walk_forwards`."""
    current = start
    walk: List[int] = []
    visited: Set[int] = set()
    while True:
        walk.append(current)
        visited.add(current)
        visited.add(current ^ 1)
        preds = predecessors.get(current, [])
        if len(preds) == 0:
            break
        if len(preds) == 1:
            if edge_scores[edges[(preds[0], current)]] < min_score:
                break
            current = preds[0]
            continue
        masked = [n for n in preds if n not in visited_old and n not in visited]
        if not masked:
            break
        scores = [edge_scores[edges[(n, current)]] for n in masked]
        j = int(np.argmax(scores))
        if scores[j] < min_score:
            break
        current = masked[j]
    walk.reverse()
    return walk, visited


def sample_edges(
    probs: np.ndarray, nb_paths: int, rng: np.random.Generator
) -> np.ndarray:
    """Sample edge indices ∝ prob (``inference.py:270-277``)."""
    p = np.maximum(probs, 1e-9)
    p = p / p.sum()
    return rng.choice(len(p), size=nb_paths, p=p)


def get_contigs(
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
    engine: str = "batched",
    min_prob: float = 0.0,
    min_score: float | None = None,
) -> List[List[int]]:
    """Iterative contig extraction (``inference.py:182-253``).

    ``scores`` are raw logits in original edge order. ``engine='batched'``
    (default) advances the ``nb_paths`` candidate walks in vectorized
    lockstep (decode/batched.py) — bit-identical results, far less Python
    per step; ``'sequential'`` is the direct reference restatement below.
    ``min_prob`` > 0 stops extending a walk once the next edge's sigmoid
    probability drops below it (see DecodeConfig.min_prob); only
    meaningful when ``scores`` are logits. ``min_score`` (raw score-space
    floor) overrides the ``min_prob`` mapping — the equivalent confidence
    floor for decoders whose scores are NOT logits (the raw
    overlap_length / overlap_similarity baselines, where sigmoid
    saturates; use a feature quantile instead, see
    ``DecodeConfig.baseline_min_quantile``).
    """
    if min_score is None:
        min_score = (
            float("-inf") if min_prob <= 0.0
            else float(np.log(min_prob) - np.log1p(-min_prob))
        )
    else:
        min_score = float(min_score)
    if engine == "batched":
        from gnnome_tpu.decode.batched import get_contigs_batched

        return get_contigs_batched(
            src, dst, scores, succs, preds, edges, prefix_length,
            read_length, nb_paths, len_threshold, seed,
            min_score=min_score,
        )
    if engine == "tpu":
        # device-side lockstep walks (decode/tpu_walker.py); identical
        # semantics modulo f32 score resolution (device tables are f32)
        from gnnome_tpu.decode.tpu_walker import get_contigs_tpu

        return get_contigs_tpu(
            src, dst, scores, succs, preds, edges, prefix_length,
            read_length, nb_paths, len_threshold, seed,
            min_score=min_score,
        )
    rng = np.random.default_rng(seed)
    probs = 1.0 / (1.0 + np.exp(-scores))
    not_self = src != dst  # dgl.remove_self_loop (inference.py:184)
    # visited sets include ^1 strand mates, which can exceed max(src, dst)
    # when trailing nodes are edge-less — and exceed n_nodes-1 itself when
    # n_nodes is odd (the last node's mate is n_nodes), so size the bitmap
    # to the next even count (mirrors batched.py)
    n_nodes = len(read_length)
    n_nodes += n_nodes & 1

    all_contigs: List[List[int]] = []
    visited: Set[int] = set()

    while True:
        # edges of the remaining subgraph (both endpoints unvisited)
        if visited:
            vis_arr = np.fromiter(visited, dtype=np.int64)
            keep_node = np.ones(n_nodes, dtype=bool)
            keep_node[vis_arr] = False
            edge_alive = not_self & keep_node[src] & keep_node[dst]
        else:
            edge_alive = not_self
        if min_score > float("-inf"):
            # the floor also gates seed edges (see batched.py)
            edge_alive = edge_alive & (scores >= min_score)
        alive_ids = np.nonzero(edge_alive)[0]
        if len(alive_ids) == 0:
            break

        seed_ids = alive_ids[sample_edges(probs[alive_ids], nb_paths, rng)]

        best_walk: List[int] | None = None
        best_len = -1
        best_visited: Set[int] = set()
        for eid in seed_ids:
            s, d = int(src[eid]), int(dst[eid])
            walk_f, visited_f = walk_forwards(
                d, scores, succs, edges, visited, min_score
            )
            walk_b, visited_b = walk_backwards(
                s, scores, preds, edges, visited | visited_f, min_score
            )
            walk = walk_b + walk_f
            length = get_contig_length(walk, prefix_length, read_length, edges)
            if length > best_len:
                best_len = length
                best_walk = walk
                best_visited = visited_f | visited_b

        assert best_walk is not None
        # transitively skipped nodes + their mates (inference.py:233-239)
        trans: Set[int] = set()
        for ss, dd in zip(best_walk[:-1], best_walk[1:]):
            t1 = set(succs[ss]) & set(preds[dd])
            trans |= t1 | {t ^ 1 for t in t1}
        best_visited |= trans

        if len(best_walk) < len_threshold:
            break
        all_contigs.append(best_walk)
        visited |= best_visited

    return all_contigs


def get_contigs_baselines(
    src: np.ndarray,
    dst: np.ndarray,
    scores: np.ndarray,
    overlap_length: np.ndarray,
    overlap_similarity: np.ndarray,
    succs: Dict[int, List[int]],
    preds: Dict[int, List[int]],
    edges: Dict[Tuple[int, int], int],
    prefix_length: np.ndarray,
    read_length: np.ndarray,
    nb_paths: int = 50,
    len_threshold: int = 20,
    seed: int = 0,
) -> Tuple[List[List[int]], List[List[int]], List[List[int]]]:
    """GNN-scored decode plus the two non-learned controls that walk by raw
    overlap_length / overlap_similarity (``inference.py:80-179``)."""
    out = []
    for metric in (scores, overlap_length.astype(np.float64),
                   overlap_similarity.astype(np.float64)):
        out.append(
            get_contigs(
                src, dst, np.asarray(metric, dtype=np.float64), succs, preds,
                edges, prefix_length, read_length, nb_paths, len_threshold,
                seed,
            )
        )
    return out[0], out[1], out[2]
