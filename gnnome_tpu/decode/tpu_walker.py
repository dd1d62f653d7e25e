"""Batched greedy walks on TPU: the ``nb_paths`` candidate walks advance
in lockstep inside one ``lax.while_loop``.

The reference decodes sequentially on host CPU (``inference.py:211-223``
walks its 50 sampled seeds one by one); those walks are independent given
the iteration's frozen global visited set, so they vectorize: state is
``[B]`` cursors + a ``[B, N]`` per-walk visited bitmap, each step gathers
the padded successor-table rows of all B cursors and argmaxes masked
scores. Semantics match ``decode/greedy.py`` / ``decode/batched.py``
(same neighbor order → same first-max tie-breaks, same unconditional
single-neighbor hops, same ``^1`` mate masking, same ``min_score``
floor); ``tests/test_decode_tpu.py`` pins walk-for-walk equality (scores
cast to f32 on all engines — the device tables are f32).

The outer contig loop (sample seeds ∝ prob, walk, keep the longest, mark
visited + transitive skips, repeat) stays on host exactly as the
reference runs it — ~#contigs iterations of host logic around the
device-side walk batches.
"""
from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import numpy as np

from gnnome_tpu.decode.greedy import sample_edges


class PaddedAdjacency:
    """Dense [N, K] neighbor / score / prefix tables (K = max degree,
    rounded up to 8) in the EXACT per-node order of the succ/pred dicts —
    argmax over the row reproduces the reference's first-max tie-break."""

    __slots__ = ("nbr", "score", "prefix", "deg", "k")

    def __init__(
        self,
        neighbors: Dict[int, List[int]],
        edges: Dict[Tuple[int, int], int],
        scores: np.ndarray,
        prefix_length: np.ndarray,
        n_nodes: int,
        reverse: bool,
    ):
        k = max((len(v) for v in neighbors.values()), default=1)
        k = max(8, (k + 7) & ~7)
        self.k = k
        self.nbr = np.full((n_nodes, k), -1, np.int32)
        self.score = np.full((n_nodes, k), -np.inf, np.float32)
        self.prefix = np.zeros((n_nodes, k), np.int32)
        self.deg = np.zeros(n_nodes, np.int32)
        for node, nbrs in neighbors.items():
            if node >= n_nodes:
                continue
            self.deg[node] = len(nbrs)
            for j, nb in enumerate(nbrs):
                e = edges[(nb, node)] if reverse else edges[(node, nb)]
                self.nbr[node, j] = nb
                self.score[node, j] = scores[e]
                self.prefix[node, j] = prefix_length[e]


@functools.partial(
    __import__("jax").jit, static_argnames=("max_steps", "n_pad"))
def _walk_batch(
    nbr,  # int32[N, K]
    score,  # f32[N, K]
    prefix,  # int32[N, K]
    deg,  # int32[N]
    starts,  # int32[B]
    vg2,  # uint8[B, N] frozen visited (global ∪ per-walk forward leg)
    min_score,  # f32 scalar
    max_steps: int,
    n_pad: int,
):
    """All B walks from ``starts``. Returns (walks int32[B, max_steps]
    (-1 padded), lengths int32[B], bp int32[B] (Σ prefix over taken
    edges), visited uint8[B, N] (incl. ``^1`` mates))."""
    import jax
    import jax.numpy as jnp

    b = starts.shape[0]
    walks = jnp.full((b, max_steps), -1, jnp.int32)
    visited = jnp.zeros((b, n_pad), jnp.uint8)
    bi = jnp.arange(b)

    def cond(state):
        _, _, _, _, alive, step = state
        return jnp.logical_and(alive.any(), step < max_steps)

    def body(state):
        walks, visited, cur, bp, alive, step = state
        col = jnp.where(alive, cur, -1)[:, None]
        walks = jax.lax.dynamic_update_slice(walks, col, (0, step))
        live = alive.astype(jnp.uint8)
        visited = visited.at[bi, jnp.minimum(cur, n_pad - 1)].max(live)
        visited = visited.at[bi, jnp.minimum(cur ^ 1, n_pad - 1)].max(live)

        rows = nbr[cur]  # [B, K]
        rows_c = jnp.maximum(rows, 0)
        blocked = (vg2[bi[:, None], rows_c]
                   | visited[bi[:, None], rows_c]) > 0
        valid = rows >= 0
        # single-successor hops ignore the visited mask (inference.py:42-44)
        usable = valid & ((deg[cur] == 1)[:, None] | ~blocked)
        masked = jnp.where(usable, score[cur], -jnp.inf)
        j = jnp.argmax(masked, axis=1)
        best = masked[bi, j]
        advance = alive & (best > -jnp.inf) & (best >= min_score)
        bp = jnp.where(advance, bp + prefix[cur][bi, j], bp)
        cur = jnp.where(advance, rows[bi, j], cur)
        return (walks, visited, cur, bp, alive & advance, step + 1)

    state = (walks, visited, starts, jnp.zeros(b, jnp.int32),
             jnp.ones(b, bool), jnp.int32(0))
    walks, visited, _, bp, _, _ = jax.lax.while_loop(cond, body, state)
    lengths = (walks >= 0).sum(axis=1).astype(jnp.int32)
    return walks, lengths, bp, visited


def get_contigs_tpu(
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
    min_score: float = float("-inf"),
) -> List[List[int]]:
    """Drop-in for ``greedy.get_contigs`` with the walk batches on device."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    scores = np.asarray(scores, dtype=np.float64)
    probs = 1.0 / (1.0 + np.exp(-scores))
    not_self = src != dst
    n_nodes = len(read_length)
    n_pad = n_nodes + (n_nodes & 1)
    max_steps = n_nodes + 2

    adj_f = PaddedAdjacency(succs, edges, scores, prefix_length, n_pad,
                            reverse=False)
    adj_b = PaddedAdjacency(preds, edges, scores, prefix_length, n_pad,
                            reverse=True)
    df = [jnp.asarray(getattr(adj_f, k))
          for k in ("nbr", "score", "prefix", "deg")]
    db = [jnp.asarray(getattr(adj_b, k))
          for k in ("nbr", "score", "prefix", "deg")]
    ms = jnp.float32(min_score if np.isfinite(min_score) else -3.4e38)

    visited_global = np.zeros(n_pad, np.uint8)
    all_contigs: List[List[int]] = []

    while True:
        keep = visited_global == 0
        edge_alive = not_self & keep[src] & keep[dst]
        if np.isfinite(min_score):
            # the floor also gates seed edges (see batched.py)
            edge_alive = edge_alive & (scores >= min_score)
        alive_ids = np.nonzero(edge_alive)[0]
        if len(alive_ids) == 0:
            break
        seed_ids = alive_ids[sample_edges(probs[alive_ids], nb_paths, rng)]
        s = src[seed_ids].astype(np.int32)
        d = dst[seed_ids].astype(np.int32)

        vg = jnp.broadcast_to(jnp.asarray(visited_global)[None, :],
                              (nb_paths, n_pad))
        wf, lf, bpf, vf = _walk_batch(
            *df, jnp.asarray(d), vg, ms, max_steps=max_steps, n_pad=n_pad)
        # backward legs must not re-enter their forward leg's nodes
        wb, lb, bpb, vb = _walk_batch(
            *db, jnp.asarray(s), jnp.maximum(vg, vf), ms,
            max_steps=max_steps, n_pad=n_pad)

        lf_h = np.asarray(lf)
        lb_h = np.asarray(lb)
        # contig bp = Σ leg prefixes + the seed edge (s→d) + last read
        last_f = np.asarray(wf[np.arange(nb_paths),
                               np.maximum(lf_h - 1, 0)])
        total = (np.asarray(bpf) + np.asarray(bpb)
                 + prefix_length[seed_ids] + read_length[last_f])
        best = int(np.argmax(total))

        walk_f = [int(x) for x in np.asarray(wf[best])[: lf_h[best]]]
        walk_b = [int(x) for x in np.asarray(wb[best])[: lb_h[best]]][::-1]
        best_walk = walk_b + walk_f

        if len(best_walk) < len_threshold:
            break
        all_contigs.append(best_walk)
        bv = np.asarray(jnp.maximum(vf[best], vb[best]))
        visited_global = np.maximum(visited_global, bv)
        trans = set()
        for ss, dd in zip(best_walk[:-1], best_walk[1:]):
            t1 = set(succs[ss]) & set(preds[dd])
            trans |= t1 | {t ^ 1 for t in t1}
        for t in trans:
            if t < n_pad:
                visited_global[t] = 1

    return all_contigs
