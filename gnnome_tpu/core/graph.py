"""Array-based assembly-graph container for TPU execution.

This replaces the reference's DGL graph objects (``graph_parser.py:297-299``,
``graph_dataset.py:72``) with a static-shape, pure-array representation that
XLA can compile once and reuse: padded COO edge lists, dual CSR layouts
(sorted by destination for forward aggregation, by source for backward
aggregation on the reverse graph, cf. ``layers/gated_gcn_full.py:115``), and
explicit node/edge validity masks so padding never contaminates statistics.

**Canonical edge order is dst-sorted.** All device-side per-edge tensors
(features, labels, gates, messages) live in this order, so the forward
aggregation — the hot segment-sum — streams edges contiguously with no
permutation; only the reverse direction permutes (into src-sorted order).
``edge_perm`` maps original (parser) edge ids to canonical positions for
feature canonicalization, ``edge_inv_perm`` maps back for decoding.

Domain invariants preserved from the reference:
  * node pairing: read ``i`` yields forward-strand node ``2i`` and
    reverse-complement node ``2i+1``; ``node ^ 1`` flips strand
    (``inference.py:39,63``, ``algorithms.py:139``).
  * the graph is directed; message passing needs both the forward CSR and
    its transpose every layer (``layers/gated_gcn_full.py:119-143``).
"""
from __future__ import annotations

import dataclasses
import jax
import numpy as np
import jax.numpy as jnp

NODE_PAD_MULTIPLE = 512  # lets the fused kernels pick 512-row node blocks
# (spmm_pallas._pick_block_nodes: larger blocks amortize edge-chunk
# re-loads at block boundaries; ≤511 wasted node rows is noise)
# The Pallas segment-sum kernel streams edges in 1024-edge chunks.
EDGE_PAD_MULTIPLE = 1024
# Segment id assigned to padded edges: larger than any real node id so the
# one-hot segment-sum kernels drop their contribution automatically.
PAD_SEGMENT = np.int32(2**30)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CSR:
    """One directional layout of the edge set.

    ``order`` is a permutation from canonical edge order into this layout's
    sorted order (``identity=True`` means canonical order already IS this
    layout — no permutation needed, the fast path). ``inv_order`` is the
    inverse permutation; it makes the VJP of the sort a *gather* instead of
    the scatter XLA would otherwise emit. ``offsets[v]:offsets[v+1]``
    indexes the sorted edge range keyed on node ``v``.

    The four optional band plans route this layout's gathers through the
    windowed-VMEM Pallas kernel (``ops/banded.py``) instead of XLA's
    random-row gather: ``expand_plan`` covers ``segment_ids`` (the sorted
    segment-sum VJP expansion), ``key_plan`` the key endpoint in canonical
    edge order (fused-op cotangent gathers and forward endpoint gathers),
    ``order_plan``/``inv_plan`` the two permutation directions. ``None``
    (or ``ok=False``) falls back to ``jnp.take``.
    """

    identity: bool = dataclasses.field(metadata=dict(static=True))
    order: jax.Array  # int32[E_pad]
    inv_order: jax.Array  # int32[E_pad]
    offsets: jax.Array  # int32[N_pad + 1]
    segment_ids: jax.Array  # int32[E_pad] keyed endpoint in sorted order
    expand_plan: object = None  # Optional[ops.banded.BandPlan]
    key_plan: object = None
    order_plan: object = None
    inv_plan: object = None
    # opposite endpoint ids in THIS layout's sorted order (pads clamped to
    # 0) + their band plan: lets the reverse aggregation gather neighbor
    # values DIRECTLY in sorted order, skipping a canonical-order gather +
    # permute (ops/segment.gather_opposite_sorted). None on CSRs built
    # outside build_graph (sharded locals, tests) — callers fall back.
    opp_ids: object = None  # Optional[int32[E_pad]]
    opp_plan: object = None  # Optional[ops.banded.BandPlan]
    # per-key-node bounds of CANONICAL edge positions (int32[N_pad] each,
    # hi inclusive; lo > hi for isolated nodes): lets the unsorted-key
    # reverse aggregation stream canonical edge chunks per node block with
    # no permutation at all (ops/segment.gated_aggregate_reverse_unsorted).
    # ``canon_banded`` (static) is True when the total streamed chunks at
    # 512-node blocks stay within 1.7x the real chunk count — the
    # dispatch guard for that path.
    canon_lo: object = None  # Optional[int32[N_pad]]
    canon_hi: object = None  # Optional[int32[N_pad]]
    canon_banded: bool = dataclasses.field(
        default=False, metadata=dict(static=True))
    # keyed endpoint in CANONICAL edge order, PAD-marked (int32[E_pad]):
    # with canon_lo/hi this lets segment_sum_csr run the permutation-free
    # unsorted segment-sum (ops/spmm_pallas.segment_sum_unsorted_pallas)
    # for every transpose reduction over this CSR.
    key_canonical: object = None  # Optional[int32[E_pad]]
    # streaming segment-sum plan (ops/spmm_pallas._segment_sum_stream_kernel):
    # one edge-major pass over all chunks with a sliding VMEM out-window —
    # ``stream_safe[c]`` is the per-chunk scalar metadata row
    # (flush_tgt, zero_tgt, off, span), ``stream_w`` the power-of-two
    # window height the host simulation proved sufficient (0 =
    # unsupported / window would exceed the VMEM cap). Computed on the
    # ids layout this CSR streams: segment_ids for identity CSRs,
    # key_canonical for banded transpose CSRs.
    stream_safe: object = None  # Optional[int32[E_pad / 1024, 4]]
    stream_w: int = dataclasses.field(default=0, metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AssemblyGraph:
    """Padded, static-shape assembly graph (canonical = dst-sorted edges).

    All arrays are device-ready; ``n_nodes``/``n_edges`` are the *real*
    (unpadded) counts and are static Python ints (jit-constant).
    """

    n_nodes: int = dataclasses.field(metadata=dict(static=True))
    n_edges: int = dataclasses.field(metadata=dict(static=True))

    src: jax.Array  # int32[E_pad] canonical order
    dst: jax.Array  # int32[E_pad] canonical order (non-decreasing on real edges)
    node_mask: jax.Array  # bool[N_pad]
    edge_mask: jax.Array  # bool[E_pad]

    by_dst: CSR  # forward aggregation layout (identity: canonical order)
    by_src: CSR  # backward aggregation layout (permutation from canonical)

    edge_perm: jax.Array  # int32[E_pad]: canonical[i] = original[edge_perm[i]]
    edge_inv_perm: jax.Array  # int32[E_pad]: original[j] = canonical[edge_inv_perm[j]]

    @property
    def n_nodes_padded(self) -> int:
        return self.node_mask.shape[0]

    @property
    def n_edges_padded(self) -> int:
        return self.edge_mask.shape[0]


STREAM_FLUSH = 128  # streaming segment-sum flush granularity (rows)
STREAM_W_CAP = 2048  # max sliding-window height ([W, 256] f32 = 2 MB VMEM)


def _stream_plan(ids: np.ndarray, n_pad: int):
    """Host plan for the streaming (edge-major) segment-sum: a per-chunk
    int32[nchunks, 4] metadata table ``(flush_tgt, zero_tgt, off, span)``
    plus the power-of-two window height a simulation of the kernel's
    (zero-frontier, flush-base) dynamics proves sufficient. All four
    scalars are static per graph, so the kernel reads them from SMEM
    scalar-prefetch — no vector→scalar min/max round trip per chunk.
    Returns ``(None, 0)`` when the window would exceed ``STREAM_W_CAP``
    (wide bands / non-monotone ids) — callers fall back to the
    block-major kernel."""
    e_pad = len(ids)
    ch, F = 1024, STREAM_FLUSH
    if e_pad % ch or n_pad % F or e_pad == 0:
        return None, 0
    nchunks = e_pad // ch
    idm = np.asarray(ids).reshape(nchunks, ch).astype(np.int64)
    valid = idm < n_pad
    big = np.int64(2**40)
    lo = np.where(valid, idm, big).min(axis=1)
    hi = np.where(valid, idm, np.int64(-1)).max(axis=1)
    # rows below safe[c] are never written by any chunk > c
    suf = np.minimum.accumulate(lo[::-1])[::-1]
    safe = np.empty(nchunks, np.int64)
    safe[:-1] = suf[1:]
    safe[-1] = big
    flush_tgt = (np.minimum(safe, n_pad) // F) * F
    # zero frontier target: running-max id_hi rounded up to F
    run_hi = np.maximum.accumulate(hi)
    zero_tgt = np.where(run_hi >= 0, ((run_hi + F) // F) * F, 0)
    off = np.where(hi >= 0, lo & ~np.int64(7), 0)
    span = np.where(hi >= 0, hi - off + 1, 0)
    zf = base = 0
    w_req = F
    for c in range(nchunks):
        if hi[c] >= 0:
            zf = max(zf, int(zero_tgt[c]))
            w_req = max(w_req, zf - base)
        base = max(base, min(int(flush_tgt[c]), zf))
    w = 256
    while w < w_req:
        w *= 2
    if w > STREAM_W_CAP:
        return None, 0
    meta = np.stack([flush_tgt, zero_tgt, off, span], axis=1)
    return meta.astype(np.int32), int(w)


def _csr_from_sorted(key_sorted: np.ndarray, n_pad: int, e_pad: int,
                     order: np.ndarray, identity: bool,
                     key_canonical: np.ndarray = None,
                     opp_canonical: np.ndarray = None) -> CSR:
    from gnnome_tpu.ops.banded import plan_windows_auto

    n_real = int((key_sorted < PAD_SEGMENT).sum())
    offsets = np.searchsorted(
        key_sorted[:n_real], np.arange(n_pad + 1)
    ).astype(np.int32)
    # plans are computed on PAD-clamped ids (pad -> 0) so a single plan is
    # exact for BOTH gather conventions in use: masked gathers that pass
    # PAD-marked ids (uncovered -> zero row, the masked contract) and
    # unmasked gathers that pass the zeros-padded/clamped arrays (row 0 is
    # then inside a window, matching jnp.take bit-for-bit).
    # plan_windows_auto picks the cheapest (group, width): grouped plans
    # serve up to 8 consecutive subrows from one window pair, cutting the
    # dominant window-stream HBM traffic (the round-2 window-reuse lever).
    def _clamped_plan(ids):
        return plan_windows_auto(np.where(ids < n_pad, ids, 0), n_pad)

    expand_plan = _clamped_plan(key_sorted)
    key_plan = (
        expand_plan if key_canonical is None
        else _clamped_plan(key_canonical)
    )
    if identity:
        # order arrays are never read on the identity fast path; keep them
        # empty so they cost nothing to transfer/store
        order = inv_order = np.zeros(0, dtype=np.int32)
        order_plan = inv_plan = None
    else:
        inv_order = np.empty_like(order)
        inv_order[order] = np.arange(len(order), dtype=np.int32)
        order_plan = plan_windows_auto(order, e_pad)
        inv_plan = plan_windows_auto(inv_order, e_pad)
    opp_ids = opp_plan = None
    if opp_canonical is not None and not identity:
        opp_sorted = np.where(opp_canonical < n_pad, opp_canonical, 0)[order]
        opp_ids = jnp.asarray(opp_sorted.astype(np.int32))
        opp_plan = plan_windows_auto(opp_sorted, n_pad)
    canon_lo = canon_hi = None
    canon_banded = False
    if not identity and n_real > 0:
        # per-key-node [min, max] canonical positions of its edges: the
        # k-th sorted edge's canonical position is order[k], node segments
        # come from offsets. Enables the permutation-free unsorted-key
        # reverse aggregation (each 512-node block streams only the
        # canonical chunks its edges live in).
        lens = offsets[1:] - offsets[:-1]
        nz = lens > 0
        lo = np.full(n_pad, np.int32(2**30 - 1), np.int32)
        hi = np.full(n_pad, -1, np.int32)
        ord_real = order[:n_real].astype(np.int64)
        # reduceat over ONLY the nonzero segments: their starts are strictly
        # increasing and the final one extends to the array end, so the last
        # real node's segment includes its last sorted edge (clamping all
        # starts to n_real-1 instead silently dropped that edge whenever
        # trailing empty/padded nodes existed).
        starts_nz = offsets[:-1][nz].astype(np.int64)
        lo[nz] = np.minimum.reduceat(ord_real, starts_nz).astype(np.int32)
        hi[nz] = np.maximum.reduceat(ord_real, starts_nz).astype(np.int32)
        # dispatch guard: total streamed chunks at 512-node blocks vs the
        # real chunk count (1.0 = perfectly banded; random graphs blow up)
        bn, ch = 512, 1024
        if n_pad % bn == 0:
            lo_b = lo.reshape(-1, bn).min(axis=1).astype(np.int64)
            hi_b = hi.reshape(-1, bn).max(axis=1).astype(np.int64)
            c_lo = lo_b // ch
            c_hi = np.where(hi_b >= 0, (hi_b // ch) + 1, 0)
            streamed = np.maximum(c_hi - np.minimum(c_lo, c_hi), 0).sum()
            canon_banded = bool(streamed <= 1.7 * max(1, -(-n_real // ch)))
        canon_lo = jnp.asarray(lo)
        canon_hi = jnp.asarray(hi)
    # streaming segment-sum plan on the layout segment_sum_csr streams for
    # this CSR: the sorted ids for identity, canonical-order keys otherwise
    stream_ids = key_sorted if identity else key_canonical
    stream_safe, stream_w = (
        _stream_plan(np.where(stream_ids < n_pad, stream_ids, PAD_SEGMENT),
                     n_pad)
        if stream_ids is not None else (None, 0)
    )
    return CSR(
        identity=identity,
        order=jnp.asarray(order),
        inv_order=jnp.asarray(inv_order),
        offsets=jnp.asarray(offsets),
        segment_ids=jnp.asarray(key_sorted),
        expand_plan=expand_plan,
        key_plan=key_plan,
        order_plan=order_plan,
        inv_plan=inv_plan,
        opp_ids=opp_ids,
        opp_plan=opp_plan,
        canon_lo=canon_lo,
        canon_hi=canon_hi,
        canon_banded=canon_banded,
        key_canonical=(None if key_canonical is None
                       else jnp.asarray(key_canonical.astype(np.int32))),
        stream_safe=(None if stream_safe is None
                     else jnp.asarray(stream_safe)),
        stream_w=stream_w,
    )


def build_graph(
    src: np.ndarray,
    dst: np.ndarray,
    n_nodes: int,
    node_pad_multiple: int = NODE_PAD_MULTIPLE,
    edge_pad_multiple: int = EDGE_PAD_MULTIPLE,
) -> AssemblyGraph:
    """Build a padded :class:`AssemblyGraph` from COO edge arrays
    (in any order; they are canonicalized to dst-sorted internally)."""
    src = np.asarray(src, dtype=np.int32)
    dst = np.asarray(dst, dtype=np.int32)
    n_edges = int(src.shape[0])
    n_pad = _round_up(max(n_nodes, 1), node_pad_multiple)
    e_pad = _round_up(max(n_edges, 1), edge_pad_multiple)

    src_p = np.zeros(e_pad, dtype=np.int32)
    dst_p = np.zeros(e_pad, dtype=np.int32)
    src_p[:n_edges] = src
    dst_p[:n_edges] = dst
    edge_mask = np.arange(e_pad) < n_edges

    # canonicalize: stable sort by dst, padding last
    dst_key = np.where(edge_mask, dst_p, PAD_SEGMENT)
    edge_perm = np.argsort(dst_key, kind="stable").astype(np.int32)
    edge_inv_perm = np.empty_like(edge_perm)
    edge_inv_perm[edge_perm] = np.arange(e_pad, dtype=np.int32)
    src_c = src_p[edge_perm]
    dst_c = dst_p[edge_perm]
    dst_key_c = dst_key[edge_perm]
    # padding is stably sorted to the tail, so the mask stays a prefix mask
    assert bool(edge_mask[edge_perm][:n_edges].all())

    by_dst = _csr_from_sorted(
        dst_key_c, n_pad, e_pad,
        order=np.arange(e_pad, dtype=np.int32), identity=True,
    )
    src_key = np.where(edge_mask, src_c, PAD_SEGMENT)
    src_order = np.argsort(src_key, kind="stable").astype(np.int32)
    by_src = _csr_from_sorted(
        src_key[src_order], n_pad, e_pad, order=src_order, identity=False,
        key_canonical=src_key, opp_canonical=dst_c,
    )

    node_mask = np.arange(n_pad) < n_nodes
    return AssemblyGraph(
        n_nodes=n_nodes,
        n_edges=n_edges,
        src=jnp.asarray(src_c),
        dst=jnp.asarray(dst_c),
        node_mask=jnp.asarray(node_mask),
        edge_mask=jnp.asarray(edge_mask),
        by_dst=by_dst,
        by_src=by_src,
        edge_perm=jnp.asarray(edge_perm),
        edge_inv_perm=jnp.asarray(edge_inv_perm),
    )


def canonicalize_edge_features(graph: AssemblyGraph, arr: np.ndarray) -> np.ndarray:
    """Reorder a padded per-edge array from original (parser) order into
    the graph's canonical (dst-sorted) order."""
    return np.asarray(arr)[np.asarray(graph.edge_perm)]


def decanonicalize_edge_values(graph: AssemblyGraph, arr: np.ndarray) -> np.ndarray:
    """Inverse of :func:`canonicalize_edge_features` (device → parser order)."""
    return np.asarray(arr)[np.asarray(graph.edge_inv_perm)]


def prepare_edge_features(
    graph: AssemblyGraph, arr: np.ndarray, dtype=np.float32
) -> jnp.ndarray:
    """Unpadded per-edge array (parser order) → padded canonical device array."""
    padded = pad_features(arr, graph.n_edges_padded, dtype)
    return jnp.asarray(canonicalize_edge_features(graph, padded))


def extract_edge_values(graph: AssemblyGraph, arr) -> np.ndarray:
    """Padded canonical device array → unpadded parser-order numpy array."""
    return decanonicalize_edge_values(graph, np.asarray(arr))[: graph.n_edges]


def pad_features(
    arr: np.ndarray, padded_len: int, dtype=np.float32
) -> np.ndarray:
    """Zero-pad a [n, ...] feature array to [padded_len, ...]."""
    arr = np.asarray(arr, dtype=dtype)
    if arr.shape[0] == padded_len:
        return arr
    pad_width = [(0, padded_len - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad_width)


def degrees(graph: AssemblyGraph) -> tuple[jax.Array, jax.Array]:
    """(in_degree, out_degree) as float32[N_pad], zero on padding.

    Mirrors ``utils.py:102-103`` (in_deg/out_deg node features).
    """
    n_pad = graph.n_nodes_padded
    ones = graph.edge_mask.astype(jnp.float32)
    in_deg = jax.ops.segment_sum(ones, graph.dst, num_segments=n_pad)
    out_deg = jax.ops.segment_sum(ones, graph.src, num_segments=n_pad)
    return in_deg, out_deg
