"""SPMD sharded training: full-graph GatedGCN across a device mesh.

This is the distributed execution path the reference entirely lacks
(single device only, ``hyperparameters.py:25``; SURVEY.md §2c).

Owner-computes design with **halo (boundary-only) exchange** (v4):

  * **nodes** are block-sharded over the ``graph`` mesh axis; every dense
    projection (the six per-layer matmuls, ``layers/gated_gcn_full.py:107-113``)
    runs on its local node block (MXU, no comm). Node numbering is the
    pair-aligned BFS locality order (``parallel/partition.py``), so
    contiguous blocks are good partitions with a small edge cut;
  * **each edge lives on exactly one device** — the owner of its ``dst``
    (edges arrive dst-sorted: contiguous slices of the canonical order).
    There is ONE edge state and ONE per-edge gate, shared by both
    aggregation directions — the fwd/bwd gate tensors are algebraically
    identical in the reference's live path
    (``layers/gated_gcn_full.py:120-143``), a fact the single-chip layer
    already exploits (``models/gated_gcn.py``). v3 of this module carried
    a second, src-owned copy of every edge with its own gate and state;
    that doubled the per-edge compute, the remat carry (~2 GB at 1M
    edges), and the batch footprint, for a quantity that is one tensor;
  * the **forward aggregation** (into ``dst``) is a fully local sorted
    segment-sum into the device's own node block. The **reverse
    aggregation** (into ``src``, the ``dgl.reverse`` direction) keys each
    edge by its ``ref`` index into the combined [N_local + P·H] table
    (own block ‖ per-peer halo slots): local src rows accumulate
    directly, remote src rows accumulate into their peer's halo slot,
    and one ``all_to_all`` returns the halo *partial sums* to their
    owners, which add them in via a sorted segment-sum over the
    host-built send CSR — the exact transpose of the halo gather, riding
    the same boundary sets R[p→q];
  * **per-layer communication is proportional to the edge cut, not N**:
    one halo gather of [b1h ‖ a2h] boundary src rows out, one halo
    reduce of [Σσ·a3h ‖ Σσ] partial sums back. ``prepare_batch``
    precomputes, per ordered device pair (p→q), the exact boundary row
    set R[p→q]; H is the max |R[p→q]| (padded), so per-device per-layer
    traffic is 2 · P·H · 2D rows (see ``halo_comm_bytes``);
  * every gather is scatter-free in autodiff: send-buffer gathers and
    per-edge gathers go through ``gather_by_endpoint`` with host-built
    CSRs, so their VJPs are sorted segment-sums (the Pallas kernel), never
    XLA scatter-adds; the ``all_to_all`` transposes to itself; the halo
    reduce's VJP is the halo gather. The code orders each layer so the
    halo exchange is issued before the remaining local matmuls (B2/A3,
    gate locals) — no data dependence, letting XLA's latency-hiding
    scheduler overlap the collective with local MXU work;
  * edge-BatchNorm statistics are computed over the single edge set
    (each real edge exactly once, psum over ``graph``), so numerics match
    single-device execution exactly;
  * **graphs** shard over the ``data`` axis (one graph per replica group);
    loss means and gradients reduce over both axes. At P=1 the halo is
    empty and the layer degenerates to exactly the single-chip kernel
    sequence.

Numerical equality with single-device execution is asserted in
tests/test_sharded.py; cut-proportional comm is asserted in
tests/test_halo.py.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from gnnome_tpu.core.graph import CSR, PAD_SEGMENT
from gnnome_tpu.data.dataset import GraphSample
from gnnome_tpu.models.common import linear
from gnnome_tpu.ops.norm import masked_moments
from gnnome_tpu.ops.segment import gather_by_endpoint

AXIS_GRAPH = "graph"
AXIS_DATA = "data"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# batch preparation: dual edge sharding with per-shard local CSR + halo maps
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EdgeShard:
    """The (dst-owned, dst-sorted) edge sharding. Leading dims: [B, P, ...].

    ``ref`` indexes each edge's src endpoint into the combined
    [N_local + P·H] table of (own node block ‖ per-peer halo rows);
    ``send_idx`` lists the local rows each peer needs (layout:
    peer-major, [P·H]). The ``ref_*`` / ``send_*`` arrays are the
    host-built CSRs serving double duty: they make the halo/edge
    gathers' VJPs sorted segment-sums instead of XLA scatters, and the
    ``ref`` CSR is ALSO the forward layout of the reverse aggregation
    (σ·a3h partial sums into the combined table) while the send CSR adds
    returned halo partials into their owner rows.
    """

    mask: jax.Array  # bool [B, P, E_b]
    key_local: jax.Array  # int32: keyed endpoint − node_base (PAD_SEGMENT pad)
    offsets: jax.Array  # int32 [B, P, N_local + 1] local CSR row pointers
    e_feat: jax.Array  # f32 [B, P, E_b, 2]
    y: jax.Array  # f32 [B, P, E_b] (labels; meaningful in fwd shard)
    # halo machinery
    ref: jax.Array  # int32 [B, P, E_b] → combined-table row per edge
    ref_order: jax.Array  # int32 [B, P, E_b]
    ref_inv_order: jax.Array  # int32 [B, P, E_b]
    ref_offsets: jax.Array  # int32 [B, P, N_local + P·H + 1]
    ref_segment_ids: jax.Array  # int32 [B, P, E_b]
    send_idx: jax.Array  # int32 [B, P, P·H] local rows to send, peer-major
    send_order: jax.Array  # int32 [B, P, P·H]
    send_inv_order: jax.Array  # int32 [B, P, P·H]
    send_offsets: jax.Array  # int32 [B, P, N_local + 1]
    send_segment_ids: jax.Array  # int32 [B, P, P·H]
    # host-planned banded-gather windows (``ops/banded.plan_windows``): one
    # dual-window row per 128-edge subrow, so the big per-edge gathers run
    # the windowed-VMEM Pallas kernel instead of XLA's random-row gather
    # (the same dispatch the single-chip CSRs carry). One STATIC window
    # width per field, shared by every shard and graph in the batch — the
    # compiled program must be uniform across shard_map ranks; ``wr == 0``
    # disables a plan (its w0 then has S == 0) and callers fall back to
    # ``jnp.take``. Send-buffer gathers stay unplanned (P·H rows ≪ E_b).
    key_w0: jax.Array  # int32 [B, P, S_e, 2] over clamped key_local
    ref_w0: jax.Array  # int32 [B, P, S_e, 2] over ref (combined table)
    ref_order_w0: jax.Array  # int32 [B, P, S_e, 2] over ref_order
    ref_inv_w0: jax.Array  # int32 [B, P, S_e, 2] over ref_inv_order
    ref_expand_w0: jax.Array  # int32 [B, P, S_e, 2] over clamped ref_segment_ids
    # per-combined-row [min, max] canonical edge positions (reverse-
    # unsorted aggregation bounds, cf. core.graph canon_lo/hi)
    canon_lo: jax.Array  # int32 [B, P, N_local + P·H]
    canon_hi: jax.Array  # int32 [B, P, N_local + P·H]
    # streaming segment-sum metadata over the local key layout
    # (core/graph._stream_plan; key_stream_w = max required window across
    # shards, 0 disables)
    key_stream: jax.Array  # int32 [B, P, E_b / 1024, 4]
    # PAD-marked ref ids (shard-canonical order) + their streaming plan —
    # the combined-table transpose reductions and the dual-key streaming
    # gate-front backward
    ref_canonical: jax.Array  # int32 [B, P, E_b]
    ref_stream: jax.Array  # int32 [B, P, E_b / 1024, 4]
    key_wr: int = dataclasses.field(default=0, metadata=dict(static=True))
    key_stream_w: int = dataclasses.field(default=0, metadata=dict(static=True))
    ref_stream_w: int = dataclasses.field(default=0, metadata=dict(static=True))
    ref_wr: int = dataclasses.field(default=0, metadata=dict(static=True))
    ref_order_wr: int = dataclasses.field(default=0, metadata=dict(static=True))
    ref_inv_wr: int = dataclasses.field(default=0, metadata=dict(static=True))
    ref_expand_wr: int = dataclasses.field(default=0, metadata=dict(static=True))
    key_gr: int = dataclasses.field(default=1, metadata=dict(static=True))
    ref_gr: int = dataclasses.field(default=1, metadata=dict(static=True))
    ref_order_gr: int = dataclasses.field(default=1, metadata=dict(static=True))
    ref_inv_gr: int = dataclasses.field(default=1, metadata=dict(static=True))
    ref_expand_gr: int = dataclasses.field(default=1, metadata=dict(static=True))
    # True when EVERY shard's ref ids are canonically banded (streamed
    # chunks ≤ 1.7× real) — the static reverse-unsorted dispatch guard,
    # uniform across ranks by construction
    rev_ok: bool = dataclasses.field(default=False, metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedBatch:
    node_mask: jax.Array  # bool [B, N_pad]
    pe: jax.Array  # f32 [B, N_pad, pe+2]
    fwd: EdgeShard  # THE edge sharding: owned by dst block, dst-sorted

    @property
    def n_nodes_padded(self) -> int:
        return self.node_mask.shape[1]


_SHARD_ARRAYS = tuple(
    f.name for f in dataclasses.fields(EdgeShard)
    if not f.metadata.get("static")
)
_SHARD_STATIC = tuple(
    f.name for f in dataclasses.fields(EdgeShard)
    if f.metadata.get("static")
)
_PLAN_FIELDS = (  # (w0 field, wr field, group field, runtime dict key)
    ("key_w0", "key_wr", "key_gr", "_key_plan"),
    ("ref_w0", "ref_wr", "ref_gr", "_ref_plan"),
    ("ref_order_w0", "ref_order_wr", "ref_order_gr", "_ref_order_plan"),
    ("ref_inv_w0", "ref_inv_wr", "ref_inv_gr", "_ref_inv_plan"),
    ("ref_expand_w0", "ref_expand_wr", "ref_expand_gr", "_ref_expand_plan"),
)


def _plan_rows(
    ids_rows: np.ndarray, n_rows: int
) -> Tuple[np.ndarray, int, int]:
    """Banded windows for a [R, L] stack of ids arrays under ONE static
    (group, width) — the pallas dispatch must be uniform across shard_map
    ranks. Groups are cost-picked with the same calibrated time model as
    ``plan_windows_auto`` (``ops/banded.plan_cost``: window-stream
    bytes/id ∝ wr/group plus the selector-MXU term ∝ wr): grouped plans
    serve up to 8 consecutive subrows from one window pair, the round-2
    window-reuse lever the sharded path previously forwent. Returns
    (w0 [R, S, 2], wr, group); wr == 0 when no (group, width) covers
    every row (callers then use ``jnp.take``)."""
    from gnnome_tpu.ops.banded import plan_cost, plan_windows

    # disabled plans keep one dummy row (NOT zero-size: XLA forces
    # zero-size inputs to replicated, clashing with the shard_map spec)
    none = np.zeros((len(ids_rows), 1, 2), np.int32)
    best = None  # (cost, w0_stack, wr, group)
    for group in (8, 4, 2, 1):
        if ids_rows.shape[-1] % (group * 128) != 0:
            continue
        plans = [plan_windows(r, n_rows, group=group) for r in ids_rows]
        if not all(p.ok for p in plans):
            continue
        wr = max(p.wr for p in plans)
        out = []
        for p, r in zip(plans, ids_rows):
            if p.wr != wr:
                p = plan_windows(r, n_rows, widths=(wr,), group=group)
                if not p.ok:
                    out = None
                    break
            out.append(np.asarray(p.w0))
        if out is None:
            continue
        cost = plan_cost(wr, group)
        if best is None or cost < best[0]:
            best = (cost, np.stack(out).astype(np.int32), wr, group)
    if best is None:
        return none, 0, 1
    return best[1], best[2], best[3]


def _sorted_csr_arrays(keys: np.ndarray, n_rows: int) -> Dict[str, np.ndarray]:
    """Host-built CSR over an (unsorted) int key array: stable sort order,
    inverse, row offsets, and sorted segment ids. Keys ≥ n_rows (padding)
    sort last and carry PAD_SEGMENT."""
    keys = np.where(keys < n_rows, keys, PAD_SEGMENT).astype(np.int64)
    order = np.argsort(keys, kind="stable").astype(np.int32)
    inv_order = np.empty_like(order)
    inv_order[order] = np.arange(len(order), dtype=np.int32)
    key_sorted = keys[order]
    offsets = np.searchsorted(key_sorted, np.arange(n_rows + 1)).astype(np.int32)
    return {
        "order": order,
        "inv_order": inv_order,
        "offsets": offsets,
        "segment_ids": key_sorted.astype(np.int32),
    }


def _halo_sets(
    other_sorted_by_shard: List[np.ndarray], n_local: int, n_shards: int
) -> Dict[Tuple[int, int], np.ndarray]:
    """R[(p, q)]: sorted unique global ids owned by p that shard q's edges
    reference as their non-keyed endpoint."""
    R: Dict[Tuple[int, int], np.ndarray] = {}
    for q in range(n_shards):
        oth = other_sorted_by_shard[q]
        owner = oth // n_local
        for p in range(n_shards):
            if p == q:
                continue
            R[(p, q)] = np.unique(oth[owner == p])
    return R


def _build_edge_shard(
    order: np.ndarray,  # permutation of canonical indices into key-sorted order
    key_sorted: np.ndarray,  # sorted keyed endpoint (PAD_SEGMENT on padding)
    other_c: np.ndarray,  # the non-keyed endpoint, canonical order
    e_feat_c: np.ndarray,
    y_c: np.ndarray,
    n_real_edges: int,
    n_pad: int,
    n_shards: int,
    e_bucket: int,
    h_halo: int,
    R: Dict[Tuple[int, int], np.ndarray],
) -> Dict[str, np.ndarray]:
    n_local = n_pad // n_shards
    n_comb = n_local + n_shards * h_halo
    bounds = np.searchsorted(key_sorted[:n_real_edges],
                             np.arange(n_shards + 1) * n_local)
    out = {
        "mask": np.zeros((n_shards, e_bucket), bool),
        "key_local": np.full((n_shards, e_bucket), PAD_SEGMENT, np.int32),
        "offsets": np.zeros((n_shards, n_local + 1), np.int32),
        "e_feat": np.zeros((n_shards, e_bucket, e_feat_c.shape[-1]), np.float32),
        "y": np.zeros((n_shards, e_bucket), np.float32),
        "ref": np.zeros((n_shards, e_bucket), np.int32),
        "ref_order": np.zeros((n_shards, e_bucket), np.int32),
        "ref_inv_order": np.zeros((n_shards, e_bucket), np.int32),
        "ref_offsets": np.zeros((n_shards, n_comb + 1), np.int32),
        "ref_segment_ids": np.zeros((n_shards, e_bucket), np.int32),
        "send_idx": np.zeros((n_shards, n_shards * h_halo), np.int32),
        "send_order": np.zeros((n_shards, n_shards * h_halo), np.int32),
        "send_inv_order": np.zeros((n_shards, n_shards * h_halo), np.int32),
        "send_offsets": np.zeros((n_shards, n_local + 1), np.int32),
        "send_segment_ids": np.zeros((n_shards, n_shards * h_halo), np.int32),
        "canon_lo": np.full((n_shards, n_comb), np.int32(2**30 - 1), np.int32),
        "canon_hi": np.full((n_shards, n_comb), -1, np.int32),
        "rev_banded": np.zeros(n_shards, bool),
        # streaming segment-sum plan over the local key layout (identity
        # CSR; core/graph._stream_plan) — per-shard int32[nchunks, 4]
        # metadata + required window (0 = unsupported on that shard)
        "key_stream": np.zeros((n_shards, e_bucket // 1024, 4), np.int32),
        "key_stream_w": np.zeros(n_shards, np.int32),
        # PAD-marked combined-table ref ids in shard-canonical order + the
        # streaming plan over them: lights up the permutation-free
        # streaming transpose reduction AND the dual-key streaming
        # gate-front backward for the sharded layer
        "ref_canonical": np.full((n_shards, e_bucket), PAD_SEGMENT, np.int32),
        "ref_stream": np.zeros((n_shards, e_bucket // 1024, 4), np.int32),
        "ref_stream_w": np.zeros(n_shards, np.int32),
    }
    for p in range(n_shards):
        lo, hi = int(bounds[p]), int(bounds[p + 1])
        cnt = hi - lo
        assert cnt <= e_bucket, (cnt, e_bucket)
        sel = order[lo:hi]
        oth = other_c[sel]
        out["mask"][p, :cnt] = True
        out["key_local"][p, :cnt] = key_sorted[lo:hi] - p * n_local
        out["e_feat"][p, :cnt] = e_feat_c[sel]
        out["y"][p, :cnt] = y_c[sel]
        out["offsets"][p] = np.searchsorted(
            out["key_local"][p, :cnt], np.arange(n_local + 1)
        )
        from gnnome_tpu.core.graph import _stream_plan

        sm, sw = _stream_plan(out["key_local"][p].astype(np.int64), n_local)
        if sm is not None:
            out["key_stream"][p] = sm
            out["key_stream_w"][p] = sw

        # per-edge combined-table reference: own block rows map directly,
        # remote rows map to their slot in the peer's halo segment
        owner = oth // n_local
        ref = np.zeros(cnt, np.int64)
        local = owner == p
        ref[local] = oth[local] - p * n_local
        for r in range(n_shards):
            if r == p:
                continue
            m = owner == r
            if m.any():
                pos = np.searchsorted(R[(r, p)], oth[m])
                ref[m] = n_local + r * h_halo + pos
        out["ref"][p, :cnt] = ref
        ref_keys = np.full(e_bucket, PAD_SEGMENT, np.int64)
        ref_keys[:cnt] = ref
        out["ref_canonical"][p] = ref_keys
        rsm, rsw = _stream_plan(ref_keys, n_comb)
        if rsm is not None:
            out["ref_stream"][p] = rsm
            out["ref_stream_w"][p] = rsw
        csr = _sorted_csr_arrays(ref_keys, n_comb)
        out["ref_order"][p] = csr["order"]
        out["ref_inv_order"][p] = csr["inv_order"]
        out["ref_offsets"][p] = csr["offsets"]
        out["ref_segment_ids"][p] = csr["segment_ids"]

        # reverse-unsorted bounds: per combined-table row, [min, max]
        # canonical positions of its edges + the bandedness guard (same
        # reduceat-over-nonzero-segments logic as core.graph's canon_lo/hi)
        offs = csr["offsets"].astype(np.int64)
        lens = offs[1:] - offs[:-1]
        nz = lens > 0
        if cnt > 0 and nz.any():
            ord_real = csr["order"][:cnt].astype(np.int64)
            starts_nz = offs[:-1][nz]
            out["canon_lo"][p][nz] = np.minimum.reduceat(
                ord_real, starts_nz).astype(np.int32)
            out["canon_hi"][p][nz] = np.maximum.reduceat(
                ord_real, starts_nz).astype(np.int32)
        from gnnome_tpu.ops.spmm_pallas import _pick_block_nodes

        bn, ch = _pick_block_nodes(n_comb, 512), 1024
        if n_comb % bn == 0 and e_bucket % ch == 0:
            lo_b = out["canon_lo"][p].reshape(-1, bn).min(axis=1).astype(np.int64)
            hi_b = out["canon_hi"][p].reshape(-1, bn).max(axis=1).astype(np.int64)
            c_lo = lo_b // ch
            c_hi = np.where(hi_b >= 0, hi_b // ch + 1, 0)
            streamed = np.maximum(c_hi - np.minimum(c_lo, c_hi), 0).sum()
            out["rev_banded"][p] = bool(
                streamed <= 1.7 * max(1, -(-max(cnt, 1) // ch)))

        # send lists: rows of p's block that each peer q needs (slot q)
        send_keys = np.full(n_shards * h_halo, PAD_SEGMENT, np.int64)
        for q in range(n_shards):
            if q == p:
                continue
            rows = R[(p, q)] - p * n_local
            send_keys[q * h_halo : q * h_halo + len(rows)] = rows
        out["send_idx"][p] = np.where(
            send_keys < n_local, send_keys, 0
        ).astype(np.int32)
        csr = _sorted_csr_arrays(send_keys, n_local)
        out["send_order"][p] = csr["order"]
        out["send_inv_order"][p] = csr["inv_order"]
        out["send_offsets"][p] = csr["offsets"]
        out["send_segment_ids"][p] = csr["segment_ids"]
    return out


def prepare_batch(
    samples: List[GraphSample], mesh: Mesh, edge_bucket_multiple: int = 1024
) -> ShardedBatch:
    """Stack graphs into the dual-sharded batch layout and device_put."""
    n_graph = mesh.shape[AXIS_GRAPH]
    n_data = mesh.shape[AXIS_DATA]
    if len(samples) != n_data:
        raise ValueError(
            f"batch of {len(samples)} graphs must equal data-axis size {n_data} "
            "(one graph per replica group)"
        )

    # 512-multiple locals let the per-shard segment-sums use the large
    # node blocks (spmm_pallas._pick_block_nodes); 128 is the hard floor
    n_pad = _round_up(max(s.graph.n_nodes_padded for s in samples), 512 * n_graph)
    n_local = n_pad // n_graph

    # pass 1: shard bounds (edge buckets) + halo sets (halo bucket).
    # One sharding only: edges are owned by their dst's block (canonical
    # order is already dst-sorted); the halo sets are the boundary SRC
    # rows, which serve both the forward gather and the reverse
    # partial-sum return (same R[p→q] in both roles).
    per_graph = []
    max_bucket = 0
    max_halo = 0
    for s in samples:
        g = s.graph
        e_pad = g.n_edges_padded
        src_c = np.asarray(g.src)
        dst_c = np.asarray(g.dst)

        dst_key = np.where(np.arange(e_pad) < g.n_edges, dst_c, PAD_SEGMENT)
        fwd_order = np.arange(e_pad)
        b = np.searchsorted(dst_key[: g.n_edges],
                            np.arange(n_graph + 1) * n_local)
        max_bucket = max(max_bucket, int(np.diff(b).max()) if n_graph else 0)
        other_by_shard = [
            src_c[fwd_order[int(b[p]) : int(b[p + 1])]] for p in range(n_graph)
        ]
        R = _halo_sets(other_by_shard, n_local, n_graph)
        if R:
            max_halo = max(max_halo, max((len(v) for v in R.values()), default=0))
        per_graph.append((s, (dst_key, fwd_order, src_c, R)))

    e_bucket = _round_up(max(max_bucket, 1), edge_bucket_multiple)
    # Pallas segment-sum constraints on the halo tensors: the send list
    # (edge dim P·H) must be a multiple of 1024 and the combined table
    # (N_local + P·H rows) a multiple of 128 — both hold when P·H is a
    # multiple of 1024 (n_local is already a multiple of 128).
    h_halo = _round_up(max(max_halo, 1), max(1024 // n_graph, 1)) if n_graph > 1 else 0

    fwd_stack, node_masks, pes = [], [], []
    for s, (key_sorted, order, other, R) in per_graph:
        g = s.graph
        e_feat_c = np.asarray(s.e_feat)
        y_c = np.asarray(s.y)
        fwd_stack.append(_build_edge_shard(
            order, key_sorted, other, e_feat_c, y_c,
            g.n_edges, n_pad, n_graph, e_bucket, h_halo, R,
        ))
        nm = np.zeros(n_pad, bool)
        nm[: g.n_nodes] = True
        node_masks.append(nm)
        pe = np.asarray(s.pe)
        out = np.zeros((n_pad, pe.shape[1]), np.float32)
        out[: pe.shape[0]] = pe
        pes.append(out)

    def stack_shard(dicts: List[Dict[str, np.ndarray]]) -> EdgeShard:
        d = {k: np.stack([dd[k] for dd in dicts]) for k in dicts[0]}
        rev_ok = bool(np.all(d.pop("rev_banded")))
        ksw = d.pop("key_stream_w")
        # one static window height for every rank: the max requirement, 0
        # (disabled) unless every shard supports streaming
        key_stream_w = int(ksw.max()) if bool((ksw > 0).all()) else 0
        rsw = d.pop("ref_stream_w")
        ref_stream_w = int(rsw.max()) if bool((rsw > 0).all()) else 0
        # band plans over the stacked [B, P, E_b] ids (one static
        # (group, wr) per field across the whole batch — see EdgeShard)
        b, p_sh, e_b = d["key_local"].shape
        n_loc = d["offsets"].shape[-1] - 1
        n_comb = d["ref_offsets"].shape[-1] - 1

        def flat(a):
            return a.reshape(b * p_sh, a.shape[-1]).astype(np.int64)

        def rs4(w0):
            return w0.reshape(b, p_sh, -1, 2)

        kl = flat(d["key_local"])
        key_w0, key_wr, key_gr = _plan_rows(np.where(kl < n_loc, kl, 0), n_loc)
        ref_w0, ref_wr, ref_gr = _plan_rows(flat(d["ref"]), n_comb)
        ro_w0, ro_wr, ro_gr = _plan_rows(flat(d["ref_order"]), e_b)
        ri_w0, ri_wr, ri_gr = _plan_rows(flat(d["ref_inv_order"]), e_b)
        rsg = flat(d["ref_segment_ids"])
        re_w0, re_wr, re_gr = _plan_rows(np.where(rsg < n_comb, rsg, 0), n_comb)
        return EdgeShard(
            **d,
            key_w0=rs4(key_w0), key_wr=key_wr, key_gr=key_gr,
            ref_w0=rs4(ref_w0), ref_wr=ref_wr, ref_gr=ref_gr,
            ref_order_w0=rs4(ro_w0), ref_order_wr=ro_wr, ref_order_gr=ro_gr,
            ref_inv_w0=rs4(ri_w0), ref_inv_wr=ri_wr, ref_inv_gr=ri_gr,
            ref_expand_w0=rs4(re_w0), ref_expand_wr=re_wr, ref_expand_gr=re_gr,
            rev_ok=rev_ok, key_stream_w=key_stream_w,
            ref_stream_w=ref_stream_w,
        )

    batch = ShardedBatch(
        node_mask=np.stack(node_masks),
        pe=np.stack(pes),
        fwd=stack_shard(fwd_stack),
    )

    # device placement: [B, ...node dims...] over data; [B, P, ...] over
    # data × graph
    node_spec = P(AXIS_DATA, AXIS_GRAPH)
    pe_spec = P(AXIS_DATA, AXIS_GRAPH, None)

    def put(arr, spec):
        return jax.device_put(arr, NamedSharding(mesh, spec))

    def put_shard(sh: EdgeShard) -> EdgeShard:
        kw = {k: put(getattr(sh, k), P(AXIS_DATA, AXIS_GRAPH))
              for k in _SHARD_ARRAYS}
        kw.update({k: getattr(sh, k) for k in _SHARD_STATIC})
        return EdgeShard(**kw)

    return ShardedBatch(
        node_mask=put(batch.node_mask, node_spec),
        pe=put(batch.pe, pe_spec),
        fwd=put_shard(batch.fwd),
    )


def _edge_specs_like(shard: EdgeShard) -> EdgeShard:
    """Spec tree for shard_map: every array shards its leading [B, P]
    dims (trailing dims replicated); the static wr fields copy the
    batch's values so the spec treedef matches the argument treedef."""
    kw = {k: P(AXIS_DATA, AXIS_GRAPH) for k in _SHARD_ARRAYS}
    kw.update({k: getattr(shard, k) for k in _SHARD_STATIC})
    return EdgeShard(**kw)


def halo_comm_bytes(batch: ShardedBatch, hidden: int = 256,
                    dtype_bytes: int = 2) -> Dict[str, int]:
    """Analytic per-device per-layer ICI traffic of the halo design vs the
    all-gather design it replaced (PERFORMANCE.md scaling model).

    Halo: one gather all_to_all of P·H [b1h ‖ a2h] rows (compute dtype)
    out, one reduce all_to_all of P·H [Σσ·a3h ‖ Σσ] partial-sum rows
    (f32) back. All-gather: each direction gathered a full
    [N_pad, 2·hidden] table.
    """
    n_shards = batch.fwd.send_idx.shape[1]
    send_slots = int(batch.fwd.send_idx.shape[-1])  # P·H
    n_pad = batch.n_nodes_padded
    row = 2 * hidden * dtype_bytes
    return {
        "halo_bytes_per_layer": send_slots * (row + 2 * hidden * 4),
        "all_gather_bytes_per_layer": 2 * (n_pad - n_pad // n_shards) * row,
        "halo_rows": send_slots,
        "n_pad": n_pad,
    }


# ---------------------------------------------------------------------------
# sharded model
# ---------------------------------------------------------------------------


def _halo_exchange(
    x_loc: jax.Array,  # [N_local, W] locally-owned rows
    shard: Dict[str, jax.Array],
    n_shards: int,
    backend: Optional[str],
) -> jax.Array:
    """[N_local, W] → combined [N_local + P·H, W] (own rows ‖ halo rows).

    One gather of the boundary rows into a peer-major send buffer (VJP =
    sorted segment-sum over the host-built send CSR) + one ``all_to_all``
    (transposes to itself). Traffic ∝ edge cut, not N.
    """
    send_slots = shard["send_idx"].shape[0]
    if send_slots == 0:
        return x_loc
    n_local = x_loc.shape[0]
    sent = gather_by_endpoint(x_loc, shard["send_idx"], _send_csr(shard),
                              n_local, backend)
    h = send_slots // n_shards
    recv = jax.lax.all_to_all(
        sent.reshape(n_shards, h, x_loc.shape[-1]),
        AXIS_GRAPH, split_axis=0, concat_axis=0,
    )
    return jnp.concatenate([x_loc, recv.reshape(send_slots, x_loc.shape[-1])],
                           axis=0)


def _send_csr(shard: Dict[str, jax.Array]) -> CSR:
    return CSR(
        identity=False,
        order=shard["send_order"], inv_order=shard["send_inv_order"],
        offsets=shard["send_offsets"], segment_ids=shard["send_segment_ids"],
    )


def _halo_reduce(
    comb: jax.Array,  # [N_local + P·H, W] partial sums (combined layout)
    shard: Dict[str, jax.Array],
    n_shards: int,
    backend: Optional[str],
) -> jax.Array:
    """[N_local + P·H, W] partial sums → [N_local, W] complete sums: the
    transpose of ``_halo_exchange``.

    Halo slot (r, pos) on this device holds its partial contribution to
    global row R[(r, self)][pos], owned by peer r; one ``all_to_all``
    routes every slot to its owner, where the rows land in exactly the
    send-CSR's peer-major layout — so adding them into the local block is
    a sorted segment-sum over the host-built send CSR (scatter-free; its
    VJP is the send-buffer gather of ``_halo_exchange``).
    """
    from gnnome_tpu.ops.segment import segment_sum_csr

    send_slots = shard["send_idx"].shape[0]
    if send_slots == 0:
        return comb
    n_local = comb.shape[0] - send_slots
    local, halo = comb[:n_local], comb[n_local:]
    w = comb.shape[-1]
    h = send_slots // n_shards
    recv = jax.lax.all_to_all(
        halo.reshape(n_shards, h, w), AXIS_GRAPH, split_axis=0, concat_axis=0,
    )
    remote = segment_sum_csr(
        recv.reshape(send_slots, w), _send_csr(shard), n_local,
        backend=backend,
    )
    return local + remote.astype(local.dtype)


def _ref_csr(shard: Dict[str, jax.Array]) -> CSR:
    """CSR over the combined [N_local + P·H] table keyed by ``ref``: the
    transpose layout whose sorted segment-sum is every combined-table
    gather's VJP, carrying the ref band plans for the forward."""
    return CSR(
        identity=False,
        order=shard["ref_order"], inv_order=shard["ref_inv_order"],
        offsets=shard["ref_offsets"], segment_ids=shard["ref_segment_ids"],
        key_plan=shard.get("_ref_plan"),
        order_plan=shard.get("_ref_order_plan"),
        inv_plan=shard.get("_ref_inv_plan"),
        expand_plan=shard.get("_ref_expand_plan"),
        # canonical-order key ids + bands + streaming plan: every
        # transpose reduction over this CSR takes the permutation-free
        # (streaming when supported) path, and the dual-key streaming
        # gate-front backward can key its src window on ref ids
        key_canonical=shard.get("ref_canonical"),
        canon_lo=shard.get("canon_lo"),
        canon_hi=shard.get("canon_hi"),
        canon_banded=bool(shard.get("_rev_ok", False)),
        stream_safe=shard.get("ref_stream"),
        stream_w=shard.get("_ref_stream_w", 0),
    )


def _ref_gather(
    table: jax.Array,  # [N_local + P·H, W] combined endpoint table
    shard: Dict[str, jax.Array],
    backend: Optional[str],
) -> jax.Array:
    """Per-edge gather of the non-keyed endpoint's row; VJP = sorted
    segment-sum over the combined table (scatter-free)."""
    return gather_by_endpoint(table, shard["ref"], _ref_csr(shard),
                              table.shape[0], backend)


def _key_gather(
    values: jax.Array,  # [N_local, W]
    shard: Dict[str, jax.Array],
    backend: Optional[str],
) -> jax.Array:
    """Per-edge gather of the keyed (locally-owned) endpoint's row; VJP =
    the local identity-CSR segment-sum."""
    csr = _local_csr(shard["key_local"], shard["offsets"],
                     shard.get("_key_plan"), shard.get("key_stream"),
                     shard.get("_key_stream_w", 0))
    # padded edges carry PAD_SEGMENT — clamp the *gather* index to a real
    # row (their values are dropped by masks/segment-ids downstream); the
    # key plan is built over exactly this clamped array
    safe = jnp.where(shard["key_local"] < values.shape[0],
                     shard["key_local"], 0)
    return gather_by_endpoint(values, safe, csr, values.shape[0], backend)


def _local_csr(key_local: jax.Array, offsets: jax.Array, plan=None,
               stream=None, stream_w: int = 0) -> CSR:
    """Local identity-order CSR for a shard's (sorted) edge slice.

    ``plan`` (over the clamped key array) serves as both the key plan
    (forward gathers + fused-op cotangent gathers) and the expand plan
    (the sorted segment-sum's VJP gather) — for an identity CSR the key
    array in canonical order IS the sorted segment-id array, exactly as in
    ``core.graph.build_graph``. ``stream``/``stream_w`` route this CSR's
    segment-sums through the streaming kernel (EdgeShard.key_stream)."""
    e = key_local.shape[0]
    iota = jnp.arange(e, dtype=jnp.int32)
    return CSR(identity=True, order=iota, inv_order=iota, offsets=offsets,
               segment_ids=key_local, expand_plan=plan, key_plan=plan,
               stream_safe=stream, stream_w=stream_w)


def _apply_bn(x, mean, var, scale, bias, eps=1e-5):
    out = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + eps)
    return (out * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def _shard_fused_supported(shard: Dict[str, jax.Array], d: int, itemsize: int,
                           backend: Optional[str]) -> bool:
    """True when this edge shard can run the round-2 fused kernel suite
    (gate-front + gather-fused epilog) instead of the composed
    gather/add/matmul lowering: pallas backend, covering band plans for
    both the local key ids and the combined-table ref ids, and window
    VMEM within the kernels' budgets (same formulas as
    ``ops.segment.gate_front_supported`` / ``epilog_gather_supported``;
    the edge bucket is a 1024-multiple by construction)."""
    from gnnome_tpu.ops.segment import _fusion_level, default_backend

    backend = backend or default_backend()
    kp = shard.get("_key_plan")
    rp = shard.get("_ref_plan")
    if not (
        _fusion_level() >= 2
        and backend in ("pallas", "pallas_interpret")
        and kp is not None and kp.ok and rp is not None and rp.ok
        and shard["key_local"].shape[0] % 1024 == 0
    ):
        return False
    # gate-front double-buffers 2 windows per side; epilog budget mirrors
    # epilog_gather_supported (group is 1 for shard plans)
    gate_front_bytes = 2 * 2 * (kp.wr + rp.wr) * max(d, 128) * itemsize
    epilog_bytes = 2 * (8 // rp.group) * 2 * rp.wr * max(d, 128) * itemsize
    return gate_front_bytes <= 8_000_000 and epilog_bytes <= 5_500_000


def _sharded_gated_gcn_layer(
    lp: Dict,
    h_loc: jax.Array,  # [N/P, D]
    e: jax.Array,  # [E_b, D] edge state (ONE per edge)
    fwd: Dict[str, jax.Array],
    node_mask_loc: jax.Array,
    n_shards: int,
    batch_norm: bool,
    backend: Optional[str],
    eps: float = 1e-6,
) -> Tuple[jax.Array, jax.Array]:
    """One gate, one edge state: the fwd/bwd gate tensors are the same
    expression in the reference's live path
    (``layers/gated_gcn_full.py:120-143``), so each edge computes its gate
    once on its dst-owner shard. The forward aggregation is a local sorted
    segment-sum; the reverse aggregation partial-sums σ·a3h[dst] into the
    combined [N_local + P·H] table keyed by ``ref`` and returns the halo
    partials to their owners (``_halo_reduce``)."""
    h_in = h_loc
    d = h_loc.shape[-1]
    n_local = h_loc.shape[0]
    itemsize = h_loc.dtype.itemsize
    fused = batch_norm and _shard_fused_supported(fwd, d, itemsize, backend)
    # issue the halo exchange first: it depends only on B1/A2, so XLA's
    # latency-hiding scheduler can overlap the all_to_all with the
    # remaining local projections and gate math
    b1h = linear(lp["B1"], h_loc)
    a2h = linear(lp["A2"], h_loc)
    b1a2 = jnp.concatenate([b1h, a2h], axis=-1)
    src_tab = _halo_exchange(b1a2, fwd, n_shards, backend)  # [n_comb, 2D]
    b2h = linear(lp["B2"], h_loc)
    a3h = linear(lp["A3"], h_loc)
    a1 = linear(lp["A1"], h_loc)

    csr_f = _local_csr(fwd["key_local"], fwd["offsets"], fwd.get("_key_plan"),
                       fwd.get("key_stream"), fwd.get("_key_stream_w", 0))
    rcsr = _ref_csr(fwd)
    n_comb = src_tab.shape[0]
    key_pad = fwd["key_local"]  # PAD_SEGMENT on padded edges
    ref_key = jnp.where(fwd["mask"], fwd["ref"], PAD_SEGMENT)

    if fused:
        # Single-chip fused kernel suite under shard_map: gate-front fuses
        # BOTH endpoint gathers (combined-table ref side banded + local key
        # side banded) with the in-kernel B3 projection; the gather-fused
        # epilog selects the a2h[src] value rows from banded VMEM windows
        # of src_tab — no pregathered [E, D] endpoint tables, b3e, or XLA
        # add chains exist in HBM. BN moments stay outside the kernel:
        # per-shard real-edge counts differ across ranks, so the kernel's
        # static-count moment mask cannot apply; masked_moments reads the
        # gate once and psums.
        from gnnome_tpu.ops.segment import (
            fused_gate_front,
            fused_gate_sigma_gather,
        )

        safe_key = jnp.where(key_pad < n_local, key_pad, 0)
        gate, _ = fused_gate_front(
            src_tab[:, :d], b2h, e, lp["B3"]["w"], lp["B3"]["b"],
            fwd["ref"], safe_key, (rcsr, csr_f), (n_comb, n_local), 0,
            backend,
        )
        a2_src = None
    else:
        sg = _ref_gather(src_tab, fwd, backend)  # [E_b, 2D] = [b1_src ‖ a2_src]
        b2_dst = _key_gather(b2h, fwd, backend)
        gate = sg[:, :d] + b2_dst + linear(lp["B3"], e)
        a2_src = sg[:, d:]

    if batch_norm:
        from gnnome_tpu.ops.segment import fused_gate_sigma_aggregate

        # edge-BN statistics: each real edge exactly once, psum over the
        # mesh; the folded affine + relu + residual + σ + both forward
        # segment-sums run in the gate-epilog fused kernel — one pass.
        mean, var = masked_moments(gate, fwd["mask"], axis_name=AXIS_GRAPH)
        inv = jax.lax.rsqrt(var + 1e-5)
        scale2 = inv * lp["norm_e"]["scale"].astype(jnp.float32)
        bias2 = lp["norm_e"]["bias"].astype(jnp.float32) - mean * scale2
        affine = jnp.stack([scale2, bias2])

        if fused:
            agg_f, e_new = fused_gate_sigma_gather(
                gate, e, src_tab[:, d:], affine, (key_pad, fwd["ref"]),
                csr_f, rcsr, n_local, backend,
            )
        else:
            agg_f, e_new = fused_gate_sigma_aggregate(
                gate, e, a2_src, affine, key_pad, csr_f, n_local, backend,
            )
    else:
        from gnnome_tpu.ops.norm import masked_layer_norm
        from gnnome_tpu.ops.segment import _fused_sigma_aggregate

        gate = masked_layer_norm(gate, lp["norm_e"]["scale"], lp["norm_e"]["bias"])
        e_new = (jax.nn.relu(gate) + e).astype(e.dtype)
        agg_f = _fused_sigma_aggregate(
            e_new, a2_src, key_pad, csr_f, n_local, backend
        )

    h_fwd = agg_f[:, :d] / (agg_f[:, d:] + eps)

    # reverse aggregation (the ``dgl.reverse`` direction,
    # ``layers/gated_gcn_full.py:133-143``): node j sums σ(e_new)·a3h[i]
    # over its out-edges j→i. a3h[i] is local (i = dst = keyed endpoint);
    # the key j may be remote — partial-sum into the combined table and
    # return halo partials to their owners.
    from gnnome_tpu.ops.segment import (
        _fused_sigma_aggregate as _fsa,
        _fused_sigma_reverse_unsorted,
        default_backend,
    )

    kp = fwd.get("_key_plan")
    rp = fwd.get("_ref_plan")
    rbackend = backend or default_backend()
    if (
        fwd.get("_rev_ok", False)
        and rbackend in ("pallas", "pallas_interpret")
        and d % 128 == 0
        and kp is not None and kp.ok and rp is not None and rp.ok
        and 2 * (8 // kp.group) * 2 * kp.wr * max(d, 128) * itemsize
        <= 5_500_000
    ):
        # permutation-free: stream e_new in the shard's canonical
        # (dst-sorted) order and one-hot on the UNSORTED ref key — the
        # ref sort, its order/inv window streams, and the separate
        # a3h[dst] gather do not exist on this path (the single-chip
        # reverse-unsorted kernel over the combined table)
        safe_key2 = jnp.where(key_pad < n_local, key_pad, 0)
        csr_rev = CSR(
            identity=False,
            order=fwd["ref_order"], inv_order=fwd["ref_inv_order"],
            offsets=fwd["ref_offsets"], segment_ids=fwd["ref_segment_ids"],
            key_plan=rp, canon_lo=fwd["canon_lo"], canon_hi=fwd["canon_hi"],
            canon_banded=True,
        )
        comb = _fused_sigma_reverse_unsorted(
            a3h, e_new, ref_key, safe_key2, csr_rev, csr_f, n_comb, backend,
        )
    else:
        a3_dst = _key_gather(a3h, fwd, backend)
        comb = _fsa(e_new, a3_dst, ref_key, rcsr, n_comb, backend)
    agg_b = _halo_reduce(comb, fwd, n_shards, backend)
    h_bwd = agg_b[:, :d] / (agg_b[:, d:] + eps)

    # aggregations accumulate f32; return to the compute dtype
    h = a1 + h_fwd.astype(h_in.dtype) + h_bwd.astype(h_in.dtype)
    if batch_norm:
        mean, var = masked_moments(h, node_mask_loc, axis_name=AXIS_GRAPH)
        h = _apply_bn(h, mean, var, lp["norm_h"]["scale"], lp["norm_h"]["bias"])
    else:
        from gnnome_tpu.ops.norm import masked_layer_norm

        h = masked_layer_norm(h, lp["norm_h"]["scale"], lp["norm_h"]["bias"])
    h = (jax.nn.relu(h) + h_in).astype(h_in.dtype)
    return h, e_new


def sharded_forward(
    params: Dict,
    pe_loc: jax.Array,
    node_mask_loc: jax.Array,
    fwd: Dict[str, jax.Array],
    n_shards: int,
    batch_norm: bool = True,
    backend: Optional[str] = None,
    remat: str = "layer",  # 'none' | 'layer' | 'group' | 'unroll_group'
    compute_dtype: str = "float32",
    remat_group: int = 4,
) -> jax.Array:
    """Per-shard forward; returns fwd-shard edge logits [E_b].

    ``remat`` mirrors the single-device model (models/model.py). The
    'group' mode nests two scans, which hits a shard_map × nested-scan
    compile pathology on the current TPU toolchain (PERFORMANCE.md);
    'unroll_group' provides the same O(L/G + G) activation memory with a
    Python-unrolled outer loop and is the recommended sharded setting.
    """
    if isinstance(remat, bool):  # backward compat with the v2 signature
        remat = "layer" if remat else "none"
    if compute_dtype in ("bfloat16", "bf16"):
        cdt = jnp.bfloat16
        params = jax.tree_util.tree_map(
            lambda x: x.astype(cdt) if x.dtype == jnp.float32 else x, params
        )
        pe_loc = pe_loc.astype(cdt)
        fwd = dict(fwd, e_feat=fwd["e_feat"].astype(cdt))

    h = linear(params["linear_pe"], pe_loc)

    e = jax.nn.relu(linear(params["linear1_edge"], fwd["e_feat"]))
    e = linear(params["linear2_edge"], e)

    def layer_fn(lp, carry):
        h, e = carry
        return _sharded_gated_gcn_layer(
            lp, h, e, fwd, node_mask_loc, n_shards, batch_norm, backend,
        )

    n_layers = len(params["layers"])
    if remat == "unroll_group":
        def group_fn(group_params, h, e):
            for lp in group_params:
                h, e = layer_fn(lp, (h, e))
            return h, e

        g = remat_group if n_layers % remat_group == 0 else 1
        # store-tail (models/model.py): the last `tail` layers stay
        # uncheckpointed — their backward runs first, so the stored
        # residuals die before any group replay; saves `tail` forward
        # replays per step at short-lived extra HBM
        from gnnome_tpu.models.model import _resolve_store_tail

        tail = _resolve_store_tail(
            e.shape[0], h.shape[0], h.shape[-1], h.dtype.itemsize, g,
            n_layers)
        cut = n_layers - tail
        ckpt_group = jax.checkpoint(group_fn)
        for i in range(0, cut, g):
            h, e = ckpt_group(params["layers"][i : min(i + g, cut)], h, e)
        for lp in params["layers"][cut:]:
            h, e = layer_fn(lp, (h, e))
    else:
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *params["layers"]
        )

        def body(carry, lp):
            return layer_fn(lp, carry), None

        if remat in ("layer", "group"):
            body = jax.checkpoint(body)
        if remat == "group" and n_layers % remat_group == 0 and n_layers > remat_group:
            groups = n_layers // remat_group
            grouped = jax.tree_util.tree_map(
                lambda x: x.reshape(groups, remat_group, *x.shape[1:]), stacked
            )

            def group_body(carry, glp):
                out, _ = jax.lax.scan(body, carry, glp)
                return out, None

            (h, e), _ = jax.lax.scan(
                jax.checkpoint(group_body), (h, e), grouped
            )
        else:
            (h, e), _ = jax.lax.scan(body, (h, e), stacked)

    # score head, split-matmul form (models/model.py score_predictor):
    # project locally (width hidden_edge_scores « D), halo-exchange the
    # projected src rows, gather per edge — still cut-proportional comm.
    d = h.shape[-1]
    w1, bias1 = params["score1"]["w"], params["score1"]["b"]
    h_src_proj = jnp.dot(h, w1[:d], preferred_element_type=h.dtype)
    h_dst_proj = jnp.dot(h, w1[d : 2 * d], preferred_element_type=h.dtype)
    src_proj_tab = _halo_exchange(h_src_proj, fwd, n_shards, backend)
    pre = (
        _ref_gather(src_proj_tab, fwd, backend)
        + _key_gather(h_dst_proj, fwd, backend)
        + jnp.dot(e, w1[2 * d :], preferred_element_type=e.dtype)
        + bias1
    )
    hidden = jax.nn.relu(pre)
    return linear(params["score2"], hidden)[:, 0].astype(jnp.float32)


def make_sharded_loss(
    mesh: Mesh, batch_norm: bool = True, remat: str = "layer",
    backend: Optional[str] = None, compute_dtype: str = "float32",
    remat_group: int = 4,
):
    """Builds loss(params, batch, pos_weight) -> scalar, sharded over mesh."""
    n_shards = mesh.shape[AXIS_GRAPH]

    def shard_fn(params, node_mask, pe, fwd_t, pos_weight):
        from gnnome_tpu.ops.banded import BandPlan

        # squeeze the per-shard leading [1(data), 1(graph)] dims and
        # reassemble this rank's band plans (static wr, local w0 slice)
        node_mask = node_mask[0]
        pe = pe[0]

        def shard_dict(t: EdgeShard) -> Dict[str, jax.Array]:
            d = {k: getattr(t, k)[0, 0] for k in _SHARD_ARRAYS}
            for w0_f, wr_f, gr_f, key in _PLAN_FIELDS:
                wr = getattr(t, wr_f)
                w0 = d.pop(w0_f)
                d[key] = (
                    BandPlan(ok=True, wr=wr, w0=w0, group=getattr(t, gr_f))
                    if wr > 0 else None
                )
            d["_rev_ok"] = t.rev_ok
            d["_key_stream_w"] = t.key_stream_w
            d["_ref_stream_w"] = t.ref_stream_w
            return d

        fwd = shard_dict(fwd_t)

        logits = sharded_forward(
            params, pe, node_mask, fwd, n_shards,
            batch_norm=batch_norm, backend=backend, remat=remat,
            compute_dtype=compute_dtype, remat_group=remat_group,
        )
        from jax.nn import log_sigmoid

        y = fwd["y"]
        m = fwd["mask"].astype(jnp.float32)
        per_edge = -(
            pos_weight * y * log_sigmoid(logits)
            + (1.0 - y) * log_sigmoid(-logits)
        )
        num = jax.lax.psum(jnp.sum(per_edge * m), AXIS_GRAPH)
        den = jax.lax.psum(jnp.sum(m), AXIS_GRAPH)
        loss = num / jnp.maximum(den, 1.0)
        loss = jax.lax.pmean(loss, AXIS_DATA)
        return loss[None]

    def loss_fn(params, batch: ShardedBatch, pos_weight):
        out = shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(
                P(),  # params replicated
                P(AXIS_DATA, AXIS_GRAPH),  # node_mask
                P(AXIS_DATA, AXIS_GRAPH, None),  # pe
                _edge_specs_like(batch.fwd),
                P(),
            ),
            out_specs=P(AXIS_DATA),
            check_vma=False,
        )(params, batch.node_mask, batch.pe, batch.fwd, pos_weight)
        return out.mean()

    return loss_fn


def replicate_to_mesh(tree, mesh: Mesh):
    """device_put every array leaf replicated over ``mesh`` (spec ``P()``).

    Call this on params/opt_state BEFORE the first sharded-step call: the
    step's outputs carry mesh ``NamedSharding``s, so feeding them back into
    a step whose first call saw plain single-device arrays changes the
    input signature and triggers a second, SILENT compile mid-loop — on
    the remote-AOT TPU toolchain that is minutes of wall clock that
    benchmarks misread as a 10-70x per-step slowdown. No-op (same
    buffers) when the leaves already carry this sharding."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def make_sharded_train_step(
    mesh: Mesh, batch_norm: bool = True, remat: str = "layer",
    backend: Optional[str] = None, compute_dtype: str = "float32",
    remat_group: int = 4,
):
    """Full distributed training step: loss + grads (reduced over the mesh)
    + Adam update. Params live replicated; batch sharded data×graph.

    The returned callable pins params/opt_state to the replicated mesh
    sharding on entry (``replicate_to_mesh``), so chained use
    (``p, s, l = step(p, s, ...)``) keeps ONE jit signature from the first
    call on — see replicate_to_mesh's docstring for why that matters."""
    import optax

    from gnnome_tpu.train.loop import make_optimizer

    loss_fn = make_sharded_loss(mesh, batch_norm=batch_norm, remat=remat,
                                backend=backend, compute_dtype=compute_dtype,
                                remat_group=remat_group)
    opt = make_optimizer()

    @functools.partial(jax.jit, donate_argnames=("params", "opt_state"))
    def _step(params, opt_state, batch: ShardedBatch, pos_weight):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, pos_weight)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def step(params, opt_state, batch: ShardedBatch, pos_weight):
        # no-op for arrays already replicated on this mesh (step outputs)
        params = replicate_to_mesh(params, mesh)
        opt_state = replicate_to_mesh(opt_state, mesh)
        return _step(params, opt_state, batch, pos_weight)

    return step
