"""Pallas TPU kernel: sorted segment-sum as a blocked one-hot matmul.

This is the framework's core sparse primitive — the scatter-add half of the
SpMM pair that DGL's ``update_all(fn.u_mul_e(...), fn.sum(...))`` performs in
the reference (``layers/gated_gcn_full.py:128-129,141-142``). Scatter is the
one op XLA lowers poorly on TPU, so we own it:

  * Edges are pre-sorted by their key node (CSR order), so each node block
    of 128 rows touches a *contiguous* range of edge chunks.
  * The grid runs over node blocks; per block we stream that block's edge
    chunks (1024 edges each) HBM→VMEM with double-buffered async DMA.
  * The within-chunk reduction runs on the MXU as 8 one-hot matmuls
    ``onehot[BN, 128] @ data[128, D]`` where
    ``onehot[n, c] = (segment_id[c] == block_base + n)``. Segment ids of
    neighboring blocks (or padding, id == 2^30) never match, so no masking
    is needed and chunk overlap at block boundaries is harmless.
  * Segment ids live in HBM as ``[E/128, 128]`` so every ids DMA moves an
    8-sublane-aligned ``[8, 128]`` tile (Mosaic requires dim-0 slices in
    multiples of 8).

The MXU does the irregular reduction as dense math — the TPU-idiomatic
answer to a gather/scatter workload (cf. "Fast Training of Sparse GNNs on
Dense Hardware", PAPERS.md).

Backward pass of a segment-sum is a row gather, expressed directly in XLA.
"""
from __future__ import annotations

import functools
import os

import jax

from gnnome_tpu.core.graph import PAD_SEGMENT
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_NODES = 128  # minimum node-block height (num_segments is % 128)
LANE = 128
SUBCHUNKS = 8
CHUNK_EDGES = SUBCHUNKS * LANE  # 1024 edges per DMA chunk


def _pick_block_nodes(num_segments: int, prefer: int) -> int:
    """Largest node-block height <= ``prefer`` dividing ``num_segments``.

    The edge stream is partitioned by node block; a block whose edge range
    straddles a 1024-edge DMA chunk re-loads (and re-processes) that
    chunk. At the assembly graphs' ~6.7 mean degree a 128-node block spans
    ~0.8 chunks, so nearly EVERY chunk was loaded twice -- measured at 1M
    edges (v5e): the fused gate-gather pass drops 15.1 -> 10.8 ms at
    bn=512 even though the one-hot accumulate FLOPs grow 4x, and the plain
    segment-sum bottoms at bn=256 (4.3 -> 3.7 ms; it has half the accs of
    the fused kernels and re-rises at 512). NODE_PAD_MULTIPLE is 512 so
    single-chip graphs always divide; odd multiples (sharded locals,
    custom pads) degrade gracefully to 256/128. ``GNNOME_BLOCK_NODES``
    caps ``prefer`` for A/B sweeps (microbench_passes.py)."""
    cap = os.environ.get("GNNOME_BLOCK_NODES")
    if cap:
        # explicit override (raise OR lower): block-major pipelines restart
        # per node block, so larger blocks amortize the restart — with the
        # subtile accumulate the per-chunk math cost no longer grows with
        # the block (sweepable up to 1024)
        prefer = int(cap)
    for bn in (1024, 512, 256, 128):
        if bn <= prefer and num_segments % bn == 0:
            return bn
    return BLOCK_NODES


def _policy_sub(num_segments: int, e_pad: int, bn: int) -> int:
    """Span-keyed subtile height (per-graph auto policy): the expected
    in-block id span of a 1024-edge chunk is 1024·N/E rows — for sorted
    ids exactly, for banded-unsorted ids approximately. Pick the smallest
    supported window with ~20% headroom so the narrow branch fires on
    nearly every chunk; 0 (full-block accumulate) when typical chunks
    would overflow every window (low-degree chain-like graphs, where the
    subtile's second code path would be dead weight). Validated against
    the measured sweeps at 200k and 1M edges (scripts/sweep_epilog.py,
    scripts/sweep_segsum.py)."""
    span = CHUNK_EDGES * num_segments / max(e_pad, 1)
    for sub in (128, 192, 256):
        if span * 1.2 <= sub and sub < bn:
            return sub
    return 0


def _env_sub(name: str, policy: int) -> int:
    """Subtile-window height knob: unset (or the legacy "1") defers to the
    span-keyed per-graph policy; explicit values are rounded down to
    sublane (8-row) alignment — f32 VMEM stores need it (0 disables the
    subtile path)."""
    raw = os.environ.get(name)
    if raw is None or raw == "1":
        return policy
    sub = int(raw)
    return max(sub - sub % 8, 0)




def _pick_batch(name: str, *divisor_constraints: int,
                default: str = "4") -> int:
    """Resolve a subrow-batching knob: the largest batch <= the env value
    (default 4) that divides every constraint (band-plan groups / the
    8-subrow chunk). Batched rows share one window pair, so the batch
    must divide the plan group; 1 disables batching (the original
    per-subrow form). Malformed env values fall back to the default
    rather than raising at trace time."""
    raw = os.environ.get(name, default)
    try:
        want = max(int(raw), 1)
    except ValueError:
        want = max(int(default), 1)
    for batch in range(want, 0, -1):
        if all(c % batch == 0 for c in divisor_constraints):
            return batch
    return 1


def _wide_onehot(mk, batch: int):
    """[rows, batch·LANE] bf16 one-hot: lane-concat of ``batch``
    per-subrow compare results (``mk(j)`` -> bool[rows, LANE]).

    The compares are COMPUTED values at canonical sublane offset 0, so
    the concat is a pure lane-placement op; concatenating the sliced
    [1, LANE] ids rows instead hands Mosaic operands at offsets
    {0,0},{1,0},... and its tpu.concatenate rejects mismatched offsets
    on the non-concat dimension."""
    parts = [mk(j).astype(jnp.bfloat16) for j in range(batch)]
    return parts[0] if batch == 1 else jnp.concatenate(parts, axis=1)


def _acc_matmul(acc, onehot_bf16, tile):
    """acc += onehot @ tile with dtype-appropriate exactness: single pass
    for bf16 tiles; 3-term bf16 split (~f32 exact) for f32 tiles."""
    if tile.dtype == jnp.bfloat16:
        return acc + jnp.dot(onehot_bf16, tile, preferred_element_type=jnp.float32)
    data_hi = tile.astype(jnp.bfloat16)
    rem = tile - data_hi.astype(jnp.float32)
    data_mid = rem.astype(jnp.bfloat16)
    data_lo = (rem - data_mid.astype(jnp.float32)).astype(jnp.bfloat16)
    for part in (data_hi, data_mid, data_lo):
        acc = acc + jnp.dot(onehot_bf16, part, preferred_element_type=jnp.float32)
    return acc


def _segment_sum_kernel(
    chunk_lo_ref,  # SMEM int32[nblocks]  (scalar prefetch)
    chunk_hi_ref,  # SMEM int32[nblocks]  (scalar prefetch)
    data_hbm,  # ANY  f32[E, D]
    ids_hbm,  # ANY  int32[E // LANE, LANE]
    out_ref,  # VMEM f32[BN, D] block
    data_buf,  # VMEM f32[2, CHUNK, D] scratch
    ids_buf,  # VMEM int32[2, SUBCHUNKS, LANE] scratch
    sems,  # DMA sems [2, 2]
    *,
    block_nodes: int,
    out_dim: int,
):
    i = pl.program_id(0)
    lo = chunk_lo_ref[i]
    hi = chunk_hi_ref[i]
    node_ids = i * block_nodes + jax.lax.broadcasted_iota(
        jnp.int32, (block_nodes, 1), 0
    )

    def data_dma(slot, c):
        return pltpu.make_async_copy(
            data_hbm.at[pl.ds(c * CHUNK_EDGES, CHUNK_EDGES), :],
            data_buf.at[slot],
            sems.at[slot, 0],
        )

    def ids_dma(slot, c):
        return pltpu.make_async_copy(
            ids_hbm.at[pl.ds(c * SUBCHUNKS, SUBCHUNKS), :],
            ids_buf.at[slot],
            sems.at[slot, 1],
        )

    @pl.when(lo < hi)
    def _():
        data_dma(0, lo).start()
        ids_dma(0, lo).start()

    def body(c_rel, acc):
        c = lo + c_rel
        slot = jax.lax.rem(c_rel, 2)
        nxt = jax.lax.rem(c_rel + 1, 2)

        @pl.when(c + 1 < hi)
        def _():
            data_dma(nxt, c + 1).start()
            ids_dma(nxt, c + 1).start()

        data_dma(slot, c).wait()
        ids_dma(slot, c).wait()

        # NB: batching the 8 per-subrow selector matmuls into one
        # [BN, CHUNK] x [CHUNK, D] dot via a lane-concat of the one-hots
        # was tried and measured SLOWER (3.67 -> 3.9 ms at 1M edges) —
        # the lane-dimension concatenate costs more VPU work than the
        # extra dot dispatches, which Mosaic pipelines fine.
        for r in range(SUBCHUNKS):
            ids_row = ids_buf[slot, r : r + 1, :]  # [1, LANE]
            onehot = (ids_row == node_ids).astype(jnp.bfloat16)  # [BN, LANE]
            tile = data_buf[slot, r * LANE : (r + 1) * LANE, :]
            acc = _acc_matmul(acc, onehot, tile)
        return acc

    acc = jnp.zeros((block_nodes, out_dim), jnp.float32)
    acc = jax.lax.fori_loop(0, hi - lo, body, acc)
    out_ref[:] = acc.astype(out_ref.dtype)


def _segment_sum_sub_kernel(
    chunk_lo_ref,  # SMEM int32[nblocks]  (scalar prefetch)
    chunk_hi_ref,  # SMEM int32[nblocks]  (scalar prefetch)
    data_hbm,  # ANY  [E, D]
    ids_hbm,  # ANY  int32[E // LANE, LANE]
    out_ref,  # VMEM f32[BN, D] block
    data_buf,  # VMEM [slots, CHUNK, D] scratch
    ids_buf,  # VMEM int32[slots, SUBCHUNKS, LANE] scratch
    sems,  # DMA sems [slots, 2]
    *,
    block_nodes: int,
    out_dim: int,
    sub: int,
    slots: int,
    split: bool,
):
    """``_segment_sum_kernel`` with a SUBTILE accumulate and a deeper DMA
    pipeline. Per 1024-edge chunk the in-BLOCK id span is derived on the
    VPU from the ids tile itself (min/max of ids clamped to the block), so
    it needs no host-side per-chunk metadata and works for BOTH callers:
    sorted ids (identity CSR) and unsorted canonical ids (the
    permutation-free transpose reduction), where a chunk's ids are not
    sorted but — on banded graphs — still span a narrow row range. When
    the span fits ``sub`` rows the 8 one-hot accumulates run on a
    [sub, LANE] window at a dynamic 8-aligned offset into the out block
    (``block_nodes/sub``× less accumulate MXU work and VMEM RMW traffic);
    chunks with no in-block ids are skipped outright — the unsorted
    caller's ~1.7× chunk-duplication factor becomes DMA-only. ``slots``
    deepens the chunk pipeline beyond double-buffering; ``split`` breaks
    the 8-dot accumulate dependency chain into two interleaved chains."""
    i = pl.program_id(0)
    lo = chunk_lo_ref[i]
    hi = chunk_hi_ref[i]
    blo = i * block_nodes
    node_ids = blo + jax.lax.broadcasted_iota(
        jnp.int32, (block_nodes, 1), 0
    )
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (sub, 1), 0)

    def data_dma(slot, c):
        return pltpu.make_async_copy(
            data_hbm.at[pl.ds(c * CHUNK_EDGES, CHUNK_EDGES), :],
            data_buf.at[slot],
            sems.at[slot, 0],
        )

    def ids_dma(slot, c):
        return pltpu.make_async_copy(
            ids_hbm.at[pl.ds(c * SUBCHUNKS, SUBCHUNKS), :],
            ids_buf.at[slot],
            sems.at[slot, 1],
        )

    for k in range(slots - 1):
        @pl.when(lo + k < hi)
        def _(k=k):
            data_dma(k, lo + k).start()
            ids_dma(k, lo + k).start()

    out_ref[...] = jnp.zeros((block_nodes, out_dim), jnp.float32)

    def accumulate(acc, ids_slot_ref, data_slot_ref, row_ids):
        acc2 = jnp.zeros_like(acc) if split else None
        for r in range(SUBCHUNKS):
            ids_row = ids_slot_ref[r : r + 1, :]  # [1, LANE]
            onehot = (ids_row == row_ids).astype(jnp.bfloat16)
            tile = data_slot_ref[r * LANE : (r + 1) * LANE, :]
            if split and r % 2 == 1:
                acc2 = _acc_matmul(acc2, onehot, tile)
            else:
                acc = _acc_matmul(acc, onehot, tile)
        return acc + acc2 if split else acc

    def body(c_rel, carry):
        c = lo + c_rel
        slot = jax.lax.rem(c_rel, slots)

        @pl.when(c + slots - 1 < hi)
        def _():
            nxt = jax.lax.rem(c_rel + slots - 1, slots)
            data_dma(nxt, c + slots - 1).start()
            ids_dma(nxt, c + slots - 1).start()

        data_dma(slot, c).wait()
        ids_dma(slot, c).wait()

        idsv = ids_buf[slot]  # [SUBCHUNKS, LANE]
        inb = jnp.logical_and(idsv >= blo, idsv < blo + block_nodes)
        lo_id = jnp.min(jnp.where(inb, idsv, PAD_SEGMENT))
        hi_id = jnp.max(jnp.where(inb, idsv, -1))
        off = pl.multiple_of(
            jnp.clip(lo_id - blo, 0, block_nodes - sub) & ~7, 8)
        narrow = hi_id < blo + off + sub

        # hi_id < 0: no id of this chunk lands in the block (the unsorted
        # caller's duplicated-footprint chunks) — skip the math entirely
        @pl.when(jnp.logical_and(narrow, hi_id >= 0))
        def _():
            sub_ids = blo + off + sub_iota
            acc = accumulate(out_ref[pl.ds(off, sub), :],
                             ids_buf.at[slot], data_buf.at[slot], sub_ids)
            out_ref[pl.ds(off, sub), :] = acc

        @pl.when(jnp.logical_not(narrow))
        def _():
            acc = accumulate(out_ref[...], ids_buf.at[slot],
                             data_buf.at[slot], node_ids)
            out_ref[...] = acc

        return carry

    jax.lax.fori_loop(0, hi - lo, body, 0)


def _segsum_variant(num_segments: int, e_pad: int):
    """(sub, slots, split, prefer_bn): subtile height from the span-keyed
    per-graph policy (env-overridable), slot depth / split from the
    round-3/4 kernel sweeps (PERFORMANCE.md)."""
    bn0 = _pick_block_nodes(
        num_segments, int(os.environ.get("GNNOME_SEGSUM_BN", "512")))
    sub = _env_sub("GNNOME_SEGSUM_SUB", _policy_sub(num_segments, e_pad, bn0))
    slots = int(os.environ.get("GNNOME_SEGSUM_SLOTS", "4"))
    split = os.environ.get("GNNOME_SEGSUM_SPLIT", "0") == "1"
    if sub:
        bn = _pick_block_nodes(
            num_segments, int(os.environ.get("GNNOME_SEGSUM_BN", "512")))
        if sub >= bn:
            sub = 0
            bn = _pick_block_nodes(num_segments, 256)
    else:
        bn = _pick_block_nodes(num_segments, 256)
    return sub, max(slots, 2), split, bn


def _launch_segment_sum(data2d, ids_2d, chunk_lo, chunk_hi, num_segments,
                        bn, sub, slots, split, interpret):
    e_pad, d = data2d.shape
    nblocks = num_segments // bn
    if sub:
        kernel = functools.partial(
            _segment_sum_sub_kernel, block_nodes=bn, out_dim=d, sub=sub,
            slots=slots, split=split)
    else:
        kernel = functools.partial(
            _segment_sum_kernel, block_nodes=bn, out_dim=d)
        slots = 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # data stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # ids stay in HBM
        ],
        out_specs=pl.BlockSpec(
            (bn, d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((slots, CHUNK_EDGES, d), data2d.dtype),
            pltpu.VMEM((slots, SUBCHUNKS, LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((slots, 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_segments, d), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * e_pad * (sub or bn) * d,
            bytes_accessed=e_pad * d * data2d.dtype.itemsize
            + e_pad * 4 + num_segments * d * 4,
            transcendentals=0,
        ),
    )(chunk_lo, chunk_hi, data2d, ids_2d)


def _forward(
    data_sorted: jax.Array,
    segment_ids_sorted: jax.Array,
    offsets: jax.Array,
    num_segments: int,
    interpret: bool,
    stream_safe=None,
    stream_w: int = 0,
) -> jax.Array:
    e_pad, d = data_sorted.shape
    # HBM slices must be lane-aligned (128); pad narrow feature dims
    if d % LANE != 0:
        d_pad = ((d + LANE - 1) // LANE) * LANE
        data_sorted = jnp.pad(data_sorted, ((0, 0), (0, d_pad - d)))
        out = _forward(data_sorted, segment_ids_sorted, offsets,
                       num_segments, interpret, stream_safe, stream_w)
        return out[:, :d]
    if stream_safe is not None and stream_supported(num_segments, e_pad,
                                                    stream_w):
        ids_2d = segment_ids_sorted.reshape(e_pad // LANE, LANE)
        return _launch_segment_sum_stream(
            data_sorted, ids_2d, stream_safe, num_segments, stream_w,
            interpret)
    sub, slots, split, bn = _segsum_variant(num_segments, e_pad)
    ch = CHUNK_EDGES
    assert e_pad % ch == 0, f"edge count {e_pad} not a multiple of {ch}"
    assert num_segments % bn == 0, (
        f"node count {num_segments} not a multiple of {bn}"
    )

    # Per-node-block inclusive chunk ranges, derived from the CSR offsets.
    block_edge_lo = offsets[0:num_segments:bn]
    block_edge_hi = offsets[bn : num_segments + 1 : bn]
    chunk_lo = (block_edge_lo // ch).astype(jnp.int32)
    chunk_hi = ((block_edge_hi + ch - 1) // ch).astype(jnp.int32)

    ids_2d = segment_ids_sorted.reshape(e_pad // LANE, LANE)
    return _launch_segment_sum(data_sorted, ids_2d, chunk_lo, chunk_hi,
                               num_segments, bn, sub, slots, split,
                               interpret)


def segment_sum_unsorted_pallas(
    data_canonical: jax.Array,  # [E, D] edge data in CANONICAL order
    ids_canonical: jax.Array,  # int32[E] UNSORTED segment ids (PAD on pads)
    canon_lo: jax.Array,  # int32[N] min canonical position per node
    canon_hi: jax.Array,  # int32[N] max canonical position (incl.; -1 none)
    num_segments: int,
    interpret: bool = False,
    stream_safe=None,
    stream_w: int = 0,
) -> jax.Array:
    """Segment-sum WITHOUT the permute: stream canonical-order data and
    one-hot-accumulate on the unsorted ids. The one-hot never required
    sorted keys — only the per-block chunk ranges do, and on banded
    graphs (``CSR.canon_banded``) a node block's canonical footprint
    spans barely more chunks than its sorted footprint. This is the
    plain-sum sibling of ``fused_sigma_unsorted_pallas`` and reuses
    ``_segment_sum_kernel`` verbatim; it replaces permute_rows (order
    windows, ~3.7 ms at 1M edges) + sorted sum (3.9 ms) with one ~4.5 ms
    pass for every by_src transpose reduction in the backward."""
    e_pad, d = data_canonical.shape
    if d % LANE != 0:
        d_pad = ((d + LANE - 1) // LANE) * LANE
        data_canonical = jnp.pad(data_canonical, ((0, 0), (0, d_pad - d)))
        out = segment_sum_unsorted_pallas(
            data_canonical, ids_canonical, canon_lo, canon_hi,
            num_segments, interpret, stream_safe, stream_w)
        return out[:, :d]
    if stream_safe is not None and stream_supported(num_segments, e_pad,
                                                    stream_w):
        ids_2d = ids_canonical.reshape(e_pad // LANE, LANE)
        return _launch_segment_sum_stream(
            data_canonical, ids_2d, stream_safe, num_segments, stream_w,
            interpret)
    sub, slots, split, bn = _segsum_variant(num_segments, e_pad)
    ch = CHUNK_EDGES
    assert e_pad % ch == 0 and num_segments % bn == 0
    nblocks = num_segments // bn
    lo_b = canon_lo.reshape(nblocks, bn).min(axis=1)
    hi_b = canon_hi.reshape(nblocks, bn).max(axis=1)
    chunk_lo = (lo_b // ch).astype(jnp.int32)
    chunk_hi = jnp.where(hi_b >= 0, hi_b // ch + 1, 0).astype(jnp.int32)
    chunk_lo = jnp.minimum(chunk_lo, chunk_hi).astype(jnp.int32)
    ids_2d = ids_canonical.reshape(e_pad // LANE, LANE)
    return _launch_segment_sum(data_canonical, ids_2d, chunk_lo, chunk_hi,
                               num_segments, bn, sub, slots, split,
                               interpret)


STREAM_F = 128  # flush-block rows; NODE pads are multiples of 128


def _segment_sum_stream_kernel(
    meta_ref,  # SMEM int32[nchunks, 4]: (flush_tgt, zero_tgt, off, span)
    data_hbm,  # ANY  [E, D]
    ids_hbm,  # ANY  int32[E // LANE, LANE]
    out_hbm,  # ANY  f32[N, D] — written by flush DMAs only
    window,  # VMEM f32[W, D] sliding out-window (ring, phys = row % W)
    data_buf,  # VMEM [slots, CHUNK, D]
    ids_buf,  # VMEM int32[slots, SUBCHUNKS, LANE]
    sems,  # DMA sems [slots, 2]
    fsems,  # DMA sems [R] flush ring (R = W / F)
    *,
    nchunks: int,
    num_segments: int,
    w: int,
    sub: int,
    slots: int,
    out_dim: int,
    split: bool,
    batch: int = 1,
):
    """Edge-major streaming segment-sum: ONE pass over all chunks with a
    single `slots`-deep DMA pipeline (the block-major kernel restarts its
    pipeline at every node block — at assembly-graph degree that is a
    latency-exposed ~4-chunk pipeline ~300 times per call). Works for
    sorted ids AND banded-unsorted ids. All per-chunk control scalars
    (flush target, zero-frontier target, window offset, id span) are
    static per graph and precomputed by core/graph._stream_plan — the
    kernel reads them from SMEM scalar-prefetch, so the inner loop has no
    vector→scalar reduction round trip at all; the ids tile feeds only
    the one-hot compares.

    Ring discipline (F-row flush blocks, R = W/F flush semaphores):
    logical row r lives at phys row r % W. Invariants, host-verified by
    the _stream_plan simulation: zero-frontier − flush-base ≤ W always,
    so (a) zeroing block b implies flush(b−R) already started — its wait
    is well-defined — and (b) an accumulate never touches a phys row
    whose previous-generation flush hasn't been waited.

    ``batch > 1`` (GNNOME_SEGSUM_BATCH, a divisor of the 8-subrow chunk):
    lane-concatenated one-hot compares make each accumulate one wide
    matmul (contraction batch·128) instead of ``batch`` narrow ones —
    flush/zero state is per-chunk, so batching within the chunk is
    semantically free, but the wider contraction re-associates the f32
    sums, so the default stays 1 (bit-identity with the block-major
    fallback is test-pinned); opt in via the env knob."""
    assert SUBCHUNKS % batch == 0, batch
    nb = SUBCHUNKS // batch
    bl = batch * LANE
    F = STREAM_F
    R = w // F

    def data_dma(slot, c):
        return pltpu.make_async_copy(
            data_hbm.at[pl.ds(c * CHUNK_EDGES, CHUNK_EDGES), :],
            data_buf.at[slot],
            sems.at[slot, 0],
        )

    def ids_dma(slot, c):
        return pltpu.make_async_copy(
            ids_hbm.at[pl.ds(c * SUBCHUNKS, SUBCHUNKS), :],
            ids_buf.at[slot],
            sems.at[slot, 1],
        )

    def flush_copy(b_rows, phys):
        return pltpu.make_async_copy(
            window.at[pl.ds(pl.multiple_of(phys, F), F), :],
            out_hbm.at[pl.ds(pl.multiple_of(b_rows, F), F), :],
            fsems.at[jax.lax.rem(b_rows // F, R)],
        )

    for k in range(slots - 1):
        @pl.when(k < nchunks)
        def _(k=k):
            data_dma(k, k).start()
            ids_dma(k, k).start()

    sub_iota = (
        jax.lax.broadcasted_iota(jnp.int32, (sub, 1), 0) if sub else None
    )
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)

    def zero_block(_, zf):
        # reuse phys rows of block zf/F − R: wait its flush, then zero
        b = zf // F
        phys = pl.multiple_of(jax.lax.rem(zf, w), F)

        @pl.when(b >= R)
        def _():
            flush_copy((b - R) * F, phys).wait()

        window[pl.ds(phys, F), :] = jnp.zeros((F, out_dim), jnp.float32)
        return zf + F

    def flush_block(_, base):
        phys = pl.multiple_of(jax.lax.rem(base, w), F)
        flush_copy(base, phys).start()
        return base + F

    def accumulate(acc, row_ids, slot):
        acc2 = jnp.zeros_like(acc) if split else None
        for r in range(nb):
            onehot = _wide_onehot(
                lambda j: (ids_buf[slot, r * batch + j
                                   : r * batch + j + 1, :] == row_ids),
                batch)
            tile = data_buf[slot, r * bl : (r + 1) * bl, :]
            if split and r % 2 == 1:
                acc2 = _acc_matmul(acc2, onehot, tile)
            else:
                acc = _acc_matmul(acc, onehot, tile)
        return acc + acc2 if split else acc

    def body(c, carry):
        base, zf = carry
        slot = jax.lax.rem(c, slots)

        @pl.when(c + slots - 1 < nchunks)
        def _():
            nxt = jax.lax.rem(c + slots - 1, slots)
            data_dma(nxt, c + slots - 1).start()
            ids_dma(nxt, c + slots - 1).start()

        data_dma(slot, c).wait()
        ids_dma(slot, c).wait()

        off = meta_ref[c, 2]
        span = meta_ref[c, 3]

        # 1) extend the zero frontier to cover this chunk's rows
        zf = jax.lax.fori_loop(
            0, (jnp.maximum(meta_ref[c, 1], zf) - zf) // F, zero_block, zf)

        # 2) accumulate the chunk into the window
        if sub:
            phys_off = pl.multiple_of(jax.lax.rem(off, w), 8)
            narrow = jnp.logical_and(span <= sub, phys_off + sub <= w)

            @pl.when(jnp.logical_and(span > 0, narrow))
            def _():
                sub_ids = off + sub_iota
                acc = accumulate(window[pl.ds(phys_off, sub), :],
                                 sub_ids, slot)
                window[pl.ds(phys_off, sub), :] = acc

            wide_pred = jnp.logical_and(span > 0, jnp.logical_not(narrow))
        else:
            wide_pred = span > 0

        @pl.when(wide_pred)
        def _():
            # modulo one-hot over the whole window; PAD/invalid ids are
            # redirected to w, which matches no physical row
            idsv = ids_buf[slot]
            phys_ids = jnp.where(idsv < num_segments, idsv & (w - 1), w)
            acc2 = jnp.zeros_like(window[...]) if split else None
            acc = window[...]
            for r in range(nb):
                onehot = _wide_onehot(
                    lambda j: (phys_ids[r * batch + j
                                        : r * batch + j + 1, :] == w_iota),
                    batch)
                tile = data_buf[slot, r * bl : (r + 1) * bl, :]
                if split and r % 2 == 1:
                    acc2 = _acc_matmul(acc2, onehot, tile)
                else:
                    acc = _acc_matmul(acc, onehot, tile)
            window[...] = acc + acc2 if split else acc

        # 3) flush rows no future chunk can touch
        tgt = jnp.minimum(meta_ref[c, 0], zf)
        base = jax.lax.fori_loop(0, jnp.maximum(tgt - base, 0) // F,
                                 flush_block, base)
        return (base, zf)

    base, zf = jax.lax.fori_loop(
        0, nchunks, body, (jnp.int32(0), jnp.int32(0)))

    # epilogue: flush accumulated rows [base, zf), then zero+flush the
    # trailing (edge-less / padded) blocks up to num_segments
    base = jax.lax.fori_loop(0, (zf - base) // F, flush_block, base)

    def tail_block(_, carry):
        base, zf = carry
        zf = zero_block(0, zf)
        base = flush_block(0, base)
        return (base, zf)

    base, zf = jax.lax.fori_loop(
        0, (num_segments - zf) // F, tail_block, (base, zf))

    # wait the last min(R, B) outstanding flushes (earlier ones were waited
    # by the ring reuse in zero_block)
    b_total = num_segments // F
    for k in range(min(R, b_total)):
        b = b_total - 1 - k
        flush_copy(b * F, (b * F) % w).wait()


def _launch_segment_sum_stream(data2d, ids_2d, safe_tgt, num_segments, w,
                               interpret):
    e_pad, d = data2d.shape
    nchunks = e_pad // CHUNK_EDGES
    sub0 = _env_sub("GNNOME_SEGSUM_SUB",
                    _policy_sub(num_segments, e_pad, w))
    sub = sub0 if sub0 and sub0 < w else 0
    slots = max(int(os.environ.get("GNNOME_SEGSUM_SLOTS", "4")), 2)
    split = os.environ.get("GNNOME_SEGSUM_SPLIT", "0") == "1"
    kernel = functools.partial(
        _segment_sum_stream_kernel, nchunks=nchunks,
        num_segments=num_segments, w=w, sub=sub, slots=slots, out_dim=d,
        split=split,
        # default 1: the wider contraction re-associates the f32 segment
        # sums, and the streaming kernels are pinned BIT-identical to the
        # block-major fallback (test_segsum_stream) — opt-in knob only
        batch=_pick_batch("GNNOME_SEGSUM_BATCH", SUBCHUNKS, default="1"))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((w, d), jnp.float32),
            pltpu.VMEM((slots, CHUNK_EDGES, d), data2d.dtype),
            pltpu.VMEM((slots, SUBCHUNKS, LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((slots, 2)),
            pltpu.SemaphoreType.DMA((w // STREAM_F,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_segments, d), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * e_pad * (sub or w) * d,
            bytes_accessed=e_pad * d * data2d.dtype.itemsize
            + e_pad * 4 + num_segments * d * 4,
            transcendentals=0,
        ),
    )(safe_tgt, data2d, ids_2d)


def stream_supported(num_segments: int, e_pad: int, stream_w: int) -> bool:
    return (
        stream_w > 0
        and os.environ.get("GNNOME_SEGSUM_STREAM", "1") != "0"
        and e_pad % CHUNK_EDGES == 0
        and num_segments % STREAM_F == 0
    )


def _gate_front_bwd_stream_kernel(
    meta_d_ref,  # SMEM int32[nchunks, 4] dst-layout stream metadata
    meta_s_ref,  # SMEM int32[nchunks, 4] src-layout stream metadata
    dmom_ref,  # VMEM f32[2, D]: cotangents of [Σg, Σg²]
    dgate_hbm,  # ANY [E, D] gate cotangent, canonical order
    gate_hbm,  # ANY [E, D] saved gate primal, canonical order
    idsd_hbm,  # ANY int32[E // LANE, LANE] dst ids (sorted canonical)
    idss_hbm,  # ANY int32[E // LANE, LANE] src ids (banded canonical)
    outd_hbm,  # ANY f32[Nd, D] — d_b2h (flush DMAs only)
    outs_hbm,  # ANY f32[Ns, D] — d_b1h (flush DMAs only)
    dtot_hbm,  # ANY [E, D] — d_total, edge dtype (staged write-back)
    dbias_ref,  # VMEM f32[8, D] block: row 0 = Σ d_total32
    win_d,  # VMEM f32[Wd, D]
    win_s,  # VMEM f32[Ws, D]
    dg_buf,  # VMEM [slots, CHUNK, D]
    g_buf,  # VMEM [slots, CHUNK, D]
    idsd_buf,  # VMEM int32[slots, SUBCHUNKS, LANE]
    idss_buf,  # VMEM int32[slots, SUBCHUNKS, LANE]
    dt_buf,  # VMEM [slots, CHUNK, D] staging for the d_total write-back
    sems,  # DMA sems [slots, 4]
    out_sem,  # DMA sems [slots] (d_total write)
    fsems_d,  # DMA sems [Rd]
    fsems_s,  # DMA sems [Rs]
    *,
    nchunks: int,
    n_dst: int,
    n_src: int,
    n_edges: int,
    wd: int,
    ws: int,
    sub_d: int,
    sub_s: int,
    slots: int,
    out_dim: int,
    batch: int = 1,
):
    """Fused gate-front backward: ONE streaming pass computes
    ``d_total = d_gate + mask·(dΣg + 2·gate·dΣg²)`` in-register from the
    two input streams, accumulates it into BOTH endpoint tables (d_b2h
    keyed by the sorted dst ids, d_b1h by the banded-unsorted src ids —
    each with its own sliding window + flush ring, the
    ``_segment_sum_stream_kernel`` discipline), stages d_total back to HBM
    for the B3 matmul grads, and accumulates d_bias3 in f32. Replaces an
    XLA elementwise pass + two separate segment-sum launches: d_total is
    read zero extra times instead of three.

    ``batch > 1`` (GNNOME_SEGSUM_BATCH): wide lane-concatenated
    accumulates, one matmul per ``batch`` subrows (see
    ``_segment_sum_stream_kernel``).
    """
    assert SUBCHUNKS % batch == 0, batch
    nb = SUBCHUNKS // batch
    bl = batch * LANE
    F = STREAM_F
    dm0 = dmom_ref[0:1, :]
    dm1 = dmom_ref[1:2, :]

    def in_dmas(slot, c):
        return (
            pltpu.make_async_copy(
                dgate_hbm.at[pl.ds(c * CHUNK_EDGES, CHUNK_EDGES), :],
                dg_buf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(
                gate_hbm.at[pl.ds(c * CHUNK_EDGES, CHUNK_EDGES), :],
                g_buf.at[slot], sems.at[slot, 1]),
            pltpu.make_async_copy(
                idsd_hbm.at[pl.ds(c * SUBCHUNKS, SUBCHUNKS), :],
                idsd_buf.at[slot], sems.at[slot, 2]),
            pltpu.make_async_copy(
                idss_hbm.at[pl.ds(c * SUBCHUNKS, SUBCHUNKS), :],
                idss_buf.at[slot], sems.at[slot, 3]),
        )

    def dt_dma(slot, c):
        return pltpu.make_async_copy(
            dt_buf.at[slot],
            dtot_hbm.at[pl.ds(c * CHUNK_EDGES, CHUNK_EDGES), :],
            out_sem.at[slot],
        )

    def make_ring(window, out_hbm, fsems, w):
        r_ring = w // F

        def flush_copy(b_rows, phys):
            return pltpu.make_async_copy(
                window.at[pl.ds(pl.multiple_of(phys, F), F), :],
                out_hbm.at[pl.ds(pl.multiple_of(b_rows, F), F), :],
                fsems.at[jax.lax.rem(b_rows // F, r_ring)],
            )

        def zero_block(_, zf):
            b = zf // F
            phys = pl.multiple_of(jax.lax.rem(zf, w), F)

            @pl.when(b >= r_ring)
            def _():
                flush_copy((b - r_ring) * F, phys).wait()

            window[pl.ds(phys, F), :] = jnp.zeros((F, out_dim), jnp.float32)
            return zf + F

        def flush_block(_, base):
            phys = pl.multiple_of(jax.lax.rem(base, w), F)
            flush_copy(base, phys).start()
            return base + F

        return flush_copy, zero_block, flush_block

    fc_d, zb_d, fb_d = make_ring(win_d, outd_hbm, fsems_d, wd)
    fc_s, zb_s, fb_s = make_ring(win_s, outs_hbm, fsems_s, ws)

    for k in range(slots - 1):
        @pl.when(k < nchunks)
        def _(k=k):
            for dma in in_dmas(k, k):
                dma.start()

    subd_iota = (jax.lax.broadcasted_iota(jnp.int32, (sub_d, 1), 0)
                 if sub_d else None)
    subs_iota = (jax.lax.broadcasted_iota(jnp.int32, (sub_s, 1), 0)
                 if sub_s else None)
    wd_iota = jax.lax.broadcasted_iota(jnp.int32, (wd, 1), 0)
    ws_iota = jax.lax.broadcasted_iota(jnp.int32, (ws, 1), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (bl, 1), 0)

    dbias_ref[...] = jnp.zeros((8, out_dim), jnp.float32)

    def body(c, carry):
        base_d, zf_d, base_s, zf_s = carry
        slot = jax.lax.rem(c, slots)

        @pl.when(c + slots - 1 < nchunks)
        def _():
            nxt = jax.lax.rem(c + slots - 1, slots)
            for dma in in_dmas(nxt, c + slots - 1):
                dma.start()

        for dma in in_dmas(slot, c):
            dma.wait()

        @pl.when(c >= slots)
        def _():
            dt_dma(slot, c - slots).wait()

        # extend both zero frontiers
        zf_d = jax.lax.fori_loop(
            0, (jnp.maximum(meta_d_ref[c, 1], zf_d) - zf_d) // F, zb_d, zf_d)
        zf_s = jax.lax.fori_loop(
            0, (jnp.maximum(meta_s_ref[c, 1], zf_s) - zf_s) // F, zb_s, zf_s)

        # d_total epilog + dual accumulate, one batched row at a time
        def subrow_dt(r):
            sl = slice(r * bl, (r + 1) * bl)
            dg = dg_buf[slot, sl, :].astype(jnp.float32)
            g = g_buf[slot, sl, :].astype(jnp.float32)
            mask = (c * CHUNK_EDGES + r * bl + lane_iota) < n_edges
            dt32 = dg + jnp.where(mask, dm0 + 2.0 * g * dm1, 0.0)
            return dt32

        off_d = meta_d_ref[c, 2]
        span_d = meta_d_ref[c, 3]
        off_s = meta_s_ref[c, 2]
        span_s = meta_s_ref[c, 3]

        phys_d = pl.multiple_of(jax.lax.rem(off_d, wd), 8)
        phys_s = pl.multiple_of(jax.lax.rem(off_s, ws), 8)
        narrow_d = jnp.logical_and(
            span_d > 0, jnp.logical_and(span_d <= sub_d,
                                        phys_d + sub_d <= wd)) \
            if sub_d else jnp.bool_(False)
        narrow_s = jnp.logical_and(
            span_s > 0, jnp.logical_and(span_s <= sub_s,
                                        phys_s + sub_s <= ws)) \
            if sub_s else jnp.bool_(False)

        def tile(r):
            return dt_buf[slot, r * bl : (r + 1) * bl, :]

        def accumulate(acc, row_ids, ids_buf_):
            for r in range(nb):
                onehot = _wide_onehot(
                    lambda j: (ids_buf_[slot, r * batch + j
                                        : r * batch + j + 1, :] == row_ids),
                    batch)
                acc = _acc_matmul(acc, onehot, tile(r))
            return acc

        # compute all batched-row d_totals once; stage d_total; dbias
        dbias = dbias_ref[0:1, :]
        for r in range(nb):
            dt32 = subrow_dt(r)
            dbias = dbias + jnp.sum(dt32, axis=0, keepdims=True)
            dt_buf[slot, r * bl : (r + 1) * bl, :] = dt32.astype(
                dt_buf.dtype)
        dbias_ref[0:1, :] = dbias
        dt_dma(slot, c).start()

        # dst accumulate (sorted ids)
        if sub_d:
            @pl.when(narrow_d)
            def _():
                acc = accumulate(win_d[pl.ds(phys_d, sub_d), :],
                                 off_d + subd_iota, idsd_buf)
                win_d[pl.ds(phys_d, sub_d), :] = acc

            wide_d = jnp.logical_and(span_d > 0, jnp.logical_not(narrow_d))
        else:
            wide_d = span_d > 0

        @pl.when(wide_d)
        def _():
            idsv = idsd_buf[slot]
            phys_ids = jnp.where(idsv < n_dst, idsv & (wd - 1), wd)
            acc = win_d[...]
            for r in range(nb):
                onehot = _wide_onehot(
                    lambda j: (phys_ids[r * batch + j
                                        : r * batch + j + 1, :] == wd_iota),
                    batch)
                acc = _acc_matmul(acc, onehot, tile(r))
            win_d[...] = acc

        # src accumulate (banded-unsorted ids)
        if sub_s:
            @pl.when(narrow_s)
            def _():
                acc = accumulate(win_s[pl.ds(phys_s, sub_s), :],
                                 off_s + subs_iota, idss_buf)
                win_s[pl.ds(phys_s, sub_s), :] = acc

            wide_s = jnp.logical_and(span_s > 0, jnp.logical_not(narrow_s))
        else:
            wide_s = span_s > 0

        @pl.when(wide_s)
        def _():
            idsv = idss_buf[slot]
            phys_ids = jnp.where(idsv < n_src, idsv & (ws - 1), ws)
            acc = win_s[...]
            for r in range(nb):
                onehot = _wide_onehot(
                    lambda j: (phys_ids[r * batch + j
                                        : r * batch + j + 1, :] == ws_iota),
                    batch)
                acc = _acc_matmul(acc, onehot, tile(r))
            win_s[...] = acc

        # flush both rings
        tgt_d = jnp.minimum(meta_d_ref[c, 0], zf_d)
        base_d = jax.lax.fori_loop(
            0, jnp.maximum(tgt_d - base_d, 0) // F, fb_d, base_d)
        tgt_s = jnp.minimum(meta_s_ref[c, 0], zf_s)
        base_s = jax.lax.fori_loop(
            0, jnp.maximum(tgt_s - base_s, 0) // F, fb_s, base_s)
        return (base_d, zf_d, base_s, zf_s)

    base_d, zf_d, base_s, zf_s = jax.lax.fori_loop(
        0, nchunks, body,
        (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0)))

    # epilogues: flush accumulated, zero+flush trailing, per ring
    def tail(zb, fb, base, zf, n_rows):
        base = jax.lax.fori_loop(0, (zf - base) // F, fb, base)

        def tb(_, carry):
            base, zf = carry
            zf = zb(0, zf)
            base = fb(0, base)
            return (base, zf)

        return jax.lax.fori_loop(0, (n_rows - zf) // F, tb, (base, zf))

    tail(zb_d, fb_d, base_d, zf_d, n_dst)
    tail(zb_s, fb_s, base_s, zf_s, n_src)

    for n_rows, w, fc in ((n_dst, wd, fc_d), (n_src, ws, fc_s)):
        b_total = n_rows // F
        for k in range(min(w // F, b_total)):
            b = b_total - 1 - k
            fc(b * F, (b * F) % w).wait()

    # drain outstanding d_total writes
    for k in range(1, slots + 1):
        @pl.when(nchunks >= k)
        def _(k=k):
            dt_dma(jax.lax.rem(nchunks - k, slots), nchunks - k).wait()


def gate_front_bwd_stream_pallas(
    d_gate: jax.Array,  # [E, D] canonical order
    gate: jax.Array,  # [E, D] canonical order (saved primal)
    d_mom: jax.Array,  # f32[2, D]
    ids_dst: jax.Array,  # int32[E] sorted canonical dst ids (PAD pads)
    ids_src: jax.Array,  # int32[E] banded canonical src ids (PAD pads)
    meta_dst: jax.Array,  # int32[nchunks, 4]
    meta_src: jax.Array,  # int32[nchunks, 4]
    w_dst: int,
    w_src: int,
    n_dst: int,
    n_src: int,
    n_edges: int,
    out_dtype,
    interpret: bool = False,
):
    """(d_b2h f32[n_dst, D], d_b1h f32[n_src, D], d_total [E, D],
    d_bias3 f32[D]) in one streaming pass. See the kernel docstring."""
    e_pad, d = d_gate.shape
    nchunks = e_pad // CHUNK_EDGES
    slots = max(int(os.environ.get("GNNOME_SEGSUM_SLOTS", "4")), 2)
    sub_d = _env_sub("GNNOME_SEGSUM_SUB", _policy_sub(n_dst, e_pad, w_dst))
    sub_d = sub_d if sub_d and sub_d < w_dst else 0
    sub_s = _env_sub("GNNOME_SEGSUM_SUB", _policy_sub(n_src, e_pad, w_src))
    sub_s = sub_s if sub_s and sub_s < w_src else 0
    kernel = functools.partial(
        _gate_front_bwd_stream_kernel, nchunks=nchunks, n_dst=n_dst,
        n_src=n_src, n_edges=n_edges, wd=w_dst, ws=w_src, sub_d=sub_d,
        sub_s=sub_s, slots=slots, out_dim=d,
        # default 1, as in _launch_segment_sum_stream (bit-identity with
        # the composed fallback is test-pinned)
        batch=_pick_batch("GNNOME_SEGSUM_BATCH", SUBCHUNKS, default="1"))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((2, d), lambda *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, d), lambda *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((w_dst, d), jnp.float32),
            pltpu.VMEM((w_src, d), jnp.float32),
            pltpu.VMEM((slots, CHUNK_EDGES, d), d_gate.dtype),
            pltpu.VMEM((slots, CHUNK_EDGES, d), gate.dtype),
            pltpu.VMEM((slots, SUBCHUNKS, LANE), jnp.int32),
            pltpu.VMEM((slots, SUBCHUNKS, LANE), jnp.int32),
            pltpu.VMEM((slots, CHUNK_EDGES, d), out_dtype),
            pltpu.SemaphoreType.DMA((slots, 4)),
            pltpu.SemaphoreType.DMA((slots,)),
            pltpu.SemaphoreType.DMA((w_dst // STREAM_F,)),
            pltpu.SemaphoreType.DMA((w_src // STREAM_F,)),
        ],
    )
    outd, outs, dtot, dbias = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_dst, d), jnp.float32),
            jax.ShapeDtypeStruct((n_src, d), jnp.float32),
            jax.ShapeDtypeStruct((e_pad, d), out_dtype),
            jax.ShapeDtypeStruct((8, d), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * e_pad * ((sub_d or w_dst) + (sub_s or w_src)) * d,
            bytes_accessed=3 * e_pad * d * d_gate.dtype.itemsize
            + 2 * e_pad * 4 + (n_dst + n_src) * d * 4,
            transcendentals=0,
        ),
    )(meta_dst, meta_src, d_mom, d_gate, gate,
      ids_dst.reshape(e_pad // LANE, LANE),
      ids_src.reshape(e_pad // LANE, LANE))
    return outd, outs, dtot, dbias[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 7))
def sorted_segment_sum_pallas(
    data_sorted: jax.Array,
    segment_ids_sorted: jax.Array,
    offsets: jax.Array,
    expand_plan=None,
    num_segments: int = 0,
    interpret: bool = False,
    stream_safe=None,
    stream_w: int = 0,
) -> jax.Array:
    """Segment-sum of CSR-sorted edge data into ``num_segments`` node rows.

    ``data_sorted``: f32[E_pad, D] in CSR order; ``segment_ids_sorted``:
    int32[E_pad] non-decreasing (padding = 2^30); ``offsets``:
    int32[num_segments + 1] CSR row pointers. E_pad must be a multiple of
    1024 and num_segments a multiple of 128. ``expand_plan`` (a
    ``BandPlan`` over the PAD-clamped segment ids, see ``CSR.expand_plan``)
    routes the backward's cotangent expansion gather through the banded
    windowed-VMEM kernel. ``stream_safe``/``stream_w`` (CSR.stream_safe /
    stream_w, core/graph._stream_plan) route the forward through the
    edge-major streaming kernel.
    """
    return _forward(data_sorted, segment_ids_sorted, offsets, num_segments,
                    interpret, stream_safe, stream_w)


def _fwd(data_sorted, segment_ids_sorted, offsets, expand_plan,
         num_segments, interpret, stream_safe, stream_w):
    out = _forward(data_sorted, segment_ids_sorted, offsets, num_segments,
                   interpret, stream_safe, stream_w)
    proto = jnp.zeros((0,), data_sorted.dtype)
    return out, (segment_ids_sorted, expand_plan, proto)


def _bwd(num_segments, interpret, stream_w, res, g):
    # d(segment_sum)/d(data) is a row gather of the cotangent; padded edges
    # (id == 2^30) receive zero. The cotangent is cast to the primal dtype
    # BEFORE the gather: at 1M edges the f32 gather outputs were the single
    # largest cost class in the profile (12.5ms each; bf16 halves them).
    from gnnome_tpu.ops.banded import take_rows

    segment_ids_sorted, expand_plan, proto = res
    backend = "pallas_interpret" if interpret else "pallas"
    grad = take_rows(g.astype(proto.dtype), segment_ids_sorted, expand_plan,
                     backend, masked=True)
    return grad.astype(proto.dtype), None, None, None, None


sorted_segment_sum_pallas.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# fused σ-aggregate kernel: sigmoid + gate-multiply + dual segment-sum
# ---------------------------------------------------------------------------


def _fused_sigma_kernel(
    chunk_lo_ref,  # SMEM int32[nblocks]
    chunk_hi_ref,  # SMEM int32[nblocks]
    e_hbm,  # ANY [E, D] pre-σ edge state (e_new), CSR-sorted
    v_hbm,  # ANY [E, D] gathered neighbor values, CSR-sorted
    ids_hbm,  # ANY int32[E // LANE, LANE]
    out_ref,  # VMEM [BN, 2D] block: [Σ σ·v | Σ σ]
    e_buf,  # VMEM [2, CHUNK, D]
    v_buf,  # VMEM [2, CHUNK, D]
    ids_buf,  # VMEM int32[2, SUBCHUNKS, LANE]
    sems,  # DMA sems [2, 3]
    *,
    block_nodes: int,
    feat_dim: int,
):
    i = pl.program_id(0)
    lo = chunk_lo_ref[i]
    hi = chunk_hi_ref[i]
    node_ids = i * block_nodes + jax.lax.broadcasted_iota(
        jnp.int32, (block_nodes, 1), 0
    )

    def dmas(slot, c):
        return (
            pltpu.make_async_copy(
                e_hbm.at[pl.ds(c * CHUNK_EDGES, CHUNK_EDGES), :],
                e_buf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(
                v_hbm.at[pl.ds(c * CHUNK_EDGES, CHUNK_EDGES), :],
                v_buf.at[slot], sems.at[slot, 1]),
            pltpu.make_async_copy(
                ids_hbm.at[pl.ds(c * SUBCHUNKS, SUBCHUNKS), :],
                ids_buf.at[slot], sems.at[slot, 2]),
        )

    @pl.when(lo < hi)
    def _():
        for d in dmas(0, lo):
            d.start()

    def body(c_rel, acc):
        acc1, acc2 = acc
        c = lo + c_rel
        slot = jax.lax.rem(c_rel, 2)
        nxt = jax.lax.rem(c_rel + 1, 2)

        @pl.when(c + 1 < hi)
        def _():
            for d in dmas(nxt, c + 1):
                d.start()

        for d in dmas(slot, c):
            d.wait()

        for r in range(SUBCHUNKS):
            ids_row = ids_buf[slot, r : r + 1, :]
            onehot = (ids_row == node_ids).astype(jnp.bfloat16)
            e_tile = e_buf[slot, r * LANE : (r + 1) * LANE, :]
            v_tile = v_buf[slot, r * LANE : (r + 1) * LANE, :]
            # σ in f32 for accuracy; products in the input dtype so
            # f32 inputs keep ~f32 exactness via the 3-term split
            sig = jax.nn.sigmoid(e_tile.astype(jnp.float32))
            sv = (sig * v_tile.astype(jnp.float32)).astype(v_tile.dtype)
            sb = sig.astype(e_tile.dtype)
            acc1 = _acc_matmul(acc1, onehot, sv)
            acc2 = _acc_matmul(acc2, onehot, sb)
        return acc1, acc2

    acc1 = jnp.zeros((block_nodes, feat_dim), jnp.float32)
    acc2 = jnp.zeros((block_nodes, feat_dim), jnp.float32)
    acc1, acc2 = jax.lax.fori_loop(0, hi - lo, body, (acc1, acc2))
    out_ref[:, :feat_dim] = acc1
    out_ref[:, feat_dim:] = acc2


def fused_sigma_aggregate_pallas(
    e_sorted: jax.Array,
    vals_sorted: jax.Array,
    segment_ids_sorted: jax.Array,
    offsets: jax.Array,
    num_segments: int,
    interpret: bool = False,
) -> jax.Array:
    """[Σ_e σ(e)·v | Σ_e σ(e)] per key node — the fused gather→gate→
    scatter-sum pass of BASELINE.json, minus the (XLA) gather.

    Skips materializing σ, σ·v, and their concat in HBM (≈5 full edge-wide
    memory passes per direction per layer). No custom VJP here — callers
    wrap it (see ops.segment.fused_sigma_aggregate).
    """
    e_pad, d = e_sorted.shape
    bn, ch = _pick_block_nodes(num_segments, 512), CHUNK_EDGES
    assert e_pad % ch == 0 and num_segments % bn == 0
    nblocks = num_segments // bn
    block_edge_lo = offsets[0:num_segments:bn]
    block_edge_hi = offsets[bn : num_segments + 1 : bn]
    chunk_lo = (block_edge_lo // ch).astype(jnp.int32)
    chunk_hi = ((block_edge_hi + ch - 1) // ch).astype(jnp.int32)
    ids_2d = segment_ids_sorted.reshape(e_pad // LANE, LANE)

    kernel = functools.partial(
        _fused_sigma_kernel, block_nodes=bn, feat_dim=d
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (bn, 2 * d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ch, d), e_sorted.dtype),
            pltpu.VMEM((2, ch, d), vals_sorted.dtype),
            pltpu.VMEM((2, SUBCHUNKS, LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_segments, 2 * d), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * e_pad * bn * d,
            bytes_accessed=2 * e_pad * d * e_sorted.dtype.itemsize
            + e_pad * 4 + num_segments * 2 * d * 4,
            transcendentals=e_pad * d,
        ),
    )(chunk_lo, chunk_hi, e_sorted, vals_sorted, ids_2d)


# ---------------------------------------------------------------------------
# gate-epilog fused kernel: affine-BN + relu + residual + σ + dual segment-sum
# ---------------------------------------------------------------------------


def _fused_gate_kernel(
    chunk_lo_ref,  # SMEM int32[nblocks]
    chunk_hi_ref,  # SMEM int32[nblocks]
    affine_ref,  # VMEM [2, D]: rows = scale2, bias2 (folded BN affine)
    graw_hbm,  # ANY [E, D] raw gate (pre-norm), CSR-sorted
    ein_hbm,  # ANY [E, D] residual edge state, CSR-sorted
    v_hbm,  # ANY [E, D] gathered neighbor values, CSR-sorted
    ids_hbm,  # ANY int32[E // LANE, LANE]
    out_ref,  # VMEM [BN, 2D] block: [Σ σ·v | Σ σ]
    enew_hbm,  # ANY [E, D] output: e_new = relu(g*s2+b2) + e_in
    g_buf,  # VMEM [2, CHUNK, D]
    e_buf,  # VMEM [2, CHUNK, D]
    v_buf,  # VMEM [2, CHUNK, D]
    ids_buf,  # VMEM int32[2, SUBCHUNKS, LANE]
    enew_buf,  # VMEM [2, CHUNK, D] staging for the e_new write-back
    sems,  # DMA sems [2, 5]
    *,
    block_nodes: int,
    feat_dim: int,
):
    i = pl.program_id(0)
    lo = chunk_lo_ref[i]
    hi = chunk_hi_ref[i]
    node_ids = i * block_nodes + jax.lax.broadcasted_iota(
        jnp.int32, (block_nodes, 1), 0
    )
    scale2 = affine_ref[0:1, :].astype(jnp.float32)
    bias2 = affine_ref[1:2, :].astype(jnp.float32)

    def in_dmas(slot, c):
        return (
            pltpu.make_async_copy(
                graw_hbm.at[pl.ds(c * CHUNK_EDGES, CHUNK_EDGES), :],
                g_buf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(
                ein_hbm.at[pl.ds(c * CHUNK_EDGES, CHUNK_EDGES), :],
                e_buf.at[slot], sems.at[slot, 1]),
            pltpu.make_async_copy(
                v_hbm.at[pl.ds(c * CHUNK_EDGES, CHUNK_EDGES), :],
                v_buf.at[slot], sems.at[slot, 2]),
            pltpu.make_async_copy(
                ids_hbm.at[pl.ds(c * SUBCHUNKS, SUBCHUNKS), :],
                ids_buf.at[slot], sems.at[slot, 3]),
        )

    def out_dma(slot, c):
        return pltpu.make_async_copy(
            enew_buf.at[slot],
            enew_hbm.at[pl.ds(c * CHUNK_EDGES, CHUNK_EDGES), :],
            sems.at[slot, 4],
        )

    @pl.when(lo < hi)
    def _():
        for d in in_dmas(0, lo):
            d.start()

    def body(c_rel, acc):
        acc1, acc2 = acc
        c = lo + c_rel
        slot = jax.lax.rem(c_rel, 2)
        nxt = jax.lax.rem(c_rel + 1, 2)

        @pl.when(c + 1 < hi)
        def _():
            for d in in_dmas(nxt, c + 1):
                d.start()

        for d in in_dmas(slot, c):
            d.wait()

        # wait for the previous write from this staging slot (if any)
        @pl.when(c_rel >= 2)
        def _():
            out_dma(slot, c - 2).wait()

        for r in range(SUBCHUNKS):
            ids_row = ids_buf[slot, r : r + 1, :]
            onehot = (ids_row == node_ids).astype(jnp.bfloat16)
            sl = slice(r * LANE, (r + 1) * LANE)
            graw = g_buf[slot, sl, :].astype(jnp.float32)
            ein = e_buf[slot, sl, :].astype(jnp.float32)
            v_tile = v_buf[slot, sl, :]
            enew = jnp.maximum(graw * scale2 + bias2, 0.0) + ein
            enew_buf[slot, sl, :] = enew.astype(enew_buf.dtype)
            sig = jax.nn.sigmoid(enew)
            sv = (sig * v_tile.astype(jnp.float32)).astype(v_tile.dtype)
            sb = sig.astype(v_tile.dtype)
            acc1 = _acc_matmul(acc1, onehot, sv)
            acc2 = _acc_matmul(acc2, onehot, sb)
        out_dma(slot, c).start()
        return acc1, acc2

    acc1 = jnp.zeros((block_nodes, feat_dim), jnp.float32)
    acc2 = jnp.zeros((block_nodes, feat_dim), jnp.float32)
    acc1, acc2 = jax.lax.fori_loop(0, hi - lo, body, (acc1, acc2))

    # drain outstanding e_new writes
    @pl.when(hi - lo >= 1)
    def _():
        out_dma(jax.lax.rem(hi - lo - 1, 2), hi - 1).wait()

    @pl.when(hi - lo >= 2)
    def _():
        out_dma(jax.lax.rem(hi - lo - 2, 2), hi - 2).wait()

    out_ref[:, :feat_dim] = acc1
    out_ref[:, feat_dim:] = acc2


# ---------------------------------------------------------------------------
# fused BACKWARD kernels: cotangent gathers + the elementwise chain in one
# pass — the gathered cotangent/value tables never exist in HBM
# ---------------------------------------------------------------------------


def _epilog_bwd_kernel(
    w0g_ref,  # SMEM int32[S * 2] g_sums-gather window starts (dst plan)
    w0v_ref,  # SMEM int32[S * 2] vals-gather window starts (src plan)
    affine_ref,  # VMEM [2, D]
    key_ids_ref,  # VMEM int32[8, LANE] block: dst ids (PAD on padding)
    vids_ref,  # VMEM int32[8, LANE] block: clamped src ids
    graw_ref,  # VMEM [CHUNK, D] block: raw gate (canonical order)
    enew_ref,  # VMEM [CHUNK, D] block: e_new (saved fwd output)
    genew_ref,  # VMEM [CHUNK, D] block: cotangent of e_new
    gsums_hbm,  # ANY [N, 2D] cotangent of sums (compute dtype)
    vtab_hbm,  # ANY [N, D] neighbor-value node table
    dgraw_ref,  # VMEM [CHUNK, D] block out: d gate_raw
    denew_ref,  # VMEM [CHUNK, D] block out: d e_in (= d e_new total)
    dvals_ref,  # VMEM [CHUNK, D] block out: d vals (canonical order)
    daff_ref,  # VMEM f32[8, D] out rows 0/1 = d_scale2, d_bias2 (same
    #            block every grid step — sequential grid accumulates)
    wing_buf,  # VMEM [nslots, 2, wr_g, 2D]
    winv_buf,  # VMEM [nslots, 2, wr_v, D]
    sems,  # DMA sems [nslots, 2, 2]
    *,
    wr_g: int,
    wr_v: int,
    feat_dim: int,
    total_groups: tuple,
    nslots: int,
    groups: tuple = (1, 1),  # (key-plan group, value-plan group)
    batch: int = 1,
):
    """Backward of the gather-fused gate epilog in ONE pass per edge chunk:
    the [E, 2D] gathered sums-cotangent and the [E, D] regathered neighbor
    values are selected from banded VMEM windows in-kernel, the σ′/relu
    chain runs on the tiles, and the three [E, D] output cotangents are the
    only full-edge HBM writes (the XLA composition pays ~6 more passes).

    ``batch > 1`` (GNNOME_EPILOG_BATCH, clamped to divide both plan
    groups): lane-concatenated [1, batch·128] ids rows issue one wide
    select per window instead of ``batch`` narrow ones (see
    ``_fused_gate_gather_kernel``)."""
    from gnnome_tpu.ops.banded import _select_matmul

    assert all(g % batch == 0 for g in groups), (groups, batch)
    nb = SUBCHUNKS // batch
    bl = batch * LANE
    gpb = tuple(g // batch for g in groups)
    c = pl.program_id(0)
    scale2 = affine_ref[0:1, :].astype(jnp.float32)
    gpc = tuple(SUBCHUNKS // g for g in groups)

    def window_dma(slot, gg, wi, ti):
        w0 = w0g_ref if ti == 0 else w0v_ref
        buf = wing_buf if ti == 0 else winv_buf
        hbm = gsums_hbm if ti == 0 else vtab_hbm
        wr = wr_g if ti == 0 else wr_v
        start = pl.multiple_of(w0[2 * gg + wi], 8)
        return pltpu.make_async_copy(
            hbm.at[pl.ds(start, wr), :], buf.at[slot, wi],
            sems.at[slot, wi, ti],
        )

    @pl.when(c == 0)
    def _():
        for ti in range(2):
            for g0 in range(min(nslots, total_groups[ti])):
                for wi in range(2):
                    window_dma(g0 % nslots, g0, wi, ti).start()
        daff_ref[:] = jnp.zeros_like(daff_ref)

    iota_g = jax.lax.broadcasted_iota(jnp.int32, (wr_g, 1), 0)
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (wr_v, 1), 0)
    a_scale = jnp.zeros((1, feat_dim), jnp.float32)
    a_bias = jnp.zeros((1, feat_dim), jnp.float32)

    for r in range(nb):
        gg = tuple(c * gpc[ti] + r // gpb[ti] for ti in range(2))
        slot = tuple(gg[ti] % nslots for ti in range(2))
        for ti in range(2):
            if r % gpb[ti] == 0:
                for wi in range(2):
                    window_dma(slot[ti], gg[ti], wi, ti).wait()
        gc = jnp.zeros((bl, 2 * feat_dim), jnp.float32)
        v_rows = jnp.zeros((bl, feat_dim), jnp.float32)
        for wi in range(2):
            sel_g = _wide_onehot(
                lambda j: (iota_g + w0g_ref[2 * gg[0] + wi]
                           == key_ids_ref[r * batch + j
                                          : r * batch + j + 1, :]),
                batch)
            gc = gc + _select_matmul(sel_g, wing_buf[slot[0], wi])
            sel_v = _wide_onehot(
                lambda j: (iota_v + w0v_ref[2 * gg[1] + wi]
                           == vids_ref[r * batch + j
                                       : r * batch + j + 1, :]),
                batch)
            v_rows = v_rows + _select_matmul(sel_v, winv_buf[slot[1], wi])
        g1 = gc[:, :feat_dim]
        g2 = gc[:, feat_dim:]
        sl = slice(r * bl, (r + 1) * bl)
        graw = graw_ref[sl, :].astype(jnp.float32)
        e_new = enew_ref[sl, :].astype(jnp.float32)
        sig = jax.nn.sigmoid(e_new)
        dsig = sig * (1.0 - sig)
        pre = graw * scale2 + affine_ref[1:2, :].astype(jnp.float32)
        relu_mask = (pre > 0).astype(jnp.float32)
        d_enew = genew_ref[sl, :].astype(jnp.float32) + (g1 * v_rows + g2) * dsig
        d_pre = d_enew * relu_mask
        dgraw_ref[sl, :] = (d_pre * scale2).astype(dgraw_ref.dtype)
        denew_ref[sl, :] = d_enew.astype(denew_ref.dtype)
        dvals_ref[sl, :] = (g1 * sig).astype(dvals_ref.dtype)
        a_scale = a_scale + jnp.sum(d_pre * graw, axis=0, keepdims=True)
        a_bias = a_bias + jnp.sum(d_pre, axis=0, keepdims=True)

        for ti in range(2):
            if r % gpb[ti] == gpb[ti] - 1:
                @pl.when(gg[ti] + nslots < total_groups[ti])
                def _(ti=ti):
                    for wi in range(2):
                        window_dma(slot[ti], gg[ti] + nslots, wi, ti).start()

    daff_ref[0:1, :] += a_scale
    daff_ref[1:2, :] += a_bias


def epilog_bwd_pallas(
    gate_raw: jax.Array,  # [E, D] canonical order
    e_new: jax.Array,  # [E, D] saved forward output
    g_enew: jax.Array,  # [E, D] e_new cotangent
    g_sums: jax.Array,  # [N, 2D] sums cotangent (compute dtype)
    values_table: jax.Array,  # [N, D]
    affine: jax.Array,  # [2, D] f32
    key_ids: jax.Array,  # int32[E] dst ids (PAD on padding)
    value_ids: jax.Array,  # int32[E] clamped src ids
    key_plan,  # BandPlan over clamped dst ids (rows of g_sums)
    value_plan,  # BandPlan over clamped src ids (rows of values_table)
    interpret: bool = False,
):
    """(d_gate_raw, d_enew_total, d_vals, d_affine[2, D] f32): the entire
    epilog backward elementwise chain with BOTH cotangent gathers fused."""
    e_pad, d = gate_raw.shape
    assert e_pad % CHUNK_EDGES == 0 and d % LANE == 0
    assert key_plan.ok and value_plan.ok
    per_slot = 2 * (2 * key_plan.wr + value_plan.wr) * d * 2  # bf16-ish
    nslots = int(max(2, min(8, 5_000_000 // max(per_slot, 1))))
    total_subrows = e_pad // LANE
    nchunks = e_pad // CHUNK_EDGES

    batch = _pick_batch("GNNOME_EPILOG_BATCH", key_plan.group,
                        value_plan.group)
    kernel = functools.partial(
        _epilog_bwd_kernel, wr_g=key_plan.wr, wr_v=value_plan.wr,
        feat_dim=d,
        total_groups=(total_subrows // key_plan.group,
                      total_subrows // value_plan.group),
        nslots=nslots, groups=(key_plan.group, value_plan.group),
        batch=batch,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # affine
            pl.BlockSpec((SUBCHUNKS, LANE), lambda c, *_: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBCHUNKS, LANE), lambda c, *_: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_EDGES, d), lambda c, *_: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_EDGES, d), lambda c, *_: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_EDGES, d), lambda c, *_: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # g_sums
            pl.BlockSpec(memory_space=pl.ANY),  # values table
        ],
        out_specs=(
            pl.BlockSpec((CHUNK_EDGES, d), lambda c, *_: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_EDGES, d), lambda c, *_: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_EDGES, d), lambda c, *_: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d), lambda c, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((nslots, 2, key_plan.wr, 2 * d), g_sums.dtype),
            pltpu.VMEM((nslots, 2, value_plan.wr, d), values_table.dtype),
            pltpu.SemaphoreType.DMA((nslots, 2, 2)),
        ],
    )
    dgraw, denew, dvals, daff = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((e_pad, d), gate_raw.dtype),
            jax.ShapeDtypeStruct((e_pad, d), e_new.dtype),
            jax.ShapeDtypeStruct((e_pad, d), values_table.dtype),
            jax.ShapeDtypeStruct((8, d), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * e_pad * 2 * (2 * key_plan.wr + value_plan.wr) * d,
            bytes_accessed=(e_pad // (LANE * key_plan.group)) * 2
            * 2 * key_plan.wr * d * g_sums.dtype.itemsize
            + (e_pad // (LANE * value_plan.group)) * 2
            * value_plan.wr * d * values_table.dtype.itemsize
            + 6 * e_pad * d * 2 + 2 * e_pad * 4,
            transcendentals=e_pad * d,
        ),
    )(key_plan.w0.reshape(-1), value_plan.w0.reshape(-1), affine,
      key_ids.reshape(total_subrows, LANE),
      value_ids.reshape(total_subrows, LANE),
      gate_raw, e_new, g_enew, g_sums, values_table)
    return dgraw, denew, dvals, daff[:2]


def _rev_bwd_kernel(
    w0g_ref,  # SMEM int32[S * 2] g-gather window starts (src key plan)
    w0v_ref,  # SMEM int32[S * 2] value window starts (dst plan)
    key_ids_ref,  # VMEM int32[8, LANE] block: canonical src ids (PAD pads)
    vids_ref,  # VMEM int32[8, LANE] block: clamped canonical dst ids
    enew_ref,  # VMEM [CHUNK, D] block: e_new (canonical order)
    gsums_hbm,  # ANY [N, 2D] output cotangent (compute dtype)
    vtab_hbm,  # ANY [N, D] neighbor-value node table (A3·h)
    dge_ref,  # VMEM [CHUNK, D] block out: d gate_pre (= d e_new)
    dgv_ref,  # VMEM [CHUNK, D] block out: d value rows (canonical order)
    wing_buf,  # VMEM [nslots, 2, wr_g, 2D]
    winv_buf,  # VMEM [nslots, 2, wr_v, D]
    sems,  # DMA sems [nslots, 2, 2]
    *,
    wr_g: int,
    wr_v: int,
    feat_dim: int,
    total_groups: tuple,
    nslots: int,
    groups: tuple = (1, 1),  # (src key plan group, dst plan group)
    batch: int = 1,
):
    """Backward of the permutation-free reverse aggregation in ONE pass
    per canonical edge chunk: the [E, 2D] cotangent gather keyed on the
    near-sorted src ids and the [E, D] value regather keyed on the sorted
    dst ids are both banded VMEM window selects in-kernel; σ′ runs on the
    streamed e_new tile; the two [E, D] grads are the only full-edge HBM
    writes. Replaces the XLA composition in ``segment._rev_unsorted_bwd``
    (a [E, 2D] take + a [E, D] take + the elementwise chain = ~4 extra
    full-edge HBM passes). PAD src keys select zero rows of the cotangent
    (same semantics as ``take_rows(..., masked=True)``).

    ``batch > 1`` (GNNOME_EPILOG_BATCH, clamped to divide both plan
    groups): wide lane-concatenated selects, see
    ``_fused_gate_gather_kernel``."""
    from gnnome_tpu.ops.banded import _select_matmul

    assert all(g % batch == 0 for g in groups), (groups, batch)
    nb = SUBCHUNKS // batch
    bl = batch * LANE
    gpb = tuple(g // batch for g in groups)
    c = pl.program_id(0)
    gpc = tuple(SUBCHUNKS // g for g in groups)

    def window_dma(slot, gg, wi, ti):
        w0 = w0g_ref if ti == 0 else w0v_ref
        buf = wing_buf if ti == 0 else winv_buf
        hbm = gsums_hbm if ti == 0 else vtab_hbm
        wr = wr_g if ti == 0 else wr_v
        start = pl.multiple_of(w0[2 * gg + wi], 8)
        return pltpu.make_async_copy(
            hbm.at[pl.ds(start, wr), :], buf.at[slot, wi],
            sems.at[slot, wi, ti],
        )

    @pl.when(c == 0)
    def _():
        for ti in range(2):
            for g0 in range(min(nslots, total_groups[ti])):
                for wi in range(2):
                    window_dma(g0 % nslots, g0, wi, ti).start()

    iota_g = jax.lax.broadcasted_iota(jnp.int32, (wr_g, 1), 0)
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (wr_v, 1), 0)

    for r in range(nb):
        gg = tuple(c * gpc[ti] + r // gpb[ti] for ti in range(2))
        slot = tuple(gg[ti] % nslots for ti in range(2))
        for ti in range(2):
            if r % gpb[ti] == 0:
                for wi in range(2):
                    window_dma(slot[ti], gg[ti], wi, ti).wait()
        gc = jnp.zeros((bl, 2 * feat_dim), jnp.float32)
        v_rows = jnp.zeros((bl, feat_dim), jnp.float32)
        for wi in range(2):
            sel_g = _wide_onehot(
                lambda j: (iota_g + w0g_ref[2 * gg[0] + wi]
                           == key_ids_ref[r * batch + j
                                          : r * batch + j + 1, :]),
                batch)
            gc = gc + _select_matmul(sel_g, wing_buf[slot[0], wi])
            sel_v = _wide_onehot(
                lambda j: (iota_v + w0v_ref[2 * gg[1] + wi]
                           == vids_ref[r * batch + j
                                       : r * batch + j + 1, :]),
                batch)
            v_rows = v_rows + _select_matmul(sel_v, winv_buf[slot[1], wi])
        g1 = gc[:, :feat_dim]
        g2 = gc[:, feat_dim:]
        sl = slice(r * bl, (r + 1) * bl)
        sig = jax.nn.sigmoid(enew_ref[sl, :].astype(jnp.float32))
        dsig = sig * (1.0 - sig)
        dge_ref[sl, :] = ((g1 * v_rows + g2) * dsig).astype(dge_ref.dtype)
        dgv_ref[sl, :] = (g1 * sig).astype(dgv_ref.dtype)

        for ti in range(2):
            if r % gpb[ti] == gpb[ti] - 1:
                @pl.when(gg[ti] + nslots < total_groups[ti])
                def _(ti=ti):
                    for wi in range(2):
                        window_dma(slot[ti], gg[ti] + nslots, wi, ti).start()


def rev_bwd_pallas(
    e_new: jax.Array,  # [E, D] canonical order (saved forward residual)
    g_sums: jax.Array,  # [N, 2D] output cotangent (compute dtype)
    values_table: jax.Array,  # [N, D] (A3·h)
    key_ids: jax.Array,  # int32[E] canonical src ids (PAD on padding)
    value_ids: jax.Array,  # int32[E] clamped canonical dst ids
    key_plan,  # BandPlan over clamped canonical src ids (rows of g_sums)
    value_plan,  # BandPlan over dst ids (rows of values_table)
    interpret: bool = False,
):
    """(d_gate_pre, d_v_rows): the reverse-unsorted backward's per-edge
    grads in one fused pass (see ``_rev_bwd_kernel``). The caller still
    owns the transpose reduction of ``d_v_rows`` (a sorted segment-sum
    over the identity ``by_dst``)."""
    e_pad, d = e_new.shape
    assert e_pad % CHUNK_EDGES == 0 and d % LANE == 0
    assert key_plan.ok and value_plan.ok
    per_slot = 2 * (2 * key_plan.wr + value_plan.wr) * d * 2
    nslots = int(max(2, min(8, 5_000_000 // max(per_slot, 1))))
    total_subrows = e_pad // LANE
    nchunks = e_pad // CHUNK_EDGES

    batch = _pick_batch("GNNOME_EPILOG_BATCH", key_plan.group,
                        value_plan.group)
    kernel = functools.partial(
        _rev_bwd_kernel, wr_g=key_plan.wr, wr_v=value_plan.wr, feat_dim=d,
        total_groups=(total_subrows // key_plan.group,
                      total_subrows // value_plan.group),
        nslots=nslots, groups=(key_plan.group, value_plan.group),
        batch=batch,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((SUBCHUNKS, LANE), lambda c, *_: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBCHUNKS, LANE), lambda c, *_: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_EDGES, d), lambda c, *_: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # g_sums
            pl.BlockSpec(memory_space=pl.ANY),  # values table
        ],
        out_specs=(
            pl.BlockSpec((CHUNK_EDGES, d), lambda c, *_: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_EDGES, d), lambda c, *_: (c, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((nslots, 2, key_plan.wr, 2 * d), g_sums.dtype),
            pltpu.VMEM((nslots, 2, value_plan.wr, d), values_table.dtype),
            pltpu.SemaphoreType.DMA((nslots, 2, 2)),
        ],
    )
    dge, dgv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((e_pad, d), e_new.dtype),
            jax.ShapeDtypeStruct((e_pad, d), values_table.dtype),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * e_pad * 2 * (2 * key_plan.wr + value_plan.wr) * d,
            bytes_accessed=(e_pad // (LANE * key_plan.group)) * 2
            * 2 * key_plan.wr * d * g_sums.dtype.itemsize
            + (e_pad // (LANE * value_plan.group)) * 2
            * value_plan.wr * d * values_table.dtype.itemsize
            + 3 * e_pad * d * 2 + 2 * e_pad * 4,
            transcendentals=e_pad * d,
        ),
    )(key_plan.w0.reshape(-1), value_plan.w0.reshape(-1),
      key_ids.reshape(total_subrows, LANE),
      value_ids.reshape(total_subrows, LANE),
      e_new, g_sums, values_table)
    return dge, dgv


def _opp_bwd_kernel(
    w0e_ref,  # SMEM int32[S * 2] order-plan window starts (e_new, E-table)
    w0v_ref,  # SMEM int32[S * 2] opp-plan window starts (values, N-table)
    w0g_ref,  # SMEM int32[S * 2] expand-plan window starts (g, N-table)
    ids_ref,  # VMEM int32[8, LANE] block: sorted segment ids (PAD on pads)
    eids_ref,  # VMEM int32[8, LANE] block: order ids
    vids_ref,  # VMEM int32[8, LANE] block: clamped opposite ids
    enew_hbm,  # ANY [E, D] edge state, canonical order
    vtab_hbm,  # ANY [N, D] neighbor-value node table
    gsum_hbm,  # ANY [N, 2D] sums cotangent (compute dtype)
    dge_ref,  # VMEM [CHUNK, D] block out: grad wrt sorted gate
    dgv_ref,  # VMEM [CHUNK, D] block out: grad wrt sorted values rows
    wine_buf,  # VMEM [nslots, 2, wr_e, D]
    winv_buf,  # VMEM [nslots, 2, wr_v, D]
    wing_buf,  # VMEM [nslots, 2, wr_g, 2D]
    sems,  # DMA sems [nslots, 2, 3]
    *,
    wr_e: int,
    wr_v: int,
    wr_g: int,
    feat_dim: int,
    total_groups: tuple,
    nslots: int,
    groups: tuple = (1, 1, 1),  # (order, opp, expand) plan groups
):
    """Backward of the mega-fused opposite aggregation in ONE pass per
    sorted edge chunk: all three gathers (order-gathered gate, opposite
    values, segment-keyed sums cotangent) are selected from banded VMEM
    windows in-kernel; only the two [E, D] grads are written to HBM."""
    from gnnome_tpu.ops.banded import _select_matmul

    c = pl.program_id(0)
    gpc = tuple(SUBCHUNKS // g for g in groups)

    def window_dma(slot, gg, wi, ti):
        w0 = (w0e_ref, w0v_ref, w0g_ref)[ti]
        buf = (wine_buf, winv_buf, wing_buf)[ti]
        hbm = (enew_hbm, vtab_hbm, gsum_hbm)[ti]
        wr = (wr_e, wr_v, wr_g)[ti]
        start = pl.multiple_of(w0[2 * gg + wi], 8)
        return pltpu.make_async_copy(
            hbm.at[pl.ds(start, wr), :], buf.at[slot, wi],
            sems.at[slot, wi, ti],
        )

    @pl.when(c == 0)
    def _():
        for ti in range(3):
            for g0 in range(min(nslots, total_groups[ti])):
                for wi in range(2):
                    window_dma(g0 % nslots, g0, wi, ti).start()

    iota_e = jax.lax.broadcasted_iota(jnp.int32, (wr_e, 1), 0)
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (wr_v, 1), 0)
    iota_g = jax.lax.broadcasted_iota(jnp.int32, (wr_g, 1), 0)
    for r in range(SUBCHUNKS):
        gg = tuple(c * gpc[ti] + r // groups[ti] for ti in range(3))
        slot = tuple(gg[ti] % nslots for ti in range(3))
        for ti in range(3):
            if r % groups[ti] == 0:
                for wi in range(2):
                    window_dma(slot[ti], gg[ti], wi, ti).wait()
        ids_row = ids_ref[r : r + 1, :]
        eids_row = eids_ref[r : r + 1, :]
        vids_row = vids_ref[r : r + 1, :]
        e_rows = jnp.zeros((LANE, feat_dim), jnp.float32)
        v_rows = jnp.zeros((LANE, feat_dim), jnp.float32)
        gc = jnp.zeros((LANE, 2 * feat_dim), jnp.float32)
        for wi in range(2):
            sel_e = (iota_e + w0e_ref[2 * gg[0] + wi] == eids_row)
            e_rows = e_rows + _select_matmul(
                sel_e.astype(jnp.bfloat16), wine_buf[slot[0], wi])
            sel_v = (iota_v + w0v_ref[2 * gg[1] + wi] == vids_row)
            v_rows = v_rows + _select_matmul(
                sel_v.astype(jnp.bfloat16), winv_buf[slot[1], wi])
            sel_g = (iota_g + w0g_ref[2 * gg[2] + wi] == ids_row)
            gc = gc + _select_matmul(
                sel_g.astype(jnp.bfloat16), wing_buf[slot[2], wi])
        g1 = gc[:, :feat_dim]
        g2 = gc[:, feat_dim:]
        sig = jax.nn.sigmoid(e_rows)
        dsig = sig * (1.0 - sig)
        sl = slice(r * LANE, (r + 1) * LANE)
        dge_ref[sl, :] = ((g1 * v_rows + g2) * dsig).astype(dge_ref.dtype)
        dgv_ref[sl, :] = (g1 * sig).astype(dgv_ref.dtype)

        for ti in range(3):
            if r % groups[ti] == groups[ti] - 1:
                @pl.when(gg[ti] + nslots < total_groups[ti])
                def _(ti=ti):
                    for wi in range(2):
                        window_dma(slot[ti], gg[ti] + nslots, wi, ti).start()


def opp_bwd_pallas(
    e_new: jax.Array,  # [E, D] canonical order
    values_table: jax.Array,  # [N, D]
    g_sums: jax.Array,  # [N, 2D] cotangent (compute dtype)
    segment_ids_sorted: jax.Array,  # int32[E] (PAD on pads)
    order_ids: jax.Array,  # int32[E]
    opp_ids: jax.Array,  # int32[E] clamped
    order_plan,
    opp_plan,
    expand_plan,
    out_dtypes,  # (gate dtype, values dtype)
    interpret: bool = False,
):
    """(grad_e_sorted, grad_v_sorted): the opposite-aggregation backward
    with all three gathers fused (see ``_opp_bwd_kernel``)."""
    e_pad = segment_ids_sorted.shape[0]
    d = e_new.shape[-1]
    assert e_pad % CHUNK_EDGES == 0 and d % LANE == 0
    assert order_plan.ok and opp_plan.ok and expand_plan.ok
    per_slot = 2 * (order_plan.wr + opp_plan.wr + 2 * expand_plan.wr) * d * 2
    nslots = int(max(2, min(8, 5_000_000 // max(per_slot, 1))))
    total_subrows = e_pad // LANE
    nchunks = e_pad // CHUNK_EDGES

    kernel = functools.partial(
        _opp_bwd_kernel, wr_e=order_plan.wr, wr_v=opp_plan.wr,
        wr_g=expand_plan.wr, feat_dim=d,
        total_groups=(total_subrows // order_plan.group,
                      total_subrows // opp_plan.group,
                      total_subrows // expand_plan.group),
        nslots=nslots,
        groups=(order_plan.group, opp_plan.group, expand_plan.group),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((SUBCHUNKS, LANE), lambda c, *_: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBCHUNKS, LANE), lambda c, *_: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBCHUNKS, LANE), lambda c, *_: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((CHUNK_EDGES, d), lambda c, *_: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_EDGES, d), lambda c, *_: (c, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((nslots, 2, order_plan.wr, d), e_new.dtype),
            pltpu.VMEM((nslots, 2, opp_plan.wr, d), values_table.dtype),
            pltpu.VMEM((nslots, 2, expand_plan.wr, 2 * d), g_sums.dtype),
            pltpu.SemaphoreType.DMA((nslots, 2, 3)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((e_pad, d), out_dtypes[0]),
            jax.ShapeDtypeStruct((e_pad, d), out_dtypes[1]),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * e_pad * 2
            * (order_plan.wr + opp_plan.wr + 2 * expand_plan.wr) * d,
            bytes_accessed=(e_pad // (LANE * order_plan.group)) * 2
            * order_plan.wr * d * 2
            + (e_pad // (LANE * opp_plan.group)) * 2 * opp_plan.wr * d * 2
            + (e_pad // (LANE * expand_plan.group)) * 2
            * 2 * expand_plan.wr * d * 2
            + 2 * e_pad * d * 2 + 3 * e_pad * 4,
            transcendentals=e_pad * d,
        ),
    )(order_plan.w0.reshape(-1), opp_plan.w0.reshape(-1),
      expand_plan.w0.reshape(-1),
      segment_ids_sorted.reshape(total_subrows, LANE),
      order_ids.reshape(total_subrows, LANE),
      opp_ids.reshape(total_subrows, LANE),
      e_new, values_table, g_sums)


# ---------------------------------------------------------------------------
# opposite-direction σ-aggregate with BOTH gathers fused: neither the
# permuted gate nor the gathered neighbor table ever exists in HBM
# ---------------------------------------------------------------------------


def _fused_sigma_opp_kernel(
    chunk_lo_ref,  # SMEM int32[nblocks] (by_src CSR chunk ranges)
    chunk_hi_ref,  # SMEM int32[nblocks]
    w0e_ref,  # SMEM int32[S * 2] order-plan window starts (e_new, E-table)
    w0v_ref,  # SMEM int32[S * 2] opp-plan window starts (values, N-table)
    enew_hbm,  # ANY [E, D] edge state in CANONICAL order
    vtab_hbm,  # ANY [N, D] neighbor-value node table (A3·h)
    ids_hbm,  # ANY int32[E // LANE, LANE] segment (src) ids, sorted
    eids_hbm,  # ANY int32[E // LANE, LANE] order ids (canonical positions)
    vids_hbm,  # ANY int32[E // LANE, LANE] clamped opposite (dst) ids
    out_ref,  # VMEM [BN, 2D] block: [Σ σ·v | Σ σ]
    ids_buf,  # VMEM int32[2, SUBCHUNKS, LANE]
    eids_buf,  # VMEM int32[2, SUBCHUNKS, LANE]
    vids_buf,  # VMEM int32[2, SUBCHUNKS, LANE]
    wine_buf,  # VMEM [2, gpc_e, 2, wr_e, D] e_new windows
    winv_buf,  # VMEM [2, gpc_v, 2, wr_v, D] value windows
    sems,  # DMA sems [2, 3] (ids, eids, vids)
    wsems_e,  # DMA sems [2, gpc_e, 2]
    wsems_v,  # DMA sems [2, gpc_v, 2]
    *,
    block_nodes: int,
    feat_dim: int,
    wr_e: int,
    wr_v: int,
    groups: tuple = (1, 1),  # (order-plan group, opp-plan group)
):
    """Reverse-direction gated aggregation in by_src-sorted order where the
    two [E, D] inputs (permuted e_new, gathered a3h[dst]) are SELECTED from
    banded VMEM windows instead of streamed from pregathered HBM tables —
    the sorted copies never exist (4 fewer full-edge passes per forward
    execution, ~1 GB less remat residency at 1M edges)."""
    from gnnome_tpu.ops.banded import _select_matmul

    i = pl.program_id(0)
    lo = chunk_lo_ref[i]
    hi = chunk_hi_ref[i]
    node_ids = i * block_nodes + jax.lax.broadcasted_iota(
        jnp.int32, (block_nodes, 1), 0
    )

    def in_dmas(slot, c):
        return (
            pltpu.make_async_copy(
                ids_hbm.at[pl.ds(c * SUBCHUNKS, SUBCHUNKS), :],
                ids_buf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(
                eids_hbm.at[pl.ds(c * SUBCHUNKS, SUBCHUNKS), :],
                eids_buf.at[slot], sems.at[slot, 1]),
            pltpu.make_async_copy(
                vids_hbm.at[pl.ds(c * SUBCHUNKS, SUBCHUNKS), :],
                vids_buf.at[slot], sems.at[slot, 2]),
        )

    gpc = tuple(SUBCHUNKS // g for g in groups)  # window groups per chunk

    def window_dma(slot, c, gr, wi, ti):
        w0 = w0e_ref if ti == 0 else w0v_ref
        buf = wine_buf if ti == 0 else winv_buf
        hbm = enew_hbm if ti == 0 else vtab_hbm
        wr = wr_e if ti == 0 else wr_v
        wsems = wsems_e if ti == 0 else wsems_v
        start = pl.multiple_of(w0[2 * (c * gpc[ti] + gr) + wi], 8)
        return pltpu.make_async_copy(
            hbm.at[pl.ds(start, wr), :],
            buf.at[slot, gr, wi],
            wsems.at[slot, gr, wi],
        )

    def start_chunk(slot, c):
        for d in in_dmas(slot, c):
            d.start()
        for ti in range(2):
            for gr in range(gpc[ti]):
                for wi in range(2):
                    window_dma(slot, c, gr, wi, ti).start()

    @pl.when(lo < hi)
    def _():
        start_chunk(0, lo)

    iota_e = jax.lax.broadcasted_iota(jnp.int32, (wr_e, 1), 0)
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (wr_v, 1), 0)

    def body(c_rel, acc):
        acc1, acc2 = acc
        c = lo + c_rel
        slot = jax.lax.rem(c_rel, 2)
        nxt = jax.lax.rem(c_rel + 1, 2)

        @pl.when(c + 1 < hi)
        def _():
            start_chunk(nxt, c + 1)

        for d in in_dmas(slot, c):
            d.wait()

        for r in range(SUBCHUNKS):
            gr = tuple(r // g for g in groups)
            for ti in range(2):
                if r % groups[ti] == 0:
                    for wi in range(2):
                        window_dma(slot, c, gr[ti], wi, ti).wait()
            ids_row = ids_buf[slot, r : r + 1, :]
            onehot = (ids_row == node_ids).astype(jnp.bfloat16)
            eids_row = eids_buf[slot, r : r + 1, :]
            vids_row = vids_buf[slot, r : r + 1, :]
            e_rows = jnp.zeros((LANE, feat_dim), jnp.float32)
            v_rows = jnp.zeros((LANE, feat_dim), jnp.float32)
            for wi in range(2):
                base_e = w0e_ref[2 * (c * gpc[0] + gr[0]) + wi]
                sel_e = (iota_e + base_e == eids_row)
                e_rows = e_rows + _select_matmul(
                    sel_e.astype(jnp.bfloat16), wine_buf[slot, gr[0], wi])
                base_v = w0v_ref[2 * (c * gpc[1] + gr[1]) + wi]
                sel_v = (iota_v + base_v == vids_row)
                v_rows = v_rows + _select_matmul(
                    sel_v.astype(jnp.bfloat16), winv_buf[slot, gr[1], wi])
            sig = jax.nn.sigmoid(e_rows)
            vdt = winv_buf.dtype
            sv = (sig * v_rows).astype(vdt)
            sb = sig.astype(vdt)
            acc1 = _acc_matmul(acc1, onehot, sv)
            acc2 = _acc_matmul(acc2, onehot, sb)
        return acc1, acc2

    acc1 = jnp.zeros((block_nodes, feat_dim), jnp.float32)
    acc2 = jnp.zeros((block_nodes, feat_dim), jnp.float32)
    acc1, acc2 = jax.lax.fori_loop(0, hi - lo, body, (acc1, acc2))
    out_ref[:, :feat_dim] = acc1
    out_ref[:, feat_dim:] = acc2


def fused_sigma_opposite_pallas(
    e_new: jax.Array,  # [E, D] edge state, CANONICAL order
    values_table: jax.Array,  # [N, D] node table (A3·h)
    segment_ids_sorted: jax.Array,  # int32[E] src ids, sorted (PAD on pads)
    order_ids: jax.Array,  # int32[E] canonical position per sorted slot
    opp_ids: jax.Array,  # int32[E] clamped dst ids, sorted order
    order_plan,  # BandPlan over order_ids (rows of the [E, D] e_new table)
    opp_plan,  # BandPlan over opp_ids (rows of the [N, D] value table)
    offsets: jax.Array,  # by_src CSR offsets
    num_segments: int,
    interpret: bool = False,
) -> jax.Array:
    """[Σ σ(e_new[order])·values[opp] ‖ Σ σ(e_new[order])] per src node —
    the reverse GatedGCN aggregation where BOTH sorted inputs are selected
    from banded VMEM windows inside the kernel."""
    e_pad = segment_ids_sorted.shape[0]
    d = e_new.shape[-1]
    if d % LANE != 0:
        d_pad = ((d + LANE - 1) // LANE) * LANE
        padc = ((0, 0), (0, d_pad - d))
        sums = fused_sigma_opposite_pallas(
            jnp.pad(e_new, padc), jnp.pad(values_table, padc),
            segment_ids_sorted, order_ids, opp_ids, order_plan, opp_plan,
            offsets, num_segments, interpret)
        return jnp.concatenate(
            [sums[:, :d], sums[:, d_pad : d_pad + d]], axis=-1)
    bn, ch = _pick_block_nodes(num_segments, 512), CHUNK_EDGES
    assert e_pad % ch == 0 and num_segments % bn == 0
    assert order_plan.ok and opp_plan.ok
    nblocks = num_segments // bn
    block_edge_lo = offsets[0:num_segments:bn]
    block_edge_hi = offsets[bn : num_segments + 1 : bn]
    chunk_lo = (block_edge_lo // ch).astype(jnp.int32)
    chunk_hi = ((block_edge_hi + ch - 1) // ch).astype(jnp.int32)
    ids_2d = segment_ids_sorted.reshape(e_pad // LANE, LANE)
    eids_2d = order_ids.reshape(e_pad // LANE, LANE)
    vids_2d = opp_ids.reshape(e_pad // LANE, LANE)

    kernel = functools.partial(
        _fused_sigma_opp_kernel, block_nodes=bn, feat_dim=d,
        wr_e=order_plan.wr, wr_v=opp_plan.wr,
        groups=(order_plan.group, opp_plan.group),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (bn, 2 * d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, SUBCHUNKS, LANE), jnp.int32),
            pltpu.VMEM((2, SUBCHUNKS, LANE), jnp.int32),
            pltpu.VMEM((2, SUBCHUNKS, LANE), jnp.int32),
            pltpu.VMEM((2, SUBCHUNKS // order_plan.group, 2,
                        order_plan.wr, d), e_new.dtype),
            pltpu.VMEM((2, SUBCHUNKS // opp_plan.group, 2,
                        opp_plan.wr, d), values_table.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2, SUBCHUNKS // order_plan.group, 2)),
            pltpu.SemaphoreType.DMA((2, SUBCHUNKS // opp_plan.group, 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_segments, 2 * d), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * e_pad * bn * d
            + 2 * e_pad * 2 * (order_plan.wr + opp_plan.wr) * d,
            bytes_accessed=(e_pad // (LANE * order_plan.group)) * 2
            * order_plan.wr * d * e_new.dtype.itemsize
            + (e_pad // (LANE * opp_plan.group)) * 2 * opp_plan.wr * d
            * values_table.dtype.itemsize
            + 3 * e_pad * 4 + num_segments * 2 * d * 4,
            transcendentals=e_pad * d,
        ),
    )(chunk_lo, chunk_hi, order_plan.w0.reshape(-1), opp_plan.w0.reshape(-1),
      e_new, values_table, ids_2d, eids_2d, vids_2d)


# ---------------------------------------------------------------------------
# unsorted-key reverse aggregation: stream CANONICAL edge chunks per src
# node block — no permutation, no order-plan windows at all
# ---------------------------------------------------------------------------


def _fused_sigma_unsorted_kernel(
    chunk_lo_ref,  # SMEM int32[nblocks]: canonical chunk ranges per block
    chunk_hi_ref,  # SMEM int32[nblocks]
    w0_ref,  # SMEM int32[G * 2] dst-plan window starts (canonical order)
    enew_hbm,  # ANY [E, D] edge state, CANONICAL order (streamed, no windows)
    vtab_hbm,  # ANY [N, D] neighbor-value node table (A3·h)
    ids_hbm,  # ANY int32[E // LANE, LANE] src ids, canonical (PAD on pads)
    vids_hbm,  # ANY int32[E // LANE, LANE] clamped dst ids, canonical
    out_ref,  # VMEM [BN, 2D] block: [Σ σ·v | Σ σ]
    e_buf,  # VMEM [slots, CHUNK, D]
    ids_buf,  # VMEM int32[slots, SUBCHUNKS, LANE]
    vids_buf,  # VMEM int32[slots, SUBCHUNKS, LANE]
    win_buf,  # VMEM [slots, gpc, 2, wr, D] value-table windows
    sems,  # DMA sems [slots, 3] (e_new, ids, vids)
    win_sems,  # DMA sems [slots, gpc, 2]
    *,
    block_nodes: int,
    feat_dim: int,
    wr: int,
    group: int,
    sub: int = 0,
    slots: int = 2,
    split: bool = False,
    batch: int = 1,
):
    """Reverse-direction gated aggregation WITHOUT the src sort: the one-hot
    segment-sum does not require sorted keys — only the per-block chunk
    ranges do, and on banded assembly graphs the canonical positions of a
    node block's out-edges span barely more chunks than its in-edges. So
    this kernel streams e_new LINEARLY in canonical order (~1 row/id vs the
    order-plan windows' ~3.5 rows/id of ``_fused_sigma_opp_kernel``) and
    one-hots on the unsorted src ids; only the [N, D] value gather uses
    banded windows (the cheap, near-sorted dst plan). The src-sorted e_new
    copy, the order/inv permutation plans, and their window streams cease
    to exist on this path.

    ``sub > 0``: SUBTILE accumulate — the in-block span of each chunk's
    (unsorted) src ids is derived on the VPU from the ids tile itself;
    when it fits ``sub`` rows, the 16 one-hot accumulates run on a
    [sub, LANE] window at a dynamic 8-aligned offset into the out block
    instead of the full [block_nodes, LANE] (same trick as
    ``_segment_sum_sub_kernel``; on banded graphs canonical-order src ids
    are near-sorted so most chunks fit). Chunks with no in-block ids —
    the duplicated-footprint boundary chunks of the unsorted grid — skip
    the math entirely.

    ``batch > 1`` (GNNOME_SIGMA_BATCH; must divide the plan ``group``):
    lane-concatenated one-hot compares (``_wide_onehot``) turn the
    ``batch`` narrow select/accumulate matmuls into one wide issue each
    (same lever as ``_fused_gate_gather_kernel``)."""
    from gnnome_tpu.ops.banded import _select_matmul

    assert group % batch == 0, (group, batch)
    nb = SUBCHUNKS // batch
    bl = batch * LANE
    gpb = group // batch
    i = pl.program_id(0)
    lo = chunk_lo_ref[i]
    hi = chunk_hi_ref[i]
    blo = i * block_nodes
    node_ids = blo + jax.lax.broadcasted_iota(
        jnp.int32, (block_nodes, 1), 0
    )
    sub_iota = (jax.lax.broadcasted_iota(jnp.int32, (sub, 1), 0)
                if sub else None)
    gpc = SUBCHUNKS // group

    def in_dmas(slot, c):
        return (
            pltpu.make_async_copy(
                enew_hbm.at[pl.ds(c * CHUNK_EDGES, CHUNK_EDGES), :],
                e_buf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(
                ids_hbm.at[pl.ds(c * SUBCHUNKS, SUBCHUNKS), :],
                ids_buf.at[slot], sems.at[slot, 1]),
            pltpu.make_async_copy(
                vids_hbm.at[pl.ds(c * SUBCHUNKS, SUBCHUNKS), :],
                vids_buf.at[slot], sems.at[slot, 2]),
        )

    def window_dma(slot, c, gr, wi):
        start = pl.multiple_of(w0_ref[2 * (c * gpc + gr) + wi], 8)
        return pltpu.make_async_copy(
            vtab_hbm.at[pl.ds(start, wr), :],
            win_buf.at[slot, gr, wi],
            win_sems.at[slot, gr, wi],
        )

    def start_chunk(slot, c):
        for d in in_dmas(slot, c):
            d.start()
        for gr in range(gpc):
            for wi in range(2):
                window_dma(slot, c, gr, wi).start()

    for k in range(slots - 1):
        @pl.when(lo + k < hi)
        def _(k=k):
            start_chunk(k, lo + k)

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (wr, 1), 0)

    if sub:
        out_ref[...] = jnp.zeros((block_nodes, 2 * feat_dim), jnp.float32)

    def subrow_sums(slot, c, r):
        """(σ·v, σ) tiles of batched row ``r`` (the value-window select +
        the sigmoid), shared by the subtile and full-block accumulates."""
        gr = r // gpb
        v_rows = jnp.zeros((bl, feat_dim), jnp.float32)
        for wi in range(2):
            base = w0_ref[2 * (c * gpc + gr) + wi]
            sel = _wide_onehot(
                lambda j: (row_iota + base
                           == vids_buf[slot, r * batch + j
                                       : r * batch + j + 1, :]),
                batch)
            v_rows = v_rows + _select_matmul(sel, win_buf[slot, gr, wi])
        e_tile = e_buf[slot, r * bl : (r + 1) * bl, :]
        sig = jax.nn.sigmoid(e_tile.astype(jnp.float32))
        vdt = win_buf.dtype
        return (sig * v_rows).astype(vdt), sig.astype(vdt)

    def chunk_accumulate(slot, c, row_ids, a1, a2):
        """nb batched rows of this chunk accumulated into register values
        a1/a2 (``split`` interleaves two dot chains, merged at the end)."""
        b1 = jnp.zeros_like(a1) if split else None
        b2 = jnp.zeros_like(a2) if split else None
        for r in range(nb):
            # UNSORTED one-hot: src ids of this canonical subrow match
            # whichever of this block's nodes they name (PAD never matches)
            onehot = _wide_onehot(
                lambda j: (ids_buf[slot, r * batch + j
                                   : r * batch + j + 1, :] == row_ids),
                batch)
            sv, sb = subrow_sums(slot, c, r)
            if split and r % 2 == 1:
                b1 = _acc_matmul(b1, onehot, sv)
                b2 = _acc_matmul(b2, onehot, sb)
            else:
                a1 = _acc_matmul(a1, onehot, sv)
                a2 = _acc_matmul(a2, onehot, sb)
        if split:
            a1 = a1 + b1
            a2 = a2 + b2
        return a1, a2

    def body(c_rel, acc):
        acc1, acc2 = acc
        c = lo + c_rel
        slot = jax.lax.rem(c_rel, slots)

        @pl.when(c + slots - 1 < hi)
        def _():
            nxt = jax.lax.rem(c_rel + slots - 1, slots)
            start_chunk(nxt, c + slots - 1)

        for d in in_dmas(slot, c):
            d.wait()
        # semaphore discipline: every started window DMA must be waited,
        # even for chunks whose math is skipped below
        for gr in range(gpc):
            for wi in range(2):
                window_dma(slot, c, gr, wi).wait()

        if sub:
            idsv = ids_buf[slot]
            inb = jnp.logical_and(idsv >= blo, idsv < blo + block_nodes)
            lo_id = jnp.min(jnp.where(inb, idsv, PAD_SEGMENT))
            hi_id = jnp.max(jnp.where(inb, idsv, -1))
            off = pl.multiple_of(
                jnp.clip(lo_id - blo, 0, block_nodes - sub) & ~7, 8)
            narrow = hi_id < blo + off + sub

            @pl.when(jnp.logical_and(narrow, hi_id >= 0))
            def _():
                sub_ids = blo + off + sub_iota
                a1, a2 = chunk_accumulate(
                    slot, c, sub_ids,
                    out_ref[pl.ds(off, sub), :feat_dim],
                    out_ref[pl.ds(off, sub), feat_dim:],
                )
                out_ref[pl.ds(off, sub), :feat_dim] = a1
                out_ref[pl.ds(off, sub), feat_dim:] = a2

            @pl.when(jnp.logical_not(narrow))
            def _():
                a1, a2 = chunk_accumulate(
                    slot, c, node_ids,
                    out_ref[:, :feat_dim], out_ref[:, feat_dim:],
                )
                out_ref[:, :feat_dim] = a1
                out_ref[:, feat_dim:] = a2

            return acc
        return chunk_accumulate(slot, c, node_ids, acc1, acc2)

    if sub:
        jax.lax.fori_loop(0, hi - lo, body, (0, 0))
    else:
        acc1 = jnp.zeros((block_nodes, feat_dim), jnp.float32)
        acc2 = jnp.zeros((block_nodes, feat_dim), jnp.float32)
        acc1, acc2 = jax.lax.fori_loop(0, hi - lo, body, (acc1, acc2))
        out_ref[:, :feat_dim] = acc1
        out_ref[:, feat_dim:] = acc2


def fused_sigma_unsorted_pallas(
    e_new: jax.Array,  # [E, D] edge state, CANONICAL order
    values_table: jax.Array,  # [N, D] node table (A3·h)
    src_ids: jax.Array,  # int32[E] src per canonical edge (PAD on padding)
    dst_ids: jax.Array,  # int32[E] clamped dst per canonical edge
    dst_plan,  # BandPlan over dst_ids (by_dst key/expand plan)
    canon_lo: jax.Array,  # int32[N] min canonical position per src node
    canon_hi: jax.Array,  # int32[N] max canonical position (incl.; -1 none)
    num_segments: int,
    interpret: bool = False,
) -> jax.Array:
    """[Σ σ(e_new)·values[dst] ‖ Σ σ(e_new)] keyed by the UNSORTED src —
    the permutation-free reverse aggregation (see kernel docstring)."""
    e_pad, d = e_new.shape
    if d % LANE != 0:
        d_pad = ((d + LANE - 1) // LANE) * LANE
        padc = ((0, 0), (0, d_pad - d))
        sums = fused_sigma_unsorted_pallas(
            jnp.pad(e_new, padc), jnp.pad(values_table, padc),
            src_ids, dst_ids, dst_plan, canon_lo, canon_hi,
            num_segments, interpret)
        return jnp.concatenate(
            [sums[:, :d], sums[:, d_pad : d_pad + d]], axis=-1)
    bn, ch = _pick_block_nodes(num_segments, 512), CHUNK_EDGES
    assert e_pad % ch == 0 and num_segments % bn == 0
    assert dst_plan.ok
    assert dst_plan.w0.shape[0] * LANE * dst_plan.group == e_pad
    nblocks = num_segments // bn
    lo_b = canon_lo.reshape(nblocks, bn).min(axis=1)
    hi_b = canon_hi.reshape(nblocks, bn).max(axis=1)
    chunk_lo = (lo_b // ch).astype(jnp.int32)
    chunk_hi = jnp.where(hi_b >= 0, hi_b // ch + 1, 0).astype(jnp.int32)
    chunk_lo = jnp.minimum(chunk_lo, chunk_hi).astype(jnp.int32)
    ids_2d = src_ids.reshape(e_pad // LANE, LANE)
    vids_2d = dst_ids.reshape(e_pad // LANE, LANE)
    sub = _env_sub("GNNOME_SIGMA_SUB", _policy_sub(num_segments, e_pad, bn))
    if sub >= bn:
        sub = 0
    # measured defaults (scripts/sweep_epilog.py, 1M edges, v5e):
    # slots=4 + split 5.42 ms vs 5.69 at the old double-buffer default
    slots = max(int(os.environ.get("GNNOME_SIGMA_SLOTS", "4")), 2)
    # GNNOME_SIGMA_BATCH: subrows per select/accumulate matmul, clamped
    # to a divisor of the plan group (same lever as GNNOME_EPILOG_BATCH).
    # Measured at 1M edges on v5e (SWEEP_ROUND=4): batch4 nosplit 3.79 ms
    # vs batch1 split 4.97 — batching already shortens the dot chain, so
    # the split interleave defaults OFF when batch > 1.
    batch = _pick_batch("GNNOME_SIGMA_BATCH", dst_plan.group)
    split = os.environ.get(
        "GNNOME_SIGMA_SPLIT", "1" if batch == 1 else "0") == "1"
    # per-slot scratch: value windows + the e_new chunk + two ids tiles —
    # clamp the pipeline depth so total scratch stays within ~10 MB VMEM
    per_slot = (
        (SUBCHUNKS // dst_plan.group) * 2 * dst_plan.wr * d
        * values_table.dtype.itemsize
        + ch * d * e_new.dtype.itemsize + 2 * SUBCHUNKS * LANE * 4
    )
    slots = max(2, min(slots, 10_000_000 // max(per_slot, 1)))

    kernel = functools.partial(
        _fused_sigma_unsorted_kernel, block_nodes=bn, feat_dim=d,
        wr=dst_plan.wr, group=dst_plan.group, sub=sub, slots=slots,
        split=split, batch=batch,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (bn, 2 * d), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((slots, ch, d), e_new.dtype),
            pltpu.VMEM((slots, SUBCHUNKS, LANE), jnp.int32),
            pltpu.VMEM((slots, SUBCHUNKS, LANE), jnp.int32),
            pltpu.VMEM((slots, SUBCHUNKS // dst_plan.group, 2,
                        dst_plan.wr, d), values_table.dtype),
            pltpu.SemaphoreType.DMA((slots, 3)),
            pltpu.SemaphoreType.DMA((slots, SUBCHUNKS // dst_plan.group, 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_segments, 2 * d), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * e_pad * bn * d + 2 * e_pad * 2 * dst_plan.wr * d,
            bytes_accessed=e_pad * d * e_new.dtype.itemsize
            + (e_pad // (LANE * dst_plan.group)) * 2 * dst_plan.wr * d
            * values_table.dtype.itemsize
            + 2 * e_pad * 4 + num_segments * 2 * d * 4,
            transcendentals=e_pad * d,
        ),
    )(chunk_lo, chunk_hi, dst_plan.w0.reshape(-1),
      e_new, values_table, ids_2d, vids_2d)


# ---------------------------------------------------------------------------
# gate-front fused kernel: dual banded endpoint gather + add + BN moments
# ---------------------------------------------------------------------------


def _gate_front_kernel(
    w0s_ref,  # SMEM int32[S * 2]  src-plan window starts (scalar prefetch)
    w0d_ref,  # SMEM int32[S * 2]  dst-plan window starts (scalar prefetch)
    ids_s_ref,  # VMEM int32[8, LANE] block: clamped src ids
    ids_d_ref,  # VMEM int32[8, LANE] block: clamped dst ids
    e_ref,  # VMEM [CHUNK, D] block: edge state (B3 applied IN-kernel)
    w3_ref,  # VMEM [D, D]: B3 weight
    bias3_ref,  # VMEM [1, D]: B3 bias
    b1h_hbm,  # ANY [N, D] node table gathered by src
    b2h_hbm,  # ANY [N, D] node table gathered by dst
    gate_ref,  # VMEM [CHUNK, D] block out: b1h[src] + b2h[dst] + e·W3 + b3
    mom_ref,  # VMEM f32[8, D] out (rows 0/1 = Σ gate, Σ gate²; same block
    #           every grid step — the sequential TPU grid accumulates)
    win1_buf,  # VMEM [nslots, 2, wr_s, D]
    win2_buf,  # VMEM [nslots, 2, wr_d, D]
    sems,  # DMA sems [nslots, 2, 2]
    *,
    wr_s: int,
    wr_d: int,
    out_dim: int,
    total_groups: tuple,  # per plan: subrow count // group
    nslots: int,
    n_edges: int,
    groups: tuple = (1, 1),  # per plan: subrows served per window pair
    batch: int = 1,
):
    from gnnome_tpu.ops.banded import _select_matmul

    assert all(g % batch == 0 for g in groups), (groups, batch)
    nb = SUBCHUNKS // batch  # batched rows per chunk
    bl = batch * LANE
    gpb = tuple(g // batch for g in groups)  # batched rows per window pair
    c = pl.program_id(0)
    gpc = tuple(SUBCHUNKS // g for g in groups)  # groups per chunk, per ti

    def window_dma(slot, gg, wi, ti):
        w0 = w0s_ref if ti == 0 else w0d_ref
        buf = win1_buf if ti == 0 else win2_buf
        hbm = b1h_hbm if ti == 0 else b2h_hbm
        wr = wr_s if ti == 0 else wr_d
        start = pl.multiple_of(w0[2 * gg + wi], 8)
        return pltpu.make_async_copy(
            hbm.at[pl.ds(start, wr), :], buf.at[slot, wi], sems.at[slot, wi, ti]
        )

    @pl.when(c == 0)
    def _():
        for ti in range(2):
            for g0 in range(min(nslots, total_groups[ti])):
                for wi in range(2):
                    window_dma(g0 % nslots, g0, wi, ti).start()
        mom_ref[:] = jnp.zeros_like(mom_ref)

    iota_s = jax.lax.broadcasted_iota(jnp.int32, (wr_s, 1), 0)
    iota_d = jax.lax.broadcasted_iota(jnp.int32, (wr_d, 1), 0)
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (bl, 1), 0)
    m_sum = jnp.zeros((1, out_dim), jnp.float32)
    m_sq = jnp.zeros((1, out_dim), jnp.float32)

    for r in range(nb):
        gg = tuple(c * gpc[ti] + r // gpb[ti] for ti in range(2))
        slot = tuple(gg[ti] % nslots for ti in range(2))
        for ti in range(2):
            if r % gpb[ti] == 0:
                for wi in range(2):
                    window_dma(slot[ti], gg[ti], wi, ti).wait()
        # B3 projection on the MXU, matching the XLA linear()'s numerics:
        # Mosaic requires a 32-bit accumulator, so ask for f32 and round
        # the result to the edge dtype ourselves — exactly what XLA's
        # bf16 dot does. f32 inputs need HIGHEST or Mosaic truncates the
        # MXU operands to bf16.
        e_tile = e_ref[r * bl : (r + 1) * bl, :]
        prec = (None if e_tile.dtype == jnp.bfloat16
                else jax.lax.Precision.HIGHEST)
        proj = jax.lax.dot_general(
            e_tile, w3_ref[...], (((1,), (0,)), ((), ())),
            precision=prec, preferred_element_type=jnp.float32,
        ).astype(e_tile.dtype)
        acc = (proj + bias3_ref[...]).astype(jnp.float32)
        for wi in range(2):
            oh_s = _wide_onehot(
                lambda j: (iota_s + w0s_ref[2 * gg[0] + wi]
                           == ids_s_ref[r * batch + j
                                        : r * batch + j + 1, :]),
                batch)
            acc = acc + _select_matmul(oh_s, win1_buf[slot[0], wi])
            oh_d = _wide_onehot(
                lambda j: (iota_d + w0d_ref[2 * gg[1] + wi]
                           == ids_d_ref[r * batch + j
                                        : r * batch + j + 1, :]),
                batch)
            acc = acc + _select_matmul(oh_d, win2_buf[slot[1], wi])
        gate_t = acc.astype(gate_ref.dtype)
        gate_ref[r * bl : (r + 1) * bl, :] = gate_t
        # moments see the OUTPUT-dtype-rounded gate (matches the XLA path,
        # which computes masked_moments on the materialized bf16 gate);
        # padding is a static edge suffix, so the mask is an iota compare
        gf = gate_t.astype(jnp.float32)
        mask = (row_idx + (c * CHUNK_EDGES + r * bl) < n_edges).astype(
            jnp.float32
        )
        gm = gf * mask
        m_sum = m_sum + jnp.sum(gm, axis=0, keepdims=True)
        m_sq = m_sq + jnp.sum(gm * gf, axis=0, keepdims=True)

        for ti in range(2):
            if r % gpb[ti] == gpb[ti] - 1:
                @pl.when(gg[ti] + nslots < total_groups[ti])
                def _(ti=ti):
                    for wi in range(2):
                        window_dma(slot[ti], gg[ti] + nslots, wi, ti).start()

    mom_ref[0:1, :] += m_sum
    mom_ref[1:2, :] += m_sq


def gate_front_pallas(
    b1h: jax.Array,  # [N_pad, D] src-side node table
    b2h: jax.Array,  # [N_pad, D] dst-side node table
    e: jax.Array,  # [E_pad, D] edge state (B3 projection runs IN-kernel)
    w3: jax.Array,  # [D, D] B3 weight (edge dtype)
    bias3: jax.Array,  # [D] B3 bias (edge dtype)
    src_ids: jax.Array,  # int32[E_pad] clamped (pads = 0), canonical order
    dst_ids: jax.Array,  # int32[E_pad] clamped, canonical order
    src_plan,  # BandPlan over src_ids (CSR.key_plan of by_src)
    dst_plan,  # BandPlan over dst_ids (CSR.key_plan of by_dst)
    n_edges: int,  # real edge count (static; moments mask)
    interpret: bool = False,
):
    """(gate, mom): ``gate = b1h[src] + b2h[dst] + (e·W3 + b3)`` and
    ``mom = [Σ gate·mask ‖ Σ gate²·mask]`` (f32[2, D], mask = real edges) in
    ONE pass — the SDDMM gate construction plus the BatchNorm statistics
    reduction, without materializing either endpoint-gathered table OR the
    projected b3e (the [E, D]×[D, D] matmul runs on the MXU per tile,
    saving b3e's HBM write + read per forward execution).

    Replaces, per layer: two banded gathers (write [E,D] each), the B3
    linear's round-trip, the XLA add-chain, and the separate
    ``masked_moments`` read — the round-2 mega-fusion lever
    (PERFORMANCE.md "1M-edge profile"). Reference math unchanged:
    ``layers/gated_gcn_full.py:120-127``.
    """
    n_rows, d = b1h.shape
    e_pad = src_ids.shape[0]
    assert e_pad % CHUNK_EDGES == 0
    assert src_plan.ok and dst_plan.ok
    if d % LANE != 0:
        d_pad = ((d + LANE - 1) // LANE) * LANE
        padc = ((0, 0), (0, d_pad - d))
        gate, mom = gate_front_pallas(
            jnp.pad(b1h, padc), jnp.pad(b2h, padc), jnp.pad(e, padc),
            jnp.pad(w3, ((0, d_pad - d), (0, d_pad - d))),
            jnp.pad(bias3, (0, d_pad - d)),
            src_ids, dst_ids, src_plan, dst_plan, n_edges, interpret)
        return gate[:, :d], mom[:, :d]
    per_slot = 2 * (src_plan.wr + dst_plan.wr) * d * b1h.dtype.itemsize
    nslots = int(max(2, min(8, 4_500_000 // per_slot)))
    total_subrows = e_pad // LANE
    nchunks = e_pad // CHUNK_EDGES
    # GNNOME_GATE_BATCH: subrows per select/B3 matmul, clamped to a common
    # divisor of both plan groups (same lever as GNNOME_EPILOG_BATCH)
    batch = _pick_batch("GNNOME_GATE_BATCH", src_plan.group, dst_plan.group)

    kernel = functools.partial(
        _gate_front_kernel, wr_s=src_plan.wr, wr_d=dst_plan.wr, out_dim=d,
        total_groups=(total_subrows // src_plan.group,
                      total_subrows // dst_plan.group),
        nslots=nslots, n_edges=n_edges,
        groups=(src_plan.group, dst_plan.group), batch=batch,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((SUBCHUNKS, LANE), lambda c, *_: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUBCHUNKS, LANE), lambda c, *_: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_EDGES, d), lambda c, *_: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w3, whole array
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias3, whole array
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((CHUNK_EDGES, d), lambda c, *_: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d), lambda c, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((nslots, 2, src_plan.wr, d), b1h.dtype),
            pltpu.VMEM((nslots, 2, dst_plan.wr, d), b2h.dtype),
            pltpu.SemaphoreType.DMA((nslots, 2, 2)),
        ],
    )
    gate, mom = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((e_pad, d), e.dtype),
            jax.ShapeDtypeStruct((8, d), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * e_pad * 2 * (src_plan.wr + dst_plan.wr) * d
            + 2 * e_pad * d * d,
            bytes_accessed=(e_pad // (LANE * src_plan.group)) * 2
            * src_plan.wr * d * b1h.dtype.itemsize
            + (e_pad // (LANE * dst_plan.group)) * 2
            * dst_plan.wr * d * b2h.dtype.itemsize
            + 2 * e_pad * d * e.dtype.itemsize + 2 * e_pad * 4,
            transcendentals=0,
        ),
    )(src_plan.w0.reshape(-1), dst_plan.w0.reshape(-1),
      src_ids.reshape(total_subrows, LANE), dst_ids.reshape(total_subrows, LANE),
      e, w3, bias3.reshape(1, -1), b1h, b2h)
    return gate, mom[:2]


def _fused_gate_gather_kernel(
    chunk_lo_ref,  # SMEM int32[nblocks]
    chunk_hi_ref,  # SMEM int32[nblocks]
    w0_ref,  # SMEM int32[S * 2] src-plan window starts
    cfirst_ref,  # SMEM int32[E/CHUNK] min real segment id per chunk
    clast_ref,  # SMEM int32[E/CHUNK] max real segment id per chunk
    affine_ref,  # VMEM [2, D]: rows = scale2, bias2 (folded BN affine)
    graw_hbm,  # ANY [E, D] raw gate (pre-norm), CSR-sorted
    ein_hbm,  # ANY [E, D] residual edge state, CSR-sorted
    vtab_hbm,  # ANY [N, D] neighbor-value node table (A2·h)
    ids_hbm,  # ANY int32[E // LANE, LANE] segment (dst) ids
    vids_hbm,  # ANY int32[E // LANE, LANE] clamped src ids
    out_ref,  # VMEM [BN, 2D] block: [Σ σ·v | Σ σ]
    enew_hbm,  # ANY [E, D] output: e_new = relu(g*s2+b2) + e_in
    g_buf,  # VMEM [2, CHUNK, D]
    e_buf,  # VMEM [2, CHUNK, D]
    ids_buf,  # VMEM int32[2, SUBCHUNKS, LANE]
    vids_buf,  # VMEM int32[2, SUBCHUNKS, LANE]
    enew_buf,  # VMEM [2, CHUNK, D] staging for the e_new write-back
    win_buf,  # VMEM [2, gpc, 2, wr, D] value-table windows
    sems,  # DMA sems [2, 4] (graw, ein, ids, vids)
    out_sem,  # DMA sems [2] (e_new write-back)
    win_sems,  # DMA sems [2, gpc, 2]
    *,
    block_nodes: int,
    feat_dim: int,
    wr: int,
    group: int = 1,
    sub: int = 0,
    slots: int = 2,
    split: bool = False,
    batch: int = 1,
):
    """``_fused_gate_kernel`` with the neighbor-value gather folded in:
    instead of streaming a pregathered [E, D] ``vals`` table, each subrow
    DMAs its two banded windows of the [N, D] node table and selects rows
    on the MXU (``ops/banded.py`` one-hot pattern) — the pregathered table
    never exists in HBM (saves its write + read per forward execution and
    0.5 GB of remat residency at 1M edges).

    ``sub > 0`` enables the SUBTILE accumulate: segment ids are sorted, so
    a 1024-edge chunk's ids span ~E/N·1024 ≈ 154 rows at assembly-graph
    degree — the one-hot accumulate runs on a [sub, LANE] window placed at
    the chunk's first in-block id (8-aligned dynamic row offset into the
    out block) instead of the full [block_nodes, LANE], cutting accumulate
    MXU flops and acc read-modify-write traffic by block_nodes/sub. Chunks
    whose in-block span exceeds ``sub`` (rare: hub nodes, pad boundary)
    fall back to the full-block accumulate under ``pl.when``.

    ``slots``: chunk-pipeline depth — input/window/e_new-staging buffers
    rotate over ``slots`` slots with up to ``slots - 1`` chunks in flight
    (GNNOME_EPILOG_SLOTS).

    The accumulate reads the out block ONCE per chunk, runs the 8 subrow
    one-hot dots on register values, and writes back once (the previous
    form did a VMEM read-modify-write per subrow per half — 16 serialized
    round-trips through the same region per chunk). ``split`` breaks the
    8-dot accumulate dependency chain into two interleaved chains
    (GNNOME_EPILOG_SPLIT, as in ``_segment_sum_sub_kernel``).

    ``batch > 1`` (GNNOME_EPILOG_BATCH; must divide the plan ``group``)
    processes ``batch`` consecutive subrows per iteration: their one-hot
    compares are lane-concatenated (``_wide_onehot``) so each iteration
    issues ONE wide select per window ([wr, batch·128]) and ONE wide
    accumulate per half (contraction batch·128) instead of ``batch``
    narrow ones — same FLOPs, 1/batch the MXU issue count and
    accumulate-chain depth."""
    from gnnome_tpu.ops.banded import _select_matmul

    assert group % batch == 0, (group, batch)
    nb = SUBCHUNKS // batch  # batched rows per chunk
    bl = batch * LANE  # ids per batched row
    gpb = group // batch  # batched rows served per window group
    i = pl.program_id(0)
    lo = chunk_lo_ref[i]
    hi = chunk_hi_ref[i]
    node_ids = i * block_nodes + jax.lax.broadcasted_iota(
        jnp.int32, (block_nodes, 1), 0
    )
    scale2 = affine_ref[0:1, :].astype(jnp.float32)
    bias2 = affine_ref[1:2, :].astype(jnp.float32)

    def in_dmas(slot, c):
        return (
            pltpu.make_async_copy(
                graw_hbm.at[pl.ds(c * CHUNK_EDGES, CHUNK_EDGES), :],
                g_buf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(
                ein_hbm.at[pl.ds(c * CHUNK_EDGES, CHUNK_EDGES), :],
                e_buf.at[slot], sems.at[slot, 1]),
            pltpu.make_async_copy(
                ids_hbm.at[pl.ds(c * SUBCHUNKS, SUBCHUNKS), :],
                ids_buf.at[slot], sems.at[slot, 2]),
            pltpu.make_async_copy(
                vids_hbm.at[pl.ds(c * SUBCHUNKS, SUBCHUNKS), :],
                vids_buf.at[slot], sems.at[slot, 3]),
        )

    gpc = SUBCHUNKS // group  # window groups per chunk

    def window_dma(slot, c, gr, wi):
        start = pl.multiple_of(w0_ref[2 * (c * gpc + gr) + wi], 8)
        return pltpu.make_async_copy(
            vtab_hbm.at[pl.ds(start, wr), :],
            win_buf.at[slot, gr, wi],
            win_sems.at[slot, gr, wi],
        )

    def start_chunk(slot, c):
        for d in in_dmas(slot, c):
            d.start()
        for gr in range(gpc):
            for wi in range(2):
                window_dma(slot, c, gr, wi).start()

    def out_dma(slot, c):
        return pltpu.make_async_copy(
            enew_buf.at[slot],
            enew_hbm.at[pl.ds(c * CHUNK_EDGES, CHUNK_EDGES), :],
            out_sem.at[slot],
        )

    for k in range(slots - 1):
        @pl.when(lo + k < hi)
        def _(k=k):
            start_chunk(k, lo + k)

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (wr, 1), 0)
    sub_iota = (jax.lax.broadcasted_iota(jnp.int32, (sub, 1), 0)
                if sub else None)

    out_ref[...] = jnp.zeros((block_nodes, 2 * feat_dim), jnp.float32)

    def body(c_rel, carry):
        c = lo + c_rel
        slot = jax.lax.rem(c_rel, slots)

        @pl.when(c + slots - 1 < hi)
        def _():
            nxt = jax.lax.rem(c_rel + slots - 1, slots)
            start_chunk(nxt, c + slots - 1)

        for d in in_dmas(slot, c):
            d.wait()

        # wait for the previous write from this staging slot (if any)
        @pl.when(c_rel >= slots)
        def _():
            out_dma(slot, c - slots).wait()

        def chunk_accumulate(row_ids, a1, a2):
            """nb batched rows of this chunk: window waits, banded value
            select, gate epilog (e_new staged for write-back), σ, and the
            one-hot accumulate into REGISTER values a1/a2 (callers read
            the out block once and write once)."""
            b1 = jnp.zeros_like(a1) if split else None
            b2 = jnp.zeros_like(a2) if split else None
            for r in range(nb):
                gr = r // gpb
                if r % gpb == 0:
                    for wi in range(2):
                        window_dma(slot, c, gr, wi).wait()
                sl = slice(r * bl, (r + 1) * bl)
                graw = g_buf[slot, sl, :].astype(jnp.float32)
                ein = e_buf[slot, sl, :].astype(jnp.float32)
                v_rows = jnp.zeros((bl, feat_dim), jnp.float32)
                for wi in range(2):
                    base = w0_ref[2 * (c * gpc + gr) + wi]
                    sel = _wide_onehot(
                        lambda j: (row_iota + base
                                   == vids_buf[slot, r * batch + j
                                               : r * batch + j + 1, :]),
                        batch)  # [wr, bl]
                    v_rows = v_rows + _select_matmul(
                        sel, win_buf[slot, gr, wi])
                enew = jnp.maximum(graw * scale2 + bias2, 0.0) + ein
                enew_buf[slot, sl, :] = enew.astype(enew_buf.dtype)
                sig = jax.nn.sigmoid(enew)
                # match the pregathered kernel's numerics: products in the
                # value dtype so bf16 runs one MXU pass, f32 keeps the split
                vdt = win_buf.dtype
                sv = (sig * v_rows).astype(vdt)
                sb = sig.astype(vdt)
                oh = _wide_onehot(
                    lambda j: (ids_buf[slot, r * batch + j
                                       : r * batch + j + 1, :] == row_ids),
                    batch)
                if split and r % 2 == 1:
                    b1 = _acc_matmul(b1, oh, sv)
                    b2 = _acc_matmul(b2, oh, sb)
                else:
                    a1 = _acc_matmul(a1, oh, sv)
                    a2 = _acc_matmul(a2, oh, sb)
            if split:
                a1 = a1 + b1
                a2 = a2 + b2
            return a1, a2

        if sub:
            blo = i * block_nodes
            fi = cfirst_ref[c]
            li = clast_ref[c]
            off = pl.multiple_of(
                jnp.clip(fi - blo, 0, block_nodes - sub) & ~7, 8)
            # every real in-block id of this chunk fits the window: ids
            # below blo + off cannot exist (fi is the chunk min and the
            # 8-alignment only lowers the start), ids >= blo + block_nodes
            # belong to later blocks and match nothing
            narrow = jnp.minimum(li, blo + block_nodes - 1) < blo + off + sub
            sub_ids = blo + off + sub_iota

            @pl.when(narrow)
            def _():
                a1, a2 = chunk_accumulate(
                    sub_ids,
                    out_ref[pl.ds(off, sub), :feat_dim],
                    out_ref[pl.ds(off, sub), feat_dim:],
                )
                out_ref[pl.ds(off, sub), :feat_dim] = a1
                out_ref[pl.ds(off, sub), feat_dim:] = a2

            @pl.when(jnp.logical_not(narrow))
            def _():
                a1, a2 = chunk_accumulate(
                    node_ids, out_ref[:, :feat_dim], out_ref[:, feat_dim:]
                )
                out_ref[:, :feat_dim] = a1
                out_ref[:, feat_dim:] = a2
        else:
            a1, a2 = chunk_accumulate(
                node_ids, out_ref[:, :feat_dim], out_ref[:, feat_dim:]
            )
            out_ref[:, :feat_dim] = a1
            out_ref[:, feat_dim:] = a2
        out_dma(slot, c).start()
        return carry

    jax.lax.fori_loop(0, hi - lo, body, 0)

    # drain outstanding e_new writes
    for k in range(1, slots + 1):
        @pl.when(hi - lo >= k)
        def _(k=k):
            out_dma(jax.lax.rem(hi - lo - k, slots), hi - k).wait()


def fused_gate_sigma_gather_pallas(
    gate_raw_sorted: jax.Array,  # [E, D] canonical (dst-sorted) order
    e_in_sorted: jax.Array,  # [E, D]
    values_table: jax.Array,  # [N, D] node table (A2·h)
    affine: jax.Array,  # [2, D] (scale2, bias2)
    segment_ids_sorted: jax.Array,  # int32[E] dst ids (PAD on padding)
    value_ids: jax.Array,  # int32[E] clamped src ids, canonical order
    value_plan,  # BandPlan over value_ids (by_src.key_plan)
    offsets: jax.Array,
    num_segments: int,
    interpret: bool = False,
):
    """``fused_gate_sigma_aggregate_pallas`` with the neighbor gather
    fused: the [E, D] pregathered ``vals`` table is replaced by banded
    window DMAs of the [N, D] node table selected on the MXU. Numerically
    identical on bf16 tables (selection is exact); ~2⁻⁴⁸ on f32."""
    e_pad, d = gate_raw_sorted.shape
    if d % LANE != 0:
        d_pad = ((d + LANE - 1) // LANE) * LANE
        padc = ((0, 0), (0, d_pad - d))
        sums, e_new = fused_gate_sigma_gather_pallas(
            jnp.pad(gate_raw_sorted, padc), jnp.pad(e_in_sorted, padc),
            jnp.pad(values_table, padc), jnp.pad(affine, padc),
            segment_ids_sorted, value_ids, value_plan, offsets,
            num_segments, interpret)
        return (
            jnp.concatenate([sums[:, :d], sums[:, d_pad : d_pad + d]], axis=-1),
            e_new[:, :d],
        )
    bn, ch = _pick_block_nodes(num_segments, 512), CHUNK_EDGES
    assert e_pad % ch == 0 and num_segments % bn == 0
    assert value_plan.ok
    assert value_plan.w0.shape[0] * LANE * value_plan.group == e_pad
    nblocks = num_segments // bn
    block_edge_lo = offsets[0:num_segments:bn]
    block_edge_hi = offsets[bn : num_segments + 1 : bn]
    chunk_lo = (block_edge_lo // ch).astype(jnp.int32)
    chunk_hi = ((block_edge_hi + ch - 1) // ch).astype(jnp.int32)
    # the last block also covers the padding chunks so every e_new row is
    # written (their segment ids never match, so sums are unaffected)
    is_last = jnp.arange(nblocks) == nblocks - 1
    chunk_hi = jnp.where(is_last, e_pad // ch, chunk_hi).astype(jnp.int32)
    chunk_lo = jnp.minimum(chunk_lo, chunk_hi).astype(jnp.int32)
    # GNNOME_EPILOG_BATCH: subrows fused per select/accumulate matmul
    # (clamped to a divisor of the plan group — batched rows must share
    # one window pair). Measured at 1M edges on v5e (SWEEP_ROUND=3):
    # batch4 6.74 ms vs batch1 7.62 — fewer, wider MXU issues win.
    batch = _pick_batch("GNNOME_EPILOG_BATCH", value_plan.group)
    ids_2d = segment_ids_sorted.reshape(e_pad // LANE, LANE)
    vids_2d = value_ids.reshape(e_pad // LANE, LANE)

    # per-chunk real-id ranges for the subtile accumulate (PAD rows are
    # excluded so a trailing pad run cannot force the full-block path)
    ids_ch = segment_ids_sorted.reshape(e_pad // ch, ch)
    real_ch = ids_ch != PAD_SEGMENT
    cfirst = jnp.min(jnp.where(real_ch, ids_ch, PAD_SEGMENT),
                     axis=1).astype(jnp.int32)
    clast = jnp.max(jnp.where(real_ch, ids_ch, -1), axis=1).astype(jnp.int32)
    # GNNOME_SUBTILE: "0" off, unset/"1" the span-keyed per-graph policy,
    # else an explicit window height
    sub = _env_sub("GNNOME_SUBTILE", _policy_sub(num_segments, e_pad, bn))
    if not (bn > max(sub, 128)):
        sub = 0
    # measured defaults (scripts/sweep_epilog.py, 1M edges, v5e): slots=3
    # with the policy subtile is the sweep best (7.60 ms vs 8.11 at
    # slots=2); split is OFF by default here — the subtile+split variant
    # hits a pathological Mosaic compile (>20 min)
    slots = max(int(os.environ.get("GNNOME_EPILOG_SLOTS", "3")), 2)
    split = os.environ.get("GNNOME_EPILOG_SPLIT", "0") == "1"
    # per-slot scratch: gate + e_in + e_new-staging chunks, the value
    # windows, and two ids tiles — clamp depth to ~10 MB total scratch
    per_slot = (
        ch * d * (gate_raw_sorted.dtype.itemsize
                  + 2 * e_in_sorted.dtype.itemsize)
        + (SUBCHUNKS // value_plan.group) * 2 * value_plan.wr * d
        * values_table.dtype.itemsize
        + 2 * SUBCHUNKS * LANE * 4
    )
    slots = max(2, min(slots, 10_000_000 // max(per_slot, 1)))

    kernel = functools.partial(
        _fused_gate_gather_kernel, block_nodes=bn, feat_dim=d,
        wr=value_plan.wr, group=value_plan.group, sub=sub, slots=slots,
        split=split, batch=batch,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # affine, whole array
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((bn, 2 * d), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # e_new stays in HBM
        ),
        scratch_shapes=[
            pltpu.VMEM((slots, ch, d), gate_raw_sorted.dtype),
            pltpu.VMEM((slots, ch, d), e_in_sorted.dtype),
            pltpu.VMEM((slots, SUBCHUNKS, LANE), jnp.int32),
            pltpu.VMEM((slots, SUBCHUNKS, LANE), jnp.int32),
            pltpu.VMEM((slots, ch, d), e_in_sorted.dtype),
            pltpu.VMEM((slots, SUBCHUNKS // value_plan.group, 2,
                        value_plan.wr, d), values_table.dtype),
            pltpu.SemaphoreType.DMA((slots, 4)),
            pltpu.SemaphoreType.DMA((slots,)),
            pltpu.SemaphoreType.DMA((slots, SUBCHUNKS // value_plan.group, 2)),
        ],
    )
    sums, e_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((num_segments, 2 * d), jnp.float32),
            jax.ShapeDtypeStruct((e_pad, d), e_in_sorted.dtype),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * e_pad * bn * d + 2 * e_pad * 2 * value_plan.wr * d,
            bytes_accessed=2 * e_pad * d * gate_raw_sorted.dtype.itemsize
            + (e_pad // (LANE * value_plan.group)) * 2 * value_plan.wr * d
            * values_table.dtype.itemsize
            + 2 * e_pad * 4 + num_segments * 2 * d * 4
            + e_pad * d * e_in_sorted.dtype.itemsize,
            transcendentals=e_pad * d,
        ),
    )(chunk_lo, chunk_hi, value_plan.w0.reshape(-1), cfirst, clast, affine,
      gate_raw_sorted, e_in_sorted, values_table, ids_2d, vids_2d)
    return sums, e_new


def fused_gate_sigma_aggregate_pallas(
    gate_raw_sorted: jax.Array,
    e_in_sorted: jax.Array,
    vals_sorted: jax.Array,
    affine: jax.Array,  # [2, D] rows (scale2, bias2): folded BN affine
    segment_ids_sorted: jax.Array,
    offsets: jax.Array,
    num_segments: int,
    interpret: bool = False,
):
    """One pass over the edges computes
    ``e_new = relu(gate_raw·scale2 + bias2) + e_in`` (written out) and
    ``[Σ σ(e_new)·v ‖ Σ σ(e_new)]`` per key node — the full per-edge gate
    epilog without any intermediate HBM round-trips.
    """
    e_pad, d = gate_raw_sorted.shape
    if d % LANE != 0:
        # lane-pad narrow feature dims (HBM slices require 128 multiples)
        d_pad = ((d + LANE - 1) // LANE) * LANE
        padc = ((0, 0), (0, d_pad - d))
        sums, e_new = fused_gate_sigma_aggregate_pallas(
            jnp.pad(gate_raw_sorted, padc), jnp.pad(e_in_sorted, padc),
            jnp.pad(vals_sorted, padc), jnp.pad(affine, padc),
            segment_ids_sorted, offsets, num_segments, interpret)
        return (
            jnp.concatenate([sums[:, :d], sums[:, d_pad : d_pad + d]], axis=-1),
            e_new[:, :d],
        )
    bn, ch = _pick_block_nodes(num_segments, 512), CHUNK_EDGES
    assert e_pad % ch == 0 and num_segments % bn == 0
    nblocks = num_segments // bn
    block_edge_lo = offsets[0:num_segments:bn]
    block_edge_hi = offsets[bn : num_segments + 1 : bn]
    chunk_lo = (block_edge_lo // ch).astype(jnp.int32)
    chunk_hi = ((block_edge_hi + ch - 1) // ch).astype(jnp.int32)
    # the last block also covers the padding chunks so every e_new row is
    # written (their segment ids never match, so sums are unaffected);
    # built scatter-free (at[].set/min would lower to HLO scatter)
    is_last = jnp.arange(nblocks) == nblocks - 1
    chunk_hi = jnp.where(is_last, e_pad // ch, chunk_hi).astype(jnp.int32)
    chunk_lo = jnp.minimum(chunk_lo, chunk_hi).astype(jnp.int32)
    ids_2d = segment_ids_sorted.reshape(e_pad // LANE, LANE)

    kernel = functools.partial(
        _fused_gate_kernel, block_nodes=bn, feat_dim=d
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # affine, whole array
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((bn, 2 * d), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # e_new stays in HBM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ch, d), gate_raw_sorted.dtype),
            pltpu.VMEM((2, ch, d), e_in_sorted.dtype),
            pltpu.VMEM((2, ch, d), vals_sorted.dtype),
            pltpu.VMEM((2, SUBCHUNKS, LANE), jnp.int32),
            pltpu.VMEM((2, ch, d), e_in_sorted.dtype),
            pltpu.SemaphoreType.DMA((2, 5)),
        ],
    )
    sums, e_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((num_segments, 2 * d), jnp.float32),
            jax.ShapeDtypeStruct((e_pad, d), e_in_sorted.dtype),
        ),
        interpret=interpret,
    )(chunk_lo, chunk_hi, affine, gate_raw_sorted, e_in_sorted,
      vals_sorted, ids_2d)
    return sums, e_new
