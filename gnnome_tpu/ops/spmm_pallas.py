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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_NODES = 128
LANE = 128
SUBCHUNKS = 8
CHUNK_EDGES = SUBCHUNKS * LANE  # 1024 edges per DMA chunk


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

        for r in range(SUBCHUNKS):
            ids_row = ids_buf[slot, r : r + 1, :]  # [1, LANE]
            onehot = (ids_row == node_ids).astype(jnp.bfloat16)  # [BN, LANE]
            tile = data_buf[slot, r * LANE : (r + 1) * LANE, :]
            # Three-term bf16 split (hi+mid+lo ≈ 24 mantissa bits): the
            # one-hot is exact in bf16, so the segment sum matches an f32
            # scatter-add to ~1e-7 rel — at half the MXU passes of an
            # f32-HIGHEST matmul, which was the kernel's bottleneck.
            data_hi = tile.astype(jnp.bfloat16)
            rem = tile - data_hi.astype(jnp.float32)
            data_mid = rem.astype(jnp.bfloat16)
            data_lo = (rem - data_mid.astype(jnp.float32)).astype(jnp.bfloat16)
            for part in (data_hi, data_mid, data_lo):
                acc = acc + jnp.dot(
                    onehot, part, preferred_element_type=jnp.float32
                )
        return acc

    acc = jnp.zeros((block_nodes, out_dim), jnp.float32)
    acc = jax.lax.fori_loop(0, hi - lo, body, acc)
    out_ref[:] = acc.astype(out_ref.dtype)


def _forward(
    data_sorted: jax.Array,
    segment_ids_sorted: jax.Array,
    offsets: jax.Array,
    num_segments: int,
    interpret: bool,
) -> jax.Array:
    e_pad, d = data_sorted.shape
    bn, ch = BLOCK_NODES, CHUNK_EDGES
    assert e_pad % ch == 0, f"edge count {e_pad} not a multiple of {ch}"
    assert num_segments % bn == 0, (
        f"node count {num_segments} not a multiple of {bn}"
    )
    nblocks = num_segments // bn

    # Per-node-block inclusive chunk ranges, derived from the CSR offsets.
    block_edge_lo = offsets[0:num_segments:bn]
    block_edge_hi = offsets[bn : num_segments + 1 : bn]
    chunk_lo = (block_edge_lo // ch).astype(jnp.int32)
    chunk_hi = ((block_edge_hi + ch - 1) // ch).astype(jnp.int32)

    ids_2d = segment_ids_sorted.reshape(e_pad // LANE, LANE)

    kernel = functools.partial(
        _segment_sum_kernel,
        block_nodes=bn,
        out_dim=d,
    )
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
            pltpu.VMEM((2, ch, d), jnp.float32),
            pltpu.VMEM((2, SUBCHUNKS, LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_segments, d), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * e_pad * bn * d,
            bytes_accessed=e_pad * d * 4 + e_pad * 4 + num_segments * d * 4,
            transcendentals=0,
        ),
    )(chunk_lo, chunk_hi, data_sorted.astype(jnp.float32), ids_2d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def sorted_segment_sum_pallas(
    data_sorted: jax.Array,
    segment_ids_sorted: jax.Array,
    offsets: jax.Array,
    num_segments: int,
    interpret: bool = False,
) -> jax.Array:
    """Segment-sum of CSR-sorted edge data into ``num_segments`` node rows.

    ``data_sorted``: f32[E_pad, D] in CSR order; ``segment_ids_sorted``:
    int32[E_pad] non-decreasing (padding = 2^30); ``offsets``:
    int32[num_segments + 1] CSR row pointers. E_pad must be a multiple of
    1024 and num_segments a multiple of 128.
    """
    return _forward(data_sorted, segment_ids_sorted, offsets, num_segments, interpret)


def _fwd(data_sorted, segment_ids_sorted, offsets, num_segments, interpret):
    out = _forward(data_sorted, segment_ids_sorted, offsets, num_segments, interpret)
    return out, segment_ids_sorted


def _bwd(num_segments, interpret, segment_ids_sorted, g):
    # d(segment_sum)/d(data) is a row gather of the cotangent; padded edges
    # (id == 2^30) receive zero.
    valid = segment_ids_sorted < num_segments
    safe_ids = jnp.where(valid, segment_ids_sorted, 0)
    grad = jnp.take(g, safe_ids, axis=0)
    grad = jnp.where(valid[:, None], grad, 0.0)
    return grad, None, None


sorted_segment_sum_pallas.defvjp(_fwd, _bwd)
