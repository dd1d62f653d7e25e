"""Edge-gated GatedGCN layer with bidirectional aggregation.

TPU-native re-derivation of the reference layer
(``layers/gated_gcn_full.py:99-157``; the math is restated by its unused UDF
variants at ``:61-97``). Per layer, for directed edge ``j → i``::

    ê        = B1·h[j] + B2·h[i] + B3·e          (SDDMM: gather + add)
    e'       = ReLU(Norm(ê)) + e                  (residual edge update)
    σ        = sigmoid(e')
    h_fwd[i] = Σ_{j→i} σ·A2·h[j] / (Σ_{j→i} σ + ε)     (aggregate in-edges)
    h_bwd[j] = Σ_{j→i} σ·A3·h[i] / (Σ_{j→i} σ + ε)     (aggregate out-edges)
    h'       = ReLU(Norm(A1·h + h_fwd + h_bwd)) + h

A structural fact this implementation exploits: in the reference's live
code path the "forward" gate ``e_ji`` (``:120-127``) and the "backward" gate
``e_ik`` computed on the reversed graph (``:133-139``) evaluate the *same*
expression on the same tensor with the same normalizer parameters — DGL's
``u_add_v('B2h','B1h')`` on the reversed edge (i→j) equals
``B1h[j] + B2h[i]``. So the gate is computed once and shared by both
aggregation directions, halving the SDDMM + normalization work relative to
a naive translation. (Only ``e_ji`` is returned as the edge state, ``:155``,
matching what we return.)

The two σ-weighted mean aggregations are the hot sparse ops; each fuses its
weighted sum and normalizer into one segment-sum (``ops.segment.gated_aggregate``),
executed by the Pallas one-hot-matmul kernel on TPU.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from gnnome_tpu.core.graph import AssemblyGraph
from gnnome_tpu.models.common import init_linear, init_norm, linear
from gnnome_tpu.ops.norm import masked_batch_norm, masked_layer_norm
from gnnome_tpu.ops.segment import (
    gated_aggregate,
    gated_aggregate_opposite,
    gated_aggregate_reverse_unsorted,
    gather_by_endpoint,
    opposite_gather_supported,
    reverse_unsorted_supported,
)


def init_gated_gcn_layer(key: jax.Array, dim: int, dtype=jnp.float32) -> Dict:
    keys = jax.random.split(key, 6)
    names = ["A1", "A2", "A3", "B1", "B2", "B3"]
    params = {n: init_linear(k, dim, dim, dtype) for n, k in zip(names, keys)}
    params["norm_h"] = init_norm(dim, dtype)
    params["norm_e"] = init_norm(dim, dtype)
    return params


def gated_gcn_layer(
    params: Dict,
    graph: AssemblyGraph,
    h: jax.Array,
    e: jax.Array,
    batch_norm: bool = True,
    backend: Optional[str] = None,
    axis_name: Optional[str] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    eps: float = 1e-6,
    wide_gathers: bool = False,
) -> tuple[jax.Array, jax.Array]:
    h_in, e_in = h, e

    a1h = linear(params["A1"], h)
    a2h = linear(params["A2"], h)
    a3h = linear(params["A3"], h)
    b1h = linear(params["B1"], h)
    b2h = linear(params["B2"], h)
    # B3·e is computed lazily per branch: the gate-front kernel projects
    # in-kernel (no b3e materialization on the fused path)

    n_pad = graph.n_nodes_padded
    d = h.shape[-1]
    # SDDMM: per-edge gate from endpoint features (shared by both
    # directions). gather_by_endpoint's VJP is a Pallas segment-sum over
    # the transpose CSR — no XLA scatter in the backward pass.
    # ``wide_gathers`` pairs the two tables needed per endpoint
    # ([b1h‖a2h] by src, [b2h‖a3h] by dst) — half the random-row count at
    # double the row width. Measured slower at 200k edges; re-evaluated at
    # 1M where gathers dominate the profile (PERFORMANCE.md).
    a3_dst = None
    mom = None
    if batch_norm and not wide_gathers and axis_name is None:
        from gnnome_tpu.ops.segment import fused_gate_front, gate_front_supported

        if gate_front_supported(graph, backend):
            # Gate-front fusion: the B3 projection (in-kernel MXU matmul),
            # both banded endpoint gathers, the add chain, and the BN
            # moment sums run in ONE Pallas pass — neither endpoint table,
            # the projected b3e, nor a separate moments read ever touches
            # HBM (ops/spmm_pallas.gate_front_pallas).
            gate, mom = fused_gate_front(
                b1h, b2h, e, params["B3"]["w"], params["B3"]["b"],
                graph.src, graph.dst, (graph.by_src, graph.by_dst),
                n_pad, graph.n_edges, backend,
            )
    if mom is not None:
        pass  # gate + moments already fused above
    elif wide_gathers:  # True = both endpoints paired; "src" = src side only
        b3e = linear(params["B3"], e)
        src_rows = gather_by_endpoint(
            jnp.concatenate([b1h, a2h], axis=-1), graph.src, graph.by_src,
            n_pad, backend)
        if wide_gathers == "src":
            dst_rows = gather_by_endpoint(b2h, graph.dst, graph.by_dst,
                                          n_pad, backend)
            gate = src_rows[:, :d] + dst_rows + b3e
        else:
            dst_rows = gather_by_endpoint(
                jnp.concatenate([b2h, a3h], axis=-1), graph.dst, graph.by_dst,
                n_pad, backend)
            gate = src_rows[:, :d] + dst_rows[:, :d] + b3e
            a3_dst = dst_rows[:, d:]
        a2_src = src_rows[:, d:]
    else:
        gate = (
            gather_by_endpoint(b1h, graph.src, graph.by_src, n_pad, backend)
            + gather_by_endpoint(b2h, graph.dst, graph.by_dst, n_pad, backend)
            + linear(params["B3"], e)
        )
    # per-edge key arrays with padding marked (drops padded-edge cotangents
    # in the fused ops' backwards)
    from gnnome_tpu.core.graph import PAD_SEGMENT

    dst_key = jnp.where(graph.edge_mask, graph.dst, PAD_SEGMENT)
    src_key = jnp.where(graph.edge_mask, graph.src, PAD_SEGMENT)

    if batch_norm:
        # Gate-epilog fusion: BN statistics stay in XLA (their autodiff
        # chain through the folded affine is ordinary JAX); the apply +
        # relu + residual + σ + gating + both forward segment-sums run in
        # ONE Pallas pass that also emits e_new (ops/spmm_pallas.py).
        from gnnome_tpu.ops.norm import masked_moments
        from gnnome_tpu.ops.segment import fused_gate_sigma_aggregate

        if mom is not None:
            cnt = float(max(graph.n_edges, 1))
            mean = mom[0] / cnt
            var = jnp.maximum(mom[1] / cnt - mean * mean, 0.0)
        else:
            mean, var = masked_moments(gate, graph.edge_mask, axis_name=axis_name)
        inv = jax.lax.rsqrt(var + 1e-5)
        scale2 = inv * params["norm_e"]["scale"].astype(jnp.float32)
        bias2 = params["norm_e"]["bias"].astype(jnp.float32) - mean * scale2
        affine = jnp.stack([scale2, bias2])

        from gnnome_tpu.ops.segment import (
            epilog_gather_supported,
            fused_gate_sigma_gather,
        )

        if not wide_gathers and epilog_gather_supported(
                graph, d, h.dtype.itemsize, backend):
            # gather-fused epilog: the pregathered [E,D] a2h[src] table
            # never exists — selected from banded VMEM windows inside the
            # kernel (2 fewer full-edge passes per forward execution)
            sum_f, e_new = fused_gate_sigma_gather(
                gate, e_in, a2h, affine, (dst_key, graph.src),
                graph.by_dst, graph.by_src, n_pad, backend,
            )
        else:
            if not wide_gathers:
                a2_src = gather_by_endpoint(
                    a2h, graph.src, graph.by_src, n_pad, backend)
            sum_f, e_new = fused_gate_sigma_aggregate(
                gate, e_in, a2_src, affine, dst_key, graph.by_dst, n_pad,
                backend
            )
        d = h.shape[-1]
        h_fwd = sum_f[:, :d] / (sum_f[:, d:] + eps)
        # Backward direction: node j sums σ·A3h over its out-edges, keyed
        # by src — the ``dgl.reverse`` pass without a transposed graph.
        if a3_dst is not None:
            from gnnome_tpu.ops.segment import gated_aggregate_pregathered

            h_bwd = gated_aggregate_pregathered(
                a3_dst, e_new, graph.by_src, n_pad, key=src_key,
                backend=backend, eps=eps,
            )
        elif reverse_unsorted_supported(graph, d, h.dtype.itemsize, backend):
            # permutation-free reverse aggregation: stream e_new in
            # CANONICAL order per src block and one-hot on the unsorted
            # src ids — the src sort and its order/inv window streams
            # do not exist on this path (ops/segment.py)
            h_bwd = gated_aggregate_reverse_unsorted(
                a3h, e_new, src_key, graph.dst, graph, n_pad,
                backend=backend, eps=eps,
            )
        elif opposite_gather_supported(graph.by_src, backend):
            # gather a3h DIRECTLY in src-sorted order — drops the
            # canonical-order gather + full-table permute (2 fewer [E,D]
            # memory passes, ×2 under remat recompute)
            h_bwd = gated_aggregate_opposite(
                a3h, e_new, graph.by_src, graph.by_dst, n_pad,
                backend=backend, eps=eps,
            )
        else:
            h_bwd = gated_aggregate(
                a3h, e_new, graph.dst, graph.by_dst, graph.by_src, n_pad,
                key=src_key, backend=backend, eps=eps,
            )
    else:
        gate = masked_layer_norm(gate, params["norm_e"]["scale"], params["norm_e"]["bias"])
        e_new = jax.nn.relu(gate) + e_in

        if wide_gathers:
            from gnnome_tpu.ops.segment import gated_aggregate_pregathered

            h_fwd = gated_aggregate_pregathered(
                a2_src, e_new, graph.by_dst, n_pad, key=dst_key,
                backend=backend, eps=eps,
            )
        else:
            h_fwd = gated_aggregate(
                a2h, e_new, graph.src, graph.by_src, graph.by_dst, n_pad,
                key=dst_key, backend=backend, eps=eps,
            )
        if a3_dst is not None:
            h_bwd = gated_aggregate_pregathered(
                a3_dst, e_new, graph.by_src, n_pad, key=src_key,
                backend=backend, eps=eps,
            )
        elif reverse_unsorted_supported(graph, d, h.dtype.itemsize, backend):
            h_bwd = gated_aggregate_reverse_unsorted(
                a3h, e_new, src_key, graph.dst, graph, n_pad,
                backend=backend, eps=eps,
            )
        elif opposite_gather_supported(graph.by_src, backend):
            h_bwd = gated_aggregate_opposite(
                a3h, e_new, graph.by_src, graph.by_dst, n_pad,
                backend=backend, eps=eps,
            )
        else:
            h_bwd = gated_aggregate(
                a3h, e_new, graph.dst, graph.by_dst, graph.by_src, n_pad,
                key=src_key, backend=backend, eps=eps,
            )

    # aggregation sums accumulate in f32; return to the compute dtype
    h = a1h + h_fwd.astype(h_in.dtype) + h_bwd.astype(h_in.dtype)
    if batch_norm:
        h = masked_batch_norm(
            h,
            graph.node_mask,
            params["norm_h"]["scale"],
            params["norm_h"]["bias"],
            axis_name=axis_name,
        )
    else:
        h = masked_layer_norm(h, params["norm_h"]["scale"], params["norm_h"]["bias"])
    h = jax.nn.relu(h)
    h = h + h_in

    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, h.shape)
        h = jnp.where(keep, h / (1.0 - dropout_rate), 0.0)

    return h, e_new
