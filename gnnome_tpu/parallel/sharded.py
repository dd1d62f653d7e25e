"""SPMD sharded training: full-graph GatedGCN across a device mesh.

This is the distributed execution path the reference entirely lacks
(single device only, ``hyperparameters.py:25``; SURVEY.md §2c).

Owner-computes design (v2):

  * **nodes** are block-sharded over the ``graph`` mesh axis; every dense
    projection (the six per-layer matmuls, ``layers/gated_gcn_full.py:107-113``)
    runs on its local node block (MXU, no comm);
  * **edges live in two shardings**: the *fwd* sharding assigns each edge
    to the owner of its ``dst`` (edges arrive dst-sorted — contiguous
    slices of the canonical order), the *bwd* sharding to the owner of its
    ``src``. Each aggregation is then a fully *local* sorted segment-sum
    into the device's own node block — the Pallas kernel runs unchanged
    per shard, and no cross-device scatter/reduce of node tensors exists;
  * the per-edge gate is computed (redundantly) in both shardings from
    all-gathered endpoint projections — duplicated elementwise FLOPs in
    exchange for zero edge-state communication;
  * edge-BatchNorm statistics are computed once over the fwd sharding
    (each real edge exactly once, psum over ``graph``) and applied to both
    shardings, so numerics match single-device execution exactly;
  * the only per-layer collectives are 4 ``all_gather`` of [N/P, D] node
    projections (+1 for the score head) whose autodiff transposes are
    ``psum_scatter`` — all riding ICI. A future refinement restricts the
    all_gather to halo (boundary) nodes computed from the partitioner's
    edge cut;
  * **graphs** shard over the ``data`` axis (one graph per replica group);
    loss means and gradients reduce over both axes.

Numerical equality with single-device execution is asserted in
tests/test_sharded.py.
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

AXIS_GRAPH = "graph"
AXIS_DATA = "data"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# batch preparation: dual edge sharding with per-shard local CSR
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EdgeShard:
    """One direction's edge sharding. Leading dims: [B, P, E_bucket]."""

    src: jax.Array  # int32 global src ids
    dst: jax.Array  # int32 global dst ids
    mask: jax.Array  # bool
    key_local: jax.Array  # int32: keyed endpoint − node_base (PAD_SEGMENT pad)
    offsets: jax.Array  # int32 [B, P, N_local + 1] local CSR row pointers
    e_feat: jax.Array  # f32 [B, P, E_bucket, 2]
    y: jax.Array  # f32 [B, P, E_bucket] (labels; meaningful in fwd shard)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedBatch:
    node_mask: jax.Array  # bool [B, N_pad]
    pe: jax.Array  # f32 [B, N_pad, pe+2]
    fwd: EdgeShard  # edges owned by dst block, dst-sorted
    bwd: EdgeShard  # edges owned by src block, src-sorted

    @property
    def n_nodes_padded(self) -> int:
        return self.node_mask.shape[1]


def _build_edge_shard(
    order: np.ndarray,  # permutation of canonical indices into key-sorted order
    key_sorted: np.ndarray,  # sorted keyed endpoint (PAD_SEGMENT on padding)
    src_c: np.ndarray,
    dst_c: np.ndarray,
    e_feat_c: np.ndarray,
    y_c: np.ndarray,
    n_real_edges: int,
    n_pad: int,
    n_shards: int,
    e_bucket: int,
) -> Dict[str, np.ndarray]:
    n_local = n_pad // n_shards
    # shard boundaries in the sorted order: edges with key in block p
    bounds = np.searchsorted(key_sorted[:n_real_edges],
                             np.arange(n_shards + 1) * n_local)
    out = {
        "src": np.zeros((n_shards, e_bucket), np.int32),
        "dst": np.zeros((n_shards, e_bucket), np.int32),
        "mask": np.zeros((n_shards, e_bucket), bool),
        "key_local": np.full((n_shards, e_bucket), PAD_SEGMENT, np.int32),
        "offsets": np.zeros((n_shards, n_local + 1), np.int32),
        "e_feat": np.zeros((n_shards, e_bucket, e_feat_c.shape[-1]), np.float32),
        "y": np.zeros((n_shards, e_bucket), np.float32),
    }
    for p in range(n_shards):
        lo, hi = int(bounds[p]), int(bounds[p + 1])
        cnt = hi - lo
        assert cnt <= e_bucket, (cnt, e_bucket)
        sel = order[lo:hi]
        out["src"][p, :cnt] = src_c[sel]
        out["dst"][p, :cnt] = dst_c[sel]
        out["mask"][p, :cnt] = True
        out["key_local"][p, :cnt] = key_sorted[lo:hi] - p * n_local
        out["e_feat"][p, :cnt] = e_feat_c[sel]
        out["y"][p, :cnt] = y_c[sel]
        out["offsets"][p] = np.searchsorted(
            out["key_local"][p, :cnt], np.arange(n_local + 1)
        )
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

    n_pad = _round_up(max(s.graph.n_nodes_padded for s in samples), 128 * n_graph)

    per_graph = []
    max_bucket = 0
    for s in samples:
        g = s.graph
        e_pad = g.n_edges_padded
        src_c = np.asarray(g.src)
        dst_c = np.asarray(g.dst)
        e_feat_c = np.asarray(s.e_feat)
        y_c = np.asarray(s.y)
        n_local = n_pad // n_graph

        # fwd: canonical order is already dst-sorted
        dst_key = np.where(np.arange(e_pad) < g.n_edges, dst_c, PAD_SEGMENT)
        fwd_order = np.arange(e_pad)
        # bwd: src-sorted via the by_src permutation
        bwd_order = np.asarray(g.by_src.order)
        src_key = np.asarray(g.by_src.segment_ids)

        # worst-case per-shard edge count for bucketing
        for key_sorted in (dst_key, src_key):
            b = np.searchsorted(key_sorted[: g.n_edges],
                                np.arange(n_graph + 1) * n_local)
            max_bucket = max(max_bucket, int(np.diff(b).max()) if n_graph else 0)
        per_graph.append((g, src_c, dst_c, e_feat_c, y_c, dst_key, fwd_order,
                          src_key, bwd_order))

    e_bucket = _round_up(max(max_bucket, 1), edge_bucket_multiple)

    fwd_stack, bwd_stack, node_masks, pes = [], [], [], []
    for (g, src_c, dst_c, e_feat_c, y_c, dst_key, fwd_order, src_key,
         bwd_order) in per_graph:
        fwd_stack.append(_build_edge_shard(
            fwd_order, dst_key, src_c, dst_c, e_feat_c, y_c,
            g.n_edges, n_pad, n_graph, e_bucket,
        ))
        bwd_stack.append(_build_edge_shard(
            bwd_order, src_key, src_c, dst_c, e_feat_c, y_c,
            g.n_edges, n_pad, n_graph, e_bucket,
        ))
        nm = np.zeros(n_pad, bool)
        nm[: g.n_nodes] = True
        node_masks.append(nm)
    # pe stacking (padded to the common n_pad)
    for s in samples:
        pe = np.asarray(s.pe)
        out = np.zeros((n_pad, pe.shape[1]), np.float32)
        out[: pe.shape[0]] = pe
        pes.append(out)

    def stack_shard(dicts: List[Dict[str, np.ndarray]]) -> EdgeShard:
        return EdgeShard(**{
            k: np.stack([d[k] for d in dicts]) for k in dicts[0]
        })

    batch = ShardedBatch(
        node_mask=np.stack(node_masks),
        pe=np.stack(pes),
        fwd=stack_shard(fwd_stack),
        bwd=stack_shard(bwd_stack),
    )

    # device placement: [B, ...node dims...] over data; [B, P, ...] over
    # data × graph
    node_spec = P(AXIS_DATA, AXIS_GRAPH)
    pe_spec = P(AXIS_DATA, AXIS_GRAPH, None)
    shard_specs = EdgeShard(
        src=P(AXIS_DATA, AXIS_GRAPH), dst=P(AXIS_DATA, AXIS_GRAPH),
        mask=P(AXIS_DATA, AXIS_GRAPH), key_local=P(AXIS_DATA, AXIS_GRAPH),
        offsets=P(AXIS_DATA, AXIS_GRAPH),
        e_feat=P(AXIS_DATA, AXIS_GRAPH),
        y=P(AXIS_DATA, AXIS_GRAPH),
    )

    def put(arr, spec):
        return jax.device_put(arr, NamedSharding(mesh, spec))

    return ShardedBatch(
        node_mask=put(batch.node_mask, node_spec),
        pe=put(batch.pe, pe_spec),
        fwd=EdgeShard(**{
            f.name: put(getattr(batch.fwd, f.name), getattr(shard_specs, f.name))
            for f in dataclasses.fields(EdgeShard)
        }),
        bwd=EdgeShard(**{
            f.name: put(getattr(batch.bwd, f.name), getattr(shard_specs, f.name))
            for f in dataclasses.fields(EdgeShard)
        }),
    )


# ---------------------------------------------------------------------------
# sharded model
# ---------------------------------------------------------------------------


def _gather_full(x_loc: jax.Array) -> jax.Array:
    """[N/P, D] node-sharded → [N, D] replicated (ICI all-gather; autodiff
    transpose is psum_scatter)."""
    return jax.lax.all_gather(x_loc, AXIS_GRAPH, axis=0, tiled=True)


def _local_csr(key_local: jax.Array, offsets: jax.Array) -> CSR:
    """Local identity-order CSR for a shard's (sorted) edge slice."""
    e = key_local.shape[0]
    iota = jnp.arange(e, dtype=jnp.int32)
    return CSR(identity=True, order=iota, inv_order=iota, offsets=offsets,
               segment_ids=key_local)


def _apply_bn(x, mean, var, scale, bias, eps=1e-5):
    out = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + eps)
    return (out * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def _sharded_gated_gcn_layer(
    lp: Dict,
    h_loc: jax.Array,  # [N/P, D]
    e_f: jax.Array,  # [E_b, D] fwd-shard edge state
    e_b: jax.Array,  # [E_b, D] bwd-shard edge state
    fwd: Dict[str, jax.Array],
    bwd: Dict[str, jax.Array],
    node_mask_loc: jax.Array,
    batch_norm: bool,
    backend: Optional[str],
    eps: float = 1e-6,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    h_in = h_loc
    d = h_loc.shape[-1]
    a1 = linear(lp["A1"], h_loc)
    a2 = linear(lp["A2"], h_loc)
    a3 = linear(lp["A3"], h_loc)
    b1 = linear(lp["B1"], h_loc)
    b2 = linear(lp["B2"], h_loc)

    # pair the tables needed per endpoint: 2 wide all_gathers + wide-row
    # gathers instead of 4 + narrow (gathers dominate the profile)
    src_tab = _gather_full(jnp.concatenate([b1, a2], axis=-1))  # [N, 2D]
    dst_tab = _gather_full(jnp.concatenate([b2, a3], axis=-1))

    def gate_and_vals(shard, e_state):
        sg = jnp.take(src_tab, shard["src"], axis=0)
        dg = jnp.take(dst_tab, shard["dst"], axis=0)
        gate = sg[:, :d] + dg[:, :d] + linear(lp["B3"], e_state)
        return gate, sg[:, d:], dg[:, d:]

    gate_f, a2_src_f, a3_dst_f = gate_and_vals(fwd, e_f)
    gate_b, a2_src_b, a3_dst_b = gate_and_vals(bwd, e_b)

    n_local = h_loc.shape[0]
    csr_f = _local_csr(fwd["key_local"], fwd["offsets"])
    csr_b = _local_csr(bwd["key_local"], bwd["offsets"])

    if batch_norm:
        # stats over the fwd sharding only (each real edge exactly once,
        # psum over the mesh); the folded affine + relu + residual + σ +
        # both segment-sums run in the gate-epilog fused kernel per
        # sharding — one pass over each edge set.
        from gnnome_tpu.ops.segment import fused_gate_sigma_aggregate

        mean, var = masked_moments(gate_f, fwd["mask"], axis_name=AXIS_GRAPH)
        inv = jax.lax.rsqrt(var + 1e-5)
        scale2 = inv * lp["norm_e"]["scale"].astype(jnp.float32)
        bias2 = lp["norm_e"]["bias"].astype(jnp.float32) - mean * scale2
        affine = jnp.stack([scale2, bias2])

        agg_f, e_f_new = fused_gate_sigma_aggregate(
            gate_f, e_f, a2_src_f, affine, fwd["key_local"], csr_f,
            n_local, backend,
        )
        agg_b, e_b_new = fused_gate_sigma_aggregate(
            gate_b, e_b, a3_dst_b, affine, bwd["key_local"], csr_b,
            n_local, backend,
        )
    else:
        from gnnome_tpu.ops.norm import masked_layer_norm
        from gnnome_tpu.ops.segment import _fused_sigma_aggregate

        gate_f = masked_layer_norm(gate_f, lp["norm_e"]["scale"], lp["norm_e"]["bias"])
        gate_b = masked_layer_norm(gate_b, lp["norm_e"]["scale"], lp["norm_e"]["bias"])
        e_f_new = (jax.nn.relu(gate_f) + e_f).astype(e_f.dtype)
        e_b_new = (jax.nn.relu(gate_b) + e_b).astype(e_b.dtype)
        agg_f = _fused_sigma_aggregate(
            e_f_new, a2_src_f, fwd["key_local"], csr_f, n_local, backend
        )
        agg_b = _fused_sigma_aggregate(
            e_b_new, a3_dst_b, bwd["key_local"], csr_b, n_local, backend
        )

    h_fwd = agg_f[:, :d] / (agg_f[:, d:] + eps)
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
    return h, e_f_new, e_b_new


def sharded_forward(
    params: Dict,
    pe_loc: jax.Array,
    node_mask_loc: jax.Array,
    fwd: Dict[str, jax.Array],
    bwd: Dict[str, jax.Array],
    batch_norm: bool = True,
    backend: Optional[str] = None,
    remat: bool = True,
    compute_dtype: str = "float32",
    remat_group: int = 4,
) -> jax.Array:
    """Per-shard forward; returns fwd-shard edge logits [E_b]."""
    if compute_dtype in ("bfloat16", "bf16"):
        cdt = jnp.bfloat16
        params = jax.tree_util.tree_map(
            lambda x: x.astype(cdt) if x.dtype == jnp.float32 else x, params
        )
        pe_loc = pe_loc.astype(cdt)
        fwd = dict(fwd, e_feat=fwd["e_feat"].astype(cdt))
        bwd = dict(bwd, e_feat=bwd["e_feat"].astype(cdt))

    h = linear(params["linear_pe"], pe_loc)

    def encode_e(e_feat):
        e = jax.nn.relu(linear(params["linear1_edge"], e_feat))
        return linear(params["linear2_edge"], e)

    e_f = encode_e(fwd["e_feat"])
    e_b = encode_e(bwd["e_feat"])

    # scan over stacked layer params (one compiled body) with hierarchical
    # remat, exactly like the single-device model (models/model.py)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params["layers"])
    n_layers = len(params["layers"])

    def body(carry, lp):
        h, e_f, e_b = carry
        h, e_f, e_b = _sharded_gated_gcn_layer(
            lp, h, e_f, e_b, fwd, bwd, node_mask_loc, batch_norm, backend
        )
        return (h, e_f, e_b), None

    if remat:
        body = jax.checkpoint(body)
    if remat and n_layers % remat_group == 0 and n_layers > remat_group:
        groups = n_layers // remat_group
        grouped = jax.tree_util.tree_map(
            lambda x: x.reshape(groups, remat_group, *x.shape[1:]), stacked
        )

        def group_body(carry, glp):
            out, _ = jax.lax.scan(body, carry, glp)
            return out, None

        (h, e_f, e_b), _ = jax.lax.scan(
            jax.checkpoint(group_body), (h, e_f, e_b), grouped
        )
    else:
        (h, e_f, e_b), _ = jax.lax.scan(body, (h, e_f, e_b), stacked)

    h_full = _gather_full(h)
    feat = jnp.concatenate(
        [
            jnp.take(h_full, fwd["src"], axis=0),
            jnp.take(h_full, fwd["dst"], axis=0),
            e_f,
        ],
        axis=-1,
    )
    hidden = jax.nn.relu(linear(params["score1"], feat))
    return linear(params["score2"], hidden)[:, 0].astype(jnp.float32)


def make_sharded_loss(
    mesh: Mesh, batch_norm: bool = True, remat: bool = True,
    backend: Optional[str] = None, compute_dtype: str = "float32",
):
    """Builds loss(params, batch, pos_weight) -> scalar, sharded over mesh."""

    def shard_fn(params, node_mask, pe, fwd_t, bwd_t, pos_weight):
        # squeeze the per-shard leading [1(data), 1(graph)] dims
        node_mask = node_mask[0]
        pe = pe[0]
        fwd = {k: getattr(fwd_t, k)[0, 0] for k in
               ("src", "dst", "mask", "key_local", "offsets", "e_feat", "y")}
        bwd = {k: getattr(bwd_t, k)[0, 0] for k in
               ("src", "dst", "mask", "key_local", "offsets", "e_feat", "y")}

        logits = sharded_forward(
            params, pe, node_mask, fwd, bwd,
            batch_norm=batch_norm, backend=backend, remat=remat,
            compute_dtype=compute_dtype,
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

    edge_spec = EdgeShard(
        src=P(AXIS_DATA, AXIS_GRAPH), dst=P(AXIS_DATA, AXIS_GRAPH),
        mask=P(AXIS_DATA, AXIS_GRAPH), key_local=P(AXIS_DATA, AXIS_GRAPH),
        offsets=P(AXIS_DATA, AXIS_GRAPH),
        e_feat=P(AXIS_DATA, AXIS_GRAPH),
        y=P(AXIS_DATA, AXIS_GRAPH),
    )

    def loss_fn(params, batch: ShardedBatch, pos_weight):
        out = shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(
                P(),  # params replicated
                P(AXIS_DATA, AXIS_GRAPH),  # node_mask
                P(AXIS_DATA, AXIS_GRAPH, None),  # pe
                edge_spec,
                edge_spec,
                P(),
            ),
            out_specs=P(AXIS_DATA),
            check_vma=False,
        )(params, batch.node_mask, batch.pe, batch.fwd, batch.bwd, pos_weight)
        return out.mean()

    return loss_fn


def make_sharded_train_step(
    mesh: Mesh, batch_norm: bool = True, remat: bool = True,
    backend: Optional[str] = None, compute_dtype: str = "float32",
):
    """Full distributed training step: loss + grads (reduced over the mesh)
    + Adam update. Params live replicated; batch sharded data×graph."""
    import optax

    from gnnome_tpu.train.loop import make_optimizer

    loss_fn = make_sharded_loss(mesh, batch_norm=batch_norm, remat=remat,
                                backend=backend, compute_dtype=compute_dtype)
    opt = make_optimizer()

    @functools.partial(jax.jit, donate_argnames=("params", "opt_state"))
    def step(params, opt_state, batch: ShardedBatch, pos_weight):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, pos_weight)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
