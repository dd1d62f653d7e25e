"""SPMD sharded training: full-graph GatedGCN across a device mesh.

This is the distributed execution path the reference entirely lacks
(single device only, ``hyperparameters.py:25``; SURVEY.md §2c). Design:

  * **nodes** are block-sharded over the ``graph`` mesh axis — every dense
    projection (the six per-layer matmuls, ``layers/gated_gcn_full.py:107-113``)
    runs on its local node block (MXU, no comm);
  * **edges** are block-sharded over ``graph`` — the SDDMM gate, σ, and
    messages are edge-local;
  * endpoint gathers need remote node features → ``all_gather`` over ICI
    (4 tensors/layer); segment-sums produce per-device partials over the
    full node space → ``psum_scatter`` back to node blocks. This is the
    standard TP-style schedule; the planned refinement (halo exchange of
    only boundary nodes, computed from the partitioner's edge-cut) replaces
    the all_gather without changing this module's interface;
  * **graphs** are sharded over the ``data`` axis (one graph per replica
    group); the loss mean and gradients reduce over both axes.

Normalization statistics psum over ``graph`` so sharded execution is
bitwise-equivalent (up to reduction order) to single-device execution —
verified in tests/test_sharded.py.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from gnnome_tpu.core.graph import AssemblyGraph
from gnnome_tpu.data.dataset import GraphSample
from gnnome_tpu.evaluation.metrics import bce_with_logits
from gnnome_tpu.models.common import linear
from gnnome_tpu.ops.norm import masked_batch_norm, masked_layer_norm

AXIS_GRAPH = "graph"
AXIS_DATA = "data"


# ---------------------------------------------------------------------------
# batch preparation
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ShardedBatch:
    """Stacked, padded graph arrays with a leading data-axis dimension.

    All shapes: nodes [B, N_pad], edges [B, E_pad]; N_pad and E_pad are
    common bucket sizes divisible by the graph-axis size.
    """

    src: jax.Array  # int32[B, E]
    dst: jax.Array  # int32[B, E]
    edge_mask: jax.Array  # bool[B, E]
    node_mask: jax.Array  # bool[B, N]
    e_feat: jax.Array  # f32[B, E, 2]
    pe: jax.Array  # f32[B, N, pe+2]
    y: jax.Array  # f32[B, E]

    @property
    def n_nodes_padded(self) -> int:
        return self.node_mask.shape[1]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def prepare_batch(
    samples: list[GraphSample], mesh: Mesh, node_mult: int = 256, edge_mult: int = 512
) -> ShardedBatch:
    """Stack graphs to shared bucket shapes and device_put with the batch
    sharding (data × graph)."""
    n_graph = mesh.shape[AXIS_GRAPH]
    n_data = mesh.shape[AXIS_DATA]
    if len(samples) != n_data:
        raise ValueError(
            f"batch of {len(samples)} graphs must equal data-axis size {n_data} "
            "(one graph per replica group)"
        )
    node_mult = _round_up(node_mult, 128 * n_graph)
    edge_mult = _round_up(edge_mult, 128 * n_graph)
    n_pad = _round_up(max(s.graph.n_nodes for s in samples), node_mult)
    e_pad = _round_up(max(s.graph.n_edges for s in samples), edge_mult)

    def stack(fn, dtype):
        return np.stack([fn(s) for s in samples]).astype(dtype)

    def pad_to(arr, length):
        out = np.zeros((length,) + arr.shape[1:], dtype=arr.dtype)
        out[: arr.shape[0]] = arr
        return out

    batch = ShardedBatch(
        # canonical-order edge arrays (consistent with e_feat/y in samples)
        src=stack(
            lambda s: pad_to(np.asarray(s.graph.src)[: s.graph.n_edges], e_pad),
            np.int32,
        ),
        dst=stack(
            lambda s: pad_to(np.asarray(s.graph.dst)[: s.graph.n_edges], e_pad),
            np.int32,
        ),
        edge_mask=stack(
            lambda s: np.arange(e_pad) < s.graph.n_edges, bool
        ),
        node_mask=stack(
            lambda s: np.arange(n_pad) < s.graph.n_nodes, bool
        ),
        e_feat=stack(
            lambda s: pad_to(np.asarray(s.e_feat)[: s.graph.n_edges], e_pad),
            np.float32,
        ),
        pe=stack(
            lambda s: pad_to(np.asarray(s.pe)[: s.graph.n_nodes], n_pad),
            np.float32,
        ),
        y=stack(
            lambda s: pad_to(np.asarray(s.y)[: s.graph.n_edges], e_pad),
            np.float32,
        ),
    )
    specs = batch_pspecs()
    return ShardedBatch(
        **{
            f.name: jax.device_put(
                getattr(batch, f.name),
                NamedSharding(mesh, getattr(specs, f.name)),
            )
            for f in dataclasses.fields(ShardedBatch)
        }
    )


def batch_pspecs() -> "ShardedBatch":
    """PartitionSpecs for every ShardedBatch field (leading dim over data,
    node/edge dim over graph)."""
    edge = P(AXIS_DATA, AXIS_GRAPH)
    node = P(AXIS_DATA, AXIS_GRAPH)
    return ShardedBatch(
        src=edge, dst=edge, edge_mask=edge, node_mask=node,
        e_feat=P(AXIS_DATA, AXIS_GRAPH, None),
        pe=P(AXIS_DATA, AXIS_GRAPH, None),
        y=edge,
    )


# ---------------------------------------------------------------------------
# sharded model
# ---------------------------------------------------------------------------


def _gather_full(x_loc: jax.Array) -> jax.Array:
    """[N/P, D] node-sharded → [N, D] replicated (ICI all-gather)."""
    return jax.lax.all_gather(x_loc, AXIS_GRAPH, axis=0, tiled=True)


def _scatter_sum(partial_full: jax.Array) -> jax.Array:
    """[N, D] per-device partial sums → [N/P, D] reduced node block."""
    return jax.lax.psum_scatter(
        partial_full, AXIS_GRAPH, scatter_dimension=0, tiled=True
    )


def _masked_segment_sum(data, seg, mask, num_segments):
    seg = jnp.where(mask, seg, num_segments)  # out-of-range ids are dropped
    return jax.ops.segment_sum(data, seg, num_segments=num_segments)


def _sharded_gated_gcn_layer(
    lp: Dict,
    h_loc: jax.Array,  # [N/P, D]
    e_loc: jax.Array,  # [E/P, D]
    src_loc: jax.Array,  # [E/P] global node ids
    dst_loc: jax.Array,
    edge_mask_loc: jax.Array,
    node_mask_loc: jax.Array,
    n_pad: int,
    batch_norm: bool,
    eps: float = 1e-6,
) -> Tuple[jax.Array, jax.Array]:
    h_in, e_in = h_loc, e_loc
    a1 = linear(lp["A1"], h_loc)
    a2 = linear(lp["A2"], h_loc)
    a3 = linear(lp["A3"], h_loc)
    b1 = linear(lp["B1"], h_loc)
    b2 = linear(lp["B2"], h_loc)
    b3e = linear(lp["B3"], e_loc)

    b1_full = _gather_full(b1)
    b2_full = _gather_full(b2)
    gate = jnp.take(b1_full, src_loc, axis=0) + jnp.take(b2_full, dst_loc, axis=0) + b3e
    if batch_norm:
        gate = masked_batch_norm(
            gate, edge_mask_loc, lp["norm_e"]["scale"], lp["norm_e"]["bias"],
            axis_name=AXIS_GRAPH,
        )
    else:
        gate = masked_layer_norm(gate, lp["norm_e"]["scale"], lp["norm_e"]["bias"])
    e_new = jax.nn.relu(gate) + e_in
    sigma = jax.nn.sigmoid(e_new)

    d = h_loc.shape[-1]
    a2_full = _gather_full(a2)
    msg_f = jnp.concatenate(
        [jnp.take(a2_full, src_loc, axis=0) * sigma, sigma], axis=-1
    )
    agg_f = _scatter_sum(_masked_segment_sum(msg_f, dst_loc, edge_mask_loc, n_pad))
    h_fwd = agg_f[:, :d] / (agg_f[:, d:] + eps)

    a3_full = _gather_full(a3)
    msg_b = jnp.concatenate(
        [jnp.take(a3_full, dst_loc, axis=0) * sigma, sigma], axis=-1
    )
    agg_b = _scatter_sum(_masked_segment_sum(msg_b, src_loc, edge_mask_loc, n_pad))
    h_bwd = agg_b[:, :d] / (agg_b[:, d:] + eps)

    h = a1 + h_fwd + h_bwd
    if batch_norm:
        h = masked_batch_norm(
            h, node_mask_loc, lp["norm_h"]["scale"], lp["norm_h"]["bias"],
            axis_name=AXIS_GRAPH,
        )
    else:
        h = masked_layer_norm(h, lp["norm_h"]["scale"], lp["norm_h"]["bias"])
    h = jax.nn.relu(h) + h_in
    return h, e_new


def sharded_forward(
    params: Dict,
    src_loc, dst_loc, edge_mask_loc, node_mask_loc, e_feat_loc, pe_loc,
    n_pad: int,
    batch_norm: bool = True,
    remat: bool = True,
) -> jax.Array:
    """Per-shard forward pass (runs inside shard_map). Returns local edge
    logits [E/P]."""
    h = linear(params["linear_pe"], pe_loc)
    e = jax.nn.relu(linear(params["linear1_edge"], e_feat_loc))
    e = linear(params["linear2_edge"], e)

    layer = _sharded_gated_gcn_layer
    if remat:
        layer = jax.checkpoint(
            _sharded_gated_gcn_layer, static_argnums=(7, 8)
        )
    for lp in params["layers"]:
        h, e = layer(
            lp, h, e, src_loc, dst_loc, edge_mask_loc, node_mask_loc,
            n_pad, batch_norm,
        )

    h_full = _gather_full(h)
    feat = jnp.concatenate(
        [jnp.take(h_full, src_loc, axis=0), jnp.take(h_full, dst_loc, axis=0), e],
        axis=-1,
    )
    hidden = jax.nn.relu(linear(params["score1"], feat))
    return linear(params["score2"], hidden)[:, 0]


def make_sharded_loss(mesh: Mesh, batch_norm: bool = True, remat: bool = True):
    """Builds loss(params, batch, pos_weight) -> scalar, sharded over mesh."""
    specs = batch_pspecs()

    def shard_fn(params, src, dst, emask, nmask, e_feat, pe, y, pos_weight):
        # leading data dim is 1 per shard group: squeeze it
        src, dst = src[0], dst[0]
        emask, nmask = emask[0], nmask[0]
        e_feat, pe, y = e_feat[0], pe[0], y[0]
        n_local = nmask.shape[0]
        n_pad = n_local * jax.lax.axis_size(AXIS_GRAPH)

        logits = sharded_forward(
            params, src, dst, emask, nmask, e_feat, pe, n_pad,
            batch_norm=batch_norm, remat=remat,
        )
        # masked BCE: partial sums + psum over graph, mean over data
        from jax.nn import log_sigmoid

        m = emask.astype(jnp.float32)
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
                specs.src, specs.dst, specs.edge_mask, specs.node_mask,
                specs.e_feat, specs.pe, specs.y,
                P(),
            ),
            out_specs=P(AXIS_DATA),
            check_vma=False,
        )(
            params, batch.src, batch.dst, batch.edge_mask, batch.node_mask,
            batch.e_feat, batch.pe, batch.y, pos_weight,
        )
        return out.mean()

    return loss_fn


def make_sharded_train_step(
    mesh: Mesh, batch_norm: bool = True, remat: bool = True
):
    """Full distributed training step: loss + grads (reduced over the mesh)
    + Adam update. Params live replicated; batch sharded data×graph."""
    import optax

    from gnnome_tpu.train.loop import make_optimizer

    loss_fn = make_sharded_loss(mesh, batch_norm=batch_norm, remat=remat)
    opt = make_optimizer()

    @functools.partial(jax.jit, donate_argnames=("params", "opt_state"))
    def step(params, opt_state, batch: ShardedBatch, pos_weight):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, pos_weight)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
