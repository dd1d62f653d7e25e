"""Full edge-classification model: encoders + GatedGCN stack + score head.

Mirrors the reference ``GraphGatedGCNModel`` (``models/full_graph.py:11-29``)
and its sub-layers:

  * node encoder: a single linear on ``[in_deg ‖ out_deg ‖ pe]``
    (``models/full_graph.py:15,23`` — note the raw node feature ``x`` is
    ignored by the reference and therefore has no counterpart here);
  * edge encoder: 2-layer MLP ``2 → hidden_edge → hidden`` with ReLU
    (``models/full_graph.py:17-18,24-26``);
  * processor: ``num_layers`` GatedGCN layers sharing dimensions
    (``layers/processor.py:8-20``);
  * score head: per-edge MLP on ``[h_src ‖ h_dst ‖ e]`` →
    ``hidden_edge_scores`` → 1 (``layers/score_predictor.py:5-25``).

Everything is a pure function of a parameter pytree, so the same code runs
under ``jit``, ``grad``, and ``shard_map`` unchanged.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from gnnome_tpu.core.graph import AssemblyGraph
from gnnome_tpu.models.common import init_linear, linear
from gnnome_tpu.models.gated_gcn import gated_gcn_layer, init_gated_gcn_layer


def init_model_params(key: jax.Array, cfg, dtype=jnp.float32) -> Dict:
    """cfg: a ``ModelConfig`` (see gnnome_tpu.config)."""
    n_keys = cfg.num_gnn_layers + 4
    keys = jax.random.split(key, n_keys)
    params: Dict = {
        # PE + in_deg + out_deg  →  hidden (models/full_graph.py:15)
        "linear_pe": init_linear(keys[0], cfg.nb_pos_enc + 2, cfg.hidden_features, dtype),
        "linear1_edge": init_linear(keys[1], cfg.edge_features, cfg.hidden_edge_features, dtype),
        "linear2_edge": init_linear(keys[2], cfg.hidden_edge_features, cfg.hidden_features, dtype),
        "layers": [
            init_gated_gcn_layer(keys[3 + i], cfg.hidden_features, dtype)
            for i in range(cfg.num_gnn_layers)
        ],
        "score1": init_linear(keys[-1], 3 * cfg.hidden_features, cfg.hidden_edge_scores, dtype),
    }
    params["score2"] = init_linear(
        jax.random.fold_in(keys[-1], 1), cfg.hidden_edge_scores, 1, dtype
    )
    return params


def score_predictor(
    params: Dict, graph: AssemblyGraph, h: jax.Array, e: jax.Array,
    backend=None,
) -> jax.Array:
    """Per-edge score MLP on [h_src ‖ h_dst ‖ e] (layers/score_predictor.py:12-18)."""
    from gnnome_tpu.ops.segment import gather_by_endpoint

    n_pad = graph.n_nodes_padded
    d = h.shape[-1]
    # Split-matmul form of W1·[h_src ‖ h_dst ‖ e]: pre-multiply h by the
    # src/dst row-blocks of W1 (small [N, ·] matmuls), gather the results,
    # and never materialize the [E, 3D] concat.
    w1, b1 = params["score1"]["w"], params["score1"]["b"]
    h_src_proj = jnp.dot(h, w1[:d], preferred_element_type=h.dtype)
    h_dst_proj = jnp.dot(h, w1[d : 2 * d], preferred_element_type=h.dtype)
    pre = (
        gather_by_endpoint(h_src_proj, graph.src, graph.by_src, n_pad, backend)
        + gather_by_endpoint(h_dst_proj, graph.dst, graph.by_dst, n_pad, backend)
        + jnp.dot(e, w1[2 * d :], preferred_element_type=e.dtype)
        + b1
    )
    hidden = jax.nn.relu(pre)
    return linear(params["score2"], hidden)[:, 0]


def _stack_layers(layers):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def _resolve_store_tail(e_pad: int, n_pad: int, d: int, itemsize: int,
                        group: int, n_layers: int) -> int:
    """How many trailing layers to leave uncheckpointed under
    ``remat='unroll_group'``.

    ``GNNOME_STORE_TAIL`` forces a count; default 'auto' picks the largest
    tail ≤ 2·group whose estimated residual footprint fits
    ``GNNOME_TAIL_BUDGET_GB``. Per-layer estimate calibrated against the
    v5e tail sweep at 1M edges (tail=6 fits 15.75 GB HBM alongside the
    step's ~6 GB working set; `runs/bench_tail*.log` — each stored layer
    saves ~15 ms of forward replay): the dominant residuals are the two
    [E, D] edge tensors (gate, e_new) plus a few node-width tensors.
    """
    import os

    env = os.environ.get("GNNOME_STORE_TAIL", "auto")
    if env != "auto":
        return max(0, min(int(env), n_layers))
    budget = float(os.environ.get("GNNOME_TAIL_BUDGET_GB", "7.0")) * 1e9
    per_layer = 1.6 * e_pad * d * itemsize + 2.0 * n_pad * d * 4
    for tail in range(min(2 * group, n_layers), 0, -1):
        if tail * per_layer <= budget:
            return tail
    return 0


def model_forward(
    params: Dict,
    graph: AssemblyGraph,
    e_feat: jax.Array,  # f32[E_pad, 2]  z-normed [overlap_length, overlap_similarity]
    pe: jax.Array,  # f32[N_pad, nb_pos_enc + 2]  [in_deg ‖ out_deg ‖ pagerank_pe]
    batch_norm: bool = True,
    backend: Optional[str] = None,
    axis_name: Optional[str] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    remat: str = "layer",  # 'none' | 'layer' | 'group'
    remat_group: int = 4,
    compute_dtype: str = "float32",  # 'float32' | 'bfloat16'
    wide_gathers: bool = False,
) -> jax.Array:
    """Returns per-edge logits, f32[E_pad] (padding rows are garbage; mask
    with ``graph.edge_mask`` before use).

    The GNN stack runs as ``lax.scan`` over stacked layer parameters —
    one compiled layer body instead of ``num_layers`` unrolled copies.
    ``remat`` controls activation memory for the backward pass:
      * 'none'  — store every layer's intermediates (fast, memory-hungry);
      * 'layer' — recompute per layer (stores only per-layer (h, e) carries);
      * 'group' — two-level scan: only every ``remat_group``-th (h, e) is
        stored, inner layers recomputed — O(L/G + G) activation memory,
        what lets a 16-layer chr19-scale full-graph backward fit one chip.
    """
    if compute_dtype in ("bfloat16", "bf16"):
        cdt = jnp.bfloat16
        params = jax.tree_util.tree_map(
            lambda x: x.astype(cdt) if x.dtype == jnp.float32 else x, params
        )
        pe = pe.astype(cdt)
        e_feat = e_feat.astype(cdt)

    h = linear(params["linear_pe"], pe)
    e = jax.nn.relu(linear(params["linear1_edge"], e_feat))
    e = linear(params["linear2_edge"], e)

    def layer_fn(lp, h, e, rng):
        return gated_gcn_layer(
            lp, graph, h, e,
            batch_norm=batch_norm, backend=backend, axis_name=axis_name,
            dropout_rate=dropout_rate, dropout_rng=rng,
            wide_gathers=wide_gathers,
        )

    n_layers = len(params["layers"])
    if dropout_rng is not None and dropout_rate > 0.0:
        # dropout path: unrolled loop with per-layer rng folds
        for i, lp in enumerate(params["layers"]):
            h, e = layer_fn(lp, h, e, jax.random.fold_in(dropout_rng, i))
    elif remat == "unroll_group":
        # Python-unrolled groups with checkpoint boundaries: same O(L/G+G)
        # activation memory as 'group' but no while loops — XLA avoids
        # scan-carry copies and dynamic-update-slice remat stashes.
        def group_fn(group_params, h, e):
            for lp in group_params:
                h, e = layer_fn(lp, h, e, None)
            return h, e

        g = remat_group if n_layers % remat_group == 0 else 1
        # Store-tail: leave the LAST `tail` layers uncheckpointed. Their
        # backward runs FIRST in reverse-mode, so the stored residuals
        # have the shortest possible live range (they die before any
        # earlier group's replay runs) — saving `tail` forward replays
        # costs far less peak HBM than storing any other group would.
        tail = _resolve_store_tail(
            graph.n_edges_padded, graph.n_nodes_padded, h.shape[-1],
            h.dtype.itemsize, g, n_layers)
        cut = n_layers - tail
        ckpt_group = jax.checkpoint(group_fn)
        for i in range(0, cut, g):
            h, e = ckpt_group(params["layers"][i : min(i + g, cut)], h, e)
        for lp in params["layers"][cut:]:
            h, e = layer_fn(lp, h, e, None)
    else:
        stacked = _stack_layers(params["layers"])

        def body(carry, lp):
            h, e = carry
            h, e = layer_fn(lp, h, e, None)
            return (h, e), None

        if remat in ("layer", "group"):
            body = jax.checkpoint(body)

        if remat == "group" and n_layers % remat_group == 0 and n_layers > remat_group:
            groups = n_layers // remat_group
            grouped = jax.tree_util.tree_map(
                lambda x: x.reshape(groups, remat_group, *x.shape[1:]), stacked
            )

            def group_body(carry, group_lp):
                out, _ = jax.lax.scan(body, carry, group_lp)
                return out, None

            (h, e), _ = jax.lax.scan(
                jax.checkpoint(group_body), (h, e), grouped
            )
        else:
            (h, e), _ = jax.lax.scan(body, (h, e), stacked)

    return score_predictor(params, graph, h, e, backend=backend).astype(jnp.float32)


def count_params(params) -> int:
    """Total parameter count (cf. ``train.py:96-112`` view_model_param)."""
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
