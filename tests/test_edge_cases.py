"""Robustness: degenerate graphs through the full model path."""
import numpy as np
import jax
import jax.numpy as jnp

from gnnome_tpu.config import ModelConfig
from gnnome_tpu.core.graph import build_graph, pad_features, prepare_edge_features
from gnnome_tpu.evaluation.metrics import bce_with_logits
from gnnome_tpu.models.model import init_model_params, model_forward

CFG = ModelConfig(num_gnn_layers=2, hidden_features=32, hidden_edge_features=8,
                  hidden_edge_scores=16, nb_pos_enc=8)


def run_model(src, dst, n):
    g = build_graph(np.asarray(src, np.int32), np.asarray(dst, np.int32), n)
    params = init_model_params(jax.random.PRNGKey(0), CFG)
    e = prepare_edge_features(g, np.zeros((len(src), 2), np.float32))
    pe = jnp.asarray(pad_features(np.zeros((n, 10), np.float32), g.n_nodes_padded))
    logits = model_forward(params, g, e, pe, backend="xla")
    y = prepare_edge_features(g, np.zeros(len(src), np.float32))
    loss = bce_with_logits(logits, y, g.edge_mask, 1.0)
    return g, np.asarray(logits), float(loss)


def test_zero_edges():
    g, logits, loss = run_model([], [], 4)
    assert np.isfinite(loss)
    assert logits.shape[0] == g.n_edges_padded


def test_single_edge():
    g, logits, loss = run_model([0], [1], 2)
    assert np.isfinite(loss)
    assert np.isfinite(logits[:1]).all()


def test_self_loops_and_multi_edges():
    # parallel edges and self loops must not crash the compute path
    src = [0, 0, 0, 1, 2, 2]
    dst = [1, 1, 0, 2, 3, 3]
    g, logits, loss = run_model(src, dst, 4)
    assert np.isfinite(loss)


def test_isolated_trailing_nodes():
    # nodes beyond the largest edge endpoint (edge-less reads)
    g, logits, loss = run_model([0, 1], [1, 2], 10)
    assert g.n_nodes == 10
    assert np.isfinite(loss)


def test_decode_empty_scores():
    from gnnome_tpu.decode.greedy import get_contigs

    walks = get_contigs(
        np.array([], np.int32), np.array([], np.int32), np.array([]),
        {}, {}, {}, np.array([], np.int64), np.array([0, 0], np.int64),
        nb_paths=5, len_threshold=2,
    )
    assert walks == []
