"""Numerical parity: JAX/TPU model vs the dense numpy spec (north star:
per-layer activations allclose vs. reference math, BASELINE.md)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnnome_tpu.config import ModelConfig
from gnnome_tpu.core.graph import (build_graph, extract_edge_values,
                                   pad_features, prepare_edge_features)
from gnnome_tpu.models.gated_gcn import gated_gcn_layer, init_gated_gcn_layer
from gnnome_tpu.models.model import count_params, init_model_params, model_forward

from reference_dense import dense_gated_gcn_layer, dense_model_forward


def random_dag(rng, n=60, e=300):
    src = rng.integers(0, n, size=e).astype(np.int32)
    dst = rng.integers(0, n, size=e).astype(np.int32)
    # drop duplicate / self edges for a clean comparison graph
    keep = src != dst
    pairs = np.unique(np.stack([src[keep], dst[keep]], 1), axis=0)
    return pairs[:, 0], pairs[:, 1]


def to_numpy_params(p):
    return jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), p)


@pytest.mark.parametrize("batch_norm", [True, False])
def test_single_layer_parity(rng, batch_norm):
    n, d = 60, 32
    src, dst = random_dag(rng)
    g = build_graph(src, dst, n)

    key = jax.random.PRNGKey(0)
    params = init_gated_gcn_layer(key, d)
    h = rng.standard_normal((n, d)).astype(np.float32)
    e = rng.standard_normal((len(src), d)).astype(np.float32)

    h_pad = pad_features(h, g.n_nodes_padded)
    e_can = prepare_edge_features(g, e)

    h_out, e_out = gated_gcn_layer(
        params, g, jnp.asarray(h_pad), e_can,
        batch_norm=batch_norm, backend="xla",
    )
    h_ref, e_ref = dense_gated_gcn_layer(
        to_numpy_params(params), src, dst, n, h.astype(np.float64),
        e.astype(np.float64), batch_norm,
    )
    np.testing.assert_allclose(np.asarray(h_out)[:n], h_ref, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(extract_edge_values(g, e_out), e_ref, rtol=2e-4, atol=2e-4)


def test_full_model_parity(rng):
    cfg = ModelConfig(num_gnn_layers=3, hidden_features=32, hidden_edge_features=8,
                      hidden_edge_scores=16, nb_pos_enc=8)
    n = 50
    src, dst = random_dag(rng, n=n, e=250)
    g = build_graph(src, dst, n)

    params = init_model_params(jax.random.PRNGKey(1), cfg)
    e_feat = rng.standard_normal((len(src), 2)).astype(np.float32)
    pe = rng.standard_normal((n, cfg.nb_pos_enc + 2)).astype(np.float32)

    scores = model_forward(
        params, g,
        prepare_edge_features(g, e_feat),
        jnp.asarray(pad_features(pe, g.n_nodes_padded)),
        backend="xla",
    )
    ref = dense_model_forward(
        to_numpy_params(params), src, dst, n,
        e_feat.astype(np.float64), pe.astype(np.float64),
    )
    np.testing.assert_allclose(extract_edge_values(g, scores), ref, rtol=5e-4, atol=5e-4)


def test_param_count_matches_reference_scale():
    # Reference prints ~6.4M params for the default config (train.py:206).
    params = init_model_params(jax.random.PRNGKey(0), ModelConfig())
    total = count_params(params)
    assert 6_000_000 < total < 7_000_000, total


def test_padding_invariance(rng):
    """Scores on real edges must not depend on padding amounts."""
    cfg = ModelConfig(num_gnn_layers=2, hidden_features=32, hidden_edge_features=8,
                      hidden_edge_scores=16, nb_pos_enc=8)
    n = 40
    src, dst = random_dag(rng, n=n, e=200)
    params = init_model_params(jax.random.PRNGKey(2), cfg)
    e_feat = rng.standard_normal((len(src), 2)).astype(np.float32)
    pe = rng.standard_normal((n, cfg.nb_pos_enc + 2)).astype(np.float32)

    outs = []
    for node_mult, edge_mult in [(256, 512), (512, 1024)]:
        g = build_graph(src, dst, n, node_pad_multiple=node_mult, edge_pad_multiple=edge_mult)
        s = model_forward(
            params, g,
            prepare_edge_features(g, e_feat),
            jnp.asarray(pad_features(pe, g.n_nodes_padded)),
            backend="xla",
        )
        outs.append(extract_edge_values(g, s))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-5)


def test_bfloat16_mode_close(rng):
    """bf16 compute mode tracks f32 scores closely (training-accuracy fidelity)."""
    cfg = ModelConfig(num_gnn_layers=2, hidden_features=32, hidden_edge_features=8,
                      hidden_edge_scores=16, nb_pos_enc=8)
    n = 40
    src, dst = random_dag(rng, n=n, e=200)
    g = build_graph(src, dst, n)
    params = init_model_params(jax.random.PRNGKey(3), cfg)
    e_feat = rng.standard_normal((len(src), 2)).astype(np.float32)
    pe = rng.standard_normal((n, cfg.nb_pos_enc + 2)).astype(np.float32)
    args = (prepare_edge_features(g, e_feat),
            jnp.asarray(pad_features(pe, g.n_nodes_padded)))
    s32 = extract_edge_values(g, model_forward(params, g, *args, backend="xla"))
    s16 = extract_edge_values(
        g, model_forward(params, g, *args, backend="xla", compute_dtype="bfloat16"))
    assert s16.dtype == np.float32
    # bf16 carries ~3 decimal digits; scores must agree to ~1e-1 abs
    np.testing.assert_allclose(s16, s32, atol=0.15, rtol=0.15)


@pytest.mark.parametrize("wide", [True, "src"])
@pytest.mark.parametrize("batch_norm", [True, False])
def test_wide_gathers_exact(rng, wide, batch_norm):
    """Paired wide-row endpoint gathers are numerically identical to the
    narrow-gather lowering (loss AND gradients), on both backends."""
    from gnnome_tpu.evaluation.metrics import bce_with_logits

    cfg = ModelConfig(num_gnn_layers=2, hidden_features=32, hidden_edge_features=8,
                      hidden_edge_scores=16, nb_pos_enc=8)
    n = 48
    src, dst = random_dag(rng, n=n, e=220)
    g = build_graph(src, dst, n)
    params = init_model_params(jax.random.PRNGKey(4), cfg)
    e_feat = prepare_edge_features(g, rng.standard_normal((len(src), 2)).astype(np.float32))
    pe = jnp.asarray(pad_features(
        rng.standard_normal((n, cfg.nb_pos_enc + 2)).astype(np.float32),
        g.n_nodes_padded))
    y = prepare_edge_features(g, (rng.random(len(src)) < 0.3).astype(np.float32))

    def loss(p, w, backend):
        logits = model_forward(p, g, e_feat, pe, batch_norm=batch_norm,
                               backend=backend, wide_gathers=w)
        return bce_with_logits(logits, y, g.edge_mask, 2.0)

    l0, g0 = jax.value_and_grad(loss)(params, False, "xla")
    l1, g1 = jax.value_and_grad(loss)(params, wide, "xla")
    assert float(l0) == float(l1)
    # same math; XLA fusion differences allow f32 reassociation in grads
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

    # pallas kernels handle the doubled feature width (gather-VJP segment
    # sums run at 2·D); interpret mode executes the real kernel logic
    l2 = loss(params, wide, "pallas_interpret")
    np.testing.assert_allclose(float(l2), float(l0), rtol=1e-5, atol=1e-6)
