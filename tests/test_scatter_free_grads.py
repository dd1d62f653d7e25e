"""The scatter-free autodiff rule: gather VJP == transpose segment-sum.

Compares gradients of the custom-VJP ops against plain jnp.take autodiff
(which uses XLA scatter) — they must agree exactly, while our backward
contains no scatter.
"""
import numpy as np
import jax
import jax.numpy as jnp

from gnnome_tpu.core.graph import (build_graph, pad_features,
                                   prepare_edge_features)
from gnnome_tpu.ops.segment import (
    gather_by_endpoint,
    permute_rows,
    segment_sum_csr,
)


def test_permute_rows_grad(rng):
    src = rng.integers(0, 50, 300).astype(np.int32)
    dst = rng.integers(0, 50, 300).astype(np.int32)
    g = build_graph(src, dst, 50)
    x = jnp.asarray(rng.standard_normal((g.n_edges_padded, 8)).astype(np.float32))

    # by_src carries a real permutation (by_dst is the identity fast path)
    def f_custom(x):
        return jnp.sum(permute_rows(x, g.by_src.order, g.by_src.inv_order) ** 2)

    def f_ref(x):
        return jnp.sum(jnp.take(x, g.by_src.order, axis=0) ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(f_custom)(x)), np.asarray(jax.grad(f_ref)(x)),
        rtol=1e-6, atol=1e-6,
    )


def test_gather_by_endpoint_grad(rng):
    src = rng.integers(0, 60, 400).astype(np.int32)
    dst = rng.integers(0, 60, 400).astype(np.int32)
    g = build_graph(src, dst, 60)
    vals = jnp.asarray(rng.standard_normal((g.n_nodes_padded, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((g.n_edges_padded, 8)).astype(np.float32))
    # zero the padding weights: plain take would otherwise pull grads from
    # padded edges (src=0), which our masked semantics intentionally drop
    w = w * jnp.asarray(np.asarray(g.edge_mask))[:, None]

    def f_custom(v):
        return jnp.sum(gather_by_endpoint(v, g.src, g.by_src, g.n_nodes_padded, "xla") * w)

    def f_ref(v):
        return jnp.sum(jnp.take(v, g.src, axis=0) * w)

    np.testing.assert_allclose(
        np.asarray(jax.grad(f_custom)(vals)), np.asarray(jax.grad(f_ref)(vals)),
        rtol=1e-5, atol=1e-5,
    )


def test_gather_grad_pallas_interpret(rng):
    src = rng.integers(0, 40, 200).astype(np.int32)
    dst = rng.integers(0, 40, 200).astype(np.int32)
    g = build_graph(src, dst, 40)
    d = 128
    vals = jnp.asarray(rng.standard_normal((g.n_nodes_padded, d)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((g.n_edges_padded, d)).astype(np.float32))
    w = w * jnp.asarray(np.asarray(g.edge_mask))[:, None]

    grads = {}
    for backend in ("xla", "pallas_interpret"):
        def f(v):
            return jnp.sum(
                gather_by_endpoint(v, g.dst, g.by_dst, g.n_nodes_padded, backend) * w
            )

        grads[backend] = np.asarray(jax.grad(f)(vals))
    np.testing.assert_allclose(
        grads["pallas_interpret"], grads["xla"], rtol=1e-5, atol=1e-5
    )


def test_no_scatter_in_train_step_hlo(rng):
    """The compiled backward must contain no scatter ops at all."""
    from gnnome_tpu.config import ModelConfig
    from gnnome_tpu.evaluation.metrics import bce_with_logits
    from gnnome_tpu.models.model import init_model_params, model_forward

    cfg = ModelConfig(num_gnn_layers=2, hidden_features=32,
                      hidden_edge_features=8, hidden_edge_scores=16, nb_pos_enc=8)
    src = rng.integers(0, 80, 500).astype(np.int32)
    dst = rng.integers(0, 80, 500).astype(np.int32)
    g = build_graph(src, dst, 80)
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    e_feat = prepare_edge_features(
        g, rng.standard_normal((500, 2)).astype(np.float32))
    pe = jnp.asarray(pad_features(
        rng.standard_normal((80, cfg.nb_pos_enc + 2)).astype(np.float32),
        g.n_nodes_padded))
    y = prepare_edge_features(
        g, (rng.random(500) < 0.3).astype(np.float32))

    def loss(p):
        # pallas backend: forward segment-sums are the kernel, backward is
        # gather-only -> the whole train step must be scatter-free. (The
        # xla backend's *forward* segment_sum lowers to scatter by design;
        # it exists for CPU correctness testing, not the TPU path.)
        logits = model_forward(p, g, e_feat, pe, backend="pallas_interpret")
        return bce_with_logits(logits, y, g.edge_mask, 1.0)

    hlo = jax.jit(jax.grad(loss)).lower(params).as_text()
    assert "scatter" not in hlo.lower(), "XLA scatter leaked into the backward pass"


def test_narrow_path_backend_grad_parity(rng):
    """Full model loss AND gradients agree between the xla lowering and the
    pallas kernels (interpret) on the narrow batch-norm path — this drives
    the whole fused dispatch chain: gate-front (in-kernel B3 projection +
    dual banded gathers + BN moments), the gather-fused gate epilog, and
    the mega-fused opposite aggregation."""
    from gnnome_tpu.config import ModelConfig
    from gnnome_tpu.evaluation.metrics import bce_with_logits
    from gnnome_tpu.models.model import init_model_params, model_forward
    from gnnome_tpu.ops.segment import (
        epilog_gather_supported,
        gate_front_supported,
        opposite_gather_supported,
    )

    cfg = ModelConfig(num_gnn_layers=2, hidden_features=128,
                      hidden_edge_features=8, hidden_edge_scores=16,
                      nb_pos_enc=8)
    src = rng.integers(0, 80, 500).astype(np.int32)
    dst = rng.integers(0, 80, 500).astype(np.int32)
    g = build_graph(src, dst, 80)
    # the fixture must actually engage the fused kernels
    assert gate_front_supported(g, "pallas_interpret")
    assert epilog_gather_supported(g, 128, 4, "pallas_interpret")
    assert opposite_gather_supported(g.by_src, "pallas_interpret")
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    e_feat = prepare_edge_features(
        g, rng.standard_normal((500, 2)).astype(np.float32))
    pe = jnp.asarray(pad_features(
        rng.standard_normal((80, cfg.nb_pos_enc + 2)).astype(np.float32),
        g.n_nodes_padded))
    y = prepare_edge_features(
        g, (rng.random(500) < 0.3).astype(np.float32))

    def loss(p, backend):
        logits = model_forward(p, g, e_feat, pe, batch_norm=True,
                               backend=backend)
        return bce_with_logits(logits, y, g.edge_mask, 1.0)

    l_x, g_x = jax.value_and_grad(loss)(params, "xla")
    l_p, g_p = jax.value_and_grad(loss)(params, "pallas_interpret")
    np.testing.assert_allclose(float(l_p), float(l_x), rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_p),
                    jax.tree_util.tree_leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)
