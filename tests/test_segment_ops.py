"""Unit tests for the sparse aggregation primitives (XLA and Pallas)."""
import numpy as np
import jax
import jax.numpy as jnp

from gnnome_tpu.core.graph import (build_graph, pad_features,
                                   prepare_edge_features)
from gnnome_tpu.ops.segment import gated_aggregate, segment_sum_csr


def make_graph(rng, n=70, e=400):
    src = rng.integers(0, n, size=e).astype(np.int32)
    dst = rng.integers(0, n, size=e).astype(np.int32)
    return src, dst, build_graph(src, dst, n)


def dense_segment_sum(data, ids, n):
    out = np.zeros((n, data.shape[1]))
    for k, i in enumerate(ids):
        out[i] += data[k]
    return out


def test_segment_sum_xla_matches_dense(rng):
    src, dst, g = make_graph(rng)
    d = 16
    data = rng.standard_normal((len(src), d)).astype(np.float32)
    data_pad = prepare_edge_features(g, data)
    out = segment_sum_csr(data_pad, g.by_dst, g.n_nodes_padded, backend="xla")
    ref = dense_segment_sum(data, dst, g.n_nodes)
    np.testing.assert_allclose(np.asarray(out)[: g.n_nodes], ref, rtol=1e-5, atol=1e-5)
    # transpose layout keyed by src
    out_b = segment_sum_csr(data_pad, g.by_src, g.n_nodes_padded, backend="xla")
    ref_b = dense_segment_sum(data, src, g.n_nodes)
    np.testing.assert_allclose(np.asarray(out_b)[: g.n_nodes], ref_b, rtol=1e-5, atol=1e-5)


def test_segment_sum_pallas_interpret_matches_xla(rng):
    src, dst, g = make_graph(rng, n=100, e=700)
    d = 128
    data = rng.standard_normal((len(src), d)).astype(np.float32)
    data_pad = prepare_edge_features(g, data)
    ref = segment_sum_csr(data_pad, g.by_dst, g.n_nodes_padded, backend="xla")
    out = segment_sum_csr(data_pad, g.by_dst, g.n_nodes_padded, backend="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_pallas_segment_sum_grad(rng):
    src, dst, g = make_graph(rng, n=50, e=300)
    d = 128
    data = rng.standard_normal((len(src), d)).astype(np.float32)
    data_pad = prepare_edge_features(g, data)

    def loss(x, backend):
        out = segment_sum_csr(x, g.by_dst, g.n_nodes_padded, backend=backend)
        return jnp.sum(out**2)

    g_xla = jax.grad(lambda x: loss(x, "xla"))(data_pad)
    g_pal = jax.grad(lambda x: loss(x, "pallas_interpret"))(data_pad)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_xla), rtol=1e-4, atol=1e-4)


def test_gated_aggregate_matches_manual(rng):
    src, dst, g = make_graph(rng, n=40, e=200)
    d = 8
    vals = rng.standard_normal((g.n_nodes_padded, d)).astype(np.float32)
    gate_pre = rng.standard_normal((len(src), d)).astype(np.float32)
    gate_pad = prepare_edge_features(g, gate_pre)
    from gnnome_tpu.core.graph import PAD_SEGMENT
    dst_key = jnp.where(g.edge_mask, g.dst, PAD_SEGMENT)

    out = gated_aggregate(
        jnp.asarray(vals), gate_pad, g.src, g.by_src, g.by_dst,
        g.n_nodes_padded, key=dst_key, backend="xla",
    )
    sigma = 1.0 / (1.0 + np.exp(-gate_pre))
    num = dense_segment_sum(sigma * vals[src], dst, g.n_nodes)
    den = dense_segment_sum(sigma, dst, g.n_nodes)
    ref = num / (den + 1e-6)
    np.testing.assert_allclose(np.asarray(out)[: g.n_nodes], ref, rtol=1e-5, atol=1e-5)


def test_empty_and_high_degree_segments(rng):
    # node 0 gets most edges; many nodes get none — stresses CSR ranges.
    n, e = 300, 1000
    src = rng.integers(0, n, size=e).astype(np.int32)
    dst = np.zeros(e, dtype=np.int32)
    dst[: e // 2] = 0
    dst[e // 2 :] = rng.integers(0, 5, size=e - e // 2)
    g = build_graph(src, dst, n)
    d = 128
    data = rng.standard_normal((e, d)).astype(np.float32)
    data_pad = prepare_edge_features(g, data)
    ref = dense_segment_sum(data, dst, n)
    for backend in ("xla", "pallas_interpret"):
        out = segment_sum_csr(data_pad, g.by_dst, g.n_nodes_padded, backend=backend)
        np.testing.assert_allclose(np.asarray(out)[:n], ref, rtol=5e-5, atol=5e-5)


def test_fused_sigma_aggregate_pallas_and_grads(rng):
    """Fused σ-aggregate: pallas-interpret == xla compose, grads too."""
    import jax
    from gnnome_tpu.core.graph import PAD_SEGMENT
    from gnnome_tpu.ops.segment import _fused_sigma_aggregate

    src, dst, g = make_graph(rng, n=60, e=400)
    d = 128
    e_pre = prepare_edge_features(g, rng.standard_normal((len(src), d)).astype(np.float32))
    vals = prepare_edge_features(g, rng.standard_normal((len(src), d)).astype(np.float32))
    dst_key = jnp.where(g.edge_mask, g.dst, PAD_SEGMENT)

    outs, grads = {}, {}
    for backend in ("xla", "pallas_interpret"):
        def f(e, v):
            o = _fused_sigma_aggregate(e, v, dst_key, g.by_dst,
                                       g.n_nodes_padded, backend)
            return jnp.sum(o ** 2), o

        (loss, o), gr = jax.value_and_grad(f, argnums=(0, 1), has_aux=True)(e_pre, vals)
        outs[backend] = np.asarray(o)
        grads[backend] = [np.asarray(x) for x in gr]
    np.testing.assert_allclose(outs["pallas_interpret"], outs["xla"],
                               rtol=5e-5, atol=5e-5)
    for a, b in zip(grads["pallas_interpret"], grads["xla"]):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4)


def test_fused_gate_epilog_matches_unfused(rng):
    """Gate-epilog fusion (BN-affine+relu+residual+σ+sums+e_new) equals the
    op-by-op composition — values and all gradients, both backends."""
    import jax
    from gnnome_tpu.core.graph import PAD_SEGMENT
    from gnnome_tpu.ops.segment import fused_gate_sigma_aggregate

    src, dst, g = make_graph(rng, n=70, e=450)
    d = 128
    e = len(src)
    graw = prepare_edge_features(g, rng.standard_normal((e, d)).astype(np.float32))
    e_in = prepare_edge_features(g, rng.standard_normal((e, d)).astype(np.float32))
    vals = prepare_edge_features(g, rng.standard_normal((e, d)).astype(np.float32))
    affine = jnp.asarray(
        np.stack([rng.uniform(0.5, 1.5, d), rng.standard_normal(d)]).astype(np.float32))
    dst_key = jnp.where(g.edge_mask, g.dst, PAD_SEGMENT)

    def manual(graw_, e_in_, vals_, affine_):
        pre = graw_ * affine_[0] + affine_[1]
        e_new = jnp.maximum(pre, 0.0) + e_in_
        sig = jax.nn.sigmoid(e_new)
        from gnnome_tpu.ops.segment import segment_sum_csr
        stacked = jnp.concatenate([sig * vals_, sig], axis=-1)
        sums = segment_sum_csr(stacked, g.by_dst, g.n_nodes_padded, backend="xla")
        return sums, e_new

    def loss_of(fn):
        def f(*args):
            sums, e_new = fn(*args)
            # touch both outputs, masked (padding rows are implementation-defined)
            m = jnp.asarray(np.asarray(g.edge_mask))[:, None]
            return jnp.sum(sums[: g.n_nodes] ** 2) + jnp.sum((e_new * m) ** 3)
        return f

    ref_l, ref_g = jax.value_and_grad(loss_of(manual), argnums=(0, 1, 2, 3))(
        graw, e_in, vals, affine)

    for backend in ("xla", "pallas_interpret"):
        fn = lambda a, b, c, d_: fused_gate_sigma_aggregate(
            a, b, c, d_, dst_key, g.by_dst, g.n_nodes_padded, backend)
        got_l, got_g = jax.value_and_grad(loss_of(fn), argnums=(0, 1, 2, 3))(
            graw, e_in, vals, affine)
        np.testing.assert_allclose(float(got_l), float(ref_l), rtol=2e-4)
        for a, b in zip(got_g, ref_g):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-3)


def test_fused_gate_sigma_gather_matches(rng):
    """Gather-fused gate epilog (neighbor rows selected from banded VMEM
    windows inside the kernel) equals the composition with a pregathered
    [E, D] table — values and all gradients, both backends."""
    import jax
    from gnnome_tpu.core.graph import PAD_SEGMENT
    from gnnome_tpu.ops.segment import (
        epilog_gather_supported,
        fused_gate_sigma_aggregate,
        fused_gate_sigma_gather,
        gather_by_endpoint,
    )

    src, dst, g = make_graph(rng, n=90, e=600)
    assert epilog_gather_supported(g, 128, 4, "pallas_interpret")
    d = 128
    e = len(src)
    n_pad = g.n_nodes_padded
    graw = prepare_edge_features(g, rng.standard_normal((e, d)).astype(np.float32))
    e_in = prepare_edge_features(g, rng.standard_normal((e, d)).astype(np.float32))
    values = jnp.asarray(rng.standard_normal((n_pad, d)), jnp.float32)
    affine = jnp.asarray(
        np.stack([rng.uniform(0.5, 1.5, d), rng.standard_normal(d)]).astype(np.float32))
    dst_key = jnp.where(g.edge_mask, g.dst, PAD_SEGMENT)

    def ref_fn(graw_, e_in_, values_, affine_):
        vals = gather_by_endpoint(values_, g.src, g.by_src, n_pad, "xla")
        return fused_gate_sigma_aggregate(
            graw_, e_in_, vals, affine_, dst_key, g.by_dst, n_pad, "xla")

    def loss_of(fn):
        def f(*args):
            sums, e_new = fn(*args)
            m = jnp.asarray(np.asarray(g.edge_mask))[:, None]
            return jnp.sum(sums[: g.n_nodes] ** 2) + jnp.sum((e_new * m) ** 3)
        return f

    ref_l, ref_g = jax.value_and_grad(loss_of(ref_fn), argnums=(0, 1, 2, 3))(
        graw, e_in, values, affine)

    for backend in ("xla", "pallas_interpret"):
        fn = lambda a, b, c, d_: fused_gate_sigma_gather(
            a, b, c, d_, (dst_key, g.src), g.by_dst, g.by_src, n_pad, backend)
        got_l, got_g = jax.value_and_grad(loss_of(fn), argnums=(0, 1, 2, 3))(
            graw, e_in, values, affine)
        np.testing.assert_allclose(float(got_l), float(ref_l), rtol=2e-4)
        for a, b in zip(got_g, ref_g):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-3)


def test_fused_sigma_opposite_matches(rng):
    """The mega-fused reverse aggregation (order-gather + opposite-gather +
    σ + dual segment-sum in ONE kernel) equals the composition — values and
    grads, both backends. Calls the op directly: the small f32 fixture's
    window plans exceed the production VMEM budget gate."""
    from gnnome_tpu.ops.segment import _fused_sigma_opposite

    src, dst, g = make_graph(rng, n=90, e=600)
    d = 128
    n_pad = g.n_nodes_padded
    vals = jnp.asarray(rng.standard_normal((n_pad, d)), jnp.float32)
    e_new = jnp.asarray(
        rng.standard_normal((g.n_edges_padded, d)), jnp.float32)

    def ref_fn(v, e):
        e_s = jnp.take(e, np.asarray(g.by_src.order), axis=0)
        v_s = jnp.take(v, np.asarray(g.by_src.opp_ids), axis=0)
        sigma = jax.nn.sigmoid(e_s)
        stacked = jnp.concatenate([sigma * v_s, sigma], axis=-1)
        from gnnome_tpu.ops.segment import _sorted_segment_sum_raw
        return _sorted_segment_sum_raw(stacked, g.by_src, n_pad, "xla")

    def loss_of(fn):
        def f(v, e):
            out = fn(v, e)
            return jnp.sum(out[: g.n_nodes] ** 2)
        return f

    ref_l, ref_g = jax.value_and_grad(loss_of(ref_fn), argnums=(0, 1))(
        vals, e_new)
    for backend in ("xla", "pallas_interpret"):
        fn = lambda v, e: _fused_sigma_opposite(
            v, e, g.by_src, g.by_dst, n_pad, backend)
        got_l, got_g = jax.value_and_grad(loss_of(fn), argnums=(0, 1))(
            vals, e_new)
        np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-4)
        for a, b in zip(got_g, ref_g):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)


def test_gated_aggregate_opposite_matches(rng):
    """The permute-free reverse aggregation (gather a3h directly in
    src-sorted order) must match gated_aggregate exactly — values and
    grads — on both backends it supports."""
    from gnnome_tpu.core.graph import PAD_SEGMENT
    from gnnome_tpu.ops.segment import (
        gated_aggregate_opposite,
        opposite_gather_supported,
    )

    src, dst, g = make_graph(rng, n=90, e=600)
    assert g.by_src.opp_plan is not None and g.by_src.opp_plan.ok
    assert opposite_gather_supported(g.by_src, "pallas_interpret")
    d = 128
    n_pad = g.n_nodes_padded
    vals = jnp.asarray(rng.standard_normal((n_pad, d)), jnp.float32)
    e_new = jnp.asarray(
        rng.standard_normal((g.n_edges_padded, d)), jnp.float32)
    src_key = jnp.where(g.edge_mask, g.src, PAD_SEGMENT)

    def ref_fn(v, e):
        return gated_aggregate(v, e, g.dst, g.by_dst, g.by_src, n_pad,
                               key=src_key, backend="xla")

    def opp_fn(v, e, backend):
        return gated_aggregate_opposite(v, e, g.by_src, g.by_dst, n_pad,
                                        backend=backend)

    def loss_of(fn):
        def f(v, e):
            out = fn(v, e)
            return jnp.sum(out[: g.n_nodes] ** 2)
        return f

    ref_l, ref_g = jax.value_and_grad(loss_of(ref_fn), argnums=(0, 1))(
        vals, e_new)
    for backend in ("xla", "pallas_interpret"):
        got_l, got_g = jax.value_and_grad(
            loss_of(lambda v, e: opp_fn(v, e, backend)), argnums=(0, 1)
        )(vals, e_new)
        np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-4)
        for a, b in zip(got_g, ref_g):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)
