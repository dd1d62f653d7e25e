"""Isolated per-pass microbenchmarks of the fused kernel suite at bench
scale — the inputs to PERFORMANCE.md's roofline accounting.

Op-level device traces are unavailable under the axon remote runtime
(PERFORMANCE.md), so the speed-of-light analysis is built from isolated
pass timings on the same 1M-edge bench graph the headline number uses.

Measurement method: each pass runs ``BENCH_ITERS`` times inside ONE
``lax.fori_loop`` on device, with the pass output chained back into one of
its inputs (so XLA cannot hoist the loop-invariant body) — host dispatch
and tunnel latency are paid once per pass, not once per iteration (a
per-call loop measures ~1s for a 3 ms kernel under the axon runtime).

Usage: python scripts/microbench_passes.py   (env: BENCH_NODES/BENCH_EDGES/
BENCH_DTYPE/BENCH_ITERS as bench.py)
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import build_bench_graph
    from gnnome_tpu.core.graph import PAD_SEGMENT

    n_nodes = int(os.environ.get("BENCH_NODES", 150_000))
    n_edges = int(os.environ.get("BENCH_EDGES", 1_000_000))
    iters = int(os.environ.get("BENCH_ITERS", 20))
    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bfloat16") in (
        "bfloat16", "bf16") else jnp.float32
    d = int(os.environ.get("BENCH_HIDDEN", 256))
    backend = "pallas" if jax.default_backend() == "tpu" else "pallas_interpret"

    graph, e_real = build_bench_graph(n_nodes, n_edges)
    n_pad, e_pad = graph.n_nodes_padded, graph.n_edges_padded
    print(f"graph: {graph.n_nodes}/{n_pad} nodes, {e_real}/{e_pad} edges, "
          f"D={d} {dtype.__name__}, backend={backend}, iters={iters}",
          flush=True)

    rng = np.random.default_rng(0)
    nodes = jnp.asarray(rng.standard_normal((n_pad, d)) * 0.1, dtype)
    nodes2 = jnp.asarray(rng.standard_normal((n_pad, d)) * 0.1, dtype)
    edges = jnp.asarray(rng.standard_normal((e_pad, d)) * 0.1, dtype)
    edges2 = jnp.asarray(rng.standard_normal((e_pad, d)) * 0.1, dtype)
    w = jnp.asarray(rng.standard_normal((d, d)) * 0.02, dtype)
    b = jnp.asarray(rng.standard_normal(d) * 0.02, dtype)
    affine = jnp.asarray(np.stack([np.ones(d), np.zeros(d)]), jnp.float32)
    dst_key = jnp.where(graph.edge_mask, graph.dst, PAD_SEGMENT)
    src_key = jnp.where(graph.edge_mask, graph.src, PAD_SEGMENT)

    def timeit(name, fn, chain, *args, chain_arg=0):
        """fn(*args) -> out; chain(out, old_arg) -> replacement for
        args[chain_arg] so the loop body stays data-dependent.

        Times a device-side fori_loop at two iteration counts and reports
        the difference — the constant costs (dispatch, tunnel latency,
        scalar fetch) cancel, so only the per-iteration device time
        remains. Output is a SCALAR (fetching a full [E, D] result would
        itself cost ~900 ms of tunnel transfer)."""

        def run(n, *a):
            def body(_i, a_t):
                a_t = list(a_t)
                out = fn(*a_t)
                a_t[chain_arg] = chain(out, a_t[chain_arg])
                return tuple(a_t)

            out = jax.lax.fori_loop(0, n, body, tuple(a))
            return out[chain_arg].reshape(-1)[0].astype(jnp.float32)

        jfn = jax.jit(run)
        lo, hi = 4, 4 + iters
        _ = float(jfn(lo, *args))  # compile + warm
        t0 = time.time()
        _ = float(jfn(lo, *args))
        t_lo = time.time() - t0
        t0 = time.time()
        _ = float(jfn(hi, *args))
        t_hi = time.time() - t0
        dt = (t_hi - t_lo) / iters * 1e3
        print(f"{name:44s} {dt:8.2f} ms", flush=True)
        return dt

    from gnnome_tpu.ops.segment import (
        _fused_sigma_reverse_unsorted,
        fused_gate_front,
        fused_gate_sigma_gather,
        segment_sum_csr,
        take_rows,
    )

    same = lambda out, old: out.astype(old.dtype)
    results = {}
    # --- memory floor references (chain: out -> in) ---
    results["elementwise_ED"] = timeit(
        "elementwise [E,D] read+write", lambda x: x * 1.0001, same, edges)
    results["matmul_NDD"] = timeit(
        "dense [N,D]x[D,D] matmul",
        lambda h: jnp.dot(h, w, preferred_element_type=dtype), same, nodes)

    # --- forward suite (the three passes of the headline path) ---
    results["gate_front"] = timeit(
        "gate_front (dual gather + B3 + moments)",
        lambda e, b1, b2: fused_gate_front(
            b1, b2, e, w, b, graph.src, graph.dst,
            (graph.by_src, graph.by_dst), n_pad, e_real, backend),
        lambda out, old: out[0].astype(old.dtype), edges, nodes, nodes2)
    results["epilog_gather"] = timeit(
        "fused_gate_sigma_gather (epilog+gather)",
        lambda g, e, v: fused_gate_sigma_gather(
            g, e, v, affine, (dst_key, graph.src), graph.by_dst,
            graph.by_src, n_pad, backend),
        lambda out, old: out[1].astype(old.dtype), edges, edges2, nodes)
    if graph.by_src.canon_banded:
        results["reverse_unsorted"] = timeit(
            "fused_sigma_reverse_unsorted (opposite)",
            lambda v, g: _fused_sigma_reverse_unsorted(
                v, g, src_key, graph.dst, graph.by_src, graph.by_dst,
                n_pad, backend),
            lambda out, old: out[:, :d].astype(old.dtype), nodes, edges)

    # --- backward: full epilog VJP chain (recomputed gather + grads) ---
    results["epilog_fwd_bwd"] = timeit(
        "epilog fwd+bwd (value_and_grad)",
        lambda g, e, v: jax.grad(
            lambda gg: jnp.sum(fused_gate_sigma_gather(
                gg, e, v, affine, (dst_key, graph.src), graph.by_dst,
                graph.by_src, n_pad, backend)[0].astype(jnp.float32))
        )(g),
        same, edges, edges2, nodes)

    # --- backward decomposition of the other two passes ---
    results["gate_front_fwd_bwd"] = timeit(
        "gate_front fwd+bwd (value_and_grad)",
        lambda e, b1, b2: jax.grad(
            lambda ee: jnp.sum(fused_gate_front(
                b1, b2, ee, w, b, graph.src, graph.dst,
                (graph.by_src, graph.by_dst), n_pad, e_real, backend,
            )[0].astype(jnp.float32))
        )(e),
        same, edges, nodes, nodes2)
    if graph.by_src.canon_banded:
        results["reverse_fwd_bwd"] = timeit(
            "reverse_unsorted fwd+bwd (value_and_grad)",
            lambda v, g: jax.grad(
                lambda gg: jnp.sum(_fused_sigma_reverse_unsorted(
                    v, gg, src_key, graph.dst, graph.by_src, graph.by_dst,
                    n_pad, backend).astype(jnp.float32))
            )(g),
            same, nodes, edges, chain_arg=1)

    # --- whole layer: pins the glue the pass sum misses ---
    if os.environ.get("BENCH_LAYER", "1") == "1":
        from gnnome_tpu.models.gated_gcn import (
            gated_gcn_layer,
            init_gated_gcn_layer,
        )

        lp = init_gated_gcn_layer(jax.random.PRNGKey(0), d, dtype)

        def layer_fwd(h, e):
            h2, e2 = gated_gcn_layer(lp, graph, h, e, backend=backend)
            return h2, e2

        results["layer_fwd"] = timeit(
            "gated_gcn_layer forward (whole layer)",
            layer_fwd, lambda out, old: out[0].astype(old.dtype),
            nodes, edges)

        def layer_loss(h, e):
            h2, e2 = gated_gcn_layer(lp, graph, h, e, backend=backend)
            return (jnp.sum(h2.astype(jnp.float32))
                    + jnp.sum(e2.astype(jnp.float32)))

        results["layer_fwd_bwd"] = timeit(
            "gated_gcn_layer fwd+bwd (whole layer)",
            lambda h, e: jax.grad(layer_loss)(h, e),
            same, nodes, edges)

        # grad wrt params TOO — what the training step actually runs
        # (adds the six dW matmul reductions + norm-param grads)
        def layer_loss_p(lp_, h, e):
            h2, e2 = gated_gcn_layer(lp_, graph, h, e, backend=backend)
            return (jnp.sum(h2.astype(jnp.float32))
                    + jnp.sum(e2.astype(jnp.float32)))

        results["layer_fwd_bwd_params"] = timeit(
            "gated_gcn_layer fwd+bwd incl. param grads",
            lambda h, e: jax.grad(layer_loss_p, argnums=(0, 1, 2))(lp, h, e)[1],
            same, nodes, edges)

    # --- composites: chained layers / remat groups, so the between-kernel
    # and between-layer glue is MEASURED rather than inferred (the ledger's
    # glue row = composite minus the sum of its parts) ---
    if os.environ.get("BENCH_COMPOSITES", "1") == "1":
        from gnnome_tpu.models.gated_gcn import (
            gated_gcn_layer,
            init_gated_gcn_layer,
        )

        lps = [init_gated_gcn_layer(jax.random.fold_in(jax.random.PRNGKey(0), i),
                                    d, dtype) for i in range(4)]

        def chain_loss(n):
            def loss(h, e):
                for i in range(n):
                    h, e = gated_gcn_layer(lps[i], graph, h, e,
                                           backend=backend)
                return (jnp.sum(h.astype(jnp.float32))
                        + jnp.sum(e.astype(jnp.float32)))
            return loss

        results["layers2_fwd_bwd"] = timeit(
            "2 chained layers fwd+bwd",
            lambda h, e: jax.grad(chain_loss(2))(h, e), same, nodes, edges)
        results["layers4_fwd_bwd"] = timeit(
            "4 chained layers fwd+bwd",
            lambda h, e: jax.grad(chain_loss(4))(h, e), same, nodes, edges)

        def group4_loss(h, e):
            def body(args):
                h, e = args
                for i in range(4):
                    h, e = gated_gcn_layer(lps[i], graph, h, e,
                                           backend=backend)
                return (h, e)
            h, e = jax.checkpoint(body)((h, e))
            return (jnp.sum(h.astype(jnp.float32))
                    + jnp.sum(e.astype(jnp.float32)))

        results["group4_remat_fwd_bwd"] = timeit(
            "4-layer remat group fwd+bwd (replay incl.)",
            lambda h, e: jax.grad(group4_loss)(h, e), same, nodes, edges)

    # --- step-level glue: score head + encoders (model.py) ---
    if os.environ.get("BENCH_HEAD", "1") == "1":
        from gnnome_tpu.models.common import init_linear
        from gnnome_tpu.models.model import score_predictor

        kp = jax.random.PRNGKey(1)
        head = {
            "score1": init_linear(kp, 3 * d, 64, dtype),
            "score2": init_linear(jax.random.fold_in(kp, 1), 64, 1, dtype),
        }

        def head_loss(hp, h, e):
            s = score_predictor(hp, graph, h, e, backend=backend)
            return jnp.sum(s.astype(jnp.float32))

        results["score_head_fwd"] = timeit(
            "score head forward",
            lambda h, e: score_predictor(head, graph, h, e, backend=backend),
            lambda out, old: old * (1.0 + out[0].astype(jnp.float32) * 1e-30).astype(old.dtype),
            nodes, edges)
        results["score_head_fwd_bwd"] = timeit(
            "score head fwd+bwd incl. param grads",
            lambda h, e: jax.grad(head_loss, argnums=(0, 1, 2))(head, h, e)[1],
            same, nodes, edges)

    # --- primitive building blocks ---
    results["segsum_identity"] = timeit(
        "segment_sum identity (dst-sorted)",
        lambda e: segment_sum_csr(e, graph.by_dst, n_pad, backend=backend),
        lambda out, old: old * (1.0 + out[0, 0].astype(jnp.float32) * 1e-30).astype(old.dtype),
        edges)
    results["segsum_by_src"] = timeit(
        "segment_sum by_src (permute + sorted sum)",
        lambda e: segment_sum_csr(e, graph.by_src, n_pad, backend=backend),
        lambda out, old: old * (1.0 + out[0, 0].astype(jnp.float32) * 1e-30).astype(old.dtype),
        edges)
    results["banded_take_nodes"] = timeit(
        "banded take [N,D] rows by src plan",
        lambda v: take_rows(v, graph.src, graph.by_src.key_plan, backend),
        lambda out, old: old * (1.0 + out[0, 0].astype(jnp.float32) * 1e-30).astype(old.dtype),
        nodes)

    print("\nsummary_ms " + " ".join(f"{k}={v:.2f}" for k, v in results.items()),
          flush=True)


if __name__ == "__main__":
    main()
