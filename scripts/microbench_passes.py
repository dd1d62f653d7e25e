"""Isolated per-pass microbenchmarks of the fused kernel suite at bench
scale — the inputs to PERFORMANCE.md's roofline accounting.

Op-level device traces are unavailable under the axon remote runtime
(PERFORMANCE.md), so the speed-of-light analysis is built from isolated
pass timings on the same 1M-edge bench graph the headline number uses.
Each pass is jitted alone and timed with value-fetch syncs (the only true
sync under axon).

Usage: python scripts/microbench_passes.py   (env: BENCH_NODES/BENCH_EDGES/
BENCH_DTYPE/BENCH_ITERS as bench.py)
"""
from __future__ import annotations

import functools
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
          f"D={d} {dtype.__name__}, backend={backend}", flush=True)

    rng = np.random.default_rng(0)
    nodes = jnp.asarray(rng.standard_normal((n_pad, d)), dtype)
    nodes2 = jnp.asarray(rng.standard_normal((n_pad, d)), dtype)
    edges = jnp.asarray(rng.standard_normal((e_pad, d)), dtype)
    edges2 = jnp.asarray(rng.standard_normal((e_pad, d)), dtype)
    w = jnp.asarray(rng.standard_normal((d, d)) * 0.05, dtype)
    b = jnp.asarray(rng.standard_normal(d) * 0.05, dtype)
    affine = jnp.asarray(np.stack([np.ones(d), np.zeros(d)]), jnp.float32)
    dst_key = jnp.where(graph.edge_mask, graph.dst, PAD_SEGMENT)
    src_key = jnp.where(graph.edge_mask, graph.src, PAD_SEGMENT)

    def timeit(name, fn, *args):
        jfn = jax.jit(fn)
        out = jfn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])[:1]  # sync
        t0 = time.time()
        for _i in range(iters):
            out = jfn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])[:1]
        dt = (time.time() - t0) / iters * 1e3
        gb = None
        print(f"{name:42s} {dt:8.2f} ms", flush=True)
        return dt

    from gnnome_tpu.ops.segment import (
        _fused_sigma_reverse_unsorted,
        fused_gate_front,
        fused_gate_sigma_gather,
        gather_by_endpoint,
        segment_sum_csr,
        take_rows,
    )

    results = {}
    # --- memory floor references ---
    results["elementwise [E,D] r+w"] = timeit(
        "elementwise [E,D] read+write", lambda x: x * 1.0001, edges)
    results["elementwise [E,2D] r+w"] = timeit(
        "elementwise [E,2D] read+write", lambda x, y: (x * 1.0001, y * 1.0001),
        edges, edges2)

    # --- forward suite (the three passes of the headline path) ---
    results["gate_front"] = timeit(
        "gate_front (dual gather + B3 + moments)",
        lambda b1, b2, e: fused_gate_front(
            b1, b2, e, w, b, graph.src, graph.dst,
            (graph.by_src, graph.by_dst), n_pad, e_real, backend),
        nodes, nodes2, edges)
    results["epilog_gather"] = timeit(
        "fused_gate_sigma_gather (epilog+gather)",
        lambda g, e, v: fused_gate_sigma_gather(
            g, e, v, affine, (dst_key, graph.src), graph.by_dst,
            graph.by_src, n_pad, backend),
        edges, edges2, nodes)
    if graph.by_src.canon_banded:
        results["reverse_unsorted"] = timeit(
            "fused_sigma_reverse_unsorted (opposite)",
            lambda v, g: _fused_sigma_reverse_unsorted(
                v, g, src_key, graph.dst, graph.by_src, graph.by_dst,
                n_pad, backend),
            nodes, edges)

    # --- backward building blocks ---
    results["epilog_bwd"] = timeit(
        "epilog fwd+bwd (grad of sum)",
        jax.grad(lambda g, e, v: jnp.sum(fused_gate_sigma_gather(
            g, e, v, affine, (dst_key, graph.src), graph.by_dst,
            graph.by_src, n_pad, backend)[0].astype(jnp.float32)),
            argnums=(0, 1, 2)),
        edges, edges2, nodes)
    results["segsum identity"] = timeit(
        "segment_sum identity (dst-sorted)",
        lambda e: segment_sum_csr(e, graph.by_dst, n_pad, backend=backend),
        edges)
    results["segsum permuted"] = timeit(
        "segment_sum non-identity (by_src)",
        lambda e: segment_sum_csr(e, graph.by_src, n_pad, backend=backend),
        edges)
    results["banded take nodes"] = timeit(
        "banded take [N,D] by src plan",
        lambda v: take_rows(v, graph.src, graph.by_src.key_plan, backend),
        nodes)
    results["gather_by_endpoint"] = timeit(
        "gather_by_endpoint (fwd+VJP-free)",
        lambda v: gather_by_endpoint(v, graph.src, graph.by_src, n_pad, backend),
        nodes)

    # --- dense matmul reference (the six [N,D]x[D,D] projections) ---
    results["matmul NxDxD"] = timeit(
        "dense [N,D]x[D,D] matmul",
        lambda h: jnp.dot(h, w, preferred_element_type=dtype), nodes)
    results["score head"] = timeit(
        "score head (split matmuls + gathers)",
        lambda h, e: jnp.dot(
            jnp.take(h, graph.src, axis=0) + jnp.take(h, graph.dst, axis=0),
            w[:, :64], preferred_element_type=dtype) + jnp.dot(
            e, w[:, :64], preferred_element_type=dtype),
        nodes, edges)

    print("\nsummary (ms):", {k: round(v, 2) for k, v in results.items()},
          flush=True)


if __name__ == "__main__":
    main()
