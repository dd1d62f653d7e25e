"""A/B sweep of the segment-sum kernel variants (subtile accumulate, DMA
slot depth, split accumulator chains) at bench scale on TPU.

Differential device-side timing as scripts/microbench_passes.py. Each
variant is selected via the GNNOME_SEGSUM_* env knobs read at trace time,
so one process can sweep all of them (each traces+compiles fresh).

Usage: python scripts/sweep_segsum.py
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

    n_nodes = int(os.environ.get("BENCH_NODES", 150_000))
    n_edges = int(os.environ.get("BENCH_EDGES", 1_000_000))
    iters = int(os.environ.get("BENCH_ITERS", 20))
    d = 256
    backend = "pallas" if jax.default_backend() == "tpu" else "pallas_interpret"
    graph, e_real = build_bench_graph(n_nodes, n_edges)
    n_pad, e_pad = graph.n_nodes_padded, graph.n_edges_padded
    print(f"graph {n_pad} nodes / {e_pad} edges, backend={backend}", flush=True)

    rng = np.random.default_rng(0)
    edges = jnp.asarray(rng.standard_normal((e_pad, d)) * 0.1, jnp.bfloat16)

    def timeit(name, fn, *args):
        def run(n, *a):
            def body(_i, a_t):
                out = fn(*a_t)
                scale = (1.0 + out[0, 0].astype(jnp.float32) * 1e-30)
                return (a_t[0] * scale.astype(a_t[0].dtype),) + a_t[1:]

            return jax.lax.fori_loop(0, n, body, tuple(a))[0].reshape(-1)[0].astype(jnp.float32)

        jfn = jax.jit(run)
        lo, hi = 4, 4 + iters
        _ = float(jfn(lo, *args))
        t0 = time.time(); _ = float(jfn(lo, *args)); t_lo = time.time() - t0
        t0 = time.time(); _ = float(jfn(hi, *args)); t_hi = time.time() - t0
        dt = (t_hi - t_lo) / iters * 1e3
        print(f"  {name:34s} {dt:8.2f} ms", flush=True)
        return dt

    from gnnome_tpu.ops.segment import segment_sum_csr

    configs = [
        ("sub128 bn512 slots2", {"GNNOME_SEGSUM_SUB": "128", "GNNOME_SEGSUM_BN": "512"}),
        ("sub192 bn512 slots2", {"GNNOME_SEGSUM_SUB": "192", "GNNOME_SEGSUM_BN": "512"}),
        ("sub192 bn512 slots4", {"GNNOME_SEGSUM_SUB": "192", "GNNOME_SEGSUM_BN": "512",
                                 "GNNOME_SEGSUM_SLOTS": "4"}),
        ("sub256 bn512 slots4", {"GNNOME_SEGSUM_SUB": "256", "GNNOME_SEGSUM_BN": "512",
                                 "GNNOME_SEGSUM_SLOTS": "4"}),
    ] * 2
    keys = ["GNNOME_SEGSUM_SUB", "GNNOME_SEGSUM_BN", "GNNOME_SEGSUM_SPLIT",
            "GNNOME_SEGSUM_SLOTS"]
    for name, env in configs:
        for k in keys:
            os.environ.pop(k, None)
        os.environ.update(env)
        print(name, flush=True)
        timeit("segsum identity (sorted dst)",
               lambda e: segment_sum_csr(e, graph.by_dst, n_pad, backend=backend),
               edges)
        timeit("segsum by_src (unsorted canonical)",
               lambda e: segment_sum_csr(e, graph.by_src, n_pad, backend=backend),
               edges)


if __name__ == "__main__":
    main()
