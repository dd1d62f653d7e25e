"""A/B sweep of the epilog + reverse-unsorted kernel knobs (DMA slot
depth, split accumulate chains, subtile) at bench scale on TPU.

Differential device-side timing as scripts/microbench_passes.py; knobs
are env vars read at trace time so one process sweeps every variant.

Usage: python scripts/sweep_epilog.py
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
    d = 256
    backend = "pallas" if jax.default_backend() == "tpu" else "pallas_interpret"
    graph, e_real = build_bench_graph(n_nodes, n_edges)
    n_pad, e_pad = graph.n_nodes_padded, graph.n_edges_padded
    print(f"graph {n_pad} nodes / {e_pad} edges, backend={backend}", flush=True)

    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    edges = jnp.asarray(rng.standard_normal((e_pad, d)) * 0.1, dtype)
    edges2 = jnp.asarray(rng.standard_normal((e_pad, d)) * 0.1, dtype)
    nodes = jnp.asarray(rng.standard_normal((n_pad, d)) * 0.1, dtype)
    affine = jnp.asarray(
        np.stack([rng.uniform(0.8, 1.2, d), rng.standard_normal(d) * 0.1]),
        jnp.float32)
    dst_key = jnp.where(graph.edge_mask, graph.dst, PAD_SEGMENT)
    src_key = jnp.where(graph.edge_mask, graph.src, PAD_SEGMENT)

    def timeit(name, fn, chain, *args):
        def run(n, *a):
            def body(_i, a_t):
                out = chain(fn(*a_t), a_t[0])
                scale = 1.0 + out.reshape(-1)[0].astype(jnp.float32) * 1e-30
                return (a_t[0] * scale.astype(a_t[0].dtype),) + a_t[1:]

            return jax.lax.fori_loop(0, n, body, tuple(a))[0].reshape(-1)[0].astype(jnp.float32)

        jfn = jax.jit(run)
        lo, hi = 4, 4 + iters
        _ = float(jfn(lo, *args))
        t0 = time.time(); _ = float(jfn(lo, *args)); t_lo = time.time() - t0
        t0 = time.time(); _ = float(jfn(hi, *args)); t_hi = time.time() - t0
        dt = (t_hi - t_lo) / iters * 1e3
        print(f"  {name:40s} {dt:8.2f} ms", flush=True)
        return dt

    from gnnome_tpu.ops.segment import (
        _fused_sigma_reverse_unsorted,
        fused_gate_sigma_gather,
    )

    epilog_configs = [
        ("slots2 (default)", {}),
        ("slots3", {"GNNOME_EPILOG_SLOTS": "3"}),
        ("slots4", {"GNNOME_EPILOG_SLOTS": "4"}),
        ("slots2 split", {"GNNOME_EPILOG_SPLIT": "1"}),
        ("slots3 split", {"GNNOME_EPILOG_SLOTS": "3", "GNNOME_EPILOG_SPLIT": "1"}),
        ("slots4 split", {"GNNOME_EPILOG_SLOTS": "4", "GNNOME_EPILOG_SPLIT": "1"}),
        ("sub192 slots3", {"GNNOME_SUBTILE": "192", "GNNOME_EPILOG_SLOTS": "3"}),
    ]
    if os.environ.get("SWEEP_ROUND", "1") == "2":
        epilog_configs = [
            ("sub192 slots3 split", {"GNNOME_SUBTILE": "192",
                                     "GNNOME_EPILOG_SLOTS": "3",
                                     "GNNOME_EPILOG_SPLIT": "1"}),
            ("sub192 slots4 split", {"GNNOME_SUBTILE": "192",
                                     "GNNOME_EPILOG_SLOTS": "4",
                                     "GNNOME_EPILOG_SPLIT": "1"}),
            ("sub128 slots4 split", {"GNNOME_SUBTILE": "128",
                                     "GNNOME_EPILOG_SLOTS": "4",
                                     "GNNOME_EPILOG_SPLIT": "1"}),
            ("sub192 slots4", {"GNNOME_SUBTILE": "192",
                               "GNNOME_EPILOG_SLOTS": "4"}),
        ]
    if os.environ.get("SWEEP_ROUND", "1") == "3":
        # batched select/accumulate matmuls (GNNOME_EPILOG_BATCH)
        epilog_configs = [
            ("batch1", {"GNNOME_EPILOG_BATCH": "1"}),
            ("batch2", {"GNNOME_EPILOG_BATCH": "2"}),
            ("batch4", {"GNNOME_EPILOG_BATCH": "4"}),
            ("batch2 slots2", {"GNNOME_EPILOG_BATCH": "2",
                               "GNNOME_EPILOG_SLOTS": "2"}),
            ("batch4 slots2", {"GNNOME_EPILOG_BATCH": "4",
                               "GNNOME_EPILOG_SLOTS": "2"}),
        ]
    if os.environ.get("SWEEP_ROUND", "1") == "4":
        epilog_configs = []
        sigma_batch_configs = [
            ("batch1", {"GNNOME_SIGMA_BATCH": "1"}),
            ("batch2", {"GNNOME_SIGMA_BATCH": "2"}),
            ("batch4", {"GNNOME_SIGMA_BATCH": "4"}),
            ("batch4 nosplit", {"GNNOME_SIGMA_BATCH": "4",
                                "GNNOME_SIGMA_SPLIT": "0"}),
        ]
        if graph.by_src.canon_banded:
            print("fused_sigma_reverse_unsorted (opposite):", flush=True)
            for name, env in sigma_batch_configs:
                for k in ("GNNOME_SIGMA_SLOTS", "GNNOME_SIGMA_SPLIT",
                          "GNNOME_SIGMA_SUB", "GNNOME_SIGMA_BATCH"):
                    os.environ.pop(k, None)
                os.environ.update(env)
                timeit(name,
                       lambda v, g: _fused_sigma_reverse_unsorted(
                           v, g, src_key, graph.dst, graph.by_src,
                           graph.by_dst, n_pad, backend),
                       lambda out, old: out[:, :d].astype(old.dtype),
                       nodes, edges)
        return
    print("fused_gate_sigma_gather (epilog):", flush=True)
    for name, env in epilog_configs:
        for k in ("GNNOME_EPILOG_SLOTS", "GNNOME_EPILOG_SPLIT",
                  "GNNOME_SUBTILE", "GNNOME_EPILOG_BATCH"):
            os.environ.pop(k, None)
        os.environ.update(env)
        timeit(name,
               lambda g, e, v: fused_gate_sigma_gather(
                   g, e, v, affine, (dst_key, graph.src), graph.by_dst,
                   graph.by_src, n_pad, backend),
               lambda out, old: out[1].astype(old.dtype),
               edges, edges2, nodes)

    sigma_configs = [
        ("slots2 (default)", {}),
        ("slots3", {"GNNOME_SIGMA_SLOTS": "3"}),
        ("slots4", {"GNNOME_SIGMA_SLOTS": "4"}),
        ("slots3 split", {"GNNOME_SIGMA_SLOTS": "3", "GNNOME_SIGMA_SPLIT": "1"}),
        ("slots4 split", {"GNNOME_SIGMA_SLOTS": "4", "GNNOME_SIGMA_SPLIT": "1"}),
        ("sub0 slots4", {"GNNOME_SIGMA_SUB": "0", "GNNOME_SIGMA_SLOTS": "4"}),
    ]
    if os.environ.get("SWEEP_ROUND", "1") == "2":
        sigma_configs = [
            ("sub192 slots4 split", {"GNNOME_SIGMA_SUB": "192",
                                     "GNNOME_SIGMA_SLOTS": "4",
                                     "GNNOME_SIGMA_SPLIT": "1"}),
            ("sub128 slots4 split", {"GNNOME_SIGMA_SUB": "128",
                                     "GNNOME_SIGMA_SLOTS": "4",
                                     "GNNOME_SIGMA_SPLIT": "1"}),
            ("sub256 slots6 split", {"GNNOME_SIGMA_SLOTS": "6",
                                     "GNNOME_SIGMA_SPLIT": "1"}),
        ]
    if graph.by_src.canon_banded and os.environ.get("SWEEP_ROUND", "1") != "3":
        print("fused_sigma_reverse_unsorted (opposite):", flush=True)
        for name, env in sigma_configs:
            for k in ("GNNOME_SIGMA_SLOTS", "GNNOME_SIGMA_SPLIT",
                      "GNNOME_SIGMA_SUB"):
                os.environ.pop(k, None)
            os.environ.update(env)
            timeit(name,
                   lambda v, g: _fused_sigma_reverse_unsorted(
                       v, g, src_key, graph.dst, graph.by_src, graph.by_dst,
                       n_pad, backend),
                   lambda out, old: out[:, :d].astype(old.dtype),
                   nodes, edges)


if __name__ == "__main__":
    main()
