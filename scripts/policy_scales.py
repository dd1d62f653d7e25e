"""Span-keyed auto-policy validation at second/third scales (VERDICT r4 #6).

At each requested scale this prints the auto policy's resolved choices
(band-plan (group, wr) via the calibrated plan_cost model, streaming
segsum window, subtile/slots/batch picks) and times the three fused
forward passes under (a) the auto policy and (b) a small grid of forced
alternates — evidence that the policy generalizes beyond the 1M-edge
bench graph rather than memorizing it.

Timing uses the differential device-side method (microbench_passes.py);
run on an OTHERWISE IDLE host or the numbers are garbage. With
POLICY_COMPILE_ONLY=1 it just compiles+prints picks (safe under load).

Usage: python scripts/policy_scales.py 30000:200000 300000:2000000
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_scale(n_nodes: int, n_edges: int, iters: int, compile_only: bool) -> None:
    import jax
    import jax.numpy as jnp

    from bench import build_bench_graph
    from gnnome_tpu.core.graph import PAD_SEGMENT
    from gnnome_tpu.ops.segment import (
        _fused_sigma_reverse_unsorted,
        fused_gate_front,
        fused_gate_sigma_gather,
    )

    d = 256
    backend = "pallas" if jax.default_backend() == "tpu" else "pallas_interpret"
    graph, e_real = build_bench_graph(n_nodes, n_edges)
    n_pad, e_pad = graph.n_nodes_padded, graph.n_edges_padded
    bd, bs = graph.by_dst, graph.by_src
    print(f"== scale {n_nodes}/{n_edges} (pad {n_pad}/{e_pad}) ==", flush=True)
    for nm, csr in (("by_dst", bd), ("by_src", bs)):
        plans = {"expand": csr.expand_plan, "key": csr.key_plan,
                 "opp": csr.opp_plan}
        pw = {k: (f"(g={p.group},wr={p.wr})" if p is not None and p.ok
                  else ("miss" if p is not None else "-"))
              for k, p in plans.items()}
        print(f"  {nm}: canon_banded={csr.canon_banded} stream_w={csr.stream_w}"
              f" plans={pw}", flush=True)

    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    nodes = jnp.asarray(rng.standard_normal((n_pad, d)) * 0.1, dtype)
    nodes2 = jnp.asarray(rng.standard_normal((n_pad, d)) * 0.1, dtype)
    edges = jnp.asarray(rng.standard_normal((e_pad, d)) * 0.1, dtype)
    w = jnp.asarray(rng.standard_normal((d, d)) * 0.02, dtype)
    b = jnp.asarray(rng.standard_normal(d) * 0.02, dtype)
    affine = jnp.asarray(np.stack([np.ones(d), np.zeros(d)]), jnp.float32)
    dst_key = jnp.where(graph.edge_mask, graph.dst, PAD_SEGMENT)

    def timeit(name, fn, *args):
        def run(n, *a):
            def body(_i, a_t):
                out = fn(*a_t)
                first = (out[0] if isinstance(out, tuple) else out)
                scale = 1.0 + first.reshape(-1)[0].astype(jnp.float32) * 1e-30
                return (a_t[0] * scale.astype(a_t[0].dtype),) + a_t[1:]
            return jax.lax.fori_loop(0, n, body, tuple(a))[0].reshape(-1)[0].astype(jnp.float32)

        jfn = jax.jit(run)
        _ = float(jfn(4, *args))
        if compile_only:
            print(f"  {name:34s} compiled", flush=True)
            return
        t0 = time.time(); _ = float(jfn(4, *args)); t_lo = time.time() - t0
        t0 = time.time(); _ = float(jfn(4 + iters, *args)); t_hi = time.time() - t0
        print(f"  {name:34s} {(t_hi - t_lo) / iters * 1e3:8.2f} ms", flush=True)

    grids = [("auto", {})]
    if not compile_only and os.environ.get("POLICY_GRID") != "auto":
        grids += [
            ("slots3", {"GNNOME_EPILOG_SLOTS": "3", "GNNOME_SIGMA_SLOTS": "3"}),
            ("batch1", {"GNNOME_EPILOG_BATCH": "1", "GNNOME_SIGMA_BATCH": "1",
                        "GNNOME_GATE_BATCH": "1"}),
            ("batch2", {"GNNOME_EPILOG_BATCH": "2", "GNNOME_SIGMA_BATCH": "2",
                        "GNNOME_GATE_BATCH": "2"}),
            ("sub0", {"GNNOME_SUBTILE": "0", "GNNOME_SIGMA_SUB": "0"}),
        ]
    knob_keys = ("GNNOME_EPILOG_SLOTS", "GNNOME_SIGMA_SLOTS",
                 "GNNOME_EPILOG_BATCH", "GNNOME_SIGMA_BATCH",
                 "GNNOME_GATE_BATCH", "GNNOME_SUBTILE", "GNNOME_SIGMA_SUB")
    for label, env in grids:
        for k in knob_keys:
            os.environ.pop(k, None)
        os.environ.update(env)
        timeit(f"gate_front [{label}]",
               lambda b1, b2, e: fused_gate_front(
                   b1, b2, e, w, b, graph.src, graph.dst, (bs, bd),
                   n_pad, e_real, backend)[0],
               nodes, nodes2, edges)
        timeit(f"epilog [{label}]",
               lambda g, e2, a2: fused_gate_sigma_gather(
                   g, e2, a2, affine, (dst_key, graph.src), bd, bs,
                   n_pad, backend)[0],
               edges, edges, nodes)
        if bs.canon_banded:
            timeit(f"reverse [{label}]",
                   lambda a3, g: _fused_sigma_reverse_unsorted(
                       a3, g,
                       jnp.where(graph.edge_mask, graph.src, PAD_SEGMENT),
                       graph.dst, bs, bd, n_pad, backend),
                   nodes, edges)
    for k in knob_keys:
        os.environ.pop(k, None)


def main() -> None:
    iters = int(os.environ.get("BENCH_ITERS", 20))
    compile_only = os.environ.get("POLICY_COMPILE_ONLY", "0") == "1"
    for spec in sys.argv[1:]:
        n, e = spec.split(":")
        run_scale(int(n), int(e), iters, compile_only)


if __name__ == "__main__":
    main()
