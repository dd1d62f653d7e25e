"""Calibrate the band-plan cost model (ops/banded.plan_cost) on hardware.

Times the fused epilog (``fused_gate_sigma_gather``) and the plain banded
node-row take under FORCED (group, wr) plans on the bench graph, then fits
    t = a + b·(wr/group) + c·wr
(b = window-stream bytes term, c = selector-MXU term). The model's κ is
c/b — plan_windows_auto ranks candidates by wr·(1/group + κ).

Usage: python scripts/calibrate_plan_cost.py   (env: BENCH_NODES/BENCH_EDGES/
BENCH_DTYPE/BENCH_ITERS as bench.py)
"""
from __future__ import annotations

import dataclasses
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
    from gnnome_tpu.ops.banded import plan_windows, take_rows
    from gnnome_tpu.ops.segment import fused_gate_sigma_gather

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
    edges = jnp.asarray(rng.standard_normal((e_pad, d)) * 0.1, dtype)
    edges2 = jnp.asarray(rng.standard_normal((e_pad, d)) * 0.1, dtype)
    affine = jnp.asarray(np.stack([np.ones(d), np.zeros(d)]), jnp.float32)
    dst_key = jnp.where(graph.edge_mask, graph.dst, PAD_SEGMENT)
    src_np = np.asarray(graph.src)

    def timeit(name, fn, chain, *args, chain_arg=0):
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
        _ = float(jfn(lo, *args))
        t0 = time.time(); _ = float(jfn(lo, *args)); t_lo = time.time() - t0
        t0 = time.time(); _ = float(jfn(hi, *args)); t_hi = time.time() - t0
        dt = (t_hi - t_lo) / iters * 1e3
        print(f"{name:44s} {dt:8.2f} ms", flush=True)
        return dt

    # forced plans on the epilog's value windows (by_src.key_plan covers
    # graph.src in canonical order)
    cases = []
    for group in (8, 4, 2, 1):
        for wr in (128, 256):
            p = plan_windows(src_np, n_pad, widths=(wr,), group=group)
            if p.ok:
                cases.append((group, wr, p))

    rows = []
    for group, wr, p in cases:
        by_src_f = dataclasses.replace(graph.by_src, key_plan=p)

        t_ep = timeit(
            f"epilog forced plan (g{group}, wr{wr})",
            lambda g, e, v, _bs=by_src_f: fused_gate_sigma_gather(
                g, e, v, affine, (dst_key, graph.src), graph.by_dst,
                _bs, n_pad, backend),
            lambda out, old: out[1].astype(old.dtype), edges, edges2, nodes)
        t_tk = timeit(
            f"banded take forced plan (g{group}, wr{wr})",
            lambda v, _p=p: take_rows(v, graph.src, _p, backend),
            lambda out, old: old * (1.0 + out[0, 0].astype(jnp.float32)
                                    * 1e-30).astype(old.dtype),
            nodes)
        rows.append((group, wr, t_ep, t_tk))

    # least-squares fit t = a + b*(wr/group) + c*wr for each op
    A = np.array([[1.0, wr / g, wr] for g, wr, _, _ in rows])
    for col, label in ((2, "epilog"), (3, "take")):
        y = np.array([r[col] for r in rows])
        coef, *_ = np.linalg.lstsq(A, y, rcond=None)
        a, b, c = coef
        kappa = c / b if b > 0 else float("nan")
        print(f"fit[{label}]: a={a:.3f} ms  b={b * 128:.3f} ms/(wr128/g)  "
              f"c={c * 128:.3f} ms/wr128  kappa={kappa:.2f}", flush=True)


if __name__ == "__main__":
    main()
