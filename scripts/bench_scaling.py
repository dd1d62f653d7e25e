#!/usr/bin/env python
"""Multi-device scaling benchmark: edges/sec efficiency across mesh sizes.

North-star: ≥80% edges/s scaling efficiency 1 chip → 1 host → N hosts
(BASELINE.json). On real multi-chip hardware this measures actual ICI
scaling; on a single host it can validate mechanics with a simulated CPU
mesh (``--cpu-sim``) where the numbers reflect host-core, not TPU, scaling.

Usage:
  python scripts/bench_scaling.py                 # all local devices
  python scripts/bench_scaling.py --cpu-sim 8     # simulated 8-device mesh
  python scripts/bench_scaling.py --nodes 60000 --edges 400000 --iters 5
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu-sim", type=int, default=0,
                        help="simulate N CPU devices instead of real chips")
    parser.add_argument("--nodes", type=int, default=60_000)
    parser.add_argument("--edges", type=int, default=400_000)
    parser.add_argument("--layers", type=int, default=16)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--dtype", default="bfloat16")
    args = parser.parse_args()

    if args.cpu_sim:
        # a sitecustomize pre-imports jax._src, so JAX_PLATFORMS set via
        # os.environ here is IGNORED — use the config API (CLAUDE.md);
        # XLA_FLAGS is still read lazily at first backend init
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_sim}"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import build_bench_graph
    from gnnome_tpu.config import ModelConfig
    from gnnome_tpu.core.graph import pad_features, prepare_edge_features
    from gnnome_tpu.data.dataset import GraphSample
    from gnnome_tpu.models.model import init_model_params
    from gnnome_tpu.parallel.mesh import make_mesh
    from gnnome_tpu.parallel.sharded import make_sharded_train_step, prepare_batch
    from gnnome_tpu.train.loop import make_optimizer, set_lr

    n_dev = len(jax.devices())
    cfg = ModelConfig(num_gnn_layers=args.layers)
    graph, e_real = build_bench_graph(args.nodes, args.edges)
    rng = np.random.default_rng(1)
    sample = GraphSample(
        idx=0, graph=graph,
        e_feat=prepare_edge_features(
            graph, rng.standard_normal((e_real, 2)).astype(np.float32)),
        pe=jnp.asarray(pad_features(
            rng.standard_normal((graph.n_nodes, cfg.nb_pos_enc + 2)).astype(np.float32),
            graph.n_nodes_padded)),
        y=prepare_edge_features(graph, (rng.random(e_real) < 0.5).astype(np.float32)),
        prefix_length=np.zeros(e_real, np.int64),
        read_length=np.zeros(graph.n_nodes, np.int64),
        overlap_length=np.zeros(e_real, np.int64),
        overlap_similarity=np.zeros(e_real, np.float32),
        src=np.asarray(graph.src)[:e_real], dst=np.asarray(graph.dst)[:e_real],
    )

    params_host = jax.tree_util.tree_map(
        np.asarray, init_model_params(jax.random.PRNGKey(0), cfg)
    )
    opt = make_optimizer()
    backend = "pallas" if jax.default_backend() == "tpu" else "xla"

    results = {}
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n_dev]
    for p in sizes:
        mesh = make_mesh(data=1, graph=p, devices=jax.devices()[:p])
        batch = prepare_batch([sample], mesh)
        step = make_sharded_train_step(mesh, backend=backend)
        # fresh replicated params per mesh (the step donates its inputs)
        params = jax.tree_util.tree_map(jnp.asarray, params_host)
        opt_state = set_lr(opt.init(params), 1e-3)
        pw = jnp.float32(1.0)
        t0 = time.time()
        pp, opt_state, loss = step(params, opt_state, batch, pw)
        _ = float(loss)
        compile_t = time.time() - t0
        t0 = time.time()
        for _ in range(args.iters):
            pp, opt_state, loss = step(pp, opt_state, batch, pw)
        _ = float(loss)
        dt = (time.time() - t0) / args.iters
        eps = e_real / dt
        results[p] = eps
        eff = eps / (results[sizes[0]] * p / sizes[0])
        print(
            f"devices={p:>2}: {dt*1e3:8.1f} ms/step, {eps/1e6:6.2f} M edges/s, "
            f"scaling efficiency {eff*100:5.1f}%  (compile {compile_t:.1f}s)",
            file=sys.stderr, flush=True,
        )

    base = results[sizes[0]]
    print(json.dumps({
        "metric": "sharded GatedGCN scaling (edges/s by device count)",
        "results": {str(k): round(v, 1) for k, v in results.items()},
        "efficiency": {
            str(k): round(v / (base * k / sizes[0]), 4) for k, v in results.items()
        },
        "backend": backend,
    }))


if __name__ == "__main__":
    main()
