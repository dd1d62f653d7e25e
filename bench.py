"""Benchmark: GatedGCN fwd+bwd throughput on a chr19-scale assembly graph.

North-star metric (BASELINE.json): edges/sec/chip for the full 16-layer
GatedGCN training step (forward + backward + Adam) on a chr19-sized
synthetic assembly graph, single chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "edges/sec/chip", "vs_baseline": N}

``vs_baseline`` is the speedup of the Pallas segment-sum path over the
XLA scatter-add lowering (the DGL-equivalent execution the reference
relies on) measured in the same run on the same graph — the reference
itself publishes no numbers (BASELINE.md).

Scale knobs via env: BENCH_NODES, BENCH_EDGES, BENCH_LAYERS, BENCH_ITERS.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def build_bench_graph(n_nodes: int, n_edges: int, seed: int = 0,
                      frac_long: float = 0.0):
    """Synthetic graph with assembly-like structure: long 2-strand chains
    with overlap branches (chr19 simulated graphs have mean degree ~2-6).

    ``frac_long`` rewires that fraction of the branch edges to uniform-
    random destinations — the cross-locus edges repeat families induce —
    so partition cuts are non-degenerate (used by the multichip dryrun)."""
    from gnnome_tpu.core.graph import build_graph

    rng = np.random.default_rng(seed)
    half = n_nodes // 2
    # forward-strand chain 0->2->4..., reverse-strand mirror, plus random
    # skip edges emulating transitive overlaps and repeats
    fwd = np.arange(half - 1, dtype=np.int64)
    src = [2 * fwd, 2 * (fwd + 1) + 1]
    dst = [2 * (fwd + 1), 2 * fwd + 1]
    extra = n_edges - 2 * (half - 1)
    if extra > 0:
        s = rng.integers(0, n_nodes, extra)
        offs = rng.integers(2, 12, extra)
        d = np.minimum(s + 2 * offs, n_nodes - 1)
        n_long = int(extra * frac_long)
        if n_long:
            d[:n_long] = rng.integers(0, n_nodes, n_long)
        src.append(s)
        dst.append(d)
    src = np.concatenate(src).astype(np.int32)
    dst = np.concatenate(dst).astype(np.int32)
    keep = src != dst
    return build_graph(src[keep], dst[keep], n_nodes), int(keep.sum())


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gnnome_tpu.config import ModelConfig
    from gnnome_tpu.core.graph import pad_features, prepare_edge_features
    from gnnome_tpu.evaluation.metrics import bce_with_logits
    from gnnome_tpu.models.model import init_model_params, model_forward
    from gnnome_tpu.train.loop import make_optimizer, set_lr

    n_nodes = int(os.environ.get("BENCH_NODES", 150_000))
    n_edges = int(os.environ.get("BENCH_EDGES", 1_000_000))
    n_layers = int(os.environ.get("BENCH_LAYERS", 16))
    remat = os.environ.get("BENCH_REMAT", "unroll_group")
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    iters = int(os.environ.get("BENCH_ITERS", 10))
    # Best measured defaults (PERFORMANCE.md, round 2): with the banded
    # gather kernel, NARROW gathers win at every scale (full fused suite
    # at 1M: narrow g4 461k edges/s/chip; pre-fused-bwd sweep: narrow g2
    # 438k / g4 435k vs wide g2 404k); wide rows also crash the AOT
    # compile at g4. Overridable via BENCH_WIDE={0,1,src} / BENCH_GROUP.
    wide_env = os.environ.get("BENCH_WIDE", "auto")
    wide = {"0": False, "1": True, "auto": False}.get(wide_env, wide_env)
    default_group = 2 if (wide and n_edges > 600_000) else 4
    remat_group = int(os.environ.get("BENCH_GROUP", default_group))

    dev = jax.devices()[0]
    log(f"bench device: {dev} platform={jax.default_backend()}")
    on_tpu = jax.default_backend() == "tpu"

    cfg = ModelConfig(num_gnn_layers=n_layers)
    graph, e_real = build_bench_graph(n_nodes, n_edges)
    log(f"graph: {graph.n_nodes} nodes, {e_real} edges "
        f"(padded {graph.n_nodes_padded}/{graph.n_edges_padded})")

    rng = np.random.default_rng(1)
    e_feat = prepare_edge_features(
        graph, rng.standard_normal((e_real, 2)).astype(np.float32))
    pe = jnp.asarray(pad_features(
        rng.standard_normal((graph.n_nodes, cfg.nb_pos_enc + 2)).astype(np.float32),
        graph.n_nodes_padded))
    y = prepare_edge_features(
        graph, (rng.random(e_real) < 0.7).astype(np.float32))

    t0 = time.time()
    jax.block_until_ready(jax.device_put(np.zeros(1)))
    params = init_model_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer()
    log(f"setup: params+arrays staged in {time.time()-t0:.1f}s")

    def make_step(backend, remat_mode=None):
        remat_mode = remat_mode or remat
        # NB: the graph is a jit *argument*, never a closure capture —
        # closure-captured device arrays are inlined into the HLO as
        # constants, and multi-MB constants stall the TPU compiler.
        @functools.partial(jax.jit, static_argnames=("backend", "remat_mode"))
        def step(params, opt_state, graph, e_feat, pe, y, backend=backend,
                 remat_mode=remat_mode):
            def loss_fn(p):
                logits = model_forward(
                    p, graph, e_feat, pe, batch_norm=True, backend=backend,
                    remat=remat_mode, compute_dtype=dtype, wide_gathers=wide,
                    remat_group=remat_group,
                )
                return bce_with_logits(logits, y, graph.edge_mask, 0.5)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            import optax
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return step

    def bench(backend, graph, e_feat, pe, y, e_real, remat_mode=None):
        step = make_step(backend, remat_mode)
        p = params
        s = set_lr(opt.init(params), 1e-3)
        t0 = time.time()
        p, s, loss = step(p, s, graph, e_feat, pe, y)
        loss_v = float(loss)  # value fetch: the only true sync under axon
        log(f"{backend}: compile+first step {time.time()-t0:.1f}s loss={loss_v:.4f}")
        t0 = time.time()
        for _ in range(iters):
            p, s, loss = step(p, s, graph, e_feat, pe, y)
        _ = float(loss)
        dt = (time.time() - t0) / iters
        eps = e_real / dt
        log(f"{backend}: {dt*1e3:.1f} ms/step, {eps/1e6:.2f} M edges/s")
        return eps

    primary = "pallas" if on_tpu else "xla"
    if os.environ.get("BENCH_SHARDED", "0") == "1":
        # dual-order owner-computes step on a 1-device mesh (no permutes)
        from gnnome_tpu.data.dataset import GraphSample
        from gnnome_tpu.parallel.mesh import make_mesh
        from gnnome_tpu.parallel.sharded import make_sharded_train_step, prepare_batch

        sample = GraphSample(
            idx=0, graph=graph, e_feat=e_feat, pe=pe, y=y,
            prefix_length=np.zeros(e_real, np.int64),
            read_length=np.zeros(graph.n_nodes, np.int64),
            overlap_length=np.zeros(e_real, np.int64),
            overlap_similarity=np.zeros(e_real, np.float32),
            src=np.asarray(graph.src)[:e_real], dst=np.asarray(graph.dst)[:e_real],
        )
        mesh = make_mesh(data=1, graph=1, devices=jax.devices()[:1])
        batch = prepare_batch([sample], mesh)
        # Same remat regime as the single-device step: 'layer' remat would
        # stack [L, E, D] bf16 scan carries (~15 GB at 16x1M x256) and blow
        # HBM at full bench scale.
        sstep = make_sharded_train_step(mesh, backend=primary, compute_dtype=dtype,
                                        remat=remat, remat_group=remat_group)
        opt2 = make_optimizer()
        s2 = set_lr(opt2.init(params), 1e-3)
        # the sharded step donates its params/opt buffers; give it a copy
        # so the single-device bench below can still use `params`
        p2 = jax.tree.map(jnp.array, params)
        t0 = time.time()
        p2, s2, loss = sstep(p2, s2, batch, jnp.float32(0.5))
        log(f"sharded@1: compile+first {time.time()-t0:.1f}s loss={float(loss):.4f}")
        t0 = time.time()
        for _ in range(iters):
            p2, s2, loss = sstep(p2, s2, batch, jnp.float32(0.5))
        _ = float(loss)
        dt = (time.time() - t0) / iters
        log(f"sharded@1: {dt*1e3:.1f} ms/step, {e_real/dt/1e6:.2f} M edges/s")
    eps_primary = bench(primary, graph, e_feat, pe, y, e_real)
    vs = 1.0
    cache_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BENCH_XLA_CACHE.json")
    cache_key = f"{n_nodes}x{n_edges}x{n_layers}x{dtype}@group"
    xla_cache = {}
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            xla_cache = json.load(f)
    if on_tpu and os.environ.get("BENCH_COMPARE", "1") != "0":
        # The XLA scatter-add path (DGL-equivalent lowering) compiles
        # pathologically slowly at full scale; the SAME-SCALE, same-remat
        # ratio is what vs_baseline reports, with the (code-invariant) XLA
        # leg measured once and cached. BENCH_COMPARE_FULL=1 re-measures
        # the XLA leg and refreshes the cache.
        if os.environ.get("BENCH_COMPARE_FULL", "0") == "1":
            eps_pg = bench("pallas", graph, e_feat, pe, y, e_real,
                           remat_mode="group")
            eps_xg = bench("xla", graph, e_feat, pe, y, e_real,
                           remat_mode="group")
            vs = eps_pg / eps_xg
            xla_cache[cache_key] = eps_xg
            with open(cache_path, "w") as f:
                json.dump(xla_cache, f, indent=1)
        elif cache_key in xla_cache:
            log(f"same-scale compare vs cached XLA leg "
                f"({xla_cache[cache_key]:.0f} edges/s)")
            eps_pg = bench("pallas", graph, e_feat, pe, y, e_real,
                           remat_mode="group")
            vs = eps_pg / xla_cache[cache_key]
        elif e_real > 250_000:
            g2, e2 = build_bench_graph(30_000, 200_000)
            rng2 = np.random.default_rng(2)
            from gnnome_tpu.core.graph import pad_features as _pf
            from gnnome_tpu.core.graph import prepare_edge_features as _pef
            ef2 = _pef(g2, rng2.standard_normal((e2, 2)).astype(np.float32))
            pe2 = jnp.asarray(_pf(
                rng2.standard_normal((g2.n_nodes, cfg.nb_pos_enc + 2)).astype(np.float32),
                g2.n_nodes_padded))
            y2 = _pef(g2, (rng2.random(e2) < 0.7).astype(np.float32))
            # scan-remat for the comparison: the XLA-scatter variant cannot
            # compile 16 unrolled bodies in reasonable time; ratio stays fair
            # by using the same remat mode on both sides
            log("compare leg at capped 200k-edge scale")
            eps_p2 = bench("pallas", g2, ef2, pe2, y2, e2, remat_mode="group")
            eps_x2 = bench("xla", g2, ef2, pe2, y2, e2, remat_mode="group")
            vs = eps_p2 / eps_x2
        else:
            eps_xla = bench("xla", graph, e_feat, pe, y, e_real, remat_mode="group")
            vs = eps_primary / eps_xla

    print(json.dumps({
        "metric": f"GatedGCN-{n_layers}L fwd+bwd edges/sec/chip (chr19-scale synthetic, {primary} backend, {dtype})",
        "value": round(eps_primary, 1),
        "unit": "edges/sec/chip",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
