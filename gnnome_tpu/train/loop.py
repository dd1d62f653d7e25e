"""Training loop: jit-compiled step, plateau LR, checkpoints, metrics.

TPU re-design of ``train.train`` (``train.py:115-533``):

  * the per-graph step (forward, BCE-with-pos-weight, backward, Adam) is a
    single jitted function; graphs of the same padded shape share one
    compiled executable;
  * full-graph training is the default regime (the framework's point is
    that full-graph message passing is fast on TPU); the reference's
    METIS/ClusterGCN minibatch regime (``train.py:282-343``) is available
    via ``cluster_minibatch`` for graphs that exceed device memory;
  * ``ReduceLROnPlateau`` semantics match torch (factor/patience,
    ``train.py:212``); optimizer is Adam (``train.py:209``);
  * loss is BCE-with-logits with dataset-wide pos_weight = 1 / mean
    pos:neg ratio (``train.py:181,210-211``);
  * checkpoint every epoch + best-on-valid-loss weights
    (``train.py:525-528``), with resume wired in.
"""
from __future__ import annotations

import dataclasses
import functools
import os
import random
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gnnome_tpu.config import Config
from gnnome_tpu.core.graph import AssemblyGraph
from gnnome_tpu.data.dataset import AssemblyGraphDataset, GraphSample
from gnnome_tpu.evaluation.metrics import (
    bce_with_logits,
    classification_metrics,
    confusion_counts,
)
from gnnome_tpu.models.model import count_params, init_model_params, model_forward
from gnnome_tpu.train import checkpoint as ckpt


class ReduceLROnPlateau:
    """torch-compatible plateau scheduler (mode='min')."""

    def __init__(self, factor: float = 0.95, patience: int = 2, min_lr: float = 0.0):
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best = float("inf")
        self.num_bad = 0

    def step(self, metric: float, lr: float) -> float:
        if metric < self.best:
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            self.num_bad = 0
            return max(lr * self.factor, self.min_lr)
        return lr

    def state_dict(self) -> Dict[str, float]:
        return {"best": self.best, "num_bad": self.num_bad}

    def load_state_dict(self, d: Dict[str, float]) -> None:
        self.best = float(d.get("best", float("inf")))
        self.num_bad = int(d.get("num_bad", 0))


def make_optimizer() -> optax.GradientTransformation:
    # lr is injected per-step so the plateau scheduler can change it
    # without rebuilding optimizer state.
    return optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)


def set_lr(opt_state, lr: float):
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state


def resolve_perf(cfg_train, graph: AssemblyGraph):
    """Resolve 'auto' perf knobs per graph. Returns
    (wide_gathers, remat, remat_group).

    Round-2 measurement (PERFORMANCE.md): with the banded windowed-VMEM
    gather kernel routing all endpoint gathers, NARROW gathers beat wide
    paired rows at every scale (1M edges: narrow g4 435k vs wide g2 404k
    edges/s/chip) — wide's halved gather count no longer pays once each
    gather streams at window bandwidth, and its [E, 2D] rows both shrink
    the feasible remat group and crash the AOT compile at g4. 'auto'
    therefore resolves to narrow everywhere; wide remains selectable
    explicitly (True / 'src'), keeping the round-1 policy reachable when a
    graph's band plans fall back to XLA gathers."""
    wide = cfg_train.wide_gathers
    group = cfg_train.remat_group
    e = graph.n_edges_padded
    if wide == "auto":
        wide = False
    if wide and e > 600_000 and cfg_train.remat in ("group", "unroll_group"):
        group = min(group, 2)
    return wide, cfg_train.remat, group


@functools.partial(
    jax.jit,
    static_argnames=("batch_norm", "backend", "compute_dtype", "remat",
                     "wide_gathers", "remat_group"),
    donate_argnames=("params", "opt_state"),
)
def train_step(
    params,
    opt_state,
    graph: AssemblyGraph,
    e_feat,
    pe,
    y,
    pos_weight,
    batch_norm: bool = True,
    backend: Optional[str] = None,
    compute_dtype: str = "float32",
    remat: str = "layer",
    wide_gathers=False,
    remat_group: int = 4,
):
    """One full-graph optimization step. Returns new state + metrics."""

    def loss_fn(p):
        logits = model_forward(
            p, graph, e_feat, pe, batch_norm=batch_norm, backend=backend,
            compute_dtype=compute_dtype, remat=remat,
            wide_gathers=wide_gathers, remat_group=remat_group,
        )
        loss = bce_with_logits(logits, y, graph.edge_mask, pos_weight)
        return loss, logits

    (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    opt = make_optimizer()
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    counts = confusion_counts(logits, y, graph.edge_mask)
    return params, opt_state, loss, counts


@functools.partial(jax.jit, static_argnames=("batch_norm", "backend",
                                             "compute_dtype", "wide_gathers"))
def eval_step(
    params, graph: AssemblyGraph, e_feat, pe, y, pos_weight,
    batch_norm: bool = True, backend: Optional[str] = None,
    compute_dtype: str = "float32", wide_gathers=False,
):
    logits = model_forward(
        params, graph, e_feat, pe, batch_norm=batch_norm, backend=backend,
        compute_dtype=compute_dtype, wide_gathers=wide_gathers,
    )
    loss = bce_with_logits(logits, y, graph.edge_mask, pos_weight)
    counts = confusion_counts(logits, y, graph.edge_mask)
    return loss, counts, logits


def pos_to_neg_ratio(samples: List[Tuple[int, GraphSample]]) -> float:
    """Dataset-wide mean pos:neg label ratio (``train.py:181``)."""
    ratios = []
    for _, s in samples:
        y = np.asarray(s.y)[: s.graph.n_edges]
        pos = float((y == 1).sum())
        neg = float((y == 0).sum())
        ratios.append(pos / max(neg, 1.0))
    return float(np.mean(ratios)) if ratios else 1.0


def _epoch_pass(
    samples,
    params,
    opt_state,
    pos_weight,
    cfg: Config,
    train_mode: bool,
    cluster_fn=None,
):
    """Run one pass over graphs; returns (params, opt_state, mean metrics)."""
    losses, metric_sums = [], []
    for idx, sample in samples:
        pieces = (
            cluster_fn(sample) if cluster_fn is not None else [sample]
        )
        g_losses, g_counts = [], []
        for piece in pieces:
            wide, remat, group = resolve_perf(cfg.train, piece.graph)
            if train_mode:
                params, opt_state, loss, counts = train_step(
                    params, opt_state, piece.graph, piece.e_feat, piece.pe,
                    piece.y, pos_weight,
                    batch_norm=cfg.model.batch_norm,
                    backend=cfg.train.backend,
                    compute_dtype=cfg.train.compute_dtype,
                    remat=remat, wide_gathers=wide, remat_group=group,
                )
            else:
                loss, counts, _ = eval_step(
                    params, piece.graph, piece.e_feat, piece.pe, piece.y,
                    pos_weight,
                    batch_norm=cfg.model.batch_norm,
                    backend=cfg.train.backend,
                    compute_dtype=cfg.train.compute_dtype,
                    wide_gathers=wide,
                )
            # ONE device fetch per step (loss + all four counts packed):
            # per-scalar float() costs a blocking RPC round-trip under the
            # tunneled TPU runtime and dominated small-graph epochs
            packed = np.asarray(jnp.stack(
                [loss, counts["tp"], counts["tn"], counts["fp"], counts["fn"]]
            ))
            g_losses.append(float(packed[0]))
            g_counts.append(dict(zip(("tp", "tn", "fp", "fn"), packed[1:])))
        losses.append(float(np.mean(g_losses)))
        per_piece = [
            {k: float(v) for k, v in classification_metrics(c).items()}
            for c in g_counts
        ]
        metric_sums.append(
            {k: float(np.mean([m[k] for m in per_piece])) for k in per_piece[0]}
        )
    mean_metrics = {
        k: float(np.mean([m[k] for m in metric_sums])) for k in metric_sums[0]
    } if metric_sums else {}
    mean_metrics["loss"] = float(np.mean(losses)) if losses else 0.0
    return params, opt_state, mean_metrics


def train(
    train_path: str,
    valid_path: Optional[str] = None,
    out: str = "model",
    overfit: bool = False,
    cfg: Optional[Config] = None,
    log_fn=print,
) -> Dict[str, Any]:
    """Full training run. Returns summary dict with paths + loss history."""
    cfg = cfg or Config()
    tc = cfg.train
    random.seed(tc.seed)
    np.random.seed(tc.seed)

    ds_train = AssemblyGraphDataset(train_path, nb_pos_enc=cfg.model.nb_pos_enc)
    if overfit or valid_path is None:
        ds_valid = ds_train  # overfit mode (train.py:176-179)
    else:
        ds_valid = AssemblyGraphDataset(valid_path, nb_pos_enc=cfg.model.nb_pos_enc)

    ratio = pos_to_neg_ratio(list(ds_train))
    pos_weight = jnp.asarray(1.0 / max(ratio, 1e-9), dtype=jnp.float32)

    key = jax.random.PRNGKey(tc.seed)
    params = init_model_params(key, cfg.model)
    opt = make_optimizer()
    opt_state = opt.init(params)
    opt_state = set_lr(opt_state, tc.lr)
    log_fn(f"Number of network parameters: {count_params(params)}")

    scheduler = ReduceLROnPlateau(factor=tc.decay, patience=tc.patience)
    lr = tc.lr

    # basename the run name: a path-like ``out`` (e.g. "/tmp/run/x") would
    # otherwise silently nest the artifacts under pretrained/model_/tmp/...
    run_name = os.path.basename(os.path.normpath(str(out))) or "run"
    ckpt_path = os.path.join(tc.checkpoint_dir, f"{run_name}.npz")
    best_path = os.path.join(tc.pretrained_dir, f"model_{run_name}.npz")
    start_epoch = 0
    loss_train_hist: List[float] = []
    loss_valid_hist: List[float] = []
    if tc.resume and os.path.exists(ckpt_path):
        params, opt_state, last_epoch, meta = ckpt.load_checkpoint(
            ckpt_path, params, opt_state
        )
        start_epoch = last_epoch + 1
        lr = float(meta.get("lr", lr))
        scheduler.load_state_dict(meta.get("scheduler", {}))
        loss_valid_hist = list(meta.get("loss_valid_hist", []))
        loss_train_hist = list(meta.get("loss_train_hist", []))
        log_fn(f"Resumed from {ckpt_path} at epoch {start_epoch}")

    from gnnome_tpu.utils.logging import MetricsLogger

    metrics_logger = MetricsLogger(
        out_dir=os.path.join(tc.checkpoint_dir, "runs"), run_name=run_name,
        config={"model": dataclasses.asdict(cfg.model),
                "train": dataclasses.asdict(cfg.train)},
    )

    cluster_fn = None
    valid_cluster_fn = None
    if tc.batch_size_train > 1 and tc.num_parts_train > 1:
        from gnnome_tpu.train.cluster import make_cluster_sampler

        cluster_fn = make_cluster_sampler(
            num_parts=tc.num_parts_train,
            batch_size=tc.batch_size_train,
            nb_pos_enc=cfg.model.nb_pos_enc,
            seed=tc.seed,
            jitter=tc.cluster_jitter,
        )
        if tc.cluster_validation and tc.batch_size_eval > 1 and tc.num_parts_eval > 1:
            # reference eval regime: fixed part count, re-shuffled per epoch
            # (train.py:436-439)
            valid_cluster_fn = make_cluster_sampler(
                num_parts=tc.num_parts_eval,
                batch_size=tc.batch_size_eval,
                nb_pos_enc=cfg.model.nb_pos_enc,
                seed=tc.seed + 1,
                jitter=0,
                recluster=False,
            )

    graphs = list(ds_train)
    t0 = time.time()
    try:
        _run_epochs(
            graphs, ds_valid, params, opt_state, pos_weight, cfg, lr,
            scheduler, metrics_logger, ckpt_path, best_path, start_epoch,
            loss_train_hist, loss_valid_hist, cluster_fn, log_fn, t0,
            valid_cluster_fn=valid_cluster_fn,
        )
    except KeyboardInterrupt:
        # clean exit, state already checkpointed each epoch (train.py:531-533)
        log_fn("KeyboardInterrupt — exiting (checkpoint is current)")

    metrics_logger.close()
    return {
        "best_model": best_path,
        "checkpoint": ckpt_path,
        "loss_train": loss_train_hist,
        "loss_valid": loss_valid_hist,
        "pos_to_neg_ratio": ratio,
    }


def _run_epochs(
    graphs, ds_valid, params, opt_state, pos_weight, cfg, lr, scheduler,
    metrics_logger, ckpt_path, best_path, start_epoch, loss_train_hist,
    loss_valid_hist, cluster_fn, log_fn, t0, valid_cluster_fn=None,
):
    tc = cfg.train
    for epoch in range(start_epoch, tc.num_epochs):
        random.shuffle(graphs)
        opt_state = set_lr(opt_state, lr)
        params, opt_state, train_m = _epoch_pass(
            graphs, params, opt_state, pos_weight, cfg, True, cluster_fn
        )
        loss_train_hist.append(train_m["loss"])
        log_fn(
            f"[epoch {epoch}] train loss {train_m['loss']:.4f} "
            f"acc {train_m['accuracy']:.4f} f1 {train_m['f1']:.4f} "
            f"fp_rate {train_m['fp_rate']:.4f} fn_rate {train_m['fn_rate']:.4f} "
            f"lr {lr:.6f} ({time.time() - t0:.1f}s)"
        )

        _, _, valid_m = _epoch_pass(
            list(ds_valid), params, opt_state, pos_weight, cfg, False,
            valid_cluster_fn,
        )
        loss_valid_hist.append(valid_m["loss"])
        log_fn(
            f"[epoch {epoch}] valid loss {valid_m['loss']:.4f} "
            f"acc {valid_m['accuracy']:.4f} f1 {valid_m['f1']:.4f}"
        )

        # per-epoch metric record (the reference's 14-metric wandb log,
        # train.py:513-521)
        metrics_logger.log(
            {**{f"train_{k}": v for k, v in train_m.items()},
             **{f"val_{k}": v for k, v in valid_m.items()},
             "lr_value": lr},
            step=epoch,
        )

        # best-model selection on valid loss (train.py:525-527)
        if valid_m["loss"] <= min(loss_valid_hist):
            ckpt.save_params(best_path, params)
        ckpt.save_checkpoint(
            ckpt_path, params, opt_state, epoch,
            scalars={
                "lr": lr,
                "loss_train_hist": loss_train_hist,
                "loss_valid_hist": loss_valid_hist,
                "scheduler": scheduler.state_dict(),
            },
        )
        lr = scheduler.step(valid_m["loss"], lr)
