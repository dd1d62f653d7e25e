"""Inference: score assembly graphs with a trained model, decode contigs.

Reference: ``inference.inference`` (``inference.py:404-508``). The scoring
pass is a single jitted full-graph forward on TPU; decoding runs on host
(see :mod:`gnnome_tpu.decode.greedy`). Artifacts mirror the reference:
``<data>/inference/<idx>_walks.pkl``, ``<data>/assembly/<idx>_assembly.fasta``.
"""
from __future__ import annotations

import functools
import os
import pickle
import time
from typing import List, Optional, Tuple

import jax
import numpy as np

from gnnome_tpu.config import Config
from gnnome_tpu.data.dataset import AssemblyGraphDataset
from gnnome_tpu.decode import greedy
from gnnome_tpu.evaluation import assembly as asm
from gnnome_tpu.evaluation.metrics import classification_metrics, confusion_counts
from gnnome_tpu.models.model import init_model_params, model_forward
from gnnome_tpu.train.checkpoint import load_params


@functools.partial(jax.jit, static_argnames=("batch_norm", "backend"))
def score_graph(params, graph, e_feat, pe, batch_norm=True, backend=None):
    return model_forward(
        params, graph, e_feat, pe, batch_norm=batch_norm, backend=backend
    )


def load_model(model_path: str, cfg: Config):
    template = init_model_params(jax.random.PRNGKey(0), cfg.model)
    return load_params(model_path, template)


def inference(
    data_path: str,
    model_path: str,
    cfg: Optional[Config] = None,
    baselines: bool = False,
    log_fn=print,
    ref_lengths: Optional[dict] = None,
) -> Tuple[List[List[List[int]]], List[List[Tuple[str, str]]]]:
    """Returns (walks_per_graph, contigs_per_graph) like ``inference.py:404``.

    With ``baselines=True`` additionally decodes by raw overlap_length and
    overlap_similarity (``inference.inference_baselines``,
    ``inference.py:280-401``) and saves ``*_ol_len`` / ``*_ol_sim``
    assemblies + walks.

    On graphs with ground-truth read coordinates (simulated data), each
    decoder's walks also get the coordinate (Quast-role) evaluation
    (``evaluation.assembly.coordinate_evaluation``): misassembly count,
    corrected NGA50, true genome fraction — written to
    ``inference/<idx>_coord{suffix}.json``. ``ref_lengths`` maps graph idx
    → reference genome length (for NGA50/genome-fraction denominators).
    """
    cfg = cfg or Config()
    params = load_model(model_path, cfg)
    ds = AssemblyGraphDataset(data_path, nb_pos_enc=cfg.model.nb_pos_enc)

    inference_dir = os.path.join(data_path, "inference")
    os.makedirs(inference_dir, exist_ok=True)

    walks_per_graph: List[List[List[int]]] = []
    contigs_per_graph: List[List[Tuple[str, str]]] = []

    for idx, sample in ds:
        g = sample.graph
        t0 = time.time()
        logits = score_graph(
            params, g, sample.e_feat, sample.pe,
            batch_norm=cfg.model.batch_norm, backend=cfg.train.backend,
        )
        # device scores are canonical-order; decode indexes parser order
        from gnnome_tpu.core.graph import extract_edge_values

        scores = extract_edge_values(g, logits).astype(np.float64)
        log_fn(f"graph {idx}: scored {g.n_edges} edges in {time.time()-t0:.2f}s")

        labels = np.asarray(sample.y)[: g.n_edges]
        counts = confusion_counts(logits[: g.n_edges], labels)
        m = {k: float(v) for k, v in classification_metrics(counts).items()}
        log_fn(
            f"graph {idx}: acc={m['accuracy']:.4f} precision={m['precision']:.4f} "
            f"recall={m['recall']:.4f} f1={m['f1']:.4f} "
            f"fp_rate={m['fp_rate']:.4f} fn_rate={m['fn_rate']:.4f}"
        )

        info = os.path.join(data_path, "info")
        with open(os.path.join(info, f"{idx}_succ.pkl"), "rb") as f:
            succs = pickle.load(f)
        with open(os.path.join(info, f"{idx}_pred.pkl"), "rb") as f:
            preds = pickle.load(f)
        with open(os.path.join(info, f"{idx}_edges.pkl"), "rb") as f:
            edges = pickle.load(f)
        with open(os.path.join(info, f"{idx}_reads.pkl"), "rb") as f:
            reads = pickle.load(f)

        t0 = time.time()
        walks = greedy.get_contigs(
            sample.src, sample.dst, scores, succs, preds, edges,
            sample.prefix_length, sample.read_length,
            nb_paths=cfg.decode.num_decoding_paths,
            len_threshold=cfg.decode.len_threshold,
            seed=cfg.train.seed,
            min_prob=cfg.decode.min_prob,
        )
        log_fn(f"graph {idx}: decoded {len(walks)} walks in {time.time()-t0:.2f}s")
        with open(os.path.join(inference_dir, f"{idx}_walks.pkl"), "wb") as f:
            pickle.dump(walks, f)

        ref_len = int((ref_lengths or {}).get(idx, 0))

        def coord_report(walks_x, suffix):
            cm = asm.coordinate_evaluation(
                walks_x, np.asarray(sample.read_strand),
                np.asarray(sample.read_start), np.asarray(sample.read_end),
                ref_length=ref_len,
            )
            log_fn(
                f"graph {idx}{suffix}: misassemblies={cm['n_misassemblies']} "
                f"genome_fraction={cm['genome_fraction']:.4f} "
                f"NGA50={cm['nga50']:,} longest_correct={cm['longest_correct']:,}"
            )
            import json

            with open(os.path.join(inference_dir, f"{idx}_coord{suffix}.json"),
                      "w") as f:
                json.dump(cm, f)

        has_coords = np.asarray(sample.read_end)[: g.n_nodes].max(initial=0) > 0
        if has_coords:
            coord_report(walks, "")

        contigs = asm.walk_to_sequence(walks, reads, sample.prefix_length, edges)
        asm.save_assembly(contigs, data_path, idx)
        walks_per_graph.append(walks)
        contigs_per_graph.append(contigs)

        if baselines:
            for metric, suffix in (
                (sample.overlap_length.astype(np.float64), "_ol_len"),
                (sample.overlap_similarity.astype(np.float64), "_ol_sim"),
            ):
                # the baselines get the same confidence-floor lever as the
                # GNN (min_prob): their scores are raw features where a
                # sigmoid floor saturates, so the floor is a feature
                # quantile over real edges (DecodeConfig docstring)
                q = cfg.decode.baseline_min_quantile
                min_score_b = (
                    float(np.quantile(metric[sample.src != sample.dst], q))
                    if q > 0.0 else None
                )
                walks_b = greedy.get_contigs(
                    sample.src, sample.dst, metric, succs, preds, edges,
                    sample.prefix_length, sample.read_length,
                    nb_paths=cfg.decode.num_decoding_paths,
                    len_threshold=cfg.decode.len_threshold,
                    seed=cfg.train.seed,
                    min_score=min_score_b,
                )
                with open(os.path.join(inference_dir,
                                       f"{idx}_walks{suffix}.pkl"), "wb") as f:
                    pickle.dump(walks_b, f)
                if has_coords:
                    coord_report(walks_b, suffix)
                contigs_b = asm.walk_to_sequence(
                    walks_b, reads, sample.prefix_length, edges
                )
                asm.save_assembly(contigs_b, data_path, idx, suffix=suffix)

    return walks_per_graph, contigs_per_graph
