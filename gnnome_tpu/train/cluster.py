"""Cluster-minibatch sampling (ClusterGCN regime).

Memory-scaling fallback matching the reference's METIS/ClusterGCN path
(``train.py:282-343``): partition a graph into ``num_parts`` clusters,
shuffle, and train on induced subgraphs of ``batch_size`` clusters at a
time. Each induced subgraph is re-padded to shared bucket sizes so XLA
compiles one executable for the whole epoch instead of one per batch.

Node features (PE, degrees) are sliced from the full graph, as DGL's
sampler does — they are *not* recomputed per subgraph.
"""
from __future__ import annotations

import math
import random
from typing import Callable, Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from gnnome_tpu.core.graph import (
    build_graph,
    extract_edge_values,
    pad_features,
    prepare_edge_features,
)
from gnnome_tpu.data.dataset import GraphSample
from gnnome_tpu.parallel.partition import partition_nodes


def induced_subgraph(
    sample: GraphSample, node_ids: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(sub_src, sub_dst, edge_ids, node_ids) for the induced subgraph."""
    n = sample.graph.n_nodes
    keep = np.zeros(n, dtype=bool)
    keep[node_ids] = True
    relabel = -np.ones(n, dtype=np.int64)
    relabel[node_ids] = np.arange(len(node_ids))
    emask = keep[sample.src] & keep[sample.dst]
    edge_ids = np.nonzero(emask)[0]
    return (
        relabel[sample.src[edge_ids]].astype(np.int32),
        relabel[sample.dst[edge_ids]].astype(np.int32),
        edge_ids,
        node_ids,
    )


def make_cluster_sampler(
    num_parts: int,
    batch_size: int,
    nb_pos_enc: int,
    seed: int = 0,
    jitter: int = 100,
    recluster: bool = True,
) -> Callable[[GraphSample], List[GraphSample]]:
    """Returns ``sampler(sample) -> list of sub-GraphSamples`` covering the
    graph once per call.

    ``recluster=True`` (training regime) re-partitions on every call with a
    part count drawn uniformly from ``[num_parts-jitter, num_parts+jitter)``,
    matching the reference's per-graph-per-epoch METIS re-clustering with
    randomized cluster count (``train.py:284-293``). ``recluster=False``
    (eval regime / cheap mode) partitions each graph once at exactly
    ``num_parts`` and caches it — the reference's eval path re-clusters per
    epoch but always at the fixed ``num_parts_metis_eval``
    (``train.py:436-439``), so a cached fixed partition is equivalent up to
    cluster-visit order, which is reshuffled per call either way."""
    rng = random.Random(seed)
    part_cache: Dict[int, np.ndarray] = {}

    def sampler(sample: GraphSample) -> List[GraphSample]:
        g = sample.graph
        if recluster:
            lo = max(num_parts - jitter, 2)
            hi = max(num_parts + jitter, lo + 1)
            k = rng.randrange(lo, hi) if jitter > 0 else num_parts
            parts = partition_nodes(sample.src, sample.dst, g.n_nodes, k)
        else:
            if sample.idx not in part_cache:
                part_cache[sample.idx] = partition_nodes(
                    sample.src, sample.dst, g.n_nodes, num_parts
                )
            parts = part_cache[sample.idx]
        actual_parts = int(parts.max()) + 1 if len(parts) else 1
        cluster_ids = list(range(actual_parts))
        rng.shuffle(cluster_ids)

        # device features are canonical-order / device-numbered; bring back
        # to parser order so edge_ids/node_ids from induced_subgraph (parser
        # order) index them correctly
        pe_dev = np.asarray(sample.pe)
        if sample.node_map is not None:
            pe_full = pe_dev[sample.node_map]  # parser row i = device row map[i]
        else:
            pe_full = pe_dev
        e_full = extract_edge_values(g, sample.e_feat)
        y_full = extract_edge_values(g, sample.y)

        # shared padded bucket so every batch compiles to the same shapes
        n_batches = math.ceil(actual_parts / batch_size)
        pieces: List[GraphSample] = []
        raw: List[Tuple[np.ndarray, ...]] = []
        for b in range(n_batches):
            chosen = cluster_ids[b * batch_size : (b + 1) * batch_size]
            node_ids = np.nonzero(np.isin(parts, chosen))[0]
            raw.append(induced_subgraph(sample, node_ids))
        max_n = max(len(r[3]) for r in raw)
        max_e = max(len(r[2]) for r in raw)
        node_mult = _bucket(max_n, base=512)
        edge_mult = _bucket(max_e, base=1024)

        for sub_src, sub_dst, edge_ids, node_ids in raw:
            sub_g = build_graph(
                sub_src, sub_dst, len(node_ids),
                node_pad_multiple=node_mult, edge_pad_multiple=edge_mult,
            )
            pieces.append(
                GraphSample(
                    idx=sample.idx,
                    graph=sub_g,
                    e_feat=prepare_edge_features(sub_g, e_full[edge_ids]),
                    pe=jnp.asarray(
                        pad_features(pe_full[node_ids], sub_g.n_nodes_padded)
                    ),
                    y=prepare_edge_features(sub_g, y_full[edge_ids]),
                    prefix_length=sample.prefix_length[edge_ids],
                    read_length=sample.read_length[node_ids],
                    overlap_length=sample.overlap_length[edge_ids],
                    overlap_similarity=sample.overlap_similarity[edge_ids],
                    src=sub_src,
                    dst=sub_dst,
                )
            )
        return pieces

    return sampler


def _bucket(x: int, base: int = 512) -> int:
    """Round a max size up to a power-of-two-ish bucket multiple."""
    return max(base, ((x + base - 1) // base) * base)
