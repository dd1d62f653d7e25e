"""Array-based assembly-graph container for TPU execution.

This replaces the reference's DGL graph objects (``graph_parser.py:297-299``,
``graph_dataset.py:72``) with a static-shape, pure-array representation that
XLA can compile once and reuse: padded COO edge lists, dual CSR layouts
(sorted by destination for forward aggregation, by source for backward
aggregation on the reverse graph, cf. ``layers/gated_gcn_full.py:115``), and
explicit node/edge validity masks so padding never contaminates statistics.

Domain invariants preserved from the reference:
  * node pairing: read ``i`` yields forward-strand node ``2i`` and
    reverse-complement node ``2i+1``; ``node ^ 1`` flips strand
    (``inference.py:39,63``, ``algorithms.py:139``).
  * the graph is directed; message passing needs both the forward CSR and
    its transpose every layer (``layers/gated_gcn_full.py:119-143``).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import numpy as np
import jax.numpy as jnp

NODE_PAD_MULTIPLE = 256
# The Pallas segment-sum kernel streams edges in 1024-edge chunks.
EDGE_PAD_MULTIPLE = 1024
# Segment id assigned to padded edges: larger than any real node id so the
# one-hot segment-sum kernels drop their contribution automatically.
PAD_SEGMENT = np.int32(2**30)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CSR:
    """One directional layout of the edge set.

    ``order`` is a permutation of edge ids such that the keyed endpoint
    (dst for the forward layout, src for the backward layout) is
    non-decreasing; ``offsets[v]:offsets[v+1]`` indexes the sorted edge
    range keyed on node ``v``.
    """

    order: jax.Array  # int32[E_pad] permutation of edge ids
    offsets: jax.Array  # int32[N_pad + 1]
    segment_ids: jax.Array  # int32[E_pad] keyed endpoint in sorted order


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AssemblyGraph:
    """Padded, static-shape assembly graph.

    All arrays are device-ready; ``n_nodes``/``n_edges`` are the *real*
    (unpadded) counts and are static Python ints (jit-constant).
    """

    n_nodes: int = dataclasses.field(metadata=dict(static=True))
    n_edges: int = dataclasses.field(metadata=dict(static=True))

    src: jax.Array  # int32[E_pad]
    dst: jax.Array  # int32[E_pad]
    node_mask: jax.Array  # bool[N_pad]
    edge_mask: jax.Array  # bool[E_pad]

    by_dst: CSR  # forward aggregation layout (in-edges contiguous)
    by_src: CSR  # backward aggregation layout (out-edges contiguous)

    @property
    def n_nodes_padded(self) -> int:
        return self.node_mask.shape[0]

    @property
    def n_edges_padded(self) -> int:
        return self.edge_mask.shape[0]


def _build_csr(key: np.ndarray, edge_mask: np.ndarray, n_pad: int) -> CSR:
    """Sort edges by ``key`` (stable), padding keys sort last."""
    sort_key = np.where(edge_mask, key, PAD_SEGMENT)
    order = np.argsort(sort_key, kind="stable").astype(np.int32)
    sorted_ids = sort_key[order].astype(np.int32)
    # offsets[v] = number of edges with key < v (real edges only)
    real_keys = sort_key[order][edge_mask[order]]
    offsets = np.searchsorted(real_keys, np.arange(n_pad + 1)).astype(np.int32)
    return CSR(
        order=jnp.asarray(order),
        offsets=jnp.asarray(offsets),
        segment_ids=jnp.asarray(sorted_ids),
    )


def build_graph(
    src: np.ndarray,
    dst: np.ndarray,
    n_nodes: int,
    node_pad_multiple: int = NODE_PAD_MULTIPLE,
    edge_pad_multiple: int = EDGE_PAD_MULTIPLE,
) -> AssemblyGraph:
    """Build a padded :class:`AssemblyGraph` from COO edge arrays."""
    src = np.asarray(src, dtype=np.int32)
    dst = np.asarray(dst, dtype=np.int32)
    n_edges = int(src.shape[0])
    n_pad = _round_up(max(n_nodes, 1), node_pad_multiple)
    e_pad = _round_up(max(n_edges, 1), edge_pad_multiple)

    src_p = np.zeros(e_pad, dtype=np.int32)
    dst_p = np.zeros(e_pad, dtype=np.int32)
    src_p[:n_edges] = src
    dst_p[:n_edges] = dst

    node_mask = np.arange(n_pad) < n_nodes
    edge_mask = np.arange(e_pad) < n_edges

    by_dst = _build_csr(dst_p, edge_mask, n_pad)
    by_src = _build_csr(src_p, edge_mask, n_pad)

    return AssemblyGraph(
        n_nodes=n_nodes,
        n_edges=n_edges,
        src=jnp.asarray(src_p),
        dst=jnp.asarray(dst_p),
        node_mask=jnp.asarray(node_mask),
        edge_mask=jnp.asarray(edge_mask),
        by_dst=by_dst,
        by_src=by_src,
    )


def pad_features(
    arr: np.ndarray, padded_len: int, dtype=np.float32
) -> np.ndarray:
    """Zero-pad a [n, ...] feature array to [padded_len, ...]."""
    arr = np.asarray(arr, dtype=dtype)
    if arr.shape[0] == padded_len:
        return arr
    pad_width = [(0, padded_len - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad_width)


def degrees(graph: AssemblyGraph) -> tuple[jax.Array, jax.Array]:
    """(in_degree, out_degree) as float32[N_pad], zero on padding.

    Mirrors ``utils.py:102-103`` (in_deg/out_deg node features).
    """
    n_pad = graph.n_nodes_padded
    ones = graph.edge_mask.astype(jnp.float32)
    in_deg = jax.ops.segment_sum(ones, graph.dst, num_segments=n_pad)
    out_deg = jax.ops.segment_sum(ones, graph.src, num_segments=n_pad)
    # Padded edges carry src=dst=0; subtracting is unnecessary because the
    # mask already zeroed their contribution.
    return in_deg, out_deg
