"""Graph partitioning: balanced edge-cut node partitions.

Fills the role METIS plays in the reference (via
``dgl.dataloading.ClusterGCNSampler``, ``train.py:291-293``): split a big
graph into ``num_parts`` clusters so that (a) cluster-induced subgraphs fit
in device memory for minibatch training, and (b) multi-chip sharding can
assign clusters to devices with small halo cuts.

Strategy: BFS locality ordering + contiguous chunking. Assembly graphs are
long, thin, nearly-linear overlap chains (reads ordered along the genome),
so a BFS order is an excellent locality order and the resulting edge cut
is near-optimal at a fraction of METIS's cost. A native C++ partitioner
(with label-propagation refinement) is used when built; this numpy
version is the fallback and spec.
"""
from __future__ import annotations

from collections import deque
import numpy as np


def bfs_order(src: np.ndarray, dst: np.ndarray, n: int) -> np.ndarray:
    """Node ordering by undirected BFS over all components."""
    # CSR over the undirected union of edges
    u = np.concatenate([src, dst])
    v = np.concatenate([dst, src])
    order_edges = np.argsort(u, kind="stable")
    u_sorted, v_sorted = u[order_edges], v[order_edges]
    offsets = np.searchsorted(u_sorted, np.arange(n + 1))

    visited = np.zeros(n, dtype=bool)
    order = np.empty(n, dtype=np.int64)
    pos = 0
    for root in range(n):
        if visited[root]:
            continue
        visited[root] = True
        q = deque([root])
        while q:
            x = q.popleft()
            order[pos] = x
            pos += 1
            for y in v_sorted[offsets[x] : offsets[x + 1]]:
                if not visited[y]:
                    visited[y] = True
                    q.append(y)
    return order


def partition_nodes(
    src: np.ndarray,
    dst: np.ndarray,
    n: int,
    num_parts: int,
    pair_aligned: bool = True,
) -> np.ndarray:
    """int32[n] partition assignment.

    ``pair_aligned`` keeps strand mates ``2i``/``2i+1`` in the same part
    (the ^1 pairing invariant) by partitioning on read ids.
    """
    from gnnome_tpu.data import native_bridge

    num_parts = max(1, min(num_parts, max(n, 1)))
    if not pair_aligned or n % 2 != 0:
        native = native_bridge.partition_graph(src, dst, n, num_parts)
        if native is not None:
            return native
        order = bfs_order(src, dst, n)
        parts = np.zeros(n, dtype=np.int32)
        chunk = (n + num_parts - 1) // num_parts
        for p in range(num_parts):
            parts[order[p * chunk : (p + 1) * chunk]] = p
        return parts

    # collapse node pairs to read ids, partition reads, expand back
    rsrc, rdst = src // 2, dst // 2
    n_reads = n // 2
    native = native_bridge.partition_graph(rsrc, rdst, n_reads, num_parts)
    if native is not None:
        read_parts = native
    else:
        order = bfs_order(rsrc, rdst, n_reads)
        read_parts = np.zeros(n_reads, dtype=np.int32)
        chunk = (n_reads + num_parts - 1) // num_parts
        for p in range(num_parts):
            read_parts[order[p * chunk : (p + 1) * chunk]] = p
    return np.repeat(read_parts, 2).astype(np.int32)


def edge_cut_fraction(parts: np.ndarray, src: np.ndarray, dst: np.ndarray) -> float:
    """Fraction of edges crossing partitions (quality metric)."""
    if len(src) == 0:
        return 0.0
    return float(np.mean(parts[src] != parts[dst]))


def locality_order_pairs(src: np.ndarray, dst: np.ndarray, n: int) -> np.ndarray:
    """old→new node id map that (a) preserves the ``2i``/``2i+1`` strand
    pairing and (b) numbers reads in undirected-BFS order.

    Parser node ids follow CSV order, which is uncorrelated with genome
    position — endpoint gathers then hit random HBM rows. After this
    reordering, |src − dst| is small for the chain-like majority of edges
    (DRAM-page-local gathers now; the banded-gather kernel later).
    """
    assert n % 2 == 0, "node pairing requires an even node count"
    rsrc, rdst = src // 2, dst // 2
    read_order = bfs_order(rsrc, rdst, n // 2)  # new position -> old read
    node_map = np.empty(n, dtype=np.int32)
    for new_r, old_r in enumerate(read_order):
        node_map[2 * old_r] = 2 * new_r
        node_map[2 * old_r + 1] = 2 * new_r + 1
    return node_map


def band_statistics(src: np.ndarray, dst: np.ndarray) -> dict:
    """|src − dst| distribution — how banded the graph is (diagnostic for
    the banded-gather kernel design)."""
    if len(src) == 0:
        return {"p50": 0, "p90": 0, "p99": 0, "max": 0}
    d = np.abs(src.astype(np.int64) - dst.astype(np.int64))
    return {
        "p50": int(np.percentile(d, 50)),
        "p90": int(np.percentile(d, 90)),
        "p99": int(np.percentile(d, 99)),
        "max": int(d.max()),
    }
