"""Segment (sparse aggregation) primitives — scatter-free, in both
directions of autodiff.

These are the TPU-native replacements for DGL's message-passing built-ins
(``fn.u_mul_e`` / ``fn.copy_e`` / ``fn.sum`` used at
``layers/gated_gcn_full.py:120-143`` in the reference): a gather, an
elementwise gate, and a segment-sum over a fixed sparsity pattern.

The central design rule: **XLA scatter never appears in the graph**, in
forward *or* backward. Scatter-add is the one op XLA lowers poorly on TPU
(catastrophically slow compiles and multi-GB temporaries — it OOMed the
chr19-scale backward pass). Every sparse op here is an explicit
gather/segment-sum pair with a custom VJP:

  * ``permute_rows``      — CSR sort; VJP = gather by the inverse permutation;
  * ``gather_by_endpoint``— ``x[index]`` per edge; VJP = sorted segment-sum
                            over the transpose CSR (the Pallas kernel);
  * ``segment_sum_csr``   — sorted segment-sum; VJP = gather by segment id.

Two execution backends for the segment reduction itself:
  * ``xla``    — ``jax.ops.segment_sum`` on pre-sorted data (CPU/tests);
  * ``pallas`` — the blocked one-hot-matmul MXU kernel in ``spmm_pallas.py``.
``auto`` picks pallas on TPU and xla elsewhere.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from gnnome_tpu.core.graph import CSR


@functools.cache
def default_backend() -> str:
    return "pallas" if jax.default_backend() == "tpu" else "xla"


# ---------------------------------------------------------------------------
# permutation with gather-only autodiff
# ---------------------------------------------------------------------------


@jax.custom_vjp
def permute_rows(x: jax.Array, perm: jax.Array, inv_perm: jax.Array) -> jax.Array:
    """``x[perm]`` whose VJP is ``g[inv_perm]`` (a gather, not a scatter)."""
    return jnp.take(x, perm, axis=0)


def _permute_fwd(x, perm, inv_perm):
    return jnp.take(x, perm, axis=0), inv_perm


def _permute_bwd(inv_perm, g):
    return jnp.take(g, inv_perm, axis=0), None, None


permute_rows.defvjp(_permute_fwd, _permute_bwd)


# ---------------------------------------------------------------------------
# sorted segment-sum (forward kernel; backward = gather)
# ---------------------------------------------------------------------------


def _sorted_segment_sum_raw(
    data_sorted: jax.Array, csr: CSR, num_segments: int, backend: str
) -> jax.Array:
    if backend == "xla":
        return jax.ops.segment_sum(
            data_sorted, csr.segment_ids, num_segments=num_segments,
            indices_are_sorted=True,
        )
    elif backend in ("pallas", "pallas_interpret"):
        from gnnome_tpu.ops.spmm_pallas import sorted_segment_sum_pallas

        return sorted_segment_sum_pallas(
            data_sorted, csr.segment_ids, csr.offsets, num_segments,
            interpret=(backend == "pallas_interpret"),
        )
    raise ValueError(f"unknown segment backend: {backend!r}")


def segment_sum_csr(
    edge_data: jax.Array,
    csr: CSR,
    num_segments: int,
    backend: Optional[str] = None,
) -> jax.Array:
    """Sum ``edge_data`` (original edge order) into its CSR's key nodes.

    ``edge_data``: float[E_pad, D]. Returns float[num_segments, D]. Padded
    edges carry ``segment_id == PAD_SEGMENT`` and drop out in both
    backends. Differentiable; the backward pass is gather-only.
    """
    backend = backend or default_backend()
    if csr.identity:
        data_sorted = edge_data  # canonical order IS this layout: no permute
    else:
        data_sorted = permute_rows(edge_data, csr.order, csr.inv_order)
    return _sorted_segment_sum_raw(data_sorted, csr, num_segments, backend)


# ---------------------------------------------------------------------------
# endpoint gather whose VJP is the transpose segment-sum
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gather_by_endpoint(
    values: jax.Array,
    index: jax.Array,
    csr_t: CSR,
    num_rows: int,
    backend: Optional[str] = None,
) -> jax.Array:
    """``values[index]`` per edge (original edge order).

    ``index`` must be the endpoint array whose CSR layout is ``csr_t``
    (e.g. ``index=graph.src`` with ``csr_t=graph.by_src``): the VJP
    w.r.t. ``values`` is then exactly a sorted segment-sum over ``csr_t``
    — executed by the same Pallas kernel as the forward aggregations,
    instead of an XLA scatter-add.
    """
    return jnp.take(values, index, axis=0)


def _gather_fwd(values, index, csr_t, num_rows, backend):
    return jnp.take(values, index, axis=0), csr_t


def _gather_bwd(num_rows, backend, csr_t, g):
    grad_values = segment_sum_csr(g, csr_t, num_rows, backend=backend)
    return grad_values, None, None


gather_by_endpoint.defvjp(_gather_fwd, _gather_bwd)


def gather_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Plain row gather (no autodiff customization)."""
    return jnp.take(table, idx, axis=0)


def sorted_segment_sum_xla(
    data_sorted: jax.Array, segment_ids_sorted: jax.Array, num_segments: int
) -> jax.Array:
    return jax.ops.segment_sum(
        data_sorted, segment_ids_sorted, num_segments=num_segments,
        indices_are_sorted=True,
    )


# ---------------------------------------------------------------------------
# fused gated aggregation
# ---------------------------------------------------------------------------


def gated_aggregate(
    values: jax.Array,
    gate: jax.Array,
    value_index: jax.Array,
    value_csr_t: CSR,
    csr: CSR,
    num_segments: int,
    backend: Optional[str] = None,
    eps: float = 1e-6,
) -> jax.Array:
    """Fused σ-weighted mean aggregation used by both GatedGCN directions.

    Computes, per key node ``v`` of ``csr``::

        out[v] = Σ_e gate[e] * values[value_index[e]] / (Σ_e gate[e] + eps)

    which is the pair of SpMMs + normalize at
    ``layers/gated_gcn_full.py:128-130`` (and ``:141-143`` for the reverse
    direction). The weighted sum and the normalizer share one segment-sum
    by concatenating along the feature axis — one kernel pass instead of
    two. ``value_csr_t`` is the CSR keyed by ``value_index`` (the
    *opposite* direction of ``csr``), used for the gather's scatter-free
    VJP.
    """
    vals = gather_by_endpoint(values, value_index, value_csr_t, values.shape[0], backend)
    stacked = jnp.concatenate([vals * gate, gate], axis=-1)
    summed = segment_sum_csr(stacked, csr, num_segments, backend=backend)
    d = values.shape[-1]
    return summed[:, :d] / (summed[:, d:] + eps)
