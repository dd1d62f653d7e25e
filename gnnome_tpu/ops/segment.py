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
from gnnome_tpu.ops.banded import take_rows


@functools.cache
def default_backend() -> str:
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def _fusion_level() -> int:
    """Dispatch ceiling for the fused-kernel suite, from
    ``GNNOME_FUSION_LEVEL`` (default 3). 3 = everything (mega-fused fwd +
    fused bwd kernels); 2 = fused fwd, composed bwd; 1 = round-1 kernels
    only (σ-aggregate + gate-epilog, no banded-window fusions); useful for
    A/B benching and as a fallback switch on toolchain regressions."""
    import os

    try:
        return int(os.environ.get("GNNOME_FUSION_LEVEL", "3"))
    except ValueError:
        return 3


# ---------------------------------------------------------------------------
# permutation with gather-only autodiff
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def permute_rows(
    x: jax.Array,
    perm: jax.Array,
    inv_perm: jax.Array,
    perm_plan=None,
    inv_plan=None,
    backend: Optional[str] = None,
) -> jax.Array:
    """``x[perm]`` whose VJP is ``g[inv_perm]`` (a gather, not a scatter).

    Both directions route through the banded windowed-VMEM gather kernel
    (``ops/banded.py``) when the CSR carries covering plans (its
    ``order_plan``/``inv_plan``); ``None`` falls back to ``jnp.take``.
    """
    return take_rows(x, perm, perm_plan, backend)


def _permute_fwd(x, perm, inv_perm, perm_plan, inv_plan, backend):
    return take_rows(x, perm, perm_plan, backend), (inv_perm, inv_plan)


def _permute_bwd(backend, res, g):
    inv_perm, inv_plan = res
    return take_rows(g, inv_perm, inv_plan, backend), None, None, None, None


permute_rows.defvjp(_permute_fwd, _permute_bwd)


# ---------------------------------------------------------------------------
# sorted segment-sum (forward kernel; backward = gather)
# ---------------------------------------------------------------------------


def _sorted_segment_sum_raw(
    data_sorted: jax.Array, csr: CSR, num_segments: int, backend: str
) -> jax.Array:
    if backend == "xla":
        # accumulate in f32 even for bf16 inputs (the pallas path always
        # accumulates f32)
        return jax.ops.segment_sum(
            data_sorted.astype(jnp.float32), csr.segment_ids,
            num_segments=num_segments, indices_are_sorted=True,
        )
    elif backend in ("pallas", "pallas_interpret"):
        from gnnome_tpu.ops.spmm_pallas import sorted_segment_sum_pallas

        # the streaming plan is only valid for the layout it was computed
        # on — segment_ids for identity CSRs (core/graph._csr_from_sorted)
        stream_safe = csr.stream_safe if csr.identity else None
        stream_w = csr.stream_w if csr.identity else 0
        return sorted_segment_sum_pallas(
            data_sorted, csr.segment_ids, csr.offsets, csr.expand_plan,
            num_segments, interpret=(backend == "pallas_interpret"),
            stream_safe=stream_safe, stream_w=stream_w,
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
    backends. Differentiable on the permute+sorted path (backward is
    gather-only); the permutation-free unsorted branch below is a raw
    kernel — every call site is inside a custom-VJP primal or backward,
    so it is never autodiff-traversed (pallas_call would raise loudly if
    a new caller tried).
    """
    backend = backend or default_backend()
    if csr.identity:
        data_sorted = edge_data  # canonical order IS this layout: no permute
    elif (
        backend in ("pallas", "pallas_interpret")
        and _fusion_level() >= 2
        and getattr(csr, "canon_banded", False)
        and csr.canon_lo is not None
        and getattr(csr, "key_canonical", None) is not None
        and edge_data.shape[0] % 1024 == 0
    ):
        # permutation-free path: stream canonical order, one-hot on the
        # UNSORTED key — drops the permute (order-plan windows, ~3.7 ms
        # at 1M edges) from every transpose reduction over this CSR
        from gnnome_tpu.ops.spmm_pallas import segment_sum_unsorted_pallas

        return segment_sum_unsorted_pallas(
            edge_data, csr.key_canonical, csr.canon_lo, csr.canon_hi,
            num_segments, interpret=(backend == "pallas_interpret"),
            stream_safe=csr.stream_safe, stream_w=csr.stream_w,
        )
    else:
        data_sorted = permute_rows(
            edge_data, csr.order, csr.inv_order,
            csr.order_plan, csr.inv_plan, backend,
        )
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

    When ``csr_t`` carries a ``key_plan`` (built by ``build_graph`` on the
    PAD-clamped canonical key array — exactly these call sites' ``index``),
    the forward gather runs the banded windowed-VMEM kernel; CSRs built
    elsewhere default to ``key_plan=None`` and use ``jnp.take``.
    """
    return take_rows(values, index, csr_t.key_plan, backend)


def _gather_fwd(values, index, csr_t, num_rows, backend):
    proto = jnp.zeros((0,), values.dtype)
    return take_rows(values, index, csr_t.key_plan, backend), (csr_t, proto)


def _gather_bwd(num_rows, backend, res, g):
    csr_t, proto = res
    grad_values = segment_sum_csr(g, csr_t, num_rows, backend=backend)
    return grad_values.astype(proto.dtype), None, None


gather_by_endpoint.defvjp(_gather_fwd, _gather_bwd)


# ---------------------------------------------------------------------------
# fused gated aggregation
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused_sigma_aggregate(
    e_pre: jax.Array,  # [E, D] pre-σ edge state, original/canonical order
    vals: jax.Array,  # [E, D] gathered neighbor values, same order
    key: jax.Array,  # int32[E] key node per edge
    csr: CSR,
    num_segments: int,
    backend: Optional[str] = None,
) -> jax.Array:
    """[Σ σ(e_pre)·vals ‖ Σ σ(e_pre)] per key node of ``csr`` — the fused
    gate→scatter-sum pass. σ, σ·v, and the concat never touch HBM on the
    pallas path."""
    return _fused_forward(e_pre, vals, key, csr, num_segments, backend)


def _fused_forward(e_pre, vals, key, csr, num_segments, backend):
    backend = backend or default_backend()
    if backend in ("pallas", "pallas_interpret"):
        from gnnome_tpu.ops.spmm_pallas import fused_sigma_aggregate_pallas

        if csr.identity:
            e_s, v_s = e_pre, vals
        else:
            e_s = permute_rows(e_pre, csr.order, csr.inv_order,
                               csr.order_plan, csr.inv_plan, backend)
            v_s = permute_rows(vals, csr.order, csr.inv_order,
                               csr.order_plan, csr.inv_plan, backend)
        return fused_sigma_aggregate_pallas(
            e_s, v_s, csr.segment_ids, csr.offsets, num_segments,
            interpret=(backend == "pallas_interpret"),
        )
    sigma = jax.nn.sigmoid(e_pre.astype(jnp.float32))
    stacked = jnp.concatenate([sigma * vals.astype(jnp.float32), sigma], axis=-1)
    return segment_sum_csr(stacked, csr, num_segments, backend=backend)


def _fused_fwd(e_pre, vals, key, csr, num_segments, backend):
    out = _fused_forward(e_pre, vals, key, csr, num_segments, backend)
    return out, (e_pre, vals, key, csr.key_plan)


def _fused_bwd(num_segments, backend, res, g):
    e_pre, vals, key, key_plan = res
    d = e_pre.shape[-1]
    valid = key < num_segments
    # gather the cotangent in the compute dtype (see spmm_pallas._bwd);
    # one wide masked row-gather (banded kernel when planned) — PAD-keyed
    # rows come back zero on both paths
    gc = take_rows(g.astype(e_pre.dtype), key, key_plan, backend, masked=True)
    g1 = gc[:, :d].astype(jnp.float32)
    g2 = gc[:, d:].astype(jnp.float32)
    sig = jax.nn.sigmoid(e_pre.astype(jnp.float32))
    dsig = sig * (1.0 - sig)
    grad_e = (g1 * vals.astype(jnp.float32) + g2) * dsig
    grad_v = g1 * sig
    grad_e = jnp.where(valid[:, None], grad_e, 0.0).astype(e_pre.dtype)
    grad_v = jnp.where(valid[:, None], grad_v, 0.0).astype(vals.dtype)
    return grad_e, grad_v, None, None


_fused_sigma_aggregate.defvjp(_fused_fwd, _fused_bwd)


def gated_aggregate(
    values: jax.Array,
    gate_pre: jax.Array,
    value_index: jax.Array,
    value_csr_t: CSR,
    csr: CSR,
    num_segments: int,
    key: Optional[jax.Array] = None,
    backend: Optional[str] = None,
    eps: float = 1e-6,
) -> jax.Array:
    """Fused σ-weighted mean aggregation used by both GatedGCN directions.

    Computes, per key node ``v`` of ``csr``::

        out[v] = Σ_e σ(gate_pre[e]) · values[value_index[e]]
                 / (Σ_e σ(gate_pre[e]) + eps)

    which is the gate σ + pair of SpMMs + normalize at
    ``layers/gated_gcn_full.py:127-130`` (and ``:140-143`` for the reverse
    direction). σ, the gated messages, and the dual segment-sum run in one
    fused Pallas pass (``_fused_sigma_aggregate``); the backward is
    gather-only. ``value_csr_t`` is the CSR keyed by ``value_index`` (the
    opposite direction of ``csr``) for the endpoint gather's scatter-free
    VJP; ``key`` is the per-edge key-node array of ``csr`` (used by the
    fused op's backward gather).
    """
    if key is None:
        raise ValueError("gated_aggregate requires the per-edge key array")
    vals = gather_by_endpoint(values, value_index, value_csr_t, values.shape[0], backend)
    return gated_aggregate_pregathered(
        vals, gate_pre, csr, num_segments, key, backend=backend, eps=eps
    )


def gated_aggregate_pregathered(
    vals: jax.Array,
    gate_pre: jax.Array,
    csr: CSR,
    num_segments: int,
    key: jax.Array,
    backend: Optional[str] = None,
    eps: float = 1e-6,
) -> jax.Array:
    """``gated_aggregate`` when the neighbor values are already gathered
    per edge (e.g. by a paired wide-row endpoint gather)."""
    summed = _fused_sigma_aggregate(gate_pre, vals, key, csr, num_segments, backend)
    d = vals.shape[-1]
    return summed[:, :d] / (summed[:, d:] + eps)


# ---------------------------------------------------------------------------
# reverse aggregation without permutes: gather neighbors directly in the
# target layout's sorted order
# ---------------------------------------------------------------------------


def opposite_gather_supported(csr, backend: Optional[str] = None) -> bool:
    """True when ``gated_aggregate_opposite`` can run on ``csr``: pallas
    backend and covering band plans for the opposite-endpoint gather (fwd),
    the inverse permutation (bwd), and the sorted-key cotangent gather."""
    backend = backend or default_backend()
    return (
        _fusion_level() >= 2
        and backend in ("pallas", "pallas_interpret")
        and csr.opp_plan is not None and csr.opp_plan.ok
        and csr.inv_plan is not None and csr.inv_plan.ok
        and csr.expand_plan is not None and csr.expand_plan.ok
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gather_opposite_sorted(
    values: jax.Array,  # [N_pad, D] node table
    csr: CSR,  # target layout (by_src); carries opp_ids/opp_plan
    by_opp: CSR,  # layout keyed by the opposite endpoint (by_dst), for VJP
    num_rows: int = 0,
    backend: Optional[str] = None,
) -> jax.Array:
    """``values[opp]`` per edge directly in ``csr``'s SORTED order.

    For ``csr=by_src`` this yields ``a3h[dst]`` in src-sorted order in ONE
    banded gather — the old chain gathered in canonical order and then
    permuted (write + read + write of a full [E, D] table more). The VJP
    permutes the cotangent back to canonical (same cost the old chain's
    VJP paid) and segment-sums it over ``by_opp`` — scatter-free.
    """
    return take_rows(values, csr.opp_ids, csr.opp_plan, backend)


def _opp_gather_fwd(values, csr, by_opp, num_rows, backend):
    proto = jnp.zeros((0,), values.dtype)
    return take_rows(values, csr.opp_ids, csr.opp_plan, backend), (
        csr, by_opp, proto)


def _opp_gather_bwd(num_rows, backend, res, g):
    csr, by_opp, proto = res
    # sorted -> canonical is itself a banded gather (csr.inv_plan)
    g_canon = take_rows(g, csr.inv_order, csr.inv_plan, backend)
    grad_values = segment_sum_csr(g_canon, by_opp, num_rows, backend=backend)
    return grad_values.astype(proto.dtype), None, None


gather_opposite_sorted.defvjp(_opp_gather_fwd, _opp_gather_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_sigma_aggregate_sorted(e_s, v_s, csr, num_segments, backend):
    """``_fused_sigma_aggregate`` for inputs ALREADY in ``csr``'s sorted
    order: no permutes in the forward; the cotangent gather keys on the
    sorted ``segment_ids`` (expand_plan) instead of the canonical key."""
    return _fused_forward_sorted(e_s, v_s, csr, num_segments, backend)


def _fused_forward_sorted(e_s, v_s, csr, num_segments, backend):
    backend = backend or default_backend()
    if backend in ("pallas", "pallas_interpret"):
        from gnnome_tpu.ops.spmm_pallas import fused_sigma_aggregate_pallas

        return fused_sigma_aggregate_pallas(
            e_s, v_s, csr.segment_ids, csr.offsets, num_segments,
            interpret=(backend == "pallas_interpret"),
        )
    sigma = jax.nn.sigmoid(e_s.astype(jnp.float32))
    stacked = jnp.concatenate([sigma * v_s.astype(jnp.float32), sigma], axis=-1)
    return _sorted_segment_sum_raw(stacked, csr, num_segments, backend)


def _fused_sorted_fwd(e_s, v_s, csr, num_segments, backend):
    out = _fused_forward_sorted(e_s, v_s, csr, num_segments, backend)
    return out, (e_s, v_s, csr.segment_ids, csr.expand_plan)


def _fused_sorted_bwd(num_segments, backend, res, g):
    e_s, v_s, seg_ids, expand_plan = res
    d = e_s.shape[-1]
    valid = seg_ids < num_segments
    gc = take_rows(g.astype(e_s.dtype), seg_ids, expand_plan, backend,
                   masked=True)
    g1 = gc[:, :d].astype(jnp.float32)
    g2 = gc[:, d:].astype(jnp.float32)
    sig = jax.nn.sigmoid(e_s.astype(jnp.float32))
    dsig = sig * (1.0 - sig)
    grad_e = (g1 * v_s.astype(jnp.float32) + g2) * dsig
    grad_v = g1 * sig
    grad_e = jnp.where(valid[:, None], grad_e, 0.0).astype(e_s.dtype)
    grad_v = jnp.where(valid[:, None], grad_v, 0.0).astype(v_s.dtype)
    return grad_e, grad_v, None


_fused_sigma_aggregate_sorted.defvjp(_fused_sorted_fwd, _fused_sorted_bwd)


def opposite_megafused_supported(csr, d: int, itemsize: int,
                                 backend: Optional[str] = None,
                                 budget_bytes: int = 10_000_000) -> bool:
    """True when ``_fused_sigma_opposite`` (both gathers inside the kernel)
    can run: everything ``opposite_gather_supported`` needs, PLUS a
    covering order plan and both window sets within the VMEM budget."""
    if not opposite_gather_supported(csr, backend):
        return False
    if csr.order_plan is None or not csr.order_plan.ok:
        return False
    # double-buffered per-chunk window sets: 2 slots x (8/group) groups x
    # 2 windows x wr rows, per plan (grouped plans shrink the footprint)
    wbytes = (
        2 * (8 // csr.order_plan.group) * 2 * csr.order_plan.wr
        + 2 * (8 // csr.opp_plan.group) * 2 * csr.opp_plan.wr
    ) * max(d, 128) * itemsize
    return wbytes <= budget_bytes


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused_sigma_opposite(
    values: jax.Array,  # [N_pad, D] node table
    gate_pre: jax.Array,  # [E_pad, D] e_new, canonical order
    csr: CSR,  # target (by_src) layout
    by_opp: CSR,  # opposite (by_dst, identity) layout for the VJP
    num_segments: int,
    backend: Optional[str] = None,
):
    """[Σ σ·v ‖ Σ σ] per key node of ``csr`` where σ = sigmoid of the
    order-gathered gate and v = the opposite-endpoint-gathered values —
    BOTH selected from banded VMEM windows inside one Pallas pass, so the
    sorted [E, D] copies never exist in HBM."""
    return _fused_sigma_opposite_forward(
        values, gate_pre, csr, by_opp, num_segments, backend)


def _fused_sigma_opposite_forward(values, gate_pre, csr, by_opp,
                                  num_segments, backend):
    backend = backend or default_backend()
    if backend in ("pallas", "pallas_interpret"):
        from gnnome_tpu.ops.spmm_pallas import fused_sigma_opposite_pallas

        return fused_sigma_opposite_pallas(
            gate_pre, values, csr.segment_ids, csr.order, csr.opp_ids,
            csr.order_plan, csr.opp_plan, csr.offsets, num_segments,
            interpret=(backend == "pallas_interpret"),
        )
    # XLA composition (CPU/tests): same rows, op by op
    e_s = jnp.take(gate_pre, csr.order, axis=0)
    v_s = jnp.take(values, csr.opp_ids, axis=0)
    sigma = jax.nn.sigmoid(e_s.astype(jnp.float32))
    stacked = jnp.concatenate([sigma * v_s.astype(jnp.float32), sigma], axis=-1)
    return _sorted_segment_sum_raw(stacked, csr, num_segments, backend)


def _fused_opp_fwd(values, gate_pre, csr, by_opp, num_segments, backend):
    out = _fused_sigma_opposite_forward(values, gate_pre, csr, by_opp,
                                        num_segments, backend)
    return out, (values, gate_pre, csr, by_opp)


def _fused_opp_bwd(num_segments, backend, res, g):
    values, gate_pre, csr, by_opp = res
    d = gate_pre.shape[-1]
    pallas = backend in ("pallas", "pallas_interpret") or (
        backend is None and default_backend() == "pallas")
    if pallas and _fusion_level() >= 3 and d % 128 == 0 \
            and csr.order_plan is not None and csr.order_plan.ok \
            and csr.opp_plan is not None and csr.opp_plan.ok \
            and csr.expand_plan is not None and csr.expand_plan.ok:
        from gnnome_tpu.ops.spmm_pallas import opp_bwd_pallas

        # one pass: all three gathers in-kernel; PAD segments select no gc
        # row, so both grads are already zero on padding
        grad_e_s, grad_v_s = opp_bwd_pallas(
            gate_pre, values, g.astype(gate_pre.dtype),
            csr.segment_ids, csr.order, csr.opp_ids,
            csr.order_plan, csr.opp_plan, csr.expand_plan,
            (gate_pre.dtype, values.dtype),
            interpret=(backend == "pallas_interpret"),
        )
    else:
        # recompute both banded gathers (cheaper than [E, D] residuals)
        e_s = take_rows(gate_pre, csr.order, csr.order_plan, backend)
        v_s = take_rows(values, csr.opp_ids, csr.opp_plan, backend)
        valid = csr.segment_ids < num_segments
        gc = take_rows(g.astype(gate_pre.dtype), csr.segment_ids,
                       csr.expand_plan, backend, masked=True)
        g1 = gc[:, :d].astype(jnp.float32)
        g2 = gc[:, d:].astype(jnp.float32)
        sig = jax.nn.sigmoid(e_s.astype(jnp.float32))
        dsig = sig * (1.0 - sig)
        grad_e_s = (g1 * v_s.astype(jnp.float32) + g2) * dsig
        grad_v_s = g1 * sig
        grad_e_s = jnp.where(valid[:, None], grad_e_s, 0.0).astype(gate_pre.dtype)
        grad_v_s = jnp.where(valid[:, None], grad_v_s, 0.0).astype(values.dtype)
    # sorted -> canonical is a banded gather; then the transpose reduction
    d_gate_pre = take_rows(grad_e_s, csr.inv_order, csr.inv_plan, backend)
    grad_v_canon = take_rows(grad_v_s, csr.inv_order, csr.inv_plan, backend)
    d_values = segment_sum_csr(grad_v_canon, by_opp, values.shape[0],
                               backend=backend).astype(values.dtype)
    return d_values, d_gate_pre, None, None


_fused_sigma_opposite.defvjp(_fused_opp_fwd, _fused_opp_bwd)


def gated_aggregate_opposite(
    values: jax.Array,
    gate_pre: jax.Array,
    csr: CSR,
    by_opp: CSR,
    num_segments: int,
    backend: Optional[str] = None,
    eps: float = 1e-6,
) -> jax.Array:
    """``gated_aggregate`` with the neighbor gather fused into the target
    order: gathers ``values`` directly in ``csr``-sorted order (one banded
    pass instead of gather + permute) and runs the σ-aggregate kernel on
    sorted inputs. Numerically identical to ``gated_aggregate`` — the
    kernel sees the exact same rows. When both band plans fit the VMEM
    budget the WHOLE thing (both gathers + σ + dual segment-sum) runs as
    one Pallas pass (``_fused_sigma_opposite``)."""
    d = values.shape[-1]
    if opposite_megafused_supported(csr, d, values.dtype.itemsize, backend):
        summed = _fused_sigma_opposite(
            values, gate_pre, csr, by_opp, num_segments, backend)
        return summed[:, :d] / (summed[:, d:] + eps)
    v_s = gather_opposite_sorted(values, csr, by_opp, values.shape[0], backend)
    e_s = permute_rows(gate_pre, csr.order, csr.inv_order,
                       csr.order_plan, csr.inv_plan, backend)
    summed = _fused_sigma_aggregate_sorted(e_s, v_s, csr, num_segments, backend)
    return summed[:, :d] / (summed[:, d:] + eps)


# ---------------------------------------------------------------------------
# unsorted-key reverse aggregation: canonical streaming, no permutation
# ---------------------------------------------------------------------------


def reverse_unsorted_supported(graph, d: int, itemsize: int,
                               backend: Optional[str] = None,
                               budget_bytes: int = 5_500_000) -> bool:
    """True when ``gated_aggregate_reverse_unsorted`` can run: pallas
    backend, a banded canonical footprint for ``by_src`` (the static
    ``canon_banded`` flag computed by ``build_graph``), a covering dst
    plan (forward value windows), a covering ``by_src.key_plan`` (the
    backward's cotangent gather on canonical src ids), and value windows
    within the VMEM budget."""
    backend = backend or default_backend()
    csr = graph.by_src
    dplan = graph.by_dst.key_plan
    return (
        _fusion_level() >= 2
        and backend in ("pallas", "pallas_interpret")
        and getattr(csr, "canon_banded", False)
        and csr.canon_lo is not None
        and dplan is not None and dplan.ok
        and csr.key_plan is not None and csr.key_plan.ok
        and graph.n_edges_padded % 1024 == 0
        and 2 * (8 // dplan.group) * 2 * dplan.wr * max(d, 128) * itemsize
        <= budget_bytes
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _fused_sigma_reverse_unsorted(
    values: jax.Array,  # [N_pad, D] node table (A3·h)
    gate_pre: jax.Array,  # [E_pad, D] e_new, canonical order
    src_key: jax.Array,  # int32[E_pad] canonical src (PAD on padding)
    dst_ids: jax.Array,  # int32[E_pad] clamped canonical dst
    csr_src: CSR,  # by_src (carries canon_lo/hi + key_plan for the VJP)
    by_dst: CSR,  # identity layout (dst plan fwd, transpose reduction bwd)
    num_segments: int = 0,
    backend: Optional[str] = None,
):
    """[Σ σ(e_new)·values[dst] ‖ Σ σ(e_new)] keyed by the UNSORTED
    canonical src: the reverse GatedGCN aggregation with zero permutation
    work — e_new streams linearly, the sort and its order/inv window
    streams do not exist on this path (``fused_sigma_unsorted_pallas``).
    The VJP is likewise canonical-only: cotangent gather on the
    near-sorted src key plan, value gather on the dst plan, transpose
    reduction a SORTED segment-sum over ``by_dst``."""
    return _reverse_unsorted_forward(
        values, gate_pre, src_key, dst_ids, csr_src, by_dst,
        num_segments, backend)


def _reverse_unsorted_forward(values, gate_pre, src_key, dst_ids, csr_src,
                              by_dst, num_segments, backend):
    backend = backend or default_backend()
    if backend in ("pallas", "pallas_interpret"):
        from gnnome_tpu.ops.spmm_pallas import fused_sigma_unsorted_pallas

        return fused_sigma_unsorted_pallas(
            gate_pre, values, src_key, dst_ids, by_dst.key_plan,
            csr_src.canon_lo, csr_src.canon_hi, num_segments,
            interpret=(backend == "pallas_interpret"),
        )
    # XLA composition (CPU/tests): same math, unsorted segment-sum
    sigma = jax.nn.sigmoid(gate_pre.astype(jnp.float32))
    v = jnp.take(values, dst_ids, axis=0).astype(jnp.float32)
    stacked = jnp.concatenate([sigma * v, sigma], axis=-1)
    valid = src_key < num_segments
    return jax.ops.segment_sum(
        jnp.where(valid[:, None], stacked, 0.0),
        jnp.where(valid, src_key, 0),
        num_segments=num_segments,
    )


def _rev_unsorted_fwd(values, gate_pre, src_key, dst_ids, csr_src, by_dst,
                      num_segments, backend):
    out = _reverse_unsorted_forward(values, gate_pre, src_key, dst_ids,
                                    csr_src, by_dst, num_segments, backend)
    return out, (values, gate_pre, src_key, dst_ids, csr_src, by_dst)


def _rev_unsorted_bwd(num_segments, backend, res, g):
    values, gate_pre, src_key, dst_ids, csr_src, by_dst = res
    d = gate_pre.shape[-1]
    pallas = backend in ("pallas", "pallas_interpret") or (
        backend is None and default_backend() == "pallas")
    # VMEM guard: rev_bwd_pallas clamps its slot count to >= 2, so on
    # wide-band graphs 2x its per-slot window footprint (cotangent windows
    # are 2D wide) can exceed the ~5 MB budget even where the level-2 XLA
    # composition compiled fine — fall back rather than fail in Mosaic.
    fits = (
        csr_src.key_plan is not None and csr_src.key_plan.ok
        and by_dst.key_plan is not None and by_dst.key_plan.ok
        and 2 * (2 * (2 * csr_src.key_plan.wr + by_dst.key_plan.wr) * d * 2)
        <= 5_500_000
    )
    if pallas and _fusion_level() >= 3 and d % 128 == 0 and fits:
        # fused backward: both gathers (cotangent on near-sorted src ids,
        # value regather on sorted dst ids) + the σ′ chain in ONE pass —
        # the [E, 2D]/[E, D] gathered tables never exist in HBM
        # (spmm_pallas.rev_bwd_pallas)
        from gnnome_tpu.ops.spmm_pallas import rev_bwd_pallas

        d_gate, d_v_rows = rev_bwd_pallas(
            gate_pre, g.astype(gate_pre.dtype), values, src_key, dst_ids,
            csr_src.key_plan, by_dst.key_plan,
            interpret=(backend == "pallas_interpret"),
        )
        d_values = segment_sum_csr(d_v_rows, by_dst, values.shape[0],
                                   backend=backend).astype(values.dtype)
        return d_values, d_gate, None, None, None, None

    # XLA composition: everything in canonical order; PAD src keys select
    # zero gc rows so both per-edge grads vanish on padding without an
    # explicit mask
    gc = take_rows(g.astype(gate_pre.dtype), src_key, csr_src.key_plan,
                   backend, masked=True)
    v = take_rows(values, dst_ids, by_dst.key_plan, backend)
    g1 = gc[:, :d].astype(jnp.float32)
    g2 = gc[:, d:].astype(jnp.float32)
    sig = jax.nn.sigmoid(gate_pre.astype(jnp.float32))
    dsig = sig * (1.0 - sig)
    d_gate = ((g1 * v.astype(jnp.float32) + g2) * dsig).astype(gate_pre.dtype)
    d_v_rows = (g1 * sig).astype(values.dtype)
    # canonical IS dst-sorted: the transpose reduction needs no permute
    d_values = segment_sum_csr(d_v_rows, by_dst, values.shape[0],
                               backend=backend).astype(values.dtype)
    return d_values, d_gate, None, None, None, None


_fused_sigma_reverse_unsorted.defvjp(_rev_unsorted_fwd, _rev_unsorted_bwd)


def gated_aggregate_reverse_unsorted(
    values: jax.Array,
    gate_pre: jax.Array,
    src_key: jax.Array,
    dst_ids: jax.Array,
    graph,
    num_segments: int,
    backend: Optional[str] = None,
    eps: float = 1e-6,
) -> jax.Array:
    """Permutation-free reverse gated mean (see
    ``_fused_sigma_reverse_unsorted``)."""
    d = values.shape[-1]
    summed = _fused_sigma_reverse_unsorted(
        values, gate_pre, src_key, dst_ids, graph.by_src, graph.by_dst,
        num_segments, backend)
    return summed[:, :d] / (summed[:, d:] + eps)


# ---------------------------------------------------------------------------
# gather-fused gate epilog: the pregathered neighbor table never exists
# ---------------------------------------------------------------------------


def epilog_gather_supported(graph, d: int, itemsize: int,
                            backend: Optional[str] = None,
                            budget_bytes: int = 5_500_000) -> bool:
    """True when ``fused_gate_sigma_gather`` can run: pallas backend, a
    covering band plan over the canonical src ids, and window VMEM within
    budget (2 slots × 8/group window groups × 2 windows × wr × D)."""
    backend = backend or default_backend()
    plan = graph.by_src.key_plan
    return (
        _fusion_level() >= 2
        and backend in ("pallas", "pallas_interpret")
        and plan is not None and plan.ok
        and graph.n_edges_padded % 1024 == 0
        and 2 * (8 // plan.group) * 2 * plan.wr * max(d, 128) * itemsize
        <= budget_bytes
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_gate_sigma_gather(
    gate_raw: jax.Array,  # [E, D] pre-norm gate, canonical (CSR) order
    e_in: jax.Array,  # [E, D] residual edge state
    values: jax.Array,  # [N_pad, D] neighbor-value node table (A2·h)
    affine: jax.Array,  # [2, D] f32 (scale2, bias2): folded BN affine
    keys: tuple,  # (dst ids w/ PAD, clamped canonical src ids = graph.src)
    csr: CSR,  # identity (canonical) layout = by_dst
    by_src: CSR,  # transpose layout: clamped-src plan (fwd) + VJP segment-sum
    num_segments: int,
    backend: Optional[str] = None,
):
    """``fused_gate_sigma_aggregate`` with the neighbor gather fused into
    the kernel: ``vals = values[src]`` is selected from banded VMEM windows
    of the node table inside the epilog pass, so the [E, D] pregathered
    table is never written to (or read from) HBM — 2 fewer full-edge memory
    passes per forward execution and 0.5 GB less remat residency at 1M
    edges. VJP recomputes the gather (banded) and segment-sums ``d_vals``
    over ``by_src`` — the same scatter-free transpose reduction
    ``gather_by_endpoint`` paid. Reference math unchanged
    (``layers/gated_gcn_full.py:120-130``)."""
    return _fused_gate_gather_forward(
        gate_raw, e_in, values, affine, keys, csr, by_src, num_segments,
        backend)


def _fused_gate_gather_forward(gate_raw, e_in, values, affine, keys, csr,
                               by_src, num_segments, backend):
    backend = backend or default_backend()
    key, src_ids = keys
    if backend in ("pallas", "pallas_interpret"):
        from gnnome_tpu.ops.spmm_pallas import fused_gate_sigma_gather_pallas

        assert csr.identity, "gate fusion runs on the canonical layout only"
        return fused_gate_sigma_gather_pallas(
            gate_raw, e_in, values, affine.astype(jnp.float32),
            csr.segment_ids, src_ids, by_src.key_plan,
            csr.offsets, num_segments,
            interpret=(backend == "pallas_interpret"),
        )
    # XLA composition (CPU/tests): identical op order to the unfused path
    vals = jnp.take(values, src_ids, axis=0)
    pre = gate_raw.astype(jnp.float32) * affine[0] + affine[1]
    e_new = (jnp.maximum(pre, 0.0) + e_in.astype(jnp.float32)).astype(e_in.dtype)
    sigma = jax.nn.sigmoid(e_new.astype(jnp.float32))
    stacked = jnp.concatenate([sigma * vals.astype(jnp.float32), sigma], axis=-1)
    sums = segment_sum_csr(stacked, csr, num_segments, backend=backend)
    return sums, e_new


def _fused_gate_gather_fwd(gate_raw, e_in, values, affine, keys, csr, by_src,
                           num_segments, backend):
    sums, e_new = _fused_gate_gather_forward(
        gate_raw, e_in, values, affine, keys, csr, by_src, num_segments,
        backend)
    # e_new is saved instead of e_in: it is the layer's own output (an
    # alias, no extra residency) and the bwd needs σ(e_new) anyway
    return (sums, e_new), (gate_raw, e_new, values, affine, keys,
                           csr.key_plan, by_src)


def _fused_gate_gather_bwd(num_segments, backend, res, cot):
    gate_raw, e_new, values, affine, (key, src_ids), key_plan, by_src = res
    g_sums, g_enew = cot
    d = gate_raw.shape[-1]
    pallas = backend in ("pallas", "pallas_interpret") or (
        backend is None and default_backend() == "pallas")
    if pallas and _fusion_level() >= 3 and d % 128 == 0 \
            and key_plan is not None and key_plan.ok \
            and by_src.key_plan is not None and by_src.key_plan.ok:
        from gnnome_tpu.ops.spmm_pallas import epilog_bwd_pallas

        d_gate_raw, d_e_in, d_vals, daff = epilog_bwd_pallas(
            gate_raw, e_new, g_enew, g_sums.astype(gate_raw.dtype),
            values, affine.astype(jnp.float32), key, src_ids,
            key_plan, by_src.key_plan,
            interpret=(backend == "pallas_interpret"),
        )
        d_values = segment_sum_csr(d_vals, by_src, values.shape[0],
                                   backend=backend).astype(values.dtype)
        return (d_gate_raw, d_e_in.astype(e_new.dtype), d_values,
                daff.astype(affine.dtype), None, None, None)

    gc = take_rows(g_sums.astype(gate_raw.dtype), key, key_plan, backend,
                   masked=True)
    g1 = gc[:, :d].astype(jnp.float32)
    g2 = gc[:, d:].astype(jnp.float32)

    # recompute the banded gather (cheaper than keeping a [E, D] residual)
    vals = take_rows(values, src_ids, by_src.key_plan, backend)

    graw = gate_raw.astype(jnp.float32)
    pre = graw * affine[0] + affine[1]
    relu_mask = (pre > 0).astype(jnp.float32)
    sig = jax.nn.sigmoid(e_new.astype(jnp.float32))
    dsig = sig * (1.0 - sig)

    d_enew = g_enew.astype(jnp.float32) + (g1 * vals.astype(jnp.float32) + g2) * dsig
    d_pre = d_enew * relu_mask
    d_gate_raw = (d_pre * affine[0]).astype(gate_raw.dtype)
    d_e_in = d_enew.astype(e_new.dtype)
    d_vals = (g1 * sig).astype(values.dtype)
    d_values = segment_sum_csr(d_vals, by_src, values.shape[0],
                               backend=backend).astype(values.dtype)
    d_scale2 = jnp.sum(d_pre * graw, axis=0)
    d_bias2 = jnp.sum(d_pre, axis=0)
    d_affine = jnp.stack([d_scale2, d_bias2]).astype(affine.dtype)
    return d_gate_raw, d_e_in, d_values, d_affine, None, None, None


fused_gate_sigma_gather.defvjp(_fused_gate_gather_fwd, _fused_gate_gather_bwd)


# ---------------------------------------------------------------------------
# gate-front fusion: dual banded endpoint gather + add + BN moment sums
# ---------------------------------------------------------------------------


def gate_front_supported(graph, backend: Optional[str] = None) -> bool:
    """True when the fused gate-front kernel can run on ``graph``: pallas
    backend and covering band plans for both canonical endpoint arrays."""
    backend = backend or default_backend()
    sp = graph.by_src.key_plan
    dp = graph.by_dst.key_plan
    return (
        _fusion_level() >= 2
        and backend in ("pallas", "pallas_interpret")
        and sp is not None and sp.ok
        and dp is not None and dp.ok
        and graph.n_edges_padded % 1024 == 0
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_gate_front(
    b1h: jax.Array,  # [N_pad, D] src-side projections
    b2h: jax.Array,  # [N_pad, D] dst-side projections
    e: jax.Array,  # [E_pad, D] edge state (B3 projection runs in-kernel)
    w3: jax.Array,  # [D, D] B3 weight (edge dtype)
    bias3: jax.Array,  # [D] B3 bias
    src_ids: jax.Array,  # int32[E_pad] graph.src (pads clamped to 0)
    dst_ids: jax.Array,  # int32[E_pad] graph.dst
    csrs,  # (by_src, by_dst) — plans for the forward, layouts for the VJP
    n_pad: int = 0,
    n_edges: int = 0,
    backend: Optional[str] = None,
):
    """(gate, mom): the SDDMM gate ``b1h[src] + b2h[dst] + (e·W3 + b3)``
    plus its masked BatchNorm statistics ``[Σ gate ‖ Σ gate²]`` (f32[2, D],
    real edges only) in one fused Pallas pass
    (``spmm_pallas.gate_front_pallas``) — neither endpoint-gathered table,
    the projected b3e, nor a separate moments read of the gate ever touches
    HBM. VJP: ``d_b1h``/``d_b2h`` are sorted segment-sums of the total gate
    cotangent (scatter-free); the B3 grads are ordinary matmuls. Reference
    math: ``layers/gated_gcn_full.py:120-127`` + ``nn.BatchNorm1d``
    statistics."""
    return _gate_front_forward(b1h, b2h, e, w3, bias3, src_ids, dst_ids,
                               csrs, n_pad, n_edges, backend)


def _gate_front_forward(b1h, b2h, e, w3, bias3, src_ids, dst_ids, csrs,
                        n_pad, n_edges, backend):
    backend = backend or default_backend()
    by_src, by_dst = csrs
    if backend in ("pallas", "pallas_interpret"):
        from gnnome_tpu.ops.spmm_pallas import gate_front_pallas

        return gate_front_pallas(
            b1h, b2h, e, w3, bias3, src_ids, dst_ids,
            by_src.key_plan, by_dst.key_plan, n_edges,
            interpret=(backend == "pallas_interpret"),
        )
    # XLA composition (CPU/tests): identical op order to the unfused path
    b3e = jnp.dot(e, w3, preferred_element_type=e.dtype) + bias3
    gate = (
        jnp.take(b1h, src_ids, axis=0)
        + jnp.take(b2h, dst_ids, axis=0)
        + b3e
    )
    g32 = gate.astype(jnp.float32)
    m = (jnp.arange(gate.shape[0]) < n_edges).astype(jnp.float32)[:, None]
    mom = jnp.stack([jnp.sum(g32 * m, axis=0),
                     jnp.sum(g32 * g32 * m, axis=0)])
    return gate, mom


def _gate_front_fwd(b1h, b2h, e, w3, bias3, src_ids, dst_ids, csrs,
                    n_pad, n_edges, backend):
    gate, mom = _gate_front_forward(b1h, b2h, e, w3, bias3, src_ids,
                                    dst_ids, csrs, n_pad, n_edges, backend)
    protos = jax.tree_util.tree_map(
        lambda x: jnp.zeros((0,), x.dtype), (b1h, b2h, bias3)
    )
    return (gate, mom), (gate, e, w3, csrs, protos)


def _gate_front_bwd(n_pad, n_edges, backend, res, cot):
    gate, e, w3, (by_src, by_dst), (p1, p2, p3) = res
    d_gate, d_mom = cot
    # n_pad may be (n_src_rows, n_dst_rows) when the two endpoint tables
    # differ — the sharded layer gathers the non-keyed endpoint from the
    # combined [N_local + P·H] own‖halo table and the keyed one from the
    # [N_local] block (parallel/sharded.py)
    n_src, n_dst = n_pad if isinstance(n_pad, tuple) else (n_pad, n_pad)
    bk = backend or default_backend()
    e_pad = gate.shape[0]
    if (bk in ("pallas", "pallas_interpret")
            and getattr(by_dst, "identity", False)
            and getattr(by_src, "key_canonical", None) is not None):
        from gnnome_tpu.ops.spmm_pallas import (
            gate_front_bwd_stream_pallas,
            stream_supported,
        )

        if (stream_supported(n_dst, e_pad, getattr(by_dst, "stream_w", 0))
                and stream_supported(n_src, e_pad,
                                     getattr(by_src, "stream_w", 0))):
            # dual-key streaming backward: d_total built in-register from
            # the d_gate/gate streams, accumulated into BOTH endpoint
            # tables, staged out once for the B3 matmuls — replaces an
            # elementwise pass + two segment-sum launches
            d_b2h, d_b1h, d_total, d_bias32 = gate_front_bwd_stream_pallas(
                d_gate, gate, d_mom.astype(jnp.float32),
                by_dst.segment_ids, by_src.key_canonical,
                by_dst.stream_safe, by_src.stream_safe,
                by_dst.stream_w, by_src.stream_w,
                n_dst, n_src, n_edges, e.dtype,
                interpret=(bk == "pallas_interpret"),
            )
            d_e = jnp.dot(d_total, w3.T, preferred_element_type=e.dtype)
            d_w3 = jnp.dot(e.T, d_total,
                           preferred_element_type=jnp.float32).astype(w3.dtype)
            return (d_b1h.astype(p1.dtype), d_b2h.astype(p2.dtype), d_e,
                    d_w3, d_bias32.astype(p3.dtype), None, None, None)
    mask = (jnp.arange(e_pad) < n_edges)[:, None]
    # moments chain: d(Σg)/dg = 1, d(Σg²)/dg = 2g — on real edges only
    d_total32 = d_gate.astype(jnp.float32) + jnp.where(
        mask, d_mom[0] + 2.0 * gate.astype(jnp.float32) * d_mom[1], 0.0
    )
    d_total = d_total32.astype(e.dtype)
    d_b1h = segment_sum_csr(d_total, by_src, n_src, backend=backend)
    d_b2h = segment_sum_csr(d_total, by_dst, n_dst, backend=backend)
    # B3 chain: ordinary dense grads (the matmuls XLA autodiff would emit)
    d_e = jnp.dot(d_total, w3.T, preferred_element_type=e.dtype)
    # f32 accumulation over the 1M-edge contraction without upcasting the
    # [E, D] operands in HBM (preferred_element_type drives the MXU output)
    d_w3 = jnp.dot(e.T, d_total,
                   preferred_element_type=jnp.float32).astype(w3.dtype)
    d_bias3 = jnp.sum(d_total32, axis=0).astype(p3.dtype)
    return (d_b1h.astype(p1.dtype), d_b2h.astype(p2.dtype), d_e, d_w3,
            d_bias3, None, None, None)


fused_gate_front.defvjp(_gate_front_fwd, _gate_front_bwd)


# ---------------------------------------------------------------------------
# gate-epilog fusion: affine-BN + relu + residual + σ + dual segment-sum
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_gate_sigma_aggregate(
    gate_raw: jax.Array,  # [E, D] pre-norm gate, canonical (CSR) order
    e_in: jax.Array,  # [E, D] residual edge state
    vals: jax.Array,  # [E, D] gathered neighbor values
    affine: jax.Array,  # [2, D] f32 rows (scale2, bias2): folded BN affine
    key: jax.Array,  # int32[E] key node per edge (PAD_SEGMENT on padding)
    csr: CSR,  # must be the identity (canonical) layout
    num_segments: int,
    backend: Optional[str] = None,
):
    """(sums [N, 2D], e_new [E, D]) where
    ``e_new = relu(gate_raw·scale2 + bias2) + e_in`` and
    ``sums = [Σ σ(e_new)·vals ‖ Σ σ(e_new)]`` per key node.

    The whole per-edge gate epilog runs in one Pallas pass (BN-apply, relu,
    residual, σ, gating, both segment reductions) — no intermediate HBM
    round-trips. The BN *statistics* stay outside (their autodiff chain
    through ``affine`` is ordinary JAX).
    """
    return _fused_gate_forward(gate_raw, e_in, vals, affine, key, csr,
                               num_segments, backend)


def _fused_gate_forward(gate_raw, e_in, vals, affine, key, csr,
                        num_segments, backend):
    backend = backend or default_backend()
    if backend in ("pallas", "pallas_interpret"):
        from gnnome_tpu.ops.spmm_pallas import fused_gate_sigma_aggregate_pallas

        assert csr.identity, "gate fusion runs on the canonical layout only"
        return fused_gate_sigma_aggregate_pallas(
            gate_raw, e_in, vals, affine.astype(jnp.float32),
            csr.segment_ids, csr.offsets, num_segments,
            interpret=(backend == "pallas_interpret"),
        )
    # XLA composition (CPU/tests)
    pre = gate_raw.astype(jnp.float32) * affine[0] + affine[1]
    e_new = (jnp.maximum(pre, 0.0) + e_in.astype(jnp.float32)).astype(e_in.dtype)
    sigma = jax.nn.sigmoid(e_new.astype(jnp.float32))
    stacked = jnp.concatenate([sigma * vals.astype(jnp.float32), sigma], axis=-1)
    sums = segment_sum_csr(stacked, csr, num_segments, backend=backend)
    return sums, e_new


def _fused_gate_fwd(gate_raw, e_in, vals, affine, key, csr, num_segments, backend):
    sums, e_new = _fused_gate_forward(gate_raw, e_in, vals, affine, key, csr,
                                      num_segments, backend)
    # e_new is NOT saved — recomputed in bwd from (gate_raw, e_in, affine),
    # trading a cheap elementwise pass for 0.5GB of residuals at 1M edges
    return (sums, e_new), (gate_raw, e_in, vals, affine, key, csr.key_plan)


def _fused_gate_bwd(num_segments, backend, res, cot):
    gate_raw, e_in, vals, affine, key, key_plan = res
    g_sums, g_enew = cot
    d = gate_raw.shape[-1]
    valid = key < num_segments
    # gather the cotangents in the compute dtype: f32 gather outputs were
    # ~1GB temps at 1M edges (OOM) and the top per-op cost in the profile.
    # One wide masked row-gather (banded kernel when planned); PAD rows zero.
    gc = take_rows(g_sums.astype(gate_raw.dtype), key, key_plan, backend,
                   masked=True)
    g1 = gc[:, :d].astype(jnp.float32)
    g2 = gc[:, d:].astype(jnp.float32)

    graw = gate_raw.astype(jnp.float32)
    pre = graw * affine[0] + affine[1]
    relu_mask = (pre > 0).astype(jnp.float32)
    e_new = jnp.maximum(pre, 0.0) + e_in.astype(jnp.float32)
    sig = jax.nn.sigmoid(e_new)
    dsig = sig * (1.0 - sig)

    d_enew = g_enew.astype(jnp.float32) + (g1 * vals.astype(jnp.float32) + g2) * dsig
    d_pre = d_enew * relu_mask
    d_gate_raw = (d_pre * affine[0]).astype(gate_raw.dtype)
    d_e_in = d_enew.astype(e_in.dtype)
    d_vals = (g1 * sig).astype(vals.dtype)
    d_scale2 = jnp.sum(d_pre * graw, axis=0)
    d_bias2 = jnp.sum(d_pre, axis=0)
    d_affine = jnp.stack([d_scale2, d_bias2]).astype(affine.dtype)
    return d_gate_raw, d_e_in, d_vals, d_affine, None, None


fused_gate_sigma_aggregate.defvjp(_fused_gate_fwd, _fused_gate_bwd)
