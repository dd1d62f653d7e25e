"""Banded row-gather: ``table[ids]`` as windowed VMEM one-hot matmuls.

The round-1 profile (PERFORMANCE.md "1M-edge profile") showed ~20 XLA
gather instances per layer-step at ~12.5 ms each — random 512-byte-row HBM
reads running at ~45 GB/s against a 681 GB/s stream ceiling. Every one of
those gathers has *banded* index structure on BFS/locality-ordered
assembly graphs (the reference's graphs are near-linear read chains,
``graph_parser.py``): the ids of 128 consecutive edges fall into at most
a couple of narrow row ranges (the local chain neighborhood, plus at most
a repeat-tangle cluster).

This module exploits that: per 128-edge subrow, DMA *two* fixed-width row
windows of the table HBM→VMEM (contiguous streams, full bandwidth) and
select rows on the MXU with a one-hot matmul — the same dense-hardware
answer as the segment-sum kernel (``spmm_pallas.py``), applied to the
gather side. Window placements are precomputed on the host per ids array
(`plan_windows`, cut each subrow's sorted ids at the largest gap); graphs
whose ids don't fit two windows anywhere fall back to ``jnp.take`` via a
static flag, so the kernel never silently drops a row.

Semantics: ``banded_take(table, ids, plan) == jnp.take(table, ids, 0)``
for every id the plan covers (the planner guarantees all ids < n_rows);
ids ≥ n_rows (e.g. ``PAD_SEGMENT`` on padded edges) produce zero rows —
exactly the ``where(valid, take(safe), 0)`` contract the segment VJPs use.
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUBROWS_PER_CHUNK = 8
CHUNK = SUBROWS_PER_CHUNK * LANE  # 1024 ids per grid step


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BandPlan:
    """Per-group dual-window placement for one ids array.

    ``w0``: int32[S, 2] window starts (8-row aligned, ``w0[:,1] >=
    w0[:,0] + wr`` so the windows never overlap — a doubled one-hot match
    would double-count a row). ``wr``: static window width (rows).
    ``group``: static; each window pair serves ``group`` consecutive
    128-id subrows (``group·128`` ids) — adjacent subrows on
    locality-ordered assembly graphs share nearly identical windows, so
    grouping cuts the window-stream HBM traffic by up to ``group·wr_1/wr_g``
    and the DMA count by ``group`` (the round-2 "window reuse" lever).
    ``ok``: static; False means the planner could not cover every id and
    callers must use ``jnp.take``.
    """

    ok: bool = dataclasses.field(metadata=dict(static=True))
    wr: int = dataclasses.field(metadata=dict(static=True))
    w0: jax.Array  # int32[S, 2]
    group: int = dataclasses.field(default=1, metadata=dict(static=True))


def _fallback_plan() -> BandPlan:
    return BandPlan(ok=False, wr=0, w0=jnp.zeros((0, 2), jnp.int32), group=1)


# Candidate window widths. NEGATIVE RESULT (round 2, measured at 1M
# edges on v5e): a finer multiple-of-64 ladder (64, 192, 320, 448, ...)
# cuts planned window bytes ~12% but runs 6% SLOWER end-to-end (1712 vs
# 1614 ms/step) — sub-128-row DMAs and non-128-multiple contraction dims
# in the selector matmuls cost more than the bytes saved. Keep the
# power-of-two ladder; the MXU contracts over wr in 128-row steps and
# the DMA engine prefers >=64 KB streams.
DEFAULT_WIDTHS = (128, 256, 512)

# Window-width-aware plan cost model (round 5). A (group, wr) plan's
# per-id time has two terms:
#   bytes: the window pair is DMA'd once per group·LANE ids
#          → t_bw ∝ 2·wr·D·itemsize / (group·LANE·BW)
#   MXU:   the selector matmuls run per subrow REGARDLESS of group
#          (2 windows × a [wr, LANE]ᵀ@[wr, D] dot) → t_mxu ∝ 4·wr·D / F
# Normalizing by the bytes term's coefficient, cost ∝ wr·(1/group + κ)
# with κ = (4/F)·(LANE·BW)/(2·itemsize). CALIBRATED on v5e at 1M edges
# (scripts/calibrate_plan_cost.py, runs/plan_calibration.log): forced
# (group, wr) plans on the fused epilog and the plain banded take, fit
# t = a + b·(wr/group) + c·wr →
#   epilog: b=1.216 ms per (128-row window / group), c=0.262 ms per
#           128 rows of width → κ = 0.22
#   take:   b=1.238, c=0.232 → κ = 0.19
# κ = 0.2 rank-orders ALL seven measured (group, wr) points correctly
# on both ops (e.g. take: (4,128) 1.03 < (8,256) 1.43 < (2,128) 1.59 <
# (4,256) 1.99 < (1,128) 2.48 < (2,256) 2.55 < (1,256) 3.50 ms). The
# bytes-only model (round 2-4) mis-ranks the wide tail: it strictly
# preferred (8,512) over (1,128) (half the window bytes) though the
# 512-row windows cost 4× the selector-MXU work — measured slower.
# Override with GNNOME_PLAN_MXU_WEIGHT (0 restores the bytes-only
# ranking).
_PLAN_MXU_WEIGHT_DEFAULT = 0.2


def plan_mxu_weight() -> float:
    raw = os.environ.get("GNNOME_PLAN_MXU_WEIGHT")
    if raw is None:
        return _PLAN_MXU_WEIGHT_DEFAULT
    try:
        return max(float(raw), 0.0)
    except ValueError:
        return _PLAN_MXU_WEIGHT_DEFAULT


def plan_cost(wr: int, group: int) -> float:
    """Relative per-id time of a covering (group, wr) plan (see the κ
    note above): window-stream HBM bytes ∝ wr/group plus selector-matmul
    MXU flops ∝ wr."""
    return wr * (1.0 / group + plan_mxu_weight())


def plan_windows(
    ids: np.ndarray, n_rows: int, widths=DEFAULT_WIDTHS, group: int = 1
) -> BandPlan:
    """Host-side planner: place two ``wr``-wide windows per ``group·128``-id
    row group.

    Each group's valid ids (< n_rows) are split at the largest gap; the
    two resulting clusters get one window each (merged into adjacent
    disjoint windows when one suffices). The smallest width in ``widths``
    that covers every group wins; if none does, the plan is marked
    ``ok=False`` and callers fall back to ``jnp.take``.
    """
    assert group in (1, 2, 4, 8), group  # must divide the 8-subrow chunk
    w = group * LANE
    ids = np.asarray(ids, dtype=np.int64)
    assert ids.ndim == 1 and ids.shape[0] % w == 0
    s = ids.shape[0] // w
    ids2 = ids.reshape(s, w)
    valid = (ids2 >= 0) & (ids2 < n_rows)
    # sort each group with invalid ids pushed to +inf
    big = np.int64(1) << 40
    rows = np.sort(np.where(valid, ids2, big), axis=1)
    nval = valid.sum(axis=1)
    any_valid = nval > 0
    # largest internal gap between consecutive valid ids
    gaps = np.diff(rows, axis=1)
    gaps[rows[:, 1:] >= big] = -1  # ignore gaps into the invalid tail
    cut = np.argmax(gaps, axis=1)  # cluster A = rows[: cut+1], B = rows[cut+1:]
    idx = np.arange(s)
    lo_a = np.where(any_valid, rows[:, 0], 0)
    lo_b = rows[idx, np.minimum(cut + 1, w - 1)]
    single = (nval <= 1) | (gaps[idx, cut] <= 0)

    for wr in widths:
        if 2 * wr > n_rows:
            continue
        # A anchored at its cluster start; B at the second cluster (or
        # right after A for single-cluster groups, covering a contiguous
        # 2·wr span). Clamps keep both windows in-bounds AND disjoint
        # (w0b >= w0a + wr); the coverage check below is the safety net
        # for any group the heuristic placement cannot cover.
        w0a = np.clip((lo_a // 8) * 8, 0, n_rows - 2 * wr)
        lo_b_eff = np.where(single, w0a + wr, lo_b)
        w0b = np.clip((lo_b_eff // 8) * 8, w0a + wr, n_rows - wr)
        cov_a = (ids2 >= w0a[:, None]) & (ids2 < (w0a + wr)[:, None])
        cov_b = (ids2 >= w0b[:, None]) & (ids2 < (w0b + wr)[:, None])
        if bool(np.all(cov_a | cov_b | ~valid)):
            w0 = np.stack([w0a, w0b], axis=1).astype(np.int32)
            return BandPlan(ok=True, wr=int(wr), w0=jnp.asarray(w0),
                            group=group)
    return _fallback_plan()


def plan_windows_auto(
    ids: np.ndarray,
    n_rows: int,
    groups=(8, 4, 2, 1),
    widths=DEFAULT_WIDTHS,
) -> BandPlan:
    """Pick the cheapest covering (group, wr) plan for ``ids``.

    Cost: the calibrated time model ``plan_cost`` — window-stream HBM
    bytes per id (∝ ``wr/group``; each group pair is DMA'd once and
    serves ``group·128`` ids) PLUS the selector-matmul MXU term
    (∝ ``wr``, paid per subrow regardless of group). Ties break toward
    narrower windows, then larger groups (fewer, longer DMA streams). On
    chain-like assembly graphs a whole 1024-edge chunk usually fits two
    128-row windows (group=8), cutting window traffic 8× vs the
    per-subrow plan; on high-span graphs where only wider windows cover
    large groups, the MXU term stops the picker from trading a halving
    of bytes for a doubling of selector flops.
    """
    ids = np.asarray(ids)
    best = None
    best_cost = None
    for group in groups:
        if ids.shape[0] % (group * LANE) != 0:
            continue
        p = plan_windows(ids, n_rows, widths=widths, group=group)
        if p.ok:
            cost = (plan_cost(p.wr, group), p.wr, -group)
            if best is None or cost < best_cost:
                best, best_cost = p, cost
    return best if best is not None else _fallback_plan()


def _take_kernel(
    w0_ref,  # SMEM int32[G * 2] (scalar prefetch; flat — a 2-wide minor
    #          dim would be lane-padded 64x in SMEM by the Mosaic tiler)
    ids_ref,  # VMEM int32[SUBROWS_PER_CHUNK, LANE] block
    table_hbm,  # ANY [R, D]
    out_ref,  # VMEM [CHUNK, D] block
    win_buf,  # VMEM [nslots, 2, wr, D] scratch (revolving group slots)
    sems,  # DMA sems [nslots, 2]
    *,
    wr: int,
    out_dim: int,
    total_groups: int,
    nslots: int,
    group: int,
):
    # Revolving-slot pipeline at GROUP granularity: global group gg (one
    # window pair per ``group`` consecutive subrows) uses slot gg % nslots,
    # so nslots window-pair DMAs stay in flight across chunk boundaries.
    # group divides the 8-subrow chunk, so wait/refill points fall on
    # static positions of the unrolled subrow loop. (The ids block is
    # fixed at 8 subrows — the Mosaic block-shape divisibility rule —
    # while VMEM scratch scales with nslots, not the chunk.)
    c = pl.program_id(0)
    gpc = SUBROWS_PER_CHUNK // group  # groups per chunk

    def window_dma(slot, gg, wi):
        start = pl.multiple_of(w0_ref[2 * gg + wi], 8)
        return pltpu.make_async_copy(
            table_hbm.at[pl.ds(start, wr), :],
            win_buf.at[slot, wi],
            sems.at[slot, wi],
        )

    @pl.when(c == 0)
    def _():
        for g0 in range(min(nslots, total_groups)):
            for wi in range(2):
                window_dma(g0 % nslots, g0, wi).start()

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (wr, 1), 0)
    for r in range(SUBROWS_PER_CHUNK):
        gg = c * gpc + r // group
        slot = gg % nslots
        if r % group == 0:  # first subrow served by this window pair
            for wi in range(2):
                window_dma(slot, gg, wi).wait()
        ids_row = ids_ref[r : r + 1, :]  # [1, LANE]
        acc = jnp.zeros((LANE, out_dim), jnp.float32)
        # one selector matmul per window; the planner keeps the windows
        # disjoint, so each id matches at most one one-hot row overall
        # (an overlap would double-count the row).
        for wi in range(2):
            base = w0_ref[2 * gg + wi]
            onehot = (row_iota + base == ids_row)  # [wr, LANE]
            acc = acc + _select_matmul(
                onehot.astype(jnp.bfloat16), win_buf[slot, wi]
            )
        out_ref[r * LANE : (r + 1) * LANE, :] = acc.astype(out_ref.dtype)

        if r % group == group - 1:
            # slot gg%nslots is free once the loads above retired (VMEM
            # loads are synchronous); refill with group gg+nslots' windows
            @pl.when(gg + nslots < total_groups)
            def _():
                for wi in range(2):
                    window_dma(slot, gg + nslots, wi).start()


def _select_matmul(onehot, window):
    """rows[LANE, D] = onehotᵀ @ window in f32, exact for a 0/1 selector.

    bf16 windows: a single MXU pass (1.0·x is exact). f32 windows: 3-term
    bf16 split, exact to ~2⁻⁴⁸ (each partial product is exact; only the
    final f32 accumulation of hi+mid+lo can round the last bit).
    """
    dims = (((0,), (0,)), ((), ()))
    if window.dtype == jnp.bfloat16:
        return jax.lax.dot_general(
            onehot, window, dims, preferred_element_type=jnp.float32
        )
    hi = window.astype(jnp.bfloat16)
    rem = window - hi.astype(jnp.float32)
    mid = rem.astype(jnp.bfloat16)
    lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = jnp.zeros((onehot.shape[1], window.shape[-1]), jnp.float32)
    for part in (hi, mid, lo):
        acc = acc + jax.lax.dot_general(
            onehot, part, dims, preferred_element_type=jnp.float32
        )
    return acc


def banded_take_pallas(
    table: jax.Array,  # [R, D]
    ids: jax.Array,  # int32[E] (E % 1024 == 0)
    plan: BandPlan,
    interpret: bool = False,
) -> jax.Array:
    """``table[ids]`` with zero rows for out-of-plan ids (see module doc).

    Not differentiable on purpose: every call site lives inside a
    ``custom_vjp`` whose backward is itself scatter-free.
    """
    r_rows, d = table.shape
    e = ids.shape[0]
    assert e % CHUNK == 0, f"ids length {e} not a multiple of {CHUNK}"
    assert plan.ok and plan.w0.shape[0] * LANE * plan.group == e
    if d % LANE != 0:
        d_pad = ((d + LANE - 1) // LANE) * LANE
        out = banded_take_pallas(
            jnp.pad(table, ((0, 0), (0, d_pad - d))), ids, plan, interpret
        )
        return out[:, :d]
    # Revolving window slots: scratch = nslots x 2 windows x wr x d, capped
    # at ~4.5 MB VMEM (the chunk stays fixed at 8 subrows — Mosaic block
    # divisibility — so only the DMA pipeline depth adapts to the budget).
    per_slot = 2 * plan.wr * d * table.dtype.itemsize
    nslots = int(max(2, min(8, 4_500_000 // per_slot)))
    total_groups = e // (LANE * plan.group)
    chunk = SUBROWS_PER_CHUNK * LANE
    nchunks = e // chunk
    ids2 = ids.reshape(e // LANE, LANE)

    kernel = functools.partial(
        _take_kernel, wr=plan.wr, out_dim=d, total_groups=total_groups,
        nslots=nslots, group=plan.group,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec(
                (SUBROWS_PER_CHUNK, LANE), lambda c, *_: (c, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # table stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (chunk, d), lambda c, *_: (c, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((nslots, 2, plan.wr, d), table.dtype),
            pltpu.SemaphoreType.DMA((nslots, 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e, d), table.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            # window DMAs dominate; flops = the one-hot selector matmuls
            flops=2 * e * 2 * plan.wr * d,
            bytes_accessed=(e // (LANE * plan.group)) * 2 * plan.wr * d
            * table.dtype.itemsize
            + e * 4 + e * d * table.dtype.itemsize,
            transcendentals=0,
        ),
    )(plan.w0.reshape(-1), ids2, table)


def take_rows(
    table: jax.Array,
    ids: jax.Array,
    plan: Optional[BandPlan],
    backend: Optional[str] = None,
    masked: bool = False,
) -> jax.Array:
    """``jnp.take(table, ids, 0)`` routed through the banded kernel when a
    covering plan exists and the backend is pallas.

    ``masked=True``: out-of-range ids (``PAD_SEGMENT``) yield zero rows —
    free on the banded path (no one-hot match), explicit select on the
    fallback. ``masked=False``: the caller guarantees all ids are valid.
    """
    from gnnome_tpu.ops.segment import default_backend

    backend = backend or default_backend()
    if (
        plan is not None
        and plan.ok
        and backend in ("pallas", "pallas_interpret")
        and ids.shape[0] % CHUNK == 0
    ):
        return banded_take_pallas(
            table, ids, plan, interpret=(backend == "pallas_interpret")
        )
    if masked:
        valid = ids < table.shape[0]
        safe = jnp.where(valid, ids, 0)
        return jnp.where(valid[:, None], jnp.take(table, safe, axis=0), 0)
    return jnp.take(table, ids, axis=0)
