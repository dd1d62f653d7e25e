"""Edge-classification metrics.

Reference: ``utils.py:217-240``. Note the reference *swaps* the precision
and recall formulas (``utils.py:228,232``: recall=TP/(TP+FP),
precision=TP/(TP+FN)) — a documented bug (SURVEY.md §7). We compute the
standard definitions and additionally expose ``reference_compat=True`` to
reproduce the swapped numbers when comparing logs against the reference.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def confusion_counts(
    logits: jax.Array, labels: jax.Array, mask: Optional[jax.Array] = None
) -> Dict[str, jax.Array]:
    """TP/TN/FP/FN from logits (σ + round, as ``utils.py:217-223``)."""
    preds = jnp.round(jax.nn.sigmoid(logits))
    if mask is None:
        mask = jnp.ones_like(labels, dtype=bool)
    m = mask.astype(jnp.float32)
    tp = jnp.sum(m * (preds == 1) * (labels == 1))
    tn = jnp.sum(m * (preds == 0) * (labels == 0))
    fp = jnp.sum(m * (preds == 1) * (labels == 0))
    fn = jnp.sum(m * (preds == 0) * (labels == 1))
    return {"tp": tp, "tn": tn, "fp": fp, "fn": fn}


def classification_metrics(
    counts: Dict[str, jax.Array], reference_compat: bool = False
) -> Dict[str, float]:
    """Derived metrics from TP/TN/FP/FN, computed HOST-side (numpy).

    Runs outside jit by design: under the tunneled TPU runtime every
    device-scalar ``float()`` is a blocking RPC round-trip, and the jnp
    version of this arithmetic cost ~6 round-trips per graph — which
    dominated small-graph training epochs (~31 s/epoch at 46k edges).
    ``np.asarray`` here is at most one fetch per count; callers on the
    hot path pre-fetch all four counts in a single transfer
    (train/loop._epoch_pass)."""
    import numpy as np

    tp, tn, fp, fn = (
        float(np.asarray(counts[k])) for k in ("tp", "tn", "fp", "fn")
    )

    def safe_div(a, b):
        return a / b if b > 0 else 0.0

    precision = safe_div(tp, tp + fp)
    recall = safe_div(tp, tp + fn)
    if reference_compat:  # reproduce the swapped formulas (utils.py:226-234)
        precision, recall = recall, precision
    return {
        "accuracy": safe_div(tp + tn, tp + tn + fp + fn),
        "precision": precision,
        "recall": recall,
        "f1": safe_div(tp, tp + 0.5 * (fp + fn)),
        "fp_rate": safe_div(fp, fp + tn),  # train.py:262-269
        "fn_rate": safe_div(fn, fn + tp),
    }


def bce_with_logits(
    logits: jax.Array,
    labels: jax.Array,
    mask: jax.Array,
    pos_weight: jax.Array | float = 1.0,
) -> jax.Array:
    """Masked mean BCE-with-logits with positive-class weighting
    (``torch.nn.BCEWithLogitsLoss(pos_weight=...)``, train.py:210-211).

    torch semantics: loss = -[w_p · y · log σ(x) + (1-y) · log(1-σ(x))],
    mean over elements (the weight scales positive terms only, and the
    denominator is the raw count).
    """
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    per_edge = -(pos_weight * labels * log_p + (1.0 - labels) * log_not_p)
    m = mask.astype(logits.dtype)
    return jnp.sum(per_edge * m) / jnp.maximum(jnp.sum(m), 1.0)
