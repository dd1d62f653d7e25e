"""Independent dense (numpy) restatement of the reference GatedGCN math.

This is the numerical spec the TPU implementation is validated against:
a direct transcription of the equations in ``layers/gated_gcn_full.py``
(live path :99-157, restated by the UDFs :61-97) using dense adjacency
matrices and explicit loops — deliberately naive, structurally unrelated to
the JAX implementation, so agreement is meaningful.
"""
from __future__ import annotations

import numpy as np


def torch_like_batchnorm(x: np.ndarray, scale, bias, eps=1e-5) -> np.ndarray:
    # BatchNorm1d with track_running_stats=False: per-batch biased moments.
    mean = x.mean(axis=0)
    var = x.var(axis=0)  # biased, matches torch normalization path
    return (x - mean) / np.sqrt(var + eps) * scale + bias


def dense_gated_gcn_layer(p, src, dst, n, h, e, batch_norm=True, eps=1e-6):
    """One GatedGCN layer on a graph given as COO lists (no padding)."""

    def lin(name, x):
        return x @ p[name]["w"] + p[name]["b"]

    h_in, e_in = h.copy(), e.copy()
    a1h, a2h, a3h = lin("A1", h), lin("A2", h), lin("A3", h)
    b1h, b2h, b3e = lin("B1", h), lin("B2", h), lin("B3", e)

    # Edge gate e_ji = B1 h_src + B2 h_dst + B3 e  (gated_gcn_full.py:120-121)
    gate = b1h[src] + b2h[dst] + b3e
    if batch_norm:
        gate = torch_like_batchnorm(gate, p["norm_e"]["scale"], p["norm_e"]["bias"])
    else:
        mean = gate.mean(-1, keepdims=True)
        var = gate.var(-1, keepdims=True)
        gate = (gate - mean) / np.sqrt(var + 1e-5) * p["norm_e"]["scale"] + p["norm_e"]["bias"]
    e_new = np.maximum(gate, 0.0) + e_in
    sigma = 1.0 / (1.0 + np.exp(-e_new))

    d = h.shape[1]
    num = np.zeros((n, d))
    den = np.zeros((n, d))
    numb = np.zeros((n, d))
    denb = np.zeros((n, d))
    for k in range(len(src)):
        j, i = src[k], dst[k]
        # forward: dst accumulates σ·A2h[src]   (:128-130)
        num[i] += sigma[k] * a2h[j]
        den[i] += sigma[k]
        # backward (reverse graph): src accumulates σ·A3h[dst]  (:141-143)
        numb[j] += sigma[k] * a3h[i]
        denb[j] += sigma[k]

    h_fwd = num / (den + eps)
    h_bwd = numb / (denb + eps)

    h = a1h + h_fwd + h_bwd
    if batch_norm:
        h = torch_like_batchnorm(h, p["norm_h"]["scale"], p["norm_h"]["bias"])
    else:
        mean = h.mean(-1, keepdims=True)
        var = h.var(-1, keepdims=True)
        h = (h - mean) / np.sqrt(var + 1e-5) * p["norm_h"]["scale"] + p["norm_h"]["bias"]
    h = np.maximum(h, 0.0)
    h = h + h_in
    return h, e_new


def dense_model_forward(params, src, dst, n, e_feat, pe, batch_norm=True):
    """Full model spec (models/full_graph.py:22-29 + score_predictor.py)."""

    def lin(p, x):
        return x @ p["w"] + p["b"]

    h = lin(params["linear_pe"], pe)
    e = np.maximum(lin(params["linear1_edge"], e_feat), 0.0)
    e = lin(params["linear2_edge"], e)
    for lp in params["layers"]:
        h, e = dense_gated_gcn_layer(lp, src, dst, n, h, e, batch_norm)
    feat = np.concatenate([h[src], h[dst], e], axis=-1)
    hidden = np.maximum(lin(params["score1"], feat), 0.0)
    return lin(params["score2"], hidden)[:, 0]
