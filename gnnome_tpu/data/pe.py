"""Positional encodings: k-step PageRank (default) and random-walk PE.

Reference: ``utils.py:97-140``. The reference computes these with scipy
sparse matvecs at dataset-load time; here the k-step propagation is a pair
of ``np.bincount`` segment ops (host, cheap) with an equivalent jnp
implementation for on-device computation when graphs already live in HBM.

Transition semantics (``utils.py:122-138``): with A[i,j]=1 for edge i→j and
D = out-degrees, P = (D^-1 A)^T, iterate x ← α·P·x + (1-α)/n; each
iterate is one PE channel. α = 0.95, k = nb_pos_enc (16).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def pagerank_pe_np(
    src: np.ndarray, dst: np.ndarray, n: int, k: int, alpha: float = 0.95
) -> np.ndarray:
    out_deg = np.bincount(src, minlength=n).astype(np.float64)
    inv_out = np.where(out_deg > 1e-9, 1.0 / (out_deg + 1e-9), 0.0)
    x = np.full(n, 1.0 / n)
    cols = []
    for _ in range(k):
        # x[i] ← α Σ_{j→i} x[j]/outdeg(j) + (1-α)/n
        contrib = x[src] * inv_out[src]
        x = alpha * np.bincount(dst, weights=contrib, minlength=n) + (1.0 - alpha) / n
        # the reference appends after each update (utils.py:134-136)
        cols.append(x.astype(np.float32))
    return np.stack(cols, axis=-1)


def random_walk_pe_np(
    src: np.ndarray, dst: np.ndarray, n: int, k: int
) -> np.ndarray:
    """Random-walk diagonal PE (``utils.py:107-120``), kept for parity with
    the reference's unused 'RW' branch."""
    import scipy.sparse as sp

    a = sp.csr_matrix((np.ones(len(src)), (src, dst)), shape=(n, n))
    in_deg = np.maximum(np.bincount(dst, minlength=n), 1).astype(np.float64)
    rw = a @ sp.diags(1.0 / in_deg)
    m_power = rw.copy()
    cols = [m_power.diagonal().astype(np.float32)]
    for _ in range(k - 1):
        m_power = m_power @ rw
        cols.append(m_power.diagonal().astype(np.float32))
    return np.stack(cols, axis=-1)


def pagerank_pe_jnp(
    src: jax.Array, dst: jax.Array, edge_mask: jax.Array, n_pad: int, k: int,
    n_real: int, alpha: float = 0.95
) -> jax.Array:
    """On-device PageRank PE over a padded graph (same math as the numpy
    version; used when preprocessing runs on TPU)."""
    valid = edge_mask.astype(jnp.float32)
    out_deg = jax.ops.segment_sum(valid, src, num_segments=n_pad)
    inv_out = jnp.where(out_deg > 1e-9, 1.0 / (out_deg + 1e-9), 0.0)
    x = jnp.full((n_pad,), 1.0 / n_real, dtype=jnp.float32)

    def step(x, _):
        contrib = jnp.take(x * inv_out, src) * valid
        x = alpha * jax.ops.segment_sum(contrib, dst, num_segments=n_pad) + (1.0 - alpha) / n_real
        return x, x

    _, cols = jax.lax.scan(step, x, None, length=k)
    return jnp.transpose(cols)  # [n_pad, k]
