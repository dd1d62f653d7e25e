"""Masked normalization layers.

The reference uses ``nn.BatchNorm1d(..., track_running_stats=False)``
(``layers/gated_gcn_full.py:55-56``): statistics are recomputed from the
current batch in *both* train and eval mode, and there are no running
buffers. We reproduce that exactly, with one twist the reference never
needed: our node/edge sets are padded to static shapes, so the mean and
variance must be computed over *valid* rows only (mask-weighted moments).

For multi-device execution the moments can be reduced over a mesh axis so
sharded rows see identical statistics (``axis_name``).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def masked_moments(
    x: jax.Array,
    mask: jax.Array,
    axis_name: Optional[str] = None,
) -> tuple[jax.Array, jax.Array]:
    """Mean/variance over rows where ``mask`` is True; per-feature."""
    x = x.astype(jnp.float32)  # moments always in f32 (bf16-safe)
    m = mask.astype(jnp.float32)[:, None]
    count = jnp.sum(m)
    if axis_name is not None:
        count = jax.lax.psum(count, axis_name)
    count = jnp.maximum(count, 1.0)
    s = jnp.sum(x * m, axis=0)
    ss = jnp.sum(x * x * m, axis=0)
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
        ss = jax.lax.psum(ss, axis_name)
    mean = s / count
    var = ss / count - mean * mean
    return mean, jnp.maximum(var, 0.0)


def masked_batch_norm(
    x: jax.Array,
    mask: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    eps: float = 1e-5,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """BatchNorm1d with per-batch statistics (track_running_stats=False)."""
    mean, var = masked_moments(x, mask, axis_name=axis_name)
    inv = jax.lax.rsqrt(var + eps)
    out = (x.astype(jnp.float32) - mean) * inv * scale.astype(jnp.float32)
    return (out + bias.astype(jnp.float32)).astype(x.dtype)


def masked_layer_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    eps: float = 1e-5,
) -> jax.Array:
    """LayerNorm over the feature axis (the ``batch_norm=False`` branch at
    ``layers/gated_gcn_full.py:57-59``). Row-wise, so padding is harmless."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias
