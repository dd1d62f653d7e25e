"""Parameter initialization and small dense helpers.

Initialization follows the same scheme as ``torch.nn.Linear`` defaults
(Kaiming-uniform weights, uniform bias in ±1/sqrt(fan_in)) so that training
dynamics are comparable to the reference even though the frameworks differ.
"""
from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp


def init_linear(key: jax.Array, fan_in: int, fan_out: int, dtype=jnp.float32) -> Dict:
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -math.sqrt(3) * bound, math.sqrt(3) * bound)
    b = jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def linear(p: Dict, x: jax.Array) -> jax.Array:
    return jnp.dot(x, p["w"], preferred_element_type=x.dtype) + p["b"]


def init_norm(dim: int, dtype=jnp.float32) -> Dict:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}
