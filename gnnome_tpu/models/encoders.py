"""Standalone node/edge encoders.

Reference: ``layers/node_encoder.py:4-28`` and ``layers/edge_encoder.py:4-28``
— single-linear encoders that exist in the reference but are commented out
of the live model (``models/full_graph.py:14,16``; the live model uses
``linear_pe`` and a 2-layer edge MLP instead). Provided for API parity and
for model variants that encode raw node features.
"""
from __future__ import annotations

from typing import Dict

import jax

from gnnome_tpu.models.common import init_linear, linear


def init_node_encoder(key: jax.Array, in_features: int, out_features: int) -> Dict:
    return init_linear(key, in_features, out_features)


def node_encoder(params: Dict, x: jax.Array) -> jax.Array:
    return linear(params, x)


def init_edge_encoder(key: jax.Array, in_features: int, out_features: int) -> Dict:
    return init_linear(key, in_features, out_features)


def edge_encoder(params: Dict, e: jax.Array) -> jax.Array:
    return linear(params, e)
