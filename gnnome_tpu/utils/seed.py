"""Reproducibility helpers (reference: ``utils.set_seed``, ``utils.py:14-34``)."""
from __future__ import annotations

import random

import numpy as np


def set_seed(seed: int = 0) -> None:
    random.seed(seed)
    np.random.seed(seed)
    # JAX PRNG keys are explicit; seed them at the call sites with
    # jax.random.PRNGKey(seed). XLA itself is deterministic per-compile.
