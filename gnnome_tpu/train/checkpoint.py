"""Checkpointing with a resume path that is actually wired in.

The reference saves a full training checkpoint every epoch
(``train.py:28-58``) and best-model weights on validation improvement
(``train.py:525-527``) but never calls its ``load_checkpoint``
(``train.py:61-93``) — resume is dead code there. Here resume is a
first-class feature: :func:`load_checkpoint` restores params, optimizer
state, epoch, loss history, and the plateau-scheduler state.

Format: a single ``.npz`` of flattened pytree leaves (keyed by tree path)
plus a JSON sidecar of scalars; written atomically (tmp + rename) so an
interrupted save never corrupts the previous checkpoint.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {jax.tree_util.keystr(path): np.asarray(leaf) for path, leaf in flat}


def _unflatten(template: Any, arrays: Dict[str, np.ndarray]) -> Any:
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in flat:
        key = jax.tree_util.keystr(path)
        if key not in arrays:
            raise KeyError(f"checkpoint missing leaf {key}")
        arr = arrays[key]
        leaves.append(np.asarray(arr, dtype=np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(
    path: str,
    params: Any,
    opt_state: Any,
    epoch: int,
    scalars: Optional[Dict[str, Any]] = None,
) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arrays = {f"params{k}": v for k, v in _flatten(params).items()}
    arrays.update({f"opt{k}": v for k, v in _flatten(opt_state).items()})
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)
    meta = {"epoch": epoch, **(scalars or {})}
    with open(path + ".json", "w") as f:
        json.dump(meta, f)


def load_checkpoint(
    path: str, params_template: Any, opt_state_template: Any
) -> Tuple[Any, Any, int, Dict[str, Any]]:
    z = dict(np.load(path, allow_pickle=False))
    params = _unflatten(
        params_template,
        {k[len("params"):]: v for k, v in z.items() if k.startswith("params")},
    )
    opt_state = _unflatten(
        opt_state_template,
        {k[len("opt"):]: v for k, v in z.items() if k.startswith("opt")},
    )
    meta: Dict[str, Any] = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return params, opt_state, int(meta.get("epoch", -1)), meta


def save_params(path: str, params: Any) -> None:
    """Best-model weights only (reference: ``pretrained/model_<out>.pt``)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **_flatten(params))
    os.replace(tmp, path)


def load_params(path: str, params_template: Any) -> Any:
    z = dict(np.load(path, allow_pickle=False))
    return _unflatten(params_template, z)
