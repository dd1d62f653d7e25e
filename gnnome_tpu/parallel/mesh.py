"""Device-mesh construction for multi-chip / multi-host execution.

The reference has no distributed support at all (SURVEY.md §2c); this is
net-new TPU design. Two mesh axes:

  * ``data``  — data parallelism over graphs (one graph per replica group,
                grads averaged);
  * ``graph`` — graph partition parallelism (the analog of sequence/context
                parallelism for this workload): nodes and edges of a single
                graph sharded across devices, collectives over ICI.

``jax.distributed.initialize()`` should be called once per host process
before building a multi-host mesh.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    data: Optional[int] = None,
    graph: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'graph') mesh over the available devices.

    Defaults: all devices on the graph axis (single-graph full-graph
    training is the primary regime).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None and graph is None:
        data, graph = 1, n
    elif data is None:
        data = n // graph
    elif graph is None:
        graph = n // data
    if data * graph != n:
        raise ValueError(f"mesh {data}x{graph} != {n} devices")
    arr = np.array(devices).reshape(data, graph)
    return Mesh(arr, axis_names=("data", "graph"))


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bootstrap (DCN). No-op when single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
