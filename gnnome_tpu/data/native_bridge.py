"""ctypes bridge to the native C++ tools in ``native/``.

The shared library ``libgnnome_native.so`` provides chromosome-scale
implementations of the pipeline's CPU-bound stages (the roles Raven and
seqrequester play for the reference, ``pipeline.py:140-143,177-181``):

  * ``simulate_reads``      — read simulator (seqrequester-equivalent)
  * ``build_overlap_graph`` — minimizer overlap + layout → CSV/GFA
  * ``partition_graph``     — balanced edge-cut partitioner (METIS role)

Build with ``make -C native`` (see ``native/Makefile``). All functions
degrade gracefully: callers check :func:`available` and fall back to the
Python reference implementations.
"""
from __future__ import annotations

import ctypes
import functools
import os
from typing import Optional

import numpy as np

_LIB_NAME = "libgnnome_native.so"


def _lib_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, "native", "build", _LIB_NAME)


@functools.cache
def _load() -> Optional[ctypes.CDLL]:
    path = os.environ.get("GNNOME_NATIVE_LIB", _lib_path())
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.gn_simulate_reads.restype = ctypes.c_longlong
    lib.gn_simulate_reads.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_double, ctypes.c_char_p,
        ctypes.c_longlong, ctypes.c_double,
    ]
    lib.gn_build_overlap_graph.restype = ctypes.c_int
    lib.gn_build_overlap_graph.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_double,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.gn_partition_graph.restype = ctypes.c_int
    lib.gn_partition_graph.argtypes = [
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_longlong, ctypes.c_longlong, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
    ]
    return lib


def available() -> bool:
    return _load() is not None and not os.environ.get("GNNOME_FORCE_PYTHON")


def simulate_reads(
    genome_path: str, out_path: str, coverage: float, distribution_path: str,
    seed: int, error_rate: float = 0.0,
) -> int:
    lib = _load()
    assert lib is not None
    n = lib.gn_simulate_reads(
        genome_path.encode(), out_path.encode(), coverage,
        distribution_path.encode(), seed, error_rate,
    )
    if n < 0:
        raise RuntimeError(f"native simulate_reads failed (code {n})")
    return int(n)


def build_overlap_graph(
    reads_path: str, csv_path: str, threads: int, identity: float,
    k: int, w: int, min_overlap: int, trim_min_cov: int = 0,
) -> None:
    """identity <= 0 disables the k-mer identity gate; trim_min_cov <= 0
    disables pile trimming (both = error-free legacy behavior)."""
    lib = _load()
    assert lib is not None
    rc = lib.gn_build_overlap_graph(
        reads_path.encode(), csv_path.encode(), threads, identity, k, w,
        min_overlap, trim_min_cov,
    )
    if rc != 0:
        raise RuntimeError(f"native build_overlap_graph failed (code {rc})")


def partition_graph(
    src: np.ndarray, dst: np.ndarray, n_nodes: int, n_parts: int
) -> Optional[np.ndarray]:
    """Balanced edge-cut node partition; None if the library is missing."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, dtype=np.int32)
    dst = np.ascontiguousarray(dst, dtype=np.int32)
    out = np.zeros(n_nodes, dtype=np.int32)
    rc = lib.gn_partition_graph(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        len(src), n_nodes, n_parts,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    if rc != 0:
        raise RuntimeError(f"native partition_graph failed (code {rc})")
    return out
