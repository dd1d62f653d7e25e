"""Capture a jax.profiler device trace of the bench training step.

Usage: python scripts/profile_step.py [outdir]  (env knobs as bench.py).
Writes a TensorBoard-format trace; summarize with trace_summary.py.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_r2"
    os.environ.setdefault("BENCH_ITERS", "3")
    import jax

    import bench

    # run the bench once to compile + warm, then re-enter with tracing on;
    # bench.main() itself loops iters times.
    with jax.profiler.trace(outdir):
        bench.main()


if __name__ == "__main__":
    main()
