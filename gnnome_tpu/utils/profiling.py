"""Structured profiling (the reference imports torch.profiler but never
uses it, ``train.py:16``; its only timing is ad-hoc wall clock,
``utils.py:143-146``). Here: jax.profiler traces + a timer registry."""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up inside device traces."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class Timers:
    """Wall-clock stage timers (`timedelta_to_str`-style reporting,
    ``utils.py:143-146``, but aggregated)."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str) -> Iterator[None]:
        t0 = time.time()
        try:
            yield
        finally:
            self.totals[name] += time.time() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name}: {t:.2f}s total, {c}x, {t / max(c,1):.3f}s avg")
        return "\n".join(lines)


def timedelta_to_str(seconds: float) -> str:
    """``utils.timedelta_to_str`` parity (``utils.py:143-146``)."""
    hours, rem = divmod(int(seconds), 3600)
    minutes, secs = divmod(rem, 60)
    return f"{hours}h {minutes}m {secs}s"
