"""Summarize a jax.profiler TensorBoard trace: top device ops by total time.

Usage: python scripts/trace_summary.py /tmp/trace_r2 [top_n]
Groups XLA/Pallas op instances by a normalized name (fusion.123 -> fusion,
pallas kernel names kept) and prints total/avg duration per group plus the
distinct instance names inside each, so the per-layer cost structure of a
step is readable without TensorBoard.
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys


def load_trace(root: str) -> dict:
    paths = sorted(glob.glob(os.path.join(root, "**", "*.trace.json.gz"),
                             recursive=True))
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {root}")
    with gzip.open(paths[-1], "rt") as f:
        return json.load(f)


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_r2"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    trace = load_trace(root)
    events = trace["traceEvents"]

    # identify device (TPU) process ids: process_name metadata containing
    # 'TPU' / 'device' — host python threads are excluded from op totals
    proc_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            proc_names[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {pid for pid, name in proc_names.items()
                if "TPU" in name or "/device" in name.lower()}

    groups = collections.defaultdict(lambda: [0.0, 0, collections.Counter()])
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "")
        dur = float(ev.get("dur", 0.0))  # microseconds
        # normalize: strip .N suffixes and XLA unique ids
        g = re.sub(r"[._-]?\d+$", "", name)
        g = re.sub(r"\.(clone|remat\d*)", "", g)
        rec = groups[g]
        rec[0] += dur
        rec[1] += 1
        rec[2][name] += 1
        total += dur

    print(f"device events total: {total/1e3:.1f} ms "
          f"({len(groups)} groups)  [pids: "
          f"{', '.join(proc_names.get(p, str(p)) for p in sorted(dev_pids))}]")
    ranked = sorted(groups.items(), key=lambda kv: -kv[1][0])
    for g, (dur, n, names) in ranked[:top_n]:
        ex = ", ".join(f"{k}×{v}" for k, v in names.most_common(2))
        print(f"{dur/1e3:10.1f} ms  {n:5d}×  {dur/n:8.1f} us/inst  {g}   [{ex}]")


if __name__ == "__main__":
    main()
