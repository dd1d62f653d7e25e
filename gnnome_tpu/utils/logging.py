"""Experiment tracking & structured metrics logging.

Reference behavior: wandb with a 14-metric per-epoch log and graceful
failure swallowing (``train.py:229-230,513-523``; project "GeNNome",
default mode ``disabled``, ``hyperparameters.py:27``). Here the primary
sink is a local JSONL file (always works, greppable, no network); wandb is
attached opportunistically when installed and enabled.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(
        self,
        out_dir: str = "runs",
        run_name: str = "run",
        wandb_mode: str = "disabled",
        config: Optional[Dict[str, Any]] = None,
    ):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, f"{run_name}.metrics.jsonl")
        self._f = open(self.path, "a")
        self._wandb = None
        if wandb_mode != "disabled":
            try:
                import wandb

                self._wandb = wandb.init(
                    project="gnnome_tpu", name=run_name, mode=wandb_mode,
                    config=config or {},
                )
            except Exception:
                self._wandb = None  # swallow, as train.py:522-523 does

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None:
        rec = {"time": time.time(), **({"step": step} if step is not None else {}),
               **metrics}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._wandb is not None:
            try:
                self._wandb.log(metrics, step=step)
            except Exception:
                pass

    def close(self) -> None:
        self._f.close()
        if self._wandb is not None:
            try:
                self._wandb.finish()
            except Exception:
                pass
