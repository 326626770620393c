"""Training metrics: smoothing + trackers.

Reference: deque smoothing over the accumulation window with W&B + JSONL
trackers (finetune.py:451-490,1006-1013; training/metrics.py:34-348).
wandb is optional here (not in the image) — the JSONL tracker is always on
and the W&B tracker activates when importable.
"""

from __future__ import annotations

import collections
import json
import time
from pathlib import Path
from typing import Dict, Optional

import numpy as np


class JSONLinesTracker:
    def __init__(self, path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fh = self.path.open("a")

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        self._fh.write(json.dumps({"step": step, **metrics}) + "\n")
        self._fh.flush()

    def close(self):
        self._fh.close()


class WandbTracker:
    def __init__(self, project: str, entity: Optional[str], run_id: str,
                 config: Optional[dict] = None):
        import wandb  # gated — raises if unavailable

        self._wandb = wandb
        self._run = wandb.init(project=project, entity=entity, name=run_id,
                               config=config, mode="offline")

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        self._wandb.log({f"VLA Train/{k}": v for k, v in metrics.items()},
                        step=step)

    def close(self):
        self._run.finish()


class Metrics:
    """Smoothed-window metrics container with per-step timing."""

    def __init__(self, run_dir, window: int = 32, trackers=("jsonl",),
                 wandb_project: str = "vla-adapter-tpu",
                 wandb_entity: Optional[str] = None, run_id: str = "run",
                 config: Optional[dict] = None):
        self._deques: Dict[str, collections.deque] = {}
        self.window = window
        self._trackers = []
        if "jsonl" in trackers:
            self._trackers.append(JSONLinesTracker(Path(run_dir) / "metrics.jsonl"))
        if "wandb" in trackers:
            try:
                self._trackers.append(
                    WandbTracker(wandb_project, wandb_entity, run_id, config)
                )
            except Exception:
                pass  # wandb not installed/configured — JSONL still records
        self._last_t = time.time()

    def commit(self, **metrics) -> None:
        now = time.time()
        metrics.setdefault("step_time", now - self._last_t)
        self._last_t = now
        for k, v in metrics.items():
            self._deques.setdefault(
                k, collections.deque(maxlen=self.window)
            ).append(float(v))

    def smoothed(self) -> Dict[str, float]:
        return {k: float(np.mean(d)) for k, d in self._deques.items() if d}

    def push(self, step: int) -> Dict[str, float]:
        sm = self.smoothed()
        for t in self._trackers:
            t.log(step, sm)
        return sm

    def close(self):
        for t in self._trackers:
            t.close()
