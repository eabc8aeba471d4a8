"""Structured metric logging.

Replaces the reference's print/tqdm logging and optional wandb hooks
(reference src/train_prob_unet_model.py:118-150, src/deterministic_unet_main.py:38-39)
with a JSONL sink (one line per logical event) plus an optional wandb
passthrough when the library is present. Scalars are pulled to host OUTSIDE
the jitted step — callers pass already-materialized floats or small arrays.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Mapping


def _to_scalar(v):
    try:
        import numpy as np

        arr = np.asarray(v)
        if arr.size == 1:
            return float(arr)
        return arr.tolist()
    except Exception:
        return v


class MetricLogger:
    def __init__(self, logdir: str | None = None, use_wandb: bool = False,
                 run_name: str = "run", stdout: bool = True):
        self.stdout = stdout
        self.path = None
        self._fh = None
        if logdir:
            os.makedirs(logdir, exist_ok=True)
            self.path = os.path.join(logdir, f"{run_name}.jsonl")
            self._fh = open(self.path, "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
            except ImportError:
                pass
        self.history: list[dict] = []

    def log(self, metrics: Mapping[str, Any], step: int | None = None,
            kind: str = "train"):
        rec = {"ts": time.time(), "kind": kind}
        if step is not None:
            rec["step"] = int(step)
        rec.update({k: _to_scalar(v) for k, v in metrics.items()})
        self.history.append(rec)
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(dict(metrics), step=step)
        if self.stdout:
            body = " ".join(
                f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in rec.items()
                if k not in ("ts",)
            )
            print(f"[{kind}] {body}")

    def close(self):
        if self._fh:
            self._fh.close()
