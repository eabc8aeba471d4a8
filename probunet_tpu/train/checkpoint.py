"""Orbax checkpointing: full train-state save/restore + best-slot.

The reference only saves final weights (``torch.save(state_dict)``,
reference src/main.py:206-207) and a best-weights file from the early
stopper; there is NO mid-training resume (optimizer/step/rng are lost —
SURVEY.md §5). Here the full :class:`TrainState` (params, opt_state, step,
rng) plus schedule metadata round-trips through Orbax, enabling exact
resume, and a separate "best" slot mirrors the EarlyStopper's
best-weights-file semantics.
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        self._best_dir = os.path.join(self.directory, "best")

    # -- periodic full-state checkpoints --------------------------------
    def save(self, step: int, state, extra: dict[str, Any] | None = None):
        self._mgr.save(step, args=ocp.args.StandardSave({"state": state}))
        if extra is not None:
            import json

            with open(os.path.join(self.directory, f"extra_{step}.json"), "w") as f:
                json.dump(extra, f)

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, state_template, step: int | None = None):
        """Restore (state, extra) from `step` (default: latest)."""
        step = self.latest_step() if step is None else step
        if step is None:
            return None, None
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore({"state": state_template})
        )
        extra = None
        extra_path = os.path.join(self.directory, f"extra_{step}.json")
        if os.path.exists(extra_path):
            import json

            with open(extra_path) as f:
                extra = json.load(f)
        return restored["state"], extra

    def wait(self):
        self._mgr.wait_until_finished()

    # -- best-weights slot (EarlyStopper semantics) ---------------------
    def save_best(self, params):
        ckptr = ocp.StandardCheckpointer()
        path = os.path.join(self._best_dir, "params")
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        ckptr.save(path, params)
        ckptr.wait_until_finished()

    def restore_best(self, params_template):
        ckptr = ocp.StandardCheckpointer()
        path = os.path.join(self._best_dir, "params")
        if not os.path.exists(path):
            return None
        return ckptr.restore(path, params_template)

    def close(self):
        self._mgr.close()
