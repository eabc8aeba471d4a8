"""Patience-based early stopping with best-weights restore.

Semantics of the reference ``EarlyStopper``
(reference src/train_prob_unet_model.py:76-102): on improvement, snapshot the
model as best and reset the counter; when validation loss exceeds
best + min_delta for `patience` consecutive checks, stop and restore the best
weights. The reference round-trips through a file (./last_best_model_hr.pt);
here the snapshot is an in-memory pytree (optionally persisted through the
CheckpointManager's best-checkpoint slot).
"""

from __future__ import annotations

from typing import Any

import jax


class EarlyStopper:
    def __init__(self, patience: int = 1, min_delta: float = 0.0):
        self.patience = patience
        self.min_delta = min_delta
        self.counter = 0
        self.min_validation_loss = float("inf")
        self.best_params: Any = None

    def early_stop(self, validation_loss: float, params) -> tuple[bool, Any]:
        """Returns (should_stop, params_to_continue_with).

        On stop, the returned params are the best snapshot (reference
        reloads ./last_best_model_hr.pt at src/train_prob_unet_model.py:100).
        """
        if validation_loss < self.min_validation_loss:
            self.min_validation_loss = validation_loss
            self.best_params = jax.tree.map(lambda x: x, params)
            self.counter = 0
        elif validation_loss > (self.min_validation_loss + self.min_delta):
            self.counter += 1
            if self.counter >= self.patience:
                return True, self.best_params
        return False, params
