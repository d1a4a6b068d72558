"""Orbax checkpointing of the full train state.

Replaces the reference's torch.save state_dict flow (utils/utils_fit.py:
345-381): periodic epoch checkpoints with loss-encoded names,
best_epoch_weights (criterion: val total <= running best) and
last_epoch_weights — but unlike the reference (weights-only), the optimizer
state, EMA and step are saved so resume is exact.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self.best_metric: Optional[float] = None
        self.keep = keep

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, name: str, state: Any):
        path = self._path(name)
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()

    def restore(self, name: str, template: Any) -> Any:
        return self._ckptr.restore(self._path(name), template)

    def save_epoch(self, epoch: int, state: Any, train_loss: float,
                   val_loss: float, save_period: int = 10):
        """Mirror of the reference policy (utils_fit.py:345-381)."""
        if (epoch + 1) % save_period == 0:
            self.save(f"ep{epoch + 1:03d}-loss{train_loss:.3f}-"
                      f"val_loss{val_loss:.3f}", state)
        if self.best_metric is None or val_loss <= self.best_metric:
            self.best_metric = val_loss
            self.save("best_epoch_weights", state)
        self.save("last_epoch_weights", state)

    def exists(self, name: str) -> bool:
        return os.path.isdir(self._path(name))
