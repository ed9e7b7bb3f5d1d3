"""Orbax checkpointing with auto-resume.

Replaces the reference's DetectionCheckpointer (train_net.py:412-413,
SOLVER.CHECKPOINT_PERIOD=2500): async array checkpoints of
(params, batch_stats, opt_state, step), `latest` resolution for resume, and
bounded retention."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, force: bool = False) -> None:
        self.manager.save(
            step, args=ocp.args.StandardSave(state), force=force
        )

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        return self.manager.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )
