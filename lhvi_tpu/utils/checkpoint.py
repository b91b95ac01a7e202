"""Checkpoint/resume via orbax (SURVEY.md §6: the recovery story for
long/pod-scale runs — the reference has none).

Any engine state pytree (``HMCState``, ``(VIParams, opt_state)``,
``SMCState``, raw arrays) can be saved per step and restored into the same
structure. Orbax handles multi-host coordination when
``jax.distributed`` is initialized.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


class CheckpointManager:
    """Thin wrapper over orbax's checkpointing with step retention."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, wait: bool = False) -> None:
        self.mgr.save(
            step, args=self._ocp.args.StandardSave(jax.device_get(state))
        )
        if wait:
            self.mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        if template is not None:
            return self.mgr.restore(
                step,
                args=self._ocp.args.StandardRestore(jax.device_get(template)),
            )
        return self.mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def close(self):
        self.mgr.wait_until_finished()
        self.mgr.close()
