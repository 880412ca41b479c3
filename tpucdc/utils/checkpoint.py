"""Orbax checkpoint/resume (SURVEY.md C23, §5.4).

Saves {params, ema, opt_state, step} plus the data-iterator position (the
crop iterator is deterministic in its batch index, so restoring the step
resumes the exact batch stream — preemption-safe training, SURVEY.md §5.3).
λ-tagged run directories for the BASELINE.json:9 sweep are just per-λ
subdirectories chosen by the caller (pipelines.train / CLI).
"""

from __future__ import annotations

import pathlib
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str | pathlib.Path, max_to_keep: int = 3):
        self.directory = pathlib.Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any, wait: bool = False) -> None:
        self._mngr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore(self, abstract_state: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of ``abstract_state`` (a concrete or
        jax.eval_shape pytree of the TrainState)."""
        step = step if step is not None else self._mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mngr.restore(
            step, args=ocp.args.StandardRestore(abstract_state))

    def close(self):
        self._mngr.wait_until_finished()
        self._mngr.close()
