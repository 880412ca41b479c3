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


def save_params_npz(params: Any, path: str | pathlib.Path) -> None:
    """Flatten a params pytree into one compressed ``.npz``.

    Portable, git-committable snapshot of inference weights (the EMA
    params) — unlike the orbax run directories, which live outside the
    repo and do not survive a box reset. Keys are ``jax.tree_util.keystr``
    paths, so load requires the matching abstract pytree structure.
    """
    import jax
    import numpy as np

    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    flat = {jax.tree_util.keystr(kp): np.asarray(leaf) for kp, leaf in leaves}
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **flat)


def load_params_npz(path: str | pathlib.Path, abstract_params: Any) -> Any:
    """Inverse of :func:`save_params_npz`.

    ``abstract_params`` supplies the pytree structure plus expected
    shapes/dtypes (concrete arrays or ``jax.eval_shape`` output).
    Missing keys or shape mismatches raise instead of silently
    mis-assigning weights.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    data = np.load(pathlib.Path(path))
    leaves_kp, treedef = jax.tree_util.tree_flatten_with_path(abstract_params)
    out = []
    for kp, ab in leaves_kp:
        key = jax.tree_util.keystr(kp)
        if key not in data:
            raise KeyError(f"{path}: missing param {key}")
        arr = data[key]
        if tuple(arr.shape) != tuple(ab.shape):
            raise ValueError(
                f"{path}: {key} shape {arr.shape} != expected {ab.shape}")
        out.append(jnp.asarray(arr, dtype=ab.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


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
