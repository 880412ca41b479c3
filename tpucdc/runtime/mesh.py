"""Device mesh construction and sharding helpers (SURVEY.md §1.2 L0, §2.2 C1).

The workload is data-parallel: training batches and batched multi-image decode
shard over a 1-D ``data`` axis (BASELINE.json:5 clause 5, :10 — v5e-8). A
``model`` axis is reserved (size 1 by default) so tensor-parallel sharding
rules can be added later without an API change (SURVEY.md §2.3).

All collectives ride ICI via XLA — no hand-written transport (SURVEY.md §5.8).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def local_device_count() -> int:
    return jax.local_device_count()


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a ``(data, model)`` mesh.

    Args:
      n_data: size of the data axis. Defaults to all devices / n_model.
      n_model: size of the reserved model axis (1 in v1).
      devices: explicit device list (defaults to ``jax.devices()``).
    """
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    n = n_data * n_model
    if n > len(devices):
        raise ValueError(
            f"mesh wants {n} devices ({n_data}x{n_model}) but only "
            f"{len(devices)} available")
    dev_array = np.asarray(devices[:n]).reshape(n_data, n_model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard leading (batch) dim over the data axis; replicate the rest."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a batch pytree with the leading dim sharded over ``data``."""
    def _place(x):
        return jax.device_put(x, data_sharding(mesh, ndim=x.ndim))
    return jax.tree_util.tree_map(_place, batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (e.g. params) across every device in the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
