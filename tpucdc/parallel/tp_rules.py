"""Tensor-parallel sharding rules over the reserved ``model`` mesh axis
(SURVEY.md §2.3 TP row: "mesh axis reserved ... so TP sharding rules can be
added without API change" — this is that addition).

The rule is leaf-wise and uniform, which makes it apply identically to
params, EMA params and the optimizer moments (same shapes): any array whose
LAST axis is divisible by the model-axis size (and wide enough to be worth
splitting) is sharded on that axis — conv kernels and dense weights split by
OUTPUT channel, so each device holds a slice of every layer's filters. XLA's
SPMD partitioner propagates the shardings through the jit'd train step and
inserts the all-gathers/reduce-scatters on ICI; there is no hand-written
collective anywhere (SURVEY.md §5.8).

With ``n_model == 1`` every spec degenerates to replication — the default
mesh behaves exactly as round 1.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpucdc.runtime.mesh import MODEL_AXIS


def leaf_spec(shape, n_model: int, min_factor: int = 2) -> P:
    """PartitionSpec for one array: shard the last axis on ``model`` when it
    splits evenly into slices of at least ``min_factor`` elements."""
    if (n_model > 1 and len(shape) >= 1
            and shape[-1] % n_model == 0
            and shape[-1] >= min_factor * n_model):
        return P(*([None] * (len(shape) - 1)), MODEL_AXIS)
    return P()


def tree_shardings(tree, mesh: Mesh):
    """Per-leaf NamedShardings for a state pytree under the TP rule."""
    n_model = mesh.shape[MODEL_AXIS]
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, leaf_spec(x.shape, n_model)), tree)


def apply_tp(tree, mesh: Mesh):
    """Place a (host or replicated) state pytree under the TP shardings."""
    shardings = tree_shardings(tree, mesh)
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)
