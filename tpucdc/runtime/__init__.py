"""L0 runtime: device mesh, precision policy, PRNG discipline (SURVEY.md C1)."""

from tpucdc.runtime.mesh import (
    make_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
    local_device_count,
)
from tpucdc.runtime.precision import Policy, DEFAULT_POLICY, BF16_POLICY, F32_POLICY
from tpucdc.runtime.prng import KeyChain

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "local_device_count",
    "Policy",
    "DEFAULT_POLICY",
    "BF16_POLICY",
    "F32_POLICY",
    "KeyChain",
]
