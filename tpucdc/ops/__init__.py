"""L1 ops: noise schedules, fused kernels + pure-JAX fallbacks (SURVEY.md C2-C5)."""

from tpucdc.ops.schedules import (
    DiffusionSchedule,
    make_schedule,
    ddim_subsequence,
)
from tpucdc.ops.groupnorm import group_norm_silu, group_norm
from tpucdc.ops.attention import attention
from tpucdc.ops.time_embed import sinusoidal_time_embed

__all__ = [
    "DiffusionSchedule",
    "make_schedule",
    "ddim_subsequence",
    "group_norm_silu",
    "group_norm",
    "attention",
    "sinusoidal_time_embed",
]
