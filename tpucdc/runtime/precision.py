"""Mixed-precision policy: bf16 compute / f32 params (SURVEY.md C1).

TPU MXU natively multiplies bf16 with f32 accumulation; keeping parameters and
normalization statistics in f32 preserves training stability (SURVEY.md §7
hard-part 3: GroupNorm reductions in bf16 need f32 accumulation).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Casting policy threaded through every model module."""
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    # Reductions (norm statistics, softmax, losses) always accumulate in f32.
    accum_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_to_accum(self, x):
        return jnp.asarray(x, self.accum_dtype)


BF16_POLICY = Policy()
F32_POLICY = Policy(compute_dtype=jnp.float32)
DEFAULT_POLICY = BF16_POLICY
