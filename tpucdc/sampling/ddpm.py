"""DDPM ancestral sampler as a single on-device ``lax.scan`` (SURVEY.md C15).

Scans over all T steps in descending order; every per-step quantity is a row
gather from the HBM-resident schedule tables (BASELINE.json:5 clause 3).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from tpucdc.ops.schedules import DiffusionSchedule

EpsFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def ddpm_sample(eps_fn: EpsFn, schedule: DiffusionSchedule, shape,
                rng, clip_x0: bool = True) -> jnp.ndarray:
    """Ancestral sampling from pure noise over all ``schedule.num_steps``."""
    T = schedule.num_steps
    b = shape[0]
    noise_rng, init_rng = jax.random.split(jax.random.fold_in(rng, 0))
    x_T = jax.random.normal(init_rng, shape, jnp.float32)

    def step(carry, t):
        x, key = carry
        t_vec = jnp.full((b,), t, jnp.int32)
        eps = eps_fn(x, t_vec).astype(jnp.float32)
        sqrt_ab = schedule.sqrt_alpha_bars[t]
        sqrt_1mab = schedule.sqrt_one_minus_alpha_bars[t]
        x0 = (x - sqrt_1mab * eps) / sqrt_ab
        if clip_x0:
            x0 = jnp.clip(x0, -1.0, 1.0)
        mean = (schedule.posterior_mean_coef_x0[t] * x0
                + schedule.posterior_mean_coef_xt[t] * x)
        key, sub = jax.random.split(key)
        z = jax.random.normal(sub, x.shape, jnp.float32)
        std = jnp.exp(0.5 * schedule.posterior_log_variance[t])
        x_prev = mean + jnp.where(t > 0, std, 0.0) * z
        return (x_prev, key), None

    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    (x0, _), _ = jax.lax.scan(step, (x_T, noise_rng), ts)
    return x0
