"""Sinusoidal timestep embedding (SURVEY.md C5).

The per-step embedding vector is a pure function of the integer timestep, so
samplers precompute the full table for their step subsequence once and gather
rows inside the ``lax.scan`` (BASELINE.json:5 clause 3 — tables resident in
HBM, zero per-step host work).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def sinusoidal_time_embed(t: jnp.ndarray, dim: int,
                          max_period: float = 10000.0) -> jnp.ndarray:
    """Transformer-style sinusoidal embedding of (possibly fractional) steps.

    t: [...] float or int array of timesteps. Returns [..., dim] f32.
    """
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[..., None] * freqs
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
    return emb


def time_embed_table(timesteps: np.ndarray, dim: int) -> jnp.ndarray:
    """Precompute the [K, dim] embedding table for a sampler's subsequence."""
    return sinusoidal_time_embed(jnp.asarray(timesteps), dim)
