"""Quantization proxies (SURVEY.md C11).

Training uses the additive-uniform-noise relaxation (the classic transform-
coding proxy — the latent "compressed" by BASELINE.json:5 clause 1 must be
differentiable at train time); eval/coding uses hard rounding with a
straight-through gradient where a gradient is still needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def additive_noise(x: jnp.ndarray, rng) -> jnp.ndarray:
    """Train-time proxy: x + U(-0.5, 0.5)."""
    return x + jax.random.uniform(rng, x.shape, x.dtype, -0.5, 0.5)


def ste_round(x: jnp.ndarray) -> jnp.ndarray:
    """round(x) forward, identity gradient backward."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def quantize_dequantize(y: jnp.ndarray, means: jnp.ndarray | None = None
                        ) -> jnp.ndarray:
    """Eval-time quantization: round the mean-removed latent, add mean back.

    Matches what the range coder transmits (symbols = round(y - μ)), so the
    reconstruction path sees exactly the decodable ŷ (SURVEY.md hard-part 4).
    """
    if means is None:
        return ste_round(y)
    return ste_round(y - means) + means
