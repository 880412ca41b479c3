"""Batched multi-image decode sharded over the data mesh via shard_map
(SURVEY.md C20; BASELINE.json:5 clause 5, :10 — v5e-8).

The DDIM scan body runs per-shard: each device independently denoises its
slice of the image batch; no collectives are needed inside the loop, so the
ICI stays idle and scaling is embarrassingly parallel — exactly what
shard_map expresses. PRNG keys are split per batch element so results are
independent of the mesh size (same seeds → same images on 1 or 8 chips).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpucdc.ops.schedules import DiffusionSchedule
from tpucdc.sampling import ddim_sample

from jax import shard_map


def sharded_sample(model_apply, params, schedule: DiffusionSchedule,
                   mesh: Mesh, y_hat: jnp.ndarray, rngs: jnp.ndarray,
                   image_hw: tuple[int, int], num_steps: int = 100,
                   eta: float = 0.0, x_ref_fn=None,
                   t_start: int | None = None,
                   prediction: str = "eps",
                   blend_gamma: float = 1.0):
    """Decode a batch of conditioning latents, batch sharded on ``data``.

    model_apply: (params, y_hat, x_t, t[, x_bar]) -> eps_hat — a closure that
      runs the conditioning head + UNet for one shard (built by the caller
      from CDCModel; kept generic so tests can use toy models). The x_bar
      argument is passed iff ``x_ref_fn`` is given.
    y_hat: [B, hy, wy, C] with B divisible by the data-axis size.
    rngs: [B] PRNG keys (one per image).
    x_ref_fn: (params, y_shard) -> x̄ — synthesis-transform decode, computed
      ONCE per shard (outside the scan). With ``t_start`` the chain is the
      truncated refinement of x̄ over [0, t_start] (codec.synthesis decode).
    """
    h, w = image_hw
    batch = y_hat.shape[0]
    n_data = mesh.shape["data"]
    if batch % n_data:
        raise ValueError(f"batch {batch} not divisible by data axis {n_data}")
    if t_start is not None and x_ref_fn is None:
        raise ValueError("t_start needs x_ref_fn (truncation refines x̄)")
    if num_steps == 0 and x_ref_fn is None:
        raise ValueError("num_steps=0 (mean decode) needs x_ref_fn "
                         "(codec.synthesis)")

    def per_shard(params, y_shard, rng_shard, gamma):
        x_bar = x_ref_fn(params, y_shard) if x_ref_fn is not None else None
        if num_steps == 0:
            # Mean decode (ADVICE r2): g_s per shard, no sampler — mirrors
            # the non-mesh branch's steps=0 menu entry.
            return x_bar

        def eps_fn(x_t, t):
            if x_bar is None:
                return model_apply(params, y_shard, x_t, t)
            return model_apply(params, y_shard, x_t, t, x_bar)
        shard_b = y_shard.shape[0]
        if t_start is not None or prediction == "residual":
            # Truncated start from x̄ (and residual full chain — the update
            # needs x_ref every step): ddim_sample draws the init noise from
            # the per-image key vector, so this stays mesh-size-invariant.
            # For the full chain ᾱ(T-1)≈0, so q_sample(x̄, T-1) ≈ pure noise.
            x0 = ddim_sample(eps_fn, schedule, (shard_b, h, w, 3),
                             rng_shard, num_steps=num_steps, eta=eta,
                             t_start=t_start, x_ref=x_bar,
                             prediction=prediction)
            # Distortion-perception blend (SampleConfig.blend_gamma) —
            # mirrors the single-dispatch path in codec_runtime._sample_fn;
            # γ is a traced P() input so every γ shares one executable.
            return x_bar + gamma * (x0 - x_bar)
        # Draw the initial noise PER IMAGE from that image's own key, and pass
        # the per-image key vector through the scan so the η>0 per-step noise
        # is also per-image — decode of image i is then identical on a 1-chip
        # or 8-chip mesh for any η (VERDICT r1 weak item 4).
        x_init = jax.vmap(
            lambda k: jax.random.normal(k, (h, w, 3), jnp.float32))(rng_shard)
        x0 = ddim_sample(eps_fn, schedule, (shard_b, h, w, 3), rng_shard,
                         num_steps=num_steps, eta=eta, x_init=x_init,
                         prediction=prediction)
        if x_bar is not None:
            x0 = x_bar + gamma * (x0 - x_bar)
        return x0

    fn = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), P("data", None, None, None), P("data"), P()),
        out_specs=P("data", None, None, None),
    )
    return fn(params, y_hat, rngs, jnp.float32(blend_gamma))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))
