"""DDIM sampler as a single on-device ``lax.scan`` (SURVEY.md C16).

BASELINE.json:5 clause 3: the loop runs entirely on device; the per-step
subsequence tables (ᾱ_t, ᾱ_prev, σ_t, timestep values) are computed once on
host (numpy, f64) and shipped to HBM as scan inputs — zero per-step host
round-trips. η parameterizes the DDPM↔DDIM interpolation (η=0 deterministic,
per DDIM arXiv 2010.02502, PAPERS.md:5); step count is arbitrary (50/100-step
configs, BASELINE.json:7-8).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from tpucdc.ops.schedules import DiffusionSchedule, ddim_subsequence

EpsFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]  # (x_t, t) -> eps_hat


def ddim_step_tables(schedule: DiffusionSchedule, num_steps: int,
                     eta: float = 0.0, t_start: int | None = None):
    """Host-side (f64) per-step scalar tables for the scan, as [K] arrays.

    ``t_start`` truncates the chain: the subsequence spans [0, t_start]
    (truncated refinement decode) instead of [0, T-1]."""
    ab_full = np.asarray(schedule.alpha_bars, dtype=np.float64)
    ts = ddim_subsequence(schedule.num_steps, num_steps,
                          t_max=t_start)                       # descending
    ab = ab_full[ts]
    ab_prev = np.concatenate([ab_full[ts[1:]], [1.0]])         # final step → ᾱ=1
    sigma = eta * np.sqrt((1 - ab_prev) / (1 - ab)) * np.sqrt(1 - ab / ab_prev)
    return {
        "t": jnp.asarray(ts, jnp.int32),
        "sqrt_ab": jnp.asarray(np.sqrt(ab), jnp.float32),
        "sqrt_one_minus_ab": jnp.asarray(np.sqrt(1 - ab), jnp.float32),
        "sqrt_ab_prev": jnp.asarray(np.sqrt(ab_prev), jnp.float32),
        "dir_coef": jnp.asarray(np.sqrt(np.maximum(1 - ab_prev - sigma**2, 0.0)),
                                jnp.float32),
        "sigma": jnp.asarray(sigma, jnp.float32),
    }


def _rng_streams(rng):
    """(noise_keys, init_keys) from either a single key or a [B] key vector.

    A [B] vector gives every batch element its own noise chain, so sampling
    is invariant to how the batch is laid out over a mesh even for η > 0
    (VERDICT r1 weak item 4 — previously all images in a shard shared the
    per-step noise)."""
    if jnp.ndim(rng) == 0:
        return jax.random.split(jax.random.fold_in(rng, 0))
    ks = jax.vmap(lambda k: jax.random.split(jax.random.fold_in(k, 0)))(rng)
    return ks[:, 0], ks[:, 1]


def _split_keys(key):
    if jnp.ndim(key) == 0:
        return jax.random.split(key)
    ks = jax.vmap(jax.random.split)(key)
    return ks[:, 0], ks[:, 1]


def _normal(key, shape):
    """Standard normal of ``shape``; per-image draw when key is a vector."""
    if jnp.ndim(key) == 0:
        return jax.random.normal(key, shape, jnp.float32)
    return jax.vmap(lambda k: jax.random.normal(k, shape[1:], jnp.float32))(
        key)


def ddim_sample(eps_fn: EpsFn, schedule: DiffusionSchedule, shape,
                rng, num_steps: int = 50, eta: float = 0.0,
                x_init: jnp.ndarray | None = None,
                t_start: int | None = None,
                x_ref: jnp.ndarray | None = None,
                clip_x0: bool = True,
                tables: dict | None = None,
                prediction: str = "eps") -> jnp.ndarray:
    """Run DDIM from pure noise to x₀. Jit-friendly; static shapes only.

    eps_fn: (x_t [B,...], t [B] int32) -> eps_hat. Conditioning is closed over
    (see pipelines.decompress); guidance wraps eps_fn (sampling.guidance).
    rng: a single PRNG key, or a [B] key vector for per-image noise chains
    (mesh-layout-invariant batched decode, parallel/shard_decode.py).

    Truncated refinement (codec.synthesis decode): pass ``t_start`` < T-1 and
    ``x_ref`` = the clean reference x̄ — the chain spans [0, t_start] and
    starts from q_sample(x̄, ts[0]) drawn with this function's init stream.
    ``x_init`` (mutually exclusive with x_ref) is taken as x already AT the
    first subsequence timestep.

    ``tables`` overrides the internal ddim_step_tables build with
    caller-supplied [K] arrays — passing them as TRACED inputs lets one
    compiled decode serve any (eta, t_start) pair (each new HLO costs
    5-15 min over the axon remote-compile tunnel; only the scan length K
    is structural).
    """
    if tables is None:
        tables = ddim_step_tables(schedule, num_steps, eta, t_start)
    if prediction == "residual" and x_ref is None:
        raise ValueError("prediction='residual' needs x_ref (the synthesis "
                         "reconstruction the net's output perturbs)")
    b = shape[0]
    noise_rng, init_rng = _rng_streams(rng)
    if x_ref is not None:
        if x_init is not None:
            raise ValueError("pass x_init or x_ref, not both")
        x_t = (tables["sqrt_ab"][0] * x_ref.astype(jnp.float32)
               + tables["sqrt_one_minus_ab"][0] * _normal(init_rng, shape))
    else:
        x_t = (_normal(init_rng, shape)
               if x_init is None else x_init.astype(jnp.float32))

    def step(carry, inputs):
        x, key = carry
        tab = inputs
        t_vec = jnp.full((b,), tab["t"], jnp.int32)
        out = eps_fn(x, t_vec).astype(jnp.float32)
        x_prev, key = _ddim_update(x, out, tab, key, clip_x0, prediction,
                                   x_ref)
        return (x_prev, key), None

    (x0, _), _ = jax.lax.scan(step, (x_t, noise_rng), tables)
    return x0


def _ddim_update(x, out, tab, key, clip_x0, prediction="eps", x_ref=None):
    """One DDIM step from the net output under any parameterization.

    "eps": out is ε̂ → x₀ implied. "x0": out IS x₀ → ε implied (the update
    formula needs both; deriving ε from a CLIPPED x₀ keeps an undertrained
    x0-net's step bounded, unlike the ε-mode (1-ᾱ)/ᾱ amplification).
    "residual": x₀ = x_ref + out (r3 — the refiner perturbs the synthesis
    reconstruction instead of reproducing it)."""
    if prediction in ("x0", "residual"):
        x0 = out if prediction == "x0" else x_ref.astype(jnp.float32) + out
        if clip_x0:
            x0 = jnp.clip(x0, -1.0, 1.0)
        eps = (x - tab["sqrt_ab"] * x0) / jnp.maximum(
            tab["sqrt_one_minus_ab"], 1e-4)
    else:
        eps = out
        x0 = (x - tab["sqrt_one_minus_ab"] * eps) / tab["sqrt_ab"]
        if clip_x0:
            x0 = jnp.clip(x0, -1.0, 1.0)
    key, sub = _split_keys(key)
    z = _normal(sub, x.shape)
    x_prev = (tab["sqrt_ab_prev"] * x0 + tab["dir_coef"] * eps
              + tab["sigma"] * z)
    return x_prev, key


def ddim_sample_blockcached(eps_fresh_fn, eps_cached_fn,
                            schedule: DiffusionSchedule, shape,
                            cache_shape, rng, num_steps: int = 50,
                            cache_period: int = 2, eta: float = 0.0,
                            x_init: jnp.ndarray | None = None,
                            t_start: int | None = None,
                            x_ref: jnp.ndarray | None = None,
                            clip_x0: bool = True,
                            tables: dict | None = None,
                            prediction: str = "eps") -> jnp.ndarray:
    """DDIM with deep-block caching (PAPERS.md, arXiv 2312.03209).

    Every ``cache_period``-th step runs the full UNet and refreshes the deep
    cache; the steps in between reuse it and only run the shallow levels.
    ``t_start``/``x_ref``/``tables`` follow ddim_sample's contracts.

    eps_fresh_fn:  (x_t, t) -> (eps, cache)
    eps_cached_fn: (x_t, t, cache) -> eps
    """
    if tables is None:
        tables = ddim_step_tables(schedule, num_steps, eta, t_start)
    if prediction == "residual" and x_ref is None:
        raise ValueError("prediction='residual' needs x_ref")
    tables = dict(tables)
    tables["k"] = jnp.arange(tables["t"].shape[0], dtype=jnp.int32)
    b = shape[0]
    noise_rng, init_rng = _rng_streams(rng)
    if x_ref is not None:
        if x_init is not None:
            raise ValueError("pass x_init or x_ref, not both")
        x_t = (tables["sqrt_ab"][0] * x_ref.astype(jnp.float32)
               + tables["sqrt_one_minus_ab"][0] * _normal(init_rng, shape))
    else:
        x_t = (_normal(init_rng, shape)
               if x_init is None else x_init.astype(jnp.float32))
    cache0 = jnp.zeros(cache_shape, jnp.float32)

    def step(carry, inputs):
        x, key, cache = carry
        tab = inputs
        t_vec = jnp.full((b,), tab["t"], jnp.int32)
        eps, cache = jax.lax.cond(
            tab["k"] % cache_period == 0,
            lambda x_, c_: eps_fresh_fn(x_, t_vec),
            lambda x_, c_: (eps_cached_fn(x_, t_vec, c_), c_),
            x, cache)
        eps = eps.astype(jnp.float32)
        x_prev, key = _ddim_update(x, eps, tab, key, clip_x0, prediction,
                                   x_ref)
        return (x_prev, key, cache), None

    (x0, _, _), _ = jax.lax.scan(step, (x_t, noise_rng, cache0), tables)
    return x0
