"""Classifier-free guidance for the conditional denoiser (BASELINE.json:11).

Guidance-scale sweeps are an eval config; the guided ε is
``ε_u + s·(ε_c − ε_u)``. The conditional and unconditional UNet evaluations
are fused into ONE batched call (batch-doubling) so the MXU sees a single
large matmul stream instead of two small ones — the TPU-friendly formulation.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp


def make_cfg_eps_fn(cond_eps_fn: Callable, uncond_eps_fn: Optional[Callable],
                    guidance_scale: float) -> Callable:
    """Build an eps_fn for the samplers with classifier-free guidance.

    cond_eps_fn / uncond_eps_fn: (x_t, t) -> eps. With scale==1 or no
    unconditional branch, returns cond_eps_fn unchanged (no extra cost).
    """
    if guidance_scale == 1.0 or uncond_eps_fn is None:
        return cond_eps_fn

    def eps_fn(x_t, t):
        eps_c = cond_eps_fn(x_t, t)
        eps_u = uncond_eps_fn(x_t, t)
        return eps_u + guidance_scale * (eps_c - eps_u)

    return eps_fn


def make_batched_cfg_eps_fn(eps_fn_doubled, guidance_scale: float):
    """Batch-doubled CFG: the caller supplies an eps_fn whose conditioning is
    already stacked [cond; uncond] along the batch, so ONE UNet call serves
    both branches — the MXU-friendly formulation the pipelines use.
    """
    def eps_fn(x_t, t):
        x2 = jnp.concatenate([x_t, x_t], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        both = eps_fn_doubled(x2, t2)
        eps_c, eps_u = jnp.split(both, 2, axis=0)
        return eps_u + guidance_scale * (eps_c - eps_u)
    return eps_fn
