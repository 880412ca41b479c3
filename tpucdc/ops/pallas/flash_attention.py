"""Blocked attention Pallas kernel for UNet feature maps (SURVEY.md C4).

UNet attention runs on low-resolution grids (≤ a few thousand tokens —
SURVEY.md §5.7), so K/V for one (batch·head) fit entirely in VMEM. The kernel
grids over (batch·head, q-blocks), computes exact f32 softmax per q-block
against the resident K/V panel, and fuses scale + softmax + PV into one
kernel: Q/K/V are each read from HBM exactly once.

Head dim is zero-padded to the 128-lane width outside the kernel (zero
columns change neither QKᵀ nor PV). Shapes the kernel does not support
(tokens not 128-aligned or K/V panel too large) return None and the caller
falls back to the XLA reference path — parity is tested in tests/kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_Q_BLOCK = 256
_LANES = 128
# K/V panel bytes per (batch·head) kept in VMEM; beyond this, fall back.
_KV_LIMIT = 4 * 1024 * 1024


def _attn_kernel(q_ref, k_ref, v_ref, out_ref, *, scale: float):
    q = q_ref[0]                                   # [BQ, d]
    k = k_ref[0]                                   # [Nk, d]
    v = v_ref[0]                                   # [Nk, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # [BQ, Nk]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v,
                preferred_element_type=jnp.float32)          # [BQ, d]
    out_ref[0] = (o / denom).astype(out_ref.dtype)


def flash_attention_pallas(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           scale: float):
    """q: [B, H, Nq, d]; k/v: [B, H, Nk, d]. Returns None if unsupported."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    if nq % _Q_BLOCK or nk % _LANES or d > _LANES:
        return None
    if nk * _LANES * 4 > _KV_LIMIT:
        return None
    return _run(q, k, v, scale)


@functools.partial(jax.jit, static_argnums=(3,))
def _run(q, k, v, scale):
    b, h, nq, d = q.shape
    nk = k.shape[2]
    d_pad = _LANES - d
    if d_pad:
        pad = ((0, 0), (0, 0), (0, 0), (0, d_pad))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    bh = b * h
    q3 = q.reshape(bh, nq, _LANES)
    k3 = k.reshape(bh, nk, _LANES)
    v3 = v.reshape(bh, nk, _LANES)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, nq, _LANES), q.dtype),
        grid=(bh, nq // _Q_BLOCK),
        in_specs=[
            pl.BlockSpec((1, _Q_BLOCK, _LANES), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, _LANES), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, _LANES), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _Q_BLOCK, _LANES), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
    )(q3, k3, v3)
    out = out.reshape(b, h, nq, _LANES)
    if d_pad:
        out = out[..., :d]
    return out
