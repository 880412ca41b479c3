"""Single-pass fused GroupNorm+SiLU Pallas kernel (SURVEY.md C3).

Strategy: grid over the batch; one image's flattened [N, C] feature slab is
staged into VMEM once, group statistics are computed on-chip in f32, and the
normalize + affine + SiLU chain is applied before the single write-back —
one HBM read + one HBM write total (XLA's unfused GN does two reads).

Group reductions avoid lane-splitting reshapes (C -> [G, C/G] would split the
128-lane axis): channel sums are reduced over sublanes with the VPU, then
folded into per-group sums by a [C, G] one-hot matmul on the MXU (built from
``broadcasted_iota`` in-kernel), and broadcast back the same way. f32
accumulation throughout (SURVEY.md §7 hard-part 3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gn_silu_kernel(x_ref, gamma_ref, beta_ref, out_ref, *,
                    num_groups: int, eps: float, n_valid: int):
    x = x_ref[0].astype(jnp.float32)              # [N, C]
    n, c = x.shape
    cg = c // num_groups

    # [C, G] one-hot group-membership matrix, built on-chip.
    chan_group = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0) // cg
    group_ids = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    onehot = (chan_group == group_ids).astype(jnp.float32)

    csum = jnp.sum(x, axis=0, keepdims=True)              # [1, C]
    csumsq = jnp.sum(x * x, axis=0, keepdims=True)        # [1, C]
    gsum = jnp.dot(csum, onehot, preferred_element_type=jnp.float32)    # [1, G]
    gsumsq = jnp.dot(csumsq, onehot, preferred_element_type=jnp.float32)

    count = jnp.float32(n_valid * cg)
    mean_g = gsum / count
    var_g = gsumsq / count - mean_g * mean_g              # [1, G]

    mean_c = jnp.dot(mean_g, onehot.T, preferred_element_type=jnp.float32)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    rstd_c = jnp.dot(rstd_g, onehot.T, preferred_element_type=jnp.float32)

    gamma = gamma_ref[:].astype(jnp.float32)              # [1, C]
    beta = beta_ref[:].astype(jnp.float32)
    y = (x - mean_c) * rstd_c * gamma + beta
    y = y * jax.nn.sigmoid(y)
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(3, 4))
def gn_silu_pallas(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                   num_groups: int, eps: float = 1e-5) -> jnp.ndarray:
    """Fused GroupNorm+SiLU. x: [B, ..., C] NHWC; gamma/beta: [C]."""
    orig_shape = x.shape
    b, c = x.shape[0], x.shape[-1]
    x2 = x.reshape(b, -1, c)
    n = x2.shape[1]
    # Sublane padding so the slab tiles cleanly; padded rows are zero and are
    # excluded from the statistics via n_valid.
    pad_to = 16 if x2.dtype == jnp.bfloat16 else 8
    n_pad = (-n) % pad_to
    if n_pad:
        x2 = jnp.pad(x2, ((0, 0), (0, n_pad), (0, 0)))
    gamma2 = gamma.reshape(1, c)
    beta2 = beta.reshape(1, c)

    out = pl.pallas_call(
        functools.partial(_gn_silu_kernel, num_groups=num_groups, eps=eps,
                          n_valid=n),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, x2.shape[1], c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, x2.shape[1], c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x2, gamma2, beta2)
    if n_pad:
        out = out[:, :n, :]
    return out.reshape(orig_shape)
