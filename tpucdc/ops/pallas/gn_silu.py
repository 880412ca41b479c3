"""Single-pass-in-VMEM fused GroupNorm+SiLU Pallas kernel (SURVEY.md C3).

Strategy: grid over the batch; one image's flattened [N, C] feature slab is
staged into VMEM once, and both the statistics pass and the
normalize+affine+SiLU pass stream over it in fixed-size sublane chunks —
HBM sees one read + one write total, while the f32 working set stays at
~chunk size (the whole slab is never materialized in f32; SURVEY.md §7
hard-part 3: f32 accumulation for bf16 inputs).

Group reductions avoid lane-splitting reshapes (C -> [G, C/G] would split the
128-lane axis): per-channel sums reduce over sublanes on the VPU, then fold
into per-group sums via a [C, G] one-hot matmul on the MXU (built from
``broadcasted_iota`` in-kernel) and broadcast back the same way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 1024          # sublane rows processed per inner step


def _gn_silu_kernel(x_ref, gamma_ref, beta_ref, out_ref, *,
                    num_groups: int, eps: float, n_valid: int):
    n = x_ref.shape[1]
    c = x_ref.shape[2]
    cg = c // num_groups
    chunk = min(_CHUNK, n)
    num_chunks = n // chunk          # n is padded to a multiple of chunk

    # Pass 1: per-channel sums, streamed in f32 chunks.
    def stats_body(i, acc):
        csum, csumsq = acc
        x = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        return (csum + jnp.sum(x, axis=0, keepdims=True),
                csumsq + jnp.sum(x * x, axis=0, keepdims=True))

    zeros = jnp.zeros((1, c), jnp.float32)
    csum, csumsq = jax.lax.fori_loop(0, num_chunks, stats_body, (zeros, zeros))

    # Fold channel sums into group stats via one-hot matmul.
    chan_group = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0) // cg
    group_ids = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    onehot = (chan_group == group_ids).astype(jnp.float32)
    gsum = jnp.dot(csum, onehot, preferred_element_type=jnp.float32)
    gsumsq = jnp.dot(csumsq, onehot, preferred_element_type=jnp.float32)
    count = jnp.float32(n_valid * cg)
    mean_g = gsum / count
    var_g = gsumsq / count - mean_g * mean_g
    mean_c = jnp.dot(mean_g, onehot.T, preferred_element_type=jnp.float32)
    rstd_c = jnp.dot(jax.lax.rsqrt(var_g + eps), onehot.T,
                     preferred_element_type=jnp.float32)

    gamma = gamma_ref[:].astype(jnp.float32)
    beta = beta_ref[:].astype(jnp.float32)
    scale = rstd_c * gamma                    # fold affine into one FMA
    shift = beta - mean_c * scale

    # Pass 2: normalize + SiLU, streamed.
    def norm_body(i, _):
        x = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        y = x * scale + shift
        y = y * jax.nn.sigmoid(y)
        out_ref[0, pl.ds(i * chunk, chunk), :] = y.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, num_chunks, norm_body, 0)


def gn_silu_supported(x: jnp.ndarray) -> bool:
    """Whole per-image slab (input dtype) must fit VMEM with headroom."""
    per_image = int(x.size) // int(x.shape[0])
    return per_image * x.dtype.itemsize <= 6 * 1024 * 1024


@functools.partial(jax.jit, static_argnums=(3, 4))
def gn_silu_pallas(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                   num_groups: int, eps: float = 1e-5) -> jnp.ndarray:
    """Fused GroupNorm+SiLU. x: [B, ..., C] NHWC; gamma/beta: [C]."""
    orig_shape = x.shape
    b, c = x.shape[0], x.shape[-1]
    x2 = x.reshape(b, -1, c)
    n = x2.shape[1]
    # Pad rows so the slab splits into whole chunks; padded rows are zero and
    # excluded from statistics via n_valid.
    chunk = min(_CHUNK, max(n, 8))
    n_pad = (-n) % chunk
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
