"""GroupNorm and fused GroupNorm+SiLU (SURVEY.md C3).

The fused op is the inner-loop normalization of every UNet ResBlock
(BASELINE.json:5 clause 2: "ResBlocks with GroupNorm+SiLU ... fused into
Pallas kernels"). Two implementations:

  * a pure-JAX reference (always correct, used on CPU and as the parity
    oracle in tests/kernels) — statistics accumulate in f32 even for bf16
    inputs (SURVEY.md §7 hard-part 3);
  * a Pallas TPU kernel (tpucdc.ops.pallas.gn_silu) that keeps the feature
    map resident in VMEM for a single-pass stats+normalize+SiLU when the
    per-image slab fits on chip.

Dispatch: Pallas on TPU when shapes allow, fallback otherwise. Layout is
NHWC (TPU-native; channels on the 128-lane axis).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

_FORCE_FALLBACK = False  # toggled by tests / debug config


def set_force_fallback(value: bool) -> None:
    global _FORCE_FALLBACK
    _FORCE_FALLBACK = value


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def group_norm(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
               num_groups: int, eps: float = 1e-5) -> jnp.ndarray:
    """Plain GroupNorm over NHWC input; f32 statistics, input dtype out."""
    return _gn_reference(x, gamma, beta, num_groups, eps, fuse_silu=False)


def group_norm_silu(x: jnp.ndarray, gamma: jnp.ndarray, beta: jnp.ndarray,
                    num_groups: int, eps: float = 1e-5) -> jnp.ndarray:
    """Fused GroupNorm + SiLU over NHWC input.

    x: [B, H, W, C] (or [B, N, C]); gamma/beta: [C]; C % num_groups == 0.

    Dispatch note (PERF.md): profiled on v5e, XLA's own reduce+elementwise
    fusion of the reference path beats the handwritten Pallas kernel on the
    UNet's GN shapes (17.7 vs 24.1 ms/step whole-model), so the XLA path is
    the default; set TPUCDC_PALLAS_GN=1 to route supported slabs to the
    Pallas kernel (kept for parity testing and future tuning).
    """
    if (not _FORCE_FALLBACK and _on_tpu()
            and os.environ.get("TPUCDC_PALLAS_GN") == "1"):
        from tpucdc.ops.pallas.gn_silu import gn_silu_pallas, gn_silu_supported
        if gn_silu_supported(x):
            return gn_silu_pallas(x, gamma, beta, num_groups, eps)
    return _gn_reference(x, gamma, beta, num_groups, eps, fuse_silu=True)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _gn_reference(x, gamma, beta, num_groups: int, eps: float,
                  fuse_silu: bool):
    orig_dtype = x.dtype
    B = x.shape[0]
    C = x.shape[-1]
    if C % num_groups:
        raise ValueError(f"C={C} not divisible by groups={num_groups}")
    xf = x.astype(jnp.float32).reshape(B, -1, num_groups, C // num_groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(x.shape)
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if fuse_silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(orig_dtype)
