"""Multi-head attention for low-resolution UNet feature maps (SURVEY.md C4).

BASELINE.json:5 clause 2: self-attention at low resolutions, also serving the
cross-attention conditioning path. Token counts are small (≤ a few thousand —
SURVEY.md §5.7), so the kernel operates on whole [N, d] panels per
(batch·head) with a flash-style KV-blocked inner loop for the larger tiled
shapes.

Two implementations: pure-JAX reference (f32 softmax) and a Pallas TPU kernel
(tpucdc.ops.pallas.flash_attention). Dispatch mirrors groupnorm.py.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_FORCE_FALLBACK = False


def set_force_fallback(value: bool) -> None:
    global _FORCE_FALLBACK
    _FORCE_FALLBACK = value


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              scale: float | None = None) -> jnp.ndarray:
    """Scaled dot-product attention.

    q: [B, H, Nq, d], k/v: [B, H, Nk, d]. Softmax in f32, output q.dtype.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    # Dispatch note (PERF.md): on the flagship's token counts (≤1536, B=1),
    # XLA's fused attention beats the handwritten Pallas kernel (4.62 vs
    # 5.47 ms/step whole-model), so XLA is the default. TPUCDC_PALLAS_ATTN=1
    # opts supported shapes into the Pallas kernel (kept for parity tests
    # and for large-grid regimes where a blocked kernel pays off).
    if (not _FORCE_FALLBACK and _on_tpu()
            and os.environ.get("TPUCDC_PALLAS_ATTN") == "1"):
        from tpucdc.ops.pallas.flash_attention import flash_attention_pallas
        out = flash_attention_pallas(q, k, v, scale)
        if out is not None:  # None => shape not supported by the kernel
            return out
    return attention_reference(q, k, v, scale)


def attention_reference(q, k, v, scale=None):
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights.astype(q.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)
