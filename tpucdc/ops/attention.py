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
# f32-score bytes above which the blocked Pallas kernel is the default on
# TPU (see dispatch note in attention()).
_PALLAS_MIN_SCORE_BYTES = 1 << 30


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
    # Dispatch (PERF.md r1+r2 bisections):
    #  * small/medium token counts (flagship single-image: B=1, N≤1536;
    #    batched B=8, N=1536) — XLA's fused attention wins (3.1 vs 3.3 ms;
    #    13.7 vs 17.1 ms), so XLA stays the default there.
    #  * LARGE logits (batched/tiled decode) — XLA materializes the
    #    [B·H, Nq, Nk] scores in HBM; the blocked Pallas kernel streams
    #    them. Measured r2 on v5e: B=8, H=4, N=6144 (4.6 GB of scores)
    #    Pallas 62.5 ms vs XLA 390.0 ms — 6.2× — so Pallas is the DEFAULT
    #    once the score tensor passes _PALLAS_MIN_SCORE_BYTES (1 GiB).
    # TPUCDC_PALLAS_ATTN=1 forces Pallas for any supported shape; =0
    # forces the XLA reference everywhere.
    env = os.environ.get("TPUCDC_PALLAS_ATTN")
    score_bytes = q.shape[0] * q.shape[1] * q.shape[2] * k.shape[2] * 4
    want_pallas = (env == "1" or
                   (env != "0" and score_bytes >= _PALLAS_MIN_SCORE_BYTES))
    if not _FORCE_FALLBACK and _on_tpu() and want_pallas:
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
