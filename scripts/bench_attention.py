"""Attention dispatch decision benchmark (VERDICT r1 item 4).

Round-1 profiling showed XLA beats the Pallas flash kernel at the flagship's
single-image shapes (B=1, N≤1536). The hypothesis for where Pallas pays:
BATCHED decode (tiled high-res / shard_map batches) where XLA materializes
the [B·H, N, N] logits in HBM — at B=8, H=4, N=6144 that is ~4.8 GB of
traffic vs ~75 MB of Q/K/V reads for the blocked kernel.

Run on the real TPU; writes JSON rows and prints a dispatch recommendation.
Each (shape, impl) is ONE new HLO → compiles are the cost; keep the shape
list short and rely on the persistent compile cache.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpucdc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

from tpucdc.ops.attention import attention_reference
from tpucdc.ops.pallas.flash_attention import flash_attention_pallas

HEADS, DIM = 4, 64
# (batch, tokens): flagship single-image L2/L3 + tiled/batched regimes.
SHAPES = [(1, 1536), (8, 1536), (8, 6144)]


def bench(fn, *args, iters=20):
    out = fn(*args)
    np.asarray(out)                      # force completion (axon relay)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def main():
    rows = []
    for b, n in SHAPES:
        q, k, v = (jax.random.normal(jax.random.key(i), (b, HEADS, n, DIM),
                                     jnp.bfloat16) for i in range(3))
        scale = DIM ** -0.5
        xla = jax.jit(lambda q, k, v: attention_reference(q, k, v, scale))
        t_xla = bench(xla, q, k, v)
        t_pal = None
        if flash_attention_pallas(q, k, v, scale) is not None:
            pal = jax.jit(lambda q, k, v: flash_attention_pallas(q, k, v,
                                                                 scale))
            t_pal = bench(pal, q, k, v)
            err = float(jnp.max(jnp.abs(
                (pal(q, k, v) - xla(q, k, v)).astype(jnp.float32))))
        else:
            err = None
        row = {"batch": b, "tokens": n,
               "logits_mb": round(b * HEADS * n * n * 4 / 2**20, 1),
               "xla_ms": round(t_xla * 1e3, 3),
               "pallas_ms": round(t_pal * 1e3, 3) if t_pal else None,
               "max_abs_err": err,
               "winner": ("pallas" if t_pal and t_pal < t_xla else "xla")}
        rows.append(row)
        print(json.dumps(row), flush=True)
    print("RESULT " + json.dumps(rows))


if __name__ == "__main__":
    main()
