"""Batched decode throughput on one chip (denoise steps/sec, BASELINE.json:2):
one scan over a batch of conditioning latents amortizes dispatch + weights
reads. Also exercises the batched sampler the v5e-8 shard_map path shards."""

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent))
import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpucdc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np

from tpucdc import presets
from tpucdc.model import CDCModel, init_model


def main(steps=100):
    cfg = presets.flagship()
    model, params = init_model(cfg.model, jax.random.key(0), image_size=256)

    results = {}
    for batch in (1, 4):
        y_sym = jnp.zeros((batch, 32, 48, cfg.model.codec.latent_channels),
                          jnp.int32)
        means = jnp.zeros_like(y_sym, jnp.float32)

        from tpucdc.pipelines.codec_runtime import CodecRuntime
        rt = CodecRuntime(cfg, model, params)
        fn = rt._cached_sample_fn(steps, 0.0, "ddim")
        out = fn(params, y_sym, means, jax.random.key(0),
                 jnp.float32(1.0), jnp.float32(1.0), 512, 768)
        _ = np.asarray(out)
        t0 = time.perf_counter()
        out = fn(params, y_sym, means, jax.random.key(1),
                 jnp.float32(1.0), jnp.float32(1.0), 512, 768)
        _ = np.asarray(out)
        dt = time.perf_counter() - t0
        results[f"batch{batch}"] = {
            "s_per_image": round(dt / batch, 4),
            "denoise_steps_per_sec": round(steps * batch / dt, 1),
        }
    print(json.dumps({"metric": "batched_decode_throughput",
                      "steps": steps, **results}))


if __name__ == "__main__":
    main()
