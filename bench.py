"""Headline benchmark: 768×512 single-image diffusion decode latency,
DDIM-100 on one TPU chip (BASELINE.md — target < 1 s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = target_seconds / measured_seconds (>1 means faster than the
1 s north-star; the reference publishes no numbers — BASELINE.json:13).
"""

from __future__ import annotations

import json
import sys
import time


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpucdc")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax
    import numpy as np

    from tpucdc import presets
    from tpucdc.data.datasets import synthetic_images
    from tpucdc.eval.harness import time_decode
    from tpucdc.model import init_model
    from tpucdc.pipelines.codec_runtime import CodecRuntime

    steps = 100
    cfg = presets.flagship()
    model, params = init_model(cfg.model, jax.random.key(0), image_size=256)
    runtime = CodecRuntime(cfg, model, params)

    img = synthetic_images(1, 512, 768, seed=7)[0]
    blob = runtime.compress(img)

    t = time_decode(runtime, blob, steps=steps, warmup=1, iters=3)
    value = t["decode_s_median"]
    target = 1.0
    print(json.dumps({
        "metric": "kodak768x512_ddim100_decode_latency",
        "value": round(value, 4),
        "unit": "s",
        "vs_baseline": round(target / value, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
