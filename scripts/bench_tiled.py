"""High-res tiled decode benchmark (BASELINE.json:10: CLIC2020-like tiled
decode). Measures the full bitstream→image path for a 1024×1536 image through
CodecRuntime.decompress_tiled on one chip: the tile batch runs as ONE scan
program (batched tiles), halos blend on host.

Prints one JSON line per (tile, halo) config. Run on the real TPU.
"""

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent))
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpucdc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np

from tpucdc import presets
from tpucdc.data.datasets import synthetic_images_rich
from tpucdc.model import init_model
from tpucdc.pipelines.codec_runtime import CodecRuntime

H, W = 1024, 1536          # CLIC2020-scale (BASELINE.json:10)


def main(steps=100):
    cfg = presets.flagship()
    model, params = init_model(cfg.model, jax.random.key(0), image_size=256)
    rt = CodecRuntime(cfg, model, params)
    img = synthetic_images_rich(1, H, W, seed=5)[0]
    blob = rt.compress(img)
    bpp = len(blob) * 8 / (H * W)

    for tile, halo in ((256, 32), (448, 32)):
        out = rt.decompress_tiled(blob, tile=tile, halo=halo, steps=steps)
        assert out.shape == (H, W, 3)
        np.asarray(out)
        t0 = time.perf_counter()
        out = rt.decompress_tiled(blob, tile=tile, halo=halo, steps=steps)
        np.asarray(out)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": "clic1024x1536_tiled_decode", "tile": tile,
            "halo": halo, "steps": steps, "bpp_randinit": round(bpp, 4),
            "value": round(dt, 3), "unit": "s",
        }), flush=True)


if __name__ == "__main__":
    main()
