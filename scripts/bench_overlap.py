"""Host/TPU overlap benchmark (SURVEY.md §7 hard-part 5; §2.3 last row).

Measures batch decode throughput: sequential decompress() vs the
software-pipelined decompress_many() where host entropy decode of image i+1
overlaps the device DDIM scan of image i. ``--context space-channel`` runs
the context-model variant (round 2: symbol decode of i+1 runs on the host
CPU backend in a worker thread — codec_runtime._decompress_many_ctx)."""

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent))
import argparse
import dataclasses
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpucdc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np

from tpucdc import presets
from tpucdc.data.datasets import synthetic_images
from tpucdc.model import init_model
from tpucdc.pipelines.codec_runtime import CodecRuntime


def main(n_images=6, steps=25, context="hyperprior"):
    cfg = presets.flagship()
    if context != "hyperprior":
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, codec=dataclasses.replace(
                cfg.model.codec, context=context, context_groups=4)))
        cfg = cfg.validated()
    model, params = init_model(cfg.model, jax.random.key(0), image_size=256)
    runtime = CodecRuntime(cfg, model, params)

    imgs = synthetic_images(n_images, 512, 768, seed=11)
    blobs = [runtime.compress(im) for im in imgs]   # also warms encode HLOs

    enc_rows = {}
    if context == "hyperprior":
        # Encode-side overlap (r4 compress_many): host rANS of image i
        # runs while the device computes g_a/h_s of image i+1.
        t0 = time.perf_counter()
        for im in imgs:
            runtime.compress(im)
        enc_seq = time.perf_counter() - t0
        t0 = time.perf_counter()
        blobs2 = runtime.compress_many(imgs)
        enc_pipe = time.perf_counter() - t0
        assert blobs2 == blobs, "compress_many must be bit-exact"
        enc_rows = {
            "encode_sequential_s_per_img": round(enc_seq / n_images, 4),
            "encode_pipelined_s_per_img": round(enc_pipe / n_images, 4),
            "encode_speedup": round(enc_seq / enc_pipe, 3),
        }

    # Warm both decode paths (compile).
    runtime.decompress(blobs[0], steps=steps)

    t0 = time.perf_counter()
    for b in blobs:
        runtime.decompress(b, steps=steps)
    seq = time.perf_counter() - t0

    t0 = time.perf_counter()
    outs = runtime.decompress_many(blobs, steps=steps)
    pipe = time.perf_counter() - t0
    assert len(outs) == n_images

    print(json.dumps({
        "metric": "batch_decode_overlap_speedup",
        "context": context,
        "sequential_s_per_img": round(seq / n_images, 4),
        "pipelined_s_per_img": round(pipe / n_images, 4),
        "speedup": round(seq / pipe, 3),
        "steps": steps,
        **enc_rows,
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=6)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--context", default="hyperprior",
                    choices=["hyperprior", "checkerboard", "channel-ar",
                             "space-channel"])
    a = ap.parse_args()
    main(a.images, a.steps, a.context)
