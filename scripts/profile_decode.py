"""Stage-level wall-clock breakdown of the single-image decompress path.

The r4 serving decode is 0.197 s but its named parts (5-step scan ~27 ms,
host rANS ~21 ms pre-LUT) leave >100 ms unaccounted — this script times each
stage of CodecRuntime.decompress on the trained flagship so the remaining
host/RPC/transfer overhead gets a name (PERF.md r4; axon relay: every jit
call is an RPC, transfers ride the tunnel).

Stages per iteration (all HLOs are the serving executables — cached):
  parse+z   header parse, CRC, host z rANS decode
  hyper     z upload + h_s program + means/indexes FETCH (the forced host
            roundtrip: indexes feed the host y decoder)
  y_rans    host y rANS decode (LUT coder)
  dispatch  y upload + single-dispatch scan program + uint8 image fetch
Run on the real TPU with the flagship checkpoint (cached HLOs, ~2 min).
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpucdc")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp

    from bench import SPEC_PATH, _load_trained
    from tpucdc.data.datasets import synthetic_images
    from tpucdc.pipelines.codec_runtime import CodecRuntime

    trained = _load_trained(SPEC_PATH)
    if trained is None:
        raise SystemExit("no flagship checkpoint — run on the TPU box")
    cfg, model, params, serving = trained
    scfg = dataclasses.replace(cfg, sample=dataclasses.replace(
        cfg.sample, truncate_frac=float(serving.get("truncate_frac", 0.0)),
        blend_gamma=float(serving.get("gamma", 1.0))))
    rt = CodecRuntime(scfg, model, params)
    img = synthetic_images(1, 512, 768, seed=7)[0]
    blob = rt.compress(img)
    steps = int(serving.get("steps", 10))

    # Warm every executable through the public path first.
    rec = rt.decompress(blob, steps=steps)
    assert rec.shape == img.shape

    rows = []
    for _ in range(5):
        t = {}
        t0 = time.perf_counter()
        hdr, z_sym, y_bytes, (ph, pw) = rt._host_z_stage(blob)
        t["parse_z_s"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        means, indexes = rt._hyper_means_indexes(jnp.asarray(z_sym))
        indexes_h = np.asarray(indexes)          # forced fetch (host y decode)
        t["hyper_s"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        y_sym = rt.y_codec.decode(y_bytes, indexes_h)
        t["y_rans_s"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        fn = rt._cached_sample_fn(steps, scfg.sample.eta,
                                  scfg.sample.sampler, False,
                                  int(hdr.quality_id) if rt._nq > 1 else 0)
        x0 = fn(rt.params, jnp.asarray(y_sym), means, jax.random.key(0),
                jnp.float32(1.0), jnp.float32(scfg.sample.blend_gamma),
                ph, pw)
        img_out = np.asarray(x0)                  # forced fetch
        t["dispatch_s"] = time.perf_counter() - t0

        t["sum_s"] = sum(t.values())
        t0 = time.perf_counter()
        rt.decompress(blob, steps=steps)
        t["public_total_s"] = time.perf_counter() - t0
        rows.append(t)
        del img_out

    med = {k: round(float(np.median([r[k] for r in rows])), 4) for k in rows[0]}
    print(json.dumps({"stage_medians": med, "steps": steps,
                      "gamma": scfg.sample.blend_gamma,
                      "iters": len(rows)}))


if __name__ == "__main__":
    main()
