"""Headline benchmark: 768×512 single-image bitstream→image decode latency
on one TPU chip (BASELINE.md — target < 1 s for DDIM-100).

Round-3 semantics (VERDICT r2 weak 1 / item 3): when a trained flagship
checkpoint is available (artifacts/flagship.json spec, written by the
training sweep), the benchmark loads it and reports the SERVING-mode decode
(the mode a user would actually run — e.g. truncated 10-step refinement or
mean decode) as the headline, alongside the DDIM-100 full-chain row for
continuity with BENCH_r01/r02. Without a checkpoint it falls back to
random-init weights and the DDIM-100 headline, printing a loud flag
(latency is weight-independent; symbol statistics are not).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...rows}.
vs_baseline = target_seconds / measured_seconds (>1 means faster than the
1 s north-star; the reference publishes no numbers — BASELINE.json:13).
"""

from __future__ import annotations

import dataclasses
import json
import os
import pathlib
import sys
import time

SPEC_PATH = pathlib.Path(__file__).resolve().parent / "artifacts" / "flagship.json"

# Serialize against the builder's own TPU job queues (VERDICT r4 weak #1:
# BENCH_r04 regressed 2.8x because the driver ran bench while a training
# queue held the exclusive TPU grant + the single CPU core). Every queue job
# wraps itself in `flock` on this path (scripts/r5_queue.sh); bench blocks
# here until the chip is free.
TPU_LOCK = pathlib.Path("/tmp/tpucdc_tpu.lock")


def _acquire_tpu_lock(timeout_s: float = 10800.0, lock_path=None):
    """Block until the TPU job lock is free; returns the held fd (keep it
    alive for the whole measurement)."""
    import fcntl
    fd = os.open(lock_path or TPU_LOCK, os.O_CREAT | os.O_RDWR, 0o666)
    t0 = time.time()
    waited = False
    while True:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            if waited:
                print(f"# TPU lock acquired after {time.time() - t0:.0f}s",
                      file=sys.stderr)
            return fd
        except BlockingIOError:
            if not waited:
                print("# TPU lock held (a tpucdc queue job is running) — "
                      "waiting for the chip", file=sys.stderr)
                waited = True
            if time.time() - t0 > timeout_s:
                print("# TPU lock wait timed out — measuring anyway "
                      "(result may be contended)", file=sys.stderr)
                return fd
            time.sleep(min(10.0, max(0.05, timeout_s / 20)))


def _load_trained(spec_path):
    """Returns (cfg, model, params, serving) or None.

    The spec file (written by scripts/train_rd_sweep.py runs) records the
    checkpoint dir, the config recipe, and the serving decode mode:
      {"ckpt_dir": "...", "wide": true, "prediction": "x0",
       "unet": "medium", "serving": {"steps": 10, "truncate_frac": 0.3}}
    """
    import jax
    spec = json.loads(pathlib.Path(spec_path).read_text())
    ckpt_dir = spec["ckpt_dir"]
    npz_rel = spec.get("params_npz")
    npz_path = None
    if npz_rel:
        # The spec's params_npz is repo-root-relative; try the spec's own
        # repo root first, then bench.py's directory (ADVICE r4: a spec
        # loaded from elsewhere silently lost the NPZ fallback).
        for root in (pathlib.Path(spec_path).resolve().parent.parent,
                     pathlib.Path(__file__).resolve().parent):
            if (root / npz_rel).exists():
                npz_path = root / npz_rel
                break
    have_ckpt = os.path.isdir(ckpt_dir)
    if not have_ckpt and not (npz_path is not None and npz_path.exists()):
        return None
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent / "scripts"))
    from train_rd_sweep import build_eval_config

    from tpucdc.pipelines.train import create_state
    from tpucdc.utils import CheckpointManager

    base = build_eval_config(bool(spec.get("wide")),
                             spec.get("unet", "medium"),
                             spec.get("prediction", "x0"))
    model, abstract = create_state(base, jax.random.key(0))
    if have_ckpt:
        ema = CheckpointManager(ckpt_dir).restore(abstract).ema_params
    else:
        # The orbax run dir lives outside the repo and dies with a box
        # reset; the committed NPZ snapshot (scripts/export_flagship_params)
        # keeps the trained bench reproducible across resets/rounds.
        from tpucdc.utils.checkpoint import load_params_npz
        ema = load_params_npz(npz_path, abstract.ema_params)
    return base, model, ema, spec.get(
        "serving", {"steps": 10, "truncate_frac": 0.3})


def main():
    _lock_fd = _acquire_tpu_lock()  # held (leaked) until process exit
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpucdc")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import numpy as np

    from tpucdc import presets
    from tpucdc.data.datasets import synthetic_images
    from tpucdc.eval.harness import time_decode
    from tpucdc.model import init_model
    from tpucdc.pipelines.codec_runtime import CodecRuntime

    trained = None
    if SPEC_PATH.exists():
        try:
            trained = _load_trained(SPEC_PATH)
        except Exception as e:  # fall back loudly, never fail the bench
            print(f"# flagship checkpoint load failed: {e!r}", file=sys.stderr)

    img = synthetic_images(1, 512, 768, seed=7)[0]
    target = 1.0

    if trained is not None:
        cfg, model, params, serving = trained
        scfg = dataclasses.replace(cfg, sample=dataclasses.replace(
            cfg.sample, truncate_frac=float(serving.get("truncate_frac", 0.0)),
            blend_gamma=float(serving.get("gamma", 1.0))))
        runtime = CodecRuntime(scfg, model, params)
        blob = runtime.compress(img)
        serve_steps = int(serving.get("steps", 10))
        t_serve = time_decode(runtime, blob, steps=serve_steps,
                              warmup=1, iters=3)
        # Contention self-check (VERDICT r4 task 2): the spec carries the
        # expected serving latency from the PERF.md record. If the median
        # lands >1.5x over it, something else is loading the box (the flock
        # above stops tpucdc queues, but not arbitrary processes) — wait,
        # re-measure once, and flag the result loudly if it persists.
        spec = json.loads(SPEC_PATH.read_text())
        expected = float(spec.get("expected_serving_s", 0.0))
        contended = None
        if expected > 0 and t_serve["decode_s_median"] > 1.5 * expected:
            first = t_serve["decode_s_median"]
            print(f"# serving median {first:.3f}s > 1.5x expected "
                  f"{expected:.3f}s — re-measuring once in 60s",
                  file=sys.stderr)
            time.sleep(60)
            t_serve = time_decode(runtime, blob, steps=serve_steps,
                                  warmup=1, iters=3)
            contended = {
                "contended": t_serve["decode_s_median"] > 1.5 * expected,
                "first_measure_s": round(first, 4),
                "expected_serving_s": expected,
            }
        # Continuity row: the r01/r02 full-chain DDIM-100 semantics — a
        # separate runtime with truncate_frac=0 and γ=1 (ADVICE r3: the r3
        # row spanned the TRUNCATED chain under the serving config). The
        # step tables are traced inputs, so this runtime shares the
        # compiled scan-100 executable — no new HLO.
        fcfg = dataclasses.replace(cfg, sample=dataclasses.replace(
            cfg.sample, truncate_frac=0.0, blend_gamma=1.0))
        full_rt = CodecRuntime(fcfg, model, params)
        t_full = time_decode(full_rt, blob, steps=100, warmup=1, iters=3)
        value = t_serve["decode_s_median"]
        row = {
            "metric": "kodak768x512_trained_serving_decode_latency",
            "value": round(value, 4),
            "unit": "s",
            "vs_baseline": round(target / value, 3),
            "weights": "trained",
            "serving_mode": {"steps": serve_steps,
                             "truncate_frac": scfg.sample.truncate_frac,
                             "gamma": scfg.sample.blend_gamma},
            "ddim100_fullchain_decode_s": round(t_full["decode_s_median"], 4),
        }
        if contended is not None:
            row.update(contended)
        print(json.dumps(row))
        return

    steps = 100
    cfg = presets.flagship()
    model, params = init_model(cfg.model, jax.random.key(0), image_size=256)
    runtime = CodecRuntime(cfg, model, params)
    blob = runtime.compress(img)
    t = time_decode(runtime, blob, steps=steps, warmup=1, iters=3)
    value = t["decode_s_median"]
    print(json.dumps({
        "metric": "kodak768x512_ddim100_decode_latency",
        "value": round(value, 4),
        "unit": "s",
        "vs_baseline": round(target / value, 3),
        "weights": "random-init (no artifacts/flagship.json checkpoint)",
    }))


if __name__ == "__main__":
    sys.exit(main())
