"""Continuous-rate dial on a TRAINED VR checkpoint (r4).

The VR model trains at num_qualities discrete gain rows;
CodecRuntime.quality_gains interpolates adjacent rows in log domain so the
same model serves any rate in between (bitstream v4 carries the fractional
quality). This script measures, on the holdout split:

  1. The continuous R-D curve: bpp/PSNR/MS-SSIM over a fractional quality
     grid — do interpolated points land ON the curve traced by the trained
     ladder (smooth, monotone), or sag between them?
  2. Rate-control accuracy: compress_to_bpp against targets spanning the
     model's rate range — achieved-vs-target bpp error and probe count.

Device-program economics (CLAUDE.md): the fractional path adds ONE traced
gain analysis program and ONE traced inv-gain decode program per (steps)
setting — every fractional quality shares them, so the whole sweep costs
2-3 new HLO compiles, once, cached after.

Usage (after a train_vr_sweep run):
  python scripts/eval_vr_continuous.py --workdir /root/r4h_vr_wide --wide \
      --prediction residual --t-low 0.35,0.5
"""

import argparse
import dataclasses
import json
import pathlib
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpucdc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from tpucdc.eval.metrics import gmsd, ms_ssim, psnr
from tpucdc.pipelines import train as train_lib
from tpucdc.pipelines.codec_runtime import CodecRuntime
from tpucdc.utils import CheckpointManager, MetricLogger

from train_rd_sweep import holdout_eval_images
from train_vr_sweep import LAMBDAS, vr_sc_config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/root/r4h_vr_wide")
    ap.add_argument("--context", default="space-channel")
    ap.add_argument("--wide", action="store_true")
    ap.add_argument("--prediction", default="residual",
                    choices=["eps", "x0", "residual"])
    ap.add_argument("--t-low", default="0.35,0.5")
    ap.add_argument("--grid-per-seg", type=int, default=4,
                    help="fractional points per ladder segment")
    ap.add_argument("--steps", type=int, default=5,
                    help="serving refinement steps (0 = mean only)")
    ap.add_argument("--truncate", type=float, default=0.15)
    ap.add_argument("--gamma", type=float, default=0.5)
    ap.add_argument("--targets", default="",
                    help="comma-separated target bpps for the rate-control "
                         "check (default: 5 log-spaced inside the span)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/tpucdc_jax_cpu_cache")

    cfg = vr_sc_config(1000, 16, args.context, prediction=args.prediction,
                       t_low=args.t_low, wide=args.wide)
    cfg = dataclasses.replace(cfg, sample=dataclasses.replace(
        cfg.sample, truncate_frac=args.truncate))
    work = pathlib.Path(args.workdir)
    model, abstract = train_lib.create_state(cfg, jax.random.key(0))
    state = CheckpointManager(work / "ckpt").restore(abstract)
    print(f"restored step {int(state.step)}", flush=True)
    rt = CodecRuntime(cfg, model, state.ema_params)
    logger = MetricLogger(work / "continuous", use_clu=False, echo=False)
    images = holdout_eval_images()
    nq = cfg.model.codec.num_qualities

    # 1. Continuous R-D curve over the fractional grid.
    # float()/bool() casts: numpy 2's round(np.float64) stays np.float64,
    # so q != int(q) was an np.bool_ — json.dumps raised TypeError on the
    # first aggregate row (r5 queue try 1/2; 15 min of decode work lost
    # per try).
    qs = [float(round(q, 4)) for q in
          np.linspace(0, nq - 1, (nq - 1) * args.grid_per_seg + 1)]
    aggs = []
    for q in qs:
        rows = []
        for i, img in enumerate(images):
            blob = rt.compress(img, quality=q)
            recon = np.asarray(rt.decompress(
                blob, rng=jax.random.key(1), steps=args.steps,
                gamma=args.gamma))
            row = {"quality": q, "fractional": q != int(q), "image": i,
                   "mode": f"trunc{args.truncate:g}-s{args.steps}"
                           f"-g{args.gamma:g}",
                   "bpp": len(blob) * 8 / (img.shape[0] * img.shape[1]),
                   "psnr": psnr(img, recon), "ms_ssim": ms_ssim(img, recon),
                   "gmsd": round(gmsd(img, recon), 6)}
            rows.append(row)
            logger.write_row(row)
        agg = {"quality": q, "fractional": q != int(q), "aggregate": True,
               "mode": rows[0]["mode"],
               "bpp": float(np.mean([r["bpp"] for r in rows])),
               "psnr": float(np.mean([r["psnr"] for r in rows])),
               # per-image spread (r3 verdict weak 4: margins vs noise)
               "psnr_sd": round(float(np.std([r["psnr"] for r in rows])), 3),
               "ms_ssim": float(np.mean([r["ms_ssim"] for r in rows])),
               "gmsd": round(float(np.mean([r["gmsd"] for r in rows])), 6)}
        aggs.append(agg)
        logger.write_row(agg)
        print("AGG " + json.dumps(agg), flush=True)

    bpps = [a["bpp"] for a in aggs]
    mono = all(a < b for a, b in zip(bpps, bpps[1:]))
    print("CONT-RD " + json.dumps(
        {"monotone_bpp": mono, "span": round(bpps[-1] / max(bpps[0], 1e-9), 2),
         "lambdas": LAMBDAS, "points": len(aggs)}), flush=True)

    # 2. Rate-control accuracy: compress_to_bpp per image against targets.
    if args.targets:
        targets = [float(t) for t in args.targets.split(",")]
    else:
        targets = list(np.geomspace(bpps[0] * 1.15, bpps[-1] * 0.87, 5))
    import time
    rc_rows = []
    for probe in ("encode", "estimate"):
        for t in targets:
            for i, img in enumerate(images):
                t0 = time.time()
                blob, q, bpp = rt.compress_to_bpp(img, t, probe=probe)
                dt = time.time() - t0
                row = {"target_bpp": t, "quality": q, "bpp": bpp, "image": i,
                       "rate_control": True, "probe": probe,
                       "seconds": dt, "rel_err": abs(bpp - t) / t}
                rc_rows.append(row)
                logger.write_row(row)
            sel = [r for r in rc_rows
                   if r["target_bpp"] == t and r["probe"] == probe]
            print("RC " + json.dumps(
                {"probe": probe, "target_bpp": round(t, 4),
                 "mean_bpp": round(
                     float(np.mean([r["bpp"] for r in sel])), 4),
                 "mean_rel_err": round(
                     float(np.mean([r["rel_err"] for r in sel])), 4),
                 "max_rel_err": round(
                     float(np.max([r["rel_err"] for r in sel])), 4),
                 "mean_s": round(
                     float(np.mean([r["seconds"] for r in sel])), 2)}),
                flush=True)
    logger.close()


if __name__ == "__main__":
    main()
