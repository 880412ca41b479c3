"""Measure the IN-BAND per-image serving dial end-to-end on trained weights.

r4 shipped bitstream v3 + `compress(optimize_gamma=True)`: the encoder
sweeps γ over the serving decode, writes the per-image PSNR-argmax into the
header, and decoders serve it with no out-of-band table. The eval_blend
oracle rows bound the headroom (+0.03/+0.09 dB PSNR at λ=32/128 over the
best fixed γ); this script measures what the REAL dial delivers through the
full compress(optimize_gamma=True) → header → decompress() path, against
(a) the flagship per-rate fixed γ and (b) the γ=0 mean anchor.

All decodes reuse the serving executables (γ is traced; optimize_gamma is
K extra dispatches, zero new HLOs) — cached-HLO TPU job, ~15 min.

Usage:
  python scripts/eval_inband_gamma.py --workdir /root/r3res --lambdas 32,128
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

from tpucdc.entropy import read_bitstream
from tpucdc.eval.lpips import PerceptualMetric
from tpucdc.eval.metrics import gmsd, ms_ssim, psnr
from tpucdc.pipelines.codec_runtime import CodecRuntime
from tpucdc.pipelines.train import create_state
from tpucdc.utils import CheckpointManager, MetricLogger

from train_rd_sweep import build_eval_config, split_eval_images

# Flagship serving mode (artifacts/flagship.json): the in-band search and
# every decode below run under it, so γ is the ONLY variable.
STEPS, TFRAC = 5, 0.15
FIXED_GAMMA = {32.0: 0.5, 128.0: 0.5, 512.0: 0.0, 2048.0: 0.0}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/root/r3res")
    ap.add_argument("--lambdas", default="32,128,512,2048")
    ap.add_argument("--wide", action=argparse.BooleanOptionalAction,
                    default=True, help="--no-wide for medium-width (N=64) "
                                       "checkpoints")
    ap.add_argument("--prediction", default="residual")
    ap.add_argument("--unet", default="medium")
    ap.add_argument("--split", default="holdout")
    ap.add_argument("--params-npz", default="",
                    help="EMA-params .npz fallback when the orbax run dir "
                         "died with a box reset; single-λ runs only")
    args = ap.parse_args()

    base = build_eval_config(args.wide, args.unet, args.prediction)
    base = dataclasses.replace(base, sample=dataclasses.replace(
        base.sample, steps=STEPS, truncate_frac=TFRAC))

    work = pathlib.Path(args.workdir)
    logger = MetricLogger(work / "inband_gamma", use_clu=False, echo=False)
    lpips_fn = PerceptualMetric()
    images = split_eval_images(args.split)

    for lam_s in args.lambdas.split(","):
        lam = float(lam_s)
        ckpt_dir = work / f"lambda{lam:g}" / "ckpt"
        model, abstract = create_state(base, jax.random.key(0))
        if ckpt_dir.is_dir():
            state = CheckpointManager(ckpt_dir).restore(abstract)
            ema = state.ema_params
            print(f"# λ={lam:g}: restored step {int(state.step)}", flush=True)
        elif args.params_npz:
            from tpucdc.utils.checkpoint import load_params_npz
            ema = load_params_npz(args.params_npz, abstract.ema_params)
            print(f"# λ={lam:g}: loaded {args.params_npz}", flush=True)
        else:
            raise SystemExit(f"no checkpoint at {ckpt_dir} and no "
                             f"--params-npz fallback")
        rt = CodecRuntime(base, model, ema)
        fixed_g = FIXED_GAMMA.get(lam, 0.5)

        per = {"spatial": [], "inband": [], "fixed": [], "mean": []}
        gammas, bpps, grids = [], [], []
        for i, img in enumerate(images):
            # ONE encode with the spatial fit (r5): its scalar-fallback γ
            # field carries the scalar argmax, so the v3-style "inband"
            # kind decodes from the same stream at no extra search cost.
            blob = rt.compress(img, optimize_gamma="spatial")
            hdr, _ = read_bitstream(blob)
            g_hdr = hdr.gamma_or_none
            gammas.append(g_hdr)
            grids.append(None if hdr.gamma_grid is None
                         else [int(v) for v in hdr.gamma_grid.ravel()])
            bpps.append(len(blob) * 8 / (img.shape[0] * img.shape[1]))
            recs = {
                "spatial": rt.decompress(blob),       # grid if kept, else γ
                "inband": rt.decompress(blob, gamma=g_hdr),   # scalar pick
                "fixed": rt.decompress(blob, gamma=fixed_g),
                "mean": rt.decompress(blob, steps=0),
            }
            for kind, x in recs.items():
                row = {"lambda": lam, "kind": kind, "split": args.split,
                       "image": i, "gamma_hdr": g_hdr,
                       "grid_kept": grids[-1] is not None,
                       "psnr": round(psnr(img, x), 3),
                       "ms_ssim": round(ms_ssim(img, x), 5),
                       "gmsd": round(gmsd(img, x), 6),
                       "lpips_proxy": round(lpips_fn(img, x), 6)}
                per[kind].append(row)
                logger.write_row(row)
                print("INBANDIMG " + json.dumps(row), flush=True)

        for kind, rows in per.items():
            def stats(key, r0):
                v = np.array([r[key] for r in rows], np.float64)
                d = v - np.array([r[key] for r in r0], np.float64)
                return (float(v.mean()), float(v.std(ddof=1)),
                        float(d.mean()), float(d.std(ddof=1)))
            p_m, p_sd, dp_m, dp_sd = stats("psnr", per["fixed"])
            s_m, s_sd, ds_m, ds_sd = stats("ms_ssim", per["fixed"])
            l_m, l_sd, dl_m, dl_sd = stats("lpips_proxy", per["fixed"])
            g_m, g_sd, dg_m, dg_sd = stats("gmsd", per["fixed"])
            agg = {"lambda": lam, "kind": kind, "aggregate": True,
                   "split": args.split, "num_images": len(rows),
                   "fixed_gamma": fixed_g,
                   "bpp": round(float(np.mean(bpps)), 4),
                   "hdr_gammas": gammas,
                   "grids_kept": sum(g is not None for g in grids),
                   "psnr": round(p_m, 3), "psnr_sd": round(p_sd, 3),
                   "dpsnr_vs_fixed": round(dp_m, 3),
                   "dpsnr_sd": round(dp_sd, 3),
                   "ms_ssim": round(s_m, 5),
                   "dms_ssim_vs_fixed": round(ds_m, 5),
                   "lpips_proxy": round(l_m, 6),
                   "dlpips_vs_fixed": round(dl_m, 6),
                   "gmsd": round(g_m, 6),
                   "dgmsd_vs_fixed": round(dg_m, 6)}
            logger.write_row(agg)
            print("INBAND " + json.dumps(agg), flush=True)


if __name__ == "__main__":
    main()
