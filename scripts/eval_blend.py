"""Distortion-perception BLEND dial on trained refiner checkpoints (r3).

The residual refiner's 10-step truncated decode beats the mean decode at
λ=128 but loses at λ=512 (RESULTS.md r3): the refiner net has its own
reconstruction floor (~28 dB at eval resolution), so at high rate full
refinement drags PSNR/MS-SSIM below g_s alone. The canonical fix (Yang &
Mandt, NeurIPS 2023 — the CDC line this repo's name places it in) is a
convex decode-time combination of the two decoders:

    x̂(γ) = x̄ + γ · (x_refined − x̄),   γ ∈ [0, 1]

γ=0 is the mean decode exactly, γ=1 the full refinement; intermediate γ
trades the refiner's texture against its error floor. Blending happens on
HOST float32 over the two already-compiled decode programs — zero new HLOs
(each new HLO costs 5-15 min over the axon tunnel, CLAUDE.md).

For each λ checkpoint in a train_rd_sweep workdir this sweeps γ over the
serving refinement mode(s) and prints one BLEND json row per
(λ, mode, γ): the table that picks the per-rate serving γ.

Usage:
  python scripts/eval_blend.py --workdir /root/r3res --lambdas 32,128,512,2048 \
      --wide --prediction residual
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

from tpucdc.eval.lpips import PerceptualMetric
from tpucdc.eval.metrics import gmsd, ms_ssim, psnr
from tpucdc.pipelines.codec_runtime import CodecRuntime
from tpucdc.pipelines.train import create_state
from tpucdc.utils import CheckpointManager, MetricLogger

from train_rd_sweep import build_eval_config, split_eval_images

# (tag, steps, truncate_frac) refinement modes to blend against the mean.
MODES = (("trunc0.3-s10", 10, 0.3), ("trunc0.15-s5", 5, 0.15))
GAMMAS = (0.25, 0.5, 0.75, 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/root/r3res")
    ap.add_argument("--lambdas", default="32,128,512,2048")
    ap.add_argument("--wide", action="store_true")
    ap.add_argument("--prediction", default="residual",
                    choices=["eps", "x0", "residual"])
    ap.add_argument("--unet", default="medium", choices=["medium", "lane128"],
                    help="UNet width variant — must match the checkpoint")
    ap.add_argument("--params-npz", default="",
                    help="EMA-params .npz fallback (scripts/"
                         "export_flagship_params.py) used when the orbax "
                         "run dir died with a box reset; single-λ runs "
                         "only")
    ap.add_argument("--split", default="holdout",
                    choices=["holdout", "train", "all"],
                    help="eval image split (VERDICT r3 weak 4: report both)")
    args = ap.parse_args()

    base = build_eval_config(args.wide, args.unet, args.prediction)

    work = pathlib.Path(args.workdir)
    logger = MetricLogger(work / "blend", use_clu=False, echo=False)
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

        for tag, steps, tfrac in MODES:
            cfg = dataclasses.replace(base, sample=dataclasses.replace(
                base.sample, truncate_frac=tfrac))
            rt = CodecRuntime(cfg, model, ema)
            # metric lists per γ (plus the γ=0 mean anchor)
            acc = {g: [] for g in (0.0,) + GAMMAS}
            bpps = []
            for i, img in enumerate(images):
                blob = rt.compress(img)
                bpps.append(len(blob) * 8 / (img.shape[0] * img.shape[1]))
                mean = np.asarray(rt.decompress(
                    blob, rng=jax.random.key(1), steps=0)).astype(np.float32)
                ref = np.asarray(rt.decompress(
                    blob, rng=jax.random.key(1),
                    steps=steps)).astype(np.float32)
                for g in acc:
                    x = np.clip(mean + g * (ref - mean) + 0.5,
                                0, 255).astype(np.uint8)
                    row = {"lambda": lam, "mode": tag, "gamma": g,
                           "split": args.split, "image": i,
                           "psnr": round(psnr(img, x), 3),
                           "ms_ssim": round(ms_ssim(img, x), 5),
                           "gmsd": round(gmsd(img, x), 6),
                           "lpips_proxy": round(lpips_fn(img, x), 6)}
                    acc[g].append(row)
                    logger.write_row(row)
                    print("BLENDIMG " + json.dumps(row), flush=True)
            for g, rows in acc.items():
                # Per-image spread (VERDICT r3 weak 4): report the σ of each
                # metric AND the paired per-image delta vs the γ=0 mean
                # decode — the serving-γ margins are adjudicated against the
                # paired spread (same image, same bitstream), which is the
                # noise that matters, not the across-image spread.
                def stats(key, r0):
                    v = np.array([r[key] for r in rows], np.float64)
                    d = v - np.array([r[key] for r in r0], np.float64)
                    return (float(v.mean()), float(v.std(ddof=1)),
                            float(d.mean()), float(d.std(ddof=1)))
                p_m, p_sd, dp_m, dp_sd = stats("psnr", acc[0.0])
                s_m, s_sd, ds_m, ds_sd = stats("ms_ssim", acc[0.0])
                l_m, l_sd, dl_m, dl_sd = stats("lpips_proxy", acc[0.0])
                g_m, g_sd, dg_m, dg_sd = stats("gmsd", acc[0.0])
                agg = {
                    "lambda": lam, "mode": tag, "gamma": g, "aggregate": True,
                    "split": args.split,
                    "num_images": len(rows),
                    "bpp": round(float(np.mean(bpps)), 4),
                    "psnr": round(p_m, 3), "psnr_sd": round(p_sd, 3),
                    "dpsnr_vs_mean": round(dp_m, 3),
                    "dpsnr_sd": round(dp_sd, 3),
                    "ms_ssim": round(s_m, 5), "ms_ssim_sd": round(s_sd, 5),
                    "dms_ssim_vs_mean": round(ds_m, 5),
                    "dms_ssim_sd": round(ds_sd, 5),
                    "lpips_proxy": round(l_m, 6),
                    "lpips_proxy_sd": round(l_sd, 6),
                    "dlpips_vs_mean": round(dl_m, 6),
                    "dlpips_sd": round(dl_sd, 6),
                    "gmsd": round(g_m, 6), "gmsd_sd": round(g_sd, 6),
                    "dgmsd_vs_mean": round(dg_m, 6),
                    "dgmsd_sd": round(dg_sd, 6),
                }
                logger.write_row(agg)
                print("BLEND " + json.dumps(agg), flush=True)
            # Oracle row (r4): per-image PSNR-argmax γ — what the in-band
            # dial (bitstream v3 + compress optimize_gamma, PSNR metric)
            # would serve. Zero extra decodes: computed from the per-image
            # rows above. The oracle-minus-best-fixed-γ gap is the measured
            # headroom of the per-image dial.
            n_img = len(acc[0.0])
            pick = [max((acc[g][i] for g in acc),
                        key=lambda r: r["psnr"]) for i in range(n_img)]
            oracle = {
                "lambda": lam, "mode": tag, "gamma": "oracle-psnr",
                "aggregate": True, "split": args.split,
                "num_images": n_img,
                "bpp": round(float(np.mean(bpps)), 4),
                "psnr": round(float(np.mean([r["psnr"] for r in pick])), 3),
                "ms_ssim": round(float(np.mean(
                    [r["ms_ssim"] for r in pick])), 5),
                "lpips_proxy": round(float(np.mean(
                    [r["lpips_proxy"] for r in pick])), 6),
                "gmsd": round(float(np.mean(
                    [r["gmsd"] for r in pick])), 6),
                "gamma_picks": [r["gamma"] for r in pick],
            }
            logger.write_row(oracle)
            print("BLEND " + json.dumps(oracle), flush=True)
    logger.close()


if __name__ == "__main__":
    main()
