"""Variable-rate × space-channel context training run (VERDICT r1 item 6 end
state): ONE medium model with gain units over a 3-point λ grid AND the
strongest (space-channel) context entropy model, trained on the real-image
corpus, then evaluated per quality_id on the holdout split with real rANS
bitstreams. Done-bar: per-quality bpp spread ≥ 2× with PSNR ordered by λ.

Usage:
  python scripts/train_vr_sweep.py --steps 15000 --workdir /root/vr_sweep
"""

import argparse
import dataclasses
import json
import pathlib
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpucdc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from tpucdc.data.datasets import train_crop_iterator, training_corpus
from tpucdc.eval.metrics import gmsd, ms_ssim, psnr
from tpucdc.pipelines import train as train_lib
from tpucdc.pipelines.codec_runtime import CodecRuntime
from tpucdc.runtime import make_mesh
from tpucdc.utils import CheckpointManager, MetricLogger

from train_rd_sweep import holdout_eval_images
from train_tpu_demo import medium

LAMBDAS = (16.0, 128.0, 1024.0)


def vr_sc_config(steps: int, batch: int, context: str = "space-channel",
                 dispatch: int = 1, prediction: str = "eps",
                 t_low: str = "", lpips_weight: float = 0.0,
                 wide: bool = False):
    cfg = medium()
    codec = dataclasses.replace(cfg.model.codec, num_qualities=len(LAMBDAS),
                                context=context, context_groups=4)
    if wide:
        # Flagship-wide transforms (mirrors train_rd_sweep.build_eval_config;
        # r5 item: close the medium-vs-wide capacity gap on the VR model).
        codec = dataclasses.replace(codec, hidden_channels=128,
                                    latent_channels=192, hyper_channels=128)
    model = dataclasses.replace(cfg.model, codec=codec,
                                prediction=prediction)
    if t_low:
        # Low-t-biased timestep sampling (the flagship's refiner recipe):
        # concentrate training on the noise range truncated serving visits.
        frac, prob = (float(v) for v in t_low.split(","))
        model = dataclasses.replace(model, t_low_frac=frac, t_low_prob=prob)
    train = dataclasses.replace(
        cfg.train, rd_lambdas=LAMBDAS, batch_size=batch, distortion="both",
        steps=steps, warmup_steps=min(500, max(steps // 10, 50)),
        steps_per_dispatch=dispatch, lpips_weight=lpips_weight,
        checkpoint_every=5000)
    return dataclasses.replace(cfg, model=model, train=train).validated()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=15000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--eval-steps", type=int, default=50)
    ap.add_argument("--context", default="space-channel")
    ap.add_argument("--workdir", default="/root/vr_sweep")
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--dispatch", type=int, default=16,
                    help="optimizer steps per device dispatch (r3)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (eval-only while the TPU "
                         "grant is held elsewhere; the axon sitecustomize "
                         "outranks JAX_PLATFORMS — CLAUDE.md)")
    ap.add_argument("--prediction", default="eps",
                    choices=["eps", "x0", "residual"],
                    help="refiner parameterization (flagship: residual)")
    ap.add_argument("--t-low", default="",
                    help="frac,prob low-t bias, e.g. 0.35,0.5")
    ap.add_argument("--lpips-weight", type=float, default=0.0)
    ap.add_argument("--wide", action="store_true",
                    help="flagship-wide codec transforms (r5: capacity gap)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/tpucdc_jax_cpu_cache")

    cfg = vr_sc_config(args.steps, args.batch, args.context, args.dispatch,
                       args.prediction, args.t_low, args.lpips_weight,
                       args.wide)
    work = pathlib.Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)
    logger = MetricLogger(work / "eval", use_clu=False, echo=False)
    ckpt = CheckpointManager(work / "ckpt")

    if not args.eval_only:
        corpus = training_corpus(n_synthetic=48, size=384, seed=11)
        data = train_crop_iterator(corpus, cfg.train.batch_size,
                                   cfg.train.crop_size, seed=3, as_uint8=True)
        tlog = MetricLogger(work / "logs", use_clu=False, echo=False)
        t0 = time.time()

        def writer(step, m):
            tlog.write_row({"step": step, **m})
            if step % 500 == 0:
                print(f"step {step} loss={m['loss']:.4f} bpp={m['bpp']:.4f} "
                      f"mse_x0={m['mse_x0']:.4f} "
                      f"({m['steps_per_sec']:.1f} it/s)", flush=True)

        model, state = train_lib.fit(
            cfg, data, mesh=make_mesh(n_data=1), writer=writer,
            checkpointer=lambda s, st: ckpt.save(s, st),
            num_steps=args.steps)
        ckpt.save(int(state.step), state, wait=True)
        print(f"trained {args.steps} steps in {time.time() - t0:.0f}s",
              flush=True)
        tlog.close()
    else:
        model, abstract = train_lib.create_state(cfg, jax.random.key(0))
        state = ckpt.restore(abstract)
        print(f"restored step {int(state.step)}", flush=True)

    # Decode-mode menu (r4 session-4 fix): the original eval decoded with
    # decompress(steps=50) — the full-chain ε decode DISOWNED in r2
    # (BASELINE.md retired table: 10.8-11.0 dB) — and reported ~9.5 dB,
    # which the r4d queue recorded as a VR failure. The model was fine:
    # its MEAN decode (the decode r2's VR table used) scores 27.6/32.5/
    # 35.7 dB per quality on the probe image. Eval now mirrors the
    # flagship serving menu: mean (the R-D anchor) + truncated
    # refinement with the γ blend.
    modes = (("mean", 0, 0.0, 0.0),
             ("trunc0.15-s5-g0.5", 5, 0.15, 0.5),
             ("trunc0.15-s5-g1", 5, 0.15, 1.0))
    aggs = []
    for mode, msteps, tfrac, gamma in modes:
        mcfg = dataclasses.replace(cfg, sample=dataclasses.replace(
            cfg.sample, truncate_frac=tfrac))
        rt = CodecRuntime(mcfg, model, state.ema_params)
        for q, lam in enumerate(LAMBDAS):
            rows = []
            for i, img in enumerate(holdout_eval_images()):
                blob = rt.compress(img, quality_id=q)
                recon = np.asarray(rt.decompress(
                    blob, rng=jax.random.key(1), steps=msteps, gamma=gamma))
                row = {"quality": q, "lambda": lam, "image": i, "mode": mode,
                       "bpp": len(blob) * 8 / (img.shape[0] * img.shape[1]),
                       "psnr": psnr(img, recon),
                       "ms_ssim": ms_ssim(img, recon),
                       "gmsd": round(gmsd(img, recon), 6)}
                rows.append(row)
                logger.write_row(row)
            agg = {"quality": q, "lambda": lam, "aggregate": True,
                   "mode": mode,
                   "bpp": float(np.mean([r["bpp"] for r in rows])),
                   "psnr": float(np.mean([r["psnr"] for r in rows])),
                   "ms_ssim": float(np.mean([r["ms_ssim"] for r in rows])),
                   "gmsd": round(float(np.mean(
                       [r["gmsd"] for r in rows])), 6)}
            if mode == "mean":
                aggs.append(agg)
            logger.write_row(agg)
            print("AGG " + json.dumps(agg), flush=True)
    spread = aggs[-1]["bpp"] / max(aggs[0]["bpp"], 1e-9)
    print("VR-RD " + json.dumps({"rows": aggs, "bpp_spread": round(spread, 2)}))
    logger.close()


if __name__ == "__main__":
    main()
