"""R-D λ-grid training sweep on the real TPU (VERDICT r1 item 2).

Trains the medium model at each λ in the grid (sequentially — the TPU grant
is exclusive), checkpoints per λ, then evals each checkpoint on held-out REAL
images (bundled corpus holdout split) with real rANS bitstreams, writing
JSONL rows a monotone R-D curve can be read from.

Design choices driven by the axon environment (CLAUDE.md):
  * λ is a traced scalar in the train step (pipelines/train.py), so the whole
    grid shares ONE compiled executable — each new HLO costs 5-15 min here.
  * All eval decodes run at a single 384×512 crop shape → one decode HLO.
  * Every timing/sync forces a host transfer (np.asarray), never
    block_until_ready.

Usage:
  python scripts/train_rd_sweep.py --steps 1500 --lambdas 16,64,256,1024 \
      --workdir /tmp/tpucdc_rd_probe          # calibration probe
  python scripts/train_rd_sweep.py --steps 25000 --lambdas 64,256,1024 \
      --workdir /root/rd_sweep                # the real run
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

from tpucdc.data.datasets import (local_image_corpus, synthetic_images_rich,
                                  train_crop_iterator, training_corpus)
from tpucdc.eval.lpips import PerceptualMetric
from tpucdc.eval.metrics import gmsd, ms_ssim, psnr
from tpucdc.model import init_model
from tpucdc.pipelines import train as train_lib
from tpucdc.pipelines.codec_runtime import CodecRuntime
from tpucdc.runtime import make_mesh
from tpucdc.utils import CheckpointManager, MetricLogger

from train_tpu_demo import medium  # shared model config → shared HLOs


EVAL_H, EVAL_W = 384, 512          # single decode shape for every eval image


def apply_unet_variant(cfg, name: str):
    """UNet width variants for trained A/Bs (PERF.md r4 MFU lane table).

    ``medium`` is the r2/r3 trained arch (base 32, mult 1·2·3). ``lane128``
    carries the measured lane lever onto the trained serving arch: every
    level ≥128 channels so each conv feeds full 128-wide MXU lanes
    (lane128_mult1122 profiled at 27 % MFU vs 14 % — 2.3× FLOPs for +15 %
    wall clock). Same depth/attn placement/patch size as medium so the
    only variable is lane width.
    """
    if name == "medium":
        return cfg
    if name == "lane128":
        return dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, unet=dataclasses.replace(
                cfg.model.unet, base_channels=128, channel_mult=(1, 1, 2),
                groups=32)))
    # ValueError, not SystemExit: bench.py's never-fail-the-bench fallback
    # catches Exception only (a bad flagship.json "unet" must fall back to
    # random-init, not kill the bench with no JSON line).
    raise ValueError(f"unknown unet variant: {name}")


def build_eval_config(wide: bool, unet: str, prediction: str):
    """The shared model-config recipe every eval/bench surface must agree
    on (bench.py, eval_blend.py, eval_inband_gamma.py, this sweep): medium
    base, optionally flagship-wide codec transforms, the unet width
    variant, and the refiner prediction target. One definition so a new
    knob can't silently drift across the four call sites."""
    base = medium()
    if wide:
        base = dataclasses.replace(base, model=dataclasses.replace(
            base.model, codec=dataclasses.replace(
                base.model.codec, hidden_channels=128, latent_channels=192,
                hyper_channels=128)))
    base = apply_unet_variant(base, unet)
    return dataclasses.replace(base, model=dataclasses.replace(
        base.model, prediction=prediction))


def split_eval_images(split: str) -> list[np.ndarray]:
    """Center 384×512 crops of the REAL images in ``split`` ("holdout" |
    "train" | "all") + 2 rich synthetics. The train split is compressed by
    the SAME pipeline (eval on it measures codec fit, not generalization) —
    reported alongside holdout per VERDICT r3 weak 4 so serving decisions
    rest on more than 5 holdout images."""
    crops = []
    for im in local_image_corpus(split):
        h, w = im.shape[:2]
        if h < EVAL_H or w < EVAL_W:
            continue
        i0, j0 = (h - EVAL_H) // 2, (w - EVAL_W) // 2
        crops.append(im[i0:i0 + EVAL_H, j0:j0 + EVAL_W])
        # the big marble tile yields a second, disjoint crop
        if h >= 2 * EVAL_H:
            crops.append(im[-EVAL_H:, j0:j0 + EVAL_W])
    crops += synthetic_images_rich(2, EVAL_H, EVAL_W, seed=97)
    return crops


def holdout_eval_images() -> list[np.ndarray]:
    """The r2/r3 eval set: holdout-split crops + 2 synthetics."""
    return split_eval_images("holdout")


# Decode-mode menu for the final eval (mode, steps, truncate_frac, eta).
# Each distinct scan length is one decode HLO (tables are traced — η and
# truncation share the executable, PERF.md r2); this menu compiles ≤3.
EVAL_MODES = (
    ("mean", 0, 0.0, 0.0),
    ("trunc0.15-s5", 5, 0.15, 0.0),
    ("trunc0.3-s10", 10, 0.3, 0.0),
    ("trunc0.3-s10-eta1", 10, 0.3, 1.0),
    ("ddim-25", 25, 0.0, 0.0),
)


def eval_checkpoint(cfg, model, params, steps: int, logger, lam: float,
                    lpips_fn, modes=None) -> dict:
    """Eval the checkpoint across the decode-mode menu; returns the agg of
    the ``mean`` mode (the R-D anchor row). ``modes=None`` → mean + the
    legacy ``steps`` row (probe-compatible); ``modes="menu"`` → EVAL_MODES."""
    if modes == "menu":
        mode_list = EVAL_MODES
    elif modes is None:
        mode_list = (("mean", 0, 0.0, 0.0),
                     (f"ddim-{steps}", steps, 0.0, 0.0))
    else:
        mode_list = modes
    import dataclasses as _dc
    images = holdout_eval_images()
    agg_mean = None
    for mode, msteps, tfrac, eta in mode_list:
        mcfg = _dc.replace(cfg, sample=_dc.replace(
            cfg.sample, truncate_frac=tfrac, eta=eta))
        rt = CodecRuntime(mcfg, model, params)
        rows = []
        for i, img in enumerate(images):
            t0 = time.time()
            blob = rt.compress(img)
            recon = rt.decompress(blob, rng=jax.random.key(1), steps=msteps)
            recon = np.asarray(recon)
            row = {
                "lambda": lam, "image": i, "mode": mode,
                "bpp": len(blob) * 8 / (img.shape[0] * img.shape[1]),
                "psnr": psnr(img, recon), "ms_ssim": ms_ssim(img, recon),
                "gmsd": gmsd(img, recon),
                "lpips_proxy": lpips_fn(img, recon),
                "wall_s": round(time.time() - t0, 2),
            }
            rows.append(row)
            logger.write_row(row)
        agg = {
            "lambda": lam, "aggregate": True, "mode": mode,
            "bpp": float(np.mean([r["bpp"] for r in rows])),
            "psnr": float(np.mean([r["psnr"] for r in rows])),
            "ms_ssim": float(np.mean([r["ms_ssim"] for r in rows])),
            "gmsd": float(np.mean([r["gmsd"] for r in rows])),
            "lpips_proxy": float(np.mean([r["lpips_proxy"] for r in rows])),
        }
        logger.write_row(agg)
        print("AGGMODE " + json.dumps(agg), flush=True)
        if agg_mean is None:
            agg_mean = agg
    return agg_mean


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--lambdas", default="16,64,256,1024")
    ap.add_argument("--workdir", default="/tmp/tpucdc_rd_sweep")
    ap.add_argument("--eval-steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--crop", type=int, default=128,
                    help="training crop size (VERDICT r3 item 3: crop 192+ "
                         "raises the refiner's reconstruction floor at eval "
                         "resolution — the root-cause fix for the λ≥512 "
                         "rate-dependence)")
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="restore the latest checkpoint and train only the "
                         "REMAINING steps up to --steps. Lets a long run be "
                         "split into several processes: the axon relay leaks "
                         "host RAM ≈ bytes transferred per process (PERF.md) "
                         "— a 60k-step crop-192 run leaks ~106 GiB in one "
                         "process but ~53 GiB per 30k half.")
    ap.add_argument("--seg-steps", type=int, default=0,
                    help="max optimizer steps THIS process runs (0 = all "
                         "remaining). --steps stays the cosine-decay "
                         "horizon, so segments of one long run share the "
                         "LR schedule. Pair with --resume.")
    ap.add_argument("--no-eval", action="store_true",
                    help="skip the post-train eval (mid segments of a "
                         "--seg-steps split run)")
    ap.add_argument("--prediction", default="eps", choices=["eps", "x0", "residual"],
                    help="refiner parameterization; x0 pairs with "
                         "--distortion x0 (see PERF.md r2 decode modes)")
    ap.add_argument("--distortion", default="both",
                    choices=["eps", "x0", "both"])
    ap.add_argument("--unet", default="medium", choices=["medium", "lane128"],
                    help="UNet width variant (lane128 = the 27%%-MFU lane "
                         "lever, PERF.md r4)")
    ap.add_argument("--wide", action="store_true",
                    help="flagship-width codec transforms (N=128, M=192): "
                         "the high-rate fix — medium N=64 saturates ~28 dB "
                         "at 1 bpp (r2 curve)")
    ap.add_argument("--lpips-weight", type=float, default=0.0,
                    help="perceptual term on the refiner x0 prediction "
                         "(perception-distortion split, r3)")
    ap.add_argument("--t-low", default="",
                    help="frac,prob — low-t-biased timestep sampling, e.g. "
                         "0.35,0.5 (ModelConfig.t_low_*)")
    ap.add_argument("--eval-menu", action="store_true",
                    help="final eval runs the full decode-mode menu "
                         "(mean + truncated refiner variants)")
    ap.add_argument("--dispatch", type=int, default=1,
                    help="optimizer steps per device dispatch (lax.scan "
                         "chunk; TrainConfig.steps_per_dispatch)")
    ap.add_argument("--context", default="hyperprior",
                    choices=["hyperprior", "checkerboard", "channel-ar",
                             "space-channel"],
                    help="entropy-model context (VERDICT r2 item 4: rate "
                         "savings vs plain hyperprior at matched budget)")
    args = ap.parse_args()

    lambdas = [float(x) for x in args.lambdas.split(",")]
    work = pathlib.Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)

    if len(lambdas) > 1:
        # One SUBPROCESS per λ: the axon relay retains host memory roughly
        # proportional to the bytes transferred (measured ~batch-size per
        # step, ~123 GiB over 36k steps in the r2 sweep — OOM territory);
        # a fresh process per λ caps it at one run's worth. The children
        # share the persistent compile cache, so only the first pays compile.
        import subprocess
        for lam in lambdas:
            argv = [sys.executable, __file__, "--steps", str(args.steps),
                    "--lambdas", f"{lam:g}", "--workdir", args.workdir,
                    "--eval-steps", str(args.eval_steps),
                    "--batch", str(args.batch),
                    "--crop", str(args.crop),
                    "--prediction", args.prediction,
                    "--distortion", args.distortion,
                    "--lpips-weight", str(args.lpips_weight),
                    "--t-low", args.t_low,
                    "--dispatch", str(args.dispatch),
                    "--context", args.context,
                    "--unet", args.unet]
            if args.wide:
                argv.append("--wide")
            if args.eval_menu:
                argv.append("--eval-menu")
            if args.eval_only:
                argv.append("--eval-only")
            print(f"=== spawning λ={lam:g} ===", flush=True)
            proc = subprocess.run(argv)
            if proc.returncode != 0:
                raise SystemExit(
                    f"λ={lam:g} child failed rc={proc.returncode}")
        rows = [json.loads(l) for l in
                open(work / "eval" / "metrics.jsonl")]
        aggs = [r for r in rows if r.get("aggregate")]
        print("RDCURVE " + json.dumps(aggs), flush=True)
        return
    logger = MetricLogger(work / "eval", use_clu=False, echo=False)
    lpips_fn = PerceptualMetric()

    base = build_eval_config(args.wide, args.unet, args.prediction)
    if args.context != "hyperprior":
        base = dataclasses.replace(base, model=dataclasses.replace(
            base.model, codec=dataclasses.replace(
                base.model.codec, context=args.context)))
    if args.t_low:
        frac, prob = (float(v) for v in args.t_low.split(","))
        base = dataclasses.replace(base, model=dataclasses.replace(
            base.model, t_low_frac=frac, t_low_prob=prob))
    base = dataclasses.replace(base, train=dataclasses.replace(
        base.train, batch_size=args.batch, crop_size=args.crop,
        distortion=args.distortion,
        lpips_weight=args.lpips_weight,
        steps_per_dispatch=args.dispatch,
        # steps sets the cosine-decay horizon (train.make_optimizer) — leaving
        # it at the 1M default would keep the LR flat for the whole run.
        steps=args.steps,
        warmup_steps=min(500, max(args.steps // 10, 50)),
        checkpoint_every=5000))

    corpus = training_corpus(n_synthetic=48, size=384, seed=11)
    print(f"corpus: {len(corpus)} images", flush=True)
    mesh = make_mesh(n_data=1)
    aggs = []
    for lam in lambdas:
        cfg = dataclasses.replace(base, train=dataclasses.replace(
            base.train, rd_lambda=lam))
        tag = f"lambda{lam:g}"
        ckpt = CheckpointManager(work / tag / "ckpt")
        tlog = MetricLogger(work / tag / "logs", use_clu=False, echo=False)

        if not args.eval_only:
            start_state, remaining = None, args.steps
            if args.resume and ckpt.latest_step() is not None:
                from tpucdc.pipelines.train import create_state
                _, abstract = create_state(cfg, jax.random.key(0))
                start_state = ckpt.restore(abstract)
                remaining = args.steps - int(start_state.step)
                print(f"λ={lam:g}: resuming from step "
                      f"{int(start_state.step)} ({remaining} to go)",
                      flush=True)
                if remaining <= 0:
                    print(f"λ={lam:g}: already at {args.steps} steps",
                          flush=True)
            if args.seg_steps > 0:
                remaining = min(remaining, args.seg_steps)
            data = train_crop_iterator(corpus, cfg.train.batch_size,
                                       cfg.train.crop_size, seed=3,
                                       as_uint8=True)
            t0 = time.time()

            def writer(step, m, _lam=lam, _t0=t0):
                tlog.write_row({"step": step, **m})
                if step % 500 == 0:
                    print(f"λ={_lam:g} step {step} "
                          f"loss={m['loss']:.4f} bpp={m['bpp']:.4f} "
                          f"mse_x0={m['mse_x0']:.4f} "
                          f"({m['steps_per_sec']:.1f} it/s)", flush=True)

            if remaining > 0:
                model, state = train_lib.fit(
                    cfg, data, mesh=mesh, writer=writer,
                    checkpointer=lambda s, st: ckpt.save(s, st),
                    start_state=start_state, num_steps=remaining)
                ckpt.save(int(state.step), state, wait=True)
            else:
                from tpucdc.pipelines.train import create_state
                model, abstract = create_state(cfg, jax.random.key(0))
                state = start_state
            print(f"λ={lam:g}: trained {remaining} steps in "
                  f"{time.time() - t0:.0f}s", flush=True)
            params = state.ema_params
        else:
            from tpucdc.pipelines.train import create_state
            model, abstract = create_state(cfg, jax.random.key(0))
            state = ckpt.restore(abstract)
            print(f"λ={lam:g}: restored step {int(state.step)}", flush=True)
            params = state.ema_params

        if args.no_eval:
            print(f"λ={lam:g}: --no-eval (mid segment)", flush=True)
        else:
            agg = eval_checkpoint(cfg, model, params, args.eval_steps,
                                  logger, lam, lpips_fn,
                                  modes="menu" if args.eval_menu else None)
            aggs.append(agg)
            print("AGG " + json.dumps(agg), flush=True)
        tlog.close()

    print("RDCURVE " + json.dumps(aggs), flush=True)
    logger.close()


if __name__ == "__main__":
    main()
