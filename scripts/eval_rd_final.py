"""Final R-D evaluation of the trained λ-grid checkpoints (VERDICT r1 item 2).

Loads each λ-tagged checkpoint from a train_rd_sweep.py workdir and evaluates
the holdout images (real rANS bitstreams, real byte-length bpp) across a
DDIM step-count sweep and the block-cache variant, writing JSONL rows that
scripts/make_baseline_tables.py renders into the BASELINE.md R-D table.

Step-count sweep rationale (BASELINE.json:11: step-count sweeps are a
first-class eval axis): diffusion codecs trade distortion for perceptual
quality with MORE steps — the few-step decode approximates the conditional
mean (best PSNR), the many-step decode samples the conditional distribution
(best realism). Reporting both ends is the honest R-D statement.

Each (steps, cache_period) pair is one new decode HLO (5-15 min compile over
the axon tunnel, then cached) — keep the lists short.

Usage:
  python scripts/eval_rd_final.py --workdir /root/rd_sweep \
      --lambdas 16,64,256,1024 --steps-list 5,50 --cache-periods 1,2
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
from tpucdc.eval.metrics import ms_ssim, psnr
from tpucdc.pipelines.codec_runtime import CodecRuntime
from tpucdc.pipelines.train import create_state
from tpucdc.utils import CheckpointManager, MetricLogger

from train_rd_sweep import holdout_eval_images
from train_tpu_demo import medium


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/root/rd_sweep")
    ap.add_argument("--lambdas", default="16,64,256,1024")
    ap.add_argument("--steps-list", default="5,50",
                    help="DDIM step counts; 0 = synthesis mean decode")
    ap.add_argument("--cache-periods", default="1,2")
    ap.add_argument("--truncate-fracs", default="0",
                    help="truncated-refinement decode variants "
                         "(codec.synthesis; 0 = full chain)")
    ap.add_argument("--prediction", default="eps", choices=["eps", "x0", "residual"],
                    help="must match how the checkpoint was trained")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    work = pathlib.Path(args.workdir)
    out = pathlib.Path(args.out or (work / "final_eval"))
    logger = MetricLogger(out, use_clu=False, echo=False)
    lpips_fn = PerceptualMetric()
    images = holdout_eval_images()

    lambdas = [float(x) for x in args.lambdas.split(",")]
    steps_list = [int(s) for s in args.steps_list.split(",")]
    cache_periods = [int(c) for c in args.cache_periods.split(",")]
    truncate_fracs = [float(t) for t in args.truncate_fracs.split(",")]

    aggs = []
    for lam in lambdas:
        base = medium()
        base = dataclasses.replace(base, model=dataclasses.replace(
            base.model, prediction=args.prediction))
        cfg = dataclasses.replace(base, train=dataclasses.replace(
            base.train, rd_lambda=lam))
        ckpt = CheckpointManager(work / f"lambda{lam:g}" / "ckpt")
        model, abstract = create_state(cfg, jax.random.key(0))
        state = ckpt.restore(abstract)
        print(f"lambda={lam:g}: restored step {int(state.step)}", flush=True)
        params = state.ema_params

        synth = cfg.model.codec.synthesis
        for cache_period in cache_periods:
            for tf in truncate_fracs:
                if tf > 0 and not synth:
                    continue
                ccfg = dataclasses.replace(cfg, sample=dataclasses.replace(
                    cfg.sample, cache_period=cache_period, truncate_frac=tf))
                rt = CodecRuntime(ccfg, model, params)
                for steps in steps_list:
                    if cache_period > 1 and 0 < steps < cache_period * 2:
                        continue
                    if steps == 0 and (not synth or tf > 0
                                       or cache_period > 1):
                        continue       # mean decode: one row per λ
                    rows = []
                    for i, img in enumerate(images):
                        blob = rt.compress(img)
                        recon = np.asarray(rt.decompress(
                            blob, rng=jax.random.key(1), steps=steps))
                        row = {"rd_lambda": lam, "image": i, "steps": steps,
                               "cache_period": cache_period,
                               "truncate_frac": tf,
                               "bpp": len(blob) * 8 / (img.shape[0] * img.shape[1]),
                               "psnr": psnr(img, recon),
                               "ms_ssim": ms_ssim(img, recon),
                               "lpips": lpips_fn(img, recon),
                               "lpips_kind": lpips_fn.kind}
                        rows.append(row)
                        logger.write_row(row)
                    agg = {"rd_lambda": lam, "steps": steps,
                           "cache_period": cache_period, "truncate_frac": tf,
                           "aggregate": True,
                           "bpp": float(np.mean([r["bpp"] for r in rows])),
                           "psnr": float(np.mean([r["psnr"] for r in rows])),
                           "ms_ssim": float(np.mean(
                               [r["ms_ssim"] for r in rows])),
                           "lpips": float(np.mean([r["lpips"] for r in rows]))}
                    logger.write_row(agg)
                    aggs.append(agg)
                    print("AGG " + json.dumps(agg), flush=True)

    print("FINAL " + json.dumps(aggs, indent=1), flush=True)
    logger.close()


if __name__ == "__main__":
    main()
