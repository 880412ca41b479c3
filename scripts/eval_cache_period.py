"""Block-cached sampling R-D validation on TRAINED weights (VERDICT r2
item 1 tail: "validate cache_period=2 on those weights").

Round-1 measured cache_period=2 at −22 % decode latency (PERF.md) but left
it off pending a quality check on a trained checkpoint. This script loads a
train_rd_sweep checkpoint and decodes the holdout set in the serving mode
(truncated refinement) at cache_period ∈ {1, 2, 3}, reporting
PSNR/MS-SSIM/LPIPS-proxy + median decode latency per setting — the
quality-vs-latency trade that decides whether caching enters the serving
config (arXiv 2312.03209, PAPERS.md).

Usage:
  python scripts/eval_cache_period.py --workdir /root/r3res --lam 128 \
      --wide --prediction residual --steps 10 --truncate-frac 0.3
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

from tpucdc.eval.lpips import PerceptualMetric
from tpucdc.eval.metrics import ms_ssim, psnr
from tpucdc.pipelines.codec_runtime import CodecRuntime
from tpucdc.pipelines.train import create_state
from tpucdc.utils import CheckpointManager

from train_rd_sweep import holdout_eval_images
from train_tpu_demo import medium


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/root/r3res")
    ap.add_argument("--lam", type=float, default=128.0)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--truncate-frac", type=float, default=0.3)
    ap.add_argument("--wide", action="store_true")
    ap.add_argument("--prediction", default="residual",
                    choices=["eps", "x0", "residual"])
    ap.add_argument("--periods", default="1,2,3")
    args = ap.parse_args()

    base = medium()
    if args.wide:
        base = dataclasses.replace(base, model=dataclasses.replace(
            base.model, codec=dataclasses.replace(
                base.model.codec, hidden_channels=128, latent_channels=192,
                hyper_channels=128)))
    base = dataclasses.replace(base, model=dataclasses.replace(
        base.model, prediction=args.prediction))

    ckpt = CheckpointManager(
        pathlib.Path(args.workdir) / f"lambda{args.lam:g}" / "ckpt")
    model, abstract = create_state(base, jax.random.key(0))
    state = ckpt.restore(abstract)
    print(f"# restored step {int(state.step)}", flush=True)

    lpips_fn = PerceptualMetric()
    images = holdout_eval_images()

    for period in (int(p) for p in args.periods.split(",")):
        cfg = dataclasses.replace(base, sample=dataclasses.replace(
            base.sample, truncate_frac=args.truncate_frac,
            cache_period=period))
        rt = CodecRuntime(cfg, model, state.ema_params)
        rows, walls = [], []
        for i, img in enumerate(images):
            blob = rt.compress(img)
            t0 = time.perf_counter()
            recon = np.asarray(rt.decompress(blob, rng=jax.random.key(1),
                                             steps=args.steps))
            walls.append(time.perf_counter() - t0)
            rows.append({"psnr": psnr(img, recon),
                         "ms_ssim": ms_ssim(img, recon),
                         "lpips_proxy": lpips_fn(img, recon)})
        agg = {
            "cache_period": period, "steps": args.steps,
            "truncate_frac": args.truncate_frac, "lambda": args.lam,
            "psnr": round(float(np.mean([r["psnr"] for r in rows])), 3),
            "ms_ssim": round(float(np.mean([r["ms_ssim"] for r in rows])), 5),
            "lpips_proxy": round(
                float(np.mean([r["lpips_proxy"] for r in rows])), 6),
            # median wall skips image 0 of each period (compile warmup)
            "decode_s_median": round(float(np.median(walls[1:])), 3),
        }
        print("CACHE " + json.dumps(agg), flush=True)


if __name__ == "__main__":
    main()
