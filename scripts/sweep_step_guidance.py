"""Step-count × guidance-scale perceptual sweep on TRAINED weights
(BASELINE.json:11; VERDICT r2 item 5).

Loads a λ-tagged checkpoint from a train_rd_sweep workdir and runs
eval.harness.step_guidance_sweep over the holdout images: LPIPS(-proxy) +
FID + PSNR/MS-SSIM per (steps, guidance) cell, bpp from real bitstreams.
Answers: does CFG > 1 ever help a compression decoder, and where is the
step-count knee?

Grid discipline for the axon tunnel: each distinct step count is ONE decode
HLO (guidance>1 adds the two-branch CFG program per step count); keep grids
short. Truncation fraction applies to all cells (the serving regime).

Usage:
  python scripts/sweep_step_guidance.py --workdir /root/r3_sweep \
      --lam 128 --steps-grid 5,10,25 --guidance-grid 1,1.5,2 \
      --truncate-frac 0.3 --wide --prediction x0
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

from tpucdc.data.datasets import EvalDataset
from tpucdc.eval.harness import EvalOptions, step_guidance_sweep
from tpucdc.pipelines.codec_runtime import CodecRuntime
from tpucdc.pipelines.train import create_state
from tpucdc.utils import CheckpointManager, MetricLogger

from train_rd_sweep import holdout_eval_images
from train_tpu_demo import medium


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/root/r3_sweep")
    ap.add_argument("--lam", type=float, default=128.0)
    ap.add_argument("--steps-grid", default="5,10,25")
    ap.add_argument("--guidance-grid", default="1,1.5,2")
    ap.add_argument("--truncate-frac", type=float, default=0.3)
    ap.add_argument("--wide", action="store_true")
    ap.add_argument("--prediction", default="x0", choices=["eps", "x0", "residual"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    work = pathlib.Path(args.workdir)
    out = pathlib.Path(args.out or (work / "step_guidance"))
    logger = MetricLogger(out, use_clu=False, echo=False)

    base = medium()
    if args.wide:
        base = dataclasses.replace(base, model=dataclasses.replace(
            base.model, codec=dataclasses.replace(
                base.model.codec, hidden_channels=128, latent_channels=192,
                hyper_channels=128)))
    base = dataclasses.replace(base, model=dataclasses.replace(
        base.model, prediction=args.prediction))
    cfg = dataclasses.replace(base, sample=dataclasses.replace(
        base.sample, truncate_frac=args.truncate_frac))

    ckpt = CheckpointManager(work / f"lambda{args.lam:g}" / "ckpt")
    model, abstract = create_state(cfg, jax.random.key(0))
    state = ckpt.restore(abstract)
    print(f"restored step {int(state.step)}", flush=True)
    rt = CodecRuntime(cfg, model, state.ema_params)

    images = holdout_eval_images()
    ds = EvalDataset(name="holdout384x512", images=images, synthetic=False)

    rows = step_guidance_sweep(
        rt, ds,
        steps_grid=[int(s) for s in args.steps_grid.split(",")],
        guidance_grid=[float(g) for g in args.guidance_grid.split(",")],
        base_opts=EvalOptions(seed=1),
        on_row=logger.write_row)
    for r in rows:
        r["lambda"] = args.lam
        r["truncate_frac"] = args.truncate_frac
        logger.write_row({**r, "aggregate": True})
        print("CELL " + json.dumps(
            {k: (round(v, 4) if isinstance(v, float) else v)
             for k, v in r.items()}), flush=True)
    logger.close()


if __name__ == "__main__":
    main()
