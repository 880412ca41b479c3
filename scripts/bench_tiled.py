"""High-res tiled decode benchmark + seam quality (BASELINE.json:10:
CLIC2020-like tiled decode; VERDICT r2 item 6).

Measures the full bitstream→image path for a 1024×1536 image through
CodecRuntime.decompress_tiled on one chip: the tile batch runs as ONE scan
program (batched tiles), halos blend on host. With --workdir/--lam a trained
checkpoint is loaded and the tiled reconstruction is additionally compared
against the WHOLE-image decode of the same bitstream (halo-blend seam
delta) on a real photo.

Prints one JSON line per (tile, halo) config. Run on the real TPU.
"""

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent))
import argparse
import dataclasses
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpucdc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np

from tpucdc import presets
from tpucdc.data.datasets import local_image_corpus, synthetic_images_rich
from tpucdc.eval.metrics import psnr
from tpucdc.model import init_model
from tpucdc.pipelines.codec_runtime import CodecRuntime

H, W = 1024, 1536          # CLIC2020-scale (BASELINE.json:10)


def _trained_runtime(args):
    from tpucdc.pipelines.train import create_state
    from tpucdc.utils import CheckpointManager
    from train_tpu_demo import medium

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
    ckpt = CheckpointManager(
        _pl.Path(args.workdir) / f"lambda{args.lam:g}" / "ckpt")
    model, abstract = create_state(cfg, jax.random.key(0))
    state = ckpt.restore(abstract)
    print(f"# restored step {int(state.step)}", flush=True)
    return cfg, CodecRuntime(cfg, model, state.ema_params)


def _test_image() -> np.ndarray:
    """1024×1536 crop of the largest bundled real photo (tiled + padded if
    the corpus image is smaller)."""
    imgs = sorted(local_image_corpus(), key=lambda a: -a.shape[0] * a.shape[1])
    im = imgs[0]
    th, tw = min(H, im.shape[0]), min(W, im.shape[1])
    crop = im[:th, :tw]
    reps = (int(np.ceil(H / th)), int(np.ceil(W / tw)), 1)
    return np.tile(crop, reps)[:H, :W]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--workdir", default=None,
                    help="train_rd_sweep workdir with a trained checkpoint; "
                         "None = flagship random-init (latency only)")
    ap.add_argument("--lam", type=float, default=128.0)
    ap.add_argument("--wide", action="store_true")
    ap.add_argument("--prediction", default="x0", choices=["eps", "x0", "residual"])
    ap.add_argument("--truncate-frac", type=float, default=0.0)
    ap.add_argument("--tiles", default="256:32,448:32")
    args = ap.parse_args()

    if args.workdir:
        cfg, rt = _trained_runtime(args)
        img = _test_image()
    else:
        cfg = presets.flagship()
        model, params = init_model(cfg.model, jax.random.key(0),
                                   image_size=256)
        rt = CodecRuntime(cfg, model, params)
        img = synthetic_images_rich(1, H, W, seed=5)[0]

    blob = rt.compress(img)
    bpp = len(blob) * 8 / (H * W)

    whole = None
    if args.workdir:
        # Whole-image decode of the SAME bitstream: the seam-quality anchor.
        whole = rt.decompress(blob, rng=jax.random.key(0), steps=args.steps)
        whole = np.asarray(whole)

    for spec in args.tiles.split(","):
        tile, halo = (int(v) for v in spec.split(":"))
        out = rt.decompress_tiled(blob, rng=jax.random.key(0), tile=tile,
                                  halo=halo, steps=args.steps)
        assert out.shape == (H, W, 3)
        np.asarray(out)
        t0 = time.perf_counter()
        out = rt.decompress_tiled(blob, rng=jax.random.key(0), tile=tile,
                                  halo=halo, steps=args.steps)
        out = np.asarray(out)
        dt = time.perf_counter() - t0
        row = {
            "metric": "clic1024x1536_tiled_decode", "tile": tile,
            "halo": halo, "steps": args.steps, "bpp": round(bpp, 4),
            "value": round(dt, 3), "unit": "s",
            "steps_per_image_s": round(dt, 3),
            "weights": "trained" if args.workdir else "random-init",
        }
        if whole is not None:
            row.update({
                "psnr_tiled": round(psnr(img, out), 3),
                "psnr_whole": round(psnr(img, whole), 3),
                "seam_delta_db": round(psnr(img, out) - psnr(img, whole), 3),
                "tiled_vs_whole_psnr": round(psnr(whole, out), 2),
            })
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
