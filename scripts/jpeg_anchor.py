"""JPEG anchor R-D points on the sweep's holdout images (VERDICT r1 item 2:
"PSNR at the top point that beats a JPEG-quality sanity bar on the same
data"). CPU-only; gives the classical-codec context for the trained-model
R-D table in BASELINE.md.

Usage: python scripts/jpeg_anchor.py [--qualities 5,10,20,40,70]
"""

import argparse
import io
import json
import pathlib
import sys

import jax

# Metrics run in jax; force the CPU backend so this script never queues on
# the EXCLUSIVE TPU grant (CLAUDE.md: a second TPU process blocks, and the
# explicit config update outranks the axon sitecustomize).
jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qualities", default="5,10,20,40,70")
    args = ap.parse_args()

    from PIL import Image

    from tpucdc.eval.metrics import ms_ssim, psnr
    from train_rd_sweep import holdout_eval_images

    images = holdout_eval_images()
    out = []
    for q in [int(x) for x in args.qualities.split(",")]:
        bpps, psnrs, ssims = [], [], []
        for img in images:
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="JPEG", quality=q)
            data = buf.getvalue()
            recon = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
            bpps.append(len(data) * 8 / (img.shape[0] * img.shape[1]))
            psnrs.append(psnr(img, recon))
            ssims.append(ms_ssim(img, recon))
        row = {"codec": "jpeg", "quality": q,
               "bpp": float(np.mean(bpps)), "psnr": float(np.mean(psnrs)),
               "ms_ssim": float(np.mean(ssims))}
        out.append(row)
        print(json.dumps(row), flush=True)
    print("JPEG_ANCHOR " + json.dumps(out))


if __name__ == "__main__":
    main()
