"""JPEG anchor R-D points on the sweep's holdout images (VERDICT r1 item 2:
"PSNR at the top point that beats a JPEG-quality sanity bar on the same
data"). CPU-only; gives the classical-codec context for the trained-model
R-D table in BASELINE.md.

Usage: python scripts/jpeg_anchor.py [--qualities 5,10,20,40,70]

Round 5 (VERDICT r4 task 5 — honest anchor at matched bpp): --at-bpp
interpolates the measured anchor curve piecewise-linearly in PSNR vs
log(bpp) and REFUSES to extrapolate outside the measured quality range —
the r3-era "32.0 @ 1.26 extrapolated" style of claim is retired. --split
evaluates the anchor on the train/holdout/all crop sets so the anchor
matches whichever eval table it sits under.
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


def interpolate_at_bpp(rows: list[dict], bpp: float) -> dict:
    """PSNR/MS-SSIM at ``bpp`` by piecewise-linear interpolation in
    log(bpp) between the two bracketing measured points. Raises if ``bpp``
    falls outside the measured range — matched-rate claims must rest on
    interpolation, never extrapolation."""
    rows = sorted(rows, key=lambda r: r["bpp"])
    if not rows[0]["bpp"] <= bpp <= rows[-1]["bpp"]:
        raise ValueError(
            f"bpp {bpp:g} outside measured anchor range "
            f"[{rows[0]['bpp']:.4f}, {rows[-1]['bpp']:.4f}] — refusing to "
            f"extrapolate; add anchor qualities instead")
    for lo, hi in zip(rows, rows[1:]):
        if lo["bpp"] <= bpp <= hi["bpp"]:
            t = ((np.log(bpp) - np.log(lo["bpp"]))
                 / (np.log(hi["bpp"]) - np.log(lo["bpp"])))
            return {"codec": "jpeg-interp", "bpp": bpp,
                    "psnr": float(lo["psnr"] + t * (hi["psnr"] - lo["psnr"])),
                    "ms_ssim": float(lo["ms_ssim"]
                                     + t * (hi["ms_ssim"] - lo["ms_ssim"])),
                    "between_q": [lo["quality"], hi["quality"]]}
    raise AssertionError("unreachable")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qualities", default="5,10,20,40,55,70,85,95")
    ap.add_argument("--split", default="holdout",
                    help="eval crop set: holdout | train | all")
    ap.add_argument("--at-bpp", default="",
                    help="comma list of bpp points to interpolate the "
                         "anchor at (matched-rate comparison)")
    args = ap.parse_args()

    from PIL import Image

    from tpucdc.eval.metrics import ms_ssim, psnr
    from train_rd_sweep import split_eval_images

    images = split_eval_images(args.split)
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
        row = {"codec": "jpeg", "quality": q, "split": args.split,
               "bpp": float(np.mean(bpps)), "psnr": float(np.mean(psnrs)),
               "ms_ssim": float(np.mean(ssims))}
        out.append(row)
        print(json.dumps(row), flush=True)
    print("JPEG_ANCHOR " + json.dumps(out))
    if args.at_bpp:
        for b in (float(x) for x in args.at_bpp.split(",")):
            try:
                row = interpolate_at_bpp(out, b)
            except ValueError as e:
                # e.g. 0.125 bpp sits BELOW JPEG's q5 floor (~0.21 bpp on
                # this set) — that operating point simply has no JPEG
                # anchor; report it structurally instead of claiming one.
                row = {"codec": "jpeg-interp", "bpp": b,
                       "out_of_range": str(e)}
            print("JPEG_AT_BPP " + json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
