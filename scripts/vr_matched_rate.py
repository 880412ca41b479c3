"""Matched-rate VR-vs-per-λ table (VERDICT r4 task 3: the VR-as-flagship
decision).

Reads the continuous-rate eval JSONL (scripts/eval_vr_continuous.py:
aggregate rows trace the wide-VR serving R-D curve over a fractional
quality grid) and interpolates VR PSNR/MS-SSIM at the per-λ headline
curve's exact bpp points (same piecewise-linear-in-log-bpp method, and the
same refusal to extrapolate, as scripts/jpeg_anchor.py). Pure host work.

Usage:
  python scripts/vr_matched_rate.py artifacts/metrics/r5_vr_cont.jsonl
"""

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from jpeg_anchor import interpolate_at_bpp

# Per-λ headline serving rows (BASELINE.md R-D table: in-band γ at λ≤128,
# mean decode at λ≥512; λ=2048 updated when the crop-192 rebuild lands).
PER_LAMBDA = [
    {"lambda": 32, "bpp": 0.1251, "psnr": 25.10, "ms_ssim": 0.8457},
    {"lambda": 128, "bpp": 0.3356, "psnr": 28.24, "ms_ssim": 0.9348},
    {"lambda": 512, "bpp": 0.9818, "psnr": 30.37, "ms_ssim": 0.9686},
    {"lambda": 2048, "bpp": 2.1266, "psnr": 33.23, "ms_ssim": 0.9879},
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("jsonl", help="eval_vr_continuous metrics JSONL")
    ap.add_argument("--rows", default="",
                    help="override per-λ rows as JSON list")
    args = ap.parse_args()

    rows = [json.loads(l) for l in open(args.jsonl)]
    curve = [{"quality": r["quality"], "bpp": r["bpp"], "psnr": r["psnr"],
              "ms_ssim": r["ms_ssim"]}
             for r in rows if r.get("aggregate") and "quality" in r
             and not r.get("rate_control")]
    curve.sort(key=lambda r: r["bpp"])
    per_lambda = json.loads(args.rows) if args.rows else PER_LAMBDA

    print(f"# VR curve: {len(curve)} aggregate points, "
          f"bpp {curve[0]['bpp']:.4f}..{curve[-1]['bpp']:.4f}")
    out = []
    for p in per_lambda:
        row = {"lambda": p["lambda"], "bpp": p["bpp"],
               "perlambda_psnr": p["psnr"], "perlambda_ms_ssim": p["ms_ssim"]}
        try:
            v = interpolate_at_bpp(curve, p["bpp"])
            row.update(vr_psnr=round(v["psnr"], 3),
                       vr_ms_ssim=round(v["ms_ssim"], 5),
                       dpsnr=round(v["psnr"] - p["psnr"], 3),
                       dms_ssim=round(v["ms_ssim"] - p["ms_ssim"], 5),
                       between_quality=v["between_q"])
        except ValueError as e:
            row["out_of_range"] = str(e)
        out.append(row)
        print("MATCHED " + json.dumps(row), flush=True)
    print("MATCHED_TABLE " + json.dumps(out))


if __name__ == "__main__":
    main()
