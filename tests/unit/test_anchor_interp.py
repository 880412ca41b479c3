"""Matched-bpp anchor interpolation (scripts/jpeg_anchor.py, r5).

The honest-anchor rule: matched-rate claims interpolate between measured
points (piecewise-linear in log bpp) and NEVER extrapolate. Used by both
the JPEG anchor and the VR matched-rate table (scripts/vr_matched_rate.py).
"""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]
                       / "scripts"))

from jpeg_anchor import interpolate_at_bpp

ROWS = [
    {"quality": 10, "bpp": 0.25, "psnr": 26.0, "ms_ssim": 0.90},
    {"quality": 20, "bpp": 0.50, "psnr": 28.0, "ms_ssim": 0.94},
    {"quality": 40, "bpp": 1.00, "psnr": 30.0, "ms_ssim": 0.96},
]


def test_exact_points_pass_through():
    for r in ROWS:
        v = interpolate_at_bpp(ROWS, r["bpp"])
        assert abs(v["psnr"] - r["psnr"]) < 1e-9
        assert abs(v["ms_ssim"] - r["ms_ssim"]) < 1e-9


def test_log_midpoint():
    # geometric mean of 0.25 and 0.5 is the t=0.5 point in log-bpp
    v = interpolate_at_bpp(ROWS, float(np.sqrt(0.25 * 0.5)))
    assert abs(v["psnr"] - 27.0) < 1e-9
    assert v["between_q"] == [10, 20]


def test_monotone_between_brackets():
    prev = -np.inf
    for b in np.geomspace(0.25, 1.0, 17):
        p = interpolate_at_bpp(ROWS, float(b))["psnr"]
        assert p >= prev - 1e-12
        prev = p


def test_refuses_to_extrapolate():
    for b in (0.2, 1.2):
        with pytest.raises(ValueError, match="refusing to extrapolate"):
            interpolate_at_bpp(ROWS, b)


def test_unsorted_input_ok():
    v = interpolate_at_bpp(list(reversed(ROWS)), 0.75)
    assert 28.0 < v["psnr"] < 30.0
