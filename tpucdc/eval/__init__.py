"""L7 eval: metrics + R-D sweep harness (SURVEY.md C21)."""

from tpucdc.eval.metrics import gmsd, psnr, ms_ssim, mse
from tpucdc.eval.lpips import PerceptualMetric
from tpucdc.eval.fid import FIDAccumulator, frechet_distance

__all__ = ["psnr", "ms_ssim", "mse", "gmsd", "PerceptualMetric",
           "FIDAccumulator", "frechet_distance"]
