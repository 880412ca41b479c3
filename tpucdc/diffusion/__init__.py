"""L3 diffusion models: conditional UNet denoiser (SURVEY.md C5-C7, C12)."""

from tpucdc.diffusion.unet import UNet, UNetConfig
from tpucdc.diffusion.conditioning import ConditioningHead

__all__ = ["UNet", "UNetConfig", "ConditioningHead"]
