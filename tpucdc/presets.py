"""Config presets for the BASELINE.json:7-11 evaluation configs (SURVEY.md C22)."""

from __future__ import annotations

import dataclasses

import numpy as np

from tpucdc.codec.transforms import CodecConfig
from tpucdc.config import (Config, ModelConfig, SampleConfig, ScheduleConfig,
                           TrainConfig)
from tpucdc.diffusion.conditioning import ConditioningConfig
from tpucdc.diffusion.unet import UNetConfig


def tiny() -> Config:
    """CPU-feasible tiny model — BASELINE.json:7 (single 64×64 crop, DDIM-50)
    and the integration-test workhorse (SURVEY.md §4.2)."""
    return Config(
        model=ModelConfig(
            codec=CodecConfig(hidden_channels=16, latent_channels=32,
                              hyper_channels=16, synthesis=True),
            cond=ConditioningConfig(feature_channels=8, token_dim=32,
                                    hidden_channels=32),
            unet=UNetConfig(base_channels=16, channel_mult=(1, 2),
                            num_res_blocks=1, attn_levels=(1,), num_heads=2,
                            patch_size=2, groups=8),
            schedule=ScheduleConfig(kind="cosine", num_steps=256),
        ),
        train=TrainConfig(batch_size=8, crop_size=64, lr=3e-4,
                          warmup_steps=100, rd_lambda=8.0),
        sample=SampleConfig(steps=50),
    ).validated()


def flagship() -> Config:
    """Full-size model — BASELINE.json:8 (Kodak 768×512, DDIM-100 decode).

    patch_size 4 (space-to-depth at the input, pixel-shuffle at the output)
    puts the UNet on a 192×128 grid for 768×512 inputs: profiled 2.4× faster
    per step than patch 2 (PERF.md) with attention levels at 1536/384 tokens.
    Conditioning features are emitted at the post-patch grid (output_stride).
    """
    return Config(
        model=ModelConfig(
            codec=CodecConfig(hidden_channels=128, latent_channels=192,
                              hyper_channels=128, synthesis=True),
            cond=ConditioningConfig(feature_channels=64, token_dim=192,
                                    hidden_channels=192),
            unet=UNetConfig(base_channels=64, channel_mult=(1, 2, 3, 4),
                            num_res_blocks=2, attn_levels=(2, 3), num_heads=4,
                            patch_size=4, groups=32),
            schedule=ScheduleConfig(kind="cosine", num_steps=1000),
        ),
        train=TrainConfig(batch_size=32, crop_size=256, rd_lambda=32.0),
        sample=SampleConfig(steps=100),
    ).validated()


# λ grid for the rate-distortion sweep (BASELINE.json:9).
RD_LAMBDA_GRID: tuple[float, ...] = (4.0, 8.0, 16.0, 32.0, 64.0, 128.0)


def rd_sweep(base: Config | None = None) -> list[Config]:
    base = base or flagship()
    return [
        dataclasses.replace(
            base, train=dataclasses.replace(base.train, rd_lambda=lam))
        for lam in RD_LAMBDA_GRID
    ]


# Guidance / step-count sweep axes for perceptual eval (BASELINE.json:11).
GUIDANCE_GRID: tuple[float, ...] = (1.0, 1.5, 2.0, 3.0)
STEP_GRID: tuple[int, ...] = (10, 25, 50, 100)
