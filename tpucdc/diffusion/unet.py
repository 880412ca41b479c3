"""Conditional UNet denoiser (SURVEY.md C7; BASELINE.json:5 clause 2).

ε-prediction UNet: down/up path of ResBlocks (GN+SiLU fused on TPU), self-
attention at low-resolution levels, sinusoidal timestep embedding, and latent
conditioning via both channel-concat (a feature pyramid from the decoded
latent is concatenated at the input) and cross-attention (latent tokens feed
the attention blocks' K/V).

TPU-first design choices:
  * NHWC layout; bf16 compute / f32 params.
  * Static shapes everywhere — jit-once, scan the sampler over it.
  * An input space-to-depth "patch" factor trades full-resolution conv FLOPs
    for channel width (MXU-friendly); the output head pixel-shuffles back.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from tpucdc.diffusion.blocks import (AttentionBlock, Downsample, GNSiLU,
                                     ResBlock, Upsample)
from tpucdc.ops import sinusoidal_time_embed
from tpucdc.runtime import Policy, DEFAULT_POLICY


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 3
    out_channels: int = 3
    base_channels: int = 64
    channel_mult: tuple[int, ...] = (1, 2, 3, 4)
    num_res_blocks: int = 2
    # Levels (0-indexed, by downsample depth) that get self-attention.
    attn_levels: tuple[int, ...] = (2, 3)
    num_heads: int = 4
    # Space-to-depth factor applied at the input (1 = off).
    patch_size: int = 2
    # Channel count of the concat-conditioning feature map (0 = unconditional).
    cond_channels: int = 0
    # Token dim of the cross-attention conditioning sequence (0 = off).
    cond_token_dim: int = 0
    groups: int = 32

    @property
    def level_channels(self) -> tuple[int, ...]:
        return tuple(self.base_channels * m for m in self.channel_mult)


def _space_to_depth(x, p: int):
    if p == 1:
        return x
    b, h, w, c = x.shape
    x = x.reshape(b, h // p, p, w // p, p, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // p, w // p, p * p * c)


def _depth_to_space(x, p: int):
    if p == 1:
        return x
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, p, p, c // (p * p))
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * p, w * p, c // (p * p))


class UNet(nn.Module):
    """``UNet.apply(params, x_t, t, cond_features, cond_tokens) -> eps_hat``."""
    config: UNetConfig
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x_t: jnp.ndarray, t: jnp.ndarray,
                 cond_features: Optional[jnp.ndarray] = None,
                 cond_tokens: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cfg = self.config
        pol = self.policy
        p = cfg.patch_size

        if (cfg.cond_channels > 0) != (cond_features is not None):
            raise ValueError("cond_features must match config.cond_channels")
        if (cfg.cond_token_dim > 0) != (cond_tokens is not None):
            raise ValueError("cond_tokens must match config.cond_token_dim")

        # Timestep embedding: sinusoidal → 2-layer MLP (SURVEY.md C5).
        temb_dim = cfg.base_channels * 4
        temb = sinusoidal_time_embed(t, cfg.base_channels)
        temb = nn.Dense(temb_dim, name="temb_dense1", dtype=pol.compute_dtype,
                        param_dtype=pol.param_dtype)(temb)
        temb = nn.Dense(temb_dim, name="temb_dense2", dtype=pol.compute_dtype,
                        param_dtype=pol.param_dtype)(nn.silu(temb))

        h = _space_to_depth(pol.cast_to_compute(x_t), p)
        if cond_features is not None:
            cf = pol.cast_to_compute(cond_features)
            if cf.shape[1] == x_t.shape[1]:
                # Image-resolution features: fold into the patch grid.
                cf = _space_to_depth(cf, p)
            elif cf.shape[1] != h.shape[1]:
                raise ValueError(
                    f"cond_features height {cf.shape[1]} matches neither the "
                    f"image ({x_t.shape[1]}) nor the patch grid ({h.shape[1]})")
            h = jnp.concatenate([h, cf], axis=-1)

        conv = lambda ch, name: nn.Conv(ch, (3, 3), padding="SAME", name=name,
                                        dtype=pol.compute_dtype,
                                        param_dtype=pol.param_dtype)
        h = conv(cfg.base_channels, "conv_in")(h)

        if cond_tokens is not None:
            cond_tokens = pol.cast_to_compute(cond_tokens)

        def attn(level: int, name: str):
            return AttentionBlock(cfg.num_heads, cfg.groups, pol, name=name)

        # --- Down path ---
        skips = [h]
        levels = cfg.level_channels
        for li, ch in enumerate(levels):
            for bi in range(cfg.num_res_blocks):
                h = ResBlock(ch, cfg.groups, pol, name=f"down{li}_res{bi}")(h, temb)
                if li in cfg.attn_levels:
                    h = attn(li, f"down{li}_attn{bi}")(h)
                    if cond_tokens is not None:
                        h = attn(li, f"down{li}_xattn{bi}")(h, cond_tokens)
                skips.append(h)
            if li != len(levels) - 1:
                h = Downsample(ch, pol, name=f"down{li}_ds")(h)
                skips.append(h)

        # --- Middle ---
        h = ResBlock(levels[-1], cfg.groups, pol, name="mid_res1")(h, temb)
        h = attn(len(levels) - 1, "mid_attn")(h)
        if cond_tokens is not None:
            h = attn(len(levels) - 1, "mid_xattn")(h, cond_tokens)
        h = ResBlock(levels[-1], cfg.groups, pol, name="mid_res2")(h, temb)

        # --- Up path ---
        for li, ch in reversed(list(enumerate(levels))):
            for bi in range(cfg.num_res_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = ResBlock(ch, cfg.groups, pol, name=f"up{li}_res{bi}")(h, temb)
                if li in cfg.attn_levels:
                    h = attn(li, f"up{li}_attn{bi}")(h)
                    if cond_tokens is not None:
                        h = attn(li, f"up{li}_xattn{bi}")(h, cond_tokens)
            if li != 0:
                h = Upsample(ch, pol, name=f"up{li}_us")(h)
        assert not skips

        h = GNSiLU(cfg.groups, pol, name="norm_out")(h)
        h = nn.Conv(cfg.out_channels * p * p, (3, 3), padding="SAME",
                    name="conv_out", dtype=pol.compute_dtype,
                    param_dtype=pol.param_dtype,
                    kernel_init=nn.initializers.zeros)(h)
        return _depth_to_space(h, p).astype(jnp.float32)
