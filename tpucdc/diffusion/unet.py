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
  * The network is split into shallow (levels < cache_split) and deep
    (levels ≥ cache_split + mid) segments so the sampler can reuse the deep
    segment's output across adjacent timesteps ("block caching",
    PAPERS.md — arXiv 2312.03209): deep features change slowly in t, and the
    cached path skips the most attention-heavy blocks entirely.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

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
    # First level considered "deep" for block caching (None → first attn
    # level, or the last level when no attention).
    cache_split: Optional[int] = None

    @property
    def level_channels(self) -> tuple[int, ...]:
        return tuple(self.base_channels * m for m in self.channel_mult)

    @property
    def split_level(self) -> int:
        if self.cache_split is not None:
            return self.cache_split
        if self.attn_levels:
            return max(1, min(self.attn_levels))
        return len(self.channel_mult) - 1

    def cache_shape(self, batch: int, height: int, width: int
                    ) -> tuple[int, int, int, int]:
        """Shape of the deep-segment cache for an image of (height, width)."""
        split = self.split_level
        down = self.patch_size * 2 ** (split - 1)
        return (batch, height // down, width // down,
                self.level_channels[split])


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
    """``UNet.apply(params, x_t, t, cond_features, cond_tokens) -> eps_hat``.

    ``deep_cache``/``return_cache`` implement block-cached sampling: call
    once with ``return_cache=True`` to get (eps, cache), then pass
    ``deep_cache=cache`` on subsequent steps to skip the deep segment.
    """
    config: UNetConfig
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        cfg = self.config
        pol = self.policy
        levels = cfg.level_channels

        self.temb_dense1 = nn.Dense(cfg.base_channels * 4,
                                    dtype=pol.compute_dtype,
                                    param_dtype=pol.param_dtype)
        self.temb_dense2 = nn.Dense(cfg.base_channels * 4,
                                    dtype=pol.compute_dtype,
                                    param_dtype=pol.param_dtype)
        self.conv_in = nn.Conv(cfg.base_channels, (3, 3), padding="SAME",
                               dtype=pol.compute_dtype,
                               param_dtype=pol.param_dtype)

        down_res, down_attn, down_xattn, downsamplers = [], [], [], []
        for li, ch in enumerate(levels):
            res, attns, xattns = [], [], []
            for _ in range(cfg.num_res_blocks):
                res.append(ResBlock(ch, cfg.groups, pol))
                if li in cfg.attn_levels:
                    attns.append(AttentionBlock(cfg.num_heads, cfg.groups, pol))
                    if cfg.cond_token_dim:
                        xattns.append(
                            AttentionBlock(cfg.num_heads, cfg.groups, pol))
            down_res.append(res)
            down_attn.append(attns)
            down_xattn.append(xattns)
            if li != len(levels) - 1:
                downsamplers.append(Downsample(ch, pol))
        self.down_res = down_res
        self.down_attn = down_attn
        self.down_xattn = down_xattn
        self.downsamplers = downsamplers

        self.mid_res1 = ResBlock(levels[-1], cfg.groups, pol)
        self.mid_attn = AttentionBlock(cfg.num_heads, cfg.groups, pol)
        if cfg.cond_token_dim:
            self.mid_xattn = AttentionBlock(cfg.num_heads, cfg.groups, pol)
        self.mid_res2 = ResBlock(levels[-1], cfg.groups, pol)

        up_res, up_attn, up_xattn, upsamplers = [], [], [], []
        for li, ch in enumerate(levels):
            res, attns, xattns = [], [], []
            for _ in range(cfg.num_res_blocks + 1):
                res.append(ResBlock(ch, cfg.groups, pol))
                if li in cfg.attn_levels:
                    attns.append(AttentionBlock(cfg.num_heads, cfg.groups, pol))
                    if cfg.cond_token_dim:
                        xattns.append(
                            AttentionBlock(cfg.num_heads, cfg.groups, pol))
            up_res.append(res)
            up_attn.append(attns)
            up_xattn.append(xattns)
            if li != 0:
                upsamplers.append(Upsample(ch, pol))
        self.up_res = up_res
        self.up_attn = up_attn
        self.up_xattn = up_xattn
        self.upsamplers = upsamplers

        self.norm_out = GNSiLU(cfg.groups, pol)
        self.conv_out = nn.Conv(cfg.out_channels * cfg.patch_size ** 2,
                                (3, 3), padding="SAME",
                                dtype=pol.compute_dtype,
                                param_dtype=pol.param_dtype,
                                kernel_init=nn.initializers.zeros)

    # ---- segments ----

    def _temb(self, t):
        temb = sinusoidal_time_embed(t, self.config.base_channels)
        return self.temb_dense2(nn.silu(self.temb_dense1(temb)))

    def _stem(self, x_t, cond_features):
        cfg, pol = self.config, self.policy
        p = cfg.patch_size
        h = _space_to_depth(pol.cast_to_compute(x_t), p)
        if cond_features is not None:
            cf = pol.cast_to_compute(cond_features)
            if cf.shape[1] == x_t.shape[1]:
                cf = _space_to_depth(cf, p)
            elif cf.shape[1] != h.shape[1]:
                raise ValueError(
                    f"cond_features height {cf.shape[1]} matches neither the "
                    f"image ({x_t.shape[1]}) nor the patch grid ({h.shape[1]})")
            h = jnp.concatenate([h, cf], axis=-1)
        return self.conv_in(h)

    def _down_level(self, li, h, temb, cond_tokens, skips):
        for bi in range(self.config.num_res_blocks):
            h = self.down_res[li][bi](h, temb)
            if li in self.config.attn_levels:
                h = self.down_attn[li][bi](h)
                if cond_tokens is not None:
                    h = self.down_xattn[li][bi](h, cond_tokens)
            skips.append(h)
        if li != len(self.config.channel_mult) - 1:
            h = self.downsamplers[li](h)
            skips.append(h)
        return h

    def _up_level(self, li, h, temb, cond_tokens, skips):
        for bi in range(self.config.num_res_blocks + 1):
            h = jnp.concatenate([h, skips.pop()], axis=-1)
            h = self.up_res[li][bi](h, temb)
            if li in self.config.attn_levels:
                h = self.up_attn[li][bi](h)
                if cond_tokens is not None:
                    h = self.up_xattn[li][bi](h, cond_tokens)
        if li != 0:
            h = self.upsamplers[li - 1](h)
        return h

    def _deep(self, h, temb, cond_tokens):
        """Levels ≥ split_level down + mid + up, self-contained skips.

        Input/output live at the split boundary: input is the (not yet
        downsampled) split-1→split handoff, output is the upsampled tensor
        the shallow up-path consumes.
        """
        cfg = self.config
        split = cfg.split_level
        levels = cfg.level_channels
        # The boundary tensor (level split-1's downsample output) is both the
        # deep input and the first deep skip (consumed by up-level split's
        # final res block).
        skips = [h]
        for li in range(split, len(levels)):
            h = self._down_level(li, h, temb, cond_tokens, skips)
        h = self.mid_res1(h, temb)
        h = self.mid_attn(h)
        if cond_tokens is not None:
            h = self.mid_xattn(h, cond_tokens)
        h = self.mid_res2(h, temb)
        for li in reversed(range(split, len(levels))):
            h = self._up_level(li, h, temb, cond_tokens, skips)
        assert not skips
        return h

    # ---- public ----

    def __call__(self, x_t: jnp.ndarray, t: jnp.ndarray,
                 cond_features: Optional[jnp.ndarray] = None,
                 cond_tokens: Optional[jnp.ndarray] = None,
                 deep_cache: Optional[jnp.ndarray] = None,
                 return_cache: bool = False):
        cfg = self.config
        pol = self.policy
        if (cfg.cond_channels > 0) != (cond_features is not None):
            raise ValueError("cond_features must match config.cond_channels")
        if (cfg.cond_token_dim > 0) != (cond_tokens is not None):
            raise ValueError("cond_tokens must match config.cond_token_dim")
        if cond_tokens is not None:
            cond_tokens = pol.cast_to_compute(cond_tokens)

        temb = self._temb(t)
        h = self._stem(x_t, cond_features)

        split = cfg.split_level
        skips = [h]                      # conv_in skip (up level 0 last pop)
        for li in range(split):
            h = self._down_level(li, h, temb, cond_tokens, skips)
        # The boundary skip (level split-1's downsample output == h) belongs
        # to the deep segment, which re-pushes it internally.
        skips.pop()

        if deep_cache is not None:
            deep_out = pol.cast_to_compute(deep_cache)
        else:
            deep_out = self._deep(h, temb, cond_tokens)

        h = deep_out
        for li in reversed(range(split)):
            h = self._up_level(li, h, temb, cond_tokens, skips)
        assert not skips

        h = self.norm_out(h)
        h = self.conv_out(h)
        eps = _depth_to_space(h, cfg.patch_size).astype(jnp.float32)
        if return_cache:
            return eps, deep_out.astype(jnp.float32)
        return eps
