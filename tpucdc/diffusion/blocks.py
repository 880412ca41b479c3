"""UNet building blocks: ResBlock, attention blocks, resampling (SURVEY.md C6).

ResBlock shape (BASELINE.json:5 clause 2): GroupNorm+SiLU → conv → FiLM-style
time-embedding modulation → GroupNorm+SiLU → conv, with skip connection. The
GN+SiLU pairs dispatch to the fused Pallas kernel on TPU (tpucdc.ops).

Layout is NHWC throughout; parameters f32, compute bf16 per the runtime
precision policy (SURVEY.md C1).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from tpucdc.ops import attention, group_norm_silu
from tpucdc.ops.groupnorm import group_norm
from tpucdc.runtime import Policy, DEFAULT_POLICY


def _num_groups(channels: int, target: int = 32) -> int:
    g = min(target, channels)
    while channels % g:
        g -= 1
    return g


class GNSiLU(nn.Module):
    """GroupNorm+SiLU with learned affine; fused kernel on TPU."""
    groups: int = 32
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = _num_groups(c, self.groups)
        gamma = self.param("scale", nn.initializers.ones, (c,), self.policy.param_dtype)
        beta = self.param("bias", nn.initializers.zeros, (c,), self.policy.param_dtype)
        return group_norm_silu(x, gamma, beta, g)


class ResBlock(nn.Module):
    """GN+SiLU → 3×3 conv → time-FiLM → GN+SiLU → 3×3 conv → +skip."""
    out_channels: int
    groups: int = 32
    policy: Policy = DEFAULT_POLICY
    # scale_shift=True uses (1+scale)*h + shift FiLM; False uses additive bias.
    scale_shift: bool = True

    @nn.compact
    def __call__(self, x, temb):
        pol = self.policy
        conv = lambda ch, name: nn.Conv(
            ch, (3, 3), padding="SAME", name=name,
            dtype=pol.compute_dtype, param_dtype=pol.param_dtype)

        h = GNSiLU(self.groups, pol, name="norm1")(x)
        h = conv(self.out_channels, "conv1")(h)

        emb_dim = (2 if self.scale_shift else 1) * self.out_channels
        emb = nn.Dense(emb_dim, name="temb_proj",
                       dtype=pol.compute_dtype, param_dtype=pol.param_dtype)(
            nn.silu(temb))
        emb = emb[:, None, None, :]
        if self.scale_shift:
            # FiLM applied around the second norm: norm(h)*(1+s)+b, then SiLU.
            scale, shift = jnp.split(emb, 2, axis=-1)
            c = h.shape[-1]
            g = _num_groups(c, self.groups)
            gamma = self.param("norm2_scale", nn.initializers.ones, (c,),
                               pol.param_dtype)
            beta = self.param("norm2_bias", nn.initializers.zeros, (c,),
                              pol.param_dtype)
            h = group_norm(h, gamma, beta, g)
            h = h * (1 + scale) + shift
            h = nn.silu(h)
        else:
            h = h + emb
            h = GNSiLU(self.groups, pol, name="norm2")(h)
        h = conv(self.out_channels, "conv2")(h)

        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="skip",
                        dtype=pol.compute_dtype, param_dtype=pol.param_dtype)(x)
        return x + h


class AttentionBlock(nn.Module):
    """Self-attention over the spatial grid, pre-norm, residual.

    Runs only at low resolutions (BASELINE.json:5 clause 2); dispatches to the
    Pallas blocked-attention kernel on TPU.
    """
    num_heads: int = 4
    groups: int = 32
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x, context: Optional[jnp.ndarray] = None):
        pol = self.policy
        b, hgt, wid, c = x.shape
        g = _num_groups(c, self.groups)
        gamma = self.param("norm_scale", nn.initializers.ones, (c,), pol.param_dtype)
        beta = self.param("norm_bias", nn.initializers.zeros, (c,), pol.param_dtype)
        h = group_norm(x, gamma, beta, g)
        tokens = h.reshape(b, hgt * wid, c)

        kv_src = tokens if context is None else context
        dense = lambda ch, name: nn.Dense(
            ch, name=name, dtype=pol.compute_dtype, param_dtype=pol.param_dtype)
        q = dense(c, "q")(tokens)
        k = dense(c, "k")(kv_src)
        v = dense(c, "v")(kv_src)

        def heads(t):
            return t.reshape(b, t.shape[1], self.num_heads,
                             c // self.num_heads).transpose(0, 2, 1, 3)

        out = attention(heads(q), heads(k), heads(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, hgt * wid, c)
        out = dense(c, "proj")(out)
        return x + out.reshape(b, hgt, wid, c)


class Downsample(nn.Module):
    """2× strided-conv downsample."""
    channels: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.channels, (3, 3), strides=(2, 2), padding="SAME",
                       dtype=self.policy.compute_dtype,
                       param_dtype=self.policy.param_dtype)(x)


class Upsample(nn.Module):
    """2× nearest-neighbor upsample + 3×3 conv."""
    channels: int
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(self.channels, (3, 3), padding="SAME",
                       dtype=self.policy.compute_dtype,
                       param_dtype=self.policy.param_dtype)(x)
