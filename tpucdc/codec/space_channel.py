"""Combined space-channel context entropy model (SURVEY.md C10 extension).

ELIC-style composition of the two parallel context mechanisms:
channels split into ``num_groups`` groups (channel_context.py) and, within
each group, a spatial checkerboard split (context_model.py). Group g's
ANCHORS condition on the hyper features + all decoded prior groups; its
NON-ANCHORS additionally see a masked conv over the group's decoded anchors.
Decoding is 2·G dense passes — every pass a full-grid conv on the MXU.

Config-gated via CodecConfig.context = "space-channel".
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tpucdc.codec.context_model import checkerboard_mask
from tpucdc.runtime import Policy, DEFAULT_POLICY


class SpaceChannelContext(nn.Module):
    latent_channels: int
    num_groups: int = 4
    scale_min: float = 0.11
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        if self.latent_channels % self.num_groups:
            raise ValueError("latent_channels must divide into num_groups")
        pol = self.policy
        mg = self.latent_channels // self.num_groups
        conv = lambda ch, k: nn.Conv(ch, (k, k), padding="SAME",
                                     dtype=pol.compute_dtype,
                                     param_dtype=pol.param_dtype)
        anchor_heads, ctx_convs, fuse = [], [], []
        for _ in range(self.num_groups):
            anchor_heads.append([conv(2 * mg, 3), conv(2 * mg, 1)])
            ctx_convs.append(conv(2 * mg, 5))
            fuse.append([conv(2 * mg, 1), conv(2 * mg, 1)])
        self.anchor_heads = anchor_heads
        self.ctx_convs = ctx_convs
        self.fuse = fuse

    @property
    def group_size(self) -> int:
        return self.latent_channels // self.num_groups

    def _split(self, raw):
        means, scales_raw = jnp.split(raw.astype(jnp.float32), 2, axis=-1)
        return means, jnp.maximum(nn.softplus(scales_raw), self.scale_min)

    def anchor_params(self, group: int, hyper_feats, y_prev):
        """Group ``group`` anchors: hyper + decoded prior groups."""
        pol = self.policy
        h = jnp.concatenate([pol.cast_to_compute(hyper_feats),
                             pol.cast_to_compute(y_prev)], axis=-1)
        c3, c1 = self.anchor_heads[group]
        return self._split(c1(nn.silu(c3(h))))

    def nonanchor_params(self, group: int, hyper_feats, y_prev,
                         y_group_anchor_masked):
        """Group ``group`` non-anchors: + masked conv over its own anchors."""
        pol = self.policy
        ctx = self.ctx_convs[group](pol.cast_to_compute(y_group_anchor_masked))
        c3, c1 = self.anchor_heads[group]
        base = c1(nn.silu(c3(jnp.concatenate(
            [pol.cast_to_compute(hyper_feats),
             pol.cast_to_compute(y_prev)], axis=-1))))
        f1, f2 = self.fuse[group]
        h = nn.silu(f1(jnp.concatenate([base, ctx], axis=-1)))
        return self._split(f2(h))

    def __call__(self, hyper_feats, y_tilde):
        """Training-path convenience: full (μ, σ); each position's params use
        only its causal context (prior groups + same-group anchors)."""
        hgt, wid = y_tilde.shape[1], y_tilde.shape[2]
        am = jnp.asarray(checkerboard_mask(hgt, wid, anchor=True))
        mg = self.group_size
        means, scales = [], []
        for g in range(self.num_groups):
            y_prev = y_tilde[..., :g * mg]
            y_g = y_tilde[..., g * mg:(g + 1) * mg]
            m_a, s_a = self.anchor_params(g, hyper_feats, y_prev)
            m_na, s_na = self.nonanchor_params(g, hyper_feats, y_prev,
                                               y_g * am)
            means.append(m_a * am + m_na * (1 - am))
            scales.append(s_a * am + s_na * (1 - am))
        return jnp.concatenate(means, -1), jnp.concatenate(scales, -1)
