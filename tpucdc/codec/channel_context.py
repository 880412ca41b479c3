"""Channel-group autoregressive entropy model (SURVEY.md C10 extension).

The latent's M channels split into ``num_groups`` equal groups; group g's
(μ, σ) condition on the hyper features plus the already-decoded groups
0..g-1 (ELIC-style channel conditioning). Decoding is ``num_groups`` fully
dense passes — each a conv on the MXU over the whole spatial grid — so, like
the checkerboard model, it avoids serial per-symbol autoregression entirely.

Config-gated via CodecConfig.context = "channel-ar". Composes naturally with
the rest of the stack; combination with the spatial checkerboard (space-
channel ELIC) is future work (TODO.md).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tpucdc.runtime import Policy, DEFAULT_POLICY


class ChannelARContext(nn.Module):
    """(hyper features, decoded prior groups) → per-group (μ, σ)."""
    latent_channels: int
    num_groups: int = 4
    scale_min: float = 0.11
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        if self.latent_channels % self.num_groups:
            raise ValueError("latent_channels must divide into num_groups")
        pol = self.policy
        mg = self.latent_channels // self.num_groups
        heads = []
        for g in range(self.num_groups):
            heads.append([
                nn.Conv(2 * mg, (3, 3), padding="SAME",
                        dtype=pol.compute_dtype, param_dtype=pol.param_dtype),
                nn.Conv(2 * mg, (1, 1),
                        dtype=pol.compute_dtype, param_dtype=pol.param_dtype),
            ])
        self.heads = heads

    @property
    def group_size(self) -> int:
        return self.latent_channels // self.num_groups

    def _split(self, raw):
        means, scales_raw = jnp.split(raw.astype(jnp.float32), 2, axis=-1)
        scales = jnp.maximum(nn.softplus(scales_raw), self.scale_min)
        return means, scales

    def group_params(self, group: int, hyper_feats, y_prev):
        """(μ, σ) for channel group ``group``.

        y_prev: [B, hy, wy, group·Mg] — decoded groups 0..group-1 (empty
        zero-width array for group 0).
        """
        pol = self.policy
        h = jnp.concatenate(
            [pol.cast_to_compute(hyper_feats),
             pol.cast_to_compute(y_prev)], axis=-1)
        conv3, conv1 = self.heads[group]
        return self._split(conv1(nn.silu(conv3(h))))

    def __call__(self, hyper_feats, y_tilde):
        """Training-path convenience: full (μ, σ) over all groups, with each
        group's context taken from y_tilde's prior groups (one-shot approx —
        the same relaxation the coding path quantizes through)."""
        mg = self.group_size
        means, scales = [], []
        for g in range(self.num_groups):
            y_prev = y_tilde[..., :g * mg]
            m, s = self.group_params(g, hyper_feats, y_prev)
            means.append(m)
            scales.append(s)
        return jnp.concatenate(means, -1), jnp.concatenate(scales, -1)
