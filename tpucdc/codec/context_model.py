"""Checkerboard spatial-context entropy model (SURVEY.md C10 extension).

Upgrades the pure hyperprior: the latent y is split by spatial parity into
ANCHORS ((i+j) even) and NON-ANCHORS. Anchors are coded from hyper-side
parameters alone; non-anchors additionally see a masked 5×5 conv over the
already-decoded anchors. Decoding stays two fully-parallel passes (one per
parity) — the TPU-friendly alternative to serial autoregression: every
"context" op is a dense conv on the MXU, and the host coder simply runs
twice.

Config-gated (CodecConfig.context = "hyperprior" | "checkerboard"); the
hyperprior path stays the default until trained R-D comparisons land.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from tpucdc.runtime import Policy, DEFAULT_POLICY


def checkerboard_mask(h: int, w: int, anchor: bool) -> np.ndarray:
    """[h, w, 1] float mask; anchor=True selects (i+j) even positions."""
    ii, jj = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    m = ((ii + jj) % 2 == 0) if anchor else ((ii + jj) % 2 == 1)
    return m.astype(np.float32)[..., None]


class CheckerboardContext(nn.Module):
    """(hyper features, decoded anchors) → (μ, σ) for BOTH parities.

    ``hyper_feats``: [B, hy, wy, F] from HyperSynthesis (feature mode).
    Returns (means_anchor, scales_anchor) from hyper alone and a function of
    the anchor-decoded ŷ for the non-anchor parameters.
    """
    latent_channels: int
    scale_min: float = 0.11
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        pol = self.policy
        c = self.latent_channels
        # Anchor params: hyper features only.
        self.anchor_head = nn.Conv(2 * c, (1, 1), dtype=pol.compute_dtype,
                                   param_dtype=pol.param_dtype)
        # Context: dense 5×5 conv over the (masked) anchor latents. The
        # input is zeroed at non-anchor positions, so no information leaks —
        # masking the INPUT is equivalent to a checkerboard-masked kernel
        # here because only anchor positions are ever non-zero.
        self.ctx_conv = nn.Conv(2 * c, (5, 5), padding="SAME",
                                dtype=pol.compute_dtype,
                                param_dtype=pol.param_dtype)
        # Fuse hyper + context → non-anchor params.
        self.fuse1 = nn.Conv(2 * c, (1, 1), dtype=pol.compute_dtype,
                             param_dtype=pol.param_dtype)
        self.fuse2 = nn.Conv(2 * c, (1, 1), dtype=pol.compute_dtype,
                             param_dtype=pol.param_dtype)

    def _split(self, raw):
        means, scales_raw = jnp.split(raw.astype(jnp.float32), 2, axis=-1)
        scales = jnp.maximum(nn.softplus(scales_raw), self.scale_min)
        return means, scales

    def anchor_params(self, hyper_feats):
        return self._split(self.anchor_head(hyper_feats))

    def nonanchor_params(self, hyper_feats, y_anchor_masked):
        """y_anchor_masked: ŷ with non-anchor positions zeroed."""
        pol = self.policy
        ctx = self.ctx_conv(pol.cast_to_compute(y_anchor_masked))
        h = jnp.concatenate([self.anchor_head(hyper_feats), ctx], axis=-1)
        h = nn.silu(self.fuse1(h))
        return self._split(self.fuse2(h))

    def __call__(self, hyper_feats, y_hat):
        """Training-path convenience: full (μ, σ) maps for both parities.

        y_hat is the (noisy or STE-rounded) latent; anchors are masked out
        of the context input so non-anchors only condition on anchors.
        """
        hgt, wid = y_hat.shape[1], y_hat.shape[2]
        a_mask = jnp.asarray(checkerboard_mask(hgt, wid, anchor=True))
        m_a, s_a = self.anchor_params(hyper_feats)
        m_na, s_na = self.nonanchor_params(hyper_feats, y_hat * a_mask)
        means = m_a * a_mask + m_na * (1 - a_mask)
        scales = s_a * a_mask + s_na * (1 - a_mask)
        return means, scales
