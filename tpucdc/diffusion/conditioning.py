"""Conditioning head: decoded latent ŷ → UNet conditioning signal (SURVEY.md C12).

BASELINE.json:5 clause 2 calls for latent-conditioning via concat AND
cross-attention. The head maps the 16×-downsampled codec latent to
  * ``features``: an image-resolution feature map to channel-concat at the
    UNet input (learned conv + ×2 nearest upsampling stages), and
  * ``tokens``: a [B, Hy·Wy, D] sequence for cross-attention K/V.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from tpucdc.diffusion.blocks import GNSiLU
from tpucdc.runtime import Policy, DEFAULT_POLICY


@dataclasses.dataclass(frozen=True)
class ConditioningConfig:
    # Latent downsample factor relative to the image (16 for the g_a stack).
    latent_factor: int = 16
    feature_channels: int = 32     # channels of the concat feature map
    token_dim: int = 128           # dim of the cross-attn token sequence
    hidden_channels: int = 128
    # Resolution of the emitted feature map relative to the image: 1 = image
    # resolution; p = the UNet's post-patch grid (H/p, W/p) so the features
    # concat directly after space-to-depth with no channel blow-up.
    output_stride: int = 1
    # Upsampling stage kind: "repeat" (nearest ×2 then conv — materializes
    # the upsampled map in HBM twice; XProf r1: ~4.3 ms/decode of copy +
    # reshape on flagship) or "shuffle" (conv to 4·ch at LOW res then
    # depth-to-space — same FLOPs on the MXU, no repeat materialization).
    upsample: str = "repeat"


class ConditioningHead(nn.Module):
    """ŷ [B, Hy, Wy, Cy] → (features [B, Hy·f, Wy·f, Cf], tokens [B, Hy·Wy, D])."""
    config: ConditioningConfig = ConditioningConfig()
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, y_hat: jnp.ndarray):
        cfg = self.config
        pol = self.policy
        conv = lambda ch, name, k=3: nn.Conv(
            ch, (k, k), padding="SAME", name=name,
            dtype=pol.compute_dtype, param_dtype=pol.param_dtype)

        h = pol.cast_to_compute(y_hat)
        h = conv(cfg.hidden_channels, "stem")(h)
        h = GNSiLU(policy=pol, name="stem_norm")(h)

        tokens = nn.Dense(cfg.token_dim, name="token_proj",
                          dtype=pol.compute_dtype,
                          param_dtype=pol.param_dtype)(
            h.reshape(h.shape[0], -1, h.shape[-1]))

        # Progressive ×2 upsampling to image resolution / output_stride.
        up_factor = cfg.latent_factor // cfg.output_stride
        stages = up_factor.bit_length() - 1           # log2(up_factor)
        assert 2 ** stages == up_factor, \
            "latent_factor/output_stride must be a power of 2"
        ch = cfg.hidden_channels
        for s in range(stages):
            ch = max(cfg.feature_channels, ch // 2)
            if cfg.upsample == "shuffle":
                # conv at LOW res to 4·ch, then depth-to-space ×2: identical
                # MXU FLOPs to repeat+conv, none of the HBM repeat traffic.
                h = conv(4 * ch, f"up{s}")(h)
                b, hh, ww, cc = h.shape
                h = h.reshape(b, hh, ww, 2, 2, cc // 4)
                h = h.transpose(0, 1, 3, 2, 4, 5).reshape(
                    b, hh * 2, ww * 2, cc // 4)
            else:
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = conv(ch, f"up{s}")(h)
            h = GNSiLU(policy=pol, name=f"up{s}_norm")(h)
        features = conv(cfg.feature_channels, "out", k=3)(h)
        return features, tokens
