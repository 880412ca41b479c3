"""Analysis transform and hyperprior transforms (SURVEY.md C8, C9).

The learned transform-coding front end (BASELINE.json:5 clause 1): a strided
conv stack ``g_a`` maps the image to the latent ``y`` (16× downsample), the
hyper-analysis ``h_a`` maps ``y`` to side information ``z`` (a further 4×),
and the hyper-synthesis ``h_s`` maps the decoded ``ẑ`` to the (μ, σ) of the
conditional Gaussian over ``y``. With ``CodecConfig.synthesis`` a mirror
synthesis transform ``g_s`` decodes ŷ to an initial reconstruction x̄ that
the conditional diffusion decoder (L3/L4) refines; without it,
reconstruction is the diffusion decoder alone (the round-1 design).

``g_a`` uses GDN activations (generalized divisive normalization — the
standard transform-coding nonlinearity): y_c = x_c / sqrt(β_c + Σ_k γ_ck x_k²),
implemented as a 1×1 conv on squared activations (an MXU matmul; TPU-cheap).
NHWC layout; bf16 compute / f32 params.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpucdc.runtime import Policy, DEFAULT_POLICY


@dataclasses.dataclass(frozen=True)
class CodecConfig:
    hidden_channels: int = 128     # N: width of g_a / h_a / h_s stacks
    latent_channels: int = 192     # M: channels of y
    hyper_channels: int = 128      # channels of z
    # Lower bound on predicted scales (matches GaussianConditional).
    scale_min: float = 0.11
    # Entropy model over y: "hyperprior" (μ,σ from ẑ only), "checkerboard"
    # (two-pass spatial context — codec/context_model.py) or "channel-ar"
    # (channel-group conditioning — codec/channel_context.py).
    context: str = "hyperprior"
    # Channel groups for context == "channel-ar".
    context_groups: int = 4
    # Variable-rate gain units: one model serving num_qualities rate points
    # via learned per-channel gains on y (1 = single-rate). The bitstream
    # header's quality_id selects the gain vector at decode.
    num_qualities: int = 1
    # Deterministic synthesis transform g_s (round 2): when True the model
    # carries a mirror of g_a that decodes ŷ to an initial reconstruction x̄.
    # x̄ (a) trains fast to a classical-codec PSNR floor, (b) conditions the
    # UNet by input concat so diffusion refines a reconstruction instead of
    # hallucinating from noise, and (c) enables truncated sampling (decode
    # starts from noised x̄ at t_start ≪ T — fewer steps, same quality).
    synthesis: bool = False

    @property
    def latent_factor(self) -> int:
        return 16                  # four stride-2 stages in g_a

    @property
    def hyper_factor(self) -> int:
        return 4                   # two stride-2 stages in h_a


class GDN(nn.Module):
    """Generalized divisive normalization (inverse=False) over channels.

    β ≥ eps and γ ≥ 0 are enforced by squared reparameterization, which keeps
    the op jit-friendly (no projections between steps).
    """
    inverse: bool = False
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        beta_r = self.param("beta_r", nn.initializers.constant(1.0), (c,),
                            jnp.float32)
        gamma_r = self.param(
            "gamma_r",
            lambda k, s: 0.1 * jnp.eye(c, dtype=jnp.float32).reshape(s), (c, c))
        beta = beta_r * beta_r + 1e-6
        gamma = gamma_r * gamma_r
        xf = x.astype(jnp.float32)
        norm = jnp.einsum("bhwc,ck->bhwk", xf * xf, gamma,
                          preferred_element_type=jnp.float32) + beta
        out = xf * jnp.sqrt(norm) if self.inverse else xf * jax.lax.rsqrt(norm)
        return out.astype(x.dtype)


class AnalysisTransform(nn.Module):
    """g_a: image [B,H,W,3] → latent y [B,H/16,W/16,M] (SURVEY.md C8)."""
    config: CodecConfig = CodecConfig()
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        cfg, pol = self.config, self.policy
        h = pol.cast_to_compute(x)
        for i in range(3):
            h = nn.Conv(cfg.hidden_channels, (5, 5), strides=(2, 2),
                        padding="SAME", name=f"conv{i}",
                        dtype=pol.compute_dtype, param_dtype=pol.param_dtype)(h)
            h = GDN(policy=pol, name=f"gdn{i}")(h)
        h = nn.Conv(cfg.latent_channels, (5, 5), strides=(2, 2),
                    padding="SAME", name="conv3",
                    dtype=pol.compute_dtype, param_dtype=pol.param_dtype)(h)
        return h.astype(jnp.float32)


class SynthesisTransform(nn.Module):
    """g_s: latent ŷ [B,H/16,W/16,M] → reconstruction x̄ [B,H,W,3].

    Mirror of ``g_a``: four stride-2 transposed convs with inverse-GDN
    between them (the classical mean-scale-hyperprior decoder). Output is
    unbounded; callers clip to the [-1, 1] image range at eval. All convs
    are MXU matmuls in the compute dtype; the output is f32.
    """
    config: CodecConfig = CodecConfig()
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, y_hat):
        cfg, pol = self.config, self.policy
        h = pol.cast_to_compute(y_hat)
        for i in range(3):
            h = nn.ConvTranspose(cfg.hidden_channels, (5, 5), strides=(2, 2),
                                 padding="SAME", name=f"deconv{i}",
                                 dtype=pol.compute_dtype,
                                 param_dtype=pol.param_dtype)(h)
            h = GDN(inverse=True, policy=pol, name=f"igdn{i}")(h)
        h = nn.ConvTranspose(3, (5, 5), strides=(2, 2), padding="SAME",
                             name="deconv3", dtype=pol.compute_dtype,
                             param_dtype=pol.param_dtype)(h)
        return h.astype(jnp.float32)


class HyperAnalysis(nn.Module):
    """h_a: y → z [B,H/64,W/64,Cz] (SURVEY.md C9)."""
    config: CodecConfig = CodecConfig()
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, y):
        cfg, pol = self.config, self.policy
        conv = lambda ch, k, s, name: nn.Conv(
            ch, (k, k), strides=(s, s), padding="SAME", name=name,
            dtype=pol.compute_dtype, param_dtype=pol.param_dtype)
        h = pol.cast_to_compute(jnp.abs(y))
        h = nn.silu(conv(cfg.hidden_channels, 3, 1, "conv0")(h))
        h = nn.silu(conv(cfg.hidden_channels, 5, 2, "conv1")(h))
        h = conv(cfg.hyper_channels, 5, 2, "conv2")(h)
        return h.astype(jnp.float32)


class HyperSynthesis(nn.Module):
    """h_s: ẑ → (μ, σ) of the conditional Gaussian over y (SURVEY.md C9).

    With ``features=True`` (the checkerboard context model's trunk) it
    returns the pre-projection feature map instead of (μ, σ)."""
    config: CodecConfig = CodecConfig()
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, z_hat, features: bool = False):
        cfg, pol = self.config, self.policy
        h = pol.cast_to_compute(z_hat)
        for i, ch in enumerate((cfg.hidden_channels, cfg.hidden_channels)):
            h = nn.ConvTranspose(ch, (5, 5), strides=(2, 2), padding="SAME",
                                 name=f"deconv{i}", dtype=pol.compute_dtype,
                                 param_dtype=pol.param_dtype)(h)
            h = nn.silu(h)
        if features:
            return h
        h = nn.Conv(2 * cfg.latent_channels, (3, 3), padding="SAME",
                    name="proj", dtype=pol.compute_dtype,
                    param_dtype=pol.param_dtype)(h)
        h = h.astype(jnp.float32)
        means, scales_raw = jnp.split(h, 2, axis=-1)
        scales = jnp.maximum(jax.nn.softplus(scales_raw), self.config.scale_min)
        return means, scales
