"""Flagship model: codec front end + conditional diffusion decoder.

One flax module tree bundling g_a / h_a / h_s, the factorized prior over z,
the conditioning head, and the conditional UNet (SURVEY.md §1.2 L2+L3;
BASELINE.json:5 clauses 1-2) so a single params pytree covers training,
checkpointing, and both coding pipelines. The GaussianConditional over y is
stateless (scale-table based) and lives alongside, not inside, the tree.

Images are in [-1, 1]; the latent y is 16× downsampled, z a further 4×.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from tpucdc.codec import (AnalysisTransform, FactorizedPrior, GaussianConditional,
                          HyperAnalysis, HyperSynthesis)
from tpucdc.codec.quantization import additive_noise, quantize_dequantize, ste_round
from tpucdc.config import ModelConfig
from tpucdc.diffusion import ConditioningHead, UNet
from tpucdc.ops import make_schedule
from tpucdc.runtime import Policy, DEFAULT_POLICY


class CDCModel(nn.Module):
    config: ModelConfig
    policy: Policy = DEFAULT_POLICY

    def setup(self):
        cfg = self.config
        self.g_a = AnalysisTransform(cfg.codec, policy=self.policy)
        self.h_a = HyperAnalysis(cfg.codec, policy=self.policy)
        self.h_s = HyperSynthesis(cfg.codec, policy=self.policy)
        self.factorized = FactorizedPrior(channels=cfg.codec.hyper_channels)
        if cfg.codec.synthesis:
            from tpucdc.codec import SynthesisTransform
            self.g_s = SynthesisTransform(cfg.codec, policy=self.policy)
        self.cond_head = ConditioningHead(cfg.cond, policy=self.policy)
        self.unet = UNet(cfg.unet, policy=self.policy)
        if cfg.codec.context == "checkerboard":
            from tpucdc.codec.context_model import CheckerboardContext
            self.context = CheckerboardContext(
                latent_channels=cfg.codec.latent_channels,
                scale_min=cfg.codec.scale_min, policy=self.policy)
        elif cfg.codec.context == "channel-ar":
            from tpucdc.codec.channel_context import ChannelARContext
            self.context = ChannelARContext(
                latent_channels=cfg.codec.latent_channels,
                num_groups=cfg.codec.context_groups,
                scale_min=cfg.codec.scale_min, policy=self.policy)
        elif cfg.codec.context == "space-channel":
            from tpucdc.codec.space_channel import SpaceChannelContext
            self.context = SpaceChannelContext(
                latent_channels=cfg.codec.latent_channels,
                num_groups=cfg.codec.context_groups,
                scale_min=cfg.codec.scale_min, policy=self.policy)
        if cfg.codec.num_qualities > 1:
            # Variable-rate gain units: y is scaled per quality before the
            # hyper/entropy path and inversely rescaled for conditioning.
            q, m = cfg.codec.num_qualities, cfg.codec.latent_channels
            self.gains = self.param("gains", nn.initializers.ones,
                                    (q, m), jnp.float32)
            self.inv_gains = self.param("inv_gains", nn.initializers.ones,
                                        (q, m), jnp.float32)

    # ---- training forward (SURVEY.md §3.1 inner loop) ----

    def __call__(self, x, rng, schedule_tables, train: bool = True,
                 quality=None):
        """Joint rate-distortion + diffusion forward pass.

        x: [B,H,W,3] in [-1,1]; schedule_tables: dict with 'sqrt_ab' and
        'sqrt_1mab' [T] arrays (passed in, not baked, so one compiled step
        serves any schedule). With num_qualities > 1, ``quality`` is a [B]
        int32 of gain indices (sampled uniformly when None in training).
        Returns the loss ingredients.
        """
        b = x.shape[0]
        k_zq, k_yq, k_t, k_eps, k_drop, k_q = jax.random.split(rng, 6)

        nq = self.config.codec.num_qualities
        if nq > 1 and quality is None:
            quality = jax.random.randint(k_q, (b,), 0, nq)

        y = self.g_a(x)
        if nq > 1:
            y = y * self.gains[quality][:, None, None, :]
        z = self.h_a(y)
        if train:
            z_tilde = additive_noise(z, k_zq)
        else:
            med = self.factorized.medians().reshape(1, 1, 1, -1)
            z_tilde = ste_round(z - med) + med
        lik_z = self.factorized(z_tilde)
        ctx_kind = self.config.codec.context
        if ctx_kind == "checkerboard":
            feats = self.h_s(z_tilde, features=True)
            if train:
                y_tilde = additive_noise(y, k_yq)
            else:
                # Two-pass quantization: anchors from hyper-only params,
                # non-anchors conditioned on the quantized anchors.
                from tpucdc.codec.context_model import checkerboard_mask
                a_mask = jnp.asarray(checkerboard_mask(
                    y.shape[1], y.shape[2], anchor=True))
                m_a, _ = self.context.anchor_params(feats)
                y_a = quantize_dequantize(y, m_a) * a_mask
                m_na, _ = self.context.nonanchor_params(feats, y_a)
                y_tilde = y_a + quantize_dequantize(y, m_na) * (1 - a_mask)
            means, scales = self.context(feats, y_tilde)
        elif ctx_kind == "channel-ar":
            feats = self.h_s(z_tilde, features=True)
            if train:
                y_tilde = additive_noise(y, k_yq)
            else:
                # Sequential per-group quantization (G dense passes).
                mg = self.context.group_size
                parts = []
                for g in range(self.context.num_groups):
                    y_prev = (jnp.concatenate(parts, -1) if parts
                              else y[..., :0])
                    m_g, _ = self.context.group_params(g, feats, y_prev)
                    parts.append(quantize_dequantize(
                        y[..., g * mg:(g + 1) * mg], m_g))
                y_tilde = jnp.concatenate(parts, -1)
            means, scales = self.context(feats, y_tilde)
        elif ctx_kind == "space-channel":
            feats = self.h_s(z_tilde, features=True)
            if train:
                y_tilde = additive_noise(y, k_yq)
            else:
                # 2·G-pass quantization: per group, anchors then non-anchors.
                from tpucdc.codec.context_model import checkerboard_mask
                am = jnp.asarray(checkerboard_mask(
                    y.shape[1], y.shape[2], anchor=True))
                mg = self.context.group_size
                parts = []
                for g in range(self.context.num_groups):
                    y_prev = (jnp.concatenate(parts, -1) if parts
                              else y[..., :0])
                    y_g = y[..., g * mg:(g + 1) * mg]
                    m_a, _ = self.context.anchor_params(g, feats, y_prev)
                    y_g_a = quantize_dequantize(y_g, m_a) * am
                    m_na, _ = self.context.nonanchor_params(
                        g, feats, y_prev, y_g_a)
                    parts.append(
                        y_g_a + quantize_dequantize(y_g, m_na) * (1 - am))
                y_tilde = jnp.concatenate(parts, -1)
            means, scales = self.context(feats, y_tilde)
        else:
            means, scales = self.h_s(z_tilde)
            y_tilde = (additive_noise(y, k_yq) if train
                       else quantize_dequantize(y, means))
        gaussian = GaussianConditional()
        lik_y = gaussian.likelihood(y_tilde, means, scales)

        y_for_cond = y_tilde
        if nq > 1:
            y_for_cond = y_tilde * self.inv_gains[quality][:, None, None, :]
        x_bar = self.g_s(y_for_cond) if self.config.codec.synthesis else None
        cond_f, cond_t = self.cond_head(y_for_cond)
        if train and self.config.cond_dropout_prob > 0:
            # Classifier-free guidance training: zero the conditioning for a
            # random subset so the UNet learns an unconditional branch.
            keep = (jax.random.uniform(k_drop, (b,))
                    >= self.config.cond_dropout_prob)
            cond_f = cond_f * keep[:, None, None, None].astype(cond_f.dtype)
            cond_t = cond_t * keep[:, None, None].astype(cond_t.dtype)
            if x_bar is not None:
                x_bar_in = x_bar * keep[:, None, None, None].astype(x_bar.dtype)
            else:
                x_bar_in = None
        else:
            x_bar_in = x_bar

        T = schedule_tables["sqrt_ab"].shape[0]
        k_t, k_tl, k_tm = jax.random.split(k_t, 3)
        t = jax.random.randint(k_t, (b,), 0, T)
        if self.config.t_low_prob > 0.0:
            # Low-t bias (config.t_low_*): concentrate refiner training on
            # the noise range truncated serving actually visits.
            t_low = jax.random.randint(
                k_tl, (b,), 0, max(int(self.config.t_low_frac * T), 1))
            t = jnp.where(
                jax.random.uniform(k_tm, (b,)) < self.config.t_low_prob,
                t_low, t)
        eps = jax.random.normal(k_eps, x.shape, jnp.float32)
        shape = (-1, 1, 1, 1)
        x_t = (schedule_tables["sqrt_ab"][t].reshape(shape) * x
               + schedule_tables["sqrt_1mab"][t].reshape(shape) * eps)
        unet_in = (x_t if x_bar_in is None
                   else jnp.concatenate([x_t, x_bar_in], axis=-1))
        net_out = self.unet(unet_in, t, cond_f, cond_t)

        num_pixels = x.shape[1] * x.shape[2]
        bpp_y = jnp.sum(-jnp.log2(lik_y)) / (b * num_pixels)
        bpp_z = jnp.sum(-jnp.log2(lik_z)) / (b * num_pixels)

        sab = schedule_tables["sqrt_ab"][t].reshape(shape)
        s1mab = schedule_tables["sqrt_1mab"][t].reshape(shape)
        if self.config.prediction in ("x0", "residual"):
            # Direct clean-image prediction: the one-step estimate IS the
            # net output ("x0") or x̄ plus the net output ("residual" — the
            # identity to the mean decode is exact by construction, so the
            # refiner can only learn a perturbation around x̄; r3).
            # ε derived for the metric ONLY (s1mab floored so the t→0
            # amplification doesn't blow up the logged mse_eps) —
            # stop_gradient keeps the floored derivation out of the loss
            # even when TrainConfig.distortion includes the eps term
            # (ADVICE r2: 'both' silently backpropagated the floored eps,
            # reweighting low-t samples contrary to this comment).
            if self.config.prediction == "residual":
                # stop_gradient on x̄ (ADVICE r3): x0_pred feeds the
                # diff_weight·mse_x0 and lpips terms, which train the REFINER
                # only — without the stop, those terms had a unit-Jacobian
                # path into g_s/g_a/entropy, pulling the mean-decode anchor
                # off MSE-optimal (loss_fn's documented design: the R-D
                # tradeoff rides on λ·MSE(x̄, x) alone). x̄ stays live in
                # that λ-weighted term via out["x_bar"].
                x0_pred = jax.lax.stop_gradient(x_bar) + net_out
            else:
                x0_pred = net_out
            eps_hat = jax.lax.stop_gradient(
                (x_t - sab * x0_pred) / jnp.maximum(s1mab, 5e-2))
        else:
            # ε-prediction: x0-space reconstruction implied by ε̂ (one-step
            # estimate; used by the x0 distortion term, SURVEY.md C17).
            eps_hat = net_out
            x0_pred = (x_t - s1mab * eps_hat) / jnp.maximum(sab, 1e-3)
        return {
            "eps": eps, "eps_hat": eps_hat, "t": t,
            "bpp_y": bpp_y, "bpp_z": bpp_z,
            "x0_pred": x0_pred, "x0": x,
            "x_bar": x_bar,
            "y": y, "y_tilde": y_tilde, "z": z,
            "quality": quality,
        }

    def aux_loss(self):
        return self.factorized.aux_loss()

    # ---- coding-path pieces (each jitted separately by the pipelines) ----

    def encode(self, x):
        """Image → (y, z) continuous latents (SURVEY.md §3.2 device part)."""
        y = self.g_a(x)
        z = self.h_a(y)
        return y, z

    def encode_gained(self, x, quality: int):
        """Variable-rate encode: gain applied to y before the hyper path.

        ``quality`` is a static Python int (one compiled program per rate
        point — num_qualities is small)."""
        y = self.g_a(x) * self.gains[quality]
        z = self.h_a(y)
        return y, z

    def inv_gain(self, y_hat, quality: int):
        """ŷ (gained domain) → conditioning domain."""
        return y_hat * self.inv_gains[quality]

    # ---- continuous-rate variants (r4): the gain is a TRACED [C] vector
    # interpolated on host between trained ladder rows
    # (CodecRuntime.quality_gains), so ONE compiled program serves every
    # fractional quality — where encode_gained compiles one per level. ----

    def encode_gained_vec(self, x, gain):
        """Variable-rate encode with a traced per-channel gain vector."""
        y = self.g_a(x) * gain
        z = self.h_a(y)
        return y, z

    def inv_gain_vec(self, y_hat, inv_gain):
        """ŷ (gained domain) → conditioning domain, traced [C] vector."""
        return y_hat * inv_gain

    def gain_tables(self):
        """(gains, inv_gains) [Q, C] — host-side interpolation source."""
        return self.gains, self.inv_gains

    def rate_estimate(self, x, gain=None):
        """Analytic (bpp_y, bpp_z) for x under eval-mode quantization —
        the on-device rate probe behind fast rate control
        (CodecRuntime.estimate_bpp / compress_to_bpp probe="estimate").

        Mirrors __call__'s train=False entropy branches exactly (the
        parity test pins them together) but skips the diffusion half —
        one small program instead of a full host rANS encode per probe,
        for every context kind. ``gain`` is a traced [C] vector (None =
        single-rate); bpps are per PADDED pixel (caller rescales)."""
        y = self.g_a(x)
        if gain is not None:
            y = y * gain
        z = self.h_a(y)
        med = self.factorized.medians().reshape(1, 1, 1, -1)
        z_tilde = ste_round(z - med) + med
        lik_z = self.factorized(z_tilde)
        ctx_kind = self.config.codec.context
        if ctx_kind == "checkerboard":
            feats = self.h_s(z_tilde, features=True)
            from tpucdc.codec.context_model import checkerboard_mask
            a_mask = jnp.asarray(checkerboard_mask(
                y.shape[1], y.shape[2], anchor=True))
            m_a, _ = self.context.anchor_params(feats)
            y_a = quantize_dequantize(y, m_a) * a_mask
            m_na, _ = self.context.nonanchor_params(feats, y_a)
            y_tilde = y_a + quantize_dequantize(y, m_na) * (1 - a_mask)
            means, scales = self.context(feats, y_tilde)
        elif ctx_kind == "channel-ar":
            feats = self.h_s(z_tilde, features=True)
            mg = self.context.group_size
            parts = []
            for g in range(self.context.num_groups):
                y_prev = (jnp.concatenate(parts, -1) if parts
                          else y[..., :0])
                m_g, _ = self.context.group_params(g, feats, y_prev)
                parts.append(quantize_dequantize(
                    y[..., g * mg:(g + 1) * mg], m_g))
            y_tilde = jnp.concatenate(parts, -1)
            means, scales = self.context(feats, y_tilde)
        elif ctx_kind == "space-channel":
            feats = self.h_s(z_tilde, features=True)
            from tpucdc.codec.context_model import checkerboard_mask
            am = jnp.asarray(checkerboard_mask(
                y.shape[1], y.shape[2], anchor=True))
            mg = self.context.group_size
            parts = []
            for g in range(self.context.num_groups):
                y_prev = (jnp.concatenate(parts, -1) if parts
                          else y[..., :0])
                y_g = y[..., g * mg:(g + 1) * mg]
                m_a, _ = self.context.anchor_params(g, feats, y_prev)
                y_g_a = quantize_dequantize(y_g, m_a) * am
                m_na, _ = self.context.nonanchor_params(
                    g, feats, y_prev, y_g_a)
                parts.append(
                    y_g_a + quantize_dequantize(y_g, m_na) * (1 - am))
            y_tilde = jnp.concatenate(parts, -1)
            means, scales = self.context(feats, y_tilde)
        else:
            means, scales = self.h_s(z_tilde)
            y_tilde = quantize_dequantize(y, means)
        lik_y = GaussianConditional().likelihood(y_tilde, means, scales)
        b = x.shape[0]
        num_pixels = x.shape[1] * x.shape[2]
        bpp_y = jnp.sum(-jnp.log2(lik_y)) / (b * num_pixels)
        bpp_z = jnp.sum(-jnp.log2(lik_z)) / (b * num_pixels)
        return bpp_y, bpp_z

    def hyper_decode(self, z_hat):
        """ẑ → (μ, σ) for the Gaussian conditional (SURVEY.md §3.3)."""
        return self.h_s(z_hat)

    # ---- checkerboard-context coding pieces (codec/context_model.py) ----

    def hyper_features(self, z_hat):
        return self.h_s(z_hat, features=True)

    def ctx_anchor_params(self, feats):
        return self.context.anchor_params(feats)

    def ctx_nonanchor_params(self, feats, y_anchor_masked):
        return self.context.nonanchor_params(feats, y_anchor_masked)

    def ctx_group_params(self, group: int, feats, y_prev):
        """Channel-AR: (μ, σ) of channel group ``group`` given prior groups."""
        return self.context.group_params(group, feats, y_prev)

    def sc_anchor_params(self, group: int, feats, y_prev):
        """Space-channel: group anchors from hyper + prior groups."""
        return self.context.anchor_params(group, feats, y_prev)

    def sc_nonanchor_params(self, group: int, feats, y_prev, y_g_anchor):
        """Space-channel: group non-anchors (+ masked same-group anchors)."""
        return self.context.nonanchor_params(group, feats, y_prev, y_g_anchor)

    def z_medians(self):
        return self.factorized.medians()

    def factorized_tables(self, max_symbols: int = 64):
        return self.factorized.cdf_tables(max_symbols)

    def cond_signal(self, y_hat):
        """Decoded ŷ → (concat features, cross-attn tokens) (SURVEY.md C12)."""
        return self.cond_head(y_hat)

    def synthesize(self, y_hat):
        """Deterministic decode ŷ → x̄ (codec.synthesis; unclipped f32)."""
        return self.g_s(y_hat)

    def _with_bar(self, x_t, x_bar):
        """UNet input: [x_t ‖ x̄] when the synthesis path is on.

        x_bar is required iff codec.synthesis — a loud error beats a silent
        channel mismatch inside the patch embed."""
        if self.config.codec.synthesis:
            if x_bar is None:
                raise ValueError("codec.synthesis model: denoise needs x_bar")
            return jnp.concatenate([x_t, x_bar.astype(x_t.dtype)], axis=-1)
        if x_bar is not None:
            raise ValueError("x_bar passed to a model without codec.synthesis")
        return x_t

    def denoise(self, x_t, t, cond_f, cond_t, x_bar=None):
        return self.unet(self._with_bar(x_t, x_bar), t, cond_f, cond_t)

    def denoise_fresh(self, x_t, t, cond_f, cond_t, x_bar=None):
        """Full forward + deep-block cache for cached sampling (C16 ext)."""
        return self.unet(self._with_bar(x_t, x_bar), t, cond_f, cond_t,
                         return_cache=True)

    def denoise_cached(self, x_t, t, cond_f, cond_t, deep_cache, x_bar=None):
        """Shallow-only forward reusing the deep cache (arXiv 2312.03209)."""
        return self.unet(self._with_bar(x_t, x_bar), t, cond_f, cond_t,
                         deep_cache=deep_cache)


def init_model(config: ModelConfig, rng, image_size: int = 64,
               policy: Policy = DEFAULT_POLICY):
    """Initialize the full params tree against a dummy batch."""
    config = config.validated()
    model = CDCModel(config, policy=policy)
    x = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    sched = make_schedule(config.schedule.kind, config.schedule.num_steps)
    tables = {"sqrt_ab": sched.sqrt_alpha_bars,
              "sqrt_1mab": sched.sqrt_one_minus_alpha_bars}
    params = model.init(rng, x, jax.random.key(0), tables)
    return model, params
