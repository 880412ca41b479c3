"""Entropy models: FactorizedPrior and GaussianConditional (SURVEY.md C10).

Both provide (a) a differentiable per-element likelihood for the train-time
rate term (bpp = −log₂ likelihood, BASELINE.json:9) and (b) quantized integer
CDF tables + per-element row indexes for the host C++ rANS coder
(BASELINE.json:5 clause 4). The table spec lives in cdf_utils.py and must
stay in lockstep with tpucdc/entropy/cpp/rans.cc (SURVEY.md §7 hard-part 4).

FactorizedPrior is the learned fully-factorized density over the hyper-latent
z: each channel's CDF is a small monotone MLP (softplus-positive matrices,
tanh gating), the standard "entropy bottleneck" construction from the
hyperprior literature. GaussianConditional models y | ẑ as N(μ, σ²) with σ
snapped to a log-spaced scale table for coding.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpucdc.codec.cdf_utils import pack_cdf_rows, pmf_to_quantized_cdf

_LIKELIHOOD_FLOOR = 1e-9


def _std_normal_cdf(x):
    return 0.5 * jax.lax.erfc(-x * (2 ** -0.5))


def bits(likelihood: jnp.ndarray) -> jnp.ndarray:
    """Total bits implied by per-element likelihoods."""
    return jnp.sum(-jnp.log2(jnp.maximum(likelihood, _LIKELIHOOD_FLOOR)))


class FactorizedPrior(nn.Module):
    """Learned factorized prior over the hyper-latent z's channels.

    The channel CDF c(x) = sigmoid(f_K(...f_1(x))) with
    f_k(x) = g_k(softplus(H_k) x + b_k), g_k(x) = x + tanh(a_k)⊙tanh(x);
    the likelihood of an integer-quantized value is c(x+½) − c(x−½).
    """
    channels: int
    filters: tuple[int, ...] = (3, 3, 3)
    init_scale: float = 10.0
    tail_mass: float = 1e-9

    def setup(self):
        dims = (1,) + self.filters + (1,)
        k = len(dims) - 1
        scale = self.init_scale ** (1.0 / k)
        mats, biases, factors = [], [], []
        for i in range(k):
            init_m = float(np.log(np.expm1(1.0 / scale / dims[i + 1])))
            mats.append(self.param(
                f"matrix{i}", nn.initializers.constant(init_m),
                (self.channels, dims[i + 1], dims[i]), jnp.float32))
            biases.append(self.param(
                f"bias{i}",
                lambda key, shape, dtype: jax.random.uniform(
                    key, shape, dtype, -0.5, 0.5),
                (self.channels, dims[i + 1], 1), jnp.float32))
            if i < k - 1:
                factors.append(self.param(
                    f"factor{i}", nn.initializers.zeros,
                    (self.channels, dims[i + 1], 1), jnp.float32))
        self._matrices, self._biases, self._factors = mats, biases, factors
        # Non-trained quantile targets (median and the two tail points),
        # optimized only by aux_loss: [C, 1, 3].
        self.quantiles = self.param(
            "quantiles",
            lambda key, shape, dtype: jnp.tile(
                jnp.array([[-self.init_scale, 0.0, self.init_scale]], dtype),
                (self.channels, 1, 1)),
            (self.channels, 1, 3), jnp.float32)

    def _logits_cdf(self, x, sg_density: bool = False):
        """x: [C, 1, N] → logits of the channel CDF, same shape.

        sg_density stops gradients through the density parameters so the aux
        loss trains ONLY the quantiles (the density trains via likelihood).
        """
        sg = jax.lax.stop_gradient if sg_density else (lambda v: v)
        h = x
        for i, m in enumerate(self._matrices):
            h = jnp.einsum("cij,cjn->cin", jax.nn.softplus(sg(m)), h,
                           preferred_element_type=jnp.float32) + sg(self._biases[i])
            if i < len(self._factors):
                h = h + jnp.tanh(sg(self._factors[i])) * jnp.tanh(h)
        return h

    def medians(self):
        return jax.lax.stop_gradient(self.quantiles[:, 0, 1])

    def __call__(self, z_tilde: jnp.ndarray) -> jnp.ndarray:
        """Per-element likelihood of the (noisy or rounded) z. z: [..., C]."""
        c = z_tilde.shape[-1]
        perm = jnp.moveaxis(z_tilde.astype(jnp.float32), -1, 0)   # [C, ...]
        flat = perm.reshape(c, 1, -1)
        lower = self._logits_cdf(flat - 0.5)
        upper = self._logits_cdf(flat + 0.5)
        # Numerically stable difference of sigmoids.
        sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
        lik = jnp.abs(jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower))
        lik = jnp.moveaxis(lik.reshape(perm.shape), 0, -1)        # [..., C]
        return jnp.maximum(lik, _LIKELIHOOD_FLOOR)

    def aux_loss(self) -> jnp.ndarray:
        """Drives quantiles to the (tail, median, 1−tail) CDF points."""
        logits = self._logits_cdf(self.quantiles, sg_density=True)  # [C, 1, 3]
        t = float(np.log(2.0 / self.tail_mass - 1.0))
        target = jnp.array([-t, 0.0, t], jnp.float32)
        return jnp.sum(jnp.abs(logits - target))

    # ---- coding-side table export (host, once per model load) ----

    def cdf_tables(self, max_symbols: int = 64):
        """Quantized CDF rows per channel for the rANS coder.

        Returns dict(cdfs [C, L], cdf_lengths [C], offsets [C]); symbols are
        round(z − median) − offset. Out-of-range → the per-row escape slot.
        """
        medians = np.asarray(self.medians())               # [C]
        q = np.asarray(self.quantiles)[:, 0, :]            # [C, 3]
        minima = np.maximum(
            np.ceil(medians - q[:, 0]).astype(np.int64), 1)
        maxima = np.maximum(
            np.ceil(q[:, 2] - medians).astype(np.int64), 1)
        minima = np.minimum(minima, max_symbols)
        maxima = np.minimum(maxima, max_symbols)

        rows, offsets = [], []
        for ch in range(self.channels):
            lo, hi = -int(minima[ch]), int(maxima[ch])
            grid = medians[ch] + np.arange(lo, hi + 1, dtype=np.float64)
            flat = jnp.asarray(grid, jnp.float32)[None, None, :]
            ch_logits = lambda x: self._logits_cdf_single(ch, x)
            upper = np.asarray(jax.nn.sigmoid(ch_logits(flat + 0.5)))[0, 0]
            lower = np.asarray(jax.nn.sigmoid(ch_logits(flat - 0.5)))[0, 0]
            pmf = np.maximum(upper - lower, 0.0)
            rows.append(pmf_to_quantized_cdf(pmf, self.tail_mass))
            offsets.append(lo)
        cdfs, lengths = pack_cdf_rows(rows)
        return {"cdfs": cdfs, "cdf_lengths": lengths,
                "offsets": np.asarray(offsets, np.int32)}

    def _logits_cdf_single(self, ch: int, x):
        h = x
        for i, m in enumerate(self._matrices):
            h = jnp.einsum("ij,jn->in", jax.nn.softplus(m[ch]), h[0],
                           preferred_element_type=jnp.float32)[None] \
                + self._biases[i][ch][None]
            if i < len(self._factors):
                h = h + jnp.tanh(self._factors[i][ch][None]) * jnp.tanh(h)
        return h


def default_scale_table(scale_min: float = 0.11, scale_max: float = 256.0,
                        levels: int = 64) -> np.ndarray:
    return np.exp(np.linspace(np.log(scale_min), np.log(scale_max), levels))


@dataclasses.dataclass
class GaussianConditional:
    """N(μ, σ²) conditional entropy model over y (stateless — no params).

    Training: differentiable likelihood at the predicted (μ, σ).
    Coding: σ snapped UP to the nearest scale-table entry; one CDF row per
    table scale, shared across images (tables built once at load).
    """
    scale_table: np.ndarray = dataclasses.field(
        default_factory=default_scale_table)
    tail_mass: float = 1e-9

    def likelihood(self, y_tilde, means, scales):
        v = jnp.abs(y_tilde.astype(jnp.float32) - means)
        s = jnp.maximum(scales, float(self.scale_table[0]))
        upper = _std_normal_cdf((0.5 - v) / s)
        lower = _std_normal_cdf((-0.5 - v) / s)
        return jnp.maximum(upper - lower, _LIKELIHOOD_FLOOR)

    def build_indexes(self, scales) -> jnp.ndarray:
        """Row index per element: smallest table scale ≥ σ (clamped)."""
        table = jnp.asarray(self.scale_table, jnp.float32)
        s = jnp.clip(scales, float(self.scale_table[0]),
                     float(self.scale_table[-1]))
        # searchsorted(left): first idx with table[idx] >= s.
        return jnp.searchsorted(table, s, side="left").astype(jnp.int32)

    def cdf_tables(self):
        """One quantized CDF row per table scale, symbols centered at 0."""
        from scipy.stats import norm
        rows, offsets = [], []
        tail_q = float(norm.ppf(1.0 - self.tail_mass / 2.0))
        for s in self.scale_table:
            half = max(int(np.ceil(s * tail_q)), 1)
            grid = np.arange(-half, half + 1, dtype=np.float64)
            pmf = (norm.cdf((grid + 0.5) / s) - norm.cdf((grid - 0.5) / s))
            rows.append(pmf_to_quantized_cdf(pmf, self.tail_mass))
            offsets.append(-half)
        cdfs, lengths = pack_cdf_rows(rows)
        return {"cdfs": cdfs, "cdf_lengths": lengths,
                "offsets": np.asarray(offsets, np.int32)}
