import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import norm

from tpucdc.codec import FactorizedPrior, GaussianConditional
from tpucdc.codec.cdf_utils import TOTAL, pmf_to_quantized_cdf
from tpucdc.codec.quantization import additive_noise, ste_round, quantize_dequantize


def test_gaussian_likelihood_matches_scipy():
    gc = GaussianConditional()
    rng = np.random.default_rng(0)
    y = rng.normal(scale=3, size=(2, 4, 4, 8)).astype(np.float32)
    means = rng.normal(size=y.shape).astype(np.float32)
    scales = rng.uniform(0.2, 5.0, size=y.shape).astype(np.float32)
    got = np.asarray(gc.likelihood(jnp.asarray(np.round(y - means) + means),
                                   jnp.asarray(means), jnp.asarray(scales)))
    q = np.round(y - means)
    want = norm.cdf((q + 0.5) / scales) - norm.cdf((q - 0.5) / scales)
    np.testing.assert_allclose(got, np.maximum(want, 1e-9), rtol=1e-4, atol=1e-7)


def test_gaussian_indexes_monotone():
    gc = GaussianConditional()
    scales = jnp.asarray([0.01, 0.11, 0.5, 2.0, 100.0, 1e4])
    idx = np.asarray(gc.build_indexes(scales))
    assert np.all(np.diff(idx) >= 0)
    assert idx[0] == 0 and idx[-1] == len(gc.scale_table) - 1
    # Snapped-up scale covers the true one.
    for s, i in zip(np.asarray(scales), idx):
        assert gc.scale_table[i] >= min(max(s, gc.scale_table[0]),
                                        gc.scale_table[-1]) - 1e-6


def test_gaussian_cdf_tables_consistent_with_pmf():
    gc = GaussianConditional(scale_table=np.array([0.5, 2.0, 8.0]))
    t = gc.cdf_tables()
    assert t["cdfs"].shape[0] == 3
    for r in range(3):
        L = int(t["cdf_lengths"][r])
        row = t["cdfs"][r, :L]
        assert row[0] == 0 and row[-1] == TOTAL
        assert np.all(np.diff(row) >= 1)
        # Symbol 0 (value 0) should be near-most-probable for a centered pmf;
        # the zero-freq repair may steal a few counts from the peak.
        freqs = np.diff(row)[:-1]  # drop escape slot
        center = -int(t["offsets"][r])
        assert freqs[center] >= freqs.max() - 64


def test_pmf_to_quantized_cdf_repairs_zeros():
    pmf = np.array([0.5, 0.0, 0.5, 1e-30])
    cdf = pmf_to_quantized_cdf(pmf, tail_mass=1e-9)
    assert np.all(np.diff(cdf) >= 1)
    assert cdf[-1] == TOTAL


def test_factorized_prior_likelihood_properties():
    fp = FactorizedPrior(channels=4)
    z = jnp.zeros((1, 2, 2, 4))
    params = fp.init(jax.random.key(0), z)
    # Likelihoods are in (0, 1] and the pmf over a wide symbol range sums ~1.
    grid = jnp.arange(-150, 151, dtype=jnp.float32)
    zz = jnp.tile(grid[:, None], (1, 4))[None, :, None, :]   # [1, 301, 1, 4]
    lik = np.asarray(fp.apply(params, zz))
    assert np.all(lik > 0) and np.all(lik <= 1)
    total = lik.sum(axis=1)
    np.testing.assert_allclose(total, 1.0, atol=0.05)


def test_factorized_prior_aux_loss_decreases_quantile_error():
    import optax
    fp = FactorizedPrior(channels=2)
    z = jnp.zeros((1, 1, 1, 2))
    params = fp.init(jax.random.key(0), z)
    loss_fn = lambda p: fp.apply(p, method=FactorizedPrior.aux_loss)
    opt = optax.adam(0.5)
    state = opt.init(params)
    l0 = float(loss_fn(params))
    q0 = np.array(params["params"]["quantiles"])
    for _ in range(200):
        g = jax.grad(loss_fn)(params)
        upd, state = opt.update(g, state)
        params = optax.apply_updates(params, upd)
    assert float(loss_fn(params)) < l0 * 0.6
    # Gradients flow ONLY to the quantiles (density params are stop-gradded
    # in the aux path — they train via the likelihood instead).
    g = jax.grad(loss_fn)(params)
    assert float(jnp.linalg.norm(g["params"]["quantiles"])) > 0
    assert float(jnp.linalg.norm(g["params"]["matrix0"])) == 0.0
    assert not np.allclose(np.array(params["params"]["quantiles"]), q0)


def test_factorized_cdf_tables_shape():
    fp = FactorizedPrior(channels=3)
    params = fp.init(jax.random.key(0), jnp.zeros((1, 1, 1, 3)))
    t = fp.apply(params, method=FactorizedPrior.cdf_tables)
    assert t["cdfs"].shape[0] == 3
    assert len(t["cdf_lengths"]) == 3 and len(t["offsets"]) == 3
    for r in range(3):
        L = int(t["cdf_lengths"][r])
        row = t["cdfs"][r, :L]
        assert row[0] == 0 and row[-1] == TOTAL and np.all(np.diff(row) >= 1)


def test_quantization_proxies():
    x = jnp.asarray([0.2, -1.7, 3.5])
    np.testing.assert_allclose(np.asarray(ste_round(x)), [0.0, -2.0, 4.0])
    # STE passes gradients through.
    g = jax.grad(lambda v: jnp.sum(ste_round(v) * 2))(x)
    np.testing.assert_allclose(np.asarray(g), 2.0)
    noised = additive_noise(x, jax.random.key(0))
    assert np.all(np.abs(np.asarray(noised - x)) <= 0.5)
    means = jnp.asarray([0.4, 0.0, -0.2])
    qd = quantize_dequantize(x, means)
    np.testing.assert_allclose(np.asarray(qd), np.round(
        np.asarray(x) - np.asarray(means)) + np.asarray(means))


def test_codec_transform_shapes():
    from tpucdc.codec import (AnalysisTransform, CodecConfig, HyperAnalysis,
                              HyperSynthesis)
    from tpucdc.runtime import F32_POLICY
    cfg = CodecConfig(hidden_channels=8, latent_channels=12, hyper_channels=6)
    x = jnp.zeros((1, 64, 64, 3))
    ga = AnalysisTransform(cfg, policy=F32_POLICY)
    pa = ga.init(jax.random.key(0), x)
    y = ga.apply(pa, x)
    assert y.shape == (1, 4, 4, 12)
    ha = HyperAnalysis(cfg, policy=F32_POLICY)
    ph = ha.init(jax.random.key(1), y)
    z = ha.apply(ph, y)
    assert z.shape == (1, 1, 1, 6)
    hs = HyperSynthesis(cfg, policy=F32_POLICY)
    ps = hs.init(jax.random.key(2), z)
    means, scales = hs.apply(ps, z)
    assert means.shape == y.shape and scales.shape == y.shape
    assert np.all(np.asarray(scales) >= cfg.scale_min - 1e-6)
