import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpucdc.ops import make_schedule, ddim_subsequence


@pytest.mark.parametrize("kind", ["linear", "cosine"])
@pytest.mark.parametrize("T", [8, 100, 1000])
def test_schedule_invariants(kind, T):
    s = make_schedule(kind, T)
    assert s.num_steps == T
    b = np.asarray(s.betas)
    assert np.all(b > 0) and np.all(b < 1)
    ab = np.asarray(s.alpha_bars)
    assert np.all(np.diff(ab) < 0), "alpha_bar strictly decreasing"
    # Tables are built in f64 and stored f32; recomputing the cumprod from
    # the f32 betas accumulates ~1e-4 relative error at tiny alpha_bars.
    np.testing.assert_allclose(ab, np.cumprod(1 - b), rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(s.alpha_bars_prev)[1:], ab[:-1], rtol=1e-6)
    assert np.asarray(s.alpha_bars_prev)[0] == 1.0
    # Posterior mean coefficients satisfy coef_x0 + coef_xt*sqrt(ab/ab_prev)...
    # check the closed-form identity: coef_x0*sqrt(ab) + coef_xt*... reduces to
    # the DDPM identity coef_x0 + coef_xt * sqrt(alpha) * ... Simplest check:
    # at x0 == xt == x (noiseless fixed point with eps=0 reconstruction),
    # posterior mean = (coef_x0 + coef_xt) * x should be close to x.
    c = np.asarray(s.posterior_mean_coef_x0) + np.asarray(s.posterior_mean_coef_xt)
    assert np.all(c <= 1.0 + 1e-5)


def test_linear_matches_closed_form():
    T = 1000
    s = make_schedule("linear", T, beta_start=1e-4, beta_end=2e-2)
    np.testing.assert_allclose(np.asarray(s.betas)[0], 1e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s.betas)[-1], 2e-2, rtol=1e-5)


def test_q_sample_endpoints():
    s = make_schedule("linear", 1000)
    x0 = jnp.ones((2, 4, 4, 3))
    eps = jax.random.normal(jax.random.key(0), x0.shape)
    # Near t=0, x_t ≈ x0; near t=T-1, x_t ≈ eps-dominated.
    xt0 = s.q_sample(x0, jnp.array([0, 0]), eps)
    np.testing.assert_allclose(np.asarray(xt0), np.asarray(x0), atol=0.05)
    xtT = s.q_sample(x0, jnp.array([999, 999]), eps)
    corr = np.corrcoef(np.asarray(xtT).ravel(), np.asarray(eps).ravel())[0, 1]
    assert corr > 0.95


def test_ddim_subsequence():
    sub = ddim_subsequence(1000, 50)
    assert len(sub) == 50
    assert sub[0] == 999 and sub[-1] == 0
    assert np.all(np.diff(sub) < 0)
    full = ddim_subsequence(100, 100)
    np.testing.assert_array_equal(full, np.arange(99, -1, -1))
