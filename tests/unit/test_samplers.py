import jax
import jax.numpy as jnp
import numpy as np

from tpucdc.ops import make_schedule
from tpucdc.sampling import ddim_sample, ddpm_sample, make_cfg_eps_fn


def _oracle_eps_fn(schedule, x_target):
    """Exact eps for a deterministic data distribution (delta at x_target):
    x_t = sqrt(ab)*x0 + sqrt(1-ab)*eps  =>  eps = (x_t - sqrt(ab)*x0)/sqrt(1-ab).
    """
    def eps_fn(x_t, t):
        a = schedule.sqrt_alpha_bars[t].reshape(-1, 1, 1, 1)
        b = schedule.sqrt_one_minus_alpha_bars[t].reshape(-1, 1, 1, 1)
        return (x_t - a * x_target) / b
    return eps_fn


def test_ddim_recovers_target_with_oracle():
    s = make_schedule("cosine", 1000)
    target = jnp.full((2, 8, 8, 3), 0.5)
    eps_fn = _oracle_eps_fn(s, target)
    for steps in (5, 50):
        x0 = ddim_sample(eps_fn, s, target.shape, jax.random.key(0),
                         num_steps=steps, eta=0.0)
        np.testing.assert_allclose(np.asarray(x0), 0.5, atol=1e-3)


def test_ddim_eta0_deterministic_given_init():
    s = make_schedule("linear", 100)
    eps_fn = _oracle_eps_fn(s, jnp.zeros((1, 4, 4, 3)))
    x_init = jax.random.normal(jax.random.key(7), (1, 4, 4, 3))
    a = ddim_sample(eps_fn, s, x_init.shape, jax.random.key(0), 10,
                    eta=0.0, x_init=x_init)
    b = ddim_sample(eps_fn, s, x_init.shape, jax.random.key(99), 10,
                    eta=0.0, x_init=x_init)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ddpm_converges_with_oracle():
    s = make_schedule("cosine", 200)
    target = jnp.full((1, 4, 4, 3), -0.25)
    x0 = ddpm_sample(_oracle_eps_fn(s, target), s, target.shape,
                     jax.random.key(1))
    np.testing.assert_allclose(np.asarray(x0), -0.25, atol=0.05)


def test_ddim_jits_and_scans():
    s = make_schedule("cosine", 100)
    eps_fn = _oracle_eps_fn(s, jnp.zeros((1, 4, 4, 3)))
    f = jax.jit(lambda rng: ddim_sample(eps_fn, s, (1, 4, 4, 3), rng, 10))
    out = f(jax.random.key(0))
    assert out.shape == (1, 4, 4, 3)
    assert out.dtype == jnp.float32


def test_cfg_blending():
    cond = lambda x, t: jnp.ones_like(x)
    uncond = lambda x, t: jnp.zeros_like(x)
    f = make_cfg_eps_fn(cond, uncond, guidance_scale=2.0)
    x = jnp.zeros((2, 4, 4, 3))
    t = jnp.zeros((2,), jnp.int32)
    # eps_u + 2*(eps_c - eps_u) = 0 + 2*1 = 2
    np.testing.assert_allclose(np.asarray(f(x, t)), 2.0)
    # scale 1 short-circuits to cond
    assert make_cfg_eps_fn(cond, uncond, 1.0) is cond
