import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpucdc import presets
from tpucdc.model import init_model
from tpucdc.pipelines.train import loss_fn, schedule_tables


@pytest.fixture(scope="module")
def setup():
    cfg = presets.tiny()
    model, params = init_model(cfg.model, jax.random.key(0), image_size=64)
    tables = schedule_tables(cfg)
    batch = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3),
                               minval=-1, maxval=1)
    return model, params, tables, batch


@pytest.mark.parametrize("distortion", ["eps", "x0", "both"])
def test_loss_variants_finite_and_grad(setup, distortion):
    model, params, tables, batch = setup
    loss, metrics = loss_fn(model, params, batch, jax.random.key(2), tables,
                            rd_lambda=8.0, distortion=distortion)
    assert np.isfinite(float(loss))
    for k in ("bpp", "mse_eps", "mse_x0", "aux"):
        assert np.isfinite(float(metrics[k])), k
    g = jax.grad(lambda p: loss_fn(model, p, batch, jax.random.key(2),
                                   tables, 8.0, distortion=distortion)[0]
                 )(params)
    norms = [float(jnp.linalg.norm(x)) for x in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(n) for n in norms)
    assert any(n > 0 for n in norms)


def test_unknown_distortion_raises(setup):
    model, params, tables, batch = setup
    with pytest.raises(ValueError):
        loss_fn(model, params, batch, jax.random.key(0), tables, 1.0,
                distortion="nope")


def test_lpips_training_term(setup):
    """lpips_weight > 0 adds a differentiable perceptual term on x̄."""
    from tpucdc.eval.lpips import PerceptualMetric

    model, params, tables, batch = setup
    pm = PerceptualMetric()
    base, m0 = loss_fn(model, params, batch, jax.random.key(2), tables, 8.0)
    loss, m1 = loss_fn(model, params, batch, jax.random.key(2), tables, 8.0,
                       lpips_weight=0.5, lpips_fn=pm.distance)
    assert "lpips_term" not in m0 and "lpips_term" in m1
    lp = float(m1["lpips_term"])
    assert np.isfinite(lp) and lp >= 0
    np.testing.assert_allclose(float(loss), float(base) + 0.5 * lp, rtol=1e-5)
    g = jax.grad(lambda p: loss_fn(model, p, batch, jax.random.key(2),
                                   tables, 8.0, lpips_weight=0.5,
                                   lpips_fn=pm.distance)[0])(params)
    assert all(np.isfinite(float(jnp.linalg.norm(x)))
               for x in jax.tree_util.tree_leaves(g))
