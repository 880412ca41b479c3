"""Analytic rate estimation (r4): CDCModel.rate_estimate must reproduce the
training forward's eval-mode entropy accounting EXACTLY for every context
kind — it duplicates __call__'s train=False quantization branches by design
(no shared helper: refactoring __call__ would invalidate the persistent TPU
compile cache for in-flight training queues), and this parity test is what
pins the two together."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpucdc import presets
from tpucdc.model import CDCModel, init_model
from tpucdc.ops import make_schedule


def _tables(cfg):
    sched = make_schedule(cfg.model.schedule.kind,
                          cfg.model.schedule.num_steps)
    return {"sqrt_ab": sched.sqrt_alpha_bars,
            "sqrt_1mab": sched.sqrt_one_minus_alpha_bars}


@pytest.mark.parametrize("context", ["hyperprior", "checkerboard",
                                     "channel-ar", "space-channel"])
def test_rate_estimate_matches_eval_forward(context):
    cfg = presets.tiny()
    codec = dataclasses.replace(cfg.model.codec, context=context,
                                context_groups=4)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, codec=codec)).validated()
    model, params = init_model(cfg.model, jax.random.key(0), image_size=64)
    x = jax.random.uniform(jax.random.key(1), (1, 64, 64, 3),
                           minval=-1, maxval=1)
    out = model.apply(params, x, jax.random.key(2), _tables(cfg), False)
    bpp_y, bpp_z = model.apply(params, x, method=CDCModel.rate_estimate)
    np.testing.assert_allclose(float(bpp_y), float(out["bpp_y"]), rtol=1e-5)
    np.testing.assert_allclose(float(bpp_z), float(out["bpp_z"]), rtol=1e-5)


def test_rate_estimate_matches_eval_forward_gained():
    """VR: a traced gain vector must account rate identically to the
    training forward's per-quality gain indexing."""
    cfg = presets.tiny()
    codec = dataclasses.replace(cfg.model.codec, num_qualities=3)
    train = dataclasses.replace(cfg.train, rd_lambdas=(4.0, 16.0, 64.0))
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, codec=codec),
        train=train).validated()
    model, params = init_model(cfg.model, jax.random.key(0), image_size=64)
    c = cfg.model.codec.latent_channels
    gains = np.stack([np.full(c, 0.5), np.full(c, 1.0),
                      np.full(c, 2.0)]).astype(np.float32)
    params["params"]["gains"] = jnp.asarray(gains)
    params["params"]["inv_gains"] = jnp.asarray(1.0 / gains)
    x = jax.random.uniform(jax.random.key(1), (1, 64, 64, 3),
                           minval=-1, maxval=1)
    out = model.apply(params, x, jax.random.key(2), _tables(cfg), False,
                      jnp.array([2]))
    bpp_y, bpp_z = model.apply(params, x, jnp.asarray(gains[2]),
                               method=CDCModel.rate_estimate)
    np.testing.assert_allclose(float(bpp_y), float(out["bpp_y"]), rtol=1e-5)
    np.testing.assert_allclose(float(bpp_z), float(out["bpp_z"]), rtol=1e-5)
