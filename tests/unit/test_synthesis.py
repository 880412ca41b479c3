"""Deterministic synthesis transform g_s + truncated refinement decode
(round 2: codec.synthesis, SampleConfig.truncate_frac).

The synthesis path gives the codec a classical mean-scale-hyperprior decode
x̄ = g_s(ŷ) that (a) floors PSNR without the diffusion sampler, (b) enters
the UNet as an input concat, and (c) seeds the truncated chain
q_sample(x̄, t_start) so decode spans [0, t_start] ≪ [0, T-1].
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpucdc import presets
from tpucdc.codec import CodecConfig, SynthesisTransform
from tpucdc.model import CDCModel, init_model
from tpucdc.ops import make_schedule
from tpucdc.ops.schedules import ddim_subsequence
from tpucdc.pipelines import train as train_lib
from tpucdc.sampling import ddim_sample


def test_synthesis_transform_upsamples_16x():
    cfg = CodecConfig(hidden_channels=8, latent_channels=16, hyper_channels=8,
                      synthesis=True)
    gs = SynthesisTransform(cfg)
    y = jnp.zeros((2, 4, 6, cfg.latent_channels))
    params = gs.init(jax.random.key(0), y)
    x_bar = gs.apply(params, y)
    assert x_bar.shape == (2, 64, 96, 3)
    assert x_bar.dtype == jnp.float32


def test_ddim_subsequence_t_max():
    ts = ddim_subsequence(1000, 10, t_max=250)
    assert ts[0] == 250 and ts[-1] == 0
    assert np.all(np.diff(ts) < 0) and ts.max() <= 250
    with pytest.raises(ValueError):
        ddim_subsequence(1000, 10, t_max=1000)
    with pytest.raises(ValueError):
        ddim_subsequence(1000, 300, t_max=200)   # more steps than range


def _oracle_eps_fn(schedule, x_target):
    def eps_fn(x_t, t):
        a = schedule.sqrt_alpha_bars[t].reshape(-1, 1, 1, 1)
        b = schedule.sqrt_one_minus_alpha_bars[t].reshape(-1, 1, 1, 1)
        return (x_t - a * x_target) / b
    return eps_fn


def test_truncated_ddim_refines_reference():
    """With the oracle ε, the truncated chain started from a noisy x_ref must
    land on the target — and a SHORT truncated chain must beat the same
    number of full-chain steps started from pure noise."""
    s = make_schedule("cosine", 1000)
    target = jnp.full((1, 8, 8, 3), 0.5)
    eps_fn = _oracle_eps_fn(s, target)
    x0 = ddim_sample(eps_fn, s, target.shape, jax.random.key(0),
                     num_steps=5, t_start=200, x_ref=target)
    np.testing.assert_allclose(np.asarray(x0), 0.5, atol=1e-3)


def test_truncated_ddim_rejects_double_init():
    s = make_schedule("cosine", 100)
    x = jnp.zeros((1, 4, 4, 3))
    with pytest.raises(ValueError):
        ddim_sample(_oracle_eps_fn(s, x), s, x.shape, jax.random.key(0),
                    num_steps=3, x_init=x, x_ref=x)


def test_denoise_requires_x_bar_iff_synthesis():
    cfg = presets.tiny()
    assert cfg.model.codec.synthesis
    model, params = init_model(cfg.model, jax.random.key(0), image_size=64)
    x_t = jnp.zeros((1, 64, 64, 3))
    t = jnp.zeros((1,), jnp.int32)
    y = jnp.zeros((1, 4, 4, cfg.model.codec.latent_channels))
    cond_f, cond_t = model.apply(params, y, method=CDCModel.cond_signal)
    with pytest.raises(ValueError, match="needs x_bar"):
        model.apply(params, x_t, t, cond_f, cond_t, method=CDCModel.denoise)
    x_bar = model.apply(params, y, method=CDCModel.synthesize)
    assert x_bar.shape == (1, 64, 64, 3)
    eps = model.apply(params, x_t, t, cond_f, cond_t, x_bar,
                      method=CDCModel.denoise)
    assert eps.shape == (1, 64, 64, 3)


def test_loss_includes_synthesis_distortion():
    cfg = presets.tiny()
    model, params = init_model(cfg.model, jax.random.key(0), image_size=64)
    tables = train_lib.schedule_tables(cfg)
    batch = np.random.default_rng(0).normal(
        scale=0.5, size=(2, 64, 64, 3)).astype(np.float32)
    loss, metrics = train_lib.loss_fn(model, params, batch,
                                      jax.random.key(1), tables, 8.0)
    assert "mse_gs" in metrics and float(metrics["mse_gs"]) >= 0.0
    assert np.isfinite(float(loss))


def test_mean_decode_roundtrip(tmp_path):
    """decompress(steps=0) returns the clipped synthesis reconstruction —
    fast deterministic decode with no sampler in the loop."""
    from tpucdc.pipelines.codec_runtime import CodecRuntime

    cfg = presets.tiny()
    model, params = init_model(cfg.model, jax.random.key(0), image_size=64)
    rt = CodecRuntime(cfg, model, params)
    img = np.random.default_rng(1).integers(
        0, 256, (64, 64, 3)).astype(np.uint8)
    blob = rt.compress(img)
    out = rt.decompress(blob, steps=0)
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8
    # identical on repeat (no sampler randomness)
    np.testing.assert_array_equal(out, rt.decompress(blob, steps=0))


def test_truncated_decode_runs_and_differs_from_mean():
    from tpucdc.pipelines.codec_runtime import CodecRuntime

    cfg = presets.tiny()
    cfg = dataclasses.replace(cfg, sample=dataclasses.replace(
        cfg.sample, truncate_frac=0.25))
    model, params = init_model(cfg.model, jax.random.key(0), image_size=64)
    rt = CodecRuntime(cfg, model, params)
    img = np.random.default_rng(2).integers(
        0, 256, (64, 64, 3)).astype(np.uint8)
    blob = rt.compress(img)
    out = rt.decompress(blob, steps=4)
    mean = rt.decompress(blob, steps=0)
    assert out.shape == mean.shape
    assert not np.array_equal(out, mean)


def test_x0_prediction_sampler_recovers_target():
    """x0-mode DDIM: with a perfect x0-net the chain lands exactly on the
    target; with a net that always returns x̄, the refined output IS x̄ (the
    identity-safety property motivating model.prediction='x0')."""
    s = make_schedule("cosine", 1000)
    target = jnp.full((1, 8, 8, 3), 0.25)
    x0_fn = lambda x_t, t: jnp.broadcast_to(target, x_t.shape)
    for steps, t_start in ((5, None), (4, 300)):
        out = ddim_sample(x0_fn, s, target.shape, jax.random.key(0),
                          num_steps=steps, t_start=t_start,
                          x_ref=target if t_start else None,
                          prediction="x0")
        np.testing.assert_allclose(np.asarray(out), 0.25, atol=1e-5)


def test_x0_prediction_model_forward_and_decode():
    cfg = presets.tiny()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, prediction="x0"))
    model, params = init_model(cfg.model, jax.random.key(0), image_size=64)
    tables = train_lib.schedule_tables(cfg)
    batch = np.random.default_rng(3).normal(
        scale=0.5, size=(2, 64, 64, 3)).astype(np.float32)
    loss, metrics = train_lib.loss_fn(model, params, batch,
                                      jax.random.key(1), tables, 8.0,
                                      distortion="x0")
    assert np.isfinite(float(loss))
    # decode path end-to-end
    from tpucdc.pipelines.codec_runtime import CodecRuntime
    rt = CodecRuntime(cfg, model, params)
    img = np.random.default_rng(4).integers(
        0, 256, (64, 64, 3)).astype(np.uint8)
    out = rt.decompress(rt.compress(img), steps=4)
    assert out.shape == (64, 64, 3)


def test_unknown_prediction_mode_rejected():
    cfg = presets.tiny()
    with pytest.raises(ValueError, match="prediction"):
        dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, prediction="vv")).validated()
