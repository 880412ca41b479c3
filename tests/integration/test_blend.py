"""Distortion–perception blend dial (SampleConfig.blend_gamma, r4).

The served output is x̂ = x̄ + γ·(x_refined − x̄), computed INSIDE the
single-dispatch decode program (γ is a traced input — VERDICT r3 item 1b).
These tests pin the dial's algebra: γ=0 reproduces the mean decode, γ=1 the
pure refined sample, and intermediate γ interpolates pixelwise."""

import dataclasses

import jax
import numpy as np
import pytest

from tpucdc import presets
from tpucdc.model import init_model
from tpucdc.pipelines.codec_runtime import CodecRuntime


@pytest.fixture(scope="module")
def runtime():
    cfg = presets.tiny()   # tiny has codec.synthesis=True → x̄ in-program
    cfg = dataclasses.replace(
        cfg, sample=dataclasses.replace(cfg.sample, steps=4))
    model, params = init_model(cfg.model, jax.random.key(0), image_size=64)
    return CodecRuntime(cfg, model, params)


def _img(seed=0, h=64, w=64):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, size=(h // 8, w // 8, 3), dtype=np.uint8)
    return np.repeat(np.repeat(base, 8, 0), 8, 1)


def test_gamma_zero_is_the_mean_decode(runtime):
    """γ=0 through the refiner program == the dedicated mean decode
    (steps=0) — same x̄ math, so at most uint8 rounding apart."""
    blob = runtime.compress(_img(1))
    mean = runtime.decompress(blob, steps=0)
    blended = runtime.decompress(blob, steps=2, gamma=0.0)
    diff = np.abs(mean.astype(np.int32) - blended.astype(np.int32))
    assert diff.max() <= 1, f"max uint8 delta {diff.max()}"


def test_gamma_interpolates(runtime):
    """x̂(γ=0.5) is the pixelwise midpoint of x̂(0) and x̂(1) (same rng ⇒
    same refined sample), up to uint8 rounding of the three outputs."""
    blob = runtime.compress(_img(2))
    rng = jax.random.key(7)
    lo = runtime.decompress(blob, rng=rng, steps=2, gamma=0.0).astype(np.float64)
    hi = runtime.decompress(blob, rng=rng, steps=2, gamma=1.0).astype(np.float64)
    mid = runtime.decompress(blob, rng=rng, steps=2, gamma=0.5).astype(np.float64)
    assert np.abs(mid - (lo + hi) / 2).max() <= 1.5


def test_gamma_default_comes_from_config(runtime):
    """decompress() with no gamma uses SampleConfig.blend_gamma."""
    blob = runtime.compress(_img(3))
    rng = jax.random.key(3)
    explicit = runtime.decompress(blob, rng=rng, steps=2, gamma=0.25)
    cfg = dataclasses.replace(
        runtime.config, sample=dataclasses.replace(
            runtime.config.sample, blend_gamma=0.25))
    rt2 = CodecRuntime(cfg, runtime.model, runtime.params)
    via_config = rt2.decompress(blob, rng=rng, steps=2)
    np.testing.assert_array_equal(explicit, via_config)


def test_sharded_blend_gamma_zero_is_mean(runtime):
    """shard_decode path: blend_gamma=0 over the data mesh == the sharded
    mean decode (num_steps=0), per pixel."""
    from tpucdc.model import CDCModel
    from tpucdc.ops import make_schedule
    from tpucdc.parallel.shard_decode import sharded_sample
    from tpucdc.runtime import make_mesh

    mesh = make_mesh()
    n = mesh.devices.size
    cfg = runtime.config
    model, params = runtime.model, runtime.params
    c = cfg.model.codec.latent_channels
    y = jax.random.normal(jax.random.key(11), (n, 4, 4, c))
    rngs = jax.random.split(jax.random.key(12), n)

    def model_apply(p, y_shard, x_t, t, x_bar=None):
        cond_f, cond_t = model.apply(p, y_shard,
                                     method=CDCModel.cond_signal)
        return model.apply(p, x_t, t, cond_f, cond_t, x_bar,
                           method=CDCModel.denoise)

    x_ref_fn = (lambda p, y_shard: model.apply(
        p, y_shard, method=CDCModel.synthesize))

    schedule = make_schedule(cfg.model.schedule.kind,
                             cfg.model.schedule.num_steps)
    kw = dict(x_ref_fn=x_ref_fn, prediction=cfg.model.prediction)
    mean = np.asarray(sharded_sample(
        model_apply, params, schedule, mesh, y, rngs, (64, 64),
        num_steps=0, **kw))
    blended = np.asarray(sharded_sample(
        model_apply, params, schedule, mesh, y, rngs, (64, 64),
        num_steps=2, blend_gamma=0.0, **kw))
    np.testing.assert_allclose(blended, mean, atol=1e-5)


def test_optimize_gamma_writes_header_and_decode_honors_it(runtime):
    """compress(optimize_gamma=...) stores the per-image PSNR-argmax γ in
    the v3 header; a plain decompress() then serves that γ (header beats
    the config default)."""
    from tpucdc.entropy import read_bitstream

    img = _img(5)
    blob = runtime.compress(img, optimize_gamma=(0.0, 0.5, 1.0))
    g = read_bitstream(blob)[0].gamma_or_none
    assert g in (0.0, 0.5, 1.0)

    # The stored γ is the PSNR argmax over the candidates (same fixed rng
    # the encoder search used).
    def mse(gamma):
        rec = runtime.decompress(blob, rng=jax.random.key(0), gamma=gamma)
        return float(np.mean((rec.astype(np.float64) - img) ** 2))
    assert mse(g) == min(mse(c) for c in (0.0, 0.5, 1.0))

    # Plain decode == explicit decode at the header γ (config default is
    # 1.0, so this only passes if the header value actually wins).
    np.testing.assert_array_equal(
        runtime.decompress(blob, rng=jax.random.key(0)),
        runtime.decompress(blob, rng=jax.random.key(0), gamma=g))


def test_optimize_gamma_never_loses_to_mean(runtime):
    """γ=0 (the mean decode) is always in the search grid, so the picked
    reconstruction's MSE is ≤ the mean decode's."""
    img = _img(6)
    blob = runtime.compress(img, optimize_gamma=True)
    rec = runtime.decompress(blob, rng=jax.random.key(0))
    mean = runtime.decompress(blob, rng=jax.random.key(0), gamma=0.0)
    assert (np.mean((rec.astype(np.float64) - img) ** 2)
            <= np.mean((mean.astype(np.float64) - img) ** 2) + 1e-9)


def test_optimize_gamma_requires_synthesis(runtime):
    """Without codec.synthesis there is no x̄ to anchor the blend."""
    import pytest
    from tpucdc.model import init_model

    cfg = presets.tiny()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, codec=dataclasses.replace(cfg.model.codec,
                                                 synthesis=False)))
    model, params = init_model(cfg.model, jax.random.key(0), image_size=64)
    rt = CodecRuntime(cfg, model, params)
    with pytest.raises(ValueError, match="synthesis"):
        rt.compress(_img(7), optimize_gamma=True)
