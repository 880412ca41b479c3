"""Deep-block-cached sampling (PAPERS.md arXiv 2312.03209; SURVEY.md C16 ext)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpucdc import presets
from tpucdc.diffusion import UNet, UNetConfig
from tpucdc.model import CDCModel, init_model
from tpucdc.ops import make_schedule
from tpucdc.runtime import F32_POLICY
from tpucdc.sampling import ddim_sample, ddim_sample_blockcached

TINY = UNetConfig(base_channels=16, channel_mult=(1, 2), num_res_blocks=1,
                  attn_levels=(1,), num_heads=2, patch_size=2, groups=8)


def test_cache_self_consistency():
    """Same x with its own fresh cache reproduces the full forward exactly."""
    model = UNet(TINY, policy=F32_POLICY)
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    t = jnp.array([3, 5])
    params = model.init(jax.random.key(1), x, t)
    # Perturb away from the zero-init output head.
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 * jax.random.normal(jax.random.key(2), p.shape,
                                               p.dtype), params)
    full, cache = model.apply(params, x, t, return_cache=True)
    assert cache.shape == TINY.cache_shape(2, 16, 16)
    cached = model.apply(params, x, t, deep_cache=cache)
    np.testing.assert_allclose(np.asarray(cached), np.asarray(full),
                               atol=1e-5)


def test_cached_differs_for_different_x():
    """A stale cache (from another x) changes the output — the deep segment
    really is being skipped, not recomputed."""
    model = UNet(TINY, policy=F32_POLICY)
    x1 = jax.random.normal(jax.random.key(0), (1, 16, 16, 3))
    x2 = jax.random.normal(jax.random.key(9), (1, 16, 16, 3))
    t = jnp.array([3])
    params = model.init(jax.random.key(1), x1, t)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 * jax.random.normal(jax.random.key(2), p.shape,
                                               p.dtype), params)
    _, cache1 = model.apply(params, x1, t, return_cache=True)
    full2 = model.apply(params, x2, t)
    stale = model.apply(params, x2, t, deep_cache=cache1)
    assert not np.allclose(np.asarray(full2), np.asarray(stale), atol=1e-6)


def test_blockcached_sampler_period1_matches_plain():
    model = UNet(TINY, policy=F32_POLICY)
    x = jnp.zeros((1, 16, 16, 3))
    t = jnp.array([0])
    params = model.init(jax.random.key(0), x, t)
    sched = make_schedule("cosine", 64)

    def eps_fn(x_t, tv):
        return model.apply(params, x_t, tv)

    def eps_fresh(x_t, tv):
        return model.apply(params, x_t, tv, return_cache=True)

    def eps_cached(x_t, tv, c):
        return model.apply(params, x_t, tv, deep_cache=c)

    shape = (1, 16, 16, 3)
    plain = ddim_sample(eps_fn, sched, shape, jax.random.key(3), num_steps=6)
    cached = ddim_sample_blockcached(
        eps_fresh, eps_cached, sched, shape, TINY.cache_shape(1, 16, 16),
        jax.random.key(3), num_steps=6, cache_period=1)
    np.testing.assert_allclose(np.asarray(cached), np.asarray(plain),
                               atol=1e-5)


def test_runtime_cached_decode():
    cfg = presets.tiny()
    cfg = dataclasses.replace(
        cfg, sample=dataclasses.replace(cfg.sample, steps=4, cache_period=2))
    model, params = init_model(cfg.model, jax.random.key(0), image_size=64)
    from tpucdc.pipelines.codec_runtime import CodecRuntime
    rt = CodecRuntime(cfg, model, params)
    img = np.random.default_rng(0).integers(0, 255, (64, 64, 3),
                                            dtype=np.uint8)
    out = rt.decompress(rt.compress(img), steps=4)
    assert out.shape == img.shape and out.dtype == np.uint8
