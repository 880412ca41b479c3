"""shard_map batched decode: mesh-size invariance + shape contract
(SURVEY.md C20; BASELINE.json:5 clause 5)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpucdc.ops import make_schedule
from tpucdc.parallel.shard_decode import sharded_sample
from tpucdc.runtime import make_mesh


def _toy_model_apply(params, y_shard, x_t, t):
    # Cheap conditional "denoiser": eps depends on x and the conditioning
    # mean so different y give different reconstructions.
    cond = jnp.mean(y_shard, axis=(1, 2, 3), keepdims=True)
    return x_t * 0.9 + cond


def test_sharded_sample_mesh_size_invariant():
    sched = make_schedule("cosine", 64)
    y = jax.random.normal(jax.random.key(0), (8, 4, 4, 6))
    rngs = jax.random.split(jax.random.key(1), 8)

    out1 = sharded_sample(_toy_model_apply, {}, sched, make_mesh(n_data=1),
                          y, rngs, (16, 16), num_steps=4)
    out8 = sharded_sample(_toy_model_apply, {}, sched, make_mesh(n_data=8),
                          y, rngs, (16, 16), num_steps=4)
    assert out1.shape == (8, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out8),
                               atol=1e-5)


def test_sharded_sample_rejects_ragged_batch():
    import pytest
    sched = make_schedule("cosine", 8)
    mesh = make_mesh(n_data=8)
    y = jnp.zeros((6, 2, 2, 3))
    rngs = jax.random.split(jax.random.key(0), 6)
    with pytest.raises(ValueError):
        sharded_sample(_toy_model_apply, {}, sched, mesh, y, rngs, (8, 8))


def test_sharded_sample_real_model_pixel_identity():
    """VERDICT r1 item 5: the REAL CDCModel (tiny preset) must decode
    pixel-identically on a 1-device and an 8-device mesh, including η>0
    (per-image key chains, sampling/ddim._rng_streams)."""
    from tpucdc import presets
    from tpucdc.model import CDCModel, init_model

    cfg = presets.tiny()
    model, params = init_model(cfg.model, jax.random.key(0), image_size=64)
    sched = make_schedule(cfg.model.schedule.kind,
                          cfg.model.schedule.num_steps)
    c = cfg.model.codec.latent_channels
    y = jax.random.normal(jax.random.key(3), (8, 4, 4, c))
    rngs = jax.random.split(jax.random.key(4), 8)

    def model_apply(p, y_shard, x_t, t, x_bar=None):
        cond_f, cond_t = model.apply(p, y_shard,
                                     method=CDCModel.cond_signal)
        return model.apply(p, x_t, t, cond_f, cond_t, x_bar,
                           method=CDCModel.denoise)

    x_ref_fn = (lambda p, y_shard: model.apply(
        p, y_shard, method=CDCModel.synthesize))
    # (eta, t_start): η>0 full-chain (r1 weak-item-4 key plumbing) and
    # truncated-refinement (x_ref init noise) — each is 2 compiles (1- and
    # 8-device meshes); the η=0 full chain is the same program as η>0 with
    # σ=0 tables, so it adds no coverage worth 2 more compiles.
    for eta, t_start in ((0.5, None), (0.0, 63)):
        kw = (dict(x_ref_fn=x_ref_fn, t_start=t_start)
              if t_start is not None else dict(x_ref_fn=x_ref_fn))
        out1 = np.asarray(sharded_sample(
            model_apply, params, sched, make_mesh(n_data=1), y, rngs,
            (64, 64), num_steps=3, eta=eta, **kw))
        out8 = np.asarray(sharded_sample(
            model_apply, params, sched, make_mesh(n_data=8), y, rngs,
            (64, 64), num_steps=3, eta=eta, **kw))
        assert out1.shape == (8, 64, 64, 3)
        np.testing.assert_array_equal(out1, out8)


def test_sharded_mean_decode_steps0():
    """num_steps=0 (r3, ADVICE r2): the sharded path returns the x_ref
    (synthesis) reconstruction per shard without touching the sampler, and
    matches across mesh sizes."""
    sched = make_schedule("cosine", 64)
    y = jax.random.normal(jax.random.key(0), (8, 4, 4, 6))
    rngs = jax.random.split(jax.random.key(1), 8)

    def x_ref_fn(params, y_shard):
        cond = jnp.mean(y_shard, axis=(1, 2, 3), keepdims=True)
        return jnp.broadcast_to(cond, (y_shard.shape[0], 16, 16, 3))

    out1 = sharded_sample(_toy_model_apply, {}, sched, make_mesh(n_data=1),
                          y, rngs, (16, 16), num_steps=0, x_ref_fn=x_ref_fn)
    out8 = sharded_sample(_toy_model_apply, {}, sched, make_mesh(n_data=8),
                          y, rngs, (16, 16), num_steps=0, x_ref_fn=x_ref_fn)
    assert out1.shape == (8, 16, 16, 3)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out8), atol=1e-6)
    # expected: per-image mean of y broadcast
    exp = np.broadcast_to(
        np.mean(np.asarray(y), axis=(1, 2, 3), keepdims=True), (8, 16, 16, 3))
    np.testing.assert_allclose(np.asarray(out1), exp, atol=1e-5)


def test_sharded_mean_decode_requires_x_ref():
    import pytest
    sched = make_schedule("cosine", 8)
    y = jnp.zeros((8, 2, 2, 3))
    rngs = jax.random.split(jax.random.key(0), 8)
    with pytest.raises(ValueError, match="mean decode"):
        sharded_sample(_toy_model_apply, {}, sched, make_mesh(n_data=1),
                       y, rngs, (8, 8), num_steps=0)
