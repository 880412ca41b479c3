import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpucdc.diffusion import UNet, UNetConfig, ConditioningHead
from tpucdc.diffusion.conditioning import ConditioningConfig
from tpucdc.runtime import F32_POLICY

TINY = UNetConfig(base_channels=16, channel_mult=(1, 2), num_res_blocks=1,
                  attn_levels=(1,), num_heads=2, patch_size=2, groups=8)


def test_unet_unconditional_shapes():
    model = UNet(TINY, policy=F32_POLICY)
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.array([3, 7])
    params = model.init(jax.random.key(0), x, t)
    out = model.apply(params, x, t)
    assert out.shape == x.shape
    assert out.dtype == jnp.float32


def test_unet_zero_init_output_head():
    # conv_out is zero-init: untrained eps-prediction starts at 0 (stable).
    model = UNet(TINY, policy=F32_POLICY)
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 3))
    t = jnp.array([5])
    params = model.init(jax.random.key(0), x, t)
    np.testing.assert_allclose(np.asarray(model.apply(params, x, t)), 0.0)


def test_unet_conditional_concat_and_cross_attn():
    cfg = UNetConfig(base_channels=16, channel_mult=(1, 2), num_res_blocks=1,
                     attn_levels=(1,), num_heads=2, patch_size=2, groups=8,
                     cond_channels=8, cond_token_dim=32)
    model = UNet(cfg, policy=F32_POLICY)
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.array([0, 1])
    cf = jnp.zeros((2, 16, 16, 8))
    ct = jnp.zeros((2, 4, 32))
    params = model.init(jax.random.key(0), x, t, cf, ct)
    out = model.apply(params, x, t, cf, ct)
    assert out.shape == x.shape

    # Conditioning actually reaches the output (after perturbing params away
    # from the zero-init head).
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 * jax.random.normal(jax.random.key(2), p.shape, p.dtype),
        params)
    cf2 = jnp.ones_like(cf)
    o1 = model.apply(params, x, t, cf, ct)
    o2 = model.apply(params, x, t, cf2, ct)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_unet_rejects_mismatched_conditioning():
    model = UNet(TINY, policy=F32_POLICY)
    x = jnp.zeros((1, 16, 16, 3))
    with pytest.raises(ValueError):
        model.init(jax.random.key(0), x, jnp.array([0]),
                   jnp.zeros((1, 16, 16, 4)))


def test_conditioning_head_shapes():
    cfg = ConditioningConfig(latent_factor=4, feature_channels=8,
                             token_dim=16, hidden_channels=16)
    head = ConditioningHead(cfg, policy=F32_POLICY)
    y = jnp.zeros((2, 4, 4, 12))
    params = head.init(jax.random.key(0), y)
    feats, tokens = head.apply(params, y)
    assert feats.shape == (2, 16, 16, 8)
    assert tokens.shape == (2, 16, 16)


def test_conditioning_upsample_kinds_same_shapes():
    """repeat vs shuffle upsampling stages emit identical shapes (the
    shuffle path trades the HBM repeat traffic for a 4*ch low-res conv)."""
    import jax
    import jax.numpy as jnp
    from tpucdc.diffusion.conditioning import (ConditioningConfig,
                                               ConditioningHead)

    y = jnp.ones((2, 4, 6, 32))
    outs = {}
    for kind in ("repeat", "shuffle"):
        cfg = ConditioningConfig(latent_factor=16, feature_channels=8,
                                 token_dim=16, hidden_channels=16,
                                 output_stride=4, upsample=kind)
        head = ConditioningHead(cfg)
        params = head.init(jax.random.key(0), y)
        outs[kind] = head.apply(params, y)
    for kind, (f, t) in outs.items():
        assert f.shape == (2, 16, 24, 8), kind
        assert t.shape == (2, 24, 16), kind
