"""Channel-group autoregressive entropy model (codec/channel_context.py):
causality (group g independent of groups ≥ g), training forward, roundtrip."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpucdc import presets
from tpucdc.codec.channel_context import ChannelARContext
from tpucdc.model import init_model
from tpucdc.pipelines.codec_runtime import CodecRuntime, pad_image, to_model_range
from tpucdc.pipelines.train import loss_fn, schedule_tables
from tpucdc.runtime import F32_POLICY


def _car_config():
    cfg = presets.tiny()
    codec = dataclasses.replace(cfg.model.codec, context="channel-ar",
                                context_groups=4)
    model = dataclasses.replace(cfg.model, codec=codec)
    return dataclasses.replace(
        cfg, model=model,
        sample=dataclasses.replace(cfg.sample, steps=2)).validated()


@pytest.fixture(scope="module")
def runtime():
    cfg = _car_config()
    model, params = init_model(cfg.model, jax.random.key(0), image_size=64)
    return cfg, CodecRuntime(cfg, model, params)


def test_group_causality():
    """Group g's (μ,σ) must not depend on channels of groups ≥ g."""
    ctx = ChannelARContext(latent_channels=16, num_groups=4,
                           policy=F32_POLICY)
    feats = jax.random.normal(jax.random.key(0), (1, 4, 4, 8))
    y = jax.random.normal(jax.random.key(1), (1, 4, 4, 16))
    params = ctx.init(jax.random.key(2), feats, y)

    m1, s1 = ctx.apply(params, 2, feats, y[..., :8],
                       method=ChannelARContext.group_params)
    # Changing prior-group values changes the params (context is live)...
    m2, _ = ctx.apply(params, 2, feats, y[..., :8] + 1.0,
                      method=ChannelARContext.group_params)
    assert not np.allclose(np.asarray(m1), np.asarray(m2))
    # ...and the full __call__ assembles group params from ONLY prior groups:
    # perturbing the LAST group leaves all other groups' params unchanged.
    means_a, scales_a = ctx.apply(params, feats, y)
    y_pert = y.at[..., 12:].add(100.0)
    means_b, scales_b = ctx.apply(params, feats, y_pert)
    np.testing.assert_allclose(np.asarray(means_a[..., :12]),
                               np.asarray(means_b[..., :12]), atol=1e-6)


def test_training_forward_channel_ar(runtime):
    cfg, rt = runtime
    tables = schedule_tables(cfg)
    batch = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3),
                               minval=-1, maxval=1)
    loss, _ = loss_fn(rt.model, rt.params, batch, jax.random.key(2),
                      tables, rd_lambda=8.0)
    assert np.isfinite(float(loss))


def test_channel_ar_roundtrip_bit_exact(runtime):
    cfg, rt = runtime
    rng = np.random.default_rng(0)
    img = np.repeat(np.repeat(
        rng.integers(0, 255, (16, 16, 3), dtype=np.uint8), 8, 0), 8, 1)
    blob = rt.compress(img)

    from tpucdc.entropy import read_bitstream
    hdr, streams = read_bitstream(blob)
    assert len(streams) == 1 + 4       # z + one per channel group

    # Decoder's ŷ equals the encoder's sequentially-quantized latent.
    hdr2, y_sym, means, _ = rt._decode_symbols(blob)
    padded, _ = pad_image(img)
    x = jnp.asarray(to_model_range(padded))[None]
    y, z_sym = rt._analysis_fn(rt.params, x)
    feats = rt._hyper_features_fn(rt.params, z_sym)
    y_np = np.asarray(y)
    mg = 32 // 4
    parts, want_sym, want_means = [], [], []
    for g in range(4):
        y_prev = (np.concatenate(parts, -1) if parts else y_np[..., :0])
        m_g, _ = rt._group_params_fn(g)(rt.params, feats,
                                        jnp.asarray(y_prev, jnp.float32))
        m_g = np.asarray(m_g)
        sym = np.round(y_np[..., g * mg:(g + 1) * mg] - m_g).astype(np.int32)
        parts.append(sym + m_g)
        want_sym.append(sym)
        want_means.append(m_g)
    np.testing.assert_array_equal(np.asarray(y_sym),
                                  np.concatenate(want_sym, -1))
    np.testing.assert_allclose(np.asarray(means),
                               np.concatenate(want_means, -1), atol=0)

    out = rt.decompress(blob, steps=2)
    assert out.shape == img.shape
