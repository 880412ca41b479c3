"""Combined space-channel context model (codec/space_channel.py):
causality across groups AND parities, training forward, coding roundtrip."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpucdc import presets
from tpucdc.codec.context_model import checkerboard_mask
from tpucdc.codec.space_channel import SpaceChannelContext
from tpucdc.model import init_model
from tpucdc.pipelines.codec_runtime import CodecRuntime
from tpucdc.pipelines.train import loss_fn, schedule_tables
from tpucdc.runtime import F32_POLICY


def _sc_config():
    cfg = presets.tiny()
    codec = dataclasses.replace(cfg.model.codec, context="space-channel",
                                context_groups=4)
    model = dataclasses.replace(cfg.model, codec=codec)
    return dataclasses.replace(
        cfg, model=model,
        sample=dataclasses.replace(cfg.sample, steps=2)).validated()


@pytest.fixture(scope="module")
def runtime():
    cfg = _sc_config()
    model, params = init_model(cfg.model, jax.random.key(0), image_size=64)
    return cfg, CodecRuntime(cfg, model, params)


def test_causality_full_call():
    """Group g's params depend on neither later groups nor same-group
    non-anchor positions."""
    ctx = SpaceChannelContext(latent_channels=16, num_groups=2,
                              policy=F32_POLICY)
    feats = jax.random.normal(jax.random.key(0), (1, 6, 6, 8))
    y = jax.random.normal(jax.random.key(1), (1, 6, 6, 16))
    params = ctx.init(jax.random.key(2), feats, y)
    base_m, _ = ctx.apply(params, feats, y)

    # Perturb group 1 entirely: group 0 params unchanged.
    y2 = y.at[..., 8:].add(50.0)
    m2, _ = ctx.apply(params, feats, y2)
    np.testing.assert_allclose(np.asarray(base_m[..., :8]),
                               np.asarray(m2[..., :8]), atol=1e-6)

    # Perturb NON-ANCHOR positions of group 0: group-0 ANCHOR params and the
    # same-group anchor context (which uses only anchor positions) unchanged.
    nam = 1 - jnp.asarray(checkerboard_mask(6, 6, anchor=True))
    y3 = y.at[..., :8].add(50.0 * nam)
    m3, _ = ctx.apply(params, feats, y3)
    am = np.asarray(checkerboard_mask(6, 6, anchor=True))[..., 0] > 0
    np.testing.assert_allclose(np.asarray(base_m)[:, am, :8],
                               np.asarray(m3)[:, am, :8], atol=1e-6)


def test_training_forward_space_channel(runtime):
    cfg, rt = runtime
    tables = schedule_tables(cfg)
    batch = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3),
                               minval=-1, maxval=1)
    loss, _ = loss_fn(rt.model, rt.params, batch, jax.random.key(2),
                      tables, rd_lambda=8.0)
    assert np.isfinite(float(loss))


def test_space_channel_roundtrip(runtime):
    cfg, rt = runtime
    rng = np.random.default_rng(0)
    img = np.repeat(np.repeat(
        rng.integers(0, 255, (16, 16, 3), dtype=np.uint8), 8, 0), 8, 1)
    blob = rt.compress(img)

    from tpucdc.entropy import read_bitstream
    hdr, streams = read_bitstream(blob)
    assert len(streams) == 1 + 2 * 4   # z + (anchor, nonanchor) per group

    # Determinism + full decode.
    assert rt.compress(img) == blob
    out = rt.decompress(blob, steps=2)
    assert out.shape == img.shape

    # ŷ must reconstruct identically across two decodes.
    _, y1, m1, _ = rt._decode_symbols(blob)
    _, y2, m2, _ = rt._decode_symbols(blob)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_decompress_many_pipelined_matches_sequential(runtime):
    """VERDICT r1 item 7: batched decode for context models is pipelined
    (symbol decode of image i+1 on the host CPU backend overlaps scan(i));
    results must equal the per-image path bit-for-bit."""
    cfg, rt = runtime
    rng = np.random.default_rng(1)
    imgs = [np.repeat(np.repeat(
        rng.integers(0, 255, (16, 16, 3), dtype=np.uint8), 8, 0), 8, 1)
        for _ in range(3)]
    blobs = [rt.compress(im) for im in imgs]

    batched = rt.decompress_many(blobs, rng=jax.random.key(5), steps=2)
    for i, blob in enumerate(blobs):
        single = rt.decompress(
            blob, rng=jax.random.fold_in(jax.random.key(5), i), steps=2)
        np.testing.assert_array_equal(batched[i], single)
