"""Checkerboard context entropy model (codec/context_model.py):
no-leak property, training forward, and coding roundtrip."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpucdc import presets
from tpucdc.codec.context_model import CheckerboardContext, checkerboard_mask
from tpucdc.model import CDCModel, init_model
from tpucdc.pipelines.codec_runtime import CodecRuntime, pad_image, to_model_range
from tpucdc.pipelines.train import loss_fn, schedule_tables
from tpucdc.runtime import F32_POLICY


def _cb_config():
    cfg = presets.tiny()
    codec = dataclasses.replace(cfg.model.codec, context="checkerboard")
    model = dataclasses.replace(cfg.model, codec=codec)
    return dataclasses.replace(
        cfg, model=model,
        sample=dataclasses.replace(cfg.sample, steps=2)).validated()


@pytest.fixture(scope="module")
def runtime():
    cfg = _cb_config()
    model, params = init_model(cfg.model, jax.random.key(0), image_size=64)
    return cfg, CodecRuntime(cfg, model, params)


def test_mask_parity():
    a = checkerboard_mask(4, 4, anchor=True)[..., 0]
    na = checkerboard_mask(4, 4, anchor=False)[..., 0]
    np.testing.assert_array_equal(a + na, np.ones((4, 4)))
    assert a[0, 0] == 1 and a[0, 1] == 0 and a[1, 0] == 0 and a[1, 1] == 1


def test_nonanchor_params_do_not_leak_nonanchors():
    """Non-anchor (μ,σ) must be independent of non-anchor latent values."""
    ctx = CheckerboardContext(latent_channels=8, policy=F32_POLICY)
    feats = jax.random.normal(jax.random.key(0), (1, 6, 6, 16))
    y = jax.random.normal(jax.random.key(1), (1, 6, 6, 8))
    am = jnp.asarray(checkerboard_mask(6, 6, anchor=True))
    params = ctx.init(jax.random.key(2), feats, y)

    masked = y * am
    m1, s1 = ctx.apply(params, feats, masked,
                       method=CheckerboardContext.nonanchor_params)
    # Perturb ONLY non-anchor positions of the context input.
    perturbed = masked + 100.0 * (1 - am) * jax.random.normal(
        jax.random.key(3), y.shape)
    leak_in = perturbed * am          # proper masking removes the perturbation
    m2, s2 = ctx.apply(params, feats, leak_in,
                       method=CheckerboardContext.nonanchor_params)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)


def test_training_forward_checkerboard(runtime):
    cfg, rt = runtime
    tables = schedule_tables(cfg)
    batch = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3),
                               minval=-1, maxval=1)
    loss, metrics = loss_fn(rt.model, rt.params, batch, jax.random.key(2),
                            tables, rd_lambda=8.0)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: loss_fn(rt.model, p, batch, jax.random.key(2),
                                   tables, 8.0)[0])(rt.params)
    assert all(np.isfinite(float(jnp.linalg.norm(x)))
               for x in jax.tree_util.tree_leaves(g))


def test_checkerboard_roundtrip_bit_exact(runtime):
    cfg, rt = runtime
    rng = np.random.default_rng(0)
    img = np.repeat(np.repeat(
        rng.integers(0, 255, (16, 16, 3), dtype=np.uint8), 8, 0), 8, 1)[:120, :96]
    blob = rt.compress(img)

    # The decoder's ŷ must equal the encoder's two-pass quantized latent.
    hdr, y_sym, means, _ = rt._decode_symbols(blob)
    padded, _ = pad_image(img)
    x = jnp.asarray(to_model_range(padded))[None]
    y, z_sym = rt._analysis_fn(rt.params, x)
    feats, m_a, _ = rt._ctx_anchor_fn(rt.params, z_sym)
    am, nam = rt._parity_masks(y.shape[1], y.shape[2])
    sym_a = np.round(np.asarray(y) - np.asarray(m_a)).astype(np.int32)
    y_am = (sym_a + np.asarray(m_a)) * am[None, :, :, None]
    m_na, _ = rt._ctx_nonanchor_fn(rt.params, feats,
                                   jnp.asarray(y_am, jnp.float32))
    sym_na = np.round(np.asarray(y) - np.asarray(m_na)).astype(np.int32)
    want_sym = sym_a * am[None, :, :, None] + sym_na * nam[None, :, :, None]
    np.testing.assert_array_equal(np.asarray(y_sym), want_sym)

    out = rt.decompress(blob, steps=2)
    assert out.shape == img.shape


def test_checkerboard_streams_in_container(runtime):
    from tpucdc.entropy import read_bitstream
    _, rt = runtime
    img = np.zeros((64, 64, 3), np.uint8)
    _, streams = read_bitstream(rt.compress(img))
    assert len(streams) == 3          # z, y-anchor, y-nonanchor