"""Compress→decompress roundtrip on the tiny config (SURVEY.md M4 exit
criterion: bit-exact latent roundtrip; real-bytes bpp ≈ likelihood bpp)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpucdc import presets
from tpucdc.model import CDCModel, init_model
from tpucdc.ops import make_schedule
from tpucdc.pipelines.codec_runtime import CodecRuntime
from tpucdc.runtime import make_mesh


@pytest.fixture(scope="module")
def runtime():
    cfg = presets.tiny()
    cfg = dataclasses.replace(
        cfg, sample=dataclasses.replace(cfg.sample, steps=4))
    model, params = init_model(cfg.model, jax.random.key(0), image_size=64)
    return CodecRuntime(cfg, model, params)


def _test_image(h=64, w=96, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, size=(h // 8, w // 8, 3), dtype=np.uint8)
    return np.repeat(np.repeat(base, 8, 0), 8, 1)


def test_latent_roundtrip_bit_exact(runtime):
    """The ŷ the decoder reconstructs equals the encoder's quantized latent."""
    from tpucdc.pipelines.codec_runtime import pad_image, to_model_range
    img = _test_image()
    padded, _ = pad_image(img)
    x = jnp.asarray(to_model_range(padded))[None]
    z_sym, y_sym, indexes, means = runtime._encode_fn(runtime.params, x)
    blob = runtime.compress(img)
    y_hat, hdr = runtime.decode_latent(blob)
    want = np.asarray(y_sym, np.float32) + np.asarray(means)
    np.testing.assert_array_equal(np.asarray(y_hat), want)
    assert (hdr.height, hdr.width) == img.shape[:2]


def test_hyper_indexes_fetched_as_uint8(runtime):
    """The per-decode forced device→host fetch (Gaussian row indexes feeding
    the host rANS coder) rides the axon relay as uint8 — 4× fewer bytes —
    whenever the scale table fits (≤256 rows; it is 64 by default)."""
    img = _test_image()
    blob = runtime.compress(img)
    hdr, z_sym, _, _ = runtime._host_z_stage(blob)
    _, indexes = runtime._hyper_means_indexes(jnp.asarray(z_sym))
    assert len(runtime.gaussian.scale_table) <= 256
    assert np.asarray(indexes).dtype == np.uint8


def test_full_decompress_shapes(runtime):
    img = _test_image(64, 96)
    blob = runtime.compress(img)
    out = runtime.decompress(blob, steps=2)
    assert out.shape == img.shape
    assert out.dtype == np.uint8


def test_odd_sizes_padded_and_cropped(runtime):
    img = _test_image(72, 96)[:70, :90]  # not multiples of 64
    blob = runtime.compress(img)
    out = runtime.decompress(blob, steps=2)
    assert out.shape == (70, 90, 3)


def test_bpp_matches_likelihood_estimate(runtime):
    """Real byte count within a few % of the model's -log2 likelihood
    (SURVEY.md M4: 'bpp from real bytes matches estimate within 2%')."""
    img = _test_image(128, 128, seed=1)
    x = jnp.asarray(np.asarray(img, np.float32) / 127.5 - 1.0)[None]

    m = runtime.model
    p = runtime.params
    y, z = m.apply(p, x, method=CDCModel.encode)
    med = m.apply(p, method=CDCModel.z_medians)
    z_hat = jnp.round(z - med) + med
    means, scales = m.apply(p, z_hat, method=CDCModel.hyper_decode)
    y_hat = jnp.round(y - means) + means
    lik_y = runtime.gaussian.likelihood(y_hat, means, scales)
    fp = m.bind(p).factorized
    lik_z = fp(z_hat)
    est_bits = float(jnp.sum(-jnp.log2(lik_y)) + jnp.sum(-jnp.log2(lik_z)))

    blob = runtime.compress(img)
    real_bits = len(blob) * 8
    overhead = 8 * (18 + 8 + 8)   # container header + 2×(flush + length)
    assert real_bits <= est_bits * 1.05 + overhead, (real_bits, est_bits)
    assert real_bits >= est_bits * 0.95 - overhead


def test_decompress_many_matches_single(runtime):
    imgs = [_test_image(64, 64, seed=s) for s in range(3)]
    blobs = [runtime.compress(im) for im in imgs]
    outs = runtime.decompress_many(blobs)
    assert len(outs) == 3
    for got, im in zip(outs, imgs):
        assert got.shape == im.shape


def test_compress_many_bit_exact_vs_single(runtime):
    """The pipelined batch encoder must emit the SAME bytes as compress()
    (same executables + coders; only the host/device overlap differs)."""
    imgs = [_test_image(64, 64, seed=s) for s in range(3)]
    blobs = runtime.compress_many(imgs)
    singles = [runtime.compress(im) for im in imgs]
    assert blobs == singles
    outs = runtime.decompress_many(blobs)
    for got, im in zip(outs, imgs):
        assert got.shape == im.shape


def test_batch_paths_mixed_shapes(runtime):
    """Both pipelined paths must survive a batch of differently-sized
    images (each padded shape traces its own executable)."""
    imgs = [_test_image(64, 64, seed=0), _test_image(96, 64, seed=1),
            _test_image(64, 128, seed=2)]
    blobs = runtime.compress_many(imgs)
    assert blobs == [runtime.compress(im) for im in imgs]
    outs = runtime.decompress_many(blobs, steps=2)
    for got, im in zip(outs, imgs):
        assert got.shape == im.shape and got.dtype == np.uint8


def test_tiled_decode_runs(runtime):
    img = _test_image(128, 192, seed=2)
    blob = runtime.compress(img)
    out = runtime.decompress_tiled(blob, tile=64, halo=16, steps=2)
    assert out.shape == img.shape

    mesh = make_mesh()
    out2 = runtime.decompress_tiled(blob, tile=64, halo=16, steps=2, mesh=mesh)
    assert out2.shape == img.shape


def test_cdf_table_sidecar_roundtrip(tmp_path):
    """ADVICE r1: serialized coder tables make decode independent of the
    float table rebuild — a runtime built from the sidecar decodes streams
    encoded by the original runtime bit-exactly."""
    import jax
    from tpucdc import presets
    from tpucdc.model import init_model
    from tpucdc.pipelines.codec_runtime import CodecRuntime

    cfg = presets.tiny()
    model, params = init_model(cfg.model, jax.random.key(0), image_size=64)
    rt1 = CodecRuntime(cfg, model, params)
    path = tmp_path / "tables.npz"
    rt1.save_cdf_tables(path)

    img = np.random.default_rng(0).integers(0, 255, (64, 64, 3),
                                            dtype=np.uint8)
    blob = rt1.compress(img)

    rt2 = CodecRuntime(cfg, model, params,
                       cdf_tables=CodecRuntime.load_cdf_tables(path))
    for k in rt1._z_tables:
        np.testing.assert_array_equal(np.asarray(rt1._z_tables[k]),
                                      np.asarray(rt2._z_tables[k]))
    _, y1, m1, _ = rt1._decode_symbols(blob)
    _, y2, m2, _ = rt2._decode_symbols(blob)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
