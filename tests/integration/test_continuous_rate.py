"""Continuous variable-rate serving (r4): log-domain interpolation between
trained gain-ladder rows (CodecRuntime.quality_gains), the v4 bitstream
quality_f field, and target-bpp rate control (compress_to_bpp).

The fractional path runs through its own traced-gain programs
(_analysis_fn_vec / _sample_fn_vec) — one compiled executable for EVERY
fractional quality — while integral qualities stay on the per-level static
path and must produce byte-identical bitstreams to quality_id encodes.
"""

import dataclasses
import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpucdc import presets
from tpucdc.entropy import read_bitstream
from tpucdc.model import init_model
from tpucdc.pipelines.codec_runtime import CodecRuntime


@pytest.fixture(scope="module")
def runtime():
    cfg = presets.tiny()
    codec = dataclasses.replace(cfg.model.codec, num_qualities=3)
    model_cfg = dataclasses.replace(cfg.model, codec=codec)
    train = dataclasses.replace(cfg.train, rd_lambdas=(4.0, 16.0, 64.0))
    cfg = dataclasses.replace(
        cfg, model=model_cfg, train=train,
        sample=dataclasses.replace(cfg.sample, steps=2)).validated()
    model, params = init_model(cfg.model, jax.random.key(0), image_size=64)
    # Geometric gain ladder (rate monotone in quality): 0.5 → 1 → 2.
    c = cfg.model.codec.latent_channels
    gains = np.stack([np.full(c, 0.5), np.full(c, 1.0),
                      np.full(c, 2.0)]).astype(np.float32)
    params["params"]["gains"] = jnp.asarray(gains)
    params["params"]["inv_gains"] = jnp.asarray(1.0 / gains)
    return cfg, CodecRuntime(cfg, model, params)


@pytest.fixture(scope="module")
def img():
    return np.random.default_rng(0).integers(0, 255, (64, 64, 3),
                                             dtype=np.uint8)


def test_quality_gains_integral_exact(runtime):
    """Integral qualities return the trained rows bitwise — no exp∘log."""
    _, rt = runtime
    g, ig = rt.quality_gains(1.0)
    np.testing.assert_array_equal(g, np.full(g.shape, 1.0, np.float32))
    np.testing.assert_array_equal(ig, np.full(g.shape, 1.0, np.float32))
    g0, _ = rt.quality_gains(0)
    np.testing.assert_array_equal(g0, np.full(g.shape, 0.5, np.float32))


def test_quality_gains_log_interp_and_clamp(runtime):
    _, rt = runtime
    # exp(0.5·ln 0.5 + 0.5·ln 1) = sqrt(0.5)
    g, ig = rt.quality_gains(0.5)
    np.testing.assert_allclose(g, np.sqrt(0.5), rtol=1e-6)
    np.testing.assert_allclose(ig, np.sqrt(2.0), rtol=1e-6)
    # out-of-range qualities clamp to the ladder ends
    g_hi, _ = rt.quality_gains(99.0)
    np.testing.assert_array_equal(g_hi, np.full(g.shape, 2.0, np.float32))


def test_integral_quality_matches_static_path(runtime, img):
    """quality=1.0 must be byte-identical to quality_id=1 (same program,
    same header — quality_f stays unset for integral values)."""
    _, rt = runtime
    assert rt.compress(img, quality=1.0) == rt.compress(img, quality_id=1)
    hdr, _ = read_bitstream(rt.compress(img, quality=2.0))
    assert hdr.quality_id == 2 and hdr.quality_f_or_none is None


def test_fractional_roundtrip_and_header(runtime, img):
    _, rt = runtime
    blob = rt.compress(img, quality=1.5)
    hdr, _ = read_bitstream(blob)
    assert hdr.quality_f_or_none == 1.5          # f32-exact value
    assert hdr.quality_id == 2                   # v3-era reader fallback
    out = rt.decompress(blob, steps=2)           # traced inv-gain program
    assert out.shape == img.shape
    # decode is deterministic per rng
    np.testing.assert_array_equal(out, rt.decompress(blob, steps=2))


def test_rate_monotone_across_continuous_dial(runtime, img):
    _, rt = runtime
    sizes = [len(rt.compress(img, quality=q))
             for q in (0.0, 0.5, 1.0, 1.5, 2.0)]
    assert all(a < b for a, b in zip(sizes, sizes[1:])), sizes


def test_compress_to_bpp_hits_target(runtime, img):
    _, rt = runtime
    npix = img.shape[0] * img.shape[1]
    lo = len(rt.compress(img, quality=0.0)) * 8 / npix
    hi = len(rt.compress(img, quality=2.0)) * 8 / npix
    target = 0.5 * (lo + hi)
    blob, q, bpp = rt.compress_to_bpp(img, target, tol=0.03)
    assert len(blob) * 8 / npix == bpp
    assert abs(bpp - target) / target <= 0.03, (bpp, target)
    assert 0.0 <= q <= 2.0
    # unreachable targets clamp to the nearest endpoint
    blob_lo, q_lo, bpp_lo = rt.compress_to_bpp(img, 1e-6)
    assert q_lo == 0.0 and bpp_lo == lo
    blob_hi, q_hi, bpp_hi = rt.compress_to_bpp(img, 1e6)
    assert q_hi == 2.0 and bpp_hi == hi


def test_decompress_many_mixed_qualities(runtime, img):
    """The pipelined batch decode routes each blob to the right program
    (static per-level vs traced inv-gain) from its own header."""
    _, rt = runtime
    blobs = [rt.compress(img, quality=0.5), rt.compress(img, quality_id=2)]
    outs = rt.decompress_many(blobs, steps=2)
    assert [o.shape for o in outs] == [img.shape, img.shape]


def test_tiled_decode_fractional_quality(runtime):
    """decompress_tiled must apply the interpolated inverse gain on both
    branches: the traced-gain sample program (no mesh) and the explicit
    inv_gain_vec rescale (mesh)."""
    import numpy as np
    from tpucdc.runtime import make_mesh
    _, rt = runtime
    big = np.random.default_rng(2).integers(0, 255, (128, 192, 3),
                                            dtype=np.uint8)
    blob = rt.compress(big, quality=1.5)
    out = rt.decompress_tiled(blob, tile=64, halo=16, steps=2)
    assert out.shape == big.shape
    out2 = rt.decompress_tiled(blob, tile=64, halo=16, steps=2,
                               mesh=make_mesh())
    assert out2.shape == big.shape


def test_optimize_gamma_preserves_quality_f(runtime, img):
    """The encode-time γ search re-packs the header; the v4 continuous
    quality must survive the rewrite alongside the chosen γ."""
    _, rt = runtime
    blob = rt.compress(img, quality=1.5, optimize_gamma=(0.0, 0.5))
    hdr, _ = read_bitstream(blob)
    assert hdr.quality_f_or_none == 1.5
    assert hdr.gamma_or_none in (0.0, 0.5)


def test_writer_only_bumps_version_when_needed(runtime, img):
    """Integral-quality bitstreams must stay v3 (older decoders hard-
    reject unknown versions); only a set quality_f earns the v4 bump."""
    _, rt = runtime
    assert rt.compress(img, quality_id=1)[4] == 3
    assert rt.compress(img, quality=1.5)[4] == 4


def test_v3_container_backcompat():
    """A v3-era container (no quality_f field) still parses, quality_f
    unset."""
    from tpucdc.entropy.bitstream import _HEADER_V3, MAGIC
    import zlib
    payload = b"\x01\x02\x03"
    raw = (MAGIC + bytes([3])
           + _HEADER_V3.pack(8, 8, 1, 2, 1.0, float("nan"), 1)
           + struct.pack("<II", len(payload), zlib.crc32(payload))
           + payload)
    hdr, streams = read_bitstream(raw)
    assert hdr.quality_f_or_none is None
    assert hdr.quality_id == 1 and streams == [payload]


def test_estimate_bpp_tracks_actual(runtime, img):
    """The analytic rate probe must track the real container bpp closely
    enough to steer the bisection (escape/header overhead dominates the
    gap at this tiny image size; at serving resolution it is ~1%)."""
    _, rt = runtime
    npix = img.shape[0] * img.shape[1]
    for q in (0.0, 1.5):
        actual = len(rt.compress(img, quality=q)) * 8 / npix
        est = rt.estimate_bpp(img, q)
        assert abs(est - actual) / actual < 0.15, (q, est, actual)
    # monotone in quality, like the actual rate
    assert rt.estimate_bpp(img, 0.0) < rt.estimate_bpp(img, 2.0)


def test_compress_to_bpp_estimate_probe(runtime, img):
    _, rt = runtime
    npix = img.shape[0] * img.shape[1]
    lo = len(rt.compress(img, quality=0.0)) * 8 / npix
    hi = len(rt.compress(img, quality=2.0)) * 8 / npix
    target = 0.5 * (lo + hi)
    blob, q, bpp = rt.compress_to_bpp(img, target, probe="estimate")
    assert len(blob) * 8 / npix == bpp           # reported bpp is the REAL one
    assert abs(bpp - target) / target <= 0.15, (bpp, target)
    with pytest.raises(ValueError, match="probe"):
        rt.compress_to_bpp(img, target, probe="nope")


def test_continuous_quality_requires_vr():
    cfg = presets.tiny().validated()          # num_qualities == 1
    model, params = init_model(cfg.model, jax.random.key(0), image_size=64)
    rt = CodecRuntime(cfg, model, params)
    im = np.zeros((64, 64, 3), np.uint8)
    with pytest.raises(ValueError, match="variable-rate"):
        rt.compress(im, quality=0.5)
    with pytest.raises(ValueError, match="variable-rate"):
        rt.compress_to_bpp(im, 0.5)
