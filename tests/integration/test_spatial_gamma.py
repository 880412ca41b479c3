"""Spatial serving dial (v5 bitstream γ grid, r5 — VERDICT r4 task 7).

The blend x̂ = x̄ + γ·(x₀ − x̄) is linear in γ, so the encoder fits a
per-tile γ grid in CLOSED FORM (γ* = Σd·r / Σd·d per tile) from the two
decodes the scalar search already has, and the decode program bilinearly
upsamples the grid (traced input) to blend per pixel. These tests pin the
algebra, the fit, and the encode-time win-gate on the tiny CPU model."""

import dataclasses

import jax
import numpy as np
import pytest

from tpucdc import presets
from tpucdc.entropy import read_bitstream
from tpucdc.model import init_model
from tpucdc.pipelines.codec_runtime import CodecRuntime


@pytest.fixture(scope="module")
def runtime():
    cfg = presets.tiny()   # codec.synthesis=True → x̄ anchors the blend
    cfg = dataclasses.replace(
        cfg, sample=dataclasses.replace(cfg.sample, steps=4))
    model, params = init_model(cfg.model, jax.random.key(0), image_size=64)
    return CodecRuntime(cfg, model, params)


def _img(seed=0, h=128, w=256):
    """128×256 pads to 128×256 → a 1×2 γ grid at GAMMA_TILE=128."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, size=(h // 8, w // 8, 3), dtype=np.uint8)
    return np.repeat(np.repeat(base, 8, 0), 8, 1)


def test_constant_grid_matches_scalar(runtime):
    """A grid filled with one value decodes like the scalar γ program
    (bilinear upsampling of a constant is that constant, up to fp/uint8
    rounding)."""
    blob = runtime.compress(_img(1))
    rng = jax.random.key(5)
    scalar = runtime.decompress(blob, rng=rng, steps=2, gamma=0.5)
    grid = runtime.decompress(blob, rng=rng, steps=2,
                              gamma=np.full((1, 2), 0.5, np.float32))
    diff = np.abs(scalar.astype(np.int32) - grid.astype(np.int32))
    assert diff.max() <= 1, f"max uint8 delta {diff.max()}"


def test_fit_gamma_grid_closed_form(runtime):
    """Where ref == refined the tile wants γ=1; where ref == mean it wants
    γ=0 — the closed-form fit recovers both, quantized to u8."""
    h, w = 128, 256
    rng = np.random.default_rng(3)
    mean = rng.integers(40, 200, size=(h, w, 3)).astype(np.uint8)
    d = rng.integers(-30, 30, size=(h, w, 3)).astype(np.int16)
    refined = np.clip(mean.astype(np.int16) + d, 0, 255).astype(np.uint8)
    ref = mean.astype(np.float64).copy()
    ref[:, w // 2:] = refined[:, w // 2:]          # right tile: γ*=1
    grid = runtime._fit_gamma_grid(ref, mean, refined)
    assert grid.shape == (1, 2)
    assert grid[0, 0] <= 8 and grid[0, 1] >= 247   # ≈0 and ≈255 (γ≈1)


def test_optimize_gamma_spatial_end_to_end(runtime):
    """compress(optimize_gamma='spatial') emits a decodable stream whose
    served reconstruction is never worse than the scalar in-band pick
    (the encode-time gate verifies by decoding the v5 candidate)."""
    img = _img(4)
    blob_sc = runtime.compress(img, optimize_gamma=True)
    blob_sp = runtime.compress(img, optimize_gamma="spatial")
    rec_sc = runtime.decompress(blob_sc, rng=jax.random.key(0))
    rec_sp = runtime.decompress(blob_sp, rng=jax.random.key(0))
    mse = lambda x: float(np.mean((x.astype(np.float64) - img) ** 2))
    assert mse(rec_sp) <= mse(rec_sc) + 1e-9
    hdr = read_bitstream(blob_sp)[0]
    if hdr.gamma_grid is not None:      # grid kept only when it wins
        assert blob_sp[4] == 5
        assert hdr.gamma_grid.shape == (1, 2)
        # scalar fallback γ still present for grid-less decode paths
        assert hdr.gamma_or_none is not None
    else:
        assert blob_sp[4] in (3, 4)


def test_v5_header_grid_drives_plain_decode(runtime):
    """A v5 stream's plain decompress() serves the header grid; an explicit
    scalar γ overrides it."""
    from tpucdc.entropy import with_header_gamma_grid

    blob = runtime.compress(_img(6))
    grid_u8 = np.array([[0, 255]], np.uint8)
    blob5 = with_header_gamma_grid(blob, grid_u8, 0.5)
    rng = jax.random.key(2)
    plain = runtime.decompress(blob5, rng=rng, steps=2)
    explicit = runtime.decompress(blob5, rng=rng, steps=2,
                                  gamma=np.array([[0.0, 1.0]], np.float32))
    np.testing.assert_array_equal(plain, explicit)
    override = runtime.decompress(blob5, rng=rng, steps=2, gamma=0.0)
    mean = runtime.decompress(blob5, rng=rng, steps=0)
    assert np.abs(override.astype(np.int32)
                  - mean.astype(np.int32)).max() <= 1


def test_grid_spatially_varies_the_blend(runtime):
    """γ grid [0, 1]: the left half tracks the mean decode, the right half
    the refined sample (away from the bilinear transition band)."""
    blob = runtime.compress(_img(7))
    rng = jax.random.key(9)
    mean = runtime.decompress(blob, rng=rng, steps=2, gamma=0.0)
    ref = runtime.decompress(blob, rng=rng, steps=2, gamma=1.0)
    sp = runtime.decompress(blob, rng=rng, steps=2,
                            gamma=np.array([[0.0, 1.0]], np.float32))
    # sample columns well inside each tile (transition spans the middle)
    l = slice(0, 32)
    r = slice(224, 256)
    assert np.abs(sp[:, l].astype(np.int32)
                  - mean[:, l].astype(np.int32)).max() <= 1
    assert np.abs(sp[:, r].astype(np.int32)
                  - ref[:, r].astype(np.int32)).max() <= 1


def test_decompress_many_honors_grid(runtime):
    """The pipelined batch decode resolves the v5 grid exactly like the
    single-image path (same rng folding → identical pixels)."""
    from tpucdc.entropy import with_header_gamma_grid

    blobs = [runtime.compress(_img(10)), runtime.compress(_img(11))]
    blobs[1] = with_header_gamma_grid(
        blobs[1], np.array([[0, 255]], np.uint8), 0.5)
    rng = jax.random.key(4)
    many = runtime.decompress_many(blobs, rng=rng, steps=2)
    for i, b in enumerate(blobs):
        one = runtime.decompress(b, rng=jax.random.fold_in(rng, i), steps=2)
        np.testing.assert_array_equal(many[i], one)
