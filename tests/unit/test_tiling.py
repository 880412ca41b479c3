import numpy as np
import pytest

from tpucdc.parallel import blend_tiles, make_tile_plan, split_tiles


def test_plan_covers_image():
    plan = make_tile_plan(512, 768, tile=256, halo=32)
    cover = np.zeros((512, 768), bool)
    e = plan.extent
    for (i, j) in plan.positions:
        assert 0 <= i <= 512 - e and 0 <= j <= 768 - e
        cover[i:i + e, j:j + e] = True
    assert cover.all()


def test_split_blend_identity():
    """Blending tiles cut from an image reproduces it exactly (weights
    normalize; overlapping content agrees)."""
    rng = np.random.default_rng(0)
    img = rng.normal(size=(320, 448, 3)).astype(np.float32)
    plan = make_tile_plan(320, 448, tile=128, halo=32)
    tiles = split_tiles(img, plan)
    out = blend_tiles(tiles, plan)
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_split_scale_matches_latent_grid():
    img = np.arange(64 * 64).reshape(64, 64, 1).astype(np.float32)
    plan = make_tile_plan(64, 64, tile=32, halo=16)
    lat = img[::16, ::16]  # fake 16x-downsampled latent (4x4)
    tiles = split_tiles(lat, plan, scale=16)
    assert tiles.shape[1:3] == (plan.extent // 16, plan.extent // 16)


def test_plan_validates():
    with pytest.raises(ValueError):
        make_tile_plan(100, 100, tile=256, halo=32)
    with pytest.raises(ValueError):
        make_tile_plan(512, 512, tile=100, halo=32)
