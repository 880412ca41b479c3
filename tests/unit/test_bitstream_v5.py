"""Bitstream v5 (spatial γ grid) container semantics.

Pins the emit-only-when-needed version ladder (v3 scalar / v4 continuous
quality / v5 spatial grid), the grid roundtrip, back-compat parsing, and
truncation errors. CPU-only, no model."""

import numpy as np
import pytest

from tpucdc.entropy.bitstream import (BitstreamHeader, read_bitstream,
                                      with_header_gamma,
                                      with_header_gamma_grid,
                                      write_bitstream)


def test_version_ladder():
    h = BitstreamHeader(100, 200, 1, 5, 1.0, 0.5)
    assert write_bitstream(h, [b"abc"])[4] == 3           # scalar γ only
    h.quality_f = 1.25
    assert write_bitstream(h, [b"abc"])[4] == 4           # + continuous q
    h.gamma_grid = np.zeros((2, 3), np.uint8)
    assert write_bitstream(h, [b"abc"])[4] == 5           # + spatial grid


def test_v5_roundtrip_preserves_everything():
    grid = (np.arange(12, dtype=np.uint8).reshape(3, 4) * 20)
    h = BitstreamHeader(100, 200, 1, 5, 1.0, 0.5, 1.25, grid)
    data = write_bitstream(h, [b"abc", b"q" * 1000])
    h2, streams = read_bitstream(data)
    assert (h2.height, h2.width, h2.quality_id, h2.steps) == (100, 200, 1, 5)
    assert h2.gamma == 0.5 and h2.quality_f == 1.25
    np.testing.assert_array_equal(h2.gamma_grid, grid)
    assert streams == [b"abc", b"q" * 1000]
    # float view
    assert abs(h2.gamma_grid_f[1, 1] - 100 / 255) < 1e-7


def test_grid_attach_and_strip_helpers():
    grid = np.array([[10, 200]], np.uint8)
    d3 = write_bitstream(BitstreamHeader(8, 8), [b"x"])
    d5 = with_header_gamma_grid(d3, grid, 0.25)
    h5, s = read_bitstream(d5)
    assert d5[4] == 5 and s == [b"x"]
    np.testing.assert_array_equal(h5.gamma_grid, grid)
    assert h5.gamma == 0.25
    # with_header_gamma preserves an existing grid
    d5b = with_header_gamma(d5, 0.9)
    h5b, _ = read_bitstream(d5b)
    assert d5b[4] == 5 and abs(h5b.gamma - 0.9) < 1e-7
    np.testing.assert_array_equal(h5b.gamma_grid, grid)
    # strip → back to v3
    d3b = with_header_gamma_grid(d5, None, 0.3)
    h3b, _ = read_bitstream(d3b)
    assert d3b[4] == 3 and h3b.gamma_grid is None
    assert abs(h3b.gamma - 0.3) < 1e-7


def test_grid_dims_validated():
    h = BitstreamHeader(8, 8, gamma_grid=np.zeros((0, 3), np.uint8))
    with pytest.raises(ValueError, match="gamma_grid"):
        write_bitstream(h, [b"x"])
    h.gamma_grid = np.zeros((2, 3, 1), np.uint8)
    with pytest.raises(ValueError, match="gamma_grid"):
        write_bitstream(h, [b"x"])


def test_v5_truncation_is_loud():
    grid = np.full((4, 4), 7, np.uint8)
    data = write_bitstream(BitstreamHeader(8, 8, gamma_grid=grid), [b"xyz"])
    # cut inside the grid bytes and inside the fixed header
    for cut in (8, 5 + 16 + 2 + 5):
        with pytest.raises(ValueError, match="truncated|bad"):
            read_bitstream(data[:cut])


def test_old_versions_still_parse():
    # v3 and v4 writers are exercised above; also check a v2 stream built
    # by hand (the oldest layout in the wild: no γ, no quality_f).
    import struct
    import zlib
    payload = b"hello"
    v2 = (b"TCDC" + bytes([2])
          + struct.pack("<HHBHfB", 16, 32, 0, 100, 1.0, 1)
          + struct.pack("<II", len(payload), zlib.crc32(payload))
          + payload)
    h, s = read_bitstream(v2)
    assert (h.height, h.width) == (16, 32)
    assert h.gamma_or_none is None and h.gamma_grid is None
    assert s == [payload]
