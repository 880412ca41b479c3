"""rANS coder tests, incl. the classic encode∘decode=id property test with
Hypothesis (SURVEY.md §4.2, honoring the reference's planned test stack
`.gitignore:24`), and C++↔Python bit-exactness."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from tpucdc.codec.cdf_utils import pack_cdf_rows, pmf_to_quantized_cdf
from tpucdc.entropy import RansCodec, native_available
from tpucdc.entropy.bitstream import (BitstreamHeader, read_bitstream,
                                      write_bitstream)


def _make_tables(rng, n_rows=4, max_support=9):
    rows, offsets = [], []
    for _ in range(n_rows):
        support = rng.integers(2, max_support + 1)
        pmf = rng.dirichlet(np.ones(support) * 0.5)
        rows.append(pmf_to_quantized_cdf(pmf, 1e-6))
        offsets.append(int(rng.integers(-10, 2)))
    cdfs, lengths = pack_cdf_rows(rows)
    return {"cdfs": cdfs, "cdf_lengths": lengths,
            "offsets": np.asarray(offsets, np.int32)}


def test_roundtrip_python():
    rng = np.random.default_rng(0)
    tables = _make_tables(rng)
    codec = RansCodec(tables, use_native=False)
    indexes = rng.integers(0, 4, size=1000).astype(np.int32)
    # Mostly in-range values plus out-of-range escapes.
    values = rng.integers(-30, 30, size=1000).astype(np.int32)
    data = codec.encode(values, indexes)
    out = codec.decode(data, indexes)
    np.testing.assert_array_equal(out, values)


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_roundtrip_native_and_cross_interop():
    rng = np.random.default_rng(1)
    tables = _make_tables(rng)
    native = RansCodec(tables, use_native=True)
    pure = RansCodec(tables, use_native=False)
    indexes = rng.integers(0, 4, size=5000).astype(np.int32)
    values = rng.integers(-40, 40, size=5000).astype(np.int32)

    data_native = native.encode(values, indexes)
    data_pure = pure.encode(values, indexes)
    assert data_native == data_pure, "C++ and Python coders must be bit-exact"
    np.testing.assert_array_equal(native.decode(data_pure, indexes), values)
    np.testing.assert_array_equal(pure.decode(data_native, indexes), values)


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
@settings(max_examples=30, deadline=None)
@given(st.data())
def test_roundtrip_property(data):
    """encode∘decode = id over random symbol/CDF draws (SURVEY.md §4.2)."""
    seed = data.draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    n_rows = data.draw(st.integers(1, 6))
    tables = _make_tables(rng, n_rows=n_rows)
    codec = RansCodec(tables, use_native=True)
    n = data.draw(st.integers(0, 400))
    indexes = rng.integers(0, n_rows, size=n).astype(np.int32)
    values = rng.integers(-1000, 1000, size=n).astype(np.int32)
    out = codec.decode(codec.encode(values, indexes), indexes)
    np.testing.assert_array_equal(out, values)


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_rate_close_to_entropy():
    """Coded length ≈ Shannon entropy of the quantized pmf (within 2%+4B)."""
    rng = np.random.default_rng(2)
    pmf = rng.dirichlet(np.ones(64))
    cdf = pmf_to_quantized_cdf(pmf, 1e-9)
    cdfs, lengths = pack_cdf_rows([cdf])
    codec = RansCodec({"cdfs": cdfs, "cdf_lengths": lengths,
                       "offsets": np.zeros(1, np.int32)})
    n = 200_000
    values = rng.choice(64, size=n, p=pmf).astype(np.int32)
    indexes = np.zeros(n, np.int32)
    nbytes = len(codec.encode(values, indexes))
    q = np.diff(cdf)[:64] / float(cdf[-1])
    cross_entropy_bits = -np.sum(
        (np.bincount(values, minlength=64) / n) * np.log2(q)) * n
    assert nbytes * 8 <= cross_entropy_bits * 1.02 + 32
    assert nbytes * 8 >= cross_entropy_bits * 0.98


def test_bitstream_container_roundtrip():
    hdr = BitstreamHeader(height=512, width=768, quality_id=3, steps=100,
                          guidance=1.5)
    streams = [b"hello", b"", bytes(range(256))]
    data = write_bitstream(hdr, streams)
    hdr2, streams2 = read_bitstream(data)
    assert (hdr2.height, hdr2.width, hdr2.quality_id, hdr2.steps) == \
        (512, 768, 3, 100)
    assert abs(hdr2.guidance - 1.5) < 1e-6
    assert streams2 == streams


def test_bitstream_rejects_garbage():
    with pytest.raises(ValueError):
        read_bitstream(b"XXXX" + bytes(20))


def test_bitstream_detects_payload_corruption():
    """v2 per-stream CRC32: a flipped bit anywhere in a payload must raise
    (rANS itself decodes corrupt payloads to garbage without failing)."""
    hdr = BitstreamHeader(height=64, width=64)
    payload = bytes(range(64)) * 4
    data = bytearray(write_bitstream(hdr, [payload, b"second" * 10]))
    for flip_at in (len(data) - 1, len(data) // 2, len(data) - len(payload)):
        bad = bytearray(data)
        bad[flip_at] ^= 0x01
        with pytest.raises(ValueError, match="corrupt|truncated|version"):
            read_bitstream(bytes(bad))
    # untouched data still parses
    assert read_bitstream(bytes(data))[1][0] == payload


def test_bitstream_v3_gamma_roundtrip():
    """v3 (r4): the serving blend γ rides in the header; NaN means unset
    and surfaces as gamma_or_none=None."""
    hdr = BitstreamHeader(height=64, width=64, gamma=0.5)
    hdr2, _ = read_bitstream(write_bitstream(hdr, [b"x"]))
    assert hdr2.gamma_or_none == 0.5
    unset, _ = read_bitstream(write_bitstream(
        BitstreamHeader(height=64, width=64), [b"x"]))
    assert unset.gamma_or_none is None


def test_bitstream_reads_v2_as_gamma_unset():
    """A pre-r4 (v2) container must still parse, with γ reported unset."""
    import struct
    import zlib
    payload = b"legacy"
    v2 = (b"TCDC" + bytes([2])
          + struct.pack("<HHBHfB", 48, 64, 1, 10, 1.0, 1)
          + struct.pack("<II", len(payload),
                        zlib.crc32(payload) & 0xFFFFFFFF) + payload)
    hdr, streams = read_bitstream(v2)
    assert (hdr.height, hdr.width, hdr.quality_id, hdr.steps) == (48, 64, 1, 10)
    assert hdr.gamma_or_none is None
    assert streams == [payload]


def test_with_header_gamma_rewrites_in_place():
    """with_header_gamma swaps only the header γ: streams and every other
    header field survive byte-exactly."""
    from tpucdc.entropy.bitstream import with_header_gamma
    hdr = BitstreamHeader(height=512, width=768, quality_id=2, steps=5,
                          guidance=1.25)
    streams = [bytes(range(256)), b"abc"]
    out = with_header_gamma(write_bitstream(hdr, streams), 0.75)
    hdr2, streams2 = read_bitstream(out)
    assert hdr2.gamma_or_none == 0.75
    assert (hdr2.height, hdr2.width, hdr2.quality_id, hdr2.steps) == \
        (512, 768, 2, 5)
    assert abs(hdr2.guidance - 1.25) < 1e-6
    assert streams2 == streams
