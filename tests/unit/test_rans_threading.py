"""Host-concurrency stress for the C++ coder (SURVEY.md §5.2): the coder is
called from worker threads while the main thread dispatches other work —
concurrent calls must be independent (no shared mutable state). A TSAN build
target exists in tpucdc/entropy/cpp/Makefile for deeper checking."""

import concurrent.futures as cf

import numpy as np
import pytest

from tpucdc.codec.cdf_utils import pack_cdf_rows, pmf_to_quantized_cdf
from tpucdc.entropy import RansCodec, native_available


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_concurrent_encode_decode_consistent():
    rng = np.random.default_rng(0)
    rows = [pmf_to_quantized_cdf(rng.dirichlet(np.ones(16)), 1e-9)
            for _ in range(8)]
    cdfs, lengths = pack_cdf_rows(rows)
    codec = RansCodec({"cdfs": cdfs, "cdf_lengths": lengths,
                       "offsets": np.full(8, -8, np.int32)})

    payloads = []
    for s in range(16):
        r = np.random.default_rng(s)
        n = 20_000
        payloads.append((r.integers(-8, 8, n).astype(np.int32),
                         r.integers(0, 8, n).astype(np.int32)))

    expected = [codec.encode(v, i) for v, i in payloads]

    with cf.ThreadPoolExecutor(max_workers=8) as pool:
        got = list(pool.map(lambda p: codec.encode(*p), payloads))
        decoded = list(pool.map(
            lambda b_i: codec.decode(b_i[0], b_i[1]),
            [(blob, idx) for blob, (_, idx) in zip(got, payloads)]))

    for g, e in zip(got, expected):
        assert g == e
    for d, (v, _) in zip(decoded, payloads):
        np.testing.assert_array_equal(d, v)
