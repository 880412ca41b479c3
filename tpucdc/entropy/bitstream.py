"""Bitstream container format (SURVEY.md C14; BASELINE.json:8 roundtrip).

Layout (little-endian):
  magic   4 bytes  b"TCDC"
  version u8
  header: height u16, width u16, quality_id u8 (λ index), steps u16,
          guidance f32, n_streams u8
  then per stream: length u32 + crc32 u32 + payload bytes.
Stream 0 is the factorized-coded ẑ, stream 1 the Gaussian-coded ŷ.

The per-stream CRC32 (v2) turns mid-payload corruption into a loud
ValueError at parse time: rANS decode of a flipped-bit payload otherwise
"succeeds" with garbage symbols (entropy-coded data has no internal
redundancy to fail on).
"""

from __future__ import annotations

import dataclasses
import struct
import zlib

MAGIC = b"TCDC"
VERSION = 2
_HEADER = struct.Struct("<HHBHfB")


@dataclasses.dataclass
class BitstreamHeader:
    height: int
    width: int
    quality_id: int = 0
    steps: int = 100
    guidance: float = 1.0


def write_bitstream(header: BitstreamHeader, streams: list[bytes]) -> bytes:
    if len(streams) > 255:
        raise ValueError("too many streams")
    parts = [MAGIC, bytes([VERSION]),
             _HEADER.pack(header.height, header.width, header.quality_id,
                          header.steps, header.guidance, len(streams))]
    for s in streams:
        parts.append(struct.pack("<II", len(s), zlib.crc32(s) & 0xFFFFFFFF))
        parts.append(s)
    return b"".join(parts)


def read_bitstream(data: bytes) -> tuple[BitstreamHeader, list[bytes]]:
    if len(data) < 5 or data[:4] != MAGIC:
        raise ValueError("not a tpucdc bitstream (bad magic)")
    if data[4] != VERSION:
        raise ValueError(f"unsupported bitstream version {data[4]}")
    off = 5
    try:
        h, w, q, steps, guidance, n_streams = _HEADER.unpack_from(data, off)
        off += _HEADER.size
        streams = []
        for i in range(n_streams):
            length, crc = struct.unpack_from("<II", data, off)
            off += 8
            payload = bytes(data[off:off + length])
            if len(payload) != length:
                raise ValueError("bitstream truncated")
            if (zlib.crc32(payload) & 0xFFFFFFFF) != crc:
                raise ValueError(f"stream {i} corrupt (crc mismatch)")
            streams.append(payload)
            off += length
    except struct.error as e:
        raise ValueError(f"bitstream truncated ({e})") from None
    return BitstreamHeader(h, w, q, steps, guidance), streams
