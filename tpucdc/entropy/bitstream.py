"""Bitstream container format (SURVEY.md C14; BASELINE.json:8 roundtrip).

Layout (little-endian):
  magic   4 bytes  b"TCDC"
  version u8
  header: height u16, width u16, quality_id u8 (λ index), steps u16,
          guidance f32, n_streams u8
  then per stream: length u32 + payload bytes.
Stream 0 is the factorized-coded ẑ, stream 1 the Gaussian-coded ŷ.
"""

from __future__ import annotations

import dataclasses
import struct

MAGIC = b"TCDC"
VERSION = 1
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
        parts.append(struct.pack("<I", len(s)))
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
        for _ in range(n_streams):
            (length,) = struct.unpack_from("<I", data, off)
            off += 4
            streams.append(bytes(data[off:off + length]))
            if len(streams[-1]) != length:
                raise ValueError("bitstream truncated")
            off += length
    except struct.error as e:
        raise ValueError(f"bitstream truncated ({e})") from None
    return BitstreamHeader(h, w, q, steps, guidance), streams
