"""L5 host entropy coding: C++ rANS coder + bitstream container (SURVEY.md C13-C14)."""

from tpucdc.entropy.rans import RansCodec, native_available
from tpucdc.entropy.bitstream import (BitstreamHeader, read_bitstream,
                                      with_header_gamma,
                                      with_header_gamma_grid,
                                      write_bitstream)

__all__ = ["RansCodec", "native_available", "BitstreamHeader",
           "read_bitstream", "write_bitstream", "with_header_gamma",
           "with_header_gamma_grid"]
