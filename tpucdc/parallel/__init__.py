"""Parallel decode: shard_map batched sampling + tiled high-res decode
(SURVEY.md §2.3, §5.7; BASELINE.json:5 clause 5, :10)."""

from tpucdc.parallel.shard_decode import sharded_sample
from tpucdc.parallel.tiling import (blend_tiles, make_tile_plan, split_tiles,
                                    TilePlan)

__all__ = ["sharded_sample", "make_tile_plan", "split_tiles", "blend_tiles",
           "TilePlan"]
