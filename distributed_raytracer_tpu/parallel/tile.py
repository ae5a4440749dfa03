"""Screen partitioning.

Two partitioners live here:

1. `partition_bisect` — a faithful reimplementation of the master's recursive
   binary bisection (master/main.go:54-91): alternating split axis, 50x50
   minimum kernel, odd remainders to the right/bottom tile, worker budget
   divided by redundancy. Kept for capability parity and for host-side tile
   scheduling/diagnostics; the SPMD path below does not use it.

2. `row_partition` — the TPU-native static partition: the ray grid is
   flattened and split into equal contiguous blocks, one per device in the
   mesh. XLA SPMD has no dynamic work stealing, and none is needed: unlike
   the reference's heterogeneous GCE workers (pool.go's least-loaded heap),
   chips in a slice are identical, so a static equal split is load-balanced
   by construction. This mapping decision is documented in SURVEY.md §2.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple


@dataclasses.dataclass(frozen=True)
class Tile:
    """A rectangular screen region (the WorkOrder analog, comms.proto:25-35)."""

    x: int
    y: int
    width: int
    height: int


def partition_bisect(width: int, height: int, workers: int,
                     redundancy: int = 1, width_kernel: int = 50,
                     height_kernel: int = 50) -> Tuple[List[Tile], int]:
    """Recursive bisection of the frame (master/main.go:54-91).

    Returns (tiles, leftover_workers). Split axis alternates (even depth =
    vertical cut); a dimension at or below its kernel stops splitting along
    it; odd pixels go to the right/bottom tile.
    """

    def rec(tile: Tile, workers: int, dimension: int):
        if workers // redundancy < 2:
            if workers > redundancy:
                return [tile], workers % redundancy
            return [tile], 0
        if tile.width <= width_kernel and tile.height <= height_kernel:
            return [tile], workers - redundancy
        elif tile.width <= width_kernel:
            dimension = 1
        elif tile.height <= height_kernel:
            dimension = 0

        if dimension % 2 == 0:
            left = Tile(tile.x, tile.y, tile.width // 2, tile.height)
            right = Tile(tile.x + tile.width // 2, tile.y,
                         tile.width // 2 + tile.width % 2, tile.height)
        else:
            left = Tile(tile.x, tile.y, tile.width, tile.height // 2)
            right = Tile(tile.x, tile.y + tile.height // 2,
                         tile.width, tile.height // 2 + tile.height % 2)

        l_tiles, rem = rec(left, workers // 2 + workers % 2, (dimension + 1) % 2)
        r_tiles, rem = rec(right, workers // 2 + rem, (dimension + 1) % 2)
        return l_tiles + r_tiles, rem

    return rec(Tile(0, 0, width, height), workers, 0)


def row_partition(n_rays: int, n_shards: int, chunk: int = 1) -> int:
    """Rays per shard for a static equal split, padded so each shard's count
    is a multiple of `chunk` (the lax.map chunk size)."""
    per = -(-n_rays // n_shards)
    return -(-per // chunk) * chunk
