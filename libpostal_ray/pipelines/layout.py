"""Z-order (Morton) layout — locality-preserving partitioning.

At 100 TB the dominant cost of a secondary-dimension query is how many
partitions it must open.  Z-ordering interleaves the bits of two sort
dimensions so rows close in BOTH dimensions land in the same partition
tile — the standard data-layout optimization (Bayer's UB-tree ordering;
what table formats call Z-ORDER clustering).  The reference's analog is
its geohash neighbor blocking (geohash_and_neighbors, near_dupe.c) —
a geohash IS a z-order key over lat/lon; this generalizes the trick to
any two int columns.

Operators:
  zorder_key    vectorized Morton interleave of the low ``bits`` of two
                non-negative int64 columns (magic-number bit spreading,
                no per-row Python)
  zorder_tiles  add zkey + equal-width tile id; repartitioned output
                written one file per tile gives range queries on either
                dimension a bounded tile fan-out

Everything is exact integer arithmetic — trivially deterministic and
SQL-checkable bit for bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def _spread16(v: np.ndarray) -> np.ndarray:
    """Interleave zeros between the low 16 bits: 0b1111 -> 0b01010101."""
    x = v.astype(np.uint64) & np.uint64(0xFFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x33333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x55555555)
    return x


def zorder_key(xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Morton key of (x, y) low-16-bit pairs -> int64 in [0, 2^32)."""
    return (_spread16(xs) | (_spread16(ys) << np.uint64(1))).astype(np.int64)


def zorder_tiles(
    ds: ray.data.Dataset,
    x_col: str,
    y_col: str,
    *,
    tile_bits: int = 6,
) -> ray.data.Dataset:
    """Append (zkey, tile) to every row: tile = top ``tile_bits`` bits of
    the 32-bit z-key -> 2^tile_bits equal-width z-range tiles.  Writing
    one partition directory per tile gives both-dimension range pruning."""

    shift = np.uint64(32 - tile_bits)

    def add(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        z = zorder_key(x, y)
        return batch.append_column(
            "zkey", pa.array(z, type=pa.int64())
        ).append_column(
            "tile", pa.array((z.astype(np.uint64) >> shift).astype(np.int64))
        )

    return ds.map_batches(add, batch_format="pyarrow")
