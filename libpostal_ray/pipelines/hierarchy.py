"""Hierarchical path-prefix rollup — per-directory aggregates over a
path-shaped key column in ONE streaming pass.

The motivating shape is the code corpus (``repo/path`` keys at 10^12-file
scale): "bytes and file counts per directory, at every depth" is the
storage-layout / hot-spot question every corpus curator asks.  The naive
formulation is one groupby PER DEPTH (D full passes); this operator emits
all D prefixes of each row inside a single ``map_batches`` partial — the
exchange then carries per-(batch, prefix) aggregated rows (distinct
prefixes, never input rows), exactly the partial-aggregate discipline used
by the repo's other count/sum exchanges.

Scale posture: a depth-D rollup over N rows ships at most
D x distinct-prefixes-per-batch skinny rows into one crc32(prefix)%P
exchange.  Directory fan-out follows a power law (a few giant top-level
prefixes), but the partial aggregation collapses each batch's contribution
to ONE row per (prefix, depth) before the shuffle, so hot prefixes cost
O(#batches), not O(#rows) — same hot-key argument as the flagship's
sha-collapse.  Content/path strings cross the exchange once per distinct
prefix per batch.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

import ray.data

ROLLUP_PARTITIONS = 32


def _empty_out(weight_alias: str = "weight") -> pa.Table:
    return pa.table(
        {
            "prefix": pa.nulls(0, pa.string()),
            "depth": pa.nulls(0, pa.int64()),
            "n_files": pa.nulls(0, pa.int64()),
            weight_alias: pa.nulls(0, pa.int64()),
        }
    )


def prefix_rollup(
    ds: ray.data.Dataset,
    path_col: str,
    weight_col: str | None = None,
    *,
    max_depth: int = 3,
    sep: str = "/",
    partitions: int = ROLLUP_PARTITIONS,
    weight_alias: str = "weight",
) -> ray.data.Dataset:
    """Aggregate (count, sum(weight)) per path prefix for depths
    1..max_depth.

    A row with path ``a/b/c`` contributes to prefixes ``a`` (depth 1),
    ``a/b`` (depth 2) and ``a/b/c`` (depth 3); rows shallower than a depth
    simply stop contributing (``a`` alone contributes only at depth 1) —
    the SQL analog is unnest over ``range(1, least(len(parts), D) + 1)``.
    Output: (prefix, depth, n_files, <weight_alias>) with the weight
    column 0-filled when ``weight_col`` is None (``weight_alias`` names it
    in the OUTPUT schema — renaming here, not post-hoc, keeps the empty
    dataset schema intact: Dataset.rename_columns needs a schema and
    zero-row datasets lose theirs).
    """
    if max_depth < 1:
        raise ValueError(f"max_depth={max_depth}")

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or path_col not in batch.column_names:
            out = _empty_out()
            return out.append_column(
                "part", pa.nulls(0, pa.int64())
            )
        paths = np.asarray(batch[path_col].to_pylist(), dtype=object)
        w = (
            batch[weight_col].to_numpy(zero_copy_only=False).astype(np.int64)
            if weight_col is not None
            else np.zeros(paths.shape[0], dtype=np.int64)
        )
        # vectorized prefix extraction: for each depth d, the prefix is
        # the path truncated at its d-th separator (rows with fewer than
        # d-1 separators at depth d contribute their full path only when
        # their component count == d)
        # np.char works on fixed-width U arrays; python object loop over
        # DEPTHS only (max_depth iterations), row work vectorized inside
        pref_rows: list[np.ndarray] = []
        w_rows: list[np.ndarray] = []
        d_rows: list[np.ndarray] = []
        u = paths.astype(str)  # ASCII/UTF-8 paths; U-dtype is fine here
        # split once: positions of separators per row via np.char.partition
        remain = u
        built = np.full(u.shape[0], "", dtype=object)
        alive = np.ones(u.shape[0], dtype=bool)
        for d in range(1, max_depth + 1):
            part3 = np.char.partition(remain, sep)
            head, found, tail = part3[:, 0], part3[:, 1], part3[:, 2]
            cur = np.where(
                built == "", head, np.char.add(np.char.add(built.astype(str), sep), head)
            )
            sel = alive & (np.char.str_len(head) > 0)
            if not sel.any():
                break
            pref_rows.append(cur[sel].astype(object))
            w_rows.append(w[sel])
            d_rows.append(np.full(int(sel.sum()), d, dtype=np.int64))
            built = np.where(sel, cur, built)
            alive = sel & (found == sep)
            remain = tail
        if not pref_rows:
            out = _empty_out()
            return out.append_column("part", pa.nulls(0, pa.int64()))
        allp = np.concatenate(pref_rows)
        allw = np.concatenate(w_rows)
        alld = np.concatenate(d_rows)
        # collapse to one row per (prefix, depth) BEFORE the exchange
        keys = np.char.add(
            np.char.add(alld.astype(str), "\x01"), allp.astype(str)
        )
        uk, inv, cnt = np.unique(keys, return_inverse=True, return_counts=True)
        wsum = np.zeros(uk.shape[0], dtype=np.int64)
        np.add.at(wsum, inv, allw)
        prefixes = [k.split("\x01", 1)[1] for k in uk]
        depths = np.asarray([int(k.split("\x01", 1)[0]) for k in uk], dtype=np.int64)
        return pa.table(
            {
                "prefix": pa.array(prefixes, type=pa.string()),
                "depth": pa.array(depths),
                "n_files": pa.array(cnt.astype(np.int64)),
                "weight": pa.array(wsum),
                "part": pa.array(
                    np.fromiter(
                        (zlib.crc32(p.encode()) for p in prefixes),
                        dtype=np.int64,
                        count=len(prefixes),
                    )
                    % partitions
                ),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "prefix" not in group.column_names:
            return _empty_out(weight_alias)
        p = np.asarray(group["prefix"].to_pylist(), dtype=object)
        d = group["depth"].to_numpy(zero_copy_only=False)
        n = group["n_files"].to_numpy(zero_copy_only=False)
        w = group["weight"].to_numpy(zero_copy_only=False)
        keys = np.char.add(np.char.add(d.astype(str), "\x01"), p.astype(str))
        uk, inv = np.unique(keys, return_inverse=True)
        ns = np.zeros(uk.shape[0], dtype=np.int64)
        ws = np.zeros(uk.shape[0], dtype=np.int64)
        np.add.at(ns, inv, n)
        np.add.at(ws, inv, w)
        prefixes = [k.split("\x01", 1)[1] for k in uk]
        depths = np.asarray(
            [int(k.split("\x01", 1)[0]) for k in uk], dtype=np.int64
        )
        return pa.table(
            {
                "prefix": pa.array(prefixes, type=pa.string()),
                "depth": pa.array(depths),
                "n_files": pa.array(ns),
                weight_alias: pa.array(ws),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge, batch_format="pyarrow")
    )
