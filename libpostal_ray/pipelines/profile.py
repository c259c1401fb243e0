"""Column profiling — the "describe this table" operator.

Per string column: row count, null count, EXACT distinct count, min/max/
total byte length.  This is the first query anyone runs against an unknown
100 TB corpus (schema sanity, null audit, cardinality for partition-key
choice), and the reference's analog of its data-dictionary sanity checks
(libpostal ships dictionary files whose loaders validate counts/format at
build time — resources/dictionaries, address_dictionary.c).

Physical plan — two partial streams, ONE exchange, one tiny merge:

  * stats partials: per batch, one row per column (n, n_null, min/max/sum
    byte length from the Arrow offsets buffer — no string materializes).
  * distinct partials: per batch, (column, value-hash) pairs pre-deduped
    with np.unique, exchanged on hash%P.  Hash-partitioning the VALUE
    means each distinct value lands in exactly one partition, so
    partition-local unique counts SUM to the exact global distinct count
    — the classic distributed COUNT(DISTINCT) without a global sort.
  * both streams union into a groupby(column) merge (O(columns) rows).

Exchange volume: stats are O(batches x columns); distinct is bounded by
the number of distinct values per batch (16 B/row), the unavoidable term
of an exact distinct.  64-bit value hashes stand in for values (collision
probability ~n^2/2^65 — the engine-wide digest convention).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

PROFILE_PARTITIONS = 32


def _byte_lengths(col: pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """(byte_len per row, null mask) from the offsets buffer, zero-copy."""
    lens: list[np.ndarray] = []
    nulls: list[np.ndarray] = []
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    for c in chunks:
        c = c.cast(pa.large_string())
        n = len(c)
        if n == 0:
            continue
        buf = c.buffers()
        off = np.frombuffer(buf[1], dtype=np.int64, count=n + 1, offset=c.offset * 8)
        lens.append(np.diff(off))
        nulls.append(np.asarray(c.is_null()))
    if not lens:
        return np.zeros(0, np.int64), np.zeros(0, bool)
    return np.concatenate(lens), np.concatenate(nulls)


def column_profile(
    ds: ray.data.Dataset,
    columns: list[str],
    *,
    partitions: int = PROFILE_PARTITIONS,
) -> ray.data.Dataset:
    """Profile string ``columns`` -> one row per column:
    (column, n_rows, n_null, n_distinct, min_len, max_len, sum_len).
    Lengths are BYTE lengths (SQL strlen); nulls count toward n_rows only.
    """

    def stats_partial(batch: pa.Table) -> pa.Table:
        rows = {
            "column": [],
            "kind": [],
            "a": [],
            "b": [],
            "c": [],
            "d": [],
            "e": [],
        }
        for col in columns:
            lens, isnull = _byte_lengths(batch[col])
            valid = lens[~isnull]
            rows["column"].append(col)
            rows["kind"].append(0)  # stats row
            rows["a"].append(int(batch.num_rows))
            rows["b"].append(int(isnull.sum()))
            rows["c"].append(int(valid.min()) if valid.size else np.iinfo(np.int64).max)
            rows["d"].append(int(valid.max()) if valid.size else -1)
            rows["e"].append(int(valid.sum()))
        return pa.table(
            {
                "column": pa.array(rows["column"], type=pa.string()),
                "kind": pa.array(rows["kind"], type=pa.int64()),
                "a": pa.array(rows["a"], type=pa.int64()),
                "b": pa.array(rows["b"], type=pa.int64()),
                "c": pa.array(rows["c"], type=pa.int64()),
                "d": pa.array(rows["d"], type=pa.int64()),
                "e": pa.array(rows["e"], type=pa.int64()),
            }
        )

    def distinct_partial(batch: pa.Table) -> pa.Table:
        cols: list[np.ndarray] = []
        hs: list[np.ndarray] = []
        for ci, col in enumerate(columns):
            arr = batch[col]
            chunks = arr.chunks if isinstance(arr, pa.ChunkedArray) else [arr]
            import hashlib

            vals: list[int] = []
            for c in chunks:
                c = c.cast(pa.large_string())
                n = len(c)
                if n == 0:
                    continue
                buf = c.buffers()
                off = np.frombuffer(
                    buf[1], dtype=np.int64, count=n + 1, offset=c.offset * 8
                )
                data = (
                    np.frombuffer(buf[2], dtype=np.uint8)
                    if buf[2] is not None
                    else np.zeros(0, np.uint8)
                )
                db = data.tobytes()
                null_mask = np.asarray(c.is_null())
                for i in range(n):
                    if null_mask[i]:
                        continue
                    vals.append(
                        int.from_bytes(
                            hashlib.sha256(db[off[i] : off[i + 1]]).digest()[:8],
                            "little",
                        )
                        & 0x7FFFFFFFFFFFFFFF
                    )
            h = np.unique(np.asarray(vals, dtype=np.int64))
            cols.append(np.full(h.shape[0], ci, dtype=np.int64))
            hs.append(h)
        ci_all = np.concatenate(cols) if cols else np.zeros(0, np.int64)
        h_all = np.concatenate(hs) if hs else np.zeros(0, np.int64)
        return pa.table(
            {
                "col_id": pa.array(ci_all),
                "h": pa.array(h_all),
                "part": pa.array(h_all % partitions),
            }
        )

    def distinct_count(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "column": pa.nulls(0, pa.string()),
                "kind": pa.nulls(0, pa.int64()),
                "a": pa.nulls(0, pa.int64()),
                "b": pa.nulls(0, pa.int64()),
                "c": pa.nulls(0, pa.int64()),
                "d": pa.nulls(0, pa.int64()),
                "e": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "col_id" not in group.column_names:
            return empty
        ci = group["col_id"].to_numpy(zero_copy_only=False)
        h = group["h"].to_numpy(zero_copy_only=False)
        # distinct (col, hash) pairs within this hash partition are
        # globally distinct: sum across partitions = exact global count
        pairs = np.unique(np.stack((ci, h), axis=1), axis=0)
        uci, cnt = np.unique(pairs[:, 0], return_counts=True)
        return pa.table(
            {
                "column": pa.array([columns[int(i)] for i in uci], type=pa.string()),
                "kind": pa.array(np.ones(uci.shape[0], dtype=np.int64)),
                "a": pa.array(cnt.astype(np.int64)),
                "b": pa.array(np.zeros(uci.shape[0], dtype=np.int64)),
                "c": pa.array(np.zeros(uci.shape[0], dtype=np.int64)),
                "d": pa.array(np.zeros(uci.shape[0], dtype=np.int64)),
                "e": pa.array(np.zeros(uci.shape[0], dtype=np.int64)),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "column": pa.nulls(0, pa.string()),
                "n_rows": pa.nulls(0, pa.int64()),
                "n_null": pa.nulls(0, pa.int64()),
                "n_distinct": pa.nulls(0, pa.int64()),
                "min_len": pa.nulls(0, pa.int64()),
                "max_len": pa.nulls(0, pa.int64()),
                "sum_len": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "kind" not in group.column_names:
            return empty
        kind = group["kind"].to_numpy(zero_copy_only=False)
        a = group["a"].to_numpy(zero_copy_only=False)
        b = group["b"].to_numpy(zero_copy_only=False)
        c = group["c"].to_numpy(zero_copy_only=False)
        d = group["d"].to_numpy(zero_copy_only=False)
        e = group["e"].to_numpy(zero_copy_only=False)
        s = kind == 0
        n_rows = int(a[s].sum())
        n_null = int(b[s].sum())
        min_len = int(c[s].min()) if s.any() else 0
        max_len = int(d[s].max()) if s.any() else 0
        if n_rows == n_null:
            # every value null: no batch contributed a real length, so the
            # empty-batch sentinels (int64 max / -1) would leak through.
            # Clamp to 0 (SQL's min(length)/max(length) would be NULL).
            min_len = 0
            max_len = 0
        return pa.table(
            {
                "column": pa.array([group["column"][0].as_py()], type=pa.string()),
                "n_rows": pa.array([n_rows], type=pa.int64()),
                "n_null": pa.array([n_null], type=pa.int64()),
                "n_distinct": pa.array([int(a[~s].sum())], type=pa.int64()),
                "min_len": pa.array([min_len], type=pa.int64()),
                "max_len": pa.array([max_len], type=pa.int64()),
                "sum_len": pa.array([int(e[s].sum())], type=pa.int64()),
            }
        )

    stats = ds.map_batches(stats_partial, batch_format="pyarrow")
    distinct = (
        ds.map_batches(distinct_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(distinct_count, batch_format="pyarrow")
    )
    return (
        stats.union(distinct)
        .groupby("column")
        .map_groups(merge, batch_format="pyarrow")
    )
