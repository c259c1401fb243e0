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


def corpus_expectations(ds, id_col: str = "doc_id", text_col: str = "content"):
    """Data-validation over a corpus Dataset (the Great-Expectations
    shape, job-CLI surface of queries.documents_expectations): per-rule
    violation counts, uniqueness included.

    Rules: ``id_col`` unique; ``text_col`` non-null; ``text_col``
    non-empty; lang non-empty (when present); path non-empty (when
    present).

    Physical plan: per-row rules fold to ONE partial row per batch;
    uniqueness ships per-batch distinct (id, count) partials tagged
    rule=NULL through an id%P exchange (16 B/distinct-id).  One union
    schema, one groupby, constant tail."""
    import pyarrow.compute as pc
    import ray.data  # noqa: F401

    P = 16

    EMPTY = pa.table(
        {
            "rule": pa.nulls(0, pa.large_string()),
            "a": pa.nulls(0, pa.int64()),
            "b": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def rowrules(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or id_col not in batch.column_names:
            return EMPTY
        text = batch[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        isnull = pc.is_null(text).to_numpy(zero_copy_only=False)
        tlen = pc.utf8_length(pc.fill_null(text, "")).to_numpy(
            zero_copy_only=False
        )
        rules = [f"{text_col}_nonnull", f"{text_col}_nonempty"]
        viols = [int(isnull.sum()), int((isnull | (tlen == 0)).sum())]
        for extra in ("lang", "path"):
            if extra in batch.column_names:
                col = batch[extra]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                bad = int(
                    pc.sum(
                        pc.or_(
                            pc.is_null(col),
                            pc.equal(pc.fill_null(col, ""), ""),
                        )
                    ).as_py()
                    or 0
                )
                rules.append(f"{extra}_nonempty")
                viols.append(bad)
        return pa.table(
            {
                "rule": pa.array(rules, type=pa.large_string()),
                "a": pa.array([0] * len(rules), type=pa.int64()),
                "b": pa.array(viols, type=pa.int64()),
                "part": pa.array(list(range(len(rules))), type=pa.int64()),
            }
        )

    def id_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or id_col not in batch.column_names:
            return EMPTY
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        uk, cnt = np.unique(ids, return_counts=True)
        return pa.table(
            {
                "rule": pa.nulls(uk.shape[0], pa.large_string()),
                "a": pa.array(uk),
                "b": pa.array(cnt.astype(np.int64)),
                "part": pa.array(uk % P + 8),  # offset past rowrule parts
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "rule": pa.nulls(0, pa.large_string()),
                "v": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "rule" not in group.column_names:
            return empty
        rules = np.asarray(group["rule"].to_pylist(), dtype=object)
        a = group["a"].to_numpy(zero_copy_only=False)
        b = group["b"].to_numpy(zero_copy_only=False)
        isid = np.asarray([r is None for r in rules], dtype=bool)
        out_rules, out_v = [], []
        if isid.any():
            ids, n = a[isid].astype(np.int64), b[isid].astype(np.int64)
            uk, inv = np.unique(ids, return_inverse=True)
            tot = np.zeros(uk.shape[0], dtype=np.int64)
            np.add.at(tot, inv, n)
            out_rules.append(f"{id_col}_unique")
            out_v.append(int((tot - 1).sum()))
        if (~isid).any():
            rl = rules[~isid].astype(str)
            v = b[~isid].astype(np.int64)
            ur, inv = np.unique(rl, return_inverse=True)
            tot = np.zeros(ur.shape[0], dtype=np.int64)
            np.add.at(tot, inv, v)
            out_rules.extend(ur.tolist())
            out_v.extend(tot.tolist())
        return pa.table(
            {
                "rule": pa.array(out_rules, type=pa.large_string()),
                "v": pa.array(out_v, type=pa.int64()),
            }
        )

    def final(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "rule": pa.nulls(0, pa.large_string()),
                "n_violations": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "rule" not in batch.column_names:
            return empty
        rules = np.asarray(batch["rule"].to_pylist(), dtype=object)
        keep = np.asarray([r is not None for r in rules], dtype=bool)
        if not keep.any():
            return empty
        rules = rules[keep].astype(str)
        v = batch["v"].to_numpy(zero_copy_only=False)[keep].astype(np.int64)
        ur, inv = np.unique(rules, return_inverse=True)
        tot = np.zeros(ur.shape[0], dtype=np.int64)
        np.add.at(tot, inv, v)
        return pa.table(
            {
                "rule": pa.array(ur.tolist(), type=pa.large_string()),
                "n_violations": pa.array(tot),
            }
        )

    rows = ds.map_batches(rowrules, batch_format="pyarrow")
    ids = ds.map_batches(id_partial, batch_format="pyarrow")
    return (
        rows.union(ids)
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )
