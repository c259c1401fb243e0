"""Time-series / event-sequence operators: interval union, Markov
transition counts, retention cohorts, fixed-grid resample with
forward-fill.

All four share one distributed shape: a single ``key % P`` exchange
co-locates each entity's full event history, then a VECTORIZED
per-partition kernel (lexsort + segment boundaries + cumsum/reduceat)
answers the sequence question with zero Python-per-row work.  Outputs
are skinny (per-key or per-pair aggregates), so nothing wide ever
leaves a partition.  These are the session/window analogs of the
reference's phrase-sequence machinery (reference: near_dupe.c builds
per-name token sequences before keying; here the "sequence" is an
entity's time-ordered events) re-expressed Ray-Data-first.

Integer discipline (CLAUDE.md): every exchanged key is non-negative
int64; time is integer microseconds end-to-end so all arithmetic is
exact and associative regardless of Ray's block splits.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

__all__ = [
    "interval_union",
    "transition_counts",
    "retention_cohorts",
    "grid_ffill",
]


def _i64(col: pa.ChunkedArray) -> np.ndarray:
    return col.to_numpy(zero_copy_only=False).astype(np.int64)


def _ts_us(col: pa.ChunkedArray) -> np.ndarray:
    """timestamp[us] (or int64) column -> int64 microseconds."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_timestamp(arr.type):
        arr = arr.cast(pa.int64())
    return arr.to_numpy(zero_copy_only=False).astype(np.int64)


# ---------------------------------------------------------------------------
# interval union (merge overlapping/touching intervals per key)
# ---------------------------------------------------------------------------


def _sweep_merge(k: np.ndarray, s: np.ndarray, e: np.ndarray):
    """Endpoint sweep over (key, [s,e)) intervals sorted per key.

    Returns (starts_mask_rows, ends_mask_rows, order arrays) needed by
    both the partial (emit merged intervals) and final (count + length)
    kernels.  Starts sort BEFORE ends at equal time, so touching
    intervals (end == next start) merge — matching the SQL oracle's
    ``s <= max(prev e)`` island rule."""
    n = k.shape[0]
    t = np.concatenate((s, e))
    delta = np.concatenate((np.ones(n, np.int64), np.full(n, -1, np.int64)))
    kk = np.concatenate((k, k))
    order = np.lexsort((-delta, t, kk))
    t, delta, kk = t[order], delta[order], kk[order]
    is_start = np.concatenate(([True], kk[1:] != kk[:-1]))
    cs = np.cumsum(delta)
    seg_id = np.cumsum(is_start) - 1
    start_idx = np.flatnonzero(is_start)
    base = np.where(start_idx > 0, cs[start_idx - 1], 0)
    active = cs - base[seg_id]
    became = (delta == 1) & (active == 1)
    closed = (delta == -1) & (active == 0)
    return t, kk, active, became, closed, is_start, start_idx


def _merged_intervals(k: np.ndarray, s: np.ndarray, e: np.ndarray):
    """Collapse (key, s, e) intervals to their per-key merged runs."""
    if k.shape[0] == 0:
        z = np.zeros(0, np.int64)
        return z, z, z
    t, kk, _active, became, closed, _is_start, _ = _sweep_merge(k, s, e)
    ms, me = t[became], t[closed]
    return kk[became], ms, me


def interval_union(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    span_us: int,
    parts: int = 32,
) -> ray.data.Dataset:
    """Per-key union of fixed-span intervals [ts, ts + span_us):
    (key, n_busy merged runs, busy_us total covered time).

    Merged runs compose ASSOCIATIVELY, so each input batch collapses its
    own intervals BEFORE the exchange — the shuffle ships merged
    (key, s, e) runs (<= rows, typically far fewer), never raw events.
    The per-partition kernel repeats the same endpoint sweep and reduces
    with np.add.reduceat.  Exchange = 24 B per surviving run."""

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "key": pa.nulls(0, pa.int64()),
                "s": pa.nulls(0, pa.int64()),
                "e": pa.nulls(0, pa.int64()),
                "part": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or key_col not in batch.column_names:
            return empty
        k = _i64(batch[key_col])
        s = _ts_us(batch[ts_col])
        mk, ms, me = _merged_intervals(k, s, s + np.int64(span_us))
        return pa.table(
            {
                "key": pa.array(mk),
                "s": pa.array(ms),
                "e": pa.array(me),
                "part": pa.array(mk % parts),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "key": pa.nulls(0, pa.int64()),
                "n_busy": pa.nulls(0, pa.int64()),
                "busy_us": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "key" not in group.column_names:
            return empty
        k = _i64(group["key"])
        s = _i64(group["s"])
        e = _i64(group["e"])
        mk, ms, me = _merged_intervals(k, s, e)
        if mk.shape[0] == 0:
            return empty
        is_start = np.concatenate(([True], mk[1:] != mk[:-1]))
        seg = np.flatnonzero(is_start)
        keys = mk[seg]
        n_busy = np.diff(np.concatenate((seg, [mk.shape[0]])))
        busy = np.add.reduceat(me - ms, seg) if mk.shape[0] else np.zeros(0, np.int64)
        return pa.table(
            {
                "key": pa.array(keys),
                "n_busy": pa.array(n_busy.astype(np.int64)),
                "busy_us": pa.array(busy.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(final, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Markov transition counts
# ---------------------------------------------------------------------------


def transition_counts(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    label_col: str,
    tiebreak_col: str,
    parts: int = 32,
    out_parts: int = 8,
) -> ray.data.Dataset:
    """First-order Markov transition matrix over each key's time-ordered
    label sequence: (prev_label, next_label, n) counts, ordering ties on
    equal timestamps broken by ``tiebreak_col`` (deterministic — Ray's
    block splits never change the sequence).

    Stage 1 co-locates sequences (key%P, ships key/ts/tiebreak/label);
    stage 2 factorizes labels per partition (np.unique) and bincounts
    pair codes — O(n log n) per partition, output <= |labels|^2 skinny
    rows; stage 3 sums the tiny per-partition matrices."""

    def exchange(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "key": pa.nulls(0, pa.int64()),
                "ts": pa.nulls(0, pa.int64()),
                "tb": pa.nulls(0, pa.int64()),
                "label": pa.nulls(0, pa.string()),
                "part": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or key_col not in batch.column_names:
            return empty
        k = _i64(batch[key_col])
        return pa.table(
            {
                "key": pa.array(k),
                "ts": pa.array(_ts_us(batch[ts_col])),
                "tb": pa.array(_i64(batch[tiebreak_col])),
                "label": batch[label_col].cast(pa.string()),
                "part": pa.array(k % parts),
            }
        )

    def pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "prev_label": pa.nulls(0, pa.string()),
                "next_label": pa.nulls(0, pa.string()),
                "n": pa.nulls(0, pa.int64()),
                "g": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "key" not in group.column_names:
            return empty
        k = _i64(group["key"])
        ts = _i64(group["ts"])
        tb = _i64(group["tb"])
        labels = np.asarray(group["label"].to_pylist(), dtype=object)
        uniq, codes = np.unique(labels.astype(str), return_inverse=True)
        order = np.lexsort((tb, ts, k))
        ks, cs = k[order], codes[order]
        same = ks[1:] == ks[:-1]
        prev_c = cs[:-1][same]
        next_c = cs[1:][same]
        if prev_c.shape[0] == 0:
            return empty
        L = uniq.shape[0]
        pair = prev_c.astype(np.int64) * L + next_c
        cnt = np.bincount(pair, minlength=L * L)
        nz = np.flatnonzero(cnt)
        pl = uniq[(nz // L)]
        nl = uniq[(nz % L)]
        # partition the tiny matrix for the final sum by a key derived
        # from the label STRINGS (local np.unique codes differ across
        # partitions — hashing them would split one pair over two final
        # groups and emit duplicate rows); crc32 over <=|labels|^2 rows
        # is driver-free and deterministic
        import zlib

        g = np.asarray(
            [zlib.crc32((a + "\x01" + b).encode()) for a, b in zip(pl, nl)],
            dtype=np.int64,
        ) % out_parts
        return pa.table(
            {
                "prev_label": pa.array(pl.astype(object), type=pa.string()),
                "next_label": pa.array(nl.astype(object), type=pa.string()),
                "n": pa.array(cnt[nz].astype(np.int64)),
                "g": pa.array(g.astype(np.int64)),
            }
        )

    def combine(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "prev_label": pa.nulls(0, pa.string()),
                "next_label": pa.nulls(0, pa.string()),
                "n": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "prev_label" not in group.column_names:
            return empty
        pl = np.asarray(group["prev_label"].to_pylist(), dtype=object).astype(str)
        nl = np.asarray(group["next_label"].to_pylist(), dtype=object).astype(str)
        n = _i64(group["n"])
        # \x01 separator: numpy U-arrays strip trailing \x00 (CLAUDE.md)
        comp = np.char.add(np.char.add(pl, "\x01"), nl)
        uniq, inv = np.unique(comp, return_inverse=True)
        tot = np.bincount(inv, weights=n.astype(np.float64)).astype(np.int64)
        split = np.char.partition(uniq, "\x01")
        return pa.table(
            {
                "prev_label": pa.array(split[:, 0].astype(object), type=pa.string()),
                "next_label": pa.array(split[:, 2].astype(object), type=pa.string()),
                "n": pa.array(tot),
            }
        )

    return (
        ds.map_batches(exchange, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby("g")
        .map_groups(combine, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# retention cohorts
# ---------------------------------------------------------------------------


def retention_cohorts(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    bucket_us: int,
    parts: int = 32,
    out_parts: int = 8,
) -> ray.data.Dataset:
    """Cohort retention matrix: cohort = each key's FIRST activity
    bucket; output (cohort_bucket, active_bucket, n_keys) — how many
    keys first seen in bucket c were active in bucket a.

    Per-batch partial: distinct (key, bucket) pairs only (np.unique on a
    composite int), so the key%P exchange ships at most one row per
    (key, bucket) per batch.  The partition kernel derives cohorts
    (segment min) and counts (cohort, bucket) pairs; a tiny second agg
    sums across partitions.  Bucket indexes are int64 bucket counts
    since epoch — exact, timezone-free."""

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "key": pa.nulls(0, pa.int64()),
                "bucket": pa.nulls(0, pa.int64()),
                "part": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or key_col not in batch.column_names:
            return empty
        k = _i64(batch[key_col])
        b = np.floor_divide(_ts_us(batch[ts_col]), np.int64(bucket_us))
        # distinct (key, bucket) via lexsort-run dedup (no composite int
        # — sparse keys x bucket span could overflow one)
        order = np.lexsort((b, k))
        ks, bs = k[order], b[order]
        keep = np.concatenate(([True], (ks[1:] != ks[:-1]) | (bs[1:] != bs[:-1])))
        return pa.table(
            {
                "key": pa.array(ks[keep]),
                "bucket": pa.array(bs[keep]),
                "part": pa.array(ks[keep] % parts),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cohort_bucket": pa.nulls(0, pa.int64()),
                "active_bucket": pa.nulls(0, pa.int64()),
                "n_keys": pa.nulls(0, pa.int64()),
                "g": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "key" not in group.column_names:
            return empty
        k = _i64(group["key"])
        b = _i64(group["bucket"])
        order = np.lexsort((b, k))
        ks, bs = k[order], b[order]
        is_start = np.concatenate(([True], ks[1:] != ks[:-1]))
        seg_id = np.cumsum(is_start) - 1
        cohort = bs[np.flatnonzero(is_start)][seg_id]  # per-row segment min
        # distinct (key, bucket) within the partition (batches overlap)
        keep = np.concatenate(([True], (ks[1:] != ks[:-1]) | (bs[1:] != bs[:-1])))
        cohort, bs = cohort[keep], bs[keep]
        bmin = min(cohort.min(), bs.min()) if bs.shape[0] else 0
        span = int(max(cohort.max(), bs.max()) - bmin + 1) if bs.shape[0] else 1
        code = (cohort - bmin) * span + (bs - bmin)
        uniq, inv = np.unique(code, return_inverse=True)
        cnt = np.bincount(inv)
        co = uniq // span + bmin
        ab = uniq % span + bmin
        return pa.table(
            {
                "cohort_bucket": pa.array(co.astype(np.int64)),
                "active_bucket": pa.array(ab.astype(np.int64)),
                "n_keys": pa.array(cnt.astype(np.int64)),
                "g": pa.array((uniq % out_parts).astype(np.int64)),
            }
        )

    def combine(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cohort_bucket": pa.nulls(0, pa.int64()),
                "active_bucket": pa.nulls(0, pa.int64()),
                "n_keys": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "cohort_bucket" not in group.column_names:
            return empty
        co = _i64(group["cohort_bucket"])
        ab = _i64(group["active_bucket"])
        n = _i64(group["n_keys"])
        bmin = min(co.min(), ab.min())
        span = int(max(co.max(), ab.max()) - bmin + 1)
        code = (co - bmin) * span + (ab - bmin)
        uniq, inv = np.unique(code, return_inverse=True)
        tot = np.bincount(inv, weights=n.astype(np.float64)).astype(np.int64)
        return pa.table(
            {
                "cohort_bucket": pa.array(uniq // span + bmin),
                "active_bucket": pa.array(uniq % span + bmin),
                "n_keys": pa.array(tot),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .groupby("g")
        .map_groups(combine, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# fixed-grid resample with forward-fill
# ---------------------------------------------------------------------------


def grid_ffill(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_us: int,
    parts: int = 32,
) -> ray.data.Dataset:
    """Resample each key's irregular series onto a fixed grid with
    forward-fill (gap filling): grid points h*step in
    [ceil(min ts / step), floor(max ts / step)] per key, value = value
    at the LATEST observation with ts <= grid point (ties at one ts
    resolved to max(value) — a selection, never arithmetic, so the
    float survives bit-exact).

    The fill is a MERGE, not a search: events and grid points
    concatenate, lexsort by (key, t, is_grid) puts each observation
    before any grid point it serves, and one np.maximum.accumulate over
    observation indexes forward-fills.  The first row of every key's
    run is an observation by construction (grid starts at ceil of the
    key's min ts), so stale fill can never cross a key boundary — no
    composite keys, no int64-overflow exposure at any partition size.
    Exchange = 24 B/observation; output = grid rows only."""

    step = np.int64(step_us)

    def exchange(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "key": pa.nulls(0, pa.int64()),
                "t": pa.nulls(0, pa.int64()),
                "v": pa.nulls(0, pa.float64()),
                "part": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or key_col not in batch.column_names:
            return empty
        k = _i64(batch[key_col])
        t = _ts_us(batch[ts_col])
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        # per-batch dedup (key, t) -> max v: lexsort then last of run
        order = np.lexsort((v, t, k))
        ks, ts_, vs = k[order], t[order], v[order]
        last = np.concatenate(((ks[1:] != ks[:-1]) | (ts_[1:] != ts_[:-1]), [True]))
        return pa.table(
            {
                "key": pa.array(ks[last]),
                "t": pa.array(ts_[last]),
                "v": pa.array(vs[last]),
                "part": pa.array(ks[last] % parts),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "key": pa.nulls(0, pa.int64()),
                "grid_idx": pa.nulls(0, pa.int64()),
                "v": pa.nulls(0, pa.float64()),
            }
        )
        if group.num_rows == 0 or "key" not in group.column_names:
            return empty
        k = _i64(group["key"])
        t = _i64(group["t"])
        v = group["v"].to_numpy(zero_copy_only=False).astype(np.float64)
        # re-dedup (key, t) -> max v across batches
        order = np.lexsort((v, t, k))
        k, t, v = k[order], t[order], v[order]
        last = np.concatenate(((k[1:] != k[:-1]) | (t[1:] != t[:-1]), [True]))
        k, t, v = k[last], t[last], v[last]
        # per-key grid bounds (rows already key-sorted)
        is_start = np.concatenate(([True], k[1:] != k[:-1]))
        seg = np.flatnonzero(is_start)
        seg_end = np.concatenate((seg[1:], [k.shape[0]])) - 1
        lo = -(-t[seg] // step)  # ceil
        hi = t[seg_end] // step  # floor
        m = np.maximum(hi - lo + 1, 0)
        total = int(m.sum())
        if total == 0:
            return empty
        gkey = np.repeat(k[seg], m)
        base = np.repeat(np.cumsum(m) - m, m)
        gidx = np.repeat(lo, m) + (np.arange(total) - base)
        # merge observations and grid points; obs first at equal time
        mk = np.concatenate((k, gkey))
        mt = np.concatenate((t, gidx * step))
        is_grid = np.concatenate(
            (np.zeros(k.shape[0], np.int8), np.ones(total, np.int8))
        )
        src = np.concatenate(
            (np.arange(k.shape[0], dtype=np.int64), np.full(total, -1, np.int64))
        )
        order = np.lexsort((is_grid, mt, mk))
        fill = np.maximum.accumulate(src[order])
        grid_rows = is_grid[order] == 1
        return pa.table(
            {
                "key": pa.array(mk[order][grid_rows]),
                "grid_idx": pa.array((mt[order][grid_rows] // step).astype(np.int64)),
                "v": pa.array(v[fill[grid_rows]]),
            }
        )

    return (
        ds.map_batches(exchange, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def trigram_counts(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    label_col: str,
    tiebreak_col: str,
    parts: int = 32,
    out_parts: int = 8,
) -> ray.data.Dataset:
    """Second-order sequence patterns: counts of each (l1, l2, l3) run
    of three consecutive labels within a key's time-ordered sequence —
    the sequence-mining big sibling of ``transition_counts`` (same
    exchange, window width 3).  Ties on equal timestamps break by
    ``tiebreak_col``; output <= |labels|^3 skinny rows."""

    def exchange(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "key": pa.nulls(0, pa.int64()),
                "ts": pa.nulls(0, pa.int64()),
                "tb": pa.nulls(0, pa.int64()),
                "label": pa.nulls(0, pa.string()),
                "part": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or key_col not in batch.column_names:
            return empty
        k = _i64(batch[key_col])
        return pa.table(
            {
                "key": pa.array(k),
                "ts": pa.array(_ts_us(batch[ts_col])),
                "tb": pa.array(_i64(batch[tiebreak_col])),
                "label": batch[label_col].cast(pa.string()),
                "part": pa.array(k % parts),
            }
        )

    def triples(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "l1": pa.nulls(0, pa.string()),
                "l2": pa.nulls(0, pa.string()),
                "l3": pa.nulls(0, pa.string()),
                "n": pa.nulls(0, pa.int64()),
                "g": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "key" not in group.column_names:
            return empty
        k = _i64(group["key"])
        ts = _i64(group["ts"])
        tb = _i64(group["tb"])
        labels = np.asarray(group["label"].to_pylist(), dtype=object)
        uniq, codes = np.unique(labels.astype(str), return_inverse=True)
        order = np.lexsort((tb, ts, k))
        ks, cs = k[order], codes[order]
        same3 = (ks[2:] == ks[:-2]) & (ks[1:-1] == ks[:-2])
        c1 = cs[:-2][same3]
        c2 = cs[1:-1][same3]
        c3 = cs[2:][same3]
        if c1.shape[0] == 0:
            return empty
        L = np.int64(uniq.shape[0])
        tri = (c1.astype(np.int64) * L + c2) * L + c3
        ut, inv = np.unique(tri, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        l1 = uniq[(ut // (L * L))]
        l2 = uniq[(ut // L) % L]
        l3 = uniq[ut % L]
        import zlib

        g = np.asarray(
            [
                zlib.crc32((a + "\x01" + b + "\x01" + c).encode()) % out_parts
                for a, b, c in zip(l1, l2, l3)
            ],
            dtype=np.int64,
        )
        return pa.table(
            {
                "l1": pa.array(l1.astype(object), type=pa.string()),
                "l2": pa.array(l2.astype(object), type=pa.string()),
                "l3": pa.array(l3.astype(object), type=pa.string()),
                "n": pa.array(cnt),
                "g": pa.array(g),
            }
        )

    def fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "l1": pa.nulls(0, pa.string()),
                "l2": pa.nulls(0, pa.string()),
                "l3": pa.nulls(0, pa.string()),
                "n": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "l1" not in group.column_names:
            return empty
        l1 = np.asarray(group["l1"].to_pylist(), dtype=object).astype(str)
        l2 = np.asarray(group["l2"].to_pylist(), dtype=object).astype(str)
        l3 = np.asarray(group["l3"].to_pylist(), dtype=object).astype(str)
        n = _i64(group["n"])
        comp = np.char.add(
            np.char.add(np.char.add(np.char.add(l1, "\x01"), l2), "\x01"), l3
        )
        uniq, inv = np.unique(comp, return_inverse=True)
        tot = np.bincount(inv, weights=n.astype(np.float64)).astype(np.int64)
        out1, out2, out3 = [], [], []
        for c in uniq:
            a, b, d = c.split("\x01")
            out1.append(a)
            out2.append(b)
            out3.append(d)
        return pa.table(
            {
                "l1": pa.array(out1, type=pa.string()),
                "l2": pa.array(out2, type=pa.string()),
                "l3": pa.array(out3, type=pa.string()),
                "n": pa.array(tot),
            }
        )

    return (
        ds.map_batches(exchange, batch_format="pyarrow")
        .groupby("part")
        .map_groups(triples, batch_format="pyarrow")
        .groupby("g")
        .map_groups(fold, batch_format="pyarrow")
    )
