"""Relational operators Ray Data lacks natively: as-of join, range
(interval) join, sliding-window aggregate.

The reference engine has no temporal joins at all — its only join is the
dictionary-trie phrase lookup (``address_dictionary.h:62-69``) and the
``expansions_intersect`` semi-join (``dedupe.c:13-31``).  These operators
exist because a training-data pipeline needs them (event attribution,
point-in-time feature joins, windowed stream stats); they follow the same
physical discipline as the rest of the engine:

  * ONE hash exchange on ``key % P`` co-locates everything a kernel needs
    (the same partitioning layout the near-dup exchange and the
    checkpoints use) — never a global sort;
  * inside a partition the work is one ``np.lexsort`` + vectorized
    ``searchsorted`` / ``maximum.accumulate`` segment scans — one Python
    call per PARTITION, never per key/row;
  * time comparisons happen at full input precision (µs); outputs floor
    to ms only at the edge, so boundary semantics match a SQL oracle
    comparing native timestamps.

Scale posture (100 TB): both joins ship only (key, ts, payload) rows once
through a single exchange whose fan-in is ``P`` groups; skewed keys cost
one partition, not an all-to-all, and ``P`` is a knob.  The sliding window
pre-aggregates per batch BEFORE fanning out window replicas, so the
shuffle carries ``O(buckets x window/slide)`` rows, not ``O(events)``.

Hybrid crossover (same discipline as ``sig_broadcast_max`` in the
flagship): when one side is small — the usual shape for point-in-time
feature joins (big event stream x bounded dimension history) — the
exchange is the wrong plan: Ray's sort-based groupby has a multi-second
fixed cost that dwarfs the kernel on anything that fits in one worker's
heap.  Below ``broadcast_max`` rows the small side is packed ONCE into a
sorted composite-rank index in a remote task, ``ray.put``-broadcast, and
the big side streams through a stateless ``map_batches`` doing one
``searchsorted`` per batch — no shuffle at all, and the big side never
materializes.  Above the threshold the exchange plan runs unchanged.
The composite trick: rank-compress (key, ts) into ``kid * span + rank``
(both ranks bounded by small-side row count, so the product cannot
overflow int64); one sorted int64 array then answers every "latest row
<= t for key k" / "rows of key k in (a, b]" question with a single
vectorized ``searchsorted``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

__all__ = [
    "asof_join",
    "interval_count_join",
    "sliding_window_count_sum",
]

_PART = "__part"
_KEY = "__key"
_T = "__t"
_T2 = "__t2"
_SIDE = "__side"
_TB = "__tb"

# small-side row-count crossovers for the broadcast plans.  2M rows of
# (key, ts, tie, payload) int64s ~= 64 MB of broadcast state — comfortably
# inside one worker heap; raise/lower per cluster like sig_broadcast_max.
ASOF_BROADCAST_MAX = 2_000_000
INTERVAL_BROADCAST_MAX = 2_000_000


def _ts_to_us(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Timestamp/integer column -> int64 epoch microseconds."""
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.timestamp("us")).cast(pa.int64())
    elif not pa.types.is_int64(col.type):
        col = col.cast(pa.int64())
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


def _null_cols(schema: pa.Schema, names: list[str], n: int) -> dict:
    return {m: pa.nulls(n, type=schema.field(m).type) for m in names}


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: tuple[str, str],
    ts: tuple[str, str],
    tie_break: str | None = None,
    how: str = "inner",
    num_partitions: int = 32,
    broadcast_max: int = ASOF_BROADCAST_MAX,
) -> ray.data.Dataset:
    """As-of join: for each left row, the right row of the same key with
    the greatest ``right_ts <= left_ts`` (backward, exact matches allowed
    — DuckDB ``ASOF JOIN`` semantics).

    ``on=(left_key, right_key)``, ``ts=(left_ts, right_ts)``; key columns
    must be non-negative int64 (engine-wide constraint, CLAUDE.md).  All
    non-key/ts columns of both sides pass through; names must be disjoint.
    ``tie_break``: right column breaking ties among equal (key, ts) right
    rows deterministically (the MAX wins), independent of block order.
    Timestamp columns come back as int64 epoch µs (``left_ts`` under its
    own name, the matched right ts as ``<right_ts>_matched``).

    Physical plan: right side under ``broadcast_max`` rows -> broadcast
    composite-rank index + stateless left-side ``map_batches`` (no
    shuffle; the left side streams).  Otherwise: tag each side, union,
    ONE groupby on ``key % P``; the per-partition kernel is a single
    lexsort + ``maximum.accumulate`` of right-row indices (the classic
    vectorized as-of merge) — no per-key calls, no global sort.  Payload
    gathers use Arrow ``take`` so any column type (incl. list/binary)
    rides along zero-conversion.  ``broadcast_max=0`` forces the exchange
    plan (both-sides-huge shape; also how the equivalence tests pin it).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how={how!r}")
    lk, rk = on
    lt, rt = ts
    ls, rs = left.schema().base_schema, right.schema().base_schema
    lpay = [n for n in ls.names if n != lk and n != lt]
    rpay = [n for n in rs.names if n != rk and n != rt]
    clash = set(lpay) & set(rpay)
    if clash:
        raise ValueError(f"payload column collision: {sorted(clash)}")
    if broadcast_max:
        # bounded plan probe, ONE read: materialize limit(max+1) (early-stop
        # streaming pins at most one extra block of a huge right), count from
        # block metadata (free), and when the limit did NOT truncate the
        # probe IS the whole right side — reuse it for the broadcast build
        # instead of re-executing the right-side read
        probe = right.limit(broadcast_max + 1).materialize()
        if probe.count() <= broadcast_max:
            return _asof_broadcast(
                left, probe, lk=lk, rk=rk, lt=lt, rt=rt,
                tie_break=tie_break, how=how, rs=rs, lpay=lpay, rpay=rpay,
            )
    P = num_partitions

    def tag_left(batch: pa.Table) -> pa.Table:
        k = batch[lk].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        cols = {
            _PART: pa.array(k % P, type=pa.int64()),
            _KEY: pa.array(k, type=pa.int64()),
            _T: pa.array(_ts_to_us(batch[lt]), type=pa.int64()),
            _SIDE: pa.array(np.ones(batch.num_rows, np.int8)),
            _TB: pa.array(np.zeros(batch.num_rows, np.int64)),
        }
        for m in lpay:
            cols[m] = batch[m]
        cols.update(_null_cols(rs, rpay, batch.num_rows))
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        k = batch[rk].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        n = batch.num_rows
        tb = (
            batch[tie_break].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
            if tie_break
            else np.zeros(n, np.int64)
        )
        cols = {
            _PART: pa.array(k % P, type=pa.int64()),
            _KEY: pa.array(k, type=pa.int64()),
            _T: pa.array(_ts_to_us(batch[rt]), type=pa.int64()),
            _SIDE: pa.array(np.zeros(n, np.int8)),
            _TB: pa.array(tb),
        }
        cols.update(_null_cols(ls, lpay, n))
        for m in rpay:
            cols[m] = batch[m]
        return pa.table(cols)

    def _empty_out() -> pa.Table:
        cols = {lk: pa.nulls(0, pa.int64()), lt: pa.nulls(0, pa.int64())}
        for m in lpay:
            cols[m] = pa.nulls(0, ls.field(m).type)
        cols[rt + "_matched"] = pa.nulls(0, pa.int64())
        for m in rpay:
            cols[m] = pa.nulls(0, rs.field(m).type)
        return pa.table(cols)

    def kernel(group: pa.Table) -> pa.Table:
        # empty groups arrive schema-less from the shuffle — emit typed empty
        if group.num_rows == 0 or _KEY not in group.column_names:
            return _empty_out()
        k = group[_KEY].to_numpy(zero_copy_only=False)
        t = group[_T].to_numpy(zero_copy_only=False)
        side = group[_SIDE].to_numpy(zero_copy_only=False)  # 1=left 0=right
        tb = group[_TB].to_numpy(zero_copy_only=False)
        # rights before lefts at equal (key, ts) — exact matches visible;
        # among right ties, tie_break ASC so accumulate picks the MAX
        order = np.lexsort((tb, side, t, k))
        ks, sides = k[order], side[order]
        n = order.shape[0]
        ridx = np.where(sides == 0, np.arange(n, dtype=np.int64), -1)
        last = np.maximum.accumulate(ridx)
        is_left = sides == 1
        matched = is_left & (last >= 0)
        matched[matched] &= ks[last[matched]] == ks[matched]
        keep = matched if how == "inner" else is_left
        li = order[keep]  # original positions of kept left rows
        out = {
            lk: pa.array(k[li], type=pa.int64()),
            lt: pa.array(t[li], type=pa.int64()),
        }
        for m in lpay:
            out[m] = group[m].take(pa.array(li, type=pa.int64()))
        # right original positions; -1 (unmatched, how="left") -> null take
        rpos = np.full(int(keep.sum()), -1, dtype=np.int64)
        mk = matched[keep]
        rpos[mk] = order[last[keep][mk]]
        rtake = pa.array(rpos, type=pa.int64(), mask=rpos < 0)
        out[rt + "_matched"] = group[_T].take(rtake)
        for m in rpay:
            out[m] = group[m].take(rtake)
        return pa.table(out)

    lu = left.map_batches(tag_left, batch_format="pyarrow")
    ru = right.map_batches(tag_right, batch_format="pyarrow")
    return lu.union(ru).groupby(_PART).map_groups(kernel, batch_format="pyarrow")


def composite_rank_index(
    k: np.ndarray, ts_: np.ndarray, tb: np.ndarray | None = None
) -> dict:
    """The PURE index-build kernel shared by both broadcast plans (and
    bound directly by the hypothesis property tests, so production code is
    what the 300-example suites exercise): rows lexsorted by
    (key, ts[, tie]); ``comp = kid*span + rank(ts)`` with ``kid`` the key's
    index in the sorted unique keys, ``rank(ts)`` its 1-based right-rank
    among unique timestamps, ``span = |uts|+1``.  ``comp`` is
    non-decreasing and key-blocked, so range/as-of probes are single
    ``searchsorted`` calls.  Returns ``order`` so callers can gather
    payload columns in index order."""
    order = (
        np.lexsort((tb, ts_, k)) if tb is not None else np.lexsort((ts_, k))
    )
    ks, tss = k[order], ts_[order]
    uk, ut = np.unique(ks), np.unique(tss)
    span = np.int64(ut.shape[0] + 1)
    # both ranks bounded by the broadcast row count -> no overflow
    assert int(uk.shape[0]) * int(span) < 2**62
    comp = (
        np.searchsorted(uk, ks).astype(np.int64) * span
        + np.searchsorted(ut, tss, side="right").astype(np.int64)
    )
    return {"uk": uk, "ut": ut, "span": span, "comp": comp, "ts": tss, "order": order}


def asof_probe(st: dict, k: np.ndarray, t: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Pure as-of probe against a composite_rank_index: (matched, pos)
    where pos indexes the index's sorted rows (latest right row with
    ts <= t for the same key; equal-(key,ts) ties resolved to the max
    tie_break because the lexsort put it last)."""
    uk, ut, span, comp = st["uk"], st["ut"], st["span"], st["comp"]
    kid = np.searchsorted(uk, k)
    kidc = np.clip(kid, 0, uk.shape[0] - 1).astype(np.int64)
    key_ok = (kid < uk.shape[0]) & (uk[kidc] == k)
    comp_l = kidc * span + np.searchsorted(ut, t, side="right").astype(np.int64)
    pos = np.searchsorted(comp, comp_l, side="right") - 1
    matched = key_ok & (pos >= 0)
    if matched.any():
        matched[matched] &= (comp[pos[matched]] // span) == kidc[matched]
    return matched, pos


def interval_count_probe(
    st: dict,
    ik: np.ndarray,
    it: np.ndarray,
    window_us: int,
    lo_side: str,
) -> tuple[np.ndarray, np.ndarray]:
    """Pure interval-count probe against a composite_rank_index:
    (cnt, first_ts) per interval — two searchsorted calls, pairs never
    materialized.  ``lo_side="right"`` gives ``(a, a+w]``; ``"left"``
    gives ``[a, a+w]``."""
    uk, ut, span, comp = st["uk"], st["ut"], st["span"], st["comp"]
    kid = np.searchsorted(uk, ik)
    kidc = np.clip(kid, 0, uk.shape[0] - 1).astype(np.int64)
    key_ok = (kid < uk.shape[0]) & (uk[kidc] == ik)
    base = kidc * span
    lo = np.searchsorted(
        comp, base + np.searchsorted(ut, it, side=lo_side).astype(np.int64),
        side="right",
    )
    hi = np.searchsorted(
        comp,
        base + np.searchsorted(ut, it + np.int64(window_us), side="right").astype(np.int64),
        side="right",
    )
    cnt = np.where(key_ok, hi - lo, 0).astype(np.int64)
    has = cnt > 0
    first = np.zeros(ik.shape[0], dtype=np.int64)
    first[has] = st["ts"][lo[has]]
    return cnt, first


def _asof_broadcast(
    left: ray.data.Dataset,
    right_mat: ray.data.Dataset,
    *,
    lk: str,
    rk: str,
    lt: str,
    rt: str,
    tie_break: str | None,
    how: str,
    rs: pa.Schema,
    lpay: list[str],
    rpay: list[str],
) -> ray.data.Dataset:
    """Broadcast as-of plan: pack the (small) right side into one sorted
    composite-rank index in a remote task; the left side streams through a
    stateless lookup — one ``searchsorted`` per batch, no shuffle.

    Index: rows lexsorted by (key, ts, tie); ``comp = kid*span + rank(ts)``
    with ``kid`` the key's index in the sorted unique keys, ``rank(ts)``
    its 1-based rank among unique right timestamps, ``span = |uts|+1``.
    ``comp`` is non-decreasing, so "latest right row <= t for key k" is
    ``searchsorted(comp, kid*span + rank(t), "right") - 1`` — monotone
    ranks guarantee the hit's ts <= t, and equal (key, ts) ties resolve to
    the max ``tie_break`` because the lexsort put it last."""

    @ray.remote
    def build(*blocks: pa.Table):
        tabs = [b for b in blocks if b.num_rows > 0]
        if not tabs:
            return None
        t = pa.concat_tables(tabs, promote_options="default")
        k = t[rk].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        ts_ = _ts_to_us(t[rt])
        tb = (
            t[tie_break].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
            if tie_break
            else np.zeros(k.shape[0], np.int64)
        )
        order = np.lexsort((tb, ts_, k))
        ks, tss = k[order], ts_[order]
        uk, ut = np.unique(ks), np.unique(tss)
        span = np.int64(ut.shape[0] + 1)
        # both ranks bounded by the broadcast row count -> no overflow
        assert int(uk.shape[0]) * int(span) < 2**62
        comp = (
            np.searchsorted(uk, ks).astype(np.int64) * span
            + np.searchsorted(ut, tss, side="right").astype(np.int64)
        )
        pay = (
            t.select(rpay).take(pa.array(order, type=pa.int64())) if rpay else None
        )
        return {"uk": uk, "ut": ut, "span": span, "comp": comp, "ts": tss, "pay": pay}

    state_ref = build.remote(*right_mat.to_arrow_refs())

    def lookup(batch: pa.Table) -> pa.Table:
        st = ray.get(state_ref)
        n = batch.num_rows
        k = batch[lk].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        t = _ts_to_us(batch[lt])
        if st is None:
            matched = np.zeros(n, bool)
            pos = np.full(n, -1, np.int64)
        else:
            uk, ut, span, comp = st["uk"], st["ut"], st["span"], st["comp"]
            kid = np.searchsorted(uk, k)
            kidc = np.clip(kid, 0, uk.shape[0] - 1).astype(np.int64)
            key_ok = (kid < uk.shape[0]) & (uk[kidc] == k)
            comp_l = kidc * span + np.searchsorted(ut, t, side="right").astype(np.int64)
            pos = np.searchsorted(comp, comp_l, side="right") - 1
            matched = key_ok & (pos >= 0)
            if matched.any():
                matched[matched] &= (comp[pos[matched]] // span) == kidc[matched]
        keep = matched if how == "inner" else np.ones(n, bool)
        li = np.flatnonzero(keep)
        take_l = pa.array(li, type=pa.int64())
        out = {
            lk: pa.array(k[li], type=pa.int64()),
            lt: pa.array(t[li], type=pa.int64()),
        }
        for m in lpay:
            out[m] = batch[m].take(take_l)
        if st is None:
            out[rt + "_matched"] = pa.nulls(li.shape[0], pa.int64())
            for m in rpay:
                out[m] = pa.nulls(li.shape[0], rs.field(m).type)
        else:
            rpos = np.where(matched[li], pos[li], -1)
            rtake = pa.array(rpos, type=pa.int64(), mask=rpos < 0)
            out[rt + "_matched"] = pa.array(st["ts"], type=pa.int64()).take(rtake)
            for m in rpay:
                out[m] = st["pay"][m].take(rtake)
        return pa.table(out)

    return left.map_batches(lookup, batch_format="pyarrow")


def interval_count_join(
    points: ray.data.Dataset,
    intervals: ray.data.Dataset,
    *,
    point_key: str,
    point_ts: str,
    interval_key: str,
    interval_ts: str,
    window_us: int,
    closed: str = "right",
    num_partitions: int = 32,
    broadcast_max: int = INTERVAL_BROADCAST_MAX,
) -> ray.data.Dataset:
    """Range join, count form: for each interval row (anchor ts, window
    ``window_us``), count the points of the same key inside the window and
    report the earliest one.  ``closed="right"`` means the window is
    ``(ts, ts + window_us]`` (the anchor itself excluded — attribution
    semantics); ``closed="both"`` is ``[ts, ts + window_us]``.

    Output: interval payload columns + ``n_points`` + ``first_point_us``
    (int64 µs; null-free because only intervals with n_points >= 1 emit).

    Instead of materializing matched PAIRS (the O(pairs) blow-up a naive
    range join pays), the kernel answers each interval with two
    ``searchsorted`` probes over the partition's points — O((p+i) log p)
    per partition, output = intervals, never pairs.  Rank-compression of
    timestamps keeps the combined (key, ts) order encodable in int64 for
    ANY key/ts magnitude: ranks are bounded by partition row count, so
    ``key_rank * span + ts_rank`` cannot overflow.
    """
    if closed not in ("right", "both"):
        raise ValueError(f"closed={closed!r}")
    ischema = intervals.schema().base_schema
    ipay = [n for n in ischema.names if n != interval_key and n != interval_ts]
    if broadcast_max:
        # bounded plan probe, ONE read (see asof_join): the materialized
        # limit(max+1) probe doubles as the broadcast input when it did
        # not truncate
        probe = points.limit(broadcast_max + 1).materialize()
        if probe.count() <= broadcast_max:
            return _interval_broadcast(
                probe, intervals,
                point_key=point_key, point_ts=point_ts,
                interval_key=interval_key, interval_ts=interval_ts,
                window_us=window_us, closed=closed,
                ischema=ischema, ipay=ipay,
            )
    P = num_partitions

    def tag_points(batch: pa.Table) -> pa.Table:
        k = batch[point_key].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        cols = {
            _PART: pa.array(k % P, type=pa.int64()),
            _KEY: pa.array(k, type=pa.int64()),
            _T: pa.array(_ts_to_us(batch[point_ts]), type=pa.int64()),
            _SIDE: pa.array(np.zeros(batch.num_rows, np.int8)),
        }
        cols.update(_null_cols(ischema, ipay, batch.num_rows))
        return pa.table(cols)

    def tag_intervals(batch: pa.Table) -> pa.Table:
        k = batch[interval_key].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        cols = {
            _PART: pa.array(k % P, type=pa.int64()),
            _KEY: pa.array(k, type=pa.int64()),
            _T: pa.array(_ts_to_us(batch[interval_ts]), type=pa.int64()),
            _SIDE: pa.array(np.ones(batch.num_rows, np.int8)),
        }
        for m in ipay:
            cols[m] = batch[m]
        return pa.table(cols)

    def _empty_out() -> pa.Table:
        cols = {m: pa.nulls(0, ischema.field(m).type) for m in ipay}
        cols[interval_key] = pa.nulls(0, pa.int64())
        cols["n_points"] = pa.nulls(0, pa.int64())
        cols["first_point_us"] = pa.nulls(0, pa.int64())
        return pa.table(cols)

    def kernel(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or _KEY not in group.column_names:
            return _empty_out()
        k = group[_KEY].to_numpy(zero_copy_only=False)
        t = group[_T].to_numpy(zero_copy_only=False)
        side = group[_SIDE].to_numpy(zero_copy_only=False)
        isp = side == 1
        pk, pt = k[~isp], t[~isp]
        ik, it = k[isp], t[isp]
        ipos = np.flatnonzero(isp)
        lo_b, hi_b = it, it + np.int64(window_us)
        # (ts, ts+w]: lower-bound rank via side="right" puts equal-ts
        # points BELOW the bound (excluded); [ts, ts+w]: side="left"
        # makes them equal (included, since the enc probe is side="left")
        lo_rank_side = "right" if closed == "right" else "left"
        # rank-compress all timestamps so key*span+rank fits int64 always
        ut = np.unique(np.concatenate((pt, lo_b, hi_b)))
        span = np.int64(ut.shape[0] + 1)
        uk = np.unique(np.concatenate((pk, ik)))
        pkr = np.searchsorted(uk, pk).astype(np.int64)
        ikr = np.searchsorted(uk, ik).astype(np.int64)
        enc = pkr * span + np.searchsorted(ut, pt).astype(np.int64)
        po = np.argsort(enc, kind="stable")
        enc_s, pt_s = enc[po], pt[po]
        lo = np.searchsorted(
            enc_s,
            ikr * span + np.searchsorted(ut, lo_b, side=lo_rank_side).astype(np.int64),
            side="left",
        )
        hi = np.searchsorted(
            enc_s,
            ikr * span + np.searchsorted(ut, hi_b, side="right").astype(np.int64),
            side="left",
        )
        cnt = (hi - lo).astype(np.int64)
        has = cnt > 0
        first = np.zeros(ik.shape[0], dtype=np.int64)
        first[has] = pt_s[lo[has]]
        keep = np.flatnonzero(has)
        take = pa.array(ipos[keep], type=pa.int64())
        out = {m: group[m].take(take) for m in ipay}
        out[interval_key] = pa.array(ik[keep], type=pa.int64())
        out["n_points"] = pa.array(cnt[keep], type=pa.int64())
        out["first_point_us"] = pa.array(first[keep], type=pa.int64())
        return pa.table(out)

    pu = points.map_batches(tag_points, batch_format="pyarrow")
    iu = intervals.map_batches(tag_intervals, batch_format="pyarrow")
    return pu.union(iu).groupby(_PART).map_groups(kernel, batch_format="pyarrow")


def _interval_broadcast(
    points_mat: ray.data.Dataset,
    intervals: ray.data.Dataset,
    *,
    point_key: str,
    point_ts: str,
    interval_key: str,
    interval_ts: str,
    window_us: int,
    closed: str,
    ischema: pa.Schema,
    ipay: list[str],
) -> ray.data.Dataset:
    """Broadcast range-join plan: the (small) points side becomes one
    sorted composite-rank index; the intervals side streams through a
    stateless two-``searchsorted`` probe per batch — no shuffle, pairs
    never materialized (same answer-per-interval contract as the exchange
    kernel).  Bound semantics: ``(a, a+w]`` excludes points with ts <= a
    via the right-side rank of ``a``; ``[a, a+w]`` excludes only ts < a
    via its left-side rank."""

    @ray.remote
    def build(*blocks: pa.Table):
        tabs = [b for b in blocks if b.num_rows > 0]
        if not tabs:
            return None
        t = pa.concat_tables(tabs, promote_options="default")
        k = t[point_key].cast(pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        ts_ = _ts_to_us(t[point_ts])
        order = np.lexsort((ts_, k))
        ks, tss = k[order], ts_[order]
        uk, ut = np.unique(ks), np.unique(tss)
        span = np.int64(ut.shape[0] + 1)
        assert int(uk.shape[0]) * int(span) < 2**62
        comp = (
            np.searchsorted(uk, ks).astype(np.int64) * span
            + np.searchsorted(ut, tss, side="right").astype(np.int64)
        )
        return {"uk": uk, "ut": ut, "span": span, "comp": comp, "ts": tss}

    state_ref = build.remote(*points_mat.to_arrow_refs())
    lo_side = "right" if closed == "right" else "left"

    def _empty_out() -> pa.Table:
        cols = {m: pa.nulls(0, ischema.field(m).type) for m in ipay}
        cols[interval_key] = pa.nulls(0, pa.int64())
        cols["n_points"] = pa.nulls(0, pa.int64())
        cols["first_point_us"] = pa.nulls(0, pa.int64())
        return pa.table(cols)

    def lookup(batch: pa.Table) -> pa.Table:
        st = ray.get(state_ref)
        if st is None or batch.num_rows == 0:
            return _empty_out()
        ik = batch[interval_key].cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        it = _ts_to_us(batch[interval_ts])
        uk, ut, span, comp = st["uk"], st["ut"], st["span"], st["comp"]
        kid = np.searchsorted(uk, ik)
        kidc = np.clip(kid, 0, uk.shape[0] - 1).astype(np.int64)
        key_ok = (kid < uk.shape[0]) & (uk[kidc] == ik)
        base = kidc * span
        lo = np.searchsorted(
            comp, base + np.searchsorted(ut, it, side=lo_side).astype(np.int64),
            side="right",
        )
        hi = np.searchsorted(
            comp,
            base
            + np.searchsorted(ut, it + np.int64(window_us), side="right").astype(
                np.int64
            ),
            side="right",
        )
        cnt = np.where(key_ok, hi - lo, 0).astype(np.int64)
        has = cnt > 0
        first = np.zeros(ik.shape[0], dtype=np.int64)
        first[has] = st["ts"][lo[has]]
        keep = np.flatnonzero(has)
        take = pa.array(keep, type=pa.int64())
        out = {m: batch[m].take(take) for m in ipay}
        out[interval_key] = pa.array(ik[keep], type=pa.int64())
        out["n_points"] = pa.array(cnt[keep], type=pa.int64())
        out["first_point_us"] = pa.array(first[keep], type=pa.int64())
        return pa.table(out)

    return intervals.map_batches(lookup, batch_format="pyarrow")


def sliding_window_count_sum(
    ds: ray.data.Dataset,
    *,
    ts_col: str,
    value_col: str,
    window_us: int,
    slide_us: int,
) -> ray.data.Dataset:
    """Sliding-window aggregate: for every window of length ``window_us``
    starting on the ``slide_us`` grid, the row count and the sum of
    ``floor(value*100)`` cents of rows with ``window_start <= ts <
    window_start + window_us``.  Requires ``window_us % slide_us == 0``
    (window = R slide-buckets).

    Output: (window_start_ms:int64, n_events:int64, sum_value_cents:int64)
    — only non-empty windows (an empty window has no row to vote for it,
    matching the SQL formulation that derives windows from the data).

    Physical plan: per batch, collapse rows to slide-bucket partials
    (np.unique on the bucket id), THEN replicate each bucket partial into
    the R windows covering it, and finish with one small groupby-sum over
    window starts.  The exchange carries O(buckets x R) partial rows —
    independent of row count — instead of R copies of every row.
    """
    if window_us % slide_us:
        raise ValueError("window_us must be a multiple of slide_us")
    if slide_us % 1000:
        # window starts are reported in ms; a sub-ms slide would alias
        # distinct windows onto one ms-floored start
        raise ValueError("slide_us must be a multiple of 1000 (ms output)")
    R = window_us // slide_us

    def partials(batch: pa.Table) -> pa.Table:
        us = _ts_to_us(batch[ts_col])
        v = batch[value_col].combine_chunks().to_numpy(zero_copy_only=False)
        cents = np.floor(v * 100.0).astype(np.int64)
        bkt = us // np.int64(slide_us)
        ub, inv = np.unique(bkt, return_inverse=True)
        n_b = np.bincount(inv, minlength=ub.shape[0]).astype(np.int64)
        s_b = np.bincount(inv, weights=cents, minlength=ub.shape[0]).astype(np.int64)
        # replicate bucket partials into the R windows covering the bucket
        offs = np.arange(R, dtype=np.int64)
        wstart_us = (ub[:, None] - offs[None, :]).reshape(-1) * np.int64(slide_us)
        return pa.table(
            {
                "window_start_ms": pa.array(wstart_us // 1000, type=pa.int64()),
                "n_events": pa.array(np.repeat(n_b, R), type=pa.int64()),
                "sum_value_cents": pa.array(np.repeat(s_b, R), type=pa.int64()),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow")
        .groupby("window_start_ms")
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value_cents", alias_name="sum_value_cents"),
        )
    )


def interval_join_pairs(
    points: ray.data.Dataset,
    intervals: ray.data.Dataset,
    *,
    point_key: str,
    point_ts: str,
    point_id: str,
    interval_key: str,
    interval_ts: str,
    interval_id: str,
    window_us: int,
    closed: str = "right",
    num_partitions: int = 32,
    per_interval_cap: int = 1000,
) -> ray.data.Dataset:
    """Range join, PAIR form: (interval_id, point_id, gap_us) for every
    point of the same key inside each interval's window — the
    materializing sibling of interval_count_join for when downstream
    needs the actual matches, with the blow-up bounded explicitly:
    each interval emits at most ``per_interval_cap`` EARLIEST points and
    a ``truncated`` flag marks capped rows (the LSH hot-bucket
    discipline).  Same one key%P exchange + rank-compressed searchsorted
    kernel; per-partition work is O((p+i) log p + pairs_out)."""
    if closed not in ("right", "both"):
        raise ValueError(f"closed={closed!r}")
    P = num_partitions
    _RID = "__rid"

    def tag(side: int, key_c: str, ts_c: str, id_c: str):
        def fn(batch: pa.Table) -> pa.Table:
            k = (
                batch[key_c]
                .cast(pa.int64())
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
            )
            return pa.table(
                {
                    _PART: pa.array(k % P, type=pa.int64()),
                    _KEY: pa.array(k, type=pa.int64()),
                    _T: pa.array(_ts_to_us(batch[ts_c]), type=pa.int64()),
                    _SIDE: pa.array(np.full(batch.num_rows, side, np.int8)),
                    _RID: batch[id_c].cast(pa.int64()),
                }
            )

        return fn

    def _empty() -> pa.Table:
        return pa.table(
            {
                interval_id: pa.nulls(0, pa.int64()),
                point_id: pa.nulls(0, pa.int64()),
                "gap_us": pa.nulls(0, pa.int64()),
                "truncated": pa.nulls(0, pa.bool_()),
            }
        )

    lo_rank_side = "right" if closed == "right" else "left"

    def kernel(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or _KEY not in group.column_names:
            return _empty()
        k = group[_KEY].to_numpy(zero_copy_only=False)
        t = group[_T].to_numpy(zero_copy_only=False)
        side = group[_SIDE].to_numpy(zero_copy_only=False)
        rid = group[_RID].to_numpy(zero_copy_only=False)
        isp = side == 1
        pk, pt, pid = k[~isp], t[~isp], rid[~isp]
        ik, it, iid = k[isp], t[isp], rid[isp]
        if pk.shape[0] == 0 or ik.shape[0] == 0:
            return _empty()
        lo_b, hi_b = it, it + np.int64(window_us)
        ut = np.unique(np.concatenate((pt, lo_b, hi_b)))
        span = np.int64(ut.shape[0] + 1)
        uk = np.unique(np.concatenate((pk, ik)))
        pkr = np.searchsorted(uk, pk).astype(np.int64)
        ikr = np.searchsorted(uk, ik).astype(np.int64)
        enc = pkr * span + np.searchsorted(ut, pt).astype(np.int64)
        # lexsort by (enc, point_id): ties at identical (key, ts) order by
        # id, so per_interval_cap truncation is input-order-independent
        po = np.lexsort((pid, enc))
        enc_s, pt_s, pid_s = enc[po], pt[po], pid[po]
        lo = np.searchsorted(
            enc_s,
            ikr * span
            + np.searchsorted(ut, lo_b, side=lo_rank_side).astype(np.int64),
            side="left",
        )
        hi = np.searchsorted(
            enc_s,
            ikr * span + np.searchsorted(ut, hi_b, side="right").astype(np.int64),
            side="left",
        )
        cnt = (hi - lo).astype(np.int64)
        emit = np.minimum(cnt, per_interval_cap)
        total = int(emit.sum())
        if total == 0:
            return _empty()
        # vectorized pair expansion: for interval j, point positions are
        # lo[j] .. lo[j]+emit[j]-1 in the sorted-point order (earliest
        # first — points sort by (key, ts) within the encoding)
        j = np.repeat(np.arange(ik.shape[0], dtype=np.int64), emit)
        offs = np.concatenate(([0], np.cumsum(emit)[:-1]))
        pos = lo[j] + (np.arange(total, dtype=np.int64) - offs[j])
        return pa.table(
            {
                interval_id: pa.array(iid[j], type=pa.int64()),
                point_id: pa.array(pid_s[pos], type=pa.int64()),
                "gap_us": pa.array(pt_s[pos] - it[j], type=pa.int64()),
                "truncated": pa.array((cnt > per_interval_cap)[j]),
            }
        )

    tagged = points.map_batches(
        tag(0, point_key, point_ts, point_id), batch_format="pyarrow"
    ).union(
        intervals.map_batches(
            tag(1, interval_key, interval_ts, interval_id),
            batch_format="pyarrow",
        )
    )
    return tagged.groupby(_PART).map_groups(kernel, batch_format="pyarrow")
