"""Mergeable quantile sketch (MRL/KLL-family, deterministic compaction).

Completes the §2.5 sketch family (bloom membership, HLL cardinality,
Misra-Gries heavy hitters, MinHash/SimHash similarity) with the rank
member: approximate quantiles whose state is O(k log n) floats, built per
batch and merged associatively — at 100 TB the exchange carries one
~k·log(n)·8 B sketch row per (batch, group) instead of every value, where
exact quantiles need a full sort or per-group value gather
(priority_price_quantiles is the exact counterpart).

Structure (Manku-Rajagopalan-Lindsay compaction, the KLL shape without
randomized samplers): level i holds at most ``k`` values of weight 2^i;
a full level sorts and keeps every other element (alternating offset per
compaction count — deterministic, and the classic trick that cancels
rank bias pairwise), pushing the survivors up one level.  Odd leftovers
stay behind so total weight is EXACTLY the number of inserted values.
Merging concatenates per-level arrays and re-compacts — associative up
to compaction order, with the same rank-error bound either way
(~levels/(2k) relative rank error; k=256 over 1e6 values ≈ 1.5%,
pytest-checked against exact ranks).
"""

from __future__ import annotations

import struct

import numpy as np

K_DEFAULT = 256


class QuantileSketch:
    """Mergeable rank/quantile sketch over float64 values."""

    def __init__(self, k: int = K_DEFAULT):
        if k < 8:
            raise ValueError("k too small")
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.compactions: list[int] = [0]

    # ------------------------------------------------------------- build
    def add(self, values: np.ndarray) -> "QuantileSketch":
        v = np.asarray(values, dtype=np.float64).ravel()
        v = v[~np.isnan(v)]
        if v.shape[0]:
            self.levels[0] = np.concatenate((self.levels[0], v))
            self._compress()
        return self

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
            self.compactions.append(0)
        for i, lv in enumerate(other.levels):
            if lv.shape[0]:
                self.levels[i] = np.concatenate((self.levels[i], lv))
        self._compress()
        return self

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            lv = self.levels[i]
            if lv.shape[0] > self.k:
                s = np.sort(lv, kind="stable")
                m = (s.shape[0] // 2) * 2
                off = self.compactions[i] & 1
                kept = s[off:m:2]
                self.compactions[i] += 1
                self.levels[i] = s[m:]  # odd leftover keeps exact weight
                if i + 1 == len(self.levels):
                    self.levels.append(np.empty(0, dtype=np.float64))
                    self.compactions.append(0)
                self.levels[i + 1] = np.concatenate((self.levels[i + 1], kept))
            i += 1

    # ------------------------------------------------------------- query
    @property
    def total_weight(self) -> int:
        return int(sum(lv.shape[0] << i for i, lv in enumerate(self.levels)))

    def quantiles(self, qs: list[float]) -> np.ndarray:
        """Smallest sketch value whose cumulative weight reaches
        ceil(q * W) — the quantile_disc index rule, so estimates line up
        with the exact operator's convention."""
        vals = np.concatenate([lv for lv in self.levels]) if self.levels else np.empty(0)
        if vals.shape[0] == 0:
            return np.full(len(qs), np.nan)
        w = np.concatenate(
            [
                np.full(lv.shape[0], 1 << i, dtype=np.int64)
                for i, lv in enumerate(self.levels)
            ]
        )
        order = np.argsort(vals, kind="stable")
        sv, cw = vals[order], np.cumsum(w[order])
        W = cw[-1]
        out = np.empty(len(qs), dtype=np.float64)
        for j, q in enumerate(qs):
            target = max(1, int(np.ceil(q * W)))
            out[j] = sv[np.searchsorted(cw, target)]
        return out

    # --------------------------------------------------------- serialize
    def to_bytes(self) -> bytes:
        head = struct.pack("<II", self.k, len(self.levels))
        counts = struct.pack(
            f"<{len(self.levels)}I", *(lv.shape[0] for lv in self.levels)
        )
        comps = struct.pack(f"<{len(self.levels)}I", *self.compactions)
        return head + counts + comps + b"".join(
            lv.astype(np.float64).tobytes() for lv in self.levels
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "QuantileSketch":
        k, nl = struct.unpack_from("<II", data, 0)
        counts = struct.unpack_from(f"<{nl}I", data, 8)
        comps = struct.unpack_from(f"<{nl}I", data, 8 + 4 * nl)
        sk = cls(k)
        sk.levels, sk.compactions = [], list(comps)
        off = 8 + 8 * nl
        for c in counts:
            sk.levels.append(
                np.frombuffer(data, dtype=np.float64, count=c, offset=off).copy()
            )
            off += 8 * c
        return sk


# ---------------------------------------------------------------------------
# EXACT distributed quantile — the scale-honest counterpart of the sketch.


def float_order_key(v: np.ndarray) -> np.ndarray:
    """Order-preserving uint64 key of float64: flip all bits for
    negatives, flip the sign bit for non-negatives — the classic radix
    trick; key order == IEEE total order (and NaN sorts last, above +inf,
    which exact_global_quantile treats like SQL: filtered out upstream)."""
    bits = v.astype(np.float64).view(np.uint64)
    neg = bits >> np.uint64(63) == 1
    out = np.where(
        neg, ~bits, bits | np.uint64(0x8000000000000000)
    )
    return out


def key_to_float(key: int) -> float:
    """Inverse of float_order_key for a single key."""
    key = int(key)
    if key & (1 << 63):
        bits = key & ~(1 << 63)
    else:
        bits = (~key) & ((1 << 64) - 1)
    return float(np.uint64(bits).view(np.float64))


def exact_global_quantile(ds, col: str, q: float) -> float:
    """EXACT quantile of a float64 column at any scale, no sort and no
    value gather: four radix-refinement scans.  Each pass histograms the
    next 16 bits of the order-preserving key, restricted to the prefix
    chosen so far; the partials leaving a batch are <= 65536 skinny
    (bucket, count) int64 rows (nonzero buckets only), reduced by a tiny
    engine groupby; the driver walks the 65536-entry cumulative sum to
    pick the digit containing the target rank.  After 4 passes the 64-bit
    key — hence the exact value — is fully determined.

    Rank semantics = DuckDB quantile_disc: the value at 0-based index
    ceil(q*n) - 1 of the sorted column (verified empirically,
    build-notes).  Cost: 4 streaming scans; exchange volume is O(2^16)
    rows per batch per pass, independent of data size.
    """
    import pyarrow as pa

    import ray as _ray

    @_ray.remote
    def _merge_hist(*blocks):
        counts = np.zeros(65536, dtype=np.int64)
        for b in blocks:
            if b.num_rows == 0 or "bucket" not in b.column_names:
                continue
            np.add.at(
                counts,
                b.column("bucket").to_numpy(zero_copy_only=False),
                b.column("cnt").to_numpy(zero_copy_only=False),
            )
        return counts

    if not (0.0 < q <= 1.0):
        raise ValueError(f"q={q}")

    prefix = np.uint64(0)
    rank = -1  # resolved after the first pass reveals n
    for level in range(4):
        shift = np.uint64(48 - 16 * level)
        mask_known = (
            ~np.uint64(0) << (shift + np.uint64(16))
            if level > 0
            else np.uint64(0)
        )

        def hist(batch: pa.Table, _s=shift, _m=mask_known, _p=prefix) -> pa.Table:
            empty = pa.table(
                {
                    "bucket": pa.nulls(0, pa.int64()),
                    "cnt": pa.nulls(0, pa.int64()),
                }
            )
            if batch.num_rows == 0 or col not in batch.column_names:
                return empty
            v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
            k = float_order_key(v)
            if int(_m):
                k = k[(k & _m) == _p]
            if k.shape[0] == 0:
                return empty
            digit = ((k >> _s) & np.uint64(0xFFFF)).astype(np.int64)
            u, c = np.unique(digit, return_counts=True)
            return pa.table(
                {
                    "bucket": pa.array(u.astype(np.int64)),
                    "cnt": pa.array(c.astype(np.int64)),
                }
            )

        # per-batch partials are <= 65536 skinny rows — merge them in ONE
        # remote task instead of an engine groupby (the sort-based
        # aggregate costs ~5 s of fixed barrier locally; a histogram merge
        # is associative, so at cluster scale this becomes a tree reduce)
        hist_blocks = (
            ds.map_batches(hist, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        counts = _ray.get(_merge_hist.remote(*hist_blocks))
        if rank < 0:
            n = int(counts.sum())
            if n == 0:
                raise ValueError("exact_global_quantile over empty column")
            rank = int(np.ceil(q * n)) - 1
        cum = np.cumsum(counts)
        b = int(np.searchsorted(cum, rank + 1))
        rank -= int(cum[b - 1]) if b > 0 else 0
        prefix = prefix | (np.uint64(b) << shift)

    return key_to_float(int(prefix))


def grouped_sketch_quantiles(
    ds,
    key_col: str,
    value_col: str,
    qs: list[float],
    *,
    k: int = K_DEFAULT,
    partitions: int = 32,
):
    """Approximate per-GROUP quantiles via mergeable sketches — the
    high-cardinality path the exact operator (priority_price_quantiles)
    documents: exact grouped quantiles need each group's values
    co-located, while this exchange carries one O(k log n) sketch per
    (batch, group) regardless of group size.

    Plan: per batch, one sketch per observed key (np.unique segments,
    vectorized adds) -> key%P exchange of (key, sketch_bytes) ->
    per-partition merge per key (Python cost = distinct keys per
    partition, never rows; sketch merge is O(k log n)).  Output:
    (key, n, q_... one float64 column per requested quantile), with the
    module's rank-error guarantee per group."""
    import pyarrow as pa

    import ray.data  # noqa: F401  (ds is a Dataset)

    qnames = [f"q_{str(q).replace('.', '_')}" for q in qs]

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.argsort(keys, kind="stable")
        ks, vs = keys[order], vals[order]
        new_seg = np.concatenate(([True], ks[1:] != ks[:-1]))
        starts = np.flatnonzero(new_seg)
        ends = np.concatenate((starts[1:], [ks.shape[0]]))
        out_k, out_b = [], []
        for s, e in zip(starts, ends):  # per observed KEY, not per row
            sk = QuantileSketch(k=k).add(vs[s:e])
            out_k.append(int(ks[s]))
            out_b.append(sk.to_bytes())
        return pa.table(
            {
                "k": pa.array(out_k, type=pa.int64()),
                "sk": pa.array(out_b, type=pa.large_binary()),
                "part": pa.array(
                    np.asarray(out_k, dtype=np.int64) % partitions
                ),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        empty = {
            "k": pa.nulls(0, pa.int64()),
            "n": pa.nulls(0, pa.int64()),
        }
        for qn in qnames:
            empty[qn] = pa.nulls(0, pa.float64())
        if group.num_rows == 0 or "k" not in group.column_names:
            return pa.table(empty)
        keys = group["k"].to_numpy(zero_copy_only=False)
        blobs = group["sk"].to_pylist()
        order = np.argsort(keys, kind="stable")
        out = {"k": [], "n": []}
        for qn in qnames:
            out[qn] = []
        i = 0
        idx = order
        while i < idx.shape[0]:
            j = i
            sk = QuantileSketch.from_bytes(blobs[idx[i]])
            while j + 1 < idx.shape[0] and keys[idx[j + 1]] == keys[idx[i]]:
                j += 1
                sk = sk.merge(QuantileSketch.from_bytes(blobs[idx[j]]))
            res = sk.quantiles(qs)
            out["k"].append(int(keys[idx[i]]))
            out["n"].append(int(sk.total_weight))
            for qn, v in zip(qnames, res):
                out[qn].append(float(v))
            i = j + 1
        cols = {
            "k": pa.array(out["k"], type=pa.int64()),
            "n": pa.array(out["n"], type=pa.int64()),
        }
        for qn in qnames:
            cols[qn] = pa.array(out[qn], type=pa.float64())
        return pa.table(cols)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge, batch_format="pyarrow")
    )


def grouped_exact_quantile_cont(ds, key_col: str, value_col: str, q: float):
    """Single-q wrapper over ``grouped_exact_quantiles_cont`` (kept for
    the existing oracle rows); see that function for the algorithm —
    multiple q's share the SAME four radix scans, so a winsorize-style
    caller pays one sweep for both clip bounds."""
    t = grouped_exact_quantiles_cont(ds, key_col, value_col, [q])
    return t.drop_columns(["q"])


def grouped_exact_quantiles_cont(ds, key_col: str, value_col: str, qs):
    """EXACT per-GROUP interpolated quantile (SQL quantile_cont/median
    semantics) with CONSTANT exchange volume — the scale path when single
    groups are too large to gather (priority_price_iqr co-locates each
    group's values; at 100 TB a hot group would be one task's heap).

    Same radix-refinement idea as exact_global_quantile, lifted to groups:
    four streaming scans; pass 1 histograms the top 16 bits per (group,
    digit) (per-batch partial <= groups x distinct-digits skinny rows) and
    reveals each group's n, from which the two bracketing 0-based ranks
    lo = floor(q*(n-1)) and hi = min(lo+1, n-1) follow; passes 2-4 refine
    every (group, rank) target's next 16 bits in one shared scan (targets
    <= 2 x groups, broadcast as a closure).  After 4 passes both bracketing
    float64 values are exactly determined and the result is
    v_lo + frac*(v_hi - v_lo) — DuckDB's interpolation expression, applied
    to exactly-recovered doubles, so outputs are bit-identical (probed
    formula-equal on random doubles; parity-verified on the test tables).

    NaN/null values are dropped (SQL NULL-skip).  Groups are compared as
    raw numpy values (string or int keys both work).  Returns a pyarrow
    table (key_col, n, q_value) — groups are assumed low-cardinality
    (<= thousands); per-group distinct-value exchange never occurs.
    """
    import pyarrow as pa

    import ray as _ray

    qs = [float(x) for x in qs]
    if not qs or any(not (0.0 <= x <= 1.0) for x in qs):
        raise ValueError(f"qs={qs}")

    @_ray.remote
    def _merge_l0(*blocks):
        import pandas as pd

        frames = [
            b.to_pandas()
            for b in blocks
            if b.num_rows and "bucket" in b.column_names
        ]
        if not frames:
            return [], np.zeros((0, 65536), dtype=np.int64)
        df = (
            pd.concat(frames, ignore_index=True)
            .groupby(["grp", "bucket"], sort=True)["cnt"]
            .sum()
            .reset_index()
        )
        grps = sorted(df["grp"].unique().tolist())
        gidx = {g: i for i, g in enumerate(grps)}
        counts = np.zeros((len(grps), 65536), dtype=np.int64)
        counts[
            df["grp"].map(gidx).to_numpy(),
            df["bucket"].to_numpy(),
        ] = df["cnt"].to_numpy()
        return grps, counts

    @_ray.remote
    def _merge_tid(n_tid, *blocks):
        counts = np.zeros((n_tid, 65536), dtype=np.int64)
        for b in blocks:
            if b.num_rows == 0 or "bucket" not in b.column_names:
                continue
            np.add.at(
                counts,
                (
                    b.column("tid").to_numpy(zero_copy_only=False),
                    b.column("bucket").to_numpy(zero_copy_only=False),
                ),
                b.column("cnt").to_numpy(zero_copy_only=False),
            )
        return counts

    def _vals(batch):
        g = batch[key_col].to_numpy(zero_copy_only=False)
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(v)
        return g[ok], float_order_key(v[ok])

    # ---- pass 1: (group, top-16-bit digit) histogram -> per-group n ----
    def hist0(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "grp": pa.nulls(0, pa.string()),
                "bucket": pa.nulls(0, pa.int64()),
                "cnt": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or key_col not in batch.column_names:
            return empty
        g, k = _vals(batch)
        if k.shape[0] == 0:
            return empty
        digit = (k >> np.uint64(48)).astype(np.int64)
        # composite unique via per-group segments (groups are few)
        order = np.argsort(g, kind="stable")
        gs, ds_ = g[order], digit[order]
        seg = np.concatenate(([True], gs[1:] != gs[:-1]))
        starts = np.flatnonzero(seg)
        ends = np.concatenate((starts[1:], [gs.shape[0]]))
        out_g, out_b, out_c = [], [], []
        for s, e in zip(starts, ends):
            u, c = np.unique(ds_[s:e], return_counts=True)
            out_g.extend([gs[s]] * u.shape[0])
            out_b.extend(u.tolist())
            out_c.extend(c.tolist())
        return pa.table(
            {
                "grp": pa.array([str(x) for x in out_g], type=pa.string()),
                "bucket": pa.array(out_b, type=pa.int64()),
                "cnt": pa.array(out_c, type=pa.int64()),
            }
        )

    blocks = (
        ds.map_batches(hist0, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    )
    grps, counts0 = _ray.get(_merge_l0.remote(*blocks))
    if not grps:
        return pa.table(
            {
                key_col: pa.nulls(0, pa.string()),
                "q": pa.nulls(0, pa.float64()),
                "n": pa.nulls(0, pa.int64()),
                "q_value": pa.nulls(0, pa.float64()),
            }
        )

    # targets: (grp, remaining_rank, prefix); <= 2 per group PER q,
    # but bracketing ranks shared across q's dedup to one target each
    n_by_grp = counts0.sum(axis=1)
    targets = []  # [grp, rank_remaining, prefix]
    tmeta = {}  # (grp, q) -> (n, lo_rank, hi_rank, frac, lo_tid, hi_tid)
    for gi, g in enumerate(grps):
        n = int(n_by_grp[gi])
        cum = np.cumsum(counts0[gi])
        tids = {}
        for q in qs:
            h = q * (n - 1)
            lo = int(np.floor(h))
            hi = min(lo + 1, n - 1)
            frac = h - lo
            for r in {lo, hi}:
                if r in tids:
                    continue
                b = int(np.searchsorted(cum, r + 1))
                rem = r - (int(cum[b - 1]) if b > 0 else 0)
                tids[r] = len(targets)
                targets.append([g, rem, np.uint64(b) << np.uint64(48)])
            tmeta[(g, q)] = (n, lo, hi, frac, tids[lo], tids[hi])

    def _grp_label_to_dtype(label: str, dtype):
        """Pass 1 stringifies group labels (the exchange schema is
        string); refinement passes compare against the RAW key column,
        so coerce the label back to the column's dtype — an int64 key
        column compared to the string \"7\" matches nothing and the
        refinement would silently return bucket lower bounds (found by
        the constant-int-key decile caller, round 4 session 13)."""
        if dtype.kind in ("i", "u"):
            return int(label)
        if dtype.kind == "f":
            return float(label)
        if dtype.kind == "b":
            return label == "True"
        return label

    # ---- passes 2-4: refine every target's next 16 bits in one scan ----
    for level in range(1, 4):
        shift = np.uint64(48 - 16 * level)
        mask = ~np.uint64(0) << (shift + np.uint64(16))
        tg = [t[0] for t in targets]
        tp = [t[2] for t in targets]

        def histt(
            batch: pa.Table, _s=shift, _m=mask, _tg=tg, _tp=tp
        ) -> pa.Table:
            empty = pa.table(
                {
                    "tid": pa.nulls(0, pa.int64()),
                    "bucket": pa.nulls(0, pa.int64()),
                    "cnt": pa.nulls(0, pa.int64()),
                }
            )
            if batch.num_rows == 0 or key_col not in batch.column_names:
                return empty
            g, k = _vals(batch)
            if k.shape[0] == 0:
                return empty
            out_t, out_b, out_c = [], [], []
            for tid, (tgrp, tpre) in enumerate(zip(_tg, _tp)):
                tgv = _grp_label_to_dtype(tgrp, g.dtype)
                kk = k[(g == tgv) & ((k & _m) == tpre)]
                if kk.shape[0] == 0:
                    continue
                u, c = np.unique(
                    ((kk >> _s) & np.uint64(0xFFFF)).astype(np.int64),
                    return_counts=True,
                )
                out_t.extend([tid] * u.shape[0])
                out_b.extend(u.tolist())
                out_c.extend(c.tolist())
            return pa.table(
                {
                    "tid": pa.array(out_t, type=pa.int64()),
                    "bucket": pa.array(out_b, type=pa.int64()),
                    "cnt": pa.array(out_c, type=pa.int64()),
                }
            )

        blocks = (
            ds.map_batches(histt, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        cts = _ray.get(_merge_tid.remote(len(targets), *blocks))
        for tid, t in enumerate(targets):
            cum = np.cumsum(cts[tid])
            b = int(np.searchsorted(cum, t[1] + 1))
            t[1] -= int(cum[b - 1]) if b > 0 else 0
            t[2] = t[2] | (np.uint64(b) << shift)

    out_g, out_qq, out_n, out_q = [], [], [], []
    for g in grps:
        for q in qs:
            n, lo, hi, frac, lo_tid, hi_tid = tmeta[(g, q)]
            v_lo = key_to_float(int(targets[lo_tid][2]))
            v_hi = key_to_float(int(targets[hi_tid][2]))
            out_g.append(str(g))
            out_qq.append(q)
            out_n.append(n)
            out_q.append(float(v_lo + frac * (v_hi - v_lo)))
    import pyarrow as _pa

    return _pa.table(
        {
            key_col: _pa.array(out_g, type=_pa.string()),
            "q": _pa.array(out_qq, type=_pa.float64()),
            "n": _pa.array(out_n, type=_pa.int64()),
            "q_value": _pa.array(out_q, type=_pa.float64()),
        }
    )


def grouped_weighted_median(ds, key_col: str, value_col: str, weight_col: str):
    """EXACT per-group WEIGHTED lower median with CONSTANT exchange
    volume: the smallest value v in each group whose cumulative weight
    (values ascending, ties pooled) reaches half the group's total —
    ``min(v) WHERE 2*cum_w >= W`` in the SQL windowed formulation.

    Weighted quantiles have no DuckDB/engine builtin; the repo treats
    them as the general form of exact selection (unit weights degenerate
    to quantile_disc at q=0.5).  Same radix-refinement discipline as
    exact_global_quantile / grouped_exact_quantile_cont, with WEIGHT
    histograms instead of row counts: four streaming scans, per-batch
    partials <= groups x distinct-digits skinny (grp, bucket, wsum) rows,
    merged in one remote task per pass (a tree reduce at cluster scale).
    Because the answer is a SELECTED data value (never interpolated) the
    float64 result is bit-identical across engines and block layouts.

    Weights must be non-negative int64 (loudly checked — the associative
    int64 reduction is the determinism guarantee; float weights would
    reintroduce blocking-dependent rounding).  NaN values and zero-weight
    rows drop out (SQL NULL-skip analog).  Returns pa.table
    (key_col, total_weight, wmedian); group cardinality is assumed low
    (<= thousands) — the constant-exchange design is the point, each
    group's rows are never co-located."""
    import pyarrow as pa

    import ray as _ray

    @_ray.remote
    def _merge_l0(*blocks):
        import pandas as pd

        frames = [
            b.to_pandas()
            for b in blocks
            if b.num_rows and "bucket" in b.column_names
        ]
        if not frames:
            return [], np.zeros((0, 65536), dtype=np.int64)
        df = (
            pd.concat(frames, ignore_index=True)
            .groupby(["grp", "bucket"], sort=True)["w"]
            .sum()
            .reset_index()
        )
        grps = sorted(df["grp"].unique().tolist())
        gidx = {g: i for i, g in enumerate(grps)}
        hist = np.zeros((len(grps), 65536), dtype=np.int64)
        np.add.at(
            hist,
            (df["grp"].map(gidx).to_numpy(), df["bucket"].to_numpy()),
            df["w"].to_numpy(),
        )
        return grps, hist

    @_ray.remote
    def _merge_gid(n_grp, *blocks):
        hist = np.zeros((n_grp, 65536), dtype=np.int64)
        for b in blocks:
            if b.num_rows == 0 or "bucket" not in b.column_names:
                continue
            np.add.at(
                hist,
                (
                    b.column("gid").to_numpy(zero_copy_only=False),
                    b.column("bucket").to_numpy(zero_copy_only=False),
                ),
                b.column("w").to_numpy(zero_copy_only=False),
            )
        return hist

    def _cols(batch):
        g = batch[key_col].to_numpy(zero_copy_only=False)
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        w = batch[weight_col].to_numpy(zero_copy_only=False)
        if w.dtype.kind == "f":
            iw = w.astype(np.int64)
            if not np.array_equal(iw.astype(np.float64), w):
                raise ValueError("weights must be integral (int64-exact)")
            w = iw
        else:
            w = w.astype(np.int64)
        if w.shape[0] and int(w.min()) < 0:
            raise ValueError("weights must be non-negative")
        ok = (~np.isnan(v)) & (w > 0)
        return g[ok], v[ok], w[ok]

    # pass 1: top 16 bits per group; reveals group list + total weights
    def hist0(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "grp": pa.nulls(0, pa.string()),
                "bucket": pa.nulls(0, pa.int64()),
                "w": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or key_col not in batch.column_names:
            return empty
        g, v, w = _cols(batch)
        if g.shape[0] == 0:
            return empty
        digit = (
            (float_order_key(v) >> np.uint64(48)) & np.uint64(0xFFFF)
        ).astype(np.int64)
        keys = np.char.add(
            np.char.add(g.astype(str), "\x01"), digit.astype(str)
        )
        uk, inv = np.unique(keys, return_inverse=True)
        ws = np.zeros(uk.shape[0], dtype=np.int64)
        np.add.at(ws, inv, w)
        gs = [k.split("\x01", 1)[0] for k in uk]
        bs = np.asarray([int(k.split("\x01", 1)[1]) for k in uk], dtype=np.int64)
        return pa.table(
            {
                "grp": pa.array(gs, type=pa.string()),
                "bucket": pa.array(bs),
                "w": pa.array(ws),
            }
        )

    blocks = (
        ds.map_batches(hist0, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    )
    grps, hist = _ray.get(_merge_l0.remote(*blocks))
    if not grps:
        return pa.table(
            {
                key_col: pa.nulls(0, pa.string()),
                "total_weight": pa.nulls(0, pa.int64()),
                "wmedian": pa.nulls(0, pa.float64()),
            }
        )
    totals = hist.sum(axis=1)
    # lower weighted median: smallest key with cum_w >= ceil(W/2)
    # (2*cum >= W over ints)
    ranks = (totals + 1) // 2
    prefixes = np.zeros(len(grps), dtype=np.uint64)
    for gi in range(len(grps)):
        cum = np.cumsum(hist[gi])
        b = int(np.searchsorted(cum, ranks[gi]))
        ranks[gi] -= int(cum[b - 1]) if b > 0 else 0
        prefixes[gi] |= np.uint64(b) << np.uint64(48)

    gnames = np.asarray([str(g) for g in grps], dtype=str)  # sorted by _merge_l0
    for level in range(1, 4):
        shift = np.uint64(48 - 16 * level)
        mask = ~np.uint64(0) << (shift + np.uint64(16))
        pref_snapshot = prefixes.copy()

        def histl(batch: pa.Table, _s=shift, _m=mask, _p=pref_snapshot) -> pa.Table:
            empty = pa.table(
                {
                    "gid": pa.nulls(0, pa.int64()),
                    "bucket": pa.nulls(0, pa.int64()),
                    "w": pa.nulls(0, pa.int64()),
                }
            )
            if batch.num_rows == 0 or key_col not in batch.column_names:
                return empty
            g, v, w = _cols(batch)
            if g.shape[0] == 0:
                return empty
            # vectorized group -> gid (gnames is sorted): searchsorted +
            # equality check; unseen groups cannot appear after pass 1
            gs = g.astype(str)
            gid = np.searchsorted(gnames, gs)
            gid = np.minimum(gid, gnames.shape[0] - 1)
            k = float_order_key(v)
            sel = (gnames[gid] == gs) & ((k & _m) == _p[gid])
            if not sel.any():
                return empty
            gid, k, w = gid[sel], k[sel], w[sel]
            digit = ((k >> _s) & np.uint64(0xFFFF)).astype(np.int64)
            comp = gid * 65536 + digit
            uc, inv = np.unique(comp, return_inverse=True)
            ws = np.zeros(uc.shape[0], dtype=np.int64)
            np.add.at(ws, inv, w)
            return pa.table(
                {
                    "gid": pa.array(uc // 65536),
                    "bucket": pa.array(uc % 65536),
                    "w": pa.array(ws),
                }
            )

        blocks = (
            ds.map_batches(histl, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        hist = _ray.get(_merge_gid.remote(len(grps), *blocks))
        for gi in range(len(grps)):
            cum = np.cumsum(hist[gi])
            b = int(np.searchsorted(cum, ranks[gi]))
            ranks[gi] -= int(cum[b - 1]) if b > 0 else 0
            prefixes[gi] |= np.uint64(b) << shift

    return pa.table(
        {
            key_col: pa.array([str(g) for g in grps], type=pa.string()),
            "total_weight": pa.array(totals.astype(np.int64)),
            "wmedian": pa.array(
                [key_to_float(int(p)) for p in prefixes], type=pa.float64()
            ),
        }
    )
