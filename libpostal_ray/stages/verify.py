"""Verify stage — per-bucket candidate generation + pair verification.

Runs inside ``groupby("band_key").map_groups``: every group is one LSH
bucket; all members agree on one band of the signature, so every unordered
pair in the bucket is a candidate.  Verification mirrors the reference's
duplicate-status lattice (libpostal.h:218-224, dedupe.c:78-156):

  EXACT        (9): sha256(content) equal — `expansions_intersect`-style
                    exact identity short-circuit.
  LIKELY       (6): estimated Jaccard >= jaccard_likely (long rows), or
                    SimHash hamming <= simhash_max_hamming (short rows).
  NEEDS_REVIEW (3): estimated Jaccard >= jaccard_review (long rows only).

Skew handling (the reference caps permutations, expand.c:29; we cap buckets):
  * bucket size <= small_bucket_cap  -> all-pairs verification.
  * larger                           -> anchor pairing: every member vs the
    min-id member.  Linear work; transitive closure via union-find recovers
    the clusters.  Pairs missed here still collide in other bands whp.
  * > max_bucket_size                -> deterministic truncation to the
    max_bucket_size smallest ids, logged via the ``truncated`` counter column
    (no silent truncation — SURVEY.md section 4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from libpostal_ray.config import PipelineConfig

STATUS_EXACT = 9
STATUS_LIKELY = 6
STATUS_NEEDS_REVIEW = 3

EDGE_SCHEMA = pa.schema(
    [
        ("src", pa.int64()),
        ("dst", pa.int64()),
        ("status", pa.int8()),
        ("est_jaccard", pa.float64()),
        ("truncated", pa.bool_()),
    ]
)


def _empty_edges() -> pa.Table:
    return EDGE_SCHEMA.empty_table()


def _edges_from_pairs(
    ids: np.ndarray,
    sha: list[bytes],
    sigs: np.ndarray,
    sims: np.ndarray,
    short: np.ndarray,
    li: np.ndarray,
    ri: np.ndarray,
    cfg: PipelineConfig,
    truncated: bool,
) -> pa.Table:
    """Verify candidate index pairs (li, ri) and emit edge rows.

    ``sigs`` is the (n, K) uint8 b-bit signature matrix; the raw agreement
    rate E overstates Jaccard by the accidental byte-collision rate C=1/256,
    so the unbiased estimate is (E - C) / (1 - C) (Li & Koenig b-bit minhash).
    """
    if li.shape[0] == 0:
        return _empty_edges()
    raw = (sigs[li] == sigs[ri]).mean(axis=1)
    if isinstance(sha, np.ndarray):  # fixed-width 'S32' array: vectorized
        exact = sha[li] == sha[ri]
    else:
        exact = np.array([sha[a] == sha[b] for a, b in zip(li, ri)], dtype=bool)

    both_short = short[li] & short[ri]
    # SimHash path for short rows
    ham = np.zeros(li.shape[0], dtype=np.int64)
    if both_short.any():
        x = (sims[li] ^ sims[ri]).view(np.uint8).reshape(-1, 8)
        ham = np.unpackbits(x, axis=1).sum(axis=1).astype(np.int64)

    status, est = verify_pair_statuses(exact, raw, both_short, ham, cfg)

    keep = status > 0
    li, ri, status, est = li[keep], ri[keep], status[keep], est[keep]
    if li.shape[0] == 0:
        return _empty_edges()
    src = np.minimum(ids[li], ids[ri])
    dst = np.maximum(ids[li], ids[ri])
    return pa.table(
        {
            "src": pa.array(src, type=pa.int64()),
            "dst": pa.array(dst, type=pa.int64()),
            "status": pa.array(status, type=pa.int8()),
            "est_jaccard": pa.array(est, type=pa.float64()),
            "truncated": pa.array(np.full(li.shape[0], truncated)),
        },
        schema=EDGE_SCHEMA,
    )


class VerifyPartition:
    """map_groups callable over a PARTITION of buckets (band_key % P).

    Grouping by raw band_key costs one Python call per bucket — at 16 keys
    per doc that is ~16n mostly-singleton groups, and per-group overhead
    dwarfs the work.  Grouping by band_key % P gives exactly P Python calls;
    inside a partition the buckets are recovered with one vectorized sort +
    segment scan, singleton buckets cost nothing, and ALL candidate pairs of
    the partition are verified in one vectorized _edges_from_pairs call.

    Partition sizing at scale: partition bytes ~ total signature bytes / P;
    choose P so a partition fits a worker's heap (config.verify_partitions).
    """

    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()

    def __call__(self, group: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = group.num_rows
        if n < 2:
            return _empty_edges()

        keys = group["band_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, keys))
        keys_s = keys[order]
        ids_s = ids[order]

        # bucket boundaries within the sorted partition
        seg_starts = np.flatnonzero(np.concatenate(([True], keys_s[1:] != keys_s[:-1])))
        seg_ends = np.concatenate((seg_starts[1:], [n]))
        sizes = seg_ends - seg_starts
        multi = np.flatnonzero(sizes >= 2)
        if multi.shape[0] == 0:
            return _empty_edges()

        li_parts: list[np.ndarray] = []
        ri_parts: list[np.ndarray] = []
        truncated_any = False
        for b in multi:
            s, e = int(seg_starts[b]), int(seg_ends[b])
            m = e - s
            if m > cfg.max_bucket_size:
                e = s + cfg.max_bucket_size
                m = cfg.max_bucket_size
                truncated_any = True
            if m <= cfg.small_bucket_cap:
                li, ri = np.triu_indices(m, k=1)
                li_parts.append(li + s)
                ri_parts.append(ri + s)
            else:
                # anchor pairing vs min-id member (index s: ids sorted per key)
                ri_parts.append(np.arange(s + 1, e, dtype=np.int64))
                li_parts.append(np.full(m - 1, s, dtype=np.int64))
        li = np.concatenate(li_parts)
        ri = np.concatenate(ri_parts)

        take = pa.array(order)
        sha = group["sha256"].take(take).to_pylist()
        mh = group["minhash8"].take(take)
        if isinstance(mh, pa.ChunkedArray):
            mh = mh.combine_chunks()
        sigs = (
            mh.flatten().to_numpy(zero_copy_only=False).reshape(n, -1)
        )  # (n, K) uint8 b-bit signature
        sims = (
            group["simhash"]
            .take(take)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            .view(np.uint64)
        )
        short = group["is_short"].take(take).to_numpy(zero_copy_only=False).astype(bool)
        edges = _edges_from_pairs(
            ids_s, sha, sigs, sims, short, li, ri, cfg, truncated_any
        )
        if edges.num_rows == 0:
            return edges
        # the same pair can occur in several buckets of one partition; local
        # dedup here shrinks the global (src,dst) dedup shuffle
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            edges, sort_keys=[("src", "ascending"), ("dst", "ascending"), ("status", "descending")]
        )
        edges = edges.take(idx)
        src = edges["src"].to_numpy(zero_copy_only=False)
        dst = edges["dst"].to_numpy(zero_copy_only=False)
        keep = np.concatenate(
            ([True], (src[1:] != src[:-1]) | (dst[1:] != dst[:-1]))
        )
        # truncated takes OR semantics across the pair's buckets (status/est
        # are per-pair invariants — same docs, same signatures, any bucket)
        trunc = edges["truncated"].to_numpy(zero_copy_only=False)
        seg = np.cumsum(keep) - 1
        trunc_or = np.zeros(int(keep.sum()), dtype=bool)
        np.logical_or.at(trunc_or, seg, trunc)
        out = edges.filter(pa.array(keep))
        return out.set_column(
            out.column_names.index("truncated"), "truncated", pa.array(trunc_or)
        )


PAIR_SCHEMA = pa.schema(
    [("src", pa.int64()), ("dst", pa.int64()), ("truncated", pa.bool_())]
)


class PairGenPartition:
    """map_groups callable over a partition of buckets that emits CANDIDATE
    PAIRS ONLY (no verification) from skinny (band_key, doc_id) rows.

    This is the scale path: the LSH shuffle moves 16 B/row instead of the
    ~200 B/row of the signature-carrying layout; signatures are consulted
    later (broadcast lookup or join) only for rows that are actually in a
    candidate pair.  Bucket semantics (all-pairs under small_bucket_cap,
    anchor pairing above, deterministic truncation at max_bucket_size)
    match VerifyPartition exactly.
    """

    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()

    def __call__(self, group: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = group.num_rows
        if n < 2:
            return PAIR_SCHEMA.empty_table()
        keys = group["band_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, keys))
        keys_s = keys[order]
        ids_s = ids[order]
        seg_starts = np.flatnonzero(
            np.concatenate(([True], keys_s[1:] != keys_s[:-1]))
        )
        seg_ends = np.concatenate((seg_starts[1:], [n]))
        sizes = seg_ends - seg_starts
        multi = np.flatnonzero(sizes >= 2)
        if multi.shape[0] == 0:
            return PAIR_SCHEMA.empty_table()
        src_parts, dst_parts = [], []
        truncated_any = False
        for b in multi:
            s, e = int(seg_starts[b]), int(seg_ends[b])
            m = e - s
            if m > cfg.max_bucket_size:
                e = s + cfg.max_bucket_size
                m = cfg.max_bucket_size
                truncated_any = True
            if m <= cfg.small_bucket_cap:
                li, ri = np.triu_indices(m, k=1)
                src_parts.append(ids_s[li + s])
                dst_parts.append(ids_s[ri + s])
            else:
                src_parts.append(np.full(m - 1, ids_s[s], dtype=np.int64))
                dst_parts.append(ids_s[s + 1 : e])
        src = np.concatenate(src_parts)
        dst = np.concatenate(dst_parts)
        lo = np.minimum(src, dst)
        hi = np.maximum(src, dst)
        order2 = np.lexsort((hi, lo))
        lo, hi = lo[order2], hi[order2]
        keep = np.concatenate(
            ([True], (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1]))
        )
        lo, hi = lo[keep], hi[keep]
        return pa.table(
            {
                "src": pa.array(lo, type=pa.int64()),
                "dst": pa.array(hi, type=pa.int64()),
                "truncated": pa.array(np.full(lo.shape[0], truncated_any)),
            },
            schema=PAIR_SCHEMA,
        )


def verify_pair_statuses(
    exact: np.ndarray,
    raw_agree: np.ndarray,
    both_short: np.ndarray,
    ham: np.ndarray,
    cfg: PipelineConfig,
) -> tuple[np.ndarray, np.ndarray]:
    """Shared status lattice: inputs per pair -> (status int8, est float64).
    raw_agree is the UNCORRECTED b-bit agreement rate."""
    C = 1.0 / 256.0
    est = np.clip((raw_agree - C) / (1.0 - C), 0.0, 1.0)
    status = np.zeros(exact.shape[0], dtype=np.int8)
    status[np.where(both_short & (ham <= cfg.simhash_max_hamming))[0]] = STATUS_LIKELY
    long_pair = ~both_short
    status[np.where(long_pair & (est >= cfg.jaccard_review))[0]] = STATUS_NEEDS_REVIEW
    status[np.where(long_pair & (est >= cfg.jaccard_likely))[0]] = STATUS_LIKELY
    status[exact] = STATUS_EXACT
    est[exact] = 1.0
    return status, est
