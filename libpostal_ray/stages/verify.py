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

Skew handling (the reference caps permutations, expand.c:29; we collapse,
salt and cap buckets — see ``bucket_candidate_indices``):
  * content-identical members (same sha_key) collapse to ONE representative
    via star pairs — a vendored mega-family costs linear work.
  * representative count <= small_bucket_cap -> all-pairs verification.
  * <= hot_bucket_cap                -> anchor pairing vs the min-id member
    (transitive closure via union-find recovers the cluster).
  * larger                           -> salted sub-buckets of ~hot_sub_size
    (all-pairs inside) + a delegate clique for cross-salt closure, bounded
    by salt_pair_budget; budget exhaustion degrades to anchor pairing and
    sets the ``truncated`` column (no silent capping — SURVEY.md section 4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from libpostal_ray.config import PipelineConfig
from libpostal_ray.functions.hashing import mix_fold_u64

STATUS_EXACT = 9
STATUS_LIKELY = 6
STATUS_NEEDS_REVIEW = 3


def bucket_candidate_indices(
    keys: np.ndarray, sha_keys: np.ndarray, ids: np.ndarray, cfg: PipelineConfig
) -> tuple[np.ndarray, np.ndarray, bool]:
    """Candidate index pairs for a PARTITION of buckets.

    Inputs are parallel arrays SORTED by (key, sha_key, id); returns
    (li, ri, truncated_any) — index pairs into those arrays.

    Per bucket (segment of equal key):

    1. **sha-collapse**: members sharing ``sha_key`` are content-identical
       (whp); each group emits STAR pairs (min-id member vs the rest —
       verified EXACT downstream via the full digest) and exactly ONE
       representative enters bucket pairing.  This is the reference's
       exact-intersection short-circuit (dedupe.c:13-31) applied BEFORE the
       pair explosion: a vendored family of 100k identical files costs
       99,999 star pairs + one representative, not an all-pairs blowup —
       and a 63-bit prefix collision between different contents only costs
       one wasted candidate pair.
    2. **representatives**: all-pairs up to ``small_bucket_cap``; anchor
       pairing up to ``hot_bucket_cap``; above that SALTED sub-buckets —
       members ordered by a fixed hash of (doc_id, bucket key) and chunked
       into groups of ~``hot_sub_size`` with all-pairs inside, plus a
       delegate CLIQUE (min-id member per sub-bucket) for cross-salt
       closure.  Connectivity of a true duplicate family is preserved while
       per-bucket work drops from O(m^2) to O(m * sub_size).  The hash mixes
       the bucket key, so each of the b bands splits a hot family
       differently — independent closure chances per band.
    3. ``salt_pair_budget`` bounds one bucket's emission: the sub size
       shrinks first, and only then does the bucket degrade to anchor
       pairing with truncated=True (never silent; SURVEY.md section 4).
    """
    n = keys.shape[0]
    if n < 2:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            False,
        )
    # bucket segments
    b_change = keys[1:] != keys[:-1]
    b_starts = np.flatnonzero(np.concatenate(([True], b_change)))
    # sha-group segments within buckets
    g_change = b_change | (sha_keys[1:] != sha_keys[:-1])
    g_starts = np.flatnonzero(np.concatenate(([True], g_change)))
    g_seg = np.cumsum(np.concatenate(([0], g_change.astype(np.int64))))

    li_parts: list[np.ndarray] = []
    ri_parts: list[np.ndarray] = []

    # star pairs: every non-first row of a sha-group vs the group's first
    anchor_of_row = g_starts[g_seg]
    non_first = np.flatnonzero(anchor_of_row != np.arange(n, dtype=np.int64))
    if non_first.size:
        li_parts.append(anchor_of_row[non_first])
        ri_parts.append(non_first)

    # bucket pairing over the representatives (sha-group firsts)
    rep_rows = g_starts
    rep_bucket = np.searchsorted(b_starts, rep_rows, side="right") - 1
    rb_starts = np.flatnonzero(
        np.concatenate(([True], rep_bucket[1:] != rep_bucket[:-1]))
    )
    rb_ends = np.concatenate((rb_starts[1:], [rep_rows.shape[0]]))
    sizes = rb_ends - rb_starts
    multi = np.flatnonzero(sizes >= 2)

    truncated_any = False
    for bi in multi:
        s, e = int(rb_starts[bi]), int(rb_ends[bi])
        rows = rep_rows[s:e]
        m = e - s
        if m <= cfg.small_bucket_cap:
            li, ri = np.triu_indices(m, k=1)
            li_parts.append(rows[li])
            ri_parts.append(rows[ri])
        elif m <= cfg.hot_bucket_cap:
            # anchor pairing vs the min-id representative (rows sorted by id
            # within the bucket only per sha-group; recover min explicitly)
            a = int(np.argmin(ids[rows]))
            others = np.delete(np.arange(m), a)
            li_parts.append(np.full(m - 1, rows[a], dtype=np.int64))
            ri_parts.append(rows[others])
        else:
            S = cfg.hot_sub_size
            if m * (S - 1) // 2 > cfg.salt_pair_budget:
                S = max(2, 2 * cfg.salt_pair_budget // m)
            if S < 2 or m * (S - 1) // 2 > cfg.salt_pair_budget:
                # even pair-per-member exceeds the budget: degrade, flag
                truncated_any = True
                a = int(np.argmin(ids[rows]))
                others = np.delete(np.arange(m), a)
                li_parts.append(np.full(m - 1, rows[a], dtype=np.int64))
                ri_parts.append(rows[others])
                continue
            # deterministic per-bucket shuffle: order by hash(doc_id, key)
            h = mix_fold_u64(
                [ids[rows].astype(np.uint64)], salt=int(keys[rows[0]])
            )
            order = np.lexsort((ids[rows], h))
            shuffled = rows[order]
            delegates: list[int] = []
            for cs in range(0, m, S):
                chunk = shuffled[cs : cs + S]
                cm = chunk.shape[0]
                if cm >= 2:
                    li, ri = np.triu_indices(cm, k=1)
                    li_parts.append(chunk[li])
                    ri_parts.append(chunk[ri])
                delegates.append(int(chunk[np.argmin(ids[chunk])]))
            dl = np.array(delegates, dtype=np.int64)
            g = dl.shape[0]
            if g >= 2:
                if g <= cfg.small_bucket_cap:
                    li, ri = np.triu_indices(g, k=1)
                    li_parts.append(dl[li])
                    ri_parts.append(dl[ri])
                else:
                    a = int(np.argmin(ids[dl]))
                    others = np.delete(np.arange(g), a)
                    li_parts.append(np.full(g - 1, dl[a], dtype=np.int64))
                    ri_parts.append(dl[others])

    if not li_parts:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            truncated_any,
        )
    return np.concatenate(li_parts), np.concatenate(ri_parts), truncated_any

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
    nsh: np.ndarray | None = None,
    ph: np.ndarray | None = None,
    ph2: np.ndarray | None = None,
    ac: np.ndarray | None = None,
    ac2: np.ndarray | None = None,
    exp4: np.ndarray | None = None,
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

    status, est = verify_pair_statuses(
        exact,
        raw,
        both_short,
        ham,
        cfg,
        nsh_a=nsh[li] if nsh is not None else None,
        nsh_b=nsh[ri] if nsh is not None else None,
        ph_a=ph[li] if ph is not None else None,
        ph_b=ph[ri] if ph is not None else None,
        ph2_a=ph2[li] if ph2 is not None else None,
        ph2_b=ph2[ri] if ph2 is not None else None,
        ac_a=ac[li] if ac is not None else None,
        ac_b=ac[ri] if ac is not None else None,
        ac2_a=ac2[li] if ac2 is not None else None,
        ac2_b=ac2[ri] if ac2 is not None else None,
        exp_a=exp4[li] if exp4 is not None else None,
        exp_b=exp4[ri] if exp4 is not None else None,
    )

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
        shak = group["sha_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, shak, keys))
        keys_s = keys[order]
        ids_s = ids[order]
        shak_s = shak[order]

        li, ri, truncated_any = bucket_candidate_indices(keys_s, shak_s, ids_s, cfg)
        if li.shape[0] == 0:
            return _empty_edges()

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
        nsh = (
            group["n_shingles"].take(take).to_numpy(zero_copy_only=False).astype(np.int64)
            if "n_shingles" in group.column_names
            else None
        )
        ph = (
            group["phonetic"].take(take).to_numpy(zero_copy_only=False).astype(np.int64)
            if "phonetic" in group.column_names
            else None
        )
        ph2 = (
            group["phonetic2"].take(take).to_numpy(zero_copy_only=False).astype(np.int64)
            if "phonetic2" in group.column_names
            else None
        )
        ac = (
            group["acronym"].take(take).to_numpy(zero_copy_only=False).astype(np.int64)
            if "acronym" in group.column_names
            else None
        )
        ac2 = (
            group["acronym2"].take(take).to_numpy(zero_copy_only=False).astype(np.int64)
            if "acronym2" in group.column_names
            else None
        )
        exp4 = None
        if "exp4" in group.column_names:
            e4 = group["exp4"].take(take)
            if isinstance(e4, pa.ChunkedArray):
                e4 = e4.combine_chunks()
            exp4 = e4.flatten().to_numpy(zero_copy_only=False).reshape(n, 4)
        edges = _edges_from_pairs(
            ids_s, sha, sigs, sims, short, li, ri, cfg, truncated_any, nsh=nsh, ph=ph,
            ph2=ph2, ac=ac, ac2=ac2, exp4=exp4,
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
        shak = group["sha_key"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, shak, keys))
        keys_s = keys[order]
        ids_s = ids[order]
        shak_s = shak[order]
        li, ri, truncated_any = bucket_candidate_indices(keys_s, shak_s, ids_s, cfg)
        if li.shape[0] == 0:
            return PAIR_SCHEMA.empty_table()
        src = ids_s[li]
        dst = ids_s[ri]
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
    nsh_a: np.ndarray | None = None,
    nsh_b: np.ndarray | None = None,
    ph_a: np.ndarray | None = None,
    ph_b: np.ndarray | None = None,
    ph2_a: np.ndarray | None = None,
    ph2_b: np.ndarray | None = None,
    ac_a: np.ndarray | None = None,
    ac_b: np.ndarray | None = None,
    ac2_a: np.ndarray | None = None,
    ac2_b: np.ndarray | None = None,
    exp_a: np.ndarray | None = None,
    exp_b: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Shared status lattice: inputs per pair -> (status int8, est float64).
    raw_agree is the UNCORRECTED b-bit agreement rate.

    Size-ratio guard (dedupe.c:231-293 symmetric-difference demotion
    analog): Jaccard(A,B) <= min(|A|,|B|)/max(|A|,|B|), so when the
    shingle-count ratio is below a threshold the true Jaccard cannot reach
    it — a noisy b-bit estimate above the threshold is demoted (to
    NEEDS_REVIEW) or dropped rather than believed.  nsh_a/nsh_b are
    DISTINCT-shingle set sizes (stages/signature.py computes them that
    way), which is the only form for which the bound holds — multiset
    position counts would wrongly drop e.g. a file that is N repeats of
    another's content.  Exact pairs are unaffected (ratio 1)."""
    C = 1.0 / 256.0
    est = np.clip((raw_agree - C) / (1.0 - C), 0.0, 1.0)
    status = np.zeros(exact.shape[0], dtype=np.int8)
    status[np.where(both_short & (ham <= cfg.simhash_max_hamming))[0]] = STATUS_LIKELY
    long_pair = ~both_short
    status[np.where(long_pair & (est >= cfg.jaccard_review))[0]] = STATUS_NEEDS_REVIEW
    status[np.where(long_pair & (est >= cfg.jaccard_likely))[0]] = STATUS_LIKELY
    if cfg.size_ratio_guard and nsh_a is not None and nsh_b is not None:
        mx = np.maximum(nsh_a, nsh_b).astype(np.float64)
        ratio = np.where(
            mx > 0, np.minimum(nsh_a, nsh_b) / np.maximum(mx, 1.0), 1.0
        )
        cannot_likely = long_pair & (ratio < cfg.jaccard_likely)
        status[cannot_likely & (status == STATUS_LIKELY)] = STATUS_NEEDS_REVIEW
        cannot_review = long_pair & (ratio < cfg.jaccard_review)
        status[cannot_review] = 0
    if cfg.phonetic_keys and ph_a is not None and ph_b is not None:
        # phonetic key family (double_metaphone analog): sound-alike SHORT
        # pairs reach at least NEEDS_REVIEW even when their SimHash differs
        # — the fuzzy refine tier (JW on short strings) decides.  Under
        # Double Metaphone a row may carry an ALTERNATE-pronunciation code
        # (ph2, 0 = none); a pair matches on ANY primary/alternate combo
        # ("SMITH" alt XMT meets "SCHMIDT" pri XMT), per the published
        # algorithm's two-code contract.
        ph_match = ph_a == ph_b
        if ph2_a is not None and ph2_b is not None:
            ph_match = (
                ph_match
                | ((ph2_a != 0) & (ph2_a == ph_b))
                | ((ph2_b != 0) & (ph_a == ph2_b))
                | ((ph2_a != 0) & (ph2_a == ph2_b))
            )
        ph_match = both_short & (ph_a != 0) & ph_match
        status = np.maximum(
            status,
            np.where(ph_match, STATUS_NEEDS_REVIEW, 0).astype(np.int8),
        )
    if cfg.acronym_keys and ac_a is not None and ac_b is not None:
        # acronym key family (near_dupe.c:416-559): the reference's
        # asymmetric shape — ONE side is a literal acronym token (negative
        # self key), the other a spelled-out multi-token phrase whose
        # first-letter key (with or without stopwords) matches.  Two
        # multi-token rows sharing an acronym still meet in a bucket but
        # are not upgraded here (pure first-letter equality of two phrases
        # is noise); SimHash/fuzzy evidence can promote them instead.
        A1, A2 = np.abs(ac_a), np.abs(ac2_a)
        B1, B2 = np.abs(ac_b), np.abs(ac2_b)
        key_meet = ((A1 != 0) & ((A1 == B1) | ((B2 != 0) & (A1 == B2)))) | (
            (A2 != 0) & ((A2 == B1) | ((B2 != 0) & (A2 == B2)))
        )
        # no both_short gate: the self side is inherently short and the
        # phrase side is bounded by acronym_max_chars at key emission
        ac_match = ((ac_a < 0) != (ac_b < 0)) & key_meet
        status = np.maximum(
            status,
            np.where(ac_match, STATUS_NEEDS_REVIEW, 0).astype(np.int8),
        )
    if cfg.expansion_keys and exp_a is not None and exp_b is not None:
        # expansions_intersect (dedupe.c:13-31): two SHORT rows sharing any
        # whole-string expansion form ("main st" expands to "main street")
        # are LIKELY duplicates — the reference's likely_dupe verdict for
        # intersecting expansion sets.  exp_a/exp_b are (m, 4) stored form
        # hashes (0 = empty slot); a 63-bit hash collision mislabeling a
        # pair is ~2^-63 per pair — the same risk class as sha_key star
        # pairing.  Only the first 4 forms are stored: pairs meeting on a
        # later enumerated form still become candidates (every form emits a
        # band key) but fall back to the SimHash/fuzzy verdicts.
        inter = (
            (exp_a[:, :, None] == exp_b[:, None, :]) & (exp_a[:, :, None] != 0)
        ).any(axis=(1, 2))
        exp_match = both_short & inter
        status = np.maximum(
            status, np.where(exp_match, STATUS_LIKELY, 0).astype(np.int8)
        )
    status[exact] = STATUS_EXACT
    est[exact] = 1.0
    return status, est
