"""Exact set-similarity threshold self-join (token-shingle Jaccard).

All unordered document pairs whose word-k-gram shingle SETS have Jaccard
similarity >= num/den — the exact counterpart of the flagship's MinHash
*estimate* (near_dupe.c's philosophy: block, then verify; here the verify
is exact set intersection, so the output is a ground-truth pair set a
user can hold the LSH pipeline against, cf. dedup_eval_prefix_vs_exact).

Physical plan (the map-reduce AllPairs formulation of Vernica et al.,
SIGMOD 2010, built from public algorithm descriptions):

  1. one tokenize pass per batch emits DISTINCT (gram_hash, doc_id, n)
     postings — gram identity is a 63-bit fold of per-token 64-bit
     hashes, so the exchange carries 8-byte keys, never gram strings;
     ``n`` is the doc's distinct-shingle count and rides along so pair
     verification needs NO sizes join later;
  2. ONE exchange on gram_hash % P: each partition pairs the docs of
     its posting lists (sorted-run triangle, same discipline as
     evalmetrics.pairs_by_key) and PRE-AGGREGATES (pair, shared_count)
     partials in-kernel;
  3. ONE skinny exchange routed on hash(a, b) % P sums shared counts across
     partitions and applies the EXACT integer threshold
     s*(den+num) >= num*(n_a+n_b)   <=>   s/(n_a+n_b-s) >= num/den —
     no float enters the decision, so the output is engine-exact.

Prefix filtering (``prefix=True``): each doc indexes only its first
|d| - ceil(t*|d|) + 1 shingles in ascending hash order (any global order
is sound: take the smallest shared element g* of a qualifying pair — if
g* were outside doc a's prefix, ALL shared elements would sit in a's
last ceil(t*|a|)-1 positions, contradicting |a n b| >= t*|a|).  The
under-counted postings then only GENERATE candidates; exact intersection
is re-verified against broadcast full sets.  Pays off at high
thresholds; at the low thresholds the word-salad test corpus needs, the
prefix is ~the whole set, so the registry row runs prefix=False.

Skew note: a shingle shared by df docs contributes O(df^2) pair
partials.  ``df_cap`` (None = exact) skips posting lists above the cap —
the "stop shingle" pruning a 100-TB run enables (boilerplate shingles
carry no similarity signal but quadratic cost); when it engages, the
result is a documented under-approximation, mirroring the LSH
hot-bucket cap.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from libpostal_ray.functions.hashing import as_key_i64, mix_fold_u64

# broadcast verify (prefix mode) holds one sorted uint64 array per doc —
# ~8 B/shingle; 50M shingles ~ 400 MB, the same budget class as the
# flagship's sig_broadcast_max.
PREFIX_VERIFY_MAX_POSTINGS = 50_000_000


def _postings(
    docs: ray.data.Dataset,
    *,
    id_col: str,
    text_col: str,
    shingle_k: int,
    partitions: int,
    threshold: tuple[int, int] | None,
    side: int | None = None,
) -> ray.data.Dataset:
    """(g, doc, n, part[, side]) distinct-shingle postings; prefix-only
    when ``threshold`` is given (ascending-hash global order); ``side``
    tags the rows of one input of a bipartite join."""

    num_den = threshold

    def fn(batch: pa.Table) -> pa.Table:
        empty_cols = {
            "g": pa.array([], type=pa.int64()),
            "doc": pa.array([], type=pa.int64()),
            "n": pa.array([], type=pa.int64()),
            "part": pa.array([], type=pa.int64()),
        }
        if side is not None:
            empty_cols["side"] = pa.array([], type=pa.int64())
        empty = pa.table(empty_cols)
        if batch.num_rows == 0:
            return empty
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if ids.shape[0] and ids.min() < 0:
            raise ValueError(
                "similarity_join_pairs: ids must be non-negative int64"
            )
        txt = pc.utf8_trim_whitespace(batch[text_col].cast(pa.large_string()))
        lists = pc.split_pattern_regex(txt, pattern=r"\s+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        total = len(flat)
        if total < shingle_k:
            return empty
        # per-token 64-bit hash: Python loop over the BATCH VOCAB only
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary.to_pylist()
        vh = np.fromiter(
            (
                int.from_bytes(
                    hashlib.blake2b(
                        (s or "").encode("utf-8"), digest_size=8
                    ).digest(),
                    "big",
                )
                for s in vocab
            ),
            dtype=np.uint64,
            count=len(vocab),
        )
        th = vh[codes]
        m = total - shingle_k + 1
        fold = mix_fold_u64(
            [th[j : j + m] for j in range(shingle_k)], salt=shingle_k
        )
        valid = parent[:m] == parent[shingle_k - 1 :]
        if not valid.any():
            return empty
        g = as_key_i64(fold[valid])
        didx = parent[:m][valid].astype(np.int64)
        # per-doc DISTINCT shingles, ascending hash within each doc
        order = np.lexsort((g, didx))
        didx, g = didx[order], g[order]
        keep = np.concatenate(
            ([True], (didx[1:] != didx[:-1]) | (g[1:] != g[:-1]))
        )
        didx, g = didx[keep], g[keep]
        starts = np.flatnonzero(
            np.concatenate(([True], didx[1:] != didx[:-1]))
        )
        lens = np.diff(np.concatenate((starts, [didx.shape[0]])))
        n_of = np.zeros(batch.num_rows, dtype=np.int64)
        n_of[didx[starts]] = lens
        if num_den is not None:
            num, den = num_den
            n_doc = n_of[didx]
            p_doc = n_doc - (num * n_doc + den - 1) // den + 1
            rank = np.arange(didx.shape[0], dtype=np.int64) - np.repeat(
                starts, lens
            )
            sel = rank < p_doc
            didx, g = didx[sel], g[sel]
        cols = {
            "g": pa.array(g),
            "doc": pa.array(ids[didx]),
            "n": pa.array(n_of[didx]),
            "part": pa.array(g % partitions),
        }
        if side is not None:
            cols["side"] = pa.array(
                np.full(g.shape[0], side, dtype=np.int64)
            )
        return pa.table(cols)

    return docs.map_batches(fn, batch_format="pyarrow")


def _pair_reduce(a, b, na, nb, s=None):
    """Segment-reduce duplicate (a, b) pairs: summed s (default 1 per
    occurrence) and the pair's (n_a, n_b).  Full int64 id domain — no
    composite key, so 63-bit stable_doc_ids work."""
    order = np.lexsort((b, a))
    a, b, na, nb = a[order], b[order], na[order], nb[order]
    sv = (
        np.ones(a.shape[0], dtype=np.int64)
        if s is None
        else s[order].astype(np.int64)
    )
    new = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
    starts = np.flatnonzero(new)
    s_tot = np.add.reduceat(sv, starts)
    return a[starts], b[starts], s_tot, na[starts], nb[starts]


def _pair_partials(
    postings: ray.data.Dataset,
    *,
    partitions: int,
    df_cap: int | None,
    bipartite: bool = False,
) -> ray.data.Dataset:
    """gram-partition kernel: triangle-pair each posting list (or
    left x right cross-pair in bipartite mode), then pre-aggregate
    (a, b, s, n_a, n_b) partials before the second exchange."""

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "a": pa.array([], type=pa.int64()),
                "b": pa.array([], type=pa.int64()),
                "s": pa.array([], type=pa.int64()),
                "n_a": pa.array([], type=pa.int64()),
                "n_b": pa.array([], type=pa.int64()),
                "part": pa.array([], type=pa.int64()),
            }
        )
        if group.num_rows == 0 or "g" not in group.column_names:
            return empty
        g = group["g"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = group["doc"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = group["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        if bipartite:
            sd = group["side"].to_numpy(zero_copy_only=False).astype(np.int64)
            order = np.lexsort((doc, sd, g))  # within a run: side 0 first
            g, doc, n, sd = g[order], doc[order], n[order], sd[order]
        else:
            order = np.lexsort((doc, g))
            g, doc, n = g[order], doc[order], n[order]
        starts = np.flatnonzero(np.concatenate(([True], g[1:] != g[:-1])))
        lens = np.diff(np.concatenate((starts, [g.shape[0]])))
        a_out, b_out, na_out, nb_out = [], [], [], []
        for s0, ln in zip(starts, lens):  # per posting LIST, not per row
            if ln < 2 or (df_cap is not None and ln > df_cap):
                continue
            ids = doc[s0 : s0 + ln]
            ns = n[s0 : s0 + ln]
            if bipartite:
                nl = int(np.searchsorted(sd[s0 : s0 + ln], 1))
                nr = ln - nl
                if nl == 0 or nr == 0:
                    continue
                a_out.append(np.repeat(ids[:nl], nr))
                b_out.append(np.tile(ids[nl:], nl))
                na_out.append(np.repeat(ns[:nl], nr))
                nb_out.append(np.tile(ns[nl:], nl))
            else:
                iu = np.triu_indices(ln, k=1)
                a_out.append(ids[iu[0]])
                b_out.append(ids[iu[1]])
                na_out.append(ns[iu[0]])
                nb_out.append(ns[iu[1]])
        if not a_out:
            return empty
        a = np.concatenate(a_out)
        b = np.concatenate(b_out)
        na = np.concatenate(na_out)
        nb = np.concatenate(nb_out)
        a2, b2, s_part, na2, nb2 = _pair_reduce(a, b, na, nb)
        # routing key only: the next kernel re-groups by the actual
        # (a, b) pair, so a fold collision merely co-locates two pairs
        part = (
            as_key_i64(
                mix_fold_u64(
                    [a2.astype(np.uint64), b2.astype(np.uint64)], salt=7
                )
            )
            % partitions
        )
        return pa.table(
            {
                "a": pa.array(a2),
                "b": pa.array(b2),
                "s": pa.array(s_part),
                "n_a": pa.array(na2),
                "n_b": pa.array(nb2),
                "part": pa.array(part),
            }
        )

    return postings.groupby("part").map_groups(kernel, batch_format="pyarrow")


def _finalize_exact(
    partials: ray.data.Dataset,
    *,
    num: int,
    den: int,
    out_a: str = "doc_a",
    out_b: str = "doc_b",
) -> ray.data.Dataset:
    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                out_a: pa.array([], type=pa.int64()),
                out_b: pa.array([], type=pa.int64()),
                "n_shared": pa.array([], type=pa.int64()),
                "n_a": pa.array([], type=pa.int64()),
                "n_b": pa.array([], type=pa.int64()),
                "jacc": pa.array([], type=pa.float64()),
            }
        )
        if group.num_rows == 0 or "a" not in group.column_names:
            return empty
        a = group["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = group["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = group["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        na = group["n_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = group["n_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        a_u, b_u, s_tot, na_u, nb_u = _pair_reduce(a, b, na, nb, s=s)
        keep = s_tot * (den + num) >= num * (na_u + nb_u)
        if not keep.any():
            return empty
        a_u, b_u, s_tot, na_u, nb_u = (
            a_u[keep],
            b_u[keep],
            s_tot[keep],
            na_u[keep],
            nb_u[keep],
        )
        denom = na_u + nb_u - s_tot
        return pa.table(
            {
                out_a: pa.array(a_u),
                out_b: pa.array(b_u),
                "n_shared": pa.array(s_tot),
                "n_a": pa.array(na_u),
                "n_b": pa.array(nb_u),
                # single exact-int division -> bit-identical across engines
                "jacc": pa.array(s_tot.astype(np.float64) / denom),
            }
        )

    return partials.groupby("part").map_groups(kernel, batch_format="pyarrow")


def _verify_prefix_candidates(
    partials: ray.data.Dataset,
    full_postings: ray.data.Dataset,
    *,
    num: int,
    den: int,
) -> ray.data.Dataset:
    """Prefix-mode tail: dedup candidate pairs, then re-verify exact
    intersections against an off-driver broadcast of the full sorted
    shingle sets (same remote-gather pattern as near_dupe's sig state)."""
    import ray as _ray

    mat = full_postings.materialize()
    if mat.count() > PREFIX_VERIFY_MAX_POSTINGS:
        raise ValueError(
            "prefix verify: postings exceed the broadcast budget "
            f"({PREFIX_VERIFY_MAX_POSTINGS}); run prefix=False (exact "
            "count plan, no broadcast) at this scale"
        )

    @_ray.remote
    def build(*tables: pa.Table) -> dict[int, np.ndarray]:
        t = pa.concat_tables([tb.select(["g", "doc"]) for tb in tables])
        g = t["g"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["doc"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((g, d))
        g, d = g[order], d[order]
        starts = np.flatnonzero(np.concatenate(([True], d[1:] != d[:-1])))
        bounds = np.concatenate((starts, [d.shape[0]]))
        return {
            int(d[s0]): g[s0 : bounds[i + 1]]
            for i, s0 in enumerate(starts)
        }

    state_ref = build.remote(*mat.to_arrow_refs())

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "n_shared": pa.array([], type=pa.int64()),
                "n_a": pa.array([], type=pa.int64()),
                "n_b": pa.array([], type=pa.int64()),
                "jacc": pa.array([], type=pa.float64()),
            }
        )
        if group.num_rows == 0 or "a" not in group.column_names:
            return empty
        sets = _ray.get(state_ref)
        av = group["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        bv = group["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((bv, av))
        av, bv = av[order], bv[order]
        new = np.concatenate(
            ([True], (av[1:] != av[:-1]) | (bv[1:] != bv[:-1]))
        )
        rows = []
        for a, b in zip(av[new], bv[new]):  # per CANDIDATE pair (prefix
            a, b = int(a), int(b)  # mode is the high-threshold path)
            sa, sb = sets[a], sets[b]
            s = np.intersect1d(sa, sb, assume_unique=True).shape[0]
            if s * (den + num) >= num * (sa.shape[0] + sb.shape[0]):
                rows.append(
                    (a, b, s, sa.shape[0], sb.shape[0],
                     s / (sa.shape[0] + sb.shape[0] - s))
                )
        if not rows:
            return empty
        cols = list(zip(*rows))
        return pa.table(
            {
                "doc_a": pa.array(np.array(cols[0], dtype=np.int64)),
                "doc_b": pa.array(np.array(cols[1], dtype=np.int64)),
                "n_shared": pa.array(np.array(cols[2], dtype=np.int64)),
                "n_a": pa.array(np.array(cols[3], dtype=np.int64)),
                "n_b": pa.array(np.array(cols[4], dtype=np.int64)),
                "jacc": pa.array(np.array(cols[5], dtype=np.float64)),
            }
        )

    return partials.groupby("part").map_groups(kernel, batch_format="pyarrow")


def similarity_join_pairs(
    docs: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_num: int = 1,
    threshold_den: int = 20,
    shingle_k: int = 3,
    partitions: int = 32,
    prefix: bool = False,
    df_cap: int | None = None,
) -> ray.data.Dataset:
    """All (doc_a < doc_b) pairs with shingle-set Jaccard >=
    threshold_num/threshold_den -> (doc_a, doc_b, n_shared, n_a, n_b,
    jacc).  ``prefix=False`` is the exact count plan (two skinny
    exchanges, no broadcast); ``prefix=True`` indexes only each doc's
    prefix and re-verifies — the high-threshold path."""
    if not (0 < threshold_num <= threshold_den):
        raise ValueError("threshold must be a rational in (0, 1]")
    thr = (threshold_num, threshold_den) if prefix else None
    posts = _postings(
        docs,
        id_col=id_col,
        text_col=text_col,
        shingle_k=shingle_k,
        partitions=partitions,
        threshold=thr,
    )
    partials = _pair_partials(posts, partitions=partitions, df_cap=df_cap)
    if not prefix:
        return _finalize_exact(
            partials, num=threshold_num, den=threshold_den
        )
    full = _postings(
        docs,
        id_col=id_col,
        text_col=text_col,
        shingle_k=shingle_k,
        partitions=partitions,
        threshold=None,
    )
    return _verify_prefix_candidates(
        partials, full, num=threshold_num, den=threshold_den
    )


def similarity_join_bipartite(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_num: int = 1,
    threshold_den: int = 20,
    shingle_k: int = 4,
    partitions: int = 32,
    df_cap: int | None = None,
    out_a: str = "doc_a",
    out_b: str = "doc_b",
) -> ray.data.Dataset:
    """Cross-side set-similarity threshold join: all (left, right) pairs
    with shingle-set Jaccard >= num/den — the FUZZY train/eval overlap
    detector (contamination_flags/contamination_ngram catch verbatim
    leaks; this catches paraphrased/partially-edited ones).  Same two
    skinny exchanges as the self-join; posting lists cross-pair
    left x right only, so within-side duplicates never cost pairs."""
    if not (0 < threshold_num <= threshold_den):
        raise ValueError("threshold must be a rational in (0, 1]")
    posts_l = _postings(
        left,
        id_col=id_col,
        text_col=text_col,
        shingle_k=shingle_k,
        partitions=partitions,
        threshold=None,
        side=0,
    )
    posts_r = _postings(
        right,
        id_col=id_col,
        text_col=text_col,
        shingle_k=shingle_k,
        partitions=partitions,
        threshold=None,
        side=1,
    )
    partials = _pair_partials(
        posts_l.union(posts_r),
        partitions=partitions,
        df_cap=df_cap,
        bipartite=True,
    )
    return _finalize_exact(
        partials,
        num=threshold_num,
        den=threshold_den,
        out_a=out_a,
        out_b=out_b,
    )


def source_gram_overlap(
    docs: ray.data.Dataset,
    *,
    key_col: str = "source",
    text_col: str = "text",
    shingle_k: int = 4,
    partitions: int = 32,
) -> pa.Table:
    """Cross-GROUP shared-shingle matrix: for every pair of groups (e.g.
    sources / corpora / train-vs-eval splits), the number of word-k-gram
    shingles their UNIONED documents share, plus each group's distinct
    total and the group-level Jaccard — the rollup that answers "which
    corpora overlap, and how much" one level above the per-document joins
    (similar_doc_pairs / eval_overlap_pairs).

    Physical plan: the postings pass emits per-batch DISTINCT
    (gram_hash, group) rows (8 B keys — gram strings never leave the
    batch); ONE exchange on gram%P; each partition dedupes (gram, group)
    across batches, then collapses every gram's group-set to a BITMASK
    (np.bitwise_or.reduceat — one uint64 per gram) and pair-counts by
    np.unique over DISTINCT MASKS, so the Python cost is the number of
    distinct group-combinations (<< grams); per-partition partials are
    <= |groups|^2 skinny rows + |groups| totals, merged in one final
    task.  Grams partition disjointly, so partition counts sum exactly.

    Groups are capped at 64 per partition (one machine word); a wider
    matrix would split the mask into words — loud error, not silence.
    """

    def postings(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "g": pa.array([], type=pa.int64()),
                "src": pa.array([], type=pa.string()),
                "part": pa.array([], type=pa.int64()),
            }
        )
        if batch.num_rows == 0 or text_col not in batch.column_names:
            return empty
        txt = pc.utf8_trim_whitespace(batch[text_col].cast(pa.large_string()))
        lists = pc.split_pattern_regex(txt, pattern=r"\s+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        total = len(flat)
        if total < shingle_k:
            return empty
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary.to_pylist()
        vh = np.fromiter(
            (
                int.from_bytes(
                    hashlib.blake2b(
                        (s or "").encode("utf-8"), digest_size=8
                    ).digest(),
                    "big",
                )
                for s in vocab
            ),
            dtype=np.uint64,
            count=len(vocab),
        )
        th = vh[codes]
        m = total - shingle_k + 1
        fold = mix_fold_u64(
            [th[j : j + m] for j in range(shingle_k)], salt=shingle_k
        )
        valid = parent[:m] == parent[shingle_k - 1 :]
        if not valid.any():
            return empty
        g = as_key_i64(fold[valid])
        didx = parent[:m][valid].astype(np.int64)
        src = batch[key_col]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        scodes = (
            pc.dictionary_encode(src)
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        sc = scodes[didx]
        # per-batch DISTINCT (gram, group)
        order = np.lexsort((g, sc))
        sc, g = sc[order], g[order]
        keep = np.concatenate(
            ([True], (sc[1:] != sc[:-1]) | (g[1:] != g[:-1]))
        )
        sc, g = sc[keep], g[keep]
        svals = pc.dictionary_encode(src).dictionary
        return pa.table(
            {
                "g": pa.array(g),
                "src": svals.take(pa.array(sc, type=pa.int64())),
                "part": pa.array(g % partitions),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "src_a": pa.nulls(0, pa.string()),
                "src_b": pa.nulls(0, pa.string()),
                "cnt": pa.nulls(0, pa.int64()),
                "kind": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "g" not in group.column_names:
            return empty
        g = group["g"].to_numpy(zero_copy_only=False)
        src = np.asarray(group["src"].to_pylist(), dtype=object)
        uniq_src, codes = np.unique(src, return_inverse=True)
        if uniq_src.shape[0] > 64:
            raise ValueError(
                "source_gram_overlap: > 64 distinct groups; widen the "
                "mask to multiple words for wider matrices"
            )
        order = np.lexsort((codes, g))
        g, codes = g[order], codes[order]
        keep = np.concatenate(
            ([True], (g[1:] != g[:-1]) | (codes[1:] != codes[:-1]))
        )
        g, codes = g[keep], codes[keep]
        # per-group distinct totals (grams partition disjointly -> sums
        # across partitions are exact global distinct counts)
        totals = np.bincount(codes, minlength=uniq_src.shape[0])
        # gram -> group bitmask
        starts = np.flatnonzero(np.concatenate(([True], g[1:] != g[:-1])))
        masks = np.bitwise_or.reduceat(
            (np.uint64(1) << codes.astype(np.uint64)), starts
        )
        um, uc = np.unique(masks, return_counts=True)
        pair_cnt: dict[tuple[int, int], int] = {}
        for mval, c in zip(um, uc):  # per distinct group-COMBINATION
            bits = [b for b in range(uniq_src.shape[0]) if (int(mval) >> b) & 1]
            if len(bits) < 2:
                continue
            for x in range(len(bits)):
                for y in range(x + 1, len(bits)):
                    key = (bits[x], bits[y])
                    pair_cnt[key] = pair_cnt.get(key, 0) + int(c)
        src_a = [str(uniq_src[a]) for a, b in pair_cnt] + [
            str(s) for s in uniq_src
        ]
        src_b = [str(uniq_src[b]) for a, b in pair_cnt] + [""] * len(uniq_src)
        cnt = list(pair_cnt.values()) + totals.tolist()
        kind = [0] * len(pair_cnt) + [1] * len(uniq_src)
        return pa.table(
            {
                "src_a": pa.array(src_a, type=pa.string()),
                "src_b": pa.array(src_b, type=pa.string()),
                "cnt": pa.array(cnt, type=pa.int64()),
                "kind": pa.array(kind, type=pa.int64()),
            }
        )

    partials = (
        docs.map_batches(postings, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )

    @ray.remote
    def gather(*blocks):
        import pandas as pd

        frames = [
            b.to_pandas()
            for b in blocks
            if b.num_rows and "src_a" in b.column_names
        ]
        if not frames:
            return pa.table(
                {
                    "src_a": pa.nulls(0, pa.string()),
                    "src_b": pa.nulls(0, pa.string()),
                    "n_shared": pa.nulls(0, pa.int64()),
                    "n_a": pa.nulls(0, pa.int64()),
                    "n_b": pa.nulls(0, pa.int64()),
                    "jacc": pa.nulls(0, pa.float64()),
                }
            )
        df = pd.concat(frames, ignore_index=True)
        agg = (
            df.groupby(["kind", "src_a", "src_b"], sort=True)["cnt"]
            .sum()
            .reset_index()
        )
        tot = dict(
            zip(agg[agg.kind == 1].src_a, agg[agg.kind == 1].cnt)
        )
        pairs = agg[agg.kind == 0]
        n_a = pairs.src_a.map(tot).astype("int64")
        n_b = pairs.src_b.map(tot).astype("int64")
        s = pairs.cnt.astype("int64")
        return pa.table(
            {
                "src_a": pa.array(pairs.src_a.tolist(), type=pa.string()),
                "src_b": pa.array(pairs.src_b.tolist(), type=pa.string()),
                "n_shared": pa.array(s.to_numpy()),
                "n_a": pa.array(n_a.to_numpy()),
                "n_b": pa.array(n_b.to_numpy()),
                "jacc": pa.array(
                    s.to_numpy() * 1.0
                    / (n_a.to_numpy() + n_b.to_numpy() - s.to_numpy())
                ),
            }
        )

    return ray.get(gather.remote(*partials.materialize().to_arrow_refs()))
