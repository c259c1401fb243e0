"""Content-defined chunking (CDC) dedup — partial/embedded duplication.

Whole-document hashing (exact dedup) and shingle similarity (the flagship)
both miss the storage-style question: WHICH BYTES of the corpus are
duplicated, including a file embedded inside a larger one or repeated
boilerplate regions.  CDC answers it the way dedup storage systems do
(Gear-hash FastCDC family, built from the published algorithm
descriptions; the reference's suffix-array substring pass —
`reference/src/string_similarity.c` analog in pipelines/substring.py —
finds exact spans WITHIN candidate bands, while CDC fingerprints every
byte of every doc against the whole corpus):

  1. a Gear rolling hash over the content bytes (h = h<<1 + GEAR[byte],
     an implicit 64-byte window) — computed VECTORIZED as the closed form
     h[t] = sum_{j<W} GEAR[b[t-j]] << j, i.e. W shifted adds over the
     flat byte buffer, cache-blocked like every other byte kernel here;
  2. chunk boundaries where h & mask == 0 (expected chunk = 2^bits
     bytes), plus every doc start — boundaries depend only on local
     CONTENT, so inserting bytes only re-chunks the insertion's
     neighborhood (the shift-robustness exact dedup lacks);
  3. a per-chunk 64-bit fingerprint (xor-fold of the in-chunk gear states
     mixed with the chunk length — vectorized bitwise_xor.reduceat; a
     fingerprint like SimHash, not a cryptographic digest: collisions are
     possible and documented; the gear states of a chunk's first W-1
     bytes also see the PRECEDING in-doc bytes, so the fingerprint is a
     function of (chunk bytes, left W-1 bytes) — identical whole docs and
     the interior of embedded copies still match chunk-for-chunk, only a
     copy's first post-boundary chunk can differ; smaller W tightens
     this, one reason W=16 detects slightly MORE true sharing than 48)
     keyed (chunk_hash, doc) leaves the batch — 8+8 B per ~2^bits
     content bytes, content itself never shuffles;
  4. ONE exchange on chunk%P; each partition marks chunks whose posting
     list spans >= 2 DISTINCT docs and pre-aggregates per-doc shared
     counts; a final skinny doc%P exchange sums (docs appear in many
     partitions) and emits per-doc chunk-duplication stats.

Scale: exchange = 16 B per chunk (~2^bits content bytes), partition
counts sum exactly, no driver materialization; hot chunks (boilerplate
shared by all docs) cost O(df) rows, never O(df^2) — the kernel only
needs the distinct-doc count per chunk, not pairs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from libpostal_ray.config import PipelineConfig

GEAR_WINDOW = 16  # closed-form window: bytes older than W have shifted out.
# Boundary decisions read only the LOW boundary_bits of h, and bit k of the
# closed form integrates bytes up to age k — so boundaries depend on just
# the trailing ~8 bytes and are IDENTICAL for any W >= boundary_bits (small
# context = maximal shift robustness); the extra window width only feeds
# the 64-bit chunk fingerprint's mixing.  W=16 is the measured sweet spot:
# halving compute vs 32/48 with no boundary change.


def _gear_table() -> np.ndarray:
    """Deterministic 256-entry uint64 gear table (splitmix64 of index)."""
    x = np.arange(256, dtype=np.uint64)
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


_GEAR = _gear_table()


def _gear_hash(data: np.ndarray, chunk_bytes: int = 1 << 16) -> np.ndarray:
    """Vectorized Gear rolling hash over a flat uint8 buffer:
    h[t] = sum_{j < W} GEAR[b[t-j]] << j (mod 2^64).  Cache-blocked over
    64 KB output ranges (8 B/byte temporaries must stay in L2: 64 KB was
    measured 3x faster than 1 MB blocks single-threaded on this host —
    CLAUDE.md DRAM discipline) with a W-byte overlap re-read so block
    edges are seamless."""
    n = data.shape[0]
    out = np.empty(n, dtype=np.uint64)
    g = _GEAR
    for s in range(0, n, chunk_bytes):
        e = min(s + chunk_bytes, n)
        lo = max(0, s - (GEAR_WINDOW - 1))
        gb = g[data[lo:e]]
        acc = gb.copy()
        for j in range(1, GEAR_WINDOW):
            acc[j:] += gb[:-j] << np.uint64(j)
        out[s:e] = acc[s - lo :]
    return out


def _mix64(v: np.ndarray) -> np.ndarray:
    v = (v ^ (v >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    v = (v ^ (v >> np.uint64(33))) * np.uint64(0xC4CEB9FE1A85EC53)
    return v ^ (v >> np.uint64(33))


def doc_chunk_hashes(
    data: np.ndarray, off: np.ndarray, *, boundary_bits: int = 8
) -> tuple[np.ndarray, np.ndarray]:
    """(doc_idx, chunk_hash) for every CDC chunk of every doc.

    Boundaries: position t ends a chunk when gear_hash[t] has its low
    ``boundary_bits`` bits zero (expected chunk = 2^bits bytes) or t is
    the doc's last byte.  Pure content-defined — no min/max bound, so
    chunking is a deterministic function of the doc's bytes alone and
    identical wherever those bytes appear (the property the tests pin).

    The hash runs over a PADDED copy of the flat buffer (W zero bytes
    before every doc) so no window crosses a doc boundary: without the
    pad, a doc's first W-1 gear states would depend on whichever doc
    happened to precede it in the batch, and identical docs in different
    batches would chunk differently.  With it, the first bytes see a
    CONSTANT virtual prefix — still a function of (content, position)."""
    n = data.shape[0]
    nrows = off.shape[0] - 1
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    doc_of = np.searchsorted(off, np.arange(n), side="right") - 1
    new_pos = np.arange(n, dtype=np.int64) + GEAR_WINDOW * (doc_of + 1)
    padded = np.zeros(n + GEAR_WINDOW * nrows, dtype=np.uint8)
    padded[new_pos] = data
    h = _gear_hash(padded)[new_pos]
    mask = np.uint64((1 << boundary_bits) - 1)
    is_b = (h & mask) == 0
    # every doc's final byte is a boundary
    ends = off[1:] - 1
    ends = ends[off[1:] > off[:-1]]
    is_b[ends] = True
    bpos = np.flatnonzero(is_b)
    bdoc = doc_of[bpos]
    # chunk start = previous boundary + 1 within the same doc, else doc off
    prev = np.concatenate(([np.int64(-1)], bpos[:-1]))
    same = np.concatenate(([False], bdoc[1:] == bdoc[:-1]))
    starts = np.where(same, prev + 1, off[bdoc])
    # fingerprint: xor-fold of gear states in [start, pos] mixed w/ length
    cum = np.bitwise_xor.accumulate(h)
    xh = cum[bpos]
    before = starts > 0
    xh[before] ^= cum[starts[before] - 1]
    length = (bpos - starts + 1).astype(np.uint64)
    return bdoc.astype(np.int64), _mix64(xh ^ _mix64(length))


def chunk_dup_stats(
    docs: ray.data.Dataset,
    cfg: PipelineConfig | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "content",
    boundary_bits: int = 8,
    partitions: int = 32,
) -> ray.data.Dataset:
    """Per-doc CDC chunk-duplication stats: (doc_id, n_chunks, n_shared,
    shared_frac) where n_shared counts the doc's chunks whose fingerprint
    occurs in >= 2 DISTINCT docs corpus-wide."""
    from libpostal_ray.pipelines.lm import _doc_byte_views

    def postings(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "c": pa.array([], type=pa.int64()),
                "doc": pa.array([], type=pa.int64()),
                "part": pa.array([], type=pa.int64()),
            }
        )
        if batch.num_rows == 0 or text_col not in batch.column_names:
            return empty
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        col = batch[text_col]
        if isinstance(col, pa.Array):
            col = pa.chunked_array([col])
        data, off = _doc_byte_views(col)
        didx, ch = doc_chunk_hashes(data, off, boundary_bits=boundary_bits)
        c = (ch >> np.uint64(1)).astype(np.int64)  # non-negative int64 key
        return pa.table(
            {
                "c": pa.array(c),
                "doc": pa.array(ids[didx]),
                "part": pa.array(c % partitions),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc": pa.nulls(0, pa.int64()),
                "n": pa.nulls(0, pa.int64()),
                "s": pa.nulls(0, pa.int64()),
                "part": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "c" not in group.column_names:
            return empty
        c = group["c"].to_numpy(zero_copy_only=False)
        d = group["doc"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, c))
        c, d = c[order], d[order]
        # per (chunk, doc): how many instances, and is the chunk shared?
        starts = np.flatnonzero(np.concatenate(([True], c[1:] != c[:-1])))
        lens = np.diff(np.concatenate((starts, [c.shape[0]])))
        pair_new = np.concatenate(
            ([True], (c[1:] != c[:-1]) | (d[1:] != d[:-1]))
        )
        # distinct docs per chunk = pair_new count within the segment
        ndocs = np.add.reduceat(pair_new.astype(np.int64), starts)
        shared = np.repeat(ndocs >= 2, lens)
        # per-doc totals within this partition
        ud, inv = np.unique(d, return_inverse=True)
        n_tot = np.bincount(inv, minlength=ud.shape[0])
        n_sh = np.bincount(
            inv, weights=shared.astype(np.float64), minlength=ud.shape[0]
        ).astype(np.int64)
        return pa.table(
            {
                "doc": pa.array(ud),
                "n": pa.array(n_tot.astype(np.int64)),
                "s": pa.array(n_sh),
                "part": pa.array(ud % partitions),
            }
        )

    def finish(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.nulls(0, pa.int64()),
                "n_chunks": pa.nulls(0, pa.int64()),
                "n_shared": pa.nulls(0, pa.int64()),
                "shared_frac": pa.nulls(0, pa.float64()),
            }
        )
        if group.num_rows == 0 or "doc" not in group.column_names:
            return empty
        d = group["doc"].to_numpy(zero_copy_only=False)
        n = group["n"].to_numpy(zero_copy_only=False)
        s = group["s"].to_numpy(zero_copy_only=False)
        ud, inv = np.unique(d, return_inverse=True)
        tn = np.bincount(inv, weights=n.astype(np.float64)).astype(np.int64)
        ts = np.bincount(inv, weights=s.astype(np.float64)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ud),
                "n_chunks": pa.array(tn),
                "n_shared": pa.array(ts),
                "shared_frac": pa.array(ts * 1.0 / np.maximum(tn, 1)),
            }
        )

    return (
        docs.map_batches(postings, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .groupby("part")
        .map_groups(finish, batch_format="pyarrow")
    )


def chunk_containment_pairs(
    docs: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "content",
    boundary_bits: int = 8,
    partitions: int = 32,
    df_cap: int = 256,
    min_containment_num: int = 1,
    min_containment_den: int = 2,
) -> ray.data.Dataset:
    """Doc pairs related by chunk CONTAINMENT: (doc_a, doc_b, n_shared,
    n_a, n_b, containment) where containment = shared distinct chunks /
    min(n_a, n_b) >= num/den — the "file A is embedded in file B"
    relation (vendored single files, concatenated bundles) that whole-doc
    similarity scores dilute away (Jaccard of a small file inside a big
    one is tiny; containment is ~1).

    Plan: postings carry (chunk, doc, n=doc's DISTINCT chunk count — known
    in-batch since map_batches sees whole rows, so no sizes join later);
    one chunk%P exchange; per partition each chunk's 2..df_cap distinct
    docs emit sorted pairs, pre-aggregated vectorized (lexsort + segment
    sums, never np.unique(axis=0)); one skinny pair%P exchange sums
    across partitions and applies the INTEGER threshold den*s >=
    num*min(n_a,n_b).  Chunks with > df_cap docs are skipped — the
    boilerplate-stop-shingle discipline (documented under-approximation,
    same as simjoin's df_cap / LSH hot-bucket cap); exact-dup families
    rank as containment 1.0 pairs up to the cap."""
    from libpostal_ray.pipelines.lm import _doc_byte_views

    def postings(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "c": pa.array([], type=pa.int64()),
                "doc": pa.array([], type=pa.int64()),
                "n": pa.array([], type=pa.int64()),
                "part": pa.array([], type=pa.int64()),
            }
        )
        if batch.num_rows == 0 or text_col not in batch.column_names:
            return empty
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        col = batch[text_col]
        if isinstance(col, pa.Array):
            col = pa.chunked_array([col])
        data, off = _doc_byte_views(col)
        didx, ch = doc_chunk_hashes(data, off, boundary_bits=boundary_bits)
        c = (ch >> np.uint64(1)).astype(np.int64)
        # per-doc DISTINCT chunks (dedupe repeated chunks within a doc)
        order = np.lexsort((c, didx))
        didx, c = didx[order], c[order]
        keep = np.concatenate(
            ([True], (didx[1:] != didx[:-1]) | (c[1:] != c[:-1]))
        )
        didx, c = didx[keep], c[keep]
        n_of = np.bincount(didx, minlength=batch.num_rows)
        return pa.table(
            {
                "c": pa.array(c),
                "doc": pa.array(ids[didx]),
                "n": pa.array(n_of[didx].astype(np.int64)),
                "part": pa.array(c % partitions),
            }
        )

    def pair_kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "a": pa.nulls(0, pa.int64()),
                "b": pa.nulls(0, pa.int64()),
                "na": pa.nulls(0, pa.int64()),
                "nb": pa.nulls(0, pa.int64()),
                "s": pa.nulls(0, pa.int64()),
                "part": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "c" not in group.column_names:
            return empty
        c = group["c"].to_numpy(zero_copy_only=False)
        d = group["doc"].to_numpy(zero_copy_only=False)
        n = group["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, c))
        c, d, n = c[order], d[order], n[order]
        starts = np.flatnonzero(np.concatenate(([True], c[1:] != c[:-1])))
        lens = np.diff(np.concatenate((starts, [c.shape[0]])))
        a_out, b_out, na_out, nb_out = [], [], [], []
        for s0, ln in zip(starts, lens):  # per chunk, docs sorted by id
            if ln < 2 or ln > df_cap:
                continue
            dd = d[s0 : s0 + ln]
            nn = n[s0 : s0 + ln]
            iu, ju = np.triu_indices(ln, k=1)
            a_out.append(dd[iu])
            b_out.append(dd[ju])
            na_out.append(nn[iu])
            nb_out.append(nn[ju])
        if not a_out:
            return empty
        a = np.concatenate(a_out)
        b = np.concatenate(b_out)
        na = np.concatenate(na_out)
        nb = np.concatenate(nb_out)
        # pre-aggregate per (a, b) vectorized
        order = np.lexsort((b, a))
        a, b, na, nb = a[order], b[order], na[order], nb[order]
        new = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
        st = np.flatnonzero(new)
        cnt = np.diff(np.concatenate((st, [a.shape[0]]))).astype(np.int64)
        a, b, na, nb = a[st], b[st], na[st], nb[st]
        return pa.table(
            {
                "a": pa.array(a),
                "b": pa.array(b),
                "na": pa.array(na),
                "nb": pa.array(nb),
                "s": pa.array(cnt),
                "part": pa.array((a ^ b) % partitions),
            }
        )

    def finalize(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.nulls(0, pa.int64()),
                "doc_b": pa.nulls(0, pa.int64()),
                "n_shared": pa.nulls(0, pa.int64()),
                "n_a": pa.nulls(0, pa.int64()),
                "n_b": pa.nulls(0, pa.int64()),
                "containment": pa.nulls(0, pa.float64()),
            }
        )
        if group.num_rows == 0 or "a" not in group.column_names:
            return empty
        a = group["a"].to_numpy(zero_copy_only=False)
        b = group["b"].to_numpy(zero_copy_only=False)
        na = group["na"].to_numpy(zero_copy_only=False)
        nb = group["nb"].to_numpy(zero_copy_only=False)
        s = group["s"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b, na, nb, s = a[order], b[order], na[order], nb[order], s[order]
        new = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
        st = np.flatnonzero(new)
        tot = np.add.reduceat(s, st)
        a, b, na, nb = a[st], b[st], na[st], nb[st]
        mn = np.minimum(na, nb)
        keep = min_containment_den * tot >= min_containment_num * mn
        if not keep.any():
            return empty
        a, b, na, nb, tot, mn = (
            a[keep], b[keep], na[keep], nb[keep], tot[keep], mn[keep]
        )
        return pa.table(
            {
                "doc_a": pa.array(a),
                "doc_b": pa.array(b),
                "n_shared": pa.array(tot),
                "n_a": pa.array(na),
                "n_b": pa.array(nb),
                "containment": pa.array(tot * 1.0 / mn),
            }
        )

    return (
        docs.map_batches(postings, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pair_kernel, batch_format="pyarrow")
        .groupby("part")
        .map_groups(finalize, batch_format="pyarrow")
    )
