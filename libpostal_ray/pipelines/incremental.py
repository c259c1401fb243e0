"""Incremental (delta) deduplication: dedupe a NEW batch of documents
against an existing corpus — the daily-ingest shape of a training-data
pipeline, where re-clustering the full corpus per delivery is the wrong
plan.

The reference library is one-shot (`libpostal_near_dupe_hashes` has no
index persistence, near_dupe.c:643-1216); this operator exists because a
100 TB corpus is APPEND-ONLY in practice and the engine must answer "which
of today's N documents are already in (or duplicated within) the corpus"
without touching corpus content again.

Physical plan — ONE exchange over both corpora, no special-cased index:

  1. ``signatures(corpus.union(new))`` — the same stateless
     canonicalize->sketch stages as the flagship; content is dropped
     before anything shuffles.  The corpus side's signatures can come
     from a checkpoint (state/checkpoint.py) so corpus content is read
     ZERO times on the steady path.
  2. ``candidate_edges`` — the flagship's band-key exchange + fused
     verify; cross-side and within-batch pairs fall out of the same
     bucket groupby at no extra cost.
  3. classify: the NEW side's doc-id set is broadcast (the delta is the
     small side by definition); each >= LIKELY edge classifies its
     new-side endpoint(s) — ``dup_of_corpus`` wins over
     ``dup_in_batch`` (matched to the smallest corpus id for a
     deterministic report); a batch-internal edge marks only the LARGER
     id a dup, so one representative per within-batch pair chain
     survives (edge-local rule: full transitive closure is the
     re-cluster pipeline's job, documented trade-off).
  4. a final ``map_batches`` over the new batch joins the (small)
     verdict map back — every new doc gets a row:
     (doc_id, verdict, match_id), match_id = -1 for keeps.

Scale: the only all-to-all is the flagship's 24 B/row band-key exchange
over corpus+delta signatures; corpus-internal edges are dropped
distributively against the broadcast delta-id set before the verdict
gather, so the single classify task and the verdict map are both
O(delta-touching edges), never O(corpus).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from libpostal_ray.config import PipelineConfig
from libpostal_ray.pipelines.near_dupe import candidate_edges, signatures
from libpostal_ray.stages.verify import STATUS_LIKELY

VERDICT_KEEP = "keep"
VERDICT_DUP_CORPUS = "dup_of_corpus"
VERDICT_DUP_BATCH = "dup_in_batch"


def _ids_of(ds: ray.data.Dataset) -> "ray.ObjectRef":
    """Sorted unique int64 doc_id array of a dataset, built off-driver."""

    @ray.remote
    def gather(*blocks: pa.Table) -> np.ndarray:
        parts = [
            b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
            for b in blocks
            if b.num_rows > 0 and "doc_id" in b.column_names
        ]
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(parts))

    return gather.remote(
        *ds.select_columns(["doc_id"]).materialize().to_arrow_refs()
    )


def dedup_against_corpus(
    new_docs: ray.data.Dataset,
    corpus: ray.data.Dataset | None,
    cfg: PipelineConfig | None = None,
    *,
    corpus_sigs: ray.data.Dataset | None = None,
    new_sigs: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """(doc_id, verdict, match_id) for every row of ``new_docs``.

    ``corpus_sigs``: pass the corpus' signature table (e.g. loaded from a
    flagship-run checkpoint) to skip re-reading corpus content entirely.
    ``new_sigs``: pass the delta's own (materialized) signature table when
    the caller also persists it — avoids sketching the delivery twice.
    Both corpora must use the canonical corpus schema (sources/readers)
    and disjoint doc ids (readers derive collision-free 63-bit ids).
    """
    cfg = cfg or PipelineConfig()
    if corpus is None and corpus_sigs is None:
        raise ValueError("dedup_against_corpus needs corpus or corpus_sigs")
    new_ids_ref = _ids_of(new_docs)

    sig_new = new_sigs if new_sigs is not None else signatures(new_docs, cfg)
    sig_corpus = corpus_sigs if corpus_sigs is not None else signatures(corpus, cfg)
    all_edges = candidate_edges(sig_corpus.union(sig_new), cfg)

    # a standing corpus emits mostly corpus-internal near-dup edges, which
    # are irrelevant to the delta verdict (corpus matches are terminal in
    # the compression below) — drop them DISTRIBUTIVELY against the
    # broadcast delta-id set so the single classify gather only ever sees
    # O(delta-touching) edges, not O(corpus-internal) ones
    def delta_only(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "src" not in batch.column_names:
            return batch
        new_ids = ray.get(new_ids_ref)
        src = batch.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        dst = batch.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        st = batch.column("status").to_numpy(zero_copy_only=False)
        touches = np.isin(src, new_ids, assume_unique=False) | np.isin(
            dst, new_ids, assume_unique=False
        )
        return batch.filter(pa.array((st >= STATUS_LIKELY) & touches))

    edges = all_edges.map_batches(delta_only, batch_format="pyarrow")

    @ray.remote
    def classify(new_ids: np.ndarray, *blocks: pa.Table):
        """Edge blocks -> (new_doc -> (verdict_rank, match_id)) arrays.
        Corpus match beats batch match; smallest match id wins for
        determinism."""
        flag_doc, flag_match, flag_corp = [], [], []
        for b in blocks:
            if b.num_rows == 0 or "src" not in b.column_names:
                continue
            st = b.column("status").to_numpy(zero_copy_only=False)
            src = b.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
            dst = b.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
            # src==dst edges only arise when the two corpora share a doc id
            # (a documented contract violation) — never let one mark a doc
            # a duplicate of itself
            keep = (st >= STATUS_LIKELY) & (src != dst)
            if not keep.any():
                continue
            src, dst = src[keep], dst[keep]
            s_new = np.isin(src, new_ids, assume_unique=False)
            d_new = np.isin(dst, new_ids, assume_unique=False)
            # cross-side edges: the new endpoint matched a corpus doc
            for a, bb, a_new, b_new in ((src, dst, s_new, d_new), (dst, src, d_new, s_new)):
                m = a_new & ~b_new
                if m.any():
                    flag_doc.append(a[m])
                    flag_match.append(bb[m])
                    flag_corp.append(np.ones(int(m.sum()), dtype=bool))
            # batch-internal edges: only the LARGER id is a dup
            m = s_new & d_new
            if m.any():
                hi = np.maximum(src[m], dst[m])
                lo = np.minimum(src[m], dst[m])
                flag_doc.append(hi)
                flag_match.append(lo)
                flag_corp.append(np.zeros(int(m.sum()), dtype=bool))
        if not flag_doc:
            return None
        doc = np.concatenate(flag_doc)
        match = np.concatenate(flag_match)
        corp = np.concatenate(flag_corp)
        # per doc: corpus verdict first, then smallest match id
        order = np.lexsort((match, ~corp, doc))
        doc, match, corp = doc[order], match[order], corp[order]
        first = np.concatenate(([True], doc[1:] != doc[:-1]))
        doc, match, corp = doc[first], match[first], corp[first]
        # path-compress verdict chains: sha-collapse star pairing emits
        # exact-group edges through ONE representative, so a delta doc
        # equal to corpus content may reach the corpus only via another
        # delta doc.  Follow match pointers to their fixpoint (batch
        # matches strictly decrease, corpus matches are terminal — no
        # cycles); a hop onto a corpus-flagged doc promotes the verdict.
        while doc.shape[0]:
            pos = np.searchsorted(doc, match)
            posc = np.clip(pos, 0, doc.shape[0] - 1)
            hit = (pos < doc.shape[0]) & (doc[posc] == match)
            nm = np.where(hit, match[posc], match)
            nc = corp | (hit & corp[posc])
            if (nm == match).all() and (nc == corp).all():
                break
            match, corp = nm, nc
        return doc, match, corp

    verdict_ref = classify.remote(new_ids_ref, *edges.materialize().to_arrow_refs())

    def report(batch: pa.Table) -> pa.Table:
        st = ray.get(verdict_ref)
        ids = batch["doc_id"].cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        n = ids.shape[0]
        verdict = np.full(n, VERDICT_KEEP, dtype=object)
        match = np.full(n, -1, dtype=np.int64)
        if st is not None:
            doc, m, corp = st
            pos = np.searchsorted(doc, ids)
            posc = np.clip(pos, 0, doc.shape[0] - 1)
            hit = (pos < doc.shape[0]) & (doc[posc] == ids)
            match[hit] = m[posc[hit]]
            verdict[hit] = np.where(
                corp[posc[hit]], VERDICT_DUP_CORPUS, VERDICT_DUP_BATCH
            )
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "verdict": pa.array(verdict.tolist(), type=pa.string()),
                "match_id": pa.array(match, type=pa.int64()),
            }
        )

    return new_docs.map_batches(report, batch_format="pyarrow")


def corpus_upsert(
    base: ray.data.Dataset,
    delta: ray.data.Dataset,
    *,
    key: str = "doc_id",
) -> ray.data.Dataset:
    """SCD-1 upsert: the merged corpus where every ``key`` present in
    ``delta`` takes the delta row and every other base row passes through
    — the periodic-refresh primitive (yesterday's corpus + today's
    re-crawl) upstream of incremental dedup.

    Physical plan: the delta KEY SET (8 B/id, built off-driver by
    ``_ids_of``) broadcasts once; the base streams through a searchsorted
    anti-filter (the repo-wide anti-join discipline — the big side never
    shuffles, there is no join operator) and the delta unions in behind
    it.  Columns must match; output row count =
    |base| - |base ∩ delta| + |delta|.  At a delta too large for an id
    broadcast, chunk the delta and fold this same upsert per chunk —
    NOT a hash join of the full base: a re-crawl delta is orders of
    magnitude smaller than the corpus by construction."""
    delta_ids_ref = _ids_of(delta)

    base_names = list(base.schema().base_schema.names)
    delta_names = list(delta.schema().base_schema.names)
    if base_names != delta_names:
        raise ValueError(f"schema mismatch: {base_names} vs {delta_names}")

    def anti(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        ids = ray.get(delta_ids_ref)
        k = batch.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        if ids.shape[0] == 0:
            return batch
        pos = np.searchsorted(ids, k)
        posc = np.clip(pos, 0, ids.shape[0] - 1)
        replaced = (pos < ids.shape[0]) & (ids[posc] == k)
        return batch.filter(pa.array(~replaced))

    return base.map_batches(anti, batch_format="pyarrow").union(delta)


def corpus_upsert_scd2(
    base: ray.data.Dataset,
    delta: ray.data.Dataset,
    *,
    key: str = "doc_id",
    text_col: str = "text",
    base_from: int = 0,
    as_of: int = 100,
    forever: int = 9999,
) -> ray.data.Dataset:
    """SCD-2 (history-keeping) upsert: like ``corpus_upsert`` but changed
    rows are VERSIONED instead of replaced — the old row closes at
    ``as_of`` (is_current=0) and the delta row opens there; identical
    delta rows add no version; delta-only keys open new current rows.
    Output columns: key, text_col, valid_from, valid_to, is_current.

    Physical plan — composition over snapshot_diff (the CDC operator):

      1. snapshot_diff(base, delta, statuses=("added","changed")) — ONE
         32 B/row digest exchange classifies every key; 'removed' is
         dropped in-kernel so the verdict stream is O(|delta|).
      2. the verdict gathers off-driver into two sorted id arrays
         (close = changed; emit = changed + added), broadcast once.
      3. base streams through a searchsorted lookup emitting one row per
         input row (closed or still-current); delta streams through the
         emit-set filter.  Neither corpus ever shuffles content.
    """
    from libpostal_ray.pipelines.diff import (
        STATUS_CHANGED,
        snapshot_diff,
    )

    verdicts = snapshot_diff(
        base, delta, key=key, text_col=text_col, statuses=("added", "changed")
    )

    @ray.remote
    def gather(*blocks: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        ks: list[np.ndarray] = []
        ch: list[np.ndarray] = []
        for b in blocks:
            if b.num_rows == 0 or "k" not in b.column_names:
                continue
            k = b.column("k").to_numpy(zero_copy_only=False).astype(np.int64)
            st = b.column("status").to_pylist()
            ks.append(k)
            ch.append(np.asarray([s == STATUS_CHANGED for s in st], dtype=bool))
        if not ks:
            z = np.empty(0, dtype=np.int64)
            return z, z
        allk = np.concatenate(ks)
        allch = np.concatenate(ch)
        return np.sort(allk[allch]), np.sort(allk)

    sets_ref = gather.remote(*verdicts.materialize().to_arrow_refs())

    def _member(ids: np.ndarray, k: np.ndarray) -> np.ndarray:
        if ids.shape[0] == 0:
            return np.zeros(k.shape[0], dtype=bool)
        pos = np.searchsorted(ids, k)
        posc = np.clip(pos, 0, ids.shape[0] - 1)
        return (pos < ids.shape[0]) & (ids[posc] == k)

    def base_pass(batch: pa.Table) -> pa.Table:
        close_ids, _ = ray.get(sets_ref)
        k = batch.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        closed = _member(close_ids, k)
        return pa.table(
            {
                key: pa.array(k),
                text_col: batch[text_col],
                "valid_from": pa.array(
                    np.full(k.shape[0], base_from, dtype=np.int64)
                ),
                "valid_to": pa.array(
                    np.where(closed, as_of, forever).astype(np.int64)
                ),
                "is_current": pa.array((~closed).astype(np.int64)),
            }
        )

    def delta_pass(batch: pa.Table) -> pa.Table:
        _, emit_ids = ray.get(sets_ref)
        k = batch.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        m = _member(emit_ids, k)
        sub = batch.filter(pa.array(m))
        n = sub.num_rows
        ksub = k[m]
        return pa.table(
            {
                key: pa.array(ksub),
                text_col: sub[text_col],
                "valid_from": pa.array(np.full(n, as_of, dtype=np.int64)),
                "valid_to": pa.array(np.full(n, forever, dtype=np.int64)),
                "is_current": pa.array(np.ones(n, dtype=np.int64)),
            }
        )

    return base.map_batches(base_pass, batch_format="pyarrow").union(
        delta.map_batches(delta_pass, batch_format="pyarrow")
    )


def refresh_dedup(
    corpus: ray.data.Dataset,
    snapshot: ray.data.Dataset,
    cfg: PipelineConfig | None = None,
    *,
    key: str = "doc_id",
    text_col: str = "content",
) -> ray.data.Dataset:
    """The production refresh loop, composed: diff the new ``snapshot``
    against the standing ``corpus`` (pipelines/diff — one 32 B/row digest
    exchange), then run delta-vs-corpus near-dup detection on ONLY the
    added/changed rows.  Unchanged rows (at a steady-state re-crawl,
    ~all of them) never enter the sketch stage at all.

    Output: dedup_against_corpus verdicts for the changed+added subset —
    (doc_id, verdict, match_id).  Both datasets use the canonical corpus
    schema.  At 100 TB this is the difference between re-sketching the
    whole crawl and sketching the few percent that moved."""
    from libpostal_ray.pipelines.diff import snapshot_diff

    verdicts = snapshot_diff(
        corpus.select_columns([key, text_col]),
        snapshot.select_columns([key, text_col]),
        key=key,
        text_col=text_col,
        statuses=("added", "changed"),
    )

    @ray.remote
    def gather(*blocks) -> np.ndarray:
        ids = [
            b.column("k").to_numpy(zero_copy_only=False).astype(np.int64)
            for b in blocks
            if b.num_rows > 0 and "k" in b.column_names
        ]
        if not ids:
            return np.empty(0, dtype=np.int64)
        return np.sort(np.concatenate(ids))

    delta_ids_ref = gather.remote(*verdicts.materialize().to_arrow_refs())

    def delta_only(batch: pa.Table) -> pa.Table:
        ids = ray.get(delta_ids_ref)
        k = batch.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        if ids.shape[0] == 0:
            return batch.slice(0, 0)
        pos = np.searchsorted(ids, k)
        posc = np.clip(pos, 0, ids.shape[0] - 1)
        hit = (pos < ids.shape[0]) & (ids[posc] == k)
        return batch.filter(pa.array(hit))

    delta = snapshot.map_batches(delta_only, batch_format="pyarrow")
    return dedup_against_corpus(delta, corpus, cfg)
