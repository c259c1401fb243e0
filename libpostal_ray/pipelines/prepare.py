"""prepare_training_corpus — the composed end-to-end data-prep pipeline.

What a user of this engine actually runs before training: near-dup
deduplication (the flagship), a document quality gate, and PII/canary
redaction, composed as ONE streaming pass over the corpus plus the
flagship's own exchange:

  1. `dedup_report` (pipelines/near_dupe.py) clusters the corpus and
     decides keep/drop per doc — all the heavy lifting (signatures, LSH
     exchange, verify, CC) happens here, content never enters a shuffle;
  2. the keep-set (one int64 id per KEPT doc) is built in a remote task
     from the report blocks and broadcast once (ray.put semantics via an
     ObjectRef closure — same discipline as every small side in this repo);
  3. one final map_batches over the corpus applies, per batch: keep-set
     membership (searchsorted), the integer quality gate
     (quality_filter's thresholds), and vectorized RE2 redaction — and
     emits the clean rows (doc_id, text, n_masked).

Row count out <= row count in; the only shuffle is the flagship's 24 B/row
band-key exchange.  At 100 TB the keep-set broadcast is the one piece that
grows with corpus size (8 B per kept doc) — above ``keep_broadcast_max``
ids the plan switches automatically to a hash semi-join on doc_id
(``Dataset.join``, inner, skinny keep side) and the same final map applies
the gate + redaction without the membership probe.  Both plans are
output-identical (tested).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from libpostal_ray.config import PipelineConfig
from libpostal_ray.functions.redact import (
    PII_PATTERNS,
    mask_terms_pattern,
    redact_column,
)
from libpostal_ray.functions.textstats import quality_features
from libpostal_ray.pipelines.near_dupe import dedup_report
from libpostal_ray.sources.readers import read_documents_corpus

QUALITY_WORDS = (20, 80)      # n_words band (quality_filter parity)
QUALITY_DISTINCT = (4, 10)    # n_distinct*10 >= n_words*4
QUALITY_ALPHA = (82, 100)     # alpha*100 >= n_chars*82
MASK_TERMS = ["spark", "window"]

# keep-set ids above this count stop broadcasting (8 B/id -> ~400 MB of
# per-worker state at the cap) and the plan becomes a hash semi-join
KEEP_BROADCAST_MAX = 50_000_000


def prepare_training_corpus(
    sf_dir: str,
    cfg: PipelineConfig | None = None,
    *,
    keep_broadcast_max: int = KEEP_BROADCAST_MAX,
    lm_gate_bits: float | None = None,
    quality: tuple | None = None,
) -> ray.data.Dataset:
    """Dedup + quality-gate + redact the documents table; returns the clean
    training rows (doc_id, text, n_masked).  ``keep_broadcast_max=0``
    forces the semi-join plan (how the equivalence test pins it).

    ``lm_gate_bits`` optionally adds the CCNet-style perplexity gate
    (pipelines/lm.py): a byte-trigram LM trains on the corpus in one
    bounded-vocabulary pass and docs scoring more than ``lm_gate_bits``
    bits/char are dropped in the SAME final map as the other gates (docs
    too short for a trigram pass through — no evidence, no verdict).

    ``quality`` overrides the gate thresholds as (words_lo_hi,
    distinct_ratio, alpha_ratio) — the defaults are prose-tuned
    (quality_filter parity); a code corpus needs a wide word band and a
    lower alpha floor (BENCH/prepare_4m.py) or the gate drops everything."""
    cfg = cfg or PipelineConfig()
    corpus = read_documents_corpus(sf_dir)
    lm_ref = None
    if lm_gate_bits is not None:
        from libpostal_ray.pipelines.lm import train_char_lm

        lm_ref = train_char_lm(corpus, text_col="content")
    report = dedup_report(corpus, cfg).materialize()

    # the broadcast budget is defined over KEPT ids (8 B each), not report
    # rows: a 60M-doc corpus keeping 1M ids is still a tiny broadcast — one
    # cheap pass over the already-materialized skinny report counts them
    def _kept_count(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = pc.sum(batch["keep"]).as_py() if "keep" in batch.column_names else 0
        return pa.table({"n": pa.array([int(n or 0)], type=pa.int64())})

    n_keep = int(
        report.map_batches(_kept_count, batch_format="pyarrow").sum("n") or 0
    )

    if n_keep > keep_broadcast_max:
        return _prepare_join_plan(
            corpus, report, cfg, lm_ref=lm_ref, lm_gate_bits=lm_gate_bits,
            quality=quality,
        )

    @ray.remote
    def build_keep(*blocks):
        ids = [
            b.column("doc_id").filter(b.column("keep")).to_numpy(
                zero_copy_only=False
            )
            for b in blocks
            if b.num_rows > 0 and "doc_id" in b.column_names
        ]
        if not ids:
            return np.empty(0, dtype=np.int64)
        return np.sort(np.concatenate(ids).astype(np.int64))

    keep_ref = build_keep.remote(*report.to_arrow_refs())

    patterns = PII_PATTERNS + [(mask_terms_pattern(MASK_TERMS), "<MASK>")]

    def finalize(batch: pa.Table) -> pa.Table:
        keep_ids = ray.get(keep_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if keep_ids.shape[0]:
            pos = np.searchsorted(keep_ids, ids)
            posc = np.clip(pos, 0, keep_ids.shape[0] - 1)
            kept = (pos < keep_ids.shape[0]) & (keep_ids[posc] == ids)
        else:
            kept = np.zeros(ids.shape[0], dtype=bool)
        texts = batch["content"].to_pylist()
        return _gate_and_redact(
            batch["doc_id"], texts, kept, patterns,
            lm_col=batch["content"], lm_ref=lm_ref, lm_gate_bits=lm_gate_bits,
            quality=quality,
        )

    return corpus.map_batches(finalize, batch_format="pyarrow")


def _quality_mask(texts: list[str], quality: tuple | None = None) -> np.ndarray:
    feats = quality_features(
        texts, need=("n_chars", "n_words", "n_distinct_words", "alpha_chars")
    )
    n_words = np.asarray(feats["n_words"], dtype=np.int64)
    n_dist = np.asarray(feats["n_distinct_words"], dtype=np.int64)
    n_chars = np.asarray(feats["n_chars"], dtype=np.int64)
    alpha = np.asarray(feats["alpha_chars"], dtype=np.int64)
    words, distinct, alpha_ratio = quality or (
        QUALITY_WORDS, QUALITY_DISTINCT, QUALITY_ALPHA
    )
    lo, hi = words
    dnum, dden = distinct
    anum, aden = alpha_ratio
    return (
        (n_words >= lo)
        & (n_words <= hi)
        & (n_dist * dden >= n_words * dnum)
        & (alpha * aden >= n_chars * anum)
    )


def _gate_and_redact(
    id_col, texts: list[str], kept: np.ndarray, patterns,
    *, lm_col=None, lm_ref=None, lm_gate_bits=None, quality=None,
) -> pa.Table:
    good = kept & _quality_mask(texts, quality)
    if lm_ref is not None and lm_gate_bits is not None:
        from libpostal_ray.pipelines.lm import bits_per_char_column

        n_tri, bpc = bits_per_char_column(
            lm_col, ray.get(lm_ref), nrows=len(texts)
        )
        good &= (n_tri == 0) | (bpc <= lm_gate_bits)
    mask = pa.array(good)
    sub_ids = id_col.filter(mask)
    red, n_masked = redact_column(
        pa.array([t for t, g in zip(texts, good) if g], type=pa.string()),
        patterns,
    )
    return pa.table({"doc_id": sub_ids, "text": red, "n_masked": n_masked})


def _prepare_join_plan(
    corpus: ray.data.Dataset,
    report: ray.data.Dataset,
    cfg: PipelineConfig,
    *,
    lm_ref=None,
    lm_gate_bits=None,
    quality=None,
) -> ray.data.Dataset:
    """Above the broadcast budget: inner hash semi-join corpus x kept ids
    (both sides stream through the engine exchange), then the same gate +
    redaction map."""
    from libpostal_ray.pipelines.cluster import effective_join_partitions

    patterns = PII_PATTERNS + [(mask_terms_pattern(MASK_TERMS), "<MASK>")]

    def kept_only(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "keep" not in batch.column_names:
            return pa.table({"doc_id": pa.nulls(0, pa.int64())})
        return pa.table(
            {"doc_id": batch["doc_id"].filter(batch["keep"]).cast(pa.int64())}
        )

    keep_ds = report.map_batches(kept_only, batch_format="pyarrow")
    slim = corpus.select_columns(["doc_id", "content"])
    joined = slim.join(
        keep_ds,
        join_type="inner",
        num_partitions=effective_join_partitions(cfg.verify_partitions),
        on=("doc_id",),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        texts = batch["content"].to_pylist()
        kept = np.ones(batch.num_rows, dtype=bool)
        return _gate_and_redact(
            batch["doc_id"], texts, kept, patterns,
            lm_col=batch["content"], lm_ref=lm_ref, lm_gate_bits=lm_gate_bits,
            quality=quality,
        )

    return joined.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# export_training_shards — the deterministic shuffled SINK at the end of the
# prep pipeline: what the trainer actually consumes.

SHARD_MULT = 2654435761   # Knuth multiplicative hash (hash_sample family)
SHARD_MOD = 2**32
ORDER_MULT = 48271        # Lehmer generator (stratified_sample family)
ORDER_MOD = 2147483647
CHECK_MOD = 2**40         # id_check modulus: power of 2 so mod == bitmask;
CHECK_MASK = CHECK_MOD - 1  # partials stay exact in int64 up to 2^23 rows


def export_training_shards(
    docs: ray.data.Dataset,
    out_dir: str,
    *,
    n_shards: int = 64,
    seed: int = 0,
) -> ray.data.Dataset:
    """Deterministic seeded global shuffle + sharded parquet export — the
    last stage of a training-data pipeline (the trainer streams shard
    files; reproducibility requires the same doc -> shard assignment AND
    the same within-shard order on every run, machine count, and block
    layout).

    Both are pure functions of (doc_id, seed) — never of Ray's
    nondeterministic block order (``random_shuffle`` gives balance but not
    reproducibility):

      shard      = ((doc_id XOR seed) * 2654435761) mod 2^32 mod n_shards
      sort order = ((doc_id XOR seed) * 48271) mod 2147483647, doc_id ASC

    Independent multipliers decorrelate shard choice from within-shard
    position.  Both are SQL-expressible (the summary below is an oracle
    row), with the engine-wide caveat that doc_id * MULT must stay under
    2^63 — true for the readers' 63-bit ids only after the XOR-fold; at
    trillion-doc scale swap in splitmix64 on both sides and keep the plan.

    Physical plan: one stateless map assigns (shard, _okey), ONE exchange
    on shard (the unavoidable all-to-all any global shuffle pays — but
    carrying each row exactly once, no extra copy), a vectorized
    within-shard lexsort, and a partitioned parquet write (shard=K/
    directories): a failed run resumes by skipping finished shard dirs,
    and the trainer addresses shards by path.  Returns the per-shard
    summary (shard, n_docs, id_check) READ BACK from the written files, so
    consumers (and the oracle check) see what actually landed on disk.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards={n_shards}")
    mseed = np.int64(seed)

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        folded = ids ^ mseed
        h = (folded * np.int64(SHARD_MULT)) % np.int64(SHARD_MOD)
        okey = (folded * np.int64(ORDER_MULT)) % np.int64(ORDER_MOD)
        batch = batch.append_column(
            "shard", pa.array((h % np.int64(n_shards)).astype(np.int64))
        )
        return batch.append_column("_okey", pa.array(okey))

    def order_within(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "_okey" not in group.column_names:
            return group.drop_columns(
                [c for c in ("_okey",) if c in group.column_names]
            )
        okey = group["_okey"].to_numpy(zero_copy_only=False)
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        return group.take(np.lexsort((ids, okey))).drop_columns(["_okey"])

    (
        docs.map_batches(assign, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(order_within, batch_format="pyarrow")
        .write_parquet(out_dir, partition_cols=["shard"])
    )

    written = ray.data.read_parquet(out_dir)

    def summarize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "shard" not in batch.column_names:
            return pa.table(
                {
                    "shard": pa.nulls(0, pa.int64()),
                    "n_docs": pa.nulls(0, pa.int64()),
                    "id_check": pa.nulls(0, pa.int64()),
                }
            )
        t = pa.table(
            {
                "shard": batch["shard"].cast(pa.int64()),
                "n_docs": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                # MODULAR checksum, not a raw sum: 63-bit reader-derived
                # ids overflow int64 within one shard (measured at 1M
                # files) and the Sum degrades to a pickled-object column;
                # sum(id %% M) %% M == sum(id) %% M and every partial stays
                # exact in int64 up to 2^23 batches per shard
                "id_check": pc.bit_wise_and(
                    batch["doc_id"].cast(pa.int64()), CHECK_MASK
                ),
            }
        )
        g = (
            pa.TableGroupBy(t, "shard")
            .aggregate([("n_docs", "sum"), ("id_check", "sum")])
            .rename_columns(["shard", "n_docs", "id_check"])
        )
        # re-fold: a per-batch partial of b rows is bounded by b * 2^40 —
        # mask here so EVERY row entering the engine Sum is < 2^40
        return g.set_column(
            g.schema.get_field_index("id_check"),
            "id_check",
            pc.bit_wise_and(g["id_check"], CHECK_MASK),
        )

    from ray.data.aggregate import Sum

    out = (
        written.map_batches(summarize, batch_format="pyarrow")
        .groupby("shard")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("id_check", alias_name="id_check"),
        )
    )

    def fold(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "id_check" not in batch.column_names:
            return batch
        return batch.set_column(
            batch.schema.get_field_index("id_check"),
            "id_check",
            pc.bit_wise_and(batch["id_check"], CHECK_MASK),
        )

    return out.map_batches(fold, batch_format="pyarrow")


def compact_parquet(
    in_path: str,
    out_dir: str,
    *,
    target_rows_per_file: int = 1_000_000,
) -> dict:
    """Small-files compaction — the maintenance pass every long-running
    sink needs (a day of incremental deliveries leaves thousands of tiny
    files; readers then pay per-file open cost and tiny row groups).

    Reads the tree, repartitions to ceil(rows / target) blocks (count
    comes from parquet METADATA via Ray's read planning — no data pass),
    and writes one file per block.  Row-preserving, order-free; returns
    {n_rows, n_files_out}.  At 100 TB run it per PARTITION DIRECTORY
    (shard=K/ from export_training_shards), never over the whole tree —
    each directory compacts independently and resumably."""
    import math

    ds = ray.data.read_parquet(in_path)
    n = ds.count()  # parquet metadata path, not a scan
    blocks = max(1, math.ceil(n / target_rows_per_file))
    ds.repartition(blocks).write_parquet(out_dir)
    import os

    n_files = sum(
        1 for f in os.listdir(out_dir) if f.endswith(".parquet")
    )
    return {"n_rows": n, "n_files_out": n_files}


def tiered_dedup(
    sf_dir: str,
    near_cfg=None,
    sem_eps: float = 0.9,
    sem_clusters: int = 16,
) -> pa.Table:
    """TIERED deduplication — the canonical web-scale dedup ladder, each
    tier strictly cheaper-per-byte than the next and each processing
    ONLY the previous tier's survivors:

      tier 0 EXACT    content sha groups -> keep min doc_id per group
      tier 1 NEAR     flagship MinHash/LSH near-dup clustering
                      (pipelines/near_dupe) over exact survivors
      tier 2 SEMANTIC SemDeDup (pipelines/semdedup) over the embedding
                      rows of near survivors (vec_id == doc_id)

    Returns the attrition report (tier, n_in, n_removed, n_out) — three
    rows; the per-tier keep decisions are the underlying operators'
    outputs and stay distributed (only ids are gathered, 8 B each,
    same keep-set budget discipline as prepare_training_corpus).
    Reference analog: dedupe.c's exact-then-fuzzy ladder, extended one
    tier by embeddings."""
    import ray as _ray

    from libpostal_ray.config import PipelineConfig
    from libpostal_ray.pipelines.near_dupe import near_dupe_pipeline
    from libpostal_ray.pipelines.semdedup import semantic_dedup
    from libpostal_ray.sources.readers import read_documents_corpus

    cfg = near_cfg or PipelineConfig()
    corpus = read_documents_corpus(sf_dir)

    # ---- tier 0: exact (sha-collapse: keep min doc_id per digest) ----
    from libpostal_ray.pipelines.diff import _digest_halves

    def digest(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.nulls(0, pa.int64()),
                "h0": pa.nulls(0, pa.int64()),
                "h1": pa.nulls(0, pa.int64()),
                "part": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "content" not in batch.column_names:
            return empty
        h0, h1 = _digest_halves(batch["content"])
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "h0": pa.array(h0),
                "h1": pa.array(h1),
                "part": pa.array((h0 & ((1 << 62) - 1)) % 32),
            }
        )

    def exact_keep(group: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.nulls(0, pa.int64())})
        if group.num_rows == 0 or "h0" not in group.column_names:
            return empty
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        h0 = group["h0"].to_numpy(zero_copy_only=False)
        h1 = group["h1"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h1, h0))
        ids, h0, h1 = ids[order], h0[order], h1[order]
        first = np.concatenate(([True], (h0[1:] != h0[:-1]) | (h1[1:] != h1[:-1])))
        return pa.table({"doc_id": pa.array(ids[first])})

    n0 = corpus.count()
    keep0 = (
        corpus.map_batches(digest, batch_format="pyarrow")
        .groupby("part")
        .map_groups(exact_keep, batch_format="pyarrow")
        .materialize()
    )
    n0_out = keep0.count()

    @_ray.remote
    def _gather_ids(*blocks):
        # groupby/map_groups can emit zero-column empty blocks — skip them
        parts = [
            b["doc_id"].to_numpy(zero_copy_only=False)
            for b in blocks
            if b.num_rows and "doc_id" in b.column_names
        ]
        if not parts:
            return np.zeros(0, np.int64)
        return np.sort(np.concatenate(parts).astype(np.int64))

    keep0_ref = _gather_ids.remote(*keep0.to_arrow_refs())

    def _filter_ids(ref, id_col: str):
        def f(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or id_col not in batch.column_names:
                return batch
            kept = _ray.get(ref) if not isinstance(ref, np.ndarray) else ref
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(kept, ids)
            pos = np.minimum(pos, max(kept.shape[0] - 1, 0))
            m = kept[pos] == ids if kept.shape[0] else np.zeros(ids.shape[0], bool)
            return batch.filter(pa.array(m))
        return f

    # ---- tier 1: near (flagship over exact survivors) ----
    survivors1 = corpus.map_batches(
        _filter_ids(keep0_ref, "doc_id"), batch_format="pyarrow"
    )
    near = near_dupe_pipeline(survivors1, cfg)
    clusters = near["clusters"].select_columns(["doc_id", "cluster_id"]).materialize()

    def near_keep(group: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.nulls(0, pa.int64())})
        if group.num_rows == 0 or "cluster_id" not in group.column_names:
            return empty
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        cid = group["cluster_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, cid))
        ids, cid = ids[order], cid[order]
        first = np.concatenate(([True], cid[1:] != cid[:-1]))
        return pa.table({"doc_id": pa.array(ids[first])})

    def tag_cluster(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "cluster_id" not in batch.column_names:
            return pa.table(
                {
                    "doc_id": pa.nulls(0, pa.int64()),
                    "cluster_id": pa.nulls(0, pa.int64()),
                    "part": pa.nulls(0, pa.int64()),
                }
            )
        cid = batch["cluster_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("part", pa.array(cid % 32))

    keep1 = (
        clusters.map_batches(tag_cluster, batch_format="pyarrow")
        .groupby("part")
        .map_groups(near_keep, batch_format="pyarrow")
        .materialize()
    )
    n1_out = keep1.count()
    keep1_ref = _gather_ids.remote(*keep1.to_arrow_refs())

    # ---- tier 2: semantic (SemDeDup over near survivors' embeddings) ----
    if n1_out == 0:  # nothing survived -> kmeans has no input
        return pa.table(
            {
                "tier": pa.array(["exact", "near", "semantic"], type=pa.string()),
                "n_in": pa.array([n0, n0_out, 0], type=pa.int64()),
                "n_removed": pa.array([n0 - n0_out, n0_out, 0], type=pa.int64()),
                "n_out": pa.array([n0_out, 0, 0], type=pa.int64()),
            }
        )
    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(_filter_ids(keep1_ref, "vec_id"), batch_format="pyarrow")
    verdicts = semantic_dedup(emb, eps=sem_eps, n_clusters=sem_clusters)
    n2_in = n1_out
    n2_out = int(
        verdicts.map_batches(
            lambda b: pa.table(
                {"n": pa.array([int(b["keep"].to_numpy(zero_copy_only=False).sum())]
                               if b.num_rows else [0], type=pa.int64())}
            ),
            batch_format="pyarrow",
        ).sum("n")
        or 0
    )
    return pa.table(
        {
            "tier": pa.array(["exact", "near", "semantic"], type=pa.string()),
            "n_in": pa.array([n0, n0_out, n2_in], type=pa.int64()),
            "n_removed": pa.array(
                [n0 - n0_out, n0_out - n1_out, n2_in - n2_out], type=pa.int64()
            ),
            "n_out": pa.array([n0_out, n1_out, n2_out], type=pa.int64()),
        }
    )
