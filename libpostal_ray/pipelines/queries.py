"""Named queries over the driver's test tables — the `queries()` registry.

Each function takes ``sf_dir`` and returns a Dataset / pandas DataFrame.
Where a DuckDB oracle exists (__ray_entry__.oracle_sql), column NAMES and
VALUE SEMANTICS are matched exactly:

  * aggregates over floats are integerized per-row first
    (floor(x*100) as int64) so both engines sum exact integers — float
    accumulation order never shows up in the comparison;
  * float outputs (cosine, jaccard) are a single deterministic per-row
    division, rounded to a fixed number of decimals on both sides.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from libpostal_ray.config import PipelineConfig
from libpostal_ray.functions.canonicalize import basic_canonicalize_array
from libpostal_ray.functions.textstats import langid_heuristic, quality_features
from libpostal_ray.sources.readers import read_documents_corpus
from libpostal_ray.stages.textstats import fingerprint_batch


def _strip_meta(batch: pa.Table) -> pa.Table:
    """Drop parquet pandas-metadata from block schemas: Ray's schema
    deduplication logs 'Failed to hash the schemas' on every task otherwise
    (the metadata dict is unhashable)."""
    return batch.replace_schema_metadata(None)


def _embeddings(sf_dir: str, columns=("vec_id", "embedding")) -> ray.data.Dataset:
    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=list(columns)
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)


def _docs(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )


# ---------------------------------------------------------------- exact dedup
def exact_dedup(sf_dir: str) -> ray.data.Dataset:
    """Exact dedup by content hash: (content_md5, n_copies, keep_id).
    Pattern: vectorized hash in map_batches -> ONE small groupby over hashes
    (the content itself never shuffles)."""

    def add_md5(batch: pa.Table) -> pa.Table:
        h = [
            hashlib.md5((t or "").encode("utf-8")).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {"content_md5": pa.array(h, type=pa.string()), "doc_id": batch["doc_id"]}
        )

    return (
        _docs(sf_dir)
        .map_batches(add_md5, batch_format="pyarrow")
        .groupby("content_md5")
        .aggregate(Count(alias_name="n_copies"), Min("doc_id", alias_name="keep_id"))
    )


# ------------------------------------------------------------- canonicalize
def canonicalize_basic(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, canon_md5, canon_len) for the SQL-expressible canonicalizer
    lower(trim(ws-collapse)) — parity query for the full NFKC canonicalizer."""

    def f(batch: pa.Table) -> pa.Table:
        canon = basic_canonicalize_array(batch["text"].to_pylist())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "canon_md5": pa.array(
                    [hashlib.md5(c.encode()).hexdigest() for c in canon],
                    type=pa.string(),
                ),
                "canon_len": pa.array(
                    np.array([len(c) for c in canon], dtype=np.int64)
                ),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow")


# -------------------------------------------------------------- text stats
def token_count(sf_dir: str) -> ray.data.Dataset:
    def f(batch: pa.Table) -> pa.Table:
        n = np.array(
            [len((t or "").split()) for t in batch["text"].to_pylist()],
            dtype=np.int64,
        )
        return pa.table({"doc_id": batch["doc_id"], "n_tokens": pa.array(n)})

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow")


def quality_stats(sf_dir: str) -> ray.data.Dataset:
    def f(batch: pa.Table) -> pa.Table:
        feats = quality_features(batch["text"].to_pylist())
        cols = {"doc_id": batch["doc_id"]}
        for k, v in feats.items():
            cols[k] = pa.array(v)
        return pa.table(cols)

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow")


def quality_filter(sf_dir: str) -> ray.data.Dataset:
    """Gopher-style document quality gate: keep docs passing ALL of
    (a) 20 <= n_words <= 80, (b) distinct-word ratio >= 0.4,
    (c) alpha-char ratio >= 0.82 — every comparison in integers so the
    oracle row is exact.  The pre-training filter stage: one streaming
    map_batches, no shuffle; drop reasons stay auditable via the carried
    feature columns."""

    def f(batch: pa.Table) -> pa.Table:
        feats = quality_features(batch["text"].to_pylist())
        n_words = np.asarray(feats["n_words"], dtype=np.int64)
        n_dist = np.asarray(feats["n_distinct_words"], dtype=np.int64)
        n_chars = np.asarray(feats["n_chars"], dtype=np.int64)
        alpha = np.asarray(feats["alpha_chars"], dtype=np.int64)
        keep = (
            (n_words >= 20)
            & (n_words <= 80)
            & (n_dist * 10 >= n_words * 4)
            & (alpha * 100 >= n_chars * 82)
        )
        k = pa.array(keep)
        return pa.table(
            {
                "doc_id": batch["doc_id"].filter(k),
                "n_words": pa.array(n_words[keep]),
                "n_distinct_words": pa.array(n_dist[keep]),
                "alpha_chars": pa.array(alpha[keep]),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow")


def lang_count(sf_dir: str) -> ray.data.Dataset:
    return (
        _docs(sf_dir)
        .groupby("lang")
        .aggregate(Count(alias_name="n_docs"))
    )


def ngram_shingles(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_shingles): count of DISTINCT 5-char shingles, docs with
    len >= 5 (ngrams.c:4-71 analog, char-exact for SQL parity)."""

    def f(batch: pa.Table) -> pa.Table:
        ids, counts = [], []
        for i, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            t = t or ""
            if len(t) >= 5:
                ids.append(i)
                counts.append(len({t[j : j + 5] for j in range(len(t) - 4)}))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_shingles": pa.array(np.array(counts, dtype=np.int64)),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow")


def word_jaccard_pairs(sf_dir: str) -> ray.data.Dataset:
    """Word-set Jaccard of consecutive doc-id pairs: (doc_a, doc_b, jaccard).
    Exercises Dataset.join (self-join on doc_id+1) + a per-row set kernel."""

    def toks(batch: pa.Table) -> pa.Table:
        # word set packed as one \x1f-joined string: Arrow's hash join cannot
        # carry list<> payload columns, scalars it can
        words = [
            "\x1f".join(sorted(set((t or "").split())))
            for t in batch["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "ws": pa.array(words, type=pa.string()),
            }
        )

    t = _docs(sf_dir).map_batches(toks, batch_format="pyarrow")
    left = t.map_batches(
        lambda b: b.append_column(
            "next_id", pc.add(b["doc_id"], pa.scalar(1, pa.int64()))
        ),
        batch_format="pyarrow",
    )
    from libpostal_ray.pipelines.cluster import effective_join_partitions

    joined = left.join(
        t,
        join_type="inner",
        num_partitions=effective_join_partitions(16),
        on=("next_id",),
        right_on=("doc_id",),
        left_suffix="_a",
        right_suffix="_b",
    )

    def jac(batch: pa.Table) -> pa.Table:
        # join output: doc_id (left), next_id (the right row's doc_id — the
        # right key column is dropped), ws_a, ws_b
        a_ws = batch["ws_a"].to_pylist()
        b_ws = batch["ws_b"].to_pylist()
        doc_a = batch["doc_id"]
        out = np.empty(len(a_ws), dtype=np.float64)
        for i, (x, y) in enumerate(zip(a_ws, b_ws)):
            sx = set(x.split("\x1f")) if x else set()
            sy = set(y.split("\x1f")) if y else set()
            inter = len(sx & sy)
            out[i] = round(inter / (len(sx) + len(sy) - inter), 6) if (sx or sy) else 1.0
        return pa.table(
            {
                "doc_a": doc_a,
                "doc_b": batch["next_id"],
                "jaccard": pa.array(out),
            }
        )

    return joined.map_batches(jac, batch_format="pyarrow")


def doc_token_positions(sf_dir: str) -> ray.data.Dataset:
    """Explode documents to one row per token: (doc_id, pos, token).
    The flat_map/unnest operator, done Arrow-native: split_pattern_regex ->
    list_flatten + list_parent_indices + offset-derived positions — zero
    Python per row, output blocks stream (nothing aggregates)."""

    def explode(batch: pa.Table) -> pa.Table:
        txt = pc.utf8_trim_whitespace(batch["text"])
        lists = pc.split_pattern_regex(txt, pattern=r"\s+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        starts = offsets[:-1]
        total = int(offsets[-1])
        pos = (
            np.arange(total, dtype=np.int64)
            - np.repeat(starts, np.diff(offsets))
            + 1
        )
        return pa.table(
            {
                "doc_id": pc.take(batch["doc_id"], parent),
                "pos": pa.array(pos, type=pa.int64()),
                "token": flat,
            }
        )

    return _docs(sf_dir).map_batches(explode, batch_format="pyarrow")


def boilerplate_ngrams(sf_dir: str, min_docs: int = 3) -> ray.data.Dataset:
    """Cross-document boilerplate: word-5-grams appearing in >= ``min_docs``
    DISTINCT documents -> (gram, n_docs).  The corpus-level repeated-phrase
    detector a filtering pipeline runs before training (license headers,
    navigation chrome, template prose).

    Plan: per-doc DISTINCT grams partial-counted per batch, then ONE
    exchange on crc32(gram) % P (an int64 key — a string-keyed engine
    groupby sort-compares every gram byte-wise through the shuffle, ~3x
    slower measured) with an Arrow hash-aggregate + threshold INSIDE the
    partition kernel, so sub-threshold grams never leave it.  Gram strings
    still ride the exchange for char-exact SQL parity; the at-scale
    variant ships 8-byte gram hashes instead (rolling_shingle_hashes /
    fingerprint_counts) — same plan, 1/10 the exchange bytes."""
    import zlib

    P = 32

    def grams_of(batch: pa.Table) -> pa.Table:
        out = []
        for t in batch["text"].to_pylist():
            tk = (t or "").split()
            out.extend({" ".join(tk[j : j + 5]) for j in range(len(tk) - 4)})
        part = np.fromiter(
            (zlib.crc32(g.encode("utf-8")) for g in out),
            dtype=np.int64,
            count=len(out),
        ) % P
        t_ = pa.table(
            {
                "gram": pa.array(out, type=pa.string()),
                "n_docs": pa.array(np.ones(len(out), dtype=np.int64)),
                "part": pa.array(part),
            }
        )
        # gram determines part, so grouping by (gram, part) == by gram
        return (
            pa.TableGroupBy(t_, ["gram", "part"])
            .aggregate([("n_docs", "sum")])
            .rename_columns(["gram", "part", "n_docs"])
        )

    def kernel(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "gram" not in group.column_names:
            return pa.table(
                {
                    "gram": pa.nulls(0, pa.string()),
                    "n_docs": pa.nulls(0, pa.int64()),
                }
            )
        g = (
            pa.TableGroupBy(group.select(["gram", "n_docs"]), "gram")
            .aggregate([("n_docs", "sum")])
            .rename_columns(["gram", "n_docs"])
        )
        return g.filter(pc.greater_equal(g["n_docs"], min_docs))

    return (
        _docs(sf_dir)
        .map_batches(grams_of, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


EDIT_PREFIX_CHARS = 120  # edit-distance pair scoring runs on a bounded
                         # prefix: the DP is O(len^2) per pair and the
                         # operator's contract is candidate-pair scoring,
                         # never whole-corpus all-pairs


def edit_distance_pairs(sf_dir: str) -> ray.data.Dataset:
    """Exact edit-distance scoring of consecutive doc-id pairs:
    (doc_a, doc_b, lev, char_jacc) over the first EDIT_PREFIX_CHARS chars.

    The verification-tier scalar family (string_similarity.c:247-287) run
    the way it runs in the flagship: on already-blocked candidate pairs
    (here the deterministic doc_id+1 pairing so DuckDB can replay it).
    ``lev`` is byte-level Levenshtein (DuckDB builtin semantics);
    ``char_jacc`` is byte-set Jaccard (DuckDB ``jaccard``)."""

    def prefix(batch: pa.Table) -> pa.Table:
        texts = [(t or "")[:EDIT_PREFIX_CHARS] for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pfx": pa.array(texts, type=pa.string()),
            }
        )

    t = _docs(sf_dir).map_batches(prefix, batch_format="pyarrow")
    left = t.map_batches(
        lambda b: b.append_column(
            "next_id", pc.add(b["doc_id"], pa.scalar(1, pa.int64()))
        ),
        batch_format="pyarrow",
    )
    from libpostal_ray.pipelines.cluster import effective_join_partitions

    joined = left.join(
        t,
        join_type="inner",
        num_partitions=effective_join_partitions(16),
        on=("next_id",),
        right_on=("doc_id",),
        left_suffix="_a",
        right_suffix="_b",
    )

    from libpostal_ray.functions.similarity import char_jaccard, levenshtein

    def score(batch: pa.Table) -> pa.Table:
        a_pfx = batch["pfx_a"].to_pylist()
        b_pfx = batch["pfx_b"].to_pylist()
        n = len(a_pfx)
        lev = np.empty(n, dtype=np.int64)
        jac = np.empty(n, dtype=np.float64)
        for i, (x, y) in enumerate(zip(a_pfx, b_pfx)):
            lev[i] = levenshtein(x, y)
            jac[i] = char_jaccard(x, y)
        return pa.table(
            {
                "doc_a": batch["doc_id"],
                "doc_b": batch["next_id"],
                "lev": pa.array(lev),
                "char_jacc": pa.array(jac),
            }
        )

    return joined.map_batches(score, batch_format="pyarrow")


def event_value_histogram(sf_dir: str, width: float = 25.0) -> ray.data.Dataset:
    """Fixed-width histogram of event values: (bucket, n).  The profiling
    primitive — one vectorized floor-divide per batch, partial pre-agg,
    one tiny groupby (bucket count is bounded by the value range, not the
    data)."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def part(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        b = np.floor(v / width).astype(np.int64)
        t = pa.table(
            {
                "bucket": pa.array(b),
                "n": pa.array(np.ones(b.shape[0], dtype=np.int64)),
            }
        )
        return (
            pa.TableGroupBy(t, "bucket")
            .aggregate([("n", "sum")])
            .rename_columns(["bucket", "n"])
        )

    return (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
    )


def orders_by_month(sf_dir: str) -> ray.data.Dataset:
    """Temporal rollup by calendar parts: (year, month, n, price_cents).
    Arrow's year()/month() kernels on the timestamp column — the date_part
    scalar family, partial pre-agg as everywhere."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )

    def part(batch: pa.Table) -> pa.Table:
        y = pc.year(batch["o_orderdate"]).cast(pa.int64())
        m = pc.month(batch["o_orderdate"]).cast(pa.int64())
        cents = np.floor(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        t = pa.table(
            {
                "year": y,
                "month": m,
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "price_cents": pa.array(cents),
            }
        )
        return (
            pa.TableGroupBy(t, ["year", "month"])
            .aggregate([("n", "sum"), ("price_cents", "sum")])
            .rename_columns(["year", "month", "n", "price_cents"])
        )

    return (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby(["year", "month"])
        .aggregate(
            Sum("n", alias_name="n"), Sum("price_cents", alias_name="price_cents")
        )
    )


def props_key_stats(sf_dir: str) -> ray.data.Dataset:
    """JSON field extraction + aggregate: per event_type, count / sum / max
    of the integer ``k`` in the props JSON.  Extraction is one vectorized
    RE2 pass (pc.extract_regex) — the semi-structured-column pattern; the
    oracle uses DuckDB's json_extract on the same rows."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )

    def part(batch: pa.Table) -> pa.Table:
        ext = pc.extract_regex(batch["props"], pattern=r'"k":\s*(?P<k>[0-9]+)')
        k = pc.cast(pc.struct_field(ext, "k"), pa.int64())
        t = pa.table(
            {
                "event_type": batch["event_type"],
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "sum_k": k,
                "max_k": k,
            }
        )
        return (
            pa.TableGroupBy(t, "event_type")
            .aggregate([("n", "sum"), ("sum_k", "sum"), ("max_k", "max")])
            .rename_columns(["event_type", "n", "sum_k", "max_k"])
        )

    return (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_k", alias_name="sum_k"),
            Max("max_k", alias_name="max_k"),
        )
    )


def customer_order_ranks(sf_dir: str) -> ray.data.Dataset:
    """Window functions over orders: per customer in (o_orderdate,
    o_orderkey) order — row_number, competition rank by price DESC,
    lag(price) and running price sum.  One key%P exchange + vectorized
    segment kernels (pipelines/window.py); no per-customer Python calls."""
    from libpostal_ray.pipelines.window import window_over_key

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "o_orderkey": batch["o_orderkey"],
                "date_us": batch["o_orderdate"].cast(pa.int64()),
                "price_cents": pa.array(cents, type=pa.int64()),
            }
        )

    out = window_over_key(
        ds.map_batches(prep, batch_format="pyarrow"),
        key="o_custkey",
        order_cols=["date_us", "o_orderkey"],
        value="price_cents",
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "o_orderkey": batch["o_orderkey"],
                "rn": batch["rn"],
                "price_rank": batch["value_rank"],
                "price_dense_rank": batch["dense_rank"],
                "date_ntile": batch["ntile"],
                "prev_price_cents": batch["prev_value"],
                "cum_price_cents": batch["cum_value"],
                "price_pct_rank": batch["percent_rank"],
                "price_cume_dist": batch["cume_dist"],
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def customer_order_frames(sf_dir: str) -> ray.data.Dataset:
    """Window FRAME functions over orders: per customer in (o_orderdate,
    o_orderkey) order — 3-row moving sum/avg, first/last/nth_value(2) over
    the partition, lead(price).  Same one-exchange plan as
    customer_order_ranks (pipelines/window.py: frames_over_key)."""
    from libpostal_ray.pipelines.window import frames_over_key

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "o_orderkey": batch["o_orderkey"],
                "date_us": batch["o_orderdate"].cast(pa.int64()),
                "price_cents": pa.array(cents, type=pa.int64()),
            }
        )

    out = frames_over_key(
        ds.map_batches(prep, batch_format="pyarrow"),
        key="o_custkey",
        order_cols=["date_us", "o_orderkey"],
        value="price_cents",
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": batch["o_custkey"],
                "o_orderkey": batch["o_orderkey"],
                "mov_sum3": batch["mov_sum"],
                "mov_avg3": batch["mov_avg"],
                "first_price": batch["first_val"],
                "last_price": batch["last_val"],
                "next_price": batch["next_val"],
                "second_price": batch["nth2_val"],
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def documents_snapshot_diff(sf_dir: str) -> ray.data.Dataset:
    """Snapshot diff (CDC) over the documents table vs a deterministically
    derived NEW snapshot: doc_id%17==0 deleted, doc_id%13==0 edited
    (text || ' v2'), doc_id%19==0 re-inserted at doc_id+10_000_000.
    Output (doc_id, status in added/removed/changed) — unchanged rows
    never leave the exchange.  pipelines/diff.py: one 32 B/row key%P
    exchange; content stays in its batch."""
    from libpostal_ray.pipelines.diff import snapshot_diff

    old = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    new_src = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def derive_new(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kept = batch.filter(pa.array(ids % 17 != 0))
        kids = kept["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ktext = kept["text"].combine_chunks() if kept.num_rows else pa.array([], type=pa.string())
        # type-match the scalar operands: big blocks arrive as
        # large_string and binary_join has no mixed-width kernel
        edited = pc.if_else(
            pa.array(kids % 13 == 0),
            pc.binary_join_element_wise(
                ktext,
                pa.scalar(" v2", type=ktext.type),
                pa.scalar("", type=ktext.type),
            ),
            ktext,
        )
        ins = batch.filter(pa.array(ids % 19 == 0))
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate(
                        (
                            kids,
                            ins["doc_id"]
                            .to_numpy(zero_copy_only=False)
                            .astype(np.int64)
                            + 10_000_000,
                        )
                    )
                ),
                "text": pa.concat_arrays(
                    [edited, ins["text"].combine_chunks().cast(edited.type)]
                    if ins.num_rows
                    else [edited]
                ),
            }
        )

    new = new_src.map_batches(derive_new, batch_format="pyarrow")
    out = snapshot_diff(old, new, key="doc_id", text_col="text")
    return out.map_batches(
        lambda b: b.rename_columns(["doc_id", "status"]),
        batch_format="pyarrow",
    )


def user_activity_histogram(sf_dir: str) -> ray.data.Dataset:
    """Aggregate-of-aggregate (count-of-counts): how many users produced
    exactly n events, for every observed n — the key-skew profile a 100 TB
    pipeline inspects before choosing a partitioning key.

    Plan: per-batch np.unique partial counts -> ONE user%P exchange where
    the kernel finalizes per-user counts AND folds them into a partial
    histogram (distinct-n rows only leave the kernel) -> second exchange
    on n%8 merges the tiny partials vectorized.  The second shuffle's
    volume is O(P x distinct activity levels), independent of user count."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    P = 32

    def partial(batch: pa.Table) -> pa.Table:
        u, c = np.unique(
            batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            return_counts=True,
        )
        return pa.table(
            {
                "u": pa.array(u),
                "cnt": pa.array(c.astype(np.int64)),
                "part": pa.array(u % P),
            }
        )

    def per_user_then_hist(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "n_events": pa.nulls(0, pa.int64()),
                "n_users_partial": pa.nulls(0, pa.int64()),
                "part2": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "u" not in group.column_names:
            return empty
        u = group["u"].to_numpy(zero_copy_only=False)
        c = group["cnt"].to_numpy(zero_copy_only=False)
        uu, inv = np.unique(u, return_inverse=True)
        tot = np.zeros(uu.shape[0], dtype=np.int64)
        np.add.at(tot, inv, c)
        lvls, nus = np.unique(tot, return_counts=True)
        return pa.table(
            {
                "n_events": pa.array(lvls.astype(np.int64)),
                "n_users_partial": pa.array(nus.astype(np.int64)),
                "part2": pa.array(lvls.astype(np.int64) % 8),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "n_events": pa.nulls(0, pa.int64()),
                "n_users": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "n_events" not in group.column_names:
            return empty
        lv = group["n_events"].to_numpy(zero_copy_only=False)
        pn = group["n_users_partial"].to_numpy(zero_copy_only=False)
        uu, inv = np.unique(lv, return_inverse=True)
        tot = np.zeros(uu.shape[0], dtype=np.int64)
        np.add.at(tot, inv, pn)
        return pa.table(
            {
                "n_events": pa.array(uu.astype(np.int64)),
                "n_users": pa.array(tot),
            }
        )

    return (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_user_then_hist, batch_format="pyarrow")
        .groupby("part2")
        .map_groups(merge, batch_format="pyarrow")
    )


def documents_profile(sf_dir: str) -> ray.data.Dataset:
    """Column profile of the documents string columns: row/null counts,
    EXACT distributed distinct (hash-partitioned value space — partition
    unique counts sum to the global count), byte-length min/max/sum from
    the Arrow offsets buffer.  pipelines/profile.py."""
    from libpostal_ray.pipelines.profile import column_profile

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text", "lang", "source"]
    )
    return column_profile(ds, ["text", "lang", "source"])


def priority_price_iqr(sf_dir: str) -> ray.data.Dataset:
    """Interpolated per-group quantiles (percentile_cont semantics):
    q1/median/q3 of order price cents per o_orderpriority.  Quantiles at
    exact binary fractions (q in {.25,.5,.75}) make every interpolation
    step IEEE-exact (frac in {0,.25,.5,.75}; products/sums of
    quarter-integers below 2^53 are exactly representable), so the float64
    outputs are bit-identical across engines — the module's float-parity
    rule.  Same co-located-group plan as priority_price_quantiles."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    def quant(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "o_orderpriority" not in group.column_names:
            return pa.table(
                {
                    "o_orderpriority": pa.nulls(0, pa.string()),
                    "q1_cents": pa.nulls(0, pa.float64()),
                    "median_cents": pa.nulls(0, pa.float64()),
                    "q3_cents": pa.nulls(0, pa.float64()),
                    "n_orders": pa.nulls(0, pa.int64()),
                }
            )
        cents = np.sort(
            np.floor(
                group["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
        ).astype(np.float64)
        n = cents.shape[0]

        def pcont(q: float) -> float:
            h = q * (n - 1)
            lo = int(np.floor(h))
            hi = min(lo + 1, n - 1)
            frac = h - lo
            return float(cents[lo] + frac * (cents[hi] - cents[lo]))

        return pa.table(
            {
                "o_orderpriority": pa.array(
                    [group["o_orderpriority"][0].as_py()], type=pa.string()
                ),
                "q1_cents": pa.array([pcont(0.25)], type=pa.float64()),
                "median_cents": pa.array([pcont(0.5)], type=pa.float64()),
                "q3_cents": pa.array([pcont(0.75)], type=pa.float64()),
                "n_orders": pa.array([n], type=pa.int64()),
            }
        )

    return ds.groupby("o_orderpriority").map_groups(quant, batch_format="pyarrow")


def documents_scd2(sf_dir: str) -> ray.data.Dataset:
    """SCD-2 versioned upsert over documents: delta = re-crawl of every
    doc_id%10==0 row (text uppercased only when doc_id%20==0, so half the
    delta is byte-identical and must add NO version) + inserts
    (doc_id%25==0 re-keyed at +10M).  Output = full version history
    (valid_from, valid_to, is_current).  pipelines/incremental.py:
    corpus_upsert_scd2 — snapshot_diff verdict exchange + two streaming
    passes; content never shuffles."""
    from libpostal_ray.pipelines.incremental import corpus_upsert_scd2

    cols = ["doc_id", "text"]
    base = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=cols
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    def recrawl(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sub = batch.filter(pa.array(ids % 10 == 0))
        sids = sub["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        text = (
            sub["text"].combine_chunks()
            if sub.num_rows
            else pa.array([], type=pa.string())
        )
        text = pc.if_else(pa.array(sids % 20 == 0), pc.utf8_upper(text), text)
        ins = batch.filter(pa.array(ids % 25 == 0))
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate(
                        (
                            sids,
                            ins["doc_id"]
                            .to_numpy(zero_copy_only=False)
                            .astype(np.int64)
                            + 10_000_000,
                        )
                    )
                ),
                "text": pa.concat_arrays(
                    [text, ins["text"].combine_chunks().cast(text.type)]
                    if ins.num_rows
                    else [text]
                ),
            }
        )

    delta = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=cols)
        .map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(recrawl, batch_format="pyarrow")
    )
    return corpus_upsert_scd2(base, delta)


def doc_lm_perplexity(sf_dir: str) -> ray.data.Dataset:
    """CCNet-style LM quality signal: train a byte-trigram LM on the
    corpus in one bounded-vocabulary counting pass, broadcast it, score
    every doc's bits-per-char (mean -log2 p(c|prefix)).  Rows-only (log
    floats are not SQL-hash-stable); pipelines/lm.py carries the
    numpy-reference exactness + blocking-independence tests."""
    from libpostal_ray.pipelines.lm import perplexity_scores, train_char_lm

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    model = train_char_lm(ds)
    return perplexity_scores(ds, model)


def embedding_covariance(sf_dir: str) -> pa.Table:
    """Exact distributed second moments of the embedding corpus
    (pipelines/pca.py): per-row integerized outer products summed as
    int64 — associative, block-layout-independent.  Oracle row emits the
    upper triangle of the leading 8x8 corner (the full d x d matrix is
    computed; the slice keeps the SQL unnest-join oracle cheap)."""
    from libpostal_ray.pipelines.pca import second_moments

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    n, s, m = ray.get(second_moments(ds))
    if n == 0:  # zero-row corpus: no moments, no rows (oracle agrees)
        return pa.table(
            {
                "i": pa.nulls(0, pa.int64()),
                "j": pa.nulls(0, pa.int64()),
                "m_micro": pa.nulls(0, pa.int64()),
            }
        )
    ii, jj = np.triu_indices(8)
    return pa.table(
        {
            "i": pa.array(ii.astype(np.int64)),
            "j": pa.array(jj.astype(np.int64)),
            "m_micro": pa.array(m[ii, jj].astype(np.int64)),
        }
    )


def embedding_pca2(sf_dir: str) -> ray.data.Dataset:
    """PCA projection to 2 components: exact-moment fit (one O(d^2)
    partial per batch, driver-free gather), sign-stabilized eigh, then a
    stateless broadcast-matmul projection pass.  Rows-only (BLAS matmul
    float order is not cross-engine stable)."""
    from libpostal_ray.pipelines.pca import pca_fit, pca_project, second_moments

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    mom = second_moments(ds)
    comps = pca_fit(mom, 2)
    return pca_project(ds, comps, mom)


def source_top_lang(sf_dir: str) -> ray.data.Dataset:
    """MODE per group (argmax-of-count): the most frequent lang per
    source, ties broken by lang ascending (the deterministic SQL
    row_number rule).  Per-batch (source, lang) partial counts -> one
    crc32(source)%P exchange -> per-partition vectorized sum + argmax.
    The exchange ships distinct pairs per batch, never rows."""
    import zlib

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "lang"]
    )
    P = 32

    def partial(batch: pa.Table) -> pa.Table:
        # vectorized distinct-pair counting (np.unique over the composite
        # key — no per-row Python); crc32 only touches DISTINCT sources
        src = np.asarray(batch["source"].to_pylist(), dtype=object)
        lang = np.asarray(batch["lang"].to_pylist(), dtype=object)
        pairs = np.char.add(
            np.char.add(src.astype(str), "\x01"), lang.astype(str)
        )
        up, cnt = np.unique(pairs, return_counts=True)
        ss = [p.split("\x01")[0] for p in up]
        return pa.table(
            {
                "source": pa.array(ss, type=pa.string()),
                "lang": pa.array(
                    [p.split("\x01")[1] for p in up], type=pa.string()
                ),
                "n": pa.array(cnt.astype(np.int64)),
                "part": pa.array(
                    np.fromiter(
                        (zlib.crc32(s.encode()) for s in ss), dtype=np.int64
                    )
                    % P
                ),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "source": pa.nulls(0, pa.string()),
                "top_lang": pa.nulls(0, pa.string()),
                "n": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "source" not in group.column_names:
            return empty
        src = np.asarray(group["source"].to_pylist(), dtype=object)
        lang = np.asarray(group["lang"].to_pylist(), dtype=object)
        n = group["n"].to_numpy(zero_copy_only=False)
        pairs = np.char.add(
            np.char.add(src.astype(str), "\x01"), lang.astype(str)
        )
        up, inv = np.unique(pairs, return_inverse=True)
        tot = np.zeros(up.shape[0], dtype=np.int64)
        np.add.at(tot, inv, n)
        usrc = np.asarray([p.split("\x01")[0] for p in up], dtype=object)
        ulang = np.asarray([p.split("\x01")[1] for p in up], dtype=object)
        # rows are sorted by (source, lang) via np.unique; stable argmax
        # with lang-ascending tie-break = first index of the max count
        # within each source segment
        new_seg = np.concatenate(([True], usrc[1:] != usrc[:-1]))
        seg_id = np.cumsum(new_seg) - 1
        nseg = int(seg_id[-1]) + 1
        best = np.full(nseg, -1, dtype=np.int64)
        bestn = np.zeros(nseg, dtype=np.int64)
        for i in range(up.shape[0]):  # O(distinct pairs) per partition
            s = seg_id[i]
            if tot[i] > bestn[s]:
                bestn[s] = tot[i]
                best[s] = i
        return pa.table(
            {
                "source": pa.array(list(usrc[best]), type=pa.string()),
                "top_lang": pa.array(list(ulang[best]), type=pa.string()),
                "n": pa.array(bestn),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def event_type_distinct_users(sf_dir: str) -> ray.data.Dataset:
    """Grouped exact COUNT(DISTINCT): distinct users per event_type.
    Same partition-the-VALUE trick as column_profile: dedup (type, user)
    per batch, exchange on user%P — each distinct pair lands in exactly
    one partition, so per-partition pair counts SUM to the exact global
    distinct count per type.  No sort, no global set."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    P = 32

    def partial(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pairs = np.char.add(
            np.char.add(et.astype(str), "\x01"), u.astype(str)
        )
        _, idx = np.unique(pairs, return_index=True)
        return pa.table(
            {
                "event_type": pa.array(list(et[idx]), type=pa.string()),
                "u": pa.array(u[idx]),
                "part": pa.array(u[idx] % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_type": pa.nulls(0, pa.string()),
                "n_partial": pa.nulls(0, pa.int64()),
                "part2": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "event_type" not in group.column_names:
            return empty
        et = np.asarray(group["event_type"].to_pylist(), dtype=object)
        u = group["u"].to_numpy(zero_copy_only=False)
        pairs = np.char.add(np.char.add(et.astype(str), "\x01"), u.astype(str))
        _, idx = np.unique(pairs, return_index=True)
        ue, cnt = np.unique(et[idx].astype(str), return_counts=True)
        return pa.table(
            {
                "event_type": pa.array(list(ue), type=pa.string()),
                "n_partial": pa.array(cnt.astype(np.int64)),
                "part2": pa.array(np.zeros(ue.shape[0], dtype=np.int64)),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_type": pa.nulls(0, pa.string()),
                "n_users": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "event_type" not in group.column_names:
            return empty
        et = np.asarray(group["event_type"].to_pylist(), dtype=object).astype(str)
        n = group["n_partial"].to_numpy(zero_copy_only=False)
        ue, inv = np.unique(et, return_inverse=True)
        tot = np.zeros(ue.shape[0], dtype=np.int64)
        np.add.at(tot, inv, n)
        return pa.table(
            {
                "event_type": pa.array(list(ue), type=pa.string()),
                "n_users": pa.array(tot),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .groupby("part2")
        .map_groups(merge, batch_format="pyarrow")
    )


def user_value_trend(sf_dir: str) -> ray.data.Dataset:
    """Grouped OLS regression: per user, the least-squares slope of event
    value (milli-units) over time (whole seconds since the corpus min).
    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) with every S an EXACT int64
    sum, so the single final float division is bit-identical across
    engines.  Plan: one tiny min(ts) pre-pass (remote merge of per-batch
    mins), then per-batch (n,Sx,Sy,Sxy,Sxx) partials per user -> one
    user%P exchange -> vectorized per-user sum + division.  Overflow
    margin documented: |x| <= corpus time span in seconds; for spans
    where n*Sxx could exceed int64, center x per group first."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    P = 32

    def batch_min(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"m": pa.array([int(us.min())] if us.size else [], type=pa.int64())})

    mins = ev.map_batches(batch_min, batch_format="pyarrow").to_pandas()
    if len(mins) == 0:  # zero-row corpus: to_pandas loses columns (gotcha)
        return ray.data.from_arrow(
            pa.table(
                {
                    "user_id": pa.nulls(0, pa.int64()),
                    "n": pa.nulls(0, pa.int64()),
                    "slope_milli_per_sec": pa.nulls(0, pa.float64()),
                }
            )
        )
    min_us = int(mins.m.min())

    def partial(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        x = (us - min_us) // 1_000_000
        y = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 1000.0
        ).astype(np.int64)
        uu, inv = np.unique(u, return_inverse=True)
        m = uu.shape[0]
        out = {
            "u": uu,
            "n": np.bincount(inv, minlength=m).astype(np.int64),
        }
        for name, arr in (
            ("sx", x),
            ("sy", y),
            ("sxy", x * y),
            ("sxx", x * x),
        ):
            acc = np.zeros(m, dtype=np.int64)
            np.add.at(acc, inv, arr)
            out[name] = acc
        cols = {k: pa.array(v) for k, v in out.items()}
        cols["part"] = pa.array(uu % P)
        return pa.table(cols)

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.nulls(0, pa.int64()),
                "n": pa.nulls(0, pa.int64()),
                "slope_milli_per_sec": pa.nulls(0, pa.float64()),
            }
        )
        if group.num_rows == 0 or "u" not in group.column_names:
            return empty
        u = group["u"].to_numpy(zero_copy_only=False)
        uu, inv = np.unique(u, return_inverse=True)
        m = uu.shape[0]
        sums = {}
        for name in ("n", "sx", "sy", "sxy", "sxx"):
            acc = np.zeros(m, dtype=np.int64)
            np.add.at(acc, inv, group[name].to_numpy(zero_copy_only=False))
            sums[name] = acc
        num = sums["n"] * sums["sxy"] - sums["sx"] * sums["sy"]
        den = sums["n"] * sums["sxx"] - sums["sx"] * sums["sx"]
        keep = den > 0
        return pa.table(
            {
                "user_id": pa.array(uu[keep]),
                "n": pa.array(sums["n"][keep]),
                "slope_milli_per_sec": pa.array(
                    num[keep].astype(np.float64) / den[keep].astype(np.float64)
                ),
            }
        )

    return (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def segment_revenue_share(sf_dir: str) -> pa.Table:
    """Percent-of-total (ratio-to-report): each market segment's share of
    total order revenue.  The per-segment aggregate reuses the
    mktsegment join plan; the grand total is the sum of the <=10 segment
    partials (driver-side on purpose — it IS the final result), and the
    share is one float division of exact int64 cents — bit-identical."""
    seg = mktsegment_order_stats(sf_dir).to_pandas()
    if len(seg) == 0:
        return pa.table(
            {
                "c_mktsegment": pa.nulls(0, pa.string()),
                "total_cents": pa.nulls(0, pa.int64()),
                "revenue_share": pa.nulls(0, pa.float64()),
            }
        )
    total = int(seg.total_cents.sum())
    seg = seg.sort_values("c_mktsegment").reset_index(drop=True)
    return pa.table(
        {
            "c_mktsegment": pa.array(seg.c_mktsegment.tolist(), type=pa.string()),
            "total_cents": pa.array(
                seg.total_cents.astype("int64").tolist(), type=pa.int64()
            ),
            "revenue_share": pa.array(
                (seg.total_cents.astype("float64") / float(total)).tolist(),
                type=pa.float64(),
            ),
        }
    )


def events_zorder(sf_dir: str) -> ray.data.Dataset:
    """Z-order layout keys over events: Morton interleave of
    (user_id low 16 bits, value_milli low 16 bits) + the 64-tile id.
    Exact integer bit arithmetic, SQL-checkable bit for bit
    (pipelines/layout.py; the geohash-blocking trick generalized)."""
    from libpostal_ray.pipelines.layout import zorder_tiles

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        milli = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 1000.0
        ).astype(np.int64)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "value_milli": pa.array(milli),
            }
        )

    out = zorder_tiles(
        ev.map_batches(prep, batch_format="pyarrow"), "user_id", "value_milli"
    )
    return out.select_columns(["event_id", "zkey", "tile"])


def dedup_eval_prefix_vs_exact(sf_dir: str) -> pa.Table:
    """Dedup QA (pipelines/evalmetrics.py): score a cheap blocking
    predictor (same 40-byte text prefix) against exact-duplicate gold
    pairs — tp/fp/fn + precision/recall, all from pair-set exchanges that
    never materialize either set on the driver.  The measurement behind
    the recall>=0.99 obligation, as a first-class operator."""
    import hashlib

    from libpostal_ray.pipelines.evalmetrics import pair_set_metrics, pairs_by_key

    def keyed(prefix_len: int | None):
        def fn(batch: pa.Table) -> pa.Table:
            keys = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.md5(
                            (t if prefix_len is None else t[:prefix_len]).encode()
                        ).digest()[:8],
                        "little",
                    )
                    & 0x7FFFFFFFFFFFFFFF
                    for t in batch["text"].to_pylist()
                ),
                dtype=np.int64,
                count=batch.num_rows,
            )
            return pa.table({"doc_id": batch["doc_id"], "k": pa.array(keys)})

        return fn

    def side(prefix_len):
        ds = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).map_batches(keyed(prefix_len), batch_format="pyarrow")
        return pairs_by_key(ds, key="k", id_col="doc_id")

    return pair_set_metrics(side(40), side(None))


def attribution_pairs(sf_dir: str) -> ray.data.Dataset:
    """Range join, PAIR form (pipelines/relational.interval_join_pairs):
    every (click, purchase) pair of the same user with the purchase in
    (click_ts, click_ts + 6h] — the materializing sibling of
    click_attribution, blow-up bounded by a per-interval cap (set beyond
    reach here so the oracle join matches exactly)."""
    from libpostal_ray.pipelines.relational import interval_join_pairs

    ev = f"{sf_dir}/events.parquet"
    clicks = (
        ray.data.read_parquet(ev, columns=["event_id", "user_id", "ts", "event_type"])
        .map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
        .filter(expr="event_type == 'click'")
        .drop_columns(["event_type"])
    )
    purchases = (
        ray.data.read_parquet(ev, columns=["event_id", "user_id", "ts", "event_type"])
        .map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
        .filter(expr="event_type == 'purchase'")
        .drop_columns(["event_type"])
    )
    # distinct id names per side (the operator keeps the caller's names)
    clicks = clicks.map_batches(
        lambda b: b.rename_columns(
            ["click_id" if c == "event_id" else c for c in b.column_names]
        ),
        batch_format="pyarrow",
    )
    purchases = purchases.map_batches(
        lambda b: b.rename_columns(
            ["purchase_id" if c == "event_id" else c for c in b.column_names]
        ),
        batch_format="pyarrow",
    )
    out = interval_join_pairs(
        purchases,
        clicks,
        point_key="user_id",
        point_ts="ts",
        point_id="purchase_id",
        interval_key="user_id",
        interval_ts="ts",
        interval_id="click_id",
        window_us=ATTRIBUTION_WINDOW_US,
        closed="right",
        per_interval_cap=1_000_000,
    )
    return out.select_columns(["click_id", "purchase_id", "gap_us"])


def bpe_train_merges(sf_dir: str) -> pa.Table:
    """Distributed exact BPE training (pipelines/bpe.py) on the
    deterministic doc_id%4 sample: top-24 byte-pair merges with counts.
    Rows-only (iterative training is not SQL); the merge sequence is
    pinned against a naive single-process reference in tests."""
    from libpostal_ray.pipelines.bpe import train_bpe

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return train_bpe(ds, n_merges=24, sample_mod=4)


def bpe_compression(sf_dir: str) -> ray.data.Dataset:
    """Tokenizer-fit quality measurement: train 12 merges on the doc_id%16
    sample, apply them corpus-wide -> (doc_id, n_bytes, n_tokens)."""
    from libpostal_ray.pipelines.bpe import bpe_encode_counts, train_bpe

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    merges = train_bpe(ds, n_merges=12, sample_mod=16)
    return bpe_encode_counts(ds, merges)


def lineitem_q1_full(sf_dir: str) -> ray.data.Dataset:
    """Full TPC-H Q1 shape: per (returnflag, linestatus) the four sums,
    three averages and count.  Sums are per-row-integerized (cents /
    units) so they are exact; each average is ONE float division of
    exact int64s — bit-identical across engines.  Arrow-native partial
    pre-agg per batch, one skinny groupby."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
        ],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    def partial(batch: pa.Table) -> pa.Table:
        qty = np.floor(
            batch["l_quantity"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        tax = batch["l_tax"].to_numpy(zero_copy_only=False)
        base_c = np.floor(ep * 100.0).astype(np.int64)
        disc_c = np.floor(ep * (1.0 - disc) * 100.0).astype(np.int64)
        charge_c = np.floor(ep * (1.0 - disc) * (1.0 + tax) * 100.0).astype(
            np.int64
        )
        disc_bp = np.floor(disc * 10000.0).astype(np.int64)
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sum_qty": pa.array(qty),
                "sum_base_cents": pa.array(base_c),
                "sum_disc_cents": pa.array(disc_c),
                "sum_charge_cents": pa.array(charge_c),
                "sum_disc_bp": pa.array(disc_bp),
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        g = pa.TableGroupBy(t, ["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("sum_qty", "sum"),
                ("sum_base_cents", "sum"),
                ("sum_disc_cents", "sum"),
                ("sum_charge_cents", "sum"),
                ("sum_disc_bp", "sum"),
                ("n", "sum"),
            ]
        )
        return g.rename_columns(
            [
                "l_returnflag",
                "l_linestatus",
                "sum_qty",
                "sum_base_cents",
                "sum_disc_cents",
                "sum_charge_cents",
                "sum_disc_bp",
                "n",
            ]
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_cents", alias_name="sum_base_cents"),
            Sum("sum_disc_cents", alias_name="sum_disc_cents"),
            Sum("sum_charge_cents", alias_name="sum_charge_cents"),
            Sum("sum_disc_bp", alias_name="sum_disc_bp"),
            Sum("n", alias_name="n"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        out = {c: batch[c] for c in batch.column_names}
        out["avg_qty"] = pa.array(
            batch["sum_qty"].to_numpy(zero_copy_only=False) / n
        )
        out["avg_price_cents"] = pa.array(
            batch["sum_base_cents"].to_numpy(zero_copy_only=False) / n
        )
        out["avg_disc_bp"] = pa.array(
            batch["sum_disc_bp"].to_numpy(zero_copy_only=False) / n
        )
        return pa.table(out)

    return agg.map_batches(finish, batch_format="pyarrow")


def refresh_dedup_cycle(sf_dir: str) -> ray.data.Dataset:
    """The composed production refresh loop (pipelines/incremental.
    refresh_dedup): CDC-diff a derived re-crawl against the documents
    corpus, near-dup-verdict ONLY the moved rows.  Snapshot derivation:
    doc_id%13==0 edited (' v2' suffix -> near-dup of its old self),
    doc_id%25==0 re-inserted as exact copies under new ids."""
    from libpostal_ray.pipelines.incremental import refresh_dedup
    from libpostal_ray.sources.readers import read_documents_corpus

    corpus = read_documents_corpus(sf_dir)

    def derive(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        text = batch["content"].combine_chunks()
        edited = pc.if_else(
            pa.array(ids % 13 == 0),
            pc.binary_join_element_wise(
                text,
                pa.scalar(" v2", type=text.type),
                pa.scalar("", type=text.type),
            ),
            text,
        )
        base = batch.set_column(
            batch.schema.get_field_index("content"), "content", edited
        )
        ins = batch.filter(pa.array(ids % 25 == 0))
        iid = (
            ins["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            + 10_000_000
        )
        ins = ins.set_column(
            ins.schema.get_field_index("doc_id"),
            "doc_id",
            pa.array(iid, type=pa.int64()),
        )
        return pa.concat_tables([base, ins]).combine_chunks()

    snapshot = read_documents_corpus(sf_dir).map_batches(
        derive, batch_format="pyarrow"
    )
    return refresh_dedup(corpus, snapshot)


def cosine_threshold_calibration(sf_dir: str) -> ray.data.Dataset:
    """Threshold calibration: the cosine distribution over a
    deterministic 5% sample of adjacent-id embedding pairs, binned 0.1
    wide — the histogram a user reads before choosing an embedding-dup
    threshold.  One (vec_id//2)%P exchange co-locates each sampled pair
    (the sample bound makes the vector exchange O(sampled pairs), the
    100 TB discipline); per-partition cosine + histogram partials, tiny
    bin merge."""
    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    P = 32

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = ids // 2
        keep = (pk % 20 == 0) & (pk * 2 + 1 >= 0)
        sub = batch.filter(pa.array(keep))
        sids = sub["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "pk": pa.array(sids // 2),
                "vec_id": pa.array(sids),
                "embedding": sub["embedding"],
                "part": pa.array((sids // 2) % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cos_bin": pa.nulls(0, pa.int64()),
                "n_partial": pa.nulls(0, pa.int64()),
                "part2": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "pk" not in group.column_names:
            return empty
        pk = group["pk"].to_numpy(zero_copy_only=False)
        vid = group["vec_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((vid, pk))
        pks, vids = pk[order], vid[order]
        arr = group["embedding"].combine_chunks()
        m = (
            arr.flatten()
            .to_numpy(zero_copy_only=False)
            .reshape(group.num_rows, -1)
            .astype(np.float64)[order]
        )
        # adjacent rows with the same pair key AND consecutive ids form
        # a sampled pair (ids with a missing partner drop out)
        same = (pks[1:] == pks[:-1]) & (vids[1:] == vids[:-1] + 1)
        a = m[:-1][same]
        b = m[1:][same]
        dot = (a * b).sum(axis=1)
        na = np.sqrt((a * a).sum(axis=1))
        nb = np.sqrt((b * b).sum(axis=1))
        cos = dot / np.maximum(na * nb, 1e-300)
        bins = np.clip(np.floor(cos * 10.0).astype(np.int64), -10, 10)
        u, c = np.unique(bins, return_counts=True)
        return pa.table(
            {
                "cos_bin": pa.array(u),
                "n_partial": pa.array(c.astype(np.int64)),
                "part2": pa.array(np.zeros(u.shape[0], dtype=np.int64)),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cos_bin": pa.nulls(0, pa.int64()),
                "n_pairs": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "cos_bin" not in group.column_names:
            return empty
        b = group["cos_bin"].to_numpy(zero_copy_only=False)
        n = group["n_partial"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(b, return_inverse=True)
        tot = np.zeros(u.shape[0], dtype=np.int64)
        np.add.at(tot, inv, n)
        return pa.table({"cos_bin": pa.array(u), "n_pairs": pa.array(tot)})

    return (
        emb.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .groupby("part2")
        .map_groups(merge, batch_format="pyarrow")
    )


def user_value_p50_sketch(sf_dir: str) -> ray.data.Dataset:
    """Approximate per-user median event value via mergeable quantile
    sketches (functions/quantile.grouped_sketch_quantiles) — the
    high-cardinality grouped-quantile path: the exchange ships one
    O(k log n) sketch per (batch, user), never values.  Rows-only; the
    sketch family's rank-error bound is pytest-checked, and groups
    smaller than k are EXACT (no compaction ever triggers)."""
    from libpostal_ray.functions.quantile import grouped_sketch_quantiles

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_sketch_quantiles(ev, "user_id", "value", [0.5])

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch["k"],
                "n": batch["n"],
                "p50_value": batch["q_0_5"],
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


REDACT_MASK_TERMS = ["spark", "window"]  # stand-in contamination list: the
                                         # synthetic corpus has no PII, so
                                         # the canary-mask family is what
                                         # makes the oracle row non-trivial


def redact_docs(sf_dir: str) -> ray.data.Dataset:
    """PII + contamination-string redaction: (doc_id, redacted, n_masked).
    Vectorized RE2 over Arrow string columns (functions/redact.py); the
    pattern list = email/URL/digit-run PII + a word-bounded canary list."""
    from libpostal_ray.functions.redact import (
        PII_PATTERNS,
        mask_terms_pattern,
        redact_column,
    )

    patterns = PII_PATTERNS + [(mask_terms_pattern(REDACT_MASK_TERMS), "<MASK>")]

    def f(batch: pa.Table) -> pa.Table:
        red, n = redact_column(batch["text"], patterns)
        return pa.table(
            {"doc_id": batch["doc_id"], "redacted": red, "n_masked": n}
        )

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow")


# ------------------------------------------------------------ relational
def lineitem_agg(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q1-shaped aggregate with PARTIAL pre-aggregation: per-batch
    pandas groupby emits one row per key per batch; the global groupby then
    shuffles only partials (SURVEY.md section 4 / ray_guide 'Aggregation at
    scale').  Money is integerized per row (floor(x*100) cents) so both
    engines sum exact integers."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    )

    def partial(batch: pa.Table) -> pa.Table:
        qty = np.floor(batch["l_quantity"].to_numpy(zero_copy_only=False)).astype(np.int64)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sum_qty": pa.array(qty),
                "sum_price_cents": pa.array(np.floor(price * 100.0).astype(np.int64)),
                "revenue_cents": pa.array(
                    np.floor(price * (1.0 - disc) * 100.0).astype(np.int64)
                ),
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        g = pa.TableGroupBy(t, ["l_returnflag", "l_linestatus"]).aggregate(
            [("sum_qty", "sum"), ("sum_price_cents", "sum"), ("revenue_cents", "sum"), ("n", "sum")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_price_cents", "revenue_cents", "n"]
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_price_cents", alias_name="sum_price_cents"),
            Sum("revenue_cents", alias_name="revenue_cents"),
            Sum("n", alias_name="n"),
        )
    )


def events_hourly(sf_dir: str) -> ray.data.Dataset:
    """Tumbling-window aggregate: (event_type, hour_bucket, n, sum_value_milli)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = ts // (3600 * 1_000_000)
        milli = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 1000.0
        ).astype(np.int64)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "hour_bucket": pa.array(hour.astype(np.int64)),
                "n_part": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "sum_value_milli": pa.array(milli),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["event_type", "hour_bucket"])
        .aggregate(
            Sum("n_part", alias_name="n"),
            Sum("sum_value_milli", alias_name="sum_value_milli"),
        )
    )


# ---------------------------------------------------------------- ANN
def ann_topk(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Brute-force cosine top-k of the vec_id=0 embedding over the corpus:
    (vec_id, cos_sim).  Broadcast query matrix; float64; rounded to 4dp."""
    import pyarrow.parquet as pq

    from libpostal_ray.pipelines.ann import brute_force_topk

    emb = _embeddings(sf_dir)
    # pushed-down point read for the query row: only matching row groups
    # are decoded, nothing corpus-sized ever lands on the driver
    qrow = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "==", 0)],
    )
    qm = np.array(qrow["embedding"].to_pylist(), dtype=np.float64)
    res = brute_force_topk(emb, qm, np.array([0]), k=k).to_pandas()
    res["cos_sim"] = res["cos_sim"].round(4)
    return res[["vec_id", "cos_sim"]].sort_values("vec_id").reset_index(drop=True)


# --------------------------------------------------- near-dupe (rows-only)
def near_dupe_clusters(sf_dir: str) -> ray.data.Dataset:
    """Flagship near-dup pipeline over the documents table -> cluster
    assignment (doc_id, cluster_id, n_chars)."""
    from libpostal_ray.pipelines.near_dupe import near_dupe_pipeline

    out = near_dupe_pipeline(read_documents_corpus(sf_dir), PipelineConfig())
    return out["clusters"].select_columns(["doc_id", "cluster_id", "n_chars"])


def dedup_report(sf_dir: str) -> ray.data.Dataset:
    """The keep/drop decision per document (dedupe.c:78-156 analog):
    (doc_id, cluster_id, n_copies, keep, reason)."""
    from libpostal_ray.pipelines.near_dupe import dedup_report as _report

    return _report(read_documents_corpus(sf_dir), PipelineConfig())


def near_dupe_clusters_with_spans(sf_dir: str) -> ray.data.Dataset:
    """Flagship clustering with the suffix-array SPAN edges wired in
    (cfg.span_edges): exact shared substrings merge clusters too."""
    from libpostal_ray.pipelines.near_dupe import near_dupe_pipeline

    cfg = PipelineConfig(span_edges=True, min_span_len=60, num_partitions=8)
    out = near_dupe_pipeline(read_documents_corpus(sf_dir), cfg)
    return out["clusters"].select_columns(["doc_id", "cluster_id", "n_chars"])


def minhash_lsh_edges(sf_dir: str) -> ray.data.Dataset:
    """Verified candidate edges over documents: (src, dst, status, est_jaccard)."""
    from libpostal_ray.pipelines.near_dupe import candidate_edges, signatures

    cfg = PipelineConfig()
    sigs = signatures(read_documents_corpus(sf_dir), cfg)
    return candidate_edges(sigs, cfg).select_columns(
        ["src", "dst", "status", "est_jaccard"]
    )


def near_dupe_hash_keys(sf_dir: str) -> ray.data.Dataset:
    """The near_dupe_hashes analog (near_dupe.c:643-1216): (doc_id, band_key)."""
    from libpostal_ray.pipelines.near_dupe import near_dupe_hashes, signatures

    cfg = PipelineConfig()
    sigs = signatures(read_documents_corpus(sf_dir), cfg)
    return near_dupe_hashes(sigs, cfg)


def simhash64(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, simhash_hex): 64-bit SimHash of each document's canonical
    text (hex string: the uint64 domain is not int64-safe)."""
    from libpostal_ray.functions.canonicalize import canonicalize_one
    from libpostal_ray.functions.hashing import rolling_shingle_hashes
    from libpostal_ray.functions.simhash import simhash_batch

    cfg = PipelineConfig()

    def f(batch: pa.Table) -> pa.Table:
        canon = [canonicalize_one(t) for t in batch["text"].to_pylist()]
        per_doc = [
            rolling_shingle_hashes(c.encode("utf-8"), cfg.shingle_k) for c in canon
        ]
        counts = np.array([h.shape[0] for h in per_doc], dtype=np.int64)
        concat = (
            np.concatenate(per_doc) if per_doc else np.empty(0, dtype=np.uint64)
        )
        offsets = np.zeros(len(canon) + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        h = simhash_batch(concat, offsets)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash_hex": pa.array([f"{int(x):016x}" for x in h]),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow")


def langid(sf_dir: str) -> ray.data.Dataset:
    def f(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pred_lang": pa.array(
                    langid_heuristic(batch["text"].to_pylist()), type=pa.string()
                ),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow")


def substring_spans(sf_dir: str) -> ray.data.Dataset:
    """Suffix-array exact-span pass over the documents table:
    (src, dst, span_len) for docs sharing an exact span >= 30 chars."""
    from libpostal_ray.pipelines.substring import substring_pass

    cfg = PipelineConfig(min_span_len=30, num_partitions=8)
    return substring_pass(read_documents_corpus(sf_dir), cfg).select_columns(
        ["src", "dst", "span_len"]
    )


def ann_topk_lsh(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Scale-path ANN: hyperplane-LSH bucketed cosine top-k (approximate;
    queries probe only their own bucket)."""
    import pyarrow.parquet as pq

    from libpostal_ray.pipelines.ann import bucketed_topk

    emb = _embeddings(sf_dir)
    qrow = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "==", 0)],
    )
    qm = np.array(qrow["embedding"].to_pylist(), dtype=np.float64)
    res = bucketed_topk(emb, qm, np.array([0]), k=k, bits=4, probes=1, tables=4).to_pandas()
    res["cos_sim"] = res["cos_sim"].round(4)
    return res[["vec_id", "cos_sim", "rank"]].sort_values("rank").reset_index(drop=True)


def ann_topk_ivf(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """IVF ANN: distributed k-means coarse quantizer (one map_batches pass
    per Lloyd iteration, k x d partials only) + nprobe centroid buckets."""
    import pyarrow.parquet as pq

    from libpostal_ray.pipelines.ann import ivf_topk

    emb = _embeddings(sf_dir)
    qrow = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "==", 0)],
    )
    qm = np.array(qrow["embedding"].to_pylist(), dtype=np.float64)
    res = ivf_topk(emb, qm, np.array([0]), k=k, n_centroids=16, nprobe=8).to_pandas()
    res["cos_sim"] = res["cos_sim"].round(4)
    return res[["vec_id", "cos_sim", "rank"]].sort_values("rank").reset_index(drop=True)


def ann_topk_ivf_sq8(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """IVF ANN over an SQ8-compressed index (pipelines/ann.ivf_sq8_topk):
    1 byte/dim index, float embeddings dropped before the probe — the
    memory scale path.  Approximate by design; recall-bound tested."""
    import pyarrow.parquet as pq

    from libpostal_ray.pipelines.ann import ivf_sq8_topk

    emb = _embeddings(sf_dir)
    qrow = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "==", 0)],
    )
    qm = np.array(qrow["embedding"].to_pylist(), dtype=np.float64)
    res = ivf_sq8_topk(
        emb, qm, np.array([0]), k=k, n_centroids=16, nprobe=8
    ).to_pandas()
    res["cos_sim"] = res["cos_sim"].round(4)
    return res[["vec_id", "cos_sim", "rank"]].sort_values("rank").reset_index(drop=True)


def semantic_dedup(sf_dir: str, eps: float = 0.4, n_clusters: int = 8) -> pd.DataFrame:
    """SemDeDup verdicts over the embeddings table: k-means partition, then
    within-cluster cosine dup groups keep one representative (lowest
    centroid_sim).  Not SQL-expressible (iterative k-means) — rows-only;
    the kernel itself is fixture-tested in tests/test_semdedup.py.
    eps=0.4 sits just under the synthetic corpus's max pairwise cosine
    (~0.48) so the verdict table exercises real dup groups."""
    from libpostal_ray.pipelines.semdedup import semantic_dedup as _sem

    res = _sem(_embeddings(sf_dir), eps=eps, n_clusters=n_clusters).to_pandas()
    return res.sort_values("vec_id").reset_index(drop=True)


def fingerprint_counts(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_fingerprints): winnowed rolling-hash fingerprint counts."""
    return (
        _docs(sf_dir)
        .map_batches(fingerprint_batch, batch_format="pyarrow")
        .select_columns(["doc_id", "n_fingerprints"])
    )


def top_events_by_value(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Top-k events by value: the sort/limit operator (SURVEY 2.6 top-k).
    value integerized (floor milli) so both engines rank identically;
    deterministic tie-break on event_id."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "value"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        milli = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 1000.0
        ).astype(np.int64)
        return pa.table(
            {"event_id": batch["event_id"], "value_milli": pa.array(milli)}
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .sort(["value_milli", "event_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    return out.reset_index(drop=True)


def cluster_size_topk(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Top-k duplicate clusters by size over the documents near-dup pipeline
    (the reference's 'report top duplicated groups' pattern)."""
    cl = near_dupe_clusters(sf_dir)
    from ray.data.aggregate import Count

    sizes = cl.groupby("cluster_id").aggregate(Count(alias_name="n_members"))
    return (
        sizes.sort(["n_members", "cluster_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
        .reset_index(drop=True)
    )


# above this corpus size the brute all-pairs matmul (O(N^2) work against a
# broadcast (N x d) matrix) is a scale-killer: route through the bucketed
# LSH path instead (per-bucket all-pairs, O(N * bucket * tables) work).
# The brute path stays the small-N plan because it is EXACT (the oracle
# compares against SQL's exact all-pairs); the bucketed path is the
# documented-approximate 100-TB plan.
EMBEDDING_DUPS_BRUTE_MAX = 100_000


def embedding_dups(
    sf_dir: str, threshold: float = 0.3, brute_max: int = EMBEDDING_DUPS_BRUTE_MAX
) -> ray.data.Dataset:
    """Embedding-cosine near-duplicate pairs: (vec_a, vec_b, cos_sim) for
    all pairs with cosine >= threshold (vec_a < vec_b).

    Hybrid: corpora up to ``brute_max`` rows use the exact broadcast
    all-pairs matmul (the oracle plan); larger corpora route through the
    hyperplane-LSH bucketed pair emitter (pipelines/ann.embedding_dup_pairs)
    — per-bucket all-pairs only, no O(N^2) score block anywhere."""
    import pyarrow.parquet as pq

    import ray as _ray

    emb = _embeddings(sf_dir)
    if emb.count() > brute_max:
        from libpostal_ray.pipelines.ann import embedding_dup_pairs

        dim = len(emb.take(1)[0]["embedding"])
        return embedding_dup_pairs(emb, threshold, dim)

    @_ray.remote
    def _build_state(*blocks) -> dict:
        t = pa.concat_tables([b for b in blocks if b.num_rows])
        ids_all = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        col = t["embedding"].combine_chunks()
        m = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        m = m.reshape(t.num_rows, -1)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        return {"ids": ids_all, "m": m}

    # the corpus matrix is assembled in a WORKER task from the dataset's own
    # blocks and broadcast by ObjectRef — the driver never holds it
    ref = _build_state.remote(*emb.materialize().to_arrow_refs())

    def pairs(batch: pa.Table) -> pa.Table:
        state = _ray.get(ref)
        bids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bm = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        bm = bm / np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-30)
        scores = bm @ state["m"].T  # (b, N)
        bi, ni = np.nonzero(scores >= threshold)
        a = bids[bi]
        b = state["ids"][ni]
        keep = a < b  # each unordered pair once, no self-pairs
        a, b = a[keep], b[keep]
        s = np.round(scores[bi, ni][keep], 4)
        return pa.table(
            {
                "vec_a": pa.array(a, type=pa.int64()),
                "vec_b": pa.array(b, type=pa.int64()),
                "cos_sim": pa.array(s, type=pa.float64()),
            }
        )

    return emb.map_batches(pairs, batch_format="pyarrow", batch_size=256)


def distinct_users(sf_dir: str) -> ray.data.Dataset:
    """Count-distinct per event_type: (event_type, n_users).  Partial
    pattern: per-batch unique pairs -> groupby -> exact distinct count."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )

    def uniq(batch: pa.Table) -> pa.Table:
        return batch.group_by(["event_type", "user_id"]).aggregate([])

    pairs = ds.map_batches(uniq, batch_format="pyarrow").groupby(
        ["event_type", "user_id"]
    ).aggregate(Count(alias_name="_c"))
    return (
        pairs.groupby("event_type").aggregate(Count(alias_name="n_users"))
    )


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def user_event_pivot(sf_dir: str) -> ray.data.Dataset:
    """PIVOT events on event_type: one row per user with per-type event
    counts and per-type value sums (milli-units).  Conditional aggregation
    — the pivot columns become indicator measures inside the partial
    pre-agg, so the plan is ONE scan + ONE skinny groupby regardless of
    pivot width; no per-type scans, no join."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "value"]
    )
    n_cols = [f"n_{t}" for t in EVENT_TYPES]
    v_cols = [f"milli_{t}" for t in EVENT_TYPES]

    def partial(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        milli = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 1000.0
        ).astype(np.int64)
        cols = {"user_id": batch["user_id"]}
        for t, nc, vc in zip(EVENT_TYPES, n_cols, v_cols):
            m = et == t
            cols[nc] = pa.array(m.astype(np.int64))
            cols[vc] = pa.array(np.where(m, milli, 0))
        t_ = pa.table(cols)
        g = pa.TableGroupBy(t_, "user_id").aggregate(
            [(c, "sum") for c in (*n_cols, *v_cols)]
        )
        g = g.rename_columns(["user_id", *n_cols, *v_cols])
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return g.append_column("part", pa.array(uid % 32, type=pa.int64()))

    def final(group: pa.Table) -> pa.Table:
        # one engine-aggregate per measure column costs a sort pass each;
        # the key%P exchange + one Arrow hash-agg inside the kernel does
        # all 2x|types| measures in a single pass (same pattern as
        # boilerplate_ngrams / window_over_key)
        if group.num_rows == 0 or "user_id" not in group.column_names:
            return pa.table(
                {
                    "user_id": pa.nulls(0, pa.int64()),
                    **{c: pa.nulls(0, pa.int64()) for c in (*n_cols, *v_cols)},
                }
            )
        g = pa.TableGroupBy(
            group.select(["user_id", *n_cols, *v_cols]), "user_id"
        ).aggregate([(c, "sum") for c in (*n_cols, *v_cols)])
        return g.rename_columns(["user_id", *n_cols, *v_cols])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(final, batch_format="pyarrow")
    )


def _user_type_flag_sums(
    sf_dir: str, type_a: str, type_b: str, min_value: float
) -> ray.data.Dataset:
    """Per user: (user_id, a, b) with a/b > 0 iff the user has a qualifying
    (type, value >= min_value) event.  Partial pre-agg inside map_batches
    (per-batch group_by ORs the indicators) so the global shuffle carries
    one skinny row per (batch, user), never the raw event stream — the
    set-op building block."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id", "value"]
    )

    def flags(batch: pa.Table) -> pa.Table:
        et = batch["event_type"]
        keep = pc.and_(
            pc.is_in(et, value_set=pa.array([type_a, type_b])),
            pc.greater_equal(batch["value"], min_value),
        )
        t = batch.filter(keep)
        a = pc.cast(pc.equal(t["event_type"], type_a), pa.int64())
        b = pc.cast(pc.equal(t["event_type"], type_b), pa.int64())
        part = pa.table({"user_id": t["user_id"], "a": a, "b": b})
        return part.group_by("user_id").aggregate([("a", "max"), ("b", "max")]).rename_columns(
            ["user_id", "a", "b"]
        )

    agg = (
        ds.map_batches(flags, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum(on="a", alias_name="a"), Sum(on="b", alias_name="b"))
    )
    return agg


SETOP_MIN_VALUE = 95.0  # qualifying-event threshold: the synthetic events
                        # are dense (every user has every type), so the
                        # set ops are only non-trivial over a value filter


def users_with_both(
    sf_dir: str,
    type_a: str = "purchase",
    type_b: str = "error",
    min_value: float = SETOP_MIN_VALUE,
) -> ray.data.Dataset:
    """Set INTERSECT: distinct users with BOTH a qualifying ``type_a`` and
    ``type_b`` event (§2.7 set ops; khash-set intersection analog,
    dedupe.c:13-31 — expressed as a flag aggregate so it is one shuffle,
    not two + a join)."""
    agg = _user_type_flag_sums(sf_dir, type_a, type_b, min_value)

    def finish(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater(batch["a"], 0), pc.greater(batch["b"], 0))
        return pa.table({"user_id": batch.filter(keep)["user_id"]})

    return agg.map_batches(finish, batch_format="pyarrow")


def users_without(
    sf_dir: str,
    type_a: str = "purchase",
    type_b: str = "error",
    min_value: float = SETOP_MIN_VALUE,
) -> ray.data.Dataset:
    """Set EXCEPT: distinct users with a qualifying ``type_a`` event and NO
    qualifying ``type_b`` event — same single-shuffle flag aggregate,
    different final filter."""
    agg = _user_type_flag_sums(sf_dir, type_a, type_b, min_value)

    def finish(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater(batch["a"], 0), pc.equal(batch["b"], 0))
        return pa.table({"user_id": batch.filter(keep)["user_id"]})

    return agg.map_batches(finish, batch_format="pyarrow")


def heavy_hitter_tokens(sf_dir: str, k: int = 20, m: int = 256) -> pd.DataFrame:
    """Approximate top-k tokens by corpus frequency via Misra-Gries
    (functions/heavyhitters.py): each batch ships <= m counter rows (plus
    its decrement), one merge task re-prunes — the exchange is O(batches x
    m), never the vocabulary.  Returns (token, cnt_min, cnt_max): true
    count is guaranteed inside the range; any token with frequency >
    N/(m+1) is guaranteed present.  Rows-only (approximate by design; the
    guarantee is pytest-covered against exact counts)."""
    from libpostal_ray.functions.heavyhitters import mg_merge, mg_prune

    ERR_TOKEN = "\x00__mg_err__"

    def summarize(batch: pa.Table) -> pa.Table:
        txt = pc.utf8_trim_whitespace(batch["text"])
        lists = pc.split_pattern_regex(txt, pattern=r"\s+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = pc.list_flatten(lists)
        t = pa.table({"token": flat})
        g = pa.TableGroupBy(t, "token").aggregate([([], "count_all")])
        toks = np.asarray(g["token"].to_pylist(), dtype=object)
        cnts = g.column(1).to_numpy(zero_copy_only=False).astype(np.int64)
        items, counts, dec = mg_prune(toks, cnts, m)
        out_t = list(items) + [ERR_TOKEN]
        out_c = list(counts) + [dec]
        return pa.table(
            {
                "token": pa.array(out_t, type=pa.string()),
                "cnt": pa.array(np.asarray(out_c, dtype=np.int64)),
            }
        )

    rows = (
        _docs(sf_dir)
        .map_batches(summarize, batch_format="pyarrow")
        .to_pandas()  # <= (m+1) x batches rows — the summaries, not the data
    )
    err_rows = rows.token == ERR_TOKEN
    batch_err = int(rows.cnt[err_rows].sum())
    rows = rows[~err_rows]
    items, counts, merge_dec = mg_merge(
        [(rows.token.to_numpy(), rows.cnt.to_numpy())], m
    )
    total_err = batch_err + merge_dec
    top = np.argsort(counts)[::-1][:k]
    return pd.DataFrame(
        {
            "token": items[top],
            "cnt_min": counts[top],
            "cnt_max": counts[top] + total_err,
        }
    )


def approx_distinct_users_hll(sf_dir: str) -> ray.data.Dataset:
    """Approximate count-distinct per event_type via HyperLogLog
    (functions/hll.py): each batch ships ONE 4 KB register row per type,
    the per-type merge is an elementwise max — at 100 TB the exchange
    volume is (batches x types x 4 KB) instead of every distinct user id.
    Rows-only (approximate by design); the error bound is pytest-covered
    against the exact distinct_users oracle query."""
    from libpostal_ray.functions.hashing import mix_fold_u64
    from libpostal_ray.functions.hll import (
        HLL_P,
        add_hashes,
        empty_registers,
        estimate,
        merge_registers,
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )

    def sketch(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = mix_fold_u64([uid.astype(np.uint64)], salt=0x48_4C_4C)
        types, regs = [], []
        for t in np.unique(et):
            reg = empty_registers()
            add_hashes(reg, h[et == t])
            types.append(str(t))
            regs.append(reg.tobytes())
        return pa.table(
            {
                "event_type": pa.array(types, type=pa.string()),
                "reg": pa.array(regs, type=pa.binary(1 << HLL_P)),
            }
        )

    def reduce_type(group: pa.Table) -> pa.Table:
        regs = np.stack(
            [np.frombuffer(b, dtype=np.uint8) for b in group["reg"].to_pylist()]
        )
        n = int(round(estimate(merge_registers(regs))))
        return pa.table(
            {
                "event_type": group["event_type"][:1],
                "n_users_approx": pa.array([n], type=pa.int64()),
            }
        )

    return (
        ds.map_batches(sketch, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(reduce_type, batch_format="pyarrow")
    )


def user_event_count_cms(
    sf_dir: str, width: int = 2048, depth: int = 4, n_probe: int = 100
) -> pd.DataFrame:
    """Per-user event-count point estimates via a count-min sketch
    (functions/cms.py): each batch ships ONE depth x width int64 grid
    (64 KB at the defaults) and the merge is a cell-wise SUM — linear,
    associative, blocking-independent — so at 100 TB the exchange is
    (batches x 64 KB) regardless of user cardinality, where an exact
    per-user count would shuffle every distinct user id.  Probes the
    first n_probe user ids; estimates NEVER undercount and overshoot by
    <= (e/width) * N w.p. >= 1 - e^-depth.  Rows-only (approximate by
    design; the bound is pytest-covered against exact groupby counts)."""
    from libpostal_ray.functions.cms import (
        cms_add,
        cms_merge,
        cms_query,
        empty_sketch,
    )

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    cells = width * depth

    def sketch(batch: pa.Table) -> pa.Table:
        empty = pa.table({"grid": pa.nulls(0, pa.binary(cells * 8))})
        if batch.num_rows == 0 or "user_id" not in batch.column_names:
            return empty
        sk = empty_sketch(width, depth)
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cms_add(sk, u)
        return pa.table(
            {"grid": pa.array([sk.tobytes()], type=pa.binary(cells * 8))}
        )

    grids = [
        np.frombuffer(b, dtype=np.int64).reshape(depth, width)
        for batch in ds.map_batches(sketch, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")  # one 64 KB row per batch
        for b in batch["grid"].to_pylist()
    ]
    if not grids:
        return pd.DataFrame(
            {"user_id": pd.Series(dtype="int64"),
             "est_count": pd.Series(dtype="int64")}
        )
    merged = cms_merge(grids)
    probe = np.arange(n_probe, dtype=np.int64)
    return pd.DataFrame(
        {"user_id": probe, "est_count": cms_query(merged, probe)}
    )


def simhash_dup_pairs(sf_dir: str, max_hamming: int = 3) -> ray.data.Dataset:
    """SimHash near-dup pairs over documents: (src, dst, hamming) with
    hamming <= max_hamming, found via chunk-key blocking (pigeonhole) —
    the standalone SimHash dedup operator."""
    from libpostal_ray.functions.canonicalize import canonicalize_one
    from libpostal_ray.functions.hashing import rolling_shingle_hashes
    from libpostal_ray.functions.simhash import simhash_batch, simhash_chunk_keys

    cfg = PipelineConfig()

    def sketch(batch: pa.Table) -> pa.Table:
        canon = [canonicalize_one(t) for t in batch["text"].to_pylist()]
        per_doc = [
            rolling_shingle_hashes(c.encode("utf-8"), min(cfg.shingle_k, max(1, len(c.encode("utf-8")))))
            for c in canon
        ]
        counts = np.array([h.shape[0] for h in per_doc], dtype=np.int64)
        concat = np.concatenate(per_doc) if per_doc else np.empty(0, dtype=np.uint64)
        offsets = np.zeros(len(canon) + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        sims = simhash_batch(concat, offsets)
        keys = simhash_chunk_keys(sims, max_hamming + 1)  # d+1 chunks
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": pa.array(sims.view(np.int64), type=pa.int64()),
                "chunk_keys": pa.array(
                    [k.tolist() for k in keys], type=pa.list_(pa.int64())
                ),
            }
        )

    sk = _docs(sf_dir).map_batches(sketch, batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        ck = batch["chunk_keys"]
        if isinstance(ck, pa.ChunkedArray):
            ck = ck.combine_chunks()
        lens = pc.list_value_length(ck).to_numpy(zero_copy_only=False)
        idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
        return pa.table(
            {
                "block_key": ck.flatten(),
                "doc_id": batch["doc_id"].take(pa.array(idx)),
                "simhash": batch["simhash"].take(pa.array(idx)),
            }
        )

    def verify(group: pa.Table) -> pa.Table:
        n = group.num_rows
        empty = pa.schema(
            [("src", pa.int64()), ("dst", pa.int64()), ("hamming", pa.int64())]
        ).empty_table()
        if n < 2:
            return empty
        keys = group["block_key"].to_numpy(zero_copy_only=False)
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        sims = (
            group["simhash"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        )
        order = np.lexsort((ids, keys))
        keys, ids, sims = keys[order], ids[order], sims[order]
        starts = np.flatnonzero(np.concatenate(([True], keys[1:] != keys[:-1])))
        ends = np.concatenate((starts[1:], [n]))
        li_l, ri_l = [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m >= 2:
                li, ri = np.triu_indices(m, k=1)
                li_l.append(li + s)
                ri_l.append(ri + s)
        if not li_l:
            return empty
        li = np.concatenate(li_l)
        ri = np.concatenate(ri_l)
        x = (sims[li] ^ sims[ri]).view(np.uint8).reshape(-1, 8)
        ham = np.unpackbits(x, axis=1).sum(axis=1).astype(np.int64)
        keep = ham <= max_hamming
        li, ri, ham = li[keep], ri[keep], ham[keep]
        if li.shape[0] == 0:
            return empty
        src = np.minimum(ids[li], ids[ri])
        dst = np.maximum(ids[li], ids[ri])
        order2 = np.lexsort((dst, src))
        src, dst, ham = src[order2], dst[order2], ham[order2]
        kp = np.concatenate(([True], (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])))
        return pa.table(
            {
                "src": pa.array(src[kp], type=pa.int64()),
                "dst": pa.array(dst[kp], type=pa.int64()),
                "hamming": pa.array(ham[kp], type=pa.int64()),
            }
        )

    P = 64

    def add_part(batch: pa.Table) -> pa.Table:
        k = batch["block_key"].to_numpy(zero_copy_only=False)
        return batch.append_column("part", pa.array((k % P).astype("int64")))

    exploded = sk.map_batches(explode, batch_format="pyarrow").map_batches(
        add_part, batch_format="pyarrow"
    )
    raw = exploded.groupby("part").map_groups(verify, batch_format="pyarrow")
    # global pair dedup (a pair can collide in several chunk blocks)
    from ray.data.aggregate import Min as _Min

    return raw.groupby(["src", "dst"]).aggregate(_Min("hamming", alias_name="hamming"))


def mktsegment_order_stats(sf_dir: str) -> ray.data.Dataset:
    """Large-large hash join (orders x customer on custkey) -> per-market-
    segment order count + total price cents.  The Dataset.join operator with
    partial pre-aggregation BEFORE the final groupby: only (segment,
    partials) shuffle twice."""
    from libpostal_ray.pipelines.cluster import effective_join_partitions

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    # empty datasets lose their schema inside Dataset.join (engine-wide
    # gotcha) — parquet row counts are metadata-cheap, so guard the join
    if orders.count() == 0 or cust.count() == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "c_mktsegment": pa.nulls(0, pa.string()),
                    "total_cents": pa.nulls(0, pa.int64()),
                    "n_orders": pa.nulls(0, pa.int64()),
                }
            )
        )
    j = orders.join(
        cust,
        join_type="inner",
        num_partitions=effective_join_partitions(16),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        t = pa.table(
            {
                "c_mktsegment": batch["c_mktsegment"],
                "cents": pa.array(cents),
                "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        g = pa.TableGroupBy(t, "c_mktsegment").aggregate(
            [("cents", "sum"), ("one", "sum")]
        )
        return g.rename_columns(["c_mktsegment", "cents", "one"])

    return (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Sum("cents", alias_name="total_cents"),
            Sum("one", alias_name="n_orders"),
        )
    )


def supplier_nation_agg(sf_dir: str) -> ray.data.Dataset:
    """Broadcast lookup join: the tiny nation table is ray.put once and
    mapped into every supplier batch (never a shuffle join — the
    dictionary-trie-broadcast pattern, SURVEY 2.4) -> per-nation supplier
    count + account balance cents."""
    import ray as _ray
    import pyarrow.parquet as pq

    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    keys = nat["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    names = np.asarray(nat["n_name"].to_pylist(), dtype=object)
    order = np.argsort(keys)
    ref = _ray.put({"keys": keys[order], "names": names[order]})

    sup = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_nationkey", "s_acctbal"]
    )

    def attach(batch: pa.Table) -> pa.Table:
        state = _ray.get(ref)
        nk = batch["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(state["keys"], nk)
        cents = np.floor(
            batch["s_acctbal"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        t = pa.table(
            {
                "n_name": pa.array(state["names"][pos], type=pa.string()),
                "cents": pa.array(cents),
                "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        g = pa.TableGroupBy(t, "n_name").aggregate(
            [("cents", "sum"), ("one", "sum")]
        )
        return g.rename_columns(["n_name", "cents", "one"])

    return (
        sup.map_batches(attach, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(
            Sum("cents", alias_name="acctbal_cents"),
            Sum("one", alias_name="n_suppliers"),
        )
    )


def hot_buckets(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Bucket-frequency stats: top-k LSH band keys by member count — the
    vendored/boilerplate skew detector (SURVEY.md section 4: bucket-frequency
    aggregate feeding the salting/cap policy).  Pre-aggregated per batch."""
    from libpostal_ray.pipelines.near_dupe import near_dupe_hashes, signatures

    cfg = PipelineConfig()
    sigs = signatures(read_documents_corpus(sf_dir), cfg)
    keys = near_dupe_hashes(sigs, cfg)

    def partial(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(batch, "band_key").aggregate([([], "count_all")])
        return g.rename_columns(["band_key", "n_part"])

    counts = (
        keys.map_batches(partial, batch_format="pyarrow")
        .groupby("band_key")
        .aggregate(Sum("n_part", alias_name="n_members"))
    )
    return (
        counts.sort(["n_members", "band_key"], descending=[True, False])
        .limit(k)
        .to_pandas()
        .reset_index(drop=True)
    )


# ------------------------------------------------------- BPE-ish tokenization
# the "BPE-ish regex" pre-tokenizer of LLM data pipelines: letter runs,
# digit runs, single punctuation marks (GPT-2-style pre-tokenization shape)
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_tokens): count of BPE-ish pre-tokens per doc.  Vectorized
    via pandas' C regex engine (str.count) inside map_batches."""

    def count_tokens(batch: pa.Table) -> pa.Table:
        s = batch["text"].to_pandas().fillna("")
        n = s.str.count(BPE_TOKEN_PATTERN).astype("int64")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array(n.to_numpy(), type=pa.int64()),
            }
        )

    return (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(count_tokens, batch_format="pyarrow")
    )


def lineitem_rollup(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP(l_returnflag, l_linestatus) — hierarchy rollup as a
    first-class operator.  Physical plan: ONE distributed aggregate at the
    finest grain (partial pre-agg inside map_batches, then the small global
    groupby), and every coarser level is DERIVED from the finest result on
    the driver — the fact table is scanned once, never re-shuffled per
    level (finest-level cardinality = #rf x #ls ~ 6 rows, so the derivation
    is trivially driver-side at any corpus scale).  Rolled-up key slots are
    'ALL' (COALESCE'd in the oracle too) to keep value hashing
    NULL-ordering-free."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    )

    def partial(batch: pa.Table) -> pa.Table:
        qty = np.floor(
            batch["l_quantity"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sum_qty": pa.array(qty),
                "revenue_cents": pa.array(
                    np.floor(price * (1.0 - disc) * 100.0).astype(np.int64)
                ),
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        g = pa.TableGroupBy(t, ["l_returnflag", "l_linestatus"]).aggregate(
            [("sum_qty", "sum"), ("revenue_cents", "sum"), ("n", "sum")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "revenue_cents", "n"]
        )

    fine = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("revenue_cents", alias_name="revenue_cents"),
            Sum("n", alias_name="n"),
        )
        .to_pandas()
    )
    meas = ["sum_qty", "revenue_cents", "n"]
    lvl1 = fine.groupby("l_returnflag", as_index=False)[meas].sum()
    lvl1["l_linestatus"] = "ALL"
    lvl0 = fine[meas].sum().to_frame().T
    lvl0["l_returnflag"] = "ALL"
    lvl0["l_linestatus"] = "ALL"
    cols = ["l_returnflag", "l_linestatus", *meas]
    out = pd.concat([fine[cols], lvl1[cols], lvl0[cols]], ignore_index=True)
    for m in meas:
        out[m] = out[m].astype("int64")
    return out


def orders_cube(sf_dir: str) -> pd.DataFrame:
    """GROUP BY CUBE(o_orderstatus, o_orderpriority) — all four grouping
    sets from ONE distributed aggregate at the finest grain (same
    single-scan physical plan as lineitem_rollup, plus the (ALL, p)
    cross-slice a ROLLUP lacks).  Rolled-up slots are 'ALL'."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        t = pa.table(
            {
                "o_orderstatus": batch["o_orderstatus"],
                "o_orderpriority": batch["o_orderpriority"],
                "price_cents": pa.array(cents),
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        g = pa.TableGroupBy(t, ["o_orderstatus", "o_orderpriority"]).aggregate(
            [("price_cents", "sum"), ("n", "sum")]
        )
        return g.rename_columns(
            ["o_orderstatus", "o_orderpriority", "price_cents", "n"]
        )

    fine = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(
            Sum("price_cents", alias_name="price_cents"),
            Sum("n", alias_name="n"),
        )
        .to_pandas()
    )
    meas = ["price_cents", "n"]
    by_s = fine.groupby("o_orderstatus", as_index=False)[meas].sum()
    by_s["o_orderpriority"] = "ALL"
    by_p = fine.groupby("o_orderpriority", as_index=False)[meas].sum()
    by_p["o_orderstatus"] = "ALL"
    total = fine[meas].sum().to_frame().T
    total["o_orderstatus"] = "ALL"
    total["o_orderpriority"] = "ALL"
    cols = ["o_orderstatus", "o_orderpriority", *meas]
    out = pd.concat(
        [fine[cols], by_s[cols], by_p[cols], total[cols]], ignore_index=True
    )
    for m in meas:
        out[m] = out[m].astype("int64")
    return out


def repetition_stats(sf_dir: str) -> ray.data.Dataset:
    """Within-document repetition signals — the Gopher-style quality-filter
    family (dup-line fraction, most-common-line/word coverage) used to drop
    template/boilerplate docs from training corpora:

        (doc_id, n_lines, n_distinct_lines, top_line_count,
         dup_line_chars, top_word_count)

    dup_line_chars = characters inside lines that occur more than once
    (all occurrences counted) — the numerator of Gopher's
    duplicate-line-character fraction; consumers divide by n_chars.

    Char-exact for SQL parity (Counter over literal lines/words, like
    ngram_shingles); the flagship-scale repetition signal would hash lines
    vectorized instead, but this table is the small per-doc feature side.
    """
    from collections import Counter

    def f(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        n = len(ids)
        n_lines = np.empty(n, dtype=np.int64)
        n_dist = np.empty(n, dtype=np.int64)
        top_line = np.empty(n, dtype=np.int64)
        dup_chars = np.empty(n, dtype=np.int64)
        top_word = np.empty(n, dtype=np.int64)
        for i, t in enumerate(texts):
            lines = (t or "").split("\n")
            lc = Counter(lines)
            n_lines[i] = len(lines)
            n_dist[i] = len(lc)
            top_line[i] = max(lc.values())
            dup_chars[i] = sum(
                c * len(l) for l, c in lc.items() if c > 1
            )
            words = (t or "").split()
            top_word[i] = max(Counter(words).values()) if words else 0
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_lines": pa.array(n_lines),
                "n_distinct_lines": pa.array(n_dist),
                "top_line_count": pa.array(top_line),
                "dup_line_chars": pa.array(dup_chars),
                "top_word_count": pa.array(top_word),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).map_batches(f, batch_format="pyarrow")
    )


# ------------------------------------- flagship-path oracle (exact co-cluster)
PLANT_STEP, PLANT_SHIFT = 50, 1_000_000


def exact_copy_coclustering(sf_dir: str) -> pd.DataFrame:
    """Oracle row covering the FLAGSHIP near-dup pipeline end-to-end
    (dedupe.c:78-156's exact-duplicate decision): exact copies must land in
    ONE cluster.  The sf documents tables carry no exact copies at small
    scale, so BOTH sides plant the same deterministic family set first
    (every ``PLANT_STEP``-th doc re-appears with doc_id+``PLANT_SHIFT``);
    SQL can then predict, for every content-md5 group with >1 copies, the
    group size, the representative (min doc_id), and — the flagship
    assertion — that the real pipeline assigned the whole group exactly one
    cluster (``n_clusters = 1``).  A regression that splits an exact family
    breaks the value hash.

    Scale shape: content never shuffles (the group stats form over
    (sha256, doc_id, cluster_id) rows, partitioned by a sha-derived int64
    key); md5 labels are computed only for the surviving representatives —
    one filtered pass over the raw table against a broadcast id set."""
    from libpostal_ray.pipelines.near_dupe import _sha_to_np, near_dupe_pipeline
    from libpostal_ray.sources.readers import read_documents_corpus

    def plant(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = np.flatnonzero(did % PLANT_STEP == 0)
        if sel.size == 0:
            return batch
        extra = batch.take(pa.array(sel))
        extra = extra.set_column(
            extra.schema.get_field_index("doc_id"),
            "doc_id",
            pa.array(did[sel] + PLANT_SHIFT, type=pa.int64()),
        )
        return pa.concat_tables([batch, extra]).combine_chunks()

    corpus = read_documents_corpus(sf_dir).map_batches(
        plant, batch_format="pyarrow", zero_copy_batch=True
    )
    clusters = near_dupe_pipeline(corpus, PipelineConfig())["clusters"]

    P = 16

    def add_part(batch: pa.Table) -> pa.Table:
        sha = _sha_to_np(batch["sha256"])
        key = np.frombuffer(sha.tobytes(), dtype="<u8").reshape(-1, 4)[:, 0]
        return pa.table(
            {
                "sha256": batch["sha256"],
                "doc_id": batch["doc_id"],
                "cluster_id": batch["cluster_id"],
                "part": pa.array((key % np.uint64(P)).astype("int64")),
            }
        )

    def group_stats(group: pa.Table) -> pa.Table:
        n = group.num_rows
        empty = pa.table(
            {
                "keep_id": pa.array([], type=pa.int64()),
                "n_copies": pa.array([], type=pa.int64()),
                "n_clusters": pa.array([], type=pa.int64()),
            }
        )
        if n == 0:
            return empty
        sha = _sha_to_np(group["sha256"])
        did = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cid = group["cluster_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # pass 1, sorted (sha, doc_id): per-sha segment sizes + min doc_id
        order = np.lexsort((did, sha))
        sha_s, did_s = sha[order], did[order]
        newseg = np.concatenate(([True], sha_s[1:] != sha_s[:-1]))
        seg = np.cumsum(newseg) - 1
        nseg = int(seg[-1]) + 1
        sizes = np.bincount(seg, minlength=nseg)
        keep_id = did_s[np.flatnonzero(newseg)]
        # pass 2, sorted (sha, cluster_id): distinct clusters per sha segment
        order2 = np.lexsort((cid, sha))
        sha2, cid2 = sha[order2], cid[order2]
        new_sha2 = np.concatenate(([True], sha2[1:] != sha2[:-1]))
        new_pair = new_sha2 | np.concatenate(([True], cid2[1:] != cid2[:-1]))
        seg2 = np.cumsum(new_sha2) - 1
        n_clusters = np.bincount(seg2[new_pair], minlength=nseg)
        mask = sizes > 1
        if not mask.any():
            return empty
        return pa.table(
            {
                "keep_id": pa.array(keep_id[mask], type=pa.int64()),
                "n_copies": pa.array(sizes[mask], type=pa.int64()),
                "n_clusters": pa.array(n_clusters[mask], type=pa.int64()),
            }
        )

    groups = (
        clusters.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(group_stats, batch_format="pyarrow")
        .to_pandas()  # one row per duplicate FAMILY — small by construction
    )

    # md5 labels for the representatives only (keep_id is always the
    # original doc: planted copies have ids shifted by PLANT_SHIFT)
    rep_ids_ref = ray.put(np.sort(groups["keep_id"].to_numpy().astype(np.int64)))

    def md5_for_reps(batch: pa.Table) -> pa.Table:
        rep_ids = ray.get(rep_ids_ref)
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = np.flatnonzero(np.isin(did, rep_ids))
        texts = batch["text"].take(pa.array(sel)).to_pylist()
        return pa.table(
            {
                "keep_id": pa.array(did[sel], type=pa.int64()),
                "content_md5": pa.array(
                    [hashlib.md5((t or "").encode("utf-8")).hexdigest() for t in texts],
                    type=pa.string(),
                ),
            }
        )

    md5s = (
        _docs(sf_dir).map_batches(md5_for_reps, batch_format="pyarrow").to_pandas()
    )
    res = groups.merge(md5s, on="keep_id")
    return (
        res[["content_md5", "n_copies", "keep_id", "n_clusters"]]
        .sort_values("content_md5")
        .reset_index(drop=True)
    )


# ------------------------------------------------------------- sessionization
SESSION_GAP_MS = 30 * 60 * 1000  # a >30-minute silence starts a new session


def user_sessions(sf_dir: str) -> ray.data.Dataset:
    """Gap-based sessionization of the events stream (the windowed operator
    of §2.9 beyond tumbling windows): per (user, session) -> (user_id,
    session_id, n_events, start_ms, end_ms); a session breaks when the gap
    to the previous event of the SAME user exceeds SESSION_GAP_MS.

    Physical plan: one groupby on user_id % P co-locates each user's events;
    inside the partition everything is one lexsort + segment scan — no
    per-user Python calls, no global sort."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    P = 32

    def add_part(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # epoch microseconds -> floor milliseconds (DuckDB epoch_ms semantics)
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ms = us // 1000
        return pa.table(
            {
                "user_id": pa.array(u, type=pa.int64()),
                "ms": pa.array(ms, type=pa.int64()),
                "part": pa.array(u % P, type=pa.int64()),
            }
        )

    def sessionize(group: pa.Table) -> pa.Table:
        n = group.num_rows
        u = group["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = group["ms"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((t, u))
        us, ts_ = u[order], t[order]
        new_user = np.concatenate(([True], us[1:] != us[:-1]))
        gap_break = np.concatenate(([False], (ts_[1:] - ts_[:-1]) > SESSION_GAP_MS))
        brk = new_user | gap_break
        seg = np.cumsum(brk) - 1  # global session segment per row
        starts = np.flatnonzero(brk)
        ends = np.concatenate((starts[1:], [n]))
        # per-user session index: this segment's rank within its user's runs
        user_first_seg = seg[np.flatnonzero(new_user)]
        # user of each segment
        seg_user = us[starts]
        seg_newu = np.concatenate(([True], seg_user[1:] != seg_user[:-1]))
        first_of_user = np.arange(seg_user.shape[0])[seg_newu]
        base = np.repeat(first_of_user, np.diff(np.concatenate((np.flatnonzero(seg_newu), [seg_user.shape[0]]))))
        session_id = np.arange(seg_user.shape[0]) - base + 1
        return pa.table(
            {
                "user_id": pa.array(seg_user, type=pa.int64()),
                "session_id": pa.array(session_id, type=pa.int64()),
                "n_events": pa.array(ends - starts, type=pa.int64()),
                "start_ms": pa.array(ts_[starts], type=pa.int64()),
                "end_ms": pa.array(ts_[ends - 1], type=pa.int64()),
            }
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(sessionize, batch_format="pyarrow")
    )


# ------------------------------------------------- temporal relational ops
# as-of join / range join / sliding window (pipelines/relational.py) —
# operators Ray Data lacks natively, shaped as one key%P exchange +
# vectorized per-partition merge kernels.  The reference has no temporal
# joins (its only joins: trie phrase lookup, address_dictionary.h:62-69,
# and the expansions_intersect semi-join, dedupe.c:13-31); these cover the
# training-data-pipeline side of the engine.

ATTRIBUTION_WINDOW_US = 6 * 3600 * 1_000_000  # click -> purchase horizon


def event_order_asof(sf_dir: str) -> ray.data.Dataset:
    """For every event, the customer's most recent order at event time
    (point-in-time feature join): (event_id, user_id, event_ms,
    o_orderkey, order_ms).  DuckDB parity: ASOF JOIN over orders deduped
    to one row per (custkey, orderdate) keeping max o_orderkey — exactly
    what tie_break="o_orderkey" does without the extra pass."""
    from libpostal_ray.pipelines.relational import asof_join

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    joined = asof_join(
        events,
        orders,
        on=("user_id", "o_custkey"),
        ts=("ts", "o_orderdate"),
        tie_break="o_orderkey",
        how="inner",
    )

    def finish(batch: pa.Table) -> pa.Table:
        ev_us = batch["ts"].to_numpy(zero_copy_only=False)
        or_us = batch["o_orderdate_matched"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "event_ms": pa.array(ev_us // 1000, type=pa.int64()),
                "o_orderkey": batch["o_orderkey"],
                "order_ms": pa.array(or_us // 1000, type=pa.int64()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def click_attribution(sf_dir: str) -> ray.data.Dataset:
    """Range join: for each click, the purchases of the same user inside
    (click_ts, click_ts + 6h]: (event_id, user_id, n_purchases,
    first_purchase_ms).  Only clicks with >= 1 attributed purchase emit
    (inner semantics).  The kernel answers each click with two
    searchsorted probes — matched PAIRS are never materialized."""
    from libpostal_ray.pipelines.relational import interval_count_join

    ev = f"{sf_dir}/events.parquet"
    clicks = (
        ray.data.read_parquet(ev, columns=["event_id", "user_id", "ts", "event_type"])
        .map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
        .filter(expr="event_type == 'click'")
        .drop_columns(["event_type"])
    )
    purchases = (
        ray.data.read_parquet(ev, columns=["user_id", "ts", "event_type"])
        .map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
        .filter(expr="event_type == 'purchase'")
        .drop_columns(["event_type"])
    )
    out = interval_count_join(
        purchases,
        clicks,
        point_key="user_id",
        point_ts="ts",
        interval_key="user_id",
        interval_ts="ts",
        window_us=ATTRIBUTION_WINDOW_US,
        closed="right",
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "n_purchases": batch["n_points"],
                "first_purchase_ms": pa.array(
                    batch["first_point_us"].to_numpy(zero_copy_only=False) // 1000,
                    type=pa.int64(),
                ),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def events_sliding(sf_dir: str) -> ray.data.Dataset:
    """Sliding-window aggregate over the events stream: 1-hour windows
    every 15 minutes -> (window_start_ms, n_events, sum_value_cents).
    Batch-local partials collapse rows to slide buckets BEFORE the x4
    window replication, so the exchange is O(buckets), not O(events)."""
    from libpostal_ray.pipelines.relational import sliding_window_count_sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "value"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    return sliding_window_count_sum(
        ds,
        ts_col="ts",
        value_col="value",
        window_us=3600 * 1_000_000,
        slide_us=900 * 1_000_000,
    )


TFIDF_TOP_K = 5


def tfidf_top_terms(sf_dir: str) -> ray.data.Dataset:
    """Corpus-wide TF-IDF: top-5 terms per document by
    tf * ln((N+1)/(df+1)), ties broken by term ASC -> (doc_id, term, tf,
    df).  This is the corpus-level ``token_scores`` aggregate the
    reference delegates to its host system (libpostal.h:261-262,
    dedupe.c:340), as a first-class operator.

    Physical plan: (doc, term, tf) rows from one tokenize pass ->
    groupby(term).count() = DF (vocabulary-sized, tiny vs corpus) ->
    DF state built in a WORKER task and broadcast via its object ref ->
    per-doc top-k inside ONE groupby(doc_id % P) with a vectorized
    segment-rank kernel.  Content never shuffles; the only all-to-all
    carries (doc_id, term, tf) rows."""
    import re as _re

    import pyarrow.parquet as _pq

    n_docs = _pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    P = 32
    tok_re = _re.compile(r"[^a-z0-9]+")

    def term_tf(batch: pa.Table) -> pa.Table:
        """Vectorized (doc, term, tf): Arrow lower + regex split ->
        dictionary-encode -> one np.unique over packed (doc, code) keys
        (same shape as doc_rarity_score's pass; no per-row Python)."""
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "term": pa.array([], type=pa.string()),
                "tf": pa.array([], type=pa.int64()),
                "part": pa.array([], type=pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lists = pc.split_pattern_regex(
            pc.utf8_lower(batch["text"]), pattern=tok_re.pattern
        )
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        if not keep.any():
            return empty
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary
        V = np.int64(len(vocab))
        keys = parent[keep].astype(np.int64) * V + codes[keep]
        uk, tf = np.unique(keys, return_counts=True)
        doc = ids[(uk // V)]
        code = uk % V
        return pa.table(
            {
                "doc_id": pa.array(doc, type=pa.int64()),
                "term": vocab.take(pa.array(code)),
                "tf": pa.array(tf.astype(np.int64)),
                "part": pa.array(doc % P, type=pa.int64()),
            }
        )

    # materialized once: both the DF aggregate and the top-k groupby
    # consume it (otherwise Ray re-runs the tokenize pass twice)
    tf_ds = docs.map_batches(term_tf, batch_format="pyarrow").materialize()
    df_ds = tf_ds.groupby("term").aggregate(Count(alias_name="df"))

    @ray.remote
    def _build_df_state(*blocks):
        # empty blocks lose their schema in Ray aggregates — filter first
        blocks = [b for b in blocks if b.num_rows > 0 and "term" in b.column_names]
        terms = np.concatenate(
            [np.asarray(b.column("term").to_pylist(), dtype="U") for b in blocks]
        ) if blocks else np.empty(0, dtype="U1")
        dfs = np.concatenate(
            [b.column("df").to_numpy(zero_copy_only=False) for b in blocks]
        ) if blocks else np.empty(0, dtype=np.int64)
        order = np.argsort(terms, kind="stable")
        return {"terms": terms[order], "df": dfs[order].astype(np.int64)}

    state_ref = _build_df_state.remote(*df_ds.materialize().to_arrow_refs())
    import ray as _ray

    def topk(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "term" not in group.column_names:
            return pa.table(
                {
                    "doc_id": pa.nulls(0, pa.int64()),
                    "term": pa.nulls(0, pa.string()),
                    "tf": pa.nulls(0, pa.int64()),
                    "df": pa.nulls(0, pa.int64()),
                }
            )
        state = _ray.get(state_ref)
        vt, vdf = state["terms"], state["df"]
        doc = group["doc_id"].to_numpy(zero_copy_only=False)
        terms = np.asarray(group["term"].to_pylist(), dtype="U")
        tf = group["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        df = vdf[np.searchsorted(vt, terms)]
        score = tf * np.log((n_docs + 1.0) / (df + 1.0))
        # (doc asc, score desc, term asc); lexsort: last key primary
        order = np.lexsort((terms, -score, doc))
        ds_, = (doc[order],)
        newdoc = np.concatenate(([True], ds_[1:] != ds_[:-1]))
        seg_start = np.maximum.accumulate(np.where(newdoc, np.arange(ds_.shape[0]), 0))
        rank = np.arange(ds_.shape[0]) - seg_start
        keep = order[rank < TFIDF_TOP_K]
        return pa.table(
            {
                "doc_id": pa.array(doc[keep], type=pa.int64()),
                "term": pa.array(terms[keep], type=pa.string()),
                "tf": pa.array(tf[keep].astype(np.int64), type=pa.int64()),
                "df": pa.array(df[keep], type=pa.int64()),
            }
        )

    return (
        tf_ds.groupby("part")
        .map_groups(topk, batch_format="pyarrow")
    )


def expand_multi_forms(sf_dir: str) -> ray.data.Dataset:
    """Multi-form expansion of each document's canonical text under the EN
    alternatives packs (expand_address parity, expand.c:1453-1553):
    (doc_id, form_idx, form) — form_idx 0 is the identity form, every
    alternative combination follows in deterministic mixed-radix order,
    capped at max_expansions.  Rows-only (the cartesian fan-out is not
    SQL-expressible); golden fixtures live in tests/test_expand.py."""
    from libpostal_ray.functions.canonicalize import basic_canonicalize_array
    from libpostal_ray.functions.expand import (
        EN_ALTERNATIVES,
        compile_alternatives,
        expand_variants,
    )

    compiled = compile_alternatives(EN_ALTERNATIVES)

    def f(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        canon = basic_canonicalize_array(batch["text"].to_pylist())
        out_id, out_idx, out_form = [], [], []
        for did, text in zip(ids, canon):
            forms = expand_variants(text, compiled, max_forms=16)
            out_id.extend([int(did)] * len(forms))
            out_idx.extend(range(len(forms)))
            out_form.extend(forms)
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "form_idx": pa.array(out_idx, type=pa.int64()),
                "form": pa.array(out_form, type=pa.string()),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow")


# --------------------------------------------------- breadth relational ops
# deterministic sampling / per-group top-k / star join / anti-join /
# exact per-group quantiles — the remaining everyday shapes of a
# training-data pipeline, each with a DuckDB oracle.

_SAMPLE_MULT = 2654435761        # Knuth multiplicative hash constant
_SAMPLE_MOD = 4294967296         # 2^32
_SAMPLE_KEEP = 429496729         # ~10%


def hash_sample(sf_dir: str) -> ray.data.Dataset:
    """Deterministic hash sampling (consistent ~10% of documents):
    keep rows with (doc_id * 2654435761) mod 2^32 < 0.1 * 2^32.  The
    sample is a pure function of the key — stable across runs, engines
    and partitionings (the property random_shuffle-based sampling lacks),
    which is what makes it auditable at 100 TB: the oracle computes the
    EXACT same set in SQL."""

    def f(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (ids * _SAMPLE_MULT) % _SAMPLE_MOD < _SAMPLE_KEEP
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], type=pa.int64()),
                "lang": batch["lang"].filter(pa.array(keep)),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow")


def lang_top_docs(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """Per-group top-k: the k longest documents of every language
    (lang, doc_id, n_chars), ties broken by doc_id ASC — the window-function
    ROW_NUMBER() <= k pattern as one groupby + vectorized segment rank."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    def topk(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "lang" not in group.column_names:
            return pa.table(
                {
                    "lang": pa.nulls(0, pa.string()),
                    "doc_id": pa.nulls(0, pa.int64()),
                    "n_chars": pa.nulls(0, pa.int64()),
                }
            )
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        nch = group["n_chars"].to_numpy(zero_copy_only=False)
        langs = np.asarray(group["lang"].to_pylist(), dtype=object)
        order = np.lexsort((ids, -nch, langs.astype("U")))
        ls = langs[order]
        new = np.concatenate(([True], ls[1:] != ls[:-1]))
        seg_start = np.maximum.accumulate(
            np.where(new, np.arange(ls.shape[0]), 0)
        )
        rank = np.arange(ls.shape[0]) - seg_start
        kept = order[rank < k]
        return pa.table(
            {
                "lang": pa.array(langs[kept], type=pa.string()),
                "doc_id": pa.array(ids[kept], type=pa.int64()),
                "n_chars": pa.array(nch[kept], type=pa.int64()),
            }
        )

    # a handful of languages: single-digit group count, one kernel call each
    return ds.groupby("lang").map_groups(topk, batch_format="pyarrow")


def order_customer_nation(sf_dir: str) -> ray.data.Dataset:
    """Three-way star join: orders -> customer -> nation, revenue by nation
    (n_name, total_cents, n_orders).  Both dimension tables broadcast once
    (ray.put), the fact table streams through one map with an Arrow-native
    per-batch partial aggregate — the fact side never shuffles content,
    only (nation, partial) rows."""
    import pyarrow.parquet as pq

    import ray as _ray

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    cn = cust["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    co = np.argsort(ck)
    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    nk = nat["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nn = np.asarray(nat["n_name"].to_pylist(), dtype=object)
    no = np.argsort(nk)
    ref = _ray.put(
        {"ck": ck[co], "cn": cn[co], "nk": nk[no], "nn": nn[no]}
    )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    def attach(batch: pa.Table) -> pa.Table:
        st = _ray.get(ref)
        cust_k = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nkey = st["cn"][np.searchsorted(st["ck"], cust_k)]
        names = st["nn"][np.searchsorted(st["nk"], nkey)]
        cents = np.floor(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        t = pa.table(
            {
                "n_name": pa.array(names, type=pa.string()),
                "cents": pa.array(cents),
                "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        g = pa.TableGroupBy(t, "n_name").aggregate(
            [("cents", "sum"), ("one", "sum")]
        )
        return g.rename_columns(["n_name", "cents", "one"])

    return (
        orders.map_batches(attach, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(
            Sum("cents", alias_name="total_cents"),
            Sum("one", alias_name="n_orders"),
        )
    )


def customers_without_orders(sf_dir: str) -> ray.data.Dataset:
    """Anti-join (§2.7 set ops): customers with no FINISHED ('F') order
    (c_custkey, c_name).  The distinct order-key side is built in a WORKER
    task from the aggregated blocks and broadcast; the customer stream
    filters by searchsorted membership — the anti-join never shuffles the
    big side (same discipline as checkpoint resume's anti-join on finished
    partitions)."""
    import ray as _ray

    okeys_ds = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderstatus"]
        )
        .map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
        .filter(expr="o_orderstatus == 'F'")
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n"))
    )

    @_ray.remote
    def build(*blocks):
        blocks = [
            b for b in blocks if b.num_rows > 0 and "o_custkey" in b.column_names
        ]
        if not blocks:
            return np.empty(0, dtype=np.int64)
        return np.sort(
            np.concatenate(
                [
                    b.column("o_custkey").to_numpy(zero_copy_only=False)
                    for b in blocks
                ]
            ).astype(np.int64)
        )

    ref = build.remote(*okeys_ds.materialize().to_arrow_refs())

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    def anti(batch: pa.Table) -> pa.Table:
        have = _ray.get(ref)
        ck = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(have, ck)
        posc = np.clip(pos, 0, max(have.shape[0] - 1, 0))
        hit = (
            (pos < have.shape[0]) & (have[posc] == ck)
            if have.shape[0]
            else np.zeros(ck.shape[0], dtype=bool)
        )
        keep = pa.array(~hit)
        return pa.table(
            {
                "c_custkey": batch["c_custkey"].filter(keep),
                "c_name": batch["c_name"].filter(keep),
            }
        )

    return cust.map_batches(anti, batch_format="pyarrow")


def all_party_names(sf_dir: str) -> ray.data.Dataset:
    """UNION (distinct) across two tables: customer and supplier names as
    one deduplicated name column — Dataset.union + the exact-dedup groupby
    (completes the set-op family: union / intersect / except)."""
    c = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_name"]
    ).map_batches(
        lambda b: pa.table({"name": b["c_name"]}), batch_format="pyarrow"
    )
    s = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_name"]
    ).map_batches(
        lambda b: pa.table({"name": b["s_name"]}), batch_format="pyarrow"
    )

    def uniq(batch: pa.Table) -> pa.Table:
        return batch.group_by("name").aggregate([])

    return (
        c.union(s)
        .map_batches(uniq, batch_format="pyarrow")  # partial distinct
        .groupby("name")
        .aggregate(Count(alias_name="_c"))
        .map_batches(
            lambda b: pa.table({"name": b["name"]}), batch_format="pyarrow"
        )
    )


def customers_with_big_order(
    sf_dir: str, min_price: float = 450000.0
) -> ray.data.Dataset:
    """Semi-join (EXISTS): customers having at least one order with
    totalprice >= ``min_price`` — the qualifying-key set is pre-aggregated
    (distinct) on the order side, broadcast, and the customer stream keeps
    members; the dual of the anti-join, same no-big-side-shuffle plan."""
    import ray as _ray

    okeys_ds = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        )
        .map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
        .filter(expr=f"o_totalprice >= {min_price}")
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n"))
    )

    @_ray.remote
    def build(*blocks):
        blocks = [
            b for b in blocks if b.num_rows > 0 and "o_custkey" in b.column_names
        ]
        if not blocks:
            return np.empty(0, dtype=np.int64)
        return np.sort(
            np.concatenate(
                [
                    b.column("o_custkey").to_numpy(zero_copy_only=False)
                    for b in blocks
                ]
            ).astype(np.int64)
        )

    ref = build.remote(*okeys_ds.materialize().to_arrow_refs())

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    def semi(batch: pa.Table) -> pa.Table:
        have = _ray.get(ref)
        ck = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if have.shape[0] == 0:
            hit = np.zeros(ck.shape[0], dtype=bool)
        else:
            pos = np.searchsorted(have, ck)
            posc = np.clip(pos, 0, have.shape[0] - 1)
            hit = (pos < have.shape[0]) & (have[posc] == ck)
        keep = pa.array(hit)
        return pa.table(
            {
                "c_custkey": batch["c_custkey"].filter(keep),
                "c_name": batch["c_name"].filter(keep),
            }
        )

    return cust.map_batches(semi, batch_format="pyarrow")


def nation_customer_names(sf_dir: str) -> ray.data.Dataset:
    """Ordered string aggregation (collect): per nation, the comma-joined
    sorted customer-name list plus the count.  Group count is bounded by
    the nation table (25), so the per-group Python join is a fixed cost —
    the one groupby shape in this repo where map_groups per KEY is fine by
    construction (contrast the key%P discipline everywhere cardinality is
    data-dependent)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_nationkey", "c_name"]
    )

    def agg(group: pa.Table) -> pa.Table:
        names = sorted(group["c_name"].to_pylist())
        return pa.table(
            {
                "c_nationkey": group["c_nationkey"][:1],
                "n_customers": pa.array([len(names)], type=pa.int64()),
                "names": pa.array([",".join(names)], type=pa.string()),
            }
        )

    return ds.groupby("c_nationkey").map_groups(agg, batch_format="pyarrow")


def customers_without_orders_bloom(sf_dir: str) -> ray.data.Dataset:
    """The same anti-join, bloom-pruned (functions/bloom.py): a fixed-size
    bloom over the order-side keys is broadcast and tested FIRST inside the
    customer map — bloom misses are definite non-members and skip the exact
    membership probe entirely; only bloom hits (members + ~0.8% false
    positives) touch the sorted-key array.  Output-identical to
    customers_without_orders (same oracle SQL); at 100 TB the bloom is what
    stays broadcastable when the exact build side no longer is."""
    import ray as _ray

    from libpostal_ray.functions.bloom import (
        bloom_bits,
        bloom_build,
        bloom_contains,
    )

    okeys_ds = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderstatus"]
        )
        .map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
        .filter(expr="o_orderstatus == 'F'")
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n"))
    )

    @_ray.remote
    def build(*blocks):
        blocks = [
            b for b in blocks if b.num_rows > 0 and "o_custkey" in b.column_names
        ]
        if not blocks:
            return np.zeros(8, dtype=np.uint8), np.empty(0, dtype=np.int64)
        keys = np.sort(
            np.concatenate(
                [
                    b.column("o_custkey").to_numpy(zero_copy_only=False)
                    for b in blocks
                ]
            ).astype(np.int64)
        )
        return bloom_build(keys, bloom_bits(keys.shape[0])), keys

    ref = build.remote(*okeys_ds.materialize().to_arrow_refs())

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    def anti(batch: pa.Table) -> pa.Table:
        bloom, have = _ray.get(ref)
        ck = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        maybe = bloom_contains(bloom, ck)
        hit = np.zeros(ck.shape[0], dtype=bool)
        if maybe.any() and have.shape[0]:
            sub = ck[maybe]
            pos = np.searchsorted(have, sub)
            posc = np.clip(pos, 0, have.shape[0] - 1)
            hit[maybe] = (pos < have.shape[0]) & (have[posc] == sub)
        keep = pa.array(~hit)
        return pa.table(
            {
                "c_custkey": batch["c_custkey"].filter(keep),
                "c_name": batch["c_name"].filter(keep),
            }
        )

    return cust.map_batches(anti, batch_format="pyarrow")


def priority_price_quantiles(sf_dir: str) -> ray.data.Dataset:
    """Exact per-group discrete quantiles: median and p90 of order price
    cents per o_orderpriority (+ count).  quantile_disc semantics: the
    element at index ceil(q*n)-1 of the sorted group (verified against
    DuckDB).  Exact quantiles need the group co-located — fine for a
    low-cardinality group-by key; the 100-TB path for high-cardinality
    keys is the mergeable-sketch operator
    (functions/quantile.grouped_sketch_quantiles, user_value_p50_sketch)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderpriority", "o_totalprice"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    def quant(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "o_orderpriority" not in group.column_names:
            return pa.table(
                {
                    "o_orderpriority": pa.nulls(0, pa.string()),
                    "p50_cents": pa.nulls(0, pa.int64()),
                    "p90_cents": pa.nulls(0, pa.int64()),
                    "n_orders": pa.nulls(0, pa.int64()),
                }
            )
        cents = np.sort(
            np.floor(
                group["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
            ).astype(np.int64)
        )
        n = cents.shape[0]
        import math

        p50 = cents[math.ceil(0.5 * n) - 1]
        p90 = cents[math.ceil(0.9 * n) - 1]
        return pa.table(
            {
                "o_orderpriority": pa.array(
                    [group["o_orderpriority"][0].as_py()], type=pa.string()
                ),
                "p50_cents": pa.array([int(p50)], type=pa.int64()),
                "p90_cents": pa.array([int(p90)], type=pa.int64()),
                "n_orders": pa.array([n], type=pa.int64()),
            }
        )

    return ds.groupby("o_orderpriority").map_groups(quant, batch_format="pyarrow")


# ------------------------------------------------------- decontamination
# The benchmark-overlap ("decontamination") stage of a training-data
# pipeline: drop/flag documents that contain any benchmark phrase so eval
# sets don't leak into training data.  Two plans over the same contract
# (count of DISTINCT benchmark phrases contained per doc, docs with >= 1
# hit emit):
#   * contamination_flags — literal substring scan, one vectorized
#     pc.match_substring pass per phrase.  Exact; right when the
#     benchmark set is small (100s of phrases).
#   * contamination_ngram — hashed fixed-width byte-window membership:
#     ONE rolling-hash pass per batch (the signature-stage kernel) + a
#     searchsorted against the broadcast sorted benchmark-hash array.
#     Scales to millions of benchmark n-grams where per-phrase scans
#     can't; exact up to 64-bit hash collisions (~(windows x |B|)/2^64).
# The benchmark set here is a deterministic slice of the corpus itself
# (doc_id % 97 == 0 -> first-40-char phrase) so a DuckDB oracle can
# reproduce it from the same table; a real pipeline passes its own list.

_CONTAM_K = 40        # phrase length, chars == bytes on this corpus
_CONTAM_SLICE = 97    # benchmark slice: doc_id % _CONTAM_SLICE == 0


def _contam_phrases_ref(docs: ray.data.Dataset):
    """Distinct benchmark phrases from the corpus slice.  The slice filter
    runs as a streaming map over the corpus FIRST, so only the (tiny)
    benchmark slice materializes — the corpus itself is never pinned; a
    real pipeline passes an external benchmark list instead.  Returns an
    ObjectRef to a sorted phrase list (broadcast once)."""

    def slice_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        return batch.filter(pa.array(ids % _CONTAM_SLICE == 0))

    mat = docs.map_batches(slice_rows, batch_format="pyarrow").materialize()

    @ray.remote
    def build(*blocks: pa.Table):
        ph = set()
        for b in blocks:
            if b.num_rows == 0 or "text" not in b.column_names:
                continue
            for t in b["text"].to_pylist():
                if t and len(t) >= _CONTAM_K:
                    ph.add(t[:_CONTAM_K])
        return sorted(ph)

    return build.remote(*mat.to_arrow_refs())


def contamination_flags(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_hits): docs containing >= 1 benchmark phrase, with the
    count of distinct phrases contained.  Literal-scan plan."""
    docs = _docs(sf_dir)
    phrases_ref = _contam_phrases_ref(docs)

    def flag(batch: pa.Table) -> pa.Table:
        phrases = ray.get(phrases_ref)
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        hits = np.zeros(batch.num_rows, dtype=np.int64)
        for p in phrases:
            m = pc.fill_null(pc.match_substring(text, p), False)
            hits += m.to_numpy(zero_copy_only=False).astype(np.int64)
        keep = hits >= 1
        k = pa.array(keep)
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()).filter(k),
                "n_hits": pa.array(hits[keep]),
            }
        )

    return docs.map_batches(flag, batch_format="pyarrow")


def contamination_ngram(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, n_hits): same contract as contamination_flags via hashed
    40-byte-window membership — the plan that scales to millions of
    benchmark n-grams.  One rolling-hash pass over each batch's
    concatenated value buffer (row-crossing windows masked by offset
    arithmetic), one searchsorted against the broadcast sorted benchmark
    hashes, distinct-per-row via a tiny sort over the (few) hit rows."""
    from libpostal_ray.functions.canonicalize import large_string_view
    from libpostal_ray.functions.hashing import rolling_shingle_hashes

    docs = _docs(sf_dir)
    phrases_ref = _contam_phrases_ref(docs)

    @ray.remote
    def build_hashes(phrases: list[str]) -> np.ndarray:
        hs = set()
        for p in phrases:
            h = rolling_shingle_hashes(p.encode("utf-8"), _CONTAM_K)
            if h.shape[0]:
                hs.add(int(h[0]))
        return np.sort(np.array(sorted(hs), dtype=np.uint64))

    bench_ref = build_hashes.remote(phrases_ref)

    def flag(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        n = batch.num_rows
        text = batch["text"].cast(pa.large_string())
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        data, off = large_string_view(text)
        h_all = rolling_shingle_hashes(data, _CONTAM_K)
        n_hits = np.zeros(n, dtype=np.int64)
        if h_all.shape[0] and bench.shape[0]:
            pos = np.searchsorted(bench, h_all)
            posc = np.clip(pos, 0, bench.shape[0] - 1)
            hit = bench[posc] == h_all
            # valid (non-row-crossing) window range per row
            lens = np.diff(off)
            counts = np.maximum(0, lens - (_CONTAM_K - 1))
            starts = np.minimum(off[:-1], h_all.shape[0])
            stops = np.minimum(starts + counts, h_all.shape[0])
            hp = np.flatnonzero(hit)
            if hp.shape[0]:
                # row of each hit position; drop hits past its row's count
                row = np.searchsorted(off[1:], hp, side="right")
                ok = hp < stops[row]
                pairs = np.stack(
                    [row[ok], posc[hp[ok]].astype(np.int64)], axis=1
                )
                if pairs.shape[0]:
                    uniq = np.unique(pairs, axis=0)
                    np.add.at(n_hits, uniq[:, 0], 1)
        keep = n_hits >= 1
        k = pa.array(keep)
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()).filter(k),
                "n_hits": pa.array(n_hits[keep]),
            }
        )

    return docs.map_batches(flag, batch_format="pyarrow")


# ------------------------------------------------- stratified hash sample
def stratified_sample(sf_dir: str, k: int = 25) -> ray.data.Dataset:
    """Deterministic per-language sample: the k docs with the smallest
    Lehmer hash (doc_id * 48271 mod 2^31-1) per lang — the auditable
    per-group cap every training mix needs (per-domain/per-language
    quotas), reproducible across runs and engines.

    Physical plan: per-batch PARTIAL top-k per group (vectorized lexsort +
    segment head), so the exchange carries <= k rows per (group, batch) —
    never the corpus; the finish groups by crc32(group) % P (million-group
    corpora — per-DOMAIN quotas — get P kernel calls, not one per group)
    and recovers group segments vectorized inside.  Output (lang, doc_id,
    rn) with rn the 1-based rank in (hash, doc_id) order — byte-equal to
    SQL row_number() OVER (PARTITION BY lang ORDER BY hash, doc_id)."""
    import zlib

    M = np.int64(2147483647)
    P = 32

    def _group_topk(lang: pa.Array, ids: np.ndarray, h: np.ndarray, cap: int):
        """Indices of the per-group (hash, doc_id)-smallest <= cap rows,
        plus each kept row's 0-based rank in its group."""
        codes = (
            pc.dictionary_encode(lang)
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        order = np.lexsort((ids, h, codes))
        gs = codes[order]
        new = np.concatenate(([True], gs[1:] != gs[:-1]))
        starts = np.flatnonzero(new)
        seg_start = np.repeat(
            starts, np.diff(np.concatenate((starts, [gs.shape[0]])))
        )
        rank = np.arange(gs.shape[0], dtype=np.int64) - seg_start
        keep = rank < cap
        return order[keep], rank[keep]

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        h = (ids * np.int64(48271)) % M
        lang = batch["lang"]
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        take, _ = _group_topk(lang, ids, h, k)
        kept_lang = lang.take(pa.array(take, type=pa.int64()))
        part = np.fromiter(
            (zlib.crc32(s.encode("utf-8")) for s in kept_lang.to_pylist()),
            dtype=np.int64,
            count=len(kept_lang),
        ) % P
        return pa.table(
            {
                "lang": kept_lang,
                "doc_id": pa.array(ids[take], type=pa.int64()),
                "h": pa.array(h[take], type=pa.int64()),
                "part": pa.array(part),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "h" not in group.column_names:
            return pa.table(
                {
                    "lang": pa.nulls(0, pa.string()),
                    "doc_id": pa.nulls(0, pa.int64()),
                    "rn": pa.nulls(0, pa.int64()),
                }
            )
        lang = group["lang"]
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        h = group["h"].to_numpy(zero_copy_only=False)
        take, rank = _group_topk(lang, ids, h, k)
        arr = pa.array(take, type=pa.int64())
        return pa.table(
            {
                "lang": lang.take(arr),
                "doc_id": group["doc_id"].take(arr),
                "rn": pa.array(rank + 1),
            }
        )

    return (
        _docs(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(final, batch_format="pyarrow")
    )


# ------------------------------- correlated subquery (decorrelated plan)
def orders_above_customer_avg(sf_dir: str) -> ray.data.Dataset:
    """Orders priced above their own customer's average order price — the
    canonical correlated subquery, decorrelated the way a distributed
    engine must: ONE partial-aggregate pass builds (custkey -> n, sum)
    [bounded by customer count, not order count], broadcast once, then the
    orders stream filters against it.  All-integer comparison
    (price_cents * n > sum_cents) so the oracle row is exact.  Output
    (o_orderkey, o_custkey, price_cents)."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    def cents_partial(batch: pa.Table) -> pa.Table:
        ck = batch["o_custkey"].cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        cents = np.floor(
            batch["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False)
            * 100.0
        ).astype(np.int64)
        uc, inv = np.unique(ck, return_inverse=True)
        return pa.table(
            {
                "o_custkey": pa.array(uc, type=pa.int64()),
                "n": pa.array(np.bincount(inv).astype(np.int64)),
                "s": pa.array(
                    np.bincount(inv, weights=cents).astype(np.int64)
                ),
            }
        )

    agg = (
        orders.map_batches(cents_partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"))
        .materialize()
    )

    @ray.remote
    def pack(*blocks: pa.Table):
        ks, ns, ss = [], [], []
        for b in blocks:
            if b.num_rows == 0 or "o_custkey" not in b.column_names:
                continue
            ks.append(b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64))
            ns.append(b["n"].to_numpy(zero_copy_only=False).astype(np.int64))
            ss.append(b["s"].to_numpy(zero_copy_only=False).astype(np.int64))
        if not ks:
            return None
        k = np.concatenate(ks)
        order = np.argsort(k, kind="stable")
        return (
            k[order],
            np.concatenate(ns)[order],
            np.concatenate(ss)[order],
        )

    state_ref = pack.remote(*agg.to_arrow_refs())

    def above(batch: pa.Table) -> pa.Table:
        st = ray.get(state_ref)
        ck = batch["o_custkey"].cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        cents = np.floor(
            batch["o_totalprice"].combine_chunks().to_numpy(zero_copy_only=False)
            * 100.0
        ).astype(np.int64)
        if st is None:
            keep = np.zeros(batch.num_rows, dtype=bool)
        else:
            k, n, s = st
            pos = np.searchsorted(k, ck)
            posc = np.clip(pos, 0, k.shape[0] - 1)
            # every order's custkey is in the agg by construction
            keep = cents * n[posc] > s[posc]
        kk = pa.array(keep)
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"].cast(pa.int64()).filter(kk),
                "o_custkey": pa.array(ck[keep], type=pa.int64()),
                "price_cents": pa.array(cents[keep]),
            }
        )

    return orders.map_batches(above, batch_format="pyarrow")


# --------------------------------------------------- incremental dedup
def incremental_dedup(sf_dir: str) -> ray.data.Dataset:
    """Delta-vs-corpus dedup report: treat docs with doc_id % 5 == 0 as
    today's delivery and the rest as the standing corpus; every delta doc
    gets (doc_id, verdict in {keep, dup_of_corpus, dup_in_batch},
    match_id).  One flagship exchange over both sides; see
    pipelines/incremental.py."""
    from libpostal_ray.pipelines.incremental import dedup_against_corpus

    def side(is_delta: bool):
        def f(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].cast(pa.int64()).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            return batch.filter(pa.array((ids % 5 == 0) == is_delta))

        return f

    docs = read_documents_corpus(sf_dir)
    corpus = docs.map_batches(side(False), batch_format="pyarrow")
    new = docs.map_batches(side(True), batch_format="pyarrow")
    return dedup_against_corpus(new, corpus, PipelineConfig())


# ---------------------------------------------- approx quantile sketch
def approx_price_quantiles(sf_dir: str) -> pd.DataFrame:
    """Approximate p50/p90/p99 of l_extendedprice cents via the mergeable
    MRL/KLL sketch (functions/quantile.py): each batch ships ONE
    O(k log n)-byte sketch row; merging is associative — at 100 TB the
    exchange is sketches, not values (exact counterpart:
    priority_price_quantiles).  Rows-only (approximate by design); the
    rank-error bound is pytest-covered against exact quantiles."""
    from libpostal_ray.functions.quantile import QuantileSketch

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
    )

    def sketch(batch: pa.Table) -> pa.Table:
        cents = np.floor(
            batch["l_extendedprice"].combine_chunks().to_numpy(zero_copy_only=False)
            * 100.0
        )
        sk = QuantileSketch().add(cents)
        return pa.table({"sketch": pa.array([sk.to_bytes()], type=pa.binary())})

    @ray.remote
    def combine(*blocks: pa.Table):
        sk = None
        for b in blocks:
            if b.num_rows == 0 or "sketch" not in b.column_names:
                continue
            for payload in b["sketch"].to_pylist():
                s = QuantileSketch.from_bytes(payload)
                sk = s if sk is None else sk.merge(s)
        return sk

    sk = ray.get(
        combine.remote(
            *ds.map_batches(sketch, batch_format="pyarrow").materialize().to_arrow_refs()
        )
    )
    if sk is None:
        return pd.DataFrame({"q": [], "price_cents": [], "n_values": []})
    qs = [0.5, 0.9, 0.99]
    est = sk.quantiles(qs)
    return pd.DataFrame(
        {
            "q": qs,
            "price_cents": est.astype(np.int64),
            "n_values": np.full(len(qs), sk.total_weight, dtype=np.int64),
        }
    )


# ----------------------------------------------------------- UNPIVOT
_UNPIVOT_MEASURES = [
    ("l_quantity", "quantity"),
    ("l_extendedprice", "extendedprice"),
    ("l_discount", "discount"),
    ("l_tax", "tax"),
]


def lineitem_unpivot(sf_dir: str) -> ray.data.Dataset:
    """UNPIVOT (wide -> long), the inverse of user_event_pivot: each
    lineitem row becomes one row per measure (l_orderkey, l_linenumber,
    measure, milli).  Pure per-batch reshaping — four vectorized column
    stacks, zero shuffle, output exactly 4x input rows; values integerized
    (floor(x*1000)) so the oracle row is exact."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber"] + [c for c, _ in _UNPIVOT_MEASURES],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    def long_form(batch: pa.Table) -> pa.Table:
        parts = []
        for col, name in _UNPIVOT_MEASURES:
            milli = np.floor(
                batch[col].combine_chunks().to_numpy(zero_copy_only=False) * 1000.0
            ).astype(np.int64)
            parts.append(
                pa.table(
                    {
                        "l_orderkey": batch["l_orderkey"].cast(pa.int64()),
                        "l_linenumber": batch["l_linenumber"].cast(pa.int64()),
                        "measure": pa.array(
                            np.full(batch.num_rows, name, dtype=object).tolist(),
                            type=pa.string(),
                        ),
                        "milli": pa.array(milli),
                    }
                )
            )
        return pa.concat_tables(parts)

    return ds.map_batches(long_form, batch_format="pyarrow")


# --------------------------------------------------- multimodal plumbing
def media_feature_extract(sf_dir: str) -> ray.data.Dataset:
    """Multimodal decode/feature plumbing as a first-class query: the
    documents table stands in as an opaque-binary media corpus (payload =
    utf-8 bytes, media_type round-robin image/audio/video), streamed
    through the byte-budgeted MediaFeatureStage actor pool with the
    deterministic fake decoder (real decode stubbed: no media libs in this
    environment — stages/multimodal.py).  Output (media_id, media_type,
    payload_bytes, feat_norm_millis): the feature vector collapses to its
    L2-norm so the row is compact and deterministic."""
    from libpostal_ray.stages.multimodal import fake_decode, media_features

    types = ["image", "audio", "video"]

    def as_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        n = batch.num_rows
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "media_type": pa.array(
                    [types[int(i) % 3] for i in ids], type=pa.string()
                ),
                "payload": batch["text"].cast(pa.large_binary()),
                "width": pa.array(np.full(n, 64, dtype=np.int32)),
                "height": pa.array(np.full(n, 64, dtype=np.int32)),
                "duration_ms": pa.array(np.zeros(n, dtype=np.int32)),
            }
        )

    media = _docs(sf_dir).map_batches(as_media, batch_format="pyarrow")
    feats = media_features(media, decode_fn=fake_decode, concurrency=(1, 4))

    def collapse(batch: pa.Table) -> pa.Table:
        f = batch["feature"]
        if isinstance(f, pa.ChunkedArray):
            f = f.combine_chunks()
        vals = f.flatten().to_numpy(zero_copy_only=False).reshape(batch.num_rows, -1)
        norm = np.floor(np.sqrt((vals.astype(np.float64) ** 2).sum(axis=1)) * 1000.0)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "payload_bytes": batch["payload_bytes"],
                "feat_norm_millis": pa.array(norm.astype(np.int64)),
            }
        )

    return feats.map_batches(collapse, batch_format="pyarrow")


def media_frame_sample(sf_dir: str) -> ray.data.Dataset:
    """The 1 -> N multimodal shape: frame-sample the video-typed rows of
    the stand-in media corpus (1 fps fake extractor, stubbed like decode;
    stages/multimodal.FrameSampleStage).  Output one row per sampled
    frame (media_id, frame_idx, t_ms, frame_bytes) — output row count
    multiplies by frames-per-video, so the actor pool budgets bytes."""
    from libpostal_ray.stages.multimodal import (
        fake_extract_frame,
        sample_video_frames,
    )

    types = ["image", "audio", "video"]

    def as_media(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].cast(pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        n = batch.num_rows
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "media_type": pa.array(
                    [types[int(i) % 3] for i in ids], type=pa.string()
                ),
                "payload": batch["text"].cast(pa.large_binary()),
                "width": pa.array(np.full(n, 64, dtype=np.int32)),
                "height": pa.array(np.full(n, 64, dtype=np.int32)),
                # deterministic per-row duration: 2-9 seconds
                "duration_ms": pa.array(
                    ((ids % 8) + 2).astype(np.int32) * 1000
                ),
            }
        )

    media = _docs(sf_dir).map_batches(as_media, batch_format="pyarrow")
    frames = sample_video_frames(media, fake_extract_frame, fps=1.0, max_frames=8)

    def finish(batch: pa.Table) -> pa.Table:
        fr = batch["frame"]
        if isinstance(fr, pa.ChunkedArray):
            fr = fr.combine_chunks()
        lens = np.asarray([len(v) for v in fr.to_pylist()], dtype=np.int64)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "frame_idx": batch["frame_idx"],
                "t_ms": batch["t_ms"],
                "frame_bytes": pa.array(lens),
            }
        )

    return frames.map_batches(finish, batch_format="pyarrow")


def tpch_q5_local_revenue(
    sf_dir: str,
    region: str = "ASIA",
    date_lo: str = "1997-01-01",
    date_hi: str = "1998-01-01",
    broadcast_max: int = 5_000_000,
) -> ray.data.Dataset:
    """TPC-H Q5 shape — "local supplier volume": revenue per nation from
    orders placed in ``[date_lo, date_hi)`` by customers of ``region``
    whose line items were supplied FROM THE CUSTOMER'S OWN NATION
    (s_nationkey = c_nationkey).  Six tables: region, nation, customer,
    supplier, orders, lineitem -> (n_name, revenue_cents).

    Physical plan (the star-join shape this engine uses everywhere):

      * region/nation/supplier/customer are DIMENSIONS — loaded once on
        the driver as sorted key->attr arrays and broadcast via one
        ``ray.put`` (supplier maps suppkey->nationkey; customer maps
        custkey->nationkey; nation gates on the region and names the
        output).  At 100-TB scale customer outgrows a broadcast
        (~1 B/row as a dense array); past that budget the custkey lookup
        becomes a pre-join of orders against customer on the SAME
        orderkey-free custkey%P exchange this file uses elsewhere — the
        fact-fact spine below is unchanged.
      * orders reads ONLY (o_orderkey, o_custkey) with the date predicate
        pushed into the parquet scan (row-group pruning — the
        date-restricted year is a fraction of the table and never leaves
        storage), then maps to a skinny (orderkey, c_nat) stream gated on
        the region.
      * lineitem reads ONLY (l_orderkey, l_suppkey, l_extendedprice,
        l_discount), integerizes revenue per row (floor cents — oracle
        float-parity contract, module docstring) and maps to a skinny
        (orderkey, s_nat, cents) stream gated on the region.
      * the orders<->lineitem join picks between two plans: when the
        date+region-filtered orders stream holds <= ``broadcast_max``
        rows (a ``limit().count()`` probe — streams with early stop), its
        (orderkey, c_nat) pairs are assembled into sorted arrays in a
        REMOTE task (never concatenated on the driver) and broadcast, and
        lineitem resolves the join per batch with one searchsorted —
        ZERO all-to-all, each batch leaving only <= 25 (nation, cents)
        partials.  Above the budget (both-sides-huge; also how the
        plan-equivalence test pins the exchange): both skinny streams
        union-tagged and hash-partitioned on orderkey % P; the
        per-partition kernel joins them with a single searchsorted
        (orderkey is unique on the orders side), applies the
        local-supplier gate c_nat == s_nat, and pre-aggregates to at most
        25 (nation, cents) partials — the only all-to-all carries 3
        int64s/row and the engine groupby that follows sees P*25 rows.
    """
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    import ray as _ray

    P = 32

    reg = pq.read_table(f"{sf_dir}/region.parquet")
    rkeys = {
        k
        for k, n in zip(
            reg["r_regionkey"].to_pylist(), reg["r_name"].to_pylist()
        )
        if n == region
    }
    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    nk = np.asarray(nat["n_nationkey"].to_pylist(), dtype=np.int64)
    nr = np.asarray(nat["n_regionkey"].to_pylist(), dtype=np.int64)
    nn = np.asarray(nat["n_name"].to_pylist(), dtype=object)
    no = np.argsort(nk)
    nk, nr, nn = nk[no], nr[no], nn[no]
    in_region = np.isin(nr, np.fromiter(rkeys, dtype=np.int64, count=len(rkeys)))

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    cn = cust["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    co = np.argsort(ck)
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    sk = supp["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    sn = supp["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    so = np.argsort(sk)
    dims = _ray.put(
        {
            "ck": ck[co], "cn": cn[co], "sk": sk[so], "sn": sn[so],
            "nk": nk, "nn": nn, "in_region": in_region,
        }
    )

    lo = pa.scalar(np.datetime64(date_lo, "us"), type=pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(date_hi, "us"), type=pa.timestamp("us"))
    date_filter = (pads.field("o_orderdate") >= lo) & (
        pads.field("o_orderdate") < hi
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"],
        filter=date_filter,
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    def order_side(batch: pa.Table) -> pa.Table:
        st = _ray.get(dims)
        okey = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cust_k = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        c_nat = st["cn"][np.searchsorted(st["ck"], cust_k)]
        keep = st["in_region"][np.searchsorted(st["nk"], c_nat)]
        okey, c_nat = okey[keep], c_nat[keep]
        z = np.zeros(okey.shape[0], dtype=np.int64)
        return pa.table(
            {
                "part": pa.array(okey % P),
                "kind": pa.array(z),
                "okey": pa.array(okey),
                "nat": pa.array(c_nat),
                "cents": pa.array(z),
            }
        )

    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    def _line_gated(batch: pa.Table):
        """Shared lineitem prep: region-gated (okey, s_nat, cents)."""
        st = _ray.get(dims)
        okey = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        supp_k = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        s_nat = st["sn"][np.searchsorted(st["sk"], supp_k)]
        keep = st["in_region"][np.searchsorted(st["nk"], s_nat)]
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        cents = np.floor(price * (1.0 - disc) * 100.0).astype(np.int64)
        return okey[keep], s_nat[keep], cents[keep]

    def line_side(batch: pa.Table) -> pa.Table:
        okey, s_nat, cents = _line_gated(batch)
        return pa.table(
            {
                "part": pa.array(okey % P),
                "kind": pa.array(np.ones(okey.shape[0], dtype=np.int64)),
                "okey": pa.array(okey),
                "nat": pa.array(s_nat),
                "cents": pa.array(cents),
            }
        )

    def _nation_partial(nat_ok: np.ndarray, cents_ok: np.ndarray) -> pa.Table:
        if nat_ok.shape[0] == 0:
            return pa.table(
                {
                    "n_nationkey": pa.nulls(0, pa.int64()),
                    "cents": pa.nulls(0, pa.int64()),
                }
            )
        acc = np.zeros(int(nat_ok.max()) + 1, dtype=np.int64)
        np.add.at(acc, nat_ok, cents_ok)
        nz = np.nonzero(acc)[0]
        return pa.table(
            {
                "n_nationkey": pa.array(nz.astype(np.int64)),
                "cents": pa.array(acc[nz]),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "n_nationkey": pa.nulls(0, pa.int64()),
                "cents": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "kind" not in group.column_names:
            return empty
        kind = group["kind"].to_numpy(zero_copy_only=False)
        okey = group["okey"].to_numpy(zero_copy_only=False)
        nat_ = group["nat"].to_numpy(zero_copy_only=False)
        cents = group["cents"].to_numpy(zero_copy_only=False)
        om = kind == 0
        o_key, o_nat = okey[om], nat_[om]
        l_key, l_nat, l_cents = okey[~om], nat_[~om], cents[~om]
        if o_key.shape[0] == 0 or l_key.shape[0] == 0:
            return empty
        oo = np.argsort(o_key)
        o_key, o_nat = o_key[oo], o_nat[oo]
        idx = np.searchsorted(o_key, l_key)
        idxc = np.clip(idx, 0, o_key.shape[0] - 1)
        hit = (idx < o_key.shape[0]) & (o_key[idxc] == l_key)
        local = hit & (o_nat[idxc] == l_nat)
        if not local.any():
            return empty
        # int64 scatter-add (not a float-weighted bincount): cents stay
        # exact integers all the way through, per the oracle contract
        return _nation_partial(
            l_nat[local].astype(np.int64), l_cents[local].astype(np.int64)
        )

    # plan probe, ONE read: materialize limit(max+1) (early-stop streaming
    # pins at most one extra block of a huge filtered-orders stream), count
    # from block metadata, and reuse the untruncated probe as the broadcast
    # input instead of re-executing the orders read
    probe = (
        orders.limit(broadcast_max + 1).materialize() if broadcast_max else None
    )
    if probe is not None and probe.count() <= broadcast_max:
        order_pairs = probe.map_batches(
            order_side, batch_format="pyarrow"
        ).materialize()

        @_ray.remote
        def _build_order_state(*blocks):
            blocks = [
                b for b in blocks if b.num_rows and "okey" in b.column_names
            ]
            if not blocks:
                return {
                    "okey": np.empty(0, dtype=np.int64),
                    "nat": np.empty(0, dtype=np.int64),
                }
            okey = np.concatenate(
                [b["okey"].to_numpy(zero_copy_only=False) for b in blocks]
            ).astype(np.int64)
            nat_ = np.concatenate(
                [b["nat"].to_numpy(zero_copy_only=False) for b in blocks]
            ).astype(np.int64)
            o = np.argsort(okey)
            return {"okey": okey[o], "nat": nat_[o]}

        state_ref = _build_order_state.remote(*order_pairs.to_arrow_refs())

        def line_probe(batch: pa.Table) -> pa.Table:
            st = _ray.get(state_ref)
            okey, s_nat, cents = _line_gated(batch)
            if st["okey"].shape[0] == 0 or okey.shape[0] == 0:
                return _nation_partial(
                    np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
                )
            idx = np.searchsorted(st["okey"], okey)
            idxc = np.clip(idx, 0, st["okey"].shape[0] - 1)
            hit = (idx < st["okey"].shape[0]) & (st["okey"][idxc] == okey)
            local = hit & (st["nat"][idxc] == s_nat)
            return _nation_partial(s_nat[local], cents[local])

        partials = (
            lineitem.map_batches(line_probe, batch_format="pyarrow")
            .groupby("n_nationkey")
            .aggregate(Sum("cents", alias_name="revenue_cents"))
        )
    else:
        partials = (
            orders.map_batches(order_side, batch_format="pyarrow")
            .union(lineitem.map_batches(line_side, batch_format="pyarrow"))
            .groupby("part")
            .map_groups(kernel, batch_format="pyarrow")
            .groupby("n_nationkey")
            .aggregate(Sum("cents", alias_name="revenue_cents"))
        )

    # finish the naming from the GATHERED aggregate (result is bounded by
    # 25 nations): a no-match run otherwise leaves zero-column empty
    # blocks that Ray's map_batches passes through WITHOUT calling the
    # UDF, so no in-stream guard can re-type them and to_pandas returns a
    # column-less frame (build-notes gotcha, measured)
    blocks = [
        b
        for b in _ray.get(partials.to_arrow_refs())
        if b.num_rows and "n_nationkey" in b.column_names
    ]
    if not blocks:
        return ray.data.from_arrow(
            pa.table(
                {
                    "n_name": pa.nulls(0, pa.string()),
                    "revenue_cents": pa.nulls(0, pa.int64()),
                }
            )
        )
    agg = pa.concat_tables(blocks)
    st = _ray.get(dims)
    keys = agg["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    names = st["nn"][np.searchsorted(st["nk"], keys)]
    return ray.data.from_arrow(
        pa.table(
            {
                "n_name": pa.array(names, type=pa.string()),
                "revenue_cents": agg["revenue_cents"],
            }
        )
    )


def export_shards_summary(sf_dir: str, n_shards: int = 8) -> ray.data.Dataset:
    """Registry wrapper for pipelines/prepare.export_training_shards: shard
    the documents table into /tmp and return the per-shard summary read
    back from the written files — an oracle-checked SINK (the write path
    itself is under the correctness gate, not just the transform)."""
    import os
    import shutil

    from libpostal_ray.pipelines.prepare import export_training_shards

    out = f"/tmp/lpr_shards_{os.path.basename(os.path.normpath(sf_dir))}"
    shutil.rmtree(out, ignore_errors=True)  # write_parquet appends to
    # existing dirs; the wrapper's contract is a fresh export
    return export_training_shards(_docs(sf_dir), out, n_shards=n_shards, seed=0)


def doc_rarity_score(sf_dir: str) -> ray.data.Dataset:
    """Corpus unigram-frequency document scoring — the integer-exact core
    of unigram-LM quality scoring (docs made of corpus-rare tokens score
    low; the float logprob variant is this same plan with ln(total/N)):

        (doc_id, n_tokens, freq_sum)
        freq_sum = sum over the doc's token OCCURRENCES of that token's
                   corpus-WIDE occurrence count.

    Physical plan — a self-join by CO-PARTITIONING, no join operator and
    no broadcast vocabulary (the weakness of a DF broadcast at 100 TB is
    unbounded vocab; here vocab never leaves its partition):

      1. one tokenize pass emits (doc_id, term, tf) with
         part = crc32(term) % P (int64 key — engine-wide rule);
      2. ONE exchange on part: every occurrence of a term lands in the
         same partition, so the partition-local total per term IS its
         corpus-wide total — the kernel computes totals and the per-doc
         partial (sum tf, sum tf*total) with two np.unique passes, no
         second shuffle of content;
      3. each partition emits <= n_docs skinny partials (3 int64s);
         a tiny groupby(doc_id) sums them.
    """
    import zlib

    P = 32
    docs = _docs(sf_dir)

    def tok_tf(batch: pa.Table) -> pa.Table:
        """Fully vectorized (doc, term, tf): Arrow split (== SQL
        string_split on ' ', empties dropped) -> dictionary-encode ->
        one np.unique over packed (doc, code) keys; the only Python loop
        is crc32 over the BATCH-LOCAL VOCAB, not over occurrences."""
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "term": pa.array([], type=pa.string()),
                "tf": pa.array([], type=pa.int64()),
                "part": pa.array([], type=pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lists = pc.split_pattern(batch["text"], pattern=" ")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        if not keep.any():
            return empty
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary
        V = np.int64(len(vocab))
        keys = parent[keep].astype(np.int64) * V + codes[keep]
        uk, tf = np.unique(keys, return_counts=True)
        doc = ids[(uk // V)]
        code = uk % V
        crc_vocab = np.fromiter(
            (zlib.crc32(s.encode("utf-8")) for s in vocab.to_pylist()),
            dtype=np.int64,
            count=int(V),
        ) % P
        return pa.table(
            {
                "doc_id": pa.array(doc, type=pa.int64()),
                "term": vocab.take(pa.array(code)),
                "tf": pa.array(tf.astype(np.int64)),
                "part": pa.array(crc_vocab[code]),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.nulls(0, pa.int64()),
                "n_tokens": pa.nulls(0, pa.int64()),
                "freq_sum": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "term" not in group.column_names:
            return empty
        terms = np.asarray(group["term"].to_pylist(), dtype=object)
        tf = group["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        _, inv = np.unique(terms, return_inverse=True)
        totals = np.bincount(inv, weights=tf.astype(np.float64)).astype(np.int64)
        contrib = tf * totals[inv]
        udoc, dinv = np.unique(doc, return_inverse=True)
        n_tok = np.zeros(udoc.shape[0], dtype=np.int64)
        fsum = np.zeros(udoc.shape[0], dtype=np.int64)
        np.add.at(n_tok, dinv, tf)
        np.add.at(fsum, dinv, contrib)
        return pa.table(
            {
                "doc_id": pa.array(udoc),
                "n_tokens": pa.array(n_tok),
                "freq_sum": pa.array(fsum),
            }
        )

    return (
        docs.map_batches(tok_tf, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("freq_sum", alias_name="freq_sum"),
        )
    )


def label_centroids(sf_dir: str) -> ray.data.Dataset:
    """Per-label embedding centroid components — the grouped VECTOR
    aggregate behind class prototypes / SemDeDup cluster centers /
    IVF refitting: (label, dim, sum_micro, n) where sum_micro sums
    floor(v * 1e6) per element (integerized per the oracle float-parity
    contract; consumers divide sum_micro/n for the centroid).

    Physical plan: each batch reshapes its fixed-size-list column to an
    (n, d) float matrix ZERO-COPY and scatter-adds into an (n_labels, d)
    int64 partial — so a batch of any size leaves only n_labels*d skinny
    rows; the engine groupby that follows sees n_batches*n_labels*d rows,
    independent of corpus size.  This is the same partial-aggregate shape
    as kmeans_fit (pipelines/ann.py) with labels instead of assignments.
    """
    emb = _embeddings(sf_dir, columns=("label", "embedding"))

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "label": pa.nulls(0, pa.int64()),
                "dim": pa.nulls(0, pa.int64()),
                "sum_micro": pa.nulls(0, pa.int64()),
                "n": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        col = batch["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vals = col.flatten().to_numpy(zero_copy_only=False)
        d = vals.shape[0] // batch.num_rows
        micro = np.floor(
            vals.astype(np.float64).reshape(batch.num_rows, d) * 1_000_000.0
        ).astype(np.int64)
        labels = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        ul, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((ul.shape[0], d), dtype=np.int64)
        np.add.at(sums, inv, micro)
        cnt = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(np.repeat(ul, d)),
                "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), ul.shape[0])),
                "sum_micro": pa.array(sums.reshape(-1)),
                "n": pa.array(np.repeat(cnt, d)),
            }
        )

    return (
        emb.map_batches(partial, batch_format="pyarrow")
        .groupby("label")
        .map_groups(
            lambda g: (
                pa.TableGroupBy(g, ["label", "dim"])
                .aggregate([("sum_micro", "sum"), ("n", "sum")])
                .rename_columns(["label", "dim", "sum_micro", "n"])
                if g.num_rows and "dim" in g.column_names
                else pa.table(
                    {
                        "label": pa.nulls(0, pa.int64()),
                        "dim": pa.nulls(0, pa.int64()),
                        "sum_micro": pa.nulls(0, pa.int64()),
                        "n": pa.nulls(0, pa.int64()),
                    }
                )
            ),
            batch_format="pyarrow",
        )
    )


def user_funnel(sf_dir: str) -> ray.data.Dataset:
    """Funnel analysis — the sequential-pattern operator of event
    analytics: per user, the earliest strictly-ordered view -> click ->
    purchase chain:

        (user_id, stage_reached, view_ts_us, click_ts_us, purchase_ts_us)

    stage_reached in 0..3; unreached stage timestamps are -1 (sentinel,
    not NULL — cross-engine NULL handling stays out of the hash).  Chain
    semantics: view = min view ts; click = min click ts STRICTLY after
    that view; purchase = min purchase ts strictly after that click (the
    standard "first conversion path" definition — a purchase before the
    first qualifying click does not count).

    Physical plan: prune to the three funnel event types at the scan, ONE
    user%P exchange of (user, stage, ts) triples, then a vectorized
    per-partition kernel: lexsort by (user, ts) and three masked
    minimum.reduceat passes (one per stage, each gated on the previous
    stage's per-user timestamp broadcast back to rows).  No per-user
    Python, no joins — the three-way self-join the SQL expresses is three
    segment reductions over one sorted array."""
    P = 32
    STAGE = {"view": 0, "click": 1, "purchase": 2}

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    stage_order = pa.array(
        sorted(STAGE, key=STAGE.get), type=pa.string()
    )

    def prep(batch: pa.Table) -> pa.Table:
        # Arrow-native label -> stage id (null = not a funnel event)
        idx = pc.index_in(batch["event_type"], value_set=stage_order)
        keep = pc.is_valid(idx).to_numpy(zero_copy_only=False)
        stage = idx.to_numpy(zero_copy_only=False).astype(np.float64)
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                "user_id": pa.array(uid),
                "stage": pa.array(stage[keep].astype(np.int64)),
                "ts": pa.array(ts),
                "part": pa.array(uid % P),
            }
        )

    BIG = np.int64(2**62)

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.nulls(0, pa.int64()),
                "stage_reached": pa.nulls(0, pa.int64()),
                "view_ts_us": pa.nulls(0, pa.int64()),
                "click_ts_us": pa.nulls(0, pa.int64()),
                "purchase_ts_us": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "stage" not in group.column_names:
            return empty
        uid = group["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        st = group["stage"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = group["ts"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ts, uid))
        uid, st, ts = uid[order], st[order], ts[order]
        seg = np.concatenate(([True], uid[1:] != uid[:-1]))
        starts = np.flatnonzero(seg)
        lens = np.diff(np.concatenate((starts, [uid.shape[0]])))
        users = uid[starts]

        def masked_min_after(stage_id: int, after_row: np.ndarray) -> np.ndarray:
            val = np.where((st == stage_id) & (ts > after_row), ts, BIG)
            return np.minimum.reduceat(val, starts)

        never = np.full(uid.shape[0], np.int64(-1))
        v = masked_min_after(0, never)
        v_row = np.repeat(np.where(v < BIG, v, BIG), lens)
        c = masked_min_after(1, v_row)
        c_row = np.repeat(np.where(c < BIG, c, BIG), lens)
        p = masked_min_after(2, c_row)
        stage_reached = (
            (v < BIG).astype(np.int64)
            + (c < BIG).astype(np.int64)
            + (p < BIG).astype(np.int64)
        )
        return pa.table(
            {
                "user_id": pa.array(users),
                "stage_reached": pa.array(stage_reached),
                "view_ts_us": pa.array(np.where(v < BIG, v, -1)),
                "click_ts_us": pa.array(np.where(c < BIG, c, -1)),
                "purchase_ts_us": pa.array(np.where(p < BIG, p, -1)),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def documents_upsert(sf_dir: str) -> ray.data.Dataset:
    """Registry row for pipelines/incremental.corpus_upsert: base = the
    documents table; delta = a derived re-crawl (every doc_id % 10 == 0,
    text uppercased) read as a SEPARATE dataset, so the upsert runs the
    real two-dataset plan (broadcast delta-id set + anti-filter + union),
    not a per-batch rewrite."""
    from libpostal_ray.pipelines.incremental import corpus_upsert

    cols = ["doc_id", "text", "lang", "source"]
    base = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=cols
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    def recrawl(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = pa.array(ids % 10 == 0)
        sub = batch.filter(keep)
        return sub.set_column(
            sub.schema.get_field_index("text"),
            "text",
            pc.utf8_upper(sub["text"]),
        )

    delta = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=cols)
        .map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(recrawl, batch_format="pyarrow")
    )
    return corpus_upsert(base, delta)


def brand_type_margin(sf_dir: str) -> ray.data.Dataset:
    """Part-dimension join (completes the test-table coverage — part was
    the one unread table): per (p_brand, p_type), lineitem sales volume
    vs catalog price:

        (p_brand, p_type, n_items, sold_cents, catalog_cents)

    sold_cents integerizes l_extendedprice*(1-l_discount) per row;
    catalog_cents integerizes l_quantity * p_retailprice per row (both
    floor-cents — module float-parity contract).

    Physical plan: part is a DIMENSION — (partkey -> brand/type id,
    retailprice) sorted arrays broadcast once; lineitem streams through
    one map with an int64 scatter-add partial per (brand, type) cell, so
    each batch emits <= 25*6 skinny rows into a tiny engine groupby.
    The fact side never shuffles (order_customer_nation discipline)."""
    import pyarrow.parquet as pq

    import ray as _ray

    part = pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_type", "p_retailprice"],
    )
    pk = part["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    brands = np.asarray(part["p_brand"].to_pylist(), dtype=object)
    types_ = np.asarray(part["p_type"].to_pylist(), dtype=object)
    price = part["p_retailprice"].to_numpy(zero_copy_only=False).astype(np.float64)
    ub = np.unique(brands)
    ut = np.unique(types_)
    bid = np.searchsorted(ub, brands)
    tid = np.searchsorted(ut, types_)
    cell = bid * ut.shape[0] + tid  # dense (brand, type) cell id
    po = np.argsort(pk)
    dims = _ray.put(
        {
            "pk": pk[po], "cell": cell[po].astype(np.int64),
            "price": price[po], "ub": ub, "ut": ut, "nt": ut.shape[0],
        }
    )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    def partial(batch: pa.Table) -> pa.Table:
        st = _ray.get(dims)
        lpk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(st["pk"], lpk)
        idxc = np.clip(idx, 0, st["pk"].shape[0] - 1)
        hit = (idx < st["pk"].shape[0]) & (st["pk"][idxc] == lpk)
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        sold = np.floor(ep * (1.0 - disc) * 100.0).astype(np.int64)
        catalog = np.floor(qty * st["price"][idxc] * 100.0).astype(np.int64)
        cells = st["cell"][idxc]
        n_cells = st["ub"].shape[0] * st["nt"]
        acc_n = np.zeros(n_cells, dtype=np.int64)
        acc_s = np.zeros(n_cells, dtype=np.int64)
        acc_c = np.zeros(n_cells, dtype=np.int64)
        h = np.flatnonzero(hit)
        np.add.at(acc_n, cells[h], 1)
        np.add.at(acc_s, cells[h], sold[h])
        np.add.at(acc_c, cells[h], catalog[h])
        nz = np.flatnonzero(acc_n)
        return pa.table(
            {
                "cell": pa.array(nz.astype(np.int64)),
                "n_items": pa.array(acc_n[nz]),
                "sold_cents": pa.array(acc_s[nz]),
                "catalog_cents": pa.array(acc_c[nz]),
            }
        )

    agg = (
        li.map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(
            Sum("n_items", alias_name="n_items"),
            Sum("sold_cents", alias_name="sold_cents"),
            Sum("catalog_cents", alias_name="catalog_cents"),
        )
    )

    def name_cells(batch: pa.Table) -> pa.Table:
        st = _ray.get(dims)
        c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "p_brand": pa.array(st["ub"][c // st["nt"]], type=pa.string()),
                "p_type": pa.array(st["ut"][c % st["nt"]], type=pa.string()),
                "n_items": batch["n_items"],
                "sold_cents": batch["sold_cents"],
                "catalog_cents": batch["catalog_cents"],
            }
        )

    return agg.map_batches(name_cells, batch_format="pyarrow")


def event_debounce(sf_dir: str, min_gap_us: int = 300_000_000) -> ray.data.Dataset:
    """Debounce / rate-limit dedup — the streaming-dedup primitive that
    drops rapid-fire repeats of the same (user, event_type): keep an
    event iff it is the key's first or arrives more than ``min_gap_us``
    after the key's PREVIOUS event (lag semantics, exactly SQL's
    ``lag() OVER``; the keep-chain variant — gap measured from the last
    KEPT event — is the same kernel with a segment scan instead of a
    shift, deliberately not the oracle because no window function
    expresses it).

    Output: (event_id, user_id, event_type, ts_us).

    Physical plan: composite int64 key = user_id * 8 + event_type_id
    (non-negative, engine-wide key rule), ONE key%P exchange of 4-column
    skinny rows, per-partition lexsort by (key, ts, event_id) and a
    vectorized shift — no per-key Python, row count out <= in."""
    P = 32
    ET = {"click": 0, "error": 1, "purchase": 2, "signup": 3, "view": 4}

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    et_order = pa.array(sorted(ET, key=ET.get), type=pa.string())

    def prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = (
            pc.index_in(batch["event_type"], value_set=et_order)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        # composite key must stay a non-negative int64: loud failure
        # beats silent overflow if ids ever become reader-derived 63-bit
        if uid.shape[0] and int(uid.max()) >= 2**59:
            raise ValueError("user_id too large for the uid*8+type key")
        key = uid * 8 + et
        return pa.table(
            {
                "event_id": batch["event_id"].cast(pa.int64()),
                "key": pa.array(key),
                "ts_us": batch["ts"].cast(pa.int64()),
                "et": pa.array(et),
                "part": pa.array(key % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.nulls(0, pa.int64()),
                "user_id": pa.nulls(0, pa.int64()),
                "event_type": pa.nulls(0, pa.string()),
                "ts_us": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "key" not in group.column_names:
            return empty
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        key = group["key"].to_numpy(zero_copy_only=False)
        ts = group["ts_us"].to_numpy(zero_copy_only=False)
        et = group["et"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, key))
        eid, key, ts, et = eid[order], key[order], ts[order], et[order]
        first = np.concatenate(([True], key[1:] != key[:-1]))
        prev = np.empty(ts.shape[0], dtype=np.int64)
        prev[0] = 0
        prev[1:] = ts[:-1]
        keep = first | (ts - prev > np.int64(min_gap_us))
        names = np.asarray(sorted(ET, key=ET.get), dtype=object)
        return pa.table(
            {
                "event_id": pa.array(eid[keep]),
                "user_id": pa.array(key[keep] // 8),
                "event_type": pa.array(names[et[keep]], type=pa.string()),
                "ts_us": pa.array(ts[keep]),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def events_value_p99_outliers(sf_dir: str, q: float = 0.99) -> ray.data.Dataset:
    """Global-quantile outlier filter: events whose value exceeds the
    EXACT q-quantile of the whole value column — the two-pass shape of
    every "drop the extreme tail" cleaning rule.  The threshold comes
    from functions/quantile.exact_global_quantile (4 radix-refinement
    scans, no sort, O(2^16)-row exchanges); the filter is then one
    streaming pass.  Output (event_id, value_milli)."""
    from libpostal_ray.functions.quantile import exact_global_quantile

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "value"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    thr = exact_global_quantile(ev, "value", q)

    def flt(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        keep = v > thr
        return pa.table(
            {
                "event_id": batch["event_id"].filter(pa.array(keep)).cast(pa.int64()),
                "value_milli": pa.array(
                    np.floor(v[keep] * 1000.0).astype(np.int64)
                ),
            }
        )

    return ev.map_batches(flt, batch_format="pyarrow")


def events_value_mad(sf_dir: str) -> ray.data.Dataset:
    """Robust dispersion — median absolute deviation of the event value
    column, the outlier-insensitive sibling of stddev every data-quality
    monitor wants: (median_milli, mad_milli), one row.

    Two compositions of functions/quantile.exact_global_quantile (4 radix
    scans each, constant-size exchanges): median of value, then median of
    |value - median| over a derived streaming column.  Exactness carries
    through because both engines pick REAL data elements (quantile_disc)
    and |x - m| is a single IEEE operation."""
    from libpostal_ray.functions.quantile import exact_global_quantile

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["value"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    med = exact_global_quantile(ev, "value", 0.5)

    def absdev(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"dev": pa.array(np.abs(v - med))})

    mad = exact_global_quantile(
        ev.map_batches(absdev, batch_format="pyarrow"), "dev", 0.5
    )
    return ray.data.from_arrow(
        pa.table(
            {
                "median_milli": pa.array(
                    [int(np.floor(med * 1000.0))], type=pa.int64()
                ),
                "mad_milli": pa.array(
                    [int(np.floor(mad * 1000.0))], type=pa.int64()
                ),
            }
        )
    )


def near_dupe_pagerank(sf_dir: str) -> ray.data.Dataset:
    """Composition row: PageRank centrality over the flagship's verified
    near-dup edge graph (pipelines/graph.py) — the principled
    representative score for keep/drop decisions (the highest-rank member
    of a cluster is the most-central, not just min(sha))."""
    from libpostal_ray.config import PipelineConfig
    from libpostal_ray.pipelines.graph import pagerank
    from libpostal_ray.pipelines.near_dupe import near_dupe_pipeline

    corpus = read_documents_corpus(sf_dir)
    out = near_dupe_pipeline(corpus, PipelineConfig())
    return pagerank(out["edges"], iters=10)


def embedding_quantize_int8(sf_dir: str) -> ray.data.Dataset:
    """Symmetric per-vector int8 quantization — the ANN-prep export that
    cuts an embedding store 4x (FAISS/ScaNN SQ8 shape): per vector,
    scale = max|v_i| and q_i = floor((v_i / scale) * 127); long-form
    output (vec_id, dim, qval, scale_micro) so the oracle can check every
    element (the production sink would keep the packed fixed_size_list +
    one scale column — same kernel, different layout).

    Stateless per-batch kernel: zero-copy (n, d) reshape, row-max via one
    reduction, broadcasted divide — no shuffle anywhere.  All arithmetic
    in float64 on BOTH engines (the FLOAT-multiplies-in-float32 DuckDB
    gotcha, build notes)."""
    emb = _embeddings(sf_dir, columns=("vec_id", "embedding"))

    def quant(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "vec_id": pa.nulls(0, pa.int64()),
                "dim": pa.nulls(0, pa.int64()),
                "qval": pa.nulls(0, pa.int64()),
                "scale_micro": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        col = batch["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vals = col.flatten().to_numpy(zero_copy_only=False)
        n = batch.num_rows
        d = vals.shape[0] // n
        v = vals.astype(np.float64).reshape(n, d)
        scale = np.abs(v).max(axis=1)
        keep = scale > 0
        if not keep.any():
            return empty
        v, scale = v[keep], scale[keep]
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        q = np.floor((v / scale[:, None]) * 127.0).astype(np.int64)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(ids, d)),
                "dim": pa.array(
                    np.tile(np.arange(1, d + 1, dtype=np.int64), ids.shape[0])
                ),
                "qval": pa.array(q.reshape(-1)),
                "scale_micro": pa.array(
                    np.repeat(
                        np.floor(scale * 1_000_000.0).astype(np.int64), d
                    )
                ),
            }
        )

    return emb.map_batches(quant, batch_format="pyarrow")


def user_order_full_outer(sf_dir: str) -> ray.data.Dataset:
    """FULL OUTER join — completes the join family (inner/left/semi/anti/
    asof/range/broadcast/big-big all exist): purchase counts per user
    FULL OUTER F-order counts per customer key,

        (k, n_purchases, n_f_orders)   missing side = -1 (no NULLs in
                                       the hash — engine-wide contract).

    Physical plan: each side pre-aggregates per batch (vectorized
    np.unique partials — only distinct keys leave a batch), both skinny
    tagged streams meet in ONE k%P exchange, and the per-partition kernel
    is a three-way np.unique merge (union of keys, scatter both counts,
    -1 fills).  No engine join operator; padding rows never exist."""
    P = 32

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderstatus"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    def _partial(keys: np.ndarray, side: int) -> pa.Table:
        u, c = np.unique(keys, return_counts=True)
        return pa.table(
            {
                "k": pa.array(u.astype(np.int64)),
                "cnt": pa.array(c.astype(np.int64)),
                "side": pa.array(np.full(u.shape[0], side, dtype=np.int64)),
                "part": pa.array(u.astype(np.int64) % P),
            }
        )

    def left_partial(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch["event_type"], "purchase").to_numpy(
            zero_copy_only=False
        )
        k = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)[m]
        return _partial(k, 0)

    def right_partial(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch["o_orderstatus"], "F").to_numpy(zero_copy_only=False)
        k = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)[m]
        return _partial(k, 1)

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "k": pa.nulls(0, pa.int64()),
                "n_purchases": pa.nulls(0, pa.int64()),
                "n_f_orders": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "side" not in group.column_names:
            return empty
        k = group["k"].to_numpy(zero_copy_only=False)
        cnt = group["cnt"].to_numpy(zero_copy_only=False)
        side = group["side"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(k, return_inverse=True)
        lcnt = np.zeros(uk.shape[0], dtype=np.int64)
        rcnt = np.zeros(uk.shape[0], dtype=np.int64)
        lm = side == 0
        np.add.at(lcnt, inv[lm], cnt[lm])
        np.add.at(rcnt, inv[~lm], cnt[~lm])
        lseen = np.zeros(uk.shape[0], dtype=bool)
        rseen = np.zeros(uk.shape[0], dtype=bool)
        lseen[inv[lm]] = True
        rseen[inv[~lm]] = True
        return pa.table(
            {
                "k": pa.array(uk.astype(np.int64)),
                "n_purchases": pa.array(np.where(lseen, lcnt, -1)),
                "n_f_orders": pa.array(np.where(rseen, rcnt, -1)),
            }
        )

    return (
        ev.map_batches(left_partial, batch_format="pyarrow")
        .union(orders.map_batches(right_partial, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def global_event_ranks(sf_dir: str) -> ray.data.Dataset:
    """Global total-order rank — the distributed ORDER BY:
    (event_id, value_milli, global_rank) with rank 1 = highest value,
    ties broken by event_id ASC (a deterministic total order, the
    precondition for reproducible top-N exports).

    Physical plan is the canonical range-partitioned sort, built from
    this repo's radix machinery instead of the engine's sort:

      1. one scan histograms the 16-bit prefix of the DESCENDING
         order-preserving key (functions/quantile.float_order_key,
         inverted) — <= 65536 skinny rows leave any batch, merged in one
         remote task (tree reduce at cluster scale);
      2. the cumulative histogram gives every bucket its global rank
         OFFSET — no coordination, no sampling error (vs sample-based
         range partitioning);
      3. pass 2 exchanges rows keyed by bucket; each partition kernel
         lexsorts its bucket run and assigns offset + local position.

    Skew note: identical values land in one bucket; continuous doubles
    spread uniformly over prefixes.  A pathological constant column
    degrades to one partition carrying its duplicates — loud in the
    histogram, not silent."""
    from libpostal_ray.functions.quantile import float_order_key

    import ray as _ray

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "value"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    def hist(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "bucket": pa.nulls(0, pa.int64()),
                "cnt": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        v = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        key = ~float_order_key(v)  # bit-inverted => DESCENDING value order
        digit = (key >> np.uint64(48)).astype(np.int64)
        u, c = np.unique(digit, return_counts=True)
        return pa.table(
            {
                "bucket": pa.array(u),
                "cnt": pa.array(c.astype(np.int64)),
            }
        )

    @_ray.remote
    def merge_hist(*blocks):
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

    hist_blocks = (
        ev.map_batches(hist, batch_format="pyarrow").materialize().to_arrow_refs()
    )
    counts = _ray.get(merge_hist.remote(*hist_blocks))
    offsets_ref = _ray.put(
        np.concatenate(([0], np.cumsum(counts)[:-1])).astype(np.int64)
    )

    def keyed(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "bucket": pa.nulls(0, pa.int64()),
                "part": pa.nulls(0, pa.int64()),
                "key": pa.nulls(0, pa.int64()),
                "event_id": pa.nulls(0, pa.int64()),
                "value_milli": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        v = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        key = ~float_order_key(v)
        bucket = (key >> np.uint64(48)).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket),
                # one Python group call per PARTITION, never per bucket
                # (the repo-wide key%P rule); complete buckets colocate
                "part": pa.array(bucket % 32),
                # 63-bit view is order-preserving WITHIN a bucket (the top
                # 16 bits are constant there), and int64 keeps the engine
                # exchange fast (non-negative int64 key rule)
                "key": pa.array((key & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)),
                "event_id": batch["event_id"].cast(pa.int64()),
                "value_milli": pa.array(np.floor(v * 1000.0).astype(np.int64)),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.nulls(0, pa.int64()),
                "value_milli": pa.nulls(0, pa.int64()),
                "global_rank": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "bucket" not in group.column_names:
            return empty
        offs = _ray.get(offsets_ref)
        bucket = group["bucket"].to_numpy(zero_copy_only=False)
        key = group["key"].to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        vm = group["value_milli"].to_numpy(zero_copy_only=False)
        # a partition holds many buckets: process each bucket's run
        # independently (sorted by bucket first)
        border = np.lexsort((eid, key, bucket))
        bucket, key, eid, vm = bucket[border], key[border], eid[border], vm[border]
        starts = np.flatnonzero(
            np.concatenate(([True], bucket[1:] != bucket[:-1]))
        )
        lens = np.diff(np.concatenate((starts, [bucket.shape[0]])))
        local = np.arange(bucket.shape[0], dtype=np.int64) - np.repeat(
            starts, lens
        )
        rank = offs[bucket] + local + 1
        return pa.table(
            {
                "event_id": pa.array(eid),
                "value_milli": pa.array(vm),
                "global_rank": pa.array(rank),
            }
        )

    return (
        ev.map_batches(keyed, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def similar_doc_pairs(sf_dir: str) -> ray.data.Dataset:
    """Exact set-similarity threshold self-join: all document pairs whose
    word-4-gram shingle sets have Jaccard >= 1/20 (a threshold this
    corpus's planted near-dup families sit above while random word-salad
    pairs share almost no 4-grams — k=4 keeps the candidate join ~30x
    smaller than k=3 on a 31-word vocabulary).  Ground truth for the LSH
    flagship — see pipelines/simjoin.py for the AllPairs-style plan."""
    from libpostal_ray.pipelines.simjoin import similarity_join_pairs

    return similarity_join_pairs(
        _docs(sf_dir), threshold_num=1, threshold_den=20, shingle_k=4
    )


def pack_sequences(sf_dir: str, seq_len: int = 512) -> ray.data.Dataset:
    """Training-sequence packing layout: (doc_id, n_tokens, start_tok,
    seq_bin) — each doc's exact global token offset under concatenation
    in doc_id order (distributed prefix sum; pipelines/pack.py) and the
    fixed-length sequence its first token lands in."""
    from libpostal_ray.pipelines.pack import pack_training_sequences

    return pack_training_sequences(_docs(sf_dir), seq_len=seq_len)


def scrub_common_tokens(
    docs: ray.data.Dataset, *, num: int = 1, den: int = 2
) -> ray.data.Dataset:
    """Corpus-adaptive boilerplate-token removal — the order-preserving
    REWRITE operator of the quality family (redact_docs edits by pattern;
    this edits by corpus statistics, the C4/stopword-discovery move):
    tokens appearing in >= num/den of all documents are dropped from
    every document, order and single-space joins preserved ->
    (doc_id, clean_text, n_removed).

    Plan: per-batch DISTINCT (doc, token) partials -> ONE crc32(token)%P
    exchange whose kernel sums document frequencies and emits ONLY
    tokens over the threshold (stop tokens are few BY DEFINITION — the
    filter runs before anything returns, so the collected stop set is
    tiny at any corpus size); the stop set broadcasts once via ray.put
    and the rewrite is a single streaming Arrow pass (is_in mask +
    rebuilt list offsets + binary_join — no Python per row)."""
    import zlib

    import ray as _ray

    P = 32
    n_docs = docs.count()

    def tok_df(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "token": pa.array([], type=pa.large_string()),
                "df": pa.array([], type=pa.int64()),
                "part": pa.array([], type=pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        txt = pc.fill_null(
            pc.utf8_trim_whitespace(batch["text"].cast(pa.large_string())), ""
        )
        lists = pc.split_pattern(txt, pattern=" ")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        if len(flat) == 0:
            return empty
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        V = np.int64(len(enc.dictionary))
        # distinct (doc, token): one np.unique over packed keys
        uk = np.unique(parent.astype(np.int64) * V + codes)
        code_u = uk % V
        ucode, dfc = np.unique(code_u, return_counts=True)
        toks = enc.dictionary.take(pa.array(ucode))
        crc = np.fromiter(
            (zlib.crc32(t.encode("utf-8")) for t in toks.to_pylist()),
            dtype=np.int64,
            count=len(toks),
        ) % P
        return pa.table(
            {
                "token": toks.cast(pa.large_string()),
                "df": pa.array(dfc.astype(np.int64)),
                "part": pa.array(crc),
            }
        )

    def df_kernel(group: pa.Table) -> pa.Table:
        empty = pa.table({"token": pa.array([], type=pa.large_string())})
        if group.num_rows == 0 or "token" not in group.column_names:
            return empty
        g = (
            pa.TableGroupBy(group.select(["token", "df"]), "token")
            .aggregate([("df", "sum")])
            .rename_columns(["token", "df"])
        )
        # threshold INSIDE the kernel: sub-threshold tokens never leave
        keep = pc.greater_equal(
            pc.multiply(g["df"], pa.scalar(den, type=pa.int64())),
            pa.scalar(num * n_docs, type=pa.int64()),
        )
        return g.filter(keep).select(["token"])

    stop_df = (
        docs.map_batches(tok_df, batch_format="pyarrow")
        .groupby("part")
        .map_groups(df_kernel, batch_format="pyarrow")
        .to_pandas()
    )
    stop_list = (
        sorted(stop_df["token"].tolist()) if len(stop_df) else []
    )
    stop_ref = _ray.put(stop_list)

    def rewrite(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "clean_text": pa.array([], type=pa.large_string()),
                "n_removed": pa.array([], type=pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        stop = _ray.get(stop_ref)
        txt = pc.fill_null(
            pc.utf8_trim_whitespace(batch["text"].cast(pa.large_string())), ""
        )
        lists = pc.split_pattern(txt, pattern=" ")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        nrows = batch.num_rows
        if stop and len(flat):
            drop = pc.is_in(
                flat, value_set=pa.array(stop, type=pa.large_string())
            ).to_numpy(zero_copy_only=False)
        else:
            drop = np.zeros(len(flat), dtype=bool)
        keepm = ~drop
        kept_per_row = np.bincount(
            parent[keepm], minlength=nrows
        ).astype(np.int64)
        total_per_row = np.bincount(parent, minlength=nrows).astype(np.int64)
        offsets = np.concatenate(([0], np.cumsum(kept_per_row))).astype(
            np.int64
        )
        kept_list = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()),
            flat.filter(pa.array(keepm)),
        )
        clean = pc.binary_join(
            kept_list, pa.scalar(" ", type=pa.large_string())
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "clean_text": clean.cast(pa.large_string()),
                "n_removed": pa.array(total_per_row - kept_per_row),
            }
        )

    return docs.map_batches(rewrite, batch_format="pyarrow")


def scrub_boilerplate_tokens(sf_dir: str) -> ray.data.Dataset:
    """Registry wrapper: scrub tokens present in >= half the corpus from
    the documents table (see scrub_common_tokens)."""
    return scrub_common_tokens(_docs(sf_dir), num=1, den=2)


def eval_overlap_pairs(sf_dir: str) -> ray.data.Dataset:
    """Fuzzy train/eval contamination: a deterministic 30% hash split of
    the documents table plays the eval set; emit every (eval, train)
    pair whose word-4-gram shingle Jaccard >= 1/20 — the near-duplicate
    leaks that survive exact decontamination (contamination_flags).
    Columns: (eval_id, train_id, n_shared, n_a, n_b, jacc)."""
    from libpostal_ray.pipelines.simjoin import similarity_join_bipartite

    docs = _docs(sf_dir)
    T = 1288490188  # floor(0.3 * 2^32), same Knuth split as hash_sample

    def is_eval(batch: pa.Table, keep: bool) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = (ids * 2654435761) % 4294967296 < T
        return batch.filter(pa.array(m if keep else ~m))

    ev = docs.map_batches(
        lambda b: is_eval(b, True), batch_format="pyarrow"
    )
    tr = docs.map_batches(
        lambda b: is_eval(b, False), batch_format="pyarrow"
    )
    return similarity_join_bipartite(
        ev, tr, threshold_num=1, threshold_den=20, shingle_k=4,
        out_a="eval_id", out_b="train_id",
    )


def similar_docs_topk(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """Per-document text kNN: each doc's top-k most similar neighbors by
    exact shingle Jaccard (among pairs >= 1/20), rank 1 = most similar,
    ties broken by neighbor id ASC -> (src_id, nbr_id, n_shared, jacc,
    rank).  The similarity-search operator over TEXT (ann_topk is its
    embedding-space sibling): candidate pairs come from the simjoin's
    postings plan, then one src%P exchange ranks each doc's neighbor
    list vectorized (jacc is a single exact-int division, so the DESC
    order is engine-identical)."""
    from libpostal_ray.pipelines.simjoin import similarity_join_pairs

    P = 32
    pairs = similarity_join_pairs(
        _docs(sf_dir), threshold_num=1, threshold_den=20, shingle_k=4
    )

    def directed(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "src_id": pa.array([], type=pa.int64()),
                "nbr_id": pa.array([], type=pa.int64()),
                "n_shared": pa.array([], type=pa.int64()),
                "jacc": pa.array([], type=pa.float64()),
                "part": pa.array([], type=pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        a = batch["doc_a"].to_numpy(zero_copy_only=False)
        b = batch["doc_b"].to_numpy(zero_copy_only=False)
        s = batch["n_shared"].to_numpy(zero_copy_only=False)
        j = batch["jacc"].to_numpy(zero_copy_only=False)
        src = np.concatenate((a, b))
        nbr = np.concatenate((b, a))
        return pa.table(
            {
                "src_id": pa.array(src),
                "nbr_id": pa.array(nbr),
                "n_shared": pa.array(np.concatenate((s, s))),
                "jacc": pa.array(np.concatenate((j, j))),
                "part": pa.array(src % P),
            }
        )

    def topk(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "src_id": pa.array([], type=pa.int64()),
                "nbr_id": pa.array([], type=pa.int64()),
                "n_shared": pa.array([], type=pa.int64()),
                "jacc": pa.array([], type=pa.float64()),
                "rank": pa.array([], type=pa.int64()),
            }
        )
        if group.num_rows == 0 or "src_id" not in group.column_names:
            return empty
        src = group["src_id"].to_numpy(zero_copy_only=False)
        nbr = group["nbr_id"].to_numpy(zero_copy_only=False)
        s = group["n_shared"].to_numpy(zero_copy_only=False)
        j = group["jacc"].to_numpy(zero_copy_only=False)
        order = np.lexsort((nbr, -j, src))
        src, nbr, s, j = src[order], nbr[order], s[order], j[order]
        starts = np.flatnonzero(
            np.concatenate(([True], src[1:] != src[:-1]))
        )
        lens = np.diff(np.concatenate((starts, [src.shape[0]])))
        rank = (
            np.arange(src.shape[0], dtype=np.int64)
            - np.repeat(starts, lens)
            + 1
        )
        keep = rank <= k
        return pa.table(
            {
                "src_id": pa.array(src[keep]),
                "nbr_id": pa.array(nbr[keep]),
                "n_shared": pa.array(s[keep]),
                "jacc": pa.array(j[keep]),
                "rank": pa.array(rank[keep]),
            }
        )

    return (
        pairs.map_batches(directed, batch_format="pyarrow")
        .groupby("part")
        .map_groups(topk, batch_format="pyarrow")
    )


def events_type_median_exact(sf_dir: str) -> ray.data.Dataset:
    """EXACT per-group interpolated median (SQL median semantics) with
    CONSTANT exchange volume: functions/quantile.py:
    grouped_exact_quantile_cont — four radix-refinement scans shared by
    all (group, bracketing-rank) targets, <= groups x 65536 skinny
    histogram rows per batch per pass, NO per-group value gather.  The
    scale counterpart of priority_price_iqr (which co-locates each group;
    a hot group at 100 TB would be one task's heap) and the exact
    counterpart of user_value_p50_sketch."""
    from libpostal_ray.functions.quantile import grouped_exact_quantile_cont

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    tbl = grouped_exact_quantile_cont(ds, "event_type", "value", 0.5)
    tbl = tbl.rename_columns(["event_type", "n_events", "median_value"])
    return ray.data.from_arrow(tbl)


def weighted_doc_sample(sf_dir: str, k: int = 64) -> ray.data.Dataset:
    """Deterministic weighted sample WITHOUT replacement (Efraimidis-
    Spirakis A-ES): the k docs with the largest key ln(u)/w, where
    u = ((doc_id*48271) % (2^31-1) + 1) / 2^31 is Lehmer-hash randomness
    (reproducible across runs AND engines — the same discipline as
    stratified_sample) and w = n_chars, so selection probability is
    proportional to document length — the length-weighted mix a training
    sampler actually draws.  Completes the sampling family (hash_sample =
    uniform, stratified_sample = per-group quota, this = weighted).

    Physical plan: per-batch PARTIAL top-k (one vectorized argpartition —
    the exchange carries <= k rows per batch, never the corpus), one
    single-task finish.  Output (doc_id, n_chars, rn), rn = 1-based rank
    in (key DESC, doc_id) order — row_number()-equal to the SQL oracle.
    ln() is the one float step; both engines evaluate it on IDENTICAL
    doubles (exact power-of-two division), and ordering ties would need
    sub-ulp key collisions — parity-verified at 3 scales."""
    M = np.int64(2147483647)

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.nulls(0, pa.int64()),
                "n_chars": pa.nulls(0, pa.int64()),
                "key": pa.nulls(0, pa.float64()),
            }
        )
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return empty
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = ((ids * np.int64(48271)) % M + 1).astype(np.float64) / 2147483648.0
        key = np.log(u) / w
        if ids.shape[0] > k:
            take = np.argpartition(-key, k - 1)[:k]
        else:
            take = np.arange(ids.shape[0])
        return pa.table(
            {
                "doc_id": pa.array(ids[take], type=pa.int64()),
                "n_chars": pa.array(w[take], type=pa.int64()),
                "key": pa.array(key[take], type=pa.float64()),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return pa.table(
                {
                    "doc_id": pa.nulls(0, pa.int64()),
                    "n_chars": pa.nulls(0, pa.int64()),
                    "rn": pa.nulls(0, pa.int64()),
                }
            )
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        w = batch["n_chars"].to_numpy(zero_copy_only=False)
        key = batch["key"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -key))[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], type=pa.int64()),
                "n_chars": pa.array(w[order], type=pa.int64()),
                "rn": pa.array(
                    np.arange(1, order.shape[0] + 1, dtype=np.int64)
                ),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow", batch_size=None)
    )


def source_ngram_overlap(sf_dir: str) -> ray.data.Dataset:
    """Corpus-level contamination rollup: shared distinct word-4-gram
    shingles between every pair of sources, with group-level Jaccard —
    pipelines/simjoin.py: source_gram_overlap (bitmask-per-gram plan, 8 B
    keys, Python cost = distinct group-combinations).  The source-pair
    aggregate one level above similar_doc_pairs / eval_overlap_pairs."""
    from libpostal_ray.pipelines.simjoin import source_gram_overlap

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    return ray.data.from_arrow(source_gram_overlap(ds))


def cdc_chunk_dups(sf_dir: str) -> ray.data.Dataset:
    """Per-doc content-defined-chunking duplication stats over documents
    (pipelines/cdc.py): which fraction of each doc's bytes-level chunks
    recur in OTHER docs — partial/embedded duplication the whole-doc and
    shingle paths miss.  Rows-only: Gear-CDC boundaries are not
    SQL-expressible."""
    from libpostal_ray.pipelines.cdc import chunk_dup_stats

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    return chunk_dup_stats(ds, text_col="text")


def chunk_containment_pairs(sf_dir: str) -> ray.data.Dataset:
    """Containment-related doc pairs over documents (pipelines/cdc.py):
    shared distinct CDC chunks / min(n_a, n_b) >= 1/2 — the embedded-file
    relation whole-doc Jaccard dilutes away.  Rows-only (CDC boundaries
    are not SQL-expressible)."""
    from libpostal_ray.pipelines.cdc import chunk_containment_pairs as ccp

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    return ccp(ds, text_col="text")


def user_top_event(sf_dir: str) -> ray.data.Dataset:
    """ARGMAX per group (SQL max_by / row_number()=1): each user's
    highest-value event with a deterministic (value DESC, event_id DESC)
    tie-break, carrying the full payload row (type, value, id).

    The distributed shape is the max-reduce-with-payload classic: a
    per-batch vectorized argmax per user (lexsort + segment boundaries)
    collapses each batch to <= one row per observed user BEFORE the
    exchange, so the user_id%P shuffle ships candidates, never events;
    the per-partition kernel repeats the same reduce.  Hot users cost
    O(#batches), not O(#events) — the partial-aggregate discipline of
    every other reduce in this module (reference analog: the
    best-expansion selection in expand.c, one winner per key)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "value", "event_id"],
    )
    P = 32

    def _best(batch: pa.Table) -> tuple:
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        e = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # lexsort: primary user ASC, then value ASC, then event_id ASC —
        # the LAST row of each user segment is the (value, event_id) max
        order = np.lexsort((e, v, u))
        us = u[order]
        last = np.concatenate((us[1:] != us[:-1], [True]))
        keep = order[last]
        return keep

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.nulls(0, pa.int64()),
                "top_type": pa.nulls(0, pa.string()),
                "top_value": pa.nulls(0, pa.float64()),
                "top_event_id": pa.nulls(0, pa.int64()),
                "part": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "user_id" not in batch.column_names:
            return empty
        keep = _best(batch)
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        return pa.table(
            {
                "user_id": pa.array(u),
                "top_type": batch["event_type"].take(pa.array(keep)),
                "top_value": pa.array(
                    batch["value"].to_numpy(zero_copy_only=False)[keep]
                ),
                "top_event_id": pa.array(
                    batch["event_id"].to_numpy(zero_copy_only=False)[keep].astype(np.int64)
                ),
                "part": pa.array(u % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.nulls(0, pa.int64()),
                "top_type": pa.nulls(0, pa.string()),
                "top_value": pa.nulls(0, pa.float64()),
                "top_event_id": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "user_id" not in group.column_names:
            return empty
        u = group["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = group["top_value"].to_numpy(zero_copy_only=False).astype(np.float64)
        e = group["top_event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((e, v, u))
        us = u[order]
        last = np.concatenate((us[1:] != us[:-1], [True]))
        keep = order[last]
        return pa.table(
            {
                "user_id": pa.array(u[keep]),
                "top_type": group["top_type"].take(pa.array(keep)),
                "top_value": pa.array(v[keep]),
                "top_event_id": pa.array(e[keep]),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def doc_dir_rollup(sf_dir: str) -> ray.data.Dataset:
    """Hierarchical path-prefix rollup (pipelines/hierarchy.py): file
    counts and byte totals per directory at every depth, in ONE pass —
    the storage-layout question a 10^12-file code corpus asks of its
    (repo, path) keys.  The oracle derives a deterministic 3-level path
    from the documents table (source/lang/d<doc_id%10>) so DuckDB can
    replay the rollup with unnest-over-prefixes SQL; the operator itself
    is generic over any separator-joined key column."""
    from libpostal_ray.pipelines.hierarchy import prefix_rollup

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "lang", "n_chars"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    def mkpath(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "path": pa.nulls(0, pa.string()),
                    "n_chars": pa.nulls(0, pa.int64()),
                }
            )
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.asarray(batch["source"].to_pylist(), dtype=object).astype(str)
        lang = np.asarray(batch["lang"].to_pylist(), dtype=object).astype(str)
        leaf = np.char.add("d", np.char.mod("%d", d % 10))
        path = np.char.add(
            np.char.add(np.char.add(np.char.add(src, "/"), lang), "/"), leaf
        )
        return pa.table(
            {
                "path": pa.array(path.astype(object), type=pa.string()),
                "n_chars": pa.array(
                    batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
            }
        )

    return prefix_rollup(
        ds.map_batches(mkpath, batch_format="pyarrow"),
        "path",
        "n_chars",
        max_depth=3,
        weight_alias="sum_chars",
    )


def top_collocations(sf_dir: str) -> ray.data.Dataset:
    """PMI-ranked adjacent-bigram collocations over the corpus: the top
    50 word pairs by p(xy)/(p(x)p(y)), the standard collocation statistic
    (ranked by the ratio — monotone in PMI — computed as ONE canonical
    float64 expression over exact int64 counts, so scores are
    bit-identical to the SQL oracle).

    Physical plan: ONE tokenize pass emits per-batch partial unigram AND
    bigram counts (np.unique over dictionary codes, no per-row Python)
    through a single crc32(key)%P exchange; the per-partition kernel
    finishes the counts.  The aggregated vocabulary table (words +
    bigrams, corpus-bounded, << rows) is then the input to scoring: a
    remote task builds the unigram lookup + global totals and broadcasts
    ONE state ref; a final map over the bigram rows scores and keeps a
    per-batch top-50, reduced to the global top-50 in a single tiny
    group.  Content crosses no exchange; hot words cost O(#batches)."""
    import zlib

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    P = 32
    K = 50

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "w1": pa.nulls(0, pa.string()),
                "w2": pa.nulls(0, pa.string()),
                "n": pa.nulls(0, pa.int64()),
                "kind": pa.nulls(0, pa.int64()),
                "part": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "text" not in batch.column_names:
            return empty
        txt = pc.utf8_trim_whitespace(batch["text"])
        lists = pc.split_pattern(txt, pattern=" ")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        ok = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        if not ok.any():
            return empty
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary
        V = np.int64(len(vocab))
        codes = codes[ok]
        parent = parent[ok]
        # unigrams
        uc, un = np.unique(codes, return_counts=True)
        # adjacent bigrams: consecutive positions within the same doc
        adj = parent[1:] == parent[:-1]
        bk = codes[:-1][adj] * V + codes[1:][adj]
        ub, bn = np.unique(bk, return_counts=True)
        w1 = vocab.take(pa.array(np.concatenate((uc, ub // V))))
        w2c = np.concatenate((np.zeros(uc.shape[0], dtype=np.int64), ub % V))
        w2 = vocab.take(pa.array(w2c))
        kind = np.concatenate(
            (
                np.zeros(uc.shape[0], dtype=np.int64),
                np.ones(ub.shape[0], dtype=np.int64),
            )
        )
        n = np.concatenate((un, bn)).astype(np.int64)
        w1py = w1.to_pylist()
        w2py = w2.to_pylist()
        keys = [
            (a if k == 0 else a + "\x01" + b)
            for a, b, k in zip(w1py, w2py, kind)
        ]
        return pa.table(
            {
                "w1": w1,
                "w2": pa.array(
                    [b if k else "" for b, k in zip(w2py, kind)],
                    type=pa.string(),
                ),
                "n": pa.array(n),
                "kind": pa.array(kind),
                "part": pa.array(
                    np.fromiter(
                        (zlib.crc32(s.encode()) for s in keys),
                        dtype=np.int64,
                        count=len(keys),
                    )
                    % P
                ),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "w1": pa.nulls(0, pa.string()),
                "w2": pa.nulls(0, pa.string()),
                "n": pa.nulls(0, pa.int64()),
                "kind": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "w1" not in group.column_names:
            return empty
        w1 = np.asarray(group["w1"].to_pylist(), dtype=object)
        w2 = np.asarray(group["w2"].to_pylist(), dtype=object)
        k = group["kind"].to_numpy(zero_copy_only=False)
        n = group["n"].to_numpy(zero_copy_only=False)
        keys = np.char.add(
            np.char.add(
                np.char.add(k.astype(str), "\x01"), w1.astype(str)
            ),
            np.char.add("\x01", w2.astype(str)),
        )
        uk, first, inv = np.unique(keys, return_index=True, return_inverse=True)
        ns = np.zeros(uk.shape[0], dtype=np.int64)
        np.add.at(ns, inv, n)
        return pa.table(
            {
                "w1": pa.array(list(w1[first]), type=pa.string()),
                "w2": pa.array(list(w2[first]), type=pa.string()),
                "n": pa.array(ns),
                "kind": pa.array(k[first].astype(np.int64)),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge, batch_format="pyarrow")
        .materialize()
    )

    @ray.remote
    def _build_uni_state(*blocks):
        blocks = [b for b in blocks if b.num_rows and "w1" in b.column_names]
        if not blocks:
            return {
                "words": np.empty(0, dtype="U1"),
                "n": np.empty(0, dtype=np.int64),
                "n1": 0,
                "nb": 0,
            }
        t = pa.concat_tables(blocks)
        kind = t["kind"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        uni = kind == 0
        words = np.asarray(t["w1"].to_pylist(), dtype="U")[uni]
        un = n[uni].astype(np.int64)
        order = np.argsort(words, kind="stable")
        return {
            "words": words[order],
            "n": un[order],
            "n1": int(un.sum()),
            "nb": int(n[~uni].sum()),
        }

    state_ref = _build_uni_state.remote(*counts.to_arrow_refs())
    import ray as _ray

    def score_topk(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "w1": pa.nulls(0, pa.string()),
                "w2": pa.nulls(0, pa.string()),
                "n_xy": pa.nulls(0, pa.int64()),
                "n_x": pa.nulls(0, pa.int64()),
                "n_y": pa.nulls(0, pa.int64()),
                "pmi_ratio": pa.nulls(0, pa.float64()),
                "g": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "w1" not in batch.column_names:
            return empty
        kind = batch["kind"].to_numpy(zero_copy_only=False)
        bi = kind == 1
        if not bi.any():
            return empty
        st = _ray.get(state_ref)
        w1 = np.asarray(batch["w1"].to_pylist(), dtype="U")[bi]
        w2 = np.asarray(batch["w2"].to_pylist(), dtype="U")[bi]
        nxy = batch["n"].to_numpy(zero_copy_only=False)[bi].astype(np.int64)
        nx = st["n"][np.searchsorted(st["words"], w1)]
        ny = st["n"][np.searchsorted(st["words"], w2)]
        n1 = np.float64(st["n1"])
        nb = np.float64(st["nb"])
        # canonical expression — MUST match the SQL text operation for
        # operation: ((xy * N1) * N1) / (((NB * nx) * ny))
        score = ((nxy.astype(np.float64) * n1) * n1) / (
            (nb * nx.astype(np.float64)) * ny.astype(np.float64)
        )
        order = np.lexsort((w2, w1, -score))[:K]
        return pa.table(
            {
                "w1": pa.array(list(w1[order]), type=pa.string()),
                "w2": pa.array(list(w2[order]), type=pa.string()),
                "n_xy": pa.array(nxy[order]),
                "n_x": pa.array(nx[order].astype(np.int64)),
                "n_y": pa.array(ny[order].astype(np.int64)),
                "pmi_ratio": pa.array(score[order], type=pa.float64()),
                "g": pa.array(np.zeros(order.shape[0], dtype=np.int64)),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "w1": pa.nulls(0, pa.string()),
                "w2": pa.nulls(0, pa.string()),
                "n_xy": pa.nulls(0, pa.int64()),
                "n_x": pa.nulls(0, pa.int64()),
                "n_y": pa.nulls(0, pa.int64()),
                "pmi_ratio": pa.nulls(0, pa.float64()),
            }
        )
        if group.num_rows == 0 or "w1" not in group.column_names:
            return empty
        w1 = np.asarray(group["w1"].to_pylist(), dtype="U")
        w2 = np.asarray(group["w2"].to_pylist(), dtype="U")
        score = group["pmi_ratio"].to_numpy(zero_copy_only=False)
        order = np.lexsort((w2, w1, -score))[:K]
        return pa.table(
            {
                "w1": pa.array(list(w1[order]), type=pa.string()),
                "w2": pa.array(list(w2[order]), type=pa.string()),
                "n_xy": pa.array(
                    group["n_xy"].to_numpy(zero_copy_only=False)[order]
                ),
                "n_x": pa.array(
                    group["n_x"].to_numpy(zero_copy_only=False)[order]
                ),
                "n_y": pa.array(
                    group["n_y"].to_numpy(zero_copy_only=False)[order]
                ),
                "pmi_ratio": pa.array(score[order], type=pa.float64()),
            }
        )

    return (
        counts.map_batches(score_topk, batch_format="pyarrow")
        .groupby("g")
        .map_groups(final, batch_format="pyarrow")
    )


def returnflag_weighted_median(sf_dir: str) -> pa.Table:
    """Grouped WEIGHTED exact median (functions/quantile.py
    grouped_weighted_median): smallest l_extendedprice per l_returnflag
    whose cumulative l_quantity weight reaches half the group total —
    exact selection via 4 weight-histogram radix scans with CONSTANT
    exchange volume (no engine has a weighted-quantile builtin; the SQL
    oracle replays the definition with a windowed cumulative sum).  The
    answer is a selected data value, bit-identical across engines."""
    from libpostal_ray.functions.quantile import grouped_weighted_median

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"],
    )

    def to_int_w(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "g": pa.nulls(0, pa.string()),
                    "v": pa.nulls(0, pa.float64()),
                    "w": pa.nulls(0, pa.int64()),
                }
            )
        return pa.table(
            {
                "g": batch["l_returnflag"],
                "v": batch["l_extendedprice"],
                "w": pa.array(
                    batch["l_quantity"]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
            }
        )

    tbl = grouped_weighted_median(
        ds.map_batches(to_int_w, batch_format="pyarrow"), "g", "v", "w"
    )
    return tbl.rename_columns(["l_returnflag", "total_weight", "wmedian"])


def lang_chain_components(sf_dir: str, gap: int = 8) -> ray.data.Dataset:
    """Connected components with a SQL oracle: docs chain to their
    successor doc_id within the same lang when the id gap is <= ``gap``;
    components are then the classic gaps-and-islands segments, which SQL
    computes with two window passes — while the Ray side feeds the edges
    through the REAL distributed CC tail (pipelines/cluster.py
    connected_components: large-star/small-star min-label, the flagship's
    clustering machinery).  This makes the CC operator itself
    driver-oracle-checkable; the flagship equivalent is only end-to-end
    checkable via exact_copy_coclustering.

    Edge build co-locates each lang (crc%P exchange of 16 B rows, one
    partition holds a whole lang — the same per-key-group-fits-a-partition
    assumption as window_over_key, documented there); singleton docs ride
    as self-edges so every doc gets a label.  Output: (doc_id,
    component_id = min doc_id in the island)."""
    import zlib

    from libpostal_ray.pipelines.cluster import connected_components

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    P = 32

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return pa.table(
                {
                    "doc_id": pa.nulls(0, pa.int64()),
                    "lang": pa.nulls(0, pa.string()),
                    "part": pa.nulls(0, pa.int64()),
                }
            )
        langs = np.asarray(batch["lang"].to_pylist(), dtype=object)
        ul, inv = np.unique(langs.astype(str), return_inverse=True)
        crc = np.asarray(
            [zlib.crc32(s.encode()) for s in ul], dtype=np.int64
        )
        return pa.table(
            {
                "doc_id": pa.array(
                    batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "lang": batch["lang"],
                "part": pa.array(crc[inv] % P),
            }
        )

    def edges(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "src": pa.nulls(0, pa.int64()),
                "dst": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "doc_id" not in group.column_names:
            return empty
        ids = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        langs = np.asarray(group["lang"].to_pylist(), dtype="U")
        order = np.lexsort((ids, langs))
        ids, langs = ids[order], langs[order]
        same = (langs[1:] == langs[:-1]) & (ids[1:] - ids[:-1] <= gap)
        src = ids[:-1][same]
        dst = ids[1:][same]
        # singletons (no edge either side) ride as self-edges
        ine = np.zeros(ids.shape[0], dtype=bool)
        idx = np.flatnonzero(same)
        ine[idx] = True
        ine[idx + 1] = True
        alone = ids[~ine]
        return pa.table(
            {
                "src": pa.array(np.concatenate((src, alone))),
                "dst": pa.array(np.concatenate((dst, alone))),
            }
        )

    e = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(edges, batch_format="pyarrow")
    )
    labels = connected_components(e)
    return labels.rename_columns(["doc_id", "component_id"])


def order_skyline(sf_dir: str) -> ray.data.Dataset:
    """2-D SKYLINE (Pareto frontier): the distinct (o_totalprice,
    o_orderdate) pairs not dominated by any other pair (dominating =
    price >= AND date <=, strictly better in at least one — "as expensive
    but earlier", the maximal-vector problem).

    Skylines merge associatively — skyline(A ∪ B) = skyline(skyline(A) ∪
    skyline(B)) — so the distributed plan is the textbook one: each batch
    computes its LOCAL skyline vectorized (sort by price DESC / date ASC
    + running-min prefix test), and only those few candidate points cross
    the exchange into one tiny final reduce.  Dominated rows never leave
    their batch; exchange volume is O(skyline size x #batches), not rows.
    The SQL oracle replays the same prefix-min rule over the distinct
    pairs with one window pass."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_totalprice", "o_orderdate"]
    )

    def _skyline(price: np.ndarray, date: np.ndarray) -> np.ndarray:
        """Indices of the skyline points of DISTINCT (price, date) pairs
        (inputs must already be distinct): ordered by price DESC, date
        ASC, a point survives iff its date is strictly below the running
        min of all preceding dates."""
        order = np.lexsort((date, -price))
        d = date[order]
        if d.shape[0] == 0:
            return order
        prev = np.concatenate(
            ([np.iinfo(np.int64).max], np.minimum.accumulate(d)[:-1])
        )
        return order[d < prev]

    def local(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "o_totalprice": pa.nulls(0, pa.float64()),
                "o_orderdate": pa.nulls(0, pa.timestamp("us")),
                "g": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "o_totalprice" not in batch.column_names:
            return empty
        p = batch["o_totalprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        d = (
            batch["o_orderdate"]
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        # distinct pairs first (dominance is defined on value pairs)
        comp = np.stack((p, d.astype(np.float64)), axis=1)
        _, idx = np.unique(comp, axis=0, return_index=True)
        keep = idx[_skyline(p[idx], d[idx])]
        return pa.table(
            {
                "o_totalprice": pa.array(p[keep]),
                "o_orderdate": batch["o_orderdate"].take(pa.array(keep)),
                "g": pa.array(np.zeros(keep.shape[0], dtype=np.int64)),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "o_totalprice": pa.nulls(0, pa.float64()),
                "o_orderdate": pa.nulls(0, pa.timestamp("us")),
            }
        )
        if group.num_rows == 0 or "o_totalprice" not in group.column_names:
            return empty
        p = group["o_totalprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        d = (
            group["o_orderdate"]
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        comp = np.stack((p, d.astype(np.float64)), axis=1)
        _, idx = np.unique(comp, axis=0, return_index=True)
        keep = idx[_skyline(p[idx], d[idx])]
        return pa.table(
            {
                "o_totalprice": pa.array(p[keep]),
                "o_orderdate": group["o_orderdate"].take(pa.array(keep)),
            }
        )

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby("g")
        .map_groups(final, batch_format="pyarrow")
    )


def name_typo_pairs(sf_dir: str) -> ray.data.Dataset:
    """Edit-distance THRESHOLD self-join (dist <= 1) via
    deletion-neighborhood blocking (FastSS family) — the typo-dedup
    blocking key the shingle/MinHash families can't express: every row
    emits its DISTINCT deletion variants (the string itself + each
    single-character deletion, deduped per row), variants hash-partition,
    and only same-variant buckets generate candidates, verified with the
    repo's exact levenshtein.

    Pair-emission correctness: a dist-1 pair shares EXACTLY ONE distinct
    variant (substitution -> the deletion at the mismatch position;
    indel -> the shorter string itself), so each verified pair surfaces in
    exactly one partition — no global pair dedup pass.  A 61-bit
    polynomial variant hash keeps bucket keys non-negative int64; hash
    collisions only ever ADD candidates, which verification rejects.
    Exchange = (L+1) x 16 B keys per row — the documented blow-up of
    deletion blocking; content (the name) rides once per variant for
    verification.  Reference analog: near_dupe.c's name-key families
    (acronym/phonetic) — this adds the typo family."""

    ds = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    P = 32
    B = np.uint64(1099511628211)  # FNV-ish odd multiplier
    MASK63 = np.uint64((1 << 63) - 1)

    def variants(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "h": pa.nulls(0, pa.int64()),
                "id": pa.nulls(0, pa.int64()),
                "name": pa.nulls(0, pa.string()),
                "part": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "c_name" not in batch.column_names:
            return empty
        ids = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        names = batch["c_name"].to_pylist()
        # bytes matrix (rows padded with 0xFF, which no UTF-8 name byte
        # can start a padded tail with at these lengths)
        bs = [s.encode() for s in names]
        L = max((len(b) for b in bs), default=0)
        n = len(bs)
        m = np.full((n, L), 0xFF, dtype=np.uint8)
        lens = np.asarray([len(b) for b in bs], dtype=np.int64)
        for i, b in enumerate(bs):  # fill loop: O(rows), cheap vs hashing
            m[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)

        def row_hash(mat: np.ndarray, ln: np.ndarray) -> np.ndarray:
            # masked polynomial fold: bytes past each row's length are NOT
            # folded, so the hash is independent of the batch's padded
            # width — identical strings hash equal across blocks
            lnu = ln.astype(np.uint64)
            h = lnu.copy()
            for j in range(mat.shape[1]):  # loop over COLUMNS, not rows
                live = np.uint64(j) < lnu
                h = np.where(live, h * B + mat[:, j].astype(np.uint64), h)
            return (h & MASK63).astype(np.int64)

        out_h = [row_hash(m, lens)]
        out_i = [ids]
        out_nm = [np.arange(n, dtype=np.int64)]
        for d in range(L):  # delete position d (rows shorter than d keep
            # their padding delete = identity; the per-row dedup below
            # collapses those back to the full-string variant)
            md = np.concatenate((m[:, :d], m[:, d + 1 :], np.full((n, 1), 0xFF, np.uint8)), axis=1)
            valid = lens > d
            out_h.append(row_hash(md, np.maximum(lens - 1, 0))[: n])
            # invalid rows (d >= len) would duplicate the full variant
            # with a wrong length salt — overwrite with the full hash so
            # per-row dedup removes them
            out_h[-1][~valid] = out_h[0][~valid]
            out_i.append(ids)
            out_nm.append(np.arange(n, dtype=np.int64))
        H = np.stack(out_h, axis=1)  # (n, L+1)
        # per-row DISTINCT variants (correctness requires it — see doc)
        rows, cols = [], []
        srt = np.sort(H, axis=1)
        keep = np.concatenate(
            (np.ones((n, 1), dtype=bool), srt[:, 1:] != srt[:, :-1]), axis=1
        )
        hh = srt[keep]
        rid = np.repeat(np.arange(n, dtype=np.int64), keep.sum(axis=1))
        return pa.table(
            {
                "h": pa.array(hh),
                "id": pa.array(ids[rid]),
                "name": pa.array([names[i] for i in rid], type=pa.string()),
                "part": pa.array(hh % P),
            }
        )

    def pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.nulls(0, pa.int64()),
                "id_b": pa.nulls(0, pa.int64()),
                "dist": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "h" not in group.column_names:
            return empty
        h = group["h"].to_numpy(zero_copy_only=False)
        ids = group["id"].to_numpy(zero_copy_only=False)
        names = group["name"].to_pylist()
        order = np.lexsort((ids, h))
        h, ids = h[order], ids[order]
        if ids.shape[0] and (ids.min() < 0 or ids.max() >= (1 << 31)):
            raise ValueError("name_typo_pairs: id outside [0, 2^31)")
        # padded byte matrix of the partition's names (0xFF pad: no
        # UTF-8 byte, so padded tails can never fake a match)
        bs = [names[i].encode() for i in order]
        L = max((len(b) for b in bs), default=0)
        M = np.full((len(bs), L + 1), 0xFF, dtype=np.uint8)
        lens = np.asarray([len(b) for b in bs], dtype=np.int64)
        for i, b in enumerate(bs):
            M[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
        # candidate (i, j) pairs per equal-hash bucket — the same
        # arange/repeat emission as part_pair_counts, zero Python/pair
        is_start = np.concatenate(([True], h[1:] != h[:-1]))
        seg = np.flatnonzero(is_start)
        seg_id = np.cumsum(is_start) - 1
        local = np.arange(h.shape[0]) - seg[seg_id]
        T = int(local.sum())
        if T == 0:
            return empty
        j = np.repeat(np.arange(h.shape[0]), local)
        cum = np.cumsum(local)
        i_ = (
            np.arange(T)
            - np.repeat(cum - local, local)
            + np.repeat(seg[seg_id], local)
        )
        a = np.minimum(ids[i_], ids[j])
        b = np.maximum(ids[i_], ids[j])
        keep = a != b
        code = a[keep] * (np.int64(1) << 31) + b[keep]
        _, first = np.unique(code, return_index=True)
        i_, j = i_[keep][first], j[keep][first]
        # vectorized dist<=1 verification over the candidate matrix:
        # swap so row x is the longer string of each pair
        swap = lens[i_] < lens[j]
        x = np.where(swap, j, i_)
        y = np.where(swap, i_, j)
        dl = lens[x] - lens[y]
        A, B = M[x], M[y]
        neq = A != B
        ok = np.zeros(x.shape[0], dtype=bool)
        dist = np.ones(x.shape[0], dtype=np.int64)
        same_len = dl == 0
        if same_len.any():
            ham = neq[same_len].sum(axis=1)
            ok[same_len] = ham <= 1
            dist[same_len] = ham
        one_off = dl == 1
        if one_off.any():
            An, Bn, Nq = A[one_off], B[one_off], neq[one_off]
            # first mismatch = deletion position; A minus that char
            # must equal B (suffix compare with a per-row shift)
            fn = np.argmax(Nq, axis=1)
            cols = np.arange(A.shape[1] - 1)
            Ash = np.take_along_axis(
                An, np.minimum(cols[None, :] + (cols[None, :] >= fn[:, None]), A.shape[1] - 1), axis=1
            )
            ok[one_off] = (Ash == Bn[:, :-1]).all(axis=1)
        good = ok
        return pa.table(
            {
                "id_a": pa.array(np.minimum(ids[i_], ids[j])[good]),
                "id_b": pa.array(np.maximum(ids[i_], ids[j])[good]),
                "dist": pa.array(dist[good]),
            }
        )

    return (
        ds.map_batches(variants, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs, batch_format="pyarrow")
    )


def user_busy_intervals(sf_dir: str) -> ray.data.Dataset:
    """Per-user INTERVAL UNION: each event opens a 5-minute busy window
    [ts, ts+5min); overlapping/touching windows merge, output = merged
    run count + total covered microseconds per user.  The classic
    coverage/uptime operator (SQL gaps-and-islands) as one key%P
    exchange of per-batch PRE-MERGED runs — merged intervals compose
    associatively, so raw events never shuffle.  See
    pipelines/timeseries.interval_union."""
    from libpostal_ray.pipelines.timeseries import interval_union

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    out = interval_union(ds, "user_id", "ts", span_us=300_000_000)
    return out.map_batches(
        lambda b: b.rename_columns(["user_id", "n_busy", "busy_us"]),
        batch_format="pyarrow",
    )


def event_transitions(sf_dir: str) -> ray.data.Dataset:
    """First-order Markov transition counts over each user's
    time-ordered event-type sequence (ties on equal ts broken by
    event_id): (prev_type, next_type, n).  One key%P exchange
    co-locates sequences; per-partition np.unique factorization +
    bincount builds the local matrix; a crc32-keyed second agg sums the
    tiny matrices.  See pipelines/timeseries.transition_counts."""
    from libpostal_ray.pipelines.timeseries import transition_counts

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type", "event_id"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    out = transition_counts(ds, "user_id", "ts", "event_type", "event_id")
    return out.map_batches(
        lambda b: b.rename_columns(["prev_type", "next_type", "n"]),
        batch_format="pyarrow",
    )


def user_retention_daily(sf_dir: str) -> ray.data.Dataset:
    """Cohort retention matrix at day granularity: cohort = each user's
    first active day (int64 days since epoch), output
    (cohort_day, active_day, n_users).  Per-batch distinct (user, day)
    partials bound the exchange at one row per user-day per batch; the
    matrix itself is <= span^2 rows.  See
    pipelines/timeseries.retention_cohorts."""
    from libpostal_ray.pipelines.timeseries import retention_cohorts

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    out = retention_cohorts(ds, "user_id", "ts", bucket_us=86_400_000_000)
    return out.map_batches(
        lambda b: b.rename_columns(["cohort_day", "active_day", "n_users"]),
        batch_format="pyarrow",
    )


def user_value_hourly_ffill(sf_dir: str) -> ray.data.Dataset:
    """Gap-filling resample: each user's event values forward-filled
    onto an hourly grid between ceil(first event) and floor(last event)
    hour.  Fill = value at the latest observation <= the grid point
    (per-timestamp ties -> max value; a SELECTION, so the float rides
    through bit-exact).  Merge-based ffill — one lexsort + one
    np.maximum.accumulate, no per-key search.  See
    pipelines/timeseries.grid_ffill."""
    from libpostal_ray.pipelines.timeseries import grid_ffill

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    out = grid_ffill(ds, "user_id", "ts", "value", step_us=3_600_000_000)
    return out.map_batches(
        lambda b: b.rename_columns(["user_id", "grid_hour", "value"]),
        batch_format="pyarrow",
    )


def order_price_allocation(sf_dir: str) -> ray.data.Dataset:
    """Largest-remainder (Hamilton) apportionment: split each order's
    total price (integer cents) across its lineitems proportionally to
    l_extendedprice, EXACTLY — per-order allocations are integers that
    sum to the order total.  base = tot*w // W, then the tot - sum(base)
    leftover cents go to the largest fractional remainders (ties broken
    by linenumber).  The operator SQL engines make users hand-roll with
    two window passes, here as one k%P co-partitioned exchange of both
    tagged skinny streams + a reduceat/lexsort kernel.  Exact integer
    division discipline throughout — no float ever enters the
    allocation, so the oracle matches bit-for-bit."""
    P = 32

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    def _cents(col) -> np.ndarray:
        x = col.to_numpy(zero_copy_only=False).astype(np.float64)
        return np.floor(x * 100.0 + 0.5).astype(np.int64)

    def li_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "k": pa.nulls(0, pa.int64()),
                "ln": pa.nulls(0, pa.int64()),
                "w": pa.nulls(0, pa.int64()),
                "tot": pa.nulls(0, pa.int64()),
                "side": pa.nulls(0, pa.int64()),
                "part": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "l_orderkey" not in batch.column_names:
            return empty
        k = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "k": pa.array(k),
                "ln": pa.array(
                    batch["l_linenumber"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "w": pa.array(_cents(batch["l_extendedprice"])),
                "tot": pa.array(np.zeros(k.shape[0], np.int64)),
                "side": pa.array(np.zeros(k.shape[0], np.int64)),
                "part": pa.array(k % P),
            }
        )

    def o_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "k": pa.nulls(0, pa.int64()),
                "ln": pa.nulls(0, pa.int64()),
                "w": pa.nulls(0, pa.int64()),
                "tot": pa.nulls(0, pa.int64()),
                "side": pa.nulls(0, pa.int64()),
                "part": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "o_orderkey" not in batch.column_names:
            return empty
        k = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        z = np.zeros(k.shape[0], np.int64)
        return pa.table(
            {
                "k": pa.array(k),
                "ln": pa.array(z),
                "w": pa.array(z),
                "tot": pa.array(_cents(batch["o_totalprice"])),
                "side": pa.array(np.ones(k.shape[0], np.int64)),
                "part": pa.array(k % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "l_orderkey": pa.nulls(0, pa.int64()),
                "l_linenumber": pa.nulls(0, pa.int64()),
                "alloc_cents": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "side" not in group.column_names:
            return empty
        side = group["side"].to_numpy(zero_copy_only=False)
        k = group["k"].to_numpy(zero_copy_only=False)
        is_li = side == 0
        ok = np.sort(np.unique(k[~is_li]))
        totmap = np.zeros(ok.shape[0], np.int64)
        totmap[np.searchsorted(ok, k[~is_li])] = group["tot"].to_numpy(
            zero_copy_only=False
        )[~is_li]
        lk = k[is_li]
        ln = group["ln"].to_numpy(zero_copy_only=False)[is_li]
        w = group["w"].to_numpy(zero_copy_only=False)[is_li]
        if lk.shape[0] == 0 or ok.shape[0] == 0:
            return empty
        # inner-join semantics: drop lineitems whose order is absent
        pos = np.searchsorted(ok, lk)
        pos = np.minimum(pos, ok.shape[0] - 1)
        valid = ok[pos] == lk
        lk, ln, w, pos = lk[valid], ln[valid], w[valid], pos[valid]
        if lk.shape[0] == 0:
            return empty
        order = np.lexsort((ln, lk))
        lk, ln, w, pos = lk[order], ln[order], w[order], pos[order]
        tot = totmap[pos]
        is_start = np.concatenate(([True], lk[1:] != lk[:-1]))
        seg = np.flatnonzero(is_start)
        seg_id = np.cumsum(is_start) - 1
        W = np.add.reduceat(w, seg)[seg_id]
        base = (tot * w) // W
        frac = (tot * w) % W
        rem = (tot - np.add.reduceat(base, seg)[seg_id])
        # rank within order by (frac DESC, ln ASC)
        r = np.lexsort((ln, -frac, lk))
        rn = np.empty(lk.shape[0], np.int64)
        rn[r] = np.arange(lk.shape[0]) - seg[seg_id][r]
        alloc = base + (rn < rem)
        return pa.table(
            {
                "l_orderkey": pa.array(lk),
                "l_linenumber": pa.array(ln),
                "alloc_cents": pa.array(alloc.astype(np.int64)),
            }
        )

    return (
        li.map_batches(li_partial, batch_format="pyarrow")
        .union(orders.map_batches(o_partial, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def doc_chunk_windows(sf_dir: str) -> ray.data.Dataset:
    """Sliding-window chunking for LLM context prep: each document's
    whitespace tokens split into overlapping 32-token windows every 24
    tokens; chunk_text is the single-space token join.  Row-local byte-
    gather kernel, no exchange — see pipelines/pack.chunk_windows."""
    from libpostal_ray.pipelines.pack import chunk_windows

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    out = chunk_windows(ds, "doc_id", "text", window=32, stride=24)
    return out.map_batches(
        lambda b: b.rename_columns(["doc_id", "chunk_idx", "n_tok", "chunk_text"]),
        batch_format="pyarrow",
    )


def event_value_winsorized(sf_dir: str) -> ray.data.Dataset:
    """WINSORIZED robust mean per event_type: values clipped to the
    group's exact [p12.5, p87.5] interpolated percentiles, then summed
    as integer cents.  Two grouped_exact_quantile_cont passes (constant
    exchange radix refinement, functions/quantile.py) produce the clip
    bounds as a tiny driver-side table; the clip+sum pass broadcasts the
    bounds in a closure and pre-aggregates per batch, so the final
    exchange is <= groups x batches skinny rows.  Binary-fraction
    quantiles (1/8, 7/8) keep the interpolation IEEE-exact on both
    engines (the priority_price_iqr discipline); floor(clip*100+0.5)
    integerizes per ROW so the sum is associative."""
    from libpostal_ray.functions.quantile import grouped_exact_quantiles_cont

    def _ev():
        return ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    # both clip bounds from ONE set of four shared radix scans
    qt = grouped_exact_quantiles_cont(_ev(), "event_type", "value", [0.125, 0.875])
    ks = qt["event_type"].to_pylist()
    qv = qt["q"].to_pylist()
    vv = qt["q_value"].to_pylist()
    lo_map = {k: v for k, qq, v in zip(ks, qv, vv) if qq == 0.125}
    hi_map = {k: v for k, qq, v in zip(ks, qv, vv) if qq == 0.875}
    if not lo_map:
        return ray.data.from_arrow(
            pa.table(
                {
                    "event_type": pa.nulls(0, pa.string()),
                    "n_events": pa.nulls(0, pa.int64()),
                    "wsum_cents": pa.nulls(0, pa.int64()),
                }
            )
        )
    keys = sorted(lo_map)
    lo_v = np.asarray([lo_map[k] for k in keys], dtype=np.float64)
    hi_v = np.asarray([hi_map[k] for k in keys], dtype=np.float64)
    keys_np = np.asarray(keys, dtype=object).astype(str)

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_type": pa.nulls(0, pa.string()),
                "n_events": pa.nulls(0, pa.int64()),
                "wsum_cents": pa.nulls(0, pa.int64()),
                "g": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "event_type" not in batch.column_names:
            return empty
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object).astype(str)
        v = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        gi = np.searchsorted(keys_np, et)
        clipped = np.minimum(np.maximum(v, lo_v[gi]), hi_v[gi])
        cents = np.floor(clipped * 100.0 + 0.5).astype(np.int64)
        # per-batch partial: one row per group
        uniq, inv = np.unique(gi, return_inverse=True)
        n = np.bincount(inv)
        s = np.bincount(inv, weights=cents.astype(np.float64)).astype(np.int64)
        return pa.table(
            {
                "event_type": pa.array(keys_np[uniq].astype(object), type=pa.string()),
                "n_events": pa.array(n.astype(np.int64)),
                "wsum_cents": pa.array(s),
                "g": pa.array(uniq.astype(np.int64) % 8),
            }
        )

    def combine(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_type": pa.nulls(0, pa.string()),
                "n_events": pa.nulls(0, pa.int64()),
                "wsum_cents": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "event_type" not in group.column_names:
            return empty
        et = np.asarray(group["event_type"].to_pylist(), dtype=object).astype(str)
        n = group["n_events"].to_numpy(zero_copy_only=False)
        s = group["wsum_cents"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(et, return_inverse=True)
        return pa.table(
            {
                "event_type": pa.array(uniq.astype(object), type=pa.string()),
                "n_events": pa.array(np.bincount(inv, weights=n.astype(np.float64)).astype(np.int64)),
                "wsum_cents": pa.array(np.bincount(inv, weights=s.astype(np.float64)).astype(np.int64)),
            }
        )

    return (
        _ev()
        .map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .map_groups(combine, batch_format="pyarrow")
    )


def doc_chain_ranks(sf_dir: str, gap: int = 8) -> ray.data.Dataset:
    """LIST RANKING with a SQL oracle: the lang-chain islands of
    lang_chain_components, but each doc gets its HOP DISTANCE from the
    island head plus the head id — computed by the real distributed
    pointer-doubling primitive (pipelines/graph.list_rank, Wyllie's
    algorithm: O(log chain) co-partitioned join rounds), while SQL
    replays the islands with row_number().  Successor forest build =
    one per-lang exchange; singleton docs are their own heads."""
    import zlib

    from libpostal_ray.pipelines.graph import list_rank

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    P = 32

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return pa.table(
                {
                    "doc_id": pa.nulls(0, pa.int64()),
                    "lang": pa.nulls(0, pa.string()),
                    "part": pa.nulls(0, pa.int64()),
                }
            )
        langs = np.asarray(batch["lang"].to_pylist(), dtype=object)
        ul, inv = np.unique(langs.astype(str), return_inverse=True)
        crc = np.asarray([zlib.crc32(s.encode()) for s in ul], dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(
                    batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "lang": batch["lang"],
                "part": pa.array(crc[inv] % P),
            }
        )

    def parents(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "node": pa.nulls(0, pa.int64()),
                "parent": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "doc_id" not in group.column_names:
            return empty
        ids = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        langs = np.asarray(group["lang"].to_pylist(), dtype="U")
        order = np.lexsort((ids, langs))
        ids, langs = ids[order], langs[order]
        same = (langs[1:] == langs[:-1]) & (ids[1:] - ids[:-1] <= gap)
        parent = ids.copy()
        parent[1:][same] = ids[:-1][same]
        return pa.table({"node": pa.array(ids), "parent": pa.array(parent)})

    forest = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(parents, batch_format="pyarrow")
    )
    out = list_rank(forest)
    return out.map_batches(
        lambda b: b.rename_columns(["doc_id", "hops", "root"]),
        batch_format="pyarrow",
    )


def documents_checksum(sf_dir: str) -> ray.data.Dataset:
    """Order-independent table FINGERPRINT (anti-entropy check between
    replicas/snapshots): n_rows + XOR of per-row 63-bit md5 content
    hashes.  XOR is associative+commutative, so per-batch partials fold
    in any block layout and the exchange is ONE row per batch; two
    tables are replicas iff (n_rows, fp) match (md5 collisions aside).
    DuckDB's md5_number_lower = little-endian u64 of digest[8:16]
    (probed), masked to 63 bits to stay in the non-negative-int64
    engine contract.

    Empty-table note: a fully EMPTY corpus yields zero rows (the engine
    convention for every aggregate here), while the SQL global
    aggregate yields one (0, NULL) row — the one global-vs-grouped
    divergence, irrelevant at any non-zero scale."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    MASK = (1 << 63) - 1

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "n_rows": pa.nulls(0, pa.int64()),
                "fp": pa.nulls(0, pa.int64()),
                "g": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "text" not in batch.column_names:
            return empty
        fp = 0
        n = 0
        for v in batch["text"].to_pylist():
            n += 1
            if v is None:
                continue
            d = hashlib.md5(v.encode()).digest()
            fp ^= int.from_bytes(d[8:16], "little") & MASK
        return pa.table(
            {
                "n_rows": pa.array([n], type=pa.int64()),
                "fp": pa.array([fp], type=pa.int64()),
                "g": pa.array([0], type=pa.int64()),
            }
        )

    def combine(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "n_rows": pa.nulls(0, pa.int64()),
                "fp": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "n_rows" not in group.column_names:
            return empty
        n = int(group["n_rows"].to_numpy(zero_copy_only=False).sum())
        fp = 0
        for x in group["fp"].to_pylist():
            fp ^= int(x)
        return pa.table(
            {
                "n_rows": pa.array([n], type=pa.int64()),
                "fp": pa.array([fp], type=pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .map_groups(combine, batch_format="pyarrow")
    )


def part_pair_counts(sf_dir: str) -> ray.data.Dataset:
    """Market-basket CO-OCCURRENCE: for every pair of parts appearing in
    the same order, the number of orders containing both (the
    frequently-bought-together primitive).  One orderkey%P exchange of
    deduped (order, part) 16 B rows; the kernel emits each order's
    C(m,2) sorted pairs with the arange/repeat trick (zero Python per
    pair), pre-counts them on a composite 62-bit code, and a tiny
    second agg sums across partitions.  Pair volume = sum m_i^2/2 — the
    basket-size-bounded blow-up every co-occurrence engine documents
    (orders here have ~4 items).  Part keys are validated < 2^31 so the
    composite code never collides."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    P = 32

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "k": pa.nulls(0, pa.int64()),
                "p": pa.nulls(0, pa.int64()),
                "part": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "l_orderkey" not in batch.column_names:
            return empty
        k = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((p, k))
        k, p = k[order], p[order]
        keep = np.concatenate(([True], (k[1:] != k[:-1]) | (p[1:] != p[:-1])))
        k, p = k[keep], p[keep]
        return pa.table(
            {"k": pa.array(k), "p": pa.array(p), "part": pa.array(k % P)}
        )

    def pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "part_a": pa.nulls(0, pa.int64()),
                "part_b": pa.nulls(0, pa.int64()),
                "n_orders": pa.nulls(0, pa.int64()),
                "g": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "k" not in group.column_names:
            return empty
        k = group["k"].to_numpy(zero_copy_only=False)
        p = group["p"].to_numpy(zero_copy_only=False)
        if p.shape[0] and (p.min() < 0 or p.max() >= (1 << 31)):
            raise ValueError("part_pair_counts: partkey outside [0, 2^31)")
        order = np.lexsort((p, k))
        k, p = k[order], p[order]
        keep = np.concatenate(([True], (k[1:] != k[:-1]) | (p[1:] != p[:-1])))
        k, p = k[keep], p[keep]
        is_start = np.concatenate(([True], k[1:] != k[:-1]))
        seg = np.flatnonzero(is_start)
        seg_id = np.cumsum(is_start) - 1
        local = np.arange(k.shape[0]) - seg[seg_id]  # 0-based idx in order
        T = int(local.sum())
        if T == 0:
            return empty
        second = np.repeat(np.arange(k.shape[0]), local)
        cum = np.cumsum(local)
        first = (
            np.arange(T)
            - np.repeat(cum - local, local)
            + np.repeat(seg[seg_id], local)
        )
        code = p[first] * (np.int64(1) << 31) + p[second]
        uniq, cnt = np.unique(code, return_counts=True)
        return pa.table(
            {
                "part_a": pa.array(uniq >> 31),
                "part_b": pa.array(uniq & ((1 << 31) - 1)),
                "n_orders": pa.array(cnt.astype(np.int64)),
                "g": pa.array((uniq % np.int64(1_000_003)) % 16),
            }
        )

    def combine(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "part_a": pa.nulls(0, pa.int64()),
                "part_b": pa.nulls(0, pa.int64()),
                "n_orders": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "part_a" not in group.column_names:
            return empty
        a = group["part_a"].to_numpy(zero_copy_only=False)
        b = group["part_b"].to_numpy(zero_copy_only=False)
        n = group["n_orders"].to_numpy(zero_copy_only=False)
        code = a * (np.int64(1) << 31) + b
        uniq, inv = np.unique(code, return_inverse=True)
        tot = np.bincount(inv, weights=n.astype(np.float64)).astype(np.int64)
        return pa.table(
            {
                "part_a": pa.array(uniq >> 31),
                "part_b": pa.array(uniq & ((1 << 31) - 1)),
                "n_orders": pa.array(tot),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby("g")
        .map_groups(combine, batch_format="pyarrow")
    )


def user_behavior_profiles(sf_dir: str, min_count: int = 15) -> ray.data.Dataset:
    """GROUP-BY-SET: users bucketed by their BEHAVIOR PROFILE — the
    sorted set of event types they performed at least ``min_count``
    times — and counted per profile (the audience-segmentation
    primitive; a set-valued group key no engine groupby takes
    directly).  Per-batch (user, type) count partials bound the first
    exchange; the per-user kernel thresholds, sorts and joins the type
    set into a canonical string; a crc32-keyed second agg counts users
    per profile.  Users with no qualifying type are absent (matches the
    SQL HAVING semantics)."""
    import zlib

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    P = 32

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.nulls(0, pa.int64()),
                "event_type": pa.nulls(0, pa.string()),
                "n": pa.nulls(0, pa.int64()),
                "part": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "user_id" not in batch.column_names:
            return empty
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object).astype(str)
        types, code = np.unique(et, return_inverse=True)
        comp = u * types.shape[0] + code
        uniq, inv = np.unique(comp, return_inverse=True)
        cnt = np.bincount(inv)
        uu = uniq // types.shape[0]
        tt = types[uniq % types.shape[0]]
        return pa.table(
            {
                "user_id": pa.array(uu.astype(np.int64)),
                "event_type": pa.array(tt.astype(object), type=pa.string()),
                "n": pa.array(cnt.astype(np.int64)),
                "part": pa.array(uu.astype(np.int64) % P),
            }
        )

    def profile(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "profile": pa.nulls(0, pa.string()),
                "n_users": pa.nulls(0, pa.int64()),
                "g": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "user_id" not in group.column_names:
            return empty
        u = group["user_id"].to_numpy(zero_copy_only=False)
        et = np.asarray(group["event_type"].to_pylist(), dtype=object).astype(str)
        n = group["n"].to_numpy(zero_copy_only=False)
        # sum partials per (user, type) then threshold
        order = np.lexsort((et, u))
        u, et, n = u[order], et[order], n[order]
        new = np.concatenate(([True], (u[1:] != u[:-1]) | (et[1:] != et[:-1])))
        seg = np.flatnonzero(new)
        tot = np.add.reduceat(n, seg)
        uu, tt = u[seg], et[seg]
        qual = tot >= min_count
        uu, tt = uu[qual], tt[qual]
        if uu.shape[0] == 0:
            return empty
        # per-user sorted type join (types already sorted within user)
        profs: dict = {}
        start = np.concatenate(([True], uu[1:] != uu[:-1]))
        ps = np.flatnonzero(start)
        pe = np.concatenate((ps[1:], [uu.shape[0]]))
        for s, e in zip(ps, pe):  # python cost = qualifying users/partition
            key = ",".join(tt[s:e])
            profs[key] = profs.get(key, 0) + 1
        keys = list(profs)
        return pa.table(
            {
                "profile": pa.array(keys, type=pa.string()),
                "n_users": pa.array([profs[k] for k in keys], type=pa.int64()),
                "g": pa.array(
                    [zlib.crc32(k.encode()) % 8 for k in keys], type=pa.int64()
                ),
            }
        )

    def combine(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "profile": pa.nulls(0, pa.string()),
                "n_users": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "profile" not in group.column_names:
            return empty
        p_ = np.asarray(group["profile"].to_pylist(), dtype=object).astype(str)
        n = group["n_users"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(p_, return_inverse=True)
        tot = np.bincount(inv, weights=n.astype(np.float64)).astype(np.int64)
        return pa.table(
            {
                "profile": pa.array(uniq.astype(object), type=pa.string()),
                "n_users": pa.array(tot),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(profile, batch_format="pyarrow")
        .groupby("g")
        .map_groups(combine, batch_format="pyarrow")
    )


def tiered_dedup_report(sf_dir: str) -> pa.Table:
    """The tier-dedup ladder (pipelines/prepare.tiered_dedup): exact
    sha-collapse -> flagship MinHash/LSH near-dup -> SemDeDup, each tier
    over the previous tier's survivors only; returns the 3-row attrition
    report.  eps=0.45 here because the synthetic embeddings are
    near-orthogonal (max pairwise cosine 0.479 at sf0.001) — the
    demonstration threshold sits below that so the semantic tier is
    visibly active; the operator default is 0.9."""
    from libpostal_ray.pipelines.prepare import tiered_dedup

    return tiered_dedup(sf_dir, sem_eps=0.45)


def part_association_rules(sf_dir: str, min_support: int = 2) -> ray.data.Dataset:
    """ASSOCIATION RULES over order baskets: for part pairs co-occurring
    in >= min_support orders, the LIFT n_ab*N / (n_a*n_b) (>1 = bought
    together more than chance).  One 16 B/row dedup projection is
    materialized ONCE and feeds three skinny aggregations (pair counts
    keyed order%P, item counts keyed part%P, distinct-order count N);
    item counts + N gather OFF-DRIVER into one broadcast ref and the
    lift is a final stateless map over the thresholded pairs.  All
    numerators/denominators are exact int64 < 2^53, so the single
    double division (then round 6dp) is bit-identical to SQL."""
    import ray as _ray

    P = 32
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    def dedup(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"k": pa.nulls(0, pa.int64()), "p": pa.nulls(0, pa.int64())}
        )
        if batch.num_rows == 0 or "l_orderkey" not in batch.column_names:
            return empty
        k = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((p, k))
        k, p = k[order], p[order]
        keep = np.concatenate(([True], (k[1:] != k[:-1]) | (p[1:] != p[:-1])))
        return pa.table({"k": pa.array(k[keep]), "p": pa.array(p[keep])})

    dd = ds.map_batches(dedup, batch_format="pyarrow").materialize()

    # --- item counts (distinct orders per part) + N, off-driver ---
    def item_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "p": pa.nulls(0, pa.int64()),
                "c": pa.nulls(0, pa.int64()),
                "part": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "p" not in batch.column_names:
            return empty
        # rows are (k, p) DISTINCT within a batch but batches overlap on
        # k only via block splits of the same file scan — count per part
        # is over globally-distinct rows once the groupby merges; dedup
        # again per partition below
        u = batch["p"].to_numpy(zero_copy_only=False)
        k = batch["k"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "p": pa.array(u),
                "c": pa.array(k),  # carry k for exact distinct
                "part": pa.array(u % P),
            }
        )

    def item_count(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"p": pa.nulls(0, pa.int64()), "c": pa.nulls(0, pa.int64())}
        )
        if group.num_rows == 0 or "p" not in group.column_names:
            return empty
        p = group["p"].to_numpy(zero_copy_only=False)
        k = group["c"].to_numpy(zero_copy_only=False)
        order = np.lexsort((k, p))
        p, k = p[order], k[order]
        keep = np.concatenate(([True], (p[1:] != p[:-1]) | (k[1:] != k[:-1])))
        p = p[keep]
        is_start = np.concatenate(([True], p[1:] != p[:-1]))
        seg = np.flatnonzero(is_start)
        cnt = np.diff(np.concatenate((seg, [p.shape[0]])))
        return pa.table(
            {"p": pa.array(p[seg]), "c": pa.array(cnt.astype(np.int64))}
        )

    items = (
        dd.map_batches(item_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(item_count, batch_format="pyarrow")
        .materialize()
    )

    @_ray.remote
    def _build_state(*blocks):
        ps, cs = [], []
        n_orders = set()
        for b in blocks:
            if b.num_rows and "p" in b.column_names:
                ps.append(b["p"].to_numpy(zero_copy_only=False))
                cs.append(b["c"].to_numpy(zero_copy_only=False))
        p = np.concatenate(ps) if ps else np.zeros(0, np.int64)
        c = np.concatenate(cs) if cs else np.zeros(0, np.int64)
        order = np.argsort(p)
        return p[order], c[order]

    @_ray.remote
    def _count_orders(*blocks):
        seen = [
            np.unique(b["k"].to_numpy(zero_copy_only=False))
            for b in blocks
            if b.num_rows and "k" in b.column_names
        ]
        return int(np.unique(np.concatenate(seen)).shape[0]) if seen else 0

    state_ref = _build_state.remote(*items.to_arrow_refs())
    n_ref = _count_orders.remote(*dd.to_arrow_refs())

    # --- pair counts (same plan as part_pair_counts) ---
    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "k" not in batch.column_names:
            return pa.table(
                {
                    "k": pa.nulls(0, pa.int64()),
                    "p": pa.nulls(0, pa.int64()),
                    "part": pa.nulls(0, pa.int64()),
                }
            )
        k = batch["k"].to_numpy(zero_copy_only=False)
        return batch.append_column("part", pa.array(k % P))

    def pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "part_a": pa.nulls(0, pa.int64()),
                "part_b": pa.nulls(0, pa.int64()),
                "n_ab": pa.nulls(0, pa.int64()),
                "g": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "k" not in group.column_names:
            return empty
        k = group["k"].to_numpy(zero_copy_only=False)
        p = group["p"].to_numpy(zero_copy_only=False)
        if p.shape[0] and (p.min() < 0 or p.max() >= (1 << 31)):
            raise ValueError("part_association_rules: partkey outside [0, 2^31)")
        order = np.lexsort((p, k))
        k, p = k[order], p[order]
        keep = np.concatenate(([True], (k[1:] != k[:-1]) | (p[1:] != p[:-1])))
        k, p = k[keep], p[keep]
        is_start = np.concatenate(([True], k[1:] != k[:-1]))
        seg = np.flatnonzero(is_start)
        seg_id = np.cumsum(is_start) - 1
        local = np.arange(k.shape[0]) - seg[seg_id]
        T = int(local.sum())
        if T == 0:
            return empty
        second = np.repeat(np.arange(k.shape[0]), local)
        cum = np.cumsum(local)
        first = (
            np.arange(T)
            - np.repeat(cum - local, local)
            + np.repeat(seg[seg_id], local)
        )
        code = p[first] * (np.int64(1) << 31) + p[second]
        uniq, cnt = np.unique(code, return_counts=True)
        return pa.table(
            {
                "part_a": pa.array(uniq >> 31),
                "part_b": pa.array(uniq & ((1 << 31) - 1)),
                "n_ab": pa.array(cnt.astype(np.int64)),
                "g": pa.array((uniq % np.int64(1_000_003)) % 16),
            }
        )

    def lift(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "part_a": pa.nulls(0, pa.int64()),
                "part_b": pa.nulls(0, pa.int64()),
                "n_ab": pa.nulls(0, pa.int64()),
                "lift": pa.nulls(0, pa.float64()),
            }
        )
        if group.num_rows == 0 or "part_a" not in group.column_names:
            return empty
        a = group["part_a"].to_numpy(zero_copy_only=False)
        b = group["part_b"].to_numpy(zero_copy_only=False)
        n = group["n_ab"].to_numpy(zero_copy_only=False)
        code = a * (np.int64(1) << 31) + b
        uniq, inv = np.unique(code, return_inverse=True)
        tot = np.bincount(inv, weights=n.astype(np.float64)).astype(np.int64)
        m = tot >= min_support
        uniq, tot = uniq[m], tot[m]
        if uniq.shape[0] == 0:
            return empty
        pa_, pb_ = uniq >> 31, uniq & ((1 << 31) - 1)
        ip, ic = _ray.get(state_ref)
        N = _ray.get(n_ref)
        ca = ic[np.searchsorted(ip, pa_)]
        cb = ic[np.searchsorted(ip, pb_)]
        lf = np.round((tot * np.int64(N)).astype(np.float64) / (ca * cb).astype(np.float64), 6)
        return pa.table(
            {
                "part_a": pa.array(pa_),
                "part_b": pa.array(pb_),
                "n_ab": pa.array(tot),
                "lift": pa.array(lf),
            }
        )

    return (
        dd.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby("g")
        .map_groups(lift, batch_format="pyarrow")
    )


def event_type_octiles(sf_dir: str) -> ray.data.Dataset:
    """All seven OCTILES (q = 1/8 .. 7/8) per event_type from ONE set of
    four shared radix scans (functions/quantile.py
    grouped_exact_quantiles_cont — every (group, q) target refines in
    the same sweep, constant exchange).  Binary-fraction q's keep
    DuckDB's v_lo + frac*(v_hi - v_lo) interpolation IEEE-exact."""
    from libpostal_ray.functions.quantile import grouped_exact_quantiles_cont

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    qs = [i / 8.0 for i in range(1, 8)]
    t = grouped_exact_quantiles_cont(ds, "event_type", "value", qs)
    return ray.data.from_arrow(t.drop_columns(["n"]))


def events_since_signup(sf_dir: str) -> ray.data.Dataset:
    """Conditional-RESET running count: for every event, how many events
    its user has produced since the most recent 'signup' (the signup
    itself counts 0; before any signup, counts run from first activity).
    Unlike gap sessionization (user_sessions) the segment boundary is a
    PREDICATE on the row, the "count since last error/login/deploy"
    shape.  One user%P exchange; the kernel is two cumsum-with-reset
    passes (predicate prefix-count defines segments, position-in-segment
    is the answer) — zero Python per row."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    P = 32

    def tag(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.nulls(0, pa.int64()),
                "ts": pa.nulls(0, pa.int64()),
                "event_id": pa.nulls(0, pa.int64()),
                "is_reset": pa.nulls(0, pa.int64()),
                "part": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "user_id" not in batch.column_names:
            return empty
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        ) if isinstance(batch["ts"], pa.ChunkedArray) else batch["ts"].cast(
            pa.int64()
        ).to_numpy(zero_copy_only=False)
        rs = pc.equal(batch["event_type"], "signup").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": pa.array(u),
                "ts": pa.array(np.asarray(ts, dtype=np.int64)),
                "event_id": pa.array(
                    batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "is_reset": pa.array(rs.astype(np.int64)),
                "part": pa.array(u % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.nulls(0, pa.int64()),
                "n_since": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "user_id" not in group.column_names:
            return empty
        u = group["user_id"].to_numpy(zero_copy_only=False)
        ts = group["ts"].to_numpy(zero_copy_only=False)
        e = group["event_id"].to_numpy(zero_copy_only=False)
        r = group["is_reset"].to_numpy(zero_copy_only=False)
        order = np.lexsort((e, ts, u))
        u, e, r = u[order], e[order], r[order]
        n = u.shape[0]
        new_user = np.concatenate(([True], u[1:] != u[:-1]))
        # grp = per-user running count of resets (cumsum with reset)
        cs = np.cumsum(r)
        ustart = np.flatnonzero(new_user)
        uid = np.cumsum(new_user) - 1
        base = np.where(ustart > 0, cs[ustart - 1], 0)
        grp = cs - base[uid]
        # position within each (user, grp) run
        new_seg = new_user | np.concatenate(([True], grp[1:] != grp[:-1]))
        seg = np.flatnonzero(new_seg)
        seg_id = np.cumsum(new_seg) - 1
        n_since = np.arange(n) - seg[seg_id]
        return pa.table(
            {
                "event_id": pa.array(e),
                "n_since": pa.array(n_since.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def user_event_diversity(sf_dir: str) -> ray.data.Dataset:
    """Simpson diversity index of each user's event-type mix:
    1 - sum_i (n_i/T)^2 — the collision-probability / label-skew metric a
    training-mix dashboard asks of any behavior table (and the
    Gini-impurity of the user's type distribution).

    Exactness discipline: both numerator and denominator are exact int64
    (T^2 - sum n_i^2 over T^2), so the single float64 division is
    bit-identical to the SQL oracle regardless of block layout — no float
    accumulation ever happens.  Physical plan: per-batch (user, type)
    count partials (dictionary codes, np.unique) through one user%P
    exchange; the kernel re-reduces and finishes per user with
    lexsort + add.reduceat (associative int sums)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    P = 32

    EMPTY_PART = pa.table(
        {
            "user_id": pa.nulls(0, pa.int64()),
            "event_type": pa.nulls(0, pa.string()),
            "n": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "user_id" not in batch.column_names:
            return EMPTY_PART
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        enc = batch["event_type"].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        V = np.int64(len(enc.dictionary))
        key = u * V + codes
        uk, n = np.unique(key, return_counts=True)
        uu = uk // V
        return pa.table(
            {
                "user_id": pa.array(uu),
                "event_type": enc.dictionary.take(pa.array(uk % V)),
                "n": pa.array(n.astype(np.int64)),
                "part": pa.array(uu % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.nulls(0, pa.int64()),
                "n_events": pa.nulls(0, pa.int64()),
                "diversity": pa.nulls(0, pa.float64()),
            }
        )
        if group.num_rows == 0 or "user_id" not in group.column_names:
            return empty
        u = group["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        enc = group["event_type"].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n = group["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        V = np.int64(len(enc.dictionary))
        key = u * V + codes
        order = np.argsort(key, kind="stable")
        key_s, u_s, n_s = key[order], u[order], n[order]
        starts = np.flatnonzero(
            np.concatenate(([True], key_s[1:] != key_s[:-1]))
        )
        per_type = np.add.reduceat(n_s, starts)  # count per (user, type)
        u_t = u_s[starts]
        ustarts = np.flatnonzero(
            np.concatenate(([True], u_t[1:] != u_t[:-1]))
        )
        T = np.add.reduceat(per_type, ustarts)
        S = np.add.reduceat(per_type * per_type, ustarts)
        tt = T * T
        div = (tt - S).astype(np.float64) / tt.astype(np.float64)
        return pa.table(
            {
                "user_id": pa.array(u_t[ustarts]),
                "n_events": pa.array(T.astype(np.int64)),
                "diversity": pa.array(div),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def tpch_q3_top_orders(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q3 analog (shipping-priority top orders): revenue of
    not-yet-shipped lineitems for BUILDING-segment customers' orders
    placed before the cutoff — top 10 by revenue.

    Physical plan: the classic broadcast-star shape.  The customer
    segment filter and date-filtered orders reduce in two small remote
    tasks to ONE broadcast map {orderkey -> orderdate} (dimension-sized:
    segment x date selectivity ~ 1/10 of orders); lineitem streams with a
    shipdate filter pushed into the parquet read, probes the broadcast,
    integerizes revenue per row (floor(ep*(1-disc)*100), the repo-wide
    oracle discipline) and pre-aggregates per orderkey per batch; a
    key%P exchange finishes the sums and each partition emits its local
    top-10, reduced in one 10*P-row tail.  Content never shuffles; no
    all-to-all join."""
    import pyarrow.dataset as pads

    cutoff = pa.scalar(
        np.datetime64("1998-01-01T00:00:00", "us"), type=pa.timestamp("us")
    )
    P = 32
    K = 10

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=pads.field("o_orderdate") < cutoff,
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    @ray.remote
    def build_state(cust_refs_n: int, *refs) -> tuple:
        # zero-row blocks can arrive column-less (empty datasets lose
        # their schema) — drop them before concat
        cust_parts = [t for t in refs[:cust_refs_n] if t.num_rows]
        ord_parts = [t for t in refs[cust_refs_n:] if t.num_rows]
        if not cust_parts or not ord_parts:
            return (
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype="datetime64[us]"),
            )
        cust_t = pa.concat_tables(cust_parts)
        ord_t = pa.concat_tables(ord_parts)
        seg = cust_t.filter(
            pc.equal(cust_t["c_mktsegment"], "BUILDING")
        )["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = ord_t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(ck, seg)
        ok = ord_t["o_orderkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )[keep]
        od = ord_t["o_orderdate"].to_numpy(zero_copy_only=False)[keep]
        order = np.argsort(ok)
        return ok[order], od[order]

    cust_refs = cust.to_arrow_refs()
    ord_refs = orders.to_arrow_refs()
    state_ref = build_state.remote(len(cust_refs), *cust_refs, *ord_refs)

    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pads.field("l_shipdate") > cutoff,
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "l_orderkey": pa.nulls(0, pa.int64()),
            "rev": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "l_orderkey" not in batch.column_names:
            return EMPTY
        keys, _dates = ray.get(state_ref)
        lk = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        if len(keys) == 0:
            return EMPTY
        pos = np.searchsorted(keys, lk)
        pos_c = np.minimum(pos, len(keys) - 1)
        hit = keys[pos_c] == lk
        if not np.any(hit):
            return EMPTY
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[hit]
        dc = batch["l_discount"].to_numpy(zero_copy_only=False)[hit]
        rev = np.floor(ep * (1.0 - dc) * 100.0).astype(np.int64)
        ok, inv = np.unique(lk[hit], return_inverse=True)
        sums = np.bincount(inv, weights=rev.astype(np.float64))
        # bincount weights go through float64 — exact for |sum| < 2^53,
        # true for any single batch (rev < 2^33, rows < 2^20)
        return pa.table(
            {
                "l_orderkey": pa.array(ok),
                "rev": pa.array(sums.astype(np.int64)),
                "part": pa.array(ok % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "l_orderkey": pa.nulls(0, pa.int64()),
                "revenue_cents": pa.nulls(0, pa.int64()),
                "o_orderdate": pa.nulls(0, pa.timestamp("us")),
            }
        )
        if group.num_rows == 0 or "l_orderkey" not in group.column_names:
            return empty
        ok = group["l_orderkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        rev = group["rev"].to_numpy(zero_copy_only=False).astype(np.int64)
        uk, inv = np.unique(ok, return_inverse=True)
        tot = np.zeros(uk.shape[0], dtype=np.int64)
        np.add.at(tot, inv, rev)
        # local top-K by (rev desc, orderkey asc)
        order = np.lexsort((uk, -tot))[:K]
        uk, tot = uk[order], tot[order]
        keys, dates = ray.get(state_ref)
        pos = np.searchsorted(keys, uk)
        return pa.table(
            {
                "l_orderkey": pa.array(uk),
                "revenue_cents": pa.array(tot),
                "o_orderdate": pa.array(dates[pos], type=pa.timestamp("us")),
            }
        )

    def final(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        rev = batch["revenue_cents"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        order = np.lexsort((ok, -rev))[:K]
        return batch.take(pa.array(np.sort(order)))

    return (
        line.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def term_postings(sf_dir: str) -> ray.data.Dataset:
    """Inverted-index construction (the search-engine build step): for
    every common term (document frequency >= 2% of the corpus), the
    sorted posting list of documents containing it, as a comma-joined
    string plus the exact df.

    Physical plan: per-batch DISTINCT (term, doc) pairs via dictionary
    codes (each doc contributes a term once no matter how often it
    repeats — the partial dedup bounds the exchange by distinct pairs,
    not token count); one crc32(term)%P exchange co-locates each term's
    postings; the kernel computes df vectorized for ALL terms, applies
    the threshold FIRST, and only the surviving (dimension-sized) rows
    pay the string-join.  Posting lists ship as strings because the
    driver's value-hash compares list columns unreliably across engines."""
    import zlib

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    n_docs = ds.count()
    P = 32

    EMPTY = pa.table(
        {
            "term": pa.nulls(0, pa.string()),
            "doc_id": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "text" not in batch.column_names:
            return EMPTY
        txt = pc.utf8_trim_whitespace(batch["text"])
        lists = pc.split_pattern(txt, pattern=" ")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        ok = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        if not ok.any():
            return EMPTY
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        V = np.int64(len(enc.dictionary))
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        key = d[parent[ok]] * V + codes[ok]
        uk = np.unique(key)  # distinct (doc, term) in this batch
        terms = enc.dictionary.take(pa.array(uk % V))
        h = np.array(
            [zlib.crc32(t.encode()) for t in terms.to_pylist()],
            dtype=np.int64,
        )
        return pa.table(
            {
                "term": terms,
                "doc_id": pa.array(uk // V),
                "part": pa.array(h % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "term": pa.nulls(0, pa.string()),
                "df": pa.nulls(0, pa.int64()),
                "postings": pa.nulls(0, pa.string()),
            }
        )
        if group.num_rows == 0 or "term" not in group.column_names:
            return empty
        enc = group["term"].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        d = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # distinct (term, doc) across source batches, doc ASC within term
        # — overflow-free: sort on the pair, drop consecutive duplicates
        order = np.lexsort((d, codes))
        codes_s, d_s = codes[order], d[order]
        first = np.concatenate(
            ([True], (codes_s[1:] != codes_s[:-1]) | (d_s[1:] != d_s[:-1]))
        )
        codes_u, d_u = codes_s[first], d_s[first]
        starts = np.flatnonzero(
            np.concatenate(([True], codes_u[1:] != codes_u[:-1]))
        )
        df = np.diff(np.append(starts, codes_u.shape[0]))
        keep = df * 50 >= n_docs
        if not keep.any():
            return empty
        terms_py = enc.dictionary.take(
            pa.array(codes_u[starts[keep]])
        ).to_pylist()
        ends = np.append(starts, codes_u.shape[0])[1:]
        posts = [
            ",".join(map(str, d_u[s:e].tolist()))
            for s, e, k in zip(starts, ends, keep)
            if k
        ]
        return pa.table(
            {
                "term": pa.array(terms_py, type=pa.string()),
                "df": pa.array(df[keep].astype(np.int64)),
                "postings": pa.array(posts, type=pa.string()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def tpch_q13_custdist(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q13 analog (customer order-count distribution): how many
    customers placed exactly k orders, INCLUDING the zero-order
    customers a plain inner join would drop.

    Physical plan: both sides reduce to skinny int64 rows before the
    exchange — orders pre-aggregate (custkey, n) per batch (the combiner
    bounds exchange volume by distinct custkeys per batch, not order
    rows), customers ship (custkey, 0) tagged as the universe side; ONE
    custkey%P exchange co-locates each customer's partials; the kernel
    sums order counts per customer (left-join semantics fall out of the
    universe side) and emits its LOCAL histogram (c_count, n_customers)
    — so the tail reduce sees <= P x distinct-counts rows, never a
    customer-dimension table."""
    P = 32

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "ck": pa.nulls(0, pa.int64()),
            "n": pa.nulls(0, pa.int64()),
            "is_cust": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def tag_cust(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "c_custkey" not in batch.column_names:
            return EMPTY
        ck = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        z = np.zeros(ck.shape[0], dtype=np.int64)
        return pa.table(
            {
                "ck": pa.array(ck),
                "n": pa.array(z),
                "is_cust": pa.array(z + 1),
                "part": pa.array(ck % P),
            }
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "o_custkey" not in batch.column_names:
            return EMPTY
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        uk, cnt = np.unique(ck, return_counts=True)
        return pa.table(
            {
                "ck": pa.array(uk),
                "n": pa.array(cnt.astype(np.int64)),
                "is_cust": pa.array(np.zeros(uk.shape[0], dtype=np.int64)),
                "part": pa.array(uk % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "c_count": pa.nulls(0, pa.int64()),
                "custdist": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "ck" not in group.column_names:
            return empty
        ck = group["ck"].to_numpy(zero_copy_only=False)
        n = group["n"].to_numpy(zero_copy_only=False)
        isc = group["is_cust"].to_numpy(zero_copy_only=False)
        uk = np.unique(ck[isc == 1])
        if uk.shape[0] == 0:
            return empty
        # per-customer order totals; orders for custkeys outside the
        # universe (none in well-formed data) are dropped by the clip+eq
        pos = np.searchsorted(uk, ck)
        pos_c = np.minimum(pos, uk.shape[0] - 1)
        hit = (uk[pos_c] == ck) & (isc == 0)
        tot = np.zeros(uk.shape[0], dtype=np.int64)
        np.add.at(tot, pos_c[hit], n[hit])
        cc, nc = np.unique(tot, return_counts=True)
        return pa.table(
            {
                "c_count": pa.array(cc.astype(np.int64)),
                "custdist": pa.array(nc.astype(np.int64)),
            }
        )

    def final(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        cc = batch["c_count"].to_numpy(zero_copy_only=False)
        nc = batch["custdist"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(cc, return_inverse=True)
        tot = np.zeros(uk.shape[0], dtype=np.int64)
        np.add.at(tot, inv, nc)
        order = np.lexsort((-uk, -tot))
        return pa.table(
            {
                "c_count": pa.array(uk[order]),
                "custdist": pa.array(tot[order]),
            }
        )

    return (
        cust.map_batches(tag_cust, batch_format="pyarrow")
        .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def tpch_q4_late_shipments(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q4 analog (order-priority checking): orders placed in 1996
    with at least ONE lineitem shipped more than 45 days after the order
    date, counted per priority.  The reference predicate uses
    commit/receipt dates the synthetic lineitem lacks; shipdate vs
    orderdate+45d keeps the EXISTS semi-join shape.

    Physical plan: lineitem pre-reduces to (orderkey, max_shipdate) per
    batch — the EXISTS only needs the max, so the combiner collapses ~4
    lineitems per order before the exchange; date-filtered orders ship
    (orderkey, orderdate, priority) with the filter pushed into the
    parquet read.  ONE orderkey%P exchange; the kernel joins, tests
    max_ship > odate+45d, and emits LOCAL per-priority counts, so the
    tail reduce is <= P x 5 rows.  No broadcast state: both exchange
    sides are order-dimension skinny rows."""
    import pyarrow.dataset as pads

    P = 32
    LATE_US = np.int64(45) * 86_400_000_000
    lo = pa.scalar(
        np.datetime64("1996-01-01T00:00:00", "us"), type=pa.timestamp("us")
    )
    hi = pa.scalar(
        np.datetime64("1997-01-01T00:00:00", "us"), type=pa.timestamp("us")
    )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=(pads.field("o_orderdate") >= lo)
        & (pads.field("o_orderdate") < hi),
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "ok": pa.nulls(0, pa.int64()),
            "ts": pa.nulls(0, pa.int64()),
            "prio": pa.nulls(0, pa.string()),
            "side": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def _us(col) -> np.ndarray:
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        return np.asarray(
            arr.cast(pa.int64()).to_numpy(zero_copy_only=False), dtype=np.int64
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "o_orderkey" not in batch.column_names:
            return EMPTY
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "ok": pa.array(ok),
                "ts": pa.array(_us(batch["o_orderdate"])),
                "prio": batch["o_orderpriority"],
                "side": pa.array(np.ones(ok.shape[0], dtype=np.int64)),
                "part": pa.array(ok % P),
            }
        )

    def tag_line(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "l_orderkey" not in batch.column_names:
            return EMPTY
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _us(batch["l_shipdate"])
        uk, inv = np.unique(ok, return_inverse=True)
        mx = np.full(uk.shape[0], np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(mx, inv, ts)
        return pa.table(
            {
                "ok": pa.array(uk),
                "ts": pa.array(mx),
                "prio": pa.array([""] * uk.shape[0], type=pa.string()),
                "side": pa.array(np.zeros(uk.shape[0], dtype=np.int64)),
                "part": pa.array(uk % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "o_orderpriority": pa.nulls(0, pa.string()),
                "n_orders": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "ok" not in group.column_names:
            return empty
        ok = group["ok"].to_numpy(zero_copy_only=False)
        ts = group["ts"].to_numpy(zero_copy_only=False)
        side = group["side"].to_numpy(zero_copy_only=False)
        iso = side == 1
        if not iso.any():
            return empty
        lk, lt = ok[~iso], ts[~iso]
        if lk.shape[0] == 0:
            return empty
        # max shipdate per lineitem orderkey (merge the batch partials)
        uk = np.unique(lk)
        pos = np.searchsorted(uk, lk)
        mx = np.full(uk.shape[0], np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(mx, pos, lt)
        ook, ots = ok[iso], ts[iso]
        p = np.searchsorted(uk, ook)
        p_c = np.minimum(p, uk.shape[0] - 1)
        late = (uk[p_c] == ook) & (mx[p_c] > ots + LATE_US)
        if not late.any():
            return empty
        prio = group["prio"].combine_chunks().take(
            pa.array(np.flatnonzero(iso)[late])
        )
        enc = prio.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(codes, minlength=len(enc.dictionary))
        return pa.table(
            {
                "o_orderpriority": enc.dictionary,
                "n_orders": pa.array(cnt.astype(np.int64)),
            }
        )

    def final(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        enc = batch["o_orderpriority"].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch["n_orders"].to_numpy(zero_copy_only=False)
        tot = np.zeros(len(enc.dictionary), dtype=np.int64)
        np.add.at(tot, codes, n)
        d = enc.dictionary.to_pandas().to_numpy()
        order = np.argsort(d, kind="stable")
        return pa.table(
            {
                "o_orderpriority": enc.dictionary.take(pa.array(order)),
                "n_orders": pa.array(tot[order]),
            }
        )

    return (
        orders.map_batches(tag_orders, batch_format="pyarrow")
        .union(line.map_batches(tag_line, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def user_longest_streak(sf_dir: str) -> ray.data.Dataset:
    """Gaps-and-islands: each user's longest run of CONSECUTIVE active
    days (distinct calendar days with at least one event).  The classic
    retention metric the SQL row_number()-difference trick computes.

    Physical plan: per-batch distinct (user, epoch-day) pairs (the
    combiner bounds exchange volume by active user-days, not events);
    ONE user%P exchange; the kernel re-dedups across batches, finds run
    boundaries where the day delta != 1 vectorized, and takes each
    user's max run via maximum.reduceat — zero Python per row."""
    P = 32
    DAY_US = np.int64(86_400_000_000)

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "user_id": pa.nulls(0, pa.int64()),
            "d": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "user_id" not in batch.column_names:
            return EMPTY
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        ) if isinstance(batch["ts"], pa.ChunkedArray) else batch["ts"].cast(
            pa.int64()
        ).to_numpy(zero_copy_only=False)
        d = np.asarray(ts, dtype=np.int64) // DAY_US
        # distinct (user, day) per batch — days span decades at most,
        # so u*2^22 + day-within-window would overflow nothing, but
        # sort-pairs dedup avoids any composite-key range assumption
        order = np.lexsort((d, u))
        u_s, d_s = u[order], d[order]
        keep = np.concatenate(
            ([True], (u_s[1:] != u_s[:-1]) | (d_s[1:] != d_s[:-1]))
        )
        u_s, d_s = u_s[keep], d_s[keep]
        return pa.table(
            {
                "user_id": pa.array(u_s),
                "d": pa.array(d_s),
                "part": pa.array(u_s % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.nulls(0, pa.int64()),
                "longest_streak": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "user_id" not in group.column_names:
            return empty
        u = group["user_id"].to_numpy(zero_copy_only=False)
        d = group["d"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, u))
        u_s, d_s = u[order], d[order]
        keep = np.concatenate(
            ([True], (u_s[1:] != u_s[:-1]) | (d_s[1:] != d_s[:-1]))
        )
        u_s, d_s = u_s[keep], d_s[keep]
        # run starts: new user OR day gap != 1
        rs = np.concatenate(
            ([True], (u_s[1:] != u_s[:-1]) | (d_s[1:] - d_s[:-1] != 1))
        )
        starts = np.flatnonzero(rs)
        run_len = np.diff(np.append(starts, u_s.shape[0]))
        run_user = u_s[starts]
        ustarts = np.flatnonzero(
            np.concatenate(([True], run_user[1:] != run_user[:-1]))
        )
        longest = np.maximum.reduceat(run_len, ustarts)
        return pa.table(
            {
                "user_id": pa.array(run_user[ustarts]),
                "longest_streak": pa.array(longest.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def user_interevent_median(sf_dir: str) -> ray.data.Dataset:
    """Per-user EXACT interpolated median of inter-event gaps (µs):
    the cadence metric behind bot/burst detection.  Users with a single
    event have no gap and are excluded (SQL NULL-skip of lag()).

    Physical plan: ONE user%P exchange of (user, ts, event_id) int64
    rows; users are co-partitioned so each partition computes its own
    users' gaps start-to-finish: lexsort by (user, ts, event_id) — the
    event_id tie-break pins equal timestamps to ONE order on both
    engines — vectorized diff, then the (lo+hi)/2 interpolated median
    per user via reduceat indexing.  Gap values are int64 µs < 2^52, so
    the float64 midpoint is IEEE-exact and matches DuckDB's
    percentile_cont(0.5) = v_lo + 0.5*(v_hi - v_lo) bit-for-bit."""
    P = 32

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "user_id": pa.nulls(0, pa.int64()),
            "ts": pa.nulls(0, pa.int64()),
            "event_id": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "user_id" not in batch.column_names:
            return EMPTY
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        ) if isinstance(batch["ts"], pa.ChunkedArray) else batch["ts"].cast(
            pa.int64()
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": pa.array(u),
                "ts": pa.array(np.asarray(ts, dtype=np.int64)),
                "event_id": pa.array(
                    batch["event_id"].to_numpy(zero_copy_only=False).astype(
                        np.int64
                    )
                ),
                "part": pa.array(u % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.nulls(0, pa.int64()),
                "n_gaps": pa.nulls(0, pa.int64()),
                "median_gap_us": pa.nulls(0, pa.float64()),
            }
        )
        if group.num_rows == 0 or "user_id" not in group.column_names:
            return empty
        u = group["user_id"].to_numpy(zero_copy_only=False)
        ts = group["ts"].to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u_s, ts_s = u[order], ts[order]
        same = u_s[1:] == u_s[:-1]
        if not same.any():
            return empty
        gu = u_s[1:][same]
        gv = ts_s[1:][same] - ts_s[:-1][same]
        o2 = np.lexsort((gv, gu))
        gu, gv = gu[o2], gv[o2]
        starts = np.flatnonzero(
            np.concatenate(([True], gu[1:] != gu[:-1]))
        )
        n = np.diff(np.append(starts, gu.shape[0]))
        lo = starts + (n - 1) // 2
        hi = starts + n // 2
        med = (gv[lo].astype(np.float64) + gv[hi].astype(np.float64)) / 2.0
        return pa.table(
            {
                "user_id": pa.array(gu[starts]),
                "n_gaps": pa.array(n.astype(np.int64)),
                "median_gap_us": pa.array(med),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def event_value_deciles(sf_dir: str) -> ray.data.Dataset:
    """Global EXACT decile table: 9 interpolated decile boundaries over
    integer cents, then per-bucket row count and cent sum — the
    histogram-with-exact-edges profile a feature store publishes.

    Physical plan: the 9 boundaries come from FOUR shared radix scans
    (functions/quantile.grouped_exact_quantiles_cont with a constant
    group key — all 9 (rank) targets refine in the same pass, constant
    exchange volume, no sort); the bucket pass broadcasts the 9 float64
    thresholds in a closure, buckets every row with ONE searchsorted
    (bucket = #thresholds strictly below v, DuckDB's
    list_filter(x < v) count), and pre-aggregates per batch so the tail
    reduce sees <= batches x 10 skinny rows."""
    from libpostal_ray.functions.quantile import grouped_exact_quantiles_cont

    QS = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]

    def _cents_ds():
        def to_cents(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or "value" not in batch.column_names:
                return pa.table(
                    {
                        "k": pa.nulls(0, pa.int64()),
                        "v": pa.nulls(0, pa.float64()),
                    }
                )
            v = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
            vc = np.floor(v * 100.0)
            return pa.table(
                {
                    "k": pa.array(np.zeros(v.shape[0], dtype=np.int64)),
                    "v": pa.array(vc),
                }
            )

        return ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["value"]
        ).map_batches(
            _strip_meta, batch_format="pyarrow", zero_copy_batch=True
        ).map_batches(to_cents, batch_format="pyarrow")

    EMPTY_OUT = pa.table(
        {
            "decile": pa.nulls(0, pa.int64()),
            "n_events": pa.nulls(0, pa.int64()),
            "sum_cents": pa.nulls(0, pa.int64()),
        }
    )

    qt = grouped_exact_quantiles_cont(_cents_ds(), "k", "v", QS)
    if qt.num_rows == 0:
        return ray.data.from_arrow(EMPTY_OUT)
    qv = {float(q): v for q, v in zip(qt["q"].to_pylist(), qt["q_value"].to_pylist())}
    thr = np.asarray([qv[q] for q in QS], dtype=np.float64)

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "decile": pa.nulls(0, pa.int64()),
                "n_events": pa.nulls(0, pa.int64()),
                "sum_cents": pa.nulls(0, pa.int64()),
                "g": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "value" not in batch.column_names:
            return empty
        v = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        vc = np.floor(v * 100.0)
        b = np.searchsorted(thr, vc, side="left").astype(np.int64)
        n = np.bincount(b, minlength=10)
        s = np.bincount(b, weights=vc, minlength=10).astype(np.int64)
        nz = np.flatnonzero(n)
        return pa.table(
            {
                "decile": pa.array(nz.astype(np.int64)),
                "n_events": pa.array(n[nz].astype(np.int64)),
                "sum_cents": pa.array(s[nz]),
                "g": pa.array(np.zeros(nz.shape[0], dtype=np.int64)),
            }
        )

    def final(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "decile" not in batch.column_names:
            return EMPTY_OUT
        d = batch["decile"].to_numpy(zero_copy_only=False)
        n = batch["n_events"].to_numpy(zero_copy_only=False)
        s = batch["sum_cents"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(d, return_inverse=True)
        tn = np.zeros(uk.shape[0], dtype=np.int64)
        tsum = np.zeros(uk.shape[0], dtype=np.int64)
        np.add.at(tn, inv, n)
        np.add.at(tsum, inv, s)
        return pa.table(
            {
                "decile": pa.array(uk.astype(np.int64)),
                "n_events": pa.array(tn),
                "sum_cents": pa.array(tsum),
            }
        )

    return (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
        .map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .map_groups(
            lambda t: final(t.drop_columns(["g"]))
            if "g" in t.column_names
            else final(t),
            batch_format="pyarrow",
        )
    )


def segment_acctbal_gini(sf_dir: str) -> ray.data.Dataset:
    """EXACT Gini concentration index of customer account balances per
    market segment, as integer numerator/denominator plus their one
    deterministic float64 division — the inequality profile a revenue
    dashboard publishes, computed so both engines compare exact ints.

    Gini (rank formula) = (2*sum(rank_i * x_i) - (n+1)*sum(x_i))
                          / (n * sum(x_i))
    over cents ascending with 1-based ranks.  Tied values make rank
    assignment ambiguous BUT the numerator is tie-invariant: within a
    tied block x is constant, so sum(rank*x) = x * (fixed sum of ranks)
    regardless of order — no tie-break column is needed.

    Physical plan: ONE segment%P exchange of (segment, cents) int64
    rows; the kernel sorts each segment's cents and computes both sums
    vectorized.  Segments are dimension-cardinality; int64 holds
    n*sum(|x|) up to ~1e9 customers x $10k balances (documented
    bound)."""
    P = 32

    ds = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_mktsegment", "c_acctbal"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "seg": pa.nulls(0, pa.string()),
            "b": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "c_mktsegment" not in batch.column_names:
            return EMPTY
        import zlib

        seg = batch["c_mktsegment"]
        v = batch["c_acctbal"].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.floor(v * 100.0).astype(np.int64)
        enc = (
            seg.combine_chunks() if isinstance(seg, pa.ChunkedArray) else seg
        ).dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        h = np.array(
            [zlib.crc32(s.encode()) for s in enc.dictionary.to_pylist()],
            dtype=np.int64,
        )
        return pa.table(
            {
                "seg": seg,
                "b": pa.array(b),
                "part": pa.array(h[codes] % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "c_mktsegment": pa.nulls(0, pa.string()),
                "n_customers": pa.nulls(0, pa.int64()),
                "gini_num": pa.nulls(0, pa.int64()),
                "gini_den": pa.nulls(0, pa.int64()),
                "gini": pa.nulls(0, pa.float64()),
            }
        )
        if group.num_rows == 0 or "seg" not in group.column_names:
            return empty
        enc = group["seg"].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        b = group["b"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, codes))
        c_s, b_s = codes[order], b[order]
        starts = np.flatnonzero(
            np.concatenate(([True], c_s[1:] != c_s[:-1]))
        )
        n = np.diff(np.append(starts, c_s.shape[0]))
        # 1-based rank within each segment
        rk = np.arange(c_s.shape[0], dtype=np.int64) + 1
        rk -= np.repeat(starts.astype(np.int64), n)
        s_x = np.add.reduceat(b_s, starts)
        s_rx = np.add.reduceat(rk * b_s, starts)
        num = 2 * s_rx - (n + 1) * s_x
        den = n * s_x
        gini = np.divide(
            num.astype(np.float64),
            den.astype(np.float64),
            out=np.zeros(num.shape[0], dtype=np.float64),
            where=den != 0,
        )
        return pa.table(
            {
                "c_mktsegment": enc.dictionary.take(pa.array(c_s[starts])),
                "n_customers": pa.array(n.astype(np.int64)),
                "gini_num": pa.array(num.astype(np.int64)),
                "gini_den": pa.array(den.astype(np.int64)),
                "gini": pa.array(gini),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def customer_rfm(sf_dir: str) -> ray.data.Dataset:
    """RFM segmentation (recency / frequency / monetary quartile scores
    1-4 per ordering customer) — the classic marketing rollup, with
    EXACT quartile edges so both engines bucket identically.

    Physical plan: orders pre-aggregate per batch (custkey -> max
    orderdate, order count, cent sum) and ONE custkey%P exchange
    finishes the per-customer metrics (customer-dimension, materialized
    once); the three metrics stack into (metric-name, value) rows so
    ALL NINE quartile edges (3 metrics x 3 q's) come from the SAME four
    shared radix scans (functions/quantile.py); scoring broadcasts the
    9 float64 edges in a closure — score = 1 + #edges strictly below
    the value, DuckDB's list_filter(x < v) count.  Recency compares as
    epoch-µs int64 (< 2^52, float64-exact)."""
    from libpostal_ray.functions.quantile import grouped_exact_quantiles_cont

    P = 32
    QS = [0.25, 0.5, 0.75]

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "ck": pa.nulls(0, pa.int64()),
            "r": pa.nulls(0, pa.int64()),
            "f": pa.nulls(0, pa.int64()),
            "m": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "o_custkey" not in batch.column_names:
            return EMPTY
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch["o_orderdate"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        ) if isinstance(batch["o_orderdate"], pa.ChunkedArray) else batch[
            "o_orderdate"
        ].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ts = np.asarray(ts, dtype=np.int64)
        tp = batch["o_totalprice"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        cents = np.floor(tp * 100.0).astype(np.int64)
        uk, inv = np.unique(ck, return_inverse=True)
        r = np.full(uk.shape[0], np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(r, inv, ts)
        f = np.bincount(inv).astype(np.int64)
        m = np.bincount(inv, weights=cents.astype(np.float64)).astype(np.int64)
        return pa.table(
            {
                "ck": pa.array(uk),
                "r": pa.array(r),
                "f": pa.array(f),
                "m": pa.array(m),
                "part": pa.array(uk % P),
            }
        )

    def merge(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "ck": pa.nulls(0, pa.int64()),
                "r": pa.nulls(0, pa.int64()),
                "f": pa.nulls(0, pa.int64()),
                "m": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "ck" not in group.column_names:
            return empty
        ck = group["ck"].to_numpy(zero_copy_only=False)
        r = group["r"].to_numpy(zero_copy_only=False)
        f = group["f"].to_numpy(zero_copy_only=False)
        m = group["m"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(ck, return_inverse=True)
        rr = np.full(uk.shape[0], np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(rr, inv, r)
        ff = np.zeros(uk.shape[0], dtype=np.int64)
        np.add.at(ff, inv, f)
        mm = np.zeros(uk.shape[0], dtype=np.int64)
        np.add.at(mm, inv, m)
        return pa.table(
            {
                "ck": pa.array(uk),
                "r": pa.array(rr),
                "f": pa.array(ff),
                "m": pa.array(mm),
            }
        )

    metrics = (
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge, batch_format="pyarrow")
        .materialize()  # customer-dimension, read twice below
    )

    def stack(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "ck" not in batch.column_names:
            return pa.table(
                {"k": pa.nulls(0, pa.string()), "v": pa.nulls(0, pa.float64())}
            )
        cols = []
        for name in ("r", "f", "m"):
            v = batch[name].to_numpy(zero_copy_only=False).astype(np.float64)
            cols.append(
                pa.table(
                    {
                        "k": pa.array([name] * v.shape[0], type=pa.string()),
                        "v": pa.array(v),
                    }
                )
            )
        return pa.concat_tables(cols)

    qt = grouped_exact_quantiles_cont(
        metrics.map_batches(stack, batch_format="pyarrow"), "k", "v", QS
    )
    EMPTY_OUT = pa.table(
        {
            "c_custkey": pa.nulls(0, pa.int64()),
            "r_score": pa.nulls(0, pa.int64()),
            "f_score": pa.nulls(0, pa.int64()),
            "m_score": pa.nulls(0, pa.int64()),
        }
    )
    if qt.num_rows == 0:
        return ray.data.from_arrow(EMPTY_OUT)
    edges = {}
    for k, q_, v in zip(
        qt["k"].to_pylist(), qt["q"].to_pylist(), qt["q_value"].to_pylist()
    ):
        edges.setdefault(k, {})[q_] = v
    thr = {
        k: np.asarray([edges[k][q_] for q_ in QS], dtype=np.float64)
        for k in ("r", "f", "m")
    }

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "ck" not in batch.column_names:
            return EMPTY_OUT
        out = {"c_custkey": batch["ck"]}
        for name, col in (("r_score", "r"), ("f_score", "f"), ("m_score", "m")):
            v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
            out[name] = pa.array(
                1 + np.searchsorted(thr[col], v, side="left").astype(np.int64)
            )
        return pa.table(out)

    return metrics.map_batches(score, batch_format="pyarrow")


def event_nearest_order(sf_dir: str) -> ray.data.Dataset:
    """NEAREST-in-time join (both directions): each event pairs with the
    user's closest order by |event_ts - order_ts|, ties to the EARLIER
    order — the attribution shape when intent can precede or follow the
    purchase (asof joins only look backward).

    Physical plan: ONE user%P exchange of skinny int64 rows from both
    sides (orders pre-dedup (custkey, date) per batch keeping the max
    orderkey, the event_order_asof discipline); the kernel
    rank-compresses (key, ts) into one composite int64 per row, finds
    each event's predecessor/successor order with TWO searchsorted
    calls, and resolves direction vectorized.  Per-partition cost is
    O((e+o) log(e+o)); nothing materializes beyond the partition."""
    P = 32

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "k": pa.nulls(0, pa.int64()),
            "ts": pa.nulls(0, pa.int64()),
            "rid": pa.nulls(0, pa.int64()),
            "side": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def _us(col) -> np.ndarray:
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        return np.asarray(
            arr.cast(pa.int64()).to_numpy(zero_copy_only=False), dtype=np.int64
        )

    def tag_events(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "user_id" not in batch.column_names:
            return EMPTY
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "k": pa.array(u),
                "ts": pa.array(_us(batch["ts"])),
                "rid": pa.array(
                    batch["event_id"].to_numpy(zero_copy_only=False).astype(
                        np.int64
                    )
                ),
                "side": pa.array(np.zeros(u.shape[0], dtype=np.int64)),
                "part": pa.array(u % P),
            }
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "o_custkey" not in batch.column_names:
            return EMPTY
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _us(batch["o_orderdate"])
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        # dedup (custkey, date) keeping max orderkey (stable contract
        # when several orders share a date)
        order = np.lexsort((ok, ts, ck))
        ck, ts, ok = ck[order], ts[order], ok[order]
        last = np.concatenate(
            ((ck[1:] != ck[:-1]) | (ts[1:] != ts[:-1]), [True])
        )
        ck, ts, ok = ck[last], ts[last], ok[last]
        return pa.table(
            {
                "k": pa.array(ck),
                "ts": pa.array(ts),
                "rid": pa.array(ok),
                "side": pa.array(np.ones(ck.shape[0], dtype=np.int64)),
                "part": pa.array(ck % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.nulls(0, pa.int64()),
                "user_id": pa.nulls(0, pa.int64()),
                "o_orderkey": pa.nulls(0, pa.int64()),
                "gap_us": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "k" not in group.column_names:
            return empty
        k = group["k"].to_numpy(zero_copy_only=False)
        ts = group["ts"].to_numpy(zero_copy_only=False)
        rid = group["rid"].to_numpy(zero_copy_only=False)
        side = group["side"].to_numpy(zero_copy_only=False)
        iso = side == 1
        ok_k, ok_ts, ok_id = k[iso], ts[iso], rid[iso]
        ev_k, ev_ts, ev_id = k[~iso], ts[~iso], rid[~iso]
        if ok_k.shape[0] == 0 or ev_k.shape[0] == 0:
            return empty
        # cross-batch (custkey, date) dedup keeping max orderkey
        o = np.lexsort((ok_id, ok_ts, ok_k))
        ok_k, ok_ts, ok_id = ok_k[o], ok_ts[o], ok_id[o]
        last = np.concatenate(
            ((ok_k[1:] != ok_k[:-1]) | (ok_ts[1:] != ok_ts[:-1]), [True])
        )
        ok_k, ok_ts, ok_id = ok_k[last], ok_ts[last], ok_id[last]
        # composite rank encoding over the union of timestamps
        ut = np.unique(np.concatenate((ok_ts, ev_ts)))
        span = np.int64(ut.shape[0] + 1)
        uk = np.unique(np.concatenate((ok_k, ev_k)))
        o_enc = (
            np.searchsorted(uk, ok_k).astype(np.int64) * span
            + np.searchsorted(ut, ok_ts).astype(np.int64)
        )
        e_enc = (
            np.searchsorted(uk, ev_k).astype(np.int64) * span
            + np.searchsorted(ut, ev_ts).astype(np.int64)
        )
        # first order strictly after (key, event_ts) — equal ts counts
        # as predecessor (gap 0)
        pos = np.searchsorted(o_enc, e_enc, side="right")
        pred = pos - 1
        pred_ok = (pred >= 0) & (
            ok_k[np.maximum(pred, 0)] == ev_k
        )
        succ = np.minimum(pos, ok_k.shape[0] - 1)
        succ_ok = (pos < ok_k.shape[0]) & (ok_k[succ] == ev_k)
        keep = pred_ok | succ_ok
        if not keep.any():
            return empty
        pred_gap = np.where(
            pred_ok, ev_ts - ok_ts[np.maximum(pred, 0)], np.iinfo(np.int64).max
        )
        succ_gap = np.where(
            succ_ok, ok_ts[succ] - ev_ts, np.iinfo(np.int64).max
        )
        # tie -> predecessor (the earlier order date)
        take_pred = pred_gap <= succ_gap
        best = np.where(take_pred, np.maximum(pred, 0), succ)
        gap = np.where(take_pred, pred_gap, succ_gap)
        return pa.table(
            {
                "event_id": pa.array(ev_id[keep]),
                "user_id": pa.array(ev_k[keep]),
                "o_orderkey": pa.array(ok_id[best[keep]]),
                "gap_us": pa.array(gap[keep]),
            }
        )

    return (
        events.map_batches(tag_events, batch_format="pyarrow")
        .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def documents_profile_drift(sf_dir: str) -> ray.data.Dataset:
    """Schema/statistics DRIFT monitor: profile the documents table and a
    deterministically derived NEW snapshot (same CDC convention as
    documents_snapshot_diff: %17 deleted, %13 text-edited, %19
    re-inserted at +10M) and report per-column stat deltas — the data
    quality gate a warehouse runs between loads.

    Physical plan: two column_profile passes (partition-the-VALUE exact
    COUNT DISTINCT, 16 B/distinct exchange — pipelines/profile.py); the
    join happens on the DRIVER because each profile is exactly one row
    per column (dimension-sized by construction)."""
    from libpostal_ray.pipelines.profile import column_profile

    cols = ["text", "lang", "source"]

    def base():
        return ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id"] + cols
        )

    def derive_new(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return batch
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        kept = batch.filter(pa.array(ids % 17 != 0))
        kids = kept["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ktext = (
            kept["text"].combine_chunks()
            if kept.num_rows
            else pa.array([], type=pa.string())
        )
        edited = pc.if_else(
            pa.array(kids % 13 == 0),
            pc.binary_join_element_wise(
                ktext,
                pa.scalar(" v2", type=ktext.type),
                pa.scalar("", type=ktext.type),
            ),
            ktext,
        )
        kept = kept.set_column(
            kept.column_names.index("text"), "text", edited
        )
        re_ins = batch.filter(pa.array(ids % 19 == 0))
        return pa.concat_tables([kept, re_ins]) if re_ins.num_rows else kept

    prof_base = column_profile(base(), cols).to_pandas()
    prof_new = column_profile(
        base().map_batches(derive_new, batch_format="pyarrow"), cols
    ).to_pandas()

    out_cols = {
        "column": pa.nulls(0, pa.string()),
        "n_rows_base": pa.nulls(0, pa.int64()),
        "n_rows_new": pa.nulls(0, pa.int64()),
        "rows_delta": pa.nulls(0, pa.int64()),
        "distinct_base": pa.nulls(0, pa.int64()),
        "distinct_new": pa.nulls(0, pa.int64()),
        "distinct_delta": pa.nulls(0, pa.int64()),
        "sum_len_base": pa.nulls(0, pa.int64()),
        "sum_len_new": pa.nulls(0, pa.int64()),
        "len_delta": pa.nulls(0, pa.int64()),
    }
    if len(prof_base) == 0 or prof_base["n_rows"].sum() == 0:
        return ray.data.from_arrow(pa.table(out_cols))
    b = prof_base.set_index("column")
    n = prof_new.set_index("column")
    rows = []
    for c in cols:
        rows.append(
            {
                "column": c,
                "n_rows_base": int(b.loc[c, "n_rows"]),
                "n_rows_new": int(n.loc[c, "n_rows"]),
                "rows_delta": int(n.loc[c, "n_rows"] - b.loc[c, "n_rows"]),
                "distinct_base": int(b.loc[c, "n_distinct"]),
                "distinct_new": int(n.loc[c, "n_distinct"]),
                "distinct_delta": int(
                    n.loc[c, "n_distinct"] - b.loc[c, "n_distinct"]
                ),
                "sum_len_base": int(b.loc[c, "sum_len"]),
                "sum_len_new": int(n.loc[c, "sum_len"]),
                "len_delta": int(n.loc[c, "sum_len"] - b.loc[c, "sum_len"]),
            }
        )
    return ray.data.from_pandas(pd.DataFrame(rows))


def user_out_of_order_events(sf_dir: str) -> ray.data.Dataset:
    """Out-of-order arrival accounting per user (the streaming-health
    metric behind watermark tuning): an event is LATE when its ts is
    below the running max ts of earlier-arriving events (arrival order
    = event_id).  Emits per-user totals and the worst lateness.

    Physical plan: ONE user%P exchange; the kernel sorts by (user,
    event_id) and computes the per-SEGMENT exclusive prefix max without
    any Python per group: rank-compress ts, encode seg*(R+1)+rank —
    segments are strictly increasing blocks, so a cross-segment
    maximum can never leak into the next segment's cummax — then one
    np.maximum.accumulate and a shift.  Encoding bound: segments x
    distinct-ts per partition < 2^63 (10^9 x 10^9 headroom)."""
    P = 32

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "user_id": pa.nulls(0, pa.int64()),
            "ts": pa.nulls(0, pa.int64()),
            "event_id": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "user_id" not in batch.column_names:
            return EMPTY
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        ) if isinstance(batch["ts"], pa.ChunkedArray) else batch["ts"].cast(
            pa.int64()
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": pa.array(u),
                "ts": pa.array(np.asarray(ts, dtype=np.int64)),
                "event_id": pa.array(
                    batch["event_id"].to_numpy(zero_copy_only=False).astype(
                        np.int64
                    )
                ),
                "part": pa.array(u % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.nulls(0, pa.int64()),
                "n_events": pa.nulls(0, pa.int64()),
                "n_out_of_order": pa.nulls(0, pa.int64()),
                "max_lateness_us": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "user_id" not in group.column_names:
            return empty
        u = group["user_id"].to_numpy(zero_copy_only=False)
        ts = group["ts"].to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, u))
        u_s, ts_s = u[order], ts[order]
        starts = np.flatnonzero(
            np.concatenate(([True], u_s[1:] != u_s[:-1]))
        )
        n = np.diff(np.append(starts, u_s.shape[0]))
        seg = np.repeat(np.arange(starts.shape[0], dtype=np.int64), n)
        ut = np.unique(ts_s)
        R = np.int64(ut.shape[0] + 1)
        enc = seg * R + np.searchsorted(ut, ts_s).astype(np.int64)
        cm = np.maximum.accumulate(enc)
        # exclusive prefix max: shift right; segment-first rows have none
        prev = np.empty_like(cm)
        prev[1:] = cm[:-1]
        prev[starts] = -1
        valid = prev >= seg * R  # same segment (first rows excluded)
        mx_ts = ut[np.maximum(prev - seg * R, 0)]
        late = valid & (ts_s < mx_ts)
        lateness = np.where(late, mx_ts - ts_s, 0)
        n_late = np.zeros(starts.shape[0], dtype=np.int64)
        np.add.at(n_late, seg, late.astype(np.int64))
        worst = np.maximum.reduceat(lateness, starts)
        return pa.table(
            {
                "user_id": pa.array(u_s[starts]),
                "n_events": pa.array(n.astype(np.int64)),
                "n_out_of_order": pa.array(n_late),
                "max_lateness_us": pa.array(worst.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def events_daily_autocorr(sf_dir: str) -> ray.data.Dataset:
    """Lag-1 autocorrelation of the DAILY event-count series (seasonality
    probe): Pearson r over consecutive-day count pairs (both days
    present), emitted as the SIX exact int64 moments plus their one
    deterministic float64 evaluation — the gini/trend discipline, so
    both engines agree bit-for-bit.

    Physical plan: per-batch (epoch-day, count) partials bound the
    exchange by active days per batch, one day%1 reduce (the day series
    is dimension-sized by construction: 10^5 days = 300 years), pairs
    and moments on the tiny merged series."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    DAY_US = np.int64(86_400_000_000)

    EMPTY_OUT = pa.table(
        {
            "n_pairs": pa.nulls(0, pa.int64()),
            "sum_x": pa.nulls(0, pa.int64()),
            "sum_y": pa.nulls(0, pa.int64()),
            "sum_xx": pa.nulls(0, pa.int64()),
            "sum_yy": pa.nulls(0, pa.int64()),
            "sum_xy": pa.nulls(0, pa.int64()),
            "r": pa.nulls(0, pa.float64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "ts" not in batch.column_names:
            return pa.table(
                {
                    "day": pa.nulls(0, pa.int64()),
                    "c": pa.nulls(0, pa.int64()),
                    "g": pa.nulls(0, pa.int64()),
                }
            )
        ts = batch["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        ) if isinstance(batch["ts"], pa.ChunkedArray) else batch["ts"].cast(
            pa.int64()
        ).to_numpy(zero_copy_only=False)
        d = np.asarray(ts, dtype=np.int64) // DAY_US
        ud, c = np.unique(d, return_counts=True)
        return pa.table(
            {
                "day": pa.array(ud),
                "c": pa.array(c.astype(np.int64)),
                "g": pa.array(np.zeros(ud.shape[0], dtype=np.int64)),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "day" not in group.column_names:
            return EMPTY_OUT
        d = group["day"].to_numpy(zero_copy_only=False)
        c = group["c"].to_numpy(zero_copy_only=False)
        ud, inv = np.unique(d, return_inverse=True)
        tot = np.zeros(ud.shape[0], dtype=np.int64)
        np.add.at(tot, inv, c)
        # consecutive-day pairs (x = day t count, y = day t+1 count)
        nxt = ud[1:] - ud[:-1] == 1
        x = tot[:-1][nxt]
        y = tot[1:][nxt]
        # ALL moment arithmetic in Python ints: den2 is a product of two
        # ~n*sum(x^2)-sized terms and overflows int64 well below 10M
        # rows (DuckDB computes it in int128) — caught by the 10M volume
        # harness, r came back 30.5
        m = int(x.shape[0])
        if m == 0:
            return EMPTY_OUT
        xl, yl = x.tolist(), y.tolist()  # day series is dimension-small
        sx, sy = sum(xl), sum(yl)
        sxx = sum(v * v for v in xl)
        syy = sum(v * v for v in yl)
        sxy = sum(a * b for a, b in zip(xl, yl))
        num = m * sxy - sx * sy
        den2 = (m * sxx - sx * sx) * (m * syy - sy * sy)
        import math

        r = float(num) / math.sqrt(float(den2)) if den2 > 0 else None
        return pa.table(
            {
                "n_pairs": pa.array([int(m)], type=pa.int64()),
                "sum_x": pa.array([sx], type=pa.int64()),
                "sum_y": pa.array([sy], type=pa.int64()),
                "sum_xx": pa.array([sxx], type=pa.int64()),
                "sum_yy": pa.array([syy], type=pa.int64()),
                "sum_xy": pa.array([sxy], type=pa.int64()),
                "r": pa.array([r], type=pa.float64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .map_groups(
            lambda t: kernel(t.drop_columns(["g"]))
            if "g" in t.column_names
            else kernel(t),
            batch_format="pyarrow",
        )
    )


def source_mixture_weights(sf_dir: str) -> ray.data.Dataset:
    """Domain-mixture reweighting (the DoReMi-lite step of corpus prep):
    per-source doc/token counts plus the sampling weight that equalizes
    token mass across sources — weight = total_tokens / (n_sources x
    source_tokens), so weighted token shares become uniform.

    Physical plan: per-batch (source, n_docs, n_tokens) partials (token
    counts vectorized per row, the token_count convention) collapse the
    exchange to sources x batches skinny rows; sources are
    dimension-cardinality so ONE final group computes totals and the
    single deterministic float64 division both engines evaluate on
    exact ints."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "source": pa.nulls(0, pa.string()),
            "n_docs": pa.nulls(0, pa.int64()),
            "n_tokens": pa.nulls(0, pa.int64()),
            "g": pa.nulls(0, pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "source" not in batch.column_names:
            return EMPTY
        n = np.array(
            [len((t or "").split()) for t in batch["text"].to_pylist()],
            dtype=np.int64,
        )
        enc = (
            batch["source"].combine_chunks()
            if isinstance(batch["source"], pa.ChunkedArray)
            else batch["source"]
        ).dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nd = np.bincount(codes, minlength=len(enc.dictionary))
        nt = np.bincount(
            codes, weights=n.astype(np.float64), minlength=len(enc.dictionary)
        ).astype(np.int64)
        return pa.table(
            {
                "source": enc.dictionary,
                "n_docs": pa.array(nd.astype(np.int64)),
                "n_tokens": pa.array(nt),
                "g": pa.array(np.zeros(len(enc.dictionary), dtype=np.int64)),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "source": pa.nulls(0, pa.string()),
                "n_docs": pa.nulls(0, pa.int64()),
                "n_tokens": pa.nulls(0, pa.int64()),
                "weight": pa.nulls(0, pa.float64()),
            }
        )
        if group.num_rows == 0 or "source" not in group.column_names:
            return empty
        enc = group["source"].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nd = np.zeros(len(enc.dictionary), dtype=np.int64)
        nt = np.zeros(len(enc.dictionary), dtype=np.int64)
        np.add.at(nd, codes, group["n_docs"].to_numpy(zero_copy_only=False))
        np.add.at(nt, codes, group["n_tokens"].to_numpy(zero_copy_only=False))
        total = int(nt.sum())
        ns = np.int64(len(enc.dictionary))
        w = np.divide(
            float(total),
            (ns * nt).astype(np.float64),
            out=np.zeros(nt.shape[0], dtype=np.float64),
            where=nt != 0,
        )
        return pa.table(
            {
                "source": enc.dictionary,
                "n_docs": pa.array(nd),
                "n_tokens": pa.array(nt),
                "weight": pa.array(w),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .map_groups(
            lambda t: kernel(t.drop_columns(["g"]))
            if "g" in t.column_names
            else kernel(t),
            batch_format="pyarrow",
        )
    )


def dup_cluster_histogram(sf_dir: str) -> ray.data.Dataset:
    """Exact-duplicate CLUSTER-SIZE distribution (the dedup report's
    headline chart: how many content groups have exactly k copies).

    Physical plan: per-batch md5 + local counts (content never
    shuffles, the exact_dedup discipline); ONE hash%P exchange of
    (md5, n) partials; the kernel finishes per-hash sums and emits its
    LOCAL histogram, so the tail reduce sees <= P x distinct-sizes
    rows."""
    P = 32

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "h": pa.nulls(0, pa.string()),
            "n": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "text" not in batch.column_names:
            return EMPTY
        hs = [
            hashlib.md5((t or "").encode("utf-8")).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        arr = pa.array(hs, type=pa.string())
        enc = arr.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        cnt = np.bincount(codes, minlength=len(enc.dictionary)).astype(
            np.int64
        )
        hpart = np.array(
            [int(x[:8], 16) for x in enc.dictionary.to_pylist()],
            dtype=np.int64,
        )
        return pa.table(
            {
                "h": enc.dictionary,
                "n": pa.array(cnt),
                "part": pa.array(hpart % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cluster_size": pa.nulls(0, pa.int64()),
                "n_clusters": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "h" not in group.column_names:
            return empty
        enc = group["h"].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n = group["n"].to_numpy(zero_copy_only=False)
        tot = np.zeros(len(enc.dictionary), dtype=np.int64)
        np.add.at(tot, codes, n)
        sz, nc = np.unique(tot, return_counts=True)
        return pa.table(
            {
                "cluster_size": pa.array(sz.astype(np.int64)),
                "n_clusters": pa.array(nc.astype(np.int64)),
            }
        )

    def final(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        sz = batch["cluster_size"].to_numpy(zero_copy_only=False)
        nc = batch["n_clusters"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(sz, return_inverse=True)
        tot = np.zeros(uk.shape[0], dtype=np.int64)
        np.add.at(tot, inv, nc)
        return pa.table(
            {
                "cluster_size": pa.array(uk.astype(np.int64)),
                "n_clusters": pa.array(tot),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def events_anomaly_hours(sf_dir: str) -> ray.data.Dataset:
    """Robust ANOMALY flagging over the hourly event-count series: hours
    whose count deviates from the series median by more than 3x the
    median absolute deviation — all in integers (quantile_disc lower
    semantics, DuckDB index = ceil(q*n)-1) so both engines flag the
    exact same hours.  Only hours WITH events enter the series (gaps
    are absence, not zeros — documented semantics).

    Physical plan: per-batch (hour, count) partials bound the exchange
    by active hours per batch; the hour series is dimension-sized
    (10^5 hours = 11 years), so ONE final group sorts it and applies
    the two-stage median/MAD test vectorized."""
    HOUR_US = np.int64(3_600_000_000)

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY_OUT = pa.table(
        {
            "hour": pa.nulls(0, pa.int64()),
            "n_events": pa.nulls(0, pa.int64()),
            "abs_dev": pa.nulls(0, pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "ts" not in batch.column_names:
            return pa.table(
                {
                    "hour": pa.nulls(0, pa.int64()),
                    "c": pa.nulls(0, pa.int64()),
                    "g": pa.nulls(0, pa.int64()),
                }
            )
        ts = batch["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        ) if isinstance(batch["ts"], pa.ChunkedArray) else batch["ts"].cast(
            pa.int64()
        ).to_numpy(zero_copy_only=False)
        h = np.asarray(ts, dtype=np.int64) // HOUR_US
        uh, c = np.unique(h, return_counts=True)
        return pa.table(
            {
                "hour": pa.array(uh),
                "c": pa.array(c.astype(np.int64)),
                "g": pa.array(np.zeros(uh.shape[0], dtype=np.int64)),
            }
        )

    def _disc_median(v: np.ndarray) -> np.int64:
        # quantile_disc(0.5): value at 0-based index ceil(0.5*n) - 1
        s = np.sort(v)
        return s[int(np.ceil(0.5 * s.shape[0])) - 1]

    def kernel(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "hour" not in group.column_names:
            return EMPTY_OUT
        h = group["hour"].to_numpy(zero_copy_only=False)
        c = group["c"].to_numpy(zero_copy_only=False)
        uh, inv = np.unique(h, return_inverse=True)
        tot = np.zeros(uh.shape[0], dtype=np.int64)
        np.add.at(tot, inv, c)
        med = _disc_median(tot)
        dev = np.abs(tot - med)
        mad = _disc_median(dev)
        keep = dev > 3 * mad
        if not keep.any():
            return EMPTY_OUT
        return pa.table(
            {
                "hour": pa.array(uh[keep]),
                "n_events": pa.array(tot[keep]),
                "abs_dev": pa.array(dev[keep].astype(np.int64)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .map_groups(
            lambda t: kernel(t.drop_columns(["g"]))
            if "g" in t.column_names
            else kernel(t),
            batch_format="pyarrow",
        )
    )


def order_fulfillment_lag(sf_dir: str) -> ray.data.Dataset:
    """Fulfillment-lag SLA profile: per order-priority, the q1/median/q3
    of (last shipment date - order date), interpolated at binary
    fractions so the float64 outputs are bit-identical across engines
    (the priority_price_iqr discipline).

    Physical plan: lineitem pre-reduces to per-batch (orderkey, max
    shipdate); ONE orderkey%P exchange joins against (orderkey,
    orderdate, priority) rows and emits order-dimension (priority,
    lag) pairs; a second tiny crc(prio)%8 exchange co-locates each
    priority's lags (priorities are dimension-cardinality) for the
    vectorized in-partition interpolation."""
    import zlib

    P = 32

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "ok": pa.nulls(0, pa.int64()),
            "ts": pa.nulls(0, pa.int64()),
            "prio": pa.nulls(0, pa.string()),
            "side": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def _us(col) -> np.ndarray:
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        return np.asarray(
            arr.cast(pa.int64()).to_numpy(zero_copy_only=False), dtype=np.int64
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "o_orderkey" not in batch.column_names:
            return EMPTY
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "ok": pa.array(ok),
                "ts": pa.array(_us(batch["o_orderdate"])),
                "prio": batch["o_orderpriority"],
                "side": pa.array(np.ones(ok.shape[0], dtype=np.int64)),
                "part": pa.array(ok % P),
            }
        )

    def tag_line(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "l_orderkey" not in batch.column_names:
            return EMPTY
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _us(batch["l_shipdate"])
        uk, inv = np.unique(ok, return_inverse=True)
        mx = np.full(uk.shape[0], np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(mx, inv, ts)
        return pa.table(
            {
                "ok": pa.array(uk),
                "ts": pa.array(mx),
                "prio": pa.array([""] * uk.shape[0], type=pa.string()),
                "side": pa.array(np.zeros(uk.shape[0], dtype=np.int64)),
                "part": pa.array(uk % P),
            }
        )

    def join_kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "prio": pa.nulls(0, pa.string()),
                "lag_us": pa.nulls(0, pa.int64()),
                "p2": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "ok" not in group.column_names:
            return empty
        ok = group["ok"].to_numpy(zero_copy_only=False)
        ts = group["ts"].to_numpy(zero_copy_only=False)
        side = group["side"].to_numpy(zero_copy_only=False)
        iso = side == 1
        lk, lt = ok[~iso], ts[~iso]
        if lk.shape[0] == 0 or not iso.any():
            return empty
        uk = np.unique(lk)
        pos = np.searchsorted(uk, lk)
        mx = np.full(uk.shape[0], np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(mx, pos, lt)
        ook, ots = ok[iso], ts[iso]
        p = np.searchsorted(uk, ook)
        p_c = np.minimum(p, uk.shape[0] - 1)
        hit = uk[p_c] == ook
        if not hit.any():
            return empty
        prio = group["prio"].combine_chunks().take(
            pa.array(np.flatnonzero(iso)[hit])
        )
        lag = mx[p_c[hit]] - ots[hit]
        h = np.array(
            [zlib.crc32(s.encode()) for s in prio.to_pylist()], dtype=np.int64
        )
        return pa.table(
            {
                "prio": prio,
                "lag_us": pa.array(lag),
                "p2": pa.array(h % 8),
            }
        )

    QS = (0.25, 0.5, 0.75)

    def quant_kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "o_orderpriority": pa.nulls(0, pa.string()),
                "n_orders": pa.nulls(0, pa.int64()),
                "lag_q1": pa.nulls(0, pa.float64()),
                "lag_med": pa.nulls(0, pa.float64()),
                "lag_q3": pa.nulls(0, pa.float64()),
            }
        )
        if group.num_rows == 0 or "prio" not in group.column_names:
            return empty
        enc = group["prio"].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = group["lag_us"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, codes))
        c_s, v_s = codes[order], v[order]
        starts = np.flatnonzero(
            np.concatenate(([True], c_s[1:] != c_s[:-1]))
        )
        n = np.diff(np.append(starts, c_s.shape[0]))
        out = {"n": n}
        qcols = {}
        for q, name in zip(QS, ("lag_q1", "lag_med", "lag_q3")):
            hidx = q * (n - 1)
            lo = np.floor(hidx).astype(np.int64)
            hi = np.minimum(lo + 1, n - 1)
            frac = hidx - lo
            vlo = v_s[starts + lo].astype(np.float64)
            vhi = v_s[starts + hi].astype(np.float64)
            qcols[name] = vlo + frac * (vhi - vlo)
        return pa.table(
            {
                "o_orderpriority": enc.dictionary.take(pa.array(c_s[starts])),
                "n_orders": pa.array(n.astype(np.int64)),
                "lag_q1": pa.array(qcols["lag_q1"]),
                "lag_med": pa.array(qcols["lag_med"]),
                "lag_q3": pa.array(qcols["lag_q3"]),
            }
        )

    return (
        orders.map_batches(tag_orders, batch_format="pyarrow")
        .union(line.map_batches(tag_line, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(join_kernel, batch_format="pyarrow")
        .groupby("p2")
        .map_groups(
            lambda t: quant_kernel(
                t.drop_columns(["p2"]) if "p2" in t.column_names else t
            ),
            batch_format="pyarrow",
        )
    )


def tpch_q6_forecast_revenue(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q6 analog (forecasting-revenue change): one filtered
    scan-and-sum — revenue = sum(extendedprice * discount) over a
    shipdate year, a discount band and small quantities.  EVERY
    predicate pushes into the parquet read (row-group pruning at scale);
    revenue integerizes per row so the distributed sum is associative.

    Physical plan: zero exchanges — per-batch partial sums reduce
    through one single-group tail."""
    import pyarrow.dataset as pads

    lo = pa.scalar(
        np.datetime64("1996-01-01T00:00:00", "us"), type=pa.timestamp("us")
    )
    hi = pa.scalar(
        np.datetime64("1997-01-01T00:00:00", "us"), type=pa.timestamp("us")
    )
    flt = (
        (pads.field("l_shipdate") >= lo)
        & (pads.field("l_shipdate") < hi)
        & (pads.field("l_discount") >= 0.05)
        & (pads.field("l_discount") <= 0.07)
        & (pads.field("l_quantity") < 24.0)
    )
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount"],
        filter=flt,
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY_OUT = pa.table(
        {
            "revenue_cents": pa.nulls(0, pa.int64()),
            "n_rows": pa.nulls(0, pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "rev": pa.nulls(0, pa.int64()),
                "n": pa.nulls(0, pa.int64()),
                "g": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "l_extendedprice" not in batch.column_names:
            return empty
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        dc = batch["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.floor(ep * dc * 100.0).astype(np.int64)
        return pa.table(
            {
                "rev": pa.array([int(rev.sum())], type=pa.int64()),
                "n": pa.array([batch.num_rows], type=pa.int64()),
                "g": pa.array([0], type=pa.int64()),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "rev" not in group.column_names:
            return EMPTY_OUT
        return pa.table(
            {
                "revenue_cents": pa.array(
                    [int(group["rev"].to_numpy(zero_copy_only=False).sum())],
                    type=pa.int64(),
                ),
                "n_rows": pa.array(
                    [int(group["n"].to_numpy(zero_copy_only=False).sum())],
                    type=pa.int64(),
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .map_groups(
            lambda t: final(t.drop_columns(["g"]))
            if "g" in t.column_names
            else final(t),
            batch_format="pyarrow",
        )
    )


def tpch_q10_returned(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q10 analog (returned-item reporting): top 20 customers by
    lost revenue from RETURNED lineitems of orders placed in 1996-H1,
    with customer name and nation attached.

    Physical plan: the broadcast-star again — date-filtered orders
    reduce to ONE {orderkey -> custkey} map and customer+nation dims to
    ONE {custkey -> (name, nation)} map, both built in a remote task;
    lineitem streams with returnflag='R' pushed into the read,
    integerizes revenue per row and pre-aggregates per custkey per
    batch; custkey%P exchange + local top-20 + one 20*P-row tail."""
    import pyarrow.dataset as pads

    lo = pa.scalar(
        np.datetime64("1996-01-01T00:00:00", "us"), type=pa.timestamp("us")
    )
    hi = pa.scalar(
        np.datetime64("1996-07-01T00:00:00", "us"), type=pa.timestamp("us")
    )
    P = 32
    K = 20

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"],
        filter=(pads.field("o_orderdate") >= lo)
        & (pads.field("o_orderdate") < hi),
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    nation = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    @ray.remote
    def build_state(n_ord: int, n_cust: int, *refs) -> tuple:
        op = [t for t in refs[:n_ord] if t.num_rows]
        cp = [t for t in refs[n_ord:n_ord + n_cust] if t.num_rows]
        np_ = [t for t in refs[n_ord + n_cust:] if t.num_rows]
        if not op or not cp or not np_:
            return (
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=object),
                np.empty(0, dtype=object),
            )
        ot = pa.concat_tables(op)
        ct = pa.concat_tables(cp)
        nt = pa.concat_tables(np_)
        ok = ot["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        oc = ot["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ok)
        ck = ct["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cn = np.asarray(ct["c_name"].to_pylist(), dtype=object)
        cnat = ct["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nk = nt["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nn = np.asarray(nt["n_name"].to_pylist(), dtype=object)
        npos = np.searchsorted(np.sort(nk), cnat)
        nn_by_nk = nn[np.argsort(nk)]
        corder = np.argsort(ck)
        return (
            ok[order],
            oc[order],
            ck[corder],
            cn[corder],
            nn_by_nk[npos][corder],
        )

    ord_refs = orders.to_arrow_refs()
    cust_refs = cust.to_arrow_refs()
    nat_refs = nation.to_arrow_refs()
    state_ref = build_state.remote(
        len(ord_refs), len(cust_refs), *ord_refs, *cust_refs, *nat_refs
    )

    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pads.field("l_returnflag") == "R",
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "ck": pa.nulls(0, pa.int64()),
            "rev": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "l_orderkey" not in batch.column_names:
            return EMPTY
        keys, custs, _, _, _ = ray.get(state_ref)
        if keys.shape[0] == 0:
            return EMPTY
        lk = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(keys, lk)
        pos_c = np.minimum(pos, keys.shape[0] - 1)
        hit = keys[pos_c] == lk
        if not hit.any():
            return EMPTY
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[hit]
        dc = batch["l_discount"].to_numpy(zero_copy_only=False)[hit]
        rev = np.floor(ep * (1.0 - dc) * 100.0).astype(np.int64)
        ck = custs[pos_c[hit]]
        uk, inv = np.unique(ck, return_inverse=True)
        sums = np.bincount(inv, weights=rev.astype(np.float64)).astype(np.int64)
        return pa.table(
            {
                "ck": pa.array(uk),
                "rev": pa.array(sums),
                "part": pa.array(uk % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "c_custkey": pa.nulls(0, pa.int64()),
                "lost_cents": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "ck" not in group.column_names:
            return empty
        ck = group["ck"].to_numpy(zero_copy_only=False)
        rev = group["rev"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(ck, return_inverse=True)
        tot = np.zeros(uk.shape[0], dtype=np.int64)
        np.add.at(tot, inv, rev)
        order = np.lexsort((uk, -tot))[:K]
        return pa.table(
            {
                "c_custkey": pa.array(uk[order]),
                "lost_cents": pa.array(tot[order]),
            }
        )

    def final(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "c_custkey": pa.nulls(0, pa.int64()),
                "c_name": pa.nulls(0, pa.string()),
                "n_name": pa.nulls(0, pa.string()),
                "lost_cents": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        ck = batch["c_custkey"].to_numpy(zero_copy_only=False)
        rev = batch["lost_cents"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ck, -rev))[:K]
        ck, rev = ck[order], rev[order]
        _, _, cks, cns, nns = ray.get(state_ref)
        pos = np.searchsorted(cks, ck)
        return pa.table(
            {
                "c_custkey": pa.array(ck),
                "c_name": pa.array(cns[pos].tolist(), type=pa.string()),
                "n_name": pa.array(nns[pos].tolist(), type=pa.string()),
                "lost_cents": pa.array(rev),
            }
        )

    return (
        line.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def tpch_q14_promo_share(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q14 analog (promotion effect): the share of 1996 revenue
    from PROMO-type parts, as exact integer numerator/denominator plus
    the one deterministic percentage division.

    Physical plan: the part dimension reduces to a sorted promo-key
    array broadcast once; lineitem streams with the shipdate filter
    pushed into the read, integerizes per row and emits ONE partial row
    per batch — zero exchanges beyond the single-group tail."""
    import pyarrow.dataset as pads

    lo = pa.scalar(
        np.datetime64("1996-01-01T00:00:00", "us"), type=pa.timestamp("us")
    )
    hi = pa.scalar(
        np.datetime64("1997-01-01T00:00:00", "us"), type=pa.timestamp("us")
    )

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    @ray.remote
    def build_promo(*refs) -> np.ndarray:
        parts = [t for t in refs if t.num_rows]
        if not parts:
            return np.empty(0, dtype=np.int64)
        t = pa.concat_tables(parts)
        keep = pc.equal(t["p_type"], "PROMO")
        pk = t.filter(keep)["p_partkey"].to_numpy(zero_copy_only=False)
        return np.sort(pk.astype(np.int64))

    promo_ref = build_promo.remote(*part.to_arrow_refs())

    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate") >= lo)
        & (pads.field("l_shipdate") < hi),
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY_OUT = pa.table(
        {
            "promo_cents": pa.nulls(0, pa.int64()),
            "total_cents": pa.nulls(0, pa.int64()),
            "promo_share_pct": pa.nulls(0, pa.float64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "p": pa.nulls(0, pa.int64()),
                "t": pa.nulls(0, pa.int64()),
                "g": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "l_partkey" not in batch.column_names:
            return empty
        promo = ray.get(promo_ref)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        dc = batch["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.floor(ep * (1.0 - dc) * 100.0).astype(np.int64)
        if promo.shape[0]:
            pos = np.minimum(np.searchsorted(promo, pk), promo.shape[0] - 1)
            isp = promo[pos] == pk
        else:
            isp = np.zeros(pk.shape[0], dtype=bool)
        return pa.table(
            {
                "p": pa.array([int(rev[isp].sum())], type=pa.int64()),
                "t": pa.array([int(rev.sum())], type=pa.int64()),
                "g": pa.array([0], type=pa.int64()),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "p" not in group.column_names:
            return EMPTY_OUT
        p = int(group["p"].to_numpy(zero_copy_only=False).sum())
        t = int(group["t"].to_numpy(zero_copy_only=False).sum())
        share = 100.0 * float(p) / float(t) if t else None
        return pa.table(
            {
                "promo_cents": pa.array([p], type=pa.int64()),
                "total_cents": pa.array([t], type=pa.int64()),
                "promo_share_pct": pa.array([share], type=pa.float64()),
            }
        )

    return (
        line.map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .map_groups(
            lambda t: final(t.drop_columns(["g"]))
            if "g" in t.column_names
            else final(t),
            batch_format="pyarrow",
        )
    )


def part_cheapest_supplier(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q2-flavored ARGMIN join: for every part traded, the
    supplier offering the lowest extendedprice (ties to the smaller
    suppkey), with the supplier name attached.

    Physical plan: per-batch argmin partials collapse lineitem to <= 1
    row per (part) per batch BEFORE the partkey%P exchange (argmin
    composes associatively); the kernel finishes the argmin vectorized
    (lexsort + segment heads); the supplier-name dimension broadcasts
    once from a remote build task.  Price ties across suppliers resolve
    by suppkey on BOTH engines."""
    P = 32

    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    @ray.remote
    def build_names(*refs) -> tuple:
        parts = [t for t in refs if t.num_rows]
        if not parts:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=object)
        t = pa.concat_tables(parts)
        sk = t["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sn = np.asarray(t["s_name"].to_pylist(), dtype=object)
        order = np.argsort(sk)
        return sk[order], sn[order]

    names_ref = build_names.remote(*supp.to_arrow_refs())

    EMPTY = pa.table(
        {
            "pk": pa.nulls(0, pa.int64()),
            "sk": pa.nulls(0, pa.int64()),
            "price": pa.nulls(0, pa.float64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def _argmin(pk, sk, price):
        order = np.lexsort((sk, price, pk))
        pk_s, sk_s, pr_s = pk[order], sk[order], price[order]
        first = np.concatenate(([True], pk_s[1:] != pk_s[:-1]))
        return pk_s[first], sk_s[first], pr_s[first]

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "l_partkey" not in batch.column_names:
            return EMPTY
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pr = batch["l_extendedprice"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        pk, sk, pr = _argmin(pk, sk, pr)
        return pa.table(
            {
                "pk": pa.array(pk),
                "sk": pa.array(sk),
                "price": pa.array(pr),
                "part": pa.array(pk % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "p_partkey": pa.nulls(0, pa.int64()),
                "s_suppkey": pa.nulls(0, pa.int64()),
                "s_name": pa.nulls(0, pa.string()),
                "best_price": pa.nulls(0, pa.float64()),
            }
        )
        if group.num_rows == 0 or "pk" not in group.column_names:
            return empty
        pk, sk, pr = _argmin(
            group["pk"].to_numpy(zero_copy_only=False),
            group["sk"].to_numpy(zero_copy_only=False),
            group["price"].to_numpy(zero_copy_only=False),
        )
        skeys, snames = ray.get(names_ref)
        pos = np.minimum(np.searchsorted(skeys, sk), max(skeys.shape[0] - 1, 0))
        nm = (
            snames[pos]
            if skeys.shape[0]
            else np.full(sk.shape[0], "", dtype=object)
        )
        return pa.table(
            {
                "p_partkey": pa.array(pk),
                "s_suppkey": pa.array(sk),
                "s_name": pa.array(nm.tolist(), type=pa.string()),
                "best_price": pa.array(pr),
            }
        )

    return (
        line.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def lang_type_token_ratio(sf_dir: str) -> ray.data.Dataset:
    """Lexical diversity per language (type-token ratio: distinct
    tokens / total tokens) — the corpus-quality metric next to the
    Gopher gates.

    Physical plan: per-batch DISTINCT (lang, token) pairs via
    dictionary codes plus local token totals — the exchange is bounded
    by vocabulary x languages (plus langs x batches count rows), never
    token count; crc(token)%P co-partitions tokens so partition
    distinct counts SUM to the global count (the column_profile
    partition-the-VALUE discipline); language totals ride a parallel
    gid stream through the SAME exchange."""
    import zlib

    P = 32

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "text"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "lang": pa.nulls(0, pa.string()),
            "token": pa.nulls(0, pa.string()),
            "n": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "lang" not in batch.column_names:
            return EMPTY
        txt = pc.utf8_trim_whitespace(batch["text"])
        lists = pc.split_pattern(txt, pattern=" ")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        ok = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        langs = (
            batch["lang"].combine_chunks()
            if isinstance(batch["lang"], pa.ChunkedArray)
            else batch["lang"]
        )
        lenc = langs.dictionary_encode()
        lcodes = lenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        if not ok.any():
            return EMPTY
        tok_l = lcodes[parent[ok]]
        tenc = flat.filter(pa.array(ok)).dictionary_encode()
        tcodes = tenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        V = np.int64(len(tenc.dictionary))
        # distinct (lang, token) in this batch
        key = tok_l * V + tcodes
        uk = np.unique(key)
        toks = tenc.dictionary.take(pa.array(uk % V))
        h = np.array(
            [zlib.crc32(t.encode()) for t in toks.to_pylist()], dtype=np.int64
        )
        dl = lenc.dictionary.take(pa.array(uk // V))
        # per-lang token totals ride the same stream with token=""
        # (empty tokens were filtered above, so "" cannot collide)
        nt = np.bincount(tok_l, minlength=len(lenc.dictionary)).astype(
            np.int64
        )
        return pa.table(
            {
                "lang": pa.concat_arrays([dl, lenc.dictionary]),
                "token": pa.concat_arrays(
                    [toks, pa.array([""] * len(lenc.dictionary))]
                ),
                "n": pa.array(
                    np.concatenate(
                        (np.zeros(uk.shape[0], dtype=np.int64), nt)
                    )
                ),
                "part": pa.array(
                    np.concatenate(
                        (h % P, np.full(len(lenc.dictionary), P, np.int64))
                    )
                ),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "lang": pa.nulls(0, pa.string()),
                "n_distinct": pa.nulls(0, pa.int64()),
                "n_tokens": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "lang" not in group.column_names:
            return empty
        lenc = group["lang"].combine_chunks().dictionary_encode()
        lcodes = lenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n = group["n"].to_numpy(zero_copy_only=False)
        is_cnt = n > 0
        nt = np.zeros(len(lenc.dictionary), dtype=np.int64)
        np.add.at(nt, lcodes[is_cnt], n[is_cnt])
        # distinct (lang, token) across batches within this partition
        tenc = group["token"].combine_chunks().dictionary_encode()
        tcodes = tenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        V = np.int64(len(tenc.dictionary))
        key = lcodes[~is_cnt] * V + tcodes[~is_cnt]
        uk = np.unique(key)
        nd = np.bincount(
            (uk // V).astype(np.int64), minlength=len(lenc.dictionary)
        ).astype(np.int64)
        return pa.table(
            {
                "lang": lenc.dictionary,
                "n_distinct": pa.array(nd),
                "n_tokens": pa.array(nt),
            }
        )

    def final(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "lang": pa.nulls(0, pa.string()),
                "n_tokens": pa.nulls(0, pa.int64()),
                "n_distinct": pa.nulls(0, pa.int64()),
                "ttr": pa.nulls(0, pa.float64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        lenc = batch["lang"].combine_chunks().dictionary_encode()
        lcodes = lenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nd = np.zeros(len(lenc.dictionary), dtype=np.int64)
        nt = np.zeros(len(lenc.dictionary), dtype=np.int64)
        np.add.at(nd, lcodes, batch["n_distinct"].to_numpy(zero_copy_only=False))
        np.add.at(nt, lcodes, batch["n_tokens"].to_numpy(zero_copy_only=False))
        ttr = np.divide(
            nd.astype(np.float64),
            nt.astype(np.float64),
            out=np.zeros(nd.shape[0], dtype=np.float64),
            where=nt != 0,
        )
        return pa.table(
            {
                "lang": lenc.dictionary,
                "n_tokens": pa.array(nt),
                "n_distinct": pa.array(nd),
                "ttr": pa.array(ttr),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def rolling_active_users(sf_dir: str) -> ray.data.Dataset:
    """ROLLING 7-day distinct active users (the windowed COUNT DISTINCT
    no engine does cheaply): for every day present in the data, the
    number of distinct users active in the trailing 7-day window.

    Physical plan: per-batch distinct (user, day) pairs expand to their
    <= 7 target days (exchange = 7 x distinct user-days, NOT events);
    a k=0 self flag marks target-day PRESENCE so absent days drop
    without a second pass; ONE target%P exchange; the kernel dedups
    (target, user) pairs vectorized and counts distinct users per
    present target."""
    P = 32
    W = 7
    DAY_US = np.int64(86_400_000_000)

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "t": pa.nulls(0, pa.int64()),
            "u": pa.nulls(0, pa.int64()),
            "self": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "user_id" not in batch.column_names:
            return EMPTY
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        ) if isinstance(batch["ts"], pa.ChunkedArray) else batch["ts"].cast(
            pa.int64()
        ).to_numpy(zero_copy_only=False)
        d = np.asarray(ts, dtype=np.int64) // DAY_US
        # distinct (user, day) in this batch
        order = np.lexsort((d, u))
        u_s, d_s = u[order], d[order]
        keep = np.concatenate(
            ([True], (u_s[1:] != u_s[:-1]) | (d_s[1:] != d_s[:-1]))
        )
        u_s, d_s = u_s[keep], d_s[keep]
        n = u_s.shape[0]
        k = np.tile(np.arange(W, dtype=np.int64), n)
        t = np.repeat(d_s, W) + k
        return pa.table(
            {
                "t": pa.array(t),
                "u": pa.array(np.repeat(u_s, W)),
                "self": pa.array((k == 0).astype(np.int64)),
                "part": pa.array(t % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "day": pa.nulls(0, pa.int64()),
                "active_7d": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "t" not in group.column_names:
            return empty
        t = group["t"].to_numpy(zero_copy_only=False)
        u = group["u"].to_numpy(zero_copy_only=False)
        s = group["self"].to_numpy(zero_copy_only=False)
        # present targets: days someone was active ON (k=0 rows)
        present = np.unique(t[s == 1])
        if present.shape[0] == 0:
            return empty
        order = np.lexsort((u, t))
        t_s, u_s = t[order], u[order]
        keep = np.concatenate(
            ([True], (t_s[1:] != t_s[:-1]) | (u_s[1:] != u_s[:-1]))
        )
        t_s = t_s[keep]
        ut, cnt = np.unique(t_s, return_counts=True)
        pos = np.searchsorted(ut, present)
        return pa.table(
            {
                "day": pa.array(present),
                "active_7d": pa.array(cnt[pos].astype(np.int64)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def click_to_purchase_median(sf_dir: str) -> ray.data.Dataset:
    """Conversion-time profile: per user, the delay from FIRST click to
    the first purchase at-or-after it; output the converting-user count
    and the exact interpolated median delay.

    Physical plan: one user%P exchange of (user, ts, is_purchase)
    skinny rows; the kernel computes each user's first-click /
    first-qualifying-purchase vectorized (lexsort + segment minima) and
    emits user-dimension delta rows; the median comes from the
    constant-exchange radix quantile over the materialized deltas
    (four scans of a user-dimension table, no sort, no gather)."""
    from libpostal_ray.functions.quantile import grouped_exact_quantiles_cont

    P = 32

    import pyarrow.dataset as pads

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type"],
        filter=pads.field("event_type").isin(["click", "purchase"]),
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "u": pa.nulls(0, pa.int64()),
            "ts": pa.nulls(0, pa.int64()),
            "isp": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "user_id" not in batch.column_names:
            return EMPTY
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch["ts"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        ) if isinstance(batch["ts"], pa.ChunkedArray) else batch["ts"].cast(
            pa.int64()
        ).to_numpy(zero_copy_only=False)
        isp = pc.equal(batch["event_type"], "purchase").to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "u": pa.array(u),
                "ts": pa.array(np.asarray(ts, dtype=np.int64)),
                "isp": pa.array(isp.astype(np.int64)),
                "part": pa.array(u % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"k": pa.nulls(0, pa.int64()), "delta": pa.nulls(0, pa.float64())}
        )
        if group.num_rows == 0 or "u" not in group.column_names:
            return empty
        u = group["u"].to_numpy(zero_copy_only=False)
        ts = group["ts"].to_numpy(zero_copy_only=False)
        isp = group["isp"].to_numpy(zero_copy_only=False)
        # first click per user
        cm = isp == 0
        if not cm.any():
            return empty
        cu, ct = u[cm], ts[cm]
        o = np.lexsort((ct, cu))
        cu, ct = cu[o], ct[o]
        first = np.concatenate(([True], cu[1:] != cu[:-1]))
        cu, ct = cu[first], ct[first]
        # purchases joined to their user's first click
        pm = isp == 1
        pu, pt = u[pm], ts[pm]
        pos = np.searchsorted(cu, pu)
        pos_c = np.minimum(pos, max(cu.shape[0] - 1, 0))
        ok = (cu.shape[0] > 0) & (cu[pos_c] == pu)
        ok &= pt >= ct[pos_c]
        if not ok.any():
            return empty
        qu, qd = pu[ok], pt[ok] - ct[pos_c][ok]
        o2 = np.lexsort((qd, qu))
        qu, qd = qu[o2], qd[o2]
        first2 = np.concatenate(([True], qu[1:] != qu[:-1]))
        return pa.table(
            {
                "k": pa.array(np.zeros(int(first2.sum()), dtype=np.int64)),
                "delta": pa.array(qd[first2].astype(np.float64)),
            }
        )

    deltas = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .materialize()  # user-dimension; scanned 4x by the radix quantile
    )
    EMPTY_OUT = pa.table(
        {
            "n_users": pa.nulls(0, pa.int64()),
            "median_delta_us": pa.nulls(0, pa.float64()),
        }
    )
    qt = grouped_exact_quantiles_cont(deltas, "k", "delta", [0.5])
    if qt.num_rows == 0:
        return ray.data.from_arrow(EMPTY_OUT)
    return ray.data.from_arrow(
        pa.table(
            {
                "n_users": pa.array(
                    [int(qt["n"][0].as_py())], type=pa.int64()
                ),
                "median_delta_us": pa.array(
                    [float(qt["q_value"][0].as_py())], type=pa.float64()
                ),
            }
        )
    )


def user_value_pareto(sf_dir: str) -> ray.data.Dataset:
    """Pareto concentration (the 80/20 'vital few' question): the
    SMALLEST number of users whose summed event value reaches 80% of
    the total — EXACT at any scale with no sort and no top-k gather.

    Physical plan: one user%P exchange finishes per-user cent totals
    (user-dimension, materialized once); then a DESCENDING radix walk —
    four streaming scans, each histogramming the next 16 bits of the
    sign-flipped value key into (bucket -> count, sum) partials of <=
    65536 skinny rows — pins the exact threshold value t, the count and
    sum STRICTLY ABOVE t, and the tied-user top-up
    ceil((target - sum_above)/t); integer identity 5*cum >= 4*total
    makes the answer bit-identical to the SQL window formulation
    (proved in the docstring of the kernel).  Exchange volume is
    constant per pass, independent of user count."""
    P = 32

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "u": pa.nulls(0, pa.int64()),
            "v": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "user_id" not in batch.column_names:
            return EMPTY
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        cents = np.floor(v * 100.0).astype(np.int64)
        uk, inv = np.unique(u, return_inverse=True)
        s = np.bincount(inv, weights=cents.astype(np.float64)).astype(np.int64)
        return pa.table(
            {"u": pa.array(uk), "v": pa.array(s), "part": pa.array(uk % P)}
        )

    def merge(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"u": pa.nulls(0, pa.int64()), "v": pa.nulls(0, pa.int64())}
        )
        if group.num_rows == 0 or "u" not in group.column_names:
            return empty
        u = group["u"].to_numpy(zero_copy_only=False)
        v = group["v"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(u, return_inverse=True)
        tot = np.zeros(uk.shape[0], dtype=np.int64)
        np.add.at(tot, inv, v)
        return pa.table({"u": pa.array(uk), "v": pa.array(tot)})

    totals = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge, batch_format="pyarrow")
        .materialize()  # user-dimension; scanned 4x by the radix walk
    )

    EMPTY_OUT = pa.table(
        {
            "n_users": pa.nulls(0, pa.int64()),
            "n_users_80": pa.nulls(0, pa.int64()),
            "total_cents": pa.nulls(0, pa.int64()),
        }
    )

    @ray.remote
    def merge_hist(*blocks):
        cnt = np.zeros(65536, dtype=np.int64)
        sm = np.zeros(65536, dtype=np.int64)
        n_users = 0
        for b in blocks:
            if b.num_rows == 0 or "bucket" not in b.column_names:
                continue
            bk = b.column("bucket").to_numpy(zero_copy_only=False)
            np.add.at(cnt, bk, b.column("cnt").to_numpy(zero_copy_only=False))
            np.add.at(sm, bk, b.column("sum").to_numpy(zero_copy_only=False))
            n_users += int(
                b.column("cnt").to_numpy(zero_copy_only=False).sum()
            )
        return cnt, sm, n_users

    SIGN = np.uint64(1) << np.uint64(63)

    def hist_pass(shift: int, prefix: int, mask: int):
        def fn(batch: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "bucket": pa.nulls(0, pa.int64()),
                    "cnt": pa.nulls(0, pa.int64()),
                    "sum": pa.nulls(0, pa.int64()),
                }
            )
            if batch.num_rows == 0 or "v" not in batch.column_names:
                return empty
            v = batch["v"].to_numpy(zero_copy_only=False)
            key = v.astype(np.uint64) ^ SIGN  # order-preserving unsigned
            if mask:
                sel = (key & np.uint64(mask)) == np.uint64(prefix)
                v, key = v[sel], key[sel]
            if key.shape[0] == 0:
                return empty
            digit = ((key >> np.uint64(shift)) & np.uint64(0xFFFF)).astype(
                np.int64
            )
            ub, inv = np.unique(digit, return_inverse=True)
            c = np.bincount(inv).astype(np.int64)
            s = np.zeros(ub.shape[0], dtype=np.int64)
            np.add.at(s, inv, v)
            return pa.table(
                {
                    "bucket": pa.array(ub),
                    "cnt": pa.array(c),
                    "sum": pa.array(s),
                }
            )

        return fn

    # pass 1 also reveals total and user count
    blocks = totals.map_batches(
        hist_pass(48, 0, 0), batch_format="pyarrow"
    ).materialize().to_arrow_refs()
    cnt, sm, n_users = ray.get(merge_hist.remote(*blocks))
    if n_users == 0:
        return ray.data.from_arrow(EMPTY_OUT)
    total = int(sm.sum())
    target = -((-4 * total) // 5)  # ceil(4*total/5), exact ints
    if target <= 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "n_users": pa.array([n_users], type=pa.int64()),
                    "n_users_80": pa.array(
                        [min(1, n_users)], type=pa.int64()
                    ),
                    "total_cents": pa.array([total], type=pa.int64()),
                }
            )
        )

    prefix, mask = 0, 0
    n_above, sum_above = 0, 0
    for level in range(4):
        shift = 48 - 16 * level
        if level > 0:
            blocks = totals.map_batches(
                hist_pass(shift, prefix, mask), batch_format="pyarrow"
            ).materialize().to_arrow_refs()
            cnt, sm, _ = ray.get(merge_hist.remote(*blocks))
        # walk buckets from HIGH to LOW until the target is inside one
        csum = np.cumsum(sm[::-1])[::-1]  # csum[b] = sum of buckets >= b
        ccnt = np.cumsum(cnt[::-1])[::-1]
        rem = target - sum_above
        # smallest b where csum[b] >= rem -> crossing bucket (largest
        # such b since csum decreases as b rises): find max b with
        # csum[b] >= rem
        ok = csum >= rem
        b = int(np.flatnonzero(ok).max())
        if b + 1 < 65536:
            n_above += int(ccnt[b + 1])
            sum_above += int(csum[b + 1])
        prefix |= b << shift
        mask |= 0xFFFF << shift
    t = int(np.int64(np.uint64(prefix) ^ SIGN))
    rem = target - sum_above
    k_extra = -((-rem) // t) if t > 0 else 0
    return ray.data.from_arrow(
        pa.table(
            {
                "n_users": pa.array([n_users], type=pa.int64()),
                "n_users_80": pa.array(
                    [n_above + k_extra], type=pa.int64()
                ),
                "total_cents": pa.array([total], type=pa.int64()),
            }
        )
    )


def source_dup_rate(sf_dir: str) -> ray.data.Dataset:
    """Duplication rate per SOURCE (which feeds are polluting the
    corpus): for every source, how many of its docs share exact content
    with ANY doc in the corpus (cross-source counts too), as count +
    one deterministic rate division.

    Physical plan: per-batch (md5, source, n) partials (content never
    shuffles); ONE hash%P exchange co-locates each content group, so
    group size and per-source membership resolve in the kernel, which
    emits per-source (n_docs, n_duped) partials; the tail reduce is
    sources x P skinny rows."""
    P = 32

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text", "source"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "h": pa.nulls(0, pa.string()),
            "source": pa.nulls(0, pa.string()),
            "n": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "text" not in batch.column_names:
            return EMPTY
        hs = [
            hashlib.md5((t or "").encode("utf-8")).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        src = np.asarray(batch["source"].to_pylist(), dtype=object)
        arr = np.asarray(hs, dtype=object)
        # count per (hash, source) in this batch
        key = np.char.add(
            np.char.add(arr.astype(str), "\x01"), src.astype(str)
        )
        uk, idx, cnt = np.unique(key, return_index=True, return_counts=True)
        return pa.table(
            {
                "h": pa.array(arr[idx].tolist(), type=pa.string()),
                "source": pa.array(src[idx].tolist(), type=pa.string()),
                "n": pa.array(cnt.astype(np.int64)),
                "part": pa.array(
                    np.array(
                        [int(x[:8], 16) for x in arr[idx]], dtype=np.int64
                    )
                    % P
                ),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "source": pa.nulls(0, pa.string()),
                "n_docs": pa.nulls(0, pa.int64()),
                "n_duped": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "h" not in group.column_names:
            return empty
        henc = group["h"].combine_chunks().dictionary_encode()
        hcodes = henc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        senc = group["source"].combine_chunks().dictionary_encode()
        scodes = senc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n = group["n"].to_numpy(zero_copy_only=False)
        gsz = np.zeros(len(henc.dictionary), dtype=np.int64)
        np.add.at(gsz, hcodes, n)
        duped = gsz[hcodes] > 1  # this (hash, source) row is in a dup group
        nd = np.zeros(len(senc.dictionary), dtype=np.int64)
        tot = np.zeros(len(senc.dictionary), dtype=np.int64)
        np.add.at(tot, scodes, n)
        np.add.at(nd, scodes[duped], n[duped])
        return pa.table(
            {
                "source": senc.dictionary,
                "n_docs": pa.array(tot),
                "n_duped": pa.array(nd),
            }
        )

    def final(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "source": pa.nulls(0, pa.string()),
                "n_docs": pa.nulls(0, pa.int64()),
                "n_duped": pa.nulls(0, pa.int64()),
                "dup_rate": pa.nulls(0, pa.float64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        senc = batch["source"].combine_chunks().dictionary_encode()
        scodes = senc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        tot = np.zeros(len(senc.dictionary), dtype=np.int64)
        nd = np.zeros(len(senc.dictionary), dtype=np.int64)
        np.add.at(tot, scodes, batch["n_docs"].to_numpy(zero_copy_only=False))
        np.add.at(nd, scodes, batch["n_duped"].to_numpy(zero_copy_only=False))
        rate = np.divide(
            nd.astype(np.float64),
            tot.astype(np.float64),
            out=np.zeros(nd.shape[0], dtype=np.float64),
            where=tot != 0,
        )
        return pa.table(
            {
                "source": senc.dictionary,
                "n_docs": pa.array(tot),
                "n_duped": pa.array(nd),
                "dup_rate": pa.array(rate),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def stratified_fixed_k_sample(sf_dir: str) -> ray.data.Dataset:
    """Fixed-TOTAL-size stratified sample (exactly K=100 docs, strata =
    languages, quotas allocated pro-rata by Hamilton largest-remainder —
    the order_price_allocation machinery applied to sampling): within
    each stratum the quota smallest Lehmer-hash docs win, so the sample
    is reproducible across runs AND engines.

    Physical plan: a tiny (lang, count) aggregate fixes the quotas on
    the driver (strata are dimension-cardinality); the sample pass
    keeps only each batch's per-lang quota minima (partial top-k
    composes associatively), so the crc(lang)%8 exchange carries
    <= quota x batches rows."""
    import zlib

    K = 100

    ds_counts = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    def cnt_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "lang" not in batch.column_names:
            return pa.table(
                {"lang": pa.nulls(0, pa.string()), "n": pa.nulls(0, pa.int64())}
            )
        enc = (
            batch["lang"].combine_chunks()
            if isinstance(batch["lang"], pa.ChunkedArray)
            else batch["lang"]
        ).dictionary_encode()
        c = np.bincount(
            enc.indices.to_numpy(zero_copy_only=False),
            minlength=len(enc.dictionary),
        )
        return pa.table(
            {"lang": enc.dictionary, "n": pa.array(c.astype(np.int64))}
        )

    counts = (
        ds_counts.map_batches(cnt_partial, batch_format="pyarrow").to_pandas()
    )
    EMPTY_OUT = pa.table(
        {"lang": pa.nulls(0, pa.string()), "doc_id": pa.nulls(0, pa.int64())}
    )
    if len(counts) == 0 or counts["n"].sum() == 0:
        return ray.data.from_arrow(EMPTY_OUT)
    agg = counts.groupby("lang")["n"].sum().sort_index()
    langs = list(agg.index)
    nl = agg.to_numpy().astype(np.int64)
    tot = int(nl.sum())
    base = (K * nl) // tot
    rem = (K * nl) % tot
    leftover = K - int(base.sum())
    order = np.lexsort((np.arange(len(langs)), -rem))  # rem desc, lang asc
    quota = base.copy()
    quota[order[:leftover]] += 1
    quota_map = {lang: int(q) for lang, q in zip(langs, quota)}

    M = np.int64(2147483647)

    def sample_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "lang": pa.nulls(0, pa.string()),
                "doc_id": pa.nulls(0, pa.int64()),
                "h": pa.nulls(0, pa.int64()),
                "part": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return empty
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (d * np.int64(48271)) % M
        langs_a = np.asarray(batch["lang"].to_pylist(), dtype=object)
        keep_idx = []
        for lang in np.unique(langs_a):
            q = quota_map.get(str(lang), 0)
            if q <= 0:
                continue
            idx = np.flatnonzero(langs_a == lang)
            o = np.lexsort((d[idx], h[idx]))[:q]
            keep_idx.append(idx[o])
        if not keep_idx:
            return empty
        ki = np.concatenate(keep_idx)
        hh = np.array(
            [zlib.crc32(str(x).encode()) for x in langs_a[ki]], dtype=np.int64
        )
        return pa.table(
            {
                "lang": pa.array(langs_a[ki].tolist(), type=pa.string()),
                "doc_id": pa.array(d[ki]),
                "h": pa.array(h[ki]),
                "part": pa.array(hh % 8),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "lang": pa.nulls(0, pa.string()),
                "doc_id": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "lang" not in group.column_names:
            return empty
        langs_a = np.asarray(group["lang"].to_pylist(), dtype=object)
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        h = group["h"].to_numpy(zero_copy_only=False)
        keep_idx = []
        for lang in np.unique(langs_a):
            q = quota_map.get(str(lang), 0)
            if q <= 0:
                continue
            idx = np.flatnonzero(langs_a == lang)
            o = np.lexsort((d[idx], h[idx]))[:q]
            keep_idx.append(idx[o])
        if not keep_idx:
            return empty
        ki = np.concatenate(keep_idx)
        return pa.table(
            {
                "lang": pa.array(langs_a[ki].tolist(), type=pa.string()),
                "doc_id": pa.array(d[ki]),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
        )
        .map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(sample_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def lineitem_rate_grid(sf_dir: str) -> ray.data.Dataset:
    """2-D HISTOGRAM (tax percent x discount percent): row counts and
    revenue cents per cell — the correlation heat-map behind pricing
    dashboards, all-integer so both engines bin identically.

    Physical plan: per-batch 2-D bincount partials (cells are
    dimension-bounded: percents 0-100), one tiny cell%8 exchange."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_tax", "l_discount", "l_extendedprice"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "tax_pct": pa.nulls(0, pa.int64()),
            "disc_pct": pa.nulls(0, pa.int64()),
            "n_rows": pa.nulls(0, pa.int64()),
            "rev_cents": pa.nulls(0, pa.int64()),
            "g": pa.nulls(0, pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "l_tax" not in batch.column_names:
            return EMPTY
        tax = np.floor(
            batch["l_tax"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        dsc = np.floor(
            batch["l_discount"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        cents = np.floor(ep * 100.0).astype(np.int64)
        key = tax * 1024 + dsc
        uk, inv = np.unique(key, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        s = np.bincount(inv, weights=cents.astype(np.float64)).astype(np.int64)
        return pa.table(
            {
                "tax_pct": pa.array(uk // 1024),
                "disc_pct": pa.array(uk % 1024),
                "n_rows": pa.array(n),
                "rev_cents": pa.array(s),
                "g": pa.array(uk % 8),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "tax_pct": pa.nulls(0, pa.int64()),
                "disc_pct": pa.nulls(0, pa.int64()),
                "n_rows": pa.nulls(0, pa.int64()),
                "rev_cents": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "tax_pct" not in group.column_names:
            return empty
        t = group["tax_pct"].to_numpy(zero_copy_only=False)
        d = group["disc_pct"].to_numpy(zero_copy_only=False)
        key = t * 1024 + d
        uk, inv = np.unique(key, return_inverse=True)
        n = np.zeros(uk.shape[0], dtype=np.int64)
        s = np.zeros(uk.shape[0], dtype=np.int64)
        np.add.at(n, inv, group["n_rows"].to_numpy(zero_copy_only=False))
        np.add.at(s, inv, group["rev_cents"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "tax_pct": pa.array(uk // 1024),
                "disc_pct": pa.array(uk % 1024),
                "n_rows": pa.array(n),
                "rev_cents": pa.array(s),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .map_groups(
            lambda t: kernel(t.drop_columns(["g"]))
            if "g" in t.column_names
            else kernel(t),
            batch_format="pyarrow",
        )
    )


def orders_weekday_seasonality(sf_dir: str) -> ray.data.Dataset:
    """Weekday seasonality index: order counts per ISO weekday plus each
    day's share of the week (count and one deterministic division — the
    demand-shape profile behind staffing forecasts).

    Physical plan: per-batch weekday bincount partials, one 7-row
    tail."""
    DAY_US = np.int64(86_400_000_000)

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY_OUT = pa.table(
        {
            "weekday": pa.nulls(0, pa.int64()),
            "n_orders": pa.nulls(0, pa.int64()),
            "share": pa.nulls(0, pa.float64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "o_orderdate" not in batch.column_names:
            return pa.table(
                {
                    "weekday": pa.nulls(0, pa.int64()),
                    "n": pa.nulls(0, pa.int64()),
                    "g": pa.nulls(0, pa.int64()),
                }
            )
        ts = batch["o_orderdate"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        ) if isinstance(batch["o_orderdate"], pa.ChunkedArray) else batch[
            "o_orderdate"
        ].cast(pa.int64()).to_numpy(zero_copy_only=False)
        d = np.asarray(ts, dtype=np.int64) // DAY_US
        # 1970-01-01 was a Thursday; ISO weekday Mon=1..Sun=7
        wd = ((d + 3) % 7) + 1
        n = np.bincount(wd, minlength=8)[1:8]
        nz = np.flatnonzero(n)
        return pa.table(
            {
                "weekday": pa.array((nz + 1).astype(np.int64)),
                "n": pa.array(n[nz].astype(np.int64)),
                "g": pa.array(np.zeros(nz.shape[0], dtype=np.int64)),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "weekday" not in group.column_names:
            return EMPTY_OUT
        wd = group["weekday"].to_numpy(zero_copy_only=False)
        n = group["n"].to_numpy(zero_copy_only=False)
        tot = np.zeros(8, dtype=np.int64)
        np.add.at(tot, wd, n)
        total = int(tot.sum())
        nz = np.flatnonzero(tot)
        share = tot[nz].astype(np.float64) / np.float64(total)
        return pa.table(
            {
                "weekday": pa.array(nz.astype(np.int64)),
                "n_orders": pa.array(tot[nz]),
                "share": pa.array(share),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .map_groups(
            lambda t: kernel(t.drop_columns(["g"]))
            if "g" in t.column_names
            else kernel(t),
            batch_format="pyarrow",
        )
    )


def tpch_q15_top_supplier(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q15 analog (top supplier): supplier(s) with the MAXIMUM
    revenue over a shipdate quarter — ties all returned, the argmax-
    with-ties shape Q15's view formulation demands.

    Physical plan: per-batch (suppkey, cents) partials; ONE suppkey%P
    exchange finishes totals and each partition emits its LOCAL max
    candidates; the P-row tail takes the global max and keeps ties.
    Supplier names broadcast once from a remote build task."""
    import pyarrow.dataset as pads

    lo = pa.scalar(
        np.datetime64("1996-01-01T00:00:00", "us"), type=pa.timestamp("us")
    )
    hi = pa.scalar(
        np.datetime64("1996-04-01T00:00:00", "us"), type=pa.timestamp("us")
    )
    P = 32

    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    @ray.remote
    def build_names(*refs) -> tuple:
        parts = [t for t in refs if t.num_rows]
        if not parts:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=object)
        t = pa.concat_tables(parts)
        sk = t["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sn = np.asarray(t["s_name"].to_pylist(), dtype=object)
        o = np.argsort(sk)
        return sk[o], sn[o]

    names_ref = build_names.remote(*supp.to_arrow_refs())

    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate") >= lo)
        & (pads.field("l_shipdate") < hi),
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "sk": pa.nulls(0, pa.int64()),
            "rev": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "l_suppkey" not in batch.column_names:
            return EMPTY
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        dc = batch["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.floor(ep * (1.0 - dc) * 100.0).astype(np.int64)
        uk, inv = np.unique(sk, return_inverse=True)
        s = np.bincount(inv, weights=rev.astype(np.float64)).astype(np.int64)
        return pa.table(
            {"sk": pa.array(uk), "rev": pa.array(s), "part": pa.array(uk % P)}
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"sk": pa.nulls(0, pa.int64()), "rev": pa.nulls(0, pa.int64())}
        )
        if group.num_rows == 0 or "sk" not in group.column_names:
            return empty
        sk = group["sk"].to_numpy(zero_copy_only=False)
        rev = group["rev"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(sk, return_inverse=True)
        tot = np.zeros(uk.shape[0], dtype=np.int64)
        np.add.at(tot, inv, rev)
        mx = tot.max()
        keep = tot == mx
        return pa.table(
            {"sk": pa.array(uk[keep]), "rev": pa.array(tot[keep])}
        )

    def final(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "s_suppkey": pa.nulls(0, pa.int64()),
                "s_name": pa.nulls(0, pa.string()),
                "total_cents": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        sk = batch["sk"].to_numpy(zero_copy_only=False)
        rev = batch["rev"].to_numpy(zero_copy_only=False)
        mx = rev.max()
        keep = rev == mx
        sk = sk[keep]
        o = np.argsort(sk)
        sk = sk[o]
        keys, names = ray.get(names_ref)
        pos = np.minimum(np.searchsorted(keys, sk), max(keys.shape[0] - 1, 0))
        nm = (
            names[pos]
            if keys.shape[0]
            else np.full(sk.shape[0], "", dtype=object)
        )
        return pa.table(
            {
                "s_suppkey": pa.array(sk),
                "s_name": pa.array(nm.tolist(), type=pa.string()),
                "total_cents": pa.array(np.full(sk.shape[0], mx, np.int64)),
            }
        )

    return (
        line.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def tpch_q17_small_quantity_revenue(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q17 analog (small-quantity-order revenue): total price of
    lineitems whose quantity is below 20% of their part's average
    quantity — the correlated-aggregate-subquery shape, decorrelated.

    Physical plan: pass 1 pre-aggregates (partkey, quantity-sum, count)
    per batch and ONE partkey%P exchange finishes the per-part
    averages; the threshold map (part-dimension, 16 B/part) gathers in
    a REMOTE task and broadcasts once; pass 2 streams lineitem, probes
    via searchsorted and emits one partial row per batch.  Quantities
    are integral doubles so the per-part sums are exact ints and
    0.2*(sum/n) is the same float64 on both engines."""
    P = 32

    def _line(cols):
        return ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=cols
        ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "pk": pa.nulls(0, pa.int64()),
            "qs": pa.nulls(0, pa.int64()),
            "n": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def partial1(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "l_partkey" not in batch.column_names:
            return EMPTY
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        qi = np.floor(q).astype(np.int64)  # integral by data contract
        uk, inv = np.unique(pk, return_inverse=True)
        s = np.bincount(inv, weights=qi.astype(np.float64)).astype(np.int64)
        n = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                "pk": pa.array(uk),
                "qs": pa.array(s),
                "n": pa.array(n),
                "part": pa.array(uk % P),
            }
        )

    def kernel1(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "pk": pa.nulls(0, pa.int64()),
                "qs": pa.nulls(0, pa.int64()),
                "n": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "pk" not in group.column_names:
            return empty
        pk = group["pk"].to_numpy(zero_copy_only=False)
        qs = group["qs"].to_numpy(zero_copy_only=False)
        n = group["n"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(pk, return_inverse=True)
        ts = np.zeros(uk.shape[0], dtype=np.int64)
        tn = np.zeros(uk.shape[0], dtype=np.int64)
        np.add.at(ts, inv, qs)
        np.add.at(tn, inv, n)
        return pa.table(
            {"pk": pa.array(uk), "qs": pa.array(ts), "n": pa.array(tn)}
        )

    avgs = (
        _line(["l_partkey", "l_quantity"])
        .map_batches(partial1, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel1, batch_format="pyarrow")
    )

    @ray.remote
    def build_limits(*refs) -> tuple:
        parts = [t for t in refs if t.num_rows and "pk" in t.column_names]
        if not parts:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        t = pa.concat_tables(parts)
        pk = t["pk"].to_numpy(zero_copy_only=False)
        qs = t["qs"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        lim = 0.2 * (qs / n)
        o = np.argsort(pk)
        return pk[o], lim[o]

    lim_ref = build_limits.remote(*avgs.to_arrow_refs())

    EMPTY_OUT = pa.table(
        {
            "total_cents": pa.nulls(0, pa.int64()),
            "n_rows": pa.nulls(0, pa.int64()),
        }
    )

    def partial2(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "c": pa.nulls(0, pa.int64()),
                "n": pa.nulls(0, pa.int64()),
                "g": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "l_partkey" not in batch.column_names:
            return empty
        keys, lims = ray.get(lim_ref)
        if keys.shape[0] == 0:
            return empty
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(keys, pk), keys.shape[0] - 1)
        hit = (keys[pos] == pk) & (q < lims[pos])
        if not hit.any():
            return empty
        cents = np.floor(ep[hit] * 100.0).astype(np.int64)
        return pa.table(
            {
                "c": pa.array([int(cents.sum())], type=pa.int64()),
                "n": pa.array([int(hit.sum())], type=pa.int64()),
                "g": pa.array([0], type=pa.int64()),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "c" not in group.column_names:
            return EMPTY_OUT
        return pa.table(
            {
                "total_cents": pa.array(
                    [int(group["c"].to_numpy(zero_copy_only=False).sum())],
                    type=pa.int64(),
                ),
                "n_rows": pa.array(
                    [int(group["n"].to_numpy(zero_copy_only=False).sum())],
                    type=pa.int64(),
                ),
            }
        )

    return (
        _line(["l_partkey", "l_quantity", "l_extendedprice"])
        .map_batches(partial2, batch_format="pyarrow")
        .groupby("g")
        .map_groups(
            lambda t: final(t.drop_columns(["g"]))
            if "g" in t.column_names
            else final(t),
            batch_format="pyarrow",
        )
    )


def tpch_q19_bracket_revenue(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q19 analog (discounted revenue, OR-of-ANDs brackets):
    revenue from three (brand, size-range, quantity-range) brackets —
    the multi-predicate join Q19 uses to stress OR pushdown.

    Physical plan: the part dimension reduces to sorted (partkey ->
    brand-code, size) arrays broadcast once; lineitem streams, probes
    with one searchsorted and evaluates all three brackets vectorized;
    one partial row per batch."""
    BRACKETS = (
        ("Brand#12", 1, 10, 1, 11),
        ("Brand#23", 1, 15, 10, 20),
        ("Brand#34", 1, 25, 20, 30),
    )

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    @ray.remote
    def build_dims(*refs) -> tuple:
        parts = [t for t in refs if t.num_rows]
        if not parts:
            return (
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64),
            )
        t = pa.concat_tables(parts)
        pk = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        brands = [b for b, *_ in BRACKETS]
        bcode = np.full(pk.shape[0], -1, dtype=np.int64)
        bp = t["p_brand"].to_pylist()
        for i, b in enumerate(brands):
            m = np.asarray([x == b for x in bp])
            bcode[m] = i
        sz = t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(pk)
        return pk[o], bcode[o], sz[o]

    dims_ref = build_dims.remote(*part.to_arrow_refs())

    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY_OUT = pa.table(
        {
            "revenue_cents": pa.nulls(0, pa.int64()),
            "n_rows": pa.nulls(0, pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "c": pa.nulls(0, pa.int64()),
                "n": pa.nulls(0, pa.int64()),
                "g": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "l_partkey" not in batch.column_names:
            return empty
        keys, bcode, sz = ray.get(dims_ref)
        if keys.shape[0] == 0:
            return empty
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = batch["l_quantity"].to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(keys, pk), keys.shape[0] - 1)
        ok = keys[pos] == pk
        bc, s = bcode[pos], sz[pos]
        hit = np.zeros(pk.shape[0], dtype=bool)
        for i, (_, slo, shi, qlo, qhi) in enumerate(BRACKETS):
            hit |= (
                ok
                & (bc == i)
                & (s >= slo)
                & (s <= shi)
                & (q >= qlo)
                & (q <= qhi)
            )
        if not hit.any():
            return empty
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[hit]
        dc = batch["l_discount"].to_numpy(zero_copy_only=False)[hit]
        cents = np.floor(ep * (1.0 - dc) * 100.0).astype(np.int64)
        return pa.table(
            {
                "c": pa.array([int(cents.sum())], type=pa.int64()),
                "n": pa.array([int(hit.sum())], type=pa.int64()),
                "g": pa.array([0], type=pa.int64()),
            }
        )

    def final(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "c" not in group.column_names:
            return EMPTY_OUT
        return pa.table(
            {
                "revenue_cents": pa.array(
                    [int(group["c"].to_numpy(zero_copy_only=False).sum())],
                    type=pa.int64(),
                ),
                "n_rows": pa.array(
                    [int(group["n"].to_numpy(zero_copy_only=False).sum())],
                    type=pa.int64(),
                ),
            }
        )

    return (
        line.map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .map_groups(
            lambda t: final(t.drop_columns(["g"]))
            if "g" in t.column_names
            else final(t),
            batch_format="pyarrow",
        )
    )


def tpch_q7_nation_volume(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q7 analog (volume shipping): revenue between every ordered
    pair of DIFFERENT supplier/customer nations per ship year.

    Physical plan: supplier->nation, customer->nation and nation-name
    maps build once in a remote task (all dimension-sized; customer is
    the largest and an order of magnitude under orders — the q5
    broadcast discipline); lineitem pre-aggregates (orderkey,
    supp-nation, year) cent partials per batch and meets the orders
    (orderkey -> cust-nation) stream in ONE orderkey%P exchange; the
    kernel joins and collapses to (supp_nation, cust_nation, year)
    locals, so the tail reduce is <= P x pairs x years rows."""
    import pyarrow.dataset as pads

    lo = pa.scalar(
        np.datetime64("1996-01-01T00:00:00", "us"), type=pa.timestamp("us")
    )
    hi = pa.scalar(
        np.datetime64("1998-01-01T00:00:00", "us"), type=pa.timestamp("us")
    )
    P = 32

    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    nation = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    @ray.remote
    def build_state(ns: int, nc: int, *refs) -> tuple:
        sp = [t for t in refs[:ns] if t.num_rows]
        cp = [t for t in refs[ns:ns + nc] if t.num_rows]
        npp = [t for t in refs[ns + nc:] if t.num_rows]
        if not sp or not cp or not npp:
            e = np.empty(0, dtype=np.int64)
            return e, e, e, e, e, np.empty(0, dtype=object)
        st = pa.concat_tables(sp)
        ct = pa.concat_tables(cp)
        nt = pa.concat_tables(npp)
        sk = st["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sn = st["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(sk)
        ck = ct["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cn = ct["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        o2 = np.argsort(ck)
        nk = nt["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nn = np.asarray(nt["n_name"].to_pylist(), dtype=object)
        o3 = np.argsort(nk)
        return sk[o], sn[o], ck[o2], cn[o2], nk[o3], nn[o3]

    s_refs = supp.to_arrow_refs()
    c_refs = cust.to_arrow_refs()
    n_refs = nation.to_arrow_refs()
    state_ref = build_state.remote(
        len(s_refs), len(c_refs), *s_refs, *c_refs, *n_refs
    )

    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=(pads.field("l_shipdate") >= lo)
        & (pads.field("l_shipdate") < hi),
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "ok": pa.nulls(0, pa.int64()),
            "v": pa.nulls(0, pa.int64()),
            "k2": pa.nulls(0, pa.int64()),
            "side": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def tag_line(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "l_orderkey" not in batch.column_names:
            return EMPTY
        sk_keys, sn_vals, *_ = ray.get(state_ref)
        if sk_keys.shape[0] == 0:
            return EMPTY
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        su = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        dc = batch["l_discount"].to_numpy(zero_copy_only=False)
        ts = batch["l_shipdate"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        ) if isinstance(batch["l_shipdate"], pa.ChunkedArray) else batch[
            "l_shipdate"
        ].cast(pa.int64()).to_numpy(zero_copy_only=False)
        year = (
            np.asarray(ts, dtype="int64").astype("datetime64[us]")
            .astype("datetime64[Y]").astype(np.int64) + 1970
        )
        pos = np.minimum(np.searchsorted(sk_keys, su), sk_keys.shape[0] - 1)
        snat = sn_vals[pos]
        cents = np.floor(ep * (1.0 - dc) * 100.0).astype(np.int64)
        # pre-aggregate per (orderkey, supp-nation, year); the %32/%8
        # folds only DISAMBIGUATE within the composite (25 nations, a
        # 2-year ship window) — the exact (snat, year) ride on the
        # representative row's k2 payload
        key = (ok * 32 + snat % 32) * 8 + (year % 8)
        uk, inv = np.unique(key, return_inverse=True)
        s = np.bincount(inv, weights=cents.astype(np.float64)).astype(np.int64)
        reps = np.full(uk.shape[0], key.shape[0], dtype=np.int64)
        np.minimum.at(reps, inv, np.arange(key.shape[0], dtype=np.int64))
        return pa.table(
            {
                "ok": pa.array(ok[reps]),
                "v": pa.array(s),
                "k2": pa.array(snat[reps] * 10000 + year[reps]),
                "side": pa.array(np.zeros(uk.shape[0], dtype=np.int64)),
                "part": pa.array(ok[reps] % P),
            }
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "o_orderkey" not in batch.column_names:
            return EMPTY
        _, _, ck_keys, cn_vals, *_ = ray.get(state_ref)
        if ck_keys.shape[0] == 0:
            return EMPTY
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cu = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.minimum(np.searchsorted(ck_keys, cu), ck_keys.shape[0] - 1)
        cnat = cn_vals[pos]
        return pa.table(
            {
                "ok": pa.array(ok),
                "v": pa.array(np.zeros(ok.shape[0], dtype=np.int64)),
                "k2": pa.array(cnat),
                "side": pa.array(np.ones(ok.shape[0], dtype=np.int64)),
                "part": pa.array(ok % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "sn": pa.nulls(0, pa.int64()),
                "cn": pa.nulls(0, pa.int64()),
                "l_year": pa.nulls(0, pa.int64()),
                "rev": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "ok" not in group.column_names:
            return empty
        ok = group["ok"].to_numpy(zero_copy_only=False)
        v = group["v"].to_numpy(zero_copy_only=False)
        k2 = group["k2"].to_numpy(zero_copy_only=False)
        side = group["side"].to_numpy(zero_copy_only=False)
        iso = side == 1
        ook, ocn = ok[iso], k2[iso]
        lk, lv, lsy = ok[~iso], v[~iso], k2[~iso]
        if ook.shape[0] == 0 or lk.shape[0] == 0:
            return empty
        o = np.argsort(ook)
        ook, ocn = ook[o], ocn[o]
        pos = np.minimum(np.searchsorted(ook, lk), ook.shape[0] - 1)
        hit = ook[pos] == lk
        if not hit.any():
            return empty
        snat = lsy[hit] // 10000
        year = lsy[hit] % 10000
        cnat = ocn[pos[hit]]
        keep = snat != cnat
        if not keep.any():
            return empty
        key = (snat[keep] * 64 + cnat[keep]) * 10000 + year[keep]
        uk, inv = np.unique(key, return_inverse=True)
        s = np.bincount(
            inv, weights=lv[hit][keep].astype(np.float64)
        ).astype(np.int64)
        return pa.table(
            {
                "sn": pa.array(uk // 640000),
                "cn": pa.array((uk // 10000) % 64),
                "l_year": pa.array(uk % 10000),
                "rev": pa.array(s),
            }
        )

    def final(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "supp_nation": pa.nulls(0, pa.string()),
                "cust_nation": pa.nulls(0, pa.string()),
                "l_year": pa.nulls(0, pa.int64()),
                "revenue_cents": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        sn = batch["sn"].to_numpy(zero_copy_only=False)
        cn = batch["cn"].to_numpy(zero_copy_only=False)
        yr = batch["l_year"].to_numpy(zero_copy_only=False)
        rv = batch["rev"].to_numpy(zero_copy_only=False)
        key = (sn * 64 + cn) * 10000 + yr
        uk, inv = np.unique(key, return_inverse=True)
        tot = np.zeros(uk.shape[0], dtype=np.int64)
        np.add.at(tot, inv, rv)
        _, _, _, _, nk, nn = ray.get(state_ref)
        sn_u = (uk // 640000).astype(np.int64)
        cn_u = ((uk // 10000) % 64).astype(np.int64)
        p1 = np.minimum(np.searchsorted(nk, sn_u), max(nk.shape[0] - 1, 0))
        p2 = np.minimum(np.searchsorted(nk, cn_u), max(nk.shape[0] - 1, 0))
        return pa.table(
            {
                "supp_nation": pa.array(nn[p1].tolist(), type=pa.string()),
                "cust_nation": pa.array(nn[p2].tolist(), type=pa.string()),
                "l_year": pa.array((uk % 10000).astype(np.int64)),
                "revenue_cents": pa.array(tot),
            }
        )

    return (
        line.map_batches(tag_line, batch_format="pyarrow")
        .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def bpe_fertility_by_lang(sf_dir: str) -> ray.data.Dataset:
    """Tokenizer EQUITY metric (multilingual fertility): BPE tokens per
    whitespace word, per language — the statistic that shows which
    languages a tokenizer taxes.  Uses the same 12-merge sample-trained
    tokenizer as bpe_compression.

    Physical plan: the encode pass emits (doc_id, n_tokens) and the
    lang pass (doc_id, lang, n_words); both collapse to skinny int64
    rows and meet in ONE doc_id%P exchange; kernels emit per-lang
    partials so the tail is langs x P rows."""
    from libpostal_ray.pipelines.bpe import bpe_encode_counts, train_bpe

    P = 32

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    merges = train_bpe(ds, n_merges=12, sample_mod=16)
    counts = bpe_encode_counts(ds, merges)

    EMPTY = pa.table(
        {
            "doc_id": pa.nulls(0, pa.int64()),
            "v": pa.nulls(0, pa.int64()),
            "lang": pa.nulls(0, pa.string()),
            "side": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def tag_counts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return EMPTY
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(d),
                "v": pa.array(
                    batch["n_tokens"].to_numpy(zero_copy_only=False).astype(
                        np.int64
                    )
                ),
                "lang": pa.array([""] * d.shape[0], type=pa.string()),
                "side": pa.array(np.zeros(d.shape[0], dtype=np.int64)),
                "part": pa.array(d % P),
            }
        )

    def tag_words(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return EMPTY
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = np.array(
            [len((t or "").split()) for t in batch["text"].to_pylist()],
            dtype=np.int64,
        )
        return pa.table(
            {
                "doc_id": pa.array(d),
                "v": pa.array(w),
                "lang": batch["lang"],
                "side": pa.array(np.ones(d.shape[0], dtype=np.int64)),
                "part": pa.array(d % P),
            }
        )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "lang": pa.nulls(0, pa.string()),
                "n_docs": pa.nulls(0, pa.int64()),
                "n_words": pa.nulls(0, pa.int64()),
                "n_tokens": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "doc_id" not in group.column_names:
            return empty
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        v = group["v"].to_numpy(zero_copy_only=False)
        side = group["side"].to_numpy(zero_copy_only=False)
        isw = side == 1
        wd, wv = d[isw], v[isw]
        td, tv = d[~isw], v[~isw]
        if wd.shape[0] == 0:
            return empty
        o = np.argsort(td)
        td, tv = td[o], tv[o]
        pos = np.minimum(np.searchsorted(td, wd), max(td.shape[0] - 1, 0))
        hit = (td.shape[0] > 0) & (td[pos] == wd) if td.shape[0] else (
            np.zeros(wd.shape[0], dtype=bool)
        )
        toks = np.where(hit, tv[pos] if td.shape[0] else 0, 0)
        lenc = group["lang"].combine_chunks().take(
            pa.array(np.flatnonzero(isw))
        ).dictionary_encode()
        codes = lenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nd = np.bincount(codes, minlength=len(lenc.dictionary))
        nw = np.bincount(
            codes, weights=wv.astype(np.float64), minlength=len(lenc.dictionary)
        ).astype(np.int64)
        nt = np.bincount(
            codes, weights=toks.astype(np.float64),
            minlength=len(lenc.dictionary),
        ).astype(np.int64)
        return pa.table(
            {
                "lang": lenc.dictionary,
                "n_docs": pa.array(nd.astype(np.int64)),
                "n_words": pa.array(nw),
                "n_tokens": pa.array(nt),
            }
        )

    def final(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "lang": pa.nulls(0, pa.string()),
                "n_docs": pa.nulls(0, pa.int64()),
                "n_words": pa.nulls(0, pa.int64()),
                "n_tokens": pa.nulls(0, pa.int64()),
                "fertility": pa.nulls(0, pa.float64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        lenc = batch["lang"].combine_chunks().dictionary_encode()
        codes = lenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nd = np.zeros(len(lenc.dictionary), dtype=np.int64)
        nw = np.zeros(len(lenc.dictionary), dtype=np.int64)
        nt = np.zeros(len(lenc.dictionary), dtype=np.int64)
        np.add.at(nd, codes, batch["n_docs"].to_numpy(zero_copy_only=False))
        np.add.at(nw, codes, batch["n_words"].to_numpy(zero_copy_only=False))
        np.add.at(nt, codes, batch["n_tokens"].to_numpy(zero_copy_only=False))
        f = np.divide(
            nt.astype(np.float64),
            nw.astype(np.float64),
            out=np.zeros(nt.shape[0], dtype=np.float64),
            where=nw != 0,
        )
        return pa.table(
            {
                "lang": lenc.dictionary,
                "n_docs": pa.array(nd),
                "n_words": pa.array(nw),
                "n_tokens": pa.array(nt),
                "fertility": pa.array(f),
            }
        )

    return (
        counts.map_batches(tag_counts, batch_format="pyarrow")
        .union(docs.map_batches(tag_words, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def tpch_q21_waiting_suppliers(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q21 analog (suppliers who kept orders waiting): top 10
    suppliers who were the ONLY late shipper (shipdate > orderdate+45d)
    on a multi-supplier order — the EXISTS + NOT-EXISTS double
    correlated-subquery shape, decorrelated.

    Physical plan: lineitem pre-reduces to per-batch (orderkey,
    suppkey, max shipdate) triples (the late test only needs each
    pair's max); ONE orderkey%P exchange joins the orders stream, so
    each order's supplier set, late set, and the |S|>1 AND |L|=={s}
    qualification all resolve vectorized in its partition; per-supplier
    counts reduce through a P x suppliers tail with names broadcast
    once."""
    P = 32
    K = 10
    LATE_US = np.int64(45) * 86_400_000_000

    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    @ray.remote
    def build_names(*refs) -> tuple:
        parts = [t for t in refs if t.num_rows]
        if not parts:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=object)
        t = pa.concat_tables(parts)
        sk = t["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sn = np.asarray(t["s_name"].to_pylist(), dtype=object)
        o = np.argsort(sk)
        return sk[o], sn[o]

    names_ref = build_names.remote(*supp.to_arrow_refs())

    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "ok": pa.nulls(0, pa.int64()),
            "sk": pa.nulls(0, pa.int64()),
            "ts": pa.nulls(0, pa.int64()),
            "side": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def _us(col) -> np.ndarray:
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        return np.asarray(
            arr.cast(pa.int64()).to_numpy(zero_copy_only=False), dtype=np.int64
        )

    def tag_line(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "l_orderkey" not in batch.column_names:
            return EMPTY
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = _us(batch["l_shipdate"])
        # per (orderkey, suppkey) max shipdate — pair-dedup via lexsort
        order = np.lexsort((ts, sk, ok))
        ok, sk, ts = ok[order], sk[order], ts[order]
        last = np.concatenate(
            ((ok[1:] != ok[:-1]) | (sk[1:] != sk[:-1]), [True])
        )
        ok, sk, ts = ok[last], sk[last], ts[last]
        return pa.table(
            {
                "ok": pa.array(ok),
                "sk": pa.array(sk),
                "ts": pa.array(ts),
                "side": pa.array(np.zeros(ok.shape[0], dtype=np.int64)),
                "part": pa.array(ok % P),
            }
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "o_orderkey" not in batch.column_names:
            return EMPTY
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "ok": pa.array(ok),
                "sk": pa.array(np.zeros(ok.shape[0], dtype=np.int64)),
                "ts": pa.array(_us(batch["o_orderdate"])),
                "side": pa.array(np.ones(ok.shape[0], dtype=np.int64)),
                "part": pa.array(ok % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"sk": pa.nulls(0, pa.int64()), "n": pa.nulls(0, pa.int64())}
        )
        if group.num_rows == 0 or "ok" not in group.column_names:
            return empty
        ok = group["ok"].to_numpy(zero_copy_only=False)
        sk = group["sk"].to_numpy(zero_copy_only=False)
        ts = group["ts"].to_numpy(zero_copy_only=False)
        side = group["side"].to_numpy(zero_copy_only=False)
        iso = side == 1
        ook, ots = ok[iso], ts[iso]
        lk, ls, lt = ok[~iso], sk[~iso], ts[~iso]
        if ook.shape[0] == 0 or lk.shape[0] == 0:
            return empty
        # merge per (order, supp) max shipdate across batch partials
        o = np.lexsort((lt, ls, lk))
        lk, ls, lt = lk[o], ls[o], lt[o]
        last = np.concatenate(
            ((lk[1:] != lk[:-1]) | (ls[1:] != ls[:-1]), [True])
        )
        lk, ls, lt = lk[last], ls[last], lt[last]
        # attach orderdate
        oo = np.argsort(ook)
        ook, ots = ook[oo], ots[oo]
        pos = np.minimum(np.searchsorted(ook, lk), ook.shape[0] - 1)
        hit = ook[pos] == lk
        lk, ls, lt, od = lk[hit], ls[hit], lt[hit], ots[pos[hit]]
        if lk.shape[0] == 0:
            return empty
        late = lt > od + LATE_US
        # per order: #suppliers and #late suppliers (rows are distinct
        # (order, supplier) pairs, sorted by order)
        starts = np.flatnonzero(
            np.concatenate(([True], lk[1:] != lk[:-1]))
        )
        n_supp = np.diff(np.append(starts, lk.shape[0]))
        seg = np.repeat(np.arange(starts.shape[0], dtype=np.int64), n_supp)
        n_late = np.zeros(starts.shape[0], dtype=np.int64)
        np.add.at(n_late, seg, late.astype(np.int64))
        qual_order = (n_supp >= 2) & (n_late == 1)
        qual_row = qual_order[seg] & late
        if not qual_row.any():
            return empty
        wk, cnt = np.unique(ls[qual_row], return_counts=True)
        return pa.table(
            {"sk": pa.array(wk), "n": pa.array(cnt.astype(np.int64))}
        )

    def final(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "s_suppkey": pa.nulls(0, pa.int64()),
                "s_name": pa.nulls(0, pa.string()),
                "n_orders": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        sk = batch["sk"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(sk, return_inverse=True)
        tot = np.zeros(uk.shape[0], dtype=np.int64)
        np.add.at(tot, inv, n)
        order = np.lexsort((uk, -tot))[:K]
        uk, tot = uk[order], tot[order]
        keys, names = ray.get(names_ref)
        pos = np.minimum(np.searchsorted(keys, uk), max(keys.shape[0] - 1, 0))
        nm = (
            names[pos]
            if keys.shape[0]
            else np.full(uk.shape[0], "", dtype=object)
        )
        return pa.table(
            {
                "s_suppkey": pa.array(uk),
                "s_name": pa.array(nm.tolist(), type=pa.string()),
                "n_orders": pa.array(tot),
            }
        )

    return (
        line.map_batches(tag_line, batch_format="pyarrow")
        .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def tpch_q8_market_share(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q8 analog (national market share): NATION_3 suppliers'
    share of revenue sold into ASIA-region customers, per order year —
    numerator/denominator as exact cents plus the one deterministic
    share division.

    Physical plan: the q7 shape with region gating — supplier->is-
    target-nation and customer->is-in-region maps build once in a
    remote task (dimension-sized); lineitem pre-aggregates (orderkey,
    is-target, cents) per batch and meets the orders (orderkey, year,
    custkey-in-region) stream in ONE orderkey%P exchange; kernels
    collapse to per-year (nation, total) cent partials."""
    P = 32
    TARGET_NATION = "NATION_3"
    TARGET_REGION = "ASIA"

    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    nation = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    region = ray.data.read_parquet(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    @ray.remote
    def build_state(ns: int, nc: int, nn: int, *refs) -> tuple:
        sp = [t for t in refs[:ns] if t.num_rows]
        cp = [t for t in refs[ns:ns + nc] if t.num_rows]
        np_ = [t for t in refs[ns + nc:ns + nc + nn] if t.num_rows]
        rp = [t for t in refs[ns + nc + nn:] if t.num_rows]
        e = np.empty(0, dtype=np.int64)
        if not sp or not cp or not np_ or not rp:
            return e, e.astype(bool), e, e.astype(bool)
        st, ct = pa.concat_tables(sp), pa.concat_tables(cp)
        nt, rt = pa.concat_tables(np_), pa.concat_tables(rp)
        rkeys = rt["r_regionkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        rnames = rt["r_name"].to_pylist()
        target_rk = {
            k for k, nm in zip(rkeys, rnames) if nm == TARGET_REGION
        }
        nk = nt["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nnm = nt["n_name"].to_pylist()
        nrk = nt["n_regionkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        target_nk = {
            k for k, nm in zip(nk, nnm) if nm == TARGET_NATION
        }
        region_nk = {int(k) for k, r in zip(nk, nrk) if int(r) in target_rk}
        sk = st["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sn = st["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(sk)
        s_is_target = np.isin(
            sn[o], np.asarray(sorted(target_nk), dtype=np.int64)
        )
        ck = ct["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cn = ct["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        o2 = np.argsort(ck)
        c_in_region = np.isin(
            cn[o2], np.asarray(sorted(region_nk), dtype=np.int64)
        )
        return sk[o], s_is_target, ck[o2], c_in_region

    s_refs = supp.to_arrow_refs()
    c_refs = cust.to_arrow_refs()
    n_refs = nation.to_arrow_refs()
    r_refs = region.to_arrow_refs()
    state_ref = build_state.remote(
        len(s_refs), len(c_refs), len(n_refs),
        *s_refs, *c_refs, *n_refs, *r_refs,
    )

    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "ok": pa.nulls(0, pa.int64()),
            "a": pa.nulls(0, pa.int64()),
            "b": pa.nulls(0, pa.int64()),
            "side": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def tag_line(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "l_orderkey" not in batch.column_names:
            return EMPTY
        sk_keys, s_tgt, *_ = ray.get(state_ref)
        if sk_keys.shape[0] == 0:
            return EMPTY
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        su = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        dc = batch["l_discount"].to_numpy(zero_copy_only=False)
        cents = np.floor(ep * (1.0 - dc) * 100.0).astype(np.int64)
        pos = np.minimum(np.searchsorted(sk_keys, su), sk_keys.shape[0] - 1)
        tgt = s_tgt[pos] & (sk_keys[pos] == su)
        # per (orderkey, is-target) cent partials
        key = ok * 2 + tgt.astype(np.int64)
        uk, inv = np.unique(key, return_inverse=True)
        s = np.bincount(inv, weights=cents.astype(np.float64)).astype(np.int64)
        return pa.table(
            {
                "ok": pa.array(uk // 2),
                "a": pa.array(uk % 2),   # is-target flag
                "b": pa.array(s),        # cents
                "side": pa.array(np.zeros(uk.shape[0], dtype=np.int64)),
                "part": pa.array((uk // 2) % P),
            }
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "o_orderkey" not in batch.column_names:
            return EMPTY
        _, _, ck_keys, c_reg = ray.get(state_ref)
        if ck_keys.shape[0] == 0:
            return EMPTY
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cu = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch["o_orderdate"].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        ) if isinstance(batch["o_orderdate"], pa.ChunkedArray) else batch[
            "o_orderdate"
        ].cast(pa.int64()).to_numpy(zero_copy_only=False)
        year = (
            np.asarray(ts, dtype="int64").astype("datetime64[us]")
            .astype("datetime64[Y]").astype(np.int64) + 1970
        )
        pos = np.minimum(np.searchsorted(ck_keys, cu), ck_keys.shape[0] - 1)
        inr = c_reg[pos] & (ck_keys[pos] == cu)
        keep = inr
        if not keep.any():
            return EMPTY
        return pa.table(
            {
                "ok": pa.array(ok[keep]),
                "a": pa.array(year[keep]),
                "b": pa.array(np.zeros(int(keep.sum()), dtype=np.int64)),
                "side": pa.array(np.ones(int(keep.sum()), dtype=np.int64)),
                "part": pa.array(ok[keep] % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "o_year": pa.nulls(0, pa.int64()),
                "nat": pa.nulls(0, pa.int64()),
                "tot": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "ok" not in group.column_names:
            return empty
        ok = group["ok"].to_numpy(zero_copy_only=False)
        a = group["a"].to_numpy(zero_copy_only=False)
        b = group["b"].to_numpy(zero_copy_only=False)
        side = group["side"].to_numpy(zero_copy_only=False)
        iso = side == 1
        ook, oyr = ok[iso], a[iso]
        lk, ltg, lc = ok[~iso], a[~iso], b[~iso]
        if ook.shape[0] == 0 or lk.shape[0] == 0:
            return empty
        o = np.argsort(ook)
        ook, oyr = ook[o], oyr[o]
        pos = np.minimum(np.searchsorted(ook, lk), ook.shape[0] - 1)
        hit = ook[pos] == lk
        if not hit.any():
            return empty
        yr = oyr[pos[hit]]
        tg = ltg[hit]
        c = lc[hit]
        uy, inv = np.unique(yr, return_inverse=True)
        tot = np.bincount(inv, weights=c.astype(np.float64)).astype(np.int64)
        nat = np.bincount(
            inv, weights=(c * tg).astype(np.float64), minlength=uy.shape[0]
        ).astype(np.int64)
        return pa.table(
            {
                "o_year": pa.array(uy),
                "nat": pa.array(nat),
                "tot": pa.array(tot),
            }
        )

    def final(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "o_year": pa.nulls(0, pa.int64()),
                "nation_cents": pa.nulls(0, pa.int64()),
                "total_cents": pa.nulls(0, pa.int64()),
                "share": pa.nulls(0, pa.float64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        yr = batch["o_year"].to_numpy(zero_copy_only=False)
        nat = batch["nat"].to_numpy(zero_copy_only=False)
        tot = batch["tot"].to_numpy(zero_copy_only=False)
        uy, inv = np.unique(yr, return_inverse=True)
        tn = np.zeros(uy.shape[0], dtype=np.int64)
        tt = np.zeros(uy.shape[0], dtype=np.int64)
        np.add.at(tn, inv, nat)
        np.add.at(tt, inv, tot)
        share = np.divide(
            tn.astype(np.float64),
            tt.astype(np.float64),
            out=np.zeros(tn.shape[0], dtype=np.float64),
            where=tt != 0,
        )
        return pa.table(
            {
                "o_year": pa.array(uy.astype(np.int64)),
                "nation_cents": pa.array(tn),
                "total_cents": pa.array(tt),
                "share": pa.array(share),
            }
        )

    return (
        line.map_batches(tag_line, batch_format="pyarrow")
        .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def tpch_q18_large_orders(sf_dir: str, min_qty: int = 250) -> ray.data.Dataset:
    """TPC-H Q18 analog (large-volume customers): orders whose total
    lineitem quantity exceeds ``min_qty``, joined back to the customer —
    the HAVING-on-a-grouped-subquery shape (reference philosophy: find
    the few heavy rows without materializing the join for all rows).

    Physical plan: lineitem pre-aggregates (orderkey, qty-sum) per
    batch, ONE orderkey%P exchange finishes per-order sums and filters
    > min_qty; the surviving set is TINY (p99 of order quantity sums is
    ~270 at threshold 250) so it gathers in a remote task and
    broadcasts.  Orders then stream once, probe via searchsorted, and
    attach the customer name from the dimension-sized customer map.
    Quantities are integral doubles -> exact int sums on both engines."""
    P = 32

    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "ok": pa.nulls(0, pa.int64()),
            "qs": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "l_orderkey" not in batch.column_names:
            return EMPTY
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        qi = np.floor(
            batch["l_quantity"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        uk, inv = np.unique(ok, return_inverse=True)
        s = np.bincount(inv, weights=qi.astype(np.float64)).astype(np.int64)
        return pa.table(
            {"ok": pa.array(uk), "qs": pa.array(s), "part": pa.array(uk % P)}
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"ok": pa.nulls(0, pa.int64()), "qs": pa.nulls(0, pa.int64())}
        )
        if group.num_rows == 0 or "ok" not in group.column_names:
            return empty
        ok = group["ok"].to_numpy(zero_copy_only=False)
        qs = group["qs"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(ok, return_inverse=True)
        tot = np.zeros(uk.shape[0], dtype=np.int64)
        np.add.at(tot, inv, qs)
        keep = tot > min_qty
        return pa.table({"ok": pa.array(uk[keep]), "qs": pa.array(tot[keep])})

    big = (
        line.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    @ray.remote
    def build_state(nb: int, *refs) -> tuple:
        bp = [t for t in refs[:nb] if t.num_rows and "ok" in t.column_names]
        cp = [t for t in refs[nb:] if t.num_rows]
        e = np.empty(0, dtype=np.int64)
        if not bp or not cp:
            return e, e, e, []
        bt, ct = pa.concat_tables(bp), pa.concat_tables(cp)
        ok = bt["ok"].to_numpy(zero_copy_only=False)
        qs = bt["qs"].to_numpy(zero_copy_only=False)
        o = np.argsort(ok)
        ck = ct["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        o2 = np.argsort(ck)
        names = np.asarray(ct["c_name"].to_pylist(), dtype=object)[o2]
        return ok[o], qs[o], ck[o2], list(names)

    b_refs = big.to_arrow_refs()
    state_ref = build_state.remote(
        len(b_refs), *b_refs, *cust.to_arrow_refs()
    )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY_OUT = pa.table(
        {
            "c_custkey": pa.nulls(0, pa.int64()),
            "c_name": pa.nulls(0, pa.large_string()),
            "o_orderkey": pa.nulls(0, pa.int64()),
            "total_cents": pa.nulls(0, pa.int64()),
            "sum_qty": pa.nulls(0, pa.int64()),
        }
    )

    def probe(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "o_orderkey" not in batch.column_names:
            return EMPTY_OUT
        keys, qs, ck, names = ray.get(state_ref)
        if keys.shape[0] == 0:
            return EMPTY_OUT
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.minimum(np.searchsorted(keys, ok), keys.shape[0] - 1)
        hit = keys[pos] == ok
        if not hit.any():
            return EMPTY_OUT
        cu = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )[hit]
        tp = batch["o_totalprice"].to_numpy(zero_copy_only=False)[hit]
        cents = np.floor(tp * 100.0).astype(np.int64)
        cpos = np.minimum(np.searchsorted(ck, cu), ck.shape[0] - 1)
        cn = [names[i] if ck[i] == u else "" for i, u in zip(cpos, cu)]
        return pa.table(
            {
                "c_custkey": pa.array(cu),
                "c_name": pa.array(cn, type=pa.large_string()),
                "o_orderkey": pa.array(ok[hit]),
                "total_cents": pa.array(cents),
                "sum_qty": pa.array(qs[pos[hit]]),
            }
        )

    return orders.map_batches(probe, batch_format="pyarrow")


def tpch_q16_supplier_counts(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q16 analog (parts/supplier relationship): how many distinct
    suppliers ship each (brand, type, size) combination, excluding one
    brand, one type, and a NOT-IN set of suppliers (name ending in
    '7' stands in for the reference's complaint predicate).  The
    distinct (partkey, suppkey) pairs of lineitem play partsupp.

    Physical plan: part attributes and the excluded-supplier set are
    dimensions -> ONE remote build + broadcast; lineitem emits
    per-batch distinct (partkey, suppkey) pairs, an orderless
    partkey%P exchange dedups pairs globally and rewrites partkey ->
    dense attr-triple id; the final pass dedups (triple, suppkey)
    across partitions (bounded by |triples| x |suppliers| — dimension
    arithmetic, not fact arithmetic) and counts."""
    P = 32
    EXCL_BRAND, EXCL_TYPE = "Brand#13", "PROMO"

    part_ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    @ray.remote
    def build_state(np_: int, *refs) -> tuple:
        pp = [t for t in refs[:np_] if t.num_rows]
        sp = [t for t in refs[np_:] if t.num_rows]
        e = np.empty(0, dtype=np.int64)
        if not pp:
            return e, e, [], e
        pt = pa.concat_tables(pp)
        pk = pt["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        brand = np.asarray(pt["p_brand"].to_pylist(), dtype=object)
        typ = np.asarray(pt["p_type"].to_pylist(), dtype=object)
        size = pt["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (brand != EXCL_BRAND) & (typ != EXCL_TYPE)
        pk, brand, typ, size = pk[keep], brand[keep], typ[keep], size[keep]
        # dense triple ids, stable by (brand, type, size)
        lab = np.asarray(
            [f"{b}\x01{t}" for b, t in zip(brand, typ)], dtype=object
        )
        comp = np.asarray(
            [f"{s:06d}\x01{v}" for s, v in zip(size, lab)], dtype=object
        )
        utrip, tid = np.unique(comp, return_inverse=True)
        labels = []
        for c in utrip:
            sz, b, t = c.split("\x01")
            labels.append((b, t, int(sz)))
        excl = set()
        if sp:
            st = pa.concat_tables(sp)
            sk = st["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            sn = st["s_name"].to_pylist()
            excl = {int(k) for k, nm in zip(sk, sn) if nm.endswith("7")}
        o = np.argsort(pk)
        return (
            pk[o],
            tid[o].astype(np.int64),
            labels,
            np.asarray(sorted(excl), dtype=np.int64),
        )

    p_refs = part_ds.to_arrow_refs()
    state_ref = build_state.remote(
        len(p_refs), *p_refs, *supp.to_arrow_refs()
    )

    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "pk": pa.nulls(0, pa.int64()),
            "sk": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def pairs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "l_partkey" not in batch.column_names:
            return EMPTY
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        comp = np.unique(pk * (sk.max() + 1 if sk.size else 1) + sk)
        # re-split exactly (pk, sk are non-negative, sk < mod)
        mod = sk.max() + 1 if sk.size else 1
        upk, usk = comp // mod, comp % mod
        return pa.table(
            {
                "pk": pa.array(upk),
                "sk": pa.array(usk),
                "part": pa.array(upk % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"tid": pa.nulls(0, pa.int64()), "sk": pa.nulls(0, pa.int64())}
        )
        if group.num_rows == 0 or "pk" not in group.column_names:
            return empty
        keys, tids, _, excl = ray.get(state_ref)
        if keys.shape[0] == 0:
            return empty
        pk = group["pk"].to_numpy(zero_copy_only=False)
        sk = group["sk"].to_numpy(zero_copy_only=False)
        if excl.shape[0]:
            keep = ~np.isin(sk, excl)
            pk, sk = pk[keep], sk[keep]
        pos = np.minimum(np.searchsorted(keys, pk), keys.shape[0] - 1)
        hit = keys[pos] == pk
        if not hit.any():
            return empty
        tid = tids[pos[hit]]
        sk = sk[hit]
        comp = np.unique(tid * (sk.max() + 1) + sk)
        mod = sk.max() + 1
        return pa.table(
            {"tid": pa.array(comp // mod), "sk": pa.array(comp % mod)}
        )

    def final(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "p_brand": pa.nulls(0, pa.large_string()),
                "p_type": pa.nulls(0, pa.large_string()),
                "p_size": pa.nulls(0, pa.int64()),
                "supplier_cnt": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "tid" not in batch.column_names:
            return empty
        _, _, labels, _ = ray.get(state_ref)
        tid = batch["tid"].to_numpy(zero_copy_only=False)
        sk = batch["sk"].to_numpy(zero_copy_only=False)
        comp = np.unique(tid * (sk.max() + 1) + sk)
        mod = sk.max() + 1
        ut, inv = np.unique(comp // mod, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                "p_brand": pa.array(
                    [labels[i][0] for i in ut], type=pa.large_string()
                ),
                "p_type": pa.array(
                    [labels[i][1] for i in ut], type=pa.large_string()
                ),
                "p_size": pa.array(
                    [labels[i][2] for i in ut], type=pa.int64()
                ),
                "supplier_cnt": pa.array(cnt),
            }
        )

    return (
        line.map_batches(pairs, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def tpch_q22_dormant_customers(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q22 analog (global sales opportunity): per nation, the
    count and total balance of above-average-balance customers with no
    RECENT order (no order on/after 2000-01-01) — the anti-join +
    scalar-subquery shape.  The balance threshold compares exactly in
    integers: cents(c) * n_pos > sum_pos_cents avoids the float
    average entirely.

    Physical plan: pass 1 streams customers once for the two global
    counters (cheap partials, repartition(1) finish); the recent-buyer
    custkey set comes from one pruned orders scan (distinct per batch,
    dedup in the same remote gather that builds the broadcast state);
    pass 2 re-streams customers, filters by integer threshold +
    searchsorted anti-probe, and pre-aggregates per nation.  Customer
    content never shuffles; the only exchange is the dimension-sized
    custkey set."""
    P = 16
    CUTOFF = np.datetime64("2000-01-01", "us").astype(np.int64)

    cust_cols = ["c_custkey", "c_nationkey", "c_acctbal"]

    def _cust():
        return ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=cust_cols
        ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY_T = pa.table(
        {"s": pa.nulls(0, pa.int64()), "n": pa.nulls(0, pa.int64())}
    )

    def pos_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "c_acctbal" not in batch.column_names:
            return EMPTY_T
        bal = batch["c_acctbal"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        cents = np.floor(bal * 100.0).astype(np.int64)
        pos = bal > 0.0
        return pa.table(
            {
                "s": pa.array([int(cents[pos].sum())], type=pa.int64()),
                "n": pa.array([int(pos.sum())], type=pa.int64()),
            }
        )

    thresh = (
        _cust()
        .map_batches(pos_partial, batch_format="pyarrow")
        .repartition(1)
    )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY_R = pa.table({"ck": pa.nulls(0, pa.int64())})

    def recent_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "o_custkey" not in batch.column_names:
            return EMPTY_R
        col = batch["o_orderdate"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ts = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"ck": pa.array(np.unique(ck[ts >= CUTOFF]))})

    nation = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    @ray.remote
    def build_state(nt: int, nr: int, *refs) -> tuple:
        tp = [t for t in refs[:nt] if t.num_rows and "s" in t.column_names]
        rp = [
            t
            for t in refs[nt:nt + nr]
            if t.num_rows and "ck" in t.column_names
        ]
        np_ = [t for t in refs[nt + nr:] if t.num_rows]
        s = n = 0
        if tp:
            tt = pa.concat_tables(tp)
            s = int(tt["s"].to_numpy(zero_copy_only=False).sum())
            n = int(tt["n"].to_numpy(zero_copy_only=False).sum())
        recent = (
            np.unique(
                np.concatenate(
                    [t["ck"].to_numpy(zero_copy_only=False) for t in rp]
                )
            )
            if rp
            else np.empty(0, dtype=np.int64)
        )
        nk = np.empty(0, dtype=np.int64)
        names: list = []
        if np_:
            ntab = pa.concat_tables(np_)
            nk = ntab["n_nationkey"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            o = np.argsort(nk)
            nk = nk[o]
            names = [ntab["n_name"].to_pylist()[i] for i in o]
        return s, n, recent, nk, names

    t_refs = thresh.to_arrow_refs()
    r_refs = orders.map_batches(
        recent_partial, batch_format="pyarrow"
    ).to_arrow_refs()
    state_ref = build_state.remote(
        len(t_refs), len(r_refs), *t_refs, *r_refs, *nation.to_arrow_refs()
    )

    EMPTY_OUT = pa.table(
        {
            "n_name": pa.nulls(0, pa.large_string()),
            "numcust": pa.nulls(0, pa.int64()),
            "tot_cents": pa.nulls(0, pa.int64()),
        }
    )

    def probe(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "nk": pa.nulls(0, pa.int64()),
                "c": pa.nulls(0, pa.int64()),
                "b": pa.nulls(0, pa.int64()),
                "g": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "c_custkey" not in batch.column_names:
            return empty
        s, n, recent, _, _ = ray.get(state_ref)
        bal = batch["c_acctbal"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        cents = np.floor(bal * 100.0).astype(np.int64)
        keep = cents * n > s
        if recent.shape[0]:
            ck = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            pos = np.minimum(np.searchsorted(recent, ck), recent.shape[0] - 1)
            keep &= recent[pos] != ck
        if not keep.any():
            return empty
        nk = batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )[keep]
        uk, inv = np.unique(nk, return_inverse=True)
        c = np.bincount(inv).astype(np.int64)
        b = np.bincount(
            inv, weights=cents[keep].astype(np.float64)
        ).astype(np.int64)
        return pa.table(
            {
                "nk": pa.array(uk),
                "c": pa.array(c),
                "b": pa.array(b),
                "g": pa.array(uk % P),
            }
        )

    def final(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "nk" not in batch.column_names:
            return EMPTY_OUT
        _, _, _, nk_keys, names = ray.get(state_ref)
        nk = batch["nk"].to_numpy(zero_copy_only=False)
        c = batch["c"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(nk, return_inverse=True)
        tc = np.zeros(uk.shape[0], dtype=np.int64)
        tb = np.zeros(uk.shape[0], dtype=np.int64)
        np.add.at(tc, inv, c)
        np.add.at(tb, inv, b)
        pos = np.minimum(np.searchsorted(nk_keys, uk), nk_keys.shape[0] - 1)
        nm = [
            names[i] if nk_keys.shape[0] and nk_keys[i] == u else ""
            for i, u in zip(pos, uk)
        ]
        return pa.table(
            {
                "n_name": pa.array(nm, type=pa.large_string()),
                "numcust": pa.array(tc),
                "tot_cents": pa.array(tb),
            }
        )

    return (
        _cust()
        .map_batches(probe, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def tpch_q9_product_profit(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q9 analog (product-type profit): per supplier nation and
    order year, total profit on parts whose name contains 'bolt',
    where unit cost stands in for ps_supplycost as half the part's
    retail price (integer cents, ``// 2`` on both engines).

    Physical plan: part-cost and supplier->nation maps are dimensions
    -> ONE remote build + broadcast; lineitem pre-aggregates
    (orderkey, nation, profit-cents) per batch and meets the orders
    (orderkey, year) stream in ONE orderkey%P exchange (the q8 shape);
    kernels collapse to (nation, year) partials and the final pass
    folds P partials and resolves nation names."""
    P = 32
    NAME_TOKEN = "bolt"

    part_ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_name", "p_retailprice"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    nation = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    @ray.remote
    def build_state(np_: int, ns: int, *refs) -> tuple:
        pp = [t for t in refs[:np_] if t.num_rows]
        sp = [t for t in refs[np_:np_ + ns] if t.num_rows]
        nn = [t for t in refs[np_ + ns:] if t.num_rows]
        e = np.empty(0, dtype=np.int64)
        if not pp or not sp or not nn:
            return e, e, e, e, e, []
        pt = pa.concat_tables(pp)
        pk = pt["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        names = pt["p_name"].to_pylist()
        rp = pt["p_retailprice"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        keep = np.asarray([NAME_TOKEN in nm for nm in names], dtype=bool)
        pk = pk[keep]
        cost = np.floor(rp[keep] * 100.0).astype(np.int64) // 2
        o = np.argsort(pk)
        st = pa.concat_tables(sp)
        sk = st["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        snk = st["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        o2 = np.argsort(sk)
        nt = pa.concat_tables(nn)
        nk = nt["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        o3 = np.argsort(nk)
        nnames = [nt["n_name"].to_pylist()[i] for i in o3]
        return pk[o], cost[o], sk[o2], snk[o2], nk[o3], nnames

    p_refs = part_ds.to_arrow_refs()
    s_refs = supp.to_arrow_refs()
    state_ref = build_state.remote(
        len(p_refs), len(s_refs), *p_refs, *s_refs, *nation.to_arrow_refs()
    )

    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    # union rows: side 0 = lineitem (a=nationkey, b=profit cents),
    # side 1 = orders (a=year, b=0)
    EMPTY = pa.table(
        {
            "ok": pa.nulls(0, pa.int64()),
            "a": pa.nulls(0, pa.int64()),
            "b": pa.nulls(0, pa.int64()),
            "side": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def tag_line(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "l_orderkey" not in batch.column_names:
            return EMPTY
        pk_keys, cost, sk_keys, snk, _, _ = ray.get(state_ref)
        if pk_keys.shape[0] == 0 or sk_keys.shape[0] == 0:
            return EMPTY
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.minimum(np.searchsorted(pk_keys, pk), pk_keys.shape[0] - 1)
        hit = pk_keys[pos] == pk
        if not hit.any():
            return EMPTY
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )[hit]
        su = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )[hit]
        qi = np.floor(
            batch["l_quantity"].to_numpy(zero_copy_only=False)[hit]
        ).astype(np.int64)
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[hit]
        dc = batch["l_discount"].to_numpy(zero_copy_only=False)[hit]
        profit = (
            np.floor(ep * (1.0 - dc) * 100.0).astype(np.int64)
            - qi * cost[pos[hit]]
        )
        spos = np.minimum(np.searchsorted(sk_keys, su), sk_keys.shape[0] - 1)
        nid = np.where(sk_keys[spos] == su, snk[spos], -1)
        ok, nid, profit = ok[nid >= 0], nid[nid >= 0], profit[nid >= 0]
        if ok.shape[0] == 0:
            return EMPTY
        mod = int(nid.max()) + 1
        key = ok * mod + nid
        uk, inv = np.unique(key, return_inverse=True)
        s = np.bincount(inv, weights=profit.astype(np.float64)).astype(
            np.int64
        )
        return pa.table(
            {
                "ok": pa.array(uk // mod),
                "a": pa.array(uk % mod),
                "b": pa.array(s),
                "side": pa.array(np.zeros(uk.shape[0], dtype=np.int64)),
                "part": pa.array((uk // mod) % P),
            }
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "o_orderkey" not in batch.column_names:
            return EMPTY
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        col = batch["o_orderdate"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ts = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        year = (
            np.asarray(ts, dtype="int64").astype("datetime64[us]")
            .astype("datetime64[Y]").astype(np.int64) + 1970
        )
        n = ok.shape[0]
        return pa.table(
            {
                "ok": pa.array(ok),
                "a": pa.array(year),
                "b": pa.array(np.zeros(n, dtype=np.int64)),
                "side": pa.array(np.ones(n, dtype=np.int64)),
                "part": pa.array(ok % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "nid": pa.nulls(0, pa.int64()),
                "o_year": pa.nulls(0, pa.int64()),
                "cents": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "ok" not in group.column_names:
            return empty
        ok = group["ok"].to_numpy(zero_copy_only=False)
        a = group["a"].to_numpy(zero_copy_only=False)
        b = group["b"].to_numpy(zero_copy_only=False)
        side = group["side"].to_numpy(zero_copy_only=False)
        iso = side == 1
        ook, oyr = ok[iso], a[iso]
        lk, lnid, lc = ok[~iso], a[~iso], b[~iso]
        if ook.shape[0] == 0 or lk.shape[0] == 0:
            return empty
        o = np.argsort(ook)
        ook, oyr = ook[o], oyr[o]
        pos = np.minimum(np.searchsorted(ook, lk), ook.shape[0] - 1)
        hit = ook[pos] == lk
        if not hit.any():
            return empty
        yr = oyr[pos[hit]]
        nid = lnid[hit]
        c = lc[hit]
        mod = int(yr.max()) + 1
        key = nid * mod + yr
        uk, inv = np.unique(key, return_inverse=True)
        s = np.bincount(inv, weights=c.astype(np.float64)).astype(np.int64)
        return pa.table(
            {
                "nid": pa.array(uk // mod),
                "o_year": pa.array(uk % mod),
                "cents": pa.array(s),
            }
        )

    def final(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "n_name": pa.nulls(0, pa.large_string()),
                "o_year": pa.nulls(0, pa.int64()),
                "profit_cents": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "nid" not in batch.column_names:
            return empty
        _, _, _, _, nk_keys, nnames = ray.get(state_ref)
        nid = batch["nid"].to_numpy(zero_copy_only=False)
        yr = batch["o_year"].to_numpy(zero_copy_only=False)
        c = batch["cents"].to_numpy(zero_copy_only=False)
        mod = int(yr.max()) + 1
        key = nid * mod + yr
        uk, inv = np.unique(key, return_inverse=True)
        s = np.zeros(uk.shape[0], dtype=np.int64)
        np.add.at(s, inv, c)
        un = uk // mod
        pos = np.minimum(np.searchsorted(nk_keys, un), max(nk_keys.shape[0] - 1, 0))
        nm = [
            nnames[i] if nk_keys.shape[0] and nk_keys[i] == u else ""
            for i, u in zip(pos, un)
        ]
        return pa.table(
            {
                "n_name": pa.array(nm, type=pa.large_string()),
                "o_year": pa.array((uk % mod).astype(np.int64)),
                "profit_cents": pa.array(s),
            }
        )

    return (
        line.map_batches(tag_line, batch_format="pyarrow")
        .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def tpch_q11_important_parts(sf_dir: str, mult: int = 2) -> ray.data.Dataset:
    """TPC-H Q11 analog (important stock): parts whose lineitem value
    from NATION_3 suppliers exceeds ``mult`` times the average per-part
    value — the scalar-subquery-over-a-grouped-view shape, with a
    scale-FREE threshold (Q11's fixed fraction empties as the part
    dimension grows; value*N > mult*total compares exactly in ints
    and keeps the heavy tail at every corpus size).

    Physical plan: the nation's supplier set is a dimension -> remote
    build + broadcast; lineitem pre-aggregates (partkey, cents) per
    batch; ONE partkey%P exchange finishes per-part values; the final
    single-partition pass (part-DIMENSION-sized input) computes the
    global total and filters — dimension arithmetic, no second scan."""
    P = 32
    TARGET_NATION = "NATION_3"

    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    nation = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    @ray.remote
    def build_suppset(ns: int, *refs) -> np.ndarray:
        sp = [t for t in refs[:ns] if t.num_rows]
        nn = [t for t in refs[ns:] if t.num_rows]
        if not sp or not nn:
            return np.empty(0, dtype=np.int64)
        nt = pa.concat_tables(nn)
        nk = nt["n_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        target = {
            int(k)
            for k, nm in zip(nk, nt["n_name"].to_pylist())
            if nm == TARGET_NATION
        }
        st = pa.concat_tables(sp)
        sk = st["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        snk = st["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(snk, np.asarray(sorted(target), dtype=np.int64))
        return np.sort(sk[keep])

    s_refs = supp.to_arrow_refs()
    supp_ref = build_suppset.remote(len(s_refs), *s_refs, *nation.to_arrow_refs())

    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "pk": pa.nulls(0, pa.int64()),
            "v": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "l_partkey" not in batch.column_names:
            return EMPTY
        sset = ray.get(supp_ref)
        if sset.shape[0] == 0:
            return EMPTY
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.minimum(np.searchsorted(sset, sk), sset.shape[0] - 1)
        hit = sset[pos] == sk
        if not hit.any():
            return EMPTY
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )[hit]
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)[hit]
        cents = np.floor(ep * 100.0).astype(np.int64)
        uk, inv = np.unique(pk, return_inverse=True)
        s = np.bincount(inv, weights=cents.astype(np.float64)).astype(np.int64)
        return pa.table(
            {"pk": pa.array(uk), "v": pa.array(s), "part": pa.array(uk % P)}
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"pk": pa.nulls(0, pa.int64()), "v": pa.nulls(0, pa.int64())}
        )
        if group.num_rows == 0 or "pk" not in group.column_names:
            return empty
        pk = group["pk"].to_numpy(zero_copy_only=False)
        v = group["v"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(pk, return_inverse=True)
        tot = np.zeros(uk.shape[0], dtype=np.int64)
        np.add.at(tot, inv, v)
        return pa.table({"pk": pa.array(uk), "v": pa.array(tot)})

    def final(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "p_partkey": pa.nulls(0, pa.int64()),
                "value_cents": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "pk" not in batch.column_names:
            return empty
        pk = batch["pk"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        tot = int(v.sum())
        # v*N > mult*tot without the int64 overflow of the product:
        # for integer v this is exactly v > (mult*tot) // N (Python
        # ints are exact; see the divmod argument in the docstring SQL)
        keep = v > (mult * tot) // v.shape[0]
        return pa.table(
            {"p_partkey": pa.array(pk[keep]), "value_cents": pa.array(v[keep])}
        )

    return (
        line.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def orders_totalprice_recon(sf_dir: str) -> ray.data.Dataset:
    """Data-quality audit: reconcile each order's header total against
    the sum of its lineitems (extendedprice * (1+tax) * (1-discount)),
    reporting per order status the order count, mismatch count, and
    total absolute discrepancy in cents.  (On the synthetic corpus the
    header totals are generated independently, so every order
    mismatches — the operator's job is to MEASURE that, exactly.)

    Physical plan: per-order lineitem cent sums pre-aggregate per
    batch and meet the orders (orderkey, status, header-cents) stream
    in ONE orderkey%P exchange (the q8 shape with a string payload on
    the dimension-cardinality status column); kernels emit per-status
    partials and the final pass folds P of them."""
    P = 32

    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_tax"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_totalprice"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "ok": pa.nulls(0, pa.int64()),
            "c": pa.nulls(0, pa.int64()),
            "status": pa.nulls(0, pa.large_string()),
            "side": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def tag_line(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "l_orderkey" not in batch.column_names:
            return EMPTY
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        dc = batch["l_discount"].to_numpy(zero_copy_only=False)
        tx = batch["l_tax"].to_numpy(zero_copy_only=False)
        cents = np.floor(ep * (1.0 + tx) * (1.0 - dc) * 100.0).astype(np.int64)
        uk, inv = np.unique(ok, return_inverse=True)
        s = np.bincount(inv, weights=cents.astype(np.float64)).astype(np.int64)
        return pa.table(
            {
                "ok": pa.array(uk),
                "c": pa.array(s),
                "status": pa.array([""] * uk.shape[0], type=pa.large_string()),
                "side": pa.array(np.zeros(uk.shape[0], dtype=np.int64)),
                "part": pa.array(uk % P),
            }
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "o_orderkey" not in batch.column_names:
            return EMPTY
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        tp = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        cents = np.floor(tp * 100.0).astype(np.int64)
        st = batch["o_orderstatus"]
        if isinstance(st, pa.ChunkedArray):
            st = st.combine_chunks()
        return pa.table(
            {
                "ok": pa.array(ok),
                "c": pa.array(cents),
                "status": st.cast(pa.large_string()),
                "side": pa.array(np.ones(ok.shape[0], dtype=np.int64)),
                "part": pa.array(ok % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "o_orderstatus": pa.nulls(0, pa.large_string()),
                "n": pa.nulls(0, pa.int64()),
                "nm": pa.nulls(0, pa.int64()),
                "sad": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "ok" not in group.column_names:
            return empty
        ok = group["ok"].to_numpy(zero_copy_only=False)
        c = group["c"].to_numpy(zero_copy_only=False)
        side = group["side"].to_numpy(zero_copy_only=False)
        iso = side == 1
        lok, lc = ok[~iso], c[~iso]
        ook, oc = ok[iso], c[iso]
        status = np.asarray(group["status"].to_pylist(), dtype=object)[iso]
        if ook.shape[0] == 0 or lok.shape[0] == 0:
            return empty
        # fold lineitem partials (an order's lines may span batches)
        ul, linv = np.unique(lok, return_inverse=True)
        comp = np.zeros(ul.shape[0], dtype=np.int64)
        np.add.at(comp, linv, lc)
        pos = np.minimum(np.searchsorted(ul, ook), ul.shape[0] - 1)
        hit = ul[pos] == ook
        if not hit.any():
            return empty
        diff = np.abs(oc[hit] - comp[pos[hit]])
        st = status[hit]
        us, sinv = np.unique(st.astype(str), return_inverse=True)
        n = np.bincount(sinv).astype(np.int64)
        nm = np.bincount(
            sinv, weights=(diff != 0).astype(np.float64)
        ).astype(np.int64)
        sad = np.bincount(sinv, weights=diff.astype(np.float64)).astype(
            np.int64
        )
        return pa.table(
            {
                "o_orderstatus": pa.array(us.tolist(), type=pa.large_string()),
                "n": pa.array(n),
                "nm": pa.array(nm),
                "sad": pa.array(sad),
            }
        )

    def final(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "o_orderstatus": pa.nulls(0, pa.large_string()),
                "n_orders": pa.nulls(0, pa.int64()),
                "n_mismatch": pa.nulls(0, pa.int64()),
                "sum_absdiff_cents": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "o_orderstatus" not in batch.column_names:
            return empty
        st = np.asarray(batch["o_orderstatus"].to_pylist(), dtype=object)
        n = batch["n"].to_numpy(zero_copy_only=False)
        nm = batch["nm"].to_numpy(zero_copy_only=False)
        sad = batch["sad"].to_numpy(zero_copy_only=False)
        us, inv = np.unique(st.astype(str), return_inverse=True)
        tn = np.zeros(us.shape[0], dtype=np.int64)
        tm = np.zeros(us.shape[0], dtype=np.int64)
        ts_ = np.zeros(us.shape[0], dtype=np.int64)
        np.add.at(tn, inv, n)
        np.add.at(tm, inv, nm)
        np.add.at(ts_, inv, sad)
        return pa.table(
            {
                "o_orderstatus": pa.array(us.tolist(), type=pa.large_string()),
                "n_orders": pa.array(tn),
                "n_mismatch": pa.array(tm),
                "sum_absdiff_cents": pa.array(ts_),
            }
        )

    return (
        line.map_batches(tag_line, batch_format="pyarrow")
        .union(orders.map_batches(tag_orders, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def orders_benford(sf_dir: str) -> ray.data.Dataset:
    """Profiling operator: leading-digit distribution of order totals
    (Benford screen for synthetic or manipulated monetary columns).
    Counts are exact; the leading digit comes from an integer
    divide-by-10 loop (max ~7 iterations), never float log10.

    Physical plan: per-batch digit histograms (9 ints) -> repartition(1)
    fold.  Constant exchange."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_totalprice"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {"digit": pa.nulls(0, pa.int64()), "n": pa.nulls(0, pa.int64())}
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "o_totalprice" not in batch.column_names:
            return EMPTY
        d = np.floor(
            batch["o_totalprice"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        d = d[d >= 1]
        if d.shape[0] == 0:
            return EMPTY
        while (d >= 10).any():
            d = np.where(d >= 10, d // 10, d)
        cnt = np.bincount(d, minlength=10)[1:10]
        keep = cnt > 0
        return pa.table(
            {
                "digit": pa.array(np.arange(1, 10, dtype=np.int64)[keep]),
                "n": pa.array(cnt[keep].astype(np.int64)),
            }
        )

    def final(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "digit" not in batch.column_names:
            return EMPTY
        dg = batch["digit"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        ud, inv = np.unique(dg, return_inverse=True)
        tot = np.zeros(ud.shape[0], dtype=np.int64)
        np.add.at(tot, inv, n)
        return pa.table({"digit": pa.array(ud), "n": pa.array(tot)})

    return (
        orders.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def event_type_user_overlap(sf_dir: str, min_value: float = 250.0) -> ray.data.Dataset:
    """Audience-overlap matrix: for each pair of event types, how many
    distinct users fired BOTH with value >= min_value — the
    self-join-on-distinct-pairs shape, computed without a self join.

    Physical plan: per-batch distinct (user, type) pairs; ONE user%P
    exchange; each partition folds its users to type BITMASKS (the
    type alphabet is a dimension, discovered in the same pass) and
    emits per-mask user counts (<= 2^T rows per partition); the final
    pass expands mask counts into pair counts.  Mirrors
    simjoin.source_gram_overlap's bitmask trick on the events table."""
    P = 16

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "value"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "uid": pa.nulls(0, pa.int64()),
            "etype": pa.nulls(0, pa.large_string()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def pairs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "user_id" not in batch.column_names:
            return EMPTY
        v = batch["value"].to_numpy(zero_copy_only=False)
        keep = v >= min_value
        if not keep.any():
            return EMPTY
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )[keep]
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)[keep]
        comp = np.asarray(
            [f"{u}\x01{t}" for u, t in zip(uid, et)], dtype=object
        )
        _, idx = np.unique(comp, return_index=True)
        return pa.table(
            {
                "uid": pa.array(uid[idx]),
                "etype": pa.array(et[idx].tolist(), type=pa.large_string()),
                "part": pa.array(uid[idx] % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "mask": pa.nulls(0, pa.int64()),
                "n_users": pa.nulls(0, pa.int64()),
                "types": pa.nulls(0, pa.large_string()),
            }
        )
        if group.num_rows == 0 or "uid" not in group.column_names:
            return empty
        uid = group["uid"].to_numpy(zero_copy_only=False)
        et = np.asarray(group["etype"].to_pylist(), dtype=object)
        utypes, tinv = np.unique(et.astype(str), return_inverse=True)
        if utypes.shape[0] > 62:
            raise ValueError(
                "event_type_user_overlap: type alphabet exceeds 62 "
                f"({utypes.shape[0]}); bitmask plan needs a wider carrier"
            )
        uu, uinv = np.unique(uid, return_inverse=True)
        masks = np.zeros(uu.shape[0], dtype=np.int64)
        np.bitwise_or.at(masks, uinv, np.int64(1) << tinv.astype(np.int64))
        um, minv = np.unique(masks, return_inverse=True)
        cnt = np.bincount(minv).astype(np.int64)
        alphabet = "\x01".join(utypes.tolist())
        return pa.table(
            {
                "mask": pa.array(um),
                "n_users": pa.array(cnt),
                "types": pa.array([alphabet] * um.shape[0], type=pa.large_string()),
            }
        )

    def final(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "type_a": pa.nulls(0, pa.large_string()),
                "type_b": pa.nulls(0, pa.large_string()),
                "n_shared": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "mask" not in batch.column_names:
            return empty
        masks = batch["mask"].to_numpy(zero_copy_only=False)
        cnt = batch["n_users"].to_numpy(zero_copy_only=False)
        alphabets = batch["types"].to_pylist()
        from collections import defaultdict

        shared: dict = defaultdict(int)
        for m, c, alpha in zip(masks, cnt, alphabets):
            types = alpha.split("\x01")
            present = [t for i, t in enumerate(types) if m >> i & 1]
            for i in range(len(present)):
                for j in range(i + 1, len(present)):
                    a, b = sorted((present[i], present[j]))
                    shared[(a, b)] += int(c)
        if not shared:
            return empty
        keys = sorted(shared)
        return pa.table(
            {
                "type_a": pa.array([k[0] for k in keys], type=pa.large_string()),
                "type_b": pa.array([k[1] for k in keys], type=pa.large_string()),
                "n_shared": pa.array(
                    [shared[k] for k in keys], type=pa.int64()
                ),
            }
        )

    return (
        events.map_batches(pairs, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def lineitem_corr_matrix(sf_dir: str) -> ray.data.Dataset:
    """Profiling operator: the exact Pearson correlation matrix over
    lineitem's numeric columns (quantity, extendedprice cents, discount
    pct, tax pct).  All 15 moments accumulate as EXACT Python ints
    (per-batch int64 products overflow at sum-of-squares x 10M rows —
    the events_daily_autocorr lesson), so r is the same float64 on both
    engines: one int->double cast per term, one multiply, one IEEE
    sqrt, one division.

    Physical plan: one streaming pass; each batch emits ONE row of 15
    decimal-string moments (strings because the values exceed int64 and
    a constant-size tail parses them back to exact ints); repartition(1)
    folds and emits the 6 pair rows.  Constant exchange."""
    COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=COLS
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    names = ["qty", "ep", "disc", "tax"]
    pairs = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    moment_cols = (
        ["n"]
        + [f"s_{a}" for a in names]
        + [f"ss_{a}" for a in names]
        + [f"x_{names[i]}_{names[j]}" for i, j in pairs]
    )
    EMPTY = pa.table(
        {c: pa.nulls(0, pa.large_string()) for c in moment_cols}
    )

    def _ints(batch: pa.Table) -> list[np.ndarray]:
        q = np.floor(
            batch["l_quantity"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        ep = np.floor(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        dc = np.floor(
            batch["l_discount"].to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            * 100.0
        ).astype(np.int64)
        tx = np.floor(
            batch["l_tax"].to_numpy(zero_copy_only=False).astype(np.float64)
            * 100.0
        ).astype(np.int64)
        return [q, ep, dc, tx]

    CHUNK = 16_384  # keeps per-chunk int64 sums of cents^2 clear of 2^63

    def _exact_sum(prod: np.ndarray) -> int:
        tot = 0
        for lo in range(0, prod.shape[0], CHUNK):
            tot += int(prod[lo:lo + CHUNK].sum())
        return tot

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "l_quantity" not in batch.column_names:
            return EMPTY
        v = _ints(batch)
        row: dict = {"n": str(batch.num_rows)}
        for a, arr in zip(names, v):
            row[f"s_{a}"] = str(_exact_sum(arr))
            row[f"ss_{a}"] = str(_exact_sum(arr * arr))
        for i, j in pairs:
            row[f"x_{names[i]}_{names[j]}"] = str(_exact_sum(v[i] * v[j]))
        return pa.table(
            {c: pa.array([row[c]], type=pa.large_string()) for c in moment_cols}
        )

    LABELS = {
        "qty": "l_quantity",
        "ep": "l_extendedprice",
        "disc": "l_discount",
        "tax": "l_tax",
    }

    def final(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "col_a": pa.nulls(0, pa.large_string()),
                "col_b": pa.nulls(0, pa.large_string()),
                "corr": pa.nulls(0, pa.float64()),
                "n_rows": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "n" not in batch.column_names:
            return empty
        import math

        tot = {c: 0 for c in moment_cols}
        for c in moment_cols:
            for s in batch[c].to_pylist():
                tot[c] += int(s)
        n = tot["n"]
        if n == 0:
            return empty
        out_a, out_b, out_r = [], [], []
        for i, j in pairs:
            a, b = names[i], names[j]
            num = n * tot[f"x_{a}_{b}"] - tot[f"s_{a}"] * tot[f"s_{b}"]
            da = n * tot[f"ss_{a}"] - tot[f"s_{a}"] ** 2
            db = n * tot[f"ss_{b}"] - tot[f"s_{b}"] ** 2
            den = math.sqrt(float(da) * float(db))
            out_a.append(LABELS[a])
            out_b.append(LABELS[b])
            out_r.append(float(num) / den if den > 0 else 0.0)
        return pa.table(
            {
                "col_a": pa.array(out_a, type=pa.large_string()),
                "col_b": pa.array(out_b, type=pa.large_string()),
                "corr": pa.array(out_r, type=pa.float64()),
                "n_rows": pa.array([n] * len(pairs), type=pa.int64()),
            }
        )

    return (
        line.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def documents_expectations(sf_dir: str) -> ray.data.Dataset:
    """Data-validation operator (the Great-Expectations shape): check a
    rule set over the documents table distributed and report per-rule
    violation counts — uniqueness included, which needs an exchange.

    Rules: doc_id unique; text non-null; n_chars == length(text);
    lang matches ^[a-z]{2,3}$; source non-null and non-empty.

    Physical plan: per-row rules fold to ONE partial row per batch
    (rule, count); uniqueness ships per-batch distinct (doc_id, count)
    partials tagged rule=NULL through the SAME doc_id%P exchange
    (16 B/distinct-id, the profile.py discipline) where violations =
    sum(n) - n_distinct per partition.  One union schema, one groupby,
    constant-size tail."""
    P = 16

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    # shared union schema: rule != NULL -> (rule, b=violations);
    # rule == NULL -> uniqueness partial (a=doc_id, b=count)
    EMPTY = pa.table(
        {
            "rule": pa.nulls(0, pa.large_string()),
            "a": pa.nulls(0, pa.int64()),
            "b": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    import re as _re_mod

    _LANG_RE = _re_mod.compile(r"^[a-z]{2,3}$")

    def rowrules(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return EMPTY
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        null_text = int(pc.sum(pc.is_null(text)).as_py() or 0)
        tlen = pc.utf8_length(pc.fill_null(text, "")).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        nch = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        isnull = pc.is_null(text).to_numpy(zero_copy_only=False)
        bad_len = int(((tlen != nch) | isnull).sum())
        langs = batch["lang"].to_pylist()
        bad_lang = sum(
            1 for s in langs if s is None or not _LANG_RE.match(s)
        )
        srcs = batch["source"].to_pylist()
        bad_src = sum(1 for s in srcs if s is None or s == "")
        return pa.table(
            {
                "rule": pa.array(
                    [
                        "text_nonnull",
                        "n_chars_consistent",
                        "lang_format",
                        "source_nonempty",
                    ],
                    type=pa.large_string(),
                ),
                "a": pa.array([0, 0, 0, 0], type=pa.int64()),
                "b": pa.array(
                    [null_text, bad_len, bad_lang, bad_src], type=pa.int64()
                ),
                "part": pa.array([0, 1, 2, 3], type=pa.int64()),
            }
        )

    def id_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return EMPTY
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uk, cnt = np.unique(ids, return_counts=True)
        return pa.table(
            {
                "rule": pa.nulls(uk.shape[0], pa.large_string()),
                "a": pa.array(uk),
                "b": pa.array(cnt.astype(np.int64)),
                "part": pa.array(uk % P + 4),  # offset past rowrule parts
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
            # duplicates violate: every row beyond the first per id
            out_rules.append("doc_id_unique")
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

    rows = docs.map_batches(rowrules, batch_format="pyarrow")
    ids = docs.map_batches(id_partial, batch_format="pyarrow")
    merged = rows.union(ids).groupby("part").map_groups(
        kernel, batch_format="pyarrow"
    )
    return (
        merged.repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def lang_source_contingency(sf_dir: str) -> ray.data.Dataset:
    """Corpus-mix independence audit: the lang x source contingency
    table with expected-under-independence counts — the chi-square
    ingredients for "does each feed have the same language mix?".
    Observed counts are exact; expected = row_total * col_total /
    grand_total is ONE float expression evaluated in the same order on
    both engines.

    Physical plan: per-batch (lang, source, n) partials (the cell space
    is dimension x dimension); ONE crc(lang)%P exchange finishes cell
    counts; the constant-size tail derives the margins and the expected
    values — margins never need their own exchanges because the cells
    ARE the margins' partition."""
    import zlib

    P = 8

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["lang", "source"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "lang": pa.nulls(0, pa.large_string()),
            "source": pa.nulls(0, pa.large_string()),
            "n": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "lang" not in batch.column_names:
            return EMPTY
        lang = np.asarray(batch["lang"].to_pylist(), dtype=object)
        src = np.asarray(batch["source"].to_pylist(), dtype=object)
        comp = np.asarray(
            [f"{a}\x01{b}" for a, b in zip(lang, src)], dtype=object
        )
        uk, inv = np.unique(comp, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        ul = [c.split("\x01")[0] for c in uk]
        us = [c.split("\x01")[1] for c in uk]
        parts = np.asarray(
            [zlib.crc32(s.encode()) % P for s in ul], dtype=np.int64
        )
        return pa.table(
            {
                "lang": pa.array(ul, type=pa.large_string()),
                "source": pa.array(us, type=pa.large_string()),
                "n": pa.array(cnt),
                "part": pa.array(parts),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "lang": pa.nulls(0, pa.large_string()),
                "source": pa.nulls(0, pa.large_string()),
                "n": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "lang" not in group.column_names:
            return empty
        lang = np.asarray(group["lang"].to_pylist(), dtype=object)
        src = np.asarray(group["source"].to_pylist(), dtype=object)
        n = group["n"].to_numpy(zero_copy_only=False)
        comp = np.asarray(
            [f"{a}\x01{b}" for a, b in zip(lang, src)], dtype=object
        )
        uk, inv = np.unique(comp, return_inverse=True)
        tot = np.zeros(uk.shape[0], dtype=np.int64)
        np.add.at(tot, inv, n)
        return pa.table(
            {
                "lang": pa.array(
                    [c.split("\x01")[0] for c in uk], type=pa.large_string()
                ),
                "source": pa.array(
                    [c.split("\x01")[1] for c in uk], type=pa.large_string()
                ),
                "n": pa.array(tot),
            }
        )

    def final(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "lang": pa.nulls(0, pa.large_string()),
                "source": pa.nulls(0, pa.large_string()),
                "observed": pa.nulls(0, pa.int64()),
                "expected": pa.nulls(0, pa.float64()),
            }
        )
        if batch.num_rows == 0 or "lang" not in batch.column_names:
            return empty
        lang = np.asarray(batch["lang"].to_pylist(), dtype=object)
        src = np.asarray(batch["source"].to_pylist(), dtype=object)
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        ul, linv = np.unique(lang.astype(str), return_inverse=True)
        us, sinv = np.unique(src.astype(str), return_inverse=True)
        row_tot = np.zeros(ul.shape[0], dtype=np.int64)
        col_tot = np.zeros(us.shape[0], dtype=np.int64)
        np.add.at(row_tot, linv, n)
        np.add.at(col_tot, sinv, n)
        grand = float(int(n.sum()))
        expected = (
            row_tot[linv].astype(np.float64)
            * col_tot[sinv].astype(np.float64)
            / grand
        )
        return pa.table(
            {
                "lang": pa.array(lang.tolist(), type=pa.large_string()),
                "source": pa.array(src.tolist(), type=pa.large_string()),
                "observed": pa.array(n),
                "expected": pa.array(expected),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def events_type_mad(sf_dir: str) -> ray.data.Dataset:
    """EXACT per-group median absolute deviation (grouped robust
    dispersion — the per-type counterpart of the global
    events_value_mad): median_g(|v - median_g(v)|) with CONSTANT
    exchange volume.

    Two grouped radix-quantile passes (functions/quantile.py): pass 1
    recovers each type's bit-exact interpolated median; the medians
    broadcast (dimension-sized) and a streaming map derives
    |v - med| — ONE float subtraction evaluated identically on both
    engines — then pass 2 takes the grouped median of the deviations.
    Eight streaming scans total, <= groups x 65536 skinny rows per
    batch per pass, no per-group gather."""
    from libpostal_ray.functions.quantile import grouped_exact_quantile_cont

    def _events():
        return ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    med_tbl = grouped_exact_quantile_cont(_events(), "event_type", "value", 0.5)
    meds = {
        k: float(v)
        for k, v in zip(
            med_tbl.column(0).to_pylist(), med_tbl.column(2).to_pylist()
        )
    }
    med_ref = ray.put(meds)

    EMPTY = pa.table(
        {
            "event_type": pa.nulls(0, pa.large_string()),
            "dev": pa.nulls(0, pa.float64()),
        }
    )

    def to_dev(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "event_type" not in batch.column_names:
            return EMPTY
        m = ray.get(med_ref)
        et = batch["event_type"].to_pylist()
        v = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        med = np.asarray([m.get(t, np.nan) for t in et], dtype=np.float64)
        return pa.table(
            {
                "event_type": pa.array(et, type=pa.large_string()),
                "dev": pa.array(np.abs(v - med)),
            }
        )

    devs = _events().map_batches(to_dev, batch_format="pyarrow")
    mad_tbl = grouped_exact_quantile_cont(devs, "event_type", "dev", 0.5)
    mad_tbl = mad_tbl.rename_columns(["event_type", "n_events", "mad"])
    return ray.data.from_arrow(mad_tbl)


def event_trigrams(sf_dir: str) -> ray.data.Dataset:
    """Second-order sequence mining: counts of every three-consecutive-
    event-type pattern within each user's time-ordered stream (ties on
    equal ts broken by event_id) — the width-3 sibling of
    event_transitions, matching SQL's double-lead window formulation.
    See pipelines/timeseries.trigram_counts for the exchange."""
    from libpostal_ray.pipelines.timeseries import trigram_counts

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type", "event_id"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    out = trigram_counts(ds, "user_id", "ts", "event_type", "event_id")
    return out.map_batches(
        lambda b: b.rename_columns(["t1", "t2", "t3", "n"]),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# session-15 operators
# ---------------------------------------------------------------------------


def orders_mom_growth(sf_dir: str) -> ray.data.Dataset:
    """Month-over-month revenue growth: the window-over-aggregate shape
    (SQL lag() over a GROUP BY result).  Revenue is exact int cents per
    (year*100+month); the lag/delta run on the FINAL month-dimension
    table (one row per month — driver-scale by construction), so the
    distributed work is only the monthly rollup.

    Physical plan: per-batch (ym, cents) partials -> groupby(ym) Sum
    (month cardinality, tiny exchange) -> repartition(1) -> one
    vectorized lag kernel.  growth columns stay exact int64."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {"ym": pa.nulls(0, pa.int64()), "revenue_cents": pa.nulls(0, pa.int64())}
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "o_orderdate" not in batch.column_names:
            return EMPTY
        y = pc.year(batch["o_orderdate"]).to_numpy(zero_copy_only=False)
        m = pc.month(batch["o_orderdate"]).to_numpy(zero_copy_only=False)
        ym = y.astype(np.int64) * 100 + m.astype(np.int64)
        cents = np.floor(
            batch["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        uk, inv = np.unique(ym, return_inverse=True)
        s = np.zeros(uk.shape[0], dtype=np.int64)
        np.add.at(s, inv, cents)
        return pa.table({"ym": pa.array(uk), "revenue_cents": pa.array(s)})

    def lag_kernel(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "ym": pa.nulls(0, pa.int64()),
                "revenue_cents": pa.nulls(0, pa.int64()),
                "prev_revenue_cents": pa.nulls(0, pa.int64()),
                "delta_cents": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "ym" not in batch.column_names:
            return empty
        ym = batch["ym"].to_numpy(zero_copy_only=False)
        rev = batch["revenue_cents"].to_numpy(zero_copy_only=False)
        o = np.argsort(ym)
        ym, rev = ym[o], rev[o]
        if ym.shape[0] < 2:
            return empty
        # the earliest month has no predecessor — drop it so every output
        # column is non-null int64 (the driver value-hash and the parity
        # allclose both choke on NULL-as-NaN in numeric columns)
        return pa.table(
            {
                "ym": pa.array(ym[1:]),
                "revenue_cents": pa.array(rev[1:]),
                "prev_revenue_cents": pa.array(rev[:-1]),
                "delta_cents": pa.array(rev[1:] - rev[:-1]),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ym")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
        .repartition(1)
        .map_batches(lag_kernel, batch_format="pyarrow", batch_size=None)
    )


def customer_cohort_orders(sf_dir: str) -> ray.data.Dataset:
    """Cohort matrix over ORDERS: customers grouped by FIRST-order month
    (cohort), counted distinct per (cohort month, order month) — the
    canonical repeat-purchase retention operator (the events table spans
    one month, so the sibling daily matrix lives in
    user_retention_daily; orders span ~80 months).

    Physical plan: per-batch DISTINCT (custkey, year*100+month) pairs
    bound the exchange by active customer-months, not orders; ONE
    custkey%P exchange co-locates each customer's months so the
    partition computes the cohort (min ym) locally and emits
    (cohort_ym, ym, n) partials; a tiny month-dimension groupby
    finishes.  Counts are exact distinct customers by construction
    (each (customer, ym) survives exactly once)."""
    P = 32

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "user_id": pa.nulls(0, pa.int64()),
            "ym": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "o_custkey" not in batch.column_names:
            return EMPTY
        u = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = pc.year(batch["o_orderdate"]).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        m = pc.month(batch["o_orderdate"]).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        ym = y * 100 + m
        order = np.lexsort((ym, u))
        u_s, ym_s = u[order], ym[order]
        keep = np.concatenate(
            ([True], (u_s[1:] != u_s[:-1]) | (ym_s[1:] != ym_s[:-1]))
        )
        u_s, ym_s = u_s[keep], ym_s[keep]
        return pa.table(
            {
                "user_id": pa.array(u_s),
                "ym": pa.array(ym_s),
                "part": pa.array(u_s % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cohort_ym": pa.nulls(0, pa.int64()),
                "ym": pa.nulls(0, pa.int64()),
                "n_custs": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "user_id" not in group.column_names:
            return empty
        u = group["user_id"].to_numpy(zero_copy_only=False)
        ym = group["ym"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ym, u))
        u_s, ym_s = u[order], ym[order]
        keep = np.concatenate(
            ([True], (u_s[1:] != u_s[:-1]) | (ym_s[1:] != ym_s[:-1]))
        )
        u_s, ym_s = u_s[keep], ym_s[keep]
        ustarts = np.flatnonzero(
            np.concatenate(([True], u_s[1:] != u_s[:-1]))
        )
        counts = np.diff(np.append(ustarts, u_s.shape[0]))
        cohort = np.repeat(ym_s[ustarts], counts)  # min ym per user
        # partial counts per (cohort, ym): ym < 10^6 so the composite
        # cohort*10^6 + ym stays far under 2^63
        comp = cohort * 1_000_000 + ym_s
        uc, cnt = np.unique(comp, return_counts=True)
        return pa.table(
            {
                "cohort_ym": pa.array(uc // 1_000_000),
                "ym": pa.array(uc % 1_000_000),
                "n_custs": pa.array(cnt.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .groupby(["cohort_ym", "ym"])
        .aggregate(Sum("n_custs", alias_name="n_custs"))
    )


def part_major_suppliers(sf_dir: str, mult: int = 8) -> ray.data.Dataset:
    """TPC-H Q20 analog (excess-share suppliers): suppliers that shipped
    MORE THAN 1/mult of some part's total lineitem quantity (default
    mult=8: a supplier holding over 12.5% of a part's volume) — the
    nested fraction-of-group-total threshold + semi-join-to-dimension
    chain that Q20's availqty subquery expresses.  All-integer
    comparison (mult*q > tot), no division.

    Physical plan: per-batch (partkey, suppkey, qty) partials; ONE
    partkey%P exchange finishes per-(part, supplier) totals AND the
    per-part total in the same partition (co-partitioned by part), then
    emits (suppkey, 1) partials; a supplier-cardinality groupby counts
    and a broadcast name table (built in a remote task) decorates."""
    P = 32

    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    @ray.remote
    def build_names(*refs) -> tuple:
        parts = [t for t in refs if t.num_rows]
        if not parts:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=object)
        t = pa.concat_tables(parts)
        sk = t["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sn = np.asarray(t["s_name"].to_pylist(), dtype=object)
        o = np.argsort(sk)
        return sk[o], sn[o]

    names_ref = build_names.remote(*supp.to_arrow_refs())

    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "pk": pa.nulls(0, pa.int64()),
            "sk": pa.nulls(0, pa.int64()),
            "q": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "l_partkey" not in batch.column_names:
            return EMPTY
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        q = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        if pk.size and (pk.max() >= 1 << 31 or sk.max() >= 1 << 31):
            raise ValueError("part/supp keys must fit 31 bits for the composite")
        comp = pk * (np.int64(1) << 31) + sk
        uk, inv = np.unique(comp, return_inverse=True)
        s = np.zeros(uk.shape[0], dtype=np.int64)
        np.add.at(s, inv, q)
        upk = uk >> 31
        return pa.table(
            {
                "pk": pa.array(upk),
                "sk": pa.array(uk & ((np.int64(1) << 31) - 1)),
                "q": pa.array(s),
                "part": pa.array(upk % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"sk": pa.nulls(0, pa.int64()), "n": pa.nulls(0, pa.int64())}
        )
        if group.num_rows == 0 or "pk" not in group.column_names:
            return empty
        pk = group["pk"].to_numpy(zero_copy_only=False)
        sk = group["sk"].to_numpy(zero_copy_only=False)
        q = group["q"].to_numpy(zero_copy_only=False)
        comp = pk * (np.int64(1) << 31) + sk
        uk, inv = np.unique(comp, return_inverse=True)
        qs = np.zeros(uk.shape[0], dtype=np.int64)
        np.add.at(qs, inv, q)
        upk = uk >> 31
        # per-part totals over the (part, supplier) rows — co-partitioned
        pstarts = np.flatnonzero(
            np.concatenate(([True], upk[1:] != upk[:-1]))
        )
        tot = np.add.reduceat(qs, pstarts)
        tot_row = np.repeat(tot, np.diff(np.append(pstarts, upk.shape[0])))
        major = mult * qs > tot_row
        if not major.any():
            return empty
        msk = uk[major] & ((np.int64(1) << 31) - 1)
        us, cnt = np.unique(msk, return_counts=True)
        return pa.table(
            {"sk": pa.array(us), "n": pa.array(cnt.astype(np.int64))}
        )

    agg = (
        line.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .groupby("sk")
        .aggregate(Sum("n", alias_name="n_major_parts"))
    )

    def decorate(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "s_suppkey": pa.nulls(0, pa.int64()),
                "s_name": pa.nulls(0, pa.string()),
                "n_major_parts": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "sk" not in batch.column_names:
            return empty
        keys, names = ray.get(names_ref)
        sk = batch["sk"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, sk)
        pos = np.clip(pos, 0, max(keys.shape[0] - 1, 0))
        hit = keys[pos] == sk if keys.shape[0] else np.zeros(sk.shape[0], bool)
        nm = np.where(hit, names[pos] if keys.shape[0] else "", "")
        return pa.table(
            {
                "s_suppkey": pa.array(sk),
                "s_name": pa.array(nm.astype(object), type=pa.string()),
                "n_major_parts": batch["n_major_parts"],
            }
        )

    return agg.map_batches(decorate, batch_format="pyarrow")


def tpch_q12_shipping_lag(sf_dir: str, cap_weeks: int = 8) -> ray.data.Dataset:
    """TPC-H Q12 analog (shipping-mode priority mix): orders bucketed by
    first-shipment lag in WEEKS (capped), counting high-priority
    (1-URGENT/2-HIGH) vs low-priority orders per bucket — Q12's
    conditional-count-by-shipping-class shape with the lag bucket
    standing in for l_shipmode (absent from this schema).

    Physical plan: lineitem pre-reduces per batch to (orderkey, min
    shipdate); ONE orderkey%P exchange joins order headers (tagged
    stream), buckets the day-difference, and emits per-bucket partial
    counts; a bucket-cardinality groupby finishes."""
    P = 32
    DAY_US = np.int64(86_400_000_000)
    HIGH = {"1-URGENT", "2-HIGH"}

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    line = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "ok": pa.nulls(0, pa.int64()),
            "v": pa.nulls(0, pa.int64()),
            "hi": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def line_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "l_orderkey" not in batch.column_names:
            return EMPTY
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = pc.cast(batch["l_shipdate"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        uk, inv = np.unique(ok, return_inverse=True)
        mn = np.full(uk.shape[0], np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mn, inv, ts)
        return pa.table(
            {
                "ok": pa.array(uk),
                "v": pa.array(mn),
                "hi": pa.array(np.full(uk.shape[0], -1, dtype=np.int64)),
                "part": pa.array(uk % P),
            }
        )

    def order_tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "o_orderkey" not in batch.column_names:
            return EMPTY
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = pc.cast(batch["o_orderdate"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        pr = batch["o_orderpriority"].to_pylist()
        hi = np.fromiter((1 if p in HIGH else 0 for p in pr), dtype=np.int64)
        return pa.table(
            {
                "ok": pa.array(ok),
                "v": pa.array(ts),
                "hi": pa.array(hi),
                "part": pa.array(ok % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "lag_weeks": pa.nulls(0, pa.int64()),
                "high_n": pa.nulls(0, pa.int64()),
                "low_n": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "ok" not in group.column_names:
            return empty
        ok = group["ok"].to_numpy(zero_copy_only=False)
        v = group["v"].to_numpy(zero_copy_only=False)
        hi = group["hi"].to_numpy(zero_copy_only=False)
        isl = hi == -1
        # fold lineitem min-shipdate partials per orderkey
        lk, lv = ok[isl], v[isl]
        o = np.lexsort((lv, lk))
        lk, lv = lk[o], lv[o]
        starts = np.flatnonzero(np.concatenate(([True], lk[1:] != lk[:-1])))
        lk_u = lk[starts]
        lv_u = lv[starts]  # sorted (key, value): first value = min
        # orders probe
        okk, ov, ohi = ok[~isl], v[~isl], hi[~isl]
        pos = np.searchsorted(lk_u, okk)
        pos_c = np.clip(pos, 0, max(lk_u.shape[0] - 1, 0))
        hit = (lk_u.shape[0] > 0) & (lk_u[pos_c] == okk)
        if not np.any(hit):
            return empty
        lag_days = lv_u[pos_c[hit]] // DAY_US - ov[hit] // DAY_US
        # negative lags (synthetic shipdates may precede order dates)
        # clamp to bucket 0 — truncate-vs-floor division on negatives
        # never reaches the output, so both engines agree exactly
        weeks = np.clip(lag_days // 7, 0, cap_weeks)
        h = ohi[hit]
        uw, inv = np.unique(weeks, return_inverse=True)
        hc = np.zeros(uw.shape[0], dtype=np.int64)
        lc = np.zeros(uw.shape[0], dtype=np.int64)
        np.add.at(hc, inv, (h == 1).astype(np.int64))
        np.add.at(lc, inv, (h == 0).astype(np.int64))
        return pa.table(
            {
                "lag_weeks": pa.array(uw),
                "high_n": pa.array(hc),
                "low_n": pa.array(lc),
            }
        )

    tagged = line.map_batches(line_partial, batch_format="pyarrow").union(
        orders.map_batches(order_tag, batch_format="pyarrow")
    )
    return (
        tagged.groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .groupby("lag_weeks")
        .aggregate(
            Sum("high_n", alias_name="high_n"),
            Sum("low_n", alias_name="low_n"),
        )
    )


def user_type_runs(sf_dir: str) -> ray.data.Dataset:
    """Run-length encoding of each user's time-ordered event-type
    sequence: per (user, event_type), the LONGEST consecutive run and
    the number of runs — the sequence-compression view of behavior
    (SQL's double row_number islands trick).  Ties on equal ts break by
    event_id, pinning one order on both engines.

    Physical plan: run structure is order-dependent, so raw (user, ts,
    event_id, type) rows take ONE user%P exchange (no combiner exists);
    the kernel lexsorts, finds run boundaries vectorized, and reduces
    runs per (user, type-code) with reduceat."""
    P = 32

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "user_id": pa.nulls(0, pa.int64()),
            "ts": pa.nulls(0, pa.int64()),
            "event_id": pa.nulls(0, pa.int64()),
            "event_type": pa.nulls(0, pa.string()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "user_id" not in batch.column_names:
            return EMPTY
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(u),
                "ts": pc.cast(batch["ts"], pa.int64()),
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
                "part": pa.array(u % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.nulls(0, pa.int64()),
                "event_type": pa.nulls(0, pa.string()),
                "longest_run": pa.nulls(0, pa.int64()),
                "n_runs": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "user_id" not in group.column_names:
            return empty
        u = group["user_id"].to_numpy(zero_copy_only=False)
        ts = group["ts"].to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        types, code = np.unique(
            np.asarray(group["event_type"].to_pylist(), dtype=object),
            return_inverse=True,
        )
        order = np.lexsort((eid, ts, u))
        u_s, c_s = u[order], code[order]
        # run boundary: new user OR type change
        rs = np.concatenate(
            ([True], (u_s[1:] != u_s[:-1]) | (c_s[1:] != c_s[:-1]))
        )
        starts = np.flatnonzero(rs)
        run_len = np.diff(np.append(starts, u_s.shape[0])).astype(np.int64)
        run_u = u_s[starts]
        run_c = c_s[starts]
        # reduce runs per (user, type): code count is dimension-bounded
        ro = np.lexsort((run_c, run_u))
        run_u, run_c, run_len = run_u[ro], run_c[ro], run_len[ro]
        gs = np.flatnonzero(
            np.concatenate(
                ([True], (run_u[1:] != run_u[:-1]) | (run_c[1:] != run_c[:-1]))
            )
        )
        longest = np.maximum.reduceat(run_len, gs)
        n_runs = np.diff(np.append(gs, run_len.shape[0])).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(run_u[gs]),
                "event_type": pa.array(
                    types[run_c[gs]].astype(object), type=pa.string()
                ),
                "longest_run": pa.array(longest),
                "n_runs": pa.array(n_runs),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def event_value_zscore(sf_dir: str) -> ray.data.Dataset:
    """Grouped z-score outlier screen with an EXACT integer identity:
    events whose value is more than 3 population standard deviations
    from their event type's mean.  Values integerize to floor-cents per
    row, then z^2 > 9 rewrites to (n*c - s)^2 > 9*(n*ss - s^2) — all
    integers — so both engines compare exactly (DuckDB in HUGEINT; here
    the RHS is a Python int and the per-row test becomes
    |n*c - s| > isqrt(RHS), equivalent for integer LHS because isqrt
    brackets the square root tightly).

    Physical plan: moments pass = per-batch (type, n, s, ss) partials ->
    type-cardinality groupby (tiny result, legitimately collected);
    thresholds broadcast in the closure; filter pass streams events and
    keeps outliers.  Two reads, zero row-level shuffles."""
    import math

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY_M = pa.table(
        {
            "event_type": pa.nulls(0, pa.string()),
            "n": pa.nulls(0, pa.int64()),
            "s": pa.nulls(0, pa.int64()),
            "ss": pa.nulls(0, pa.int64()),
        }
    )

    def _cents_of(batch: pa.Table) -> np.ndarray:
        c = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        if c.size and int(np.abs(c).max()) > 1 << 25:
            raise ValueError("value cents too large for int64 ss partials")
        return c

    def moments(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "event_type" not in batch.column_names:
            return EMPTY_M
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        c = _cents_of(batch)
        ul, inv = np.unique(et, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        s = np.zeros(ul.shape[0], dtype=np.int64)
        np.add.at(s, inv, c)
        ss = np.zeros(ul.shape[0], dtype=np.int64)
        np.add.at(ss, inv, c * c)
        return pa.table(
            {
                "event_type": pa.array(ul.astype(object), type=pa.string()),
                "n": pa.array(n),
                "s": pa.array(s),
                "ss": pa.array(ss),
            }
        )

    mom = (
        ds.map_batches(moments, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s", alias_name="s"),
            Sum("ss", alias_name="ss"),
        )
        .take_all()
    )
    # type -> (n, s, isqrt(9*(n*ss - s^2))) with exact Python ints
    thresh = {}
    for row in mom:
        n, s, ss = int(row["n"]), int(row["s"]), int(row["ss"])
        if n < 2:
            continue
        rhs = 9 * (n * ss - s * s)
        thresh[row["event_type"]] = (n, s, math.isqrt(rhs) if rhs >= 0 else -1)

    EMPTY_O = pa.table(
        {
            "event_id": pa.nulls(0, pa.int64()),
            "event_type": pa.nulls(0, pa.string()),
            "value_cents": pa.nulls(0, pa.int64()),
        }
    )

    def screen(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "event_type" not in batch.column_names:
            return EMPTY_O
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        c = _cents_of(batch)
        keep = np.zeros(c.shape[0], dtype=bool)
        for tp, (n, s, r) in thresh.items():
            m = et == tp
            if not m.any():
                continue
            if n * int(np.abs(c[m]).max()) >= 1 << 62:
                raise ValueError("n*c would overflow int64")
            lhs = np.abs(n * c[m] - s)
            keep[m] = lhs > r
        if not keep.any():
            return EMPTY_O
        mask = pa.array(keep)
        return pa.table(
            {
                "event_id": batch["event_id"].filter(mask),
                "event_type": batch["event_type"].filter(mask),
                "value_cents": pa.array(c[keep]),
            }
        )

    return ds.map_batches(screen, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Deterministic document graph (session 15): binary-tree edges on the
# 1-based id k = doc_id + 1 (k -> 2k, 2k+1) guarantee connectivity from
# k=1 with diameter <= ceil(log2 n), plus DATA-DERIVED skip edges
# k -> k + 1 + (n_chars % 64) so distances are not closed-form.  Every
# edge increases k (a DAG), which (a) bounds the oracle's recursion and
# (b) lets triangle counting orient each triangle u < v < w exactly once.
# ---------------------------------------------------------------------------


def _doc_graph_edges(sf_dir: str) -> tuple[ray.data.Dataset, int]:
    """(edges Dataset of (u, v) int64 with u < v, n_docs).  One streaming
    pass over (doc_id, n_chars); <= 3 edges per doc, 16 B/row."""
    import pyarrow.parquet as pq

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    EMPTY = pa.table(
        {"u": pa.nulls(0, pa.int64()), "v": pa.nulls(0, pa.int64())}
    )

    def mk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return EMPTY
        k = batch["doc_id"].to_numpy(zero_copy_only=False) + 1
        nc = batch["n_chars"].to_numpy(zero_copy_only=False)
        us, vs = [], []
        for tgt in (2 * k, 2 * k + 1, k + 1 + (nc % 64)):
            m = tgt <= n
            us.append(k[m])
            vs.append(tgt[m])
        u = np.concatenate(us)
        v = np.concatenate(vs)
        # dedup within the batch (a skip edge can coincide with a tree
        # edge); cross-batch dups are impossible (u is batch-local)
        key = u * np.int64(n + 1) + v
        _, idx = np.unique(key, return_index=True)
        return pa.table({"u": pa.array(u[idx]), "v": pa.array(v[idx])})

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    return ds.map_batches(mk, batch_format="pyarrow"), n


def doc_graph_bfs_levels(sf_dir: str, max_level: int = 40) -> "pd.DataFrame":
    """BFS shortest-path levels from the root (doc_id 0) over the
    deterministic document graph — the ITERATIVE frontier-expansion
    operator shape (BSP): each round broadcasts the frontier id set and
    streams the edge table once, emitting newly reached nodes.

    Scale posture: edges materialize once (16 B/row) and stream per
    round; node state (level array, 8 B/node) lives OFF-DRIVER as an
    ObjectRef passed ref-to-ref between rounds (round-5 discipline:
    the driver only ray.get()s the scalar frontier size), and the
    frontier broadcast is <= 8 B/node — the same node-state-small,
    edges-never-reshuffled posture as pipelines/graph.py pagerank.
    Rounds = graph diameter (<= ceil(log2 n) + skip shortcuts), so the
    job count is logarithmic in corpus size.  Oracle: WITH RECURSIVE
    over the same edge definition, min(level) per node."""
    import pandas as pd

    edges, n = _doc_graph_edges(sf_dir)
    if n == 0:
        return pd.DataFrame(
            {"doc_id": pd.Series(dtype="int64"),
             "level": pd.Series(dtype="int64")}
        )
    edges = edges.materialize()

    @ray.remote
    def _bfs_init(n_: int):
        level = np.full(n_ + 1, -1, dtype=np.int64)
        level[1] = 0
        return level

    @ray.remote(num_returns=3)
    def _bfs_fold(level: np.ndarray, lvl: int, *blocks: pa.Table):
        vs = [
            b["v"].to_numpy(zero_copy_only=False)
            for b in blocks
            if b.num_rows and "v" in b.column_names
        ]
        cand = np.unique(np.concatenate(vs)) if vs else np.empty(0, np.int64)
        new = cand[level[cand] < 0]
        out = level.copy()
        out[new] = lvl
        return out, new, int(new.shape[0])

    @ray.remote
    def _bfs_emit(level: np.ndarray) -> pa.Table:
        hit = np.nonzero(level >= 0)[0]
        return pa.table(
            {
                "doc_id": pa.array((hit - 1).astype(np.int64)),
                "level": pa.array(level[hit]),
            }
        )

    level_ref = _bfs_init.remote(n)
    frontier_ref = ray.put(np.array([1], dtype=np.int64))
    n_front = 1

    for lvl in range(1, max_level + 1):
        if n_front == 0:
            break

        def expand(batch: pa.Table, _f=frontier_ref) -> pa.Table:
            if batch.num_rows == 0 or "u" not in batch.column_names:
                return pa.table({"v": pa.nulls(0, pa.int64())})
            f = ray.get(_f) if not isinstance(_f, np.ndarray) else _f
            u = batch["u"].to_numpy(zero_copy_only=False)
            v = batch["v"].to_numpy(zero_copy_only=False)
            hit = np.isin(u, f)
            return pa.table({"v": pa.array(np.unique(v[hit]))})

        reached_refs = (
            edges.map_batches(expand, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        level_ref, frontier_ref, n_ref = _bfs_fold.remote(
            level_ref, lvl, *reached_refs
        )
        n_front = ray.get(n_ref)  # scalar signal only

    return ray.get(_bfs_emit.remote(level_ref)).to_pandas()


def doc_graph_sssp(sf_dir: str, d_max: int = 48) -> "pd.DataFrame":
    """Bounded-radius weighted single-source shortest paths from the root
    over the deterministic document graph — Bellman-Ford as BSP frontier
    relaxation (iterative graph primitive 7).  Edge weight is the
    data-derived 1 + (u + v) % 3; a node is reported iff its shortest
    distance is <= d_max, and that distance is EXACT: every prefix of a
    path with total weight <= d_max itself weighs <= d_max, so pruning
    tentative distances > d_max never cuts an optimal path.

    Scale posture: identical to doc_graph_bfs_levels — edges materialize
    once (16 B/row) and stream per round, node state (dist array,
    8 B/node) lives OFF-DRIVER as an ObjectRef passed ref-to-ref
    between rounds (round-5 discipline: the driver only ray.get()s the
    scalar improved-count), the frontier broadcast ships only (id,
    dist) pairs for nodes that IMPROVED last round.  Rounds <= d_max
    (min edge weight 1 bounds hop count), each a single edge-table
    pass with per-batch min-combining so the gather task folds <= one
    row per distinct reached node.  Oracle: WITH RECURSIVE carrying
    (node, d), pruned at d_max, min(d) per node — semi-naive
    evaluation terminates because distances are bounded integers."""
    import pandas as pd

    edges, n = _doc_graph_edges(sf_dir)
    if n == 0:
        return pd.DataFrame(
            {"doc_id": pd.Series(dtype="int64"),
             "dist": pd.Series(dtype="int64")}
        )
    edges = edges.materialize()

    INF = np.int64(2**62)

    @ray.remote
    def _sssp_init(n_: int):
        dist = np.full(n_ + 1, INF, dtype=np.int64)
        dist[1] = 0
        return dist

    @ray.remote(num_returns=3)
    def _sssp_fold(dist: np.ndarray, *blocks: pa.Table):
        vs, cs = [], []
        for b in blocks:
            if b.num_rows and "v" in b.column_names:
                vs.append(b["v"].to_numpy(zero_copy_only=False))
                cs.append(b["d"].to_numpy(zero_copy_only=False))
        if not vs:
            return dist, (np.empty(0, np.int64), np.empty(0, np.int64)), 0
        v = np.concatenate(vs)
        d = np.concatenate(cs)
        o = np.lexsort((d, v))
        v, d = v[o], d[o]
        first = np.ones(v.shape[0], dtype=bool)
        first[1:] = v[1:] != v[:-1]
        v, d = v[first], d[first]
        imp = d < dist[v]
        f_ids, f_d = v[imp], d[imp]
        out = dist.copy()
        out[f_ids] = f_d
        return out, (f_ids, f_d), int(f_ids.shape[0])

    @ray.remote
    def _sssp_emit(dist: np.ndarray, bound: int) -> pa.Table:
        hit = np.nonzero(dist <= bound)[0]
        return pa.table(
            {
                "doc_id": pa.array((hit - 1).astype(np.int64)),
                "dist": pa.array(dist[hit]),
            }
        )

    dist_ref = _sssp_init.remote(n)
    fref = ray.put(
        (np.array([1], dtype=np.int64), np.array([0], dtype=np.int64))
    )
    n_imp = 1

    for _ in range(d_max + 1):
        if n_imp == 0:
            break

        def relax(batch: pa.Table, _f=fref) -> pa.Table:
            empty = pa.table(
                {"v": pa.nulls(0, pa.int64()), "d": pa.nulls(0, pa.int64())}
            )
            if batch.num_rows == 0 or "u" not in batch.column_names:
                return empty
            ids, dd = ray.get(_f) if not isinstance(_f, tuple) else _f
            u = batch["u"].to_numpy(zero_copy_only=False)
            v = batch["v"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(ids, u)
            pos = np.minimum(pos, ids.shape[0] - 1)
            hit = ids[pos] == u
            if not hit.any():
                return empty
            u_h, v_h = u[hit], v[hit]
            cand = dd[pos[hit]] + 1 + (u_h + v_h) % 3
            keep = cand <= d_max
            v_h, cand = v_h[keep], cand[keep]
            if v_h.shape[0] == 0:
                return empty
            # per-batch min per target: sort by (v, cand), keep firsts
            o = np.lexsort((cand, v_h))
            v_h, cand = v_h[o], cand[o]
            first = np.ones(v_h.shape[0], dtype=bool)
            first[1:] = v_h[1:] != v_h[:-1]
            return pa.table(
                {"v": pa.array(v_h[first]), "d": pa.array(cand[first])}
            )

        reached_refs = (
            edges.map_batches(relax, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        dist_ref, fref, n_ref = _sssp_fold.remote(dist_ref, *reached_refs)
        n_imp = ray.get(n_ref)  # scalar signal only

    return ray.get(_sssp_emit.remote(dist_ref, d_max)).to_pandas()


def doc_graph_triangles(sf_dir: str) -> "pd.DataFrame":
    """Triangle + wedge count over the deterministic document graph —
    the wedge-generation/edge-semi-join shape (the MapReduce triangle
    algorithm): orient edges u < v (true by construction), co-locate
    each node's out-neighbors with ONE u%P exchange, emit candidate
    wedges (v, w) with v < w per node (out-degree <= 3, so <= 3 wedges
    per node — never quadratic), then probe the wedge keys against the
    edge set co-partitioned on v%P.  Wedge totals for the clustering
    coefficient ride as exact-int degree partials.

    Oracle: the classic 3-way self-join (e a JOIN e b ON b.u = a.v JOIN
    e c ON c.u = a.u AND c.v = b.v) + sum d*(d-1)/2 over undirected
    degrees."""
    import pandas as pd

    edges, n = _doc_graph_edges(sf_dir)
    if n == 0:
        return pd.DataFrame(
            {"n_triangles": pd.Series([0], dtype="int64"),
             "n_wedges": pd.Series([0], dtype="int64")}
        )
    # three consumers below (wedge chain, edge-key probe side, degree
    # partials) — materialize once so the read+build runs once, not 3x
    edges = edges.materialize()
    P = 32
    span = np.int64(n + 1)

    def part_u(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "u" not in batch.column_names:
            return pa.table(
                {"u": pa.nulls(0, pa.int64()), "v": pa.nulls(0, pa.int64()),
                 "part": pa.nulls(0, pa.int64())}
            )
        u = batch["u"].to_numpy(zero_copy_only=False)
        return batch.append_column("part", pa.array(u % P))

    def wedges_of(group: pa.Table) -> pa.Table:
        empty = pa.table({"wkey": pa.nulls(0, pa.int64())})
        if group.num_rows == 0 or "u" not in group.column_names:
            return empty
        u = group["u"].to_numpy(zero_copy_only=False)
        v = group["v"].to_numpy(zero_copy_only=False)
        # per-u out-neighbor segments, vectorized: sort by (u, v), pair
        # consecutive entries within a segment (out-degree <= 3 -> at
        # most 3 pairs per node, enumerated by the two offset patterns)
        o = np.lexsort((v, u))
        u, v = u[o], v[o]
        keys = []
        # pairs at distance d inside each u-segment (d = 1, 2 covers
        # out-degree <= 3; v is sorted within the segment so v_i < v_j)
        for d in (1, 2):
            m = np.zeros(u.shape[0], dtype=bool)
            if u.shape[0] > d:
                m[:-d] = u[:-d] == u[d:]
            i = np.nonzero(m)[0]
            if i.shape[0]:
                keys.append(v[i] * span + v[i + d])
        if not keys:
            return empty
        return pa.table({"wkey": pa.array(np.concatenate(keys))})

    # wedge keys (v, w) encoded v*(n+1)+w, partitioned by v%P to meet the
    # edge set partitioned the same way
    wedge_part = (
        edges.map_batches(part_u, batch_format="pyarrow")
        .groupby("part")
        .map_groups(wedges_of, batch_format="pyarrow")
        .map_batches(
            lambda b: (
                b.append_column(
                    "part",
                    pa.array(
                        (b["wkey"].to_numpy(zero_copy_only=False) // span) % P
                    ),
                )
                if b.num_rows and "wkey" in b.column_names
                else pa.table(
                    {"wkey": pa.nulls(0, pa.int64()),
                     "part": pa.nulls(0, pa.int64())}
                )
            ),
            batch_format="pyarrow",
        )
    )

    def edge_keys(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "u" not in batch.column_names:
            return pa.table(
                {"wkey": pa.nulls(0, pa.int64()),
                 "part": pa.nulls(0, pa.int64()), "is_edge": pa.nulls(0, pa.int64())}
            )
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"wkey": pa.array(u * span + v),
             "part": pa.array(u % P),
             "is_edge": pa.array(np.ones(u.shape[0], dtype=np.int64))}
        )

    def probe(group: pa.Table) -> pa.Table:
        empty = pa.table({"tri": pa.nulls(0, pa.int64())})
        if group.num_rows == 0 or "wkey" not in group.column_names:
            return empty
        k = group["wkey"].to_numpy(zero_copy_only=False)
        if "is_edge" in group.column_names:
            is_e = group["is_edge"].to_numpy(zero_copy_only=False)
        else:
            is_e = np.zeros(k.shape[0], dtype=np.int64)
        ek = k[is_e == 1]
        wk = k[is_e != 1]
        cnt = int(np.isin(wk, ek).sum()) if wk.shape[0] and ek.shape[0] else 0
        return pa.table({"tri": pa.array([cnt], type=pa.int64())})

    probe_in = wedge_part.map_batches(
        lambda b: (
            b.append_column(
                "is_edge",
                pa.array(np.zeros(b.num_rows, dtype=np.int64)),
            )
            if b.num_rows and "wkey" in b.column_names
            else pa.table(
                {"wkey": pa.nulls(0, pa.int64()),
                 "part": pa.nulls(0, pa.int64()),
                 "is_edge": pa.nulls(0, pa.int64())}
            )
        ),
        batch_format="pyarrow",
    ).union(edges.map_batches(edge_keys, batch_format="pyarrow"))

    tri_parts = (
        probe_in.groupby("part").map_groups(probe, batch_format="pyarrow")
    )
    tri = sum(
        int(b["tri"].to_numpy(zero_copy_only=False).sum())
        for b in tri_parts.iter_batches(batch_format="pyarrow")
        if b.num_rows
    )

    # undirected degrees: bincount partials per batch, one small reduce
    def deg_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "u" not in batch.column_names:
            return pa.table(
                {"node": pa.nulls(0, pa.int64()), "d": pa.nulls(0, pa.int64())}
            )
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        c = np.bincount(np.concatenate([u, v]), minlength=n + 1)
        nz = np.nonzero(c)[0]
        return pa.table(
            {"node": pa.array(nz.astype(np.int64)),
             "d": pa.array(c[nz].astype(np.int64))}
        )

    # degree partials reduce into one n+1 int64 array on the driver
    # (8 B/node — the same bounded node-state posture as BFS/pagerank;
    # cheaper than an engine groupby at this output cardinality)
    deg = np.zeros(n + 1, dtype=np.int64)
    for b in edges.map_batches(
        deg_partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            np.add.at(
                deg,
                b["node"].to_numpy(zero_copy_only=False),
                b["d"].to_numpy(zero_copy_only=False),
            )
    wedges = int((deg * (deg - 1) // 2).sum())

    import pandas as pd

    return pd.DataFrame(
        {"n_triangles": pd.Series([tri], dtype="int64"),
         "n_wedges": pd.Series([wedges], dtype="int64")}
    )


def sorted_neighborhood_pairs(
    sf_dir: str, w: int = 3, prefix: int = 16
) -> ray.data.Dataset:
    """Sorted-neighborhood candidate pairs — the classic record-linkage
    blocking method (sort every record by a key, pair records within a
    sliding rank window of w): emits (doc_id_a, doc_id_b, dist) for all
    docs within rank distance 1..w under ORDER BY substr(text, 1,
    prefix), doc_id.  Complements the repo's LSH/phonetic/acronym
    blocking families with the third classic candidate generator.

    Physical plan — a distributed ORDER BY with NO engine sort and no
    sampling (the global_event_ranks radix pattern, generalized to a
    string key):
      1. one scan histograms the 2-BYTE key prefix (<= 65536 skinny
         rows per batch, merged in one remote task); the cumulative
         histogram gives every bucket its exact global rank offset;
      2. rows exchange keyed by a balanced bucket->partition map (range
         partitioning without sampling error); each partition lexsorts
         (key, doc_id) per bucket and assigns offset + local position;
      3. pairs exchange on rank // B with the first w ranks of each
         block REPLICATED to the previous block, so every window pair
         is emitted exactly once with no cross-partition coordination.
    Exchange is 3 skinny passes (<= 8 + prefix + 8 B/row); content
    never shuffles.  Oracle: row_number window + rank-distance self
    join."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    P = 32

    EMPTY_PAIRS = pa.table(
        {
            "doc_id_a": pa.nulls(0, pa.int64()),
            "doc_id_b": pa.nulls(0, pa.int64()),
            "dist": pa.nulls(0, pa.int64()),
        }
    )

    def _keys(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        txt = batch["text"].to_pylist()
        key = np.array(
            [(t or "").encode()[:prefix] for t in txt], dtype=f"S{prefix}"
        )
        return ids, key

    def hist(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"bucket": pa.nulls(0, pa.int64()), "cnt": pa.nulls(0, pa.int64())}
        )
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return empty
        _, key = _keys(batch)
        b2 = np.frombuffer(key.tobytes(), dtype=np.uint8).reshape(-1, prefix)
        bucket = b2[:, 0].astype(np.int64) * 256 + b2[:, 1].astype(np.int64)
        c = np.bincount(bucket, minlength=65536)
        nz = np.nonzero(c)[0]
        return pa.table(
            {"bucket": pa.array(nz.astype(np.int64)),
             "cnt": pa.array(c[nz].astype(np.int64))}
        )

    @ray.remote
    def merge_hist(*tables) -> np.ndarray:
        total = np.zeros(65536, dtype=np.int64)
        for t in tables:
            for tb in (t.to_batches() if hasattr(t, "to_batches") else [t]):
                if tb.num_rows:
                    np.add.at(
                        total,
                        tb["bucket"].to_numpy(zero_copy_only=False),
                        tb["cnt"].to_numpy(zero_copy_only=False),
                    )
        return total

    hparts = docs.map_batches(hist, batch_format="pyarrow").materialize()
    counts = ray.get(merge_hist.remote(*hparts.to_arrow_refs()))
    n = int(counts.sum())
    if n < 2:
        return ray.data.from_arrow(EMPTY_PAIRS)
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    # balanced bucket -> partition map: partition p owns the bucket range
    # whose cumulative count covers (p/P .. (p+1)/P) of the rows
    part_of_bucket = np.minimum(
        (np.cumsum(counts) - 1) * P // max(n, 1), P - 1
    ).astype(np.int64)
    off_ref = ray.put(offsets)
    pob_ref = ray.put(part_of_bucket)

    def tag(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.nulls(0, pa.int64()),
                "key": pa.nulls(0, pa.binary(prefix)),
                "bucket": pa.nulls(0, pa.int64()),
                "part": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return empty
        ids, key = _keys(batch)
        b2 = np.frombuffer(key.tobytes(), dtype=np.uint8).reshape(-1, prefix)
        bucket = b2[:, 0].astype(np.int64) * 256 + b2[:, 1].astype(np.int64)
        pob = ray.get(pob_ref)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "key": pa.array(
                    # numpy S-item access strips trailing \x00 — re-pad
                    # to the fixed width (sorts identically: SQL compares
                    # the shorter string first, \x00 < any byte)
                    [bytes(k).ljust(prefix, b"\x00") for k in key],
                    type=pa.binary(prefix),
                ),
                "bucket": pa.array(bucket),
                "part": pa.array(pob[bucket]),
            }
        )

    def rank_kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.nulls(0, pa.int64()), "rank": pa.nulls(0, pa.int64())}
        )
        if group.num_rows == 0 or "doc_id" not in group.column_names:
            return empty
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        key = np.array(
            [k.as_py() for k in group["key"]], dtype=f"S{prefix}"
        )
        bucket = group["bucket"].to_numpy(zero_copy_only=False)
        off = ray.get(off_ref)
        o = np.lexsort((ids, key, bucket))
        bucket_s = bucket[o]
        # local position within each bucket run (buckets are contiguous
        # after the sort): global rank = bucket offset + local position
        change = np.concatenate(([True], bucket_s[1:] != bucket_s[:-1]))
        run_start = np.maximum.accumulate(
            np.where(change, np.arange(bucket_s.shape[0]), 0)
        )
        local = np.arange(bucket_s.shape[0]) - run_start
        rank = off[bucket_s] + local
        return pa.table(
            {"doc_id": pa.array(ids[o]), "rank": pa.array(rank)}
        )

    ranks = (
        docs.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(rank_kernel, batch_format="pyarrow")
    )

    B = max((n + P - 1) // P, w + 1)

    def tag_pairs(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.nulls(0, pa.int64()),
                "rank": pa.nulls(0, pa.int64()),
                "part": pa.nulls(0, pa.int64()),
            }
        )
        if batch.num_rows == 0 or "rank" not in batch.column_names:
            return empty
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        r = batch["rank"].to_numpy(zero_copy_only=False)
        part = r // B
        # replicate the first w ranks of each block to the previous
        # block so its tail windows can complete locally
        rep = (r % B < w) & (part > 0)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([ids, ids[rep]])),
                "rank": pa.array(np.concatenate([r, r[rep]])),
                "part": pa.array(np.concatenate([part, part[rep] - 1])),
            }
        )

    def pair_kernel(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "rank" not in group.column_names:
            return EMPTY_PAIRS
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        r = group["rank"].to_numpy(zero_copy_only=False)
        part = int(group["part"][0].as_py())
        o = np.argsort(r)
        ids, r = ids[o], r[o]
        lo, hi = part * B, (part + 1) * B
        a_out, b_out, d_out = [], [], []
        for d in range(1, w + 1):
            if r.shape[0] <= d:
                break
            # ranks are a contiguous run, so the row at position i+d is
            # rank r[i]+d exactly when the run has no gap — assert it
            m = (r[:-d] + d == r[d:]) & (r[:-d] >= lo) & (r[:-d] < hi)
            if m.any():
                a_out.append(ids[:-d][m])
                b_out.append(ids[d:][m])
                d_out.append(np.full(int(m.sum()), d, dtype=np.int64))
        if not a_out:
            return EMPTY_PAIRS
        return pa.table(
            {
                "doc_id_a": pa.array(np.concatenate(a_out)),
                "doc_id_b": pa.array(np.concatenate(b_out)),
                "dist": pa.array(np.concatenate(d_out)),
            }
        )

    return (
        ranks.map_batches(tag_pairs, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pair_kernel, batch_format="pyarrow")
    )


def doc_graph_mst(sf_dir: str) -> ray.data.Dataset:
    """Minimum spanning forest of the weighted document graph — the
    single-linkage dendrogram backbone (cut the forest at weight t and
    the components ARE the flagship's threshold-t clusters; the MST
    edge list is the full clustering hierarchy in n-1 rows).

    Edge weights are a deterministic function of the endpoints
    (w = (u*31 + v*7) % 97 + 1), so the graph is reproducible from the
    corpus alone; ties are broken by the total order (w, u, v) inside
    pipelines/graph.boruvka_mst, making the chosen forest independent
    of block layout (pinned EXACT against an in-test Kruskal).

    Scale posture: Boruvka rounds — labels broadcast 8 B/node, edges
    stream a per-batch min-per-component combiner, ONE small gather per
    round, O(log n) rounds.  Rows-only (MST is not SQL-expressible)."""
    from libpostal_ray.pipelines.graph import boruvka_mst

    edges, n = _doc_graph_edges(sf_dir)

    def weigh(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "u" not in batch.column_names:
            return pa.table(
                {"u": pa.nulls(0, pa.int64()), "v": pa.nulls(0, pa.int64()),
                 "w": pa.nulls(0, pa.int64())}
            )
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        return batch.append_column("w", pa.array((u * 31 + v * 7) % 97 + 1))

    return boruvka_mst(edges.map_batches(weigh, batch_format="pyarrow"))


def doc_graph_kcore(sf_dir: str) -> ray.data.Dataset:
    """Coreness histogram of the document graph: how many docs sit at
    each k-core level — the density ladder (high-coreness docs live in
    densely mutually-connected families; chain/bridge docs peel at 1).

    The peel itself is pipelines/graph.coreness (degrees from one
    streamed pass; each wave broadcasts the removed id set and streams
    the edges once for alive-neighbor decrements — <= 8 B/node of
    broadcast across ALL waves).  The histogram tail is a tiny
    aggregate over one row per node.  Rows-only (iterated peeling is
    not SQL-expressible); pinned against an independent dict-based
    peel in tests."""
    from libpostal_ray.pipelines.graph import coreness

    edges, n = _doc_graph_edges(sf_dir)
    core = coreness(edges)

    def hist(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "coreness" not in batch.column_names:
            return pa.table(
                {"coreness": pa.nulls(0, pa.int64()),
                 "n_docs": pa.nulls(0, pa.int64())}
            )
        c = batch["coreness"].to_numpy(zero_copy_only=False)
        k, cnt = np.unique(c, return_counts=True)
        return pa.table(
            {"coreness": pa.array(k), "n_docs": pa.array(cnt.astype(np.int64))}
        )

    return (
        core.map_batches(hist, batch_format="pyarrow")
        .groupby("coreness")
        .sum("n_docs")
        .map_batches(
            lambda b: b.rename_columns(["coreness", "n_docs"]),
            batch_format="pyarrow",
        )
        .sort("coreness")
    )


def user_time_weighted_value(sf_dir: str) -> ray.data.Dataset:
    """Per-user TIME-WEIGHTED mean value: a step function carries each
    event's value until the next event, so the mean is
    sum(milli_i * dur_i) / sum(dur_i) over the user's gaps — the metric
    behind "average balance held", robust to burst sampling where the
    plain mean over-weights rapid-fire events.

    Exactness: value integerized per row (floor milli, the repo
    convention), durations are int64 microseconds; num <= max_milli x
    user_span_us < 2^63 (loud overflow check), so both moments ride as
    exact BIGINTs and the ONE float64 division matches DuckDB
    bit-for-bit.  Users with a single event have no gap and are
    excluded (SQL NULL-skip of lead()).

    Physical plan: ONE user%P exchange of 32 B/row (user, ts, event_id,
    milli); users co-partition, so each partition lexsorts its own
    users by (ts, event_id) — the tie-break pins equal timestamps to
    ONE order on both engines — and reduces gaps per segment."""
    P = 32

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id", "value"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "user_id": pa.nulls(0, pa.int64()),
            "ts": pa.nulls(0, pa.int64()),
            "event_id": pa.nulls(0, pa.int64()),
            "milli": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "user_id" not in batch.column_names:
            return EMPTY
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts_col = batch["ts"]
        ts = (
            ts_col.combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
            if isinstance(ts_col, pa.ChunkedArray)
            else ts_col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        v = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "user_id": pa.array(u),
                "ts": pa.array(np.asarray(ts, dtype=np.int64)),
                "event_id": pa.array(
                    batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "milli": pa.array(np.floor(v * 1000.0).astype(np.int64)),
                "part": pa.array(u % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.nulls(0, pa.int64()),
                "num_milli_us": pa.nulls(0, pa.int64()),
                "den_us": pa.nulls(0, pa.int64()),
                "twa_milli": pa.nulls(0, pa.float64()),
            }
        )
        if group.num_rows == 0 or "user_id" not in group.column_names:
            return empty
        u = group["user_id"].to_numpy(zero_copy_only=False)
        ts = group["ts"].to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        mv = group["milli"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u_s, ts_s, mv_s = u[order], ts[order], mv[order]
        same = u_s[1:] == u_s[:-1]
        if not same.any():
            return empty
        gu = u_s[1:][same]
        dur = ts_s[1:][same] - ts_s[:-1][same]
        milli = mv_s[:-1][same]  # the EARLIER event's value carries
        starts = np.flatnonzero(np.concatenate(([True], gu[1:] != gu[:-1])))
        den = np.add.reduceat(dur, starts)
        # overflow guard BEFORE the products: per-user |num| is bounded
        # by max |milli| x that user's span — loud, not silent wraparound
        mmax = int(np.abs(milli).max(initial=0))
        if mmax and mmax > (2**62) // max(int(den.max(initial=1)), 1):
            raise ValueError("user_time_weighted_value: int64 overflow risk")
        prod = milli * dur
        num = np.add.reduceat(prod, starts)
        return pa.table(
            {
                "user_id": pa.array(gu[starts]),
                "num_milli_us": pa.array(num.astype(np.int64)),
                "den_us": pa.array(den.astype(np.int64)),
                "twa_milli": pa.array(
                    num.astype(np.float64) / den.astype(np.float64)
                ),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def events_cusum_changepoint(sf_dir: str) -> ray.data.Dataset:
    """CUSUM change-point screen over the DAILY value series: the day k*
    maximizing |n * cumsum_k - k * total| — the classic mean-shift
    statistic with the division cleared (n x the usual cumsum-minus-
    expected deviation), so every quantity stays an exact int64 and the
    argmax is engine-independent (ties break to the earliest day).

    Physical plan: per-batch (epoch-day, milli-sum) partials bound the
    exchange by active days per batch; days are dimension-cardinality
    (10^5 days = 300 years), so ONE final group scans the merged series
    for the prefix-deviation argmax.  Overflow: |dev| <= n_days x
    total_milli — loud-checked against 2^62."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "value"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    DAY_US = np.int64(86_400_000_000)

    EMPTY_OUT = pa.table(
        {
            "day_idx": pa.nulls(0, pa.int64()),
            "dev": pa.nulls(0, pa.int64()),
            "n_days": pa.nulls(0, pa.int64()),
            "total_milli": pa.nulls(0, pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "ts" not in batch.column_names:
            return pa.table(
                {
                    "day": pa.nulls(0, pa.int64()),
                    "m": pa.nulls(0, pa.int64()),
                    "g": pa.nulls(0, pa.int64()),
                }
            )
        ts_col = batch["ts"]
        ts = (
            ts_col.combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
            if isinstance(ts_col, pa.ChunkedArray)
            else ts_col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        d = np.asarray(ts, dtype=np.int64) // DAY_US
        v = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        milli = np.floor(v * 1000.0).astype(np.int64)
        ud, inv = np.unique(d, return_inverse=True)
        tot = np.zeros(ud.shape[0], dtype=np.int64)
        np.add.at(tot, inv, milli)
        return pa.table(
            {
                "day": pa.array(ud),
                "m": pa.array(tot),
                "g": pa.array(np.zeros(ud.shape[0], dtype=np.int64)),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "day" not in group.column_names:
            return EMPTY_OUT
        d = group["day"].to_numpy(zero_copy_only=False)
        m = group["m"].to_numpy(zero_copy_only=False)
        ud, inv = np.unique(d, return_inverse=True)
        tot = np.zeros(ud.shape[0], dtype=np.int64)
        np.add.at(tot, inv, m)
        n = np.int64(ud.shape[0])
        total = int(tot.sum())
        if n * max(abs(total), 1) > 2**62:
            raise ValueError("events_cusum_changepoint: int64 overflow risk")
        cum = np.cumsum(tot)
        k = np.arange(1, int(n) + 1, dtype=np.int64)
        dev = n * cum - k * np.int64(total)
        best = int(np.argmax(np.abs(dev)))  # first max -> earliest day
        return pa.table(
            {
                "day_idx": pa.array([int(ud[best])], type=pa.int64()),
                "dev": pa.array([int(dev[best])], type=pa.int64()),
                "n_days": pa.array([int(n)], type=pa.int64()),
                "total_milli": pa.array([total], type=pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .map_groups(
            lambda t: kernel(t.drop_columns(["g"]))
            if "g" in t.column_names
            else kernel(t),
            batch_format="pyarrow",
        )
    )


def linkage_agreement_patterns(sf_dir: str, w: int = 3) -> ray.data.Dataset:
    """Fellegi-Sunter sufficient statistics: exact counts of the 16
    per-field agreement patterns over id-window candidate pairs
    (0 < doc_id_b - doc_id_a <= 3; fields lang / source / n_chars//64
    bucket / 8-char text prefix) — see pipelines/linkage.py for the
    2^k-pattern decomposition that keeps the E-step off the pairs."""
    from libpostal_ray.pipelines.linkage import agreement_patterns

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    return agreement_patterns(docs, w=w)


def linkage_fs_em(sf_dir: str) -> "pd.DataFrame":
    """Unsupervised Fellegi-Sunter parameter estimation: EM over the
    exact agreement-pattern counts (ONE distributed pass; the fixpoint
    itself runs on 16 float64s in a fixed order — deterministic, pinned
    against an independent per-pattern EM in tests).  Returns one row
    per field: m, u, the log2 agree/disagree weights, match prior."""
    from libpostal_ray.pipelines.linkage import linkage_fs

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    return linkage_fs(docs).to_pandas()


def _group_value_counts(
    ds: ray.data.Dataset, group_col: str, value_fn, P: int = 8
) -> "pd.DataFrame":
    """Exact (group, value, cnt) counts — the shared sufficient-statistic
    pass for the rank/ECDF test operators (KS, Mann-Whitney): per-batch
    partials over the (group, int value) cell space, ONE value%P
    exchange to finish cells, then the CONSTANT-SIZE count table gathers
    to the driver (bounded by #groups x #distinct values, independent of
    row count — the same "partial-aggregate the sufficient statistics"
    discipline as lineitem_corr_matrix)."""
    import pandas as pd

    EMPTY = pa.table(
        {
            "g": pa.nulls(0, pa.large_string()),
            "v": pa.nulls(0, pa.int64()),
            "n": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or group_col not in batch.column_names:
            return EMPTY
        g = np.asarray(batch[group_col].to_pylist(), dtype=object)
        v = value_fn(batch)
        comp = np.asarray(
            [f"{a}\x01{b}" for a, b in zip(g, v)], dtype=object
        )
        uk, inv = np.unique(comp, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        ug = [c.split("\x01")[0] for c in uk]
        uv = np.asarray([int(c.split("\x01")[1]) for c in uk], dtype=np.int64)
        return pa.table(
            {
                "g": pa.array(ug, type=pa.large_string()),
                "v": pa.array(uv),
                "n": pa.array(cnt),
                "part": pa.array(np.abs(uv) % P),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "g": pa.nulls(0, pa.large_string()),
                "v": pa.nulls(0, pa.int64()),
                "n": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "g" not in group.column_names:
            return empty
        g = np.asarray(group["g"].to_pylist(), dtype=object)
        v = group["v"].to_numpy(zero_copy_only=False)
        n = group["n"].to_numpy(zero_copy_only=False)
        comp = np.asarray(
            [f"{a}\x01{b}" for a, b in zip(g, v)], dtype=object
        )
        uk, inv = np.unique(comp, return_inverse=True)
        tot = np.zeros(uk.shape[0], dtype=np.int64)
        np.add.at(tot, inv, n)
        return pa.table(
            {
                "g": pa.array(
                    [c.split("\x01")[0] for c in uk], type=pa.large_string()
                ),
                "v": pa.array(
                    np.asarray(
                        [int(c.split("\x01")[1]) for c in uk], dtype=np.int64
                    )
                ),
                "n": pa.array(tot),
            }
        )

    df = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .to_pandas()
    )
    if "g" not in df.columns:
        return pd.DataFrame({"g": [], "v": [], "n": []})
    return df


def _cum_count_matrix(df: "pd.DataFrame"):
    """(group names sorted, union values sorted, per-group cumulative
    count matrix, per-group totals) from a (g, v, n) count table."""
    groups = sorted(df["g"].unique())
    vals = np.unique(df["v"].to_numpy())
    cnt = np.zeros((len(groups), vals.shape[0]), dtype=np.int64)
    gi = {s: i for i, s in enumerate(groups)}
    rows = np.asarray([gi[s] for s in df["g"]], dtype=np.int64)
    cols = np.searchsorted(vals, df["v"].to_numpy())
    cnt[rows, cols] = df["n"].to_numpy()
    cum = np.cumsum(cnt, axis=1)
    return groups, vals, cnt, cum, cum[:, -1] if vals.size else np.zeros(
        len(groups), dtype=np.int64
    )


def source_length_ks(sf_dir: str) -> "pd.DataFrame":
    """EXACT two-sample Kolmogorov-Smirnov statistic between every pair
    of sources over the document-length distribution — the
    distribution-drift screen ("is feed B producing the same length mix
    as feed A?") with the division cleared: ks_num = max over x of
    |cum_a(x)*n_b - cum_b(x)*n_a| is an exact BIGINT (D = ks_num /
    (n_a*n_b), emitted as the one float both engines compute
    identically from the same ints).

    Scale posture: the distributed pass is _group_value_counts — the
    cell table is #sources x #distinct lengths regardless of corpus
    size; the pairwise max runs vectorized on that constant-size
    matrix."""
    import pandas as pd

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    def val(batch: pa.Table) -> np.ndarray:
        return batch["n_chars"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )

    cdf = _group_value_counts(docs, "source", val)
    out = {
        "source_a": [], "source_b": [], "n_a": [], "n_b": [],
        "ks_num": [], "ks_d": [],
    }
    if len(cdf):
        groups, vals, cnt, cum, tot = _cum_count_matrix(cdf)
        if int(tot.max()) ** 2 >= 1 << 62:
            raise ValueError("source_length_ks: n_a*n_b overflows int64")
        for i, a in enumerate(groups):
            for j in range(i + 1, len(groups)):
                num = int(
                    np.abs(cum[i] * tot[j] - cum[j] * tot[i]).max()
                ) if vals.size else 0
                out["source_a"].append(a)
                out["source_b"].append(groups[j])
                out["n_a"].append(int(tot[i]))
                out["n_b"].append(int(tot[j]))
                out["ks_num"].append(num)
                out["ks_d"].append(num / (int(tot[i]) * int(tot[j])))
    return pd.DataFrame(out).astype(
        {"n_a": "int64", "n_b": "int64", "ks_num": "int64"}
    )


def events_mannwhitney(sf_dir: str) -> "pd.DataFrame":
    """EXACT Mann-Whitney U between every pair of event types over
    value (floor-milli ints) — the nonparametric "do two segments draw
    from the same value distribution?" test with ALL arithmetic integer:
    midranks are carried DOUBLED (2*rank_below + ties + 1), so the tied
    rank sum r1x2 and both U statistics (also doubled: u2_a, u2_b with
    u2_a + u2_b = 2*n_a*n_b) are exact BIGINTs.

    Scale posture: same constant-size sufficient-statistic pass as
    source_length_ks (#types x #distinct milli values cells); the
    pairwise rank sums are dot products on that matrix."""
    import pandas as pd

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    def val(batch: pa.Table) -> np.ndarray:
        return np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 1000.0
        ).astype(np.int64)

    cdf = _group_value_counts(ev, "event_type", val)
    out = {
        "type_a": [], "type_b": [], "n_a": [], "n_b": [],
        "u2_a": [], "u2_b": [],
    }
    if len(cdf):
        groups, vals, cnt, cum, tot = _cum_count_matrix(cdf)
        if int(tot.max()) ** 2 * 4 >= 1 << 62:
            raise ValueError("events_mannwhitney: 2*n_a*n_b overflows int64")
        for i, a in enumerate(groups):
            for j in range(i + 1, len(groups)):
                below = (cum[i] - cnt[i]) + (cum[j] - cnt[j])
                r1x2 = int(
                    (cnt[i] * (2 * below + cnt[i] + cnt[j] + 1)).sum()
                ) if vals.size else 0
                na, nb = int(tot[i]), int(tot[j])
                u2a = 2 * na * nb + na * (na + 1) - r1x2
                out["type_a"].append(a)
                out["type_b"].append(groups[j])
                out["n_a"].append(na)
                out["n_b"].append(nb)
                out["u2_a"].append(u2a)
                out["u2_b"].append(2 * na * nb - u2a)
    return pd.DataFrame(out).astype(
        {"n_a": "int64", "n_b": "int64", "u2_a": "int64", "u2_b": "int64"}
    )


def doc_graph_matching(sf_dir: str) -> ray.data.Dataset:
    """Greedy maximal matching of the weighted document graph — the
    "pair each doc with its single best partner" arbitration (one-to-one
    keep/drop assignment over near-dup candidates).  Output equals the
    SEQUENTIAL greedy matching under the strict total order (w, u, v),
    computed in parallel locally-dominant rounds — see
    pipelines/graph.maximal_matching for the per-round plan (per-node
    block minima as the combiner, matched-vertex set broadcast, edges
    never reshuffle).  Rows-only (iterated matching is not
    SQL-expressible); pinned against an in-test sequential greedy."""
    from libpostal_ray.pipelines.graph import maximal_matching

    edges, n = _doc_graph_edges(sf_dir)

    def weigh(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "u" not in batch.column_names:
            return pa.table(
                {"u": pa.nulls(0, pa.int64()), "v": pa.nulls(0, pa.int64()),
                 "w": pa.nulls(0, pa.int64())}
            )
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        return batch.append_column("w", pa.array((u * 31 + v * 7) % 97 + 1))

    return maximal_matching(edges.map_batches(weigh, batch_format="pyarrow"))


# Poisson(1) inverse-CDF table (float64 cumsum of e^-1/k!) — weights
# above 16 have probability < 1e-14 per draw; the table is the spec.
_POIS1_CDF = np.cumsum(
    np.exp(-1.0) / np.cumprod(np.concatenate(([1.0], np.arange(1.0, 17.0))))
)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over uint64 (the repo's stateless-randomness
    workhorse — same mixer as functions/hll.py)."""
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _poisson1_weights(ids: np.ndarray, b: int, B: int) -> np.ndarray:
    """Deterministic Poisson(1) draw per (event_id, replicate): u from
    splitmix64(id*B + b) scaled to [0,1), inverted through the CDF
    table.  A pure function of the row id — any block layout, any
    engine, same weights (the Lehmer-hash discipline of
    stratified_sample, lifted to resampling)."""
    h = _splitmix64(ids.astype(np.uint64) * np.uint64(B) + np.uint64(b))
    u = h.astype(np.float64) / 18446744073709551616.0  # / 2^64
    return np.searchsorted(_POIS1_CDF, u).astype(np.int64)


def events_bootstrap_ci(
    sf_dir: str, B: int = 200, q_lo: float = 0.025, q_hi: float = 0.975
) -> "pd.DataFrame":
    """PERCENTILE BOOTSTRAP confidence interval for the mean event value
    (milli ints) via the POISSON BOOTSTRAP — the web-scale resampling
    method (Chamandy et al. 2012, "Estimating uncertainty for massive
    data streams"): instead of materializing B resamples, every row
    contributes an independent Poisson(1) weight to each replicate, so
    ONE streaming pass accumulates all B weighted (sum, count) pairs as
    exact int64s.  Replicate means are then B float divisions of exact
    ints and the CI is an order statistic (quantile_disc semantics:
    index ceil(q*B)-1) — deterministic end to end, any block layout.

    Scale posture: the exchange is 3 int64s x (B+1) keys per batch
    regardless of row count; weights derive from splitmix64(event_id),
    so no RNG state crosses tasks.  Rows-only (the resampling loop is
    not SQL-expressible); pinned against an independent single-process
    scalar implementation of the identical scheme in tests."""
    import pandas as pd

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "value"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "b": pa.nulls(0, pa.int64()),
            "s": pa.nulls(0, pa.int64()),
            "c": pa.nulls(0, pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "event_id" not in batch.column_names:
            return EMPTY
        ids = batch["event_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        milli = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 1000.0
        ).astype(np.int64)
        if ids.size and int(np.abs(milli).max()) > 1 << 40:
            raise ValueError("events_bootstrap_ci: milli values too large")
        bs = np.empty(B + 1, dtype=np.int64)
        ss = np.empty(B + 1, dtype=np.int64)
        cs = np.empty(B + 1, dtype=np.int64)
        for b in range(B):
            w = _poisson1_weights(ids, b, B)
            bs[b] = b
            ss[b] = int((w * milli).sum())
            cs[b] = int(w.sum())
        # the b = -1 row carries the plain (unweighted) moments
        bs[B] = -1
        ss[B] = int(milli.sum())
        cs[B] = ids.size
        return pa.table(
            {"b": pa.array(bs), "s": pa.array(ss), "c": pa.array(cs)}
        )

    agg = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("b")
        .sum(["s", "c"])
        .to_pandas()
    )
    out = {
        "n": [], "n_replicates": [], "mean_milli": [],
        "ci_lo_milli": [], "ci_hi_milli": [],
    }
    if len(agg):
        agg = agg.rename(
            columns={"sum(s)": "s", "sum(c)": "c"}
        )
        plain = agg[agg.b == -1]
        reps = agg[agg.b >= 0].sort_values("b")
        n = int(plain.c.iloc[0])
        if n > 0:
            means = np.sort(
                reps.s.to_numpy().astype(np.float64)
                / np.maximum(reps.c.to_numpy().astype(np.float64), 1.0)
            )
            ilo = max(int(np.ceil(q_lo * B)) - 1, 0)
            ihi = max(int(np.ceil(q_hi * B)) - 1, 0)
            out["n"].append(n)
            out["n_replicates"].append(B)
            out["mean_milli"].append(float(plain.s.iloc[0]) / n)
            out["ci_lo_milli"].append(float(means[ilo]))
            out["ci_hi_milli"].append(float(means[ihi]))
    return pd.DataFrame(out).astype(
        {"n": "int64", "n_replicates": "int64"}
    )


def events_isotonic_daily(sf_dir: str) -> ray.data.Dataset:
    """ISOTONIC (non-decreasing L2) regression of the daily mean value
    series — the shape-constrained trend fit ("is activity value
    trending up, and what is the best monotone approximation?").  The
    pool-adjacent-violators solution is computed with EXACT arithmetic:
    pools carry integer (milli-sum, count) and every pooling decision
    compares means by cross-multiplication of Python ints (no float
    enters until the final per-pool division), so the fit is
    deterministic on any engine and any block layout.

    Physical plan: per-batch (day, sum, count) partials bound the
    exchange by active days per batch (the cusum discipline); ONE final
    group runs PAVA over the merged day series — days are
    dimension-cardinality, so the sequential stack scan is constant
    work.  Rows-only (the pooling recursion is not SQL-expressible);
    pinned against TWO independent references in tests (Fraction stack
    PAVA and the max-min minimax formula)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "value"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    DAY_US = np.int64(86_400_000_000)

    EMPTY_OUT = pa.table(
        {
            "day_idx": pa.nulls(0, pa.int64()),
            "n_events": pa.nulls(0, pa.int64()),
            "pool_start": pa.nulls(0, pa.int64()),
            "iso_milli": pa.nulls(0, pa.float64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "ts" not in batch.column_names:
            return pa.table(
                {
                    "day": pa.nulls(0, pa.int64()),
                    "s": pa.nulls(0, pa.int64()),
                    "c": pa.nulls(0, pa.int64()),
                    "g": pa.nulls(0, pa.int64()),
                }
            )
        ts_col = batch["ts"]
        ts = (
            ts_col.combine_chunks().cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            if isinstance(ts_col, pa.ChunkedArray)
            else ts_col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        d = np.asarray(ts, dtype=np.int64) // DAY_US
        milli = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 1000.0
        ).astype(np.int64)
        ud, inv = np.unique(d, return_inverse=True)
        s = np.zeros(ud.shape[0], dtype=np.int64)
        c = np.zeros(ud.shape[0], dtype=np.int64)
        np.add.at(s, inv, milli)
        np.add.at(c, inv, 1)
        return pa.table(
            {
                "day": pa.array(ud),
                "s": pa.array(s),
                "c": pa.array(c),
                "g": pa.array(np.zeros(ud.shape[0], dtype=np.int64)),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "day" not in group.column_names:
            return EMPTY_OUT
        d = group["day"].to_numpy(zero_copy_only=False)
        s = group["s"].to_numpy(zero_copy_only=False)
        c = group["c"].to_numpy(zero_copy_only=False)
        ud, inv = np.unique(d, return_inverse=True)
        S = np.zeros(ud.shape[0], dtype=np.int64)
        C = np.zeros(ud.shape[0], dtype=np.int64)
        np.add.at(S, inv, s)
        np.add.at(C, inv, c)
        d0 = int(ud.min())
        # PAVA stack over (start_idx, S, C) pools — PYTHON ints so the
        # cross-multiplied mean comparisons are exact at any magnitude
        pools: list[list[int]] = []
        for i in range(ud.shape[0]):
            pools.append([i, int(S[i]), int(C[i])])
            while (
                len(pools) > 1
                and pools[-2][1] * pools[-1][2]
                >= pools[-1][1] * pools[-2][2]
            ):
                b = pools.pop()
                pools[-1][1] += b[1]
                pools[-1][2] += b[2]
        day_idx = (ud - d0).astype(np.int64)
        iso = np.empty(ud.shape[0], dtype=np.float64)
        pstart = np.empty(ud.shape[0], dtype=np.int64)
        bounds = [p[0] for p in pools] + [ud.shape[0]]
        for k, p in enumerate(pools):
            lo, hi = bounds[k], bounds[k + 1]
            iso[lo:hi] = p[1] / p[2]
            pstart[lo:hi] = day_idx[lo]
        return pa.table(
            {
                "day_idx": pa.array(day_idx),
                "n_events": pa.array(C),
                "pool_start": pa.array(pstart),
                "iso_milli": pa.array(iso),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .map_groups(kernel, batch_format="pyarrow")
        .sort("day_idx")
    )


def tpch_q2_min_cost_supplier(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q2 analog (minimum-cost supplier): for each part in the
    size bracket (p_size % 10 == 3, scale-free), the EUROPE supplier
    with the lowest supply cost.  The reference schema's partsupp is
    derived deterministically — supplier s can supply part p iff
    (s_suppkey + p_partkey) % 2 == 0, at integer-cents cost
    retail_cents * (60 + (s*7 + p) % 40) // 100 — so both engines
    evaluate the identical relation without a stored table.  Ties on
    cost resolve to the smallest s_suppkey (Q2's ORDER BY tail made
    deterministic).

    Physical plan: supplier x nation x region is a dimension -> ONE
    remote build + broadcast of the EUROPE supplier arrays (the Q9
    shape); part streams, and each batch evaluates its cost matrix
    against only the parity-compatible supplier slice — the correlated
    min-cost subquery collapses to a vectorized row argmin with no
    partsupp materialization and no shuffle.  Assumes the supplier
    dimension is broadcastable (true at every TPC-H scale: |supplier|
    = 0.01% of |lineitem|)."""
    part_ds = ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_size", "p_retailprice"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    nation = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)
    region = ray.data.read_parquet(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    @ray.remote
    def build_state(ns: int, nn: int, *refs) -> tuple:
        sp = [t for t in refs[:ns] if t.num_rows]
        nt = [t for t in refs[ns:ns + nn] if t.num_rows]
        rt = [t for t in refs[ns + nn:] if t.num_rows]
        e = np.empty(0, dtype=np.int64)
        if not sp or not nt or not rt:
            return e, e, [], []
        r = pa.concat_tables(rt)
        eu_rk = {
            k for k, nm in zip(
                r["r_regionkey"].to_pylist(), r["r_name"].to_pylist()
            ) if nm == "EUROPE"
        }
        n = pa.concat_tables(nt)
        nation_name = {
            k: nm for k, nm, rk in zip(
                n["n_nationkey"].to_pylist(), n["n_name"].to_pylist(),
                n["n_regionkey"].to_pylist(),
            ) if rk in eu_rk
        }
        s = pa.concat_tables(sp)
        sk = s["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        snk = s["s_nationkey"].to_numpy(zero_copy_only=False)
        acct = np.floor(
            s["s_acctbal"].to_numpy(zero_copy_only=False).astype(np.float64)
            * 100.0
        ).astype(np.int64)
        names = s["s_name"].to_pylist()
        keep = np.asarray([k in nation_name for k in snk], dtype=bool)
        sk, acct = sk[keep], acct[keep]
        names = [nm for nm, k in zip(names, keep) if k]
        nnames = [nation_name[k] for k, kp in zip(snk, keep) if kp]
        o = np.argsort(sk)  # ascending -> argmin tie = smallest suppkey
        return sk[o], acct[o], [names[i] for i in o], [nnames[i] for i in o]

    s_refs = supp.to_arrow_refs()
    n_refs = nation.to_arrow_refs()
    state_ref = build_state.remote(
        len(s_refs), len(n_refs), *s_refs, *n_refs, *region.to_arrow_refs()
    )

    EMPTY = pa.table(
        {
            "p_partkey": pa.nulls(0, pa.int64()),
            "min_cost_cents": pa.nulls(0, pa.int64()),
            "s_suppkey": pa.nulls(0, pa.int64()),
            "s_name": pa.nulls(0, pa.string()),
            "n_name": pa.nulls(0, pa.string()),
            "acctbal_cents": pa.nulls(0, pa.int64()),
        }
    )

    def best(batch: pa.Table, _st=state_ref) -> pa.Table:
        if batch.num_rows == 0 or "p_partkey" not in batch.column_names:
            return EMPTY
        sk, acct, names, nnames = (
            ray.get(_st) if not isinstance(_st, tuple) else _st
        )
        if sk.shape[0] == 0:
            return EMPTY
        size = batch["p_size"].to_numpy(zero_copy_only=False)
        pk = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        retail = np.floor(
            batch["p_retailprice"].to_numpy(zero_copy_only=False).astype(
                np.float64
            ) * 100.0
        ).astype(np.int64)
        bracket = (size % 10) == 3
        out_pk, out_cost, out_si = [], [], []
        for parity in (0, 1):
            sm = (sk % 2) == parity
            if not sm.any():
                continue
            pm = bracket & ((pk % 2) == parity)
            if not pm.any():
                continue
            p_keys, p_ret = pk[pm], retail[pm]
            s_keys = sk[sm]
            cost = (
                p_ret[:, None]
                * (60 + (s_keys[None, :] * 7 + p_keys[:, None]) % 40)
            ) // 100
            j = np.argmin(cost, axis=1)  # first min = smallest suppkey
            out_pk.append(p_keys)
            out_cost.append(cost[np.arange(cost.shape[0]), j])
            out_si.append(np.nonzero(sm)[0][j])
        if not out_pk:
            return EMPTY
        p_all = np.concatenate(out_pk)
        c_all = np.concatenate(out_cost)
        si = np.concatenate(out_si)
        return pa.table(
            {
                "p_partkey": pa.array(p_all),
                "min_cost_cents": pa.array(c_all),
                "s_suppkey": pa.array(sk[si]),
                "s_name": pa.array([names[i] for i in si], type=pa.string()),
                "n_name": pa.array([nnames[i] for i in si], type=pa.string()),
                "acctbal_cents": pa.array(acct[si]),
            }
        )

    return part_ds.map_batches(best, batch_format="pyarrow")


def event_click_auc(sf_dir: str, pos_type: str = "click") -> "pd.DataFrame":
    """EXACT ROC-AUC of ``value`` as a ranker for "is this event a
    {pos_type}" — the model-evaluation metric, distributed: AUC is the
    tie-corrected Mann-Whitney statistic U1/(n_pos*n_neg), so the whole
    computation rides the same constant-size sufficient-statistic pass
    as events_mannwhitney (_group_value_counts over 2 label groups x
    #distinct floor-milli values).  All rank arithmetic is integer
    (doubled midranks); the single float is produced as
    double(u2) / double(2*n_pos*n_neg) on BOTH engines, so it is
    bit-identical whenever the ints fit a double's mantissa and
    correctly rounded regardless."""
    import pandas as pd

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY_L = pa.table(
        {"y": pa.nulls(0, pa.large_string()), "value": pa.nulls(0, pa.float64())}
    )

    def lab(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "event_type" not in batch.column_names:
            return EMPTY_L
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        y = np.where(et == pos_type, "pos", "neg").tolist()
        return pa.table(
            {
                "y": pa.array(y, type=pa.large_string()),
                "value": batch["value"],
            }
        )

    def val(batch: pa.Table) -> np.ndarray:
        return np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 1000.0
        ).astype(np.int64)

    cdf = _group_value_counts(
        ev.map_batches(lab, batch_format="pyarrow"), "y", val
    )
    empty = pd.DataFrame(
        {
            "n_pos": pd.Series(dtype="int64"),
            "n_neg": pd.Series(dtype="int64"),
            "u2": pd.Series(dtype="int64"),
            "auc": pd.Series(dtype="float64"),
        }
    )
    if not len(cdf):
        return empty
    groups, vals, cnt, cum, tot = _cum_count_matrix(cdf)
    if "pos" not in groups or "neg" not in groups:
        return empty
    ip, ineg = groups.index("pos"), groups.index("neg")
    n1, n0 = int(tot[ip]), int(tot[ineg])
    if 4 * (n1 + n0) ** 2 >= 1 << 62:
        raise ValueError("event_click_auc: doubled rank sums overflow int64")
    below = (cum[ip] - cnt[ip]) + (cum[ineg] - cnt[ineg])
    # doubled midrank at v = 2*below + ties + 1; doubled rank sum of pos
    r1x2 = int((cnt[ip] * (2 * below + cnt[ip] + cnt[ineg] + 1)).sum())
    u2 = r1x2 - n1 * (n1 + 1)
    return pd.DataFrame(
        {
            "n_pos": pd.Series([n1], dtype="int64"),
            "n_neg": pd.Series([n0], dtype="int64"),
            "u2": pd.Series([u2], dtype="int64"),
            "auc": pd.Series(
                [float(u2) / float(2 * n1 * n0)], dtype="float64"
            ),
        }
    )


def event_value_ols2(sf_dir: str) -> ray.data.Dataset:
    """Grouped MULTIPLE regression, exact: per event type, the ordinary
    least squares fit value_milli ~ b0 + b1*hour + b2*dow (hour-of-day
    and day-of-week both derived by INTEGER epoch arithmetic so the two
    engines agree byte-for-byte).  The 3x3 normal equations solve by
    Cramer's rule over EXACT integer moments — per-batch per-type
    partial sums ride as decimal strings (the lineitem_corr_matrix
    discipline: cross-batch totals and determinant PRODUCTS exceed
    int64, so the constant-size tail re-parses to Python ints), and the
    only floats are the final double(det_k)/double(det) divisions —
    correctly-rounded conversions both engines produce identically.

    Physical plan: ONE streaming pass, each batch emits <= #types rows
    of 9 decimal-string moments; repartition(1) folds the constant-size
    tail and solves per group.  Exchange is O(batches x types), never
    the rows."""
    MCOLS = ["n", "sh", "sd", "shh", "shd", "sdd", "sy", "shy", "sdy"]
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "event_type": pa.nulls(0, pa.large_string()),
            **{c: pa.nulls(0, pa.large_string()) for c in MCOLS},
        }
    )
    CHUNK = 65_536

    def _exact_sum(prod: np.ndarray) -> int:
        tot = 0
        for lo in range(0, prod.shape[0], CHUNK):
            tot += int(prod[lo:lo + CHUNK].sum())
        return tot

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "event_type" not in batch.column_names:
            return EMPTY
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        h = (us // 3_600_000_000) % 24
        d = (us // 86_400_000_000 + 4) % 7  # 1970-01-01 was a Thursday
        y = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 1000.0
        ).astype(np.int64)
        out = {"event_type": []}
        out.update({c: [] for c in MCOLS})
        for t in np.unique(et):
            m = et == t
            hh, dd, yy = h[m], d[m], y[m]
            out["event_type"].append(str(t))
            out["n"].append(str(int(m.sum())))
            out["sh"].append(str(_exact_sum(hh)))
            out["sd"].append(str(_exact_sum(dd)))
            out["shh"].append(str(_exact_sum(hh * hh)))
            out["shd"].append(str(_exact_sum(hh * dd)))
            out["sdd"].append(str(_exact_sum(dd * dd)))
            out["sy"].append(str(_exact_sum(yy)))
            out["shy"].append(str(_exact_sum(hh * yy)))
            out["sdy"].append(str(_exact_sum(dd * yy)))
        return pa.table(
            {c: pa.array(v, type=pa.large_string()) for c, v in out.items()}
        )

    def final(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_type": pa.nulls(0, pa.large_string()),
                "n": pa.nulls(0, pa.int64()),
                "b0": pa.nulls(0, pa.float64()),
                "b1": pa.nulls(0, pa.float64()),
                "b2": pa.nulls(0, pa.float64()),
            }
        )
        if batch.num_rows == 0 or "n" not in batch.column_names:
            return empty
        acc: dict = {}
        ets = batch["event_type"].to_pylist()
        cols = {c: batch[c].to_pylist() for c in MCOLS}
        for i, t in enumerate(ets):
            a = acc.setdefault(t, dict.fromkeys(MCOLS, 0))
            for c in MCOLS:
                a[c] += int(cols[c][i])
        rows = {"event_type": [], "n": [], "b0": [], "b1": [], "b2": []}
        for t in sorted(acc):
            a = acc[t]
            n, sh, sd = a["n"], a["sh"], a["sd"]
            shh, shd, sdd = a["shh"], a["shd"], a["sdd"]
            sy, shy, sdy = a["sy"], a["shy"], a["sdy"]
            det = (
                n * (shh * sdd - shd * shd)
                - sh * (sh * sdd - shd * sd)
                + sd * (sh * shd - shh * sd)
            )
            if det == 0:
                continue
            det0 = (
                sy * (shh * sdd - shd * shd)
                - sh * (shy * sdd - shd * sdy)
                + sd * (shy * shd - shh * sdy)
            )
            det1 = (
                n * (shy * sdd - shd * sdy)
                - sy * (sh * sdd - shd * sd)
                + sd * (sh * sdy - shy * sd)
            )
            det2 = (
                n * (shh * sdy - shy * shd)
                - sh * (sh * sdy - shy * sd)
                + sy * (sh * shd - shh * sd)
            )
            rows["event_type"].append(t)
            rows["n"].append(n)
            rows["b0"].append(float(det0) / float(det))
            rows["b1"].append(float(det1) / float(det))
            rows["b2"].append(float(det2) / float(det))
        return pa.table(
            {
                "event_type": pa.array(
                    rows["event_type"], type=pa.large_string()
                ),
                "n": pa.array(rows["n"], type=pa.int64()),
                "b0": pa.array(rows["b0"], type=pa.float64()),
                "b1": pa.array(rows["b1"], type=pa.float64()),
                "b2": pa.array(rows["b2"], type=pa.float64()),
            }
        )

    return (
        ev.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        # batch_size=None: the moment fold must see the single
        # repartitioned block WHOLE (the established repo pattern) —
        # a fixed-size default would split the tail and emit duplicate
        # per-type rows with partial-data coefficients
        .map_batches(final, batch_format="pyarrow", batch_size=None)
    )


def user_survival_km(sf_dir: str) -> "pd.DataFrame":
    """Kaplan-Meier survival ingredients for the signup -> first-purchase
    duration, right-censored at the corpus horizon (global max event ts)
    — the survival-analysis operator: one row per day with >= 1
    conversion, carrying (n_event, n_risk) as EXACT BIGINTs.  The KM
    estimate S(t) = prod(1 - n_event/n_risk) is left to the consumer
    because a float product is order-dependent; the table IS the
    sufficient statistic.

    Semantics: per user, entry = min signup ts; event = min purchase ts
    >= entry (event, dur = whole days) else censored at (horizon -
    entry) days.  Users without a signup are out of the study.

    Physical plan: one cheap ts-column pass for the horizon, then prune
    to signup/purchase rows at the scan, ONE user%P exchange, and a
    vectorized per-partition kernel (lexsort + two masked
    minimum.reduceat passes, the user_funnel shape) that emits per-(dur,
    ev) COUNT partials — the driver folds a histogram bounded by the day
    span, never user rows.  n_risk is a reverse cumulative sum over that
    constant-size histogram."""
    import pandas as pd

    P = 32
    DAY = np.int64(86_400_000_000)

    empty_out = pd.DataFrame(
        {
            "dur_day": pd.Series(dtype="int64"),
            "n_event": pd.Series(dtype="int64"),
            "n_risk": pd.Series(dtype="int64"),
        }
    )

    ts_ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    def maxp(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "ts" not in batch.column_names:
            return pa.table({"m": pa.nulls(0, pa.int64())})
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"m": pa.array([int(us.max())], type=pa.int64())})

    parts = [
        int(b["m"][i].as_py())
        for b in ts_ds.map_batches(maxp, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        )
        for i in range(b.num_rows)
    ]
    if not parts:
        return empty_out
    horizon = max(parts)

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "user_id": pa.nulls(0, pa.int64()),
            "is_purchase": pa.nulls(0, pa.int64()),
            "ts": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def prep(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "event_type" not in batch.column_names:
            return EMPTY
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == "signup") | (et == "purchase")
        if not keep.any():
            return EMPTY
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )[keep]
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                "user_id": pa.array(uid),
                "is_purchase": pa.array(
                    (et[keep] == "purchase").astype(np.int64)
                ),
                "ts": pa.array(us),
                "part": pa.array(uid % P),
            }
        )

    BIG = np.int64(2**62)

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "dur": pa.nulls(0, pa.int64()),
                "ev": pa.nulls(0, pa.int64()),
                "cnt": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "user_id" not in group.column_names:
            return empty
        uid = group["user_id"].to_numpy(zero_copy_only=False)
        isp = group["is_purchase"].to_numpy(zero_copy_only=False)
        ts = group["ts"].to_numpy(zero_copy_only=False)
        o = np.lexsort((ts, uid))
        uid, isp, ts = uid[o], isp[o], ts[o]
        first = np.ones(uid.shape[0], dtype=bool)
        first[1:] = uid[1:] != uid[:-1]
        starts = np.nonzero(first)[0]
        # entry = per-user min signup ts
        su = np.minimum.reduceat(np.where(isp == 0, ts, BIG), starts)
        seg = np.cumsum(first) - 1  # row -> user segment index
        # event = per-user min purchase ts >= entry
        cand = np.where((isp == 1) & (ts >= su[seg]), ts, BIG)
        pu = np.minimum.reduceat(cand, starts)
        insu = su < BIG
        su, pu = su[insu], pu[insu]
        ev = (pu < BIG).astype(np.int64)
        dur = np.where(ev == 1, (pu - su) // DAY, (horizon - su) // DAY)
        key = dur * 2 + ev
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table(
            {
                "dur": pa.array(uk // 2),
                "ev": pa.array(uk % 2),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    hist = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
        .to_pandas()  # <= 2 x day-span x P rows — the histogram, not users
    )
    if not len(hist):
        return empty_out
    agg = hist.groupby(["dur", "ev"], as_index=False)["cnt"].sum()
    durs = np.sort(agg["dur"].unique())
    n_total = np.zeros(durs.shape[0], dtype=np.int64)
    n_event = np.zeros(durs.shape[0], dtype=np.int64)
    pos = np.searchsorted(durs, agg["dur"].to_numpy())
    np.add.at(n_total, pos, agg["cnt"].to_numpy())
    np.add.at(
        n_event, pos, np.where(agg["ev"].to_numpy() == 1, agg["cnt"], 0)
    )
    n_risk = np.cumsum(n_total[::-1])[::-1]
    keep = n_event > 0
    return pd.DataFrame(
        {
            "dur_day": durs[keep],
            "n_event": n_event[keep],
            "n_risk": n_risk[keep],
        }
    ).astype({"dur_day": "int64", "n_event": "int64", "n_risk": "int64"})


def value_decile_calibration(sf_dir: str) -> "pd.DataFrame":
    """Model-calibration table: bucket events by score decile (value,
    quantile_disc edges at q = 0.1..0.9 — tied scores stay in one
    bucket, the stable definition for score-based calibration) and
    report the exact click rate per bucket.  Together with
    event_click_auc this gives the eval pair every ranking pipeline
    ships: discrimination (AUC) + calibration (rate by decile).

    All counting is exact integers on the SAME constant-size (label x
    distinct-milli-value) sufficient-statistic pass as the AUC/KS/MW
    operators; decile edges fall out of the cumulative histogram at
    DuckDB's quantile_disc rank ceil(q*n)-1 (verified rule, round-3
    session 2), and the only float is double(n_pos)/double(n)."""
    import pandas as pd

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY_L = pa.table(
        {"y": pa.nulls(0, pa.large_string()),
         "value": pa.nulls(0, pa.float64())}
    )

    def lab(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "event_type" not in batch.column_names:
            return EMPTY_L
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        y = np.where(et == "click", "pos", "neg").tolist()
        return pa.table(
            {"y": pa.array(y, type=pa.large_string()),
             "value": batch["value"]}
        )

    def val(batch: pa.Table) -> np.ndarray:
        return np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 1000.0
        ).astype(np.int64)

    cdf = _group_value_counts(
        ev.map_batches(lab, batch_format="pyarrow"), "y", val
    )
    empty = pd.DataFrame(
        {
            "bucket": pd.Series(dtype="int64"),
            "n": pd.Series(dtype="int64"),
            "n_pos": pd.Series(dtype="int64"),
            "rate": pd.Series(dtype="float64"),
        }
    )
    if not len(cdf):
        return empty
    groups, vals, cnt, cum, tot = _cum_count_matrix(cdf)
    n_all = int(tot.sum())
    if n_all == 0 or vals.size == 0:
        return empty
    pos_cnt = (
        cnt[groups.index("pos")]
        if "pos" in groups
        else np.zeros(vals.shape[0], dtype=np.int64)
    )
    all_cnt = cnt.sum(axis=0)
    cum_all = np.cumsum(all_cnt)
    # quantile_disc edge at q = value whose 0-based rank is ceil(q*n)-1
    ranks = np.array(
        [-(-(k * n_all) // 10) - 1 for k in range(1, 10)], dtype=np.int64
    )
    edges = vals[np.searchsorted(cum_all, ranks, side="right")]
    # bucket of a distinct value = #edges strictly below it (duplicate
    # edges from tied quantiles collapse buckets on both engines)
    bucket = (vals[:, None] > edges[None, :]).sum(axis=1)
    rows = {"bucket": [], "n": [], "n_pos": [], "rate": []}
    for b in np.unique(bucket):
        m = bucket == b
        n = int(all_cnt[m].sum())
        npos = int(pos_cnt[m].sum())
        rows["bucket"].append(int(b))
        rows["n"].append(n)
        rows["n_pos"].append(npos)
        rows["rate"].append(float(npos) / float(n))
    return pd.DataFrame(rows).astype(
        {"bucket": "int64", "n": "int64", "n_pos": "int64",
         "rate": "float64"}
    )


def doc_graph_communities(sf_dir: str, rounds: int = 8) -> ray.data.Dataset:
    """Community detection over the deterministic document graph via
    synchronous label propagation (graph.label_propagation, iterative
    primitive #8): every node simultaneously adopts the smallest of the
    most frequent labels among neighbors + one self-vote, for a fixed
    round count — fully deterministic, so the distributed result is
    pinned row-for-row against an independent per-round dict reference
    in tests.  Rows-only (simultaneous-update fixpoints are not
    SQL-expressible).  Returns (doc_id, community) in GRAPH ids (k =
    doc_id + 1, the _doc_graph_edges convention)."""
    from libpostal_ray.pipelines.graph import label_propagation

    edges, n = _doc_graph_edges(sf_dir)
    return label_propagation(edges, rounds=rounds)


def event_type_top_values(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """Top-k DISTINCT values per event type with exact counts and dense
    ranks (SQL DENSE_RANK() <= k over value DESC) — grouped top-k with a
    provably bounded combiner.  Each batch ships its per-type top-CAP
    (CAP = 64 >= k) distinct values WITH their in-batch counts; the
    constant-size candidate tail merges counts and re-ranks.

    EXACTNESS of both the value set and the counts, for k <= CAP: if a
    value X has global dense rank <= k, then fewer than CAP distinct
    values exceed X globally — hence in EVERY batch where X occurs,
    fewer than CAP batch-distinct values exceed it, so every such batch
    emits X with its full in-batch count.  Top-k membership and exact
    totals both survive the cap; the exchange is <= CAP x types x
    batches rows regardless of row count."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    CAP = 64
    EMPTY = pa.table(
        {
            "event_type": pa.nulls(0, pa.large_string()),
            "v": pa.nulls(0, pa.int64()),
            "n": pa.nulls(0, pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "event_type" not in batch.column_names:
            return EMPTY
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        v = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 1000.0
        ).astype(np.int64)
        out_t, out_v, out_n = [], [], []
        for t in np.unique(et):
            m = et == t
            uv, cn = np.unique(v[m], return_counts=True)
            take = min(CAP, uv.shape[0])
            # values are the ranking key: the batch's top-CAP by value
            # always contains any global top-k value present in it
            out_t.extend([str(t)] * take)
            out_v.extend(uv[-take:].tolist())
            out_n.extend(cn[-take:].astype(np.int64).tolist())
        return pa.table(
            {
                "event_type": pa.array(out_t, type=pa.large_string()),
                "v": pa.array(out_v, type=pa.int64()),
                "n": pa.array(out_n, type=pa.int64()),
            }
        )

    def finish(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_type": pa.nulls(0, pa.large_string()),
                "value_milli": pa.nulls(0, pa.int64()),
                "cnt": pa.nulls(0, pa.int64()),
                "rk": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "event_type" not in group.column_names:
            return empty
        et = np.asarray(group["event_type"].to_pylist(), dtype=object)
        v = group["v"].to_numpy(zero_copy_only=False)
        n = group["n"].to_numpy(zero_copy_only=False)
        out = {"event_type": [], "value_milli": [], "cnt": [], "rk": []}
        for t in np.unique(et):
            m = et == t
            uv, inv = np.unique(v[m], return_inverse=True)
            tot = np.zeros(uv.shape[0], dtype=np.int64)
            np.add.at(tot, inv, n[m])
            take = min(k, uv.shape[0])
            top = uv[-take:][::-1]
            cnts = tot[-take:][::-1]
            out["event_type"].extend([str(t)] * take)
            out["value_milli"].extend(top.tolist())
            out["cnt"].extend(cnts.tolist())
            out["rk"].extend(range(1, take + 1))
        return pa.table(
            {
                "event_type": pa.array(
                    out["event_type"], type=pa.large_string()
                ),
                "value_milli": pa.array(out["value_milli"], type=pa.int64()),
                "cnt": pa.array(out["cnt"], type=pa.int64()),
                "rk": pa.array(out["rk"], type=pa.int64()),
            }
        )

    # candidate rows are <= CAP x types x batches — one small engine
    # groupby by type collapses them; P would be overkill
    return (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(finish, batch_format="pyarrow")
    )


def events_grouping_sets(sf_dir: str) -> "pd.DataFrame":
    """GROUP BY GROUPING SETS analog — (event_type, hour), (event_type),
    (hour) and the grand total from ONE streaming pass: every batch
    ships its exact (type, hour) cell partials (<= types x 24 rows) and
    the constant-size tail derives the three coarser granularities by
    rolling the finest cells up, so the multi-granularity report costs
    exactly one scan and a cell-table exchange.  Aggregated-out keys use
    sentinels ('ALL', -1) instead of SQL's NULLs — the repo's
    cross-engine hash discipline (hour is 0..23, so -1 cannot collide).
    All sums are exact integers (milli values)."""
    import pandas as pd

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    EMPTY = pa.table(
        {
            "event_type": pa.nulls(0, pa.large_string()),
            "hr": pa.nulls(0, pa.int64()),
            "n": pa.nulls(0, pa.int64()),
            "sum_milli": pa.nulls(0, pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "event_type" not in batch.column_names:
            return EMPTY
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        hr = (us // 3_600_000_000) % 24
        v = np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 1000.0
        ).astype(np.int64)
        comp = np.asarray(
            [f"{t}\x01{h}" for t, h in zip(et, hr)], dtype=object
        )
        uk, inv = np.unique(comp, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        s = np.zeros(uk.shape[0], dtype=np.int64)
        np.add.at(s, inv, v)
        return pa.table(
            {
                "event_type": pa.array(
                    [c.split("\x01")[0] for c in uk], type=pa.large_string()
                ),
                "hr": pa.array(
                    np.asarray(
                        [int(c.split("\x01")[1]) for c in uk], dtype=np.int64
                    )
                ),
                "n": pa.array(n),
                "sum_milli": pa.array(s),
            }
        )

    cells = ev.map_batches(partial, batch_format="pyarrow").to_pandas()
    out_cols = ["event_type", "hr", "n", "sum_milli"]
    if not len(cells):
        return pd.DataFrame(
            {
                "event_type": pd.Series(dtype="object"),
                "hr": pd.Series(dtype="int64"),
                "n": pd.Series(dtype="int64"),
                "sum_milli": pd.Series(dtype="int64"),
            }
        )
    fine = cells.groupby(["event_type", "hr"], as_index=False).sum()
    by_type = fine.groupby("event_type", as_index=False)[
        ["n", "sum_milli"]
    ].sum()
    by_type["hr"] = np.int64(-1)
    by_hr = fine.groupby("hr", as_index=False)[["n", "sum_milli"]].sum()
    by_hr["event_type"] = "ALL"
    total = pd.DataFrame(
        {
            "event_type": ["ALL"],
            "hr": np.array([-1], dtype=np.int64),
            "n": [fine.n.sum()],
            "sum_milli": [fine.sum_milli.sum()],
        }
    )
    out = pd.concat(
        [fine[out_cols], by_type[out_cols], by_hr[out_cols],
         total[out_cols]],
        ignore_index=True,
    )
    return out.astype({"hr": "int64", "n": "int64", "sum_milli": "int64"})


def mmr_topk(
    sf_dir: str, k: int = 10, m: int = 100, lam: float = 0.7
) -> "pd.DataFrame":
    """Maximal-marginal-relevance diversified top-k retrieval — the
    re-rank stage every embedding-retrieval stack runs after ANN: greedy
    argmax of lam*cos(q,d) - (1-lam)*max_cos(d, selected), ties ->
    smallest vec_id.  The distributed part is the candidate prefilter
    (the existing brute-force top-M scan, broadcast query matrix); the
    greedy re-rank then runs on the M-candidate set in ONE task — the
    production pattern (ANN narrows, exact MMR diversifies), so the
    quadratic term is M^2, never corpus^2.  Rows-only (iterated greedy
    is not SQL); pinned against an independent reference in tests.
    Returns (rank, vec_id, mmr_score)."""
    import pyarrow.parquet as pq

    from libpostal_ray.pipelines.ann import brute_force_topk

    emb = _embeddings(sf_dir)
    qrow = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "==", 0)],
    )
    import pandas as pd

    empty = pd.DataFrame(
        {
            "rank": pd.Series(dtype="int64"),
            "vec_id": pd.Series(dtype="int64"),
            "mmr_score": pd.Series(dtype="float64"),
        }
    )
    if qrow.num_rows == 0:
        return empty
    qm = np.array(qrow["embedding"].to_pylist(), dtype=np.float64)
    cands = brute_force_topk(emb, qm, np.array([0]), k=m).to_pandas()
    if not len(cands):
        return empty
    ids = np.sort(cands["vec_id"].to_numpy().astype(np.int64))
    # point-read ONLY the candidate vectors (row-group pushdown)
    crow = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", ids.tolist())],
    )
    cid = crow["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.argsort(cid)  # ascending ids -> argmax tie = smallest id
    cid = cid[o]
    V = np.array(crow["embedding"].to_pylist(), dtype=np.float64)[o]
    V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-30)
    q = qm[0] / max(float(np.linalg.norm(qm[0])), 1e-30)
    rel = V @ q
    sel: list[int] = []
    div = np.full(cid.shape[0], -1.0)
    picked = np.zeros(cid.shape[0], dtype=bool)
    out = {"rank": [], "vec_id": [], "mmr_score": []}
    for r in range(1, min(k, cid.shape[0]) + 1):
        score = np.where(
            picked, -np.inf,
            lam * rel - (1.0 - lam) * np.maximum(div, 0.0)
        )
        j = int(np.argmax(score))  # first max = smallest vec_id on ties
        picked[j] = True
        out["rank"].append(r)
        out["vec_id"].append(int(cid[j]))
        out["mmr_score"].append(float(score[j]))
        div = np.maximum(div, V @ V[j])
    return pd.DataFrame(out).astype(
        {"rank": "int64", "vec_id": "int64", "mmr_score": "float64"}
    )


def events_quantile_normalize(sf_dir: str) -> ray.data.Dataset:
    """QUANTILE NORMALIZATION of value across event types — the ML
    preprocessing transform that forces every group onto the pooled
    distribution: a row at within-group rank r (total order (v,
    event_id), 0-based) maps to the POOLED order statistic at index
    floor(r * n_pool / n_group).  Exact and deterministic on both
    engines: the pooled order statistic at an index depends only on the
    value histogram (ids break ties among EQUAL values, which share one
    value), so the pooled side broadcasts as a constant-size cumulative
    histogram; the within-group rank decomposes as (# strictly smaller
    in group, from the same broadcast histogram) + (tie index by
    event_id, computed where the tied rows are co-located).

    Physical plan: one _group_value_counts sufficient-statistic pass
    builds the per-group and pooled histograms (broadcast once); then
    ONE (group, value)-hash exchange co-locates tied rows and a
    vectorized kernel emits (event_id, normalized_milli) — per-row
    output, constant broadcast state, no sort of the full table."""
    P = 32

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "event_type", "value"]
    ).map_batches(_strip_meta, batch_format="pyarrow", zero_copy_batch=True)

    def val(batch: pa.Table) -> np.ndarray:
        return np.floor(
            batch["value"].to_numpy(zero_copy_only=False) * 1000.0
        ).astype(np.int64)

    cdf = _group_value_counts(
        ev.map_batches(
            lambda b: (
                pa.table(
                    {
                        "g": pa.array(
                            [str(x) for x in b["event_type"].to_pylist()],
                            type=pa.large_string(),
                        ),
                        "value": b["value"],
                    }
                )
                if b.num_rows and "event_type" in b.column_names
                else pa.table(
                    {
                        "g": pa.nulls(0, pa.large_string()),
                        "value": pa.nulls(0, pa.float64()),
                    }
                )
            ),
            batch_format="pyarrow",
        ),
        "g",
        val,
    )
    EMPTY_OUT = pa.table(
        {
            "event_id": pa.nulls(0, pa.int64()),
            "normalized_milli": pa.nulls(0, pa.int64()),
        }
    )
    if not len(cdf):
        return ray.data.from_arrow(EMPTY_OUT)
    groups, vals, cnt, cum, tot = _cum_count_matrix(cdf)
    below = cum - cnt  # per (group, distinct value): # strictly smaller
    pooled_cum = np.cumsum(cnt.sum(axis=0))
    n_pool = int(pooled_cum[-1])
    gi_map = {g: i for i, g in enumerate(groups)}
    state_ref = ray.put(
        (gi_map, vals, below, tot.astype(np.int64), pooled_cum, n_pool)
    )

    EMPTY_MID = pa.table(
        {
            "event_id": pa.nulls(0, pa.int64()),
            "gid": pa.nulls(0, pa.int64()),
            "v": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def prep(batch: pa.Table, _st=state_ref) -> pa.Table:
        if batch.num_rows == 0 or "event_type" not in batch.column_names:
            return EMPTY_MID
        gi_map_, *_rest = ray.get(_st) if not isinstance(_st, tuple) else _st
        et = batch["event_type"].to_pylist()
        gid = np.asarray([gi_map_[str(t)] for t in et], dtype=np.int64)
        v = val(batch)
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        # co-locate tied (group, value) rows: mix both into the part key
        part = ((gid * np.int64(1_000_003) + v) % P + P) % P
        return pa.table(
            {
                "event_id": pa.array(eid),
                "gid": pa.array(gid),
                "v": pa.array(v),
                "part": pa.array(part),
            }
        )

    def kernel(group: pa.Table, _st=state_ref) -> pa.Table:
        if group.num_rows == 0 or "event_id" not in group.column_names:
            return EMPTY_OUT
        (_gi, vals_, below_, tot_, pooled_cum_, n_pool_) = (
            ray.get(_st) if not isinstance(_st, tuple) else _st
        )
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        gid = group["gid"].to_numpy(zero_copy_only=False)
        v = group["v"].to_numpy(zero_copy_only=False)
        o = np.lexsort((eid, v, gid))
        eid, gid, v = eid[o], gid[o], v[o]
        first = np.ones(gid.shape[0], dtype=bool)
        first[1:] = (gid[1:] != gid[:-1]) | (v[1:] != v[:-1])
        seg_start = np.nonzero(first)[0]
        # tie index within the (gid, v) segment, ordered by event_id
        t = np.arange(gid.shape[0], dtype=np.int64)
        t -= np.repeat(seg_start, np.diff(np.append(seg_start, gid.shape[0])))
        pos = np.searchsorted(vals_, v)
        r = below_[gid, pos] + t
        j = (r * n_pool_) // tot_[gid]
        norm = vals_[np.searchsorted(pooled_cum_, j, side="right")]
        return pa.table(
            {
                "event_id": pa.array(eid),
                "normalized_milli": pa.array(norm.astype(np.int64)),
            }
        )

    return (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def doc_graph_wl_colors(sf_dir: str, rounds: int = 3) -> ray.data.Dataset:
    """Weisfeiler-Lehman structural colors of the deterministic document
    graph (graph.wl_refinement, iterative primitive #9): after r rounds
    two nodes share a color only if their radius-r neighborhoods are
    WL-indistinguishable — the structural fingerprint behind graph
    dedup/isomorphism screening.  Rows-only (hash-chained multiset
    folding is not SQL); pinned against an independent dict reference
    and an id-relabeling invariance property in tests."""
    from libpostal_ray.pipelines.graph import wl_refinement

    edges, n = _doc_graph_edges(sf_dir)
    return wl_refinement(edges, rounds=rounds)


def similar_doc_degree(sf_dir: str, t_milli: int = 950) -> ray.data.Dataset:
    """Exact set-similarity DEGREE per document — for every doc, how
    many OTHER docs have word-set Jaccard >= t — the all-pairs
    threshold-join made scale-safe for enumerable vocabularies (tags,
    categories, token alphabets): token sets pack into int64 BITMASKS
    (loud error past 63 bits), identical sets collapse to one of D
    distinct masks, and the D x D popcount matrix (cache-chunked) plus
    per-mask multiplicities answers every doc's degree with ZERO pair
    materialization.  Jaccard tests are integer cross-multiplications
    (inter * 1000 >= t_milli * union) — no floats anywhere.

    Physical plan: pass 1 gathers the (tiny, loud-capped) vocabulary;
    pass 2 streams docs to (doc_id, mask) with a broadcast vocab; ONE
    engine groupby collapses to D (mask, count) rows; the D^2 popcount
    table runs in one remote task; per-doc degrees come from a final
    broadcast-dict map over the mask stream.  Exchange: D rows + the
    16 B/doc mask stream."""
    ds = _docs(sf_dir)

    def batch_vocab(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "text" not in batch.column_names:
            return pa.table({"w": pa.nulls(0, pa.large_string())})
        ws: set = set()
        for t in batch["text"].to_pylist():
            ws.update((t or "").split())
        return pa.table({"w": pa.array(sorted(ws), type=pa.large_string())})

    vocab_rows = [
        w
        for b in ds.map_batches(batch_vocab, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
        for w in b["w"].to_pylist()
    ]
    vocab = np.asarray(sorted(set(vocab_rows)), dtype=object)
    EMPTY_OUT = pa.table(
        {
            "doc_id": pa.nulls(0, pa.int64()),
            "n_similar": pa.nulls(0, pa.int64()),
        }
    )
    if vocab.shape[0] == 0:
        return ray.data.from_arrow(EMPTY_OUT)
    if vocab.shape[0] > 63:
        raise ValueError(
            f"similar_doc_degree: vocabulary {vocab.shape[0]} > 63 bits — "
            "bitmask plan needs an enumerable alphabet (use the MinHash "
            "near-dup family for open vocabularies)"
        )
    vset = {w: i for i, w in enumerate(vocab)}
    vref = ray.put(vset)

    EMPTY_MASK = pa.table(
        {"doc_id": pa.nulls(0, pa.int64()), "m": pa.nulls(0, pa.int64())}
    )

    def to_mask(batch: pa.Table, _v=vref) -> pa.Table:
        if batch.num_rows == 0 or "text" not in batch.column_names:
            return EMPTY_MASK
        vs = ray.get(_v) if not isinstance(_v, dict) else _v
        masks = []
        for t in batch["text"].to_pylist():
            m = 0
            for w in set((t or "").split()):
                m |= 1 << vs[w]
            masks.append(m)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "m": pa.array(masks, type=pa.int64()),
            }
        )

    mask_ds = ds.map_batches(to_mask, batch_format="pyarrow").materialize()
    from ray.data.aggregate import Count

    dm = mask_ds.groupby("m").aggregate(Count()).to_pandas()
    if not len(dm):
        return ray.data.from_arrow(EMPTY_OUT)
    masks = dm["m"].to_numpy().astype(np.int64)
    cnts = dm["count()"].to_numpy().astype(np.int64)

    # 16-bit popcount lookup — vectorized popcount for numpy int64
    pc16 = np.array(
        [bin(i).count("1") for i in range(1 << 16)], dtype=np.int64
    )

    def popcnt(x: np.ndarray) -> np.ndarray:
        x = x.astype(np.uint64)
        out = pc16[(x & np.uint64(0xFFFF)).astype(np.int64)]
        for s in (16, 32, 48):
            out = out + pc16[
                ((x >> np.uint64(s)) & np.uint64(0xFFFF)).astype(np.int64)
            ]
        return out

    sizes = popcnt(masks)
    D = masks.shape[0]
    degree = np.zeros(D, dtype=np.int64)
    CH = 512  # D x CH cells per block ~ cache-friendly
    for lo in range(0, D, CH):
        blk = masks[lo:lo + CH]
        inter = popcnt(
            np.bitwise_and(blk[:, None], masks[None, :])
        )
        un = sizes[lo:lo + CH, None] + sizes[None, :] - inter
        ok = inter * 1000 >= t_milli * un
        # neighbors over OTHER masks; same-mask group handled below
        np.fill_diagonal(ok[:, lo:lo + CH], False)
        degree[lo:lo + CH] = (ok * cnts[None, :]).sum(axis=1)
    # docs sharing my exact mask: jaccard 1.0 >= t, minus myself
    degree += cnts - 1
    deg_map = dict(zip(masks.tolist(), degree.tolist()))
    dref = ray.put(deg_map)

    def assign(batch: pa.Table, _d=dref) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return EMPTY_OUT
        dm_ = ray.get(_d) if not isinstance(_d, dict) else _d
        m = batch["m"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_similar": pa.array(
                    [dm_[int(x)] for x in m], type=pa.int64()
                ),
            }
        )

    return mask_ds.map_batches(assign, batch_format="pyarrow")


def doc_graph_hits(sf_dir: str, iters: int = 10) -> ray.data.Dataset:
    """HITS hubs/authorities of the deterministic document graph
    (directed u -> v as generated; graph.hits, iterative primitive
    #10): authorities = docs many hubs point at, hubs = docs pointing
    at many authorities.  Rows-only (mutually-recursive normalized
    fixpoint is not SQL); pinned against a dense numpy power iteration
    to 1e-12 in tests, the pagerank discipline."""
    from libpostal_ray.pipelines.graph import hits

    edges, n = _doc_graph_edges(sf_dir)
    return hits(edges, iters=iters)


# ---------------------------------------------------------------------------
# Privacy-audit family (round 5): k-anonymity / l-diversity cell audits —
# the pre-release privacy screens a training-data pipeline runs before a
# corpus ships (the quality/expectations gates' sibling: instead of "is
# the data well-formed", "does any quasi-identifier cell isolate people").
# ---------------------------------------------------------------------------


def _qi_cells(batch: pa.Table, with_sens: bool):
    """(event_type, epoch-day, user cohort[, sensitive bucket]) arrays for
    the privacy audits.  Sensitive bucket = floor(value*100)//2000 in
    exact int64 after ONE double multiply — the repo's per-row
    integerization discipline, mirrored verbatim in the oracle SQL."""
    et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
    ts_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    day = ts_us // np.int64(86_400_000_000)
    cohort = (
        batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64) % 100
    )
    if not with_sens:
        return et, day, cohort, None
    v = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
    sens = np.floor(v * 100.0).astype(np.int64) // 2000
    return et, day, cohort, sens


def events_k_anonymity(sf_dir: str, k: int = 5) -> ray.data.Dataset:
    """k-ANONYMITY audit: quasi-identifier cells (event_type, day,
    user-cohort) with fewer than ``k`` rows — each is a cell where the
    QI combination narrows to under k individuals (Sweeney's k-anonymity
    model; public formulation).  Returns (event_type, day, cohort,
    n_rows) for every violating cell.

    Physical plan: per-batch cell-count partials (np.unique over a
    composite key — the exchange is bounded by DISTINCT CELLS, not
    rows), ONE crc32(cell)%P exchange, kernel sums partials and filters
    < k.  Scale posture: cells with huge counts cost one partial row
    per batch; the violating output is small by definition (< k rows
    per cell reported)."""
    import zlib as _zlib

    P = 32
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "user_id"],
    )

    EMPTY = pa.table(
        {
            "key": pa.nulls(0, pa.large_string()),
            "n": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "event_type" not in batch.column_names:
            return EMPTY
        et, day, cohort, _ = _qi_cells(batch, False)
        key = np.char.add(
            np.char.add(et.astype(str), "\x01"),
            np.char.add(
                np.char.add(day.astype(str), "\x01"), cohort.astype(str)
            ),
        )
        uk, inv = np.unique(key, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        part = np.fromiter(
            (_zlib.crc32(s.encode()) % P for s in uk),
            dtype=np.int64,
            count=uk.shape[0],
        )
        return pa.table(
            {
                "key": pa.array(uk.tolist(), type=pa.large_string()),
                "n": pa.array(cnt),
                "part": pa.array(part),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_type": pa.nulls(0, pa.string()),
                "day": pa.nulls(0, pa.int64()),
                "cohort": pa.nulls(0, pa.int64()),
                "n_rows": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "key" not in group.column_names:
            return empty
        key = np.asarray(group["key"].to_pylist(), dtype=object)
        n = group["n"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(key.astype(str), return_inverse=True)
        tot = np.zeros(uk.shape[0], dtype=np.int64)
        np.add.at(tot, inv, n)
        viol = tot < k
        if not viol.any():
            return empty
        parts = [s.split("\x01") for s in uk[viol]]
        return pa.table(
            {
                "event_type": pa.array(
                    [p[0] for p in parts], type=pa.string()
                ),
                "day": pa.array([int(p[1]) for p in parts], type=pa.int64()),
                "cohort": pa.array(
                    [int(p[2]) for p in parts], type=pa.int64()
                ),
                "n_rows": pa.array(tot[viol]),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def events_l_diversity(
    sf_dir: str, k: int = 3, l_min: int = 3
) -> ray.data.Dataset:
    """l-DIVERSITY audit (Machanavajjhala et al.'s public refinement of
    k-anonymity): among QI cells that LOOK safe (>= ``k`` rows), flag
    those whose sensitive attribute (value bucket) takes fewer than
    ``l_min`` distinct values — a homogeneous cell leaks the sensitive
    value even without isolating a row.  Returns (event_type, day,
    cohort, n_rows, n_sens) per flagged cell.

    Physical plan: per-batch (cell, sens)->count partials, ONE
    crc32(cell)%P exchange (the sens rides the key's tail so a cell's
    whole distribution lands in one partition), kernel folds counts,
    derives n_rows and distinct-sens per cell, filters."""
    import zlib as _zlib

    P = 32
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "user_id", "value"],
    )

    EMPTY = pa.table(
        {
            "cell": pa.nulls(0, pa.large_string()),
            "sens": pa.nulls(0, pa.int64()),
            "n": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "event_type" not in batch.column_names:
            return EMPTY
        et, day, cohort, sens = _qi_cells(batch, True)
        cell = np.char.add(
            np.char.add(et.astype(str), "\x01"),
            np.char.add(
                np.char.add(day.astype(str), "\x01"), cohort.astype(str)
            ),
        )
        pair = np.char.add(np.char.add(cell, "\x02"), sens.astype(str))
        uk, inv = np.unique(pair, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        cells = np.asarray([s.split("\x02")[0] for s in uk], dtype=object)
        svals = np.asarray(
            [int(s.split("\x02")[1]) for s in uk], dtype=np.int64
        )
        part = np.fromiter(
            (_zlib.crc32(s.encode()) % P for s in cells),
            dtype=np.int64,
            count=cells.shape[0],
        )
        return pa.table(
            {
                "cell": pa.array(cells.tolist(), type=pa.large_string()),
                "sens": pa.array(svals),
                "n": pa.array(cnt),
                "part": pa.array(part),
            }
        )

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_type": pa.nulls(0, pa.string()),
                "day": pa.nulls(0, pa.int64()),
                "cohort": pa.nulls(0, pa.int64()),
                "n_rows": pa.nulls(0, pa.int64()),
                "n_sens": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "cell" not in group.column_names:
            return empty
        cell = np.asarray(group["cell"].to_pylist(), dtype=object)
        sens = group["sens"].to_numpy(zero_copy_only=False)
        n = group["n"].to_numpy(zero_copy_only=False)
        # fold cross-batch duplicates of (cell, sens) first
        pair = np.char.add(
            np.char.add(cell.astype(str), "\x02"), sens.astype(str)
        )
        up, inv = np.unique(pair, return_inverse=True)
        pn = np.zeros(up.shape[0], dtype=np.int64)
        np.add.at(pn, inv, n)
        pc_ = np.asarray([s.split("\x02")[0] for s in up], dtype=object)
        uc, cinv = np.unique(pc_.astype(str), return_inverse=True)
        n_rows = np.zeros(uc.shape[0], dtype=np.int64)
        np.add.at(n_rows, cinv, pn)
        n_sens = np.bincount(cinv).astype(np.int64)
        viol = (n_rows >= k) & (n_sens < l_min)
        if not viol.any():
            return empty
        parts = [s.split("\x01") for s in uc[viol]]
        return pa.table(
            {
                "event_type": pa.array(
                    [p[0] for p in parts], type=pa.string()
                ),
                "day": pa.array([int(p[1]) for p in parts], type=pa.int64()),
                "cohort": pa.array(
                    [int(p[2]) for p in parts], type=pa.int64()
                ),
                "n_rows": pa.array(n_rows[viol]),
                "n_sens": pa.array(n_sens[viol]),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


# 64-entry inverse-CDF table of the discrete Laplace distribution with
# scale b=2 (P(X=k) proportional to exp(-|k|/2)), sampled at bucket
# midpoints — table-based sampling makes the "noise" a DETERMINISTIC
# function of the cell key, so the DP-shaped release is oracle-checkable
# (the SQL mirrors the same table and the same Lehmer hash).  Mean 0.
_DLAP_B2_TABLE = np.array(
    [-8, -6, -5, -4, -4, -3, -3, -3, -3, -2, -2, -2, -2, -2, -2, -1,
     -1, -1, -1, -1, -1, -1, -1, -1, 0, 0, 0, 0, 0, 0, 0, 0,
     0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 2, 2, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 5, 6, 8],
    dtype=np.int64,
)


def events_dp_type_counts(sf_dir: str) -> ray.data.Dataset:
    """Differential-privacy-SHAPED noisy release: per (event_type, day)
    event counts plus discrete-Laplace noise (b=2, the eps=0.5 geometric
    mechanism's distribution) drawn DETERMINISTICALLY per cell via a
    64-entry inverse-CDF table indexed by a Lehmer hash of the cell key
    — the third member of the privacy family (k-anonymity / l-diversity
    audit what leaks; this is the noisy-release counterpart).  True
    counts never appear in the output.

    Deterministic by construction, so the driver's value-hash check
    applies: the oracle SQL carries the SAME table literal and hash.
    Physical plan: per-batch (type, day) count partials -> ONE
    crc32(key)%P exchange -> kernel sums and adds table noise; the
    type->rank map is the sorted distinct type list (broadcast-free:
    recomputed per kernel from the partition's own keys would be wrong
    — rank must be GLOBAL, so it rides a tiny driver-free fold below)."""
    import zlib as _zlib

    P = 16
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    EMPTY = pa.table(
        {
            "event_type": pa.nulls(0, pa.large_string()),
            "day": pa.nulls(0, pa.int64()),
            "n": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "event_type" not in batch.column_names:
            return EMPTY
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        ts_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = ts_us // np.int64(86_400_000_000)
        key = np.char.add(np.char.add(et.astype(str), "\x01"), day.astype(str))
        uk, inv = np.unique(key, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        pts = [s.split("\x01") for s in uk]
        part = np.fromiter(
            (_zlib.crc32(s.encode()) % P for s in uk),
            dtype=np.int64,
            count=uk.shape[0],
        )
        return pa.table(
            {
                "event_type": pa.array(
                    [p[0] for p in pts], type=pa.large_string()
                ),
                "day": pa.array([int(p[1]) for p in pts], type=pa.int64()),
                "n": pa.array(cnt),
                "part": pa.array(part),
            }
        )

    # global type ranks: the distinct type set is dimension-sized; fold
    # it once off the partials' schema via a dedicated tiny aggregation
    _types_raw = ds.map_batches(
        lambda b: pa.table(
            {
                "event_type": pa.array(
                    list(dict.fromkeys(b["event_type"].to_pylist())),
                    type=pa.large_string(),
                )
            }
        )
        if b.num_rows
        else pa.table({"event_type": pa.nulls(0, pa.large_string())}),
        batch_format="pyarrow",
    ).unique("event_type")
    # Dataset.unique returns None (not []) on an empty dataset
    types = sorted(t for t in (_types_raw or []) if t is not None)
    rank = {t: i for i, t in enumerate(types)}

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_type": pa.nulls(0, pa.string()),
                "day": pa.nulls(0, pa.int64()),
                "noisy_count": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "event_type" not in group.column_names:
            return empty
        et = np.asarray(group["event_type"].to_pylist(), dtype=object)
        day = group["day"].to_numpy(zero_copy_only=False)
        n = group["n"].to_numpy(zero_copy_only=False)
        key = np.char.add(np.char.add(et.astype(str), "\x01"), day.astype(str))
        uk, inv = np.unique(key, return_inverse=True)
        tot = np.zeros(uk.shape[0], dtype=np.int64)
        np.add.at(tot, inv, n)
        first = np.zeros(uk.shape[0], dtype=np.int64)
        first[inv] = np.arange(inv.shape[0])  # any representative row
        cet = et[first]
        cday = day[first]
        tr = np.fromiter(
            (rank[t] for t in cet), dtype=np.int64, count=cet.shape[0]
        )
        cell = cday * 8 + tr
        u = (cell * np.int64(48271)) % np.int64(2147483647)
        noise = _DLAP_B2_TABLE[u % 64]
        return pa.table(
            {
                "event_type": pa.array(list(cet), type=pa.string()),
                "day": pa.array(cday),
                "noisy_count": pa.array(tot + noise),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def doc_ngram_novelty(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """NOVELTY scoring for curriculum/dedup ordering: for each doc, the
    fraction of its distinct word-k-grams that appear for the FIRST time
    in corpus order (first = smallest doc_id containing the gram) —
    boilerplate-heavy docs score near 0, fresh content near 1 (the
    "how much of this doc is new" curve dataset curricula sort by).
    Returns (doc_id, n_grams, n_first, novelty).

    Physical plan: per-batch DISTINCT (gram, doc) postings with per-doc
    gram totals riding locally (no exchange needed for n_grams — a
    doc's distinct grams are a row-local fact); ONE crc32(gram)%P
    exchange; kernel takes min(doc) per gram and emits (doc, n_first)
    partials; a second doc%P exchange sums them and joins the totals
    (shipped as their own tagged stream through the same exchange).
    novelty = n_first/n_grams is ONE float division — bit-exact vs SQL."""
    import zlib as _zlib

    P = 32
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    EMPTY = pa.table(
        {
            "g": pa.nulls(0, pa.int64()),
            "is_tot": pa.nulls(0, pa.int64()),
            "doc_id": pa.nulls(0, pa.int64()),
            "n": pa.nulls(0, pa.int64()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def postings(batch: pa.Table) -> pa.Table:
        """Vectorized distinct-(gram, doc) postings — the simjoin
        discipline: tokenize with Arrow kernels, hash only the BATCH
        VOCAB (dictionary-encode), fold token hashes positionally into
        64-bit gram keys (collision-free in practice — the precedent
        similar_doc_pairs is driver-green against string-gram SQL with
        the same representation).  No per-row Python."""
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return EMPTY
        import hashlib as _hl

        from libpostal_ray.functions.hashing import as_key_i64, mix_fold_u64

        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        txt = pc.utf8_trim_whitespace(batch["text"].cast(pa.large_string()))
        lists = pc.split_pattern_regex(txt, pattern=r"\s+")
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        total = len(flat)
        td = ids
        if total < k:
            dd = np.empty(0, dtype=np.int64)
            g = np.empty(0, dtype=np.int64)
        else:
            enc = flat.dictionary_encode()
            codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            vh = np.fromiter(
                (
                    int.from_bytes(
                        _hl.blake2b(
                            (s or "").encode("utf-8"), digest_size=8
                        ).digest(),
                        "big",
                    )
                    for s in enc.dictionary.to_pylist()
                ),
                dtype=np.uint64,
                count=len(enc.dictionary),
            )
            th = vh[codes]
            m = total - k + 1
            fold = mix_fold_u64([th[j : j + m] for j in range(k)], salt=k)
            valid = parent[:m] == parent[k - 1 :]
            gk = as_key_i64(fold[valid])
            didx = parent[:m][valid].astype(np.int64)
            # per-doc DISTINCT grams
            order = np.lexsort((gk, didx))
            didx, gk = didx[order], gk[order]
            keep = np.concatenate(
                ([True], (didx[1:] != didx[:-1]) | (gk[1:] != gk[:-1]))
            )
            dd = ids[didx[keep]]
            g = gk[keep]
        # per-doc totals ride a tagged stream (is_tot = 1 rows)
        if total < k:
            tn = np.zeros(ids.shape[0], dtype=np.int64)
        else:
            tn = np.bincount(
                didx[keep], minlength=ids.shape[0]
            ).astype(np.int64)
        return pa.table(
            {
                "g": pa.array(
                    np.concatenate(
                        (g, np.zeros(td.shape[0], dtype=np.int64))
                    )
                ),
                "is_tot": pa.array(
                    np.concatenate(
                        (
                            np.zeros(g.shape[0], dtype=np.int64),
                            np.ones(td.shape[0], dtype=np.int64),
                        )
                    )
                ),
                "doc_id": pa.array(np.concatenate((dd, td))),
                "n": pa.array(
                    np.concatenate((np.ones(dd.shape[0], np.int64), tn))
                ),
                "part": pa.array(
                    np.concatenate((g % P, P + td % P))
                ),
            }
        )

    def gram_kernel(group: pa.Table) -> pa.Table:
        """gram partitions: min doc per gram -> (doc, n_first) partials;
        totals partitions (is_tot = 1): pass through."""
        empty = pa.table(
            {
                "doc_id": pa.nulls(0, pa.int64()),
                "n_first": pa.nulls(0, pa.int64()),
                "n_grams": pa.nulls(0, pa.int64()),
                "part2": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "g" not in group.column_names:
            return empty
        gv = group["g"].to_numpy(zero_copy_only=False)
        doc = group["doc_id"].to_numpy(zero_copy_only=False)
        n = group["n"].to_numpy(zero_copy_only=False)
        istot = group["is_tot"].to_numpy(zero_copy_only=False) == 1
        out_doc, out_first, out_tot = [], [], []
        if (~istot).any():
            g = gv[~istot]
            d = doc[~istot]
            o = np.lexsort((d, g))
            gs, dsrt = g[o], d[o]
            firstmask = np.ones(gs.shape[0], dtype=bool)
            firstmask[1:] = gs[1:] != gs[:-1]
            fd = dsrt[firstmask]  # min doc per gram (d sorted within gram)
            ud, cnt = np.unique(fd, return_counts=True)
            out_doc.append(ud)
            out_first.append(cnt.astype(np.int64))
            out_tot.append(np.zeros(ud.shape[0], dtype=np.int64))
        if istot.any():
            out_doc.append(doc[istot])
            out_first.append(np.zeros(int(istot.sum()), dtype=np.int64))
            out_tot.append(n[istot])
        od = np.concatenate(out_doc)
        return pa.table(
            {
                "doc_id": pa.array(od),
                "n_first": pa.array(np.concatenate(out_first)),
                "n_grams": pa.array(np.concatenate(out_tot)),
                "part2": pa.array(od % P),
            }
        )

    def doc_kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.nulls(0, pa.int64()),
                "n_grams": pa.nulls(0, pa.int64()),
                "n_first": pa.nulls(0, pa.int64()),
                "novelty": pa.nulls(0, pa.float64()),
            }
        )
        if group.num_rows == 0 or "doc_id" not in group.column_names:
            return empty
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        nf = group["n_first"].to_numpy(zero_copy_only=False)
        ng = group["n_grams"].to_numpy(zero_copy_only=False)
        ud, inv = np.unique(d, return_inverse=True)
        tf = np.zeros(ud.shape[0], dtype=np.int64)
        tg = np.zeros(ud.shape[0], dtype=np.int64)
        np.add.at(tf, inv, nf)
        np.add.at(tg, inv, ng)
        keep = tg > 0  # docs shorter than k grams drop (match SQL join)
        nov = tf[keep].astype(np.float64) / tg[keep].astype(np.float64)
        return pa.table(
            {
                "doc_id": pa.array(ud[keep]),
                "n_grams": pa.array(tg[keep]),
                "n_first": pa.array(tf[keep]),
                "novelty": pa.array(nov),
            }
        )

    return (
        ds.map_batches(postings, batch_format="pyarrow")
        .groupby("part")
        .map_groups(gram_kernel, batch_format="pyarrow")
        .groupby("part2")
        .map_groups(doc_kernel, batch_format="pyarrow")
    )


def user_event_regex(
    sf_dir: str, pattern: str = "sc+p"
) -> ray.data.Dataset:
    """Complex-event-processing pattern match (the MATCH_RECOGNIZE /
    Flink-CEP operator shape): each user's event-type sequence (ordered
    by ts, event_id) is rendered as a character string (first letter of
    the type — the five corpus types c/e/p/s/v are distinct) and matched
    against a compiled regex; default pattern "sc+p" = "signup
    immediately followed by a click run ending in purchase" (matches
    ~half the corpus users — a discriminating funnel).  Returns
    (user_id, seq_len, matched).

    Physical plan: ONE user%P exchange co-locates each user's events;
    the kernel sorts (user, ts, event_id) once, renders ALL sequences as
    one contiguous char buffer + per-user offsets (O(rows), no per-event
    Python), then runs the compiled regex once per USER — the only
    per-entity Python is dimension-sized, the row-scale work is
    vectorized.  The regex engine is the same RE2-class partial-match
    semantics the oracle's regexp_matches uses."""
    import re as _re

    P = 32
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    EMPTY = pa.table(
        {
            "user_id": pa.nulls(0, pa.int64()),
            "ts": pa.nulls(0, pa.int64()),
            "event_id": pa.nulls(0, pa.int64()),
            "c": pa.nulls(0, pa.large_string()),
            "part": pa.nulls(0, pa.int64()),
        }
    )

    def tag(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "user_id" not in batch.column_names:
            return EMPTY
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = pc.utf8_slice_codeunits(
            batch["event_type"].combine_chunks()
            if isinstance(batch["event_type"], pa.ChunkedArray)
            else batch["event_type"],
            0,
            1,
        )
        return pa.table(
            {
                "user_id": pa.array(u),
                "ts": pa.array(ts),
                "event_id": pa.array(eid),
                "c": c.cast(pa.large_string()),
                "part": pa.array(u % P),
            }
        )

    rx = _re.compile(pattern)

    def kernel(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.nulls(0, pa.int64()),
                "seq_len": pa.nulls(0, pa.int64()),
                "matched": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "user_id" not in group.column_names:
            return empty
        u = group["user_id"].to_numpy(zero_copy_only=False)
        ts = group["ts"].to_numpy(zero_copy_only=False)
        eid = group["event_id"].to_numpy(zero_copy_only=False)
        ch = np.asarray(group["c"].to_pylist(), dtype=object)
        o = np.lexsort((eid, ts, u))
        u, ch = u[o], ch[o]
        full = "".join(ch.tolist())
        first = np.ones(u.shape[0], dtype=bool)
        first[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(first)
        stops = np.append(starts[1:], u.shape[0])
        uu = u[starts]
        matched = np.fromiter(
            (
                1 if rx.search(full[a:b]) else 0
                for a, b in zip(starts, stops)
            ),
            dtype=np.int64,
            count=uu.shape[0],
        )
        return pa.table(
            {
                "user_id": pa.array(uu),
                "seq_len": pa.array((stops - starts).astype(np.int64)),
                "matched": pa.array(matched),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("part")
        .map_groups(kernel, batch_format="pyarrow")
    )


def doc_graph_betweenness(
    sf_dir: str, n_sources: int = 64
) -> ray.data.Dataset:
    """Betweenness centrality of the deterministic document graph
    (graph.betweenness, iterative primitive #11): which docs sit on the
    most shortest paths — the bridge-document detector (a near-dup
    family's bridge is the doc to KEEP for maximal connectivity, or to
    audit when two unrelated families merge).  Rows-only (per-source
    dependency accumulation is not SQL); pinned exact vs a textbook
    Brandes reference in tests; the registry row runs the deterministic
    64-source sample."""
    from libpostal_ray.pipelines.graph import betweenness

    edges, n = _doc_graph_edges(sf_dir)
    return betweenness(edges, n_sources=n_sources)


def coverage_select_docs(sf_dir: str, k: int = 10) -> pa.Table:
    """Greedy max-coverage data selection (pipelines/select.py): the k
    documents that together cover the most distinct word-3-grams — the
    coreset/data-pruning pick ("which k docs teach the most vocabulary")
    with the classic greedy (1-1/e) guarantee.  Rows-only (the greedy
    recursion is not SQL); pinned exact vs an independent sequential
    reference incl. tie-breaks in tests/test_select.py."""
    from libpostal_ray.pipelines.select import coverage_select

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return coverage_select(docs, k=k, shingle_k=3)
