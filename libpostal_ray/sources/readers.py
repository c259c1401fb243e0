"""Sources: parquet readers with column pruning + schema adapters.

The reference's only real source is a line reader (main.c:95-100); ours is
Parquet at 100TB scale, so the reader rules are: always pass ``columns=``
(prune at the read — row groups for unused columns never leave storage) and
adapt any (id, content)-shaped table into the canonical corpus schema:

    doc_id: uint64, repo: string, path: string, lang: string,
    content: large_string

``doc_id`` is the stable uint64 node id (functions/hashing.stable_doc_id for
code tables; the given int64 id for the documents table).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from libpostal_ray.functions.hashing import stable_doc_id

CODE_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def _code_ids(batch: pa.Table) -> pa.Table:
    ids = stable_doc_id(
        batch["repo"].to_pylist(),
        batch["path"].to_pylist(),
        batch["commit"].to_pylist(),
    )
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "repo": batch["repo"],
            "path": batch["path"],
            "lang": batch["lang"],
            "content": batch["content"].cast(pa.large_string()),
        }
    )


def read_code_corpus(path: str, *, extra_columns: list[str] | None = None) -> ray.data.Dataset:
    """Read a (repo, path, commit, lang, content) parquet tree into the
    canonical corpus schema. ``doc_id`` is derived — deterministic, so
    re-reads and task retries produce identical ids."""
    cols = CODE_COLUMNS + (extra_columns or [])
    ds = ray.data.read_parquet(path, columns=cols)
    return ds.map_batches(_code_ids, batch_format="pyarrow")


def _docs_adapt(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    ids = batch["doc_id"].cast(pa.int64())
    # vectorized path synthesis ("doc/<id>") — this adapter sits on
    # every documents-corpus read, so no per-row Python here
    path = pc.binary_join_element_wise(
        "doc/", pc.cast(ids, pa.string()), ""
    ).combine_chunks()
    return pa.table(
        {
            "doc_id": ids,
            "repo": batch["source"],
            "path": path.cast(pa.string()),
            "lang": batch["lang"],
            "content": batch["text"].cast(pa.large_string()),
        }
    )


def read_documents_corpus(sf_dir: str) -> ray.data.Dataset:
    """Adapt the driver's ``documents`` table (doc_id, text, lang, source)
    into the corpus schema."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )
    return ds.map_batches(_docs_adapt, batch_format="pyarrow")


def read_tsv_corpus(path: str) -> ray.data.Dataset:
    """Delimited-text ingest (the reference's TSV training reader pattern,
    address_parser_io.c:1-300): tab-separated
    (repo, path, commit, lang, content) -> canonical corpus schema."""
    from pyarrow import csv as pacsv

    ds = ray.data.read_csv(
        path,
        read_options=pacsv.ReadOptions(
            column_names=CODE_COLUMNS, autogenerate_column_names=False
        ),
        parse_options=pacsv.ParseOptions(delimiter="\t"),
    )
    return ds.map_batches(_code_ids, batch_format="pyarrow")


def from_arrow_corpus(table: pa.Table) -> ray.data.Dataset:
    """Wrap an in-memory code-shaped table (tests / synth corpus)."""
    cols = [c for c in CODE_COLUMNS if c in table.column_names]
    ds = ray.data.from_arrow(table.select(cols))
    return ds.map_batches(_code_ids, batch_format="pyarrow")


def read_jsonl_corpus(path: str, *, field_map: dict | None = None) -> ray.data.Dataset:
    """JSONL ingest — the de-facto interchange format of LLM training
    corpora (one JSON object per line).  ``field_map`` renames source
    fields onto the code-corpus schema, e.g. ``{"content": "text",
    "repo": "source"}`` reads ``text`` as content; unmapped/missing
    fields default to "" so heterogeneous dumps still ingest.  Derived
    deterministic doc_id, same as every reader here.

    Uses ``ray.data.read_json`` (pyarrow JSON reader under it), so the
    scan is distributed and streaming like every other source — one task
    per file chunk, no driver-side parsing."""
    fmap = {c: c for c in CODE_COLUMNS}
    fmap.update(field_map or {})

    ds = ray.data.read_json(path)

    def adapt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {}
        for canon in CODE_COLUMNS:
            src = fmap[canon]
            if src in batch.column_names:
                cols[canon] = batch[src].cast(pa.string())
            else:
                cols[canon] = pa.array([""] * n, type=pa.string())
        return _code_ids(pa.table(cols))

    return ds.map_batches(adapt, batch_format="pyarrow")
