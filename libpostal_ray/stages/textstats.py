"""Text-analysis map_batches stages over the documents table."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from libpostal_ray.functions.canonicalize import basic_canonicalize_array
from libpostal_ray.functions.textstats import (
    bpe_ish_token_count,
    langid_heuristic,
    quality_features,
    whitespace_token_count,
    winnow_fingerprints,
)


def token_count_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(whitespace_token_count(texts), type=pa.int64()),
            "n_bpe_tokens": pa.array(bpe_ish_token_count(texts), type=pa.int64()),
        }
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    feats = quality_features(texts)
    cols = {"doc_id": batch["doc_id"]}
    for k, v in feats.items():
        cols[k] = pa.array(v, type=pa.int64())
    return pa.table(cols)


def langid_batch(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "lang": batch["lang"],
            "pred_lang": pa.array(langid_heuristic(texts), type=pa.string()),
        }
    )


def canonicalize_basic_batch(batch: pa.Table) -> pa.Table:
    """The SQL-parity canonicalizer: md5 of lower(trim(ws-collapsed)) text."""
    texts = batch["text"].to_pylist()
    canon = basic_canonicalize_array(texts)
    h = [hashlib.md5(c.encode("utf-8")).hexdigest() for c in canon]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "canon_md5": pa.array(h, type=pa.string()),
            "canon_len": pa.array(
                np.array([len(c) for c in canon], dtype=np.int64), type=pa.int64()
            ),
        }
    )


def fingerprint_batch(batch: pa.Table, k: int = 8, window: int = 4) -> pa.Table:
    """Winnowed rolling-hash fingerprints per doc (list<int64>)."""
    texts = batch["text"].to_pylist()
    fps = [winnow_fingerprints(t, k=k, window=window).tolist() for t in texts]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "fingerprints": pa.array(fps, type=pa.list_(pa.int64())),
            "n_fingerprints": pa.array(
                np.array([len(f) for f in fps], dtype=np.int64), type=pa.int64()
            ),
        }
    )
