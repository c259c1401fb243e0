"""LSH explode stage — one output row per (doc, blocking key).

The analog of emitting `near_dupe_hashes` keys for grouping by the host
MapReduce (reference README.md:609-626): each signature row fans out into
``len(band_keys)`` rows carrying the columns the verify stage needs
(b-bit signature + sha256) so verification happens INSIDE the band groupby —
no second join back to the signature table.

Shuffle-width tradeoff (documented, SURVEY.md section 4): the payload is the
8-bit b-bit signature (num_perm bytes), NOT the full 64-bit signature —
8x fewer shuffle bytes at a 1/256 collision rate the verifier corrects for.
``content`` never enters this shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from libpostal_ray.config import PipelineConfig


def explode_band_keys(batch: pa.Table) -> pa.Table:
    """signature batch -> exploded (band_key, doc_id, sha256, is_short,
    minhash, simhash, n_chars) rows."""
    keys = batch["band_keys"]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    lens = np.asarray(pc_list_len(keys), dtype=np.int64)
    idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
    idx_arr = pa.array(idx)

    flat_keys = keys.flatten()
    return pa.table(
        {
            "band_key": flat_keys,
            "doc_id": batch["doc_id"].take(idx_arr),
            "sha256": batch["sha256"].take(idx_arr),
            "sha_key": batch["sha_key"].take(idx_arr),
            "is_short": batch["is_short"].take(idx_arr),
            "n_chars": batch["n_chars"].take(idx_arr),
            "n_shingles": batch["n_shingles"].take(idx_arr),
            # b-bit signature only: the full 64-bit signature never shuffles
            "minhash8": batch["minhash8"].take(idx_arr),
            "simhash": batch["simhash"].take(idx_arr),
            "phonetic": batch["phonetic"].take(idx_arr),
            "phonetic2": batch["phonetic2"].take(idx_arr),
            "acronym": batch["acronym"].take(idx_arr),
            "acronym2": batch["acronym2"].take(idx_arr),
        }
    )


def pc_list_len(arr: pa.Array) -> np.ndarray:
    import pyarrow.compute as pc

    return pc.list_value_length(arr).to_numpy(zero_copy_only=False)


def explode_band_keys_skinny(batch: pa.Table) -> pa.Table:
    """Skinny explode for the pairs-mode shuffle: (band_key, doc_id,
    sha_key) — 24 B/row through the all-to-all instead of ~200 B/row.
    ``sha_key`` (63-bit content-hash prefix) lets bucket workers collapse
    content-identical members to one representative before pairing."""
    keys = batch["band_keys"]
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    lens = np.asarray(pc_list_len(keys), dtype=np.int64)
    idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
    idx_arr = pa.array(idx)
    return pa.table(
        {
            "band_key": keys.flatten(),
            "doc_id": batch["doc_id"].take(idx_arr),
            "sha_key": batch["sha_key"].take(idx_arr),
        }
    )
