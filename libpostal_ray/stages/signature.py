"""SignatureStage — MinHash + SimHash sketches per row.

The analog of the reference's "heavy model in a process-global singleton"
pattern (address parser singleton, address_parser.c:1843-1855): the MinHash
permutation matrix is built once per actor in ``__init__`` and reused across
batches.  Content is DROPPED after this stage — downstream shuffles carry only
(doc_id, sha256, sketches), the dataset-scale version of libpostal's
zero-copy token spans (libpostal.h:280-284): never ship the big payload when
a fixed-width reference suffices.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from libpostal_ray.config import PipelineConfig
from libpostal_ray.functions.lsh import band_keys
from libpostal_ray.functions.simhash import simhash_chunk_keys

SIGNATURE_COLUMNS = [
    "doc_id",
    "sha256",
    "n_chars",
    "n_shingles",
    "is_short",
    "minhash",
    "minhash8",
    "simhash",
    "band_keys",
]


class SignatureStage:
    """batch (doc_id, sha256, canonical, n_chars) ->
    (doc_id, sha256, n_chars, n_shingles, is_short, minhash, simhash,
     band_keys).

    - long rows (canonical length >= short_file_cutoff): MinHash signature,
      LSH band keys.
    - short rows: SimHash + chunk blocking keys (pigeonhole guarantee for
      hamming <= simhash_max_hamming).
    Both key families live in one ``band_keys`` list column with disjoint
    salts, so ONE downstream groupby serves both paths.
    """

    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        canon = batch["canonical"].to_pylist()
        n = len(canon)

        # hash shingles ONCE; the MinHash sketch is one-permutation hashing
        # (O(S) per doc); SimHash is computed ONLY for short rows — the long
        # path never reads it (stages/verify.py uses it for short pairs only)
        from libpostal_ray.functions.hashing import rolling_shingle_hashes
        from libpostal_ray.functions.minhash import oph_minhash_batch
        from libpostal_ray.functions.simhash import simhash_of_hashes

        per_doc = [
            rolling_shingle_hashes((c or "").encode("utf-8"), cfg.shingle_k)
            for c in canon
        ]
        counts = np.array([h.shape[0] for h in per_doc], dtype=np.int64)
        concat = (
            np.concatenate(per_doc) if per_doc else np.empty(0, dtype=np.uint64)
        )
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        sigs = oph_minhash_batch(concat, offsets, cfg.num_perm)

        is_short = np.array(
            [len(c or "") < cfg.short_file_cutoff for c in canon], dtype=bool
        )
        sims = np.zeros(n, dtype=np.uint64)
        for i in np.nonzero(is_short)[0]:
            data = (canon[i] or "").encode("utf-8")
            if data:
                sims[i] = simhash_of_hashes(
                    rolling_shingle_hashes(data, min(cfg.shingle_k, len(data)))
                )

        bkeys = band_keys(sigs, cfg.bands, cfg.rows_per_band)  # (n, bands)
        skeys = simhash_chunk_keys(sims, cfg.simhash_chunks)  # (n, chunks)

        keys_list = [
            (skeys[i] if is_short[i] else bkeys[i]) for i in range(n)
        ]

        out_cols = {
                "doc_id": batch["doc_id"],
                "sha256": batch["sha256"],
                "n_chars": batch["n_chars"],
                "n_shingles": pa.array(counts, type=pa.int64()),
                "is_short": pa.array(is_short),
                # sketches are bit-cast to int64: Ray's shuffle boundary code
                # converts blocks through Python ints, and uint64 values over
                # 2^63 degrade to pickled-object columns.  Equality (MinHash
                # agreement) and XOR/popcount (SimHash hamming) are identical
                # on the signed view.
                "minhash": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.reshape(-1).view(np.int64), type=pa.int64()),
                    cfg.num_perm,
                ),
                # b-bit MinHash (Li & Koenig, WWW'10): the low 8 bits of each
                # slot are all the verify stage ships through the LSH shuffle
                # (8x fewer payload bytes); the estimator corrects for the
                # 1/256 accidental-collision rate (stages/verify.py)
                "minhash8": pa.FixedSizeListArray.from_arrays(
                    pa.array(
                        (sigs.reshape(-1) & np.uint64(0xFF)).astype(np.uint8),
                        type=pa.uint8(),
                    ),
                    cfg.num_perm,
                ),
                "simhash": pa.array(sims.view(np.int64), type=pa.int64()),
                "band_keys": pa.array(
                    [k.tolist() for k in keys_list], type=pa.list_(pa.int64())
                ),
        }
        # checkpoint partition id (and any other passthrough key) survives
        if "pid" in batch.column_names:
            out_cols["pid"] = batch["pid"]
        return pa.table(out_cols)
