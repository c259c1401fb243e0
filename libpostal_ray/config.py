"""Pipeline configuration — the extension surface of the engine.

Analog of the reference's option structs:
  - ``libpostal_normalize_options_t`` (reference libpostal.h:110-138, defaults
    libpostal.c:22-48) -> canonicalization knobs here.
  - ``libpostal_near_dupe_hash_options_t`` (libpostal.h:191-207, defaults
    libpostal.c:66-86) -> shingle / MinHash / LSH knobs here.
  - fuzzy dup thresholds (libpostal.c:185-192: likely=0.9, needs_review=0.7)
    -> ``jaccard_likely`` / ``jaccard_review``.

Everything is deterministic given a config: fixed seeds, no randomness at
runtime.  This is what makes golden-fixture tests and idempotent task retries
possible (SURVEY.md section 4 "Determinism").
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict

import numpy as np

# 64-bit odd multipliers / offsets for the MinHash permutation family are drawn
# from a seeded PRNG once per config; same seed => same signatures everywhere.
DEFAULT_SEED = 0x5EED0001  # fixed engine seed


@dataclass(frozen=True)
class PipelineConfig:
    # --- canonicalization (expand.c / normalize.c analog) ---
    fold_case: bool = True          # NFKC + casefold (normalize.c:24-110 analog)
    collapse_whitespace: bool = True
    strip_comments: bool = False    # code-aware comment folding (off by default:
                                    # keeps canonical form cheap + language-neutral)

    # --- shingling (ngrams.c:4-71 analog) ---
    shingle_k: int = 5              # chars per shingle of the canonical text

    # --- MinHash signature (role of double_metaphone/name_word_hashes:
    #     near_dupe.c:321-585 — a fuzzy-equivalence key family) ---
    num_perm: int = 128

    # --- LSH banding (geohash_and_neighbors / near_dupe key families analog:
    #     near_dupe.c:220-248, 643-1216) ---
    bands: int = 16
    rows_per_band: int = 8

    # --- SimHash fallback for short content ---
    short_file_cutoff: int = 24     # content with < cutoff canonical chars is
                                    # blocked by SimHash chunks instead of MinHash
    simhash_max_hamming: int = 3
    simhash_chunks: int = 4         # 4 x 16-bit chunks => catches hamming <= 3

    # --- verification thresholds (dedupe.c status lattice analog,
    #     libpostal.h:218-224 EXACT=9/LIKELY=6/NEEDS_REVIEW=3) ---
    jaccard_likely: float = 0.7
    jaccard_review: float = 0.5

    # --- skew handling (the reference caps permutations at 100,
    #     expand.c:29; we cap/salt LSH buckets) ---
    small_bucket_cap: int = 64      # buckets up to this size: all-pairs verify
    max_bucket_size: int = 100_000  # larger buckets: truncated + logged

    # --- substring (suffix-array) pass ---
    min_span_len: int = 50          # minimum exact duplicated span (chars)
    substring_max_bytes: int = 16 * 1024 * 1024  # suffix-array partition
                                    # budget (Kasai LCP is a Python O(n) loop;
                                    # beyond this the partition is truncated
                                    # deterministically and flagged)

    # --- physical execution ---
    num_partitions: int = 64        # checkpoint/layout partitions (hash(repo) % P)
    verify_partitions: int = 256    # LSH-bucket partitions (band_key % P);
                                    # a partition's rows must fit one
                                    # worker's heap — raise P with corpus size
    verify_mode: str = "pairs"      # "pairs": shuffle skinny (band_key,
                                    # doc_id) rows, then verify candidate
                                    # pairs against broadcast/joined
                                    # signatures (13x fewer shuffle bytes);
                                    # "inline": carry b-bit signatures through
                                    # the shuffle and verify inside the bucket
                                    # groupby (fewer stages; denser payload)
    sig_broadcast_max: int = 3_000_000  # docs; signature table under this is
                                    # ray.put-broadcast for pair verification
                                    # (~200 B/doc); above it, two hash joins
    shuffle_impl: str = "manual"    # "manual": raw-task hash exchange for the
                                    # pairgen shuffle (split by band_key % P,
                                    # num_returns=P; no global sort);
                                    # "sort": Ray Data groupby (sample sort)
    sig_batch_size: int = 1024      # rows per signature batch (content is
                                    # wide; ~1-2 MB of content per batch)
    verify_batch_size: int = 4096
    sig_concurrency: int | tuple[int, int] | None = None  # None => stateless tasks sized by Ray
    seed: int = DEFAULT_SEED

    def __post_init__(self) -> None:
        if self.bands * self.rows_per_band != self.num_perm:
            raise ValueError(
                f"bands*rows_per_band ({self.bands}x{self.rows_per_band}) must equal "
                f"num_perm ({self.num_perm})"
            )

    # ---- derived, deterministic state ----
    def minhash_perms(self) -> tuple[np.ndarray, np.ndarray]:
        """(a, b) arrays of shape (num_perm,) uint64; a odd. Same seed => same perms."""
        rng = np.random.default_rng(self.seed)
        a = rng.integers(1, 2**63, size=self.num_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
        b = rng.integers(0, 2**63, size=self.num_perm, dtype=np.uint64)
        return a, b

    def to_dict(self) -> dict:
        return asdict(self)


DEFAULT_CONFIG = PipelineConfig()
