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
    transliterate: bool = False     # latin-ascii transliteration chain
                                    # (transliterate.c:669-780 analog): NFD +
                                    # accent strip + Greek/Cyrillic
                                    # romanization (functions/translit.py).
                                    # Identity on ASCII, so the buffer fast
                                    # path is unaffected; only detected
                                    # non-ASCII rows pay the per-row map.
    # token-rewrite rule table — the analog of the reference's data-driven
    # dictionaries (resources/dictionaries/<lang>/*.txt, "st|street";
    # expand.c:724-1366 applies them as phrase rewrites).  Each entry is a
    # (regex pattern, replacement) pair applied IN ORDER after case folding
    # and before whitespace collapse; compiled once per worker.  Part of the
    # config fingerprint, so changing rules invalidates checkpoints.
    rewrite_rules: tuple[tuple[str, str], ...] = ()
    lang_rules: bool = False        # per-language dictionary ROUTING
                                    # (expand.c selects dictionaries by the
                                    # address' languages): each row gets
                                    # rewrite_rules + LANG_RULE_PACKS[lang]
                                    # keyed off the corpus `lang` column
                                    # ("pt-br" -> "pt"); packs compile once
                                    # per worker per observed language.
                                    # Disables the ASCII buffer fast path
                                    # (rows need per-row rule passes).

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
    boundary_band: int = 8          # docs within +-band of the cutoff emit BOTH
                                    # key families, so a near-dup pair straddling
                                    # the cutoff (e.g. 23 vs 25 chars) still
                                    # collides (the geohash+neighbors trick,
                                    # near_dupe.c:220-248, applied to the
                                    # length-routing boundary)
    simhash_max_hamming: int = 3
    simhash_chunks: int = 4         # 4 x 16-bit chunks => catches hamming <= 3
    phonetic_keys: bool = False     # sound-alike blocking for SHORT rows
                                    # (double_metaphone key-family analog,
                                    # near_dupe.c:283-315): short rows emit
                                    # extra band keys from the sorted phonetic
                                    # codes of their tokens; phonetic-equal
                                    # short pairs verify at NEEDS_REVIEW (the
                                    # fuzzy refine tier decides)
    phonetic_algo: str = "double_metaphone"  # "double_metaphone": primary +
                                    # secondary codes (Philips 2000, the
                                    # reference's double_metaphone.c:55-980
                                    # family); rows with a distinct alternate
                                    # pronunciation emit a SECOND band key and
                                    # verification matches any primary/
                                    # secondary combo ("SMITH" pri SM0/alt XMT
                                    # meets "SCHMIDT" pri XMT).  "soundex":
                                    # single classic Soundex code — cheaper,
                                    # coarser
    acronym_keys: bool = False      # acronym blocking for SHORT rows
                                    # (near_dupe.c:416-559 key family):
                                    # multi-token rows emit first-letter
                                    # band keys (with + without stopwords);
                                    # single-token rows emit their own token
                                    # in the same key space, so
                                    # "international business machines"
                                    # meets "ibm".  Pairs verify at
                                    # NEEDS_REVIEW; the refine tier's
                                    # acronym_alignment check decides
    acronym_max_tokens: int = 12    # rows with more word tokens (or longer
                                    # single tokens) emit no acronym key —
                                    # long acronyms never match real tokens
                                    # and single-letter buckets are noise
    acronym_max_chars: int = 64     # acronym keys use their OWN length
                                    # gate (a spelled-out multi-token name
                                    # is usually longer than the short-row
                                    # cutoff that routes SimHash/phonetic)

    # --- verification thresholds (dedupe.c status lattice analog,
    #     libpostal.h:218-224 EXACT=9/LIKELY=6/NEEDS_REVIEW=3) ---
    jaccard_likely: float = 0.7
    jaccard_review: float = 0.5
    # fuzzy second-opinion tier for NEEDS_REVIEW pairs (string_similarity.c:
    # 356-432 damerau-levenshtein, 529-590 jaro-winkler; soft_tfidf.c defaults
    # jw>=0.9): applied only to review pairs small enough to score exactly
    fuzzy_sim_likely: float = 0.9   # JW or DL similarity >= this upgrades to LIKELY
    fuzzy_max_chars: int = 4096     # skip fuzzy scoring for docs longer than this
    review_pair_cap: int = 2_000_000  # max NEEDS_REVIEW pairs the refine tier
                                    # scores per run: beyond the cap the pairs
                                    # with smallest (src, dst) are scored and
                                    # the rest stay NEEDS_REVIEW (logged —
                                    # never silent).  Bounds the broadcast
                                    # review state on skewed corpora.
    soft_tfidf_corpus_df: bool = False  # True: the soft-TFIDF scorer uses
                                    # CORPUS document frequencies (one
                                    # vectorized DF pass over the corpus for
                                    # the review vocabulary, partial counts
                                    # combined; the reference's delegated
                                    # token_scores contract, libpostal.h:
                                    # 261-262).  False: review-set-local IDF
    # size-ratio guard (dedupe.c:231-293 symmetric-difference demotion analog):
    # |A|/|B| bounds Jaccard from above, so pairs whose shingle-count ratio is
    # below a threshold cannot reach it — demote before believing the estimate
    size_ratio_guard: bool = True

    # --- skew handling (the reference caps permutations at 100,
    #     expand.c:29; we cap/salt LSH buckets) ---
    small_bucket_cap: int = 64      # buckets up to this size: all-pairs verify
    hot_bucket_cap: int = 1024      # buckets above this are SALTED: members are
                                    # split (by a fixed hash of doc_id) into
                                    # sub-buckets of ~hot_sub_size with all-pairs
                                    # inside each, plus a delegate clique (min id
                                    # per sub-bucket) for cross-salt closure —
                                    # connectivity-preserving, work O(n*S) not O(n^2)
    hot_sub_size: int = 64          # target salted sub-bucket size
    salt_pair_budget: int = 20_000_000  # max candidate pairs one hot bucket may
                                    # emit; beyond this the sub size shrinks and
                                    # finally degrades to anchor pairing (flagged
                                    # via the truncated column — never silent)
    max_bucket_size: int = 100_000  # absolute guard for the non-salted (anchor)
                                    # path: larger buckets truncated + logged

    # --- substring (suffix-array) pass ---
    min_span_len: int = 50          # minimum exact duplicated span (chars)
    substring_max_bytes: int = 16 * 1024 * 1024  # suffix-array partition byte
                                    # budget.  The refined-doubling SA
                                    # (Larsson-Sadakane subset rounds,
                                    # stages/substring.py) pays full
                                    # n log n only while >50% of groups
                                    # are unresolved, then the active set
                                    # collapses — measured best-of-N on
                                    # this host: ~7 s/4 MiB, ~25 s/13 MiB
                                    # (plain doubling was ~9 s and ~100+ s:
                                    # superlinear on repeat-heavy text).
                                    # Beyond the budget the partition is
                                    # truncated deterministically + flagged
    span_edges: bool = False        # feed SPAN edges (exact shared substrings,
                                    # stages/substring.py) into clustering
                                    # alongside LIKELY/EXACT edges

    # --- physical execution ---
    num_partitions: int = 64        # checkpoint/layout partitions (hash(repo) % P)
    verify_partitions: int = 256    # LSH-bucket partitions (band_key % P);
                                    # a partition's rows must fit one
                                    # worker's heap — raise P with corpus size
    expansion_keys: bool = False    # multi-form expansion blocking for SHORT
                                    # rows (expand_address parity,
                                    # expand.c:1453-1553 + the
                                    # expansions_intersect duplicate test,
                                    # dedupe.c:13-31): each short row emits
                                    # one band key per alternative form of
                                    # its canonical text ("main st" ->
                                    # {main st, main street, main saint});
                                    # two rows sharing ANY form collide, and
                                    # verification upgrades form-intersecting
                                    # pairs to NEEDS_REVIEW for the fuzzy
                                    # refine tier (identity form always
                                    # included, so "main street" meets
                                    # "main st" on the expanded form)
    expansion_alternatives: tuple[tuple[str, tuple[str, ...]], ...] = ()
                                    # surface word -> alternative expansions
                                    # (functions/expand.py ships
                                    # EN_ALTERNATIVES); empty + expansion_keys
                                    # => identity-form keys only
    max_expansions: int = 16        # mixed-radix enumeration cap per row
                                    # (the reference caps permutations,
                                    # expand.c:29, 1526-1528)
    verify_mode: str = "pairs"      # "pairs": shuffle skinny (band_key,
                                    # doc_id) rows, then verify candidate
                                    # pairs against broadcast/joined
                                    # signatures (13x fewer shuffle bytes);
                                    # "inline": carry b-bit signatures through
                                    # the shuffle and verify inside the bucket
                                    # groupby (fewer stages; denser payload)
    sig_broadcast_max: int = 20_000_000  # docs; the verification state is
                                    # broadcast (one shared plasma object,
                                    # ~217 B/doc: ids 8 + sha 32 + b-bit 128
                                    # + simhash 8 + nsh 8 + short 1 + exp4 32)
                                    # for pair
                                    # verification below this — 20M docs ~
                                    # 3.6 GB, still inside a worker heap on
                                    # the 128-GiB host class (raised from
                                    # 12M in round 5: the first 16M-file run
                                    # crossed the old threshold and paid the
                                    # join fallback, 280 s vs ~2x expected).
                                    # Above it, two hash joins attach the
                                    # columns instead (measured 30x slower
                                    # locally — the join is the >memory
                                    # fallback, not the preferred plan; at
                                    # true cluster scale the fallback IS the
                                    # path, per-node plasma shares the state)
    shuffle_impl: str = "manual"    # "manual": raw-task hash exchange for the
                                    # pairgen shuffle (split by band_key % P,
                                    # num_returns=P; no global sort);
                                    # "sort": Ray Data groupby (sample sort)
    sig_batch_size: int = 1024      # rows per signature batch (Ray-level;
                                    # coarse blocks keep scheduler overhead low)
    kernel_chunk_bytes: int = 128 * 1024  # CACHE BLOCKING: the canonicalize /
                                    # signature kernels process the content
                                    # buffer in chunks of ~this many bytes so
                                    # the numpy temporaries (u64 expansions,
                                    # rolling-hash arrays) stay inside a
                                    # core's cache slice.  Measured on this
                                    # class of host: whole-batch temporaries
                                    # saturate DRAM bandwidth at ~32-way
                                    # concurrency (15-25x per-task slowdown);
                                    # 128 KB chunks restore near-linear
                                    # scaling (BENCH/BASELINE.md round 2)
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
