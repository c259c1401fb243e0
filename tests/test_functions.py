"""Unit tests for the pure kernels (no Ray)."""

import numpy as np
import pytest

from libpostal_ray.config import PipelineConfig
from libpostal_ray.functions.canonicalize import (
    basic_canonicalize_array,
    canonicalize_one,
)
from libpostal_ray.functions.hashing import (
    mix_fold_u64,
    rolling_shingle_hashes,
    stable_doc_id,
)
from libpostal_ray.functions.lsh import band_keys, lsh_collision_probability
from libpostal_ray.functions.minhash import (
    estimate_jaccard,
    minhash_batch,
    minhash_of_hashes,
    shingle_and_minhash,
)
from libpostal_ray.functions.similarity import (
    cosine_topk,
    exact_jaccard,
    exact_jaccard_texts,
    shingle_set,
    word_jaccard,
)
from libpostal_ray.functions.simhash import (
    hamming_distance,
    simhash_chunk_keys,
    simhash_texts,
)

CFG = PipelineConfig()


class TestCanonicalize:
    def test_nfkc_casefold(self):
        # ligature + fullwidth + case folding (normalize.c analog)
        assert canonicalize_one("ﬁle ＡＢＣ") == "file abc"

    def test_whitespace_collapse(self):
        assert canonicalize_one("a \t\n b   c ") == "a b c"

    def test_comments(self):
        s = "x = 1  # note\n/* block\ncomment */ y = 2"
        out = canonicalize_one(s, strip_comments=True)
        assert "note" not in out and "comment" not in out
        assert "x = 1" in out and "y = 2" in out

    def test_deterministic(self):
        assert canonicalize_one("Straße") == canonicalize_one("Straße")

    def test_basic_matches_sql_semantics(self):
        out = basic_canonicalize_array(["  A  B\tC ", ""])
        assert list(out) == ["a b c", ""]


class TestHashing:
    def test_rolling_hash_matches_shingles(self):
        # identical shingles hash identically regardless of position
        h = rolling_shingle_hashes(b"abcdefabcdef", 5)
        assert h.shape[0] == 8
        assert h[0] == h[6]  # "abcde" appears at 0 and 6
        assert h[1] == h[7]

    def test_short_input(self):
        assert rolling_shingle_hashes(b"abc", 5).shape[0] == 0

    def test_stable_doc_id_deterministic(self):
        a = stable_doc_id(["r1", "r2"], ["p", "p"], ["c", "c"])
        b = stable_doc_id(["r1", "r2"], ["p", "p"], ["c", "c"])
        assert np.array_equal(a, b)
        assert a[0] != a[1]

    def test_mix_fold_differs_by_salt(self):
        x = np.array([1, 2, 3], dtype=np.uint64)
        assert not np.array_equal(mix_fold_u64([x], 0), mix_fold_u64([x], 1))


class TestMinHash:
    def test_identical_texts_identical_sigs(self):
        a, b = CFG.minhash_perms()
        s1, _ = shingle_and_minhash(["hello world foo bar"], 5, a, b)
        s2, _ = shingle_and_minhash(["hello world foo bar"], 5, a, b)
        assert np.array_equal(s1, s2)

    def test_batch_equals_single(self):
        a, b = CFG.minhash_perms()
        texts = ["the quick brown fox", "jumps over the lazy dog", ""]
        sigs, counts = shingle_and_minhash(texts, 5, a, b)
        for i, t in enumerate(texts):
            h = rolling_shingle_hashes(t.encode(), 5)
            assert np.array_equal(sigs[i], minhash_of_hashes(h, a, b))
        assert counts[2] == 0

    def test_estimator_error_bound(self):
        # MinHash estimate within 4*stderr of exact Jaccard (SURVEY M2)
        rng = np.random.default_rng(0)
        base = " ".join(f"tok{i}" for i in range(200))
        words = base.split()
        idx = rng.choice(len(words), size=30, replace=False)
        mutated_words = list(words)
        for i in idx:
            mutated_words[i] = f"zz{i}"
        mutated = " ".join(mutated_words)
        j_exact = exact_jaccard_texts(base, mutated, 5)
        a, b = CFG.minhash_perms()
        sigs, _ = shingle_and_minhash([base, mutated], 5, a, b)
        j_est = estimate_jaccard(sigs[0], sigs[1])
        stderr = np.sqrt(j_exact * (1 - j_exact) / CFG.num_perm)
        assert abs(j_est - j_exact) <= 4 * stderr + 1e-9

    def test_empty_doc_sentinel(self):
        a, b = CFG.minhash_perms()
        sigs, _ = shingle_and_minhash([""], 5, a, b)
        assert (sigs[0] == np.uint64(0xFFFFFFFFFFFFFFFF)).all()

    def test_reduceat_segments(self):
        a, b = CFG.minhash_perms()
        h1 = rolling_shingle_hashes(b"aaaaabbbbb", 3)
        h2 = rolling_shingle_hashes(b"cccccddddd", 3)
        concat = np.concatenate([h1, np.empty(0, np.uint64), h2])
        offsets = np.array([0, len(h1), len(h1), len(h1) + len(h2)], dtype=np.int64)
        sigs = minhash_batch(concat, offsets, a, b)
        assert np.array_equal(sigs[0], minhash_of_hashes(h1, a, b))
        assert (sigs[1] == np.uint64(0xFFFFFFFFFFFFFFFF)).all()
        assert np.array_equal(sigs[2], minhash_of_hashes(h2, a, b))


class TestLSH:
    def test_band_keys_shape_and_determinism(self):
        rng = np.random.default_rng(1)
        sigs = rng.integers(0, 1 << 63, size=(10, CFG.num_perm)).astype(np.uint64)
        k1 = band_keys(sigs, CFG.bands, CFG.rows_per_band)
        k2 = band_keys(sigs, CFG.bands, CFG.rows_per_band)
        assert k1.shape == (10, CFG.bands)
        assert np.array_equal(k1, k2)

    def test_identical_sigs_share_all_bands(self):
        sigs = np.ones((2, CFG.num_perm), dtype=np.uint64)
        k = band_keys(sigs, CFG.bands, CFG.rows_per_band)
        assert np.array_equal(k[0], k[1])

    def test_scurve(self):
        assert lsh_collision_probability(0.9, 16, 8) > 0.99
        assert lsh_collision_probability(0.2, 16, 8) < 0.01


class TestSimHash:
    def test_identical(self):
        h = simhash_texts(["short text", "short text"], 5)
        assert h[0] == h[1]

    def test_chunk_keys_catch_small_hamming(self):
        h0 = np.uint64(0xDEADBEEF12345678)
        h1 = h0 ^ np.uint64(1 << 5) ^ np.uint64(1 << 40)  # hamming 2
        keys = simhash_chunk_keys(np.array([h0, h1], dtype=np.uint64), 4)
        assert len(set(keys[0]) & set(keys[1])) >= 1

    def test_hamming(self):
        a = np.array([0, 0xFF], dtype=np.uint64)
        b = np.array([1, 0], dtype=np.uint64)
        assert list(hamming_distance(a, b)) == [1, 8]


class TestSimilarity:
    def test_exact_jaccard(self):
        a = np.array([1, 2, 3, 4], dtype=np.uint64)
        b = np.array([3, 4, 5, 6], dtype=np.uint64)
        assert exact_jaccard(a, b) == pytest.approx(2 / 6)
        assert exact_jaccard(a, a) == 1.0
        assert exact_jaccard(np.empty(0, np.uint64), a) == 0.0

    def test_shingle_set_unique_sorted(self):
        s = shingle_set("aaaaaaa", 3)
        assert s.shape[0] == 1

    def test_word_jaccard(self):
        assert word_jaccard("a b c", "b c d") == pytest.approx(2 / 4)

    def test_cosine_topk(self):
        corpus = np.array([[1, 0], [0, 1], [0.9, 0.1]], dtype=np.float64)
        q = np.array([[1, 0.01]], dtype=np.float64)
        idx, score = cosine_topk(q, corpus, 2)
        assert idx[0, 0] == 0
        assert score[0, 0] > score[0, 1]


class TestSynth:
    def test_deterministic_and_shaped(self):
        from libpostal_ray.synth import synth_code_corpus

        t1 = synth_code_corpus(n_files=200, seed=7)
        t2 = synth_code_corpus(n_files=200, seed=7)
        assert t1.equals(t2)
        assert t1.num_rows == 200
        assert t1.column_names == [
            "repo", "path", "commit", "lang", "content", "dup_group",
        ]
        # has exact dup pairs
        import collections

        c = collections.Counter(t1["dup_group"].to_pylist())
        assert any(v > 1 for v in c.values())


class TestOPHMinHash:
    def test_estimator_and_determinism(self):
        from libpostal_ray.functions.hashing import rolling_shingle_hashes
        from libpostal_ray.functions.minhash import oph_minhash_batch
        from libpostal_ray.functions.similarity import exact_jaccard_texts

        base = " ".join(f"tok{i}" for i in range(300))
        words = base.split()
        mutated_words = list(words)
        for i in range(0, 300, 10):
            mutated_words[i] = f"zz{i}"
        mutated = " ".join(mutated_words)
        texts = [base, mutated, ""]
        per_doc = [rolling_shingle_hashes(t.encode(), 5) for t in texts]
        counts = np.array([h.shape[0] for h in per_doc])
        concat = np.concatenate(per_doc)
        offsets = np.zeros(4, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        s1 = oph_minhash_batch(concat, offsets, 128)
        s2 = oph_minhash_batch(concat, offsets, 128)
        assert np.array_equal(s1, s2)
        # empty doc stays sentinel
        assert (s1[2] == np.uint64(0xFFFFFFFFFFFFFFFF)).all()
        j_exact = exact_jaccard_texts(base, mutated, 5)
        j_est = float(np.mean(s1[0] == s1[1]))
        stderr = np.sqrt(j_exact * (1 - j_exact) / 128)
        assert abs(j_est - j_exact) <= 5 * stderr + 0.02

    def test_identical_docs_identical_sigs(self):
        from libpostal_ray.functions.hashing import rolling_shingle_hashes
        from libpostal_ray.functions.minhash import oph_minhash_batch

        t = "some identical content here padded to be long enough for shingles"
        h = rolling_shingle_hashes(t.encode(), 5)
        concat = np.concatenate([h, h])
        offsets = np.array([0, len(h), 2 * len(h)], dtype=np.int64)
        s = oph_minhash_batch(concat, offsets, 128)
        assert np.array_equal(s[0], s[1])
        assert float(np.mean(s[0] == s[1])) == 1.0

    def test_sparse_doc_densifies(self):
        from libpostal_ray.functions.minhash import oph_minhash_batch

        concat = np.array([12345], dtype=np.uint64)  # one shingle
        offsets = np.array([0, 1], dtype=np.int64)
        s = oph_minhash_batch(concat, offsets, 128)
        # every slot filled (no sentinel left) after densification
        assert not (s[0] == np.uint64(0xFFFFFFFFFFFFFFFF)).any()


class TestCanonicalizeFastPath:
    def test_ascii_fast_path_equivalence(self):
        import re, unicodedata

        ws = re.compile(r"\s+")
        cases = [
            "def f(a, b):\n    return a + b\n",
            "  leading and trailing  ",
            "tabs\there\nnewlines",
            "MIXED Case TEXT",
            "",
            "a",
            "ﬁle Straße ＡＢＣ",  # non-ascii: general path
            "x   y",  # nbsp: non-ascii whitespace
        ]
        for s in cases:
            general = ws.sub(" ", unicodedata.normalize("NFKC", s).casefold()).strip()
            assert canonicalize_one(s) == general, repr(s)


class TestLevenshteinVsDuckDB:
    """The edit_distance_pairs oracle depends on our levenshtein /
    char_jaccard agreeing EXACTLY with DuckDB's builtins (byte-level)."""

    def test_levenshtein_known(self):
        from libpostal_ray.functions.similarity import levenshtein

        assert levenshtein("kitten", "sitting") == 3
        assert levenshtein("", "abc") == 3
        assert levenshtein("abc", "abc") == 0
        # byte-level: 'é' is two UTF-8 bytes (DuckDB semantics)
        assert levenshtein("café", "cafe") == 2

    def test_random_vs_duckdb(self):
        import random

        import duckdb

        from libpostal_ray.functions.similarity import char_jaccard, levenshtein

        con = duckdb.connect()
        rng = random.Random(42)
        alphabet = "abcdef ghé"
        for _ in range(200):
            a = "".join(rng.choice(alphabet) for _ in range(rng.randint(2, 40)))
            b = "".join(rng.choice(alphabet) for _ in range(rng.randint(2, 40)))
            want_lev, want_jac = con.sql(
                "select levenshtein(?, ?), jaccard(?, ?)", params=[a, b, a, b]
            ).fetchone()
            assert levenshtein(a, b) == want_lev, (a, b)
            assert char_jaccard(a, b) == want_jac, (a, b)
