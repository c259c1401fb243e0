"""Per-token greedy perceptron tagger (address_parser.c:1645-1839 analog)."""

import numpy as np
import pyarrow as pa

import ray.data

from libpostal_ray.pipelines.tagger import (
    TAGS,
    license_tagger,
    synth_tagged_corpus,
    tag_tokens,
    train_tagger,
)


def test_synth_tagged_corpus_shape():
    t = synth_tagged_corpus(n_docs=10, seed=3)
    assert t.num_rows == 10
    toks = t["tokens"].to_pylist()
    tags = t["tags"].to_pylist()
    for tk, tg in zip(toks, tags):
        assert len(tk) == len(tg)
        # header prefix then code body, contiguous spans
        first_code = tg.index("code")
        assert all(x == "license" for x in tg[:first_code])
        assert all(x == "code" for x in tg[first_code:])
    # deterministic
    t2 = synth_tagged_corpus(n_docs=10, seed=3)
    assert t.equals(t2)


def test_tagger_beats_majority_on_heldout(ray_session):
    df = license_tagger("/root/testdata/sf0.001")
    final = df.iloc[-1]
    # majority class (code) is ~65-75% of tokens; the tagger must be
    # far above it
    assert final["heldout_accuracy_milli"] >= 950, df
    assert final["n_tokens"] > 0


def test_tag_tokens_roundtrip(ray_session):
    t = synth_tagged_corpus(n_docs=100, seed=13)
    ds = ray.data.from_arrow(t)

    def _split(keep_mod0):
        def f(b):
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            m = (ids % 5 == 0) if keep_mod0 else (ids % 5 != 0)
            return b.filter(pa.array(m))

        return f

    train = ds.map_batches(_split(False), batch_format="pyarrow")
    held = ds.map_batches(_split(True), batch_format="pyarrow")
    _df, W = train_tagger(train, held, epochs=2)
    out = tag_tokens(held, W).to_pandas().set_index("doc_id")
    gold = {
        d: g
        for d, g in zip(t["doc_id"].to_pylist(), t["tags"].to_pylist())
        if d % 5 == 0
    }
    total = correct = 0
    for d, g in gold.items():
        pred = out.loc[d, "tags"]
        assert len(pred) == len(g)
        assert set(pred) <= set(TAGS)
        correct += int(np.sum(np.asarray(pred) == np.asarray(g)))
        total += len(g)
    assert correct / total >= 0.9


def test_crf_viterbi_beats_or_matches_greedy(ray_session):
    # the round-4 verdict's done-bar: CRF held-out token accuracy >= the
    # greedy perceptron's on the license-span corpus
    from libpostal_ray.pipelines.tagger import license_tagger, license_tagger_crf

    greedy = license_tagger("/x/sf0.001", epochs=3)
    crf = license_tagger_crf("/x/sf0.001", epochs=3)
    g = int(greedy.heldout_accuracy_milli.iloc[-1])
    c = int(crf.heldout_accuracy_milli.iloc[-1])
    assert c >= g, (c, g)
    assert c >= 900  # far above the ~650-750 majority baseline


def test_viterbi_exact_vs_bruteforce():
    # Viterbi must return the true max-scoring path: compare against
    # exhaustive path enumeration on short sequences
    import itertools

    from libpostal_ray.pipelines.tagger import (
        _pt_feat_indices,
        _static_feat_indices,
        _viterbi_decode,
    )

    rng = np.random.default_rng(5)
    C = len(TAGS)
    for trial in range(20):
        toks = [str(rng.integers(0, 9)) for _ in range(int(rng.integers(1, 7)))]
        W = rng.normal(size=(C, 1 << 14)).astype(np.float64)
        T = rng.normal(size=(C, C)).astype(np.float64)
        got = _viterbi_decode(W, T, toks)

        def path_score(path):
            s = 0.0
            for i, y in enumerate(path):
                prev = path[i - 1] if i else 0
                s += W[y, _static_feat_indices(toks, i)].sum()
                s += W[y, _pt_feat_indices(toks, i, prev)].sum()
                if i:
                    s += T[prev, y]
            return s

        best = max(
            itertools.product(range(C), repeat=len(toks)), key=path_score
        )
        assert path_score(tuple(got)) == path_score(best)


def test_tag_tokens_crf_roundtrip(ray_session):
    from libpostal_ray.pipelines.tagger import tag_tokens_crf, train_crf_tagger

    t = synth_tagged_corpus(n_docs=100, seed=13)
    ds = ray.data.from_arrow(t)

    def _split(keep_mod0):
        def f(b):
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            m = (ids % 5 == 0) if keep_mod0 else (ids % 5 != 0)
            return b.filter(pa.array(m))

        return f

    train = ds.map_batches(_split(False), batch_format="pyarrow")
    held = ds.map_batches(_split(True), batch_format="pyarrow")
    _df, W, T = train_crf_tagger(train, held, epochs=2)
    out = tag_tokens_crf(held, W, T).to_pandas().set_index("doc_id")
    gold = {
        d: g
        for d, g in zip(t["doc_id"].to_pylist(), t["tags"].to_pylist())
        if d % 5 == 0
    }
    total = correct = 0
    for d, g in gold.items():
        pred = out.loc[d, "tags"]
        assert len(pred) == len(g)
        assert set(pred) <= set(TAGS)
        correct += int(np.sum(np.asarray(pred) == np.asarray(g)))
        total += len(g)
    assert correct / total >= 0.9
