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
