"""Acronym blocking-key family (near_dupe.c:416-559 analog)."""

import pyarrow as pa

import ray.data

from libpostal_ray.config import PipelineConfig
from libpostal_ray.functions.acronym import (
    _acr_hash,
    acronym_key_arrays,
    acronym_row_keys,
)
from libpostal_ray.pipelines.near_dupe import (
    near_dupe_pipeline,
    refine_review_edges,
)
from libpostal_ray.stages.verify import STATUS_LIKELY, STATUS_NEEDS_REVIEW


def _mk_corpus(rows):
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


def test_acronym_row_keys_shapes():
    # multi-token: positive with-stopwords key; no-stopword variant when
    # it differs
    a1, a2 = acronym_row_keys("international business machines")
    assert a1 == _acr_hash("ibm") and a2 == 0  # no stopwords to drop
    b1, b2 = acronym_row_keys("the association of computing machinery")
    assert b1 == _acr_hash("taocm") and b2 == _acr_hash("acm")
    # single token: NEGATIVE self key in the same key space
    s1, s2 = acronym_row_keys("ibm")
    assert s1 == -_acr_hash("ibm") and s2 == 0
    # guards: 1-letter tokens, too many tokens, non-letter leads
    assert acronym_row_keys("x") == (0, 0)
    assert acronym_row_keys(" ".join("abcdefghijklm")) == (0, 0)
    assert acronym_row_keys("123 456") == (0, 0)
    assert acronym_row_keys("") == (0, 0)
    a = acronym_key_arrays(["ibm", "", "acme corp"])
    assert a[0][0] < 0 and a[0][1] == 0 and a[0][2] > 0


def test_acronym_keys_block_ibm_pair(ray_session):
    """'international business machines corp' vs 'ibmc': no shingle or
    SimHash key collides, but the acronym family blocks them and verify
    lands NEEDS_REVIEW (asymmetric: one side is the literal acronym)."""
    rows = [
        (1, "international business machines corp"),
        (2, "ibmc"),
        (3, "completely unrelated content body"),
    ]
    corpus = _mk_corpus(rows)

    off = near_dupe_pipeline(corpus, PipelineConfig(acronym_keys=False))
    e_off = off["edges"].to_pandas()
    assert len(e_off) == 0 or len(e_off[(e_off.src == 1) & (e_off.dst == 2)]) == 0

    on = near_dupe_pipeline(corpus, PipelineConfig(acronym_keys=True))
    e_on = on["edges"].to_pandas()
    pair = e_on[(e_on.src == 1) & (e_on.dst == 2)]
    assert len(pair) == 1, e_on
    assert int(pair.status.iloc[0]) == STATUS_NEEDS_REVIEW


def test_acronym_stopword_variant_blocks(ray_session):
    """'university of california' vs 'uc': only the no-stopword acronym
    matches the self token."""
    rows = [
        (1, "university of california"),
        (2, "uc"),
        (3, "completely unrelated content body"),
    ]
    on = near_dupe_pipeline(_mk_corpus(rows), PipelineConfig(acronym_keys=True))
    e_on = on["edges"].to_pandas()
    pair = e_on[(e_on.src == 1) & (e_on.dst == 2)]
    assert len(pair) == 1, e_on
    assert int(pair.status.iloc[0]) == STATUS_NEEDS_REVIEW


def test_two_phrases_same_acronym_not_upgraded(ray_session):
    """Two multi-token rows sharing first letters are NOT acronym-matched
    (pure first-letter equality of phrases is noise)."""
    rows = [
        (1, "big blue company"),
        (2, "bright bold cars"),
        (3, "completely unrelated content body"),
    ]
    on = near_dupe_pipeline(_mk_corpus(rows), PipelineConfig(acronym_keys=True))
    e_on = on["edges"].to_pandas()
    if len(e_on):
        pair = e_on[(e_on.src == 1) & (e_on.dst == 2)]
        # if any edge exists it must come from other evidence, not the
        # acronym family: these two share no SimHash/shingle similarity
        assert len(pair) == 0, e_on


def test_refine_upgrades_acronym_alignment(ray_session):
    """The refine tier's acronym_alignment check lifts a true acronym pair
    from NEEDS_REVIEW to LIKELY when acronym_keys is on."""
    rows = [
        (1, "international business machines corp"),
        (2, "ibmc"),
        (3, "completely unrelated content body"),
    ]
    corpus = _mk_corpus(rows)
    cfg = PipelineConfig(acronym_keys=True)
    out = near_dupe_pipeline(corpus, cfg)
    refined = refine_review_edges(out["edges"], corpus, cfg).to_pandas()
    pair = refined[(refined.src == 1) & (refined.dst == 2)]
    assert len(pair) == 1
    assert int(pair.status.iloc[0]) == STATUS_LIKELY
