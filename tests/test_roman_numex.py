"""Roman-numeral numex pack (numex.c:1198-1335 analog) + PT numbers."""

import pyarrow as pa

import ray.data

from libpostal_ray.config import PipelineConfig
from libpostal_ray.functions.canonicalize import (
    LANG_RULE_PACKS,
    PT_NUMBER_RULES,
    ROMAN_NUMERAL_RULES,
    canonicalize_one,
    compile_rules,
    roman_value,
)
from libpostal_ray.pipelines.near_dupe import near_dupe_pipeline


def test_roman_value_gating():
    # valid subtractive forms
    assert roman_value("xiv") == 14
    assert roman_value("ix") == 9
    assert roman_value("mcmxciv") == 1994
    assert roman_value("mmxxvi") == 2026
    # invalid forms never convert
    assert roman_value("iiii") is None
    assert roman_value("vx") is None
    assert roman_value("xm") is None
    # the reference's short-token gate: len <= 2 must be i/v/x only
    assert roman_value("di") is None
    assert roman_value("cd") is None
    assert roman_value("dc") is None
    assert roman_value("mm") is None
    # 3+ chars may use any roman char ("mix" is MIX = 1009 in the
    # reference's latin routing too)
    assert roman_value("mix") == 1009


def test_roman_rules_apply_in_canonicalize():
    cr = compile_rules(ROMAN_NUMERAL_RULES)
    assert (
        canonicalize_one("Chapter XIV Section IX", compiled_rules=cr)
        == "chapter 14 section 9"
    )
    # gated words survive
    assert canonicalize_one("the di cd mix", compiled_rules=cr) == "the di cd 1009"
    # registered under "la" like the reference's latin routing
    assert LANG_RULE_PACKS["la"] is ROMAN_NUMERAL_RULES


def test_pt_number_pack():
    cr = compile_rules(PT_NUMBER_RULES)
    assert canonicalize_one("vinte e cinco", compiled_rules=cr) == "20 e 5"
    assert canonicalize_one("quatorze", compiled_rules=cr) == "14"
    assert canonicalize_one("catorze", compiled_rules=cr) == "14"


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


_BODY = "the quick brown fox jumps over the lazy dog near the river bank "


def test_roman_pack_clusters_chapter_pair(ray_session):
    """'Chapter XIV' vs 'chapter 14' bodies cluster with the pack on and
    stay apart with it off (they differ only in the numeral form)."""
    rows = [
        (1, f"Chapter XIV. {_BODY}"),
        (2, f"chapter 14. {_BODY}"),
        (3, "completely unrelated content body with nothing shared at all"),
    ]
    corpus = _mk_corpus(rows)

    on = near_dupe_pipeline(
        corpus, PipelineConfig(rewrite_rules=ROMAN_NUMERAL_RULES)
    )
    cl_on = on["clusters"].to_pandas().set_index("doc_id")["cluster_id"]
    assert cl_on[1] == cl_on[2]
    assert cl_on[3] != cl_on[1]

    off = near_dupe_pipeline(corpus, PipelineConfig())
    cl_off = off["clusters"].to_pandas().set_index("doc_id")["cluster_id"]
    # identical except the numeral: still very similar text, so the pair
    # may or may not clear the likely threshold without the pack — the
    # invariant that MUST hold is that the pack never breaks doc 3 apart
    assert cl_off[3] != cl_off[1]
