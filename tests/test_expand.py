"""Multi-form expansion (functions/expand.py) — the expand_address parity
surface (expand.c:1453-1553): dictionary alternatives fan one canonical
string into several forms; the near-dup pipeline blocks on every form and
verifies by form intersection (dedupe.c:13-31 expansions_intersect)."""

import os
import sys

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libpostal_ray.config import PipelineConfig  # noqa: E402
from libpostal_ray.functions.expand import (  # noqa: E402
    EN_ALTERNATIVES,
    compile_alternatives,
    expand_variants,
    expansion_key_hashes,
)

COMPILED = compile_alternatives(EN_ALTERNATIVES)


class TestExpandVariants:
    def test_identity_first(self):
        forms = expand_variants("123 main st", COMPILED)
        assert forms[0] == "123 main st"
        assert "123 main street" in forms
        assert "123 main saint" in forms

    def test_no_match_identity_only(self):
        assert expand_variants("qwerty zxcvb", COMPILED) == ["qwerty zxcvb"]

    def test_empty_and_none_table(self):
        assert expand_variants("", COMPILED) == [""]
        assert expand_variants("main st", None) == ["main st"]

    def test_multiple_matches_cartesian(self):
        forms = expand_variants("n main st", COMPILED)
        assert "north main street" in forms
        assert "north main saint" in forms
        assert "n main street" in forms
        assert forms[0] == "n main st"
        # 2 x 3 combinations, all unique
        assert len(forms) == 6

    def test_cap_bounds_enumeration(self):
        forms = expand_variants("n e s w st dr", COMPILED, max_forms=4)
        assert len(forms) <= 4
        assert forms[0] == "n e s w st dr"

    def test_deterministic(self):
        a = expand_variants("w st co dr", COMPILED)
        assert a == expand_variants("w st co dr", COMPILED)

    def test_longest_match_first(self):
        # "ne" must match as one token (northeast), not leave "n"+"e"
        forms = expand_variants("ne corner", COMPILED)
        assert "northeast corner" in forms

    def test_key_hashes_nonzero_63bit_deterministic(self):
        ks = expansion_key_hashes(["main st", "main street", ""])
        assert (ks > 0).all()
        assert (ks < (1 << 63)).all()
        ks2 = expansion_key_hashes(["main st", "main street", ""])
        assert (ks == ks2).all()
        assert ks[0] != ks[1]


class TestExpansionBlocking:
    """The pipeline-level contract: rows sharing any expansion form
    co-cluster when expansion_keys is on."""

    def _corpus(self):
        rows = [
            (0, "main st"),
            (1, "main street"),
            (2, "main saint"),
            (3, "oak ave"),
            (4, "oak avenue"),
            (5, "completely unrelated content zzz"),
        ]
        import hashlib

        return pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "sha256": pa.array(
                    [hashlib.sha256(r[1].encode()).digest() for r in rows],
                    type=pa.binary(32),
                ),
                "canonical": pa.array([r[1] for r in rows], type=pa.large_string()),
                "n_chars": pa.array(
                    [len(r[1]) for r in rows], type=pa.int64()
                ),
            }
        )

    def test_signature_stage_emits_expansion_keys(self, ray_session):
        from libpostal_ray.stages.signature import SignatureStage

        cfg = PipelineConfig(
            expansion_keys=True, expansion_alternatives=EN_ALTERNATIVES
        )
        out = SignatureStage(cfg)(self._corpus())
        keys = out["band_keys"].to_pylist()
        exp4 = np.asarray(out["exp4"].to_pylist(), dtype=np.int64)
        # doc 0 ("main st") stores identity + street + saint forms
        assert (exp4[0] != 0).sum() == 3
        # doc 1 ("main street") stores only its identity form
        assert (exp4[1] != 0).sum() == 1
        # doc 0's band keys contain doc 1's identity form key (shared form)
        assert exp4[1][0] in keys[0]
        # doc 2's identity form key too
        assert exp4[2][0] in keys[0]
        # feature off: no expansion keys, exp4 all zero
        out_off = SignatureStage(PipelineConfig())(self._corpus())
        exp4_off = np.asarray(out_off["exp4"].to_pylist(), dtype=np.int64)
        assert (exp4_off == 0).all()

    def test_forms_cocluster_in_pipeline(self, ray_session):
        import ray.data

        from libpostal_ray.pipelines.near_dupe import near_dupe_pipeline

        cfg = PipelineConfig(
            expansion_keys=True, expansion_alternatives=EN_ALTERNATIVES
        )
        corpus = self._corpus()
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": corpus["doc_id"],
                    "repo": pa.array(["r"] * 6),
                    "path": pa.array([f"p{i}" for i in range(6)]),
                    "lang": pa.array(["en"] * 6),
                    "content": corpus["canonical"],
                }
            )
        )
        out = near_dupe_pipeline(ds, cfg)
        df = out["clusters"].to_pandas().set_index("doc_id")
        cl = df["cluster_id"]
        # "main st" / "main street" / "main saint" share forms -> one cluster
        assert cl[0] == cl[1] == cl[2]
        # "oak ave" / "oak avenue" share the avenue form
        assert cl[3] == cl[4]
        # the unrelated doc stays out
        assert cl[5] != cl[0] and cl[5] != cl[3]

    def test_verify_status_likely_on_intersection(self):
        from libpostal_ray.stages.verify import (
            STATUS_LIKELY,
            verify_pair_statuses,
        )

        cfg = PipelineConfig(
            expansion_keys=True, expansion_alternatives=EN_ALTERNATIVES
        )
        exact = np.array([False])
        raw = np.array([0.0])
        both_short = np.array([True])
        ham = np.array([30], dtype=np.int64)  # SimHash says NO
        exp_a = np.array([[11, 22, 0, 0]], dtype=np.int64)
        exp_b = np.array([[33, 22, 0, 0]], dtype=np.int64)
        status, _ = verify_pair_statuses(
            exact, raw, both_short, ham, cfg, exp_a=exp_a, exp_b=exp_b
        )
        assert status[0] == STATUS_LIKELY
        # zero slots never match each other
        status0, _ = verify_pair_statuses(
            exact, raw, both_short, ham, cfg,
            exp_a=np.zeros((1, 4), dtype=np.int64),
            exp_b=np.zeros((1, 4), dtype=np.int64),
        )
        assert status0[0] == 0


class TestLanguagePacks:
    """ES/FR/DE/PT rule packs (resources/dictionaries/<lang> content model
    beyond EN — round-2 verdict gap #2) and per-language alternatives."""

    def test_es_rules(self):
        from libpostal_ray.functions.canonicalize import (
            ES_GENERAL_RULES,
            canonicalize_one,
            compile_rules,
        )

        rules = compile_rules(ES_GENERAL_RULES)
        out = canonicalize_one("Avda del Sr Gómez, quince", compiled_rules=rules)
        assert out == "avenida de el señor gómez, 15"

    def test_fr_rules_elision(self):
        from libpostal_ray.functions.canonicalize import (
            FR_GENERAL_RULES,
            canonicalize_one,
            compile_rules,
        )

        rules = compile_rules(FR_GENERAL_RULES)
        assert (
            canonicalize_one("Bd St-Michel, l'hôtel", compiled_rules=rules)
            == "boulevard saint-michel, le hôtel"
        )

    def test_de_rules(self):
        from libpostal_ray.functions.canonicalize import (
            DE_GENERAL_RULES,
            canonicalize_one,
            compile_rules,
        )

        rules = compile_rules(DE_GENERAL_RULES)
        assert (
            canonicalize_one("Hauptstr. Nr zwölf", compiled_rules=rules)
            == "haupt strasse nummer 12"
        )

    def test_pt_rules(self):
        from libpostal_ray.functions.canonicalize import (
            PT_GENERAL_RULES,
            canonicalize_one,
            compile_rules,
        )

        rules = compile_rules(PT_GENERAL_RULES)
        assert (
            canonicalize_one("Av Sta Maria, Dr Silva", compiled_rules=rules)
            == "avenida santa maria, doutor silva"
        )

    def test_it_rules(self):
        from libpostal_ray.functions.canonicalize import (
            IT_GENERAL_RULES,
            canonicalize_one,
            compile_rules,
        )

        rules = compile_rules(IT_GENERAL_RULES)
        assert (
            canonicalize_one("Cso Garibaldi quindici, Dott. Rossi", compiled_rules=rules)
            == "corso garibaldi 15, dottore rossi"
        )
        # "via" is not an abbreviation — never rewritten
        assert canonicalize_one("via Roma", compiled_rules=rules) == "via roma"

    def test_nl_rules(self):
        from libpostal_ray.functions.canonicalize import (
            NL_GENERAL_RULES,
            canonicalize_one,
            compile_rules,
        )

        rules = compile_rules(NL_GENERAL_RULES)
        assert (
            canonicalize_one("Kerkstr. nr twaalf, dhr Jansen", compiled_rules=rules)
            == "kerk straat nummer 12, de heer jansen"
        )
        # "een" is both the article and "one" — deliberately NOT rewritten
        assert (
            canonicalize_one("een huis", compiled_rules=rules) == "een huis"
        )

    def test_registry_covers_langs(self):
        from libpostal_ray.functions.canonicalize import (
            LANG_RULE_PACKS,
            compile_rules,
        )
        from libpostal_ray.functions.expand import LANG_ALTERNATIVES

        assert set(LANG_RULE_PACKS) == {
            "en", "es", "fr", "de", "pt", "it", "nl", "la",
            "sv", "da", "no", "pl", "cs", "fi", "tr",
            "ro", "hu", "ca", "id", "sk", "hr",
            "lt", "lv", "et", "sl", "gl", "eu", "ms", "sq", "tl",
            "ru", "uk", "el", "bg",
            "sr", "mk", "be", "is", "ga", "af",
            "ar", "fa", "he", "hi", "ko",
            "vi", "sw", "cy", "mt", "bs", "az", "uz", "kk", "hy", "ka",
            "ast", "br", "gd", "gsw", "lb", "oc", "pap",
            "ja", "zh", "th", "ur", "si", "fil", "nb",
        }
        for pack in LANG_RULE_PACKS.values():
            assert compile_rules(pack)  # every pack compiles
        assert set(LANG_ALTERNATIVES) == {
            "en", "es", "fr", "de", "pt", "it", "nl",
        }
        from libpostal_ray.functions.expand import (
            IT_ALTERNATIVES,
            compile_alternatives,
            expand_variants,
        )

        forms = expand_variants("s maria", compile_alternatives(IT_ALTERNATIVES))
        assert "san maria" in forms and "santa maria" in forms

    def test_fr_alternatives_ambiguity(self):
        from libpostal_ray.functions.expand import (
            FR_ALTERNATIVES,
            compile_alternatives,
            expand_variants,
        )

        forms = expand_variants(
            "bd st michel", compile_alternatives(FR_ALTERNATIVES)
        )
        assert forms[0] == "bd st michel"
        assert "boulevard saint michel" in forms

    def test_rule_free_text_unchanged(self):
        from libpostal_ray.functions.canonicalize import (
            LANG_RULE_PACKS,
            canonicalize_one,
            compile_rules,
        )

        text = "nothing matches these packs qqzz"
        for pack in LANG_RULE_PACKS.values():
            assert canonicalize_one(text, compiled_rules=compile_rules(pack)) == text
