"""File-driven dictionary packs — the reference's data-file model
(resources/dictionaries/<lang>/<dict>.txt, address_dictionary_builder.c):
pack content grows by editing plain-text files, no code changes."""

import os

from libpostal_ray.config import PipelineConfig
from libpostal_ray.functions.canonicalize import (
    FILE_DICT_PACKS,
    LANG_RULE_PACKS,
    _file_pack_rules,
    _pack_plain_words,
    canonicalize_one,
    compile_rules,
    load_dictionary_entries,
    load_dictionary_packs,
    parse_dictionary_lines,
)
from libpostal_ray.stages.canonicalize import CanonicalizeStage

import pyarrow as pa


def _route(texts, langs):
    stage = CanonicalizeStage(PipelineConfig(lang_rules=True))
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(1, len(texts) + 1)), type=pa.int64()),
            "lang": langs,
            "content": texts,
        }
    )
    return stage(tbl)["canonical"].to_pylist()


class TestParser:
    def test_line_format(self):
        got = parse_dictionary_lines(
            [
                "# comment",
                "",
                "street|st|str",
                "singleform",
                "  avenue | ave ",
            ]
        )
        assert got == {"st": "street", "str": "street", "ave": "avenue"}

    def test_later_file_overrides(self, tmp_path):
        d = tmp_path / "xx"
        d.mkdir()
        (d / "a.txt").write_text("saint|st\n")
        (d / "b.txt").write_text("street|st\n")
        entries = load_dictionary_entries(str(tmp_path))
        assert entries["xx"]["st"] == "street"  # sorted-file order, last wins

    def test_missing_dir_is_empty(self):
        assert load_dictionary_packs("/tmp/does-not-exist-xyz") == {}


class TestRuleBuild:
    def test_reserved_words_never_overridden(self):
        # the in-code pack maps cad -> caddesi; a file entry for the same
        # variant must be dropped, not silently override it in the fold
        code = ((r"\bcad\b", "caddesi"),)
        rules = _file_pack_rules({"cad": "cadde", "cd": "cadde"},
                                 _pack_plain_words(code))
        words = [p for p, _ in rules]
        assert r"\bcad\b" not in words and r"\bcd\b" in words

    def test_wordless_forms_skipped(self):
        # a variant with no word character would compile to \b<punct>\b
        # and its romanized twin could degenerate to an every-boundary
        # match — both must be dropped
        rules = _file_pack_rules({"...": "ellipsis", "ok": "okay"})
        assert len(rules) == 1 and rules[0][1] == "okay"

    def test_biscript_twins_generated(self):
        rules = dict(_file_pack_rules({"ул": "улица"}))
        # native casefolded rule + romanized twin
        assert rules[r"\bул\b"] == "улица"
        twins = [r for p, r in rules.items() if p != r"\bул\b"]
        assert len(twins) == 1 and twins[0] not in ("улица",)


class TestShippedContent:
    def test_all_shipped_langs_load(self):
        # every dictionary dir becomes a pack merged into LANG_RULE_PACKS
        base = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "libpostal_ray",
            "resources",
            "dictionaries",
        )
        dirs = sorted(
            d for d in os.listdir(base) if os.path.isdir(os.path.join(base, d))
        )
        assert len(dirs) >= 60
        for lang in dirs:
            assert FILE_DICT_PACKS.get(lang), lang
            assert lang in LANG_RULE_PACKS

    def test_en_street_org_general(self):
        out = _route(
            ["Acme Corp. 12 Oak Blvd Ste 4", "Dept of Physics, MIT Bldg 7"],
            ["en", "en"],
        )
        assert out[0] == "acme corporation 12 oak boulevard suite 4"
        assert out[1] == "department of physics, mit building 7"

    def test_routing_pairs_per_new_pack_family(self):
        # fixture pair per pack family: latin, biscript-cyrillic, greek,
        # rtl-arabic, indic, cjk — same text under EN must NOT fire
        out = _route(
            [
                "ул Ленина корп 2",       # ru file pack
                "Βασιλίσσης οδ 3",        # el file pack
                "جامعة القاهرة ش النيل",  # ar file pack
                "Jl. Sudirman kel Menteng",  # id file pack
                "ул Ленина корп 2",       # same text, EN: no RU firing
            ],
            ["ru", "el", "ar", "id", "en"],
        )
        assert "улица" in out[0] and "корпус" in out[0]
        # the in-code EL pack's accented οδός wins over the file entry
        # (reserved-word discipline); final sigma casefolds to medial
        assert "οδόσ" in out[1]
        assert "شارع" in out[2]
        assert "kelurahan" in out[3]
        assert "улица" not in out[4] and "ул" in out[4]

    def test_romanized_twins_route(self):
        # after transliteration the latin twin keys still fire
        from libpostal_ray.functions.translit import latin_ascii

        rules = compile_rules(LANG_RULE_PACKS["ru"])
        native = canonicalize_one("проспект мира кв 5", compiled_rules=rules)
        roman = canonicalize_one(
            latin_ascii("проспект мира кв 5"), compiled_rules=rules
        )
        assert "квартира" in native
        assert "kvartira" in roman

    def test_aliases_route_merged_packs(self):
        assert LANG_RULE_PACKS["fil"] is LANG_RULE_PACKS["tl"]
        assert LANG_RULE_PACKS["nb"] is LANG_RULE_PACKS["no"]

    def test_custom_dir_composes_with_stage(self, tmp_path):
        # a user-supplied dictionary tree loads standalone and drives the
        # stage through cfg.rewrite_rules (no code change needed)
        d = tmp_path / "qq"
        d.mkdir()
        (d / "general.txt").write_text("quux|qx\n")
        packs = load_dictionary_packs(str(tmp_path))
        assert packs["qq"] == ((r"\bqx\b", "quux"),)
        stage = CanonicalizeStage(PipelineConfig(rewrite_rules=packs["qq"]))
        tbl = pa.table(
            {
                "doc_id": pa.array([1], type=pa.int64()),
                "lang": ["qq"],
                "content": ["a QX b"],
            }
        )
        assert stage(tbl)["canonical"].to_pylist() == ["a quux b"]


class TestSecondContentWave:
    def test_temporal_and_business_files(self):
        # round-5 second wave: themed temporal/business files route
        out = _route(
            [
                "Meeting Wed Sept 3rd, see Misc Info",
                "reunion mie 5 sept, ver pag 9",
                "стр 5 см табл 2",
            ],
            ["en", "es", "ru"],
        )
        # the in-code ordinal affix rules fire first: 3rd -> 3 (digits are
        # the engine's canonical direction)
        assert out[0] == "meeting wednesday september 3, see miscellaneous information"
        assert "miercoles" in out[1] and "pagina" in out[1]
        # "стр" is genuinely ambiguous in Russian (страница/строение);
        # sorted-file order makes general.txt win deterministically
        assert "строение" in out[2] and "таблица" in out[2] and "смотри" in out[2]

    def test_weekday_override_order_deterministic(self):
        # ru "ср" appears in two files (business "сравни", temporal
        # "среда") — sorted-file order makes temporal win, pinned here
        from libpostal_ray.functions.canonicalize import FILE_DICT_PACKS

        rules = dict(FILE_DICT_PACKS["ru"])
        assert rules[r"\bср\b"] == "среда"  # temporal.txt is sorted last
