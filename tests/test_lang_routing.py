"""Per-language rule-pack routing (cfg.lang_rules) — the reference selects
dictionaries by each address' languages (expand.c); here each row gets
rewrite_rules + LANG_RULE_PACKS[lang] keyed off the corpus lang column."""

import pyarrow as pa

from libpostal_ray.config import PipelineConfig
from libpostal_ray.stages.canonicalize import CanonicalizeStage


def _canon(stage, texts, langs):
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(1, len(texts) + 1)), type=pa.int64()),
            "lang": langs,
            "content": texts,
        }
    )
    return stage(tbl)["canonical"].to_pylist()


def test_routing_applies_matching_pack():
    stage = CanonicalizeStage(PipelineConfig(lang_rules=True))
    out = _canon(
        stage,
        ["Avda. Sr. Uno", "I can't stop", "Hauptstr. zwei", "Avda. Sr. Uno"],
        ["es", "en", "de", "en"],
    )
    # abbreviation periods are consumed with the replacement
    # (DELETE_FINAL_PERIOD analog)
    assert out[0] == "avenida señor 1"
    assert out[1] == "i cannot stop"
    assert out[2] == "haupt strasse 2"
    # same text under EN: the ES entries (avda->avenida, uno->1) don't fire;
    # EN's own "sr"->"senior" does — routing picked a different pack
    assert out[3] == "avda. senior uno"


def test_region_suffix_and_unknown_lang():
    stage = CanonicalizeStage(PipelineConfig(lang_rules=True))
    out = _canon(stage, ["Av. Sra. dois", "won't change"], ["pt-BR", "xx"])
    assert "avenida" in out[0] and "senhora" in out[0]
    # unknown language: base canonicalization only
    assert out[1] == "won't change"
    # compiled packs cached per observed base language
    assert set(stage._lang_compiled) == {"pt", "xx"}


def test_off_by_default_and_global_rules_compose():
    off = CanonicalizeStage(PipelineConfig())
    assert _canon(off, ["Avda. Uno"], ["es"]) == ["avda. uno"]
    # global rewrite_rules still apply to every language when routing is on
    both = CanonicalizeStage(
        PipelineConfig(lang_rules=True, rewrite_rules=((r"\bfoo\b", "bar"),))
    )
    out = _canon(both, ["foo uno", "foo one"], ["es", "xx"])
    assert out[0] == "bar 1"
    assert out[1] == "bar one"


def test_fingerprint_covers_lang_rules():
    from libpostal_ray.state.checkpoint import config_fingerprint

    assert config_fingerprint(PipelineConfig()) != config_fingerprint(
        PipelineConfig(lang_rules=True)
    )


def test_nordic_and_polish_packs():
    stage = CanonicalizeStage(PipelineConfig(lang_rules=True))
    out = _canon(
        stage,
        [
            "Storg. åtta",          # sv: compound affix + number
            "Gl. Kongevej fem",     # da: abbreviation + number
            "Karl Johans gt. to",   # no: street abbrev + number
            "ul. Św. Jana trzy",    # pl: abbrevs + number
            "en bok",               # sv: article NOT rewritten
        ],
        ["sv", "da", "no", "pl", "sv"],
    )
    assert out[0] == "stor gatan 8"
    assert out[1] == "gamle kongevej 5"
    assert out[2] == "karl johans gate 2"
    assert out[3] == "ulica święty jana 3"
    assert out[4] == "en bok"


def test_unicode_keys_fold_and_consume_periods():
    """Non-ASCII pack entries (pięć, św, åtta) must behave exactly like
    ASCII ones: folded into the combined plain-word pass and consuming a
    trailing period before whitespace/end."""
    from libpostal_ray.functions.canonicalize import (
        PL_GENERAL_RULES,
        canonicalize_one,
        compile_rules,
    )

    rules = compile_rules(PL_GENERAL_RULES)
    # one combined pattern for the full plain-word pack (no per-entry passes)
    assert len(rules) == 1
    assert canonicalize_one("św. pięć.", compiled_rules=rules) == "święty 5"
    # mid-token periods are never CONSUMED (lookahead guard) — word rules
    # still fire on both sides of the dot, as in every other pack
    assert (
        canonicalize_one("sto.pl rocks", compiled_rules=rules)
        == "100.plac rocks"
    )


def test_cs_fi_tr_packs():
    stage = CanonicalizeStage(PipelineConfig(lang_rules=True))
    out = _canon(
        stage,
        [
            "Nám. Sv. Jana pět",      # cs: abbrevs + number
            "Mannerheimintie kolme krs. kaksi",  # fi: number + abbrev
            "Atatürk Cad. No: beş",   # tr: abbrevs + number
            "on iki",                 # tr: spelled 10 2
            "no way",                 # en: tr pack must NOT fire
        ],
        ["cs", "fi", "tr", "tr", "en"],
    )
    assert out[0] == "náměstí svatý jana 5"
    assert out[1] == "mannerheimintie 3 kerros 2"
    assert out[2] == "atatürk caddesi numara: 5"
    assert out[3] == "10 2"
    assert out[4] == "no way"


def test_session10_packs_route():
    stage = CanonicalizeStage(PipelineConfig(lang_rules=True))
    out = _canon(
        stage,
        [
            "Str. Unirii nr. cinci",          # ro
            "Kossuth u. tizenkettő",          # hu
            "Pg. de Gràcia quinze",           # ca
            "Jl. Merdeka no. dua belas",      # id
            "Hlavná ul. pätnásť",             # sk
            "Ilica ul. br. dvadeset",         # hr
        ],
        ["ro", "hu", "ca", "id", "sk", "hr"],
    )
    assert out[0] == "strada unirii numărul 5"
    assert out[1] == "kossuth utca 12"
    assert out[2] == "passeig de gràcia 15"
    assert out[3] == "jalan merdeka nomor 12"
    assert out[4] == "hlavná ulica 15"
    assert out[5] == "ilica ulica broj 20"


def test_session10_packs_do_not_cross_route():
    stage = CanonicalizeStage(PipelineConfig(lang_rules=True))
    # the same text under EN: no RO/HU/ID entries may fire
    out = _canon(
        stage,
        ["Str. Unirii nr. cinci", "Jl. Merdeka dua belas"],
        ["en", "en"],
    )
    # round-5: EN's own file pack maps str -> street (street_types.txt);
    # the point of the fixture is that RO's nr/cinci do NOT fire
    assert out[0] == "street unirii nr. cinci"
    assert out[1] == "jl. merdeka dua belas"


def test_session13_packs_route():
    stage = CanonicalizeStage(PipelineConfig(lang_rules=True))
    out = _canon(
        stage,
        [
            "Gedimino pr. penki",            # lt
            "Brīvības bulv. divdesmit",      # lv
            "Pikk tn. kolm",                 # et
            "Slovenska ul. št. deset",       # sl
            "Avda. do Medio catro",          # gl
            "Nagusia kl. hamar",             # eu
            "Jln. Bukit Bintang lapan",      # ms
            "Rr. e Kavajës njëzet",          # sq
            "Brgy. Uno dalawampu",           # tl
        ],
        ["lt", "lv", "et", "sl", "gl", "eu", "ms", "sq", "tl"],
    )
    assert out[0] == "gedimino prospektas 5"
    assert out[1] == "brīvības bulvāris 20"
    assert out[2] == "pikk tänav 3"
    assert out[3] == "slovenska ulica številka 10"
    assert out[4] == "avenida do medio 4"
    assert out[5] == "nagusia kalea 10"
    assert out[6] == "jalan bukit bintang 8"
    assert out[7] == "rruga e kavajës 20"
    assert out[8] == "barangay uno 20"


def test_session13_packs_do_not_cross_route():
    stage = CanonicalizeStage(PipelineConfig(lang_rules=True))
    # same surface under EN: no LT/MS/SQ entries may fire ("pr", "no",
    # "lapan", "njëzet" stay untouched)
    out = _canon(
        stage,
        ["Gedimino pr. penki", "Jln. Bukit lapan", "Rr. njëzet"],
        ["en", "en", "en"],
    )
    assert out[0] == "gedimino pr. penki"
    assert out[1] == "jln. bukit lapan"
    assert out[2] == "rr. njëzet"


def test_en_compound_numbers_combine():
    stage = CanonicalizeStage(PipelineConfig(lang_rules=True))
    out = _canon(
        stage,
        [
            "one hundred five main st",
            "two thousand three hundred four",
            "three hundred",
            "a hundred ideas",          # no leading digit: unchanged
            "one hundred and seven",    # 'and' form
        ],
        ["en"] * 5,
    )
    # round-5 file-driven pack: en/street_types.txt maps st -> street
    assert out[0] == "105 main street"
    assert out[1] == "2304"
    assert out[2] == "300"
    assert out[3] == "a hundred ideas"
    assert out[4] == "107"


def test_biscript_packs_native_and_romanized():
    # native script path (transliterate off): Cyrillic/Greek keys fire
    stage = CanonicalizeStage(PipelineConfig(lang_rules=True))
    out = _canon(
        stage,
        [
            "ул. Ленина пять",        # ru
            "вул. Шевченка десять",   # uk
            "οδ. Αθηνάς δέκα",        # el
            "бул. Витоша пет",        # bg
        ],
        ["ru", "uk", "el", "bg"],
    )
    assert out[0] == "улица ленина 5"
    assert out[1] == "вулиця шевченка 10"
    assert out[2] == "οδόσ αθηνάσ 10"   # casefolded canonical space
    assert out[3] == "булевард витоша 5"
    # romanized path (transliterate on): latin twins fire on the SAME rows
    stage_t = CanonicalizeStage(
        PipelineConfig(lang_rules=True, transliterate=True)
    )
    out_t = _canon(
        stage_t,
        ["ул. Ленина пять", "οδ. Αθηνάς δέκα"],
        ["ru", "el"],
    )
    assert out_t[0] == "ulitsa lenina 5"
    assert out_t[1] == "odos athinas 10" or out_t[1].endswith(" 10")


def test_session14_packs_route():
    stage = CanonicalizeStage(PipelineConfig(lang_rules=True))
    out = _canon(
        stage,
        [
            "ул. Кнеза Милоша пет",   # sr (Cyrillic, native path)
            "ул. Македонија пет",     # mk
            "вул. Купалы дзесяць",    # be
            "Laugavegur nr. tíu",     # is
            "Sr. Uí Chonaill fiche",  # ga
            "Kerk str. nr. twintig",  # af
        ],
        ["sr", "mk", "be", "is", "ga", "af"],
    )
    assert out[0] == "улица кнеза милоша 5"
    assert out[1] == "улица македонија 5"
    assert out[2] == "вуліца купалы 10"
    assert out[3] == "laugavegur númer 10"
    assert out[4] == "sráid uí chonaill 20"
    assert out[5] == "kerk straat nommer 20"


def test_session14_biscript_romanized_twins():
    # transliterate=True runs latin_ascii BEFORE rules: the latin twin
    # keys must fire on the same rows (incl. the new ђ/џ/љ/њ/ј letters)
    stage_t = CanonicalizeStage(
        PipelineConfig(lang_rules=True, transliterate=True)
    )
    out_t = _canon(
        stage_t,
        ["ул. Ђорђа пет", "бул. Јане десет"],
        ["sr", "mk"],
    )
    assert out_t[0] == "ulitsa djordja 5"
    assert out_t[1] == "bulevar jane 10"


def test_session14_packs_do_not_cross_route():
    stage = CanonicalizeStage(PipelineConfig(lang_rules=True))
    # the same texts under EN: no pack entry fires
    out = _canon(
        stage,
        ["Laugavegur nr. tíu", "Kerk str. nr. twintig"],
        ["en", "en"],
    )
    assert "10" not in out[0] and "númer" not in out[0]
    assert "20" not in out[1] and "nommer" not in out[1]


def test_session15_packs_route():
    # ar / fa / he / hi / ko — non-Latin scripts beyond Cyrillic/Greek,
    # native-script path (transliterate off)
    stage = CanonicalizeStage(PipelineConfig(lang_rules=True))
    out = _canon(
        stage,
        [
            "ش. النيل خمسة",       # ar: ش -> شارع, خمسة -> 5
            "خ. ولیعصر پنج",       # fa: خ -> خیابان, پنج -> 5
            "רח. הרצל שלוש",       # he: רח -> רחוב, שלוש -> 3
            "रोड नम्बर पाँच",        # hi: रोड -> मार्ग, नम्बर -> नंबर, पाँच -> 5
            "다섯 하나 전번",        # ko: numbers + 전번 -> 전화번호
        ],
        ["ar", "fa", "he", "hi", "ko"],
    )
    assert out[0] == "شارع النيل 5"
    assert out[1] == "خیابان ولیعصر 5"
    assert out[2] == "רחוב הרצל 3"
    assert out[3] == "मार्ग नंबर 5"
    assert out[4] == "5 1 전화번호"


def test_session15_biscript_romanized_twins():
    # transliterate=True romanizes BEFORE rules; the latin twin keys fire
    stage_t = CanonicalizeStage(
        PipelineConfig(lang_rules=True, transliterate=True)
    )
    out_t = _canon(
        stage_t,
        ["שלוש עשרים", "다섯 둘", "خمسة عشرون"],
        ["he", "ko", "ar"],
    )
    assert out_t[0] == "3 20"
    assert out_t[1] == "5 2"
    assert out_t[2] == "5 20"


def test_session15_packs_do_not_cross_route():
    stage = CanonicalizeStage(PipelineConfig(lang_rules=True))
    out = _canon(
        stage,
        ["רח. הרצל שלוש", "다섯 하나"],
        ["en", "en"],
    )
    # EN routing: no he/ko entry fires (whitespace collapse still applies)
    assert "3" not in out[0] and "רחוב" not in out[0]
    assert "5" not in out[1]


def test_session16_latin_packs_route():
    # vi / sw / cy / mt / bs / az / uz — Latin-script packs
    stage = CanonicalizeStage(PipelineConfig(lang_rules=True))
    out = _canon(
        stage,
        [
            "đ. Lê Lợi năm",            # vi: đ -> đường, năm -> 5
            "brb. Uhuru kumi",          # sw
            "st. Fawr deg",             # cy
            "trq. Repubblika ħamsa",    # mt
            "ul. Ferhadija pet",        # bs
            "küç. Nizami beş",          # az
            "ko'ch. Navoiy o'n",        # uz
        ],
        ["vi", "sw", "cy", "mt", "bs", "az", "uz"],
    )
    assert out[0] == "đường lê lợi 5"
    assert out[1] == "barabara uhuru 10"
    assert out[2] == "stryd fawr 10"
    assert out[3] == "triq repubblika 5"
    assert out[4] == "ulica ferhadija 5"
    assert out[5] == "küçə nizami 5"
    assert out[6] == "ko'cha navoiy 10"


def test_session16_biscript_packs_route():
    # kk (Cyrillic) / hy (Armenian) / ka (Georgian), native-script path
    stage = CanonicalizeStage(PipelineConfig(lang_rules=True))
    out = _canon(
        stage,
        [
            "көш. Абай бес",          # kk
            "փ. Մաշտոց հինգ",         # hy
            "ქ. რუსთაველი ხუთი",      # ka
        ],
        ["kk", "hy", "ka"],
    )
    assert out[0] == "көше абай 5"
    assert out[1] == "փողոց մաշտոց 5"
    assert out[2] == "ქუჩა რუსთაველი 5"


def test_session16_biscript_romanized_twins():
    # transliterate=True romanizes BEFORE rules: the latin twin keys fire
    stage_t = CanonicalizeStage(
        PipelineConfig(lang_rules=True, transliterate=True)
    )
    out_t = _canon(
        stage_t,
        ["көш. Абай бес", "փ. Մաշտոց հինգ", "ქ. რუსთაველი ხუთი"],
        ["kk", "hy", "ka"],
    )
    assert out_t[0] == "koshe abai 5"
    assert out_t[1] == "poghots mashtots 5"
    assert out_t[2] == "kucha rustaveli 5"


def test_session16_packs_do_not_cross_route():
    stage = CanonicalizeStage(PipelineConfig(lang_rules=True))
    out = _canon(
        stage,
        ["đ. Lê Lợi năm", "köш. Абай бес"],
        ["en", "en"],
    )
    assert "đường" not in out[0] and " 5" not in out[0]


def test_session18_final_packs_route():
    # the last dictionaries/ batch: Latin minority langs + CJK/Thai/Urdu/
    # Sinhala (standalone-token semantics — no segmenter, matching the
    # reference's phrase-dictionary model)
    stage = CanonicalizeStage(PipelineConfig(lang_rules=True))
    out = _canon(
        stage,
        [
            "avda uviéu dos",          # ast
            "str kirchberg dräi",      # lb
            "av tolosa cinc",          # oc
            "でんわ 三",                # ja: abbrev + standalone kanji numeral
            "第三 三十 五",             # zh: 三 inside 第三 must NOT fire
            "ถ สอง",                   # th
            "سڑ دو",                   # ur
            "දුක දෙක",                 # si
        ],
        ["ast", "lb", "oc", "ja", "zh", "th", "ur", "si"],
    )
    assert out[0] == "avenida uviéu 2"
    assert out[1] == "strooss kirchberg 3"
    assert out[2] == "avenguda tolosa 5"
    assert out[3] == "電話 3"
    assert out[4] == "第三 30 5"
    assert out[5] == "ถนน 2"
    assert out[6] == "سڑک 2"
    assert out[7] == "දුරකථන 2"


def test_session18_iso_alias_packs():
    # fil routes tl's pack, nb routes no's — separate dirs in the reference
    from libpostal_ray.functions.canonicalize import (
        LANG_RULE_PACKS,
        NO_GENERAL_RULES,
        TL_GENERAL_RULES,
    )

    # round-5: packs = in-code rules + file-driven dictionary content,
    # and the alias must route the SAME merged pack object
    assert LANG_RULE_PACKS["fil"] is LANG_RULE_PACKS["tl"]
    assert LANG_RULE_PACKS["nb"] is LANG_RULE_PACKS["no"]
    assert LANG_RULE_PACKS["tl"][: len(TL_GENERAL_RULES)] == TL_GENERAL_RULES
    assert LANG_RULE_PACKS["no"][: len(NO_GENERAL_RULES)] == NO_GENERAL_RULES
