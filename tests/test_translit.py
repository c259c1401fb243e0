"""Latin-ASCII transliteration chain (functions/translit.py) — the
transliterate.c:669-780 analog: accent stripping + Greek/Cyrillic
romanization folded into canonicalization behind cfg.transliterate."""

import pyarrow as pa
import pytest

from libpostal_ray.config import PipelineConfig
from libpostal_ray.functions.canonicalize import canonicalize_one
from libpostal_ray.functions.translit import latin_ascii, latin_ascii_array
from libpostal_ray.stages.canonicalize import CanonicalizeStage


class TestLatinAscii:
    def test_ascii_identity(self):
        s = "plain ASCII stays byte-identical 123 {}"
        assert latin_ascii(s) is s

    def test_latin_accents(self):
        assert latin_ascii("café") == "cafe"
        assert latin_ascii("naïve résumé") == "naive resume"
        assert latin_ascii("señor São Paulo") == "senor Sao Paulo"
        assert latin_ascii("Müller") == "Muller"

    def test_latin_specials(self):
        assert latin_ascii("straße") == "strasse"
        assert latin_ascii("Ærøskøbing") == "AEroskobing"
        assert latin_ascii("Łódź œuvre") == "Lodz oeuvre"
        assert latin_ascii("Þórr") == "Thorr"

    def test_greek(self):
        assert latin_ascii("αθηνα") == "athina"
        # precomposed accent decomposes, mark drops, base romanizes
        assert latin_ascii("Αθήνα".casefold()) == "athina"
        assert latin_ascii("ψυχή") == "psychi"

    def test_cyrillic(self):
        assert latin_ascii("москва") == "moskva"
        assert latin_ascii("щука") == "shchuka"
        assert latin_ascii("Чехов") == "Chekhov"
        # NFD-first chain: decomposable letters (й ё ї) romanize via their
        # base letter + dropped mark — deterministic, pinned here
        assert latin_ascii("київ") == "kiiv"

    def test_typographic_punctuation(self):
        assert latin_ascii("“smart” — ‘quotes’") == "\"smart\" - 'quotes'"

    def test_unhandled_scripts_pass_through(self):
        assert latin_ascii("日本語 café") == "日本語 cafe"

    def test_array_helper(self):
        out = latin_ascii_array(["café", "ascii", "москва"])
        assert out == ["cafe", "ascii", "moskva"]


class TestCanonicalizeWithTranslit:
    def test_canonicalize_one_gated(self):
        raw = "Café  №5 — Münchner Straße"
        off = canonicalize_one(raw)
        on = canonicalize_one(raw, transliterate=True)
        assert off == "café no5 — münchner strasse"  # NFKC folds №, ß
        assert on == "cafe no5 - munchner strasse"

    def test_stage_forms_collide(self):
        """Two spellings of the same name land on ONE canonical form with
        the chain on — the equivalence the reference's latin-ascii
        transliteration exists to provide."""
        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "content": ["Café Münchner Straße", "cafe munchner strasse"],
            }
        )
        out_off = CanonicalizeStage(PipelineConfig())(tbl)
        assert (
            out_off["canonical"][0].as_py() != out_off["canonical"][1].as_py()
        )
        out_on = CanonicalizeStage(PipelineConfig(transliterate=True))(tbl)
        assert out_on["canonical"][0].as_py() == out_on["canonical"][1].as_py()
        # per-row invariant: sha256 is of the ORIGINAL bytes, so it differs
        assert out_on["sha256"][0].as_py() != out_on["sha256"][1].as_py()

    def test_ascii_buffer_path_unaffected(self):
        """transliterate=True must not change ASCII rows (the buffer fast
        path serves them) — byte-identical output either way."""
        texts = ["  Mixed   CASE\twords ", "plain", ""]
        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "content": texts,
            }
        )
        off = CanonicalizeStage(PipelineConfig())(tbl)["canonical"].to_pylist()
        on = CanonicalizeStage(PipelineConfig(transliterate=True))(tbl)[
            "canonical"
        ].to_pylist()
        assert off == on == ["mixed case words", "plain", ""]

    def test_config_fingerprint_changes(self):
        from libpostal_ray.state.checkpoint import config_fingerprint

        assert config_fingerprint(PipelineConfig()) != config_fingerprint(
            PipelineConfig(transliterate=True)
        )


def test_translit_pair_clusters(ray_session):
    """End-to-end: accented vs ASCII spellings of the same document cluster
    together only with the transliteration chain on."""
    import ray.data

    from libpostal_ray.pipelines.near_dupe import near_dupe_pipeline

    a = "Café Münchner Straße menu déjà vu naïve entrée crêpe señor " * 4
    b = "cafe munchner strasse menu deja vu naive entree crepe senor " * 4
    rows = [(1, a), (2, b), (3, "unrelated filler content body " * 6)]
    corpus = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "repo": ["r"] * 3,
                "path": [f"p{r[0]}" for r in rows],
                "lang": ["txt"] * 3,
                "content": [r[1] for r in rows],
            }
        )
    )
    on = near_dupe_pipeline(corpus, PipelineConfig(transliterate=True))
    lab = on["clusters"].to_pandas().set_index("doc_id")["cluster_id"]
    assert lab.loc[1] == lab.loc[2]

    off = near_dupe_pipeline(corpus, PipelineConfig())
    df_off = off["clusters"].to_pandas()
    same = df_off[df_off.doc_id.isin((1, 2))]["cluster_id"]
    # without the chain the spellings stay apart (absent from any edge, or
    # in different components)
    assert len(same) < 2 or same.nunique() == 2


class TestSession15Scripts:
    """Arabic / Hebrew / Devanagari / Hangul / Kana / Thai romanization —
    per-codepoint deterministic equivalence (pinned, not a linguistic
    standard); Hangul is real Revised Romanization via NFD jamo."""

    def test_hangul_revised_romanization(self):
        assert latin_ascii("한국") == "hanguk"
        assert latin_ascii("서울") == "seoul"
        assert latin_ascii("대한민국") == "daehanminguk"
        # compat jamo (standalone letters) fold to the same values
        assert latin_ascii("ㄱㅏ") == "ga"

    def test_kana_scripts_collide(self):
        assert latin_ascii("とうきょう") == "toukiyou"
        assert latin_ascii("トウキョウ") == "toukiyou"
        # NFD strips voicing marks: voiced/unvoiced kana fold
        assert latin_ascii("がぎぐ") == "kakiku"
        # long-vowel mark drops so both katakana spellings collide
        assert latin_ascii("ラーメン") == latin_ascii("ラメン")

    def test_arabic(self):
        assert latin_ascii("شارع") == "shar"
        assert latin_ascii("محمد") == "mhmd"
        assert latin_ascii("٢٠٢٤") == "2024"
        # Persian extras + extended digits
        assert latin_ascii("پنج") == "pnj"
        assert latin_ascii("۱۲۳") == "123"

    def test_hebrew(self):
        assert latin_ascii("שלום") == "shlvm"
        assert latin_ascii("ירושלים") == "yrvshlym"

    def test_devanagari(self):
        assert latin_ascii("दिल्ली") == "dilli"
        assert latin_ascii("नमस्ते") == "nmste"
        assert latin_ascii("२०२४") == "2024"

    def test_thai(self):
        assert latin_ascii("กรุงเทพ") == "krungethph"
        assert latin_ascii("๒๐๒๔") == "2024"

    def test_kanji_still_passes_through(self):
        # CJK ideographs stay unhandled (shingle layer treats them
        # literally); kana inside mixed text romanizes
        assert latin_ascii("東京タワー") == "東京tawa"
