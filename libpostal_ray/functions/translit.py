"""Latin-ASCII transliteration — the `transliterate.c` chain analog.

The reference ships ICU-derived transliteration rule chains (
``latin-ascii``, ``greek-latin``, ``cyrillic-latin`` …) applied during
normalization (transliterate.c:669-780, normalize.c:24-110) so that
"café" ≡ "cafe", "Αθήνα" ≡ "athina", "Москва" ≡ "moskva" land on one
canonical form.  Here the same chain is ONE codepoint→replacement table
applied after NFD decomposition:

  1. NFD: precomposed letters split into base + combining marks
     ("é" → "e" + U+0301), for Latin, Greek AND Cyrillic alike.
  2. translate(): combining marks drop to "", Greek/Cyrillic base letters
     map to deterministic romanizations, Latin specials fold (ß→ss, æ→ae,
     ø→o, đ→d, þ→th, ł→l, …).

The table is a plain ``str.translate`` dict built once per process —
the worker-side setup-singleton pattern (libpostal.c:289-334).  The map is
identity on ASCII, so the Arrow-buffer ASCII fast path in
``CanonicalizeStage`` stays valid when transliteration is enabled: only
the (detected-vectorized) non-ASCII rows pay the per-row path.

This is a deterministic romanization for canonicalization equivalence —
NOT a linguistic standard (the reference's ICU chains aren't either once
chained with lowercase+ascii folding); what matters for dedup is that two
spellings of the same word collide, and tests pin the exact outputs.
"""

from __future__ import annotations

import sys
import unicodedata

# -- base tables (lowercase; uppercase is derived) --------------------------

_GREEK = {
    "α": "a", "β": "b", "γ": "g", "δ": "d", "ε": "e", "ζ": "z",
    "η": "i", "θ": "th", "ι": "i", "κ": "k", "λ": "l", "μ": "m",
    "ν": "n", "ξ": "x", "ο": "o", "π": "p", "ρ": "r", "σ": "s",
    "ς": "s", "τ": "t", "υ": "y", "φ": "f", "χ": "ch", "ψ": "ps",
    "ω": "o",
}

_CYRILLIC = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e",
    "ж": "zh", "з": "z", "и": "i", "й": "i", "к": "k", "л": "l",
    "м": "m", "н": "n", "о": "o", "п": "p", "р": "r", "с": "s",
    "т": "t", "у": "u", "ф": "f", "х": "kh", "ц": "ts", "ч": "ch",
    "ш": "sh", "щ": "shch", "ъ": "", "ы": "y", "ь": "", "э": "e",
    "ю": "yu", "я": "ya", "ё": "e",
    # Ukrainian / Belarusian extras
    "є": "ye", "і": "i", "ї": "yi", "ґ": "g", "ў": "u",
    # Serbian / Macedonian extras (BGN/PCGN-style)
    "ђ": "dj", "ћ": "c", "џ": "dz", "љ": "lj", "њ": "nj", "ј": "j",
    "ѓ": "gj", "ќ": "kj", "ѕ": "dz",
    # Kazakh / Central-Asian Cyrillic extras
    "ә": "a", "ғ": "gh", "қ": "q", "ң": "ng", "ө": "o",
    "ұ": "u", "ү": "u", "һ": "h",
}

# Armenian is CASED (Ա/ա) — goes through the uppercase-deriving loop
# like Greek/Cyrillic ("և" uppercases to the 2-char ԵՎ, which the
# len == 1 guard skips; NFKC upstream decomposes it to եւ anyway)
_ARMENIAN = {
    "ա": "a", "բ": "b", "գ": "g", "դ": "d", "ե": "e", "զ": "z",
    "է": "e", "ը": "e", "թ": "t", "ժ": "zh", "ի": "i", "լ": "l",
    "խ": "kh", "ծ": "ts", "կ": "k", "հ": "h", "ձ": "dz", "ղ": "gh",
    "ճ": "ch", "մ": "m", "յ": "y", "ն": "n", "շ": "sh", "ո": "o",
    "չ": "ch", "պ": "p", "ջ": "j", "ռ": "r", "ս": "s", "վ": "v",
    "տ": "t", "ր": "r", "ց": "ts", "ւ": "w", "փ": "p", "ք": "k",
    "օ": "o", "ֆ": "f", "և": "ev", "՞": "?", "՝": ",", "։": ".",
}

# Georgian Mkhedruli — effectively caseless in canonicalized text
# (NFKC+casefold upstream folds Mtavruli U+1C90… back to Mkhedruli)
_GEORGIAN = {
    "ა": "a", "ბ": "b", "გ": "g", "დ": "d", "ე": "e", "ვ": "v",
    "ზ": "z", "თ": "t", "ი": "i", "კ": "k", "ლ": "l", "მ": "m",
    "ნ": "n", "ო": "o", "პ": "p", "ჟ": "zh", "რ": "r", "ს": "s",
    "ტ": "t", "უ": "u", "ფ": "p", "ქ": "k", "ღ": "gh", "ყ": "q",
    "შ": "sh", "ჩ": "ch", "ც": "ts", "ძ": "dz", "წ": "ts",
    "ჭ": "ch", "ხ": "kh", "ჯ": "j", "ჰ": "h",
}

# -- caseless scripts (transliterate.c ships arabic-latin, hebrew-latin,
# devanagari-latin, hangul-latin, katakana-latin … chains; same posture
# here: per-codepoint deterministic romanization for canonicalization
# equivalence, NOT a linguistic standard — two spellings of one word must
# collide, tests pin the exact outputs) ------------------------------------

_ARABIC = {
    # base letters (precomposed hamza forms آأإؤئ decompose under NFD to
    # base + Mn mark, which drops — entries included for completeness)
    "ء": "", "آ": "a", "أ": "a", "ؤ": "w", "إ": "i", "ئ": "y",
    "ا": "a", "ب": "b", "ة": "h", "ت": "t", "ث": "th", "ج": "j",
    "ح": "h", "خ": "kh", "د": "d", "ذ": "dh", "ر": "r", "ز": "z",
    "س": "s", "ش": "sh", "ص": "s", "ض": "d", "ط": "t", "ظ": "z",
    "ع": "", "غ": "gh", "ف": "f", "ق": "q", "ك": "k", "ل": "l",
    "م": "m", "ن": "n", "ه": "h", "و": "w", "ى": "a", "ي": "y",
    # Persian / Urdu extras
    "پ": "p", "چ": "ch", "ژ": "zh", "گ": "g", "ک": "k", "ی": "y",
    "ے": "e", "ہ": "h", "ٹ": "t", "ڈ": "d", "ڑ": "r", "ں": "n",
    "ـ": "",  # tatweel
    # Arabic-Indic and extended (Persian) digits
    "٠": "0", "١": "1", "٢": "2", "٣": "3", "٤": "4", "٥": "5",
    "٦": "6", "٧": "7", "٨": "8", "٩": "9",
    "۰": "0", "۱": "1", "۲": "2", "۳": "3", "۴": "4", "۵": "5",
    "۶": "6", "۷": "7", "۸": "8", "۹": "9",
    "،": ",", "؛": ";", "؟": "?",
}

_HEBREW = {
    "א": "", "ב": "b", "ג": "g", "ד": "d", "ה": "h", "ו": "v",
    "ז": "z", "ח": "ch", "ט": "t", "י": "y", "כ": "k", "ך": "k",
    "ל": "l", "מ": "m", "ם": "m", "נ": "n", "ן": "n", "ס": "s",
    "ע": "", "פ": "p", "ף": "p", "צ": "ts", "ץ": "ts", "ק": "k",
    "ר": "r", "ש": "sh", "ת": "t",
    "׳": "'", "״": '"', "־": "-",
}

_DEVANAGARI = {
    # independent vowels
    "अ": "a", "आ": "a", "इ": "i", "ई": "i", "उ": "u", "ऊ": "u",
    "ऋ": "ri", "ए": "e", "ऐ": "ai", "ओ": "o", "औ": "au",
    "ऍ": "e", "ऑ": "o",
    # consonants — per-codepoint (no inherent vowel; "दिल्ली" → "dilli")
    "क": "k", "ख": "kh", "ग": "g", "घ": "gh", "ङ": "n",
    "च": "ch", "छ": "chh", "ज": "j", "झ": "jh", "ञ": "n",
    "ट": "t", "ठ": "th", "ड": "d", "ढ": "dh", "ण": "n",
    "त": "t", "थ": "th", "द": "d", "ध": "dh", "न": "n",
    "प": "p", "फ": "ph", "ब": "b", "भ": "bh", "म": "m",
    "य": "y", "र": "r", "ल": "l", "व": "v",
    "श": "sh", "ष": "sh", "स": "s", "ह": "h", "ळ": "l",
    # dependent vowel signs (matras; category Mc — no blanket Mn drop)
    "ा": "a", "ि": "i", "ी": "i", "ु": "u", "ू": "u", "ृ": "ri",
    "े": "e", "ै": "ai", "ो": "o", "ौ": "au", "ॉ": "o", "ॅ": "e",
    # signs: virama joins conjuncts, anusvara/candrabindu nasalize,
    # visarga aspirates, avagraha drops, nukta (Mn) drops
    "्": "", "ं": "n", "ँ": "n", "ः": "h", "ऽ": "", "़": "",
    "।": ".", "॥": ".",
    "०": "0", "१": "1", "२": "2", "३": "3", "४": "4",
    "५": "5", "६": "6", "७": "7", "८": "8", "९": "9",
}

# Hangul: NFD decomposes every syllable into conjoining jamo
# (U+1100 leads / U+1161 vowels / U+11A8 tails), so Revised-Romanization
# per-jamo values give real romanization with positional consonants
# ("한국" → "hanguk", "서울" → "seoul").
_HANGUL_LEAD = dict(zip(
    [chr(c) for c in range(0x1100, 0x1113)],
    ["g", "kk", "n", "d", "tt", "r", "m", "b", "pp", "s", "ss",
     "", "j", "jj", "ch", "k", "t", "p", "h"],
))
_HANGUL_VOWEL = dict(zip(
    [chr(c) for c in range(0x1161, 0x1176)],
    ["a", "ae", "ya", "yae", "eo", "e", "yeo", "ye", "o", "wa",
     "wae", "oe", "yo", "u", "wo", "we", "wi", "yu", "eu", "ui", "i"],
))
_HANGUL_TAIL = dict(zip(
    [chr(c) for c in range(0x11A8, 0x11C3)],
    ["k", "k", "k", "n", "n", "n", "t", "l", "k", "m", "p", "t",
     "t", "p", "l", "m", "p", "p", "t", "t", "ng", "t", "t", "k",
     "t", "p", "t"],
))
# compatibility jamo (standalone ㄱㄴㄷ… / ㅏㅑㅓ…) fold to the same values
_HANGUL_COMPAT = dict(zip(
    [chr(c) for c in range(0x3131, 0x3164)],
    # 30 consonants ㄱ..ㅎ (clusters fold to their dominant letter)
    ["g", "kk", "k", "n", "n", "n", "d", "tt", "r", "k", "m", "p",
     "t", "t", "p", "l", "m", "b", "pp", "p", "s", "ss", "", "j",
     "jj", "ch", "k", "t", "p", "h",
     # 21 vowels ㅏ..ㅣ
     "a", "ae", "ya", "yae", "eo", "e", "yeo", "ye", "o", "wa",
     "wae", "oe", "yo", "u", "wo", "we", "wi", "yu", "eu", "ui", "i"],
))

# Kana: hiragana table; katakana derives by the fixed +0x60 codepoint
# offset so both scripts land on ONE romaji form ("トウキョウ" ≡
# "とうきょう").  Per-codepoint means small kana romanize standalone
# ("きょ" → "kiyo") and NFD strips the voicing marks (U+3099/309A) so
# voiced/unvoiced pairs fold (が ≡ か) — deterministic equivalence,
# pinned in tests, not Hepburn.
_HIRAGANA = dict(zip(
    [chr(c) for c in range(0x3041, 0x3097)],
    ["a", "a", "i", "i", "u", "u", "e", "e", "o", "o",
     "ka", "ga", "ki", "gi", "ku", "gu", "ke", "ge", "ko", "go",
     "sa", "za", "shi", "ji", "su", "zu", "se", "ze", "so", "zo",
     "ta", "da", "chi", "ji", "tsu", "tsu", "zu", "te", "de", "to",
     "do",
     "na", "ni", "nu", "ne", "no",
     "ha", "ba", "pa", "hi", "bi", "pi", "fu", "bu", "pu", "he",
     "be", "pe", "ho", "bo", "po",
     "ma", "mi", "mu", "me", "mo",
     "ya", "ya", "yu", "yu", "yo", "yo",
     "ra", "ri", "ru", "re", "ro",
     "wa", "wa", "wi", "we", "wo", "n", "vu", "ka", "ke"],
))

_THAI = {
    "ก": "k", "ข": "kh", "ฃ": "kh", "ค": "kh", "ฅ": "kh", "ฆ": "kh",
    "ง": "ng", "จ": "ch", "ฉ": "ch", "ช": "ch", "ซ": "s", "ฌ": "ch",
    "ญ": "y", "ฎ": "d", "ฏ": "t", "ฐ": "th", "ฑ": "th", "ฒ": "th",
    "ณ": "n", "ด": "d", "ต": "t", "ถ": "th", "ท": "th", "ธ": "th",
    "น": "n", "บ": "b", "ป": "p", "ผ": "ph", "ฝ": "f", "พ": "ph",
    "ฟ": "f", "ภ": "ph", "ม": "m", "ย": "y", "ร": "r", "ฤ": "rue",
    "ล": "l", "ฦ": "lue", "ว": "w", "ศ": "s", "ษ": "s", "ส": "s",
    "ห": "h", "ฬ": "l", "อ": "", "ฮ": "h",
    # vowels (explicit — several are category Mn but carry vowel value,
    # so no blanket Mn drop over the Thai block)
    "ะ": "a", "ั": "a", "า": "a", "ำ": "am", "ิ": "i", "ี": "i",
    "ึ": "ue", "ื": "ue", "ุ": "u", "ู": "u", "เ": "e", "แ": "ae",
    "โ": "o", "ใ": "ai", "ไ": "ai", "ๅ": "", "็": "", "ฺ": "",
    # tone marks / thanthakhat / repetition drop
    "่": "", "้": "", "๊": "", "๋": "", "์": "", "ๆ": "", "฿": "",
    "๐": "0", "๑": "1", "๒": "2", "๓": "3", "๔": "4",
    "๕": "5", "๖": "6", "๗": "7", "๘": "8", "๙": "9",
}

_LATIN_SPECIAL = {
    "ß": "ss", "æ": "ae", "œ": "oe", "ø": "o", "đ": "d", "ð": "d",
    "þ": "th", "ł": "l", "ŋ": "ng", "ħ": "h", "ı": "i", "ĳ": "ij",
    "ſ": "s", "ƒ": "f", "Þ": "Th", "Ð": "D", "Đ": "D", "Ł": "L",
    "Æ": "AE", "Œ": "OE", "Ø": "O",
}

_PUNCT_FOLD = {
    # curly quotes / dashes the reference's latin-ascii chain folds too
    "‘": "'", "’": "'", "“": '"', "”": '"',
    "–": "-", "—": "-", "«": '"', "»": '"',
    " ": " ",
    # kana voicing marks (NFD splits が → か + U+3099; the mark drops so
    # voiced/unvoiced kana fold) and iteration / long-vowel / middle-dot marks
    "゙": "", "゚": "", "ー": "", "ゝ": "", "ゞ": "",
    "ヽ": "", "ヾ": "", "・": " ",
}


def _build_map() -> dict[int, str]:
    m: dict[int, str] = {}
    # combining marks (Mn) drop: the NFD-decomposed accents.  BMP ranges that
    # cover Latin/Greek/Cyrillic combining marks; scanned by category so new
    # Unicode versions stay correct.
    for lo, hi in ((0x0300, 0x036F), (0x0483, 0x0489), (0x1AB0, 0x1AFF),
                   (0x1DC0, 0x1DFF), (0x20D0, 0x20FF), (0xFE20, 0xFE2F),
                   # Hebrew niqqud/cantillation, Arabic harakat (incl. the
                   # hamza marks NFD splits off آأإ), Syriac-adjacent Arabic
                   # extras — explicit-table entries below override where a
                   # mark carries letter value
                   (0x0591, 0x05C7), (0x0610, 0x061A), (0x064B, 0x065F),
                   (0x0670, 0x0670), (0x06D6, 0x06ED)):
        for cp in range(lo, hi + 1):
            if unicodedata.category(chr(cp)) == "Mn":
                m[cp] = ""
    for table in (_GREEK, _CYRILLIC, _ARMENIAN):
        for ch, rep in table.items():
            m[ord(ch)] = rep
            up = ch.upper()
            if up != ch and len(up) == 1:
                # title-case the replacement ("Ч" -> "Ch") like ICU's chains
                m[ord(up)] = rep[:1].upper() + rep[1:]
    # caseless scripts: plain entries (katakana derives from hiragana by
    # the fixed +0x60 block offset so both map to one romaji form)
    for table in (_ARABIC, _HEBREW, _DEVANAGARI, _HANGUL_LEAD,
                  _HANGUL_VOWEL, _HANGUL_TAIL, _HANGUL_COMPAT, _THAI,
                  _GEORGIAN):
        for ch, rep in table.items():
            m[ord(ch)] = rep
    for ch, rep in _HIRAGANA.items():
        m[ord(ch)] = rep
        m[ord(ch) + 0x60] = rep
    for ch, rep in {**_LATIN_SPECIAL, **_PUNCT_FOLD}.items():
        m[ord(ch)] = rep
    return m


_MAP: dict[int, str] | None = None


def translit_map() -> dict[int, str]:
    global _MAP
    if _MAP is None:
        _MAP = _build_map()
    return _MAP


def latin_ascii(text: str) -> str:
    """Transliterate one string toward ASCII (identity on ASCII input).

    NFD + translate covers: Latin diacritics (é→e, ñ→n, ü→u), Greek,
    Cyrillic, Arabic (+ Persian/Urdu extras), Hebrew, Devanagari, Hangul
    (real RR via NFD jamo), kana and Thai romanization, digit folding
    (٢٠٢٤/२०२४/๒๐๒๔ → 2024), Latin specials and typographic punctuation.
    Codepoints with no rule (CJK ideographs, emoji, …) pass through
    unchanged — the reference likewise leaves unhandled scripts alone and
    lets the shingle/MinHash layer treat them literally.
    """
    if text.isascii():
        return text
    return unicodedata.normalize("NFD", text).translate(translit_map())


def latin_ascii_array(texts) -> list[str]:
    """Row loop over Python strs — used only on detected non-ASCII rows
    (the ASCII fast path never reaches here)."""
    m = translit_map()
    nfd = unicodedata.normalize
    return [
        t if t.isascii() else nfd("NFD", t).translate(m)
        for t in texts
    ]


def ascii_share(text: str) -> float:
    if not text:
        return 1.0
    return sum(c.isascii() for c in text) / len(text)


if __name__ == "__main__":  # tiny smoke aid, not a CLI
    for s in sys.argv[1:]:
        print(latin_ascii(s))
