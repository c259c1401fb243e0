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
}


def _build_map() -> dict[int, str]:
    m: dict[int, str] = {}
    # combining marks (Mn) drop: the NFD-decomposed accents.  BMP ranges that
    # cover Latin/Greek/Cyrillic combining marks; scanned by category so new
    # Unicode versions stay correct.
    for lo, hi in ((0x0300, 0x036F), (0x0483, 0x0489), (0x1AB0, 0x1AFF),
                   (0x1DC0, 0x1DFF), (0x20D0, 0x20FF), (0xFE20, 0xFE2F)):
        for cp in range(lo, hi + 1):
            if unicodedata.category(chr(cp)) == "Mn":
                m[cp] = ""
    for table in (_GREEK, _CYRILLIC):
        for ch, rep in table.items():
            m[ord(ch)] = rep
            up = ch.upper()
            if up != ch and len(up) == 1:
                # title-case the replacement ("Ч" -> "Ch") like ICU's chains
                m[ord(up)] = rep[:1].upper() + rep[1:]
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

    NFD + translate covers: Latin diacritics (é→e, ñ→n, ü→u), Greek and
    Cyrillic romanization, Latin specials and typographic punctuation.
    Codepoints with no rule (CJK, emoji, …) pass through unchanged — the
    reference likewise leaves unhandled scripts alone and lets the
    shingle/MinHash layer treat them literally.
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
