"""Multi-form expansion — the ``expand_address`` contract (the reference's
flagship API: one input string -> SEVERAL normalized alternative forms,
``expand.c:1453-1553``, alternatives from per-language dictionaries under
``resources/dictionaries/<lang>/*.txt``).

The engine's default canonicalizer deliberately emits ONE deterministic
form (SURVEY §3.1) because MinHash absorbs near-miss variation on long
content.  For SHORT name-like strings that is not enough: "main st" and
"main saint" vs "main street" need the dictionary fan-out.  This module is
that fan-out, bounded and deterministic:

  * an alternatives table maps a surface word to its expansion set
    ("st" -> ("street", "saint")); the IDENTITY form is always kept
    (libpostal likewise returns the unmodified normalized string among its
    expansions), so two strings sharing ANY form intersect;
  * matches are found left-to-right, non-overlapping, longest alternative
    first (same discipline as the trie longest-match in
    ``address_dictionary.h:62-69``);
  * forms are enumerated mixed-radix (leftmost match = slowest digit),
    capped at ``max_forms`` — the reference caps at 100 permutations and
    falls back to fewer (``expand.c:29, 1526-1528``); order is
    deterministic, duplicates removed keeping first occurrence.

Input is assumed canonical (lowercased, whitespace-collapsed) — run
``canonicalize_one`` first; the near-dup stage does.
"""

from __future__ import annotations

import re

import numpy as np

__all__ = [
    "EN_STREET_ALTERNATIVES",
    "EN_NAME_ALTERNATIVES",
    "EN_ALTERNATIVES",
    "compile_alternatives",
    "expand_variants",
    "expansion_key_hashes",
]

# ---------------------------------------------------------------------------
# EN alternative packs (resources/dictionaries/en content model: small,
# plain-word, surface -> expansion set; identity is implicit).  Ambiguous
# entries carry >1 alternative — that IS the reason this is multi-form.
# ---------------------------------------------------------------------------

EN_STREET_ALTERNATIVES: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("st", ("street", "saint")),
    ("ave", ("avenue",)),
    ("av", ("avenue",)),
    ("blvd", ("boulevard",)),
    ("rd", ("road",)),
    ("dr", ("drive", "doctor")),
    ("ln", ("lane",)),
    ("ct", ("court",)),
    ("pl", ("place",)),
    ("sq", ("square",)),
    ("hwy", ("highway",)),
    ("pkwy", ("parkway",)),
    ("mt", ("mount",)),
    ("ft", ("fort",)),
    ("n", ("north",)),
    ("s", ("south",)),
    ("e", ("east",)),
    ("w", ("west",)),
    ("ne", ("northeast",)),
    ("nw", ("northwest",)),
    ("se", ("southeast",)),
    ("sw", ("southwest",)),
)

EN_NAME_ALTERNATIVES: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("jr", ("junior",)),
    ("sr", ("senior",)),
    ("wm", ("william",)),
    ("jos", ("joseph",)),
    ("chas", ("charles",)),
    ("co", ("company", "county")),
    ("corp", ("corporation",)),
    ("inc", ("incorporated",)),
    ("ltd", ("limited",)),
    ("intl", ("international",)),
    ("natl", ("national",)),
    ("dept", ("department",)),
    ("univ", ("university",)),
)

EN_ALTERNATIVES: tuple[tuple[str, tuple[str, ...]], ...] = (
    EN_STREET_ALTERNATIVES + EN_NAME_ALTERNATIVES
)

# per-language alternative packs (ambiguity is the point: "st" is
# saint/sainte in FR, sankt in DE, street/saint in EN)
ES_ALTERNATIVES: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("av", ("avenida",)),
    ("avda", ("avenida",)),
    ("cl", ("calle",)),
    ("pza", ("plaza",)),
    ("sta", ("santa",)),
    ("sto", ("santo",)),
    ("sr", ("señor",)),
    ("sra", ("señora",)),
)

FR_ALTERNATIVES: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("st", ("saint",)),
    ("ste", ("sainte",)),
    ("bd", ("boulevard",)),
    ("av", ("avenue",)),
    ("pl", ("place",)),
    ("fg", ("faubourg",)),
)

DE_ALTERNATIVES: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("str", ("strasse",)),
    ("st", ("sankt",)),
    ("pl", ("platz",)),
    ("nr", ("nummer",)),
)

PT_ALTERNATIVES: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("av", ("avenida",)),
    ("r", ("rua",)),
    ("pca", ("praça",)),
    ("sto", ("santo",)),
    ("sta", ("santa",)),
    ("dr", ("doutor",)),
)

IT_ALTERNATIVES: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("cso", ("corso",)),
    ("vle", ("viale",)),
    ("pza", ("piazza",)),
    # "s" is both san and santa in IT street names — ambiguity preserved
    ("s", ("san", "santa")),
    ("dott", ("dottore",)),
)

NL_ALTERNATIVES: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("str", ("straat",)),
    ("ln", ("laan",)),
    ("st", ("sint",)),
    ("nr", ("nummer",)),
    ("dhr", ("de heer",)),
)

LANG_ALTERNATIVES: dict[str, tuple[tuple[str, tuple[str, ...]], ...]] = {
    "en": EN_ALTERNATIVES,
    "es": ES_ALTERNATIVES,
    "fr": FR_ALTERNATIVES,
    "de": DE_ALTERNATIVES,
    "pt": PT_ALTERNATIVES,
    "it": IT_ALTERNATIVES,
    "nl": NL_ALTERNATIVES,
}


def compile_alternatives(
    table,
) -> tuple["re.Pattern[str]", dict[str, tuple[str, ...]]] | None:
    """One alternation regex over all surface words (longest first — regex
    alternation is first-match) + the lookup dict.  Compiled once per
    worker, like ``compile_rules``."""
    table = list(table or ())
    if not table:
        return None
    mapping = {w: tuple(alts) for w, alts in table}
    alts = sorted(mapping, key=len, reverse=True)
    pat = re.compile(r"\b(?:" + "|".join(re.escape(w) for w in alts) + r")\b")
    return pat, mapping


def expand_variants(
    text: str,
    compiled,
    max_forms: int = 16,
) -> list[str]:
    """All alternative forms of canonical ``text`` under the compiled
    alternatives table, identity form first, deterministic order, capped at
    ``max_forms`` (never silently empty: the identity form always
    survives).  Duplicates (e.g. an alternative equal to the surface form)
    keep their first position."""
    if not text:
        return [text]
    if compiled is None:
        return [text]
    pat, mapping = compiled
    matches = list(pat.finditer(text))
    if not matches:
        return [text]
    # choices per match: identity surface form first, then alternatives —
    # index 0 everywhere reproduces the input, so forms[0] == text
    spans = [(m.start(), m.end()) for m in matches]
    choices = [(m.group(0),) + mapping[m.group(0)] for m in matches]
    forms: list[str] = []
    seen: set[str] = set()
    # mixed-radix enumeration, leftmost match = slowest digit; stop at cap
    # (counts enumerated combinations, so the cap bounds WORK, not just
    # unique output — the reference's excessive-permutations guard,
    # expand.c:1526-1528)
    radices = [len(c) for c in choices]
    digits = [0] * len(choices)
    produced = 0
    while produced < max_forms:
        parts: list[str] = []
        prev = 0
        for (s, e), c, d in zip(spans, choices, digits):
            parts.append(text[prev:s])
            parts.append(c[d])
            prev = e
        parts.append(text[prev:])
        form = "".join(parts)
        if form not in seen:
            seen.add(form)
            forms.append(form)
        produced += 1
        # increment rightmost digit (odometer)
        i = len(digits) - 1
        while i >= 0:
            digits[i] += 1
            if digits[i] < radices[i]:
                break
            digits[i] = 0
            i -= 1
        if i < 0:
            break
    return forms


_EXP_SALT = np.uint64(0x9E3779B97F4A7C15)


def expansion_key_hashes(
    forms: list[str],
) -> np.ndarray:
    """int64 blocking keys for expansion forms: FNV-1a over the UTF-8
    bytes, salt-mixed into the expansion key family's own space (disjoint
    from MinHash band / SimHash chunk / phonetic keys whp), masked to 63
    bits (engine-wide non-negative-int64 key constraint).  0 is reserved
    for "none" — hash 0 remaps to 1."""
    out = np.empty(len(forms), dtype=np.int64)
    for i, f in enumerate(forms):
        h = np.uint64(0xCBF29CE484222325)
        for b in f.encode("utf-8"):
            h = np.uint64((int(h) ^ b) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
        h = np.uint64(int(h) * int(_EXP_SALT) & 0xFFFFFFFFFFFFFFFF)
        v = int(h) & 0x7FFFFFFFFFFFFFFF
        out[i] = v if v else 1
    return out
