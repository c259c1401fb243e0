"""Phonetic blocking keys for short name-like rows.

Plays the role of the reference's double-metaphone key family
(double_metaphone.c:55-980, consumed by name_word_hashes at
near_dupe.c:283-315): sound-alike short strings ("SMITH"/"SMYTHE") that no
textual sketch catches become LSH candidates via a shared phonetic code.

The encoding here is the classic Soundex class map (a textbook algorithm;
NOT a port of the reference's metaphone implementation) applied per token,
with the row key built from the SORTED token codes so word order doesn't
break the collision.  Config-gated (``PipelineConfig.phonetic_keys``) and
emitted only for short rows — long content is covered by MinHash.
"""

from __future__ import annotations

import numpy as np

_SOUNDEX = {}
for _cls, _letters in (
    ("1", "BFPV"),
    ("2", "CGJKQSXZ"),
    ("3", "DT"),
    ("4", "L"),
    ("5", "MN"),
    ("6", "R"),
):
    for _ch in _letters:
        _SOUNDEX[_ch] = _cls

_PHONETIC_SALT = np.uint64(0x9E3779B97F4A7C15)


def soundex_token(tok: str) -> str:
    """Standard Soundex of one token: first letter + up to 3 class digits;
    same-class letters separated by H/W code once, separated by a vowel code
    twice; empty string if the token has no ASCII letters."""
    letters = [c for c in tok.upper() if "A" <= c <= "Z"]
    if not letters:
        return ""
    first = letters[0]
    out = [first]
    prev_code = _SOUNDEX.get(first, "")
    for c in letters[1:]:
        code = _SOUNDEX.get(c, "")
        if code:
            if code != prev_code:
                out.append(code)
            prev_code = code
        elif c in "HW":
            pass  # H/W do not reset the previous class
        else:
            prev_code = ""  # vowel separates duplicate classes
        if len(out) == 4:
            break
    return "".join(out).ljust(4, "0")


def phonetic_row_code(text: str) -> int:
    """Order-free 63-bit phonetic code of a short row: FNV-1a over the
    sorted per-token Soundex codes.  0 = no letters (no key emitted)."""
    codes = sorted({soundex_token(t) for t in (text or "").split()} - {""})
    if not codes:
        return 0
    h = np.uint64(0xCBF29CE484222325)
    with np.errstate(over="ignore"):
        for code in codes:
            for b in code.encode():
                h = (h ^ np.uint64(b)) * np.uint64(0x100000001B3)
        h = (h * _PHONETIC_SALT) & np.uint64(0x7FFFFFFFFFFFFFFF)
    return int(h) or 1


def phonetic_codes(texts: list[str]) -> np.ndarray:
    """(n,) int64 row codes (Python loop — callers pass SHORT rows only)."""
    return np.array([phonetic_row_code(t) for t in texts], dtype=np.int64)
