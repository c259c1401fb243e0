"""Phonetic blocking keys for short name-like rows.

Plays the role of the reference's double-metaphone key family
(double_metaphone.c:55-980, consumed by name_word_hashes at
near_dupe.c:283-315): sound-alike short strings ("SMITH"/"SMYTHE") that no
textual sketch catches become LSH candidates via a shared phonetic code.

Two encodings, selected by ``PipelineConfig.phonetic_algo``:

- ``"double_metaphone"`` (default): primary + secondary Double Metaphone
  codes per Philips' published algorithm (C/C++ Users Journal, June 2000 —
  a public-domain rule set reimplemented here from the published spec, NOT
  a port of the reference's double_metaphone.c).  The secondary code is
  what distinguishes it from every single-code scheme: "SMITH" encodes to
  (SM0, XMT) and "SCHMIDT" to (XMT, SMT), so the classic cross-language
  pair collides via primary-vs-secondary — rows emit a band key per
  distinct row code and verification matches ANY primary/secondary combo.
- ``"soundex"``: the classic Soundex class map — cheaper, coarser.

Row keys are built from the SORTED per-token codes so word order doesn't
break the collision.  Config-gated (``PipelineConfig.phonetic_keys``) and
emitted only for short rows — long content is covered by MinHash.
"""

from __future__ import annotations

import unicodedata

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


# --------------------------------------------------------- double metaphone
_DM_VOWELS = "AEIOUY"


def _slavo_germanic(s: str) -> bool:
    return "W" in s or "K" in s or "CZ" in s or "WITZ" in s


def double_metaphone(word: str, maxlen: int = 4) -> tuple[str, str]:
    """(primary, secondary) Double Metaphone codes of ONE token.

    Implements the published rule set (Philips 2000); '0' stands for the
    'th' sound as in the original.  Input is NFKD-folded and stripped to
    A-Z, so accented forms share codes with their base letters.  The
    multi-word prefixes of the published spec ('VAN ', 'SAN ') never match
    because callers encode per whitespace token (documented trade-off).
    Returns ('', '') for tokens without letters; secondary == primary when
    no alternate-pronunciation rule fired.
    """
    s = "".join(
        c
        for c in unicodedata.normalize("NFKD", (word or "").upper())
        if "A" <= c <= "Z"
    )
    if not s:
        return "", ""
    last = len(s) - 1
    # pad like the published algorithm: out-of-range lookups read ' ', which
    # drives the end-of-word branches ('CH' germanic when next-next is ' ')
    p = s + "      "
    sg = _slavo_germanic(s)
    pri: list[str] = []
    sec: list[str] = []

    def add(a: str, b: str | None = None) -> None:
        pri.append(a)
        sec.append(a if b is None else b)

    def sat(start: int, *subs: str) -> bool:
        if start < 0:
            return False
        return any(p[start : start + len(x)] == x for x in subs)

    cur = 0
    if s[:2] in ("GN", "KN", "PN", "WR", "PS"):
        cur = 1  # silent first letter
    if s[0] == "X":
        add("S")  # Xavier
        cur = 1

    while cur <= last and (
        sum(map(len, pri)) < maxlen or sum(map(len, sec)) < maxlen
    ):
        c = p[cur]
        if c in _DM_VOWELS:
            if cur == 0:
                add("A")
            cur += 1
        elif c == "B":
            add("P")
            cur += 2 if p[cur + 1] == "B" else 1
        elif c == "C":
            # germanic '-ACH-' (macher) but not 'chemistry' contexts
            if (
                cur > 1
                and p[cur - 2] not in _DM_VOWELS
                and sat(cur - 1, "ACH")
                and p[cur + 2] != "I"
                and (p[cur + 2] != "E" or sat(cur - 2, "BACHER", "MACHER"))
            ):
                add("K")
                cur += 2
            elif cur == 0 and sat(cur, "CAESAR"):
                add("S")
                cur += 2
            elif sat(cur, "CHIA"):  # italian: chianti
                add("K")
                cur += 2
            elif sat(cur, "CH"):
                if cur > 0 and sat(cur, "CHAE"):  # michael
                    add("K", "X")
                elif (
                    cur == 0
                    and (
                        sat(cur + 1, "HARAC", "HARIS")
                        or sat(cur + 1, "HOR", "HYM", "HIA", "HEM")
                    )
                    and not sat(0, "CHORE")
                ):
                    add("K")  # greek roots: chorus, chemistry
                elif (
                    sat(0, "VAN ", "VON ")
                    or sat(0, "SCH")
                    or sat(cur - 2, "ORCHES", "ARCHIT", "ORCHID")
                    or p[cur + 2] in "TS"
                    or (
                        (cur == 0 or p[cur - 1] in "AOUE")
                        and (p[cur + 2] in "LRNMBHFVW " or cur + 2 > last)
                    )
                ):
                    add("K")  # germanic/'architect' contexts
                elif cur > 0:
                    if sat(0, "MC"):
                        add("K")  # McHugh
                    else:
                        add("X", "K")
                else:
                    add("X")
                cur += 2
            elif sat(cur, "CZ") and not sat(cur - 2, "WICZ"):
                add("S", "X")  # czerny
                cur += 2
            elif sat(cur + 1, "CIA"):  # focaccia
                add("X")
                cur += 3
            elif sat(cur, "CC") and not (cur == 1 and s[0] == "M"):
                if p[cur + 2] in "IEH" and not sat(cur + 2, "HU"):
                    if (cur == 1 and p[cur - 1] == "A") or sat(
                        cur - 1, "UCCEE", "UCCES"
                    ):
                        add("KS")  # accident, succeed
                    else:
                        add("X")  # bacci, bertucci
                    cur += 3
                else:
                    add("K")  # pierce's rule
                    cur += 2
            elif sat(cur, "CK", "CG", "CQ"):
                add("K")
                cur += 2
            elif sat(cur, "CI", "CE", "CY"):
                if sat(cur, "CIO", "CIE", "CIA"):
                    add("S", "X")  # italian vs english
                else:
                    add("S")
                cur += 2
            else:
                add("K")
                if sat(cur + 1, " C", " Q", " G"):  # mac caffrey
                    cur += 3
                elif p[cur + 1] in "CKQ" and not sat(cur + 1, "CE", "CI"):
                    cur += 2
                else:
                    cur += 1
        elif c == "D":
            if sat(cur, "DG"):
                if p[cur + 2] in "IEY":
                    add("J")  # edge
                    cur += 3
                else:
                    add("TK")  # edgar
                    cur += 2
            elif sat(cur, "DT", "DD"):
                add("T")
                cur += 2
            else:
                add("T")
                cur += 1
        elif c == "F":
            add("F")
            cur += 2 if p[cur + 1] == "F" else 1
        elif c == "G":
            if p[cur + 1] == "H":
                if cur > 0 and p[cur - 1] not in _DM_VOWELS:
                    add("K")
                elif cur == 0:
                    add("J" if p[cur + 2] == "I" else "K")  # ghislane / ghosts
                elif (
                    (cur > 1 and p[cur - 2] in "BHD")
                    or (cur > 2 and p[cur - 3] in "BHD")
                    or (cur > 3 and p[cur - 4] in "BH")
                ):
                    pass  # silent: hugh, bough, brought
                elif cur > 2 and p[cur - 1] == "U" and p[cur - 3] in "CGLRT":
                    add("F")  # laugh, cough
                elif cur > 0 and p[cur - 1] != "I":
                    add("K")
                cur += 2
            elif p[cur + 1] == "N":
                if cur == 1 and p[0] in _DM_VOWELS and not sg:
                    add("KN", "N")
                elif not sat(cur + 2, "EY") and p[cur + 1] != "Y" and not sg:
                    add("N", "KN")  # tagliaro-family alternates
                else:
                    add("KN")
                cur += 2
            elif sat(cur + 1, "LI") and not sg:
                add("KL", "L")  # tagliaro
                cur += 2
            elif cur == 0 and (
                p[cur + 1] == "Y"
                or sat(
                    cur + 1,
                    "ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE",
                    "EI", "ER",
                )
            ):
                add("K", "J")  # initial ges-/gy-
                cur += 2
            elif (
                (sat(cur + 1, "ER") or p[cur + 1] == "Y")
                and not sat(0, "DANGER", "RANGER", "MANGER")
                and p[cur - 1] not in "EI"
                and not sat(cur - 1, "RGY", "OGY")
            ):
                add("K", "J")  # -ger-, -gy-
                cur += 2
            elif p[cur + 1] in "EIY" or sat(cur - 1, "AGGI", "OGGI"):
                if sat(0, "VAN ", "VON ") or sat(0, "SCH") or sat(cur + 1, "ET"):
                    add("K")  # germanic
                elif sat(cur + 1, "IER "):
                    add("J")  # -gier (word-final, via the space pad)
                else:
                    add("J", "K")
                cur += 2
            else:
                add("K")
                cur += 2 if p[cur + 1] == "G" else 1
        elif c == "H":
            if (cur == 0 or p[cur - 1] in _DM_VOWELS) and p[cur + 1] in _DM_VOWELS:
                add("H")  # only voiced between vowels / initial
                cur += 2
            else:
                cur += 1
        elif c == "J":
            if sat(cur, "JOSE") or sat(0, "SAN "):
                if (cur == 0 and p[cur + 4] == " ") or sat(0, "SAN "):
                    add("H")  # jose, san jacinto
                else:
                    add("J", "H")  # joseph
                cur += 1
            else:
                if cur == 0:
                    add("J", "A")  # yankelovich/jankelowicz
                elif (
                    p[cur - 1] in _DM_VOWELS and not sg and p[cur + 1] in "AO"
                ):
                    add("J", "H")
                elif cur == last:
                    add("J", "")
                elif p[cur + 1] not in "LTKSNMBZ" and p[cur - 1] not in "SKL":
                    add("J")
                cur += 2 if p[cur + 1] == "J" else 1
        elif c == "K":
            add("K")
            cur += 2 if p[cur + 1] == "K" else 1
        elif c == "L":
            if p[cur + 1] == "L":
                if (cur == last - 2 and sat(cur - 1, "ILLO", "ILLA", "ALLE")) or (
                    (sat(last - 1, "AS", "OS") or p[last] in "AO")
                    and sat(cur - 1, "ALLE")
                ):
                    add("L", "")  # spanish: cabrillo, gallegos
                else:
                    add("L")
                cur += 2
            else:
                add("L")
                cur += 1
        elif c == "M":
            add("M")
            if (
                sat(cur - 1, "UMB") and (cur + 1 == last or sat(cur + 2, "ER"))
            ) or p[cur + 1] == "M":
                cur += 2  # dumb, thumb
            else:
                cur += 1
        elif c == "N":
            add("N")
            cur += 2 if p[cur + 1] == "N" else 1
        elif c == "P":
            if p[cur + 1] == "H":
                add("F")
                cur += 2
            else:
                add("P")
                cur += 2 if p[cur + 1] in "PB" else 1
        elif c == "Q":
            add("K")
            cur += 2 if p[cur + 1] == "Q" else 1
        elif c == "R":
            if (
                cur == last
                and not sg
                and sat(cur - 2, "IE")
                and not sat(cur - 4, "ME", "MA")
            ):
                add("", "R")  # french final -ier
            else:
                add("R")
            cur += 2 if p[cur + 1] == "R" else 1
        elif c == "S":
            if sat(cur - 1, "ISL", "YSL"):
                cur += 1  # silent: island, isle
            elif cur == 0 and sat(cur, "SUGAR"):
                add("X", "S")
                cur += 1
            elif sat(cur, "SH"):
                if sat(cur + 1, "HEIM", "HOEK", "HOLM", "HOLZ"):
                    add("S")  # germanic
                else:
                    add("X")
                cur += 2
            elif sat(cur, "SIO", "SIA") or sat(cur, "SIAN"):
                add("S", "X" if not sg else "S")
                cur += 3
            elif (cur == 0 and p[1] in "MNLW") or p[cur + 1] == "Z":
                add("S", "X")  # german/anglicization: smith vs schmidt
                cur += 2 if p[cur + 1] == "Z" else 1
            elif sat(cur, "SC"):
                if p[cur + 2] == "H":
                    if sat(cur + 3, "OO", "ER", "EN", "UY", "ED", "EM"):
                        if sat(cur + 3, "ER", "EN"):
                            add("X", "SK")  # schermerhorn, schenker
                        else:
                            add("SK")  # school, schooner
                    elif cur == 0 and p[3] not in _DM_VOWELS and p[3] != "W":
                        add("X", "S")
                    else:
                        add("X")
                    cur += 3
                elif p[cur + 2] in "IEY":
                    add("S")
                    cur += 3
                else:
                    add("SK")
                    cur += 3
            else:
                if cur == last and sat(cur - 2, "AI", "OI"):
                    add("", "S")  # french: resnais, artois
                else:
                    add("S")
                cur += 2 if p[cur + 1] in "SZ" else 1
        elif c == "T":
            if sat(cur, "TION"):
                add("X")
                cur += 3
            elif sat(cur, "TIA", "TCH"):
                add("X")
                cur += 3
            elif sat(cur, "TH") or sat(cur, "TTH"):
                if sat(cur + 2, "OM", "AM") or sat(0, "VAN ", "VON ") or sat(
                    0, "SCH"
                ):
                    add("T")  # thomas, thames
                else:
                    add("0", "T")  # '0' = voiceless th
                cur += 2
            else:
                add("T")
                cur += 2 if p[cur + 1] in "TD" else 1
        elif c == "V":
            add("F")
            cur += 2 if p[cur + 1] == "V" else 1
        elif c == "W":
            if sat(cur, "WR"):
                add("R")
                cur += 2
            else:
                if cur == 0 and (p[1] in _DM_VOWELS or sat(cur, "WH")):
                    if p[1] in _DM_VOWELS:
                        add("A", "F")  # wasserman ~ vasserman
                    else:
                        add("A")  # wharton
                if (
                    (cur == last and p[cur - 1] in _DM_VOWELS)
                    or sat(cur - 1, "EWSKI", "EWSKY", "OWSKI", "OWSKY")
                    or sat(0, "SCH")
                ):
                    add("", "F")  # arnow ~ arnoff
                    cur += 1
                elif sat(cur, "WICZ", "WITZ"):
                    add("TS", "FX")  # filipowicz
                    cur += 4
                else:
                    cur += 1
        elif c == "X":
            if not (
                cur == last
                and (sat(cur - 3, "IAU", "EAU") or sat(cur - 2, "AU", "OU"))
            ):
                add("KS")  # not french final -aux
            cur += 2 if p[cur + 1] in "CX" else 1
        elif c == "Z":
            if p[cur + 1] == "H":
                add("J")  # pinyin zh
                cur += 2
            else:
                if sat(cur + 1, "ZO", "ZI", "ZA") or (
                    sg and cur > 0 and p[cur - 1] != "T"
                ):
                    add("S", "TS")
                else:
                    add("S")
                cur += 2 if p[cur + 1] == "Z" else 1
        else:
            cur += 1

    return "".join(pri)[:maxlen], "".join(sec)[:maxlen]


def _fnv_row_code(codes: list[str]) -> int:
    """63-bit FNV-1a over sorted token codes (shared by both algorithms;
    salt-mixed into its own key space, disjoint from MinHash/SimHash whp)."""
    if not codes:
        return 0
    h = np.uint64(0xCBF29CE484222325)
    with np.errstate(over="ignore"):
        for code in codes:
            for b in code.encode():
                h = (h ^ np.uint64(b)) * np.uint64(0x100000001B3)
        h = (h * _PHONETIC_SALT) & np.uint64(0x7FFFFFFFFFFFFFFF)
    return int(h) or 1


def dm_row_codes(text: str) -> tuple[int, int]:
    """(primary, alternate) order-free 63-bit row codes under Double
    Metaphone.  The alternate row code hashes, per token, the secondary
    code where one exists (else the primary); it is 0 unless some token
    actually has a distinct secondary — so rows without alternates carry
    exactly one phonetic band key."""
    pris: set[str] = set()
    alts: set[str] = set()
    any_alt = False
    for tok in (text or "").split():
        pcode, scode = double_metaphone(tok)
        if not pcode:
            continue
        pris.add(pcode)
        if scode and scode != pcode:
            any_alt = True
            alts.add(scode)
        else:
            alts.add(pcode)
    c1 = _fnv_row_code(sorted(pris))
    if c1 == 0 or not any_alt:
        return c1, 0
    c2 = _fnv_row_code(sorted(alts))
    return c1, 0 if c2 == c1 else c2


def phonetic_code_arrays(texts: list[str], algo: str) -> tuple[np.ndarray, np.ndarray]:
    """((n,), (n,)) int64 (primary, alternate) row codes.  Soundex has no
    alternate pronunciation — its second array is all zeros.  Python loop —
    callers pass SHORT rows only."""
    n = len(texts)
    ph2 = np.zeros(n, dtype=np.int64)
    if algo == "soundex":
        return phonetic_codes(texts), ph2
    if algo != "double_metaphone":
        raise ValueError(f"unknown phonetic_algo: {algo!r}")
    ph1 = np.zeros(n, dtype=np.int64)
    for i, t in enumerate(texts):
        ph1[i], ph2[i] = dm_row_codes(t)
    return ph1, ph2
