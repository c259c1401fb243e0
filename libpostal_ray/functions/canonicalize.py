"""Canonicalization kernels — the `expand_address` analog for code/text.

The reference canonicalizes a string into equivalent normal forms:
Unicode normalization + lowercase (normalize.c:24-110), transliteration
(transliterate.c:669+), hyphen/whitespace handling and token rewriting
(normalize.c:393-511).  It emits a *set* of forms and tests set intersection
(dedupe.c:13-31).  For source code we emit exactly ONE deterministic canonical
form — the fuzziness that libpostal gets from enumerating alternatives we get
from MinHash over shingles of the single form (SURVEY.md section 3.1).

Rules (fixed order, all optional via PipelineConfig):
  1. NFKC Unicode normalization  (transliteration analog: folds ligatures,
     full-width forms, compatibility chars)
  2. casefold                     (utf8_lower analog, normalize.c:93)
  3. strip comments               (code-aware; off by default)
  4. collapse whitespace runs to a single space; strip ends
     (WHITESPACE token-type handling analog, scanner.re)
"""

from __future__ import annotations

import os
import re
import unicodedata

import numpy as np
import pyarrow as pa

_WS_RE = re.compile(r"\s+")
# Comment folding: line comments (// #) and block comments (/* */) — a
# deliberately simple, language-agnostic approximation; exact lexing is out of
# scope (the reference's dictionaries are likewise approximate phrase lists).
_LINE_COMMENT_RE = re.compile(r"(//|#)[^\n]*")
_BLOCK_COMMENT_RE = re.compile(r"/\*.*?\*/", re.S)


# Example rule-pack: the expand_affixes / normalize_ordinal_suffixes analogs
# (expand.c:413-449, 1368-1383) expressed as rewrite-rule entries — pass via
# PipelineConfig(rewrite_rules=ORDINAL_AFFIX_RULES + your_rules).
ORDINAL_AFFIX_RULES: tuple[tuple[str, str], ...] = (
    (r"\b(\d+)(?:st|nd|rd|th)\b", r"\1"),   # "106th" -> "106"
    (r"\b(\w+)str\.", r"\1 strasse"),        # "hauptstr." -> "haupt strasse"
)


def _word_rules(pairs: dict[str, str]) -> tuple[tuple[str, str], ...]:
    return tuple((r"\b" + w + r"\b", r) for w, r in pairs.items())


# ---------------------------------------------------------------------------
# EN rule packs — the resources/dictionaries/en/*.txt content model
# (expand.c:724-1366 applies such lists as phrase rewrites; here each list is
# rewrite-rule entries, merged per use: PipelineConfig(rewrite_rules=
# EN_GENERAL_RULES) or any concatenation).  All packs are plain-word rules,
# so compile_rules folds each consecutive run into ONE combined regex pass.
# ---------------------------------------------------------------------------

EN_CONTRACTION_RULES = _word_rules({
    "can't": "cannot", "won't": "will not", "shan't": "shall not",
    "i'm": "i am", "let's": "let us", "it's": "it is", "he's": "he is",
    "she's": "she is", "that's": "that is", "what's": "what is",
    "there's": "there is", "who's": "who is",
}) + (
    # suffix contractions need explicit regex: \b can't sit between two word
    # chars, so a plain-word "n't" rule would never match inside "don't"
    (r"n't\b", " not"),
    (r"'re\b", " are"),
    (r"'ve\b", " have"),
    (r"'ll\b", " will"),
    (r"'d\b", " would"),
)

EN_UNIT_RULES = _word_rules({
    "km": "kilometer", "kilometers": "kilometer", "kilometres": "kilometer",
    "kg": "kilogram", "kilograms": "kilogram",
    "mi": "mile", "miles": "mile",
    "ft": "foot", "feet": "foot",
    "lb": "pound", "lbs": "pound", "pounds": "pound",
    "hr": "hour", "hrs": "hour", "hours": "hour",
    "min": "minute", "mins": "minute", "minutes": "minute",
    "sec": "second", "secs": "second", "seconds": "second",
    "oz": "ounce", "ounces": "ounce",
    "gal": "gallon", "gallons": "gallon",
})

EN_ABBREV_RULES = _word_rules({
    "mr": "mister", "mrs": "missus", "dr": "doctor", "prof": "professor",
    "jr": "junior", "sr": "senior", "capt": "captain", "sgt": "sergeant",
    "dept": "department", "govt": "government", "univ": "university",
    "assn": "association", "bros": "brothers", "inc": "incorporated",
    "ltd": "limited", "corp": "corporation", "co": "company",
    "intl": "international", "natl": "national",
})

_ONES = {
    "one": 1, "two": 2, "three": 3, "four": 4, "five": 5, "six": 6,
    "seven": 7, "eight": 8, "nine": 9, "ten": 10, "eleven": 11,
    "twelve": 12, "thirteen": 13, "fourteen": 14, "fifteen": 15,
    "sixteen": 16, "seventeen": 17, "eighteen": 18, "nineteen": 19,
}
_TENS = {
    "twenty": 20, "thirty": 30, "forty": 40, "fifty": 50,
    "sixty": 60, "seventy": 70, "eighty": 80, "ninety": 90,
}
_ORD_ONES = {
    "first": 1, "second": 2, "third": 3, "fourth": 4, "fifth": 5,
    "sixth": 6, "seventh": 7, "eighth": 8, "ninth": 9, "tenth": 10,
    "eleventh": 11, "twelfth": 12, "thirteenth": 13, "fourteenth": 14,
    "fifteenth": 15, "sixteenth": 16, "seventeenth": 17, "eighteenth": 18,
    "nineteenth": 19,
}
_ORD_TENS = {
    "twentieth": 20, "thirtieth": 30, "fortieth": 40, "fiftieth": 50,
    "sixtieth": 60, "seventieth": 70, "eightieth": 80, "ninetieth": 90,
}


def _numex_rules() -> tuple[tuple[str, str], ...]:
    """numex-lite (numex.c:1260-1335 role): spelled-out cardinals/ordinals
    1-99 -> digits, compounds first ("twenty six"/"twenty-sixth" -> 26)
    before single words so the longest phrase wins."""
    rules: list[tuple[str, str]] = []
    # compounds as PLAIN-WORD rules (space and hyphen variants) so the whole
    # pack folds into one alternation pass; longest-first matching in the
    # combined regex makes "twenty six" win over "twenty"+"six"
    for tw, tv in _TENS.items():
        for ow, ov in {**_ONES, **_ORD_ONES}.items():
            if ov < 10:
                rules.append((rf"\b{tw} {ow}\b", str(tv + ov)))
                rules.append((rf"\b{tw}-{ow}\b", str(tv + ov)))
    for w, v in {**_TENS, **_ONES, **_ORD_TENS, **_ORD_ONES}.items():
        rules.append((rf"\b{w}\b", str(v)))
    return tuple(rules)


EN_NUMBER_RULES: tuple[tuple[str, str], ...] = _numex_rules()


# ---------------------------------------------------------------------------
# Roman numerals (numex.c:1198-1335): "xiv" -> "14", gated exactly like the
# reference — 1-2 char tokens must consist only of i/v/x (so "di"/"cd"
# words never convert; "ix" does) and the token must parse as a VALID
# subtractive-form Roman numeral ("iiii" stays).  A separate opt-in pack,
# like the reference's lang="la" routing: english prose is full of valid
# accidental numerals ("mix" = MIX = 1009), so it never rides in
# EN_GENERAL_RULES.
# ---------------------------------------------------------------------------

_ROMAN_FORM_RE = re.compile(
    r"^(m{0,3})(cm|cd|d?c{0,3})(xc|xl|l?x{0,3})(ix|iv|v?i{0,3})$"
)
_ROMAN_VALS = {"i": 1, "v": 5, "x": 10, "l": 50, "c": 100, "d": 500, "m": 1000}


def roman_value(tok: str) -> int | None:
    """Value of a lowercase valid-form Roman numeral, else None.  Applies
    the reference's short-token gate (is_likely_single_roman_numeral_char,
    numex.c:1215-1223): len <= 2 requires chars in {i, v, x}."""
    if not tok or not _ROMAN_FORM_RE.match(tok):
        return None
    if len(tok) <= 2 and not all(c in "ivx" for c in tok):
        return None
    total = 0
    for j, c in enumerate(tok):
        v = _ROMAN_VALS[c]
        if j + 1 < len(tok) and _ROMAN_VALS[tok[j + 1]] > v:
            total -= v
        else:
            total += v
    return total


def _roman_repl(m: "re.Match[str]") -> str:
    v = roman_value(m.group(0))
    return str(v) if v is not None else m.group(0)


ROMAN_NUMERAL_RULES: tuple[tuple[str, object], ...] = (
    (r"\b[ivxlcdm]{1,15}\b", _roman_repl),
)

# compositional numex (numex.c's left-context combination rule, the part
# plain word lists cannot express): once the word pass has digitized the
# parts ("one hundred five" -> "1 hundred 5"), multiplier words combine
# arithmetically — hundreds first so thousands see the folded value
# ("two thousand three hundred four" -> "2 thousand 304" -> "2304").
# Standalone "hundred"/"thousand" (no leading digit) never convert.


def _hundred_repl(m: "re.Match[str]") -> str:
    return str(100 * int(m.group(1)) + int(m.group(2) or 0))


def _thousand_repl(m: "re.Match[str]") -> str:
    return str(1000 * int(m.group(1)) + int(m.group(2) or 0))


EN_COMPOUND_NUMBER_RULES: tuple[tuple[str, object], ...] = (
    (r"\b(\d{1,2}) hundred(?: (?:and )?(\d{1,2}))?\b", _hundred_repl),
    (r"\b(\d{1,3}) thousand(?: (?:and )?(\d{1,3}))?\b", _thousand_repl),
)

EN_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    EN_CONTRACTION_RULES + EN_ABBREV_RULES + EN_UNIT_RULES
    + EN_NUMBER_RULES + EN_COMPOUND_NUMBER_RULES + ORDINAL_AFFIX_RULES
)

# ---------------------------------------------------------------------------
# ES / FR / DE / PT rule packs (the per-language resources/dictionaries/<lang>
# content model beyond EN — round-2 verdict gap #2).  Same mechanics: plain-
# word entries fold into one alternation pass each; canonical targets keep
# their diacritics because the canonicalizer is NFKC+casefold, NOT
# latin-ascii ("sr" must meet the canonical "señor", not "senor").
# ---------------------------------------------------------------------------

ES_ABBREV_RULES = _word_rules({
    "sr": "señor", "sra": "señora", "srta": "señorita",
    "dr": "doctor", "dra": "doctora", "gral": "general",
    "avda": "avenida", "av": "avenida", "cl": "calle",
    "pza": "plaza", "pzta": "plazuela",
    "dpto": "departamento", "nro": "número", "núm": "número",
    "izq": "izquierda", "dcha": "derecha", "esq": "esquina",
    "cía": "compañía", "cia": "compañía", "tel": "teléfono",
    "del": "de el",
})

_ES_ONES = {
    "uno": 1, "dos": 2, "tres": 3, "cuatro": 4, "cinco": 5, "seis": 6,
    "siete": 7, "ocho": 8, "nueve": 9, "diez": 10, "once": 11, "doce": 12,
    "trece": 13, "catorce": 14, "quince": 15, "dieciséis": 16,
    "dieciseis": 16, "diecisiete": 17, "dieciocho": 18, "diecinueve": 19,
}
_ES_TENS = {
    "veinte": 20, "treinta": 30, "cuarenta": 40, "cincuenta": 50,
    "sesenta": 60, "setenta": 70, "ochenta": 80, "noventa": 90,
}

ES_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in {**_ES_TENS, **_ES_ONES}.items()
)

ES_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    ES_ABBREV_RULES + ES_NUMBER_RULES
)

FR_ELISION_RULES: tuple[tuple[str, str], ...] = (
    # elision: the apostrophe hides the article ("l'hôtel" = "le hôtel");
    # suffix-style regex rules, like the EN n't/'re family
    (r"\bl'", "le "),
    (r"\bd'", "de "),
    (r"\bqu'", "que "),
)

FR_ABBREV_RULES = _word_rules({
    "st": "saint", "ste": "sainte",
    "bd": "boulevard", "blvd": "boulevard", "av": "avenue",
    "pl": "place", "fg": "faubourg", "imp": "impasse",
    "dr": "docteur", "mme": "madame", "mlle": "mademoiselle",
    "cie": "compagnie", "ets": "établissements", "no": "numéro",
})

_FR_NUMS = {
    "un": 1, "deux": 2, "trois": 3, "quatre": 4, "cinq": 5, "six": 6,
    "sept": 7, "huit": 8, "neuf": 9, "dix": 10, "onze": 11, "douze": 12,
    "vingt": 20, "trente": 30, "quarante": 40, "cinquante": 50,
    "soixante": 60, "cent": 100,
}

FR_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _FR_NUMS.items()
)

FR_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    FR_ELISION_RULES + FR_ABBREV_RULES + FR_NUMBER_RULES
)

DE_ABBREV_RULES = _word_rules({
    "str": "strasse", "st": "sankt", "pl": "platz",
    "nr": "nummer", "hbf": "hauptbahnhof", "bhf": "bahnhof",
    "dr": "doktor", "geb": "gebäude", "og": "obergeschoss",
    "eg": "erdgeschoss", "zi": "zimmer",
})

_DE_NUMS = {
    "eins": 1, "zwei": 2, "drei": 3, "vier": 4, "fünf": 5, "sechs": 6,
    "sieben": 7, "acht": 8, "neun": 9, "zehn": 10, "elf": 11, "zwölf": 12,
    "zwanzig": 20, "dreissig": 30, "vierzig": 40, "fünfzig": 50,
    "hundert": 100,
}

DE_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _DE_NUMS.items()
)

DE_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    DE_ABBREV_RULES + DE_NUMBER_RULES + ORDINAL_AFFIX_RULES
)

PT_ABBREV_RULES = _word_rules({
    "sr": "senhor", "sra": "senhora", "dr": "doutor", "dra": "doutora",
    "av": "avenida", "pça": "praça", "pca": "praça",
    "sto": "santo", "sta": "santa", "nro": "número",
    "cia": "companhia", "depto": "departamento",
})

_PT_NUMS = {
    "um": 1, "dois": 2, "três": 3, "tres": 3, "quatro": 4, "cinco": 5,
    "seis": 6, "sete": 7, "oito": 8, "nove": 9, "dez": 10, "onze": 11,
    "doze": 12, "treze": 13, "catorze": 14, "quatorze": 14, "quinze": 15,
    "vinte": 20, "trinta": 30, "quarenta": 40, "cinquenta": 50,
    "sessenta": 60, "setenta": 70, "oitenta": 80, "noventa": 90,
    "cem": 100,
}

PT_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _PT_NUMS.items()
)

PT_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    PT_ABBREV_RULES + PT_NUMBER_RULES
)

# IT pack — dictionaries/it content model (street/honorific abbreviations
# + spelled numbers).  Same discipline as the other packs: full-word rules
# only, no entry short/ambiguous enough to fire inside prose ("via" stays).
IT_ABBREV_RULES = _word_rules({
    "vle": "viale", "cso": "corso", "pza": "piazza", "pzza": "piazza",
    "str": "strada", "fraz": "frazione", "loc": "località",
    "sig": "signore", "sigra": "signora",
    "dott": "dottore", "dssa": "dottoressa", "ing": "ingegnere",
    "sta": "santa", "ssma": "santissima",
})

_IT_NUMS = {
    "uno": 1, "due": 2, "tre": 3, "quattro": 4, "cinque": 5, "sei": 6,
    "sette": 7, "otto": 8, "nove": 9, "dieci": 10, "undici": 11,
    "dodici": 12, "tredici": 13, "quattordici": 14, "quindici": 15,
    "sedici": 16, "diciassette": 17, "diciotto": 18, "diciannove": 19,
    "venti": 20, "trenta": 30, "quaranta": 40, "cinquanta": 50,
    "sessanta": 60, "settanta": 70, "ottanta": 80, "novanta": 90,
    "cento": 100,
}

IT_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _IT_NUMS.items()
)

IT_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    IT_ABBREV_RULES + IT_NUMBER_RULES
)

# NL pack — dictionaries/nl content model.  "een" (= both "a/an" and
# "one") is DELIBERATELY absent: the reference resolves that ambiguity with
# context the rule table doesn't have, so rewriting it would corrupt prose.
NL_ABBREV_RULES = _word_rules({
    "str": "straat", "ln": "laan", "plts": "plaats",
    "dhr": "de heer", "mw": "mevrouw", "dr": "dokter",
    "st": "sint", "nr": "nummer", "burg": "burgemeester",
})

_NL_NUMS = {
    "twee": 2, "drie": 3, "vier": 4, "vijf": 5, "zes": 6, "zeven": 7,
    "acht": 8, "negen": 9, "tien": 10, "elf": 11, "twaalf": 12,
    "dertien": 13, "veertien": 14, "vijftien": 15, "zestien": 16,
    "zeventien": 17, "achttien": 18, "negentien": 19, "twintig": 20,
    "dertig": 30, "veertig": 40, "vijftig": 50, "zestig": 60,
    "zeventig": 70, "tachtig": 80, "negentig": 90, "honderd": 100,
}

NL_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _NL_NUMS.items()
)

# Dutch writes street names solid ("Kerkstraat") and abbreviates the
# suffix ("Kerkstr.") — the expand_affixes analog, like DE's entry in
# ORDINAL_AFFIX_RULES but with the Dutch expansions
NL_AFFIX_RULES: tuple[tuple[str, str], ...] = (
    (r"\b(\w+)str\.", r"\1 straat"),
    (r"\b(\w+)ln\.", r"\1 laan"),
)

NL_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    NL_ABBREV_RULES + NL_NUMBER_RULES + NL_AFFIX_RULES
)

# SV pack — dictionaries/sv content model.  "ett"/"en" (articles AND the
# number 1) are deliberately absent, same ambiguity rule as NL "een".
SV_ABBREV_RULES = _word_rules({
    "tlf": "telefon", "avd": "avdelning",
    "s:t": "sankt", "s:ta": "sankta",
})

_SV_NUMS = {
    "två": 2, "tre": 3, "fyra": 4, "fem": 5, "sex": 6, "sju": 7,
    "åtta": 8, "nio": 9, "tio": 10, "elva": 11, "tolv": 12,
    "tretton": 13, "fjorton": 14, "femton": 15, "sexton": 16,
    "sjutton": 17, "arton": 18, "nitton": 19, "tjugo": 20,
    "trettio": 30, "fyrtio": 40, "femtio": 50, "sextio": 60,
    "sjuttio": 70, "åttio": 80, "nittio": 90, "hundra": 100,
}

SV_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _SV_NUMS.items()
)

# Swedish compounds street names solid ("Storgatan") and abbreviates the
# suffix ("Storg.") — expand_affixes analog like DE/NL
SV_AFFIX_RULES: tuple[tuple[str, str], ...] = (
    (r"\b(\w{2,})g\.", r"\1 gatan"),
    (r"\b(\w{2,})v\.", r"\1 vägen"),
)

SV_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    SV_ABBREV_RULES + SV_NUMBER_RULES + SV_AFFIX_RULES
)

# DA pack — dictionaries/da content model ("en"/"et" absent: articles)
DA_ABBREV_RULES = _word_rules({
    "gl": "gamle", "sdr": "sønder", "ndr": "nørre", "kbh": "københavn",
    "tlf": "telefon", "sal": "etage",
})

_DA_NUMS = {
    "to": 2, "tre": 3, "fire": 4, "fem": 5, "seks": 6, "syv": 7,
    "otte": 8, "ni": 9, "ti": 10, "elleve": 11, "tolv": 12,
    "tretten": 13, "fjorten": 14, "femten": 15, "seksten": 16,
    "sytten": 17, "atten": 18, "nitten": 19, "tyve": 20,
    "tredive": 30, "fyrre": 40, "halvtreds": 50, "tres": 60,
    "halvfjerds": 70, "firs": 80, "halvfems": 90, "hundrede": 100,
}

DA_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _DA_NUMS.items()
)

DA_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    DA_ABBREV_RULES + DA_NUMBER_RULES
)

# NO pack — dictionaries/nb content model ("en"/"ei"/"et" absent)
NO_ABBREV_RULES = _word_rules({
    "gt": "gate", "vn": "veien", "pb": "postboks", "tlf": "telefon",
})

_NO_NUMS = {
    "to": 2, "tre": 3, "fire": 4, "fem": 5, "seks": 6, "sju": 7,
    "syv": 7, "åtte": 8, "ni": 9, "ti": 10, "elleve": 11, "tolv": 12,
    "tretten": 13, "fjorten": 14, "femten": 15, "seksten": 16,
    "sytten": 17, "atten": 18, "nitten": 19, "tjue": 20,
    "tretti": 30, "førti": 40, "femti": 50, "seksti": 60,
    "sytti": 70, "åtti": 80, "nitti": 90, "hundre": 100,
}

NO_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _NO_NUMS.items()
)

NO_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    NO_ABBREV_RULES + NO_NUMBER_RULES
)

# PL pack — dictionaries/pl content model
PL_ABBREV_RULES = _word_rules({
    "ul": "ulica", "al": "aleja", "pl": "plac", "os": "osiedle",
    "woj": "województwo", "św": "święty", "nr": "numer",
    "im": "imienia", "tel": "telefon",
})

_PL_NUMS = {
    "jeden": 1, "dwa": 2, "trzy": 3, "cztery": 4, "pięć": 5,
    "sześć": 6, "siedem": 7, "osiem": 8, "dziewięć": 9, "dziesięć": 10,
    "jedenaście": 11, "dwanaście": 12, "trzynaście": 13,
    "czternaście": 14, "piętnaście": 15, "szesnaście": 16,
    "siedemnaście": 17, "osiemnaście": 18, "dziewiętnaście": 19,
    "dwadzieścia": 20, "trzydzieści": 30, "czterdzieści": 40,
    "pięćdziesiąt": 50, "sześćdziesiąt": 60, "siedemdziesiąt": 70,
    "osiemdziesiąt": 80, "dziewięćdziesiąt": 90, "sto": 100,
}

PL_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _PL_NUMS.items()
)

PL_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    PL_ABBREV_RULES + PL_NUMBER_RULES
)

# CS pack — dictionaries/cs content model
CS_ABBREV_RULES = _word_rules({
    "ul": "ulice", "nám": "náměstí", "tř": "třída", "č": "číslo",
    "sv": "svatý", "tel": "telefon", "nábř": "nábřeží",
})

_CS_NUMS = {
    "jedna": 1, "dva": 2, "tři": 3, "čtyři": 4, "pět": 5, "šest": 6,
    "sedm": 7, "osm": 8, "devět": 9, "deset": 10, "jedenáct": 11,
    "dvanáct": 12, "třináct": 13, "čtrnáct": 14, "patnáct": 15,
    "šestnáct": 16, "sedmnáct": 17, "osmnáct": 18, "devatenáct": 19,
    "dvacet": 20, "třicet": 30, "čtyřicet": 40, "padesát": 50,
    "šedesát": 60, "sedmdesát": 70, "osmdesát": 80, "devadesát": 90,
    "sto": 100,
}

CS_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _CS_NUMS.items()
)

CS_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    CS_ABBREV_RULES + CS_NUMBER_RULES
)

# FI pack — dictionaries/fi content model
FI_ABBREV_RULES = _word_rules({
    "puh": "puhelin", "krs": "kerros", "as": "asunto", "os": "osoite",
    "klo": "kello",
})

_FI_NUMS = {
    "yksi": 1, "kaksi": 2, "kolme": 3, "neljä": 4, "viisi": 5,
    "kuusi": 6, "seitsemän": 7, "kahdeksan": 8, "yhdeksän": 9,
    "kymmenen": 10, "yksitoista": 11, "kaksitoista": 12,
    "kolmetoista": 13, "neljätoista": 14, "viisitoista": 15,
    "kuusitoista": 16, "seitsemäntoista": 17, "kahdeksantoista": 18,
    "yhdeksäntoista": 19, "kaksikymmentä": 20, "kolmekymmentä": 30,
    "neljäkymmentä": 40, "viisikymmentä": 50, "kuusikymmentä": 60,
    "seitsemänkymmentä": 70, "kahdeksankymmentä": 80,
    "yhdeksänkymmentä": 90, "sata": 100,
}

FI_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _FI_NUMS.items()
)

FI_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    FI_ABBREV_RULES + FI_NUMBER_RULES
)

# TR pack — dictionaries/tr content model (keys are lowercase; Turkish
# dotted-capital İ never appears as a key because case folding runs first)
TR_ABBREV_RULES = _word_rules({
    "mah": "mahallesi", "cad": "caddesi", "sok": "sokak",
    "apt": "apartmanı", "no": "numara", "tel": "telefon",
    "bulv": "bulvarı",
})

_TR_NUMS = {
    "bir": 1, "iki": 2, "üç": 3, "dört": 4, "beş": 5, "altı": 6,
    "yedi": 7, "sekiz": 8, "dokuz": 9, "on": 10, "yirmi": 20,
    "otuz": 30, "kırk": 40, "elli": 50, "altmış": 60, "yetmiş": 70,
    "seksen": 80, "doksan": 90, "yüz": 100,
}

TR_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _TR_NUMS.items()
)

TR_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    TR_ABBREV_RULES + TR_NUMBER_RULES
)

# RO pack — dictionaries/ro content model (modern comma-below ș/ț forms;
# they sit in Latin Extended-B so these entries compile as single rules
# rather than folding into the combined alternation — correctness is
# identical, the fold is only a speed path)
RO_ABBREV_RULES = _word_rules({
    "str": "strada", "bd": "bulevardul", "bdul": "bulevardul",
    "nr": "numărul", "șos": "șoseaua", "sos": "șoseaua",
    "al": "aleea", "pța": "piața", "pta": "piața",
    "dl": "domnul", "dna": "doamna", "tel": "telefon",
})

_RO_NUMS = {
    "unu": 1, "doi": 2, "trei": 3, "patru": 4, "cinci": 5, "șase": 6,
    "sase": 6, "șapte": 7, "sapte": 7, "opt": 8, "nouă": 9, "noua": 9,
    "zece": 10, "unsprezece": 11, "doisprezece": 12, "treisprezece": 13,
    "paisprezece": 14, "cincisprezece": 15, "șaisprezece": 16,
    "șaptesprezece": 17, "optsprezece": 18, "nouăsprezece": 19,
    "douăzeci": 20, "douazeci": 20, "treizeci": 30, "patruzeci": 40,
    "cincizeci": 50, "șaizeci": 60, "șaptezeci": 70, "optzeci": 80,
    "nouăzeci": 90, "sută": 100, "suta": 100,
}

RO_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _RO_NUMS.items()
)

RO_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    RO_ABBREV_RULES + RO_NUMBER_RULES
)

# HU pack — dictionaries/hu content model
HU_ABBREV_RULES = _word_rules({
    "u": "utca", "krt": "körút", "tel": "telefon", "dr": "doktor",
    "em": "emelet", "pu": "pályaudvar", "stny": "sétány",
})

_HU_NUMS = {
    "egy": 1, "kettő": 2, "két": 2, "három": 3, "négy": 4, "öt": 5,
    "hat": 6, "hét": 7, "nyolc": 8, "kilenc": 9, "tíz": 10,
    "tizenegy": 11, "tizenkettő": 12, "tizenhárom": 13, "tizennégy": 14,
    "tizenöt": 15, "tizenhat": 16, "tizenhét": 17, "tizennyolc": 18,
    "tizenkilenc": 19, "húsz": 20, "harminc": 30, "negyven": 40,
    "ötven": 50, "hatvan": 60, "hetven": 70, "nyolcvan": 80,
    "kilencven": 90, "száz": 100,
}

HU_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _HU_NUMS.items()
)

HU_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    HU_ABBREV_RULES + HU_NUMBER_RULES
)

# CA pack — dictionaries/ca content model
CA_ABBREV_RULES = _word_rules({
    "av": "avinguda", "avda": "avinguda", "ctra": "carretera",
    "pl": "plaça", "pg": "passeig", "rbla": "rambla",
    "sr": "senyor", "sra": "senyora", "dr": "doctor",
    "núm": "número", "tel": "telèfon",
})

_CA_NUMS = {
    "un": 1, "dos": 2, "tres": 3, "quatre": 4, "cinc": 5, "sis": 6,
    "set": 7, "vuit": 8, "nou": 9, "deu": 10, "onze": 11, "dotze": 12,
    "tretze": 13, "catorze": 14, "quinze": 15, "setze": 16,
    "disset": 17, "divuit": 18, "dinou": 19, "vint": 20, "trenta": 30,
    "quaranta": 40, "cinquanta": 50, "seixanta": 60, "setanta": 70,
    "vuitanta": 80, "noranta": 90, "cent": 100,
}

CA_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _CA_NUMS.items()
)

CA_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    CA_ABBREV_RULES + CA_NUMBER_RULES
)

# ID pack — dictionaries/id content model (multiword spelled numbers fold
# fine: the plain-word alternation allows internal spaces)
ID_ABBREV_RULES = _word_rules({
    "jl": "jalan", "jln": "jalan", "no": "nomor", "gg": "gang",
    "kel": "kelurahan", "kec": "kecamatan", "kab": "kabupaten",
    "prov": "provinsi", "tel": "telepon",
})

_ID_NUMS = {
    "satu": 1, "dua": 2, "tiga": 3, "empat": 4, "lima": 5, "enam": 6,
    "tujuh": 7, "delapan": 8, "sembilan": 9, "sepuluh": 10,
    "sebelas": 11, "dua belas": 12, "tiga belas": 13, "empat belas": 14,
    "lima belas": 15, "enam belas": 16, "tujuh belas": 17,
    "delapan belas": 18, "sembilan belas": 19, "dua puluh": 20,
    "tiga puluh": 30, "empat puluh": 40, "lima puluh": 50,
    "enam puluh": 60, "tujuh puluh": 70, "delapan puluh": 80,
    "sembilan puluh": 90, "seratus": 100,
}

ID_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _ID_NUMS.items()
)

ID_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    ID_ABBREV_RULES + ID_NUMBER_RULES
)

# SK pack — dictionaries/sk content model
SK_ABBREV_RULES = _word_rules({
    "ul": "ulica", "nám": "námestie", "č": "číslo", "tel": "telefón",
    "sv": "svätý", "nábr": "nábrežie",
})

_SK_NUMS = {
    "jeden": 1, "dva": 2, "tri": 3, "štyri": 4, "päť": 5, "šesť": 6,
    "sedem": 7, "osem": 8, "deväť": 9, "desať": 10, "jedenásť": 11,
    "dvanásť": 12, "trinásť": 13, "štrnásť": 14, "pätnásť": 15,
    "šestnásť": 16, "sedemnásť": 17, "osemnásť": 18, "devätnásť": 19,
    "dvadsať": 20, "tridsať": 30, "štyridsať": 40, "päťdesiat": 50,
    "šesťdesiat": 60, "sedemdesiat": 70, "osemdesiat": 80,
    "deväťdesiat": 90, "sto": 100,
}

SK_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _SK_NUMS.items()
)

SK_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    SK_ABBREV_RULES + SK_NUMBER_RULES
)

# HR pack — dictionaries/hr content model
HR_ABBREV_RULES = _word_rules({
    "ul": "ulica", "br": "broj", "sv": "sveti", "tel": "telefon",
    "dr": "doktor",
})

_HR_NUMS = {
    "jedan": 1, "dva": 2, "tri": 3, "četiri": 4, "pet": 5, "šest": 6,
    "sedam": 7, "osam": 8, "devet": 9, "deset": 10, "jedanaest": 11,
    "dvanaest": 12, "trinaest": 13, "četrnaest": 14, "petnaest": 15,
    "šesnaest": 16, "sedamnaest": 17, "osamnaest": 18, "devetnaest": 19,
    "dvadeset": 20, "trideset": 30, "četrdeset": 40, "pedeset": 50,
    "šezdeset": 60, "sedamdeset": 70, "osamdeset": 80, "devedeset": 90,
    "sto": 100,
}

HR_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _HR_NUMS.items()
)

HR_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    HR_ABBREV_RULES + HR_NUMBER_RULES
)

# LT pack — dictionaries/lt content model
LT_ABBREV_RULES = _word_rules({
    "g": "gatvė", "pr": "prospektas", "al": "alėja", "nr": "numeris",
    "tel": "telefonas", "pl": "plentas",
})

_LT_NUMS = {
    "vienas": 1, "du": 2, "trys": 3, "keturi": 4, "penki": 5,
    "šeši": 6, "septyni": 7, "aštuoni": 8, "devyni": 9, "dešimt": 10,
    "vienuolika": 11, "dvylika": 12, "trylika": 13, "keturiolika": 14,
    "penkiolika": 15, "šešiolika": 16, "septyniolika": 17,
    "aštuoniolika": 18, "devyniolika": 19, "dvidešimt": 20,
    "trisdešimt": 30, "keturiasdešimt": 40, "penkiasdešimt": 50,
    "šešiasdešimt": 60, "septyniasdešimt": 70, "aštuoniasdešimt": 80,
    "devyniasdešimt": 90, "šimtas": 100,
}

LT_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _LT_NUMS.items()
)

LT_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    LT_ABBREV_RULES + LT_NUMBER_RULES
)

# LV pack — dictionaries/lv content model
LV_ABBREV_RULES = _word_rules({
    "nr": "numurs", "tel": "telefons", "bulv": "bulvāris",
    "pr": "prospekts", "kr": "krastmala",
})

_LV_NUMS = {
    "viens": 1, "divi": 2, "trīs": 3, "četri": 4, "pieci": 5,
    "seši": 6, "septiņi": 7, "astoņi": 8, "deviņi": 9, "desmit": 10,
    "vienpadsmit": 11, "divpadsmit": 12, "trīspadsmit": 13,
    "četrpadsmit": 14, "piecpadsmit": 15, "sešpadsmit": 16,
    "septiņpadsmit": 17, "astoņpadsmit": 18, "deviņpadsmit": 19,
    "divdesmit": 20, "trīsdesmit": 30, "četrdesmit": 40,
    "piecdesmit": 50, "sešdesmit": 60, "septiņdesmit": 70,
    "astoņdesmit": 80, "deviņdesmit": 90, "simts": 100,
}

LV_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _LV_NUMS.items()
)

LV_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    LV_ABBREV_RULES + LV_NUMBER_RULES
)

# ET pack — dictionaries/et content model
ET_ABBREV_RULES = _word_rules({
    "tn": "tänav", "mnt": "maantee", "pst": "puiestee", "nr": "number",
    "tel": "telefon",
})

_ET_NUMS = {
    "üks": 1, "kaks": 2, "kolm": 3, "neli": 4, "viis": 5, "kuus": 6,
    "seitse": 7, "kaheksa": 8, "üheksa": 9, "kümme": 10,
    "üksteist": 11, "kaksteist": 12, "kolmteist": 13, "neliteist": 14,
    "viisteist": 15, "kuusteist": 16, "seitseteist": 17,
    "kaheksateist": 18, "üheksateist": 19, "kakskümmend": 20,
    "kolmkümmend": 30, "nelikümmend": 40, "viiskümmend": 50,
    "kuuskümmend": 60, "seitsekümmend": 70, "kaheksakümmend": 80,
    "üheksakümmend": 90, "sada": 100,
}

ET_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _ET_NUMS.items()
)

ET_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    ET_ABBREV_RULES + ET_NUMBER_RULES
)

# SL pack — dictionaries/sl content model
SL_ABBREV_RULES = _word_rules({
    "ul": "ulica", "št": "številka", "sv": "sveti", "tel": "telefon",
    "nab": "nabrežje",
})

_SL_NUMS = {
    "ena": 1, "dve": 2, "tri": 3, "štiri": 4, "pet": 5, "šest": 6,
    "sedem": 7, "osem": 8, "devet": 9, "deset": 10, "enajst": 11,
    "dvanajst": 12, "trinajst": 13, "štirinajst": 14, "petnajst": 15,
    "šestnajst": 16, "sedemnajst": 17, "osemnajst": 18,
    "devetnajst": 19, "dvajset": 20, "trideset": 30, "štirideset": 40,
    "petdeset": 50, "šestdeset": 60, "sedemdeset": 70,
    "osemdeset": 80, "devetdeset": 90, "sto": 100,
}

SL_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _SL_NUMS.items()
)

SL_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    SL_ABBREV_RULES + SL_NUMBER_RULES
)

# GL pack — dictionaries/gl content model
GL_ABBREV_RULES = _word_rules({
    "avda": "avenida", "pza": "praza", "estr": "estrada",
    "tel": "teléfono", "dr": "doutor", "sra": "señora",
})

_GL_NUMS = {
    "un": 1, "dous": 2, "tres": 3, "catro": 4, "cinco": 5, "seis": 6,
    "sete": 7, "oito": 8, "nove": 9, "dez": 10, "once": 11,
    "doce": 12, "trece": 13, "catorce": 14, "quince": 15,
    "dezaseis": 16, "dezasete": 17, "dezaoito": 18, "dezanove": 19,
    "vinte": 20, "trinta": 30, "corenta": 40, "cincuenta": 50,
    "sesenta": 60, "setenta": 70, "oitenta": 80, "noventa": 90,
    "cen": 100,
}

GL_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _GL_NUMS.items()
)

GL_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    GL_ABBREV_RULES + GL_NUMBER_RULES
)

# EU pack — dictionaries/eu content model (vigesimal compounds beyond 20
# are multiword; the plain-word alternation folds them fine)
EU_ABBREV_RULES = _word_rules({
    "kl": "kalea", "etorb": "etorbidea", "tel": "telefonoa",
    "zk": "zenbakia",
})

_EU_NUMS = {
    "bat": 1, "bi": 2, "hiru": 3, "lau": 4, "bost": 5, "sei": 6,
    "zazpi": 7, "zortzi": 8, "bederatzi": 9, "hamar": 10,
    "hamaika": 11, "hamabi": 12, "hamahiru": 13, "hamalau": 14,
    "hamabost": 15, "hamasei": 16, "hamazazpi": 17, "hemezortzi": 18,
    "hemeretzi": 19, "hogei": 20, "hogeita hamar": 30, "berrogei": 40,
    "berrogeita hamar": 50, "hirurogei": 60, "hirurogeita hamar": 70,
    "laurogei": 80, "laurogeita hamar": 90, "ehun": 100,
}

EU_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _EU_NUMS.items()
)

EU_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    EU_ABBREV_RULES + EU_NUMBER_RULES
)

# MS pack — dictionaries/ms content model (differs from ID in 8 and the
# street/number abbreviations)
MS_ABBREV_RULES = _word_rules({
    "jln": "jalan", "no": "nombor", "tmn": "taman", "kg": "kampung",
    "tel": "telefon", "lrg": "lorong",
})

_MS_NUMS = {
    "satu": 1, "dua": 2, "tiga": 3, "empat": 4, "lima": 5, "enam": 6,
    "tujuh": 7, "lapan": 8, "sembilan": 9, "sepuluh": 10,
    "sebelas": 11, "dua belas": 12, "tiga belas": 13,
    "empat belas": 14, "lima belas": 15, "enam belas": 16,
    "tujuh belas": 17, "lapan belas": 18, "sembilan belas": 19,
    "dua puluh": 20, "tiga puluh": 30, "empat puluh": 40,
    "lima puluh": 50, "enam puluh": 60, "tujuh puluh": 70,
    "lapan puluh": 80, "sembilan puluh": 90, "seratus": 100,
}

MS_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _MS_NUMS.items()
)

MS_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    MS_ABBREV_RULES + MS_NUMBER_RULES
)

# SQ pack — dictionaries/sq content model
SQ_ABBREV_RULES = _word_rules({
    "rr": "rruga", "bul": "bulevardi", "tel": "telefoni",
    "nr": "numri",
})

_SQ_NUMS = {
    "një": 1, "dy": 2, "tre": 3, "katër": 4, "pesë": 5, "gjashtë": 6,
    "shtatë": 7, "tetë": 8, "nëntë": 9, "dhjetë": 10,
    "njëmbëdhjetë": 11, "dymbëdhjetë": 12, "trembëdhjetë": 13,
    "katërmbëdhjetë": 14, "pesëmbëdhjetë": 15, "gjashtëmbëdhjetë": 16,
    "shtatëmbëdhjetë": 17, "tetëmbëdhjetë": 18, "nëntëmbëdhjetë": 19,
    "njëzet": 20, "tridhjetë": 30, "dyzet": 40, "pesëdhjetë": 50,
    "gjashtëdhjetë": 60, "shtatëdhjetë": 70, "tetëdhjetë": 80,
    "nëntëdhjetë": 90, "njëqind": 100,
}

SQ_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _SQ_NUMS.items()
)

SQ_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    SQ_ABBREV_RULES + SQ_NUMBER_RULES
)

# TL pack — dictionaries/tl content model (only the unambiguous
# single-token cardinals; hyphenated teens fold via the plain-word
# alternation, which admits internal hyphens)
TL_ABBREV_RULES = _word_rules({
    "brgy": "barangay", "blg": "bilang", "tel": "telepono",
})

_TL_NUMS = {
    "isa": 1, "dalawa": 2, "tatlo": 3, "apat": 4, "lima": 5,
    "anim": 6, "pito": 7, "walo": 8, "siyam": 9, "sampu": 10,
    "labing-isa": 11, "labindalawa": 12, "labintatlo": 13,
    "labing-apat": 14, "labinlima": 15, "labing-anim": 16,
    "labimpito": 17, "labingwalo": 18, "labinsiyam": 19,
    "dalawampu": 20, "tatlumpu": 30, "apatnapu": 40, "limampu": 50,
    "animnapu": 60, "pitumpu": 70, "walumpu": 80, "siyamnapu": 90,
}

TL_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _TL_NUMS.items()
)

TL_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    TL_ABBREV_RULES + TL_NUMBER_RULES
)

# ---------------------------------------------------------------------------
# BISCRIPT packs (ru / uk / el / bg): non-Latin-script languages whose rows
# may reach the rule pass EITHER in native script (transliterate=False) or
# romanized (transliterate=True runs latin_ascii BEFORE rules) — so every
# entry ships twice: the NFKC+casefolded native key (casefold matters:
# Greek final sigma folds to medial, "οδός" -> "οδόσ") and its latin_ascii
# twin keyed to the SAME chain the text itself goes through.
# ---------------------------------------------------------------------------


def _biscript_rules(
    abbrevs: dict[str, str], nums: dict[str, int]
) -> tuple[tuple[str, str], ...]:
    import unicodedata as _ud

    from libpostal_ray.functions.translit import latin_ascii as _la

    def _cf(s: str) -> str:
        return _ud.normalize("NFKC", s).casefold()

    rules: list[tuple[str, str]] = []
    for w, r in abbrevs.items():
        wc, rc = _cf(w), _cf(r)
        rules.append((rf"\b{wc}\b", rc))
        rw, rr = _la(wc), _la(rc)
        if rw != wc:
            rules.append((rf"\b{rw}\b", rr))
    for w, v in nums.items():
        wc = _cf(w)
        rules.append((rf"\b{wc}\b", str(v)))
        rw = _la(wc)
        if rw != wc:
            rules.append((rf"\b{rw}\b", str(v)))
    return tuple(rules)


RU_GENERAL_RULES = _biscript_rules(
    {"ул": "улица", "пр": "проспект", "пл": "площадь", "д": "дом",
     "тел": "телефон", "наб": "набережная"},
    {"один": 1, "два": 2, "три": 3, "четыре": 4, "пять": 5, "шесть": 6,
     "семь": 7, "восемь": 8, "девять": 9, "десять": 10,
     "одиннадцать": 11, "двенадцать": 12, "тринадцать": 13,
     "четырнадцать": 14, "пятнадцать": 15, "шестнадцать": 16,
     "семнадцать": 17, "восемнадцать": 18, "девятнадцать": 19,
     "двадцать": 20, "тридцать": 30, "сорок": 40, "пятьдесят": 50,
     "шестьдесят": 60, "семьдесят": 70, "восемьдесят": 80,
     "девяносто": 90, "сто": 100},
)

UK_GENERAL_RULES = _biscript_rules(
    {"вул": "вулиця", "просп": "проспект", "пл": "площа",
     "буд": "будинок", "тел": "телефон"},
    {"один": 1, "два": 2, "три": 3, "чотири": 4, "п'ять": 5,
     "шість": 6, "сім": 7, "вісім": 8, "дев'ять": 9, "десять": 10,
     "одинадцять": 11, "дванадцять": 12, "тринадцять": 13,
     "чотирнадцять": 14, "п'ятнадцять": 15, "шістнадцять": 16,
     "сімнадцять": 17, "вісімнадцять": 18, "дев'ятнадцять": 19,
     "двадцять": 20, "тридцять": 30, "сорок": 40, "п'ятдесят": 50,
     "шістдесят": 60, "сімдесят": 70, "вісімдесят": 80,
     "дев'яносто": 90, "сто": 100},
)

EL_GENERAL_RULES = _biscript_rules(
    {"οδ": "οδός", "πλ": "πλατεία", "λεωφ": "λεωφόρος",
     "τηλ": "τηλέφωνο", "αρ": "αριθμός"},
    {"ένα": 1, "δύο": 2, "τρία": 3, "τέσσερα": 4, "πέντε": 5,
     "έξι": 6, "επτά": 7, "οκτώ": 8, "εννέα": 9, "δέκα": 10,
     "έντεκα": 11, "δώδεκα": 12, "δεκατρία": 13, "δεκατέσσερα": 14,
     "δεκαπέντε": 15, "δεκαέξι": 16, "δεκαεπτά": 17, "δεκαοκτώ": 18,
     "δεκαεννέα": 19, "είκοσι": 20, "τριάντα": 30, "σαράντα": 40,
     "πενήντα": 50, "εξήντα": 60, "εβδομήντα": 70, "ογδόντα": 80,
     "ενενήντα": 90, "εκατό": 100},
)

BG_GENERAL_RULES = _biscript_rules(
    {"ул": "улица", "бул": "булевард", "пл": "площад",
     "тел": "телефон"},
    {"едно": 1, "две": 2, "три": 3, "четири": 4, "пет": 5, "шест": 6,
     "седем": 7, "осем": 8, "девет": 9, "десет": 10,
     "единадесет": 11, "дванадесет": 12, "тринадесет": 13,
     "четиринадесет": 14, "петнадесет": 15, "шестнадесет": 16,
     "седемнадесет": 17, "осемнадесет": 18, "деветнадесет": 19,
     "двадесет": 20, "тридесет": 30, "четиридесет": 40,
     "петдесет": 50, "шестдесет": 60, "седемдесет": 70,
     "осемдесет": 80, "деветдесет": 90, "сто": 100},
)

SR_GENERAL_RULES = _biscript_rules(
    {"ул": "улица", "бул": "булевар", "трг": "трг", "бр": "број",
     "тел": "телефон", "др": "доктор"},
    {"један": 1, "два": 2, "три": 3, "четири": 4, "пет": 5,
     "шест": 6, "седам": 7, "осам": 8, "девет": 9, "десет": 10,
     "једанаест": 11, "дванаест": 12, "тринаест": 13,
     "четрнаест": 14, "петнаест": 15, "шеснаест": 16,
     "седамнаест": 17, "осамнаест": 18, "деветнаест": 19,
     "двадесет": 20, "тридесет": 30, "четрдесет": 40,
     "педесет": 50, "шездесет": 60, "седамдесет": 70,
     "осамдесет": 80, "деведесет": 90, "сто": 100},
)

MK_GENERAL_RULES = _biscript_rules(
    {"ул": "улица", "бул": "булевар", "бр": "број", "тел": "телефон"},
    {"еден": 1, "два": 2, "три": 3, "четири": 4, "пет": 5,
     "шест": 6, "седум": 7, "осум": 8, "девет": 9, "десет": 10,
     "единаесет": 11, "дванаесет": 12, "тринаесет": 13,
     "четиринаесет": 14, "петнаесет": 15, "шеснаесет": 16,
     "седумнаесет": 17, "осумнаесет": 18, "деветнаесет": 19,
     "дваесет": 20, "триесет": 30, "четириесет": 40,
     "педесет": 50, "шеесет": 60, "седумдесет": 70,
     "осумдесет": 80, "деведесет": 90, "сто": 100},
)

BE_GENERAL_RULES = _biscript_rules(
    {"вул": "вуліца", "пр": "праспект", "пл": "плошча",
     "тэл": "тэлефон", "д": "дом"},
    {"адзін": 1, "два": 2, "тры": 3, "чатыры": 4, "пяць": 5,
     "шэсць": 6, "сем": 7, "восем": 8, "дзевяць": 9, "дзесяць": 10,
     "адзінаццаць": 11, "дванаццаць": 12, "трынаццаць": 13,
     "чатырнаццаць": 14, "пятнаццаць": 15, "шаснаццаць": 16,
     "сямнаццаць": 17, "васямнаццаць": 18, "дзевятнаццаць": 19,
     "дваццаць": 20, "трыццаць": 30, "сорак": 40, "пяцьдзясят": 50,
     "шэсцьдзясят": 60, "семдзесят": 70, "восемдзесят": 80,
     "дзевяноста": 90, "сто": 100},
)

# IS pack — dictionaries/is content model (ð/þ/æ fold via latin_ascii)
IS_ABBREV_RULES = _word_rules({
    "gt": "gata", "str": "stræti", "vn": "vegurinn", "s": "sími",
    "nr": "númer",
})

_IS_NUMS = {
    "einn": 1, "tveir": 2, "þrír": 3, "fjórir": 4, "fimm": 5,
    "sex": 6, "sjö": 7, "átta": 8, "níu": 9, "tíu": 10,
    "ellefu": 11, "tólf": 12, "þrettán": 13, "fjórtán": 14,
    "fimmtán": 15, "sextán": 16, "sautján": 17, "átján": 18,
    "nítján": 19, "tuttugu": 20, "þrjátíu": 30, "fjörutíu": 40,
    "fimmtíu": 50, "sextíu": 60, "sjötíu": 70, "áttatíu": 80,
    "níutíu": 90, "hundrað": 100,
}

IS_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _IS_NUMS.items()
)

IS_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    IS_ABBREV_RULES + IS_NUMBER_RULES
)

# GA pack — dictionaries/ga content model
GA_ABBREV_RULES = _word_rules({
    "sr": "sráid", "br": "bóthar", "co": "contae", "teil": "teileafón",
    "uimh": "uimhir",
})

_GA_NUMS = {
    "aon": 1, "dó": 2, "trí": 3, "ceathair": 4, "cúig": 5,
    "sé": 6, "seacht": 7, "ocht": 8, "naoi": 9, "deich": 10,
    "fiche": 20, "tríocha": 30, "daichead": 40, "caoga": 50,
    "seasca": 60, "seachtó": 70, "ochtó": 80, "nócha": 90,
    "céad": 100,
}

GA_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _GA_NUMS.items()
)

GA_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    GA_ABBREV_RULES + GA_NUMBER_RULES
)

# AF pack — dictionaries/af content model
AF_ABBREV_RULES = _word_rules({
    "str": "straat", "ln": "laan", "wg": "weg", "tel": "telefoon",
    "nr": "nommer", "posbus": "posbus",
})

_AF_NUMS = {
    "een": 1, "twee": 2, "drie": 3, "vier": 4, "vyf": 5,
    "ses": 6, "sewe": 7, "agt": 8, "nege": 9, "tien": 10,
    "elf": 11, "twaalf": 12, "dertien": 13, "veertien": 14,
    "vyftien": 15, "sestien": 16, "sewentien": 17, "agtien": 18,
    "negentien": 19, "twintig": 20, "dertig": 30, "veertig": 40,
    "vyftig": 50, "sestig": 60, "sewentig": 70, "tagtig": 80,
    "negentig": 90, "honderd": 100,
}

AF_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _AF_NUMS.items()
)

AF_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    AF_ABBREV_RULES + AF_NUMBER_RULES
)

# VI pack — dictionaries/vi content model (compound tens are multiword;
# the pack keys single words, the reference's vi dictionary likewise)
VI_ABBREV_RULES = _word_rules({
    "đ": "đường", "tp": "thành phố", "q": "quận", "p": "phường",
    "đt": "điện thoại",
})

_VI_NUMS = {
    "một": 1, "hai": 2, "ba": 3, "bốn": 4, "năm": 5,
    "sáu": 6, "bảy": 7, "tám": 8, "chín": 9, "mười": 10,
    "trăm": 100,
}

VI_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _VI_NUMS.items()
)

VI_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    VI_ABBREV_RULES + VI_NUMBER_RULES
)

# SW pack — dictionaries/sw content model
SW_ABBREV_RULES = _word_rules({
    "brb": "barabara", "mtaa": "mtaa", "slp": "sanduku la posta",
    "na": "namba",
})

_SW_NUMS = {
    "moja": 1, "mbili": 2, "tatu": 3, "nne": 4, "tano": 5,
    "sita": 6, "saba": 7, "nane": 8, "tisa": 9, "kumi": 10,
    "ishirini": 20, "thelathini": 30, "arobaini": 40, "hamsini": 50,
    "sitini": 60, "sabini": 70, "themanini": 80, "tisini": 90,
    "mia": 100,
}

SW_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _SW_NUMS.items()
)

SW_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    SW_ABBREV_RULES + SW_NUMBER_RULES
)

# CY pack — dictionaries/cy content model
CY_ABBREV_RULES = _word_rules({
    "st": "stryd", "ffd": "ffordd", "rhif": "rhif", "ffôn": "ffôn",
})

_CY_NUMS = {
    "un": 1, "dau": 2, "tri": 3, "pedwar": 4, "pump": 5,
    "chwech": 6, "saith": 7, "wyth": 8, "naw": 9, "deg": 10,
    "ugain": 20, "deugain": 40, "cant": 100,
}

CY_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _CY_NUMS.items()
)

CY_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    CY_ABBREV_RULES + CY_NUMBER_RULES
)

# MT pack — dictionaries/mt content model (ħ/għ stay distinct under
# NFKC+casefold; latin_ascii folds ħ -> h via _LATIN_SPECIAL)
MT_ABBREV_RULES = _word_rules({
    "trq": "triq", "tel": "telefon", "nru": "numru",
})

_MT_NUMS = {
    "wieħed": 1, "tnejn": 2, "tlieta": 3, "erbgħa": 4, "ħamsa": 5,
    "sitta": 6, "sebgħa": 7, "tmienja": 8, "disgħa": 9, "għaxra": 10,
    "għoxrin": 20, "tletin": 30, "erbgħin": 40, "ħamsin": 50,
    "sittin": 60, "sebgħin": 70, "tmenin": 80, "disgħin": 90,
    "mija": 100,
}

MT_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _MT_NUMS.items()
)

MT_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    MT_ABBREV_RULES + MT_NUMBER_RULES
)

# BS pack — dictionaries/bs content model (Latin script; the Cyrillic
# twin is covered by the sr pack's shared south-Slavic keys)
BS_ABBREV_RULES = _word_rules({
    "ul": "ulica", "tel": "telefon", "br": "broj", "tr": "trg",
})

_BS_NUMS = {
    "jedan": 1, "dva": 2, "tri": 3, "četiri": 4, "pet": 5,
    "šest": 6, "sedam": 7, "osam": 8, "devet": 9, "deset": 10,
    "dvadeset": 20, "trideset": 30, "četrdeset": 40, "pedeset": 50,
    "šezdeset": 60, "sedamdeset": 70, "osamdeset": 80,
    "devedeset": 90, "sto": 100,
}

BS_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _BS_NUMS.items()
)

BS_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    BS_ABBREV_RULES + BS_NUMBER_RULES
)

# AZ pack — dictionaries/az content model (Latin; ə folds to a plain
# "e"?  No: NFKC keeps ə, latin_ascii has no rule so it passes through —
# keys carry it verbatim, the biscript twin is unnecessary)
AZ_ABBREV_RULES = _word_rules({
    "küç": "küçə", "tel": "telefon", "pr": "prospekt",
})

_AZ_NUMS = {
    "bir": 1, "iki": 2, "üç": 3, "dörd": 4, "beş": 5,
    "altı": 6, "yeddi": 7, "səkkiz": 8, "doqquz": 9, "on": 10,
    "iyirmi": 20, "otuz": 30, "qırx": 40, "əlli": 50,
    "altmış": 60, "yetmiş": 70, "səksən": 80, "doxsan": 90,
    "yüz": 100,
}

AZ_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _AZ_NUMS.items()
)

AZ_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    AZ_ABBREV_RULES + AZ_NUMBER_RULES
)

# UZ pack — dictionaries/uz content model (Latin orthography with
# modifier-letter o'/g' — NFKC folds ʻ (U+02BB) to itself; keys use the
# ASCII apostrophe the canonical pass normalizes typographic quotes to)
UZ_ABBREV_RULES = _word_rules({
    "ko'ch": "ko'cha", "tel": "telefon", "uy": "uy",
})

_UZ_NUMS = {
    "bir": 1, "ikki": 2, "uch": 3, "to'rt": 4, "besh": 5,
    "olti": 6, "yetti": 7, "sakkiz": 8, "to'qqiz": 9, "o'n": 10,
    "yigirma": 20, "o'ttiz": 30, "qirq": 40, "ellik": 50,
    "oltmish": 60, "yetmish": 70, "sakson": 80, "to'qson": 90,
    "yuz": 100,
}

UZ_NUMBER_RULES: tuple[tuple[str, str], ...] = tuple(
    (rf"\b{w}\b", str(v)) for w, v in _UZ_NUMS.items()
)

UZ_GENERAL_RULES: tuple[tuple[str, str], ...] = (
    UZ_ABBREV_RULES + UZ_NUMBER_RULES
)

# ---------------------------------------------------------------------------
# Non-Latin-script packs beyond Cyrillic/Greek (dictionaries/{ar,fa,he,hi,ko}
# content model).  Same biscript discipline: every entry ships the native
# NFKC+casefolded key AND its latin_ascii twin (translit.py now romanizes
# Arabic/Hebrew/Devanagari/Hangul), so rows reaching the rule pass in either
# script state fold to one form.
# ---------------------------------------------------------------------------

AR_GENERAL_RULES = _biscript_rules(
    {"ش": "شارع", "ط": "طريق", "م": "مدينة"},
    {"واحد": 1, "اثنان": 2, "ثلاثة": 3, "أربعة": 4, "خمسة": 5,
     "ستة": 6, "سبعة": 7, "ثمانية": 8, "تسعة": 9, "عشرة": 10,
     "عشرون": 20, "ثلاثون": 30, "أربعون": 40, "خمسون": 50,
     "ستون": 60, "سبعون": 70, "ثمانون": 80, "تسعون": 90,
     "مائة": 100},
)

FA_GENERAL_RULES = _biscript_rules(
    {"خ": "خیابان", "م": "میدان"},
    {"یک": 1, "دو": 2, "سه": 3, "چهار": 4, "پنج": 5, "شش": 6,
     "هفت": 7, "هشت": 8, "نه": 9, "ده": 10, "یازده": 11,
     "دوازده": 12, "سیزده": 13, "چهارده": 14, "پانزده": 15,
     "شانزده": 16, "هفده": 17, "هجده": 18, "نوزده": 19,
     "بیست": 20, "چهل": 40, "پنجاه": 50, "شصت": 60,
     "هفتاد": 70, "هشتاد": 80, "نود": 90, "صد": 100},
)

HE_GENERAL_RULES = _biscript_rules(
    {"רח": "רחוב", "שד": "שדרות", "טל": "טלפון"},
    {"אחת": 1, "שתיים": 2, "שלוש": 3, "ארבע": 4, "חמש": 5,
     "שש": 6, "שבע": 7, "שמונה": 8, "תשע": 9, "עשר": 10,
     "עשרים": 20, "שלושים": 30, "ארבעים": 40, "חמישים": 50,
     "שישים": 60, "שבעים": 70, "שמונים": 80, "תשעים": 90,
     "מאה": 100},
)

HI_GENERAL_RULES = _biscript_rules(
    # keys must START and END on base letters (Lo): Python \b treats
    # matras/anusvara (Mc/Mn) as non-word, so marks can only sit INSIDE
    # a key ("डॉ" can never match word-bounded — it ends on the ॉ matra)
    {"नम्बर": "नंबर", "रोड": "मार्ग"},
    {"एक": 1, "दो": 2, "तीन": 3, "चार": 4, "पाँच": 5, "पांच": 5,
     "छह": 6, "सात": 7, "आठ": 8, "नौ": 9, "दस": 10,
     "ग्यारह": 11, "बारह": 12, "तेरह": 13, "चौदह": 14,
     "पंद्रह": 15, "सोलह": 16, "सत्रह": 17, "अठारह": 18,
     "उन्नीस": 19, "बीस": 20, "तीस": 30, "चालीस": 40,
     "पचास": 50, "साठ": 60, "सत्तर": 70, "अस्सी": 80,
     "नब्बे": 90, "सौ": 100},
)

KO_GENERAL_RULES = _biscript_rules(
    {"전번": "전화번호"},
    # native-Korean cardinals (the Sino-Korean series 일/이/삼 is one
    # syllable and collides with common words — the reference's ko
    # dictionary likewise keys multi-character forms)
    {"하나": 1, "둘": 2, "셋": 3, "넷": 4, "다섯": 5, "여섯": 6,
     "일곱": 7, "여덟": 8, "아홉": 9, "열": 10, "스물": 20,
     "서른": 30, "마흔": 40, "쉰": 50, "예순": 60, "일흔": 70,
     "여든": 80, "아흔": 90, "백": 100},
)

KK_GENERAL_RULES = _biscript_rules(
    {"көш": "көше", "тел": "телефон", "қ": "қала", "даң": "даңғылы"},
    {"бір": 1, "екі": 2, "үш": 3, "төрт": 4, "бес": 5,
     "алты": 6, "жеті": 7, "сегіз": 8, "тоғыз": 9, "он": 10,
     "жиырма": 20, "отыз": 30, "қырық": 40, "елу": 50,
     "алпыс": 60, "жетпіс": 70, "сексен": 80, "тоқсан": 90,
     "жүз": 100},
)

HY_GENERAL_RULES = _biscript_rules(
    {"փ": "փողոց", "պող": "պողոտա", "հեռ": "հեռախոս"},
    {"մեկ": 1, "երկու": 2, "երեք": 3, "չորս": 4, "հինգ": 5,
     "վեց": 6, "յոթ": 7, "ութ": 8, "ինը": 9, "տասը": 10,
     "քսան": 20, "երեսուն": 30, "քառասուն": 40, "հիսուն": 50,
     "վաթսուն": 60, "յոթանասուն": 70, "ութսուն": 80,
     "իննսուն": 90, "հարյուր": 100},
)

KA_GENERAL_RULES = _biscript_rules(
    {"ქ": "ქუჩა", "გამზ": "გამზირი", "ტელ": "ტელეფონი"},
    # vigesimal: the 30/50/70/90 forms are oc-da-X compounds, single words
    {"ერთი": 1, "ორი": 2, "სამი": 3, "ოთხი": 4, "ხუთი": 5,
     "ექვსი": 6, "შვიდი": 7, "რვა": 8, "ცხრა": 9, "ათი": 10,
     "ოცი": 20, "ოცდაათი": 30, "ორმოცი": 40, "ორმოცდაათი": 50,
     "სამოცი": 60, "სამოცდაათი": 70, "ოთხმოცი": 80,
     "ოთხმოცდაათი": 90, "ასი": 100},
)


# ---------------------------------------------------------------------------
# Final packs completing the reference's FULL dictionaries/ language list
# (dictionaries/{ast,br,gd,gsw,lb,oc,pap} Latin minority languages and
# dictionaries/{ja,zh,th,ur,si} non-Latin).  CJK/Thai/Sinhala caveat,
# matching the reference's own phrase-dictionary model: entries match as
# standalone word-bounded tokens (kanji numerals inside a larger Han run
# deliberately do NOT fire — no segmenter here, none in scope); kana and
# Thai keys still get latin_ascii twins (translit.py romanizes those
# scripts), Han/Sinhala keys are native-only (latin_ascii passes them
# through, so _biscript_rules skips the twin automatically).
# ---------------------------------------------------------------------------

AST_GENERAL_RULES: tuple[tuple[str, str], ...] = _word_rules({
    "avda": "avenida", "tel": "telefonu",
}) + tuple((rf"\b{w}\b", str(v)) for w, v in {
    "dos": 2, "tres": 3, "cuatro": 4, "cinco": 5,
    "seis": 6, "siete": 7, "ocho": 8, "nueve": 9, "diez": 10,
    "venti": 20, "trenta": 30, "cuarenta": 40, "cincuenta": 50,
    "sesenta": 60, "setenta": 70, "ochenta": 80, "noventa": 90,
    "cien": 100,
}.items())

BR_GENERAL_RULES: tuple[tuple[str, str], ...] = _word_rules({
    "str": "straed", "pgz": "pennger",
}) + tuple((rf"\b{w}\b", str(v)) for w, v in {
    "unan": 1, "daou": 2, "tri": 3, "pevar": 4, "pemp": 5,
    "c'hwec'h": 6, "seizh": 7, "eizh": 8, "nav": 9, "dek": 10,
    "ugent": 20, "tregont": 30, "kant": 100,
}.items())

GD_GENERAL_RULES: tuple[tuple[str, str], ...] = _word_rules({
    "sr": "sràid", "fon": "fòn",
}) + tuple((rf"\b{w}\b", str(v)) for w, v in {
    "aon": 1, "dhà": 2, "dà": 2, "trì": 3, "ceithir": 4,
    "còig": 5, "sia": 6, "seachd": 7, "ochd": 8, "naoi": 9,
    "deich": 10, "fichead": 20, "ceud": 100,
}.items())

GSW_GENERAL_RULES: tuple[tuple[str, str], ...] = _word_rules({
    "str": "strass",
}) + tuple((rf"\b{w}\b", str(v)) for w, v in {
    "eis": 1, "zwöi": 2, "drü": 3, "vier": 4, "föif": 5,
    "sächs": 6, "sibe": 7, "acht": 8, "nün": 9, "zäh": 10,
    "zwänzg": 20, "drissg": 30, "hundert": 100,
}.items())

LB_GENERAL_RULES: tuple[tuple[str, str], ...] = _word_rules({
    "str": "strooss", "tel": "telefon",
}) + tuple((rf"\b{w}\b", str(v)) for w, v in {
    "eent": 1, "zwee": 2, "dräi": 3, "véier": 4, "fënnef": 5,
    "sechs": 6, "siwen": 7, "aacht": 8, "néng": 9, "zéng": 10,
    "zwanzeg": 20, "drësseg": 30, "honnert": 100,
}.items())

OC_GENERAL_RULES: tuple[tuple[str, str], ...] = _word_rules({
    "av": "avenguda", "tel": "telefòn",
}) + tuple((rf"\b{w}\b", str(v)) for w, v in {
    "dos": 2, "tres": 3, "quatre": 4, "cinc": 5,
    "sièis": 6, "sèt": 7, "uèch": 8, "nòu": 9, "dètz": 10,
    "vint": 20, "trenta": 30, "quaranta": 40, "cinquanta": 50,
    "seissanta": 60, "setanta": 70, "ochanta": 80, "nonanta": 90,
    "cent": 100,
}.items())

PAP_GENERAL_RULES: tuple[tuple[str, str], ...] = _word_rules({
    "tel": "telefon",
}) + tuple((rf"\b{w}\b", str(v)) for w, v in {
    "dos": 2, "tres": 3, "kuater": 4, "sinku": 5,
    "shete": 7, "ocho": 8, "nuebe": 9, "dies": 10,
    "binti": 20, "trinta": 30, "kuarenta": 40, "sinkuenta": 50,
    "sesenta": 60, "setenta": 70, "ochenta": 80, "nobenta": 90,
    "shen": 100,
}.items())

# ja: kanji numerals (standalone-token semantics; 第三 stays) + kana
# cardinals, which DO get romaji twins via the kana romanization
JA_GENERAL_RULES = _biscript_rules(
    {"でんわ": "電話"},
    {"一": 1, "二": 2, "三": 3, "四": 4, "五": 5, "六": 6,
     "七": 7, "八": 8, "九": 9, "十": 10, "百": 100,
     "ひとつ": 1, "ふたつ": 2, "みっつ": 3, "よっつ": 4,
     "いつつ": 5, "むっつ": 6, "ななつ": 7, "やっつ": 8,
     "ここのつ": 9, "とお": 10},
)

ZH_GENERAL_RULES = _biscript_rules(
    {},
    {"一": 1, "二": 2, "三": 3, "四": 4, "五": 5, "六": 6,
     "七": 7, "八": 8, "九": 9, "十": 10,
     "二十": 20, "三十": 30, "四十": 40, "五十": 50,
     "六十": 60, "七十": 70, "八十": 80, "九十": 90,
     "一百": 100, "百": 100},
)

TH_GENERAL_RULES = _biscript_rules(
    {"ถ": "ถนน", "ทล": "ทางหลวง"},
    {"หนึ่ง": 1, "สอง": 2, "สาม": 3, "สี่": 4, "ห้า": 5,
     "หก": 6, "เจ็ด": 7, "แปด": 8, "เก้า": 9, "สิบ": 10,
     "ยี่สิบ": 20, "สามสิบ": 30, "สี่สิบ": 40, "ห้าสิบ": 50,
     "ร้อย": 100},
)

UR_GENERAL_RULES = _biscript_rules(
    {"ٹیل": "ٹیلیفون", "سڑ": "سڑک"},
    {"ایک": 1, "دو": 2, "تین": 3, "چار": 4, "پانچ": 5,
     "چھ": 6, "سات": 7, "آٹھ": 8, "نو": 9, "دس": 10,
     "بیس": 20, "تیس": 30, "چالیس": 40, "پچاس": 50,
     "ساٹھ": 60, "ستر": 70, "اسی": 80, "نوے": 90, "سو": 100},
)

SI_GENERAL_RULES = _biscript_rules(
    {"දුක": "දුරකථන"},
    {"එක": 1, "දෙක": 2, "තුන": 3, "හතර": 4, "පහ": 5,
     "හය": 6, "හත": 7, "අට": 8, "නවය": 9, "දහය": 10,
     "විස්ස": 20, "තිහ": 30, "සියය": 100},
)

# per-language registry: pick by the corpus lang column, concatenate for
# mixed corpora (rule order = pack order; later packs never see earlier
# packs' outputs within one word because replacements are full words)
LANG_RULE_PACKS: dict[str, tuple[tuple[str, object], ...]] = {
    "en": EN_GENERAL_RULES,
    "es": ES_GENERAL_RULES,
    "fr": FR_GENERAL_RULES,
    "de": DE_GENERAL_RULES,
    "pt": PT_GENERAL_RULES,
    "it": IT_GENERAL_RULES,
    "nl": NL_GENERAL_RULES,
    "sv": SV_GENERAL_RULES,
    "da": DA_GENERAL_RULES,
    "no": NO_GENERAL_RULES,
    "pl": PL_GENERAL_RULES,
    "cs": CS_GENERAL_RULES,
    "fi": FI_GENERAL_RULES,
    "tr": TR_GENERAL_RULES,
    "ro": RO_GENERAL_RULES,
    "hu": HU_GENERAL_RULES,
    "ca": CA_GENERAL_RULES,
    "id": ID_GENERAL_RULES,
    "sk": SK_GENERAL_RULES,
    "hr": HR_GENERAL_RULES,
    "lt": LT_GENERAL_RULES,
    "lv": LV_GENERAL_RULES,
    "et": ET_GENERAL_RULES,
    "sl": SL_GENERAL_RULES,
    "gl": GL_GENERAL_RULES,
    "eu": EU_GENERAL_RULES,
    "ms": MS_GENERAL_RULES,
    "sq": SQ_GENERAL_RULES,
    "tl": TL_GENERAL_RULES,
    "ru": RU_GENERAL_RULES,
    "uk": UK_GENERAL_RULES,
    "el": EL_GENERAL_RULES,
    "bg": BG_GENERAL_RULES,
    "sr": SR_GENERAL_RULES,
    "mk": MK_GENERAL_RULES,
    "be": BE_GENERAL_RULES,
    "is": IS_GENERAL_RULES,
    "ga": GA_GENERAL_RULES,
    "af": AF_GENERAL_RULES,
    "ar": AR_GENERAL_RULES,
    "fa": FA_GENERAL_RULES,
    "he": HE_GENERAL_RULES,
    "hi": HI_GENERAL_RULES,
    "ko": KO_GENERAL_RULES,
    "vi": VI_GENERAL_RULES,
    "sw": SW_GENERAL_RULES,
    "cy": CY_GENERAL_RULES,
    "mt": MT_GENERAL_RULES,
    "bs": BS_GENERAL_RULES,
    "az": AZ_GENERAL_RULES,
    "uz": UZ_GENERAL_RULES,
    "kk": KK_GENERAL_RULES,
    "hy": HY_GENERAL_RULES,
    "ka": KA_GENERAL_RULES,
    "ast": AST_GENERAL_RULES,
    "br": BR_GENERAL_RULES,
    "gd": GD_GENERAL_RULES,
    "gsw": GSW_GENERAL_RULES,
    "lb": LB_GENERAL_RULES,
    "oc": OC_GENERAL_RULES,
    "pap": PAP_GENERAL_RULES,
    "ja": JA_GENERAL_RULES,
    "zh": ZH_GENERAL_RULES,
    "th": TH_GENERAL_RULES,
    "ur": UR_GENERAL_RULES,
    "si": SI_GENERAL_RULES,
    # ISO-code aliases the reference ships as separate dictionary dirs
    "fil": TL_GENERAL_RULES,
    "nb": NO_GENERAL_RULES,
    # latin: Roman numerals, exactly the reference's lang="la" routing
    # (numex.c:1260-1335); opt-in because english prose contains valid
    # accidental numerals
    "la": ROMAN_NUMERAL_RULES,
}


# ---------------------------------------------------------------------------
# File-driven dictionary packs — the reference's data-file model
# (resources/dictionaries/<lang>/<dict>.txt compiled by
# address_dictionary_builder.c:1-200): pack CONTENT grows by editing plain
# text files, no code changes.  Line format is the reference's own:
#
#     canonical|variant1|variant2...      ("street|st|str")
#
# — every variant becomes a full-word rewrite to the canonical form.  Each
# form is NFKC+casefolded like the in-code packs, and any form whose
# latin_ascii transliteration differs gets the romanized twin rule too
# (the _biscript_rules discipline), so Cyrillic/Greek/Arabic-script files
# work with no per-language loader code.  File rules APPEND to the
# in-code pack for the language (code rules run first; all are plain-word
# rules, so compile_rules folds each pack into one alternation pass).
# ---------------------------------------------------------------------------

_DICT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "resources",
    "dictionaries",
)


def parse_dictionary_lines(lines) -> dict[str, str]:
    """``canonical|variant...`` lines -> {variant: canonical} (skips
    blanks, ``#`` comments, and single-form lines)."""
    out: dict[str, str] = {}
    for line in lines:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        forms = [f.strip() for f in line.split("|") if f.strip()]
        if len(forms) < 2:
            continue
        canon = forms[0]
        for v in forms[1:]:
            out[v] = canon
    return out


def _pack_plain_words(rules) -> set[str]:
    """The set of plain words an existing rule pack already rewrites
    (pattern shape \\b<word>\\b) — file entries for those words are
    DROPPED so data files can only ADD content, never silently override
    an in-code rule inside the folded alternation's dict."""
    out: set[str] = set()
    for pat, _ in rules:
        if not isinstance(pat, str):
            continue
        m = re.fullmatch(r"\\b(.*)\\b", pat)
        if m:
            out.add(re.sub(r"\\(.)", r"\1", m.group(1)))
    return out


def _file_pack_rules(
    entries: dict[str, str], reserved: set[str] | None = None
) -> tuple[tuple[str, str], ...]:
    """Variant->canonical entries to word rules with biscript twins.
    Skips variants the in-code pack already maps (``reserved``) and any
    form whose casefolded/romanized text has no word character — a
    wordless pattern would degenerate to \\b\\b and fire at every word
    boundary (the Thai-sign failure mode caught by the pack fixtures)."""
    import unicodedata as _ud

    from libpostal_ray.functions.translit import latin_ascii as _la

    def _cf(s: str) -> str:
        return _ud.normalize("NFKC", s).casefold()

    reserved = reserved or set()
    rules: list[tuple[str, str]] = []
    for w, r in entries.items():
        wc, rc = _cf(w), _cf(r)
        if wc in reserved or not re.search(r"\w", wc):
            continue
        rules.append((rf"\b{re.escape(wc)}\b", rc))
        rw, rr = _la(wc), _la(rc)
        if rw != wc and rw not in reserved and re.search(r"\w", rw):
            rules.append((rf"\b{re.escape(rw)}\b", rr))
    return tuple(rules)


def load_dictionary_entries(
    base_dir: str | None = None,
) -> dict[str, dict[str, str]]:
    """Walk ``<base_dir>/<lang>/*.txt`` into per-language
    {variant: canonical} maps.  Deterministic: languages and files load
    in sorted order; later files override earlier variants of the same
    word (dict semantics)."""
    base = os.path.abspath(base_dir or _DICT_DIR)
    packs: dict[str, dict[str, str]] = {}
    if not os.path.isdir(base):
        return packs
    for lang in sorted(os.listdir(base)):
        d = os.path.join(base, lang)
        if not os.path.isdir(d):
            continue
        entries: dict[str, str] = {}
        for fn in sorted(os.listdir(d)):
            if not fn.endswith(".txt"):
                continue
            with open(os.path.join(d, fn), encoding="utf-8") as fh:
                entries.update(parse_dictionary_lines(fh))
        if entries:
            packs[lang.lower()] = entries
    return packs


def load_dictionary_packs(
    base_dir: str | None = None,
) -> dict[str, tuple[tuple[str, str], ...]]:
    """File rule packs, unfiltered (no in-code pack to defer to) — the
    standalone form for tests and external corpora."""
    return {
        lang: _file_pack_rules(entries)
        for lang, entries in load_dictionary_entries(base_dir).items()
    }


FILE_DICT_PACKS: dict[str, tuple[tuple[str, str], ...]] = {}
for _lang, _entries in load_dictionary_entries().items():
    _code = tuple(LANG_RULE_PACKS.get(_lang, ()))
    _rules = _file_pack_rules(_entries, _pack_plain_words(_code))
    FILE_DICT_PACKS[_lang] = _rules
    LANG_RULE_PACKS[_lang] = _code + _rules
# ISO aliases re-point AFTER the merge (tuples are immutable — without
# this, "fil"/"nb" would keep referencing the pre-merge tl/no packs)
LANG_RULE_PACKS["fil"] = LANG_RULE_PACKS["tl"]
LANG_RULE_PACKS["nb"] = LANG_RULE_PACKS["no"]

# Latin-1 supplement + Latin Extended-A letter ranges (× U+00D7 and
# ÷ U+00F7 excluded) so SV/DA/NO/PL pack entries fold into the combined
# pass and get the trailing-period consumption like ASCII entries
_PLAIN_WORD_RE = re.compile(
    r"^\\b([A-Za-z0-9À-ÖØ-öø-ÿĀ-ſə"
    r"Ͱ-ϿЀ-ӿա-ֆ֐-ת؀-ۿऀ-ॿก-๛ა-ჿ"
    r"ᄀ-ᇿぁ-ヿㄱ-ㅣ가-힣' -]+)\\b$"
)


def compile_rules(rules) -> list[tuple["re.Pattern[str]", object]]:
    """Compile a (pattern, replacement) rewrite-rule table (the
    resources/dictionaries analog, expand.c:724-1366) — done once per worker.

    Optimization: a consecutive RUN of plain-word rules (pattern is exactly
    \\b<literal>\\b with a literal replacement) folds into ONE combined
    alternation regex + dict lookup, so a 200-entry pack costs one pass, not
    200.  Rule order semantics are preserved: folding never crosses a
    non-plain rule, and within a run the longest alternative is tried first
    (regex alternation is first-match, so entries are sorted by length)."""
    rules = list(rules or ())
    out: list[tuple[re.Pattern[str], object]] = []
    run: list[tuple[str, str]] = []

    # a replaced word may consume ONE trailing period when followed by
    # whitespace or end ("Avda. x" -> "avenida x") — the reference's
    # DELETE_FINAL_PERIOD / DELETE_ACRONYM_PERIODS normalize options
    # (normalize.h:23-40); the lookahead keeps "co.uk" intact
    _dot = r"(?:\.(?=\s|$))?"
    # mark-aware word boundaries for the folded plain-word rules: Python
    # \b treats dependent vowel signs (Mc, e.g. Devanagari matras) as
    # NON-word, so \bदो\b can never match ("दो" ends on the ो matra).
    # Lookarounds over [\w + Devanagari block] behave exactly like \b for
    # keys edged by ordinary letters and additionally refuse to split a
    # letter from its combining signs.
    _bl = r"(?<![\wऀ-ॿ])"
    _br = r"(?![\wऀ-ॿ])"

    def flush() -> None:
        if not run:
            return
        if len(run) == 1:
            out.append(
                (
                    re.compile(_bl + re.escape(run[0][0]) + _br + _dot),
                    run[0][1],
                )
            )
        else:
            mapping = {w: r for w, r in run}
            alts = sorted(mapping, key=len, reverse=True)
            pat = re.compile(
                _bl + "(" + "|".join(re.escape(w) for w in alts) + ")"
                + _br + _dot
            )
            out.append((pat, lambda m, _m=mapping: _m[m.group(1)]))
        run.clear()

    for p, r in rules:
        m = _PLAIN_WORD_RE.match(p)
        if m is not None and isinstance(r, str) and "\\" not in r:
            run.append((m.group(1), r))
        else:
            flush()
            out.append((re.compile(p), r))
    flush()
    return out


def canonicalize_one(
    text: str,
    *,
    fold_case: bool = True,
    collapse_whitespace: bool = True,
    strip_comments: bool = False,
    transliterate: bool = False,
    compiled_rules: list | None = None,
) -> str:
    if text is None:
        return ""
    # ASCII fast path for the default rule set (the reference has the same
    # trick, normalize.c:200-349): NFKC is identity on ASCII, casefold ==
    # lower, and split/join == ws-collapse+strip — ~3x faster, identical
    # output (covered by an equivalence unit test).  The latin-ascii
    # transliteration chain is identity on ASCII too, so it never disables
    # this path.
    if (
        not strip_comments
        and fold_case
        and collapse_whitespace
        and not compiled_rules
        and text.isascii()
    ):
        return " ".join(text.split()).lower()
    s = unicodedata.normalize("NFKC", text)
    if fold_case:
        s = s.casefold()
    if transliterate and not s.isascii():
        from libpostal_ray.functions.translit import latin_ascii

        s = latin_ascii(s)
    if strip_comments:
        s = _BLOCK_COMMENT_RE.sub(" ", s)
        s = _LINE_COMMENT_RE.sub(" ", s)
    if compiled_rules:
        for pat, repl in compiled_rules:
            s = pat.sub(repl, s)
    if collapse_whitespace:
        s = _WS_RE.sub(" ", s).strip()
    return s


def canonicalize_array(
    texts,
    *,
    fold_case: bool = True,
    collapse_whitespace: bool = True,
    strip_comments: bool = False,
    transliterate: bool = False,
) -> np.ndarray:
    """Vectorized-enough canonicalization (regex/casefold are C-level; the
    loop is over rows, not chars). Returns object ndarray of str."""
    return np.array(
        [
            canonicalize_one(
                t,
                fold_case=fold_case,
                collapse_whitespace=collapse_whitespace,
                strip_comments=strip_comments,
                transliterate=transliterate,
            )
            for t in texts
        ],
        dtype=object,
    )


# ---------------------------------------------------------------------------
# Arrow-buffer-level canonicalization — the scale path.
#
# The default rule set (NFKC + casefold + ws-collapse) is, on ASCII bytes,
# exactly: lowercase + collapse whitespace runs to one space + strip ends.
# Those are pure byte operations, so the whole batch is canonicalized as ONE
# numpy pass over the column's UTF-8 value buffer — no per-row Python str is
# ever created.  Non-ASCII rows (rare in code) fall back to canonicalize_one
# and are spliced into the output array.  Equivalence with the per-row path
# is covered by a property test (tests/test_functions.py).
# ---------------------------------------------------------------------------

# Python str.split() (the per-row fast path) splits on these ASCII bytes:
# \t \n \v \f \r \x1c \x1d \x1e \x1f and space.
_ASCII_WS = np.zeros(256, dtype=bool)
for _b in (9, 10, 11, 12, 13, 28, 29, 30, 31, 32):
    _ASCII_WS[_b] = True
_ASCII_LOWER = np.arange(256, dtype=np.uint8)
_ASCII_LOWER[65:91] += 32


def large_string_view(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (data uint8, offsets int64) view of a large_string Array.
    Offsets are rebased to 0; data is the exact byte range of the values."""
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=np.int64, count=len(arr) + 1, offset=arr.offset * 8)
    if bufs[2] is None:
        return np.empty(0, dtype=np.uint8), off - off[0] if len(off) else off
    data = np.frombuffer(bufs[2], dtype=np.uint8, count=int(off[-1] - off[0]), offset=int(off[0]))
    return data, (off - off[0]).astype(np.int64)


def ascii_canonicalize_buffer(
    data: np.ndarray, offsets: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """lower + ws-collapse + strip over a concatenated ASCII byte buffer.

    data: (N,) uint8; offsets: (n+1,) int64 row bounds.  Returns
    (out_data uint8, out_offsets int64) where row i's canonical bytes are
    out_data[out_offsets[i]:out_offsets[i+1]] — and rows tile the output
    buffer contiguously, so it IS a valid Arrow string layout.
    """
    n = offsets.shape[0] - 1
    N = data.shape[0]
    if N == 0:
        return np.empty(0, dtype=np.uint8), np.zeros(n + 1, dtype=np.int64)
    ws = _ASCII_WS[data]
    nonws = ~ws
    # word starts: non-ws byte preceded by ws or by a row boundary
    prev_ws = np.empty(N, dtype=bool)
    prev_ws[0] = True
    prev_ws[1:] = ws[:-1]
    prev_ws[offsets[:-1][offsets[:-1] < N]] = True
    word_start = nonws & prev_ws
    # a separator space is emitted before every word EXCEPT a row's first;
    # row-firsts are cleared via searchsorted over the word-start positions
    # (n row probes — no full-buffer int64 intermediate)
    sep = word_start  # mutated in place below
    wpos = np.flatnonzero(word_start)
    if wpos.size:
        idx = np.searchsorted(wpos, offsets[:-1])
        cand = np.minimum(idx, wpos.shape[0] - 1)
        in_row = (idx < wpos.shape[0]) & (wpos[cand] < offsets[1:])
        sep[wpos[cand[in_row]]] = False
    # emitted bytes: every non-ws byte, plus one space per separator;
    # positions fit int32 (a batch buffer is far below 2 GB)
    emit8 = nonws.astype(np.int8)
    emit8 += sep
    c = np.cumsum(emit8, dtype=np.int32)
    out = np.full(int(c[-1]), 32, dtype=np.uint8)  # spaces pre-filled
    nz = np.flatnonzero(nonws)
    out[c[nz] - 1] = _ASCII_LOWER[data[nz]]
    off_idx = np.maximum(offsets - 1, 0)
    out_offsets = np.where(offsets == 0, 0, c[off_idx]).astype(np.int64)
    return out, out_offsets


def basic_canonicalize_array(texts) -> np.ndarray:
    """The SQL-expressible subset used by the DuckDB oracle parity query:
    lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) — no NFKC/casefold so
    both engines compute the identical function."""
    return np.array(
        [_WS_RE.sub(" ", t or "").strip().lower() for t in texts], dtype=object
    )
