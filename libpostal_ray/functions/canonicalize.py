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

import re
import unicodedata

import numpy as np

_WS_RE = re.compile(r"\s+")
# Comment folding: line comments (// #) and block comments (/* */) — a
# deliberately simple, language-agnostic approximation; exact lexing is out of
# scope (the reference's dictionaries are likewise approximate phrase lists).
_LINE_COMMENT_RE = re.compile(r"(//|#)[^\n]*")
_BLOCK_COMMENT_RE = re.compile(r"/\*.*?\*/", re.S)


def canonicalize_one(
    text: str,
    *,
    fold_case: bool = True,
    collapse_whitespace: bool = True,
    strip_comments: bool = False,
) -> str:
    if text is None:
        return ""
    # ASCII fast path for the default rule set (the reference has the same
    # trick, normalize.c:200-349): NFKC is identity on ASCII, casefold ==
    # lower, and split/join == ws-collapse+strip — ~3x faster, identical
    # output (covered by an equivalence unit test).
    if (
        not strip_comments
        and fold_case
        and collapse_whitespace
        and text.isascii()
    ):
        return " ".join(text.split()).lower()
    s = unicodedata.normalize("NFKC", text)
    if fold_case:
        s = s.casefold()
    if strip_comments:
        s = _BLOCK_COMMENT_RE.sub(" ", s)
        s = _LINE_COMMENT_RE.sub(" ", s)
    if collapse_whitespace:
        s = _WS_RE.sub(" ", s).strip()
    return s


def canonicalize_array(
    texts,
    *,
    fold_case: bool = True,
    collapse_whitespace: bool = True,
    strip_comments: bool = False,
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
            )
            for t in texts
        ],
        dtype=object,
    )


def basic_canonicalize_array(texts) -> np.ndarray:
    """The SQL-expressible subset used by the DuckDB oracle parity query:
    lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) — no NFKC/casefold so
    both engines compute the identical function."""
    return np.array(
        [_WS_RE.sub(" ", t or "").strip().lower() for t in texts], dtype=object
    )
