"""Acronym blocking keys for short name-like rows.

Plays the role of the reference's acronym key family
(near_dupe.c:416-559): a multi-token name emits the run-together first
letters of its word tokens — once WITH stopwords included and once with
stopwords dropped — as extra blocking keys, while a short single-token
row emits its own token under the same key space.  That is how
"international business machines" and "ibm" land in one LSH bucket even
though no textual sketch connects them; verification then decides
(NEEDS_REVIEW -> the refine tier's acronym_alignment check).

Key encoding (2 int64 columns, mirroring the phonetic pair):

- ``acr``: multi-token row -> +hash(first letters, stopwords INCLUDED);
  single-token row -> **-hash(token)** — the SIGN marks the self form,
  so the verify stage can require the reference's asymmetric shape (one
  side is a literal acronym token, the other a spelled-out phrase)
  without an extra column.  Band keys emit the ABSOLUTE value (groupby
  keys must be non-negative, CLAUDE.md).
- ``acr2``: multi-token row -> +hash(first letters, stopwords DROPPED)
  when that differs from ``acr`` and >= 2 letters remain; else 0.
  Single-token rows: always 0.

Hashes are 63-bit FNV-1a salt-mixed into their own key space (disjoint
from MinHash/SimHash/phonetic keys whp).  Acronyms shorter than 2 or
longer than ``max_tokens`` letters emit nothing (single-letter buckets
would be pure noise; very long acronyms never match a real token).
Python loop — callers pass SHORT rows only, like the phonetic family.
"""

from __future__ import annotations

import numpy as np

_ACRONYM_SALT = np.uint64(0xBF58476D1CE4E5B9)

# articles/conjunctions/prepositions the reference's stopword dictionaries
# drop when building the no-stopword acronym variant (en/es/fr/de/pt core)
ACRONYM_STOPWORDS = frozenset(
    """the of and a an for in on at to by or de la le les du des el los
    las y der die das und von van do da dos e et l d""".split()
)


def _acr_hash(s: str) -> int:
    """63-bit FNV-1a of ``s`` mixed into the acronym key space."""
    if not s:
        return 0
    h = np.uint64(0xCBF29CE484222325)
    with np.errstate(over="ignore"):
        for b in s.encode():
            h = (h ^ np.uint64(b)) * np.uint64(0x100000001B3)
        h = (h * _ACRONYM_SALT) & np.uint64(0x7FFFFFFFFFFFFFFF)
    return int(h) or 1


def acronym_row_keys(text: str, max_tokens: int = 12) -> tuple[int, int]:
    """(acr, acr2) signed key pair for one canonical text (see module
    docstring).  Word tokens are the whitespace tokens that start with a
    letter; tokens are already case-folded by canonicalization."""
    toks = [t for t in (text or "").split() if t and t[0].isalpha()]
    if not toks or len(toks) > max_tokens:
        return 0, 0
    if len(toks) == 1:
        t = toks[0].replace(".", "")
        if 2 <= len(t) <= max_tokens:
            return -_acr_hash(t), 0  # self form: negative marks it
        return 0, 0
    with_stop = "".join(t[0] for t in toks)
    acr = _acr_hash(with_stop) if len(with_stop) >= 2 else 0
    kept = [t for t in toks if t not in ACRONYM_STOPWORDS]
    no_stop = "".join(t[0] for t in kept)
    acr2 = (
        _acr_hash(no_stop)
        if len(no_stop) >= 2 and no_stop != with_stop
        else 0
    )
    return acr, acr2


def acronym_key_arrays(
    texts: list[str], max_tokens: int = 12
) -> tuple[np.ndarray, np.ndarray]:
    """((n,), (n,)) int64 (acr, acr2) signed key pairs."""
    n = len(texts)
    a1 = np.zeros(n, dtype=np.int64)
    a2 = np.zeros(n, dtype=np.int64)
    for i, t in enumerate(texts):
        a1[i], a2[i] = acronym_row_keys(t, max_tokens)
    return a1, a2
