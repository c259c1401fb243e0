"""Pattern redaction — PII scrubbing and contamination-string masking.

A training-data pipeline redacts emails / URLs / long digit runs (PII) and
masks known contamination strings (benchmark canaries, blocklisted terms)
before anything downstream sees the text.  The reference's analog is the
dictionary-driven phrase replacement pass (expand.c:724-1366) — here the
"dictionary" is a compiled RE2 pattern list applied with Arrow's vectorized
regex kernels (pyarrow.compute.replace_substring_regex), zero Python per
row.  DuckDB's regexp_replace is also RE2, which is what makes the oracle
row byte-exact.

Patterns are applied IN ORDER (earlier replacements can consume text later
patterns would match); match counts are taken on the ORIGINAL text per
pattern and summed.  Both conventions are mirrored in the oracle SQL.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (pattern, replacement) — RE2 syntax, shared verbatim with the oracle SQL.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"https?://[^\s]+", "<URL>"),
    (r"[0-9]{3,}", "<NUM>"),
]


def mask_terms_pattern(terms: list[str]) -> str:
    """Word-bounded alternation for a contamination/canary term list."""
    return r"\b(" + "|".join(terms) + r")\b"


def redact_column(
    strings: pa.ChunkedArray | pa.Array,
    patterns: list[tuple[str, str]],
) -> tuple[pa.Array, pa.Array]:
    """Apply ``patterns`` in order; return (redacted, n_masked_per_row).

    n_masked counts matches of every pattern on the ORIGINAL text (the
    audit number a redaction report wants: how many spans were hit)."""
    total = None
    for pat, _ in patterns:
        c = pc.count_substring_regex(strings, pattern=pat).cast(pa.int64())
        total = c if total is None else pc.add(total, c)
    out = strings
    for pat, rep in patterns:
        out = pc.replace_substring_regex(out, pattern=pat, replacement=rep)
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    if isinstance(total, pa.ChunkedArray):
        total = total.combine_chunks()
    return out, total
