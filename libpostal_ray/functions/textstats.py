"""Text-analysis kernels: token counting, quality scoring, language ID,
document fingerprinting.

Role analogs in the reference:
  * tokenizer + token-type stats  -> scanner.re:7 (scan_token), token types
    libpostal.h:30-85.
  * language classifier           -> language_classifier.c:62-150 (trained
    multinomial LR); ours is an n-gram/stopword heuristic — no trained model
    in this environment, same per-row classifier shape.
  * fingerprinting                -> the near-dupe key philosophy
    (near_dupe.c): cheap deterministic per-doc keys; we use winnowed rolling
    hashes (Schleimer et al., SIGMOD'03 winnowing).
"""

from __future__ import annotations

import re

import numpy as np

from libpostal_ray.functions.hashing import as_key_i64, rolling_shingle_hashes

# BPE-ish token regex: words, numbers, or single non-space symbols
TOKEN_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")

# tiny per-language stopword lists for the heuristic language id — the lang
# values present in the driver's documents table
_STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "for", "on", "with"},
    "es": {"el", "la", "de", "y", "en", "que", "los", "las", "un", "una"},
    "de": {"der", "die", "das", "und", "in", "von", "zu", "mit", "den", "ist"},
    "fr": {"le", "la", "de", "et", "les", "des", "en", "un", "une", "est"},
    "zh": set(),  # CJK: detected by script ratio, not stopwords
}


def whitespace_token_count(texts) -> np.ndarray:
    """len(text.split()) — identical semantics to the DuckDB oracle
    expression length(regexp_split_to_array(trim(text),'\\s+'))."""
    return np.array([len((t or "").split()) for t in texts], dtype=np.int64)


def bpe_ish_token_count(texts) -> np.ndarray:
    """Count of TOKEN_RE matches — a tokenizer-shaped proxy for BPE token
    budgeting (scanner.re analog: words / numerics / symbol classes)."""
    return np.array(
        [len(TOKEN_RE.findall(t or "")) for t in texts], dtype=np.int64
    )


def distinct_word_count(texts) -> np.ndarray:
    return np.array([len(set((t or "").split())) for t in texts], dtype=np.int64)


def quality_features(texts) -> dict[str, np.ndarray]:
    """Deterministic quality-scoring features, all integerized so the DuckDB
    oracle computes the identical values (no float-accumulation ambiguity):
      n_chars, n_words, n_distinct_words, max_word_len,
      alpha_chars (count of [a-zA-Z]), digit_chars, space_chars.
    """
    n = len(texts)
    out = {
        "n_chars": np.empty(n, dtype=np.int64),
        "n_words": np.empty(n, dtype=np.int64),
        "n_distinct_words": np.empty(n, dtype=np.int64),
        "max_word_len": np.empty(n, dtype=np.int64),
        "alpha_chars": np.empty(n, dtype=np.int64),
        "digit_chars": np.empty(n, dtype=np.int64),
        "space_chars": np.empty(n, dtype=np.int64),
    }
    # char-class counts are vectorized over the concatenated UTF-8 bytes:
    # ASCII classes ([A-Za-z], [0-9], ' ') only match ASCII BYTES, and in
    # UTF-8 every byte of a multi-byte char is >= 0x80 — so byte counting is
    # exact for any input.  n_chars = bytes - continuation bytes.
    enc = [(t or "").encode("utf-8") for t in texts]
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=n)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    buf = np.frombuffer(b"".join(enc), dtype=np.uint8)

    def seg_count(mask: np.ndarray) -> np.ndarray:
        c = np.zeros(buf.shape[0] + 1, dtype=np.int64)
        np.cumsum(mask, out=c[1:])
        return c[offs[1:]] - c[offs[:-1]]

    alpha = ((buf >= 65) & (buf <= 90)) | ((buf >= 97) & (buf <= 122))
    out["alpha_chars"][:] = seg_count(alpha)
    out["digit_chars"][:] = seg_count((buf >= 48) & (buf <= 57))
    out["space_chars"][:] = seg_count(buf == 32)
    cont = (buf & 0xC0) == 0x80
    out["n_chars"][:] = lens - (seg_count(cont) if cont.any() else 0)
    # word-level stats need Python's Unicode split semantics (set hashing
    # for distinct) — per-row but word-granular, not char-granular
    for i, t in enumerate(texts):
        words = (t or "").split()
        out["n_words"][i] = len(words)
        out["n_distinct_words"][i] = len(set(words))
        out["max_word_len"][i] = max((len(w) for w in words), default=0)
    return out


def langid_heuristic(texts) -> list[str]:
    """Stopword/script-vote language guess over _STOPWORDS languages;
    'und' (undetermined) when nothing matches.  The shape of
    language_classifier.c inference: per-row features -> argmax."""
    out = []
    lo, hi = ord("一"), ord("鿿")
    for t in texts:
        t = t or ""
        if t and not t.isascii():
            cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
            cjk = int(((cp >= lo) & (cp <= hi)).sum())
        else:
            cjk = 0
        if len(t) > 0 and cjk / max(1, len(t)) > 0.2:
            out.append("zh")
            continue
        words = t.lower().split()
        if not words:
            out.append("und")
            continue
        scores = {
            lang: sum(1 for w in words if w in sw)
            for lang, sw in _STOPWORDS.items()
            if sw
        }
        best = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
        out.append(best[0] if best[1] > 0 else "und")
    return out


def winnow_fingerprints(text: str, k: int = 8, window: int = 4) -> np.ndarray:
    """Winnowing (SIGMOD'03): min rolling-hash per sliding window of window
    consecutive k-grams; sorted unique int64 fingerprints.  Guarantees any
    shared substring of length >= k + window - 1 yields a shared fingerprint."""
    h = rolling_shingle_hashes((text or "").encode("utf-8"), k)
    if h.shape[0] == 0:
        return np.empty(0, dtype=np.int64)
    if h.shape[0] <= window:
        return np.unique(as_key_i64(np.array([h.min()], dtype=np.uint64)))
    view = np.lib.stride_tricks.sliding_window_view(h, window)
    mins = view.min(axis=1)
    return np.unique(as_key_i64(mins))
