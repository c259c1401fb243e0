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


_QF_ALL = (
    "n_chars", "n_words", "n_distinct_words", "max_word_len",
    "alpha_chars", "digit_chars", "space_chars",
)

# cache-block content: sub-batch the concatenated byte buffer so the
# mask/cumsum temporaries stay in L2 (CLAUDE.md: whole-batch temporaries
# collapse 15-25x under 32-way parallelism on this DRAM-limited host)
_QF_CHUNK_BYTES = 128 * 1024


def quality_features(texts, need: tuple[str, ...] | None = None) -> dict[str, np.ndarray]:
    """Deterministic quality-scoring features, all integerized so the DuckDB
    oracle computes the identical values (no float-accumulation ambiguity):
      n_chars, n_words, n_distinct_words, max_word_len,
      alpha_chars (count of [a-zA-Z]), digit_chars, space_chars.

    ``need`` restricts computation to the listed features (values for the
    rest are omitted from the dict) — the hot prepare gate asks for 4 of 7
    and skips the max-word-len generator plus two char-class passes.
    """
    n = len(texts)
    need = tuple(need) if need is not None else _QF_ALL
    out = {k: np.empty(n, dtype=np.int64) for k in _QF_ALL if k in need}
    # char-class counts are vectorized over the concatenated UTF-8 bytes:
    # ASCII classes ([A-Za-z], [0-9], ' ') only match ASCII BYTES, and in
    # UTF-8 every byte of a multi-byte char is >= 0x80 — so byte counting is
    # exact for any input.  n_chars = bytes - continuation bytes.
    enc = [(t or "").encode("utf-8") for t in texts]
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=n)
    byte_classes = [
        k for k in ("alpha_chars", "digit_chars", "space_chars", "n_chars")
        if k in need
    ]
    if byte_classes:
        # chunk by DOC ranges whose byte extent stays ~_QF_CHUNK_BYTES
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        lo = 0
        while lo < n:
            hi = int(
                np.searchsorted(offs, offs[lo] + _QF_CHUNK_BYTES, side="left")
            )
            hi = min(max(hi, lo + 1), n)
            buf = np.frombuffer(b"".join(enc[lo:hi]), dtype=np.uint8)
            seg = offs[lo : hi + 1] - offs[lo]
            c = np.empty(buf.shape[0] + 1, dtype=np.int32)
            c[0] = 0

            def seg_count(mask: np.ndarray) -> np.ndarray:
                np.cumsum(mask, out=c[1:])
                return c[seg[1:]] - c[seg[:-1]]

            if "alpha_chars" in out:
                alpha = ((buf >= 65) & (buf <= 90)) | ((buf >= 97) & (buf <= 122))
                out["alpha_chars"][lo:hi] = seg_count(alpha)
            if "digit_chars" in out:
                out["digit_chars"][lo:hi] = seg_count((buf >= 48) & (buf <= 57))
            if "space_chars" in out:
                out["space_chars"][lo:hi] = seg_count(buf == 32)
            if "n_chars" in out:
                cont = (buf & 0xC0) == 0x80
                out["n_chars"][lo:hi] = lens[lo:hi] - (
                    seg_count(cont) if cont.any() else 0
                )
            lo = hi
    # word-level stats need Python's Unicode split semantics (set hashing
    # for distinct) — per-row but word-granular, not char-granular
    want_words = "n_words" in out
    want_dist = "n_distinct_words" in out
    want_max = "max_word_len" in out
    if want_words or want_dist or want_max:
        for i, t in enumerate(texts):
            words = (t or "").split()
            if want_words:
                out["n_words"][i] = len(words)
            if want_dist:
                out["n_distinct_words"][i] = len(set(words))
            if want_max:
                out["max_word_len"][i] = max(
                    (len(w) for w in words), default=0
                )
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
