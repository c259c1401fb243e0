"""CanonicalizeStage — the `expand_address` analog as a map_batches callable.

Reference lifecycle (SURVEY.md section 3.1, expand.c:1571-1647): normalize ->
tokenize -> per-token rewrites -> emit normal forms.  Here: one deterministic
canonical form per row + the per-row invariants (sha256 of the ORIGINAL
content, byte/char sizes).

Scale path: for the default rule set the whole batch is canonicalized at the
Arrow-BUFFER level — one numpy pass over the column's UTF-8 value buffer
(functions/canonicalize.ascii_canonicalize_buffer); no per-row Python string
is created.  Non-ASCII rows (detected vectorized) fall back to the per-row
Unicode path and are spliced in.  sha256 runs over zero-copy buffer slices.

A callable class => works in an actor pool or as a serialized stateless task;
the rule table / compiled regexes are built once per worker in ``__init__``
(the analog of libpostal's process-global setup singletons,
libpostal.c:289-334).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from libpostal_ray.config import PipelineConfig
from libpostal_ray.functions.canonicalize import (
    ascii_canonicalize_buffer,
    canonicalize_one,
    compile_rules,
    large_string_view,
)


def byte_chunk_bounds(cum_bytes: np.ndarray, target: int) -> list[tuple[int, int]]:
    """Split n rows into (row_start, row_end) ranges of ~target content
    bytes each — CACHE BLOCKING for the vectorized kernels: the numpy
    temporaries are proportional to chunk content, and keeping them inside a
    core's cache slice is what makes 32-way concurrency scale on
    bandwidth-limited hosts (measured 15-25x per-task slowdown without it).

    ``cum_bytes``: (n+1,) cumulative content bytes."""
    n = cum_bytes.shape[0] - 1
    if n == 0 or cum_bytes[-1] - cum_bytes[0] <= target:
        return [(0, n)]
    bounds = []
    s = 0
    while s < n:
        e = int(np.searchsorted(cum_bytes, cum_bytes[s] + target, side="left"))
        e = min(max(e, s + 1), n)
        bounds.append((s, e))
        s = e
    return bounds


def content_cum_bytes(col) -> np.ndarray:
    """(n+1,) cumulative byte lengths of a string column (nulls = 0)."""
    lens = pc.fill_null(pc.binary_length(col), 0).to_numpy(zero_copy_only=False)
    out = np.zeros(lens.shape[0] + 1, dtype=np.int64)
    np.cumsum(lens, out=out[1:])
    return out


def _scatter_replace(arr: pa.Array, idxs: np.ndarray, values: list[str]) -> pa.Array:
    """Replace rows `idxs` of a large_string array with `values` (zero-copy
    slices for the untouched runs)."""
    parts = []
    prev = 0
    for i, v in zip(idxs.tolist(), values):
        if i > prev:
            parts.append(arr.slice(prev, i - prev))
        parts.append(pa.array([v], type=arr.type))
        prev = i + 1
    if prev < len(arr):
        parts.append(arr.slice(prev, len(arr) - prev))
    return pa.concat_arrays(parts)


class CanonicalizeStage:
    """batch (doc_id, ..., content) -> + (sha256: binary(32), canonical:
    large_string, n_chars: int64)."""

    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()
        self.compiled_rules = compile_rules(self.cfg.rewrite_rules)
        # per-language routed packs (lang_rules=True): compiled lazily per
        # OBSERVED language, cached for the worker's lifetime — the analog
        # of the reference loading dictionaries for the languages it meets
        self._lang_compiled: dict[str, list] = {}
        # buffer fast path applies only to the default ASCII-equivalent rules
        self.buffer_path = (
            self.cfg.fold_case
            and self.cfg.collapse_whitespace
            and not self.cfg.strip_comments
            and not self.compiled_rules
            and not self.cfg.lang_rules
        )

    def _rules_for_lang(self, lang: str) -> list:
        base = lang.split("-", 1)[0].split("_", 1)[0].lower() if lang else ""
        got = self._lang_compiled.get(base)
        if got is None:
            from libpostal_ray.functions.canonicalize import LANG_RULE_PACKS

            pack = LANG_RULE_PACKS.get(base, ())
            got = (
                compile_rules(tuple(self.cfg.rewrite_rules) + tuple(pack))
                if pack
                else self.compiled_rules
            )
            self._lang_compiled[base] = got
        return got

    def _canonicalize_py(self, text: str, rules: list | None = None) -> str:
        cfg = self.cfg
        return canonicalize_one(
            text,
            fold_case=cfg.fold_case,
            collapse_whitespace=cfg.collapse_whitespace,
            strip_comments=cfg.strip_comments,
            transliterate=cfg.transliterate,
            compiled_rules=self.compiled_rules if rules is None else rules,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return self._process(batch)
        cum = content_cum_bytes(batch["content"])
        bounds = byte_chunk_bounds(cum, self.cfg.kernel_chunk_bytes)
        if len(bounds) == 1:
            return self._process(batch)
        parts = [self._process(batch.slice(s, e - s)) for s, e in bounds]
        return pa.concat_tables(parts)

    def _process(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        col = batch["content"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if col.null_count:
            col = pc.fill_null(col, "")
        if not pa.types.is_large_string(col.type):
            col = col.cast(pa.large_string())
        data, offsets = large_string_view(col)
        lens = np.diff(offsets)

        # sha256 of the ORIGINAL content bytes — zero-copy buffer slices
        sha = [
            hashlib.sha256(data[offsets[i] : offsets[i + 1]]).digest()
            for i in range(n)
        ]

        # n_chars (codepoints) = bytes - UTF-8 continuation bytes, vectorized
        hi = data >= 0x80
        if hi.any():
            cont = (data & 0xC0) == 0x80
            ccum = np.zeros(data.shape[0] + 1, dtype=np.int64)
            np.cumsum(cont, out=ccum[1:])
            n_chars = lens - (ccum[offsets[1:]] - ccum[offsets[:-1]])
            hcum = np.zeros(data.shape[0] + 1, dtype=np.int64)
            np.cumsum(hi, out=hcum[1:])
            non_ascii_rows = np.flatnonzero(
                (hcum[offsets[1:]] - hcum[offsets[:-1]]) > 0
            )
        else:
            n_chars = lens.copy()
            non_ascii_rows = np.empty(0, dtype=np.int64)

        if self.buffer_path:
            out_buf, out_off = ascii_canonicalize_buffer(data, offsets)
            canon = pa.Array.from_buffers(
                pa.large_string(),
                n,
                [None, pa.py_buffer(np.ascontiguousarray(out_off)), pa.py_buffer(out_buf)],
            )
            if non_ascii_rows.size:
                fixed = [
                    self._canonicalize_py(col[int(i)].as_py())
                    for i in non_ascii_rows
                ]
                canon = _scatter_replace(canon, non_ascii_rows, fixed)
        elif self.cfg.lang_rules and "lang" in batch.column_names:
            canon = pa.array(
                [
                    self._canonicalize_py(t, rules=self._rules_for_lang(l))
                    for t, l in zip(
                        col.to_pylist(), batch["lang"].to_pylist()
                    )
                ],
                type=pa.large_string(),
            )
        else:
            canon = pa.array(
                [self._canonicalize_py(t) for t in col.to_pylist()],
                type=pa.large_string(),
            )

        out = batch.append_column("sha256", pa.array(sha, type=pa.binary(32)))
        out = out.append_column("canonical", canon)
        out = out.append_column("n_chars", pa.array(n_chars, type=pa.int64()))
        return out
