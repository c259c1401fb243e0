"""CanonicalizeStage — the `expand_address` analog as a map_batches callable.

Reference lifecycle (SURVEY.md section 3.1, expand.c:1571-1647): normalize ->
tokenize -> per-token rewrites -> emit normal forms.  Here: one deterministic
canonical form per row + the per-row invariants (sha256 of the ORIGINAL
content, byte/char sizes).

A callable class => Ray actor pool; the rule table / compiled regexes load
once per actor in ``__init__`` (the analog of libpostal's process-global
setup singletons, libpostal.c:289-334).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from libpostal_ray.config import PipelineConfig
from libpostal_ray.functions.canonicalize import canonicalize_one


class CanonicalizeStage:
    """batch (doc_id, ..., content) -> + (sha256: binary(32), canonical:
    large_string, n_chars: int64)."""

    def __init__(self, cfg: PipelineConfig | None = None):
        self.cfg = cfg or PipelineConfig()

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        contents = batch["content"].to_pylist()
        sha = [hashlib.sha256((t or "").encode("utf-8")).digest() for t in contents]
        canon = [
            canonicalize_one(
                t,
                fold_case=cfg.fold_case,
                collapse_whitespace=cfg.collapse_whitespace,
                strip_comments=cfg.strip_comments,
            )
            for t in contents
        ]
        n_chars = np.array([len(t or "") for t in contents], dtype=np.int64)
        out = batch.append_column("sha256", pa.array(sha, type=pa.binary(32)))
        out = out.append_column("canonical", pa.array(canon, type=pa.large_string()))
        out = out.append_column("n_chars", pa.array(n_chars, type=pa.int64()))
        return out
