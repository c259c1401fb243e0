"""libpostal_ray — a Ray-Data-native near-duplicate detection + clustering engine.

A from-scratch reimplementation of the *philosophy* of openvenues/libpostal
(normalize-then-match dedup: reference `expand.c`, `near_dupe.c`, `dedupe.c`)
re-conceived for source-code / document content and built on `ray.data.Dataset`
pipelines: canonicalize -> shingle -> MinHash/SimHash -> LSH band groupby ->
verify -> distributed union-find clustering.

Layout (SURVEY.md section 7):
  config.py     PipelineConfig — the analog of libpostal_normalize_options_t
                (reference libpostal.h:110-138) + near-dupe options
                (libpostal.h:191-207).
  functions/    pure vectorized kernels (numpy / pyarrow) — no Ray imports.
  stages/       map_batches callables (stateless fns + stateful actor classes).
  pipelines/    Dataset -> Dataset compositions (the end-to-end flows).
  sources/      readers/writers with column pruning.
  state/        checkpoint manifests + resume.
  synth.py      deterministic synthetic source-code corpus (seeded dup families).
"""

from libpostal_ray.config import PipelineConfig

__all__ = ["PipelineConfig"]
__version__ = "0.1.0"
