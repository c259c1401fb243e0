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

__all__ = [
    "PipelineConfig",
    # lazy re-exports (heavy Ray imports deferred to first attribute access)
    "near_dupe_pipeline",
    "dedup_report",
    "dedup_against_corpus",
    "prepare_training_corpus",
    "asof_join",
    "interval_count_join",
    "sliding_window_count_sum",
    "window_over_key",
    "train_classifier",
]
__version__ = "0.1.0"

_LAZY = {
    "near_dupe_pipeline": ("libpostal_ray.pipelines.near_dupe", "near_dupe_pipeline"),
    "dedup_report": ("libpostal_ray.pipelines.near_dupe", "dedup_report"),
    "dedup_against_corpus": ("libpostal_ray.pipelines.incremental", "dedup_against_corpus"),
    "prepare_training_corpus": ("libpostal_ray.pipelines.prepare", "prepare_training_corpus"),
    "asof_join": ("libpostal_ray.pipelines.relational", "asof_join"),
    "interval_count_join": ("libpostal_ray.pipelines.relational", "interval_count_join"),
    "sliding_window_count_sum": ("libpostal_ray.pipelines.relational", "sliding_window_count_sum"),
    "window_over_key": ("libpostal_ray.pipelines.window", "window_over_key"),
    "train_classifier": ("libpostal_ray.pipelines.train", "train_classifier"),
}


def __getattr__(name):
    """PEP 562 lazy loading: `from libpostal_ray import asof_join` works
    without importing Ray at package-import time (functions/ kernels stay
    importable in Ray-free unit tests)."""
    try:
        mod, attr = _LAZY[name]
    except KeyError:
        raise AttributeError(f"module 'libpostal_ray' has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(mod), attr)
