"""Substring (suffix-array) pipeline: exact duplicated spans across files.

corpus -> CanonicalizeStage -> partition by hash(repo) % P -> per-partition
suffix-array span detection (stages/substring.py).  The partitioning
assumption is EXPLICIT: spans are only found between files whose repos hash
to the same partition — the pass targets vendored/copied code inside a repo
neighborhood, not arbitrary cross-corpus spans (that is the LSH pipeline's
job).  Raise num_partitions at scale to keep partitions under the byte
budget; cross-partition spans are traded for boundedness (documented)."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from libpostal_ray.config import PipelineConfig
from libpostal_ray.pipelines.near_dupe import _sig_transforms
from libpostal_ray.stages.substring import SubstringPartition


def substring_pass(
    corpus: ray.data.Dataset, cfg: PipelineConfig | None = None
) -> ray.data.Dataset:
    """-> SPAN edges (src, dst, span_len, truncated)."""
    cfg = cfg or PipelineConfig()

    from libpostal_ray.state.checkpoint import repo_pid

    def add_pid(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "pid",
            pa.array(
                repo_pid(batch["repo"].to_pylist(), cfg.num_partitions),
                type=pa.int64(),
            ),
        )

    canonicalize_batch, _ = _sig_transforms(cfg)
    canon = corpus.map_batches(
        canonicalize_batch,
        batch_format="pyarrow",
        batch_size=cfg.sig_batch_size,
        zero_copy_batch=True,
    )
    slim = canon.map_batches(add_pid, batch_format="pyarrow").select_columns(
        ["doc_id", "canonical", "pid"]
    )
    sub = SubstringPartition(cfg)

    def run_partition(group: pa.Table) -> pa.Table:
        return sub(group)

    return slim.groupby("pid").map_groups(run_partition, batch_format="pyarrow")
