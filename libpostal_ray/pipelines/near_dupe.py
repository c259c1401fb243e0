"""The flagship pipeline: near-duplicate detection + clustering.

End-to-end Ray Data composition (reference lifecycle SURVEY.md section 3.2 —
near_dupe_hashes -> host-system key groupby -> pairwise dedupe -> caller
clustering — re-expressed as one streaming Dataset pipeline):

    read_parquet (pruned columns)
      -> map_batches(CanonicalizeStage)        [actor pool, zero-copy Arrow]
      -> map_batches(SignatureStage)           [actor pool, MinHash+SimHash]
      -> drop content                          [shuffles stay narrow]
      -> map_batches(explode_band_keys)        [flat explode, stateless]
      -> groupby(band_key).map_groups(verify)  [THE shuffle; skew-capped]
      -> groupby(src,dst).max(status)          [pair dedup across bands]
      -> connected_components (large/small-star rounds)
      -> left join labels onto docs            [singletons = own cluster]

Every stage is deterministic; a task retry recomputes identical bytes.
"""

from __future__ import annotations

import ray.data
from ray.data.aggregate import Max

import pyarrow as pa

from libpostal_ray.config import PipelineConfig
from libpostal_ray.pipelines.cluster import assign_clusters, connected_components
from libpostal_ray.stages.canonicalize import CanonicalizeStage
from libpostal_ray.stages.lsh import explode_band_keys
from libpostal_ray.stages.signature import SignatureStage, SIGNATURE_COLUMNS
from libpostal_ray.stages.verify import STATUS_LIKELY, VerifyPartition


def _pool(cfg: PipelineConfig):
    """Actor-pool sizing for the stateful stages: autoscale up to the
    cluster's CPUs so the pool never starves the read/write stages."""
    if cfg.sig_concurrency is not None:
        return cfg.sig_concurrency
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4))
    return (1, max(2, cpus))


def signatures(corpus: ray.data.Dataset, cfg: PipelineConfig) -> ray.data.Dataset:
    """corpus (doc_id, ..., content) -> signature table (content dropped)."""
    ds = corpus.map_batches(
        CanonicalizeStage,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.sig_batch_size,
        concurrency=_pool(cfg),
        zero_copy_batch=True,
    )
    ds = ds.map_batches(
        SignatureStage,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.sig_batch_size,
        concurrency=_pool(cfg),
        zero_copy_batch=True,
    )
    return ds.select_columns(SIGNATURE_COLUMNS)


def near_dupe_hashes(sigs: ray.data.Dataset, cfg: PipelineConfig) -> ray.data.Dataset:
    """The `libpostal_near_dupe_hashes` analog: (doc_id, band_key) rows whose
    key-equality defines candidate pairs (near_dupe.c:643-1216)."""
    return sigs.map_batches(explode_band_keys, batch_format="pyarrow").select_columns(
        ["doc_id", "band_key"]
    )


def candidate_edges(sigs: ray.data.Dataset, cfg: PipelineConfig) -> ray.data.Dataset:
    """signature table -> verified, deduplicated edge table
    (src, dst, status, est_jaccard, truncated)."""
    exploded = sigs.map_batches(
        explode_band_keys, batch_format="pyarrow", zero_copy_batch=True
    )

    # ONE Python call per partition of buckets, not per bucket: group by
    # band_key % P and recover buckets vectorized inside (stages/verify.py).
    P = cfg.verify_partitions

    def add_vpart(batch: pa.Table) -> pa.Table:
        import numpy as np

        k = batch["band_key"].to_numpy(zero_copy_only=False)
        return batch.append_column("vpart", pa.array((k % P).astype("int64")))

    verify = VerifyPartition(cfg)

    def verify_partition(group: pa.Table) -> pa.Table:
        return verify(group)

    edges = (
        exploded.map_batches(add_vpart, batch_format="pyarrow")
        .groupby("vpart")
        .map_groups(verify_partition, batch_format="pyarrow")
    )
    # the same pair is found once per shared band — keep the strongest verdict
    deduped = edges.groupby(["src", "dst"]).aggregate(
        Max("status", alias_name="status"),
        Max("est_jaccard", alias_name="est_jaccard"),
        Max("truncated", alias_name="truncated"),
    )
    return deduped


def cluster_edges(edges: ray.data.Dataset, min_status: int = STATUS_LIKELY) -> ray.data.Dataset:
    """Keep edges strong enough to merge clusters (LIKELY or EXACT; the
    reference treats NEEDS_REVIEW as human-queue, dedupe.c statuses)."""
    import pyarrow.compute as pc

    return edges.map_batches(
        lambda t: t.filter(pc.greater_equal(t["status"], min_status)),
        batch_format="pyarrow",
    )


def near_dupe_pipeline(
    corpus: ray.data.Dataset,
    cfg: PipelineConfig | None = None,
) -> dict[str, ray.data.Dataset]:
    """Full flow. Returns {'signatures', 'edges', 'clusters'} datasets.

    `clusters` = (doc_id, repo, path, lang, sha256, n_chars, cluster_id);
    cluster_id is the min doc_id of the connected component (deterministic
    representative — SURVEY.md section 4).
    """
    cfg = cfg or PipelineConfig()
    # The signature table is consumed twice (edge generation + final cluster
    # assignment) and is ~2 orders of magnitude narrower than content;
    # materialize once instead of recomputing the canonicalize+minhash chain.
    # (With a checkpoint_dir this becomes a parquet checkpoint instead —
    # see state/checkpoint.py.)
    sigs = signatures(corpus, cfg).materialize()
    if sigs.count() == 0:
        # empty corpus: Ray's hash join can't recover a schema from zero
        # blocks — short-circuit with empty, correctly-schemed outputs
        from libpostal_ray.stages.verify import EDGE_SCHEMA

        empty_edges = ray.data.from_arrow(EDGE_SCHEMA.empty_table())
        empty_clusters = ray.data.from_arrow(
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("sha256", pa.binary(32)),
                    ("n_chars", pa.int64()),
                    ("cluster_id", pa.int64()),
                ]
            ).empty_table()
        )
        return {"signatures": sigs, "edges": empty_edges, "clusters": empty_clusters}
    edges = candidate_edges(sigs, cfg).materialize()
    strong = cluster_edges(edges)
    labels = connected_components(strong)
    docs = sigs.select_columns(["doc_id", "sha256", "n_chars"])
    clusters = assign_clusters(docs, labels, num_partitions=cfg.num_partitions)
    return {"signatures": sigs, "edges": edges, "clusters": clusters}
