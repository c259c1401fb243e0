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


def checkpointed_signatures(
    corpus: ray.data.Dataset,
    cfg: PipelineConfig,
    ckpt_dir: str,
    only_pids: set[int] | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """Signature stage with per-partition parquet checkpoints + manifest.

    pid = stable hash(repo) % num_partitions (repo colocation — the substring
    pass relies on it too).  A resumed run recomputes only the partitions
    missing from the manifest (state/checkpoint.py)."""
    from libpostal_ray.state.checkpoint import checkpointed_map_stage, repo_pid

    P = cfg.num_partitions

    def add_pid(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "pid", pa.array(repo_pid(batch["repo"].to_pylist(), P), type=pa.int64())
        )

    with_pid = corpus.map_batches(add_pid, batch_format="pyarrow")

    def apply(sub: ray.data.Dataset) -> ray.data.Dataset:
        ds = sub.map_batches(
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
        return ds.select_columns(SIGNATURE_COLUMNS + ["pid"])

    return checkpointed_map_stage(
        with_pid,
        stage="signatures",
        ckpt_dir=ckpt_dir,
        cfg=cfg,
        apply=apply,
        pid_column="pid",
        fp_column="doc_id",
        only_pids=only_pids,
    )


def checkpointed_edges(
    sigs: ray.data.Dataset,
    cfg: PipelineConfig,
    ckpt_dir: str,
    only_pids: set[int] | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """Edge stage with per-partition checkpoints keyed by the verify
    partition (band_key % verify_partitions).  Requires checkpointed (or
    materialized) signatures upstream — the explode is cheap to replay."""
    from libpostal_ray.state.checkpoint import checkpointed_map_stage

    P = cfg.verify_partitions

    def add_vpart(batch: pa.Table) -> pa.Table:
        import numpy as np

        k = batch["band_key"].to_numpy(zero_copy_only=False)
        return batch.append_column("vpart", pa.array((k % P).astype("int64")))

    exploded = sigs.map_batches(
        explode_band_keys, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(add_vpart, batch_format="pyarrow")

    verify = VerifyPartition(cfg)

    def apply(sub: ray.data.Dataset) -> ray.data.Dataset:
        # per-vpart edges only (VerifyPartition dedups within its partition);
        # the GLOBAL (src,dst) dedup runs after read_all — a pair found in two
        # different vparts must be deduped across checkpoint partitions
        def verify_partition(group: pa.Table) -> pa.Table:
            vp = int(group["vpart"][0].as_py()) if group.num_rows else 0
            out = verify(group)
            return out.append_column(
                "vpart", pa.array([vp] * out.num_rows, type=pa.int64())
            )

        return sub.groupby("vpart").map_groups(
            verify_partition, batch_format="pyarrow"
        )

    return checkpointed_map_stage(
        exploded,
        stage="edges",
        ckpt_dir=ckpt_dir,
        cfg=cfg,
        apply=apply,
        pid_column="vpart",
        fp_column="src",
        only_pids=only_pids,
        num_partitions=P,
    )


def near_dupe_pipeline(
    corpus: ray.data.Dataset,
    cfg: PipelineConfig | None = None,
    checkpoint_dir: str | None = None,
) -> dict[str, ray.data.Dataset]:
    """Full flow. Returns {'signatures', 'edges', 'clusters'} datasets.

    `clusters` = (doc_id, repo, path, lang, sha256, n_chars, cluster_id);
    cluster_id is the min doc_id of the connected component (deterministic
    representative — SURVEY.md section 4).
    """
    cfg = cfg or PipelineConfig()
    # The signature table is consumed twice (edge generation + final cluster
    # assignment) and is ~2 orders of magnitude narrower than content;
    # materialize once instead of recomputing the canonicalize+minhash chain
    # — or, with a checkpoint_dir, persist per-partition parquet + manifest
    # so a killed run resumes without recomputation.
    if checkpoint_dir is not None:
        from ray.data.aggregate import Max as _Max

        sigs, sig_metrics = checkpointed_signatures(corpus, cfg, checkpoint_dir)
        if sigs.count() == 0:
            return near_dupe_pipeline(corpus, cfg, checkpoint_dir=None)
        edges_parts, edge_metrics = checkpointed_edges(sigs, cfg, checkpoint_dir)
        edges = edges_parts.groupby(["src", "dst"]).aggregate(
            _Max("status", alias_name="status"),
            _Max("est_jaccard", alias_name="est_jaccard"),
            _Max("truncated", alias_name="truncated"),
        ).materialize()
        strong = cluster_edges(edges)
        labels = connected_components(strong)
        docs = sigs.select_columns(["doc_id", "sha256", "n_chars"])
        clusters = assign_clusters(docs, labels, num_partitions=cfg.num_partitions)
        return {
            "signatures": sigs,
            "edges": edges,
            "clusters": clusters,
            "metrics": {"signatures": sig_metrics, "edges": edge_metrics},
        }
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
