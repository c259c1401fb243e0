"""The flagship pipeline: near-duplicate detection + clustering.

End-to-end Ray Data composition (reference lifecycle SURVEY.md section 3.2 —
near_dupe_hashes -> host-system key groupby -> pairwise dedupe -> caller
clustering — re-expressed as one streaming Dataset pipeline):

    read_parquet (pruned columns)
      -> map_batches(canonicalize)             [stateless tasks, zero-copy Arrow]
      -> map_batches(signature)                [stateless tasks, OPH MinHash+SimHash]
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


def _sig_transforms(cfg: PipelineConfig):
    """The canonicalize+signature transforms as STATELESS task functions.

    The reference's actor-pool pattern exists for heavyweight per-worker
    state (a 750 MB parser model, libpostal.c:289-334); our state here is a
    dataclass + module-level compiled regexes — serialization is free, so
    stateless tasks win: no actor-pool startup latency, and the scheduler
    can elastically use every CPU.  MediaFeatureStage (stages/multimodal.py)
    keeps the actor-pool pattern for genuinely heavy decode state."""
    canon = CanonicalizeStage(cfg)
    sig = SignatureStage(cfg)

    def canonicalize_batch(batch: pa.Table) -> pa.Table:
        return canon(batch)

    def signature_batch(batch: pa.Table) -> pa.Table:
        return sig(batch)

    return canonicalize_batch, signature_batch


def signatures(corpus: ray.data.Dataset, cfg: PipelineConfig) -> ray.data.Dataset:
    """corpus (doc_id, ..., content) -> signature table (content dropped)."""
    canonicalize_batch, signature_batch = _sig_transforms(cfg)
    ds = corpus.map_batches(
        canonicalize_batch,
        batch_format="pyarrow",
        batch_size=cfg.sig_batch_size,
        zero_copy_batch=True,
    )
    ds = ds.map_batches(
        signature_batch,
        batch_format="pyarrow",
        batch_size=cfg.sig_batch_size,
        zero_copy_batch=True,
    )
    return ds.select_columns(SIGNATURE_COLUMNS)


def near_dupe_hashes(sigs: ray.data.Dataset, cfg: PipelineConfig) -> ray.data.Dataset:
    """The `libpostal_near_dupe_hashes` analog: (doc_id, band_key) rows whose
    key-equality defines candidate pairs (near_dupe.c:643-1216)."""
    return sigs.map_batches(explode_band_keys, batch_format="pyarrow").select_columns(
        ["doc_id", "band_key"]
    )


def candidate_edges(
    sigs: ray.data.Dataset, cfg: PipelineConfig, extras: dict | None = None
) -> ray.data.Dataset:
    """signature table -> verified, deduplicated edge table
    (src, dst, status, est_jaccard, truncated).

    ``extras``, when passed, receives internal artifacts downstream fusions
    reuse (currently ``state_refs``: the sharded broadcast signature state —
    dedup_report's rep-sha lookup reads it instead of re-shuffling docs).

    Two physical plans (cfg.verify_mode):
      * "pairs" (default, the 100TB plan): shuffle only (band_key, doc_id)
        [16 B/row], emit candidate pairs per bucket, then verify the pairs
        against the signature table — broadcast lookup when it fits
        (sig_broadcast_max), hash joins otherwise.
      * "inline": carry the b-bit signature through the shuffle and verify
        inside the bucket groupby (one all-to-all, ~13x more bytes).
    """
    if cfg.verify_mode == "pairs":
        return _candidate_edges_pairs(sigs, cfg, extras=extras)
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
    return dedup_pair_edges(edges)


# crossover for the (src,dst) pair dedup: below this many edge rows a single
# vectorized task beats a distributed aggregate by ~10x in wall time
# (~40 B/row => 5e7 rows ~ 2 GB task heap, lexsort ~10 s)
PAIR_DEDUP_LOCAL_MAX = 50_000_000


@ray.remote
def _dedup_pairs_task(*blocks) -> pa.Table:
    import numpy as np

    cols = ["src", "dst", "status", "est_jaccard", "truncated"]
    # skip empty placeholder blocks (zero-row blocks can carry no schema)
    t = pa.concat_tables(
        [b.select(cols) for b in blocks if b.num_rows > 0 and "src" in b.column_names]
    )
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    status = t["status"].to_numpy(zero_copy_only=False)
    est = t["est_jaccard"].to_numpy(zero_copy_only=False)
    trunc = t["truncated"].to_numpy(zero_copy_only=False)
    # status/est_jaccard are PER-PAIR INVARIANTS (computed from the two docs'
    # signatures, independent of which bucket found the pair), so Max over
    # duplicates equals any row's value; only `truncated` varies per bucket
    # and takes OR semantics — identical to the distributed aggregate path.
    order = np.lexsort((-status, dst, src))
    src, dst = src[order], dst[order]
    keep = np.concatenate(([True], (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])))
    idx = order[keep]
    seg = np.cumsum(keep) - 1
    trunc_or = np.zeros(int(keep.sum()), dtype=bool)
    np.logical_or.at(trunc_or, seg, trunc[order])
    return pa.table(
        {
            "src": pa.array(src[keep], type=pa.int64()),
            "dst": pa.array(dst[keep], type=pa.int64()),
            "status": pa.array(status[idx], type=pa.int8()),
            "est_jaccard": pa.array(est[idx], type=pa.float64()),
            "truncated": pa.array(trunc_or),
        }
    )


def dedup_pair_edges(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Global (src,dst) dedup keeping the strongest verdict.  Hybrid: small
    edge sets run as one vectorized task; large ones use the distributed
    aggregate (same determinism: max status wins, ties identical)."""
    import ray as _ray

    edges = edges.materialize()
    n = edges.count()
    if n == 0:
        return edges
    if n <= PAIR_DEDUP_LOCAL_MAX:
        refs = edges.to_arrow_refs()
        return ray.data.from_arrow(_ray.get(_dedup_pairs_task.remote(*refs)))
    return edges.groupby(["src", "dst"]).aggregate(
        Max("status", alias_name="status"),
        Max("est_jaccard", alias_name="est_jaccard"),
        Max("truncated", alias_name="truncated"),
    )


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
        canonicalize_batch, signature_batch = _sig_transforms(cfg)
        ds = sub.map_batches(
            canonicalize_batch,
            batch_format="pyarrow",
            batch_size=cfg.sig_batch_size,
            zero_copy_batch=True,
        )
        ds = ds.map_batches(
            signature_batch,
            batch_format="pyarrow",
            batch_size=cfg.sig_batch_size,
            zero_copy_batch=True,
        )
        return ds.select_columns(SIGNATURE_COLUMNS + ["pid"])

    sig_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("sha256", pa.binary(32)),
            ("sha_key", pa.int64()),
            ("n_chars", pa.int64()),
            ("n_shingles", pa.int64()),
            ("is_short", pa.bool_()),
            ("minhash8", pa.list_(pa.uint8())),
            ("simhash", pa.int64()),
            ("phonetic", pa.int64()),
            ("phonetic2", pa.int64()),
            ("acronym", pa.int64()),
            ("acronym2", pa.int64()),
            ("exp4", pa.list_(pa.int64(), 4)),
            ("band_keys", pa.list_(pa.int64())),
        ]
    )
    return checkpointed_map_stage(
        with_pid,
        stage="signatures",
        ckpt_dir=ckpt_dir,
        cfg=cfg,
        apply=apply,
        pid_column="pid",
        fp_column="doc_id",
        only_pids=only_pids,
        empty_schema=sig_schema,
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

    from libpostal_ray.stages.verify import EDGE_SCHEMA

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
        empty_schema=EDGE_SCHEMA,
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
        sigs, sig_metrics = checkpointed_signatures(corpus, cfg, checkpoint_dir)
        if sigs.count() == 0:
            return near_dupe_pipeline(corpus, cfg, checkpoint_dir=None)
        edges_parts, edge_metrics = checkpointed_edges(sigs, cfg, checkpoint_dir)
        edges = dedup_pair_edges(edges_parts).materialize()
        strong = cluster_edges(edges)
        from libpostal_ray.state.checkpoint import config_fingerprint

        labels = connected_components(
            strong,
            checkpoint_dir=checkpoint_dir,
            config_fp=config_fingerprint(cfg),
        )
        docs = sigs.select_columns(["doc_id", "sha256", "n_chars"])
        clusters = assign_clusters(docs, labels, num_partitions=cfg.num_partitions)
        return {
            "signatures": sigs,
            "edges": edges,
            "clusters": clusters,
            "metrics": {"signatures": sig_metrics, "edges": edge_metrics},
        }
    import os as _os
    import sys as _sys
    import time as _time

    _t0 = _time.perf_counter()
    _plog = (
        (lambda m: print(f"[phase] {m} @{_time.perf_counter() - _t0:.2f}s", file=_sys.stderr))
        if _os.environ.get("GRAFT_PHASE_LOG") == "1"
        else (lambda m: None)
    )
    extras: dict = {}
    if cfg.verify_mode == "pairs" and cfg.shuffle_impl == "manual":
        # streaming fused plan: the exchange's split tasks and the sharded
        # broadcast-state build launch while the signature stage is still
        # producing blocks — no full-materialize barrier between stages.
        # On the fused path edges comes back as None + extras["pair_refs"]
        # (raw edge-block refs) so the CC/assign tail can be chained onto
        # the refs BEFORE the driver blocks on exchange completion.
        sigs, edges = _streamed_candidate_edges(corpus, cfg, extras=extras)
        if edges is not None:
            edges = edges.materialize()
        _plog("sig stream consumed")
    else:
        sigs = signatures(corpus, cfg).materialize()
        edges = None
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
    if edges is None and "pair_refs" not in extras:
        edges = candidate_edges(sigs, cfg, extras=extras).materialize()
    from libpostal_ray.pipelines.cluster import (
        CC_LOCAL_MAX_EDGES,
        _cc_task_from_edges,
        _nrows_of,
        assign_clusters_blocks,
    )

    # SPAN edges (exact shared substrings) fuse into the same CC task:
    # their status (5) sits between NEEDS_REVIEW (3) and LIKELY (6), so
    # lowering the CC status floor to SPAN with the span blocks appended is
    # exactly the old filter+union plan, minus the union dataset and the
    # extra distributed-CC jobs.
    span_refs: list = []
    n_span = 0
    min_status = STATUS_LIKELY
    if cfg.span_edges:
        from libpostal_ray.stages.substring import STATUS_SPAN

        spans = _span_edges_as_cluster_edges(corpus, cfg).materialize()
        span_refs = spans.to_arrow_refs()
        n_span = spans.count()
        min_status = STATUS_SPAN

    # Fused, barrier-free tail: the CC task and the assign tasks are
    # submitted EAGERLY, chained on the raw edge-block refs — Ray schedules
    # each the instant its inputs resolve, with no driver wake-up between
    # the exchange, CC and assignment.  The crossover row count comes from
    # tiny per-ref tasks instead of a Ray Data count job.  Only THEN does
    # the driver block (building the edges Dataset + the final
    # from_arrow_refs over the assign outputs), so the one barrier overlaps
    # the whole tail.
    pair_refs = extras.get("pair_refs")
    if pair_refs is None:
        pair_refs = edges.to_arrow_refs()
    nrow_refs = [_nrows_of.remote(r) for r in pair_refs]
    labels_ref = _cc_task_from_edges.remote(min_status, *pair_refs, *span_refs)
    assign_refs = assign_clusters_blocks(
        sigs.to_arrow_refs(),
        labels_ref,
        columns=["doc_id", "sha256", "n_chars"],
        as_refs=True,
    )
    if edges is None:
        edges = ray.data.from_arrow_refs(pair_refs)
    _plog("exchange complete (edge blocks resolved)")
    n_edges = sum(ray.get(nrow_refs))
    if n_edges + n_span <= CC_LOCAL_MAX_EDGES:
        clusters = ray.data.from_arrow_refs(assign_refs)
        _plog(f"tail complete ({n_edges} edges)")
        return {
            "signatures": sigs,
            "edges": edges,
            "clusters": clusters,
            "_labels_ref": labels_ref,
            "_state_refs": extras.get("state_refs"),
        }
    # rare fallback (> CC_LOCAL_MAX_EDGES): the optimistic CC/assign tasks
    # are abandoned (cancel is best-effort; a completed task is a no-op)
    # and the distributed large/small-star rounds take over
    ray.cancel(labels_ref)
    for _r in assign_refs:
        ray.cancel(_r)
    docs = sigs.select_columns(["doc_id", "sha256", "n_chars"])
    strong = cluster_edges(edges)
    if cfg.span_edges:
        strong = strong.union(spans)
    labels = connected_components(strong)
    clusters = assign_clusters(docs, labels, num_partitions=cfg.num_partitions)
    return {"signatures": sigs, "edges": edges, "clusters": clusters}


def _span_edges_as_cluster_edges(
    corpus: ray.data.Dataset, cfg: PipelineConfig
) -> ray.data.Dataset:
    """SPAN edges (exact shared substrings >= min_span_len, suffix-array
    pass) converted to the edge schema so clustering can consume them —
    cfg.span_edges wires the substring pass into the flagship pipeline
    (the reference's exact-span evidence feeding the dedupe decision,
    dedupe.c:78-156)."""
    from libpostal_ray.pipelines.substring import substring_pass
    from libpostal_ray.stages.substring import STATUS_SPAN
    from libpostal_ray.stages.verify import EDGE_SCHEMA

    spans = substring_pass(corpus, cfg)

    def to_edges(batch: pa.Table) -> pa.Table:
        import numpy as np

        n = batch.num_rows
        return pa.table(
            {
                "src": batch["src"].cast(pa.int64()),
                "dst": batch["dst"].cast(pa.int64()),
                "status": pa.array(
                    np.full(n, STATUS_SPAN, dtype=np.int8), type=pa.int8()
                ),
                "est_jaccard": pa.array(np.full(n, -1.0), type=pa.float64()),
                "truncated": batch["truncated"],
            },
            schema=EDGE_SCHEMA,
        )

    return spans.map_batches(to_edges, batch_format="pyarrow")


@ray.remote
def _report_state(labels: pa.Table, *states: dict) -> dict:
    """Tiny per-cluster state for the fused dedup report: sorted cluster
    ids, member counts, and each representative's sha256 (rep doc_id ==
    cluster_id under min-label CC; sha gathered from the sharded broadcast
    signature state)."""
    import numpy as np

    lab = labels["cluster_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    cids, sizes = np.unique(lab, return_counts=True)
    rep_sha = _state_gather(list(states), cids)[1]
    return {"cids": cids, "sizes": sizes.astype(np.int64), "rep_sha": rep_sha}


def dedup_report(
    corpus: ray.data.Dataset,
    cfg: PipelineConfig | None = None,
    pipeline_out: dict | None = None,
) -> ray.data.Dataset:
    """The reference's actual deliverable — a keep/drop decision per record
    (dedupe.c:78-156 status decisions) — at dataset scale:

        (doc_id, cluster_id, n_copies, keep, reason)

    keep = the doc is its cluster's representative (min doc_id).  reason in
    {'unique', 'kept', 'exact_dup', 'near_dup'}: dropped docs whose sha256
    equals the representative's are exact_dup, others near_dup.

    Physical plan (fused pipeline tail available): the label table and the
    sharded signature state are already broadcast ObjectRefs, and
    cluster_id IS the representative's doc_id (min-label CC), so the whole
    report is ONE map over the docs against a tiny per-cluster state
    (sizes + rep sha) built in one remote task — zero shuffles.  Fallback
    (checkpointed/distributed tail): cluster rows co-locate via ONE groupby
    on cluster_id % P; per-partition the segments are recovered vectorized
    (sort + searchsorted) — no per-cluster Python calls, no broadcast of
    the full cluster table."""
    import numpy as np

    cfg = cfg or PipelineConfig()
    # reuse an existing pipeline result (e.g. the job CLI runs the pipeline
    # once, writes clusters AND the report from the same run)
    out = pipeline_out if pipeline_out is not None else near_dupe_pipeline(corpus, cfg)
    labels_ref = out.get("_labels_ref")
    state_refs = out.get("_state_refs")
    if labels_ref is not None and state_refs:
        sigs = out["signatures"]
        docs = sigs.select_columns(["doc_id", "sha256"])
        rep_ref = _report_state.remote(labels_ref, *state_refs)

        def report_batch(batch: pa.Table) -> pa.Table:
            labels, rep = ray.get([labels_ref, rep_ref])
            did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            n = batch.num_rows
            # cluster lookup (labels sorted by doc_id from _cc_vectorized)
            node = labels["doc_id"].to_numpy(zero_copy_only=False)
            lab = labels["cluster_id"].to_numpy(zero_copy_only=False)
            if node.shape[0]:
                pos = np.searchsorted(node, did)
                posc = np.clip(pos, 0, node.shape[0] - 1)
                hit = (pos < node.shape[0]) & (node[posc] == did)
                cid = np.where(hit, lab[posc], did)
            else:
                cid = did
            # per-cluster size + rep sha (rep doc_id == cluster_id).
            # rep can be EMPTY (a corpus with zero duplicate pairs ->
            # empty label table); np.where evaluates both branches, so
            # the size-0 gather must be short-circuited, not just masked
            sha_np = _sha_to_np(batch["sha256"])
            if rep["cids"].shape[0]:
                cpos = np.searchsorted(rep["cids"], cid)
                cposc = np.clip(cpos, 0, rep["cids"].shape[0] - 1)
                chit = (cpos < rep["cids"].shape[0]) & (
                    rep["cids"][cposc] == cid
                )
                n_copies = np.where(chit, rep["sizes"][cposc], 1)
                exact = chit & (rep["rep_sha"][cposc] == sha_np)
            else:
                n_copies = np.ones(n, dtype=np.int64)
                exact = np.zeros(n, dtype=bool)
            keep = did == cid
            reason = np.where(
                keep,
                np.where(n_copies == 1, "unique", "kept"),
                np.where(exact, "exact_dup", "near_dup"),
            )
            return pa.table(
                {
                    "doc_id": pa.array(did, type=pa.int64()),
                    "cluster_id": pa.array(cid, type=pa.int64()),
                    "n_copies": pa.array(n_copies, type=pa.int64()),
                    "keep": pa.array(keep),
                    "reason": pa.array(reason.astype(object), type=pa.string()),
                }
            )

        return docs.map_batches(report_batch, batch_format="pyarrow")

    clusters = out["clusters"]
    P = cfg.num_partitions

    def add_part(batch: pa.Table) -> pa.Table:
        c = batch["cluster_id"].to_numpy(zero_copy_only=False)
        return batch.append_column("part", pa.array((c % P).astype("int64")))

    def report_partition(group: pa.Table) -> pa.Table:
        n = group.num_rows
        cid = group["cluster_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        did = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((did, cid))
        cid_s, did_s = cid[order], did[order]
        sha = group["sha256"].take(pa.array(order))
        starts = np.flatnonzero(np.concatenate(([True], cid_s[1:] != cid_s[:-1])))
        seg = np.cumsum(np.concatenate(([0], (cid_s[1:] != cid_s[:-1]).astype(np.int64))))
        sizes = np.diff(np.concatenate((starts, [n])))
        n_copies = sizes[seg]
        rep_row = starts[seg]  # first row of the segment = min doc_id = rep
        keep = did_s == did_s[rep_row]
        # sha equality vs the representative, vectorized over fixed binary
        sha_np = np.frombuffer(
            sha.combine_chunks().buffers()[1], dtype="S32", count=n
        )
        exact = sha_np == sha_np[rep_row]
        reason = np.where(
            keep,
            np.where(n_copies == 1, "unique", "kept"),
            np.where(exact, "exact_dup", "near_dup"),
        )
        return pa.table(
            {
                "doc_id": pa.array(did_s, type=pa.int64()),
                "cluster_id": pa.array(cid_s, type=pa.int64()),
                "n_copies": pa.array(n_copies, type=pa.int64()),
                "keep": pa.array(keep),
                "reason": pa.array(reason.astype(object), type=pa.string()),
            }
        )

    return (
        clusters.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(report_partition, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# pairs-mode candidate generation + verification
# ---------------------------------------------------------------------------


@ray.remote
def _dedup_raw_pairs_task(*blocks) -> pa.Table:
    import numpy as np

    tables = [
        b.select(["src", "dst", "truncated"])
        for b in blocks
        if b.num_rows > 0 and "src" in b.column_names
    ]
    if not tables:
        from libpostal_ray.stages.verify import PAIR_SCHEMA

        return PAIR_SCHEMA.empty_table()
    t = pa.concat_tables(tables)
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    trunc = t["truncated"].to_numpy(zero_copy_only=False)
    # truncated first within a pair group so the kept row preserves the flag
    order = np.lexsort((~trunc, dst, src))
    src, dst, trunc = src[order], dst[order], trunc[order]
    keep = np.concatenate(([True], (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])))
    return pa.table(
        {
            "src": pa.array(src[keep], type=pa.int64()),
            "dst": pa.array(dst[keep], type=pa.int64()),
            "truncated": pa.array(trunc[keep]),
        }
    )


def _sha_to_np(arr) -> "np.ndarray":
    """fixed_size_binary(32) column -> np 'S32' array, zero-copy per chunk."""
    import numpy as np

    if isinstance(arr, pa.ChunkedArray):
        chunks = arr.chunks
    else:
        chunks = [arr]
    parts = []
    for c in chunks:
        buf = c.buffers()[1]
        off = c.offset * 32
        parts.append(
            np.frombuffer(buf, dtype="S32", count=len(c), offset=off)
        )
    return np.concatenate(parts) if parts else np.empty(0, dtype="S32")


@ray.remote
def _build_sig_state(*blocks) -> dict:
    """Build ONE SHARD of the broadcast verification state in a worker (not
    the driver): arrays sorted by doc_id for searchsorted lookup.  The full
    state is a LIST of such shards (one per build task, each handling a
    subset of the signature blocks) so the build parallelizes — a single
    build task over the whole corpus was a multi-second serial straggler
    that delayed the verify wave."""
    import numpy as np

    parts = [
        b.select(
            ["doc_id", "sha256", "minhash8", "simhash", "is_short",
             "n_shingles", "phonetic", "phonetic2", "acronym",
             "acronym2", "exp4"]
        )
        for b in blocks
        if b.num_rows > 0
    ]
    if not parts:
        return {
            "ids": np.empty(0, dtype=np.int64),
            "sha": np.empty(0, dtype="S32"),
            "mh": np.empty((0, 0), dtype=np.uint8),
            "sim": np.empty(0, dtype=np.uint64),
            "short": np.empty(0, dtype=bool),
            "nsh": np.empty(0, dtype=np.int64),
            "ph": np.empty(0, dtype=np.int64),
            "ph2": np.empty(0, dtype=np.int64),
            "ac": np.empty(0, dtype=np.int64),
            "ac2": np.empty(0, dtype=np.int64),
            "exp": np.empty((0, 4), dtype=np.int64),
        }
    t = pa.concat_tables(parts)
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype("int64")
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    sha = _sha_to_np(t["sha256"])[order]
    mh = t["minhash8"]
    if isinstance(mh, pa.ChunkedArray):
        mh = mh.combine_chunks()
    K = len(mh[0])
    mh = mh.flatten().to_numpy(zero_copy_only=False).reshape(-1, K)[order]
    sim = (
        t["simhash"].to_numpy(zero_copy_only=False).astype("int64").view("uint64")[order]
    )
    short = t["is_short"].to_numpy(zero_copy_only=False).astype(bool)[order]
    nsh = t["n_shingles"].to_numpy(zero_copy_only=False).astype("int64")[order]
    ph = t["phonetic"].to_numpy(zero_copy_only=False).astype("int64")[order]
    ph2 = t["phonetic2"].to_numpy(zero_copy_only=False).astype("int64")[order]
    ac = t["acronym"].to_numpy(zero_copy_only=False).astype("int64")[order]
    ac2 = t["acronym2"].to_numpy(zero_copy_only=False).astype("int64")[order]
    e4 = t["exp4"]
    if isinstance(e4, pa.ChunkedArray):
        e4 = e4.combine_chunks()
    exp = e4.flatten().to_numpy(zero_copy_only=False).reshape(-1, 4)[order]
    return {"ids": ids, "sha": sha, "mh": mh, "sim": sim, "short": short,
            "nsh": nsh, "ph": ph, "ph2": ph2, "ac": ac, "ac2": ac2,
            "exp": exp}


def _sig_state_refs(sigs: ray.data.Dataset, n_shards: int | None = None) -> list:
    """The broadcast small side, SHARDED: n_shards build tasks each sort a
    subset of the signature blocks; every verify task resolves the shard
    list (zero-copy from the store) and gathers endpoints across shards.
    Parallel build removes the single-task straggler from the critical path
    (measured ~5 s serial at 1M docs, delaying the verify wave ~1 s past
    the reduce wave)."""
    refs = sigs.materialize().to_arrow_refs()
    if n_shards is None:
        cpus = int(ray.cluster_resources().get("CPU", 4))
        n_shards = max(1, min(16, cpus, len(refs)))
    groups = [refs[i::n_shards] for i in range(n_shards)]
    return [_build_sig_state.remote(*g) for g in groups]


def _state_gather(states: list, ids) -> tuple:
    """(mh, sha, sim, short, nsh, ph) rows for ``ids``, gathered from the
    shard list (each shard sorted by doc_id; one searchsorted per shard)."""
    import numpy as np

    n = ids.shape[0]
    K = next((s["mh"].shape[1] for s in states if s["ids"].shape[0]), 0)
    mh = np.zeros((n, K), dtype=np.uint8)
    sha = np.zeros(n, dtype="S32")
    sim = np.zeros(n, dtype=np.uint64)
    short = np.zeros(n, dtype=bool)
    nsh = np.zeros(n, dtype=np.int64)
    ph = np.zeros(n, dtype=np.int64)
    ph2 = np.zeros(n, dtype=np.int64)
    ac = np.zeros(n, dtype=np.int64)
    ac2 = np.zeros(n, dtype=np.int64)
    exp = np.zeros((n, 4), dtype=np.int64)
    found = np.zeros(n, dtype=bool)
    for st in states:
        sids = st["ids"]
        if sids.shape[0] == 0:
            continue
        pos = np.searchsorted(sids, ids)
        posc = np.clip(pos, 0, sids.shape[0] - 1)
        hit = (~found) & (pos < sids.shape[0]) & (sids[posc] == ids)
        if not hit.any():
            continue
        p = posc[hit]
        mh[hit] = st["mh"][p]
        sha[hit] = st["sha"][p]
        sim[hit] = st["sim"][p]
        short[hit] = st["short"][p]
        nsh[hit] = st["nsh"][p]
        ph[hit] = st["ph"][p]
        ph2[hit] = st["ph2"][p]
        ac[hit] = st["ac"][p]
        ac2[hit] = st["ac2"][p]
        exp[hit] = st["exp"][p]
        found |= hit
    return mh, sha, sim, short, nsh, ph, ph2, ac, ac2, exp


def _verify_against_state(src, dst, trunc, states: list, cfg: PipelineConfig) -> pa.Table:
    """Vectorized pair verification against the sharded broadcast signature
    state (sorted-id searchsorted lookup per shard)."""
    import numpy as np

    from libpostal_ray.stages.verify import EDGE_SCHEMA, verify_pair_statuses

    (mh_a, sha_a, sim_a, short_a, nsh_a, ph_a, ph2_a, ac_a, ac2_a,
     exp_a) = _state_gather(states, src)
    (mh_b, sha_b, sim_b, short_b, nsh_b, ph_b, ph2_b, ac_b, ac2_b,
     exp_b) = _state_gather(states, dst)
    # every pair endpoint comes from the signature table by construction
    raw = (mh_a == mh_b).mean(axis=1)
    exact = sha_a == sha_b
    both_short = short_a & short_b
    ham = np.zeros(src.shape[0], dtype=np.int64)
    if both_short.any():
        x = (sim_a ^ sim_b).view(np.uint8).reshape(-1, 8)
        ham = np.unpackbits(x, axis=1).sum(axis=1).astype(np.int64)
    status, est = verify_pair_statuses(
        exact, raw, both_short, ham, cfg,
        nsh_a=nsh_a, nsh_b=nsh_b, ph_a=ph_a, ph_b=ph_b,
        ph2_a=ph2_a, ph2_b=ph2_b, ac_a=ac_a, ac_b=ac_b,
        ac2_a=ac2_a, ac2_b=ac2_b, exp_a=exp_a, exp_b=exp_b,
    )
    keep = status > 0
    return pa.table(
        {
            "src": pa.array(src[keep], type=pa.int64()),
            "dst": pa.array(dst[keep], type=pa.int64()),
            "status": pa.array(status[keep], type=pa.int8()),
            "est_jaccard": pa.array(est[keep], type=pa.float64()),
            "truncated": pa.array(trunc[keep]),
        },
        schema=EDGE_SCHEMA,
    )


def _verify_pairs_broadcast(
    pairs: ray.data.Dataset, sigs: ray.data.Dataset, cfg: PipelineConfig
) -> ray.data.Dataset:
    refs = _sig_state_refs(sigs)

    def verify_batch(batch: pa.Table) -> pa.Table:
        states = ray.get(refs)
        src = batch["src"].to_numpy(zero_copy_only=False).astype("int64")
        dst = batch["dst"].to_numpy(zero_copy_only=False).astype("int64")
        trunc = batch["truncated"].to_numpy(zero_copy_only=False)
        return _verify_against_state(src, dst, trunc, states, cfg)

    return pairs.map_batches(
        verify_batch, batch_format="pyarrow", batch_size=cfg.verify_batch_size
    )


def _verify_pairs_join(
    pairs: ray.data.Dataset, sigs: ray.data.Dataset, cfg: PipelineConfig
) -> ray.data.Dataset:
    """Join path for corpora too big to broadcast: two hash joins attach each
    side's verification columns (minhash8 packed to fixed binary — Arrow's
    join cannot carry list payloads), then a vectorized verify map."""
    import numpy as np

    from libpostal_ray.pipelines.cluster import effective_join_partitions
    from libpostal_ray.stages.verify import EDGE_SCHEMA, verify_pair_statuses

    K = cfg.num_perm

    def pack(batch: pa.Table, suffix: str) -> pa.Table:
        mh = batch["minhash8"]
        if isinstance(mh, pa.ChunkedArray):
            mh = mh.combine_chunks()
        # fixed_size_list<uint8,K> -> fixed_size_binary(K): SAME buffer
        # layout, zero-copy rewrap (Arrow's join can carry fixed binary but
        # not list payloads)
        flat = mh.flatten()
        values_buf = flat.buffers()[1]
        mh_bin = pa.Array.from_buffers(
            pa.binary(K),
            batch.num_rows,
            [None, values_buf],
            offset=flat.offset // K if flat.offset else 0,
        )
        # exp4 fixed_size_list<int64,4> -> fixed_size_binary(32): same
        # zero-copy rewrap trick (joins cannot carry list payloads)
        e4 = batch["exp4"]
        if isinstance(e4, pa.ChunkedArray):
            e4 = e4.combine_chunks()
        e4_flat = e4.flatten()
        exp_bin = pa.Array.from_buffers(
            pa.binary(32),
            batch.num_rows,
            [None, e4_flat.buffers()[1]],
            offset=e4_flat.offset // 4 if e4_flat.offset else 0,
        )
        return pa.table(
            {
                f"jkey{suffix}": batch["doc_id"],
                f"sha{suffix}": batch["sha256"],
                f"mh{suffix}": mh_bin,
                f"sim{suffix}": batch["simhash"],
                f"short{suffix}": batch["is_short"],
                f"nsh{suffix}": batch["n_shingles"],
                f"ph{suffix}": batch["phonetic"],
                f"ph2{suffix}": batch["phonetic2"],
                f"ac{suffix}": batch["acronym"],
                f"ac2{suffix}": batch["acronym2"],
                f"exp{suffix}": exp_bin,
            }
        )

    slim = sigs.select_columns(
        ["doc_id", "sha256", "minhash8", "simhash", "is_short",
         "n_shingles", "phonetic", "phonetic2", "acronym", "acronym2",
         "exp4"]
    )
    side_a = slim.map_batches(lambda b: pack(b, "_a"), batch_format="pyarrow")
    side_b = slim.map_batches(lambda b: pack(b, "_b"), batch_format="pyarrow")
    npart = effective_join_partitions(cfg.verify_partitions)
    j = pairs.join(side_a, join_type="inner", num_partitions=npart, on=("src",), right_on=("jkey_a",))
    j = j.join(side_b, join_type="inner", num_partitions=npart, on=("dst",), right_on=("jkey_b",))

    def verify_batch(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False).astype("int64")
        dst = batch["dst"].to_numpy(zero_copy_only=False).astype("int64")
        trunc = batch["truncated"].to_numpy(zero_copy_only=False)
        mh_a = np.frombuffer(b"".join(batch["mh_a"].to_pylist()), dtype=np.uint8).reshape(-1, K)
        mh_b = np.frombuffer(b"".join(batch["mh_b"].to_pylist()), dtype=np.uint8).reshape(-1, K)
        raw = (mh_a == mh_b).mean(axis=1)
        sha_a = np.array(batch["sha_a"].to_pylist(), dtype="S32")
        sha_b = np.array(batch["sha_b"].to_pylist(), dtype="S32")
        exact = sha_a == sha_b
        short_a = batch["short_a"].to_numpy(zero_copy_only=False).astype(bool)
        short_b = batch["short_b"].to_numpy(zero_copy_only=False).astype(bool)
        both_short = short_a & short_b
        sim_a = batch["sim_a"].to_numpy(zero_copy_only=False).astype("int64").view("uint64")
        sim_b = batch["sim_b"].to_numpy(zero_copy_only=False).astype("int64").view("uint64")
        ham = np.zeros(src.shape[0], dtype=np.int64)
        if both_short.any():
            x = (sim_a ^ sim_b).view(np.uint8).reshape(-1, 8)
            ham = np.unpackbits(x, axis=1).sum(axis=1).astype(np.int64)
        nsh_a = batch["nsh_a"].to_numpy(zero_copy_only=False).astype("int64")
        nsh_b = batch["nsh_b"].to_numpy(zero_copy_only=False).astype("int64")
        ph_a = batch["ph_a"].to_numpy(zero_copy_only=False).astype("int64")
        ph_b = batch["ph_b"].to_numpy(zero_copy_only=False).astype("int64")
        ph2_a = batch["ph2_a"].to_numpy(zero_copy_only=False).astype("int64")
        ph2_b = batch["ph2_b"].to_numpy(zero_copy_only=False).astype("int64")
        ac_a = batch["ac_a"].to_numpy(zero_copy_only=False).astype("int64")
        ac_b = batch["ac_b"].to_numpy(zero_copy_only=False).astype("int64")
        ac2_a = batch["ac2_a"].to_numpy(zero_copy_only=False).astype("int64")
        ac2_b = batch["ac2_b"].to_numpy(zero_copy_only=False).astype("int64")
        exp_a = np.frombuffer(
            b"".join(batch["exp_a"].to_pylist()), dtype=np.int64
        ).reshape(-1, 4)
        exp_b = np.frombuffer(
            b"".join(batch["exp_b"].to_pylist()), dtype=np.int64
        ).reshape(-1, 4)
        status, est = verify_pair_statuses(
            exact, raw, both_short, ham, cfg,
            nsh_a=nsh_a, nsh_b=nsh_b, ph_a=ph_a, ph_b=ph_b,
            ph2_a=ph2_a, ph2_b=ph2_b, ac_a=ac_a, ac_b=ac_b,
            ac2_a=ac2_a, ac2_b=ac2_b, exp_a=exp_a, exp_b=exp_b,
        )
        keep = status > 0
        return pa.table(
            {
                "src": pa.array(src[keep], type=pa.int64()),
                "dst": pa.array(dst[keep], type=pa.int64()),
                "status": pa.array(status[keep], type=pa.int8()),
                "est_jaccard": pa.array(est[keep], type=pa.float64()),
                "truncated": pa.array(trunc[keep]),
            },
            schema=EDGE_SCHEMA,
        )

    return j.map_batches(verify_batch, batch_format="pyarrow", batch_size=cfg.verify_batch_size)


def _candidate_edges_pairs(
    sigs: ray.data.Dataset, cfg: PipelineConfig, extras: dict | None = None
) -> ray.data.Dataset:
    import numpy as np

    from libpostal_ray.stages.lsh import explode_band_keys_skinny
    from libpostal_ray.stages.verify import PairGenPartition

    P = cfg.verify_partitions

    def add_vpart(batch: pa.Table) -> pa.Table:
        k = batch["band_key"].to_numpy(zero_copy_only=False)
        return batch.append_column("vpart", pa.array((k % P).astype("int64")))

    if cfg.shuffle_impl == "manual" and sigs.count() <= cfg.sig_broadcast_max:
        # FUSED scale plan: the broadcast verification state starts building
        # the moment the exchange launches (overlapped AND sharded across
        # workers), and the pair-identity dedup reducers verify their pairs
        # in place — edges come straight out of the chained exchange with no
        # extra pass.
        state_refs = _sig_state_refs(sigs)
        if extras is not None:
            extras["state_refs"] = state_refs
        return _manual_exchange_pairs(sigs, cfg, state_refs=state_refs)
    if cfg.shuffle_impl == "manual":
        # above the broadcast budget: exchange yields unique pairs, verify
        # attaches signatures via two hash joins
        pairs = _manual_exchange_pairs(sigs, cfg).materialize()
        if pairs.count() == 0:
            from libpostal_ray.stages.verify import EDGE_SCHEMA

            return ray.data.from_arrow(EDGE_SCHEMA.empty_table())
    else:
        skinny = sigs.map_batches(
            explode_band_keys_skinny, batch_format="pyarrow", zero_copy_batch=True
        )
        gen = PairGenPartition(cfg)

        def pairgen_partition(group: pa.Table) -> pa.Table:
            return gen(group)

        raw_pairs = (
            skinny.map_batches(add_vpart, batch_format="pyarrow")
            .groupby("vpart")
            .map_groups(pairgen_partition, batch_format="pyarrow")
            .materialize()
        )
        n = raw_pairs.count()
        if n == 0:
            from libpostal_ray.stages.verify import EDGE_SCHEMA

            return ray.data.from_arrow(EDGE_SCHEMA.empty_table())
        if n <= PAIR_DEDUP_LOCAL_MAX:
            pairs = ray.data.from_arrow(
                ray.get(_dedup_raw_pairs_task.remote(*raw_pairs.to_arrow_refs()))
            )
        else:
            from ray.data.aggregate import Max as _Max

            pairs = raw_pairs.groupby(["src", "dst"]).aggregate(
                _Max("truncated", alias_name="truncated")
            )

    n_docs = sigs.count()
    if n_docs <= cfg.sig_broadcast_max:
        return _verify_pairs_broadcast(pairs, sigs, cfg)
    return _verify_pairs_join(pairs, sigs, cfg)


# ---------------------------------------------------------------------------
# manual hash exchange for the pairgen shuffle
# ---------------------------------------------------------------------------
# Ray Data's groupby runs a sample-based range SORT — global order we don't
# need (bucket colocation only).  This is the one spot where the Dataset API
# can't express the cheaper plan, so it drops to raw Ray tasks (as SURVEY.md
# section 7 anticipates): map tasks split each block by band_key % P into P
# separate objects (num_returns=P), one reduce task per partition concats its
# slices and runs the vectorized PairGen kernel.  Deterministic: partitioning
# is a pure hash, PairGen sorts within the partition.


def _split_block_by_key(P: int, *tables: pa.Table) -> list[pa.Table]:
    """Explode SIGNATURE blocks to skinny (band_key, doc_id, sha_key) rows
    and split them into P hash partitions (fused: the skinny table never
    materializes as a whole dataset).  One split task handles SEVERAL input
    blocks, keeping the exchange's object count at O(n_split_tasks * P)
    instead of O(n_blocks * P) — object-store metadata handling is a fixed
    per-object cost that otherwise dominates on fine-blocked inputs."""
    import numpy as np

    from libpostal_ray.stages.lsh import explode_band_keys_skinny

    sk = pa.concat_tables([explode_band_keys_skinny(t) for t in tables])
    k = sk["band_key"].to_numpy(zero_copy_only=False)
    part = (k % P).astype(np.int64)
    order = np.argsort(part, kind="stable")
    ts = sk.take(pa.array(order))
    part_s = part[order]
    bounds = np.searchsorted(part_s, np.arange(P + 1))
    return [ts.slice(int(bounds[p]), int(bounds[p + 1] - bounds[p])) for p in range(P)]


def _pairgen_reduce(cfg: PipelineConfig, P2: int, *slices: pa.Table) -> list[pa.Table]:
    """Bucket reduce: run PairGen over this partition's skinny rows, then
    hash-split the emitted pairs by pair identity into P2 slices — the
    SECOND exchange that makes the global (src,dst) dedup fully distributed
    (no single-task sort barrier)."""
    import numpy as np

    from libpostal_ray.functions.hashing import mix_fold_u64
    from libpostal_ray.stages.verify import PAIR_SCHEMA, PairGenPartition

    parts = [s for s in slices if s.num_rows > 0]
    if not parts:
        return [PAIR_SCHEMA.empty_table()] * P2
    pairs = PairGenPartition(cfg)(pa.concat_tables(parts))
    if pairs.num_rows == 0:
        return [PAIR_SCHEMA.empty_table()] * P2
    src = pairs["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
    dst = pairs["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
    h = mix_fold_u64([src, dst], salt=0x9A12)
    part = (h % np.uint64(P2)).astype(np.int64)
    order = np.argsort(part, kind="stable")
    ts = pairs.take(pa.array(order))
    part_s = part[order]
    bounds = np.searchsorted(part_s, np.arange(P2 + 1))
    return [ts.slice(int(bounds[p]), int(bounds[p + 1] - bounds[p])) for p in range(P2)]


def _dedup_pairs_partition(cfg, n_states: int, *parts_in: pa.Table) -> pa.Table:
    """Per-partition (src,dst) dedup of raw pairs (truncated takes OR
    semantics) — each partition holds ALL occurrences of its pairs because
    the reduce split by a pure hash of the pair identity.

    The first ``n_states`` varargs are broadcast signature-state SHARDS
    (built CONCURRENTLY with the exchange; Ray resolves top-level ObjectRef
    args, which is why they ride in *args rather than a list).  With shards
    present the task verifies its deduped pairs in place and returns EDGE
    rows — fusing the verify stage into the reduce removes a whole dataset
    pass + serial barrier from the hot path."""
    import numpy as np

    from libpostal_ray.stages.verify import EDGE_SCHEMA, PAIR_SCHEMA

    states = list(parts_in[:n_states])
    slices = parts_in[n_states:]
    parts = [s for s in slices if s.num_rows > 0]
    if not parts:
        return EDGE_SCHEMA.empty_table() if n_states else PAIR_SCHEMA.empty_table()
    t = pa.concat_tables(parts)
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    trunc = t["truncated"].to_numpy(zero_copy_only=False)
    order = np.lexsort((dst, src))
    src, dst, trunc = src[order], dst[order], trunc[order]
    keep = np.concatenate(([True], (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])))
    seg = np.cumsum(keep) - 1
    trunc_or = np.zeros(int(keep.sum()), dtype=bool)
    np.logical_or.at(trunc_or, seg, trunc)
    src, dst = src[keep], dst[keep]
    if states:
        return _verify_against_state(
            src.astype("int64"), dst.astype("int64"), trunc_or, states, cfg
        )
    return pa.table(
        {
            "src": pa.array(src, type=pa.int64()),
            "dst": pa.array(dst, type=pa.int64()),
            "truncated": pa.array(trunc_or),
        },
        schema=PAIR_SCHEMA,
    )


def _streamed_candidate_edges(
    corpus: ray.data.Dataset, cfg: PipelineConfig, extras: dict | None = None
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Streaming fused plan: signature blocks flow into split and
    state-shard tasks AS THEY ARE PRODUCED (``iter_internal_ref_bundles``),
    so the exchange's map side and the broadcast-state build overlap the
    signature stage's tail instead of waiting behind a full materialize
    barrier.  Returns (sigs dataset over the same blocks, edge dataset).

    Group size doubles once a CPU's worth of split tasks is in flight, so
    the exchange's object count stays ~O(cpus x P) however many blocks the
    corpus produces (the round-2 object-count lesson).  If the streamed row
    count crosses sig_broadcast_max, shard builds stop and verification
    falls back to the hash-join path — same plan the non-streamed route
    picks."""
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 4))
    P = max(8, min(cfg.verify_partitions, cpus * 2))
    P2 = P
    split = _ray.remote(num_returns=P)(_split_block_by_key)

    blocks: list = []
    outs: list = []
    state_refs: list = []
    group: list = []
    total_rows = 0
    state_ok = True
    G = 8

    def launch(g: list) -> None:
        nonlocal G
        outs.append(split.remote(P, *g))
        if state_ok:
            state_refs.append(_build_sig_state.remote(*g))
        if len(outs) >= cpus:
            G *= 2

    for bundle in signatures(corpus, cfg).iter_internal_ref_bundles():
        for ref in bundle.block_refs:
            blocks.append(ref)
            group.append(ref)
        nr = bundle.num_rows()
        total_rows += nr or 0
        if total_rows > cfg.sig_broadcast_max:
            state_ok = False
        if len(group) >= G:
            launch(group)
            group = []
    if group:
        launch(group)

    if not blocks or total_rows == 0:
        empty = signatures(corpus, cfg).materialize()
        from libpostal_ray.stages.verify import EDGE_SCHEMA

        return empty, ray.data.from_arrow(EDGE_SCHEMA.empty_table())

    sigs = ray.data.from_arrow_refs(blocks)

    reduce_fn = _ray.remote(num_returns=P2)(_pairgen_reduce)
    mid = [
        reduce_fn.remote(cfg, P2, *[outs[i][p] for i in range(len(outs))])
        for p in range(P)
    ]
    dedup_fn = _ray.remote(_dedup_pairs_partition)
    srefs = state_refs if state_ok else []
    pair_refs = [
        dedup_fn.remote(cfg, len(srefs), *srefs, *[mid[p][q] for p in range(P)])
        for q in range(P2)
    ]
    if state_ok:
        if extras is not None:
            extras["state_refs"] = srefs
            # hand the caller the RAW edge refs: from_arrow_refs blocks on
            # metadata, so building the Dataset here would stall the driver
            # before it can chain the CC/assign tail onto these refs
            extras["pair_refs"] = pair_refs
            return sigs, None
        return sigs, ray.data.from_arrow_refs(pair_refs)
    pairs = ray.data.from_arrow_refs(pair_refs).materialize()
    if pairs.count() == 0:
        from libpostal_ray.stages.verify import EDGE_SCHEMA

        return sigs, ray.data.from_arrow(EDGE_SCHEMA.empty_table())
    return sigs, _verify_pairs_join(pairs, sigs, cfg)


def _manual_exchange_pairs(
    sigs: ray.data.Dataset, cfg: PipelineConfig, state_refs: list | None = None
) -> ray.data.Dataset:
    """Two chained manual hash exchanges expressed as raw Ray tasks (the one
    plan Ray Data's sort-based groupby cannot express):

        sig blocks --num_returns=P-->  bucket partitions (band_key % P)
        PairGen    --num_returns=P2--> pair partitions  (hash(src,dst) % P2)
        per-partition dedup -> globally unique candidate pairs

    No driver-side barrier, no single-task global sort; every stage is a
    pure hash partition so retries are deterministic."""
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 4))
    P = max(8, min(cfg.verify_partitions, cpus * 2))
    P2 = P
    blocks = sigs.materialize().to_arrow_refs()
    # one split task per core (each handling several blocks): object count
    # stays O(cpus * P), not O(n_blocks * P)
    n_split = max(1, min(len(blocks), cpus))
    groups = [blocks[i::n_split] for i in range(n_split)]
    split = _ray.remote(num_returns=P)(_split_block_by_key)
    outs = [split.remote(P, *g) for g in groups]
    reduce_fn = _ray.remote(num_returns=P2)(_pairgen_reduce)
    mid = [reduce_fn.remote(cfg, P2, *[outs[i][p] for i in range(len(outs))]) for p in range(P)]
    dedup_fn = _ray.remote(_dedup_pairs_partition)
    srefs = state_refs or []
    pair_refs = [
        dedup_fn.remote(cfg, len(srefs), *srefs, *[mid[p][q] for p in range(P)])
        for q in range(P2)
    ]
    return ray.data.from_arrow_refs(pair_refs)


# ---------------------------------------------------------------------------
# two-tier verification: exact Jaccard for the NEEDS_REVIEW band
# ---------------------------------------------------------------------------


def refine_review_edges(
    edges: ray.data.Dataset,
    corpus: ray.data.Dataset,
    cfg: PipelineConfig,
) -> ray.data.Dataset:
    """Re-verify NEEDS_REVIEW edges with EXACT shingle-set Jaccard.

    The reference's lattice is two-tier: cheap checks put a pair at
    needs_review, and the expensive fuzzy scorers (soft_tfidf.c) decide —
    our analog recomputes the exact Jaccard over canonical shingle sets for
    JUST the review pairs (a tiny fraction of the corpus: content is fetched
    once for the affected doc ids via broadcast, never shuffled).

    Pairs the exact Jaccard does NOT clear get a second opinion from the
    fuzzy scorers — Jaro-Winkler and Damerau-Levenshtein similarity on the
    canonical text (string_similarity.c:529-590, 356-432 analogs; soft_tfidf
    default jw >= 0.9 carried as cfg.fuzzy_sim_likely) — which rescues
    REORDERED/lightly-edited docs whose shingle sets diverge.  Fuzzy scoring
    is skipped for docs longer than cfg.fuzzy_max_chars (O(n*m) DP).

    Returns the edge dataset with review edges upgraded to LIKELY
    (exact J >= jaccard_likely, or fuzzy sim >= fuzzy_sim_likely) or kept
    at NEEDS_REVIEW, with added ``exact_jaccard`` / ``fuzzy_sim`` columns
    (-1.0 for edges the tier did not touch)."""
    import numpy as np

    import pyarrow.compute as pc

    from libpostal_ray.functions.canonicalize import canonicalize_one, compile_rules
    from libpostal_ray.functions.similarity import (
        acronym_alignment,
        dl_similarity,
        exact_jaccard,
        jaro_winkler,
        shingle_set,
        soft_token_similarity,
    )
    from libpostal_ray.stages.verify import STATUS_LIKELY, STATUS_NEEDS_REVIEW

    edges = edges.materialize()

    # vectorized status filter (no per-row lambda)
    def review_only(batch: pa.Table) -> pa.Table:
        sub = batch.filter(pc.equal(batch["status"], STATUS_NEEDS_REVIEW))
        return pa.table({"src": sub["src"], "dst": sub["dst"]})

    # gather + cap the review pairs in a WORKER task: the driver receives
    # only the total count and the (<= 2 * review_pair_cap) affected doc
    # ids — never the pair table itself (the concat was the last
    # unbounded driver-side collection, VERDICT r3)
    review_blocks = edges.map_batches(
        review_only, batch_format="pyarrow"
    ).materialize()
    n_review, needed_ids = ray.get(
        _review_pairs_task.remote(cfg.review_pair_cap, *review_blocks.to_arrow_refs())
    )
    if n_review == 0:
        def add_col(batch: pa.Table) -> pa.Table:
            out = batch.append_column(
                "exact_jaccard",
                pa.array(np.full(batch.num_rows, -1.0), type=pa.float64()),
            )
            return out.append_column(
                "fuzzy_sim",
                pa.array(np.full(batch.num_rows, -1.0), type=pa.float64()),
            )

        return edges.map_batches(add_col, batch_format="pyarrow")

    if n_review > cfg.review_pair_cap:
        import logging

        logging.getLogger(__name__).warning(
            "refine_review_edges: %d review pairs exceed review_pair_cap=%d; "
            "scoring the first %d by (src, dst) order, the rest stay "
            "NEEDS_REVIEW",
            n_review,
            cfg.review_pair_cap,
            cfg.review_pair_cap,
        )
    needed_arr = pa.array(needed_ids, type=pa.int64())

    def fetch_content(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch["doc_id"], value_set=needed_arr)
        sub = batch.filter(mask)
        return pa.table({"doc_id": sub["doc_id"], "content": sub["content"]})

    # the review state (canonical texts, shingle sets, review-local IDF) is
    # built in a WORKER task from the picked blocks — the driver never
    # concatenates content (round-2 advisory: the driver-side concat was
    # unbounded on skewed corpora)
    picked = corpus.map_batches(fetch_content, batch_format="pyarrow").materialize()
    state_ref = _build_review_state.remote(cfg, *picked.to_arrow_refs())

    idf_ref = None
    if cfg.soft_tfidf_corpus_df:
        tokens = ray.get(_review_tokens.remote(state_ref))
        idf_ref = ray.put(_corpus_idf(corpus, tokens, cfg))

    import ray as _ray

    def refine(batch: pa.Table) -> pa.Table:
        state = _ray.get(state_ref)
        idf_use = _ray.get(idf_ref) if idf_ref is not None else state["idf"]
        sets_s, texts_s = state["sets"], state["texts"]
        status = batch["status"].to_numpy(zero_copy_only=False).copy()
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        ej = np.full(batch.num_rows, -1.0)
        fz = np.full(batch.num_rows, -1.0)
        for i in np.nonzero(status == STATUS_NEEDS_REVIEW)[0]:
            a, b = sets_s.get(int(src[i])), sets_s.get(int(dst[i]))
            if a is None or b is None:
                continue
            j = exact_jaccard(a, b)
            ej[i] = j
            if j >= cfg.jaccard_likely:
                status[i] = STATUS_LIKELY
                continue
            # fuzzy second opinion for pairs exact Jaccard leaves in review
            ta, tb = texts_s.get(int(src[i])), texts_s.get(int(dst[i]))
            if ta is None or tb is None:
                continue
            if max(len(ta), len(tb)) > cfg.fuzzy_max_chars:
                continue
            sim = jaro_winkler(ta, tb)
            if sim < cfg.fuzzy_sim_likely and len(ta) * len(tb) <= 1 << 22:
                sim = max(sim, dl_similarity(ta, tb))
            if sim < cfg.fuzzy_sim_likely:
                sim = max(sim, soft_token_similarity(ta, tb, idf_use))
            if (
                sim < cfg.fuzzy_sim_likely
                and cfg.acronym_keys
                and acronym_alignment(ta, tb)
            ):
                # acronym-blocked pair whose one side IS the acronym of
                # the other's tokens: the reference's likely_dupe verdict
                sim = cfg.fuzzy_sim_likely
            fz[i] = sim
            if sim >= cfg.fuzzy_sim_likely:
                status[i] = STATUS_LIKELY
        out = batch.set_column(
            batch.column_names.index("status"),
            "status",
            pa.array(status, type=pa.int8()),
        )
        out = out.append_column("exact_jaccard", pa.array(ej, type=pa.float64()))
        return out.append_column("fuzzy_sim", pa.array(fz, type=pa.float64()))

    return edges.map_batches(refine, batch_format="pyarrow")


@ray.remote(num_returns=2)
def _review_pairs_task(cap: int, *blocks: pa.Table):
    """Gather the NEEDS_REVIEW (src, dst) pairs in a worker, apply the
    review_pair_cap (smallest (src, dst) first — deterministic), and return
    (total_pair_count, sorted unique affected doc ids).  The driver sees
    only the bounded id array (<= 2 * cap), never the pair table."""
    import numpy as np

    parts = [
        b for b in blocks if b.num_rows > 0 and "src" in b.column_names
    ]
    if not parts:
        return 0, np.empty(0, dtype=np.int64)
    tbl = pa.concat_tables(parts)
    total = tbl.num_rows
    src = tbl["src"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = tbl["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
    if total > cap:
        keep = np.lexsort((dst, src))[:cap]
        src, dst = src[keep], dst[keep]
    return total, np.unique(np.concatenate((src, dst)))


@ray.remote
def _build_review_state(cfg: PipelineConfig, *blocks: pa.Table) -> dict:
    """Review-tier broadcast state, built in a worker: canonical texts,
    shingle sets, review-set-local IDF, and the review vocabulary (for the
    optional corpus-DF pass).  Canonicalization uses the SAME flags the
    signature stage used — the exact Jaccard must be computed on the form
    the signatures were built from."""
    import math

    from libpostal_ray.functions.canonicalize import canonicalize_one, compile_rules
    from libpostal_ray.functions.similarity import shingle_set

    parts = [b for b in blocks if b.num_rows > 0]
    if not parts:
        return {"sets": {}, "texts": {}, "idf": {}, "tokens": []}
    picked = pa.concat_tables(parts)
    rules = compile_rules(cfg.rewrite_rules)
    texts = {
        int(i): canonicalize_one(
            c,
            fold_case=cfg.fold_case,
            collapse_whitespace=cfg.collapse_whitespace,
            strip_comments=cfg.strip_comments,
            compiled_rules=rules,
        )
        for i, c in zip(picked["doc_id"].to_pylist(), picked["content"].to_pylist())
    }
    sets = {i: shingle_set(c, cfg.shingle_k) for i, c in texts.items()}
    df: dict[str, int] = {}
    for c in texts.values():
        for tok in set(c.split()):
            df[tok] = df.get(tok, 0) + 1
    n_docs_rev = max(1, len(texts))
    idf = {t: math.log(1.0 + n_docs_rev / d) for t, d in df.items()}
    return {"sets": sets, "texts": texts, "idf": idf, "tokens": sorted(df)}


@ray.remote
def _review_tokens(state: dict) -> list:
    return state["tokens"]


def _corpus_idf(
    corpus: ray.data.Dataset, tokens: list, cfg: PipelineConfig
) -> dict:
    """token -> CORPUS IDF for the review vocabulary: one vectorized DF pass
    over the corpus (canonicalize -> whitespace split -> index_in the token
    list -> distinct (doc, token) -> per-token doc counts), partial counts
    combined on the driver.  Only |tokens| integers per batch leave the
    workers — the corpus itself never shuffles.  This is the reference's
    delegated token_scores contract (libpostal.h:261-262) computed by the
    engine itself."""
    import math

    import numpy as np
    import pyarrow.compute as pc

    from libpostal_ray.stages.canonicalize import CanonicalizeStage

    if not tokens:
        return {}
    T = len(tokens)
    tok_arr = pa.array(tokens, type=pa.string())
    canon = CanonicalizeStage(cfg)

    def df_partial(batch: pa.Table) -> pa.Table:
        cb = canon(batch)
        col = cb["canonical"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        split = pc.utf8_split_whitespace(col)
        if isinstance(split, pa.ChunkedArray):
            split = split.combine_chunks()
        flat = split.flatten()
        offs = split.offsets.to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(
            np.arange(batch.num_rows, dtype=np.int64), np.diff(offs)
        )
        ti = pc.index_in(flat, value_set=tok_arr).fill_null(-1).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        valid = ti >= 0
        if not valid.any():
            return pa.table(
                {
                    "ti": pa.array(np.arange(T, dtype=np.int64)),
                    "df": pa.array(np.zeros(T, dtype=np.int64)),
                }
            )
        key = doc_idx[valid] * T + ti[valid]
        uniq = np.unique(key)
        counts = np.bincount(uniq % T, minlength=T).astype(np.int64)
        return pa.table(
            {
                "ti": pa.array(np.arange(T, dtype=np.int64)),
                "df": pa.array(counts),
            }
        )

    df = np.zeros(T, dtype=np.int64)
    for b in corpus.map_batches(df_partial, batch_format="pyarrow").iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"
    ):
        if b.num_rows:
            df[b["ti"].to_numpy(zero_copy_only=False)] += b["df"].to_numpy(
                zero_copy_only=False
            )
    n_docs = corpus.count()
    return {
        tokens[i]: math.log(1.0 + n_docs / max(1, int(df[i]))) for i in range(T)
    }
