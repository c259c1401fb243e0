"""Cluster job entry point — `ray job submit` surface.

The reference is a library embedded in a host process; the Ray-native
equivalent of "run libpostal over my corpus" is a self-contained job you
submit to a cluster:

    ray job submit --working-dir . -- \
        python -m libpostal_ray.job \
            --input  s3://bucket/corpus/            \
            --output s3://bucket/dedup_run_1/       \
            --checkpoint-dir s3://bucket/ckpt_1/    \
            --config '{"bands": 16, "num_perm": 128}' \
            --report

Locally (and in tests) the same module runs against `ray.init(address=
"local")`.  The job:

  1. reads the corpus (parquet in the (repo, path, commit, lang, content)
     schema; --input-format documents/tsv adapt the other readers),
  2. runs the flagship near-dup pipeline (optionally checkpointed — a
     resubmitted job resumes from the per-partition manifest instead of
     recomputing, state/checkpoint.py),
  3. writes clusters/ edges/ [report/] as partitioned parquet under
     --output, and
  4. writes manifest.json with config fingerprint, row counts, wall time
     and per-stage checkpoint metrics — the lineage record a scheduled
     production run keys off.

Ray ownership: `ray job submit` starts the driver inside the cluster, so
`main()` calls ray.init(address=...) ONLY if Ray isn't already initialised
(the driver contract everywhere else in this repo: library code never owns
the session).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _read_any(path: str, fmt: str):
    from libpostal_ray.sources.readers import (
        read_code_corpus,
        read_documents_corpus,
        read_tsv_corpus,
    )

    if fmt == "code":
        return read_code_corpus(path)
    if fmt == "documents":
        # read_documents_corpus takes the sf-dir containing documents.parquet
        return read_documents_corpus(path)
    if fmt == "tsv":
        return read_tsv_corpus(path)
    raise SystemExit(f"unknown input format {fmt!r}")


def _read_corpus(args):
    return _read_any(args.input, args.input_format)


def _rows_written(path: str) -> int:
    """Row count from parquet footers — no extra Ray job."""
    import pyarrow.parquet as pq

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    return total


def build_config(config_json: str | None):
    from libpostal_ray.config import PipelineConfig

    if not config_json:
        return PipelineConfig()
    if os.path.exists(config_json):
        with open(config_json) as f:
            overrides = json.load(f)
    else:
        overrides = json.loads(config_json)
    # tuples survive JSON as lists; PipelineConfig fields that are tuples
    # (rewrite_rules, expansion_alternatives) need re-tupling
    for k, v in overrides.items():
        if isinstance(v, list):
            overrides[k] = tuple(
                tuple(e) if isinstance(e, list) else e for e in v
            )
    return PipelineConfig(**overrides)


def run_job(args) -> dict:
    import ray

    from libpostal_ray.pipelines.near_dupe import (
        dedup_report,
        near_dupe_pipeline,
    )
    from libpostal_ray.state.checkpoint import config_fingerprint

    cfg = build_config(args.config)
    t0 = time.time()
    corpus = _read_corpus(args)
    out = near_dupe_pipeline(corpus, cfg, checkpoint_dir=args.checkpoint_dir)

    os.makedirs(args.output, exist_ok=True)
    out["clusters"].write_parquet(os.path.join(args.output, "clusters"))
    if args.write_edges:
        out["edges"].write_parquet(os.path.join(args.output, "edges"))
    if args.report:
        rep = dedup_report(corpus, cfg, pipeline_out=out)
        rep.write_parquet(os.path.join(args.output, "report"))

    manifest = {
        "config_fingerprint": config_fingerprint(cfg),
        "config": {
            k: v
            for k, v in cfg.to_dict().items()
            if not isinstance(v, (list, tuple)) or len(v) <= 8
        },
        "input": args.input,
        "input_format": args.input_format,
        "checkpoint_dir": args.checkpoint_dir,
        "wall_seconds": round(time.time() - t0, 3),
        "rows": {
            "clusters": _rows_written(os.path.join(args.output, "clusters")),
        },
        "stage_metrics": out.get("metrics"),
        "ray": {
            "nodes": len(ray.nodes()),
            "cpus": int(ray.cluster_resources().get("CPU", 0)),
        },
    }
    if args.report:
        manifest["rows"]["report"] = _rows_written(
            os.path.join(args.output, "report")
        )
    if args.write_edges:
        manifest["rows"]["edges"] = _rows_written(
            os.path.join(args.output, "edges")
        )
    tmp = os.path.join(args.output, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, default=str)
    os.replace(tmp, os.path.join(args.output, "manifest.json"))
    return manifest


def run_incremental(args) -> dict:
    """--mode incremental: dedupe the --input delivery against a standing
    corpus (--against parquet, or --against-sigs: a signature table
    written by a prior run's checkpoint — corpus content read ZERO times).
    Writes verdicts/ (doc_id, verdict, match_id) + manifest.json."""
    import ray
    import ray.data

    from libpostal_ray.pipelines.incremental import dedup_against_corpus
    from libpostal_ray.pipelines.near_dupe import signatures
    from libpostal_ray.state.checkpoint import config_fingerprint

    if not args.against and not args.against_sigs:
        raise SystemExit("--mode incremental requires --against or --against-sigs")
    cfg = build_config(args.config)
    t0 = time.time()
    new_docs = _read_corpus(args)
    corpus = _read_any(args.against, args.against_format) if args.against else None
    corpus_sigs = (
        ray.data.read_parquet(args.against_sigs) if args.against_sigs else None
    )
    # when persisting the delivery's signatures, sketch ONCE and feed the
    # same materialized table into the verdict DAG — the signature pass is
    # the expensive stage of the run, never pay it twice
    new_sigs = signatures(new_docs, cfg).materialize() if args.write_sigs else None
    verdicts = dedup_against_corpus(
        new_docs, corpus, cfg, corpus_sigs=corpus_sigs, new_sigs=new_sigs
    )
    os.makedirs(args.output, exist_ok=True)
    verdicts.write_parquet(os.path.join(args.output, "verdicts"))
    if new_sigs is not None:
        # so the next delta can run --against-sigs and never re-read
        # today's content either
        new_sigs.write_parquet(os.path.join(args.output, "signatures"))

    manifest = {
        "mode": "incremental",
        "config_fingerprint": config_fingerprint(cfg),
        "input": args.input,
        "against": args.against,
        "against_sigs": args.against_sigs,
        "wall_seconds": round(time.time() - t0, 3),
        "rows": {"verdicts": _rows_written(os.path.join(args.output, "verdicts"))},
        "ray": {
            "nodes": len(ray.nodes()),
            "cpus": int(ray.cluster_resources().get("CPU", 0)),
        },
    }
    tmp = os.path.join(args.output, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, default=str)
    os.replace(tmp, os.path.join(args.output, "manifest.json"))
    return manifest


def run_export(args) -> dict:
    """--mode export: deterministic seeded shuffle + sharded parquet
    export of the --input corpus (pipelines/prepare.export_training_shards
    — the trainer-facing sink).  Writes shards/shard=K/ + manifest.json
    with the per-shard summary read back from disk."""
    import ray

    from libpostal_ray.pipelines.prepare import export_training_shards
    from libpostal_ray.state.checkpoint import config_fingerprint

    cfg = build_config(args.config)
    t0 = time.time()
    docs = _read_corpus(args)
    out = os.path.join(args.output, "shards")
    summary = export_training_shards(
        docs, out, n_shards=args.n_shards, seed=args.shard_seed
    ).to_pandas()
    manifest = {
        "mode": "export",
        "config_fingerprint": config_fingerprint(cfg),
        "input": args.input,
        "n_shards": args.n_shards,
        "seed": args.shard_seed,
        "wall_seconds": round(time.time() - t0, 3),
        "rows": {"exported": int(summary.n_docs.sum())},
        "shards": {
            int(r.shard): {"n_docs": int(r.n_docs), "id_check": int(r.id_check)}
            for r in summary.itertuples()
        },
        "ray": {
            "nodes": len(ray.nodes()),
            "cpus": int(ray.cluster_resources().get("CPU", 0)),
        },
    }
    os.makedirs(args.output, exist_ok=True)
    tmp = os.path.join(args.output, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, default=str)
    os.replace(tmp, os.path.join(args.output, "manifest.json"))
    return manifest


def _keyed_text(ds):
    """Normalize a read corpus to the (doc_id, text) diff schema.  Every
    reader already derives a deterministic int64 doc_id and a canonical
    ``content`` column, so this is a projection."""
    import pyarrow as pa

    def keyed(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch["doc_id"], "text": batch["content"]})

    return ds.map_batches(keyed, batch_format="pyarrow")


def run_diff(args) -> dict:
    """--mode diff: CDC audit of the --input snapshot against the
    --against snapshot (pipelines/diff.snapshot_diff — what did this
    re-crawl / pipeline release change?).  Writes diff/ parquet
    (doc_id, status) + manifest.json with per-status counts."""
    import ray

    from libpostal_ray.pipelines.diff import snapshot_diff
    from libpostal_ray.state.checkpoint import config_fingerprint

    if not args.against:
        raise SystemExit("--mode diff requires --against (the OLD snapshot)")
    cfg = build_config(args.config)
    t0 = time.time()
    old = _keyed_text(_read_any(args.against, args.against_format))
    new = _keyed_text(_read_corpus(args))
    out_dir = os.path.join(args.output, "diff")
    snapshot_diff(old, new, key="doc_id", text_col="text").write_parquet(out_dir)
    # per-status counts from the written files (file-local scan; the diff
    # is O(delta), small relative to either snapshot)
    import pyarrow.dataset as pds

    tbl = pds.dataset(out_dir, format="parquet").to_table(columns=["status"])
    import collections

    counts = collections.Counter(tbl.column("status").to_pylist())
    manifest = {
        "mode": "diff",
        "config_fingerprint": config_fingerprint(cfg),
        "input": args.input,
        "against": args.against,
        "wall_seconds": round(time.time() - t0, 3),
        "rows": {k: int(v) for k, v in sorted(counts.items())},
        "ray": {
            "nodes": len(ray.nodes()),
            "cpus": int(ray.cluster_resources().get("CPU", 0)),
        },
    }
    os.makedirs(args.output, exist_ok=True)
    tmp = os.path.join(args.output, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, default=str)
    os.replace(tmp, os.path.join(args.output, "manifest.json"))
    return manifest


def run_profile(args) -> dict:
    """--mode profile: column profile of the --input corpus (row/null
    counts, exact distributed COUNT DISTINCT, byte-length stats) — the
    first job anyone submits against an unknown corpus.  Writes profile/
    parquet + manifest.json with the stats inline (they are O(columns))."""
    import ray

    from libpostal_ray.pipelines.profile import column_profile
    from libpostal_ray.state.checkpoint import config_fingerprint

    cfg = build_config(args.config)
    t0 = time.time()
    docs = _read_corpus(args)
    cols = ["repo", "path", "lang", "content"]
    out_dir = os.path.join(args.output, "profile")
    prof = column_profile(docs, cols)
    prof.write_parquet(out_dir)
    import pyarrow.dataset as pds

    tbl = pds.dataset(out_dir, format="parquet").to_table()
    stats = {
        r["column"]: {k: int(v) for k, v in r.items() if k != "column"}
        for r in tbl.to_pylist()
    }
    manifest = {
        "mode": "profile",
        "config_fingerprint": config_fingerprint(cfg),
        "input": args.input,
        "wall_seconds": round(time.time() - t0, 3),
        "rows": {"profiled": int(stats.get("content", {}).get("n_rows", 0))},
        "columns": stats,
        "ray": {
            "nodes": len(ray.nodes()),
            "cpus": int(ray.cluster_resources().get("CPU", 0)),
        },
    }
    os.makedirs(args.output, exist_ok=True)
    tmp = os.path.join(args.output, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, default=str)
    os.replace(tmp, os.path.join(args.output, "manifest.json"))
    return manifest


def run_validate(args) -> dict:
    """--mode validate: data-expectations validation of the --input
    corpus (id uniqueness via one exchange, non-null/non-empty row
    rules) — the gate a user runs BEFORE submitting the flagship, so a
    malformed delivery fails loudly here instead of surfacing as a
    half-clustered output.  Writes validation/ parquet + manifest.json
    with per-rule counts inline and ``passed`` = no violations."""
    import ray

    from libpostal_ray.pipelines.profile import corpus_expectations
    from libpostal_ray.state.checkpoint import config_fingerprint

    cfg = build_config(args.config)
    t0 = time.time()
    docs = _read_corpus(args)
    out_dir = os.path.join(args.output, "validation")
    rep = corpus_expectations(docs)
    rep.write_parquet(out_dir)
    import pyarrow.dataset as pds

    tbl = pds.dataset(out_dir, format="parquet").to_table()
    rules = {
        r["rule"]: int(r["n_violations"]) for r in tbl.to_pylist()
    }
    manifest = {
        "mode": "validate",
        "config_fingerprint": config_fingerprint(cfg),
        "input": args.input,
        "wall_seconds": round(time.time() - t0, 3),
        "rules": rules,
        "passed": all(v == 0 for v in rules.values()),
        "ray": {
            "nodes": len(ray.nodes()),
            "cpus": int(ray.cluster_resources().get("CPU", 0)),
        },
    }
    os.makedirs(args.output, exist_ok=True)
    tmp = os.path.join(args.output, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, default=str)
    os.replace(tmp, os.path.join(args.output, "manifest.json"))
    return manifest


def run_simjoin(args) -> dict:
    """--mode simjoin: EXACT shingle-Jaccard pair set of --input (self-
    join), or --input vs --against (bipartite: the fuzzy train/eval
    overlap audit).  Writes pairs/ parquet (ids, n_shared, sizes, jacc)
    + manifest.json with the pair count — the ground truth a user holds
    the LSH flagship's recall against at audit time."""
    import ray

    from libpostal_ray.pipelines.simjoin import (
        similarity_join_bipartite,
        similarity_join_pairs,
    )
    from libpostal_ray.state.checkpoint import config_fingerprint

    cfg = build_config(args.config)
    try:
        num, den = (int(x) for x in args.sim_threshold.split("/"))
    except ValueError:
        raise SystemExit("--sim-threshold must be 'num/den', e.g. 1/5")
    t0 = time.time()
    docs = _keyed_text(_read_corpus(args))
    out_dir = os.path.join(args.output, "pairs")
    if args.against:
        other = _keyed_text(_read_any(args.against, args.against_format))
        pairs = similarity_join_bipartite(
            docs,
            other,
            threshold_num=num,
            threshold_den=den,
            shingle_k=args.shingle_k,
            df_cap=args.df_cap,
        )
    else:
        pairs = similarity_join_pairs(
            docs,
            threshold_num=num,
            threshold_den=den,
            shingle_k=args.shingle_k,
            df_cap=args.df_cap,
        )
    pairs.write_parquet(out_dir)
    import pyarrow.dataset as pds

    n_pairs = pds.dataset(out_dir, format="parquet").count_rows()
    manifest = {
        "mode": "simjoin",
        "config_fingerprint": config_fingerprint(cfg),
        "input": args.input,
        "against": args.against,
        "threshold": f"{num}/{den}",
        "shingle_k": args.shingle_k,
        "df_cap": args.df_cap,
        "wall_seconds": round(time.time() - t0, 3),
        "rows": {"pairs": int(n_pairs)},
        "ray": {
            "nodes": len(ray.nodes()),
            "cpus": int(ray.cluster_resources().get("CPU", 0)),
        },
    }
    os.makedirs(args.output, exist_ok=True)
    tmp = os.path.join(args.output, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, default=str)
    os.replace(tmp, os.path.join(args.output, "manifest.json"))
    return manifest


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m libpostal_ray.job",
        description="Near-duplicate detection + clustering over a parquet corpus",
    )
    p.add_argument("--input", required=True, help="parquet path/dir (or sf dir for --input-format documents)")
    p.add_argument("--input-format", default="code", choices=["code", "documents", "tsv"])
    p.add_argument("--output", required=True, help="output dir: clusters/ [edges/ report/] manifest.json")
    p.add_argument("--checkpoint-dir", default=None, help="per-partition checkpoint dir; resubmits resume")
    p.add_argument("--config", default=None, help="PipelineConfig overrides: JSON string or path to a JSON file")
    p.add_argument("--report", action="store_true", help="also write the keep/drop dedup report")
    p.add_argument("--write-edges", action="store_true", help="also write verified pair edges")
    p.add_argument("--mode", default="cluster",
                   choices=["cluster", "incremental", "export", "diff",
                            "profile", "simjoin", "validate"],
                   help="cluster: flagship near-dup clustering of --input; "
                        "incremental: dedupe --input against a standing corpus; "
                        "export: seeded sharded training export; "
                        "diff: CDC audit of --input vs --against; "
                        "profile: column profile of --input; "
                        "simjoin: exact shingle-Jaccard pair set of --input "
                        "(or --input vs --against, cross-side only); "
                        "validate: data-expectations gate over --input")
    p.add_argument("--sim-threshold", default="1/20",
                   help="simjoin: Jaccard threshold as a rational 'num/den'")
    p.add_argument("--shingle-k", type=int, default=4,
                   help="simjoin: word-gram shingle width")
    p.add_argument("--df-cap", type=int, default=None,
                   help="simjoin: skip posting lists above this df "
                        "(stop-shingle pruning; None = exact)")
    p.add_argument("--against", default=None, help="incremental: standing-corpus parquet")
    p.add_argument("--n-shards", type=int, default=64, help="export: shard count")
    p.add_argument("--shard-seed", type=int, default=0, help="export: shuffle seed")
    p.add_argument("--against-format", default="code", choices=["code", "documents", "tsv"])
    p.add_argument("--against-sigs", default=None, help="incremental: precomputed signature parquet of the standing corpus (content never re-read)")
    p.add_argument("--write-sigs", action="store_true", help="incremental: persist this delivery's signatures for the next delta")
    p.add_argument("--ray-address", default=None, help="ray.init address if Ray is not already initialised (ray job submit drivers are)")
    p.add_argument("--num-cpus", type=int, default=None, help="only with --ray-address local: CPU count for the local session")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kw = {}
        if args.num_cpus is not None:
            kw["num_cpus"] = args.num_cpus
        ray.init(
            address=args.ray_address or os.environ.get("RAY_ADDRESS", "auto"),
            include_dashboard=False,
            **kw,
        )
    manifest = (
        run_incremental(args)
        if args.mode == "incremental"
        else run_export(args)
        if args.mode == "export"
        else run_diff(args)
        if args.mode == "diff"
        else run_profile(args)
        if args.mode == "profile"
        else run_simjoin(args)
        if args.mode == "simjoin"
        else run_validate(args) if args.mode == "validate" else run_job(args)
    )
    json.dump(
        {"status": "ok", "output": args.output,
         "rows": manifest.get("rows", manifest.get("rules")),
         "wall_seconds": manifest["wall_seconds"]},
        sys.stdout,
    )
    print()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
