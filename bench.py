"""Benchmark harness — prints ONE JSON line with headline + per-query times.

Usage:
    python bench.py                 # one run at $RAY_GRAFT_CPUS (default 32)
    python bench.py --scaling       # fresh-process runs at 8 and 32 CPUs on
                                    # the same input; reports both throughputs
                                    # + scaling efficiency (BASELINE.md target
                                    # >= 0.8)

Input: $GRAFT_SF_DIR (default /root/testdata/sf0.1) for the driver tables,
plus a deterministic synthetic source-code corpus (libpostal_ray.synth,
seed 42) cached under /tmp — the BASELINE.json input_hint shape at a scale
where the pipeline actually works (content ~1-2 KB/file).

Headline metric: wall seconds for the flagship near-dup clustering of the
synthetic code corpus (files/s = corpus size / headline seconds).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
SYNTH_FILES = int(os.environ.get("GRAFT_SYNTH_FILES", "20000"))
SYNTH_SEED = 42


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _synth_corpus_path() -> str:
    path = f"/tmp/libpostal_ray_bench/corpus_{SYNTH_FILES}_{SYNTH_SEED}.parquet"
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        from libpostal_ray.synth import write_synth_corpus

        write_synth_corpus(
            path, n_files=SYNTH_FILES, seed=SYNTH_SEED, n_repos=max(8, SYNTH_FILES // 100)
        )
    return path


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from libpostal_ray.config import PipelineConfig
    from libpostal_ray.pipelines import queries as q
    from libpostal_ray.pipelines.near_dupe import near_dupe_pipeline
    from libpostal_ray.sources.readers import read_code_corpus

    corpus_path = _synth_corpus_path()

    # warm the page cache (untimed): one full read of the inputs
    import pyarrow.parquet as pq

    pq.read_table(corpus_path)
    for t in ("documents", "lineitem", "events", "embeddings"):
        pq.read_table(f"{SF_DIR}/{t}.parquet")

    times: dict[str, float] = {}

    # ---- headline: flagship near-dup clustering of the code corpus ----
    t0 = time.perf_counter()
    out = near_dupe_pipeline(read_code_corpus(corpus_path), PipelineConfig())
    n_clustered = out["clusters"].count()
    headline = time.perf_counter() - t0
    times["near_dupe_code_corpus"] = headline
    assert n_clustered == SYNTH_FILES, (n_clustered, SYNTH_FILES)

    # ---- per-operator queries over the driver tables ----
    def timed(name, fn):
        t0 = time.perf_counter()
        res = fn(SF_DIR)
        # consume: datasets are lazy
        if hasattr(res, "count"):
            res.count()
        times[name] = time.perf_counter() - t0

    timed("near_dupe_documents", q.near_dupe_clusters)
    timed("exact_dedup", q.exact_dedup)
    timed("minhash_lsh_edges", q.minhash_lsh_edges)
    timed("token_count", q.token_count)
    timed("quality_stats", q.quality_stats)
    timed("lineitem_agg", q.lineitem_agg)
    timed("events_hourly", q.events_hourly)
    timed("ann_topk", lambda d: __import__("ray").data.from_pandas(q.ann_topk(d)))
    timed("fingerprint_counts", q.fingerprint_counts)

    ray.shutdown()
    return {
        "metric": "near_dupe_code_corpus_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in times.items()},
        "sf": _sf_from_dir(SF_DIR),
        "num_cpus": NUM_CPUS,
        "synth_files": SYNTH_FILES,
        "files_per_sec": round(SYNTH_FILES / headline, 1),
    }


def run_scaling() -> dict:
    def fresh(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo_cpus, hi_cpus = 8, 32
    lo = fresh(lo_cpus)
    hi = fresh(hi_cpus)
    t_lo, t_hi = lo["value"], hi["value"]
    eff = (t_lo / t_hi) / (hi_cpus / lo_cpus)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_lo": t_lo,
        "sec_hi": t_hi,
        "cpus_lo": lo_cpus,
        "cpus_hi": hi_cpus,
        "files_per_sec_lo": lo["files_per_sec"],
        "files_per_sec_hi": hi["files_per_sec"],
        "sf": lo["sf"],
        "synth_files": lo["synth_files"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
