"""`python -m libpostal_ray.job` — the ray-job-submit surface.

Each invocation is a fresh subprocess that owns its OWN Ray session
(--ray-address local), exactly like a driver started by `ray job submit`;
the pytest session's Ray cluster is untouched.
"""

import json
import os
import subprocess
import sys

import pyarrow.dataset as pds
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_job(*extra):
    env = dict(os.environ, PYTHONPATH=REPO)
    # the job must not inherit the pytest session's address
    env.pop("RAY_ADDRESS", None)
    return subprocess.run(
        [
            sys.executable,
            "-m",
            "libpostal_ray.job",
            "--ray-address",
            "local",
            "--num-cpus",
            "4",
            *extra,
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )


@pytest.fixture(scope="module")
def job_corpus(tmp_path_factory):
    from libpostal_ray.synth import write_synth_corpus

    d = tmp_path_factory.mktemp("jobcorpus")
    path = str(d / "corpus.parquet")
    write_synth_corpus(path, n_files=300, seed=11)
    return path


def test_job_end_to_end_and_resume(job_corpus, tmp_path):
    out1 = str(tmp_path / "run1")
    ck = str(tmp_path / "ckpt")
    r = _run_job(
        "--input", job_corpus,
        "--output", out1,
        "--checkpoint-dir", ck,
        "--report",
        "--write-edges",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    status = json.loads(r.stdout.strip().splitlines()[-1])
    assert status["status"] == "ok"

    man = json.load(open(os.path.join(out1, "manifest.json")))
    n_docs = pds.dataset(job_corpus, format="parquet").count_rows()
    assert man["rows"]["clusters"] == n_docs
    assert man["rows"]["report"] == n_docs
    assert man["config_fingerprint"]
    # first run computed every signature partition
    sig_m = man["stage_metrics"]["signatures"]
    assert sig_m["computed_pids"] and not sig_m["loaded_pids"]

    clusters1 = (
        pds.dataset(os.path.join(out1, "clusters"), format="parquet")
        .to_table(columns=["doc_id", "cluster_id"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    rep = (
        pds.dataset(os.path.join(out1, "report"), format="parquet")
        .to_table()
        .to_pandas()
    )
    assert set(rep.reason.unique()) <= {"unique", "kept", "exact_dup", "near_dup"}
    # exactly one kept/unique row per cluster
    keeps = rep[rep.keep].groupby("cluster_id").size()
    assert (keeps == 1).all()

    # resubmit with the same checkpoint dir: everything resumes, labels equal
    out2 = str(tmp_path / "run2")
    r2 = _run_job(
        "--input", job_corpus,
        "--output", out2,
        "--checkpoint-dir", ck,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    man2 = json.load(open(os.path.join(out2, "manifest.json")))
    sig2 = man2["stage_metrics"]["signatures"]
    assert not sig2["computed_pids"] and sig2["loaded_pids"]
    clusters2 = (
        pds.dataset(os.path.join(out2, "clusters"), format="parquet")
        .to_table(columns=["doc_id", "cluster_id"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert clusters1.equals(clusters2)


def test_job_config_overrides(job_corpus, tmp_path):
    out = str(tmp_path / "cfgrun")
    r = _run_job(
        "--input", job_corpus,
        "--output", out,
        "--config", '{"bands": 8, "rows_per_band": 16, "transliterate": true}',
    )
    assert r.returncode == 0, r.stderr[-2000:]
    man = json.load(open(os.path.join(out, "manifest.json")))
    assert man["config"]["bands"] == 8
    assert man["config"]["transliterate"] is True


def test_job_incremental_mode(tmp_path):
    from libpostal_ray.synth import write_synth_corpus

    # delta = 40 corpus rows re-delivered under a new repo/path namespace
    # (new doc ids, byte-identical content -> dup_of_corpus) + 40 rows
    # from an unrelated seed (fresh -> keep, modulo their own families).
    corpus_path = str(tmp_path / "standing.parquet")
    write_synth_corpus(corpus_path, n_files=300, seed=21)

    import pyarrow.parquet as pq
    import pyarrow as pa

    t = pq.read_table(corpus_path)
    # delta: first 40 rows re-delivered under a new repo/path namespace
    # (same content -> must be dup_of_corpus) + 40 rows of a different
    # seed (fresh -> keep)
    fresh_path = str(tmp_path / "freshsrc.parquet")
    write_synth_corpus(fresh_path, n_files=100, seed=77)
    f = pq.read_table(fresh_path).slice(0, 40)
    redeliver = t.slice(0, 40)
    delta = pa.table(
        {
            "repo": pa.array(
                ["redelivery"] * 40 + f["repo"].to_pylist(), type=pa.string()
            ),
            "path": pa.array(
                [f"re/{i}.txt" for i in range(40)] + f["path"].to_pylist()
            ),
            "commit": pa.array(["d1"] * 80),
            "lang": pa.array(
                redeliver["lang"].to_pylist() + f["lang"].to_pylist()
            ),
            "content": pa.array(
                redeliver["content"].to_pylist() + f["content"].to_pylist(),
                type=t.schema.field("content").type,
            ),
        }
    )
    delta_path = str(tmp_path / "delta.parquet")
    pq.write_table(delta, delta_path)

    out = str(tmp_path / "incr")
    r = _run_job(
        "--mode", "incremental",
        "--input", delta_path,
        "--against", corpus_path,
        "--output", out,
        "--write-sigs",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    man = json.load(open(os.path.join(out, "manifest.json")))
    assert man["mode"] == "incremental" and man["rows"]["verdicts"] == 80
    v = (
        pds.dataset(os.path.join(out, "verdicts"), format="parquet")
        .to_table()
        .to_pandas()
    )
    counts = v.verdict.value_counts().to_dict()
    # every redelivered row is flagged against the corpus; fresh rows may
    # contain planted dup families of their own (dup_in_batch)
    assert counts.get("dup_of_corpus", 0) >= 40, counts
    assert counts.get("keep", 0) >= 1

    # chain: a SECOND delivery (same content, new namespace -> new ids)
    # runs --against-sigs of the first delivery: content never re-read,
    # and every row must match the prior delivery
    delta2 = delta.set_column(
        delta.schema.get_field_index("repo"),
        "repo",
        pa.array(["redelivery2"] * 80, type=pa.string()),
    )
    delta2_path = str(tmp_path / "delta2.parquet")
    pq.write_table(delta2, delta2_path)
    out2 = str(tmp_path / "incr2")
    r2 = _run_job(
        "--mode", "incremental",
        "--input", delta2_path,
        "--against-sigs", os.path.join(out, "signatures"),
        "--output", out2,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    v2 = (
        pds.dataset(os.path.join(out2, "verdicts"), format="parquet")
        .to_table()
        .to_pandas()
    )
    assert (v2.verdict == "dup_of_corpus").all()


def test_job_export_mode(tmp_path):
    """--mode export end-to-end in a fresh subprocess: sharded output +
    manifest with per-shard checksums."""
    import json
    import subprocess
    import sys

    from libpostal_ray.synth import write_synth_corpus

    corpus = str(tmp_path / "corpus.parquet")
    write_synth_corpus(corpus, n_files=300, seed=9)
    out = str(tmp_path / "out")
    r = subprocess.run(
        [
            sys.executable, "-m", "libpostal_ray.job",
            "--input", corpus, "--output", out,
            "--mode", "export", "--n-shards", "4", "--shard-seed", "7",
            "--ray-address", "local", "--num-cpus", "4",
        ],
        capture_output=True, text=True, timeout=560,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    man = json.load(open(f"{out}/manifest.json"))
    assert man["mode"] == "export" and man["rows"]["exported"] == 300
    assert len(man["shards"]) == 4
    import pyarrow.dataset as pads

    t = pads.dataset(f"{out}/shards", partitioning="hive").to_table()
    assert t.num_rows == 300


def test_job_diff_mode(job_corpus, tmp_path):
    """--mode diff: CDC audit between two code snapshots — edits +
    deletions must land in the manifest counts exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pds.dataset(job_corpus, format="parquet").to_table()
    # NEW snapshot: drop the first 20 files, edit the next 10
    content = t.column("content").to_pylist()
    for i in range(20, 30):
        content[i] = content[i] + "\n// edited"
    new = t.set_column(
        t.schema.get_field_index("content"),
        "content",
        pa.array(content, type=pa.string()),
    ).slice(20)
    new_path = str(tmp_path / "new.parquet")
    pq.write_table(new, new_path)

    out = str(tmp_path / "diffrun")
    r = _run_job(
        "--mode", "diff",
        "--input", new_path,
        "--against", job_corpus,
        "--output", out,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    man = json.load(open(os.path.join(out, "manifest.json")))
    assert man["rows"] == {"changed": 10, "removed": 20}
    d = pds.dataset(os.path.join(out, "diff"), format="parquet").to_table()
    assert d.num_rows == 30


def test_job_profile_mode(job_corpus, tmp_path):
    out = str(tmp_path / "profrun")
    r = _run_job("--mode", "profile", "--input", job_corpus, "--output", out)
    assert r.returncode == 0, r.stderr[-2000:]
    man = json.load(open(os.path.join(out, "manifest.json")))
    n = pds.dataset(job_corpus, format="parquet").count_rows()
    assert man["rows"]["profiled"] == n
    cols = man["columns"]
    assert set(cols) == {"repo", "path", "lang", "content"}
    # path is unique per file in the synth corpus shape
    assert cols["path"]["n_rows"] == n
    assert cols["content"]["n_distinct"] <= n
    assert cols["content"]["sum_len"] > 0


def test_job_simjoin_mode(job_corpus, tmp_path):
    """--mode simjoin: the exact pair-set audit job.  The synth corpus
    plants exact-dup families, so jacc=1.0 pairs must exist; a bipartite
    run against a disjoint slice must emit only cross-side pairs."""
    out = str(tmp_path / "simrun")
    r = _run_job(
        "--mode", "simjoin",
        "--input", job_corpus,
        "--output", out,
        "--sim-threshold", "9/10",
        "--shingle-k", "5",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    man = json.load(open(os.path.join(out, "manifest.json")))
    assert man["rows"]["pairs"] > 0
    assert man["threshold"] == "9/10"
    t = pds.dataset(os.path.join(out, "pairs"), format="parquet").to_table()
    assert t.num_rows == man["rows"]["pairs"]
    assert min(t.column("jacc").to_pylist()) >= 0.9

    # malformed threshold is a loud usage error, not a traceback
    r2 = _run_job(
        "--mode", "simjoin",
        "--input", job_corpus,
        "--output", str(tmp_path / "simbad"),
        "--sim-threshold", "0.05",
    )
    assert r2.returncode != 0
    assert "num/den" in (r2.stderr + r2.stdout)


def test_job_validate_mode(job_corpus, tmp_path):
    """--mode validate: the data-expectations gate.  A clean synth
    corpus passes; planting a duplicate doc id and an empty content row
    must flip passed=False with the right per-rule counts."""
    out = str(tmp_path / "valrun")
    r = _run_job("--mode", "validate", "--input", job_corpus, "--output", out)
    assert r.returncode == 0, r.stderr[-2000:]
    man = json.load(open(os.path.join(out, "manifest.json")))
    assert man["passed"] is True
    assert man["rules"]["doc_id_unique"] == 0
    assert man["rules"]["content_nonempty"] == 0

    # plant violations: duplicate a (repo, path) row -> same derived
    # doc_id; blank one content
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pds.dataset(job_corpus, format="parquet").to_table()
    dup = t.slice(0, 1)
    bad = t.set_column(
        t.column_names.index("content"),
        "content",
        pa.array(
            [""] + t["content"].to_pylist()[1:],
            type=t["content"].type,
        ),
    )
    dirty = pa.concat_tables([bad, dup])
    dirty_path = str(tmp_path / "dirty.parquet")
    pq.write_table(dirty, dirty_path)
    out2 = str(tmp_path / "valrun2")
    r = _run_job("--mode", "validate", "--input", dirty_path, "--output", out2)
    assert r.returncode == 0, r.stderr[-2000:]
    man2 = json.load(open(os.path.join(out2, "manifest.json")))
    assert man2["passed"] is False
    assert man2["rules"]["doc_id_unique"] == 1
    assert man2["rules"]["content_nonempty"] == 1
