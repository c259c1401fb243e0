"""Kill-and-resume: a partially-checkpointed run must resume without
recomputing completed partitions, and produce identical results."""

import json
import os
import shutil

import pytest

from libpostal_ray.config import PipelineConfig
from libpostal_ray.sources.readers import from_arrow_corpus
from libpostal_ray.synth import synth_code_corpus

CKPT = "/tmp/libpostal_ray_test_ckpt"
CFG = PipelineConfig(num_partitions=8, verify_partitions=16)


@pytest.fixture()
def corpus():
    return synth_code_corpus(n_files=200, seed=21, n_repos=10)


@pytest.fixture(autouse=True)
def clean_ckpt():
    shutil.rmtree(CKPT, ignore_errors=True)
    yield
    shutil.rmtree(CKPT, ignore_errors=True)


def test_signatures_kill_and_resume(ray_session, corpus):
    from libpostal_ray.pipelines.near_dupe import checkpointed_signatures, signatures

    ds = from_arrow_corpus(corpus)

    # "killed" run: only partitions {0,1,2} get computed and committed
    _, m1 = checkpointed_signatures(ds, CFG, CKPT, only_pids={0, 1, 2})
    assert set(m1["computed_pids"]) <= {0, 1, 2}
    assert m1["loaded_pids"] == []
    manifest1 = json.load(open(m1["manifest"]))
    committed1 = {
        p: e["committed_at"] for p, e in manifest1["partitions"].items()
    }

    # resumed run: completes the rest WITHOUT touching the finished partitions
    full, m2 = checkpointed_signatures(ds, CFG, CKPT)
    assert set(m2["loaded_pids"]) == set(m1["computed_pids"])
    assert not (set(m2["computed_pids"]) & set(m1["computed_pids"]))
    manifest2 = json.load(open(m2["manifest"]))
    for p, t in committed1.items():
        assert manifest2["partitions"][p]["committed_at"] == t, (
            f"partition {p} was recomputed"
        )

    # the checkpointed result equals the direct computation
    direct = signatures(ds, CFG).to_pandas().sort_values("doc_id").reset_index(drop=True)
    # pid lives in the hive directory name, not the data files
    loaded = (
        full.to_pandas()
        .drop(columns=["pid"], errors="ignore")
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(direct) == len(loaded) == corpus.num_rows
    assert (direct["doc_id"].values == loaded["doc_id"].values).all()
    assert all(
        bytes(a) == bytes(b) for a, b in zip(direct["sha256"], loaded["sha256"])
    )
    import numpy as np

    for a, b in zip(direct["minhash8"], loaded["minhash8"]):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_manifest_has_lineage_and_metrics(ray_session, corpus):
    from libpostal_ray.pipelines.near_dupe import checkpointed_signatures

    ds = from_arrow_corpus(corpus)
    _, m = checkpointed_signatures(ds, CFG, CKPT)
    manifest = json.load(open(m["manifest"]))
    assert manifest["config_fingerprint"]
    assert len(manifest["partitions"]) == CFG.num_partitions
    nonempty = [e for e in manifest["partitions"].values() if e["rows"] > 0]
    assert nonempty
    for e in nonempty:
        assert ":" in e["input_fingerprint"]  # count:xor lineage
        assert e["wall_sec"] >= 0


def test_config_change_invalidates_stage(ray_session, corpus):
    from libpostal_ray.pipelines.near_dupe import checkpointed_signatures

    ds = from_arrow_corpus(corpus)
    checkpointed_signatures(ds, CFG, CKPT)
    cfg2 = PipelineConfig(num_partitions=8, verify_partitions=16, shingle_k=7)
    _, m = checkpointed_signatures(ds, cfg2, CKPT)
    # everything recomputed under the new config
    assert m["loaded_pids"] == []
    assert len(m["computed_pids"]) == cfg2.num_partitions


def test_full_pipeline_with_checkpoints_matches(ray_session, corpus):
    from libpostal_ray.pipelines.near_dupe import near_dupe_pipeline

    ds = from_arrow_corpus(corpus)
    plain = near_dupe_pipeline(ds, CFG)["clusters"].to_pandas()
    ck = near_dupe_pipeline(ds, CFG, checkpoint_dir=CKPT)["clusters"].to_pandas()
    a = plain.sort_values("doc_id").reset_index(drop=True)
    b = ck.sort_values("doc_id").reset_index(drop=True)
    assert (a["doc_id"].values == b["doc_id"].values).all()
    assert (a["cluster_id"].values == b["cluster_id"].values).all()

    # second run: everything loaded, nothing recomputed
    out2 = near_dupe_pipeline(ds, CFG, checkpoint_dir=CKPT)
    m = out2["metrics"]
    assert m["signatures"]["computed_pids"] == []
    assert m["edges"]["computed_pids"] == []
