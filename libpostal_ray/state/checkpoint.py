"""Per-partition parquet checkpoints with manifest, lineage and metrics.

The reference has no in-library checkpointing (training epochs just re-read
files, address_parser_train.c:1104-1147); at 10^12-file scale a killed run
must resume without recomputation (north_rule).  Layout:

    <ckpt_dir>/<stage>/part=<pid>/*.parquet     completed partition data
    <ckpt_dir>/<stage>/manifest.json            the COMMIT POINT

A partition is complete iff it appears in the manifest; the manifest is
written atomically (tmp + rename) AFTER its parquet files.  On resume,
partition directories not in the manifest are deleted (they are the debris of
a killed run) and recomputed.  Each manifest entry records lineage + metrics:
row count, input fingerprint (count + xor of doc ids), wall seconds, and the
config fingerprint — a config change invalidates the whole stage.

Partition key: pid = stable_hash(repo) % num_partitions, so one repo's files
colocate (which the suffix-array substring pass also relies on).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import ray.data

from libpostal_ray.config import PipelineConfig


def repo_pid(repos, num_partitions: int) -> np.ndarray:
    """Deterministic partition id per row from the repo name."""
    out = np.empty(len(repos), dtype=np.int64)
    for i, r in enumerate(repos):
        d = hashlib.sha256(f"pid\x00{r}".encode("utf-8")).digest()
        out[i] = (int.from_bytes(d[:8], "big") & 0x7FFFFFFFFFFFFFFF) % num_partitions
    return out


def config_fingerprint(cfg: PipelineConfig) -> str:
    return hashlib.sha256(
        json.dumps(cfg.to_dict(), sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


class StageCheckpoint:
    """Manifest-backed checkpoint for one stage of one pipeline run."""

    def __init__(self, ckpt_dir: str, stage: str, cfg: PipelineConfig):
        self.dir = os.path.join(ckpt_dir, stage)
        self.manifest_path = os.path.join(self.dir, "manifest.json")
        self.cfg_fp = config_fingerprint(cfg)
        os.makedirs(self.dir, exist_ok=True)
        self.manifest = self._load()

    def _load(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                m = json.load(f)
            if m.get("config_fingerprint") != self.cfg_fp:
                # config changed: the whole stage is invalid
                shutil.rmtree(self.dir, ignore_errors=True)
                os.makedirs(self.dir, exist_ok=True)
                return {"config_fingerprint": self.cfg_fp, "partitions": {}}
            return m
        return {"config_fingerprint": self.cfg_fp, "partitions": {}}

    def done_pids(self) -> set[int]:
        return {int(p) for p in self.manifest["partitions"]}

    def part_dir(self, pid: int) -> str:
        return os.path.join(self.dir, f"part={pid}")

    def clean_debris(self, all_pids: set[int]) -> list[int]:
        """Delete partition dirs not committed to the manifest (killed-run
        leftovers).  Returns the pids that were cleaned."""
        cleaned = []
        done = self.done_pids()
        for name in os.listdir(self.dir):
            if not name.startswith("part="):
                continue
            pid = int(name.split("=", 1)[1])
            if pid not in done:
                shutil.rmtree(os.path.join(self.dir, name), ignore_errors=True)
                cleaned.append(pid)
        return cleaned

    def commit(self, pid: int, *, rows: int, input_fp: str, wall_sec: float) -> None:
        self.manifest["partitions"][str(pid)] = {
            "rows": rows,
            "input_fingerprint": input_fp,
            "wall_sec": round(wall_sec, 3),
            "committed_at": time.time(),
        }
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f, indent=1)
        os.replace(tmp, self.manifest_path)  # atomic commit point

    def read_all(self, empty_schema: pa.Schema | None = None) -> ray.data.Dataset:
        import glob

        files: list[str] = []
        for pid in sorted(self.done_pids()):
            d = self.part_dir(pid)
            if os.path.isdir(d):
                files.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
        if not files:
            # all committed partitions are empty (e.g. a corpus with zero
            # duplicate pairs): read_parquet([]) raises, so return a
            # correctly-schemed empty Dataset instead
            schema = empty_schema or pa.schema([])
            return ray.data.from_arrow(schema.empty_table())
        return ray.data.read_parquet(files)


def input_fingerprint(doc_ids: np.ndarray) -> str:
    """Cheap order-independent lineage fingerprint of a partition's input."""
    x = np.bitwise_xor.reduce(doc_ids.astype(np.uint64)) if doc_ids.size else 0
    return f"{doc_ids.size}:{int(x):016x}"


def checkpointed_map_stage(
    ds: ray.data.Dataset,
    *,
    stage: str,
    ckpt_dir: str,
    cfg: PipelineConfig,
    apply,  # Dataset -> Dataset (the stage transform; row-wise over pids)
    pid_column: str = "pid",
    fp_column: str = "doc_id",
    only_pids: set[int] | None = None,
    num_partitions: int | None = None,
    empty_schema: pa.Schema | None = None,
) -> tuple[ray.data.Dataset, dict]:
    """Run `apply` over the partitions of `ds` that are not yet checkpointed;
    write each new partition to parquet; return (full dataset, metrics).

    `ds` must already carry `pid_column`.  `only_pids` restricts computation
    (used by tests to simulate a killed run).  Metrics report which pids were
    computed vs loaded — the kill-and-resume test asserts on them.
    """
    ck = StageCheckpoint(ckpt_dir, stage, cfg)
    all_pids = set(range(num_partitions or cfg.num_partitions))
    ck.clean_debris(all_pids)
    done = ck.done_pids()
    todo = sorted(all_pids - done)
    if only_pids is not None:
        todo = sorted(set(todo) & only_pids)

    computed = []
    if todo:
        todo_set = set(todo)

        def keep_todo(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            mask = pc.is_in(
                batch[pid_column], value_set=pa.array(sorted(todo_set), type=pa.int64())
            )
            return batch.filter(mask)

        subset = ds.map_batches(keep_todo, batch_format="pyarrow")
        out = apply(subset)
        t0 = time.perf_counter()
        # one pass, partitioned layout: pid=... dirs under a tmp root, then
        # committed per-partition into the stage dir
        tmp_root = os.path.join(ck.dir, "_inflight")
        shutil.rmtree(tmp_root, ignore_errors=True)
        out.write_parquet(tmp_root, partition_cols=[pid_column])
        wall = time.perf_counter() - t0
        # an all-empty subset writes nothing at all — no _inflight dir
        os.makedirs(tmp_root, exist_ok=True)
        for name in sorted(os.listdir(tmp_root)):
            if not name.startswith(f"{pid_column}="):
                continue
            pid = int(name.split("=", 1)[1])
            src = os.path.join(tmp_root, name)
            dst = ck.part_dir(pid)
            shutil.rmtree(dst, ignore_errors=True)
            os.replace(src, dst)
            import pyarrow.dataset as pds

            t = pds.dataset(dst, format="parquet").to_table(columns=[fp_column])
            ck.commit(
                pid,
                rows=t.num_rows,
                input_fp=input_fingerprint(
                    t[fp_column].to_numpy(zero_copy_only=False)
                ),
                wall_sec=wall / max(1, len(todo)),
            )
            computed.append(pid)
        # partitions in todo with zero input rows produce no dir; commit them
        # as empty (manifest entry without a data dir — read_all skips them)
        for pid in todo:
            if pid not in computed and str(pid) not in ck.manifest["partitions"]:
                ck.commit(pid, rows=0, input_fp="0:0", wall_sec=0.0)
                computed.append(pid)
        shutil.rmtree(tmp_root, ignore_errors=True)

    metrics = {
        "stage": stage,
        "loaded_pids": sorted(done),
        "computed_pids": sorted(computed),
        "manifest": ck.manifest_path,
    }
    return ck.read_all(empty_schema=empty_schema), metrics
