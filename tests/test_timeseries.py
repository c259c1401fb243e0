"""Edge-semantics units for pipelines/timeseries.py — the properties the
3-SF DuckDB parity suite can't isolate: touching-interval merges, tie
breaking, grid-boundary fills, and blocking independence (Ray re-splits
blocks arbitrarily; results must not depend on it)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from libpostal_ray.pipelines.timeseries import (
    grid_ffill,
    interval_union,
    retention_cohorts,
    transition_counts,
)

US = 1_000_000
H = 3_600 * US


def _events(tmp_path, rows, name="ev.parquet"):
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "event_type": pa.array([r[2] for r in rows], type=pa.string()),
            "event_id": pa.array(
                list(range(len(rows))), type=pa.int64()
            ),
            "value": pa.array([float(r[3]) for r in rows], type=pa.float64()),
        }
    )
    p = str(tmp_path / name)
    pq.write_table(t, p)
    return p


def test_interval_union_touching_and_overlap(ray_session, tmp_path):
    # user 1: [0,5), [5,10) touch -> ONE run of 10; [20,25) separate
    # user 2: [0,5), [3,8) overlap -> ONE run of 8
    rows = [
        (1, 0, "a", 0.0),
        (1, 5 * US, "a", 0.0),
        (1, 20 * US, "a", 0.0),
        (2, 0, "a", 0.0),
        (2, 3 * US, "a", 0.0),
    ]
    p = _events(tmp_path, rows)
    ds = ray.data.read_parquet(p, columns=["user_id", "ts"])
    out = (
        interval_union(ds, "user_id", "ts", span_us=5 * US)
        .to_pandas()
        .set_index("key")
        .sort_index()
    )
    assert out.loc[1, "n_busy"] == 2 and out.loc[1, "busy_us"] == 15 * US
    assert out.loc[2, "n_busy"] == 1 and out.loc[2, "busy_us"] == 8 * US


def test_interval_union_blocking_independent(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    rows = [
        (int(rng.integers(0, 20)), int(rng.integers(0, 1000)) * US, "a", 0.0)
        for _ in range(500)
    ]
    p = _events(tmp_path, rows)
    outs = []
    for blocks in (1, 7):
        ds = ray.data.read_parquet(p, columns=["user_id", "ts"]) \
            .repartition(blocks)
        df = (
            interval_union(ds, "user_id", "ts", span_us=30 * US)
            .to_pandas()
            .sort_values("key")
            .reset_index(drop=True)
        )
        outs.append(df)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_transitions_tiebreak_on_event_id(ray_session, tmp_path):
    # two events at the SAME ts: event_id order decides the sequence
    rows = [
        (1, 10 * US, "x", 0.0),  # event_id 0
        (1, 10 * US, "y", 0.0),  # event_id 1
        (1, 20 * US, "z", 0.0),  # event_id 2
    ]
    p = _events(tmp_path, rows)
    ds = ray.data.read_parquet(p)
    out = (
        transition_counts(ds, "user_id", "ts", "event_type", "event_id")
        .to_pandas()
        .sort_values(["prev_label", "next_label"])
        .reset_index(drop=True)
    )
    assert list(map(tuple, out.itertuples(index=False))) == [
        ("x", "y", 1),
        ("y", "z", 1),
    ]


def test_transitions_no_cross_user_pairs(ray_session, tmp_path):
    rows = [(1, 0, "a", 0.0), (2, 1 * US, "b", 0.0)]
    p = _events(tmp_path, rows)
    ds = ray.data.read_parquet(p)
    out = transition_counts(ds, "user_id", "ts", "event_type", "event_id")
    assert out.to_pandas().empty


def test_retention_cohorts_tiny(ray_session, tmp_path):
    D = 86_400 * US
    rows = [
        (1, 0 * D, "a", 0.0),       # cohort day 0, active 0
        (1, 2 * D, "a", 0.0),       # active 2
        (2, 2 * D + 5, "a", 0.0),   # cohort day 2, active 2
        (2, 2 * D + 9, "a", 0.0),   # same day — dedup
    ]
    p = _events(tmp_path, rows)
    ds = ray.data.read_parquet(p, columns=["user_id", "ts"])
    out = (
        retention_cohorts(ds, "user_id", "ts", bucket_us=D)
        .to_pandas()
        .sort_values(["cohort_bucket", "active_bucket"])
        .reset_index(drop=True)
    )
    assert list(map(tuple, out.itertuples(index=False))) == [
        (0, 0, 1),
        (0, 2, 1),
        (2, 2, 1),
    ]


def test_grid_ffill_boundary_and_ties(ray_session, tmp_path):
    # user 1: obs at exactly hour 1 (included in grid point 1), obs at
    # 1.5h fills hour 2; two obs at the same ts -> max value wins
    rows = [
        (1, 1 * H, "a", 10.0),
        (1, 1 * H, "a", 12.0),          # tie at same ts: 12 wins
        (1, int(1.5 * H), "a", 99.0),   # fills hour 2
        (1, int(2.5 * H), "a", 7.0),    # after last grid point (hi=2)...
    ]
    # max ts = 2.5h -> hi = floor(2.5) = 2; lo = ceil(1.0) = 1
    p = _events(tmp_path, rows)
    ds = ray.data.read_parquet(p, columns=["user_id", "ts", "value"])
    out = (
        grid_ffill(ds, "user_id", "ts", "value", step_us=H)
        .to_pandas()
        .sort_values("grid_idx")
        .reset_index(drop=True)
    )
    assert list(out["grid_idx"]) == [1, 2]
    assert list(out["v"]) == [12.0, 99.0]


def test_grid_ffill_blocking_independent(ray_session, tmp_path):
    rng = np.random.default_rng(11)
    rows = [
        (
            int(rng.integers(0, 10)),
            int(rng.integers(0, 50 * H)),
            "a",
            float(rng.normal()),
        )
        for _ in range(400)
    ]
    p = _events(tmp_path, rows)
    outs = []
    for blocks in (1, 9):
        ds = ray.data.read_parquet(p, columns=["user_id", "ts", "value"]) \
            .repartition(blocks)
        df = (
            grid_ffill(ds, "user_id", "ts", "value", step_us=H)
            .to_pandas()
            .sort_values(["key", "grid_idx"])
            .reset_index(drop=True)
        )
        outs.append(df)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_grid_ffill_single_obs_user(ray_session, tmp_path):
    # one obs NOT on an hour boundary: lo > hi -> user emits nothing
    rows = [(1, H + 5, "a", 1.0), (2, 2 * H, "a", 3.0)]
    p = _events(tmp_path, rows)
    ds = ray.data.read_parquet(p, columns=["user_id", "ts", "value"])
    out = grid_ffill(ds, "user_id", "ts", "value", step_us=H).to_pandas()
    assert list(out["key"]) == [2]
    assert list(out["grid_idx"]) == [2]
    assert list(out["v"]) == [3.0]
