"""Session-18 operators: bounded-radius weighted SSSP over the
deterministic document graph (iterative graph primitive 7).

The parity suite checks the operator against its recursive-CTE oracle;
here the independent reference is a plain heap Dijkstra over the same
edge definition, which shares nothing with either the BSP frontier
relaxation or the SQL semi-naive recursion."""

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _ref_dijkstra(sf_dir: str, d_max: int) -> dict[int, int]:
    """node -> exact shortest distance from node 1, pruned at d_max."""
    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    n = tbl.num_rows
    adj: dict[int, list[tuple[int, int]]] = {}
    for doc_id, nc in zip(
        tbl["doc_id"].to_pylist(), tbl["n_chars"].to_pylist()
    ):
        k = doc_id + 1
        for tgt in (2 * k, 2 * k + 1, k + 1 + (nc % 64)):
            if tgt <= n:
                adj.setdefault(k, []).append((tgt, 1 + (k + tgt) % 3))
    dist = {1: 0}
    heap = [(0, 1)]
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist.get(u, 1 << 62):
            continue
        for v, w in adj.get(u, ()):
            nd = d + w
            if nd <= d_max and nd < dist.get(v, 1 << 62):
                dist[v] = nd
                heapq.heappush(heap, (nd, v))
    return dist


def test_sssp_matches_dijkstra(ray_session):
    from libpostal_ray.pipelines.queries import doc_graph_sssp

    out = doc_graph_sssp(SF).sort_values("doc_id")
    ref = _ref_dijkstra(SF, 48)
    assert len(out) == len(ref)
    got = dict(zip(out.doc_id.astype(int) + 1, out.dist.astype(int)))
    assert got == ref


def test_sssp_small_radius_prunes_exactly(ray_session):
    from libpostal_ray.pipelines.queries import doc_graph_sssp

    out = doc_graph_sssp(SF, d_max=6).sort_values("doc_id")
    ref = _ref_dijkstra(SF, 6)
    got = dict(zip(out.doc_id.astype(int) + 1, out.dist.astype(int)))
    assert got == ref
    assert 0 < len(got) < 500  # the radius genuinely cuts the corpus
    assert max(got.values()) <= 6


def test_sssp_empty_corpus(ray_session, tmp_path):
    from libpostal_ray.pipelines.queries import doc_graph_sssp

    d = tmp_path / "sf_empty"
    d.mkdir()
    schema = pq.read_schema(f"{SF}/documents.parquet")
    pq.write_table(schema.empty_table(), str(d / "documents.parquet"))
    out = doc_graph_sssp(str(d))
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "dist"]


# ---------------------------------------------------------------------------
# Count-min sketch (functions/cms.py) — completes the sketch family
# ---------------------------------------------------------------------------


class TestCountMinSketch:
    def test_never_undercounts_and_bound_holds(self):
        from libpostal_ray.functions.cms import (
            cms_add, cms_query, empty_sketch,
        )

        rng = np.random.default_rng(7)
        # zipf-ish key stream: heavy hitters + long tail
        keys = rng.zipf(1.3, size=200_000).astype(np.int64)
        sk = empty_sketch(width=2048, depth=4)
        cms_add(sk, keys)
        probe, true = np.unique(keys, return_counts=True)
        est = cms_query(sk, probe)
        assert (est >= true).all()  # NEVER undercounts
        # CM bound: overshoot <= (e/width)*N w.p. >= 1 - e^-depth; check
        # the 99th percentile of overshoot sits under the bound
        bound = np.e / 2048 * keys.shape[0]
        overshoot = est - true
        assert np.quantile(overshoot, 0.99) <= bound

    def test_merge_is_linear(self):
        from libpostal_ray.functions.cms import (
            cms_add, cms_merge, cms_query, empty_sketch,
        )

        rng = np.random.default_rng(11)
        keys = rng.integers(0, 5000, size=30_000).astype(np.int64)
        whole = cms_add(empty_sketch(512, 3), keys)
        parts = [
            cms_add(empty_sketch(512, 3), part)
            for part in np.array_split(keys, 7)
        ]
        merged = cms_merge(parts)
        assert (merged == whole).all()  # any blocking, same sketch
        probe = np.arange(100, dtype=np.int64)
        assert (cms_query(merged, probe) == cms_query(whole, probe)).all()

    def test_negative_counts_rejected(self):
        from libpostal_ray.functions.cms import cms_add, empty_sketch

        with np.testing.assert_raises(ValueError):
            cms_add(
                empty_sketch(64, 2),
                np.array([1, 2], dtype=np.int64),
                np.array([1, -1], dtype=np.int64),
            )

    def test_query_vs_exact_on_events(self, ray_session):
        import duckdb

        from libpostal_ray.pipelines.queries import user_event_count_cms

        out = user_event_count_cms(SF).sort_values("user_id")
        con = duckdb.connect()
        exact = con.execute(
            f"""SELECT user_id, count(*) AS c
                FROM read_parquet('{SF}/events.parquet')
                WHERE user_id < 100 GROUP BY 1"""
        ).df().set_index("user_id")["c"]
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{SF}/events.parquet')"
        ).fetchone()[0]
        assert len(out) == 100
        for uid, est in zip(out.user_id, out.est_count):
            true = int(exact.get(uid, 0))
            assert est >= true
            assert est - true <= np.e / 2048 * n + 1

    def test_empty_corpus(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import user_event_count_cms

        d = tmp_path / "sf_empty_cms"
        d.mkdir()
        schema = pq.read_schema(f"{SF}/events.parquet")
        pq.write_table(schema.empty_table(), str(d / "events.parquet"))
        out = user_event_count_cms(str(d))
        assert len(out) == 0
        assert list(out.columns) == ["user_id", "est_count"]


def test_q2_empty_dims(ray_session, tmp_path):
    from libpostal_ray.pipelines.queries import tpch_q2_min_cost_supplier

    d = tmp_path / "sf_empty_q2"
    d.mkdir()
    for t in ("part", "supplier", "nation", "region"):
        schema = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    out = tpch_q2_min_cost_supplier(str(d))
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert len(out) == 0


# ---------------------------------------------------------------------------
# Exact ROC-AUC (tie-corrected Mann-Whitney) — ML-eval operator
# ---------------------------------------------------------------------------


class TestEventClickAuc:
    def _write(self, tmp_path, rows):
        import pyarrow as pa

        d = tmp_path / "sf_auc"
        d.mkdir(exist_ok=True)
        schema = pq.read_schema(f"{SF}/events.parquet")
        cols = {n: [] for n in schema.names}
        for i, (et, v) in enumerate(rows):
            for n in schema.names:
                if n == "event_type":
                    cols[n].append(et)
                elif n == "value":
                    cols[n].append(float(v))
                elif n == "event_id":
                    cols[n].append(i)
                else:
                    f = schema.field(n)
                    if pa.types.is_integer(f.type):
                        cols[n].append(0)
                    elif pa.types.is_floating(f.type):
                        cols[n].append(0.0)
                    elif pa.types.is_timestamp(f.type):
                        cols[n].append(0)
                    else:
                        cols[n].append("x")
        pq.write_table(
            pa.table(
                {n: pa.array(cols[n], type=schema.field(n).type)
                 for n in schema.names}
            ),
            str(d / "events.parquet"),
        )
        return str(d)

    def test_perfect_ranker(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import event_click_auc

        rows = [("click", 10 + i) for i in range(5)] + [
            ("view", i) for i in range(5)
        ]
        out = event_click_auc(self._write(tmp_path, rows))
        assert len(out) == 1
        assert out.auc.iloc[0] == 1.0
        assert out.u2.iloc[0] == 2 * 5 * 5

    def test_inverted_ranker(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import event_click_auc

        rows = [("click", i) for i in range(5)] + [
            ("view", 10 + i) for i in range(5)
        ]
        out = event_click_auc(self._write(tmp_path, rows))
        assert out.auc.iloc[0] == 0.0

    def test_all_tied_is_half(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import event_click_auc

        rows = [("click", 7)] * 4 + [("view", 7)] * 6
        out = event_click_auc(self._write(tmp_path, rows))
        assert out.auc.iloc[0] == 0.5

    def test_single_class_empty(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import event_click_auc

        rows = [("view", i) for i in range(5)]
        out = event_click_auc(self._write(tmp_path, rows))
        assert len(out) == 0

    def test_empty_corpus(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import event_click_auc

        d = tmp_path / "sf_empty_auc"
        d.mkdir()
        schema = pq.read_schema(f"{SF}/events.parquet")
        pq.write_table(schema.empty_table(), str(d / "events.parquet"))
        out = event_click_auc(str(d))
        assert len(out) == 0
        assert list(out.columns) == ["n_pos", "n_neg", "u2", "auc"]


# ---------------------------------------------------------------------------
# Grouped 2-feature exact OLS (Cramer over exact integer moments)
# ---------------------------------------------------------------------------


class TestEventValueOls2:
    def test_exact_fit_recovered(self, ray_session, tmp_path):
        import pyarrow as pa

        from libpostal_ray.pipelines.queries import event_value_ols2

        d = tmp_path / "sf_ols"
        d.mkdir()
        schema = pq.read_schema(f"{SF}/events.parquet")
        # value = 5 + 3*hour + 2*dow exactly -> b = (5000, 3000, 2000) milli
        rows = []
        for i in range(200):
            us = i * 5_123_000_000_000  # spreads hours and weekdays
            h = (us // 3_600_000_000) % 24
            dow = (us // 86_400_000_000 + 4) % 7
            rows.append((i, us, 5.0 + 3.0 * h + 2.0 * dow))
        cols = {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.int64()).cast(
                pa.timestamp("us")
            ),
            "user_id": pa.array([0] * len(rows), type=pa.int64()),
            "event_type": pa.array(["click"] * len(rows), type=pa.string()),
            "value": pa.array([r[2] for r in rows], type=pa.float64()),
            "props": pa.array(["x"] * len(rows), type=pa.string()),
        }
        pq.write_table(
            pa.table({n: cols[n] for n in schema.names}),
            str(d / "events.parquet"),
        )
        out = event_value_ols2(str(d)).to_pandas()
        assert len(out) == 1
        assert out.b0.iloc[0] == 5000.0
        assert out.b1.iloc[0] == 3000.0
        assert out.b2.iloc[0] == 2000.0

    def test_matches_numpy_lstsq(self, ray_session):
        from libpostal_ray.pipelines.queries import event_value_ols2

        out = event_value_ols2(SF).to_pandas().set_index("event_type")
        tbl = pq.read_table(
            f"{SF}/events.parquet", columns=["event_type", "ts", "value"]
        )
        us = tbl["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        h = (us // 3_600_000_000) % 24
        dw = (us // 86_400_000_000 + 4) % 7
        y = np.floor(
            tbl["value"].to_numpy(zero_copy_only=False) * 1000.0
        )
        et = np.asarray(tbl["event_type"].to_pylist(), dtype=object)
        for t in np.unique(et):
            m = et == t
            X = np.stack(
                [np.ones(m.sum()), h[m].astype(float), dw[m].astype(float)],
                axis=1,
            )
            beta, *_ = np.linalg.lstsq(X, y[m], rcond=None)
            got = out.loc[str(t)]
            assert np.allclose(
                [got.b0, got.b1, got.b2], beta, rtol=1e-9, atol=1e-6
            ), t

    def test_empty_corpus(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import event_value_ols2

        d = tmp_path / "sf_empty_ols"
        d.mkdir()
        schema = pq.read_schema(f"{SF}/events.parquet")
        pq.write_table(schema.empty_table(), str(d / "events.parquet"))
        out = event_value_ols2(str(d)).to_pandas()
        assert len(out) == 0


# ---------------------------------------------------------------------------
# Kaplan-Meier survival ingredients (signup -> first purchase)
# ---------------------------------------------------------------------------


class TestUserSurvivalKm:
    def _write(self, tmp_path, rows):
        import pyarrow as pa

        d = tmp_path / "sf_km"
        d.mkdir(exist_ok=True)
        schema = pq.read_schema(f"{SF}/events.parquet")
        DAY = 86_400_000_000
        cols = {
            "event_id": [], "ts": [], "user_id": [],
            "event_type": [], "value": [], "props": [],
        }
        for i, (uid, et, day) in enumerate(rows):
            cols["event_id"].append(i)
            cols["ts"].append(day * DAY)
            cols["user_id"].append(uid)
            cols["event_type"].append(et)
            cols["value"].append(1.0)
            cols["props"].append("x")
        import pyarrow as pa
        t = pa.table({
            "event_id": pa.array(cols["event_id"], type=pa.int64()),
            "ts": pa.array(cols["ts"], type=pa.int64()).cast(
                pa.timestamp("us")),
            "user_id": pa.array(cols["user_id"], type=pa.int64()),
            "event_type": pa.array(cols["event_type"], type=pa.string()),
            "value": pa.array(cols["value"], type=pa.float64()),
            "props": pa.array(cols["props"], type=pa.string()),
        })
        pq.write_table(
            t.select(schema.names), str(d / "events.parquet")
        )
        return str(d)

    def test_planted_table(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import user_survival_km

        rows = [
            (1, "signup", 0), (1, "purchase", 3),   # event at dur 3
            (2, "signup", 0),                       # censored at dur 10
            (3, "signup", 2), (3, "purchase", 2),   # event at dur 0
            (4, "purchase", 1),                     # no signup: excluded
            (5, "signup", 1), (5, "purchase", 0),   # purchase BEFORE
            (0, "view", 10),                        # horizon = day 10
        ]
        out = user_survival_km(self._write(tmp_path, rows))
        # users in study: 1 (dur 3, ev), 2 (dur 10, cens), 3 (dur 0, ev),
        # 5 (dur 9, cens — its pre-signup purchase doesn't count)
        assert out.dur_day.tolist() == [0, 3]
        assert out.n_event.tolist() == [1, 1]
        assert out.n_risk.tolist() == [4, 3]

    def test_nontrivial_on_sf(self, ray_session):
        from libpostal_ray.pipelines.queries import user_survival_km

        out = user_survival_km(SF)
        assert len(out) > 0
        assert (out.n_risk >= out.n_event).all()
        # n_risk non-increasing in dur
        assert (np.diff(out.n_risk.to_numpy()) <= 0).all()

    def test_empty_corpus(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import user_survival_km

        d = tmp_path / "sf_empty_km"
        d.mkdir()
        schema = pq.read_schema(f"{SF}/events.parquet")
        pq.write_table(schema.empty_table(), str(d / "events.parquet"))
        out = user_survival_km(str(d))
        assert len(out) == 0
        assert list(out.columns) == ["dur_day", "n_event", "n_risk"]


def test_decile_calibration_invariants(ray_session):
    from libpostal_ray.pipelines.queries import value_decile_calibration

    out = value_decile_calibration(SF)
    assert len(out) == 10  # sf values are spread enough for 10 buckets
    assert int(out.n.sum()) == pq.read_metadata(
        f"{SF}/events.parquet"
    ).num_rows
    assert (out.n_pos <= out.n).all()
    assert ((out.rate >= 0) & (out.rate <= 1)).all()


def test_decile_calibration_empty(ray_session, tmp_path):
    from libpostal_ray.pipelines.queries import value_decile_calibration

    d = tmp_path / "sf_empty_cal"
    d.mkdir()
    schema = pq.read_schema(f"{SF}/events.parquet")
    pq.write_table(schema.empty_table(), str(d / "events.parquet"))
    out = value_decile_calibration(str(d))
    assert len(out) == 0
    assert list(out.columns) == ["bucket", "n", "n_pos", "rate"]


# ---------------------------------------------------------------------------
# Synchronous label propagation (iterative graph primitive #8)
# ---------------------------------------------------------------------------


def _ref_lpa(edges, rounds):
    """Independent per-round dict reference for the exact LPA spec:
    simultaneous update, most-frequent neighbor label + one self-vote,
    ties -> smallest label."""
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    lab = {x: x for x in adj}
    for _ in range(rounds):
        nxt = {}
        for x in adj:
            c = Counter(lab[y] for y in adj[x])
            c[lab[x]] += 1
            best = max(c.values())
            nxt[x] = min(l for l, k in c.items() if k == best)
        lab = nxt
    return lab


class TestLabelPropagation:
    def _run(self, edges, rounds=8):
        import ray

        from libpostal_ray.pipelines.graph import label_propagation

        tbl = pa.table(
            {
                "u": pa.array([e[0] for e in edges], type=pa.int64()),
                "v": pa.array([e[1] for e in edges], type=pa.int64()),
            }
        )
        out = label_propagation(
            ray.data.from_arrow(tbl), rounds=rounds
        ).to_pandas()
        return dict(zip(out.doc_id.astype(int), out.community.astype(int)))

    def test_two_cliques_with_bridge(self, ray_session):
        # two 4-cliques joined by one bridge edge: LPA keeps them apart
        # (min-label CC would merge them)
        a = [(i, j) for i in range(4) for j in range(i + 1, 4)]
        b = [(i + 10, j + 10) for i in range(4) for j in range(i + 1, 4)]
        got = self._run(a + b + [(3, 10)])
        assert len({got[i] for i in range(4)}) == 1
        assert len({got[i + 10] for i in range(4)}) == 1
        assert got[0] != got[10]

    def test_matches_reference_on_random_graphs(self, ray_session):
        rng = np.random.default_rng(23)
        for trial in range(3):
            n = 60
            m = 150
            edges = set()
            while len(edges) < m:
                u, v = sorted(rng.integers(0, n, size=2).tolist())
                if u != v:
                    edges.add((u, v))
            edges = sorted(edges)
            for rounds in (1, 3, 8):
                got = self._run(edges, rounds=rounds)
                want = _ref_lpa(edges, rounds)
                assert got == want, (trial, rounds)

    def test_doc_graph_runs(self, ray_session):
        from libpostal_ray.pipelines.queries import doc_graph_communities

        out = doc_graph_communities(SF).to_pandas()
        assert len(out) == 500  # all nodes labeled
        assert out.community.nunique() > 1

    def test_node_id_bound_is_loud(self, ray_session):
        import ray

        from libpostal_ray.pipelines.graph import label_propagation

        tbl = pa.table(
            {"u": pa.array([2**31], type=pa.int64()),
             "v": pa.array([1], type=pa.int64())}
        )
        import pytest

        with pytest.raises(ValueError, match="2\\^31"):
            label_propagation(ray.data.from_arrow(tbl), rounds=1)


def test_top_values_empty(ray_session, tmp_path):
    from libpostal_ray.pipelines.queries import event_type_top_values

    d = tmp_path / "sf_empty_topv"
    d.mkdir()
    schema = pq.read_schema(f"{SF}/events.parquet")
    pq.write_table(schema.empty_table(), str(d / "events.parquet"))
    out = event_type_top_values(str(d)).to_pandas()
    assert len(out) == 0


def test_grouping_sets_internal_consistency(ray_session):
    from libpostal_ray.pipelines.queries import events_grouping_sets

    out = events_grouping_sets(SF)
    fine = out[(out.event_type != "ALL") & (out.hr >= 0)]
    total = out[(out.event_type == "ALL") & (out.hr == -1)]
    assert len(total) == 1
    assert int(fine.n.sum()) == int(total.n.iloc[0])
    assert int(fine.sum_milli.sum()) == int(total.sum_milli.iloc[0])
    by_type = out[(out.event_type != "ALL") & (out.hr == -1)]
    assert int(by_type.n.sum()) == int(total.n.iloc[0])


def test_grouping_sets_empty(ray_session, tmp_path):
    from libpostal_ray.pipelines.queries import events_grouping_sets

    d = tmp_path / "sf_empty_gs"
    d.mkdir()
    schema = pq.read_schema(f"{SF}/events.parquet")
    pq.write_table(schema.empty_table(), str(d / "events.parquet"))
    out = events_grouping_sets(str(d))
    assert len(out) == 0


# ---------------------------------------------------------------------------
# MMR diversified top-k (ANN prefilter -> exact greedy re-rank)
# ---------------------------------------------------------------------------


def _ref_mmr(q, ids, V, k, lam):
    """Independent MMR reference: same spec, plain python loop."""
    q = q / np.linalg.norm(q)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    rel = Vn @ q
    sel, out = [], []
    for r in range(1, min(k, len(ids)) + 1):
        best_j, best_s = None, None
        for j in range(len(ids)):
            if j in sel:
                continue
            d = max((float(Vn[j] @ Vn[s]) for s in sel), default=0.0)
            s = lam * rel[j] - (1 - lam) * max(d, 0.0)
            if best_s is None or s > best_s:
                best_j, best_s = j, s
        sel.append(best_j)
        out.append((r, int(ids[best_j]), float(best_s)))
    return out


def test_mmr_matches_reference(ray_session):
    from libpostal_ray.pipelines.queries import mmr_topk

    out = mmr_topk(SF, k=8, m=40)
    tbl = pq.read_table(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids_all = tbl["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    V_all = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    q = V_all[ids_all == 0][0]
    # reference prefilter: exact top-40 by cosine, then same greedy
    Vn = V_all / np.linalg.norm(V_all, axis=1, keepdims=True)
    rel = Vn @ (q / np.linalg.norm(q))
    top = np.argsort(-rel, kind="stable")[:40]
    o = np.argsort(ids_all[top])
    cand_ids, cand_V = ids_all[top][o], V_all[top][o]
    want = _ref_mmr(q, cand_ids, cand_V, 8, 0.7)
    got = list(zip(out["rank"], out.vec_id, out.mmr_score))
    assert [(r, v) for r, v, _ in got] == [(r, v) for r, v, _ in want]
    for (_, _, a), (_, _, b) in zip(got, want):
        assert abs(a - b) < 1e-12


def test_mmr_diversifies(ray_session):
    # rank-1 is the best match (vec 0 itself, rel=1); the rest must not
    # all be the plain cosine top-k when lam < 1
    from libpostal_ray.pipelines.queries import ann_topk, mmr_topk

    plain = ann_topk(SF, k=8).vec_id.tolist()
    mmr = mmr_topk(SF, k=8, m=60, lam=0.3).vec_id.tolist()
    assert mmr[0] == 0  # self-match first
    assert set(mmr) != set(plain)  # low lambda trades off relevance


# ---------------------------------------------------------------------------
# Quantile normalization
# ---------------------------------------------------------------------------


class TestQuantileNormalize:
    def test_equal_size_groups_become_identical(self, ray_session, tmp_path):
        import pyarrow as pa

        from libpostal_ray.pipelines.queries import events_quantile_normalize

        d = tmp_path / "sf_qn"
        d.mkdir()
        schema = pq.read_schema(f"{SF}/events.parquet")
        rng = np.random.default_rng(5)
        rows = []
        for i in range(100):  # type A: uniform-ish
            rows.append(("click", float(rng.integers(0, 1000)) / 10.0))
        for i in range(100):  # type B: shifted + scaled
            rows.append(("view", 500.0 + float(rng.integers(0, 100))))
        t = pa.table({
            "event_id": pa.array(list(range(len(rows))), type=pa.int64()),
            "ts": pa.array([0] * len(rows), type=pa.int64()).cast(
                pa.timestamp("us")),
            "user_id": pa.array([0] * len(rows), type=pa.int64()),
            "event_type": pa.array([r[0] for r in rows], type=pa.string()),
            "value": pa.array([r[1] for r in rows], type=pa.float64()),
            "props": pa.array(["x"] * len(rows), type=pa.string()),
        })
        pq.write_table(t.select(schema.names), str(d / "events.parquet"))
        out = events_quantile_normalize(str(d)).to_pandas()
        assert len(out) == 200
        a = np.sort(out[out.event_id < 100].normalized_milli.to_numpy())
        b = np.sort(out[out.event_id >= 100].normalized_milli.to_numpy())
        # equal-size groups land on the SAME pooled order statistics
        assert (a == b).all()

    def test_monotone_within_group(self, ray_session):
        from libpostal_ray.pipelines.queries import events_quantile_normalize

        out = events_quantile_normalize(SF).to_pandas()
        ev = pq.read_table(
            f"{SF}/events.parquet", columns=["event_id", "event_type", "value"]
        ).to_pandas()
        ev["v"] = np.floor(ev.value * 1000).astype(np.int64)
        m = ev.merge(out, on="event_id")
        assert len(m) == len(ev)
        for t, g in m.groupby("event_type"):
            g = g.sort_values(["v", "event_id"])
            assert (np.diff(g.normalized_milli.to_numpy()) >= 0).all(), t

    def test_empty(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import events_quantile_normalize

        d = tmp_path / "sf_empty_qn"
        d.mkdir()
        schema = pq.read_schema(f"{SF}/events.parquet")
        pq.write_table(schema.empty_table(), str(d / "events.parquet"))
        out = events_quantile_normalize(str(d)).to_pandas()
        assert len(out) == 0


# ---------------------------------------------------------------------------
# Weisfeiler-Lehman refinement (iterative graph primitive #9)
# ---------------------------------------------------------------------------


def _ref_wl(edges, rounds):
    """Independent dict WL reference: degree-seeded splitmix colors,
    round = mix-chain over (own color, sorted neighbor colors)."""
    from collections import defaultdict

    M = (1 << 64) - 1
    M63 = (1 << 63) - 1

    def mix(z):
        z = (z + 0x9E3779B97F4A7C15) & M
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M
        return z ^ (z >> 31)

    adj = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    col = {x: mix(len(nb)) & M63 for x, nb in adj.items()}
    for _ in range(rounds):
        nxt = {}
        for x, nb in adj.items():
            acc = mix(col[x])
            for c in sorted(col[y] for y in nb):
                acc = mix(acc ^ mix(c))
            nxt[x] = acc & M63
        col = nxt
    return col


class TestWlRefinement:
    def _run(self, edges, rounds=3):
        import ray

        from libpostal_ray.pipelines.graph import wl_refinement

        tbl = pa.table(
            {
                "u": pa.array([e[0] for e in edges], type=pa.int64()),
                "v": pa.array([e[1] for e in edges], type=pa.int64()),
            }
        )
        out = wl_refinement(ray.data.from_arrow(tbl), rounds=rounds).to_pandas()
        return dict(zip(out.doc_id.astype(int), out.wl_color.astype(int)))

    def test_matches_reference_on_random_graphs(self, ray_session):
        rng = np.random.default_rng(31)
        for trial in range(3):
            edges = set()
            while len(edges) < 120:
                u, v = sorted(rng.integers(0, 50, size=2).tolist())
                if u != v:
                    edges.add((u, v))
            edges = sorted(edges)
            for rounds in (0, 1, 3):
                got = self._run(edges, rounds=rounds)
                want = _ref_wl(edges, rounds)
                assert got == want, (trial, rounds)

    def test_relabeling_invariance(self, ray_session):
        # WL colors are structural: permuting node ids permutes rows but
        # the color MULTISET is identical
        rng = np.random.default_rng(37)
        edges = set()
        while len(edges) < 100:
            u, v = sorted(rng.integers(0, 40, size=2).tolist())
            if u != v:
                edges.add((u, v))
        edges = sorted(edges)
        perm = rng.permutation(1000)[:40]  # sparse relabeling
        relabeled = [(int(perm[u]), int(perm[v])) for u, v in edges]
        a = sorted(self._run(edges).values())
        b = sorted(self._run(relabeled).values())
        assert a == b

    def test_path_ends_distinguished(self, ray_session):
        # path a-b-c-d: after 1 round ends get one color, middles another
        got = self._run([(0, 1), (1, 2), (2, 3)], rounds=1)
        assert got[0] == got[3] and got[1] == got[2]
        assert got[0] != got[1]

    def test_doc_graph_runs(self, ray_session):
        from libpostal_ray.pipelines.queries import doc_graph_wl_colors

        out = doc_graph_wl_colors(SF).to_pandas()
        assert len(out) == 500
        assert out.wl_color.nunique() > 50  # 3-round refinement separates


# ---------------------------------------------------------------------------
# Bitmask set-similarity degree
# ---------------------------------------------------------------------------


def test_similar_doc_degree_planted(ray_session, tmp_path):
    import pyarrow as pa

    from libpostal_ray.pipelines.queries import similar_doc_degree

    d = tmp_path / "sf_deg"
    d.mkdir()
    schema = pq.read_schema(f"{SF}/documents.parquet")
    texts = [
        "a b c d e",      # 0: identical to 1
        "a b c d e",      # 1
        "a b c d f",      # 2: jac 4/6 = 0.667 vs 0/1
        "x y z",          # 3: disjoint
    ]
    cols = {}
    for n in schema.names:
        f = schema.field(n)
        if n == "doc_id":
            cols[n] = pa.array(list(range(4)), type=f.type)
        elif n == "text":
            cols[n] = pa.array(texts, type=f.type)
        elif pa.types.is_integer(f.type):
            cols[n] = pa.array([0] * 4, type=f.type)
        elif pa.types.is_floating(f.type):
            cols[n] = pa.array([0.0] * 4, type=f.type)
        else:
            cols[n] = pa.array(["x"] * 4, type=f.type)
    pq.write_table(pa.table(cols).select(schema.names),
                   str(d / "documents.parquet"))
    out = similar_doc_degree(str(d), t_milli=950).to_pandas()
    got = dict(zip(out.doc_id.astype(int), out.n_similar.astype(int)))
    assert got == {0: 1, 1: 1, 2: 0, 3: 0}
    # at a looser threshold the 0.667 pair joins in
    out2 = similar_doc_degree(str(d), t_milli=600).to_pandas()
    got2 = dict(zip(out2.doc_id.astype(int), out2.n_similar.astype(int)))
    assert got2 == {0: 2, 1: 2, 2: 2, 3: 0}


def test_similar_doc_degree_vocab_guard(ray_session, tmp_path):
    import pyarrow as pa
    import pytest

    from libpostal_ray.pipelines.queries import similar_doc_degree

    d = tmp_path / "sf_deg_big"
    d.mkdir()
    schema = pq.read_schema(f"{SF}/documents.parquet")
    texts = [" ".join(f"w{i}" for i in range(80))]
    cols = {}
    for n in schema.names:
        f = schema.field(n)
        if n == "doc_id":
            cols[n] = pa.array([0], type=f.type)
        elif n == "text":
            cols[n] = pa.array(texts, type=f.type)
        elif pa.types.is_integer(f.type):
            cols[n] = pa.array([0], type=f.type)
        elif pa.types.is_floating(f.type):
            cols[n] = pa.array([0.0], type=f.type)
        else:
            cols[n] = pa.array(["x"], type=f.type)
    pq.write_table(pa.table(cols).select(schema.names),
                   str(d / "documents.parquet"))
    with pytest.raises(ValueError, match="63"):
        similar_doc_degree(str(d))


def test_similar_doc_degree_empty(ray_session, tmp_path):
    from libpostal_ray.pipelines.queries import similar_doc_degree

    d = tmp_path / "sf_deg_empty"
    d.mkdir()
    schema = pq.read_schema(f"{SF}/documents.parquet")
    pq.write_table(schema.empty_table(), str(d / "documents.parquet"))
    out = similar_doc_degree(str(d)).to_pandas()
    assert len(out) == 0


# ---------------------------------------------------------------------------
# HITS hubs/authorities (iterative graph primitive #10)
# ---------------------------------------------------------------------------


class TestHits:
    def _run(self, edges, iters=10):
        import ray

        from libpostal_ray.pipelines.graph import hits

        tbl = pa.table(
            {
                "u": pa.array([e[0] for e in edges], type=pa.int64()),
                "v": pa.array([e[1] for e in edges], type=pa.int64()),
            }
        )
        return hits(ray.data.from_arrow(tbl), iters=iters).to_pandas()

    def _dense_ref(self, edges, iters):
        nodes = sorted({x for e in edges for x in e})
        idx = {x: i for i, x in enumerate(nodes)}
        n = len(nodes)
        A = np.zeros((n, n))
        for u, v in edges:
            A[idx[u], idx[v]] = 1.0
        hub = np.ones(n)
        auth = np.ones(n)
        for _ in range(iters):
            auth = A.T @ hub
            auth /= np.linalg.norm(auth)
            hub = A @ auth
            hub /= np.linalg.norm(hub)
        return nodes, hub, auth

    def test_matches_dense_power_iteration(self, ray_session):
        rng = np.random.default_rng(41)
        edges = set()
        while len(edges) < 150:
            u, v = rng.integers(0, 40, size=2).tolist()
            if u != v:
                edges.add((u, v))
        edges = sorted(edges)
        out = self._run(edges).sort_values("doc_id")
        nodes, hub, auth = self._dense_ref(edges, 10)
        assert out.doc_id.tolist() == nodes
        assert np.allclose(out.hub.to_numpy(), hub, atol=1e-12)
        assert np.allclose(out.authority.to_numpy(), auth, atol=1e-12)

    def test_star_graph(self, ray_session):
        # hub 0 points at 1..4: node 0 is the pure hub, others pure auths
        out = self._run([(0, i) for i in range(1, 5)]).set_index("doc_id")
        assert out.loc[0].hub > 0.99
        assert out.loc[0].authority < 1e-12
        assert all(abs(out.loc[i].authority - 0.5) < 1e-12 for i in range(1, 5))

    def test_doc_graph_runs(self, ray_session):
        from libpostal_ray.pipelines.queries import doc_graph_hits

        out = doc_graph_hits(SF, iters=5).to_pandas()
        assert len(out) == 500
        assert (out.hub >= 0).all() and (out.authority >= 0).all()
