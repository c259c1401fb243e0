"""Round-4 session-16 graph primitives: Boruvka minimum spanning forest
and k-core coreness peeling — both pinned EXACT against independent
in-test references (Kruskal with the same (w, u, v) total order; a
dict-based peel), on random graphs, on BOTH the local hybrid path and
the forced-distributed path."""

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"


def _kruskal(u, v, w):
    """Reference MST under the SAME total order (w, u, v)."""
    order = np.lexsort((v, u, w))
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    out = []
    for i in order:
        a, b = find(int(u[i])), find(int(v[i]))
        if a != b:
            parent[a] = b
            out.append((int(w[i]), int(u[i]), int(v[i])))
    return sorted(out)


def _ref_coreness(u, v):
    """Independent dict-based peel."""
    from collections import defaultdict

    adj = defaultdict(list)
    for a, b in zip(u.tolist(), v.tolist()):
        adj[a].append(b)
        adj[b].append(a)
    deg = {x: len(ns) for x, ns in adj.items()}
    core = {}
    alive = set(adj)
    k = 0
    while alive:
        amin = min(deg[x] for x in alive)
        if amin > k:
            k = amin
        wave = [x for x in alive if deg[x] <= k]
        while wave:
            for x in wave:
                core[x] = k
                alive.discard(x)
            touched = defaultdict(int)
            for x in wave:
                for nb in adj[x]:
                    if nb in alive:
                        touched[nb] += 1
            for nb, c in touched.items():
                deg[nb] -= c
            wave = [x for x in alive if deg[x] <= k]
    return core


def _random_graph(rng, n_max=300, m_factor=4):
    n = rng.randint(2, n_max)
    m = rng.randint(1, m_factor * n)
    u = rng.randint(0, n, m).astype(np.int64)
    v = rng.randint(0, n, m).astype(np.int64)
    keep = u != v
    u, v = u[keep], v[keep]
    lo, hi = np.minimum(u, v), np.maximum(u, v)
    key = lo * np.int64(n + 1) + hi
    _, idx = np.unique(key, return_index=True)
    return lo[idx], hi[idx], n


class TestBoruvkaMST:
    def _run(self, ray_session, local_max):
        import ray.data

        from libpostal_ray.pipelines.graph import boruvka_mst

        rng = np.random.RandomState(7)
        for _ in range(6):
            u, v, n = _random_graph(rng)
            if u.size == 0:
                continue
            w = rng.randint(1, 40, u.size).astype(np.int64)
            ds = ray.data.from_arrow(
                pa.table({"u": pa.array(u), "v": pa.array(v), "w": pa.array(w)})
            )
            got = boruvka_mst(ds, local_max_edges=local_max).to_pandas()
            got_set = sorted(zip(got.w, got.u, got.v))
            ref = _kruskal(u, v, w)
            # the (w, u, v) total order makes the forest UNIQUE: exact
            # edge-set equality, not just total weight
            assert [tuple(map(int, t)) for t in got_set] == ref

    def test_local_path_exact(self, ray_session):
        self._run(ray_session, 10**9)

    def test_distributed_path_exact(self, ray_session):
        self._run(ray_session, 0)

    def test_forest_on_disconnected(self, ray_session):
        import ray.data

        from libpostal_ray.pipelines.graph import boruvka_mst

        # two components: 0-1-2 (triangle) and 10-11
        u = np.array([0, 1, 0, 10], dtype=np.int64)
        v = np.array([1, 2, 2, 11], dtype=np.int64)
        w = np.array([5, 3, 9, 1], dtype=np.int64)
        ds = ray.data.from_arrow(
            pa.table({"u": pa.array(u), "v": pa.array(v), "w": pa.array(w)})
        )
        got = boruvka_mst(ds).to_pandas()
        assert sorted(zip(got.w, got.u, got.v)) == [(1, 10, 11), (3, 1, 2), (5, 0, 1)]

    def test_empty(self, ray_session):
        import ray.data

        from libpostal_ray.pipelines.graph import boruvka_mst

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "u": pa.nulls(0, pa.int64()),
                    "v": pa.nulls(0, pa.int64()),
                    "w": pa.nulls(0, pa.int64()),
                }
            )
        )
        out = boruvka_mst(ds)
        assert out.count() == 0
        assert [f.name for f in out.schema().base_schema] == ["u", "v", "w"]

    def test_doc_graph_mst_row(self, ray_session):
        from libpostal_ray.pipelines.queries import doc_graph_mst

        out = doc_graph_mst(SF).to_pandas()
        n = pq.read_metadata(f"{SF}/documents.parquet").num_rows
        # the doc graph is connected (k -> 2k tree edges from the root),
        # so the MST is a spanning TREE: exactly n-1 edges
        assert len(out) == n - 1
        # forest edges are a subset of the deterministic edge set with
        # the deterministic weight
        w = (out.u * 31 + out.v * 7) % 97 + 1
        assert (out.w == w).all()


class TestCoreness:
    def _run(self, ray_session, local_max):
        import ray.data

        from libpostal_ray.pipelines.graph import coreness

        rng = np.random.RandomState(11)
        cases = [
            # triangle + tail: coreness 2, 2, 2, 1
            (
                np.array([0, 1, 0, 2], dtype=np.int64),
                np.array([1, 2, 2, 3], dtype=np.int64),
            )
        ]
        for _ in range(5):
            u, v, _ = _random_graph(rng, m_factor=5)
            if u.size:
                cases.append((u, v))
        for u, v in cases:
            ds = ray.data.from_arrow(pa.table({"u": pa.array(u), "v": pa.array(v)}))
            got = coreness(ds, local_max_edges=local_max).to_pandas()
            gd = dict(zip(got.doc_id, got.coreness))
            assert gd == _ref_coreness(u, v)

    def test_local_path_exact(self, ray_session):
        self._run(ray_session, 10**9)

    def test_distributed_path_exact(self, ray_session):
        self._run(ray_session, 0)

    def test_known_triangle_tail(self, ray_session):
        import ray.data

        from libpostal_ray.pipelines.graph import coreness

        ds = ray.data.from_arrow(
            pa.table(
                {
                    "u": pa.array([0, 1, 0, 2], type=pa.int64()),
                    "v": pa.array([1, 2, 2, 3], type=pa.int64()),
                }
            )
        )
        got = coreness(ds).to_pandas()
        assert dict(zip(got.doc_id, got.coreness)) == {0: 2, 1: 2, 2: 2, 3: 1}

    def test_empty(self, ray_session):
        import ray.data

        from libpostal_ray.pipelines.graph import coreness

        ds = ray.data.from_arrow(
            pa.table(
                {"u": pa.nulls(0, pa.int64()), "v": pa.nulls(0, pa.int64())}
            )
        )
        out = coreness(ds)
        assert out.count() == 0
        assert [f.name for f in out.schema().base_schema] == ["doc_id", "coreness"]

    def test_doc_graph_kcore_row(self, ray_session):
        from libpostal_ray.pipelines.queries import doc_graph_kcore
        from libpostal_ray.pipelines.queries import _doc_graph_edges

        hist = doc_graph_kcore(SF).to_pandas()
        # pin against the dict peel over the SAME deterministic edges
        edges, n = _doc_graph_edges(SF)
        et = edges.to_pandas()
        ref = _ref_coreness(
            et.u.to_numpy().astype(np.int64), et.v.to_numpy().astype(np.int64)
        )
        import collections

        rh = collections.Counter(ref.values())
        got = dict(zip(hist.coreness, hist.n_docs))
        assert got == dict(rh)
        assert int(hist.n_docs.sum()) == len(ref)


import pandas as pd

US = 1_000_000
DAY_US = 86_400_000_000


def _write(tmp_path, name, table):
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(table, str(d / f"{name}.parquet"))
    return str(d)


def _events(tmp_path, rows):
    """rows: list of (event_id, ts_us, user_id, value)."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "event_type": pa.array(["click"] * len(rows), type=pa.string()),
            "value": pa.array([r[3] for r in rows], type=pa.float64()),
            "props": pa.array(["{}"] * len(rows), type=pa.string()),
        }
    )
    return _write(tmp_path, "events", tbl)


class TestUserTimeWeightedValue:
    def test_step_function_semantics(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import user_time_weighted_value

        # user 1: value 2.0 held 10 s, then 4.0 held 30 s, then 0 (last
        # event's value never counts) -> num = 2000*10e6 + 4000*30e6
        d = _events(
            tmp_path,
            [
                (1, 0, 1, 2.0),
                (2, 10 * US, 1, 4.0),
                (3, 40 * US, 1, 99.0),
                (4, 0, 2, 7.0),  # single event -> excluded
            ],
        )
        out = user_time_weighted_value(d).to_pandas()
        assert list(out.user_id) == [1]
        num = 2000 * 10 * US + 4000 * 30 * US
        den = 40 * US
        assert int(out.num_milli_us.iloc[0]) == num
        assert int(out.den_us.iloc[0]) == den
        assert out.twa_milli.iloc[0] == float(num) / float(den)

    def test_equal_ts_tiebreak(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import user_time_weighted_value

        # two events at the SAME ts: event_id order pins which value
        # carries over the zero-length gap (value 5 carries 0 us), then
        # event 2's value 9 carries 10 s
        d = _events(
            tmp_path,
            [
                (2, 0, 1, 9.0),
                (1, 0, 1, 5.0),
                (3, 10 * US, 1, 1.0),
            ],
        )
        out = user_time_weighted_value(d).to_pandas()
        assert int(out.num_milli_us.iloc[0]) == 9000 * 10 * US
        assert int(out.den_us.iloc[0]) == 10 * US


class TestEventsCusumChangepoint:
    def test_planted_shift(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import events_cusum_changepoint

        # days 0..5: milli 1000 each; days 6..11: 5000 each — the CUSUM
        # max-deviation day is the last low day (day 5)
        rows = []
        eid = 0
        for day in range(12):
            val = 1.0 if day < 6 else 5.0
            rows.append((eid, day * DAY_US + 1, 1, val))
            eid += 1
        d = _events(tmp_path, rows)
        out = events_cusum_changepoint(d).to_pandas()
        assert len(out) == 1
        assert int(out.day_idx.iloc[0]) == 5
        n, total = 12, 6 * 1000 + 6 * 5000
        cum5 = 6 * 1000
        assert int(out.dev.iloc[0]) == n * cum5 - 6 * total
        assert int(out.n_days.iloc[0]) == 12
        assert int(out.total_milli.iloc[0]) == total

    def test_tie_breaks_to_earliest(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import events_cusum_changepoint

        # symmetric V shape: |dev| ties — earliest day wins
        d = _events(
            tmp_path,
            [
                (0, 0 * DAY_US, 1, 3.0),
                (1, 1 * DAY_US, 1, 1.0),
                (2, 2 * DAY_US, 1, 3.0),
            ],
        )
        out = events_cusum_changepoint(d).to_pandas()
        # devs: k=1: 3*3000-1*7000=2000; k=2: 3*4000-2*7000=-2000 (tie)
        assert int(out.day_idx.iloc[0]) == 0
        assert int(out.dev.iloc[0]) == 2000


def test_session16_queries_on_empty_corpus(ray_session, tmp_path):
    import __ray_entry__ as entrymod

    d = tmp_path / "sf_empty"
    d.mkdir()
    for t in (
        "events", "lineitem", "orders", "customer", "documents",
        "nation", "part", "supplier", "region",
    ):
        schema = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    qs = entrymod.queries()
    for name in (
        "user_time_weighted_value",
        "doc_graph_mst",
        "doc_graph_kcore",
    ):
        res = qs[name](str(d))
        df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
        assert len(df) == 0, (name, df.head())
    # cusum over an empty corpus: zero-row output
    res = qs["events_cusum_changepoint"](str(d))
    df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
    assert len(df) == 0


class TestLinkageFS:
    def _ref_em(self, counts, iters=30, p=0.1, m0=0.9, u0=0.1):
        """Independent scalar-loop EM (no numpy broadcasting tricks)."""
        import math

        k = 4
        m = [m0] * k
        u = [u0] * k
        total = sum(counts)
        for _ in range(iters):
            wc = []
            for g in range(16):
                bits = [(g >> f) & 1 for f in range(k)]
                pm = 1.0
                pu = 1.0
                for f in range(k):
                    pm *= m[f] if bits[f] else 1.0 - m[f]
                    pu *= u[f] if bits[f] else 1.0 - u[f]
                num = p * pm
                den = num + (1.0 - p) * pu
                wc.append(num / den if den > 0 else 0.0)
            s = sum(wc[g] * counts[g] for g in range(16))
            p = s / total
            eps = 1e-12
            new_m, new_u = [], []
            for f in range(k):
                am = sum(
                    wc[g] * counts[g] for g in range(16) if (g >> f) & 1
                )
                au = sum(
                    (1.0 - wc[g]) * counts[g]
                    for g in range(16)
                    if (g >> f) & 1
                )
                new_m.append(min(max(am / max(s, eps), eps), 1.0 - eps))
                new_u.append(
                    min(max(au / max(total - s, eps), eps), 1.0 - eps)
                )
            m, u = new_m, new_u
        return p, m, u

    def test_em_matches_independent_reference(self, ray_session):
        from libpostal_ray.pipelines.linkage import fs_em

        rng = np.random.RandomState(3)
        counts = rng.randint(0, 10_000, 16).astype(np.int64)
        got = fs_em(counts).to_pandas()
        p_ref, m_ref, u_ref = self._ref_em(counts.tolist())
        # same fixed-order float64 recurrences -> tight agreement
        assert abs(got.match_prior.iloc[0] - p_ref) < 1e-12
        for f in range(4):
            assert abs(got.m.iloc[f] - m_ref[f]) < 1e-12
            assert abs(got.u.iloc[f] - u_ref[f]) < 1e-12

    def test_em_separates_planted_match_class(self, ray_session):
        from libpostal_ray.pipelines.linkage import fs_em

        # 1000 "match" pairs agree on everything (pattern 15); 99000
        # random pairs agree on each field with prob ~0.2 independently
        rng = np.random.RandomState(5)
        counts = np.zeros(16, dtype=np.int64)
        pats = (
            (rng.rand(99_000, 4) < 0.2).astype(np.int64)
            * np.array([1, 2, 4, 8])
        ).sum(axis=1)
        np.add.at(counts, pats, 1)
        counts[15] += 1000
        got = fs_em(counts).to_pandas()
        # the match class must show high m and low u on every field
        assert (got.m > 0.8).all(), got
        assert (got.u < 0.3).all(), got
        assert (got.weight_agree > 1.0).all()

    def test_agreement_patterns_planted(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import linkage_agreement_patterns

        # 6 docs, dense ids; fields chosen so pair (0,1) agrees on all
        # four (pattern 15), (1,2) agrees on nothing (pattern 0)
        docs = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3, 4, 5], type=pa.int64()),
                "text": pa.array(
                    ["alpha one", "alpha two", "beta zzz",
                     "gamma", "gamma", "delta"],
                    type=pa.string(),
                ),
                "lang": pa.array(
                    ["en", "en", "fr", "de", "de", "de"], type=pa.string()
                ),
                "source": pa.array(
                    ["web", "web", "api", "web", "web", "api"],
                    type=pa.string(),
                ),
                "n_chars": pa.array(
                    [10, 20, 500, 64, 65, 1000], type=pa.int64()
                ),
            }
        )
        d = _write(tmp_path, "documents", docs)
        got = linkage_agreement_patterns(d).to_pandas()
        import duckdb

        want = duckdb.sql(
            f"""
            WITH p AS (
                SELECT (CASE WHEN a.lang = b.lang THEN 1 ELSE 0 END)
                + 2*(CASE WHEN a.source = b.source THEN 1 ELSE 0 END)
                + 4*(CASE WHEN a.n_chars // 64 = b.n_chars // 64
                     THEN 1 ELSE 0 END)
                + 8*(CASE WHEN substr(a.text,1,8) = substr(b.text,1,8)
                     THEN 1 ELSE 0 END) AS pattern
                FROM '{d}/documents.parquet' a
                JOIN '{d}/documents.parquet' b
                  ON b.doc_id - a.doc_id BETWEEN 1 AND 3
            ) SELECT pattern, count(*) n FROM p GROUP BY 1 ORDER BY 1
            """
        ).df()
        gd = dict(zip(got.pattern, got.n_pairs))
        wd = dict(zip(want.pattern, want.n))
        assert gd == wd

    def test_cross_block_pairs(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.linkage import agreement_patterns
        import ray.data

        # tiny block size forces every pair across a block boundary
        n = 40
        docs = pa.table(
            {
                "doc_id": pa.array(list(range(n)), type=pa.int64()),
                "text": pa.array([f"t{i}" for i in range(n)]),
                "lang": pa.array(["en"] * n),
                "source": pa.array(["web"] * n),
                "n_chars": pa.array([10] * n, type=pa.int64()),
            }
        )
        ds = ray.data.from_arrow(docs)
        got = agreement_patterns(ds, w=3, block=4).to_pandas()
        # all pairs agree on lang+source+len (pattern 7 minus prefix bit);
        # prefixes "t0".."t39" differ -> pattern 7; total pairs =
        # (n-1)+(n-2)+(n-3)
        assert len(got) == 1
        assert int(got.pattern.iloc[0]) == 7
        assert int(got.n_pairs.iloc[0]) == (n - 1) + (n - 2) + (n - 3)

    def test_linkage_fs_em_row(self, ray_session):
        import __ray_entry__ as entrymod

        out = entrymod.queries()["linkage_fs_em"](SF)
        assert list(out.field) == ["lang", "source", "len_bucket", "prefix"]
        assert ((out.m > 0) & (out.m < 1)).all()
        assert ((out.u > 0) & (out.u < 1)).all()
