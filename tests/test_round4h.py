"""Round-4 session-17 exact rank/ECDF test operators: two-sample
Kolmogorov-Smirnov (source_length_ks) and tie-corrected Mann-Whitney U
(events_mannwhitney) — both pinned against brute-force references that
walk the raw rows (no shared code with the cell-count plan)."""

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"

DAY_US = 86_400_000_000


def _docs(tmp_path, rows):
    """rows: list of (doc_id, source, n_chars)."""
    d = tmp_path / "sf_docs"
    d.mkdir(exist_ok=True)
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array(["x" * r[2] for r in rows], type=pa.string()),
            "lang": pa.array(["en"] * len(rows), type=pa.string()),
            "source": pa.array([r[1] for r in rows], type=pa.string()),
            "n_chars": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def _events(tmp_path, rows):
    """rows: list of (event_id, event_type, value)."""
    d = tmp_path / "sf_events"
    d.mkdir(exist_ok=True)
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array(
                [r[0] * DAY_US for r in rows], type=pa.timestamp("us")
            ),
            "user_id": pa.array([1] * len(rows), type=pa.int64()),
            "event_type": pa.array([r[1] for r in rows], type=pa.string()),
            "value": pa.array([r[2] for r in rows], type=pa.float64()),
            "props": pa.array(["{}"] * len(rows), type=pa.string()),
        }
    )
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


def _brute_ks(samples: dict[str, np.ndarray]) -> pd.DataFrame:
    """ECDF double loop over raw values (independent of the cell plan)."""
    out = []
    names = sorted(samples)
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            x, y = samples[a], samples[b]
            grid = np.unique(np.concatenate((x, y)))
            best = 0
            for g in grid:
                ca = int((x <= g).sum())
                cb = int((y <= g).sum())
                best = max(best, abs(ca * y.size - cb * x.size))
            out.append(
                (a, b, x.size, y.size, best, best / (x.size * y.size))
            )
    return pd.DataFrame(
        out,
        columns=["source_a", "source_b", "n_a", "n_b", "ks_num", "ks_d"],
    )


def _brute_u2(x: np.ndarray, y: np.ndarray) -> int:
    """Doubled tie-corrected U1 via explicit midranks over raw rows."""
    comb = np.concatenate((x, y))
    r1x2 = 0
    for v in x:
        below = int((comb < v).sum())
        ties = int((comb == v).sum())
        r1x2 += 2 * below + ties + 1
    return 2 * x.size * y.size + x.size * (x.size + 1) - r1x2


class TestSourceLengthKS:
    def test_planted(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import source_length_ks

        rows = [(i, "a", v) for i, v in enumerate([1, 2, 3, 4])] + [
            (10 + i, "b", v) for i, v in enumerate([3, 4, 5, 6])
        ]
        out = source_length_ks(_docs(tmp_path, rows))
        assert len(out) == 1
        r = out.iloc[0]
        assert (r.source_a, r.source_b) == ("a", "b")
        # cum diffs x4 peak at 2 -> num 8, D = 0.5
        assert int(r.ks_num) == 8 and float(r.ks_d) == 0.5

    def test_identical_distributions_zero(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import source_length_ks

        rows = [(i, "a", (i % 5) + 1) for i in range(10)] + [
            (100 + i, "b", (i % 5) + 1) for i in range(10)
        ]
        out = source_length_ks(_docs(tmp_path, rows))
        assert int(out.ks_num.iloc[0]) == 0

    def test_random_vs_brute(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import source_length_ks

        rng = np.random.default_rng(7)
        rows = []
        samples = {}
        i = 0
        for s, lo, hi, n in (
            ("s1", 1, 40, 60),
            ("s2", 10, 60, 45),
            ("s3", 1, 15, 30),
        ):
            vals = rng.integers(lo, hi, size=n)
            samples[s] = vals.astype(np.int64)
            for v in vals:
                rows.append((i, s, int(v)))
                i += 1
        out = source_length_ks(_docs(tmp_path, rows)).reset_index(drop=True)
        ref = _brute_ks(samples)
        pd.testing.assert_frame_equal(
            out, ref, check_dtype=False, check_exact=True
        )


class TestEventsMannWhitney:
    def test_planted_with_ties(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import events_mannwhitney

        # a: [1, 2, 2]; b: [2, 3] (milli 1000/2000/3000)
        rows = [
            (0, "a", 1.0),
            (1, "a", 2.0),
            (2, "a", 2.0),
            (3, "b", 2.0),
            (4, "b", 3.0),
        ]
        out = events_mannwhitney(_events(tmp_path, rows))
        assert len(out) == 1
        r = out.iloc[0]
        x = np.array([1000, 2000, 2000])
        y = np.array([2000, 3000])
        assert int(r.u2_a) == _brute_u2(x, y)
        assert int(r.u2_a) + int(r.u2_b) == 2 * 3 * 2

    def test_random_vs_brute(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import events_mannwhitney

        rng = np.random.default_rng(11)
        types = ["t1", "t2", "t3"]
        rows = []
        vals = {t: [] for t in types}
        i = 0
        for t in types:
            for _ in range(rng.integers(20, 40)):
                v = float(rng.integers(0, 25)) / 4.0  # many exact ties
                vals[t].append(np.int64(np.floor(v * 1000)))
                rows.append((i, t, v))
                i += 1
        out = events_mannwhitney(_events(tmp_path, rows))
        for _, r in out.iterrows():
            x = np.array(vals[r.type_a])
            y = np.array(vals[r.type_b])
            assert int(r.u2_a) == _brute_u2(x, y), (r.type_a, r.type_b)
            assert int(r.u2_a) + int(r.u2_b) == 2 * x.size * y.size


def test_session17_queries_on_empty_corpus(ray_session, tmp_path):
    import __ray_entry__ as entrymod

    d = tmp_path / "sf_empty"
    d.mkdir()
    for t in ("events", "documents"):
        schema = pq.read_schema(f"{SF}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    qs = entrymod.queries()
    for name in ("source_length_ks", "events_mannwhitney"):
        res = qs[name](str(d))
        df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
        assert len(df) == 0, (name, df.head())


def _seq_greedy_matching(u, v, w):
    """Reference: sequential greedy under the (w, u, v) total order."""
    order = np.lexsort((v, u, w))
    used = set()
    out = []
    for i in order:
        a, b = int(u[i]), int(v[i])
        if a in used or b in used:
            continue
        used.add(a)
        used.add(b)
        out.append((int(w[i]), int(u[i]), int(v[i])))
    return sorted(out)


def _rand_graph(rng, n, m):
    u = rng.integers(0, n, m).astype(np.int64)
    v = rng.integers(0, n, m).astype(np.int64)
    keep = u != v
    u, v = u[keep], v[keep]
    lo, hi = np.minimum(u, v), np.maximum(u, v)
    key = lo * np.int64(n + 1) + hi
    _, idx = np.unique(key, return_index=True)
    u, v = lo[idx], hi[idx]
    w = ((u * 13 + v * 29) % 53 + 1).astype(np.int64)
    return u, v, w


class TestMaximalMatching:
    def _run(self, ray_session, u, v, w, local):
        import ray as _ray
        from libpostal_ray.pipelines.graph import maximal_matching

        ds = _ray.data.from_arrow(
            pa.table(
                {"u": pa.array(u), "v": pa.array(v), "w": pa.array(w)}
            )
        ).repartition(4)
        got = maximal_matching(
            ds, local_max_edges=(10**9 if local else 0)
        ).to_pandas()
        return sorted(
            zip(got.w.astype(int), got.u.astype(int), got.v.astype(int))
        )

    def test_matches_sequential_greedy_both_paths(self, ray_session):
        rng = np.random.default_rng(23)
        for trial in range(6):
            n = int(rng.integers(8, 200))
            m = int(rng.integers(n, 5 * n))
            u, v, w = _rand_graph(rng, n, m)
            if u.size == 0:
                continue
            ref = _seq_greedy_matching(u, v, w)
            for local in (True, False):
                got = self._run(ray_session, u, v, w, local)
                assert got == ref, (trial, local)

    def test_matching_is_maximal_and_valid(self, ray_session):
        rng = np.random.default_rng(31)
        u, v, w = _rand_graph(rng, 120, 400)
        got = self._run(ray_session, u, v, w, True)
        used = set()
        for _, a, b in got:
            assert a not in used and b not in used  # a matching
            used.add(a)
            used.add(b)
        # maximal: every edge touches a matched vertex
        for a, b in zip(u, v):
            assert int(a) in used or int(b) in used

    def test_adversarial_sorted_chain(self, ray_session):
        # strictly increasing weights along a path: one match per round
        n = 24
        u = np.arange(n - 1, dtype=np.int64)
        v = np.arange(1, n, dtype=np.int64)
        w = np.arange(1, n, dtype=np.int64)
        ref = _seq_greedy_matching(u, v, w)
        for local in (True, False):
            got = self._run(ray_session, u, v, w, local)
            assert got == ref

    def test_empty(self, ray_session, tmp_path):
        import __ray_entry__ as entrymod

        d = tmp_path / "sf_empty2"
        d.mkdir()
        schema = pq.read_schema(f"{SF}/documents.parquet")
        pq.write_table(schema.empty_table(), str(d / "documents.parquet"))
        res = entrymod.queries()["doc_graph_matching"](str(d))
        assert len(res.to_pandas()) == 0

    def test_on_corpus(self, ray_session):
        from libpostal_ray.pipelines.queries import (
            _doc_graph_edges,
            doc_graph_matching,
        )

        got = doc_graph_matching(SF).to_pandas()
        edges, _ = _doc_graph_edges(SF)
        et = edges.to_pandas()
        u = et.u.to_numpy().astype(np.int64)
        v = et.v.to_numpy().astype(np.int64)
        w = ((u * 31 + v * 7) % 97 + 1).astype(np.int64)
        ref = _seq_greedy_matching(u, v, w)
        assert (
            sorted(zip(got.w.astype(int), got.u.astype(int),
                       got.v.astype(int)))
            == ref
        )


class TestPoissonBootstrap:
    def _ref(self, ids, milli, B, q_lo=0.025, q_hi=0.975):
        """Independent scalar implementation of the identical scheme
        (pure-python splitmix64, per-row inverse-CDF loop)."""
        import math

        MASK = (1 << 64) - 1
        cdf = []
        acc = 0.0
        fact = 1.0
        for k in range(17):
            if k:
                fact *= k
            acc += math.exp(-1.0) / fact
            cdf.append(acc)

        def mix(x):
            z = (x + 0x9E3779B97F4A7C15) & MASK
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK
            return z ^ (z >> 31)

        def w(i, b):
            u = mix(i * B + b) / 2.0**64
            for k, c in enumerate(cdf):
                if u < c:
                    return k
            return len(cdf)

        means = []
        for b in range(B):
            s = c = 0
            for i, m in zip(ids, milli):
                wt = w(i, b)
                s += wt * m
                c += wt
            means.append(s / max(c, 1.0))
        means.sort()
        ilo = max(int(np.ceil(q_lo * B)) - 1, 0)
        ihi = max(int(np.ceil(q_hi * B)) - 1, 0)
        return (
            sum(milli) / len(ids), means[ilo], means[ihi]
        )

    def test_matches_scalar_reference(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import events_bootstrap_ci

        rng = np.random.default_rng(3)
        n, B = 240, 40
        vals = (rng.integers(0, 5000) / 10.0 for _ in range(n))
        rows = [(i, "t", float(v)) for i, v in enumerate(vals)]
        d = _events(tmp_path, rows)
        out = events_bootstrap_ci(d, B=B)
        assert len(out) == 1
        ids = [r[0] for r in rows]
        milli = [int(np.floor(r[2] * 1000.0)) for r in rows]
        mean, lo, hi = self._ref(ids, milli, B)
        r = out.iloc[0]
        assert int(r.n) == n and int(r.n_replicates) == B
        assert float(r.mean_milli) == mean
        assert float(r.ci_lo_milli) == lo
        assert float(r.ci_hi_milli) == hi

    def test_ci_brackets_mean_and_orders(self, ray_session):
        from libpostal_ray.pipelines.queries import events_bootstrap_ci

        out = events_bootstrap_ci(SF, B=100)
        r = out.iloc[0]
        assert r.ci_lo_milli <= r.mean_milli <= r.ci_hi_milli
        # CI is materially narrower than the value range
        assert (r.ci_hi_milli - r.ci_lo_milli) < 0.5 * r.mean_milli

    def test_empty(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import events_bootstrap_ci

        d = tmp_path / "sf_empty3"
        d.mkdir()
        schema = pq.read_schema(f"{SF}/events.parquet")
        pq.write_table(schema.empty_table(), str(d / "events.parquet"))
        assert len(events_bootstrap_ci(str(d), B=20)) == 0


class TestIsotonicDaily:
    def _ref_pava(self, s, c):
        """Independent Fraction-based stack PAVA."""
        from fractions import Fraction

        pools = []
        for i in range(len(s)):
            pools.append([i, Fraction(s[i]), c[i]])
            while len(pools) > 1 and (
                pools[-2][1] / pools[-2][2] >= pools[-1][1] / pools[-1][2]
            ):
                b = pools.pop()
                pools[-1][1] += b[1]
                pools[-1][2] += b[2]
        iso = [None] * len(s)
        bounds = [p[0] for p in pools] + [len(s)]
        for k, p in enumerate(pools):
            for i in range(bounds[k], bounds[k + 1]):
                iso[i] = p[1] / p[2]
        return iso

    def _ref_minimax(self, s, c):
        """Second independent reference: iso(k) = max_{i<=k} min_{j>=i}
        avg(v[i..j]) with exact Fractions."""
        from fractions import Fraction

        n = len(s)
        out = []
        for k in range(n):
            best = None
            for i in range(k + 1):
                worst = None
                for j in range(i, n):
                    a = Fraction(sum(s[i : j + 1]), sum(c[i : j + 1]))
                    if worst is None or a < worst:
                        worst = a
                if best is None or worst > best:
                    best = worst
            out.append(best)
        return out

    def _run(self, tmp_path, day_vals):
        """day_vals: list of (day, value) event rows."""
        from libpostal_ray.pipelines.queries import events_isotonic_daily

        rows = [
            (i, "t", float(v)) for i, (d, v) in enumerate(day_vals)
        ]
        # _events uses event_id*DAY_US as ts; we need explicit days
        d = tmp_path / "sf_iso"
        d.mkdir(exist_ok=True)
        t = pa.table(
            {
                "event_id": pa.array(
                    list(range(len(day_vals))), type=pa.int64()
                ),
                "ts": pa.array(
                    [dv[0] * DAY_US for dv in day_vals],
                    type=pa.timestamp("us"),
                ),
                "user_id": pa.array([1] * len(day_vals), type=pa.int64()),
                "event_type": pa.array(["t"] * len(day_vals)),
                "value": pa.array(
                    [float(dv[1]) for dv in day_vals], type=pa.float64()
                ),
                "props": pa.array(["{}"] * len(day_vals)),
            }
        )
        pq.write_table(t, str(d / "events.parquet"))
        return events_isotonic_daily(str(d)).to_pandas()

    def test_vs_both_references(self, ray_session, tmp_path):
        rng = np.random.default_rng(13)
        day_vals = []
        days = list(range(12))
        for dday in days:
            for _ in range(int(rng.integers(1, 5))):
                day_vals.append((dday, int(rng.integers(0, 100))))
        out = self._run(tmp_path, day_vals)
        # exact day aggregates
        s = [0] * len(days)
        c = [0] * len(days)
        for dday, v in day_vals:
            s[dday] += int(np.floor(v * 1000.0))
            c[dday] += 1
        ref1 = self._ref_pava(s, c)
        ref2 = self._ref_minimax(s, c)
        assert ref1 == ref2  # the two references agree
        got = out.sort_values("day_idx").iso_milli.to_numpy()
        assert got.shape[0] == len(days)
        for g, r in zip(got, ref1):
            assert float(g) == r.numerator / r.denominator

    def test_monotone_input_is_identity(self, ray_session, tmp_path):
        day_vals = [(d, d * 10) for d in range(8)]
        out = self._run(tmp_path, day_vals).sort_values("day_idx")
        assert (out.iso_milli.to_numpy()
                == np.arange(8) * 10_000.0).all()
        assert (out.pool_start.to_numpy() == np.arange(8)).all()

    def test_decreasing_input_pools_to_global_mean(
        self, ray_session, tmp_path
    ):
        day_vals = [(d, 100 - d * 10) for d in range(5)]
        out = self._run(tmp_path, day_vals)
        assert (out.pool_start == 0).all()
        assert np.allclose(out.iso_milli, out.iso_milli.iloc[0])

    def test_empty(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import events_isotonic_daily

        d = tmp_path / "sf_empty4"
        d.mkdir()
        schema = pq.read_schema(f"{SF}/events.parquet")
        pq.write_table(schema.empty_table(), str(d / "events.parquet"))
        assert len(events_isotonic_daily(str(d)).to_pandas()) == 0
