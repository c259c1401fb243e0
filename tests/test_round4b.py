"""Round-4 session-10 operators: hierarchical prefix rollup, grouped
weighted median, PMI collocations, argmax-per-group — unit semantics +
blocking independence (results must not depend on how Ray splits blocks)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data


class TestPrefixRollup:
    def _run(self, paths, weights, blocks, max_depth=3):
        from libpostal_ray.pipelines.hierarchy import prefix_rollup

        t = pa.table(
            {
                "path": pa.array(paths, type=pa.string()),
                "w": pa.array(weights, type=pa.int64()),
            }
        )
        out = (
            prefix_rollup(
                ray.data.from_arrow(t).repartition(blocks),
                "path",
                "w",
                max_depth=max_depth,
            )
            .to_pandas()
            .sort_values(["depth", "prefix"])
            .reset_index(drop=True)
        )
        return out

    def test_planted_tree(self, ray_session):
        paths = ["a/x/1", "a/x/2", "a/y/1", "b/z/1", "a", "b/z"]
        w = [10, 20, 30, 40, 5, 6]
        out = self._run(paths, w, 2)
        got = {
            (r.prefix, r.depth): (r.n_files, r.weight)
            for r in out.itertuples()
        }
        assert got[("a", 1)] == (4, 65)  # a/x/1, a/x/2, a/y/1, a
        assert got[("b", 1)] == (2, 46)
        assert got[("a/x", 2)] == (2, 30)
        assert got[("a/y", 2)] == (1, 30)
        assert got[("b/z", 2)] == (2, 46)  # b/z/1 and the exact row b/z
        assert got[("a/x/1", 3)] == (1, 10)
        assert got[("b/z/1", 3)] == (1, 40)
        # shallow rows stop contributing past their own depth
        assert ("a", 2) not in got
        assert ("b/z", 3) not in got

    def test_blocking_independent(self, ray_session):
        rng = np.random.default_rng(7)
        parts = ["r%d" % i for i in range(5)]
        paths = [
            "/".join(rng.choice(parts, size=rng.integers(1, 5)))
            for _ in range(300)
        ]
        w = rng.integers(0, 100, size=300).tolist()
        a = self._run(paths, w, 1)
        b = self._run(paths, w, 13)
        assert a.equals(b)

    def test_brute_force_equal(self, ray_session):
        rng = np.random.default_rng(3)
        parts = ["p%d" % i for i in range(4)]
        paths = [
            "/".join(rng.choice(parts, size=rng.integers(1, 6)))
            for _ in range(200)
        ]
        w = rng.integers(1, 50, size=200)
        D = 3
        exp = {}
        for p, wt in zip(paths, w):
            comps = p.split("/")
            for d in range(1, min(len(comps), D) + 1):
                key = ("/".join(comps[:d]), d)
                n, s = exp.get(key, (0, 0))
                exp[key] = (n + 1, s + int(wt))
        out = self._run(paths, w.tolist(), 4, max_depth=D)
        got = {
            (r.prefix, r.depth): (r.n_files, r.weight)
            for r in out.itertuples()
        }
        assert got == exp


class TestGroupedWeightedMedian:
    @staticmethod
    def _brute(g, v, w):
        exp = {}
        for grp in sorted(set(g)):
            m = np.asarray([x == grp for x in g])
            vv, ww = np.asarray(v)[m], np.asarray(w)[m]
            order = np.argsort(vv, kind="stable")
            vv, ww = vv[order], ww[order]
            tot = int(ww.sum())
            cum = np.cumsum(ww)
            i = int(np.searchsorted(cum, (tot + 1) // 2))
            exp[grp] = (tot, float(vv[i]))
        return exp

    def _run(self, g, v, w, blocks):
        from libpostal_ray.functions.quantile import grouped_weighted_median

        t = pa.table(
            {
                "g": pa.array(g, type=pa.string()),
                "v": pa.array(v, type=pa.float64()),
                "w": pa.array(w, type=pa.int64()),
            }
        )
        out = grouped_weighted_median(
            ray.data.from_arrow(t).repartition(blocks), "g", "v", "w"
        ).to_pandas()
        return {
            r.g: (r.total_weight, r.wmedian) for r in out.itertuples()
        }

    def test_vs_brute_random(self, ray_session):
        rng = np.random.default_rng(11)
        n = 2000
        g = [f"g{int(x)}" for x in rng.integers(0, 7, n)]
        v = rng.normal(0, 1e6, n).round(2)
        w = rng.integers(1, 40, n)
        got = self._run(g, v.tolist(), w.tolist(), 5)
        exp = self._brute(g, v, w)
        assert got == exp

    def test_blocking_independent_and_negatives(self, ray_session):
        rng = np.random.default_rng(5)
        n = 500
        g = [f"k{int(x)}" for x in rng.integers(0, 3, n)]
        v = rng.normal(-10, 100, n)  # negative floats exercise key order
        w = rng.integers(0, 5, n)  # zero weights must drop out
        a = self._run(g, v.tolist(), w.tolist(), 1)
        b = self._run(g, v.tolist(), w.tolist(), 9)
        assert a == b
        keep = w > 0
        exp = self._brute(
            [x for x, k in zip(g, keep) if k],
            np.asarray(v)[keep],
            np.asarray(w)[keep],
        )
        assert a == exp

    def test_unit_weights_are_lower_median(self, ray_session):
        got = self._run(
            ["a"] * 4, [1.0, 2.0, 3.0, 4.0], [1, 1, 1, 1], 2
        )
        assert got == {"a": (4, 2.0)}

    def test_empty(self, ray_session):
        from libpostal_ray.functions.quantile import grouped_weighted_median

        t = pa.table(
            {
                "g": pa.array([], type=pa.string()),
                "v": pa.array([], type=pa.float64()),
                "w": pa.array([], type=pa.int64()),
            }
        )
        out = grouped_weighted_median(ray.data.from_arrow(t), "g", "v", "w")
        assert out.num_rows == 0
        assert out.column_names == ["g", "total_weight", "wmedian"]

    def test_float_weights_rejected(self, ray_session):
        from libpostal_ray.functions.quantile import grouped_weighted_median

        t = pa.table(
            {
                "g": pa.array(["a", "a"], type=pa.string()),
                "v": pa.array([1.0, 2.0], type=pa.float64()),
                "w": pa.array([1.5, 2.0], type=pa.float64()),
            }
        )
        with pytest.raises(Exception, match="integral|int64"):
            grouped_weighted_median(ray.data.from_arrow(t), "g", "v", "w")


class TestCollocationsAndArgmax:
    def _docs_dir(self, tmp_path, texts):
        d = tmp_path / "sf"
        d.mkdir()
        n = len(texts)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(n), type=pa.int64()),
                    "text": pa.array(texts, type=pa.string()),
                    "lang": pa.array(["en"] * n),
                    "source": pa.array(["s0"] * n),
                    "n_chars": pa.array(
                        [len(t) for t in texts], type=pa.int64()
                    ),
                }
            ),
            str(d / "documents.parquet"),
        )
        return str(d)

    def test_collocations_brute(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import top_collocations

        texts = [
            "new york is big",
            "new york new york",
            "big apple is new",
            "york city",
        ]
        sf = self._docs_dir(tmp_path, texts)
        out = top_collocations(sf).to_pandas()
        # brute force
        uni, bi = {}, {}
        n1 = nb = 0
        for t in texts:
            toks = t.split()
            for w in toks:
                uni[w] = uni.get(w, 0) + 1
                n1 += 1
            for a, b in zip(toks, toks[1:]):
                bi[(a, b)] = bi.get((a, b), 0) + 1
                nb += 1
        exp = {}
        for (a, b), nxy in bi.items():
            exp[(a, b)] = (
                nxy,
                uni[a],
                uni[b],
                ((np.float64(nxy) * n1) * n1)
                / ((np.float64(nb) * uni[a]) * uni[b]),
            )
        got = {
            (r.w1, r.w2): (r.n_xy, r.n_x, r.n_y, r.pmi_ratio)
            for r in out.itertuples()
        }
        assert got == exp  # < 50 bigrams: full set, exact scores
        # ordering: score DESC then w1, w2
        s = out[["pmi_ratio", "w1", "w2"]].to_records(index=False)
        for i in range(len(s) - 1):
            assert (-s[i][0], s[i][1], s[i][2]) <= (-s[i + 1][0], s[i + 1][1], s[i + 1][2])

    def test_user_top_event_ties(self, ray_session, tmp_path):
        from libpostal_ray.pipelines.queries import user_top_event

        d = tmp_path / "sfev"
        d.mkdir()
        ts = pa.array([0] * 5, type=pa.timestamp("us"))
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                    "ts": ts,
                    "user_id": pa.array([7, 7, 7, 8, 8], type=pa.int64()),
                    "event_type": pa.array(["a", "b", "c", "d", "e"]),
                    "value": pa.array([5.0, 9.0, 9.0, 1.0, -2.0]),
                    "props": pa.array(["{}"] * 5),
                }
            ),
            str(d / "events.parquet"),
        )
        out = (
            user_top_event(str(d))
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        # user 7: value tie 9.0 on events 2 and 3 -> higher event_id wins
        assert out.loc[0, "top_event_id"] == 3
        assert out.loc[0, "top_type"] == "c"
        assert out.loc[1, "top_event_id"] == 4
        assert out.loc[1, "top_value"] == 1.0


def test_session10_queries_on_empty_corpus(ray_session, tmp_path):
    import pandas as pd
    import __ray_entry__ as entrymod

    src = "/root/testdata/sf0.001"
    d = tmp_path / "sf_empty"
    d.mkdir()
    for t in ("documents", "events", "lineitem", "orders", "customer"):
        schema = pq.read_schema(f"{src}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    qs = entrymod.queries()
    for name in (
        "events_since_signup",
        "event_type_octiles",
        "part_association_rules",
        "documents_checksum",
        "part_pair_counts",
        "user_behavior_profiles",
        "doc_chain_ranks",
        "event_value_winsorized",
        "doc_chunk_windows",
        "order_price_allocation",
        "user_busy_intervals",
        "event_transitions",
        "user_retention_daily",
        "user_value_hourly_ffill",
        "name_typo_pairs",
        "order_skyline",
        "lang_chain_components",
        "user_top_event",
        "doc_dir_rollup",
        "top_collocations",
        "returnflag_weighted_median",
    ):
        res = qs[name](str(d))
        df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
        assert len(df) == 0, (name, df.head())


def test_order_price_allocation_sums_to_total(ray_session):
    """Hamilton apportionment invariant: per-order allocations are
    integers summing EXACTLY to the order's total cents."""
    import numpy as np
    from libpostal_ray.pipelines import queries as q

    sf = "/root/testdata/sf0.001"
    out = q.order_price_allocation(sf).to_pandas()
    got = out.groupby("l_orderkey")["alloc_cents"].sum()
    orders = pq.read_table(f"{sf}/orders.parquet").to_pandas()
    tot = np.floor(orders["o_totalprice"].to_numpy() * 100.0 + 0.5).astype("int64")
    want = dict(zip(orders["o_orderkey"], tot))
    li_orders = set(out["l_orderkey"])
    assert len(got) == len(li_orders)
    for k, s in got.items():
        assert s == want[k], (k, s, want[k])


def test_chunk_windows_semantics(ray_session):
    """Unicode tokens, mixed whitespace separators, trailing fragment,
    and sub-batch-size independence."""
    import pyarrow as pa
    from libpostal_ray.pipelines.pack import chunk_windows

    texts = [
        "a b c d e",            # 5 toks, W=3 S=2 -> chunks at 0,2,4
        "  x \t y \n z  ",      # mixed ws separators
        "",                      # no chunks
        None,                    # no chunks
        "émile café ß 東京 naïve",  # multi-byte UTF-8 tokens survive
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    expected = [
        (0, 0, 3, "a b c"),
        (0, 1, 3, "c d e"),
        (0, 2, 1, "e"),
        (1, 0, 3, "x y z"),
        (1, 1, 1, "z"),  # starts step S while start < n_tok (oracle rule)
        (4, 0, 3, "émile café ß"),
        (4, 1, 3, "ß 東京 naïve"),
        (4, 2, 1, "naïve"),
    ]
    for sub in (1 << 18, 8):
        out = (
            chunk_windows(
                ray.data.from_arrow(t), "doc_id", "text",
                window=3, stride=2, sub_batch_bytes=sub,
            )
            .to_pandas()
            .sort_values(["id", "chunk_idx"])
            .reset_index(drop=True)
        )
        got = list(map(tuple, out.itertuples(index=False)))
        assert got == expected, (sub, got)


class TestListRank:
    def _forest(self, nodes, parents, blocks=4):
        t = pa.table(
            {
                "node": pa.array(nodes, type=pa.int64()),
                "parent": pa.array(parents, type=pa.int64()),
            }
        )
        return ray.data.from_arrow(t).repartition(blocks)

    def test_long_chain_and_singleton(self, ray_session):
        from libpostal_ray.pipelines.graph import list_rank

        # one 1000-node chain (head 0) + a singleton (5000)
        n = 1000
        nodes = list(range(n)) + [5000]
        parents = [0] + list(range(n - 1)) + [5000]
        rng = np.random.default_rng(3)
        perm = rng.permutation(len(nodes))
        out = (
            list_rank(
                self._forest(
                    [nodes[i] for i in perm], [parents[i] for i in perm], 7
                )
            )
            .to_pandas()
            .set_index("node")
            .sort_index()
        )
        assert (out.loc[list(range(n)), "hops"].to_numpy() == np.arange(n)).all()
        assert (out.loc[list(range(n)), "head"] == 0).all()
        assert out.loc[5000, "hops"] == 0 and out.loc[5000, "head"] == 5000

    def test_multiple_chains(self, ray_session):
        from libpostal_ray.pipelines.graph import list_rank

        nodes = [10, 11, 12, 20, 21, 30]
        parents = [10, 10, 11, 20, 20, 30]
        out = (
            list_rank(self._forest(nodes, parents, 3))
            .to_pandas()
            .set_index("node")
            .sort_index()
        )
        assert list(out["hops"]) == [0, 1, 2, 0, 1, 0]
        assert list(out["head"]) == [10, 10, 10, 20, 20, 30]

    def test_missing_pointer_raises(self, ray_session):
        from libpostal_ray.pipelines.graph import list_rank

        with pytest.raises(Exception, match="missing node"):
            list_rank(self._forest([1, 2], [1, 99], 1)).to_pandas()

    def test_empty(self, ray_session):
        from libpostal_ray.pipelines.graph import list_rank

        out = list_rank(self._forest([], [], 1)).to_pandas()
        assert len(out) == 0


def test_tiered_dedup_planted(ray_session, tmp_path):
    """Each tier removes exactly its planted duplicates: 3 exact copies
    (tier 0 removes 2), a canonical twin pair (near tier removes 1), a
    >0.9-cosine embedding pair among survivors (semantic removes 1)."""
    from libpostal_ray.pipelines.prepare import tiered_dedup

    d = tmp_path / "sf_tiers"
    d.mkdir()
    base = " ".join(f"tok{i}" for i in range(40))
    other = " ".join(f"w{i}" for i in range(40))
    third = " ".join(f"z{i}" for i in range(40))
    texts = [base, base, base, other, other.upper(), third]
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), type=pa.int64()),
                "text": pa.array(texts, type=pa.string()),
                "lang": pa.array(["en"] * n),
                "source": pa.array(["s0"] * n),
                "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    rng = np.random.default_rng(17)
    vecs = rng.normal(size=(n, 16))
    vecs[5] = vecs[3] + rng.normal(scale=1e-3, size=16)  # cos(3,5) ~ 1
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), type=pa.int64()),
                "embedding": pa.array(
                    [v.astype(np.float32) for v in vecs],
                    type=pa.list_(pa.float32()),
                ),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    rep = tiered_dedup(str(d), sem_eps=0.9, sem_clusters=2).to_pandas()
    got = {r.tier: (r.n_in, r.n_removed, r.n_out) for r in rep.itertuples()}
    assert got["exact"] == (6, 2, 4)
    assert got["near"] == (4, 1, 3)
    assert got["semantic"] == (3, 1, 2)


def test_tiered_dedup_empty(ray_session, tmp_path):
    from libpostal_ray.pipelines.prepare import tiered_dedup

    src = "/root/testdata/sf0.001"
    d = tmp_path / "sf_tiers_empty"
    d.mkdir()
    for t in ("documents", "embeddings"):
        schema = pq.read_schema(f"{src}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    rep = tiered_dedup(str(d)).to_pandas()
    assert list(rep["n_in"]) == [0, 0, 0]
    assert list(rep["n_removed"]) == [0, 0, 0]


def test_list_rank_distributed_equals_local(ray_session):
    """local_max_nodes=0 forces the distributed rounds; outputs must be
    identical to the local crossover on the same forest."""
    from libpostal_ray.pipelines.graph import list_rank

    rng = np.random.default_rng(23)
    # several chains of varied length, shuffled
    nodes, parents = [], []
    nid = 0
    for ln in (1, 2, 5, 17, 64, 200):
        ids = list(range(nid, nid + ln))
        nodes += ids
        parents += [ids[0]] + ids[:-1]
        nid += ln + 3
    perm = rng.permutation(len(nodes))
    t = pa.table(
        {
            "node": pa.array([nodes[i] for i in perm], type=pa.int64()),
            "parent": pa.array([parents[i] for i in perm], type=pa.int64()),
        }
    )
    loc = (
        list_rank(ray.data.from_arrow(t).repartition(5))
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    dist = (
        list_rank(ray.data.from_arrow(t).repartition(5), local_max_nodes=0)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    import pandas as pd
    pd.testing.assert_frame_equal(loc, dist)
