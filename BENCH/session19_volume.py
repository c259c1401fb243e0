"""Round-5 volume proofs (verdict directives #8 and #9):

* #8 — the exact AllPairs set-similarity threshold self-join
  (pipelines/simjoin.similarity_join_pairs) at 1M documents with the
  ``df_cap`` stop-shingle pruning ACTIVE, pinned by PAIR-SET EQUALITY
  against DuckDB running the identical capped semantics over the same
  parquet (intersections over grams with document frequency <= cap,
  set sizes over ALL grams — the operator's documented contract).
  The corpus plants near-dup families (2-5 members, 1-2 word edits)
  above the 1/5 Jaccard threshold, word-salad background below it, and
  a 4-word boilerplate phrase in every 20th doc whose posting lists
  blow past the cap — the exact skew df_cap exists to prune.

* #9 — the expectations/validation gate (profile.corpus_expectations)
  over a 4M-row corpus with a PLANTED violation set: duplicate ids,
  null/empty content, empty lang/path.  The gate's per-rule violation
  counts must equal the planted counts EXACTLY (uniqueness violations
  ride the doc_id%P exchange; everything else folds per batch).

Exactness is the claim; walls are printed for the record.

Usage: python BENCH/session19_volume.py [n_docs] [n_expect]
"""

import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
N_EXP = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
DIR = "/tmp/s19_volume"
K = 4                 # word-shingle width
THR = (1, 5)          # Jaccard threshold num/den
DF_CAP = 1000         # posting lists above this are pruned (both sides)
WORDS = 24            # words per doc
VOCAB = np.array([f"w{i:02d}" for i in range(64)])

GOLD = np.uint64(0x9E3779B97F4A7C15)


def _mix(z: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = (z + GOLD) * np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27)
        z *= np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def gen_simjoin() -> str:
    path = os.path.join(DIR, "docs.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(DIR, exist_ok=True)
    ids = np.arange(N, dtype=np.int64)
    # base word-index matrix: splitmix over (doc_id, position)
    flat = _mix(
        (ids[:, None] * np.int64(WORDS) + np.arange(WORDS)[None, :]).astype(
            np.uint64
        )
    )
    M = (flat % np.uint64(VOCAB.shape[0])).astype(np.int64)
    # near-dup families: every 50th doc is a base; family size 2-5;
    # members copy the base row with 1-2 deterministic substitutions
    base50 = (ids // 50) * 50
    size = 2 + ((base50 // 50) % 4)           # 2..5 per family
    member = (ids - base50) < size
    j = ids - base50                           # member index within family
    is_mut = member & (j > 0)
    M[member] = M[base50[member]]
    rows = np.nonzero(is_mut)[0]
    p1 = (rows * 7) % WORDS
    p2 = (rows * 11) % WORDS
    M[rows, p1] = (rows % VOCAB.shape[0])
    M[rows[rows % 2 == 0], p2[rows % 2 == 0]] = (
        (rows[rows % 2 == 0] * 3) % VOCAB.shape[0]
    )
    # boilerplate skew: every 20th doc carries the phrase w00 w01 w02 w03
    hot = ids % 20 == 0
    M[hot, 10:14] = [0, 1, 2, 3]
    words = VOCAB[M]
    texts = [" ".join(row) for row in words]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "text": pa.array(texts, type=pa.large_string()),
            }
        ),
        path,
        row_group_size=65536,
    )
    return path


def check_simjoin(con) -> None:
    import ray
    import ray.data

    from libpostal_ray.pipelines.simjoin import similarity_join_pairs

    path = gen_simjoin()
    t0 = time.time()
    docs = ray.data.read_parquet(path, columns=["doc_id", "text"])
    got = (
        similarity_join_pairs(
            docs,
            threshold_num=THR[0],
            threshold_den=THR[1],
            shingle_k=K,
            df_cap=DF_CAP,
        )
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    rw = time.time() - t0

    t0 = time.time()
    want = con.sql(
        f"""
        WITH toks AS (
            SELECT doc_id, string_split(trim(text), ' ') AS tk
            FROM read_parquet('{path}')
        ),
        pos AS (
            SELECT doc_id, tk, unnest(range(1, len(tk) - {K - 2})) AS i
            FROM toks
        ),
        sh AS (
            SELECT DISTINCT doc_id,
                   tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                         || ' ' || tk[i+3] AS g
            FROM pos
        ),
        capped AS (
            SELECT g FROM sh GROUP BY g
            HAVING count(*) BETWEEN 2 AND {DF_CAP}
        ),
        shc AS (SELECT sh.doc_id, sh.g FROM sh JOIN capped USING (g)),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS s
            FROM shc a JOIN shc b ON a.g = b.g AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT i.da AS doc_a, i.db AS doc_b, i.s AS n_shared,
               sa.n AS n_a, sb.n AS n_b,
               i.s * 1.0 / (sa.n + sb.n - i.s) AS jacc
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.da
        JOIN sizes sb ON sb.doc_id = i.db
        WHERE {THR[0] + THR[1]} * i.s >= {THR[0]} * (sa.n + sb.n)
        ORDER BY doc_a, doc_b
        """
    ).df().reset_index(drop=True)
    dw = time.time() - t0

    assert len(got) == len(want), (len(got), len(want))
    for c in ("doc_a", "doc_b", "n_shared", "n_a", "n_b"):
        assert (
            got[c].to_numpy().astype(np.int64)
            == want[c].to_numpy().astype(np.int64)
        ).all(), c
    assert np.allclose(got["jacc"], want["jacc"], rtol=0, atol=0), "jacc"
    n_fam = int((got["jacc"] >= 0.2).sum())
    print(
        f"similar_doc_pairs@{N}: {len(got)} pairs (all >= 1/5 jacc, "
        f"{n_fam} total) EXACT vs DuckDB with df_cap={DF_CAP} active "
        f"(ray {rw:.1f} s, duckdb {dw:.1f} s)"
    )


PLANT = {
    "dup_ids": 137,
    "null_content": 59,
    "empty_content": 83,
    "empty_lang": 23,
    "empty_path": 41,
}


def gen_expect() -> str:
    path = os.path.join(DIR, "expect.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(DIR, exist_ok=True)
    assert N_EXP >= 10_000, "expectations corpus too small for the plant"
    ids = np.arange(N_EXP, dtype=np.int64)
    # violations plant into DISJOINT row ranges (exact counts add up)
    o = N_EXP // 5
    dup = PLANT["dup_ids"]
    ids[o : o + dup] = ids[:dup]  # duplicated ids
    content = np.array(
        [f"doc body {i} lorem ipsum" for i in range(N_EXP)], dtype=object
    )
    content[2 * o : 2 * o + PLANT["null_content"]] = None
    content[2 * o + 500 : 2 * o + 500 + PLANT["empty_content"]] = ""
    lang = np.full(N_EXP, "en", dtype=object)
    lang[3 * o : 3 * o + PLANT["empty_lang"]] = ""
    pathc = np.array([f"repo/a/{i}.py" for i in range(N_EXP)], dtype=object)
    pathc[4 * o : 4 * o + PLANT["empty_path"]] = ""
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "content": pa.array(content, type=pa.large_string()),
                "lang": pa.array(lang, type=pa.string()),
                "path": pa.array(pathc, type=pa.string()),
            }
        ),
        path,
        row_group_size=131072,
    )
    return path


def check_expectations() -> None:
    import ray.data

    from libpostal_ray.pipelines.profile import corpus_expectations

    path = gen_expect()
    t0 = time.time()
    ds = ray.data.read_parquet(path)
    got = corpus_expectations(ds).to_pandas()
    wall = time.time() - t0
    vmap = dict(zip(got["rule"], got["n_violations"]))
    expect = {
        "doc_id_unique": PLANT["dup_ids"],
        "content_nonnull": PLANT["null_content"],
        "content_nonempty": PLANT["null_content"] + PLANT["empty_content"],
        "lang_nonempty": PLANT["empty_lang"],
        "path_nonempty": PLANT["empty_path"],
    }
    for rule, want in expect.items():
        assert vmap.get(rule) == want, (rule, vmap.get(rule), want)
    print(
        f"corpus_expectations@{N_EXP}: planted violation set recovered "
        f"EXACTLY {expect} ({wall:.1f} s)"
    )


def check_betweenness() -> None:
    """1M-node betweenness (64-source sample): the DISTRIBUTED plan
    (broadcast CSR + source-fan-out + off-driver gather) must equal a
    single-process accumulation of the same per-source sweeps over the
    same CSR — this pins the distributed plumbing; the kernel itself is
    pinned vs the textbook Brandes reference in tests/test_betweenness.py
    (the two-step argument the repo's '3 plans identical' checks use)."""
    import ray
    import ray.data

    from libpostal_ray.pipelines.graph import (
        _brandes_dependencies,
        _csr,
        betweenness,
    )

    n = N  # reuse the harness size (default 1M)
    ids = np.arange(1, n + 1, dtype=np.int64)
    # the session-16/18 deterministic doc-graph shape: skip shortcuts
    # + a data-derived extra edge per node (~3 edges/node)
    u1, v1 = ids[ids * 2 <= n], ids[ids * 2 <= n] * 2
    u2, v2 = ids[ids * 2 + 1 <= n], ids[ids * 2 + 1 <= n] * 2 + 1
    extra = ids + 2 + (_mix(ids.astype(np.uint64)) % np.uint64(64)).astype(
        np.int64
    )
    m3 = extra <= n
    u = np.concatenate((u1, u2, ids[m3]))
    v = np.concatenate((v1, v2, extra[m3]))
    edges = ray.data.from_arrow(
        pa.table({"u": pa.array(u), "v": pa.array(v)})
    ).repartition(32)

    t0 = time.time()
    got = betweenness(edges, n_sources=64).to_pandas().sort_values("doc_id")
    rw = time.time() - t0

    t0 = time.time()
    nodes = np.unique(np.concatenate((u, v)))
    ui = np.searchsorted(nodes, u)
    vi = np.searchsorted(nodes, v)
    nbrs_s, starts, stops = _csr(
        np.arange(nodes.shape[0], dtype=np.int64), ui, vi
    )
    order = np.argsort(
        (nodes * np.int64(48271)) % np.int64(2147483647), kind="stable"
    )
    srcs = np.sort(np.arange(nodes.shape[0], dtype=np.int64)[order[:64]])
    acc = np.zeros(nodes.shape[0], dtype=np.float64)
    for s in srcs:
        acc += _brandes_dependencies(nbrs_s, starts, stops, int(s))
    acc /= 2.0
    sw = time.time() - t0

    gotv = got.betweenness.to_numpy()
    assert got.doc_id.to_numpy().tolist() == nodes.tolist()
    assert np.allclose(gotv, acc, rtol=1e-12, atol=1e-9), (
        np.abs(gotv - acc).max()
    )
    print(
        f"doc_graph_betweenness@{nodes.shape[0]} nodes / {u.shape[0]} edges: "
        f"64-source scores match single-process accumulation to 1e-12 "
        f"(ray {rw:.1f} s, single {sw:.1f} s)"
    )


def main():
    import duckdb
    import ray

    ray.init(
        address="local",
        num_cpus=32,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    con = duckdb.connect()
    con.sql("SET threads TO 32")
    check_simjoin(con)
    check_expectations()
    check_betweenness()
    ray.shutdown()


if __name__ == "__main__":
    main()
