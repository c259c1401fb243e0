"""Similarity search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast once via
``ray.put`` and each map_batches task scores its batch against it with one
float64 matmul (never re-shipped per batch, never a shuffle).

Scale path: LSH-bucketed variant — random-hyperplane signs bucket the corpus;
queries probe only their own bucket (and neighbors via multi-probe).  The
hyperplanes come from the config seed: deterministic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _emb_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(batch.num_rows, -1)


def brute_force_topk(
    embeddings: ray.data.Dataset,
    query_matrix: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
) -> ray.data.Dataset:
    """Top-k cosine neighbors of each query row over the embedding dataset.

    The query matrix is broadcast once (ray.put) and resolved per batch via
    a zero-copy plasma read — a PLAIN function, not an actor pool: passing
    an ObjectRef through fn_constructor_kwargs triggers Ray's actor-restart
    + unhashable-schema warnings (ray-project/ray#53727) with no benefit,
    since the 'state' is just a deserialized-from-plasma dict."""
    qm = np.asarray(query_matrix, dtype=np.float64)
    qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-30)
    ref = ray.put({"query_id": np.asarray(query_ids, dtype=np.int64), "matrix": qm})

    def score_batch(batch: pa.Table) -> pa.Table:
        q = ray.get(ref)
        qids, qmat = q["query_id"], q["matrix"]
        m = _emb_matrix(batch, "embedding")
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        scores = qmat @ m.T  # (q, n)
        kk = min(k, m.shape[0])
        idx = np.argpartition(-scores, kth=kk - 1, axis=1)[:, :kk]
        rows_q = np.repeat(qids, kk)
        rows_v = batch["vec_id"].to_numpy(zero_copy_only=False)[idx.reshape(-1)]
        rows_s = np.take_along_axis(scores, idx, axis=1).reshape(-1)
        return pa.table(
            {
                "query_id": pa.array(rows_q, type=pa.int64()),
                "vec_id": pa.array(rows_v, type=pa.int64()),
                "cos_sim": pa.array(rows_s, type=pa.float64()),
            }
        )

    scored = embeddings.map_batches(
        score_batch,
        batch_format="pyarrow",
        batch_size=4096,
        zero_copy_batch=True,
    )

    # merge batch-local top-k -> global top-k per query (tiny data from here)
    def merge(group: pa.Table) -> pa.Table:
        s = group["cos_sim"].to_numpy(zero_copy_only=False)
        # deterministic tie-break: score desc, then vec_id asc
        v = group["vec_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, -s))[:k]
        t = group.take(pa.array(order))
        return t.append_column(
            "rank", pa.array(np.arange(1, len(order) + 1, dtype=np.int64))
        )

    return scored.groupby("query_id").map_groups(merge, batch_format="pyarrow")


class HyperplaneLSHBucketer:
    """Scale path: sign(random hyperplane . x) bits -> bucket key per hash
    TABLE (L independent tables of `bits` hyperplanes each — the standard
    LSH recall lever; a true neighbor missed by one table's split is caught
    by another).  Table t's keys live in the disjoint range
    [t*2^bits, (t+1)*2^bits); the corpus row fans out to one row per table.
    Probing a table's bucket reduces the scored corpus by ~2^bits; seeds
    fixed."""

    def __init__(self, dim: int, bits: int = 8, seed: int = 0x5EED0001, tables: int = 1):
        rng = np.random.default_rng(seed)
        self.bits = bits
        self.tables = tables
        self.planes = rng.standard_normal((dim, bits * tables))

    def keys(self, m: np.ndarray) -> np.ndarray:
        """(n, tables) int64 bucket keys (table-offset ranges)."""
        signs = (m @ self.planes) > 0  # (n, bits*tables)
        out = np.empty((m.shape[0], self.tables), dtype=np.int64)
        for t in range(self.tables):
            key = np.zeros(m.shape[0], dtype=np.int64)
            for j in range(self.bits):
                key |= signs[:, t * self.bits + j].astype(np.int64) << j
            out[:, t] = key + (t << self.bits)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _emb_matrix(batch, "embedding")
        keys = self.keys(m)  # (n, tables)
        n = m.shape[0]
        idx = np.repeat(np.arange(n, dtype=np.int64), self.tables)
        out = batch.take(pa.array(idx))
        return out.append_column(
            "ann_bucket", pa.array(keys.reshape(-1), type=pa.int64())
        )


def bucketed_topk(
    embeddings: ray.data.Dataset,
    query_matrix: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    bits: int = 8,
    seed: int = 0x5EED0001,
    probes: int = 1,
    tables: int = 2,
) -> ray.data.Dataset:
    """IVF/LSH-style ANN: bucket corpus by hyperplane signs in ``tables``
    independent hash tables; each query scores against its bucket in EVERY
    table plus MULTI-PROBE neighbors (buckets within Hamming distance
    ``probes`` — the geohash+neighbors trick: near-boundary vectors land one
    sign flip away).  Bucket winners merge (vec_id-deduped) to a global
    per-query top-k.  Recall at bits=4, probes=1, tables=4 is measured
    0.945 vs brute force on the sf0.1 embeddings (tests/test_round2.py)."""
    dim = np.asarray(query_matrix).shape[1]
    bucketer = HyperplaneLSHBucketer(dim, bits=bits, seed=seed, tables=tables)
    # plain-function stage: the bucketer's state (a (d, bits*tables) plane
    # matrix) serializes in one piece with the task — no actor pool needed
    bucketed = embeddings.map_batches(
        HyperplaneLSHBucketer(dim, bits=bits, seed=seed, tables=tables),
        batch_format="pyarrow",
        batch_size=4096,
    )
    qm = np.asarray(query_matrix, dtype=np.float64)
    q_keys = bucketer.keys(qm)  # (q, tables)
    q_by_bucket: dict[int, list[int]] = {}
    for qi in range(q_keys.shape[0]):
        keys: set[int] = set()
        for t in range(tables):
            bk = int(q_keys[qi, t])
            keys.add(bk)
            if probes >= 1:
                for j in range(bits):
                    keys.add(bk ^ (1 << j))
            if probes >= 2:
                for j in range(bits):
                    for j2 in range(j + 1, bits):
                        keys.add(bk ^ (1 << j) ^ (1 << j2))
        for kk_ in keys:
            q_by_bucket.setdefault(kk_, []).append(qi)
    return _score_and_merge(bucketed, q_by_bucket, query_ids, qm, k)


def _score_and_merge(
    bucketed: ray.data.Dataset,
    q_by_bucket: dict[int, list[int]],
    query_ids: np.ndarray,
    qm: np.ndarray,
    k: int,
    matrix_fn=None,
) -> ray.data.Dataset:
    """Shared tail of every bucketed ANN plan (LSH, IVF, IVF-SQ8):
    per-bucket scoring of the queries probing it, then a global per-query
    merge with vec_id dedup and deterministic ranking.  ``matrix_fn``
    overrides how a bucket group decodes to a normalized (n, d) matrix
    (the SQ8 path reconstructs from int8 codes; default reads the float
    embedding column)."""
    ref = ray.put(
        {
            "q_by_bucket": q_by_bucket,
            "query_id": np.asarray(query_ids, dtype=np.int64),
            "matrix": qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-30),
            "k": k,
        }
    )

    def score_bucket(group: pa.Table) -> pa.Table:
        state = ray.get(ref)
        bucket = int(group["ann_bucket"][0].as_py())
        qidx = state["q_by_bucket"].get(bucket, [])
        if not qidx:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "cos_sim": pa.array([], type=pa.float64()),
                }
            )
        if matrix_fn is None:
            m = _emb_matrix(group, "embedding")
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        else:
            m = matrix_fn(group)
        qm_b = state["matrix"][qidx]
        scores = qm_b @ m.T
        vids = group["vec_id"].to_numpy(zero_copy_only=False)
        out_q, out_v, out_s = [], [], []
        kk = min(state["k"], m.shape[0])
        for row, qi in enumerate(qidx):
            order = np.lexsort((vids, -scores[row]))[:kk]
            out_q.extend([state["query_id"][qi]] * len(order))
            out_v.extend(vids[order])
            out_s.extend(scores[row][order])
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "cos_sim": pa.array(out_s, type=pa.float64()),
            }
        )

    scored = bucketed.groupby("ann_bucket").map_groups(
        score_bucket, batch_format="pyarrow"
    )

    # multi-probe: a query's winners come from several buckets — merge to a
    # global per-query top-k with deterministic ranking (dedup on vec_id:
    # the same vector can win in two probed buckets)
    def merge(group: pa.Table) -> pa.Table:
        s_ = group["cos_sim"].to_numpy(zero_copy_only=False)
        v_ = group["vec_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v_, -s_))
        v_o = v_[order]
        _, first_idx = np.unique(v_o, return_index=True)
        keep = np.zeros(order.shape[0], dtype=bool)
        keep[first_idx] = True
        order = order[np.flatnonzero(keep)][:k]
        t = group.take(pa.array(order))
        return t.append_column(
            "rank", pa.array(np.arange(1, len(order) + 1, dtype=np.int64))
        )

    return scored.groupby("query_id").map_groups(merge, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# IVF ANN: distributed k-means coarse quantizer + centroid-bucketed search
# ---------------------------------------------------------------------------


_KMEANS_SCALE = 1 << 30  # per-row integerization scale (see partial())


def kmeans_fit(
    embeddings: ray.data.Dataset,
    k: int,
    iters: int = 8,
    seed: int = 0x5EED0001,
) -> np.ndarray:
    """Distributed Lloyd's k-means over an embedding Dataset (cosine/unit-
    sphere variant: vectors and centroids L2-normalized).

    Each iteration is ONE map_batches pass emitting per-batch partial sums
    (k x d) + counts — only k x d floats per batch leave the workers; the
    tiny combine runs on the driver and the new centroids broadcast via
    ray.put.  Deterministic: seeded init from the k lowest vec_id hashes.
    """
    # deterministic init: the k rows with smallest mix-hash of vec_id
    from libpostal_ray.functions.hashing import mix_fold_u64

    def init_partial(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        # mask to 63 bits BEFORE ordering: the driver re-selects by the
        # int64 view of _h, where unmasked hashes >= 2^63 would sort
        # negative-first and disagree with the uint64 worker order, making
        # seed choice depend on Ray block boundaries
        h = mix_fold_u64([ids], salt=0xC3A7) & np.uint64(0x7FFFFFFFFFFFFFFF)
        order = np.argsort(h, kind="stable")[:k]
        return batch.take(pa.array(order)).append_column(
            "_h", pa.array(h[order].astype(np.int64))
        )

    cand = pa.concat_tables(
        [
            b
            for b in embeddings.map_batches(init_partial, batch_format="pyarrow")
            .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
            if b.num_rows
        ]
    )
    order = np.argsort(cand["_h"].to_numpy(zero_copy_only=False), kind="stable")[:k]
    cents = _emb_matrix(cand.take(pa.array(order)), "embedding")
    cents = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-30)

    for _ in range(iters):
        ref = ray.put(cents)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(ref)
            m = _emb_matrix(batch, "embedding")
            m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            assign = np.argmax(m @ c.T, axis=1)
            # per-ROW integerized partials (unit vectors scaled by 2^30):
            # integer addition is associative, so the fit is bit-identical
            # under ANY block layout — float partial sums made c1 != c2
            # whenever Ray split the input differently (measured flake).
            # Bound: |sum per centroid| <= n_rows * 2^30 -> exact in int64
            # up to ~8.6e9 rows per centroid.
            mi = np.round(m * float(_KMEANS_SCALE)).astype(np.int64)
            sums = np.zeros((c.shape[0], m.shape[1]), dtype=np.int64)
            np.add.at(sums, assign, mi)
            counts = np.bincount(assign, minlength=c.shape[0]).astype(np.int64)
            return pa.table(
                {
                    "cid": pa.array(np.arange(c.shape[0], dtype=np.int64)),
                    "vsum": pa.array(list(sums), type=pa.list_(pa.int64())),
                    "cnt": pa.array(counts),
                }
            )

        parts = pa.concat_tables(
            [
                b
                for b in embeddings.map_batches(partial, batch_format="pyarrow")
                .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
                if b.num_rows
            ]
        )
        cid = parts["cid"].to_numpy(zero_copy_only=False)
        cnt = parts["cnt"].to_numpy(zero_copy_only=False)
        vs = np.array(parts["vsum"].to_pylist(), dtype=np.int64)
        isums = np.zeros((cents.shape[0], cents.shape[1]), dtype=np.int64)
        np.add.at(isums, cid, vs)
        sums = isums.astype(np.float64) / float(_KMEANS_SCALE)
        counts = np.zeros(cents.shape[0], dtype=np.int64)
        np.add.at(counts, cid, cnt)
        nonzero = counts > 0
        new_c = cents.copy()
        new_c[nonzero] = sums[nonzero] / counts[nonzero, None]
        new_c = new_c / np.maximum(np.linalg.norm(new_c, axis=1, keepdims=True), 1e-30)
        if np.allclose(new_c, cents, atol=1e-9):
            cents = new_c
            break
        cents = new_c
    return cents


def ivf_topk(
    embeddings: ray.data.Dataset,
    query_matrix: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 8,
    seed: int = 0x5EED0001,
) -> ray.data.Dataset:
    """IVF ANN: k-means coarse quantizer buckets the corpus by nearest
    centroid; each query scores only its ``nprobe`` nearest centroid
    buckets.  The learned-partition alternative to hyperplane LSH — tighter
    buckets on clustered data at the cost of the k-means fit."""
    cents = kmeans_fit(embeddings, n_centroids, iters=iters, seed=seed)
    ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _emb_matrix(batch, "embedding")
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        a = np.argmax(m @ c.T, axis=1).astype(np.int64)
        return batch.append_column("ann_bucket", pa.array(a, type=pa.int64()))

    bucketed = embeddings.map_batches(assign, batch_format="pyarrow", batch_size=4096)
    qm = np.asarray(query_matrix, dtype=np.float64)
    qn = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-30)
    q_scores = qn @ cents.T  # (q, n_centroids)
    probes = np.argsort(-q_scores, axis=1, kind="stable")[:, :nprobe]
    q_by_bucket: dict[int, list[int]] = {}
    for qi in range(probes.shape[0]):
        for c in probes[qi]:
            q_by_bucket.setdefault(int(c), []).append(qi)
    return _score_and_merge(bucketed, q_by_bucket, query_ids, qm, k)


def ivf_sq8_topk(
    embeddings: ray.data.Dataset,
    query_matrix: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 8,
    seed: int = 0x5EED0001,
) -> ray.data.Dataset:
    """IVF with an SQ8-compressed index — the MEMORY scale path: the
    bucketed index carries 1 byte/dim (int8 codes + one float scale per
    vector) instead of 4, and the original float embeddings are DROPPED
    before the probe.  Scoring reconstructs each bucket's matrix from
    codes (approximate by design — recall bound tested vs brute force).
    At 100 TB the index for a 768-d corpus shrinks ~4x, which is the
    difference between an in-object-store index and a spilled one."""
    cents = kmeans_fit(embeddings, n_centroids, iters=iters, seed=seed)
    ref = ray.put(cents)
    dim = cents.shape[1] if cents.size else 0

    def assign_quantize(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        m = _emb_matrix(batch, "embedding")
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        a = np.argmax(mn @ c.T, axis=1).astype(np.int64)
        scale = np.maximum(np.abs(m).max(axis=1), 1e-30)
        codes = np.floor(m / scale[:, None] * 127.0).astype(np.int8)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "ann_bucket": pa.array(a),
                "codes": pa.array(
                    [codes[i].tobytes() for i in range(codes.shape[0])],
                    type=pa.binary(),
                ),
                "scale": pa.array(scale, type=pa.float64()),
            }
        )

    bucketed = embeddings.map_batches(
        assign_quantize, batch_format="pyarrow", batch_size=4096
    )

    def decode(group: pa.Table) -> np.ndarray:
        raw = b"".join(group["codes"].to_pylist())
        codes = np.frombuffer(raw, dtype=np.int8).reshape(group.num_rows, dim)
        scale = group["scale"].to_numpy(zero_copy_only=False)
        m = codes.astype(np.float64) * (scale[:, None] / 127.0)
        return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)

    qm = np.asarray(query_matrix, dtype=np.float64)
    qn = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-30)
    q_scores = qn @ cents.T
    probes = np.argsort(-q_scores, axis=1, kind="stable")[:, :nprobe]
    q_by_bucket: dict[int, list[int]] = {}
    for qi in range(probes.shape[0]):
        for c in probes[qi]:
            q_by_bucket.setdefault(int(c), []).append(qi)
    return _score_and_merge(
        bucketed, q_by_bucket, query_ids, qm, k, matrix_fn=decode
    )


# ---------------------------------------------------------------------------
# bucketed embedding near-dup PAIRS (the scale path for embedding_dups)
# ---------------------------------------------------------------------------

DUP_PAIR_SCHEMA = pa.schema(
    [
        ("vec_a", pa.int64()),
        ("vec_b", pa.int64()),
        ("cos_sim", pa.float64()),
    ]
)


@ray.remote
def _dedup_dup_pairs_task(*blocks) -> pa.Table:
    """(vec_a, vec_b) dedup across hash tables — cos_sim is a per-pair
    invariant, so any duplicate row's value is the value."""
    parts = [
        b for b in blocks if b.num_rows > 0 and "vec_a" in b.column_names
    ]
    if not parts:
        return DUP_PAIR_SCHEMA.empty_table()
    t = pa.concat_tables(parts)
    a = t["vec_a"].to_numpy(zero_copy_only=False)
    b = t["vec_b"].to_numpy(zero_copy_only=False)
    s = t["cos_sim"].to_numpy(zero_copy_only=False)
    order = np.lexsort((b, a))
    a, b, s = a[order], b[order], s[order]
    keep = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
    return pa.table(
        {
            "vec_a": pa.array(a[keep], type=pa.int64()),
            "vec_b": pa.array(b[keep], type=pa.int64()),
            "cos_sim": pa.array(s[keep], type=pa.float64()),
        },
        schema=DUP_PAIR_SCHEMA,
    )


class _BucketPairEmit:
    """map_groups callable over a PARTITION of LSH buckets
    (ann_bucket % P): per bucket, all-pairs cosine over the bucket's members
    with a threshold filter.  Hot buckets are chunked deterministically
    (hash order) into groups of <= bucket_cap with all-pairs inside — the
    same connectivity-for-work trade as the MinHash salted buckets; at the
    near-dup thresholds this path targets (cos >= ~0.8) true pairs collide
    in several of the L tables, so a chunk split in one table is rescued by
    another."""

    def __init__(self, threshold: float, bucket_cap: int = 4096):
        self.threshold = threshold
        self.bucket_cap = bucket_cap

    def __call__(self, group: pa.Table) -> pa.Table:
        from libpostal_ray.functions.hashing import mix_fold_u64

        n = group.num_rows
        if n < 2:
            return DUP_PAIR_SCHEMA.empty_table()
        bks = group["ann_bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = group["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, bks))
        bks_s, ids_s = bks[order], ids[order]
        m = _emb_matrix(group.take(pa.array(order)), "embedding")
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        starts = np.flatnonzero(np.concatenate(([True], bks_s[1:] != bks_s[:-1])))
        ends = np.concatenate((starts[1:], [n]))
        out_a, out_b, out_s = [], [], []
        for st, en in zip(starts, ends):
            sz = int(en - st)
            if sz < 2:
                continue
            rows = np.arange(st, en)
            if sz > self.bucket_cap:
                # deterministic hash-order chunking of a hot bucket
                h = mix_fold_u64(
                    [ids_s[rows].astype(np.uint64)], salt=int(bks_s[st])
                )
                rows = rows[np.lexsort((ids_s[rows], h))]
            for cs in range(0, sz, self.bucket_cap):
                chunk = rows[cs : cs + self.bucket_cap]
                cm = chunk.shape[0]
                if cm < 2:
                    continue
                scores = m[chunk] @ m[chunk].T
                li, ri = np.nonzero(np.triu(scores >= self.threshold, k=1))
                if li.size == 0:
                    continue
                ga, gb = ids_s[chunk[li]], ids_s[chunk[ri]]
                lo = np.minimum(ga, gb)
                hi = np.maximum(ga, gb)
                out_a.append(lo)
                out_b.append(hi)
                out_s.append(scores[li, ri])
        if not out_a:
            return DUP_PAIR_SCHEMA.empty_table()
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        s = np.concatenate(out_s)
        # local pair dedup (same pair via two buckets of this partition)
        order2 = np.lexsort((b, a))
        a, b, s = a[order2], b[order2], s[order2]
        keep = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
        return pa.table(
            {
                "vec_a": pa.array(a[keep], type=pa.int64()),
                "vec_b": pa.array(b[keep], type=pa.int64()),
                "cos_sim": pa.array(s[keep], type=pa.float64()),
            },
            schema=DUP_PAIR_SCHEMA,
        )


# hybrid crossover for the cross-table pair dedup (same rationale as
# near_dupe.PAIR_DEDUP_LOCAL_MAX: one vectorized task beats a distributed
# aggregate by ~10x below this row count)
DUP_PAIR_DEDUP_LOCAL_MAX = 50_000_000


def embedding_dup_pairs(
    embeddings: ray.data.Dataset,
    threshold: float,
    dim: int,
    bits: int | None = None,
    tables: int = 8,
    seed: int = 0x5EED0001,
    partitions: int = 64,
    bucket_cap: int = 4096,
    round_to: int | None = 4,
) -> ray.data.Dataset:
    """Embedding near-dup pairs WITHOUT the all-pairs matmul: hyperplane-LSH
    buckets (L independent tables) + per-bucket all-pairs + cross-table pair
    dedup.  Work is O(N * bucket_size * tables), never O(N^2); no stage
    holds more than one bucket partition.

    APPROXIMATE by design: a pair at cosine c collides in one table with
    probability (1 - acos(c)/pi)^bits; across L tables the miss rate is
    (1 - p^bits)^L.  At the near-dup operating point (c >= 0.8, bits=8,
    tables=8) recall is ~0.97; recall decays for low thresholds — use the
    brute path (pipelines/queries.embedding_dups below its size threshold)
    when exact low-threshold output is required.

    ``bits=None`` auto-scales to the corpus: bits = log2(N / 512) clipped to
    [6, 16], keeping expected bucket size ~512 so per-bucket all-pairs work
    stays O(N * 512 * tables) as N grows (add tables to recover recall)."""
    if bits is None:
        n_total = embeddings.count()
        bits = int(np.clip(np.ceil(np.log2(max(2.0, n_total / 512.0))), 6, 16))
    bucketed = embeddings.map_batches(
        HyperplaneLSHBucketer(dim, bits=bits, seed=seed, tables=tables),
        batch_format="pyarrow",
        batch_size=4096,
    )
    P = partitions

    def add_part(batch: pa.Table) -> pa.Table:
        bk = batch["ann_bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("part", pa.array(bk % P, type=pa.int64()))

    emit = _BucketPairEmit(threshold, bucket_cap=bucket_cap)

    def emit_partition(group: pa.Table) -> pa.Table:
        out = emit(group)
        if round_to is not None and out.num_rows:
            s = np.round(out["cos_sim"].to_numpy(zero_copy_only=False), round_to)
            out = out.set_column(
                out.column_names.index("cos_sim"),
                "cos_sim",
                pa.array(s, type=pa.float64()),
            )
        return out

    raw = (
        bucketed.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(emit_partition, batch_format="pyarrow")
        .materialize()
    )
    n = raw.count()
    if n == 0:
        return ray.data.from_arrow(DUP_PAIR_SCHEMA.empty_table())
    if n <= DUP_PAIR_DEDUP_LOCAL_MAX:
        return ray.data.from_arrow(
            ray.get(_dedup_dup_pairs_task.remote(*raw.to_arrow_refs()))
        )
    from ray.data.aggregate import Max

    return raw.groupby(["vec_a", "vec_b"]).aggregate(
        Max("cos_sim", alias_name="cos_sim")
    )
