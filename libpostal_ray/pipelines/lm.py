"""Character n-gram language-model perplexity — the CCNet-style quality
signal (Wenzek et al. 2020: filter a crawled corpus by LM perplexity;
low-perplexity text is "normal" language, high is gibberish/boilerplate).

The reference's analog is its per-language dictionary + frequency
resources (resources/dictionaries, address_parser training counts): a
corpus-level frequency model applied per record.  Here the model is a
byte-trigram conditional LM trained ON the corpus itself in one
distributed pass — no external model files exist in this environment.

Model:  p(c3 | c1 c2) = (count(c1c2c3) + a) / (count(c1c2) + a*256)
        (add-a smoothing over the byte alphabet)
Score:  bits_per_char(doc) = mean over positions of -log2 p — exactly
        the quantity CCNet thresholds on (they use a Wikipedia-trained
        KenLM; same math, different training corpus).

Physical plan:

  TRAIN — per batch: ONE vectorized rolling pass over the concatenated
  value buffer (row-crossing windows masked out, the signature-stage
  trick) -> np.unique partial counts for trigram AND bigram keys (keys
  are the raw bytes packed into an int64, <= 2^24, non-negative) ->
  key%P exchange -> per-partition sum.  Exchange volume is bounded by
  the VOCABULARY (distinct grams <= 256^3), not the corpus.  The counts
  gather off-driver into four sorted arrays and broadcast once.

  SCORE — stateless map_batches: rolling keys -> searchsorted into the
  broadcast arrays -> vectorized log2 -> per-doc mean via reduceat.
  Each doc's sum is computed alone in its own contiguous slice, so the
  result is independent of Ray block layout (the engine's determinism
  rule: never let float reduction order depend on blocking).

At 100 TB: training is a bounded-vocabulary aggregate (the model is a
few MB); scoring is embarrassingly parallel with the model read once
per worker from the object store.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

LM_PARTITIONS = 32
ALPHABET = 256


def _doc_byte_views(col: pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint8 buffer, int64 offsets) over all rows of a string column."""
    # concat_arrays compacts (offset rebased to 0, data buffer trimmed) —
    # required for SLICED inputs whose absolute offsets would otherwise
    # index bytes before the slice in the rolling-window scan below.
    arr = pa.concat_arrays(
        [c.cast(pa.large_string()) for c in col.chunks]
        if isinstance(col, pa.ChunkedArray)
        else [col.cast(pa.large_string())]
    )
    n = len(arr)
    buf = arr.buffers()
    off = np.frombuffer(buf[1], dtype=np.int64, count=n + 1, offset=arr.offset * 8)
    data = (
        np.frombuffer(buf[2], dtype=np.uint8)
        if buf[2] is not None
        else np.zeros(0, np.uint8)
    )
    return data, off


def _gram_keys(data: np.ndarray, off: np.ndarray, order: int) -> np.ndarray:
    """int64 keys of every in-row ``order``-gram (windows crossing row
    boundaries removed), concatenated in row order.

    Cache-blocked over ~128 KB doc ranges: the window-key build makes
    ~90 B of temporaries per content byte, and whole-batch temporaries
    collapse 15-25x under 32-way parallelism on this DRAM-limited host
    (CLAUDE.md).  Chunk edges sit on doc boundaries, so the concatenated
    output is byte-identical to the whole-batch version."""
    nrows = off.shape[0] - 1
    if data.shape[0] < order:
        return np.empty(0, dtype=np.int64)
    chunk = 128 * 1024
    parts: list[np.ndarray] = []
    lo = 0
    while lo < nrows:
        hi = int(np.searchsorted(off, off[lo] + chunk, side="left"))
        hi = min(max(hi, lo + 1), nrows)
        d = data[off[lo] : off[hi]]
        seg = off[lo : hi + 1] - off[lo]
        n = d.shape[0]
        if n >= order:
            m = n - order + 1
            k = np.zeros(m, dtype=np.int64)
            for j in range(order):
                k = (k << 8) | d[j : j + m].astype(np.int64)
            # a window starting at position p belongs to row r iff
            # p + order <= seg[r+1]; row starts are seg[:-1]
            pos = np.arange(m, dtype=np.int64)
            row = np.searchsorted(seg, pos, side="right") - 1
            valid = pos + order <= seg[row + 1]
            parts.append(k[valid])
        lo = hi
    if not parts:
        return np.empty(0, dtype=np.int64)
    return parts[0] if len(parts) == 1 else np.concatenate(parts)


def train_char_lm(
    ds: ray.data.Dataset,
    text_col: str = "text",
    *,
    partitions: int = LM_PARTITIONS,
) -> "ray.ObjectRef":
    """One distributed counting pass -> broadcast model ref:
    (tri_keys, tri_counts, bi_keys, bi_counts), each sorted by key."""

    def partial(batch: pa.Table) -> pa.Table:
        data, off = _doc_byte_views(batch[text_col])
        out_kind: list[np.ndarray] = []
        out_key: list[np.ndarray] = []
        out_cnt: list[np.ndarray] = []
        for kind, order in ((0, 3), (1, 2)):
            keys = _gram_keys(data, off, order)
            u, c = np.unique(keys, return_counts=True)
            out_kind.append(np.full(u.shape[0], kind, dtype=np.int64))
            out_key.append(u)
            out_cnt.append(c.astype(np.int64))
        kind = np.concatenate(out_kind)
        key = np.concatenate(out_key)
        return pa.table(
            {
                "kind": pa.array(kind),
                "key": pa.array(key),
                "cnt": pa.array(np.concatenate(out_cnt)),
                "part": pa.array(key % partitions),
            }
        )

    def reduce_counts(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "kind": pa.nulls(0, pa.int64()),
                "key": pa.nulls(0, pa.int64()),
                "cnt": pa.nulls(0, pa.int64()),
            }
        )
        if group.num_rows == 0 or "kind" not in group.column_names:
            return empty
        kind = group["kind"].to_numpy(zero_copy_only=False)
        key = group["key"].to_numpy(zero_copy_only=False)
        cnt = group["cnt"].to_numpy(zero_copy_only=False)
        ck = np.stack((kind, key), axis=1)
        u, inv = np.unique(ck, axis=0, return_inverse=True)
        tot = np.zeros(u.shape[0], dtype=np.int64)
        np.add.at(tot, inv, cnt)
        return pa.table(
            {
                "kind": pa.array(u[:, 0]),
                "key": pa.array(u[:, 1]),
                "cnt": pa.array(tot),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(reduce_counts, batch_format="pyarrow")
    )

    @ray.remote
    def gather(*blocks: pa.Table):
        kinds, keys, cnts = [], [], []
        for b in blocks:
            if b.num_rows == 0 or "kind" not in b.column_names:
                continue
            kinds.append(b.column("kind").to_numpy(zero_copy_only=False))
            keys.append(b.column("key").to_numpy(zero_copy_only=False))
            cnts.append(b.column("cnt").to_numpy(zero_copy_only=False))
        if not kinds:
            z = np.empty(0, dtype=np.int64)
            return z, z, z, z
        kind = np.concatenate(kinds)
        key = np.concatenate(keys)
        cnt = np.concatenate(cnts)
        out = []
        for k in (0, 1):
            m = kind == k
            o = np.argsort(key[m], kind="stable")
            out.extend((key[m][o], cnt[m][o]))
        return tuple(out)

    return gather.remote(*counts.materialize().to_arrow_refs())


def _lookup(sorted_keys: np.ndarray, counts: np.ndarray, q: np.ndarray) -> np.ndarray:
    """counts[key] for each q, 0 where absent."""
    if sorted_keys.shape[0] == 0:
        return np.zeros(q.shape[0], dtype=np.int64)
    pos = np.searchsorted(sorted_keys, q)
    posc = np.clip(pos, 0, sorted_keys.shape[0] - 1)
    hit = (pos < sorted_keys.shape[0]) & (sorted_keys[posc] == q)
    return np.where(hit, counts[posc], 0)


def bits_per_char_column(
    col: pa.ChunkedArray | pa.Array,
    model,
    *,
    alpha: float = 0.5,
    nrows: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(n_trigrams, bits_per_char) per row of a string column against an
    already-fetched model tuple.  Rows shorter than 3 bytes score -1 (no
    trigram evidence).  The shared scoring kernel for perplexity_scores
    and the prepare-pipeline LM gate."""
    tri_k, tri_c, bi_k, bi_c = model
    data, off = _doc_byte_views(col)
    nrows = len(col) if nrows is None else nrows
    n_tri = np.zeros(nrows, dtype=np.int64)
    sums = np.zeros(nrows, dtype=np.float64)
    # cache-block by DOC ranges (~128 KB of content per sub-batch): the
    # whole-batch version manufactures ~100 B of temporaries per content
    # byte (tri/pos/row/two float64 lookups/bits), which collapses under
    # 32-way parallelism on this DRAM-limited host (CLAUDE.md).  Chunk
    # boundaries sit ON doc boundaries, so each row's float sum adds in
    # the identical order as before — results are bit-equal.
    chunk = 128 * 1024
    lo = 0
    while lo < nrows:
        hi = int(np.searchsorted(off, off[lo] + chunk, side="left"))
        hi = min(max(hi, lo + 1), nrows)
        d = data[off[lo] : off[hi]]
        seg = off[lo : hi + 1] - off[lo]
        n = d.shape[0]
        if n >= 3:
            m = n - 3 + 1
            tri = np.zeros(m, dtype=np.int64)
            for j in range(3):
                tri = (tri << 8) | d[j : j + m].astype(np.int64)
            pos = np.arange(m, dtype=np.int64)
            row = np.searchsorted(seg, pos, side="right") - 1
            valid = pos + 3 <= seg[row + 1]
            tri_v = tri[valid]
            row_v = row[valid]
            c3 = _lookup(tri_k, tri_c, tri_v).astype(np.float64)
            c2 = _lookup(bi_k, bi_c, tri_v >> 8).astype(np.float64)
            bits = -np.log2((c3 + alpha) / (c2 + alpha * ALPHABET))
            n_tri[lo:hi] = np.bincount(row_v, minlength=hi - lo)
            sums[lo:hi] = np.bincount(row_v, weights=bits, minlength=hi - lo)
        lo = hi
    bpc = np.where(n_tri > 0, sums / np.maximum(n_tri, 1), -1.0)
    return n_tri, bpc


def perplexity_scores(
    ds: ray.data.Dataset,
    model_ref: "ray.ObjectRef",
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> ray.data.Dataset:
    """(doc_id, n_trigrams, bits_per_char) per doc.  Docs shorter than
    3 bytes score bits_per_char = -1 (no trigram evidence)."""

    def score(batch: pa.Table) -> pa.Table:
        model = ray.get(model_ref)
        n_tri, bpc = bits_per_char_column(
            batch[text_col], model, alpha=alpha, nrows=batch.num_rows
        )
        return pa.table(
            {
                "doc_id": pa.array(
                    batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "n_trigrams": pa.array(n_tri),
                "bits_per_char": pa.array(bpc, type=pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")
