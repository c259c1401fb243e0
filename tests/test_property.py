"""Hypothesis property tests for the pure kernels behind the temporal
joins and the quantile sketch — brute-force reference semantics on random
inputs.  Ray-free: the composite-rank lookup logic is exercised directly
(the Ray plumbing around it is covered by the plan-equivalence tests in
test_relational.py)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

keys = st.integers(min_value=0, max_value=6)
tss = st.integers(min_value=-1000, max_value=1000)


def _asof_composite(lk, lt, rk, rt, rtb):
    """The broadcast-plan kernel, extracted: for each (lk, lt) the right
    row with same key, greatest rt <= lt, max tie among equals; -1 else."""
    rk = np.asarray(rk, dtype=np.int64)
    rt = np.asarray(rt, dtype=np.int64)
    rtb = np.asarray(rtb, dtype=np.int64)
    lk = np.asarray(lk, dtype=np.int64)
    lt = np.asarray(lt, dtype=np.int64)
    if rk.shape[0] == 0:
        return np.full(lk.shape[0], -1, dtype=np.int64)
    order = np.lexsort((rtb, rt, rk))
    ks, ts_ = rk[order], rt[order]
    uk, ut = np.unique(ks), np.unique(ts_)
    span = np.int64(ut.shape[0] + 1)
    comp = (
        np.searchsorted(uk, ks).astype(np.int64) * span
        + np.searchsorted(ut, ts_, side="right").astype(np.int64)
    )
    kid = np.searchsorted(uk, lk)
    kidc = np.clip(kid, 0, uk.shape[0] - 1).astype(np.int64)
    key_ok = (kid < uk.shape[0]) & (uk[kidc] == lk)
    comp_l = kidc * span + np.searchsorted(ut, lt, side="right").astype(np.int64)
    pos = np.searchsorted(comp, comp_l, side="right") - 1
    matched = key_ok & (pos >= 0)
    if matched.any():
        matched[matched] &= (comp[pos[matched]] // span) == kidc[matched]
    out = np.full(lk.shape[0], -1, dtype=np.int64)
    out[matched] = order[pos[matched]]
    return out


@settings(max_examples=200, deadline=None)
@given(
    right=st.lists(st.tuples(keys, tss, tss), max_size=40),
    left=st.lists(st.tuples(keys, tss), max_size=30),
)
def test_asof_composite_matches_bruteforce(right, left):
    rk = [r[0] for r in right]
    rt = [r[1] for r in right]
    rtb = [r[2] for r in right]
    lk = [l[0] for l in left]
    lt = [l[1] for l in left]
    got = _asof_composite(lk, lt, rk, rt, rtb)
    for i, (k, t) in enumerate(zip(lk, lt)):
        cands = [
            j for j in range(len(rk)) if rk[j] == k and rt[j] <= t
        ]
        if not cands:
            assert got[i] == -1
        else:
            best_t = max(rt[j] for j in cands)
            ties = [j for j in cands if rt[j] == best_t]
            best = max(ties, key=lambda j: (rtb[j], j))
            # any row with the same (key, ts, tie) triple is equivalent
            g = got[i]
            assert g >= 0
            assert (rk[g], rt[g], rtb[g]) == (rk[best], rt[best], rtb[best])


@settings(max_examples=50, deadline=None)
@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=3000,
    ),
    chunks=st.integers(min_value=1, max_value=7),
    q=st.floats(min_value=0.01, max_value=0.99),
)
def test_quantile_sketch_rank_bound(vals, chunks, q):
    from libpostal_ray.functions.quantile import QuantileSketch

    v = np.asarray(vals, dtype=np.float64)
    sks = []
    for part in np.array_split(v, chunks):
        sks.append(QuantileSketch(k=64).add(part))
    sk = sks[0]
    for other in sks[1:]:
        sk = sk.merge(QuantileSketch.from_bytes(other.to_bytes()))
    assert sk.total_weight == v.shape[0]
    est = sk.quantiles([q])[0]
    sv = np.sort(v)
    lo = np.searchsorted(sv, est, side="left") / v.shape[0]
    hi = np.searchsorted(sv, est, side="right") / v.shape[0]
    # rank error bound: generous 3x the asymptotic levels/(2k) (k=64,
    # <=3000 values -> ~6 levels -> eps ~ 0.05); small-n is exact
    eps = max(0.15, 1.0 / v.shape[0])
    assert lo - eps <= q <= hi + eps, (q, lo, hi, est)


@settings(max_examples=100, deadline=None)
@given(
    points=st.lists(st.tuples(keys, tss), max_size=50),
    anchors=st.lists(st.tuples(keys, tss), max_size=30),
    window=st.integers(min_value=1, max_value=200),
)
def test_interval_count_composite_matches_bruteforce(points, anchors, window):
    pk = np.asarray([p[0] for p in points], dtype=np.int64)
    pt = np.asarray([p[1] for p in points], dtype=np.int64)
    ik = np.asarray([a[0] for a in anchors], dtype=np.int64)
    it = np.asarray([a[1] for a in anchors], dtype=np.int64)
    # the broadcast-plan probe, extracted
    if pk.shape[0] == 0:
        got = np.zeros(ik.shape[0], dtype=np.int64)
    else:
        order = np.lexsort((pt, pk))
        ks, ts_ = pk[order], pt[order]
        uk, ut = np.unique(ks), np.unique(ts_)
        span = np.int64(ut.shape[0] + 1)
        comp = (
            np.searchsorted(uk, ks).astype(np.int64) * span
            + np.searchsorted(ut, ts_, side="right").astype(np.int64)
        )
        kid = np.searchsorted(uk, ik)
        kidc = np.clip(kid, 0, uk.shape[0] - 1).astype(np.int64)
        key_ok = (kid < uk.shape[0]) & (uk[kidc] == ik)
        base = kidc * span
        lo = np.searchsorted(
            comp, base + np.searchsorted(ut, it, side="right").astype(np.int64),
            side="right",
        )
        hi = np.searchsorted(
            comp,
            base
            + np.searchsorted(ut, it + np.int64(window), side="right").astype(
                np.int64
            ),
            side="right",
        )
        got = np.where(key_ok, hi - lo, 0).astype(np.int64)
    for j in range(ik.shape[0]):
        want = int(
            ((pk == ik[j]) & (pt > it[j]) & (pt <= it[j] + window)).sum()
        )
        assert got[j] == want


@given(
    st.lists(
        st.floats(allow_nan=False, width=64),
        min_size=2,
        max_size=200,
    )
)
@settings(max_examples=200, deadline=None)
def test_float_order_key_is_order_isomorphic(vals):
    """float_order_key preserves IEEE order (incl. +-inf, -0.0, subnormals)
    and key_to_float inverts it — the two pure kernels under
    exact_global_quantile's radix walk."""
    from libpostal_ray.functions.quantile import float_order_key, key_to_float

    v = np.asarray(vals, dtype=np.float64)
    k = float_order_key(v)
    order_v = np.argsort(v, kind="stable")
    # keys sorted must give exactly the value-sorted sequence (diff-based
    # checks break on inf - inf = nan).  Key order REFINES value order:
    # -0.0 < +0.0 by key while == by value, so key-monotonicity is only
    # asserted on strictly-increasing value steps.
    assert np.array_equal(v[np.argsort(k, kind="stable")], np.sort(v))
    vv, kk = v[order_v], k[order_v]
    strict = vv[:-1] < vv[1:]
    assert bool((kk[:-1][strict] < kk[1:][strict]).all())
    for x, kk in zip(v, k):
        back = key_to_float(int(kk))
        assert back == x or (back == 0.0 and x == 0.0)  # -0.0 == 0.0


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=4), min_size=0, max_size=12),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=0, max_value=4),
    st.integers(min_value=0, max_value=4),
)
def test_bpe_apply_merge_matches_greedy_scan(docs, left, right):
    """_apply_merge (vectorized, overlap chains by run parity) must equal
    the textbook greedy leftmost scan on arbitrary token sequences —
    including the left==right chain case and doc boundaries."""
    import numpy as np

    from libpostal_ray.pipelines.bpe import _apply_merge

    flat = np.asarray([t for d in docs for t in d], dtype=np.int32)
    offs = np.concatenate(([0], np.cumsum([len(d) for d in docs]))).astype(np.int64)
    nf, no = _apply_merge(flat, offs, left, right, 99)

    def naive(seq):
        o, i = [], 0
        while i < len(seq):
            if i + 1 < len(seq) and seq[i] == left and seq[i + 1] == right:
                o.append(99)
                i += 2
            else:
                o.append(seq[i])
                i += 1
        return o

    want = [naive(d) for d in docs]
    got = [nf[no[i] : no[i + 1]].tolist() for i in range(len(docs))]
    assert got == want


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=65535), min_size=1, max_size=50),
    st.lists(st.integers(min_value=0, max_value=65535), min_size=1, max_size=50),
)
def test_zorder_key_roundtrip(xs, ys):
    """Morton interleave must be a bijection on the 16-bit grid for any
    inputs (low 16 bits taken)."""
    import numpy as np

    from libpostal_ray.pipelines.layout import zorder_key

    n = min(len(xs), len(ys))
    x = np.asarray(xs[:n], dtype=np.int64)
    y = np.asarray(ys[:n], dtype=np.int64)
    z = zorder_key(x, y).astype(np.uint64)

    def unspread(v):
        v = v & np.uint64(0x5555555555555555)
        v = (v | (v >> np.uint64(1))) & np.uint64(0x3333333333333333)
        v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
        return v.astype(np.int64)

    assert np.array_equal(unspread(z), x)
    assert np.array_equal(unspread(z >> np.uint64(1)), y)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=9), st.text(max_size=4)),
        max_size=12,
        unique_by=lambda kv: kv[0],
    ),
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=9), st.text(max_size=4)),
        max_size=12,
        unique_by=lambda kv: kv[0],
    ),
)
def test_snapshot_diff_matches_dict_semantics(ray_session, old_rows, new_rows):
    """snapshot_diff must equal plain dict set/compare semantics on
    arbitrary unique-keyed snapshots (including empty sides)."""
    import pyarrow as pa
    import ray

    from libpostal_ray.pipelines.diff import snapshot_diff

    def tbl(rows):
        return pa.table(
            {
                "k": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": pa.array([r[1] for r in rows], type=pa.string()),
            }
        )

    ds = snapshot_diff(
        ray.data.from_arrow(tbl(old_rows)),
        ray.data.from_arrow(tbl(new_rows)),
        key="k",
        text_col="text",
    )
    out = ds.to_pandas()
    got = dict(zip(out.k, out.status)) if len(out) else {}
    o, n = dict(old_rows), dict(new_rows)
    want = {}
    for k in o.keys() | n.keys():
        if k not in o:
            want[k] = "added"
        elif k not in n:
            want[k] = "removed"
        elif o[k] != n[k]:
            want[k] = "changed"
    assert got == want


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # key
            st.integers(min_value=0, max_value=50),  # order
            st.integers(min_value=-100, max_value=100),  # value
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda r: (r[0], r[1]),
    )
)
def test_frames_over_key_matches_pandas(ray_session, rows):
    """frames_over_key must equal pandas groupby/rolling semantics."""
    import pandas as pd
    import pyarrow as pa
    import ray

    from libpostal_ray.pipelines.window import frames_over_key

    t = pa.table(
        {
            "k": pa.array([r[0] for r in rows], type=pa.int64()),
            "o": pa.array([r[1] for r in rows], type=pa.int64()),
            "v": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )
    out = (
        frames_over_key(ray.data.from_arrow(t), key="k", order_cols=["o"], value="v")
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    df = pd.DataFrame(rows, columns=["k", "o", "v"]).sort_values(["k", "o"])
    g = df.groupby("k")["v"]
    want_mov = g.rolling(3, min_periods=1).sum().reset_index(drop=True)
    assert out.mov_sum.tolist() == [int(x) for x in want_mov]
    assert out.first_val.tolist() == g.transform("first").tolist()
    assert out.last_val.tolist() == g.transform("last").tolist()
    want_next = g.shift(-1).fillna(-1).astype(int).tolist()
    assert out.next_val.tolist() == want_next
