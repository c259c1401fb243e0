"""Round-4 regression tests for the ADVICE.md findings: sliced-array
byte views (lm), all-null column profile sentinels, pair-id validation
and per-block dedup (evalmetrics), capped-pair tie determinism
(interval_join_pairs), and null-text handling in bpe."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from libpostal_ray.pipelines.bpe import (
    _utf8_tokens,
    bpe_encode_counts,
    train_bpe,
)
from libpostal_ray.pipelines.evalmetrics import pair_set_metrics, pairs_by_key
from libpostal_ray.pipelines.lm import _doc_byte_views
from libpostal_ray.pipelines.profile import column_profile
from libpostal_ray.pipelines.relational import interval_join_pairs


def test_doc_byte_views_sliced_plain_array():
    # a SLICED plain (non-chunked) large_string Array must report offsets
    # rebased to the slice, not absolute offsets into the parent buffer
    parent = pa.array(["aaaa", "bb", "cc", "dd"], type=pa.large_string())
    sliced = parent.slice(1, 2)  # ["bb", "cc"]
    data, off = _doc_byte_views(sliced)
    assert off[0] == 0
    assert bytes(data[off[0] : off[-1]]) == b"bbcc"
    # chunked path unchanged
    data2, off2 = _doc_byte_views(pa.chunked_array([sliced]))
    assert bytes(data2[off2[0] : off2[-1]]) == b"bbcc"


def test_utf8_tokens_null_and_sliced():
    col = pa.array(["ab", None, "cd"], type=pa.large_string())
    flat, offs = _utf8_tokens(col)
    assert list(np.diff(offs)) == [2, 0, 2]  # NULL == empty string
    assert bytes(flat.astype(np.uint8).tobytes()) == b"abcd"
    flat2, offs2 = _utf8_tokens(col.slice(1, 2))
    assert list(np.diff(offs2)) == [0, 2]


def test_column_profile_all_null_column(ray_session):
    t = pa.table(
        {
            "ok": pa.array(["x", "yy", None]),
            "dead": pa.array([None, None, None], type=pa.string()),
        }
    )
    out = (
        column_profile(ray.data.from_arrow(t), ["ok", "dead"])
        .to_pandas()
        .set_index("column")
    )
    assert out.loc["dead", "n_rows"] == 3
    assert out.loc["dead", "n_null"] == 3
    assert out.loc["dead", "min_len"] == 0  # not the int64-max sentinel
    assert out.loc["dead", "max_len"] == 0  # not -1
    assert out.loc["ok", "min_len"] == 1 and out.loc["ok", "max_len"] == 2


def test_pair_set_metrics_rejects_negative_ids(ray_session):
    bad = ray.data.from_arrow(
        pa.table({"id_a": pa.array([-1], pa.int64()), "id_b": pa.array([2], pa.int64())})
    )
    good = ray.data.from_arrow(
        pa.table({"id_a": pa.array([1], pa.int64()), "id_b": pa.array([2], pa.int64())})
    )
    with pytest.raises(Exception, match="\\[0, 2\\^31\\)"):
        pair_set_metrics(bad, good)


def test_pairs_by_key_duplicate_ids(ray_session):
    # duplicate ids within a block must not emit (x,x) or duplicate pairs
    t = pa.table(
        {
            "k": pa.array([7, 7, 7, 7], pa.int64()),
            "i": pa.array([5, 5, 9, 9], pa.int64()),
        }
    )
    out = (
        pairs_by_key(ray.data.from_arrow(t), key="k", id_col="i")
        .to_pandas()
        .sort_values(["id_a", "id_b"])
    )
    assert list(map(tuple, out.values)) == [(5, 9)]


def test_interval_join_pairs_cap_tie_deterministic(ray_session):
    # four points tied at the same (key, ts); cap=2 must keep the two
    # SMALLEST point ids regardless of input row order
    pts_rows = [(1, 10, pid) for pid in (42, 7, 99, 13)]
    for order in (pts_rows, pts_rows[::-1]):
        pts = ray.data.from_arrow(
            pa.table(
                {
                    "k": pa.array([r[0] for r in order], pa.int64()),
                    "ts": pa.array([r[1] for r in order], pa.int64()),
                    "pid": pa.array([r[2] for r in order], pa.int64()),
                }
            )
        )
        iv = ray.data.from_arrow(
            pa.table(
                {
                    "k": pa.array([1], pa.int64()),
                    "ts": pa.array([9], pa.int64()),
                    "iid": pa.array([100], pa.int64()),
                }
            )
        )
        out = interval_join_pairs(
            pts,
            iv,
            point_key="k",
            point_ts="ts",
            point_id="pid",
            interval_key="k",
            interval_ts="ts",
            interval_id="iid",
            window_us=5,
            per_interval_cap=2,
        ).to_pandas()
        assert sorted(out["pid"].tolist()) == [7, 13]
        assert bool(out["truncated"].all())


def test_bpe_null_text(ray_session):
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["abab", None, "ab"], pa.string()),
        }
    )
    ds = ray.data.from_arrow(t)
    merges = train_bpe(ds, n_merges=1)
    assert merges.num_rows == 1
    assert merges.column("left")[0].as_py() == ord("a")
    assert merges.column("right")[0].as_py() == ord("b")
    enc = bpe_encode_counts(ds, merges).to_pandas().set_index("doc_id")
    assert enc.loc[1, "n_bytes"] == 0 and enc.loc[1, "n_tokens"] == 0
    assert enc.loc[0, "n_tokens"] == 2  # abab -> XX
    assert enc.loc[2, "n_tokens"] == 1


def test_bpe_remat_every_exactness(ray_session):
    # > BPE_REMAT_EVERY merges: the deferred-bake path must produce the
    # same merge sequence as a naive per-round reference
    texts = ["the cat sat on the mat", "the bat and the rat", "thethethe"]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    merges = train_bpe(ray.data.from_arrow(t), n_merges=10)

    # naive reference
    def naive(docs, R):
        seqs = [list(d.encode()) for d in docs]
        out, nid = [], 256
        for r in range(R):
            cnt = {}
            for s in seqs:
                i = 0
                while i < len(s) - 1:
                    cnt[(s[i], s[i + 1])] = cnt.get((s[i], s[i + 1]), 0) + 1
                    i += 1
            # greedy-leftmost counting double-counts overlapping pairs the
            # vectorized kernel also counts (plain adjacent count) — same
            best = max(cnt.items(), key=lambda kv: (kv[1], -(kv[0][0] * (1 << 21) + kv[0][1])))
            (l, rgt), c = best
            out.append((r, l, rgt, nid, c))
            for j, s in enumerate(seqs):
                ns, i = [], 0
                while i < len(s):
                    if i < len(s) - 1 and s[i] == l and s[i + 1] == rgt:
                        ns.append(nid)
                        i += 2
                    else:
                        ns.append(s[i])
                        i += 1
                seqs[j] = ns
            nid += 1
        return out

    ref = naive(texts, 10)
    got = list(
        zip(
            merges.column("rank").to_pylist(),
            merges.column("left").to_pylist(),
            merges.column("right").to_pylist(),
            merges.column("new_id").to_pylist(),
            merges.column("count").to_pylist(),
        )
    )
    assert got == ref


def test_media_auto_resolution_falls_back_to_stub():
    # no PIL/cv2 in this environment: image "auto" resolves to the
    # pure-numpy PPM/BMP codec, which must still fail LOUDLY on payloads
    # in formats it can't read (the synth tables are random bytes);
    # frame extraction has no numpy path, so it resolves to None and the
    # call site raises; explicit fns pass through untouched
    from libpostal_ray.stages.multimodal import (
        MediaFeatureStage,
        MediaResizeStage,
        FrameSampleStage,
        fake_decode,
        resolve_image_decode,
        resolve_image_resize,
        resolve_frame_extract,
        synth_media_table,
    )

    assert callable(resolve_image_decode())
    assert callable(resolve_image_resize())
    assert resolve_frame_extract() is None
    t = synth_media_table(4)
    for cls in (MediaFeatureStage, MediaResizeStage, FrameSampleStage):
        stage = cls()  # default "auto"
        with pytest.raises(NotImplementedError):
            stage(t)
    out = MediaFeatureStage(decode_fn=fake_decode)(t)
    assert out.num_rows == 4
