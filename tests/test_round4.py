

def test_grouped_exact_quantile_cont_vs_numpy(ray_session):
    """grouped_exact_quantile_cont recovers the EXACT per-group
    interpolated quantile (DuckDB median formula) with no value gather,
    on arbitrary doubles including negatives, across blockings."""
    import numpy as np
    import pyarrow as pa
    import ray

    from libpostal_ray.functions.quantile import grouped_exact_quantile_cont

    rng = np.random.default_rng(11)
    n = 5000
    grp = np.array(["g%d" % (i % 7) for i in rng.integers(0, 70, n)])
    val = rng.normal(size=n) * 1e4  # signed doubles
    t = pa.table({"k": pa.array(grp.tolist()), "v": pa.array(val)})
    for blocks in (1, 5, 17):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = grouped_exact_quantile_cont(ds, "k", "v", 0.5)
        got = {
            g: (nn, qv)
            for g, nn, qv in zip(
                out["k"].to_pylist(),
                out["n"].to_pylist(),
                out["q_value"].to_pylist(),
            )
        }
        for g in np.unique(grp):
            s = np.sort(val[grp == g])
            m = s.shape[0]
            h = 0.5 * (m - 1)
            lo = int(np.floor(h))
            hi = min(lo + 1, m - 1)
            ref = float(s[lo] + (h - lo) * (s[hi] - s[lo]))
            assert got[str(g)][0] == m
            assert got[str(g)][1] == ref, (g, got[str(g)][1], ref)


def test_grouped_exact_quantile_cont_edges(ray_session):
    """Single-row groups, all-NaN columns dropped, empty dataset."""
    import numpy as np
    import pyarrow as pa
    import ray

    from libpostal_ray.functions.quantile import grouped_exact_quantile_cont

    t = pa.table(
        {
            "k": pa.array(["a", "a", "b", "c", "c"]),
            "v": pa.array([3.0, float("nan"), -7.25, 1.5, 2.5]),
        }
    )
    out = grouped_exact_quantile_cont(
        ray.data.from_arrow(t).repartition(3), "k", "v", 0.5
    )
    got = dict(zip(out["k"].to_pylist(), out["q_value"].to_pylist()))
    assert got == {"a": 3.0, "b": -7.25, "c": 2.0}
    ns = dict(zip(out["k"].to_pylist(), out["n"].to_pylist()))
    assert ns == {"a": 1, "b": 1, "c": 2}

    empty = pa.table({"k": pa.array([], type=pa.string()),
                      "v": pa.array([], type=pa.float64())})
    out = grouped_exact_quantile_cont(ray.data.from_arrow(empty), "k", "v", 0.5)
    assert out.num_rows == 0


def test_weighted_doc_sample_aes_property_and_blocking(ray_session, tmp_path):
    """A-ES selection == brute-force numpy top-k by ln(u)/w on the same
    hash randomness; identical under different blockings; and heavier
    docs are actually overrepresented (the point of weighting)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from libpostal_ray.pipelines import queries as q

    n = 5000
    ids = np.arange(1, n + 1, dtype=np.int64) * 7  # non-contiguous ids
    w = np.where(ids % 10 == 0, 5000, 50).astype(np.int64)  # 10% heavy
    d = str(tmp_path)
    pq.write_table(
        pa.table({"doc_id": ids, "n_chars": w}),
        f"{d}/documents.parquet",
    )
    u = ((ids * 48271) % 2147483647 + 1).astype(np.float64) / 2147483648.0
    key = np.log(u) / w
    order = np.lexsort((ids, -key))[:64]
    ref = ids[order]

    got = q.weighted_doc_sample(d).to_pandas().sort_values("rn")
    assert (got.doc_id.to_numpy() == ref).all()
    # heavy docs are 10% of the corpus but ~90% of the sample
    heavy_frac = (got.doc_id % 10 == 0).mean()
    assert heavy_frac > 0.5, heavy_frac


def test_source_gram_overlap_planted(ray_session, tmp_path):
    """Two sources sharing exactly one planted 4-gram; a third source with
    no overlap; blocking-independent; >64-group guard raises."""
    import numpy as np
    import pyarrow as pa
    import ray

    from libpostal_ray.pipelines.simjoin import source_gram_overlap

    rows = {
        "source": ["alpha", "alpha", "beta", "gamma"],
        "text": [
            "shared one two three unique0 a b c",
            "filler x y z w v u t",
            "prefix shared one two three suffix q r",
            "totally different words here only gamma has",
        ],
    }
    t = pa.table(rows)
    for blocks in (1, 4):
        out = source_gram_overlap(
            ray.data.from_arrow(t).repartition(blocks)
        ).to_pandas()
        # alpha & beta share exactly "shared one two three"
        ab = out[(out.src_a == "alpha") & (out.src_b == "beta")]
        assert len(ab) == 1 and int(ab.n_shared.iloc[0]) == 1
        assert not ((out.src_a == "gamma") | (out.src_b == "gamma")).any()
        # totals: alpha has 5+5=10 distinct grams across its two docs
        assert int(ab.n_a.iloc[0]) == 10
        jacc = float(ab.jacc.iloc[0])
        assert jacc == 1.0 / (10 + int(ab.n_b.iloc[0]) - 1)

    wide = pa.table(
        {
            "source": [f"s{i:03d}" for i in range(70)],
            "text": ["common gram here four"] * 70,
        }
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="64"):
        source_gram_overlap(ray.data.from_arrow(wide))


def test_cdc_chunking_is_content_defined(ray_session):
    """Identical content chunks identically regardless of its neighbors
    in the flat batch buffer (the W-byte pad property), and an embedded
    copy of a doc shares most of its chunks."""
    import numpy as np

    from libpostal_ray.pipelines.cdc import doc_chunk_hashes

    rng = np.random.default_rng(3)
    a = rng.integers(32, 127, 4000, dtype=np.uint8)
    other = rng.integers(32, 127, 1000, dtype=np.uint8)

    def chunks(docs):
        data = np.concatenate(docs).astype(np.uint8)
        off = np.cumsum([0] + [d.shape[0] for d in docs]).astype(np.int64)
        didx, ch = doc_chunk_hashes(data, off)
        return [set(ch[didx == i].tolist()) for i in range(len(docs))]

    alone = chunks([a])[0]
    neighbored = chunks([other, a, other])[1]
    assert alone == neighbored

    embedded = np.concatenate([other, a, other])
    got = chunks([a, embedded])
    inter = got[0] & got[1]
    assert len(inter) / len(got[0]) > 0.5, (len(inter), len(got[0]))


def test_chunk_dup_stats_planted(ray_session):
    """Exact-dup pair -> shared_frac 1.0 on both; unique docs ~0;
    blocking-independent totals."""
    import numpy as np
    import pyarrow as pa
    import ray

    from libpostal_ray.pipelines.cdc import chunk_dup_stats

    rng = np.random.default_rng(9)

    def doc(n):
        return "".join(chr(c) for c in rng.integers(32, 127, n))

    dup = doc(3000)
    rows = {"doc_id": [], "content": []}
    for i in range(40):
        rows["doc_id"].append(i)
        rows["content"].append(doc(2000))
    rows["doc_id"] += [100, 101]
    rows["content"] += [dup, dup]
    t = pa.table(
        {
            "doc_id": pa.array(rows["doc_id"], type=pa.int64()),
            "content": pa.array(rows["content"]),
        }
    )
    ref = None
    for blocks in (1, 6):
        out = (
            chunk_dup_stats(ray.data.from_arrow(t).repartition(blocks))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert len(out) == 42
        d = out.set_index("doc_id")
        assert d.loc[100, "shared_frac"] == 1.0
        assert d.loc[101, "shared_frac"] == 1.0
        assert (d.loc[:99, "shared_frac"] < 0.2).all()
        if ref is None:
            ref = out
        else:
            assert out.equals(ref)


def test_round4_new_queries_on_empty_corpus(ray_session, tmp_path):
    """Zero-row inputs are routine at scale: the round-4 session-9 rows
    must not crash and must emit zero rows."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    import __ray_entry__ as entrymod

    src = "/root/testdata/sf0.001"
    d = tmp_path / "sf_empty"
    d.mkdir()
    for t in ("documents", "events"):
        schema = pq.read_schema(f"{src}/{t}.parquet")
        pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    qs = entrymod.queries()
    for name in (
        "events_type_median_exact",
        "weighted_doc_sample",
        "source_ngram_overlap",
        "cdc_chunk_dups",
    ):
        res = qs[name](str(d))
        df = res.to_pandas() if not isinstance(res, pd.DataFrame) else res
        assert isinstance(df, pd.DataFrame), name
        assert len(df) == 0, (name, df.head())


def _make_bmp24(img):
    """Minimal uncompressed 24-bit bottom-up BMP encoder (test-local)."""
    import numpy as np
    import struct

    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    raster = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = img[y, :, ::-1].astype(np.uint8).tobytes()  # RGB -> BGR
        raster += row + b"\x00" * (stride - len(row))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 0, 0, 0, 0)
    return header + info + bytes(raster)


def test_numpy_ppm_bmp_codec_roundtrip():
    """The dependency-free raster codec: PPM and BMP payloads decode to
    the exact planted pixels (BMP bottom-up + row padding handled)."""
    import numpy as np

    from libpostal_ray.stages.multimodal import (
        array_to_ppm,
        ppm_bmp_to_array,
    )

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (5, 3, 3), dtype=np.uint8)  # odd width pads
    assert (ppm_bmp_to_array(array_to_ppm(img)) == img).all()
    assert (ppm_bmp_to_array(_make_bmp24(img)) == img).all()
    # comments in the PPM header
    with_comment = b"P6\n# a comment\n3 5\n255\n" + img.tobytes()
    assert (ppm_bmp_to_array(with_comment) == img).all()
    assert ppm_bmp_to_array(b"\x89PNG garbage") is None


def test_media_stages_real_decode_in_this_sandbox(ray_session):
    """MediaFeatureStage / MediaResizeStage with default 'auto' run REAL
    decodes here (no PIL/cv2): PPM and BMP image payloads through Ray
    actor pools, exact feature values and resized payload dims."""
    import numpy as np
    import pyarrow as pa
    import ray

    from libpostal_ray.stages.multimodal import (
        MediaFeatureStage,
        MediaResizeStage,
        array_to_ppm,
        array_to_wav,
        ppm_bmp_to_array,
    )

    grey128 = np.full((64, 64, 3), 128, dtype=np.uint8)
    rng = np.random.default_rng(4)
    noisy = rng.integers(0, 256, (48, 32, 3), dtype=np.uint8)
    tone = (
        0.5 * np.sin(2 * np.pi * 440 * np.arange(800) / 8000.0)
    ).astype(np.float32)
    wav = array_to_wav(tone, 8000)
    t = pa.table(
        {
            "media_id": pa.array([0, 1, 2], type=pa.int64()),
            "media_type": pa.array(["image", "image", "audio"]),
            "payload": pa.array(
                [array_to_ppm(grey128), _make_bmp24(noisy), wav],
                type=pa.large_binary(),
            ),
            "width": pa.array([64, 32, 0], type=pa.int32()),
            "height": pa.array([64, 48, 0], type=pa.int32()),
            "duration_ms": pa.array([0, 0, 90], type=pa.int32()),
        }
    )
    feats = (
        ray.data.from_arrow(t)
        .map_batches(
            MediaFeatureStage,
            batch_format="pyarrow",
            batch_size=2,
            concurrency=2,
        )
        .to_pandas()
        .set_index("media_id")
    )
    f0 = np.asarray(feats.loc[0, "feature"])
    assert f0.shape == (64,)
    assert np.allclose(f0, 128.0 / 255.0, atol=1e-3)  # uniform grey
    f2 = np.asarray(feats.loc[2, "feature"])  # REAL WAV decode (session 14)
    assert f2[:32].mean() > 0.2  # windowed RMS of the 440 Hz tone

    resized = (
        ray.data.from_arrow(t)
        .map_batches(
            MediaResizeStage,
            batch_format="pyarrow",
            batch_size=2,
            concurrency=2,
        )
        .to_pandas()
        .set_index("media_id")
    )
    for mid, (w0, h0) in ((0, (64, 64)), (1, (32, 48))):
        arr = ppm_bmp_to_array(bytes(resized.loc[mid, "payload"]))
        assert arr.shape == (32, 32, 3), mid
        assert resized.loc[mid, "width"] == 32
    # nearest-neighbor on the uniform image stays uniform
    arr0 = ppm_bmp_to_array(bytes(resized.loc[0, "payload"]))
    assert (arr0 == 128).all()
    assert bytes(resized.loc[2, "payload"]) == wav  # pass-through


def test_chunk_containment_pairs_embedded(ray_session):
    """A small file embedded inside a big bundle is found as a
    containment pair (~1.0) even though whole-doc Jaccard is tiny;
    exact dups score exactly 1.0; unrelated docs emit nothing."""
    import numpy as np
    import pyarrow as pa
    import ray

    from libpostal_ray.pipelines.cdc import chunk_containment_pairs

    rng = np.random.default_rng(21)

    def doc(n):
        return "".join(chr(c) for c in rng.integers(32, 127, n))

    small = doc(3000)
    bundle = doc(9000) + small + doc(9000)  # 3k embedded in 21k
    dup = doc(2500)
    rows = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
            "content": pa.array(
                [small, bundle, dup, dup, doc(4000), doc(4000)]
            ),
        }
    )
    for blocks in (1, 3):
        out = (
            chunk_containment_pairs(
                ray.data.from_arrow(rows).repartition(blocks)
            )
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        pairs = set(zip(out.doc_a, out.doc_b))
        assert (1, 2) in pairs, pairs  # embedded small-in-bundle
        assert (3, 4) in pairs
        r12 = out[(out.doc_a == 1) & (out.doc_b == 2)].iloc[0]
        assert r12.containment > 0.7, r12.containment
        r34 = out[(out.doc_a == 3) & (out.doc_b == 4)].iloc[0]
        assert r34.containment == 1.0 and r34.n_shared == r34.n_a == r34.n_b
        assert not ({5, 6} & set(out.doc_a) | {5, 6} & set(out.doc_b)), pairs
