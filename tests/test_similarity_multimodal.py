from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ia_hadoop_tools_spark.operators.multimodal import (
    decode_features,
    frame_sample,
    resize_images,
)
from ia_hadoop_tools_spark.operators.similarity import (
    ann_bruteforce_topk,
    ann_lsh_topk,
    embedding_neardup_pairs,
)


def _vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.01, 0.0, 0.0]),   # near-dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [0.7, 0.7, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")


def test_ann_bruteforce(spark):
    vecs = _vectors(spark)
    out = ann_bruteforce_topk(vecs, vecs.filter("vec_id = 0"), k=2)
    rows = out.orderBy("rank").collect()
    assert [r.neighbor_id for r in rows] == [1, 4]
    assert rows[0].cosine > 0.99
    assert rows[0].rank == 1


def test_ann_lsh_subset_of_bruteforce(spark):
    vecs = _vectors(spark)
    q = vecs.filter("vec_id = 0")
    exact = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in ann_bruteforce_topk(vecs, q, k=4).collect()
    }
    approx = ann_lsh_topk(vecs, q, k=4, dim=4, num_planes=8, bands=4).collect()
    for r in approx:  # every LSH hit must carry the exact cosine
        assert math.isclose(exact[(r.query_id, r.neighbor_id)], r.cosine, abs_tol=1e-9)
    assert any(r.neighbor_id == 1 for r in approx)  # near-dup must be found


def test_embedding_neardup(spark):
    pairs = embedding_neardup_pairs(_vectors(spark), threshold=0.95, dim=4).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 1) in got
    assert all(r.cosine >= 0.95 for r in pairs)


def _media(spark):
    rows = [
        (0, "image", bytearray(b"imagebytes-0" * 100), 640, 480, None, "png"),
        (1, "video", bytearray(b"videobytes-1" * 2000), 1920, 1080, 60000, "h264"),
        (2, "audio", bytearray(b"audiobytes-2" * 50), None, None, 5000, "mp3"),
    ]
    return spark.createDataFrame(
        rows,
        "asset_id: long, media_type: string, payload: binary, width: int, "
        "height: int, duration_ms: long, codec: string",
    )


def test_decode_features_deterministic(spark):
    out1 = {r.asset_id: r.feature for r in decode_features(_media(spark)).collect()}
    out2 = {r.asset_id: r.feature for r in decode_features(_media(spark)).collect()}
    assert out1 == out2
    assert all(len(v) == 8 for v in out1.values())


def _has(mod):
    try:
        __import__(mod)
        return True
    except ImportError:
        return False


@pytest.mark.skipif(_has("PIL"), reason="only meaningful when Pillow absent")
def test_decode_real_missing_codec_raises_importerror(spark):
    """A missing codec library must fail the job loudly with the remedy,
    never silently emit nulls."""
    with pytest.raises(Exception, match="requires PIL"):
        decode_features(
            _media(spark).filter("media_type = 'image'"), decoder="real"
        ).collect()


def _wav_bytes(samples, framerate=8000, channels=1):
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def test_decode_real_wav_audio(spark):
    """The real audio decoder (stdlib wave + numpy, no third-party dep)
    must produce bucketed-RMS features matching an in-test reference, and
    record corrupt payloads per-record instead of failing the pass."""
    import numpy as np

    samples = [int(10000 * math.sin(i / 10.0)) for i in range(800)]
    rows = [
        (0, "audio", bytearray(_wav_bytes(samples)), None, None, 100, "wav"),
        (1, "audio", bytearray(b"not-a-riff-header"), None, None, 100, "wav"),
    ]
    df = spark.createDataFrame(
        rows,
        "asset_id: long, media_type: string, payload: binary, width: int, "
        "height: int, duration_ms: long, codec: string",
    )
    out = {r.asset_id: r for r in decode_features(df, decoder="real").collect()}
    x = np.array(samples, dtype=np.float64)
    want = [
        float(np.sqrt((b * b).mean()) / 32768.0) for b in np.array_split(x, 8)
    ]
    got = out[0].feature
    assert out[0].decode_error is None
    assert len(got) == 8
    for g, w in zip(got, want):
        assert math.isclose(g, w, rel_tol=1e-6)
    assert out[1].feature is None
    assert out[1].decode_error and "Error" in out[1].decode_error


def test_decode_real_wav_stereo_downmix(spark):
    """Stereo PCM downmixes by channel mean: (L+R)/2 with R = -L gives
    all-zero RMS, pinning that channels are separated, not interleaved."""
    samples = []
    for i in range(400):
        v = int(8000 * math.sin(i / 7.0))
        samples += [v, -v]
    df = spark.createDataFrame(
        [(0, "audio", bytearray(_wav_bytes(samples, channels=2)), None, None,
          100, "wav")],
        "asset_id: long, media_type: string, payload: binary, width: int, "
        "height: int, duration_ms: long, codec: string",
    )
    row = decode_features(df, decoder="real").collect()[0]
    assert row.decode_error is None
    assert all(abs(v) < 1e-4 for v in row.feature)


def test_decode_real_image_with_pillow(spark):
    """Real image decode + resize (runs only where Pillow is installed)."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io as _io

    img = PIL_Image.new("L", (16, 4), color=128)
    buf = _io.BytesIO()
    img.save(buf, format="PNG")
    df = spark.createDataFrame(
        [(0, "image", bytearray(buf.getvalue()), 16, 4, None, "png")],
        "asset_id: long, media_type: string, payload: binary, width: int, "
        "height: int, duration_ms: long, codec: string",
    )
    row = decode_features(df, decoder="real").collect()[0]
    assert row.decode_error is None
    assert all(math.isclose(v, 128 / 255.0, rel_tol=1e-6) for v in row.feature)
    resized = resize_images(df, 8, 8, decoder="real").collect()[0]
    assert (resized.width, resized.height) == (8, 8)
    back = PIL_Image.open(_io.BytesIO(bytes(resized.payload)))
    assert back.size == (8, 8)


def test_frame_sample_real_with_pyav(spark):
    """Real frame sampling (runs only where PyAV is installed)."""
    pytest.importorskip("av")
    df = _media(spark)
    # corrupt video bytes contribute zero rows rather than failing
    assert frame_sample(df, every_n=2, decoder="real").collect() == []


def test_decoder_name_validated(spark):
    with pytest.raises(ValueError, match="decoder must be one of"):
        decode_features(_media(spark), decoder="reall")


def test_frame_sample_and_resize(spark):
    frames = frame_sample(_media(spark), every_n=5).collect()
    assert all(r.asset_id == 1 for r in frames)
    assert [r.frame_index for r in frames] == sorted(r.frame_index for r in frames)
    resized = resize_images(_media(spark), 64, 64).collect()
    assert len(resized) == 1 and resized[0].width == 64


def test_train_ivf_centroids_deterministic_and_recall(spark):
    """Trained quantizer: unit contract (K cells, unit-ish norms), exact
    determinism across runs, and probe recall >= the untrained hash
    quantizer's on the same corpus/queries."""
    from ia_hadoop_tools_spark.operators.similarity import (
        ann_bruteforce_topk,
        ann_ivf_topk,
        train_ivf_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.limit(8)

    cent1 = train_ivf_centroids(emb, num_centroids=16, iters=3)
    cent2 = train_ivf_centroids(emb, num_centroids=16, iters=3)
    rows1 = sorted(map(tuple, cent1.collect()))
    rows2 = sorted(map(tuple, cent2.collect()))
    assert rows1 == rows2  # seeded + rounded means -> bitwise deterministic
    assert len(rows1) == 16
    # determinism must survive a DIFFERENT physical partitioning (double
    # avg accumulates in partition order; the rounded means absorb that)
    cent3 = train_ivf_centroids(emb.repartition(7), num_centroids=16, iters=3)
    assert sorted(map(tuple, cent3.collect())) == rows1
    # zero-norm vectors assign deterministically (pinned cos = -1), never
    # poisoning the mean update with NaNs
    dim = len(emb.first().embedding)
    zero = spark.createDataFrame(
        [(99_991, [0.0] * dim), (99_992, [0.0] * dim)],
        "vec_id: long, embedding: array<double>",
    )
    cz = train_ivf_centroids(
        emb.select("vec_id", "embedding").unionByName(zero),
        num_centroids=16, iters=2,
    )
    got = cz.collect()
    assert len(got) == 16
    assert all(
        all(not (x != x) for x in r["__cvec"]) for r in got
    )  # no NaN anywhere

    def recall(result):
        exact = {
            (r.query_id, r.neighbor_id)
            for r in ann_bruteforce_topk(emb, queries, k=5).collect()
        }
        got = {(r.query_id, r.neighbor_id) for r in result.collect()}
        return len(got & exact) / len(exact)

    r_trained = recall(
        ann_ivf_topk(emb, queries, k=5, num_centroids=16, nprobe=3,
                     centroids=cent1)
    )
    r_hash = recall(
        ann_ivf_topk(emb, queries, k=5, num_centroids=16, nprobe=3)
    )
    assert r_trained >= r_hash
    # nprobe=3 of 16 cells probes ~19% of the corpus; anything well above
    # that fraction shows the cells are real structure, not random slices
    assert r_trained > 0.3


def test_semdedup_keep_rule_and_clusters(spark, sf_dir):
    """SemDeDup invariants: every vector gets exactly one cluster; the
    lowest id of each cluster is never a dup; marking is consistent with a
    brute-force within-cluster check; and the plan broadcasts centroids."""
    from pyspark.sql import functions as F

    from ia_hadoop_tools_spark.operators.similarity import (
        assign_clusters,
        semdedup,
    )
    from ia_hadoop_tools_spark.session import load_tables

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    cent = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid"),
    )
    out = semdedup(emb, cent, threshold=0.35).collect()
    n = emb.count()
    assert len(out) == n and len({r.vec_id for r in out}) == n

    # lowest id per cluster always survives
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for rows in by_cluster.values():
        lowest = min(rows, key=lambda r: r.vec_id)
        assert not lowest.is_dup

    # assignment plan: centroids broadcast, corpus does not shuffle for it
    plan = (
        assign_clusters(emb, cent)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan

    # dup marks match a brute-force within-cluster check
    import itertools

    vecs = {r.vec_id: r.embedding for r in emb.collect()}

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return round(dot / (na * nb), 6)

    for rows in by_cluster.values():
        ids = sorted(r.vec_id for r in rows)
        marked = {r.vec_id for r in rows if r.is_dup}
        expect = set()
        for a, b in itertools.combinations(ids, 2):
            if cos(vecs[a], vecs[b]) >= 0.35:
                expect.add(b)
        assert marked == expect


def test_ann_ivf_zero_vector_never_poisons_ranking(spark):
    from ia_hadoop_tools_spark.operators.similarity import ann_ivf_topk

    rows = [(i, [float((i * 7 + j) % 5 - 2) for j in range(4)]) for i in range(30)]
    rows.append((99, [0.0, 0.0, 0.0, 0.0]))  # zero-norm vector
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = corpus.filter("vec_id in (1, 2)")
    out = ann_ivf_topk(corpus, queries, k=3, num_centroids=4, nprobe=4)
    rows_out = out.collect()
    assert rows_out, "ivf returned nothing"
    for r in rows_out:
        # NaN would rank the zero vector #1 everywhere; guarded -> null
        # cosine sorts last, so it never appears in the top-k
        assert r["neighbor_id"] != 99
        assert r["cosine"] == r["cosine"]  # not NaN


def test_lsh_bands_must_divide_num_planes_everywhere(spark):
    """All three LSH entry points share _band_keys and its validation:
    bands=20 over 16 planes would make every band key just the band index
    (full cross join); bands=5 would silently drop a plane."""
    import pytest

    from ia_hadoop_tools_spark.operators.similarity import (
        ann_lsh_topk,
        embedding_neardup_pairs,
    )

    df = _vectors(spark)
    for bad_bands in (20, 5, 0):
        with pytest.raises(ValueError, match="bands must divide"):
            ann_lsh_topk(df, df.limit(1), k=2, dim=4, num_planes=16, bands=bad_bands)
        with pytest.raises(ValueError, match="bands must divide"):
            embedding_neardup_pairs(df, dim=4, num_planes=16, bands=bad_bands)


def test_ann_topk_drops_zero_norm_neighbors(spark):
    """Zero-norm corpus vectors have no defined similarity: they must not
    appear as ranked neighbors in either the brute-force or LSH path."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (9, [0.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter("vec_id = 0")
    brute = ann_bruteforce_topk(df, q, k=3).collect()
    assert {r.neighbor_id for r in brute} == {1}
    assert all(r.cosine is not None for r in brute)
    lsh = ann_lsh_topk(df, q, k=3, dim=4, num_planes=8, bands=8).collect()
    assert 9 not in {r.neighbor_id for r in lsh}
    assert all(r.cosine is not None for r in lsh)


def test_ann_lsh_candidate_shuffle_carries_no_vectors(spark):
    """Candidates-then-verify: the band-collision dedup must shuffle only
    (query_id, neighbor_id) — no embedding arrays ride the exchange."""
    df = _vectors(spark)
    plan = (
        ann_lsh_topk(df, df.limit(2), k=2, dim=4, num_planes=8, bands=4)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the dedup aggregate groups exactly the two id columns
    import re

    m = re.search(r"Aggregate \[query_id[^\n]*", plan)
    assert m and "embedding" not in m.group(0), plan


def test_lsh_dim_mismatch_raises_not_silent_cross_join(spark):
    import pytest

    from ia_hadoop_tools_spark.operators.similarity import ann_lsh_topk

    df = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="plane dim"):
        ann_lsh_topk(df, df.limit(2), k=2, dim=8).collect()


def _skewed_semdedup_corpus(spark):
    """80% boilerplate collapsing onto one centroid + two small near-dup
    families in the other — the badly-placed-centroid failure the
    oversized-cluster guard exists for."""
    rows = []
    # 40 near-identical "boilerplate" vectors: pairwise cosine ~= 1
    for i in range(40):
        rows.append((i, [1.0 + i * 1e-5, 1.0, 1.0, 1.0]))
    # two tight families of 3 near the second centroid; families are
    # mutually dissimilar (cross-family cosine well below 0.99)
    for j in range(3):
        rows.append((100 + j, [-1.0 + j * 1e-5, 2.0, 0.5, 1.5]))
        rows.append((200 + j, [-1.0 + j * 1e-5, 0.5, 2.0, -1.5]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cent = spark.createDataFrame(
        [(0, [1.0, 1.0, 1.0, 1.0]), (1, [-1.0, 1.5, 1.5, 0.0])],
        "centroid_id long, centroid array<double>",
    )
    return df, cent


def test_semdedup_oversized_guard_matches_exact_on_boilerplate(spark):
    """With max_cluster_size set, oversized clusters go through the banded
    LSH + hot-bucket-representative path; on near-identical boilerplate
    (which collides in every band) the dup set must equal the exact path's,
    and the Observation must report the routed band rows."""
    from ia_hadoop_tools_spark.operators.similarity import semdedup

    df, cent = _skewed_semdedup_corpus(spark)
    exact = {
        (r.vec_id, r.cluster_id, r.is_dup)
        for r in semdedup(df, cent, threshold=0.99).collect()
    }
    capped_df = semdedup(df, cent, threshold=0.99, max_cluster_size=8, dim=4)
    capped = {(r.vec_id, r.cluster_id, r.is_dup) for r in capped_df.collect()}
    assert capped == exact
    # the boilerplate cluster (40 rows > cap 8) was routed: 40 rows x
    # AUTO_GUARD_BANDS bands (the guard escalates the default bands=4 to
    # 8, round-7); the 6-row cluster stayed on the exact path
    from ia_hadoop_tools_spark.operators.similarity import AUTO_GUARD_BANDS

    assert capped_df.oversized_obs.get["oversized_rows"] == 40 * AUTO_GUARD_BANDS
    capped_df.assign_cache.unpersist()


def test_semdedup_oversized_guard_small_subbuckets_pairwise(spark):
    """Families small enough to fit a sub-bucket (cap=4 > family of 3) take
    the pairwise cand_small branch and must match the exact dup set; the
    40-strong boilerplate bucket (> cap) takes the representative branch."""
    from ia_hadoop_tools_spark.operators.similarity import semdedup

    df, cent = _skewed_semdedup_corpus(spark)
    exact = {
        (r.vec_id, r.is_dup)
        for r in semdedup(df, cent, threshold=0.99).collect()
    }
    out = semdedup(df, cent, threshold=0.99, max_cluster_size=4, dim=4)
    capped = {(r.vec_id, r.is_dup) for r in out.collect()}
    assert capped == exact
    out.assign_cache.unpersist()


def test_semdedup_guard_rejects_bad_params(spark):
    import pytest

    from ia_hadoop_tools_spark.operators.similarity import semdedup

    df, cent = _skewed_semdedup_corpus(spark)
    with pytest.raises(ValueError, match="max_cluster_size"):
        semdedup(df, cent, max_cluster_size=1)
    with pytest.raises(ValueError, match="bands must divide"):
        semdedup(df, cent, max_cluster_size=8, num_planes=10, bands=4, dim=4)


def test_semdedup_zero_vector_not_marked_duplicate(spark):
    from ia_hadoop_tools_spark.operators.similarity import (
        hyperplanes,
        semdedup,
    )

    rows = [(i, [float(j + i % 3) for j in range(4)]) for i in range(12)]
    rows.append((99, [0.0, 0.0, 0.0, 0.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cent = spark.createDataFrame(
        [(0, [1.0, 1.0, 1.0, 1.0]), (1, [-1.0, 2.0, 0.5, 1.5])],
        "centroid_id long, centroid array<double>",
    )
    out = {r["vec_id"]: r["is_dup"] for r in semdedup(df, cent, threshold=0.99).collect()}
    # zero-norm vectors are excluded at assignment (documented: no
    # direction to cluster by) -> never spuriously marked duplicates,
    # and the guarded cosine keeps NaN out of every other verdict
    assert 99 not in out
    assert set(out) == {i for i in range(12)}


def test_frame_sample_rejects_bad_every_n(spark):
    import pytest

    from ia_hadoop_tools_spark.operators.multimodal import (
        frame_sample,
        resize_images,
    )

    for bad in (0, -3):
        with pytest.raises(ValueError, match="every_n"):
            frame_sample(_media(spark), every_n=bad)
    with pytest.raises(ValueError, match="width/height"):
        resize_images(_media(spark), 0, 64)


def test_semdedup_auto_planes_rescues_diverse_oversized_cluster(spark):
    """Round-6 recall probe finding: a DIVERSE cluster larger than
    buckets*cap makes every static sub-bucket hot and the guard
    degenerates to the rep-only pass. auto_planes (default) must widen
    the geometry and recover (nearly all of) the exact dup set."""
    import math

    import numpy as np

    from ia_hadoop_tools_spark.operators.similarity import semdedup

    rng = np.random.default_rng(7)
    dim, n_pairs, th = 16, 200, 0.95
    rows = []
    for i in range(n_pairs):
        u = rng.standard_normal(dim)
        u /= np.linalg.norm(u)
        w = rng.standard_normal(dim)
        w -= w @ u * u
        w /= np.linalg.norm(w)
        c = th + 0.01
        v = c * u + math.sqrt(1 - c * c) * w
        rows.append((2 * i, [float(x) for x in u]))
        rows.append((2 * i + 1, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cent = spark.createDataFrame(
        [(0, [1.0] * dim)], "centroid_id long, centroid array<double>"
    )

    def dups(**kw):
        out = semdedup(df, cent, threshold=th, dim=dim,
                       max_cluster_size=20, **kw)
        got = {r.vec_id for r in out.filter("is_dup").collect()}
        out.assign_cache.unpersist()
        return got

    exact_out = semdedup(df, cent, threshold=th, dim=dim)
    exact = {r.vec_id for r in exact_out.filter("is_dup").collect()}
    exact_out.assign_cache.unpersist()
    assert len(exact) == n_pairs  # every engineered partner is a dup

    static = dups(auto_planes=False)  # 16 buckets/band for 400 rows: hot
    auto = dups()
    assert len(auto & exact) / n_pairs > 0.9
    assert len(auto & exact) > len(static & exact)
    # the guard never invents dups — everything verifies on exact cosine
    assert auto <= exact


def test_decode_real_netpbm_in_tree(spark):
    """decoder='real' on netpbm payloads runs EVERYWHERE (no Pillow):
    P5 grayscale and P6 RGB decode in-tree; resize round-trips as PGM."""
    # P5: 16x4 uniform gray 128; P6: 4x2 pure red (luma = 299*255//1000)
    p5 = b"P5\n# comment\n16 4\n255\n" + bytes([128]) * 64
    p6 = b"P6\n8 2\n255\n" + bytes([255, 0, 0]) * 16
    df = spark.createDataFrame(
        [
            (0, "image", bytearray(p5), 16, 4, None, "pgm"),
            (1, "image", bytearray(p6), 8, 2, None, "ppm"),
            (2, "image", bytearray(b"P5\nnot really"), 1, 1, None, "pgm"),
        ],
        "asset_id: long, media_type: string, payload: binary, width: int, "
        "height: int, duration_ms: long, codec: string",
    )
    rows = {r.asset_id: r for r in decode_features(df, decoder="real").collect()}
    assert rows[0].decode_error is None
    assert all(math.isclose(v, 128 / 255.0, rel_tol=1e-6) for v in rows[0].feature)
    assert rows[1].decode_error is None
    red_luma = (255 * 299) // 1000 / 255.0
    assert all(math.isclose(v, red_luma, rel_tol=1e-6) for v in rows[1].feature)
    assert rows[2].decode_error is not None and rows[2].feature is None

    resized = {r.asset_id: r for r in resize_images(df, 8, 2, decoder="real").collect()}
    assert (resized[0].width, resized[0].height) == (8, 2)
    out = bytes(resized[0].payload)
    assert out.startswith(b"P5\n8 2\n255\n") and out.endswith(bytes([128]) * 16)
    # corrupt payload keeps original bytes + dims (detectable)
    assert (resized[2].width, resized[2].height) == (1, 1)
    assert bytes(resized[2].payload) == b"P5\nnot really"


def _y4m_bytes(frames, w=8, h=4, chroma=b"C420jpeg"):
    head = b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 %s\n" % (w, h, chroma)
    body = b""
    for val in frames:
        y = bytes([val]) * (w * h)
        cb_cr = bytes([128]) * (w * h // 2)  # 4:2:0 chroma, skipped
        body += b"FRAME\n" + y + cb_cr
    return head + body


def test_video_real_y4m_in_tree(spark):
    """decoder='real' video on YUV4MPEG2 runs EVERYWHERE (no PyAV):
    frame sampling yields Y-plane digests, features = strip means."""
    import hashlib

    data = _y4m_bytes([10, 20, 30, 40, 50])
    df = spark.createDataFrame(
        [
            (1, "video", bytearray(data), 8, 4, 200, "y4m"),
            (2, "video", bytearray(data[: len(data) // 2]), 8, 4, 200, "y4m"),
        ],
        "asset_id: long, media_type: string, payload: binary, width: int, "
        "height: int, duration_ms: long, codec: string",
    )
    frames = frame_sample(df, every_n=2, decoder="real").collect()
    got = {(r.asset_id, r.frame_index): r.frame_digest for r in frames}
    want_digest = lambda v: hashlib.md5(bytes([v]) * 32).hexdigest()
    assert got[(1, 0)] == want_digest(10)
    assert got[(1, 2)] == want_digest(30)
    assert got[(1, 4)] == want_digest(50)
    assert (1, 1) not in got and (1, 3) not in got
    # truncated container contributes its complete frames only, no crash
    assert all(aid == 1 or idx == 0 for (aid, idx) in got)

    feat = {r.asset_id: r for r in decode_features(df, decoder="real").collect()}
    assert feat[1].decode_error is None
    assert all(math.isclose(v, 10 / 255.0, rel_tol=1e-6) for v in feat[1].feature)


def test_netpbm_resize_upscale_and_color(spark):
    """Round-6 review findings: upscaling must replicate pixels (not pad
    black bands) and P6 RGB must survive resize as RGB."""
    p5 = b"P5\n2 2\n255\n" + bytes([10, 20, 30, 40])
    p6 = b"P6\n2 1\n255\n" + bytes([255, 0, 0, 0, 0, 255])  # red, blue
    df = spark.createDataFrame(
        [
            (0, "image", bytearray(p5), 2, 2, None, "pgm"),
            (1, "image", bytearray(p6), 2, 1, None, "ppm"),
        ],
        "asset_id: long, media_type: string, payload: binary, width: int, "
        "height: int, duration_ms: long, codec: string",
    )
    out = {r.asset_id: r for r in resize_images(df, 4, 2, decoder="real").collect()}
    up = bytes(out[0].payload)
    assert up.startswith(b"P5\n4 2\n255\n")
    # nearest replication: each source pixel doubled horizontally
    assert list(up[-8:]) == [10, 10, 20, 20, 30, 30, 40, 40]
    rgb = bytes(out[1].payload)
    assert rgb.startswith(b"P6\n4 2\n255\n")
    px = list(rgb[len(b"P6\n4 2\n255\n"):])
    rows = [px[i * 12 : (i + 1) * 12] for i in range(2)]
    assert rows[0] == rows[1]  # vertical replication
    assert rows[0] == [255, 0, 0, 255, 0, 0, 0, 0, 255, 0, 0, 255]


def _rows_sorted(df, key):
    return sorted(map(tuple, df.collect()), key=lambda t: t[: len(key)])


def test_assign_projection_matches_join(spark, sf_dir):
    """assign_clusters(method="projection") — the round-11 parameterised
    scale path (collect the bounded centroid table, one Arrow matrix pass +
    greatest(struct) argmax, zero exchanges) — is value-identical to the
    default join path on real data AND on the documented edge semantics
    (zero vector dropped, zero/NULL centroid never wins, ties to the
    smaller centroid id)."""
    from pyspark.sql import functions as F

    from ia_hadoop_tools_spark.operators.similarity import assign_clusters
    from ia_hadoop_tools_spark.session import load_tables

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    cent = emb.filter(F.col("vec_id") % 17 == 3).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid"),
    )
    join_out = assign_clusters(emb, cent)
    proj_out = assign_clusters(emb, cent, method="projection")
    assert _rows_sorted(join_out, ("vec_id",)) == _rows_sorted(
        proj_out, ("vec_id",)
    )

    # the projection plan is map-only: the join path's argmax aggregation
    # exchange is gone (the only Exchange left is ensure_min_partitions'
    # small-input round-robin spread, a no-op at scale)
    plan = proj_out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "ArrowEvalPython" in plan
    join_plan = join_out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in join_plan

    # edge semantics, both paths byte-equal: zero vector (dropped), tie
    # between orthonormal centroids (lower cid wins), zero-norm and
    # NULL-vector centroids (never candidates), RAGGED-dim vector (kept —
    # its denoms are nonzero so it IS a join member, every dot is null, so
    # it lands in the smallest nonzero-denom centroid id with a NULL cos)
    edge = spark.createDataFrame(
        [
            (1, [0.0, 0.0]),
            (2, [1.0, 0.0]),
            (3, [0.0, 2.0]),
            (4, [1.0, 1.0]),
            (5, [1.0, 2.0, 3.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    ecent = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0]), (12, [0.0, 0.0]), (13, None)],
        "centroid_id long, centroid array<double>",
    )
    j = _rows_sorted(assign_clusters(edge, ecent), ("vec_id",))
    p = _rows_sorted(
        assign_clusters(edge, ecent, method="projection"), ("vec_id",)
    )
    assert j == p
    assert [t[0] for t in j] == [2, 3, 4, 5]  # zero vector absent
    assert j[2][1] == 10  # tie -> smaller centroid id
    assert j[3][1] == 10 and j[3][2] is None  # ragged: kept, null cos

    # empty centroid table -> empty output on both paths
    empty_cent = ecent.filter(F.lit(False))
    assert assign_clusters(edge, empty_cent).count() == 0
    assert assign_clusters(edge, empty_cent, method="projection").count() == 0

    with pytest.raises(ValueError, match="method"):
        assign_clusters(edge, ecent, method="arrow")


def test_assign_projection_null_component_parity(spark):
    """ADVICE r11 (medium): a vector with a NULL COMPONENT gets a NULL
    HOF norm on the join path -> null denom -> the inner join DROPS it;
    the Arrow stack used to fold the null into NaN, pass den != 0, and
    keep the row with a NaN cosine (which then poisons downstream
    ordering).  Pinned both ways now, plus the distinct NaN-DATA case
    (NaN is a value, not a null: both paths keep the row with NaN cos)
    and a NULL-COMPONENT CENTROID (never a candidate on either path —
    and must not crash the float64 plane matrix)."""
    from pyspark.sql import functions as F

    from ia_hadoop_tools_spark.operators.similarity import assign_clusters

    nan = float("nan")
    edge = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [1.0, None]),   # null component -> dropped on both paths
            (3, [nan, 1.0]),    # NaN DATA -> kept with NaN cos on both
            (4, None),          # null vector -> dropped on both paths
        ],
        "vec_id long, embedding array<double>",
    )
    ecent = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0]), (12, [1.0, None])],
        "centroid_id long, centroid array<double>",
    )

    def norm(rows):
        # NaN != NaN: compare a stable rendering
        return [
            (r[0], r[1], "NaN" if r[2] != r[2] else r[2])
            for r in sorted(map(tuple, rows.collect()))
        ]

    j = norm(assign_clusters(edge, ecent))
    p = norm(assign_clusters(edge, ecent, method="projection"))
    assert j == p
    assert [t[0] for t in j] == [1, 3]  # 2 and 4 dropped on both paths
    assert j[0] == (1, 10, 1.0)
    assert j[1][2] == "NaN"  # NaN data propagates as NaN, not null
    # centroid 12 (null component) must never win
    assert all(t[1] in (10, 11) for t in j)


def test_assign_projection_fallbacks_to_join(spark):
    """ADVICE r11 (low x2): ragged centroid dims and an oversized
    centroid count fall back to the join path (with a warning) instead
    of raising / building an O(k) expression tree — same results."""
    import warnings

    from ia_hadoop_tools_spark.operators import similarity as sim

    edge = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    ragged = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0, 0.5])],
        "centroid_id long, centroid array<double>",
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = sim.assign_clusters(edge, ragged, method="projection")
        assert any("mixed centroid dimensions" in str(x.message) for x in w)
    joined = sim.assign_clusters(edge, ragged)
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, joined.collect())
    )

    ok = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0]), (12, [0.5, 0.5])],
        "centroid_id long, centroid array<double>",
    )
    orig = sim.PROJECTION_MAX_CENTROIDS
    sim.PROJECTION_MAX_CENTROIDS = 2
    try:
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            out = sim.assign_clusters(edge, ok, method="projection")
            assert any("ceiling" in str(x.message) for x in w)
        assert sorted(map(tuple, out.collect())) == sorted(
            map(tuple, sim.assign_clusters(edge, ok).collect())
        )
        # ann_ivf_topk takes the same fallback
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            p = sim.ann_ivf_topk(
                edge, edge.limit(1), k=2, num_centroids=3, nprobe=2,
                assign_method="projection",
            )
            assert any("ceiling" in str(x.message) for x in w)
        j = sim.ann_ivf_topk(edge, edge.limit(1), k=2, num_centroids=3, nprobe=2)
        assert sorted(map(tuple, p.collect())) == sorted(
            map(tuple, j.collect())
        )
    finally:
        sim.PROJECTION_MAX_CENTROIDS = orig


def test_ann_ivf_assign_projection_matches_join(spark):
    """ann_ivf_topk(assign_method="projection") returns the identical
    result frame, including the zero-norm-vector assignment (every cosine
    NULL -> both orderings fall through to the smallest centroid id)."""
    from pyspark.sql import functions as F

    from ia_hadoop_tools_spark.operators.similarity import ann_ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(emb.first().embedding)
    zero = spark.createDataFrame(
        [(99_991, [0.0] * dim)], "vec_id: long, embedding: array<double>"
    )
    nanv = [float("nan")] + [0.5] * (dim - 1)
    nullv = [1.0, None] + [0.25] * (dim - 2)
    odd = spark.createDataFrame(
        [(99_992, nanv), (99_993, nullv)],
        "vec_id: long, embedding: array<double>",
    )
    corpus = emb.select("vec_id", "embedding").unionByName(zero).unionByName(odd)
    queries = emb.limit(6)
    kw = dict(k=4, num_centroids=12, nprobe=3)
    j = ann_ivf_topk(corpus, queries, **kw)
    p = ann_ivf_topk(corpus, queries, assign_method="projection", **kw)
    key = ("query_id", "neighbor_id")

    def _nn(rows):  # NaN != NaN: stabilize for comparison
        return [
            tuple("NaN" if x != x else x for x in t) for t in rows
        ]

    assert _nn(_rows_sorted(j, key)) == _nn(_rows_sorted(p, key))

    with pytest.raises(ValueError, match="assign_method"):
        ann_ivf_topk(corpus, queries, assign_method="x", **kw)


def test_semdedup_prototype_assign_method_passthrough(spark):
    """semdedup / prototype_prune expose the knob and stay value-identical
    under it (the assignment is the only step that changes)."""
    from pyspark.sql import functions as F

    from ia_hadoop_tools_spark.operators.similarity import (
        prototype_prune,
        semdedup,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cent = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid"),
    )
    key = ("vec_id",)
    s_j = semdedup(emb, cent, threshold=0.35, auto_planes=False)
    s_p = semdedup(
        emb, cent, threshold=0.35, auto_planes=False,
        assign_method="projection",
    )
    assert _rows_sorted(s_j, key) == _rows_sorted(s_p, key)

    p_j = prototype_prune(emb, cent, keep_frac=0.5)
    p_p = prototype_prune(emb, cent, keep_frac=0.5, assign_method="projection")
    assert _rows_sorted(p_j, key) == _rows_sorted(p_p, key)
