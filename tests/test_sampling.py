"""Deterministic sampling / packing tests (operators/sampling.py)."""

from __future__ import annotations

from ia_hadoop_tools_spark.operators.sampling import (
    pack_sequences,
    sample_hash,
    sample_stratified,
)


def _docs(spark, n=400):
    return spark.createDataFrame(
        [(i, f"src{i % 4}", 10 + i % 90) for i in range(n)],
        "doc_id: long, source: string, n_tokens: long",
    )


def test_sample_hash_deterministic_and_proportional(spark):
    d = _docs(spark)
    a = {r.doc_id for r in sample_hash(d, 0.5).collect()}
    b = {r.doc_id for r in sample_hash(d.repartition(7), 0.5).collect()}
    assert a == b  # content-addressed: partitioning can't change the sample
    assert 0.35 <= len(a) / 400 <= 0.65
    sub = {r.doc_id for r in sample_hash(d, 0.2).collect()}
    assert sub <= a  # nested: smaller fraction is a subset of larger


def test_sample_stratified_fractions(spark):
    d = _docs(spark)
    out = sample_stratified(d, {"src0": 1.0, "src1": 0.0}, "source")
    got = {r.source for r in out.collect()}
    n_src0 = out.filter("source = 'src0'").count()
    assert got == {"src0"}  # src1 dropped, unlisted strata default 0.0
    assert n_src0 == 100


def test_pack_sequences_layout(spark):
    d = spark.createDataFrame(
        [(1, 30), (2, 50), (3, 40), (4, 10)],
        "doc_id: long, n_tokens: long",
    )
    got = {
        r.doc_id: (r.seq_start, r.bin, r.bin_offset)
        for r in pack_sequences(d, budget=64).collect()
    }
    # stream: doc1 @0, doc2 @30, doc3 @80, doc4 @120
    assert got == {
        1: (0, 0, 0),
        2: (30, 0, 30),
        3: (80, 1, 16),
        4: (120, 1, 56),
    }


def test_pack_sequences_per_stratum(spark):
    d = spark.createDataFrame(
        [(1, "a", 40), (2, "b", 40), (3, "a", 40), (4, "b", 40)],
        "doc_id: long, source: string, n_tokens: long",
    )
    got = {
        r.doc_id: (r.source, r.seq_start, r.bin)
        for r in pack_sequences(d, budget=64, strata_col="source").collect()
    }
    assert got == {
        1: ("a", 0, 0),
        3: ("a", 40, 0),
        2: ("b", 0, 0),
        4: ("b", 40, 0),
    }


def test_pack_sequences_global_path_is_prefix_sum_not_single_window(spark):
    """strata_col=None must not move the corpus into one window partition:
    the range-sorted local-window + offsets formulation must match the
    naive single-window result exactly, and the plan must contain no
    empty-partition-spec Window."""
    import random as _random

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from ia_hadoop_tools_spark.operators.sampling import pack_sequences

    rng = _random.Random(11)
    rows = [(i, rng.randrange(1, 50)) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long").repartition(16)
    out = pack_sequences(df, budget=64)
    got = {r.doc_id: (r.seq_start, r.bin, r.bin_offset) for r in out.collect()}
    # naive reference
    acc = 0
    want = {}
    for i, n in sorted(rows):
        want[i] = (acc, acc // 64, acc % 64)
        acc += n
    assert got == want
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every Window in the plan must be partitioned (no global-window node)
    import re as _re

    for m in _re.finditer(r"Window \[", plan):
        frag = plan[m.start():m.start() + 300]
        assert "windowspecdefinition(__pid" in frag or "windowspecdefinition" not in frag, frag
    from ia_hadoop_tools_spark.operators.sampling import release_pack_cache

    release_pack_cache(out)


def test_pack_sequences_validates_budget(spark):
    import pytest

    from ia_hadoop_tools_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame([(1, 5)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, budget=0)


def test_split_corpus_deterministic_and_growth_stable(spark):
    from ia_hadoop_tools_spark.operators.sampling import split_corpus

    df = spark.createDataFrame([(i,) for i in range(3000)], ["doc_id"])
    splits = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    out = {r.doc_id: r.split for r in split_corpus(df, splits).collect()}
    # exhaustive (fractions sum to 1) and roughly proportional
    assert all(v is not None for v in out.values())
    from collections import Counter

    c = Counter(out.values())
    assert 0.75 < c["train"] / 3000 < 0.85
    assert 0.06 < c["val"] / 3000 < 0.14
    # growth-stable: assignments on a SUBSET are identical
    sub = spark.createDataFrame([(i,) for i in range(1000)], ["doc_id"])
    out_sub = {r.doc_id: r.split for r in split_corpus(sub, splits).collect()}
    assert all(out[i] == out_sub[i] for i in range(1000))
    # disjointness is structural (one row, one split value); partial
    # fractions leave a NULL remainder
    part = {r.doc_id: r.split
            for r in split_corpus(sub, [("train", 0.5)]).collect()}
    assert any(v is None for v in part.values())
    assert all(v in ("train", None) for v in part.values())
    # uncorrelated with sample_hash buckets: a 10% hash sample must not
    # concentrate into one split
    from ia_hadoop_tools_spark.operators.sampling import sample_hash

    sampled = {r.doc_id for r in sample_hash(df, 0.1).collect()}
    csamp = Counter(out[i] for i in sampled)
    assert csamp["train"] / len(sampled) < 0.95 and len(csamp) >= 2

    import pytest as _pytest

    with _pytest.raises(ValueError):
        split_corpus(df, [])
    with _pytest.raises(ValueError):
        split_corpus(df, [("a", 0.8), ("b", 0.3)])
    with _pytest.raises(ValueError):
        split_corpus(df, [("a", 0.5), ("a", 0.5)])


def test_split_corpus_rejects_bad_fractions(spark):
    from ia_hadoop_tools_spark.operators.sampling import split_corpus

    df = spark.createDataFrame([(1,)], ["doc_id"])
    import pytest as _pytest

    # negative fraction would pass a sum-only check but corrupt bounds
    with _pytest.raises(ValueError, match="< 0"):
        split_corpus(df, [("train", 0.9), ("val", -0.5), ("test", 0.6)])
    with _pytest.raises(ValueError, match="not finite"):
        split_corpus(df, [("train", float("nan"))])
    with _pytest.raises(ValueError, match="non-empty"):
        split_corpus(df, [("", 0.5)])


def test_corpus_shuffle_deterministic_any_parallelism(spark):
    from ia_hadoop_tools_spark.operators.sampling import corpus_shuffle

    d = _docs(spark)
    a = {
        r.doc_id: (r.shard, r.pos)
        for r in corpus_shuffle(d, 8, seed=7).collect()
    }
    b = {
        r.doc_id: (r.shard, r.pos)
        for r in corpus_shuffle(d.repartition(13), 8, seed=7).collect()
    }
    assert a == b  # contract: same seed => same assignment AND order
    # every shard's positions are exactly 0..len-1 (dense, 0-based)
    by_shard: dict[int, list[int]] = {}
    for s, p in a.values():
        by_shard.setdefault(s, []).append(p)
    assert set(by_shard) <= set(range(8))
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps))), s
    # uniform hash => no empty / wildly skewed shard at n=400
    sizes = [len(ps) for ps in by_shard.values()]
    assert len(by_shard) == 8 and max(sizes) <= 3 * min(sizes)


def test_corpus_shuffle_seed_and_epoch_decorrelate(spark):
    from ia_hadoop_tools_spark.operators.sampling import corpus_shuffle

    d = _docs(spark)
    base = {
        r.doc_id: (r.shard, r.pos)
        for r in corpus_shuffle(d, 4, seed=1).collect()
    }
    other_seed = {
        r.doc_id: (r.shard, r.pos)
        for r in corpus_shuffle(d, 4, seed=2).collect()
    }
    next_epoch = {
        r.doc_id: (r.shard, r.pos)
        for r in corpus_shuffle(d, 4, seed=1, epoch=1).collect()
    }
    # decorrelated = a large majority of docs move (shard, pos)
    moved_seed = sum(1 for k in base if base[k] != other_seed[k])
    moved_epoch = sum(1 for k in base if base[k] != next_epoch[k])
    assert moved_seed > 300 and moved_epoch > 300
    assert base == {
        r.doc_id: (r.shard, r.pos)
        for r in corpus_shuffle(d, 4, seed=1, epoch=0).collect()
    }


def test_corpus_shuffle_validates_and_single_shard(spark):
    import pytest as _pytest

    from ia_hadoop_tools_spark.operators.sampling import corpus_shuffle

    d = _docs(spark, n=20)
    with _pytest.raises(ValueError):
        corpus_shuffle(d, 0)
    one = corpus_shuffle(d, 1, seed=3).collect()
    assert {r.shard for r in one} == {0}
    assert sorted(r.pos for r in one) == list(range(20))


def test_write_shuffled_shards_one_sorted_file_per_shard(spark, tmp_path):
    import os

    from ia_hadoop_tools_spark.operators.sampling import (
        corpus_shuffle,
        write_shuffled_shards,
    )

    d = _docs(spark, n=200)
    out = str(tmp_path / "shuf")
    write_shuffled_shards(d, out, n_shards=4, seed=9)
    expect = {
        r.doc_id: (r.shard, r.pos)
        for r in corpus_shuffle(d, 4, seed=9).collect()
    }
    for shard in range(4):
        sdir = os.path.join(out, f"shard={shard}")
        files = [f for f in os.listdir(sdir) if f.endswith(".parquet")]
        assert len(files) == 1, (shard, files)  # wholly one task per shard
        # file row order IS the training order (no re-sort needed to replay)
        import pyarrow.parquet as pq

        tbl = pq.read_table(os.path.join(sdir, files[0]))
        ids = tbl.column("doc_id").to_pylist()
        poss = tbl.column("pos").to_pylist()
        assert poss == sorted(poss)
        assert [(expect[i][0], expect[i][1]) for i in ids] == [
            (shard, p) for p in poss
        ]


def test_corpus_shuffle_strata_mode_equals_per_stratum(spark):
    """strata_col scopes (shard, pos) per stratum in ONE plan and must be
    bit-identical to shuffling each stratum slice separately (the
    assemble_corpus one-pass contract)."""
    from ia_hadoop_tools_spark.operators.sampling import corpus_shuffle

    d = _docs(spark)  # has a 4-value 'source' column
    combined = {
        (r.doc_id): (r.source, r.shard, r.pos)
        for r in corpus_shuffle(d, 4, seed=6, strata_col="source").collect()
    }
    separate = {}
    for src in ("src0", "src1", "src2", "src3"):
        for r in corpus_shuffle(
            d.filter(f"source = '{src}'"), 4, seed=6
        ).collect():
            separate[r.doc_id] = (src, r.shard, r.pos)
    assert combined == separate


def test_split_leakage_detects_cross_split_dups(spark):
    from ia_hadoop_tools_spark.operators.sampling import (
        split_corpus,
        split_leakage,
    )

    splits = [("train", 0.5), ("val", 0.5)]
    # 40 docs sharing one text: with content-addressed 50/50 assignment
    # the group straddles both splits with near-certainty; unique-text
    # docs can never leak
    rows = [(i, "shared boilerplate text") for i in range(40)]
    rows += [(100 + i, f"unique text {i}") for i in range(20)]
    d = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = split_leakage(d, splits).collect()
    assert len(got) == 1
    (g,) = got
    assert g.n_docs == 40 and g.n_splits == 2 and g.splits == "train,val"
    assert g.min_doc_id == 0
    # consistency: every leaked group's members really do span splits
    assigned = {
        r.doc_id: r.split for r in split_corpus(d, splits).collect()
    }
    spans = {assigned[i] for i in range(40)}
    assert spans == {"train", "val"}
    # no leakage when everything lands in one split
    none = split_leakage(d, [("all", 1.0)]).collect()
    assert none == []


def test_split_leakage_near_detects_cross_split_neardups(spark):
    from ia_hadoop_tools_spark.operators.sampling import (
        split_corpus,
        split_leakage_near,
    )

    splits = [("train", 0.5), ("val", 0.5)]
    # engineer a near-dup group that straddles splits: find one train id
    # and one val id under the content-addressed assignment, give them
    # ~90%-Jaccard texts (NOT byte-identical), plus a same-split near-dup
    # pair (must NOT be reported) and unrelated docs (no pairs at all)
    ids = list(range(60))
    probe = spark.createDataFrame([(i,) for i in ids], "doc_id: long")
    assigned = {r.doc_id: r.split for r in split_corpus(probe, splits).collect()}
    train_ids = [i for i in ids if assigned[i] == "train"]
    val_ids = [i for i in ids if assigned[i] == "val"]
    assert len(train_ids) >= 2 and len(val_ids) >= 1
    a, b = train_ids[0], val_ids[0]  # cross-split near-dup pair
    c, e = train_ids[0], train_ids[1]  # same-split near-dup pair (c==a ok)
    base = "the quick brown fox jumps over the lazy dog near the old river bank"
    rows = [
        (a, base + " tonight"),
        (b, base + " today"),
        (e, base + " tomorrow"),  # same split as a: pair (a,e) suppressed
        (999, "completely unrelated content about spark physical plans"),
    ]
    d = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = split_leakage_near(d, splits, threshold=0.5)
    got = {(r.id_a, r.id_b): (r.split_a, r.split_b, r.jaccard) for r in out.collect()}
    out.shingle_cache.unpersist()
    # exactly the cross-split pairs: (a,b) and (e,b) — never (a,e)
    expect_keys = {tuple(sorted(p)) for p in [(a, b), (e, b)]}
    assert set(got) == expect_keys
    for (x, y), (sx, sy, jac) in got.items():
        assert {sx, sy} == {"train", "val"}
        assert sx == assigned.get(x, sx) and sy == assigned.get(y, sy)
        assert jac >= 0.5
    # no leakage when everything is one split
    none = split_leakage_near(d, [("all", 1.0)], threshold=0.5)
    assert none.collect() == []
    none.shingle_cache.unpersist()


def test_output_column_clash_raises(spark):
    import pytest

    from ia_hadoop_tools_spark.operators.sampling import (
        corpus_shuffle,
        split_corpus,
    )

    d = spark.createDataFrame(
        [(1, "train", 0), (2, "val", 1)], "doc_id: long, split: string, pos: long"
    )
    with pytest.raises(ValueError, match="split_corpus.*split"):
        split_corpus(d, [("a", 1.0)])
    with pytest.raises(ValueError, match="corpus_shuffle.*pos"):
        corpus_shuffle(d, 4)


def test_cap_per_stratum(spark):
    import pytest

    from ia_hadoop_tools_spark.operators.sampling import cap_per_stratum

    d = spark.createDataFrame(
        [(i, f"src{i % 3}") for i in range(90)], "doc_id: long, source: string"
    )
    out = cap_per_stratum(d, 5)
    got = [(r.doc_id, r.source) for r in out.collect()]
    per = {}
    for doc_id, src in got:
        per[src] = per.get(src, 0) + 1
    assert per == {"src0": 5, "src1": 5, "src2": 5}
    # deterministic at any parallelism / input order
    again = sorted(
        (r.doc_id, r.source)
        for r in cap_per_stratum(d.repartition(13), 5).collect()
    )
    assert sorted(got) == again
    # a different seed picks a different representative sample
    other = sorted(
        (r.doc_id, r.source) for r in cap_per_stratum(d, 5, seed=1).collect()
    )
    assert other != sorted(got)
    # strata smaller than n pass through whole
    assert cap_per_stratum(d, 100).count() == 90
    with pytest.raises(ValueError, match="n must be"):
        cap_per_stratum(d, 0)
    # the rank filter is eligible for WindowGroupLimit pushdown (prunes
    # map-side before the shuffle — the day_limit plan shape)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_temperature_fractions_hand_computed(spark):
    import pytest
    from pyspark.sql import functions as F

    from ia_hadoop_tools_spark.operators.sampling import (
        sample_stratified,
        temperature_fractions,
    )

    # sizes: a=800, b=150, c=50 (total 1000)
    d = spark.createDataFrame(
        [(i, "a" if i < 800 else "b" if i < 950 else "c") for i in range(1000)],
        "doc_id: long, source: string",
    )
    # alpha=1: natural mix — every stratum keeps target/total
    f1 = temperature_fractions(d, 1.0, 500)
    assert f1 == {"a": 0.5, "b": 0.5, "c": 0.5}
    # alpha=0: equalize — target/3 each, but c (50 docs) caps at 1.0 and
    # its shortfall (450/3 - 50 = 100) redistributes to a and b; b
    # (150 < 200) then caps too, leaving a with 250/800
    f0 = temperature_fractions(d, 0.0, 450)
    assert f0["c"] == 1.0 and f0["b"] == 1.0
    assert abs(f0["a"] - 250 / 800) < 1e-9
    # expected kept rows meets the target
    exp = sum(f0[s] * n for s, n in (("a", 800), ("b", 150), ("c", 50)))
    assert abs(exp - 450) < 1e-6
    # alpha between: head damped relative to natural share
    fh = temperature_fractions(d, 0.5, 300)
    assert fh["c"] > fh["b"] > fh["a"]
    # composes with sample_stratified; realized size near expectation
    kept = sample_stratified(d, f1, "source").count()
    assert 400 <= kept <= 600
    # weight_col: token-budget targeting
    dt = d.withColumn("n_tokens", (F.col("doc_id") % 5 + 1).cast("long"))
    ft = temperature_fractions(dt, 1.0, 1500, weight_col="n_tokens")
    assert set(ft) == {"a", "b", "c"} and all(0 < v <= 1 for v in ft.values())
    with pytest.raises(ValueError, match="alpha"):
        temperature_fractions(d, -1, 10)
    with pytest.raises(ValueError, match="target_rows"):
        temperature_fractions(d, 1.0, 0)
    assert temperature_fractions(d.filter("doc_id < 0"), 1.0, 10) == {}


def test_temperature_fractions_waterfill_invariants():
    """Property test of the driver-side waterfill (pure function of the
    size dict, so no Spark needed — exercised via a stub frame)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ia_hadoop_tools_spark.operators.sampling import (
        temperature_fractions,
    )

    class _StubDF:
        """Quacks like the one groupBy().agg().collect() call."""

        def __init__(self, sizes):
            self._sizes = sizes

        def groupBy(self, col):
            return self

        def agg(self, *a):
            return self

        def collect(self):
            return [
                {"source": k, "__c": v} for k, v in self._sizes.items()
            ]

    @given(
        sizes=st.dictionaries(
            st.text(
                alphabet="abcdefgh", min_size=1, max_size=3
            ),
            st.integers(min_value=1, max_value=10_000),
            min_size=1,
            max_size=8,
        ),
        alpha=st.floats(min_value=0.0, max_value=2.0),
        target=st.integers(min_value=1, max_value=50_000),
    )
    @settings(max_examples=200, deadline=None)
    def check(sizes, alpha, target):
        fr = temperature_fractions(_StubDF(sizes), alpha, target)
        assert set(fr) == set(sizes)
        assert all(0.0 < v <= 1.0 for v in fr.values())
        expected = sum(fr[k] * sizes[k] for k in sizes)
        want = min(target, sum(sizes.values()))
        # expectation meets the (achievable) target; fractions quantize
        # UP to the 1/1e6 sampler grid, so allow that one-grid-step
        # overshoot per stratum (never undershoot past rounding)
        slack = sum(sizes.values()) / 1_000_000 + 1e-4 * want + 1e-5
        assert want - 1e-4 * want - 1e-5 <= expected <= want + slack
        # determinism
        assert fr == temperature_fractions(_StubDF(sizes), alpha, target)

    check()


def test_sample_stratified_join_path_matches_case_path(spark):
    """Past _STRATA_CASE_MAX strata the threshold lookup becomes a
    broadcast join (a nested CASE overflows Catalyst's stack at crawl
    host counts) — both paths must keep the identical rows."""
    from ia_hadoop_tools_spark.operators import sampling
    from ia_hadoop_tools_spark.operators.sampling import sample_stratified

    d = spark.createDataFrame(
        [(i, f"s{i % 100}") for i in range(2000)],
        "doc_id: long, source: string",
    )
    fracs = {f"s{j}": (j % 10) / 10 for j in range(100)}  # 100 > 64 strata
    joined = {r.doc_id for r in sample_stratified(d, fracs).collect()}
    old_max = sampling._STRATA_CASE_MAX
    sampling._STRATA_CASE_MAX = 1000  # force the CASE path
    try:
        cased = {r.doc_id for r in sample_stratified(d, fracs).collect()}
    finally:
        sampling._STRATA_CASE_MAX = old_max
    assert joined == cased
    # unlisted + NULL strata keep default_fraction
    d2 = spark.createDataFrame(
        [(1, None), (2, "zz")], "doc_id: long, source: string"
    )
    assert sample_stratified(d2, fracs).count() == 0
    assert sample_stratified(d2, fracs, default_fraction=1.0).count() == 2


def test_hash_fraction_predicate_floor_and_temperature_grid(spark):
    """Sub-1e-6 fractions must keep SOMETHING: the predicate floors at
    one hash-grid step, and temperature_fractions quantizes UP."""
    from ia_hadoop_tools_spark.operators.sampling import (
        hash_fraction_predicate,
        temperature_fractions,
    )
    from pyspark.sql import functions as F

    d = spark.range(0, 3_000_000).withColumnRenamed("id", "doc_id")
    kept = d.filter(hash_fraction_predicate("doc_id", 4e-7)).count()
    assert kept > 0  # raw int(4e-7 * 1e6) == 0 kept nothing

    class _StubDF:
        def __init__(self, sizes):
            self._sizes = sizes

        def groupBy(self, col):
            return self

        def agg(self, *a):
            return self

        def collect(self):
            return [{"source": k, "__c": v} for k, v in self._sizes.items()]

    fr = temperature_fractions(_StubDF({"web": 5_000_000}), 1.0, 2)
    # exact frac 4e-7 quantizes UP to the 1e-6 grid, not down to zero
    assert fr["web"] == 1e-6


def _cur_docs(spark, counts):
    """counts: {phase: n} -> (doc_id, phase) frame with dense ids."""
    rows, i = [], 0
    for p, n in counts.items():
        for _ in range(n):
            rows.append((i, p))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, phase int")


def test_curriculum_shuffle_phase_major_order(spark):
    from ia_hadoop_tools_spark.operators.sampling import curriculum_shuffle

    df = _cur_docs(spark, {0: 30, 1: 30, 2: 30})
    out = curriculum_shuffle(df, 6, "phase", seed=1).collect()
    assert len(out) == 90
    # every shard holds exactly one phase, and shard ranges follow
    # phase order (the phase-major global (shard, pos) order)
    shard_phase = {}
    for r in out:
        shard_phase.setdefault(r["shard"], set()).add(r["phase"])
    assert all(len(ps) == 1 for ps in shard_phase.values())
    bounds = {
        p: (
            min(s for s, ps in shard_phase.items() if ps == {p}),
            max(s for s, ps in shard_phase.items() if ps == {p}),
        )
        for p in (0, 1, 2)
    }
    assert bounds[0][1] < bounds[1][0] <= bounds[1][1] < bounds[2][0]
    # pos is a contiguous 0..k-1 run within every shard
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))


def test_curriculum_shuffle_apportionment_and_min_one(spark):
    from ia_hadoop_tools_spark.operators.sampling import curriculum_shuffle

    # 90/10 split over 10 shards: 1 guaranteed each + 8 spare by largest
    # remainder of exact quotas -> 8 and 2
    df = _cur_docs(spark, {0: 90, 1: 10})
    out = curriculum_shuffle(df, 10, "phase").collect()
    shards = {p: set() for p in (0, 1)}
    for r in out:
        shards[r["phase"]].add(r["shard"])
    assert len(shards[0]) == 8 and len(shards[1]) == 2
    # a tiny phase still owns a full shard
    df2 = _cur_docs(spark, {0: 99, 1: 1})
    out2 = curriculum_shuffle(df2, 4, "phase").collect()
    tiny = {r["shard"] for r in out2 if r["phase"] == 1}
    big = {r["shard"] for r in out2 if r["phase"] == 0}
    assert len(tiny) == 1 and not (tiny & big)


def test_curriculum_shuffle_determinism_and_epochs(spark):
    from ia_hadoop_tools_spark.operators.sampling import curriculum_shuffle

    df = _cur_docs(spark, {0: 40, 1: 40})
    a = sorted(map(tuple, curriculum_shuffle(df, 4, "phase", seed=7).collect()))
    b = sorted(
        map(
            tuple,
            curriculum_shuffle(
                df.repartition(13), 4, "phase", seed=7
            ).collect(),
        )
    )
    assert a == b  # any-parallelism determinism (the corpus_shuffle contract)
    e0 = {r["doc_id"]: (r["shard"], r["pos"])
          for r in curriculum_shuffle(df, 4, "phase", seed=7).collect()}
    e1 = curriculum_shuffle(df, 4, "phase", seed=7, epoch=1).collect()
    moved = sum(1 for r in e1 if (r["shard"], r["pos"]) != e0[r["doc_id"]])
    assert moved > 30  # epoch bump decorrelates the within-phase order
    # ...but the phase shard-ranges stay put (phase 0 owns shards < 2)
    assert all((r["phase"] == 0) == (r["shard"] < 2) for r in e1)


def test_curriculum_shuffle_validation(spark):
    import pytest as _pt

    from ia_hadoop_tools_spark.operators.sampling import curriculum_shuffle

    df = _cur_docs(spark, {0: 5, 1: 5, 2: 5})
    with _pt.raises(ValueError, match="phases"):
        curriculum_shuffle(df, 2, "phase")
    withnull = spark.createDataFrame(
        [(0, 0), (1, None)], "doc_id long, phase int"
    )
    with _pt.raises(ValueError, match="NULL"):
        curriculum_shuffle(withnull, 4, "phase")
    # empty corpus keeps the output shape
    empty = spark.createDataFrame([], "doc_id long, phase int")
    assert curriculum_shuffle(empty, 4, "phase").columns == [
        "doc_id", "phase", "shard", "pos",
    ]


def test_hamilton_alloc_properties():
    """Property-test the pure apportionment (the fuzz the round-8 review
    ran once, made permanent): sums exact, min one, quota deviation < 1
    on the spare pool, determinism."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ia_hadoop_tools_spark.operators.sampling import hamilton_alloc

    @settings(max_examples=300, deadline=None)
    @given(
        counts=st.lists(st.integers(1, 10_000), min_size=1, max_size=24),
        extra=st.integers(0, 200),
    )
    def check(counts, extra):
        n_shards = len(counts) + extra
        alloc = hamilton_alloc(counts, n_shards)
        assert sum(alloc) == n_shards
        assert all(a >= 1 for a in alloc)
        # Hamilton quota property on the spare pool: each phase's extras
        # are floor(quota) or floor(quota) + 1
        total, spare = sum(counts), n_shards - len(counts)
        for c, a in zip(counts, alloc):
            fl = (c * spare) // total
            assert a - 1 in (fl, fl + 1), (counts, n_shards, alloc)
        # deterministic
        assert alloc == hamilton_alloc(counts, n_shards)

    check()

    import pytest as _pt

    with _pt.raises(ValueError, match="phases"):
        hamilton_alloc([1, 1, 1], 2)
    with _pt.raises(ValueError, match="positive"):
        hamilton_alloc([1, 0], 4)
    assert hamilton_alloc([], 4) == []


def test_curriculum_shuffle_strata_mode_equals_per_stratum(spark):
    """strata_col scopes counts/allocation/ranges/pos per stratum in one
    pass — bit-identical to running curriculum_shuffle on each stratum
    slice separately (the corpus_shuffle strata contract)."""
    from pyspark.sql import functions as F

    from ia_hadoop_tools_spark.operators.sampling import curriculum_shuffle

    rows = [(i, "a" if i < 70 else "b", i % 3) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, split string, phase int")
    joint = {
        (r["split"], r["doc_id"]): (r["shard"], r["pos"])
        for r in curriculum_shuffle(
            df, 6, "phase", seed=9, strata_col="split"
        ).collect()
    }
    for s in ("a", "b"):
        solo = {
            (s, r["doc_id"]): (r["shard"], r["pos"])
            for r in curriculum_shuffle(
                df.filter(F.col("split") == s), 6, "phase", seed=9
            ).collect()
        }
        assert solo == {k: v for k, v in joint.items() if k[0] == s}, s


def test_curriculum_census_soft_cap_escalates_for_valid_strata(
    spark, monkeypatch
):
    """ADVICE r8: many strata x a valid per-stratum phase count can
    legitimately exceed _CENSUS_CAP — the validation aggregate must
    accept it (same result as with a roomy cap), while an id-like
    phase_col still fails without collecting the census."""
    import pytest

    from ia_hadoop_tools_spark.operators import sampling
    from ia_hadoop_tools_spark.operators.sampling import curriculum_shuffle

    # 4 strata x 3 phases = 12 census rows; soft cap squeezed to 4
    rows = [(i, f"s{i % 4}", i % 3) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, split string, phase int")
    expect = sorted(
        map(
            tuple,
            curriculum_shuffle(
                df, 6, "phase", seed=5, strata_col="split"
            ).collect(),
        )
    )
    monkeypatch.setattr(sampling, "_CENSUS_CAP", 4)
    got = sorted(
        map(
            tuple,
            curriculum_shuffle(
                df, 6, "phase", seed=5, strata_col="split"
            ).collect(),
        )
    )
    assert got == expect
    # id-like phase_col: rejected by the 1-row validation aggregate
    with pytest.raises(ValueError, match="id-like"):
        curriculum_shuffle(df, 6, "doc_id", strata_col="split").collect()
    # NULL phases past the soft cap get the NULL diagnosis, not the
    # id-like message (count_distinct ignores NULLs — review r9)
    withnull = spark.createDataFrame(
        rows[:-1] + [(999, "s0", None)],
        "doc_id long, split string, phase int",
    )
    with pytest.raises(ValueError, match="contain NULLs"):
        curriculum_shuffle(withnull, 6, "phase", strata_col="split")
    # hard cap: a valid census past it needs the explicit opt-in
    monkeypatch.setattr(sampling, "_CENSUS_HARD_CAP", 8)
    with pytest.raises(ValueError, match="census_cap=12"):
        curriculum_shuffle(df, 6, "phase", strata_col="split")
    got2 = sorted(
        map(
            tuple,
            curriculum_shuffle(
                df, 6, "phase", seed=5, strata_col="split", census_cap=12
            ).collect(),
        )
    )
    assert got2 == expect


def test_assemble_curriculum_version(spark, tmp_path):
    """phase_col publishes an annealing version: within every split the
    shard sequence is phase-major, replay is content-identical, and the
    manifest records the column."""
    import glob as _glob

    from pyspark.sql import functions as F

    from ia_hadoop_tools_spark.operators.assemble import (
        assemble_corpus,
        read_manifest,
        read_version_frame,
    )

    d = spark.createDataFrame(
        [(i, f"text {i}", 5 + i % 11, i % 2) for i in range(200)],
        "doc_id: long, text: string, n_tokens: long, phase: int",
    )
    root = str(tmp_path / "ann")
    splits = [("train", 0.8), ("val", 0.2)]
    vdir = assemble_corpus(
        d, root, splits, n_shards=4, seed=6, phase_col="phase"
    )
    man = read_manifest(root)
    assert man["phase_col"] == "phase"
    frame = read_version_frame(spark, vdir)
    for s in ("train", "val"):
        got = frame.filter(F.col("split") == s).collect()
        if not got:
            continue
        lo = max(r["shard"] for r in got if r["phase"] == 0)
        hi = min(r["shard"] for r in got if r["phase"] == 1)
        assert lo < hi, (s, lo, hi)  # phase-major within the split
    # replay: same params => identical (split, shard, pos) assignment
    vdir2 = assemble_corpus(
        d, root, splits, n_shards=4, seed=6, phase_col="phase"
    )
    a = {r["doc_id"]: (r["split"], r["shard"], r["pos"])
         for r in frame.collect()}
    b = {r["doc_id"]: (r["split"], r["shard"], r["pos"])
         for r in read_version_frame(spark, vdir2).collect()}
    assert a == b
    # the fsck holds for annealing versions too (dense pos per shard,
    # counts vs manifest, unique ids)
    from ia_hadoop_tools_spark.operators.assemble import (
        verify_corpus_version,
    )

    assert verify_corpus_version(spark, root, id_col="doc_id")["ok"]
