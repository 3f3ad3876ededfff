"""Tests for the three round-4 pipeline operators: deterministic hash
sampling, as-of join, and duplicate-cluster connected components."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from taco_toolbox_spark.dedup.cluster import canonical_docs, connected_components
from taco_toolbox_spark.operators.asof import asof_join
from taco_toolbox_spark.operators.sampling import (
    hash_sample,
    stratified_hash_sample,
)


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 5000).withColumn(
        "grp", (F.col("id") % 4).cast("string")
    )


def test_hash_sample_deterministic_and_close_to_fraction(ids):
    a = hash_sample(ids, ["id"], 0.3, seed=1)
    b = hash_sample(ids, ["id"], 0.3, seed=1)
    na = a.count()
    # exact same rows, not merely same count
    assert a.exceptAll(b).count() == 0 and na == b.count()
    assert 0.25 < na / 5000 < 0.35  # binomial-ish tolerance at n=5000
    # a different seed samples a genuinely different subset
    c = hash_sample(ids, ["id"], 0.3, seed=2)
    assert a.exceptAll(c).count() > 0


def test_hash_sample_consistent_across_tables(ids, spark):
    """Sampling two tables by the same key keeps matching rows in both —
    the property that keeps joins alive through a sample."""
    other = spark.range(0, 5000).withColumn("payload", F.col("id") * 2)
    ka = {r.id for r in hash_sample(ids, ["id"], 0.2, seed=9).collect()}
    kb = {r.id for r in hash_sample(other, ["id"], 0.2, seed=9).collect()}
    assert ka == kb


def test_hash_sample_md5_matches_spark_and_portable_arith(ids):
    # md5 mode exists for cross-engine reproducibility; spot-check one row's
    # keep decision against hand-computed md5 arithmetic
    import hashlib

    kept = {r.id for r in hash_sample(ids, ["id"], 0.5, seed=7, hash_fn="md5").collect()}
    for key in (0, 1, 4999):
        h = int(hashlib.md5(f"{key}\x1f7".encode()).hexdigest()[:8], 16)
        assert (h % 1_000_000 < 500_000) == (key in kept)


def test_stratified_fractions_and_default(ids):
    s = stratified_hash_sample(
        ids, "grp", {"0": 1.0, "1": 0.0}, ["id"], default_fraction=0.5, seed=3
    )
    got = {r.grp: r.n for r in s.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert got.get("0") == 1250  # fraction 1.0 keeps every row
    assert "1" not in got  # fraction 0.0 keeps none
    assert 450 < got.get("2", 0) < 800  # default 0.5 of 1250
    assert 450 < got.get("3", 0) < 800


def test_sample_k_per_group_fixed_size_and_deterministic(ids):
    from taco_toolbox_spark.operators.sampling import hash_sample_k_per_group

    a = hash_sample_k_per_group(ids, ["grp"], ["id"], k=7, seed=1)
    assert {r.n for r in a.groupBy("grp").agg(F.count("*").alias("n")).collect()} == {7}
    b = hash_sample_k_per_group(ids, ["grp"], ["id"], k=7, seed=1)
    assert a.exceptAll(b).count() == 0  # identical rows on rerun
    # k larger than the group: the whole group survives, no padding
    tiny = ids.filter(F.col("id") < 3)
    assert hash_sample_k_per_group(tiny, ["grp"], ["id"], k=10).count() == 3
    # helper columns must not leak into the output
    assert set(a.columns) == {"id", "grp"}
    with pytest.raises(ValueError, match="k must be"):
        hash_sample_k_per_group(ids, ["grp"], ["id"], k=0)


def test_stratified_null_stratum_key(spark):
    """A None key in fractions governs NULL strata (plain equality would
    NULL-compare and silently drop them); unlisted strata still get the
    default; None mixed with str keys must not break the CASE build."""
    df = spark.createDataFrame(
        [(1, "web"), (2, None), (3, "books"), (4, None)],
        "id long, src string",
    )
    kept = stratified_hash_sample(
        df, "src", {None: 1.0, "web": 1.0}, ["id"], default_fraction=0.0
    )
    assert {r.id for r in kept.collect()} == {1, 2, 4}


def test_sampling_validates_fractions(ids):
    with pytest.raises(ValueError, match="fraction"):
        hash_sample(ids, ["id"], 1.5)
    with pytest.raises(ValueError, match="fraction"):
        stratified_hash_sample(ids, "grp", {"0": -0.1}, ["id"])


def test_hash_sample_plan_is_scan_plus_filter(ids):
    """Zero-shuffle: the sample predicate must not introduce an Exchange."""
    plan = hash_sample(ids, ["id"], 0.3)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------


def test_hash_bucket_md5_null_positions_distinct(spark):
    """md5-mode multi-column keys must keep NULL positions apart:
    ('a', NULL, 'b') and ('a', 'b', NULL) serialize differently (ADVICE
    r4: concat_ws silently skips nulls)."""
    from taco_toolbox_spark.operators.sampling import hash_bucket

    df = spark.createDataFrame(
        [("a", None, "b"), ("a", "b", None)],
        "c1 string, c2 string, c3 string",
    )
    got = [
        r.b
        for r in df.select(
            hash_bucket(["c1", "c2", "c3"], seed=3, hash_fn="md5").alias("b")
        ).collect()
    ]
    assert got[0] != got[1]
    # and both modes produce SOME bucket for null-keyed rows (no null-out)
    for fn in ("md5", "xxhash64"):
        vals = df.select(
            hash_bucket(["c2"], seed=1, hash_fn=fn).alias("b")
        ).collect()
        assert all(v.b is not None for v in vals)


def test_weighted_sample_tracks_weight(ids):
    from taco_toolbox_spark.operators.sampling import weighted_hash_sample

    # weight 0 keeps nothing; weight 1 keeps everything; NULL keeps nothing
    assert weighted_hash_sample(ids, F.lit(0.0), ["id"]).count() == 0
    assert weighted_hash_sample(ids, F.lit(1.0), ["id"]).count() == 5000
    assert weighted_hash_sample(ids, F.lit(None).cast("double"), ["id"]).count() == 0
    # out-of-range weights clamp rather than corrupt the threshold
    assert weighted_hash_sample(ids, F.lit(7.0), ["id"]).count() == 5000
    assert weighted_hash_sample(ids, F.lit(-3.0), ["id"]).count() == 0
    # a per-row ramp keeps ~ E[w] of rows and is rerun-identical
    w = F.col("id") / F.lit(5000.0)
    a = {r["id"] for r in weighted_hash_sample(ids, w, ["id"], seed=3).collect()}
    b = {r["id"] for r in weighted_hash_sample(ids, w, ["id"], seed=3).collect()}
    assert a == b
    assert abs(len(a) / 5000 - 0.5) < 0.05
    # kept set is biased toward high weights: mean kept id > mean overall
    assert sum(a) / len(a) > 2500


def test_mixture_sample_rates_and_saturation(ids):
    from taco_toolbox_spark.operators.sampling import mixture_sample

    # 4 groups of 1250; target 1000 rows at 50/30/20 over grp 0/1/2:
    # grp0 rate=min(1,500/1250)=0.4, grp1 0.24, grp2 0.16, grp3 dropped
    out = mixture_sample(
        ids, "grp", {"0": 0.5, "1": 0.3, "2": 0.2}, 1000, ["id"], seed=5
    )
    got = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(got) == {"0", "1", "2"}
    assert abs(got["0"] - 500) < 60 and abs(got["1"] - 300) < 50 and abs(got["2"] - 200) < 40
    # saturation: a quota bigger than the source caps at rate 1 (all 1250)
    sat = mixture_sample(ids, "grp", {"0": 1.0}, 10_000, ["id"], seed=5)
    assert sat.count() == 1250
    # schema untouched (internal _n dropped)
    assert out.columns == ids.columns
    with pytest.raises(ValueError):
        mixture_sample(ids.withColumn("_n", F.lit(1)), "grp", {"0": 1.0}, 10, ["id"])


def test_temperature_rates_flatten():
    from taco_toolbox_spark.operators.sampling import temperature_rates

    counts = {"web": 90_000, "books": 9_000, "code": 1_000}
    r1 = temperature_rates(counts, alpha=1.0, total_target=10_000)
    # alpha=1 is proportional: every source keeps the same rate
    assert len({round(v, 12) for v in r1.values()}) == 1
    r5 = temperature_rates(counts, alpha=0.5, total_target=10_000)
    # alpha<1 flattens: rare sources keep a LARGER fraction
    assert r5["code"] > r5["books"] > r5["web"]
    # expected output size == total_target when nothing saturates
    exp = sum(r5[s] * counts[s] for s in counts)
    assert abs(exp - 10_000) < 1e-6
    with pytest.raises(ValueError):
        temperature_rates(counts, alpha=0.0, total_target=100)


def test_hash_sample_k_per_group_reserved_names(spark):
    from taco_toolbox_spark.operators.sampling import hash_sample_k_per_group

    df = spark.createDataFrame([("g", 1, 0)], "g string, id long, _h long")
    with pytest.raises(ValueError, match="internal"):
        hash_sample_k_per_group(df, ["g"], ["id"], k=1)


def _ts(s):
    return dt.datetime(2025, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def asof_frames(spark):
    left = spark.createDataFrame(
        [("u1", _ts(10), "a"), ("u1", _ts(20), "b"), ("u1", _ts(5), "c"),
         ("u2", _ts(10), "d")],
        "k string, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [("u1", _ts(10), 1.0), ("u1", _ts(15), 2.0), ("u3", _ts(1), 9.0)],
        "k string, ts timestamp, rv double",
    )
    return left, right


def test_asof_backward_inclusive(asof_frames):
    left, right = asof_frames
    out = {
        (r.k, r.lv): (r.rv_m, r.ts_m)
        for r in asof_join(left, right, ["k"], "ts", "ts", ["rv"], suffix="_m").collect()
    }
    assert out[("u1", "a")] == (1.0, _ts(10))  # simultaneous row IS matched
    assert out[("u1", "b")] == (2.0, _ts(15))  # latest prior, not just any
    assert out[("u1", "c")] == (None, None)  # nothing precedes t=5
    assert out[("u2", "d")] == (None, None)  # key with no right rows at all


def test_asof_tolerance_nulls_stale_matches(asof_frames):
    left, right = asof_frames
    out = {
        (r.k, r.lv): r.rv_m
        for r in asof_join(
            left, right, ["k"], "ts", "ts", ["rv"], suffix="_m", tolerance_s=4
        ).collect()
    }
    assert out[("u1", "a")] == 1.0  # 0s old: kept
    assert out[("u1", "b")] is None  # 5s old > 4s tolerance: nulled


def test_asof_column_collision_raises(asof_frames):
    left, right = asof_frames
    with pytest.raises(ValueError, match="collide"):
        # right 'ts' carried as 'ts' collides with left's own 'ts'
        asof_join(left, right, ["k"], "ts", "ts", ["rv"], suffix="")
    # internal helper names are guarded too, not silently shadowed
    with pytest.raises(ValueError, match="internal"):
        asof_join(left.withColumn("_side", F.lit(0)), right,
                  ["k"], "ts", "ts", ["rv"])


def test_asof_matches_naive_on_random_frames(spark):
    """Seeded random frames: the union-tag window encoding must equal the
    naive per-left-row 'latest right at or before' definition, including
    duplicate left timestamps and sparse keys."""
    import random

    rng = random.Random(42)
    for _ in range(3):
        lrows = [
            (f"k{rng.randint(0, 4)}", i, float(rng.randint(0, 50)))
            for i in range(40)
        ]
        rrows = {
            (f"k{rng.randint(0, 5)}", float(rng.randint(0, 50)))
            for _ in range(30)
        }
        rrows = [(k, t, float(h)) for h, (k, t) in enumerate(sorted(rrows))]
        left = spark.createDataFrame(lrows, "k string, lid long, ts double")
        right = spark.createDataFrame(rrows, "k string, ts double, rv double")
        got = {
            r.lid: (r.rv_m, r.ts_m)
            for r in asof_join(
                left, right, ["k"], "ts", "ts", ["rv"], suffix="_m"
            ).collect()
        }
        for k, lid, ts in lrows:
            cands = [(rt, rv) for rk, rt, rv in rrows if rk == k and rt <= ts]
            want = (max(cands)[1], max(cands)[0]) if cands else (None, None)
            assert got[lid] == want, (k, lid, ts)


def test_asof_null_right_value_is_coherent(spark):
    """A right row whose value column is legitimately NULL must be
    matched AS THAT ROW: the left row gets (rv=NULL, ts=matched ts) —
    never an older row's value under a newer matched timestamp (ADVICE
    r4: per-column fill mixed rows; the struct fill may not)."""
    left = spark.createDataFrame(
        [("k", 3.0)], "k string, ts double"
    )
    right = spark.createDataFrame(
        [("k", 1.0, 5.0), ("k", 2.0, None)], "k string, ts double, rv double"
    )
    row = asof_join(left, right, ["k"], "ts", "ts", ["rv"], suffix="_m") \
        .collect()[0]
    assert row.ts_m == 2.0 and row.rv_m is None


def test_asof_chunked_parity_hot_key(spark):
    """chunk_s path (skew-proof distributed prefix) must equal the plain
    single-window path exactly, on a corpus dominated by one hot key with
    right rows scattered across chunk boundaries."""
    import random

    rng = random.Random(7)
    lrows = [("hot", i, float(rng.randint(0, 400))) for i in range(300)] + [
        (f"c{i}", 1000 + i, float(i)) for i in range(20)
    ]
    rrows = {("hot", float(rng.randint(0, 400))) for _ in range(60)} | {
        (f"c{i}", float(i - 1)) for i in range(0, 20, 2)
    }
    rrows = [(k, t, float(h)) for h, (k, t) in enumerate(sorted(rrows))]
    left = spark.createDataFrame(lrows, "k string, lid long, ts double")
    right = spark.createDataFrame(rrows, "k string, ts double, rv double")
    plain = asof_join(left, right, ["k"], "ts", "ts", ["rv"], suffix="_m")
    chunked = asof_join(
        left, right, ["k"], "ts", "ts", ["rv"], suffix="_m", chunk_s=50.0
    )
    assert plain.exceptAll(chunked).count() == 0
    assert chunked.exceptAll(plain).count() == 0
    # tolerance composes with the chunked path too
    tol_p = asof_join(left, right, ["k"], "ts", "ts", ["rv"],
                      suffix="_m", tolerance_s=30)
    tol_c = asof_join(left, right, ["k"], "ts", "ts", ["rv"],
                      suffix="_m", tolerance_s=30, chunk_s=50.0)
    assert tol_p.exceptAll(tol_c).count() == 0
    assert tol_c.exceptAll(tol_p).count() == 0


def test_asof_single_shuffle_plan(asof_frames):
    """The union-tag encoding must cost ONE shuffle (the window's), with no
    nested-loop join anywhere — the reason it survives 100 TB where the
    inequality-join encoding does not."""
    left, right = asof_frames
    plan = (
        asof_join(left, right, ["k"], "ts", "ts", ["rv"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_top_fraction_per_group(spark):
    from taco_toolbox_spark.operators.distribution import (
        top_fraction_per_group,
    )

    df = spark.createDataFrame(
        [("a", i, float(i)) for i in range(10)] + [("b", 100, 5.0)],
        "g string, id long, score double",
    )
    out = top_fraction_per_group(df, "score", 0.3, ["g"], ["id"])
    got = {(r.g, r.id) for r in out.collect()}
    # ceil(0.3*10)=3 best of group a; singleton group b always survives
    assert got == {("a", 9), ("a", 8), ("a", 7), ("b", 100)}
    # ties broken by id: two equal scores, keep_fraction selects exactly one
    tie = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 1.0)], "g string, id long, score double"
    )
    kept = top_fraction_per_group(tie, "score", 0.5, ["g"], ["id"]).collect()
    assert [(r.g, r.id) for r in kept] == [("a", 1)]
    with pytest.raises(ValueError, match="keep_fraction"):
        top_fraction_per_group(df, "score", 0.0, ["g"])


# ---------------------------------------------------------------------------
# time-range join
# ---------------------------------------------------------------------------


def test_range_join_matches_naive_filter(spark):
    """Bin replication must reproduce the direct inequality-join result
    exactly, including rows sitting on bin and window boundaries."""
    from taco_toolbox_spark.operators.rangejoin import time_range_join

    left = spark.createDataFrame(
        [("k", i, float(t)) for i, t in enumerate([0, 5, 59, 60, 61, 3600])],
        "k string, lid long, ts double",
    )
    right = spark.createDataFrame(
        [("k", j, float(t)) for j, t in enumerate([0, 1, 59, 60, 61, 120, 3599])],
        "k string, rid long, ts double",
    )
    got = {
        (r.lid, r.rid_r)
        for r in time_range_join(
            left, right, ["k"], "ts", "ts", -60.0, 0.0, right_cols=["rid"]
        ).collect()
    }
    want = {
        (l.lid, r.rid)
        for l in left.collect()
        for r in right.collect()
        if l.ts - 60.0 <= r.ts <= l.ts
    }
    assert got == want and len(want) > 0
    # boundary semantics: both ends inclusive
    assert (3, 0) in got and (3, 2) in got and (3, 3) in got  # t=60: 0,59,60


def test_temporal_ops_accept_parquet_ntz_timestamps(spark, tmp_path):
    """Parquet reads yield TIMESTAMP_NTZ, which Spark refuses to cast
    straight to double — both temporal operators must handle it (this
    exact gap broke j6_range_join on the real events table)."""
    from taco_toolbox_spark.operators.rangejoin import time_range_join

    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    spark.createDataFrame(
        [("k", 1, _ts(100))], "k string, lid long, ts timestamp"
    ).write.parquet(lp)
    spark.createDataFrame(
        [("k", 2, _ts(95)), ("k", 3, _ts(10))],
        "k string, rid long, ts timestamp",
    ).write.parquet(rp)
    ntz = lambda df: df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    left, right = ntz(spark.read.parquet(lp)), ntz(spark.read.parquet(rp))
    assert dict(left.dtypes)["ts"] == "timestamp_ntz"
    rj = time_range_join(left, right, ["k"], "ts", "ts", -10.0, 0.0,
                         right_cols=["rid"])
    assert {r.rid_r for r in rj.collect()} == {2}
    aj = asof_join(left, right, ["k"], "ts", "ts", ["rid"], tolerance_s=4.0)
    assert [r.rid_asof for r in aj.collect()] == [None]  # 5s old > 4s


def test_range_join_validates_and_plans_equi_join(spark):
    from taco_toolbox_spark.operators.rangejoin import time_range_join

    left = spark.createDataFrame([("k", 1, 10.0)], "k string, lid long, ts double")
    right = spark.createDataFrame([("k", 2, 11.0)], "k string, rid long, ts double")
    with pytest.raises(ValueError, match="lower_s"):
        time_range_join(left, right, ["k"], "ts", "ts", 5.0, -5.0)
    with pytest.raises(ValueError, match="collide"):
        time_range_join(left, right, ["k"], "ts", "ts", 0.0, 5.0,
                        right_cols=["ts"], suffix="")
    with pytest.raises(ValueError, match="internal"):
        time_range_join(left.withColumn("_bin", F.lit(9)), right,
                        ["k"], "ts", "ts", 0.0, 5.0)
    plan = (
        time_range_join(left, right, ["k"], "ts", "ts", 0.0, 5.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# connected components / canonical docs
# ---------------------------------------------------------------------------


def test_components_transitive_chain(spark):
    # 1-2, 2-3, 3-4 must merge though 1~4 was never emitted; 9-10 separate
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (9, 10)], "id_a long, id_b long"
    )
    got = {r.node: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 9: 9, 10: 9}


def test_components_max_iter_bound(spark):
    # a 6-node path needs ~4 hash-min rounds; max_iter=2 must refuse loudly
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(path, max_iter=2)
    got = {r.node: r.cluster_id for r in connected_components(path).collect()}
    assert set(got.values()) == {1}


def test_components_log_rounds_on_long_chain(spark):
    """The alternating star rounds must collapse a 33-node path well
    under its diameter: max_iter=10 suffices where pure neighbor-min
    label propagation needs ~32 rounds — the round-count property the
    curation pipeline's scaling depends on."""
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 33)], "id_a long, id_b long"
    )
    got = connected_components(path, max_iter=10)
    assert {r.cluster_id for r in got.collect()} == {1}


def test_components_amortized_convergence_checks(spark):
    """The driver-synchronized convergence action runs every
    ``check_every`` rounds, not every round — the per-round barrier was
    measured as the curation pipeline's residual Amdahl cost (VERDICT
    r4). Locks checks <= ceil(rounds / check_every)."""
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 33)], "id_a long, id_b long"
    )
    st: dict = {}
    connected_components(path, max_iter=12, check_every=3, stats=st).collect()
    assert st["rounds"] >= 2
    assert st["convergence_checks"] <= -(-st["rounds"] // 3)
    # and a tighter cadence still converges to the same answer
    st2: dict = {}
    got = connected_components(path, max_iter=12, check_every=1, stats=st2)
    assert {r.cluster_id for r in got.collect()} == {1}
    assert st2["convergence_checks"] == st2["rounds"]


def test_components_null_endpoints_dropped(spark):
    """Pairs with a NULL endpoint must not poison the min-labels or the
    convergence test (ADVICE r4): they are dropped at entry, the
    non-null nodes still cluster."""
    pairs = spark.createDataFrame(
        [(2, 1), (None, 3), (3, None), (2, 3)], "id_a long, id_b long"
    )
    got = {r.node: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_components_giant_star_hub(spark):
    """A star component whose hub touches every node (the giant-component
    shape that skewed the old label-keyed pointer-jump join) converges in
    the first checked round with node-keyed joins only."""
    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 400)] + [(500, 501)],
        "id_a long, id_b long",
    )
    st: dict = {}
    got = {
        r.node: r.cluster_id
        for r in connected_components(pairs, stats=st).collect()
    }
    assert all(got[i] == 0 for i in range(400))
    assert got[500] == 500 and got[501] == 500
    assert st["rounds"] <= 4


def test_components_string_ids(spark):
    """Ids only need to be orderable — string doc ids (UUIDs) must work,
    with the lexicographic min as the cluster id (guards the curate-job
    path, where a long cast would NULL string ids out silently)."""
    pairs = spark.createDataFrame(
        [("b", "a"), ("b", "c")], "id_a string, id_b string"
    )
    got = {r.node: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == {"a": "a", "b": "a", "c": "a"}


def test_canonical_docs_covers_singletons(spark):
    pairs = spark.createDataFrame([(3, 1), (5, 6)], "id_a long, id_b long")
    docs = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    rows = {r.doc_id: (r.cluster_id, r.is_canonical)
            for r in canonical_docs(pairs, docs).collect()}
    assert rows[1] == (1, True) and rows[3] == (1, False)
    assert rows[5] == (5, True) and rows[6] == (5, False)
    # never-paired docs are their own canonical cluster
    for d in (2, 4, 7):
        assert rows[d] == (d, True)
    # exactly one canonical per cluster
    assert sum(1 for c, canon in rows.values() if canon) == 5


def test_hash_split_deterministic_and_leak_free(spark):
    """Same key -> same split across runs and partitionings; keying by a
    group id keeps all of a group's rows in one split; remainder rows get
    NULL; plan is a pure projection (no exchange, no Python)."""
    from taco_toolbox_spark.operators.sampling import hash_split

    df = spark.createDataFrame(
        [(f"conv{i % 20}", i) for i in range(200)],
        "conv_id string, turn_idx int",
    )
    out = hash_split(df, ["conv_id"], {"train": 0.6, "val": 0.2}, seed=3)
    # group-level leak check: one split per conv_id
    per_conv = (
        out.groupBy("conv_id")
        .agg(F.countDistinct("split").alias("n"), F.first("split").alias("s"))
        .collect()
    )
    assert all(r["n"] <= 1 for r in per_conv)
    # 20% remainder -> NULL split exists with these fractions (0.6+0.2)
    labels = {r["s"] for r in per_conv}
    assert labels <= {"train", "val", None}
    # deterministic under repartitioning
    again = {
        (r["conv_id"], r["split"])
        for r in hash_split(
            df.repartition(13), ["conv_id"], {"train": 0.6, "val": 0.2}, seed=3
        ).select("conv_id", "split").distinct().collect()
    }
    first = {
        (r["conv_id"], r["split"])
        for r in out.select("conv_id", "split").distinct().collect()
    }
    assert first == again
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_hash_split_guards(spark):
    from taco_toolbox_spark.operators.sampling import hash_split

    df = spark.createDataFrame([("a", 1)], "conv_id string, split int")
    with pytest.raises(ValueError, match="split"):
        hash_split(df, ["conv_id"], {"train": 1.0})
    df2 = spark.createDataFrame([("a",)], "conv_id string")
    with pytest.raises(ValueError, match="sum <= 1"):
        hash_split(df2, ["conv_id"], {"train": 0.9, "val": 0.2})


def test_leakage_safe_split_clusters_never_straddle(spark):
    """Every member of a near-dup cluster lands in the SAME split, and the
    split is exactly hash_split of the cluster representative (verified
    against hand-computed md5 arithmetic), so a near-copy of a training
    doc can never leak into eval."""
    import hashlib

    from taco_toolbox_spark.dedup.cluster import leakage_safe_split

    docs = spark.createDataFrame(
        [(f"d{i:02d}", f"text {i}") for i in range(40)],
        "doc_id string, text string",
    )
    # chain d00~d01~d02 (transitive), pair d05~d06; rest singletons
    pairs = spark.createDataFrame(
        [("d00", "d01"), ("d01", "d02"), ("d05", "d06")],
        "id_a string, id_b string",
    )
    out = leakage_safe_split(
        docs, pairs, {"train": 0.5, "val": 0.25, "test": 0.25},
        seed=11, hash_fn="md5",
    )
    assert set(out.columns) == {"doc_id", "text", "cluster_id", "split"}
    rows = {r.doc_id: (r.cluster_id, r.split) for r in out.collect()}
    assert len(rows) == 40  # full corpus covered, singletons included
    # cluster members share BOTH the representative and the split
    assert rows["d00"] == rows["d01"] == rows["d02"]
    assert rows["d05"] == rows["d06"]
    assert rows["d00"][0] == "d00" and rows["d05"][0] == "d05"

    def expected(cid):
        b = int(hashlib.md5(f"{cid}\x1f11".encode()).hexdigest()[:8], 16)
        b %= 1_000_000
        if b < 500_000:
            return "train"
        if b < 750_000:
            return "val"
        return "test"

    for did, (cid, s) in rows.items():
        assert s == expected(cid), did


def test_split_leakage_violations_detects_and_clears(spark):
    """Doc-keyed hash split leaks (crafted straddling cluster) and the
    check emits exactly the straddling edges; leakage_safe_split over the
    SAME pairs yields zero violations; NULL remainder counts as a split."""
    from taco_toolbox_spark.dedup.cluster import (
        leakage_safe_split,
        split_leakage_violations,
    )

    docs = spark.createDataFrame(
        [(f"d{i:02d}", f"text {i}") for i in range(30)],
        "doc_id string, text string",
    )
    pairs = spark.createDataFrame(
        [("d00", "d01"), ("d01", "d02"), ("d07", "d08")],
        "id_a string, id_b string",
    )
    # hand-label a straddling assignment: d01 in val, rest of its cluster
    # in train -> the two edges touching d01 are the witnesses
    labeled = docs.withColumn(
        "split",
        F.when(F.col("doc_id") == "d01", "val")
        .when(F.col("doc_id") == "d07", F.lit(None).cast("string"))
        .otherwise("train"),
    )
    viol = split_leakage_violations(labeled, pairs).collect()
    got = {(r.id_a, r.id_b, r.split_a, r.split_b) for r in viol}
    assert got == {
        ("d00", "d01", "train", "val"),
        ("d01", "d02", "val", "train"),
        ("d07", "d08", None, "train"),  # NULL remainder is a leak hazard
    }
    # the constructive fix passes its own validator
    safe = leakage_safe_split(
        docs, pairs, {"train": 0.5, "val": 0.25, "test": 0.25}, seed=3
    )
    assert split_leakage_violations(safe, pairs).count() == 0


def test_canonical_docs_prefer_col_elects_best(spark):
    """Quality-aware election: highest prefer_col wins, ties break to min
    id, all-NULL clusters fall back to min id, singletons stay canonical;
    default (no prefer_col) behavior unchanged (min id)."""
    from taco_toolbox_spark.dedup.cluster import canonical_docs

    docs = spark.createDataFrame(
        [
            ("d0", 1), ("d1", 9), ("d2", 9),   # cluster {d0,d1,d2}: tie 9
            ("d3", None), ("d4", None),        # all-NULL cluster
            ("d5", 2),                         # singleton
        ],
        "doc_id string, quality int",
    )
    pairs = spark.createDataFrame(
        [("d0", "d1"), ("d1", "d2"), ("d3", "d4")],
        "id_a string, id_b string",
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in canonical_docs(pairs, docs, prefer_col="quality").collect()
    }
    assert got == {
        "d0": ("d0", False),
        "d1": ("d0", True),   # max quality, min id among the tie
        "d2": ("d0", False),
        "d3": ("d3", True),   # all-NULL cluster -> min id
        "d4": ("d3", False),
        "d5": ("d5", True),
    }
    default = {
        r["doc_id"]: r["is_canonical"]
        for r in canonical_docs(pairs, docs).collect()
    }
    assert default == {
        "d0": True, "d1": False, "d2": False,
        "d3": True, "d4": False, "d5": True,
    }
