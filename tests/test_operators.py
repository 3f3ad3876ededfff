import pyspark.sql.functions as F
import pytest

from taco_toolbox_spark.operators.distribution import (
    categorical_distribution,
    out_of_vocab,
    top1_group,
)
from taco_toolbox_spark.operators.extents import (
    spatial_extent,
    temporal_extent,
    union_extents,
)
from taco_toolbox_spark.operators.hierarchy import (
    add_row_position,
    completeness_violations,
    isomorphism_violations,
    parent_child_join,
)
from taco_toolbox_spark.operators.partitioning import assign_size_bins, consolidate
from taco_toolbox_spark.operators.prune import prune_empty_columns
from taco_toolbox_spark.operators.topk import global_topk, topk_per_group


def test_spatial_extent_simple(spark):
    df = spark.createDataFrame(
        [(10.0, 1.0), (20.0, 5.0), (-30.0, -2.0)], "lon double, lat double"
    )
    r = spatial_extent(df).first()
    assert (r["west"], r["east"], r["south"], r["north"]) == (-30.0, 20.0, -2.0, 5.0)


def test_spatial_extent_antimeridian(spark):
    # points hugging the dateline: ±175 — the reference keeps the larger-span
    # longitude sign group (taco/datamodel.py:520-560)
    df = spark.createDataFrame(
        [(179.0, 0.0), (178.0, 1.0), (-179.5, 2.0), (170.0, 3.0)],
        "lon double, lat double",
    )
    r = spatial_extent(df).first()
    assert (r["west"], r["east"]) == (170.0, 179.0)  # east group spans 9 > west 0


def test_temporal_extent_and_union(spark):
    df = spark.createDataFrame(
        [("a", "2025-01-01 00:00:00", None), ("b", None, "2025-02-01 00:00:00")],
        "g string, t1 string, t2 string",
    ).select("g", F.to_timestamp("t1").alias("t1"), F.to_timestamp("t2").alias("t2"))
    per = temporal_extent(df, ["t1", "t2"], ["g"])
    glob = union_extents(per).first()
    assert str(glob["time_start"]) == "2025-01-01 00:00:00"
    assert str(glob["time_end"]) == "2025-02-01 00:00:00"


def test_row_position_and_parent_child(spark):
    child = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 30)], "parent_id int, v int"
    )
    parent = spark.createDataFrame([(1, "a"), (2, "b")], "current_id int, name string")
    pos = add_row_position(child, ["v"], ["parent_id"], "pos")
    assert {(r["parent_id"], r["v"], r["pos"]) for r in pos.collect()} == {
        (1, 10, 0),
        (1, 20, 1),
        (2, 30, 0),
    }
    j = parent_child_join(child, parent, broadcast_parent=True)
    assert j.count() == 3


def test_completeness(spark):
    have = spark.createDataFrame([(1,), (3,)], "id int")
    need = spark.createDataFrame([(1,), (2,), (3,), (4,)], "id int")
    missing = completeness_violations(have, need, ["id"], sample=5)
    assert [r["id"] for r in missing.collect()] == [2, 4]


def test_isomorphism(spark):
    # conv a,b contiguous identical structure; c deviates
    rows = [("a", 0, "x"), ("a", 1, "y"), ("b", 0, "x"), ("b", 1, "y"), ("c", 0, "x"), ("c", 1, "z")]
    df = spark.createDataFrame(rows, "g string, pos int, t string")
    bad = isomorphism_violations(df, "g", ["t"], "pos")
    assert [r["g"] for r in bad.collect()] == ["c"]


def test_per_position_pattern_and_pit_schema(spark):
    from taco_toolbox_spark.operators.hierarchy import (
        per_position_pattern,
        pit_schema,
    )

    # 3 groups isomorphic at (pos, t); group d deviates at pos 1
    rows = [
        (g, 0, "user", None) for g in "abc"
    ] + [
        (g, 1, "assistant", "search") for g in "abc"
    ] + [("d", 0, "user", None), ("d", 1, "user", "code")]
    df = spark.createDataFrame(rows, "g string, pos int, role string, tool string")
    pat = per_position_pattern(df, "pos", ["role", "tool"]).collect()
    assert [(r["pos"], r["role"], r["tool"], r["n"]) for r in pat] == [
        (0, "user", None, 4),
        (1, "assistant", "search", 3),
    ]
    schema = pit_schema([df.select("g").distinct(), df], "pos", ["role", "tool"])
    assert schema["root"]["n"] == 4
    assert schema["hierarchy"]["1"][1]["role"] == "assistant"


def test_size_bins(spark):
    df = spark.createDataFrame(
        [(i, 40) for i in range(10)], "id int, sz int"
    )
    out = {r["id"]: r["bin_id"] for r in assign_size_bins(df, "sz", 100, ["id"]).collect()}
    # cumsum-before: ids 0,1,2 -> bin 0 (0,40,80); 3,4 -> bin 1 (120,160); ...
    assert out[0] == 0 and out[2] == 0 and out[3] == 1 and out[9] == 3


def test_size_bins_distributed_matches_sequential(spark):
    import random

    rng = random.Random(7)
    rows = [(i, rng.randint(1, 500)) for i in range(2000)]
    df = spark.createDataFrame(rows, "id int, sz int").repartition(8)
    out = assign_size_bins(df, "sz", 1000, ["id"], n_buckets=16)
    got = {r["id"]: r["bin_id"] for r in out.collect()}
    cum, want = 0, {}
    for i, s in rows:
        want[i] = cum // 1000
        cum += s
    assert got == want


def test_size_bins_plan_is_distributed(spark):
    df = spark.createDataFrame([(i, 40) for i in range(100)], "id int, sz int")
    plan = assign_size_bins(df, "sz", 100, ["id"])._jdf.queryExecution().executedPlan().toString()
    # the data-sized window must be partitioned by the coarse bucket, and
    # the offsets must arrive via broadcast, not a data-sized shuffle
    assert "_sb_bucket" in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def _greedy_reference(rows, max_size=None, max_count=None):
    """Pure-python mirror of tacotoolbox create.py:454-478 greedy walk."""
    bins, cur, cur_size, cur_count = {}, 0, 0, 0
    for rid, s in rows:
        if cur_count > 0 and (
            (max_count is not None and cur_count >= max_count)
            or (max_size is not None and cur_size + s > max_size)
        ):
            cur, cur_size, cur_count = cur + 1, 0, 0
        bins[rid] = cur
        cur_size += s
        cur_count += 1
    return bins


def test_greedy_pack_bins_grouped_exact(spark):
    from taco_toolbox_spark.operators.partitioning import greedy_pack_bins
    import random

    rng = random.Random(3)
    rows = [(g, i, rng.randint(10, 90)) for g in ("a", "b") for i in range(200)]
    df = spark.createDataFrame(rows, "g string, id int, sz int").repartition(8)
    out = greedy_pack_bins(
        df, "sz", ["id"], max_bin_size=150, max_bin_count=4, group_cols=["g"]
    )
    got = {(r["g"], r["id"]): r["bin_id"] for r in out.collect()}
    for g in ("a", "b"):
        want = _greedy_reference(
            [(i, s) for gg, i, s in rows if gg == g], max_size=150, max_count=4
        )
        for i, b in want.items():
            assert got[(g, i)] == b, (g, i)


def test_greedy_pack_bins_global_never_exceeds_caps(spark):
    from taco_toolbox_spark.operators.partitioning import greedy_pack_bins
    import random

    rng = random.Random(11)
    rows = [(i, rng.randint(10, 120)) for i in range(1500)]
    df = spark.createDataFrame(rows, "id long, sz long").repartition(8)
    out = greedy_pack_bins(
        df, "sz", ["id"], max_bin_size=300, max_bin_count=5, n_buckets=8
    ).collect()
    by_bin = {}
    for r in out:
        by_bin.setdefault(r["bin_id"], []).append(r["sz"])
    for sizes in by_bin.values():
        assert len(sizes) <= 5
        assert sum(sizes) <= 300 or len(sizes) == 1  # oversized item alone
    # bin ids are contiguous from 0 and order-respecting per id
    assert sorted(by_bin) == list(range(len(by_bin)))
    id_to_bin = {r["id"]: r["bin_id"] for r in out}
    assert all(
        id_to_bin[i] <= id_to_bin[i + 1] for i in range(len(rows) - 1)
    )


def test_partition_summary_roundtrip(spark, tmp_path):
    from taco_toolbox_spark.operators.partitioning import write_partitioned_by_key

    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("b", 3, 5.0)],
        "k string, id int, v double",
    )
    out = str(tmp_path / "sink")
    write_partitioned_by_key(df, out, ["k"], with_summary=True)
    # data round-trips
    assert spark.read.parquet(out).count() == 3
    # summary: one row per partition, extents match the data
    s = {r["k"]: r for r in spark.read.parquet(f"{out}/_summary").collect()}
    assert s["a"]["n_rows"] == 2 and s["b"]["n_rows"] == 1
    assert s["a"]["v_min"] == "10.0" and s["a"]["v_max"] == "20.0"
    assert s["b"]["id_min"] == "3"


def test_consolidate_strict_and_loose(spark):
    a = spark.createDataFrame([(1, "x")], "id long, a string")
    b = spark.createDataFrame([(2, "y")], "id long, a string")
    c = spark.createDataFrame([(3, 1.5)], "id long, b double")
    out = consolidate([a, b], source_names=["p0", "p1"])
    assert {r["source_file"] for r in out.collect()} == {"p0", "p1"}
    with pytest.raises(ValueError, match="schema mismatch"):
        consolidate([a, c])
    loose = consolidate([a, c], strict_schema=False)
    assert set(loose.columns) == {"id", "a", "b", "source_file"}


def test_prune_empty_columns(spark):
    df = spark.createDataFrame(
        [(1, None, "", "keep"), (2, None, "None", "also")],
        "id int, allnull string, empty string, good string",
    )
    pruned, dropped = prune_empty_columns(df, protect=("id",))
    assert sorted(dropped) == ["allnull", "empty"]
    assert set(pruned.columns) == {"id", "good"}


def test_topk(spark):
    df = spark.createDataFrame(
        [("a", 3), ("a", 1), ("a", 2), ("b", 9)], "g string, v int"
    )
    top = global_topk(df, [F.col("v").desc()], 2, tiebreak=["g"]).collect()
    assert [(r["g"], r["v"]) for r in top] == [("b", 9), ("a", 3)]
    per = topk_per_group(df, ["g"], [F.col("v").desc()], 1)
    assert {(r["g"], r["v"]) for r in per.collect()} == {("a", 3), ("b", 9)}


def test_distribution_and_vocab(spark):
    df = spark.createDataFrame(
        [("x",), ("x",), ("y",), (None,)], "c string"
    )
    dist = {r["c"]: (r["n"], r["prob"]) for r in categorical_distribution(df, "c").collect()}
    assert dist["x"] == (2, pytest.approx(2 / 3))
    oov = out_of_vocab(df, "c", ["x"])
    assert [(r["c"], r["n"]) for r in oov.collect()] == [("y", 1)]
    top = top1_group(
        spark.createDataFrame([("a", 1), ("b", 5), ("a", 2)], "g string, v int"),
        "g",
        "v",
    ).first()
    assert top["g"] == "b" and top["total"] == 5


def test_size_bins_null_string_order_key_not_dropped(spark):
    # NULL string order keys must land in bucket "" (sorts first), not be
    # dropped by the bucket equi-join; NULLs sort before every string, so
    # they take the first bins
    rows = [(None, 40), ("a", 40), ("b", 40), (None, 40)]
    df = spark.createDataFrame(rows, "k string, sz int")
    out = assign_size_bins(df, "sz", 100, ["k"], n_buckets=4).collect()
    assert len(out) == 4  # nothing dropped
    by_key = sorted((r["k"] is not None, r["bin_id"]) for r in out)
    # two NULLs first (cum 0, 40 -> bin 0), then "a" (80 -> bin 0), "b" (120 -> bin 1)
    assert [b for _, b in by_key] == [0, 0, 0, 1]


def test_greedy_pack_bins_null_string_key_and_ties(spark):
    from taco_toolbox_spark.operators.partitioning import greedy_pack_bins

    # NULL keys survive, and duplicate order keys pack deterministically
    rows = [(None, 60), ("x", 60), ("x", 60), ("y", 60)]
    df = spark.createDataFrame(rows, "k string, sz int")
    out = greedy_pack_bins(df, "sz", ["k"], max_bin_size=100, n_buckets=4)
    got = out.collect()
    assert len(got) == 4
    assert "_gp_tie" not in out.columns and "_gp_bucket" not in out.columns
    sizes: dict = {}
    for r in got:
        sizes[r["bin_id"]] = sizes.get(r["bin_id"], 0) + r["sz"]
    assert all(v <= 100 for v in sizes.values())


def test_greedy_pack_bins_map_column_schema(spark):
    """ADVICE r3: xxhash64 rejects MapType (SPARK-27619); the tie-breaker
    hash must skip map-bearing columns instead of failing the operator on
    generic schemas."""
    from taco_toolbox_spark.operators.partitioning import greedy_pack_bins

    rows = [(i, 40, {"k": str(i)}) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, sz long, props map<string,string>")
    out = greedy_pack_bins(df, "sz", ["id"], max_bin_size=100, n_buckets=4)
    rows_out = out.collect()
    assert {r["id"]: r["props"] for r in rows_out} == {
        i: {"k": str(i)} for i in range(30)
    }
    by_bin = {}
    for r in rows_out:
        by_bin.setdefault(r["bin_id"], []).append(r["sz"])
    assert all(sum(s) <= 100 for s in by_bin.values())
    assert sorted(by_bin) == list(range(len(by_bin)))
    got = {r["id"]: r["bin_id"] for r in rows_out}
    assert all(got[i] <= got[i + 1] for i in range(29))


def test_transition_matrix_counts_and_normalize(spark):
    """Adjacent-pair counts exclude group-opening rows but DO count a NULL
    previous VALUE as a real category; normalize gives per-prev rows
    summing to 1."""
    from taco_toolbox_spark.operators.distribution import transition_matrix

    df = spark.createDataFrame(
        [
            ("a", 0, "system"), ("a", 1, "user"), ("a", 2, "assistant"),
            ("b", 0, "system"), ("b", 1, None), ("b", 2, "user"),
            ("c", 0, "system"), ("c", 1, "user"),
        ],
        "conv_id string, turn_idx int, role string",
    )
    m = {
        (r["prev"], r["cur"]): r["n"]
        for r in transition_matrix(df, "conv_id", "turn_idx", "role").collect()
    }
    assert m == {
        ("system", "user"): 2,
        ("user", "assistant"): 1,
        ("system", None): 1,
        (None, "user"): 1,
    }
    norm = transition_matrix(df, "conv_id", "turn_idx", "role", normalize=True)
    sums = {
        r["prev"]: r["s"]
        for r in norm.groupBy("prev").agg(F.sum("p").alias("s")).collect()
    }
    assert all(abs(v - 1.0) < 1e-12 for v in sums.values())


def test_gini_simpson_hand_computed(spark):
    """Diversity vs hand-worked values: uniform 2-cat n=4 -> 1 - 2*2/12 =
    2/3 exactly; single-category -> 0.0; N=1 -> NULL; NULL category is a
    real category; grouped output covers every group."""
    from pyspark.sql import functions as F

    from taco_toolbox_spark.operators.distribution import gini_simpson

    rows = (
        [("g1", "a"), ("g1", "a"), ("g1", "b"), ("g1", "b")]
        + [("g2", "x"), ("g2", "x"), ("g2", "x")]
        + [("g3", "y")]
        + [("g4", None), ("g4", None), ("g4", "z")]
    )
    df = spark.createDataFrame(rows, "grp string, cat string")
    out = {r.grp: r for r in gini_simpson(df, "cat", ["grp"]).collect()}
    assert out["g1"].diversity == 1.0 - (2 * 1 + 2 * 1) / (4 * 3)
    assert out["g1"].n_rows == 4 and out["g1"].n_cats == 2
    assert out["g2"].diversity == 0.0
    assert out["g3"].diversity is None  # no draw-two experiment at N=1
    # g4: counts {NULL: 2, z: 1} -> 1 - (2*1 + 0) / (3*2) = 2/3
    assert out["g4"].diversity == 1.0 - 2 / 6 and out["g4"].n_cats == 2
    # ungrouped mode: one row over the whole frame
    whole = gini_simpson(df, "grp").collect()
    assert len(whole) == 1 and whole[0].n_cats == 4
    # bit-identical across partitionings (integer-sum order independence)
    a = gini_simpson(df.coalesce(1), "cat", ["grp"]).collect()
    b = gini_simpson(df.repartition(7), "cat", ["grp"]).collect()
    assert {tuple(r) for r in a} == {tuple(r) for r in b}


# ---------------------------------------------------------------------------
# budget-capped prefix selection
# ---------------------------------------------------------------------------


def test_select_to_budget_exact_prefix(spark):
    from taco_toolbox_spark.operators.partitioning import select_to_budget

    rows = [(i, 10) for i in range(10)]  # sizes 10 each, ordered by id
    df = spark.createDataFrame(rows, "doc_id long, toks long")
    out = select_to_budget(df, "toks", 35, ["doc_id"]).collect()
    got = {r["doc_id"]: (r["cum_size"], r["selected"]) for r in out}
    # prefix of 3 rows fits 35 (10,20,30); the 4th (40) exceeds
    assert [got[i][1] for i in range(10)] == [True] * 3 + [False] * 7
    assert got[2][0] == 30 and got[3][0] == 40


def test_select_to_budget_matches_python_walk_any_partitioning(spark):
    import random

    from taco_toolbox_spark.operators.partitioning import select_to_budget

    rng = random.Random(7)
    rows = [(i, rng.randint(0, 50)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, toks long").repartition(7)
    out = select_to_budget(df, "toks", 3000, ["doc_id"], n_buckets=8)
    got = {r["doc_id"] for r in out.collect() if r["selected"]}
    cum, want = 0, set()
    for i, t in rows:
        cum += t
        if cum <= 3000:
            want.add(i)
    assert got == want


def test_select_to_budget_null_and_negative_sizes(spark):
    from taco_toolbox_spark.operators.partitioning import select_to_budget

    rows = [(0, 10), (1, None), (2, -5), (3, 10), (4, 100)]
    df = spark.createDataFrame(rows, "doc_id long, toks long")
    got = {
        r["doc_id"]: (r["cum_size"], r["selected"])
        for r in select_to_budget(df, "toks", 20, ["doc_id"]).collect()
    }
    # NULL/negative contribute 0 to the running total and are never kept
    assert got[0] == (10, True)
    assert got[1] == (10, False)
    assert got[2] == (10, False)
    assert got[3] == (20, True)
    assert got[4] == (120, False)


def test_select_top_quality_to_budget_order_and_null_scores(spark):
    from taco_toolbox_spark.operators.partitioning import (
        select_top_quality_to_budget,
    )

    rows = [
        (0, 5.0, 10),
        (1, 9.0, 10),
        (2, 9.0, 10),   # tie with 1 -> id asc
        (3, None, 1),   # NULL score sorts last despite tiny size
        (4, 7.0, 10),
    ]
    df = spark.createDataFrame(rows, "doc_id long, score double, toks long")
    out = select_top_quality_to_budget(df, "score", "toks", 30, "doc_id")
    kept = sorted(r["doc_id"] for r in out.collect() if r["selected"])
    assert kept == [1, 2, 4]  # 9.0, 9.0, 7.0 fill the budget; 5.0 and NULL out
    assert "_nscore" not in out.columns


def test_select_to_budget_guards(spark):
    from taco_toolbox_spark.operators.partitioning import select_to_budget

    df = spark.createDataFrame([(1, 1)], "doc_id long, toks long")
    import pytest as _pt

    with _pt.raises(ValueError, match="budget"):
        select_to_budget(df, "toks", 0, ["doc_id"])
    bad = df.withColumn("selected", df.toks * 1)
    with _pt.raises(ValueError, match="collide"):
        select_to_budget(bad, "toks", 5, ["doc_id"])


def test_select_to_budget_per_group(spark):
    from taco_toolbox_spark.operators.partitioning import select_to_budget

    rows = [
        ("en", 0, 10), ("en", 1, 10), ("en", 2, 10), ("en", 3, 10),
        ("fr", 0, 15), ("fr", 1, 15),
        (None, 0, 10), (None, 1, 10), (None, 2, 10),  # NULL domain group
    ]
    df = spark.createDataFrame(rows, "lang string, doc_id long, toks long")
    out = select_to_budget(
        df, "toks", 25, ["doc_id"], group_cols=["lang"], n_buckets=4
    )
    kept = {(r["lang"], r["doc_id"]) for r in out.collect() if r["selected"]}
    # per-group budget 25: en keeps 2 (20<=25, 30>25), fr keeps 1 (15<=25,
    # 30>25), NULL group keeps 2 — NULL groups must survive the offset join
    assert kept == {("en", 0), ("en", 1), ("fr", 0), (None, 0), (None, 1)}
    assert out.count() == len(rows)


def test_select_to_budget_nan_size_does_not_poison(spark):
    from taco_toolbox_spark.operators.partitioning import select_to_budget

    rows = [(0, 1.0), (1, float("nan")), (2, 1.0), (3, 1.0)]
    df = spark.createDataFrame(rows, "doc_id long, toks double")
    got = {
        r["doc_id"]: r["selected"]
        for r in select_to_budget(df, "toks", 10, ["doc_id"]).collect()
    }
    # NaN contributes 0 and is never selected; later rows still fit
    assert got == {0: True, 1: False, 2: True, 3: True}


def test_group_percentile_matches_python(spark):
    import random

    from taco_toolbox_spark.operators.partitioning import group_percentile

    rng = random.Random(3)
    rows = [
        (i, ["en", "fr", None][i % 3], rng.randint(0, 100)) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, score long")
    got = {
        r["doc_id"]: r["pct_rank"]
        for r in group_percentile(
            df, "score", "doc_id", ["lang"], n_buckets=8
        ).collect()
    }
    by_group = {}
    for i, lang, s in rows:
        by_group.setdefault(lang, []).append((s, i))
    want = {}
    for members in by_group.values():
        members.sort()
        n = len(members)
        for rank, (_, i) in enumerate(members):
            want[i] = rank / (n - 1) if n > 1 else None
    assert got.keys() == want.keys()
    for k in want:
        if want[k] is None:
            assert got[k] is None
        else:
            assert abs(got[k] - want[k]) < 1e-12


def test_group_percentile_null_scores_rank_lowest(spark):
    from taco_toolbox_spark.operators.partitioning import group_percentile

    df = spark.createDataFrame(
        [(0, None), (1, 5), (2, 10)], "doc_id long, score long"
    )
    got = {
        r["doc_id"]: r["pct_rank"]
        for r in group_percentile(df, "score", "doc_id").collect()
    }
    assert got == {0: 0.0, 1: 0.5, 2: 1.0}


def test_group_percentile_singleton_group_is_null(spark):
    from taco_toolbox_spark.operators.partitioning import group_percentile

    df = spark.createDataFrame(
        [(0, "a", 1), (1, "b", 1), (2, "b", 2)],
        "doc_id long, g string, score long",
    )
    got = {
        r["doc_id"]: r["pct_rank"]
        for r in group_percentile(df, "score", "doc_id", ["g"]).collect()
    }
    assert got[0] is None and got[1] == 0.0 and got[2] == 1.0


def test_trailing_counts_window_semantics(spark):
    """Hand-computed trailing counts: inclusive [t-W, t] bounds at
    one-second resolution, per-key isolation, intra-second ties sharing
    one frame, and exact boundary membership (a row at t-W counts; one
    at t-W-1 does not)."""
    import datetime as dt

    from taco_toolbox_spark.operators.rolling import (
        burst_violations,
        trailing_agg,
        trailing_counts,
    )

    t0 = dt.datetime(2025, 1, 1, 0, 0, 0)

    def at(s, us=0):
        return t0 + dt.timedelta(seconds=s, microseconds=us)

    rows = [
        # key A: boundary pair — 10s window, second row exactly at +10
        (1, "A", at(0)),
        (2, "A", at(10)),          # [0,10] includes the row at 0 -> 2
        (3, "A", at(21)),          # [11,21] excludes both -> 1
        # intra-second tie: same truncated second -> same frame
        (4, "A", at(21, 500_000)),  # truncates to 21: same frame as id 3
        # key B isolated
        (5, "B", at(10)),
    ]
    df = spark.createDataFrame(rows, "event_id long, k string, ts timestamp")
    got = {
        r["event_id"]: r["n_trailing"]
        for r in trailing_counts(df, ["k"], "ts", seconds=10).collect()
    }
    assert got == {1: 1, 2: 2, 3: 2, 4: 2, 5: 1}

    # burst rule: only overflow rows fire; dropping them fixes the burst
    v = burst_violations(df, ["k"], max_events=1, ts_col="ts", seconds=10)
    fired = {r["ts"] for r in v.collect()}
    assert fired == {at(10), at(21), at(21, 500_000)}
    assert v.columns == ["check_id", "k", "ts", "n_trailing"]

    # general form: order-independent min/max over the same frame
    import pyspark.sql.functions as F

    agg = trailing_agg(
        df, ["k"], {"lo": F.min("event_id"), "hi": F.max("event_id")},
        "ts", seconds=10,
    )
    m = {r["event_id"]: (r["lo"], r["hi"]) for r in agg.collect()}
    assert m[2] == (1, 2) and m[4] == (3, 4)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="rename"):
        trailing_counts(df.withColumn("n_trailing", F.lit(0)), ["k"])
    with _pytest.raises(ValueError, match="collide"):
        trailing_agg(df, ["k"], {"ts": F.count(F.lit(1))})
    with _pytest.raises(ValueError, match="max_events"):
        burst_violations(df, ["k"], max_events=0)


def test_trailing_counts_partition_invariant(spark):
    """The trailing count must be identical across partition layouts —
    the range frame sorts within key, so layout cannot matter."""
    from taco_toolbox_spark.operators.rolling import trailing_counts

    df = spark.range(0, 400).selectExpr(
        "id AS event_id",
        "cast(id % 7 AS string) AS k",
        "timestamp '2025-01-01 00:00:00' + make_interval(0,0,0,0,0,0, (id * 37) % 900) AS ts",
    )
    a = trailing_counts(df.coalesce(1), ["k"], "ts", 60).orderBy("event_id")
    b = trailing_counts(df.repartition(13), ["k"], "ts", 60).orderBy("event_id")
    assert [r["n_trailing"] for r in a.collect()] == [
        r["n_trailing"] for r in b.collect()
    ]


def test_trailing_chunked_parity(spark):
    """chunk_seconds pre-splits every key by coarse time bucket with
    ghost-row boundary reconciliation (bin replication): output must be
    bit-identical to the plain window — including frames straddling a
    bucket boundary, NULL timestamps, and the degenerate chunk == window
    case where every row is replicated — and ghosts are never emitted
    (row count preserved)."""
    import pyspark.sql.functions as F

    from taco_toolbox_spark.operators.rolling import (
        burst_violations,
        trailing_agg,
        trailing_counts,
    )

    # one hot key (7/8 of rows) + a cold key + periodic NULL timestamps;
    # prime stride spreads events so frames straddle bucket boundaries
    df = spark.range(0, 500).selectExpr(
        "id AS event_id",
        "CASE WHEN id % 8 = 7 THEN 'cold' ELSE 'hot' END AS k",
        "CASE WHEN id % 97 = 96 THEN NULL ELSE timestamp '2025-01-01' "
        "+ make_interval(0,0,0,0,0,0, (id * 37) % 3600) END AS ts",
    )
    plain = {
        r["event_id"]: r["n_trailing"]
        for r in trailing_counts(df, ["k"], "ts", seconds=120).collect()
    }
    for chunk in (120, 300, 1000):
        got = trailing_counts(
            df, ["k"], "ts", seconds=120, chunk_seconds=chunk
        )
        assert got.count() == 500  # ghost context copies filtered out
        assert {
            r["event_id"]: r["n_trailing"] for r in got.collect()
        } == plain, f"chunk_seconds={chunk}"

    # hand-computed boundary case: window 10, chunk 100 — the row at 105
    # (bucket 1) must see the rows at 95 and 100 via their ghost copies
    import datetime as dt

    t0 = dt.datetime(2025, 1, 1)
    rows = [
        (1, "A", t0 + dt.timedelta(seconds=95)),
        (2, "A", t0 + dt.timedelta(seconds=100)),
        (3, "A", t0 + dt.timedelta(seconds=105)),
        (4, "A", t0 + dt.timedelta(seconds=89)),  # outside [95,105]
    ]
    mini = spark.createDataFrame(
        rows, "event_id long, k string, ts timestamp"
    )
    got = {
        r["event_id"]: r["n_trailing"]
        for r in trailing_counts(
            mini, ["k"], "ts", seconds=10, chunk_seconds=100
        ).collect()
    }
    assert got == {1: 2, 2: 2, 3: 3, 4: 1}

    # general form and the burst rule ride the same scaffolding
    pa = trailing_agg(
        df, ["k"], {"lo": F.min("event_id")}, "ts", seconds=120
    )
    pb = trailing_agg(
        df, ["k"], {"lo": F.min("event_id")}, "ts", seconds=120,
        chunk_seconds=600,
    )
    assert {r["event_id"]: r["lo"] for r in pa.collect()} == {
        r["event_id"]: r["lo"] for r in pb.collect()
    }
    va = burst_violations(df, ["k"], 3, "ts", seconds=120)
    vb = burst_violations(
        df, ["k"], 3, "ts", seconds=120, chunk_seconds=600
    )
    assert sorted(map(tuple, va.collect())) == sorted(
        map(tuple, vb.collect())
    )

    # guards: chunk below the window (a frame could span two boundaries)
    # and internal-name collisions refuse loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="chunk_seconds"):
        trailing_counts(df, ["k"], "ts", seconds=120, chunk_seconds=60)
    with _pytest.raises(ValueError, match="chunk_seconds"):
        trailing_counts(df, ["k"], "ts", seconds=120, chunk_seconds=0)
    with _pytest.raises(ValueError, match="collide"):
        trailing_counts(
            df.withColumn("_bucket", F.lit(1)), ["k"], "ts", 120,
            chunk_seconds=600,
        )


def test_run_positions_semantics(spark):
    """Gaps-and-islands positions: null-safe equality (NULL continues a
    NULL run), resets on change, independent per key."""
    from taco_toolbox_spark.operators.runs import run_positions, stuck_runs

    rows = [
        ("k1", 1, "a"), ("k1", 2, "a"), ("k1", 3, "b"), ("k1", 4, "a"),
        ("k1", 5, None), ("k1", 6, None),
        ("k2", 1, None), ("k2", 2, "a"),
    ]
    df = spark.createDataFrame(rows, "k string, i int, v string")
    got = {
        (r["k"], r["i"]): r["run_pos"]
        for r in run_positions(df, ["k"], ["i"], "v").collect()
    }
    assert got == {
        ("k1", 1): 1, ("k1", 2): 2, ("k1", 3): 1, ("k1", 4): 1,
        ("k1", 5): 1, ("k1", 6): 2,
        ("k2", 1): 1, ("k2", 2): 1,
    }
    # overflow-only contract: max_run=1 returns exactly the second rows
    # of each >=2 run
    over = {
        (r["k"], r["i"]) for r in stuck_runs(df, ["k"], ["i"], "v", 1).collect()
    }
    assert over == {("k1", 2), ("k1", 6)}


def test_run_positions_guards(spark):
    from taco_toolbox_spark.operators.runs import run_positions, stuck_runs

    df = spark.createDataFrame([("a", 1, 1)], "k string, i int, run_pos int")
    with pytest.raises(ValueError, match="collide"):
        run_positions(df, ["k"], ["i"], "k")
    df2 = spark.createDataFrame([("a", 1)], "k string, i int")
    with pytest.raises(ValueError, match="max_run"):
        stuck_runs(df2, ["k"], ["i"], "k", 0)
    with pytest.raises(ValueError, match="at least one key"):
        run_positions(df2, [], ["i"], "k")


def test_run_lengths_run_grain(spark):
    """run_lengths: one row per run with start-row attribution, the run's
    value (NULL for a NULL run), and the exact length; exchange-reusing
    plan (no second shuffle for the run aggregation)."""
    from taco_toolbox_spark.operators.runs import run_lengths

    rows = [
        ("k1", 1, "a"), ("k1", 2, "a"), ("k1", 3, "b"),
        ("k1", 4, None), ("k1", 5, None),
        ("k2", 1, "a"),
    ]
    df = spark.createDataFrame(rows, "k string, i int, v string")
    got = {
        (r["k"], r["i"], r["v"], r["run_len"])
        for r in run_lengths(df, ["k"], ["i"], "v").collect()
    }
    assert got == {
        ("k1", 1, "a", 2), ("k1", 3, "b", 1), ("k1", 4, None, 2),
        ("k2", 1, "a", 1),
    }
    plan = (
        run_lengths(df, ["k"], ["i"], "v")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan
    with pytest.raises(ValueError, match="distinct from keys"):
        run_lengths(df, ["k"], ["i"], "i")


def test_periodic_runs_semantics_and_plan(spark):
    """periodic_runs: maximal period-2 stretches with first-row
    attribution, NULL-cycling stretches included, sub-threshold stretches
    filtered, ONE exchange (island agg reuses the window shuffle)."""
    from taco_toolbox_spark.operators.runs import periodic_runs

    rows = [
        # a b a b a b -> stretch 6, 3 reps; then c breaks; a b a -> 1 rep
        ("k1", 1, "a"), ("k1", 2, "b"), ("k1", 3, "a"),
        ("k1", 4, "b"), ("k1", 5, "a"), ("k1", 6, "b"),
        ("k1", 7, "c"), ("k1", 8, "a"), ("k1", 9, "b"), ("k1", 10, "a"),
        # NULL cycling with NULL is a loop: null x null x null -> 2 reps
        ("k2", 1, None), ("k2", 2, "x"), ("k2", 3, None),
        ("k2", 4, "x"), ("k2", 5, None),
        # constant run is also periodic at p=2: aaaa -> stretch 4, 2 reps
        ("k3", 1, "a"), ("k3", 2, "a"), ("k3", 3, "a"), ("k3", 4, "a"),
    ]
    df = spark.createDataFrame(rows, "k string, i int, v string")
    out = periodic_runs(df, ["k"], ["i"], "v", 2, min_reps=2)
    got = {
        (r["k"], r["i"], r["period"], r["stretch_len"], r["n_reps"])
        for r in out.collect()
    }
    assert got == {
        ("k1", 1, 2, 6, 3), ("k2", 1, 2, 5, 2), ("k3", 1, 2, 4, 2),
    }
    # fresh frame: pre-AQE executedPlan (post-collect strings repeat the
    # Initial Plan section and double-count the single Exchange)
    plan = (
        periodic_runs(df, ["k"], ["i"], "v", 2, min_reps=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_periodic_runs_guards(spark):
    from taco_toolbox_spark.operators.runs import periodic_runs

    df = spark.createDataFrame([("k", 1, "a")], "k string, i int, v string")
    with pytest.raises(ValueError, match="period must be >= 1"):
        periodic_runs(df, ["k"], ["i"], "v", 0)
    with pytest.raises(ValueError, match="min_reps must be >= 1"):
        periodic_runs(df, ["k"], ["i"], "v", 2, min_reps=0)
    with pytest.raises(ValueError, match="at least one key"):
        periodic_runs(df, [], ["i"], "v", 2)
    bad = df.withColumnRenamed("v", "_c")
    with pytest.raises(ValueError, match="collide"):
        periodic_runs(bad, ["k"], ["i"], "_c", 2)
    with pytest.raises(ValueError, match="distinct from keys"):
        periodic_runs(df, ["k"], ["i"], "i", 2)
    from taco_toolbox_spark.operators.runs import periodic_overflow

    with pytest.raises(ValueError, match="distinct from keys"):
        periodic_overflow(df, ["k"], ["i"], "k", 2, 2)
    with pytest.raises(ValueError, match="max_reps must be >= 1"):
        periodic_overflow(df, ["k"], ["i"], "v", 2, 0)
    # period 1 degenerates to the plain run (run_lengths semantics)
    df2 = spark.createDataFrame(
        [("k", 1, "a"), ("k", 2, "a"), ("k", 3, "a"), ("k", 4, "b")],
        "k string, i int, v string",
    )
    got = {
        (r["i"], r["stretch_len"], r["n_reps"])
        for r in periodic_runs(df2, ["k"], ["i"], "v", 1, min_reps=2).collect()
    }
    assert got == {(1, 3, 3)}
