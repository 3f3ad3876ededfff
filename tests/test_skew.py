"""Salted two-phase aggregation must equal the naive aggregation."""

import pyspark.sql.functions as F

from taco_toolbox_spark.skew import conversation_lengths_salted, salted_agg


def test_salted_equals_plain(corpus):
    plain = (
        corpus.corrupted.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
            F.max("turn_idx").alias("max_turn"),
        )
        .toPandas()
        .set_index("conv_id")
        .sort_index()
    )
    salted = (
        conversation_lengths_salted(corpus.corrupted, buckets=8)
        .toPandas()
        .set_index("conv_id")
        .sort_index()
    )
    assert plain.equals(salted[plain.columns])


def test_salted_sum(spark):
    df = spark.createDataFrame(
        [("hot", float(i)) for i in range(1000)] + [("cold", 1.0)], "k string, v double"
    )
    out = salted_agg(
        df, ["k"], {"s": (F.sum("v"), F.sum("s")), "n": (F.count(F.lit(1)), F.sum("n"))},
        buckets=16,
    ).toPandas().set_index("k")
    assert out.loc["hot", "s"] == sum(range(1000)) and out.loc["hot", "n"] == 1000
    assert out.loc["cold", "n"] == 1


def test_key_skew_report_exact_and_tiebreak(spark):
    """Hand-computed skew factors, count-desc/key-asc tiebreak, and the
    top-k cut; guards raise on empty keys / bad top_k."""
    import pytest as _pytest

    from taco_toolbox_spark.skew import key_skew_report

    # counts: a=4, b=2, c=2, d=1 -> n_keys=4, n_rows=9
    rows = [("a",)] * 4 + [("b",)] * 2 + [("c",)] * 2 + [("d",)]
    df = spark.createDataFrame(rows, "k string")
    got = key_skew_report(df, ["k"], top_k=3).collect()
    assert [(r["k"], r["n"]) for r in got] == [("a", 4), ("b", 2), ("c", 2)]
    assert all(r["n_keys"] == 4 and r["n_rows"] == 9 for r in got)
    assert got[0]["skew_x"] == 4 * 4 / 9.0
    assert got[1]["skew_x"] == 2 * 4 / 9.0

    with _pytest.raises(ValueError, match="top_k"):
        key_skew_report(df, ["k"], top_k=0)
    with _pytest.raises(ValueError, match="at least one"):
        key_skew_report(df, [])


def test_key_skew_report_plan_take_ordered(spark):
    """The top-k must compile to TakeOrderedAndProject over a partial/
    final count — never a full global sort."""
    from taco_toolbox_spark.skew import key_skew_report

    df = spark.range(0, 5000).selectExpr("cast(id % 97 AS string) AS k")
    plan = (
        key_skew_report(df, ["k"], top_k=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "HashAggregate" in plan
