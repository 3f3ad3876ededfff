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
