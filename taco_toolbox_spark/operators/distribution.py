"""Categorical distribution + vocabulary conformance + top-1 group.

Reference: per-band class-probability histograms renormalized to Σ=1 with
out-of-vocab detection (/root/reference/tacotoolbox/sample/extensions/
geotiff_stats.py:158-213) and best-group arg-max (_metadata.py:324-361).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def categorical_distribution(
    df: DataFrame, col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Per-value counts + probabilities (renormalized over non-null)."""
    g = [*(group_cols or [])]
    counts = df.filter(F.col(col).isNotNull()).groupBy(*g, col).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy(*g) if g else Window.partitionBy(F.lit(1))
    return counts.withColumn("prob", F.col("n") / F.sum("n").over(w))


def out_of_vocab(df: DataFrame, col: str, vocab: Sequence[str]) -> DataFrame:
    """A9's out-of-vocab error as violation rows: distinct values of ``col``
    not in the declared vocabulary, with counts (left_anti vs vocab)."""
    from ..schema import literal_frame

    spark = df.sparkSession
    # JVM-literal frame: createDataFrame would plan a Python parallelize RDD
    # that spawns Python workers on every (re-)evaluation of the broadcast
    vocab_df = literal_frame(spark, [(v,) for v in vocab], f"{col} string")
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
        .join(F.broadcast(vocab_df), col, "left_anti")
    )


def top1_group(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """A4 arg-max group: the group with the highest aggregate of value_col
    (max_by — no full sort)."""
    agg = df.groupBy(group_col).agg(F.sum(value_col).alias("total"))
    return agg.agg(
        F.max_by(group_col, F.struct("total", group_col)).alias(group_col),
        F.max("total").alias("total"),
    )
