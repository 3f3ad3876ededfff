"""Bucketed tables: co-located joins/aggregations without a shuffle.

At 100 TB the transcript table is validated repeatedly against the same
baseline; bucketing both sides by conv_id means the text-equality join and
every per-conversation aggregation read pre-clustered buckets instead of
shuffling 100 TB per run. (Reference analog: Morton-bucketed locality
grouping, /root/reference/tacotoolbox/tortilla/extensions/
spatial_grouping.py:202-241 — locality decided at WRITE time, consumed by
many reads.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed (and optionally sorted) managed table. Sorting by
    the in-group order column makes window passes sort-free per bucket."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def bucketed_join_is_shuffle_free(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> tuple[DataFrame, bool]:
    """Join two bucketed tables and report whether the physical plan is
    exchange-free (the point of bucketing). Returns (joined_df, no_shuffle)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    joined = left.join(right, on)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return joined, "Exchange" not in plan
