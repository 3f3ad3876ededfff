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
    n_buckets: int | None = 64,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> int:
    """Save as a bucketed (and optionally sorted) table. Sorting by the
    in-group order column makes window passes sort-free per bucket. With
    ``path`` the table is external: the bucketed files outlive the session
    and a later session re-attaches via :func:`attach_bucketed` (the
    in-memory catalog forgets table metadata at shutdown).

    ``n_buckets=None`` scales the count with the data (scale.bucket_count:
    ~250k rows/bucket, floor 64) — a fixed count quadruples per-task state
    as the table grows; the row count comes from a metadata-only
    ``df.count()`` for parquet inputs. Returns the bucket count used (a
    later :func:`attach_bucketed` must pass the same number)."""
    if n_buckets is None:
        from ..scale import bucket_count

        n_buckets = bucket_count(df.count())
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)
    return n_buckets


def attach_bucketed(
    spark: SparkSession,
    table: str,
    path: str,
    schema_ddl: str,
    bucket_cols: list[str],
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Register an EXTERNAL bucketed table over files a previous session
    wrote with :func:`write_bucketed` — the catalog entry is per-session,
    the bucket layout is in the files. Idempotent."""
    sort = (
        f"SORTED BY ({', '.join(sort_cols)})" if sort_cols else ""
    )
    spark.sql(
        f"""CREATE TABLE IF NOT EXISTS {table} ({schema_ddl})
            USING parquet
            CLUSTERED BY ({', '.join(bucket_cols)}) {sort}
            INTO {n_buckets} BUCKETS
            LOCATION '{path}'"""
    )
    return spark.table(table)


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
