"""Structured Streaming validation.

The reference is batch-only (SURVEY.md §1.3) — streaming is the Spark-first
extension surface: the SAME declarative RowChecks compile onto a stream
(stateless projection), with watermarked windowed verdict counts. Ordering
checks (monotone ts) need per-conversation state → applyInPandasWithState
(stateful path, validate_ordering_stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..checks.base import RowCheck


def stream_violations(
    stream_df: DataFrame,
    checks: list[RowCheck],
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    ts_col: str = "ts",
) -> DataFrame:
    """Stateless violation stream: same array_compact row pass as the batch
    engine, one row per (violating row, check)."""
    structs = [
        F.when(
            ~c.holds(),
            F.struct(
                F.lit(c.check_id).alias("check_id"), c.detail_col().alias("detail")
            ),
        )
        for c in checks
    ]
    fails = stream_df.select(
        *[F.col(k) for k in key_cols],
        F.col(ts_col),
        F.array_compact(F.array(*structs)).alias("fails"),
    ).filter(F.size("fails") > 0)
    return fails.select(
        *key_cols, ts_col, F.explode("fails").alias("f")
    ).select(*key_cols, ts_col, "f.check_id", "f.detail")


def windowed_verdicts(
    violations: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked per-(event-time window, check) violation counts — the
    streaming analog of the per-partition verdict matrix. Late rows beyond
    the watermark are dropped by Spark's state eviction."""
    return (
        violations.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col("check_id"))
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "check_id",
            "n_violations",
        )
    )


def run_memory_smoke(
    spark,
    parquet_dir: str,
    checks: list[RowCheck],
    query_name: str = "stream_verdicts",
):
    """Drive a bounded parquet directory through the streaming pipeline with
    the memory sink (synchronous processAllAvailable) — the batch-equivalent
    smoke path from the PySpark streaming guide."""
    static = spark.read.parquet(parquet_dir)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(parquet_dir)
    )
    v = stream_violations(stream, checks)
    out = windowed_verdicts(v)
    # complete mode: append would hold back unfinalized windows on bounded
    # input (the watermark only advances with new data)
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
