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


def ordering_violations_stateful(
    stream_df: DataFrame,
    group_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    check_id: str = "ts_monotone",
) -> DataFrame:
    """Per-conversation monotone-ts check on a STREAM via
    applyInPandasWithState: state carries (max_turn, max_ts) per
    conversation so regressions are caught across micro-batches. Within a
    batch the comparison is vectorized (pandas shift); only the boundary
    row compares against state — no per-row Python loop."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{group_col} string, {order_col} int, {ts_col} timestamp, "
        "check_id string, detail string"
    )
    state_schema = "max_turn int, max_ts timestamp"

    def fn(key, pdf_iter, state: GroupState):
        (conv,) = key
        if state.exists:
            max_turn, max_ts = state.get
        else:
            max_turn, max_ts = None, None
        for pdf in pdf_iter:
            pdf = pdf.sort_values(order_col, kind="mergesort")
            prev_ts = pdf[ts_col].shift()
            if max_ts is not None and len(pdf):
                prev_ts.iloc[0] = max_ts
            bad = prev_ts > pdf[ts_col]
            if bad.any():
                v = pdf[bad]
                yield pd.DataFrame(
                    {
                        group_col: v[group_col],
                        order_col: v[order_col],
                        ts_col: v[ts_col],
                        "check_id": check_id,
                        "detail": "ts regression (stateful)",
                    }
                )
            if len(pdf):
                mt = int(pdf[order_col].max())
                max_turn = mt if max_turn is None else max(max_turn, mt)
                ts_max = pdf[ts_col].max()
                max_ts = ts_max if max_ts is None else max(max_ts, ts_max)
        state.update((max_turn, max_ts))

    return (
        stream_df.select(group_col, order_col, ts_col)
        .groupBy(group_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def run_ordering_smoke(
    spark, parquet_dir: str, query_name: str = "stream_ordering"
):
    """Drive the stateful ordering check over a bounded parquet dir."""
    static = spark.read.parquet(parquet_dir)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(parquet_dir)
    )
    out = ordering_violations_stateful(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


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
