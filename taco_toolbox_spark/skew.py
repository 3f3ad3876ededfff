"""Skew handling: salted two-phase aggregation for hot keys.

north_rule: "partitioning / shuffle / skew handled explicitly ... salted
repartitioning". Reference analog: Morton bucketing to spread/pack work
(/root/reference/tacotoolbox/tortilla/extensions/spatial_grouping.py:202-241).

A transcript corpus has heavy-tail conversation lengths: a hot conv_id with
10^7+ turns would land on one reducer in a naive groupBy(conv_id). The salted
pattern splits each key into K shards for the partial aggregate (map-side
combine already shrinks data; the salt bounds any single reducer), then a
cheap final aggregate over K rows per key. Only algebraic aggregates
(count/sum/min/max/avg-as-sum+count) compose this way — for distinct counts
use HLL sketches, which also merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, key_cols: list[str], buckets: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt derived from the *full row position entropy* (key
    + a secondary column if given) so one hot key spreads over ``buckets``
    reducers."""
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(*[F.col(c) for c in key_cols], F.monotonically_increasing_id()), F.lit(buckets)),
    )


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[Column, Column]],
    buckets: int = 32,
) -> DataFrame:
    """Two-phase aggregation: groupBy(group_cols + salt) partial →
    groupBy(group_cols) final.

    ``aggs`` maps output name -> (partial_agg_expr, final_agg_expr_over_partial),
    e.g. {"n": (F.count(F.lit(1)), F.sum("n")),
          "mx": (F.max("v"), F.max("mx"))}.
    """
    salted = with_salt(df, group_cols, buckets)
    partial = salted.groupBy(*group_cols, "_salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*group_cols).agg(
        *[final.alias(name) for name, (_, final) in aggs.items()]
    )


def conversation_lengths_salted(
    df: DataFrame, group_col: str = "conv_id", buckets: int = 32
) -> DataFrame:
    """Example/benchmark operator: per-conversation turn counts + ts span,
    skew-safe. Equivalent to groupBy(conv_id).agg(...) but hot conversations
    fan out over ``buckets`` partial reducers."""
    return salted_agg(
        df,
        [group_col],
        {
            "n_turns": (F.count(F.lit(1)), F.sum("n_turns")),
            "min_ts": (F.min("ts"), F.min("min_ts")),
            "max_ts": (F.max("ts"), F.max("max_ts")),
            "max_turn": (F.max("turn_idx"), F.max("max_turn")),
        },
        buckets,
    )


def key_skew_report(
    df: DataFrame,
    keys: list[str],
    top_k: int = 10,
) -> DataFrame:
    """Pre-flight skew diagnosis for a planned groupBy/join key: the
    ``top_k`` heaviest key values with their row counts and skew factor
    ``skew_x = n · n_keys / n_rows`` (how many times the mean key weight
    this key carries — 1.0 is perfectly uniform; the number that tells
    you whether the key needs salting and roughly how many buckets:
    a key at skew_x = 40 on a 32-task stage serializes ~40 mean-keys'
    work through one task).

    Exactly the question the salted-aggregation machinery above answers
    AFTER the fact — this answers it BEFORE, from one cheap pass: one
    grouped count (map-side partial agg), a 1-row global summary
    broadcast onto the top-k, the top-k itself via TakeOrderedAndProject
    (no full sort). Deterministic tiebreak (count desc, then key asc) so
    two runs — or two engines — return identical rows. ``skew_x`` is
    an exact-integer product with ONE float division, reproducible
    bit-for-bit by an independent engine."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    if not keys:
        raise ValueError("keys must name at least one column")
    counts = df.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).alias("n")
    )
    summary = counts.agg(
        F.count(F.lit(1)).alias("n_keys"), F.sum("n").alias("n_rows")
    )
    return (
        counts.crossJoin(F.broadcast(summary))
        .orderBy(F.col("n").desc(), *[F.col(k).asc() for k in keys])
        .limit(top_k)
        .select(
            *keys,
            "n",
            "n_keys",
            "n_rows",
            ((F.col("n") * F.col("n_keys")) / F.col("n_rows").cast("double"))
            .alias("skew_x"),
        )
    )
