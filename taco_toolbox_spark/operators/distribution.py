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


def top_fraction_per_group(
    df: DataFrame,
    score_col: str,
    keep_fraction: float,
    group_cols: list[str] | None = None,
    tiebreak_cols: list[str] | None = None,
    descending: bool = True,
) -> DataFrame:
    """Keep the best ``keep_fraction`` of rows per group by score — the
    "top 50% per language by quality" corpus-filter primitive. Exactly
    ``ceil(fraction * group_size)`` rows survive per group (so every
    non-empty group keeps at least one row — a rate threshold would
    silently empty small groups), selected by (score, tiebreak...) under
    ``row_number`` so the kept set is total-order deterministic, unlike a
    ``percent_rank`` cut whose tie handling admits whole tie-blocks.

    Scale shape: one shuffle on the group key; count + row_number share
    the single window sort. Groups are corpus strata (language, source) —
    few and fat, so per-group sorts dominate: for very hot groups the
    same two-pass trick as approximate selection applies upstream
    (pre-filter by a sampled score threshold), noted rather than built
    because strata counts make this window the cheap part of a pipeline.
    """
    if not 0.0 < keep_fraction <= 1.0:
        raise ValueError(
            f"keep_fraction must be in (0, 1], got {keep_fraction}"
        )
    g = [F.col(c) for c in (group_cols or [])]
    order = [
        F.col(score_col).desc() if descending else F.col(score_col).asc(),
        *[F.col(c) for c in (tiebreak_cols or [])],
    ]
    w = Window.partitionBy(*g) if g else Window.partitionBy(F.lit(1))
    return (
        df.withColumn("_rn", F.row_number().over(w.orderBy(*order)))
        .withColumn("_n", F.count(F.lit(1)).over(w))
        .filter(F.col("_rn") <= F.ceil(F.col("_n") * F.lit(keep_fraction)))
        .drop("_rn", "_n")
    )


def transition_matrix(
    df: DataFrame,
    group_col: str,
    order_col: str,
    value_col: str,
    normalize: bool = False,
) -> DataFrame:
    """Adjacent-pair (Markov transition) counts of a categorical column
    within groups: ``(prev, cur, n)`` over consecutive rows by
    ``order_col`` — the structural profile a transcript corpus is audited
    with (which role follows which, how often a tool call is answered),
    and the empirical basis for a SequenceCheck's ``allowed`` set. One lag
    window (shared shuffle key shape with the validation battery) into one
    map-side-combined count; NULL values count as a category (they are
    real protocol states), group-opening rows have no prev and are
    excluded. ``normalize=True`` adds each row's probability within its
    ``prev`` (a tiny per-prev window over |vocab|^2 rows)."""
    w = Window.partitionBy(group_col).orderBy(order_col)
    pairs = df.select(
        F.lag(F.col(value_col)).over(w).alias("prev"),
        F.col(value_col).alias("cur"),
        F.row_number().over(w).alias("_rn"),
    ).filter(F.col("_rn") > 1)
    out = pairs.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("n"))
    if normalize:
        wp = Window.partitionBy("prev")
        out = out.withColumn("p", F.col("n") / F.sum("n").over(wp))
    return out


def gini_simpson(
    df: DataFrame,
    cat_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Gini–Simpson diversity index per group: the probability that two
    rows drawn WITHOUT replacement have different ``cat_col`` values,
    1 − Σ nᵢ(nᵢ−1) / (N(N−1)). The mixture-health metric for a data-mix
    pipeline (is a shard/language dominated by one source?) that, unlike
    Shannon entropy, stays in RATIONAL arithmetic: every numerator and
    denominator is an exact BIGINT of the category counts, with ONE
    double division at the end — so the index reproduces bit-for-bit
    across engines, partition counts, and reruns (ln() does not).

    Plan shape: two map-side-combined hash aggregations (rows → category
    counts → per-group sums); shuffle volume is bounded by the category
    vocabulary per group, never the row count. NULL categories count as
    a real category (a mixture can be dominated by "unknown"). Groups
    with N < 2 have no draw-two experiment: diversity is NULL, never a
    division by zero. Output: group cols, ``n_rows``, ``n_cats``,
    ``diversity``."""
    g = [*(group_cols or [])]
    counts = df.groupBy(*g, cat_col).agg(F.count(F.lit(1)).alias("_n"))
    same = F.sum(F.col("_n") * (F.col("_n") - 1))
    total = F.sum("_n")
    return (
        counts.groupBy(*g)
        .agg(
            total.alias("n_rows"),
            F.count(F.lit(1)).alias("n_cats"),
            same.alias("_same"),
        )
        .select(
            *g,
            "n_rows",
            "n_cats",
            F.when(
                F.col("n_rows") >= 2,
                1.0
                - F.col("_same")
                / (F.col("n_rows") * (F.col("n_rows") - F.lit(1))),
            ).alias("diversity"),
        )
    )
