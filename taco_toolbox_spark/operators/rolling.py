"""Trailing time-window aggregates (RANGE-frame windows) — event-rate /
burst validation over transcripts and event streams.

The engine's window passes so far are all ROW-frame (lag/lead ordering
checks, running totals); rate rules need a TIME frame: "no more than K
events per key in any trailing W seconds" (abuse / retry-storm / runaway-
agent detection — a turn-rate rule over conversations, an event-rate rule
over users). Expressed declaratively as a ``rangeBetween`` window over
truncated epoch seconds, Catalyst evaluates it in the SAME single sort
per key that the ordering checks use — no self-join, no explosion of
(row x window) pairs, one shuffle on the key.

Determinism contract: the frame is keyed on the INTEGER second
(``floor`` of epoch seconds — TIMESTAMP_NTZ parquet reads routed through
TIMESTAMP, ``operators/_time.py``; an independent engine reproduces it
as ``floor(epoch(ts))``). Rows sharing a truncated second share one frame
(RANGE semantics), so the result is independent of intra-second row
order — the property that makes the count reproducible bit-for-bit
across partitionings and engines. Only order-independent aggregates are
exposed (count / min / max); a float ``sum`` over a sliding frame would
hash-diverge across tie orders and engines.

Scale: one shuffle on ``keys``; a hot key serializes its own window sort
exactly like the engine's per-conversation ordering checks — the same
mitigation applies (finer keys, or pre-splitting by coarse time bucket
when the rule's window is much smaller than the bucket).

Beyond-reference training-pipeline/validation operator (SURVEY.md §6);
the reference validator has no time-rate rule surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ._time import epoch_seconds


def _trunc_epoch(df: DataFrame, ts_col: str) -> Column:
    """Truncated integer epoch second for the RANGE frame — routed
    through epoch_seconds so TIMESTAMP_NTZ (what a parquet read yields)
    works; floor(double seconds) == the oracle's floor(epoch(ts))."""
    return F.floor(epoch_seconds(df, ts_col)).cast("long")


def trailing_counts(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    seconds: int = 3600,
    out_col: str = "n_trailing",
) -> DataFrame:
    """Every input row plus ``out_col`` = how many rows of the same key
    fall in the trailing ``[t - seconds, t]`` window (both ends
    INCLUSIVE, at one-second resolution — the row itself counts, so the
    minimum value is 1)."""
    if seconds < 0:
        raise ValueError(f"seconds must be >= 0, got {seconds}")
    if out_col in df.columns or "_epoch_s" in df.columns:
        raise ValueError(
            f"input already has {out_col!r}/'_epoch_s' — rename first"
        )
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col("_epoch_s"))
        .rangeBetween(-int(seconds), 0)
    )
    return (
        df.withColumn("_epoch_s", _trunc_epoch(df, ts_col))
        .withColumn(out_col, F.count(F.lit(1)).over(w))
        .drop("_epoch_s")
    )


def trailing_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    ts_col: str = "ts",
    seconds: int = 3600,
) -> DataFrame:
    """General trailing-window form: ``aggs`` maps output column name →
    aggregate Column (caller's responsibility to keep them
    order-independent — count/min/max/countDistinct-free; see module
    docstring). Each is evaluated over the same trailing RANGE frame."""
    if seconds < 0:
        raise ValueError(f"seconds must be >= 0, got {seconds}")
    clash = (set(aggs) | {"_epoch_s"}) & set(df.columns)
    if clash:
        raise ValueError(f"output names collide with input: {sorted(clash)}")
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col("_epoch_s"))
        .rangeBetween(-int(seconds), 0)
    )
    out = df.withColumn("_epoch_s", _trunc_epoch(df, ts_col))
    for name, col in aggs.items():
        out = out.withColumn(name, col.over(w))
    return out.drop("_epoch_s")


def burst_violations(
    df: DataFrame,
    keys: Sequence[str],
    max_events: int,
    ts_col: str = "ts",
    seconds: int = 3600,
    check_id: str = "burst_rate",
) -> DataFrame:
    """Violation rows for the rate rule "at most ``max_events`` rows per
    key in any trailing ``seconds`` window": one row per input row whose
    trailing count exceeds the bound, carrying (check_id, keys..., ts,
    n_trailing). The FIRST ``max_events`` rows of a burst are compliant
    by construction — only the overflow rows fire, so fixing a burst
    means dropping exactly the flagged rows."""
    if max_events < 1:
        raise ValueError(f"max_events must be >= 1, got {max_events}")
    # NULL timestamps never fire a rate rule (they are the row pass's
    # not-null problem) — the same exemption the engine RateCheck and the
    # streaming twin apply, so all three emit identical violation sets
    counted = trailing_counts(
        df.filter(F.col(ts_col).isNotNull()), keys, ts_col, seconds
    )
    return counted.filter(F.col("n_trailing") > max_events).select(
        F.lit(check_id).alias("check_id"),
        *[F.col(k) for k in keys],
        F.col(ts_col),
        F.col("n_trailing"),
    )
