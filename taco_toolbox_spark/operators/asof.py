"""As-of (most-recent-prior) join — temporal enrichment without a range
join.

``asof_join(left, right, on, ...)`` attaches, to every left row, the
right-side row with the greatest ``right_ts <= left_ts`` for the same
key (backward inclusive — the DuckDB/pandas ``merge_asof`` convention).
The classic need: enrich each event with the latest prior state snapshot
(price at order time, last click before a purchase, most recent model
checkpoint before a sample).

Spark has no ASOF JOIN operator, and the naive encodings die at scale:
an inequality theta-join degenerates to BroadcastNestedLoopJoin
(quadratic), and "join then pick max per pair" materializes every
(left, candidate) pair first. This implementation is the union-tag scan:

  1. stack both sides into one frame tagged ``_side`` (right=0, left=1),
  2. one shuffle on the key, sort within partition by (ts, _side),
  3. ``last(value, ignorenulls=True)`` over an unbounded-preceding
     running window carries the latest right values forward,
  4. keep the left rows.

Cost at any scale: ONE shuffle of |left| + |right| rows and a sort —
identical shape to a sort-merge join, no row amplification, no driver
state. Ordering (ts, _side) makes the match inclusive: a right row at
exactly left_ts sorts before the left row and is visible to it.
Skewed keys: the window is per-key sequential, so a single hot key
serializes; pre-split hot keys upstream (skew.py) or bucket the corpus
by key so AQE sees the skew at the shuffle.

Beyond-reference training-pipeline operator (SURVEY.md §6); oracled
against DuckDB's native ASOF LEFT JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ._time import epoch_seconds


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_asof",
    tolerance_s: float | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join. Returns every left row plus
    ``<right_col><suffix>`` for each requested right column and
    ``<right_ts><suffix>`` (the matched timestamp) — all null when no
    right row precedes the left row (or the match is older than
    ``tolerance_s`` seconds, when given).

    ``right`` must be unique per (key, right_ts); pre-aggregate it
    otherwise (e.g. ``groupBy(key, ts).agg(max_by(...))``) — with
    duplicates the carried value would depend on partition-internal
    order, and DuckDB's ASOF has the same ambiguity.
    """
    if not right_cols:
        raise ValueError("right_cols must name at least one column to carry")
    carried = {c: f"{c}{suffix}" for c in [*right_cols, right_ts]}
    clash = set(carried.values()) & set(left.columns)
    if clash:
        raise ValueError(
            f"output columns {sorted(clash)} collide with left columns; "
            "pick a different suffix"
        )
    internal = {"_ts", "_side", *[f"_f_{a}" for a in carried.values()]}
    reserved = internal & (set(left.columns) | set(right.columns))
    if reserved:
        raise ValueError(
            f"columns {sorted(reserved)} collide with asof_join's internal "
            "names; rename them first"
        )

    r = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(a) for c, a in carried.items()],
    )
    l_ = left.select(
        *left.columns,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(a)
          for c, a in carried.items()],
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_.unionByName(r, allowMissingColumns=True).select(
        *l_.columns,
        *[
            F.last(a, ignorenulls=True).over(w).alias(f"_f_{a}")
            for a in carried.values()
        ],
    )
    out = filled.filter(F.col("_side") == 1)
    ts_a = carried[right_ts]
    if tolerance_s is not None:
        stale = (
            epoch_seconds(out, "_ts") - epoch_seconds(out, f"_f_{ts_a}")
        ) > F.lit(float(tolerance_s))
        keep = {
            a: F.when(stale, F.lit(None)).otherwise(F.col(f"_f_{a}")).alias(a)
            for a in carried.values()
        }
    else:
        keep = {a: F.col(f"_f_{a}").alias(a) for a in carried.values()}
    return out.select(*left.columns, *keep.values())
