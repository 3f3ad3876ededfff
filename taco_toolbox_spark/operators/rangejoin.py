"""Time-range (proximity) join — "all right rows within [lo, hi] seconds
of each left row" without a nested-loop plan.

The need everywhere in event data: clicks within the hour before a
purchase, log lines around an error, sensor readings near a failure.
Spark compiles the direct predicate ``r.ts BETWEEN l.ts+lo AND l.ts+hi``
to BroadcastNestedLoopJoin (every left row probes every right row per
key) — quadratic per key, dead at scale.

This implementation is the classic bin-replication rewrite:

  1. pick bin width w = hi - lo (the window span);
  2. each LEFT row is replicated into the bins its window touches —
     floor((ts+lo)/w) .. floor((ts+hi)/w), which is at most 2 bins
     (3 when lo == hi), so the blow-up is bounded by a constant;
  3. each RIGHT row lands in its single bin floor(ts/w);
  4. equi-join on (keys..., bin) — a well-distributed shuffle key — then
     the EXACT window predicate filters the bin-coincidence false
     positives.

Cost at any scale: one shuffle of ≤2|L| + |R| rows, hash or sort-merge
join, no row explosion beyond true matches + same-bin near-misses.
Skew concentrates in hot (key, bin) cells — a burst of events in one
user-hour — and AQE's skew-join split handles exactly that shape.

Beyond-reference training-pipeline operator (SURVEY.md §6); oracled
against DuckDB's plain inequality join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._time import epoch_seconds


def time_range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Inner join: every (left, right) pair sharing the ``on`` keys with
    ``right_ts`` in ``[left_ts + lower_s, left_ts + upper_s]`` (bounds
    inclusive; seconds, negative = before). Returns all left columns plus
    the requested right columns (default: ``right_ts`` only), right names
    suffixed. One equi-join on (keys, time-bin); never a nested loop."""
    if lower_s > upper_s:
        raise ValueError(f"lower_s {lower_s} > upper_s {upper_s}")
    carried = {c: f"{c}{suffix}" for c in (right_cols or [right_ts])}
    clash = set(carried.values()) & set(left.columns)
    if clash:
        raise ValueError(
            f"output columns {sorted(clash)} collide with left columns; "
            "pick a different suffix"
        )
    reserved = {"_bin", "_rsec"} & (set(left.columns) | set(right.columns))
    if reserved:
        raise ValueError(
            f"columns {sorted(reserved)} collide with time_range_join's "
            "internal names; rename them first"
        )
    w = float(upper_s - lower_s) or 1.0

    lsec = epoch_seconds(left, left_ts)
    rsec = epoch_seconds(right, right_ts)
    l_ = left.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor((lsec + F.lit(float(lower_s))) / F.lit(w)),
                F.floor((lsec + F.lit(float(upper_s))) / F.lit(w)),
            )
        ),
    )
    r_ = right.select(
        *[F.col(k) for k in on],
        F.floor(rsec / F.lit(w)).alias("_bin"),
        rsec.alias("_rsec"),
        *[F.col(c).alias(a) for c, a in carried.items()],
    )
    joined = l_.join(r_, [*on, "_bin"]).filter(
        (F.col("_rsec") >= lsec + F.lit(float(lower_s)))
        & (F.col("_rsec") <= lsec + F.lit(float(upper_s)))
    )
    return joined.select(*left.columns, *[F.col(a) for a in carried.values()])
