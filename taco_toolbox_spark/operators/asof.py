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

  1. stack both sides into one frame tagged ``_side`` (right=0, left=1);
     each right row carries ONE struct of its payload columns, so the
     match is always a coherent single right row — a right row whose
     value column is legitimately NULL yields NULL (never an older
     row's value smuggled under a newer timestamp);
  2. one shuffle on the key, sort within partition by (ts, _side),
  3. ``last(struct, ignorenulls=True)`` over an unbounded-preceding
     running window carries the latest right ROW forward,
  4. keep the left rows, unpack the struct.

Cost at any scale: ONE shuffle of |left| + |right| rows and a sort —
identical shape to a sort-merge join, no row amplification, no driver
state. Ordering (ts, _side) makes the match inclusive: a right row at
exactly left_ts sorts before the left row and is visible to it.

Skewed keys: the plain window is per-key sequential, so a single hot
key serializes one task. ``chunk_s`` switches to the skew-proof
distributed-prefix path: rows are windowed within (key, ts-chunk) —
bounding any task to one chunk of the hot key — and chunk boundaries
are reconciled by carrying each chunk's last right row forward over a
tiny per-chunk frame (one row per occupied chunk) joined back in. Same
answer, one extra small join; the same shape as the engine's chunked
monotone pass (engine.py:_window_pass_chunked).

Beyond-reference training-pipeline operator (SURVEY.md §6); oracled
against DuckDB's native ASOF LEFT JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_asof",
    tolerance_s: float | None = None,
    chunk_s: float | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join. Returns every left row plus
    ``<right_col><suffix>`` for each requested right column and
    ``<right_ts><suffix>`` (the matched timestamp) — all null when no
    right row precedes the left row (or the match is older than
    ``tolerance_s`` seconds, when given). The carried values always come
    from the single matched right row, so a NULL in a right value column
    stays NULL in the output (merge_asof semantics).

    ``right`` must be unique per (key, right_ts); pre-aggregate it
    otherwise (e.g. ``groupBy(key, ts).agg(max_by(...))``) — with
    duplicates the carried row would depend on partition-internal
    order, and DuckDB's ASOF has the same ambiguity.

    ``chunk_s`` (seconds): bound every window task to one ts-chunk per
    key — set it when one hot key would otherwise serialize (pick a span
    holding ~100k-1M rows of the hottest key). Results are identical to
    the plain path.
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
    internal = {"_ts", "_side", "_pack", "_fpack", "_chunk", "_carry"}
    reserved = internal & (set(left.columns) | set(right.columns))
    if reserved:
        raise ValueError(
            f"columns {sorted(reserved)} collide with asof_join's internal "
            "names; rename them first"
        )

    pack = F.struct(
        *[F.col(c).alias(a) for c, a in carried.items()]
    )
    r = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        pack.alias("_pack"),
    )
    l_ = left.select(
        *left.columns,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_pack"].dataType).alias("_pack"),
    )
    both = l_.unionByName(r, allowMissingColumns=True)

    if chunk_s is None:
        w = (
            Window.partitionBy(*on)
            .orderBy("_ts", "_side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        filled = both.select(
            *l_.columns,
            F.last("_pack", ignorenulls=True).over(w).alias("_fpack"),
        )
    else:
        filled = _chunked_fill(both, r, on, l_.columns, float(chunk_s))

    out = filled.filter(F.col("_side") == 1)
    ts_a = carried[right_ts]
    if tolerance_s is not None:
        # tolerance nulls the WHOLE matched row (the match is stale as a
        # unit — merge_asof's tolerance semantics)
        def _secs(c: F.Column, dt: str) -> F.Column:
            if dt.startswith("timestamp"):
                return c.cast("timestamp").cast("double")
            return c.cast("double")

        age = _secs(F.col("_ts"), dict(left.dtypes)[left_ts]) - _secs(
            F.col(f"_fpack.{ts_a}"), dict(right.dtypes)[right_ts]
        )
        out = out.withColumn(
            "_fpack",
            F.when(
                age <= F.lit(float(tolerance_s)), F.col("_fpack")
            ).otherwise(F.lit(None).cast(r.schema["_pack"].dataType)),
        )
    return out.select(
        *left.columns,
        *[F.col(f"_fpack.{a}").alias(a) for a in carried.values()],
    )


def _chunked_fill(
    both: DataFrame,
    r: DataFrame,
    on: list[str],
    left_cols: list[str],
    chunk_s: float,
) -> DataFrame:
    """Skew-proof running fill: window within (key, ts-chunk), carry the
    last right row of preceding chunks in via a tiny per-chunk frame."""
    chunk = F.floor(
        F.unix_timestamp(F.col("_ts").cast("timestamp")).cast("double")
        / F.lit(chunk_s)
    )
    bothc = both.withColumn("_chunk", chunk)
    # last right row per occupied (key, chunk): one row per chunk —
    # orders of magnitude smaller than the data
    last_r = (
        bothc.filter(F.col("_side") == 0)
        .groupBy(*on, "_chunk")
        .agg(F.max_by("_pack", "_ts").alias("_last"))
    )
    grid = bothc.select(*on, "_chunk").distinct()
    wc = (
        Window.partitionBy(*on)
        .orderBy("_chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        grid.join(last_r, [*on, "_chunk"], "left")
        .select(
            *on,
            "_chunk",
            F.last("_last", ignorenulls=True).over(wc).alias("_carry"),
        )
    )
    w2 = (
        Window.partitionBy(*on, "_chunk")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        bothc.join(carry, [*on, "_chunk"], "left")
        .select(
            *left_cols,
            "_chunk",
            F.coalesce(
                F.last("_pack", ignorenulls=True).over(w2), F.col("_carry")
            ).alias("_fpack"),
        )
    )
