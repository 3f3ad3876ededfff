"""Count-min sketch — fixed-size, mergeable frequency state.

At 10^12 turns an exact per-key histogram over an open vocabulary (user
ids, tool names in the wild, n-grams) is unbounded state; a count-min
sketch caps it at ``depth × width`` BIGINT counters with a one-sided
guarantee (estimates only ever OVER-count, by ≤ e·N/width with
probability 1−e^−depth). That one-sidedness is what makes it a sound
heavy-hitter *candidate generator*: no true heavy hitter is ever missed,
and an exact verification pass removes the false positives.

Construction is pure JVM: each row contributes ``depth`` (row, bucket)
pairs via :func:`~taco_toolbox_spark.operators.sampling.hash_bucket`
(xxhash64 fast path, md5 portability mode — the DuckDB oracle replays the
identical arithmetic), then ONE grouped count. Map-side partial
aggregation collapses each task's output to ≤ depth·width rows before the
shuffle, so shuffle volume is bounded by ``tasks × depth × width``
REGARDLESS of input rows — the property that lets the same job run at
10^12 turns. Merging sketches (across partitions, runs, or engines) is
element-wise integer addition, which is why the per-partition counters
checkpoint into the manifest (checkpoint.py:record_cms_state) and resume
without rescanning finished partitions.

Reference parity: tacotoolbox keeps exact per-band/per-field histograms
(tacotoolbox/datamodel inventories) — viable only because its datasets
are single-machine; this is the bounded-state analog SURVEY.md §6 calls
for at 100 TB.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.sampling import hash_bucket

#: Internal column names this module appends during construction; caller
#: frames must not already use them (mirrors operators/asof.py's guard).
_RESERVED = {"_d", "_bucket", "_cnt", "_est"}


def _check_reserved(df: DataFrame) -> None:
    clash = _RESERVED & set(df.columns)
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with count-min "
            f"internal names {sorted(_RESERVED)}"
        )


def cms_counters(
    df: DataFrame,
    key_cols: list[str],
    depth: int = 4,
    width: int = 1024,
    part_col: str | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Count-min counters for ``key_cols``: one row per non-empty
    ``(d, bucket)`` cell — ``([part,] _d, _bucket, _cnt)``. Row ``d``
    buckets with seed ``d`` (md5 mode: first-32-md5-bits of the
    ``'\\x1f'``-joined key string with the seed appended, mod ``width`` —
    engine-portable). With ``part_col`` the counters are PER PARTITION
    (mergeable state for the checkpoint manifest); without, corpus-wide.

    Plan shape: scan → depth-way posexplode (pure column expressions, no
    Python) → partial count (map-side, caps task output at depth·width
    rows) → one shuffle of ≤ tasks·depth·width rows → final count.
    """
    if depth < 1 or width < 2:
        raise ValueError(f"need depth ≥ 1 and width ≥ 2, got {depth}/{width}")
    _check_reserved(df)
    buckets = F.array(
        *[
            hash_bucket(key_cols, seed=d, hash_fn=hash_fn, buckets=width)
            for d in range(depth)
        ]
    )
    group = ([part_col] if part_col else []) + ["_d", "_bucket"]
    return (
        df.select(
            *([part_col] if part_col else []),
            F.posexplode(buckets).alias("_d", "_bucket"),
        )
        .groupBy(*group)
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )


def cms_merge(counters: DataFrame) -> DataFrame:
    """Merge per-partition counters into one sketch: element-wise integer
    sum over ``(_d, _bucket)``. The input is already ≤ parts·depth·width
    rows, so this is a trivial aggregation — the partial→final pattern
    across partitions (and, via the manifest, across runs)."""
    return counters.groupBy("_d", "_bucket").agg(F.sum("_cnt").alias("_cnt"))


def cms_total(counters: DataFrame) -> int:
    """Total observations N recorded in a merged sketch — every row of
    the table contributes exactly once to depth row 0, so N is the sum of
    that one row's counters. One action over ≤ width rows."""
    row = counters.filter(F.col("_d") == 0).agg(
        F.coalesce(F.sum("_cnt"), F.lit(0)).alias("n")
    ).first()
    return int(row["n"])


def cms_lookup(
    counters: DataFrame,
    candidates: DataFrame,
    key_cols: list[str],
    depth: int = 4,
    width: int = 1024,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Estimated count for each candidate row: ``min`` over the sketch's
    ``depth`` rows of the candidate's bucket counter (an absent cell is
    0). Appends ``_est`` to ``candidates``. The sketch is ≤ depth·width
    rows, so the join side is broadcast — estimating any candidate set
    costs one narrow pass over the candidates, never a rescan of the
    data the sketch summarizes."""
    _check_reserved(candidates)
    buckets = F.array(
        *[
            hash_bucket(key_cols, seed=d, hash_fn=hash_fn, buckets=width)
            for d in range(depth)
        ]
    )
    exploded = candidates.select(
        *candidates.columns, F.posexplode(buckets).alias("_d", "_bucket")
    )
    return (
        exploded.join(F.broadcast(counters), ["_d", "_bucket"], "left")
        .groupBy(*candidates.columns)
        .agg(F.min(F.coalesce(F.col("_cnt"), F.lit(0))).alias("_est"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_cols: list[str],
    min_fraction: float,
    depth: int = 4,
    width: int = 1024,
    hash_fn: str = "xxhash64",
    verify_exact: bool = True,
) -> DataFrame:
    """Keys whose frequency is ≥ ``min_fraction`` of the table, found via
    the sketch: distinct keys → CMS estimate → keep ``_est ≥ ⌈f·N⌉``
    (over-count-only ⇒ NO false negatives) → exact verification count of
    the surviving candidates only. Returns ``(*key_cols, n)`` with the
    EXACT count, so the result is engine-portable (the DuckDB oracle is a
    plain GROUP BY … HAVING) while the plan never builds an exact
    histogram over the full key universe — the candidate set after the
    sketch filter is ≤ 1/f keys plus the sketch's bounded false-positive
    tail, and the verify join broadcasts it.

    ``verify_exact=False`` returns the sketch estimates themselves
    (``(*key_cols, _est)``) — the streaming/monitoring mode where a
    second pass over the data is unavailable.
    """
    if not (0.0 < min_fraction <= 1.0):
        raise ValueError(f"min_fraction must be in (0, 1], got {min_fraction}")
    counters = cms_merge(
        cms_counters(df, key_cols, depth=depth, width=width, hash_fn=hash_fn)
    )
    n = cms_total(counters)
    floor = math.ceil(n * min_fraction)
    cand = cms_lookup(
        counters,
        df.select(*key_cols).distinct(),
        key_cols,
        depth=depth,
        width=width,
        hash_fn=hash_fn,
    ).filter(F.col("_est") >= F.lit(floor))
    if not verify_exact:
        return cand
    return (
        df.join(F.broadcast(cand.select(*key_cols)), key_cols, "inner")
        .groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= F.lit(floor))
    )
