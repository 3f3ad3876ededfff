"""Extent aggregation: spatial bbox (with antimeridian handling) and
temporal ranges, plus the partial→final union across partitions.

Reference: spatial extent from centroids with antimeridian split (keep the
longitude group with the larger span)
/root/reference/tacotoolbox/taco/datamodel.py:520-560; temporal extent with
prioritized time-column coalescing :563-611; cross-partition min-of-mins /
max-of-maxes union _tacollection.py:379-466.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def temporal_extent(
    df: DataFrame,
    time_cols: list[str],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """min/max over the first non-null of prioritized time columns (A6)."""
    t = F.coalesce(*[F.col(c) for c in time_cols])
    g = df.groupBy(*group_cols) if group_cols else df.groupBy()
    return g.agg(F.min(t).alias("time_start"), F.max(t).alias("time_end"))


def spatial_extent(df: DataFrame, lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """bbox of points with the reference's antimeridian rule: if points span
    both hemispheres, compute per-sign-group bboxes and keep the group with
    the larger longitude span (taco/datamodel.py:520-560). One aggregation
    with conditional (sign-partitioned) min/max — no second scan."""
    lon, lat = F.col(lon_col), F.col(lat_col)
    west = F.when(lon < 0, lon)
    east = F.when(lon >= 0, lon)
    agg = df.agg(
        F.min(lon).alias("min_lon"),
        F.max(lon).alias("max_lon"),
        F.min(lat).alias("min_lat"),
        F.max(lat).alias("max_lat"),
        F.min(west).alias("w_min"),
        F.max(west).alias("w_max"),
        F.min(east).alias("e_min"),
        F.max(east).alias("e_max"),
    )
    span_all = F.col("max_lon") - F.col("min_lon")
    span_w = F.col("w_max") - F.col("w_min")
    span_e = F.col("e_max") - F.col("e_min")
    crosses = (
        F.col("w_min").isNotNull()
        & F.col("e_min").isNotNull()
        & (span_all > F.lit(180.0))
    )
    pick_w = crosses & (F.coalesce(span_w, F.lit(-1.0)) >= F.coalesce(span_e, F.lit(-1.0)))
    pick_e = crosses & ~pick_w
    return agg.select(
        F.when(pick_w, F.col("w_min"))
        .when(pick_e, F.col("e_min"))
        .otherwise(F.col("min_lon"))
        .alias("west"),
        F.when(pick_w, F.col("w_max"))
        .when(pick_e, F.col("e_max"))
        .otherwise(F.col("max_lon"))
        .alias("east"),
        F.col("min_lat").alias("south"),
        F.col("max_lat").alias("north"),
    )


def union_extents(per_partition: DataFrame) -> DataFrame:
    """A7 partial→final merge: given per-partition extent rows
    (time_start/time_end or west/east/south/north), produce the global
    extent — min of mins / max of maxes (same shape Spark uses internally
    for partial aggregation, made explicit across checkpointed runs)."""
    aggs = []
    cols = set(per_partition.columns)
    if "time_start" in cols:
        aggs += [
            F.min("time_start").alias("time_start"),
            F.max("time_end").alias("time_end"),
        ]
    if "west" in cols:
        aggs += [
            F.min("west").alias("west"),
            F.max("east").alias("east"),
            F.min("south").alias("south"),
            F.max("north").alias("north"),
        ]
    return per_partition.agg(*aggs)
