"""Shared time arithmetic for the temporal join operators."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def epoch_seconds(df: DataFrame, col: str) -> Column:
    """Numeric seconds for window arithmetic, for any orderable time-ish
    column: numerics pass through, TIMESTAMP casts directly, and
    TIMESTAMP_NTZ (what a parquet read yields) goes through TIMESTAMP
    first — Spark refuses the direct ntz→double cast. Sessions here run
    UTC (session.py), so ntz→ltz re-interpretation is identity."""
    dt = dict(df.dtypes)[col]
    c = F.col(col)
    if dt.startswith("timestamp"):
        return c.cast("timestamp").cast("double")
    return c.cast("double")
