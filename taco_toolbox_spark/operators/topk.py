"""Top-k operators with deterministic tie-breaking.

Reference: top-1-by-count with early exit (_metadata.py:344-353) and
first-10 truncation of error reports (tortilla/datamodel.py:247). Global
top-k compiles to TakeOrderedAndProject (per-partition heap + driver merge
of k rows — no full sort, no full shuffle); per-group top-k is one window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_topk(
    df: DataFrame, order_by: list, k: int, tiebreak: list[str] | None = None
) -> DataFrame:
    order = [*order_by, *[F.col(c) for c in (tiebreak or [])]]
    return df.orderBy(*order).limit(k)


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list,
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
