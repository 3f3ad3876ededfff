"""Empty-column pruning — reference P3
(/root/reference/tacotoolbox/_column_utils.py:129-170): drop columns that
are entirely null or entirely empty/'None' strings, preserving protected
columns. ONE aggregation over all candidate columns (not one scan per
column)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def prune_empty_columns(
    df: DataFrame, protect: tuple[str, ...] = ()
) -> tuple[DataFrame, list[str]]:
    """Returns (pruned_df, dropped_column_names)."""
    candidates = [f for f in df.schema.fields if f.name not in protect]
    if not candidates:
        return df, []
    aggs = []
    for f in candidates:
        c = F.col(f.name)
        if isinstance(f.dataType, T.StringType):
            useful = F.count(
                F.when(c.isNotNull() & (c != "") & (c != "None"), 1)
            )
        else:
            useful = F.count(c)
        aggs.append(useful.alias(f.name))
    row = df.agg(*aggs).first()
    dropped = [f.name for f in candidates if (row[f.name] or 0) == 0]
    return (df.drop(*dropped) if dropped else df), dropped
