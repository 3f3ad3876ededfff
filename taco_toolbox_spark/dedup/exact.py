"""Exact deduplication: hash-groupBy.

The scale path for 100 TB: fingerprint is computed map-side (codegen), the
shuffle carries (fingerprint, id) pairs only, and the aggregation is a plain
hash agg with partial (map-side) combine. Column pruning means the scan
reads just the text + id columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint


def exact_duplicate_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Groups of exact duplicates (normalized-text fingerprint), with the
    member ids and count. Analog of the reference duplicate-id report
    (/root/reference/tacotoolbox/tortilla/datamodel.py:235-254)."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.sort_array(F.collect_list(id_col)).alias("ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


def drop_exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one representative per fingerprint (lowest id — deterministic).
    Window-based so all original columns survive."""
    w = Window.partitionBy(fingerprint(text_col)).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
