"""Output partitioning operators: size-based bin packing, key-based
partitioned sinks, consolidation.

Reference: greedy ≤4 GB bin packing (/root/reference/tacotoolbox/
create.py:454-478), one-container-per-group-value (create.py:298-357),
multi-partition consolidation with schema checks (tacocat.py:49-111).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..schema import align_union, compare_schema


def assign_size_bins(
    df: DataFrame,
    size_col: str,
    max_bin_size: int,
    order_cols: list[str],
    bin_col: str = "bin_id",
) -> DataFrame:
    """S8: running-total bin assignment — cumulative sum of sizes in the
    given deterministic order, bin = floor(cum_before / max). Single window
    pass; matches the reference's greedy packing semantics for items below
    the bin size (oversized rows get their own spillover bins by
    construction)."""
    w = Window.orderBy(*[F.col(c) for c in order_cols]).rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum_before = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return df.withColumn(bin_col, F.floor(cum_before / F.lit(max_bin_size)))


def write_partitioned_by_key(
    df: DataFrame, out_dir: str, keys: list[str], max_records_per_file: int = 0
) -> None:
    """S9: one directory per distinct key value."""
    w = df.write.mode("overwrite").partitionBy(*keys)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(out_dir)


def consolidate(
    dfs: list[DataFrame],
    source_names: list[str] | None = None,
    strict_schema: bool = True,
) -> DataFrame:
    """S10 consolidation: schema-check each input against the first, tag
    provenance (S7 internal:source_file analog), union. With
    strict_schema=False, schemas are aligned with typed nulls instead
    (reference loose mode)."""
    if strict_schema:
        ref = dfs[0].schema
        for i, d in enumerate(dfs[1:], 1):
            diff = compare_schema(d.schema, ref, allow_extra=False)
            if not diff.ok:
                raise ValueError(f"input {i} schema mismatch: {diff.report()}")
    tagged = []
    for i, d in enumerate(dfs):
        name = source_names[i] if source_names else f"source_{i}"
        tagged.append(d.withColumn("source_file", F.lit(name)))
    return align_union(tagged)


def read_with_provenance(spark, path: str) -> DataFrame:
    """S7: scan with per-row source-file provenance."""
    df = spark.read.parquet(path)
    return df.withColumn("source_file", F.input_file_name())
