"""Single-pass per-partition column statistics.

Generalizes the reference's per-band continuous/categorical stats
(/root/reference/tacotoolbox/sample/extensions/geotiff_stats.py:158-268:
min/max/mean/std/valid-percent + histogram percentiles) and its extent
aggregations (taco/datamodel.py:520-611). ONE groupBy(partition) aggregation
computes every column's profile — count, null fraction, min/max,
approx-distinct (HLL, per north_star), mean/std for numerics — then the wide
agg row is unpivoted to long format with a zero-shuffle explode.

At 10^12 rows this is the cheap path: map-side partial aggregation means the
shuffle carries one row per (partition × HLL sketch), not data rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)

STATS_COLUMNS = (
    "part",
    "column",
    "dtype",
    "n_rows",
    "n_nonnull",
    "null_frac",
    "approx_distinct",
    "min",
    "max",
    "mean",
    "std",
    "p25",
    "p50",
    "p75",
    "p95",
)

QUANTILE_PROBS = (0.25, 0.50, 0.75, 0.95)


def column_stats(
    df: DataFrame,
    partition_col: str = "part",
    columns: list[str] | None = None,
    rsd: float = 0.02,
    exact_quantiles: bool = False,
) -> DataFrame:
    """Long-format per-(partition, column) profile in a single aggregation.

    ``rsd`` is the HyperLogLog relative standard deviation for
    approx_count_distinct. Numeric columns get p25/p50/p75/p95 — mirroring
    the reference's per-band percentile profile
    (sample/extensions/geotiff_stats.py:251-264) — via percentile_approx
    (GK sketch, mergeable map-side, the 100 TB path) or, with
    ``exact_quantiles=True``, the exact sort-based percentile for
    small/oracle-checked profiles.
    """
    fields = [
        f
        for f in df.schema.fields
        if f.name != partition_col and (columns is None or f.name in columns)
    ]
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for f in fields:
        c = F.col(f.name)
        aggs += [
            F.count(c).alias(f"_{f.name}_nn"),
            F.approx_count_distinct(c, rsd).alias(f"_{f.name}_ad"),
            F.min(c).cast("string").alias(f"_{f.name}_min"),
            F.max(c).cast("string").alias(f"_{f.name}_max"),
        ]
        if isinstance(f.dataType, _NUMERIC):
            probs = F.array(*[F.lit(p) for p in QUANTILE_PROBS])
            quant = (
                F.percentile(c, probs)
                if exact_quantiles
                else F.percentile_approx(c, probs, 10_000)
            )
            aggs += [
                F.avg(c).alias(f"_{f.name}_mean"),
                F.stddev(c).alias(f"_{f.name}_std"),
                quant.alias(f"_{f.name}_q"),
            ]
    agg_df = df.groupBy(F.col(partition_col).cast("string").alias("part")).agg(*aggs)

    structs = []
    for f in fields:
        is_num = isinstance(f.dataType, _NUMERIC)
        structs.append(
            F.struct(
                F.lit(f.name).alias("column"),
                F.lit(f.dataType.simpleString()).alias("dtype"),
                F.col("_n_rows").alias("n_rows"),
                F.col(f"_{f.name}_nn").alias("n_nonnull"),
                (
                    (F.col("_n_rows") - F.col(f"_{f.name}_nn"))
                    / F.greatest(F.col("_n_rows"), F.lit(1))
                ).alias("null_frac"),
                F.col(f"_{f.name}_ad").alias("approx_distinct"),
                F.col(f"_{f.name}_min").alias("min"),
                F.col(f"_{f.name}_max").alias("max"),
                (F.col(f"_{f.name}_mean") if is_num else F.lit(None).cast("double")).alias("mean"),
                (F.col(f"_{f.name}_std") if is_num else F.lit(None).cast("double")).alias("std"),
                *[
                    (
                        F.element_at(F.col(f"_{f.name}_q"), i + 1).cast("double")
                        if is_num
                        else F.lit(None).cast("double")
                    ).alias(f"p{round(p * 100)}")
                    for i, p in enumerate(QUANTILE_PROBS)
                ],
            )
        )
    return agg_df.select("part", F.explode(F.array(*structs)).alias("s")).select(
        "part", "s.*"
    )


def global_stats(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_quantiles: bool = False,
) -> DataFrame:
    """Whole-table profile (partition = '_all')."""
    return column_stats(
        df.withColumn("_all_part", F.lit("_all")),
        partition_col="_all_part",
        columns=columns,
        exact_quantiles=exact_quantiles,
    )


def distinct_sketches(
    df: DataFrame,
    columns: list[str] | None = None,
    partition_col: str = "part",
    lg_k: int = 12,
) -> DataFrame:
    """Per-(partition, column) PERSISTABLE distinct sketches: Spark's
    DataSketches HLL aggregate (``hll_sketch_agg``) emits the sketch
    BYTES, so unlike ``approx_count_distinct`` the state outlives the
    query — it can be stored in the checkpoint manifest and unioned
    across partitions, runs, and tables without rescanning data (the
    north_star's "sketch state" for distinct counts). One groupBy pass,
    map-side partial merge; shuffle carries one 2^lg_k-register sketch
    per (partition, column). Returns (part, column, sketch, approx_distinct).

    ``hll_sketch_agg`` accepts int/long/string/binary only, so the
    ``columns=None`` default sketches exactly those columns (a timestamp
    or double column would raise DATATYPE_MISMATCH); pass columns
    explicitly, with casts applied beforehand, to sketch anything else.
    The partition key is cast to string to match every other manifest
    surface (record_partition, column_stats) — mixed-type manifest keys
    would collide after a JSON round-trip.
    """
    sketchable = (T.IntegerType, T.LongType, T.StringType, T.BinaryType)
    cols = columns or [
        f.name
        for f in df.schema.fields
        if f.name != partition_col and isinstance(f.dataType, sketchable)
    ]
    wide = df.groupBy(F.col(partition_col).cast("string").alias("part")).agg(
        *[F.hll_sketch_agg(c, lg_k).alias(f"_{c}_sk") for c in cols]
    )
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"), F.col(f"_{c}_sk").alias("sketch")
            )
            for c in cols
        ]
    )
    return wide.select("part", F.explode(entries).alias("e")).select(
        "part",
        "e.column",
        "e.sketch",
        F.hll_sketch_estimate("e.sketch").alias("approx_distinct"),
    )


def merge_distinct_sketches(sketches: DataFrame) -> DataFrame:
    """Partial→final across partitions (or across runs, once re-read from
    a manifest): union the sketch bytes per column and estimate. Sketch
    union is exact over register state, so merging per-partition sketches
    gives the IDENTICAL estimate the whole-table sketch would (tested)."""
    return sketches.groupBy("column").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
            "approx_distinct"
        )
    )


def _exact_profile(df: DataFrame, columns: list[str]) -> DataFrame:
    """One single-pass aggregation -> long (col_name, n_rows, n_nonnull,
    n_distinct, min_val, max_val) with min/max cast to string (type-
    uniform across heterogeneous columns, lexicographic-safe for the
    numeric casts the caller applies)."""
    agg = df.agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.count(c).alias(f"_{c}_nn") for c in columns],
        *[F.countDistinct(c).alias(f"_{c}_nd") for c in columns],
        *[F.min(F.col(c)).cast("string").alias(f"_{c}_mn") for c in columns],
        *[F.max(F.col(c)).cast("string").alias(f"_{c}_mx") for c in columns],
    )
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("_n").alias("n_rows"),
            F.col(f"_{c}_nn").alias("n_nonnull"),
            F.col(f"_{c}_nd").alias("n_distinct"),
            F.col(f"_{c}_mn").alias("min_val"),
            F.col(f"_{c}_mx").alias("max_val"),
        )
        for c in columns
    ]
    return agg.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def profile_drift(
    prev: DataFrame, cur: DataFrame, columns: list[str]
) -> DataFrame:
    """Per-column profile drift between two corpus versions — the
    profile-level complement of report.verdict_diff (which diffs CHECK
    verdicts; this diffs the raw shape even where no check is defined):
    one row per column with both sides' exact row/non-null/distinct
    counts and min/max, plus ``null_frac_delta`` (cur − prev null
    fraction) and ``distinct_ratio`` (cur/prev distinct count; NULL when
    prev had none). All drift numbers derive from exact integer counts
    through one final division each, so an independent engine reproduces
    them bit-for-bit.

    Scale shape: ONE single-pass aggregation per side (every stat
    map-side combinable except countDistinct's expand — the exact-count
    oracle anchor; swap in stats.distinct_sketches' HLL state for the
    10^12-row path), then a col_name-keyed join of two |columns|-row
    frames — metadata-scale, broadcast by AQE."""
    if not columns:
        raise ValueError("columns must name at least one column")
    p = _exact_profile(prev, columns).select(
        "col_name",
        F.col("n_rows").alias("n_prev"),
        F.col("n_nonnull").alias("nn_prev"),
        F.col("n_distinct").alias("nd_prev"),
        F.col("min_val").alias("min_prev"),
        F.col("max_val").alias("max_prev"),
    )
    c = _exact_profile(cur, columns).select(
        "col_name",
        F.col("n_rows").alias("n_cur"),
        F.col("n_nonnull").alias("nn_cur"),
        F.col("n_distinct").alias("nd_cur"),
        F.col("min_val").alias("min_cur"),
        F.col("max_val").alias("max_cur"),
    )
    null_frac = lambda n, nn: (F.col(n) - F.col(nn)).cast("double") / F.col(n)  # noqa: E731
    return (
        p.join(c, "col_name")
        .withColumn(
            "null_frac_delta",
            null_frac("n_cur", "nn_cur") - null_frac("n_prev", "nn_prev"),
        )
        .withColumn(
            "distinct_ratio",
            F.when(
                F.col("nd_prev") > 0,
                F.col("nd_cur").cast("double") / F.col("nd_prev"),
            ),
        )
    )
