"""Robust outlier detection + winsorization — median/MAD flagging and
quantile clipping for numeric quality gates.

Mean/stddev outlier rules break on the exact data they're supposed to
catch (one 10^9 value drags the mean); the robust pair is the median and
the MAD (median absolute deviation): flag x when |x − median| > k·MAD.
Winsorization clips to per-group quantiles instead of dropping — the
standard treatment for heavy-tailed features (token counts, durations)
before they feed scoring models.

Two quantile engines, the drift-check convention (checks/drift.py):

* ``method="exact"`` — Spark's exact ``percentile`` (type-7 linear
  interpolation, == DuckDB ``quantile_cont``; the equality is already
  locked by the stats_quantiles oracle). Exact per-group percentile is a
  sort-based aggregation holding a group's values — the ORACLE ANCHOR
  and fine up to millions of rows per group, not the 100-TB path.
* ``method="approx"`` — ``percentile_approx`` (GK sketch, mergeable,
  map-side combinable, bounded memory at any group size) — the scale
  default; identical plan shape, sketch-accuracy values.

Plan shape (either method): one group-keyed aggregation producing a
per-group frame that is tiny by construction (one row per group), then
a join back onto the data — AQE broadcasts it for any realistic group
count. MAD needs a second aggregation pass over the deviations (that is
the algorithm, not the plan's fault); winsorize needs only the first.

Beyond-reference training-pipeline operator (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ACC = 10_000  # percentile_approx accuracy (1/eps)


def _pctl(col: str, p, method: str):
    if method == "exact":
        return F.percentile(F.col(col), F.lit(p))
    if method == "approx":
        return F.percentile_approx(F.col(col), F.lit(p), F.lit(_ACC))
    raise ValueError(f"method must be 'exact' or 'approx', got {method!r}")


def robust_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: float = 3.0,
    method: str = "approx",
) -> DataFrame:
    """Every input row plus ``med`` (group median), ``mad`` (median
    absolute deviation), and ``is_outlier`` = |x − med| > k·MAD. NULL
    values are never outliers (NULL comparison is falsy) and do not
    enter the medians. A group whose MAD is 0 (>= half the values
    identical) flags every value differing from the median — the
    documented MAD-rule behavior; pre-check mad > 0 downstream if that
    bites. Two aggregation passes (median, then median deviation), each
    a one-row-per-group frame joined back."""
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    g = [*(group_cols or [])]
    reserved = {"med", "mad", "is_outlier", "_dev"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"columns {sorted(reserved)} collide with robust_outliers' "
            "output/internal names; rename them first"
        )
    med = df.groupBy(*g).agg(_pctl(value_col, 0.5, method).alias("med"))
    with_med = df.join(med, g) if g else df.crossJoin(F.broadcast(med))
    dev = with_med.withColumn(
        "_dev", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = dev.groupBy(*g).agg(_pctl("_dev", 0.5, method).alias("mad"))
    out = dev.join(mad, g) if g else dev.crossJoin(F.broadcast(mad))
    return out.withColumn(
        "is_outlier", F.col("_dev") > F.lit(float(k)) * F.col("mad")
    ).drop("_dev")


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    lo: float = 0.01,
    hi: float = 0.99,
    out_col: str | None = None,
    method: str = "approx",
) -> DataFrame:
    """Every input row plus ``<value_col>_wins`` (or ``out_col``): the
    value clipped into the group's [lo, hi] quantile range. NULLs stay
    NULL. One group aggregation + one join."""
    if not 0.0 <= lo < hi <= 1.0:
        raise ValueError(f"need 0 <= lo < hi <= 1, got ({lo}, {hi})")
    g = [*(group_cols or [])]
    dst = out_col or f"{value_col}_wins"
    reserved = {dst, "_qlo", "_qhi"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"columns {sorted(reserved)} collide with winsorize's "
            "output/internal names; rename them first"
        )
    q = df.groupBy(*g).agg(
        _pctl(value_col, lo, method).alias("_qlo"),
        _pctl(value_col, hi, method).alias("_qhi"),
    )
    joined = df.join(q, g) if g else df.crossJoin(F.broadcast(q))
    # greatest/least SKIP nulls (they would clip a NULL value to the lower
    # bound); gate on non-null so NULL stays NULL
    clipped = F.least(
        F.greatest(F.col(value_col), F.col("_qlo")), F.col("_qhi")
    )
    return joined.withColumn(
        dst, F.when(F.col(value_col).isNotNull(), clipped)
    ).drop("_qlo", "_qhi")
