"""Mergeable quantile sketch + distribution-drift check.

The reference approximates percentiles with a 100-bucket histogram per band
(/root/reference/tacotoolbox/sample/extensions/geotiff_stats.py:251-264) and
merges per-partition summaries into global ones (min-of-mins / max-of-maxes,
_tacollection.py:343-466). At 10^12 rows we need a *mergeable, bounded-size*
sketch, so drift vs a stored baseline can be computed with a two-phase
(treeAggregate-style) merge and the sketch state can live in the checkpoint
manifest.

Implementation: a simplified t-digest — equal-weight centroid compression.
  phase 1: salted partial sketches  groupBy(part, salt).applyInPandas(compress)
  phase 2: final merge              groupBy(part).applyInPandas(merge)
The salt bounds the rows any single task must hold; centroids are ≤
``n_centroids`` per sketch regardless of input size. All numpy-vectorized
(no per-row Python, per BASELINE input_hint).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SKETCH_SCHEMA = (
    "part string, means array<double>, weights array<double>, "
    "n long, vmin double, vmax double"
)


# ---------------------------------------------------------------------------
# numpy core (unit-testable without Spark)
# ---------------------------------------------------------------------------


#: one floor for relative deviation everywhere (batch exact, batch approx,
#: streaming) — a baseline quantile below 1 must not inflate the denominator.
REL_DEV_FLOOR = 1e-12


def rel_dev(a, b):
    """|a - b| / max(|b|, floor): THE drift deviation definition, shared by
    drift_violations_approx, the exact applyInPandas path (numpy mirror),
    and streaming.stream_drift so the surfaces can't diverge."""
    return F.abs(a - b) / F.greatest(F.abs(b), F.lit(REL_DEV_FLOOR))


def compress_values(values: np.ndarray, n_centroids: int = 128):
    """Compress raw values into ≤ n_centroids (mean, weight) pairs by
    equal-weight bucketing of the sorted values."""
    v = np.asarray(values, dtype=np.float64)
    v = v[~np.isnan(v)]
    n = v.size
    if n == 0:
        return np.array([]), np.array([]), 0, np.nan, np.nan
    v.sort()
    k = min(n_centroids, n)
    edges = np.linspace(0, n, k + 1).astype(np.int64)
    counts = np.diff(edges)
    keep = counts > 0
    sums = np.add.reduceat(v, edges[:-1][keep])
    means = sums / counts[keep]
    return means, counts[keep].astype(np.float64), int(n), float(v[0]), float(v[-1])


def merge_centroids(
    means_list, weights_list, n_centroids: int = 128
):
    """Merge several centroid sets into one of ≤ n_centroids by weighted
    re-bucketing along the sorted means."""
    means = np.concatenate([np.asarray(m, dtype=np.float64) for m in means_list])
    weights = np.concatenate([np.asarray(w, dtype=np.float64) for w in weights_list])
    if means.size == 0:
        return np.array([]), np.array([])
    order = np.argsort(means, kind="mergesort")
    means, weights = means[order], weights[order]
    total = weights.sum()
    k = min(n_centroids, means.size)
    cum = np.cumsum(weights)
    # bucket boundary for each centroid: which output bin its cum-weight ends in
    bins = np.minimum((cum - weights / 2) / total * k, k - 1e-9).astype(np.int64)
    out_means = np.zeros(k)
    out_weights = np.zeros(k)
    np.add.at(out_weights, bins, weights)
    np.add.at(out_means, bins, means * weights)
    keep = out_weights > 0
    return out_means[keep] / out_weights[keep], out_weights[keep]


def quantiles_from_centroids(
    means: np.ndarray, weights: np.ndarray, probes: Sequence[float]
) -> np.ndarray:
    """Estimate quantiles by linear interpolation over the centroid CDF."""
    means = np.asarray(means, dtype=np.float64)
    weights = np.asarray(weights, dtype=np.float64)
    if means.size == 0:
        return np.full(len(probes), np.nan)
    order = np.argsort(means, kind="mergesort")
    means, weights = means[order], weights[order]
    cum = np.cumsum(weights) - weights / 2.0
    cdf = cum / weights.sum()
    return np.interp(np.asarray(probes, dtype=np.float64), cdf, means)


# ---------------------------------------------------------------------------
# Spark plumbing
# ---------------------------------------------------------------------------


def sketch_by_partition(
    df: DataFrame,
    value_expr: str,
    partition_col: str = "part",
    n_centroids: int = 128,
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase per-partition sketch: salted partial compress → final merge.
    Output: one row per partition with centroid arrays + n/min/max."""
    vals = df.select(
        # partition columns read back from partitioned storage may be
        # date/int-typed — the sketch key is always a string
        F.col(partition_col).cast("string").alias("part"),
        F.expr(value_expr).cast("double").alias("v"),
        F.pmod(F.xxhash64(F.expr(value_expr), F.monotonically_increasing_id()),
               F.lit(salt_buckets)).alias("salt"),
    )

    def compress(pdf: pd.DataFrame) -> pd.DataFrame:
        means, weights, n, vmin, vmax = compress_values(
            pdf["v"].to_numpy(), n_centroids
        )
        return pd.DataFrame(
            {
                "part": [pdf["part"].iloc[0]],
                "salt": [int(pdf["salt"].iloc[0])],
                "means": [means.tolist()],
                "weights": [weights.tolist()],
                "n": [n],
                "vmin": [vmin],
                "vmax": [vmax],
            }
        )

    partial = vals.groupBy("part", "salt").applyInPandas(
        compress, "part string, salt long, means array<double>, "
        "weights array<double>, n long, vmin double, vmax double",
    ).drop("salt")

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        means, weights = merge_centroids(
            list(pdf["means"]), list(pdf["weights"]), n_centroids
        )
        return pd.DataFrame(
            {
                "part": [pdf["part"].iloc[0]],
                "means": [means.tolist()],
                "weights": [weights.tolist()],
                "n": [int(pdf["n"].sum())],
                "vmin": [float(np.nanmin(pdf["vmin"])) if len(pdf) else np.nan],
                "vmax": [float(np.nanmax(pdf["vmax"])) if len(pdf) else np.nan],
            }
        )

    return partial.groupBy("part").applyInPandas(merge, SKETCH_SCHEMA)


def global_quantiles(
    df: DataFrame, value_expr: str, probes: Sequence[float], n_centroids: int = 128
) -> list[float]:
    """Whole-table baseline quantiles via the same sketch (single final
    merge group; partials bound memory)."""
    sk = sketch_by_partition(
        df.withColumn("_gq_part", F.lit("_all")),
        value_expr,
        partition_col="_gq_part",
        n_centroids=n_centroids,
    ).collect()
    if not sk:
        return [float("nan")] * len(probes)
    row = sk[0]
    return quantiles_from_centroids(
        np.array(row["means"]), np.array(row["weights"]), probes
    ).tolist()


def approx_quantiles_by_partition(
    df: DataFrame,
    value_expr: str,
    probes: Sequence[float],
    partition_col: str = "part",
    accuracy: int = 10000,
) -> DataFrame:
    """JVM-side per-partition quantiles via percentile_approx — Spark's own
    mergeable sketch (Greenwald-Khanna), fully codegen'd partial/final
    aggregation, no Python workers. The fast path for the drift check."""
    return df.groupBy(F.col(partition_col).cast("string").alias("part")).agg(
        F.percentile_approx(
            F.expr(value_expr).cast("double"), list(probes), accuracy
        ).alias("q")
    )


def approx_global_quantiles(
    df: DataFrame, value_expr: str, probes: Sequence[float], accuracy: int = 10000
) -> list[float]:
    row = df.agg(
        F.percentile_approx(
            F.expr(value_expr).cast("double"), list(probes), accuracy
        ).alias("q")
    ).first()
    return list(row["q"]) if row and row["q"] is not None else [float("nan")] * len(probes)


def exact_quantiles_by_partition(
    df: DataFrame,
    value_expr: str,
    probes: Sequence[float],
    partition_col: str = "part",
) -> DataFrame:
    """Exact per-partition quantiles via Spark's ``percentile`` (sort-based,
    type-7 linear interpolation — the same definition DuckDB's
    quantile_cont uses), so an independent engine can recompute the drift
    verdicts bit-for-bit. Costs a per-partition sort of the values: the
    oracle-replicable path for verification corpora; the mergeable-sketch
    paths above remain the 10^12-row default."""
    probes_sql = ", ".join(repr(float(p)) for p in probes)
    return df.groupBy(F.col(partition_col).cast("string").alias("part")).agg(
        F.expr(
            f"percentile(cast(({value_expr}) as double), array({probes_sql}))"
        ).alias("q")
    )


def exact_global_quantiles(
    df: DataFrame, value_expr: str, probes: Sequence[float]
) -> list[float]:
    probes_sql = ", ".join(repr(float(p)) for p in probes)
    row = df.agg(
        F.expr(
            f"percentile(cast(({value_expr}) as double), array({probes_sql}))"
        ).alias("q")
    ).first()
    return (
        list(row["q"])
        if row and row["q"] is not None
        else [float("nan")] * len(probes)
    )


def drift_violations_approx(
    quantiles: DataFrame,
    baseline_quantiles: Sequence[float],
    threshold: float,
    check_id: str,
) -> DataFrame:
    """Per-partition drift verdicts computed as column expressions over the
    per-partition quantile arrays (no Python)."""
    base = F.array(*[F.lit(float(b)) for b in baseline_quantiles])
    dist = F.array_max(F.zip_with(F.col("q"), base, rel_dev))
    judged = quantiles.select(
        "part",
        dist.alias("dist"),
        F.transform(F.col("q"), lambda x: F.round(x, 2)).alias("q_r"),
    ).filter(F.col("dist").isNull() | F.isnan("dist") | (F.col("dist") > threshold))
    base_r = [round(float(b), 2) for b in baseline_quantiles]
    return judged.select(
        F.col("part"),
        F.lit(check_id).alias("check_id"),
        F.lit(None).cast("string").alias("conv_id"),
        F.lit(None).cast("int").alias("turn_idx"),
        F.format_string(
            f"max_rel_quantile_dist=%s > {threshold} (quantiles=%s baseline={base_r})",
            F.round("dist", 4).cast("string"),
            F.col("q_r").cast("string"),
        ).alias("detail"),
    )


def drift_violations(
    sketches: DataFrame,
    baseline_quantiles: Sequence[float],
    probes: Sequence[float],
    threshold: float,
    check_id: str,
) -> DataFrame:
    """Per-partition drift verdict rows: max relative quantile distance vs
    the baseline; one violation row per drifted partition."""
    base = np.asarray(baseline_quantiles, dtype=np.float64)
    probes_t = tuple(probes)

    def judge(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, r in pdf.iterrows():  # ≤ 1 row per partition: not a hot loop
            q = quantiles_from_centroids(
                np.array(r["means"]), np.array(r["weights"]), probes_t
            )
            denom = np.maximum(np.abs(base), REL_DEV_FLOOR)
            dist = float(np.nanmax(np.abs(q - base) / denom)) if q.size else np.nan
            if np.isnan(dist) or dist > threshold:
                out.append(
                    (
                        r["part"],
                        f"max_rel_quantile_dist={dist:.4f} > {threshold} "
                        f"(quantiles={np.round(q, 2).tolist()} "
                        f"baseline={np.round(base, 2).tolist()})",
                    )
                )
        return pd.DataFrame(out, columns=["part", "detail"])

    judged = sketches.groupBy("part").applyInPandas(
        judge, "part string, detail string"
    )
    return judged.select(
        F.col("part"),
        F.lit(check_id).alias("check_id"),
        F.lit(None).cast("string").alias("conv_id"),
        F.lit(None).cast("int").alias("turn_idx"),
        F.col("detail"),
    )


# ---------------------------------------------------------------------------
# categorical drift: exact total-variation distance
# ---------------------------------------------------------------------------

#: NULL category values get their own bucket under this label so they join
#: (an equi-join on a NULL key would silently drop them) and so a baseline
#: that never saw NULLs flags them as pure drift mass.
NULL_CATEGORY = "<null>"


def categorical_counts(df: DataFrame, cat_col: str) -> dict[str, int]:
    """Baseline category histogram as a plain dict (tiny: one row per
    category). The collect is over the post-aggregation frame — a handful
    of rows regardless of input size."""
    rows = (
        df.groupBy(F.coalesce(F.col(cat_col), F.lit(NULL_CATEGORY)).alias("_c"))
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    return {r["_c"]: r["_n"] for r in rows}


def categorical_tv(
    df: DataFrame,
    cat_col: str,
    part_col: str,
    baseline_counts: dict[str, int],
) -> DataFrame:
    """Per-partition total-variation distance between the partition's
    ``cat_col`` distribution and the baseline distribution:

        TV = 1/2 · Σ_c | n_part(c)/N_part − n_base(c)/N_base |

    computed EXACTLY: each category's term is the integer
    ``|n_part(c)·N_base − n_base(c)·N_part|`` (cross-multiplied — no
    per-category float division), summed as BIGINT (order-independent),
    with ONE float division at the end. An independent engine (the DuckDB
    oracle) reproduces the result bit-for-bit, which no float-accumulated
    KL/PSI statistic can promise. Products stay < 2^63 up to ~3·10^9 rows
    per side; past that, pre-scale the baseline histogram (TV only needs
    the baseline's *proportions*, so dividing all baseline counts by a
    common factor is lossless for the verdict and keeps the integer
    headroom at 10^12 rows).

    Returns (part, n_part, tv_num, tv) — one row per partition. Plan
    shape: the input is touched EXACTLY ONCE — one grouped count
    (partial-aggregated map-side); nothing after the first aggregation
    touches more than |parts|·|categories| rows. Baseline categories a
    partition lacks never need a grid row: their numerator mass is the
    closed form ``(N_base − Σ_present n_b) · N_part`` (materializing a
    union-of-categories grid would re-derive the category axis from the
    input, and Catalyst collapses that aggregate-over-aggregate into a
    SECOND full input scan).
    """
    from ..schema import literal_frame

    n_base_total = int(sum(baseline_counts.values()))
    if n_base_total <= 0:
        raise ValueError("baseline_counts must hold at least one observation")

    cat = F.coalesce(F.col(cat_col), F.lit(NULL_CATEGORY))
    counts = (
        df.groupBy(F.col(part_col).cast("string").alias("part"), cat.alias("_c"))
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    base = literal_frame(
        df.sparkSession,
        [(str(k), int(v)) for k, v in sorted(baseline_counts.items())],
        "_c string, _nb long",
    )
    w = Window.partitionBy("part")
    stats = counts.join(F.broadcast(base), ["_c"], "left").select(
        "*",
        F.sum("_n").over(w).alias("n_part"),
        F.sum(F.coalesce(F.col("_nb"), F.lit(0)))
        .over(w)
        .alias("_nb_present"),
    )
    # categories observed in the partition: exact cross-multiplied term;
    # baseline categories the partition lacks each contribute n_b·N_part —
    # summed in closed form from the per-partition present mass
    term = F.abs(
        F.col("_n") * F.lit(n_base_total)
        - F.coalesce(F.col("_nb"), F.lit(0)) * F.col("n_part")
    )
    return (
        stats.groupBy("part", "n_part", "_nb_present")
        .agg(F.sum(term).alias("_present_num"))
        .select(
            "part",
            "n_part",
            (
                F.col("_present_num")
                + (F.lit(n_base_total) - F.col("_nb_present"))
                * F.col("n_part")
            ).alias("tv_num"),
        )
        .select(
            "*",
            (
                F.col("tv_num")
                / (F.lit(2.0) * F.col("n_part") * F.lit(float(n_base_total)))
            ).alias("tv"),
        )
    )


def categorical_drift_violations(
    tv: DataFrame, threshold: float, check_id: str
) -> DataFrame:
    """Violation rows (engine schema) for partitions whose TV distance
    exceeds the threshold."""
    judged = tv.filter(F.col("tv") > threshold)
    return judged.select(
        F.col("part"),
        F.lit(check_id).alias("check_id"),
        F.lit(None).cast("string").alias("conv_id"),
        F.lit(None).cast("int").alias("turn_idx"),
        F.format_string(
            f"categorical_tv=%s > {threshold}",
            F.round("tv", 6).cast("string"),
        ).alias("detail"),
    )


def ks_statistic_by_partition(
    df: DataFrame,
    value_col: str,
    part_col: str,
    baseline: DataFrame,
    baseline_value_col: str | None = None,
) -> DataFrame:
    """Per-partition two-sample Kolmogorov–Smirnov statistic against a
    baseline sample — the ECDF sibling of the quantile DriftCheck:
    where t-digest quantile drift judges a handful of percentile points,
    KS is the supremum over the WHOLE distribution, so a shape change
    between percentiles (bimodality, a new spike) that leaves p25/p50/p75
    untouched still registers.

        D_part = sup_x | ECDF_part(x) − ECDF_base(x) |

    computed EXACTLY in the repo's drift-family discipline: the supremum
    is attained at a jump point of either ECDF, so it is evaluated on the
    union of both samples' distinct values; at each point the deviation is
    the INTEGER ``|cum_part·m − cum_base·n_part|`` (cross-multiplied — no
    per-point float division), the max over points is a BIGINT max
    (order-independent), and ONE float division lands at the end. An
    independent engine reproduces (n_part, m, ks_num) bit-for-bit and the
    final ``ks`` as the same single IEEE754 division — the property the
    oracle verifies and a float-accumulated statistic cannot promise.
    Integer headroom: ``cum·m < n_part·m``, so products stay < 2^63 up to
    ~3·10^9 rows per side; past that, thin the BASELINE (KS only needs the
    baseline's ECDF, so any fixed subsample keeps the verdict's meaning —
    the same proportion-not-mass argument as categorical_tv's pre-scale).

    ``baseline`` is a bounded REFERENCE SAMPLE (the same contract as the
    DriftCheck's t-digest baseline): its distinct values are broadcast and
    replicated once per partition, so the grid carries
    |parts| × |baseline distinct| rows. The per-partition cumulative
    window sorts |part distinct + baseline distinct| rows — the exact
    drift mode's cost class (exact_quantiles_by_partition sorts the same
    frame); at 100 TB run this on quantized values or a baseline
    subsample, exactly as the exact quantile path documents. NULLs on
    either side are dropped (NULL ordering is engine-specific; nullness
    belongs to the null-fraction stats, not the ECDF).

    Returns (part, n_part, m, ks_num, ks) — one row per partition.
    """
    bcol = baseline_value_col or value_col
    s = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            F.col(part_col).cast("string").alias("part"),
            F.col(value_col).alias("_v"),
        )
        .agg(F.count(F.lit(1)).alias("_sn"))
    )
    b = (
        baseline.filter(F.col(bcol).isNotNull())
        .groupBy(F.col(bcol).alias("_v"))
        .agg(F.count(F.lit(1)).alias("_bn"))
    )
    parts = s.select("part").distinct()
    grid_b = parts.join(F.broadcast(b), how="cross")
    u = s.withColumn("_bn", F.lit(0).cast("long")).unionByName(
        grid_b.withColumn("_sn", F.lit(0).cast("long"))
    )
    g = u.groupBy("part", "_v").agg(
        F.sum("_sn").alias("_sn"), F.sum("_bn").alias("_bn")
    )
    wc = Window.partitionBy("part").orderBy("_v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wp = Window.partitionBy("part")
    c = g.select(
        "part",
        F.sum("_sn").over(wc).alias("_cs"),
        F.sum("_bn").over(wc).alias("_cb"),
        F.sum("_sn").over(wp).alias("n_part"),
        F.sum("_bn").over(wp).alias("m"),
    )
    dev = F.abs(F.col("_cs") * F.col("m") - F.col("_cb") * F.col("n_part"))
    return (
        c.groupBy("part", "n_part", "m")
        .agg(F.max(dev).alias("ks_num"))
        .select(
            "part",
            "n_part",
            "m",
            "ks_num",
            (
                F.col("ks_num").cast("double")
                / (F.col("n_part").cast("double") * F.col("m").cast("double"))
            ).alias("ks"),
        )
    )


def ks_drift_violations(
    ks: DataFrame, threshold: float, check_id: str
) -> DataFrame:
    """Violation rows (engine schema) for partitions whose KS statistic
    exceeds the threshold."""
    judged = ks.filter(F.col("ks") > threshold)
    return judged.select(
        F.col("part"),
        F.lit(check_id).alias("check_id"),
        F.lit(None).cast("string").alias("conv_id"),
        F.lit(None).cast("int").alias("turn_idx"),
        F.format_string(
            f"ks=%s > {threshold}",
            F.round("ks", 6).cast("string"),
        ).alias("detail"),
    )


def embedding_centroid_sums(
    df: DataFrame, vec_col: str, part_col: str, quant: int = 10**7
) -> DataFrame:
    """Per-(partition, dimension) quantized component sums — the exact,
    mergeable sketch behind :func:`embedding_centroid_drift`. Components
    are quantized to integers (``round(val * quant)`` — both engines round
    half away from zero, and the float64 multiply is IEEE-identical), so
    the per-dim sums are BIGINT-exact and ORDER-INDEPENDENT: two engines
    (or two runs, or a manifest merge) agree bit-for-bit, which
    float-accumulated means cannot promise. One posexplode + one
    map-side-combined aggregation; the shuffle carries
    |parts| x |dims| rows."""
    e = df.select(
        F.col(part_col).cast("string").alias("part"),
        F.posexplode(F.col(vec_col)).alias("dim", "_v"),
    )
    q = F.round(F.col("_v").cast("double") * F.lit(float(quant))).cast("long")
    return e.groupBy("part", "dim").agg(
        F.sum(q).alias("s"), F.count(F.lit(1)).alias("n")
    )


def embedding_centroid_drift(
    df: DataFrame,
    vec_col: str,
    part_col: str,
    baseline: DataFrame | None = None,
    quant: int = 10**7,
    baseline_sums: dict[str, int] | None = None,
) -> DataFrame:
    """Per-partition embedding-centroid drift: the cosine between each
    partition's mean embedding and the baseline's (default: the whole
    corpus) — the embedding sibling of the quantile DriftCheck and
    categorical TV drift, for catching a day/source whose vectors moved.

    The entire computation is EXACT until one final float step: quantized
    BIGINT component sums (centroid numerators — the 1/n factors cancel
    inside cosine), DECIMAL(38,0) cross/self products summed exactly, then
    a single double division + sqrt. Bit-for-bit reproducible across
    engines and partition orders. Plan: one posexplode + grouped sum over
    the data, a |dims|-row broadcast join, a per-part final agg — nothing
    beyond the one data-sized pass.

    Returns (part, n_vecs, cosine, drift) where drift = 1 - cosine.
    """
    sums = embedding_centroid_sums(df, vec_col, part_col, quant)
    if baseline_sums is not None:
        # checkpoint-manifest state (checkpoint.record_embedding_state):
        # already-merged per-dim quantized sums — no baseline rescan
        from ..schema import literal_frame

        g = literal_frame(
            df.sparkSession,
            [(int(d), int(s)) for d, s in sorted(baseline_sums.items(),
                                                 key=lambda kv: int(kv[0]))],
            "dim int, g long",
        )
    else:
        base_sums = (
            sums
            if baseline is None
            else embedding_centroid_sums(baseline, vec_col, part_col, quant)
        )
        g = base_sums.groupBy("dim").agg(F.sum("s").alias("g"))
    dec = "decimal(19,0)"
    joined = sums.join(F.broadcast(g), "dim")
    out = joined.groupBy("part").agg(
        F.max("n").alias("n_vecs"),
        F.sum(F.col("s").cast(dec) * F.col("g").cast(dec)).alias("_num"),
        F.sum(F.col("s").cast(dec) * F.col("s").cast(dec)).alias("_a"),
        F.sum(F.col("g").cast(dec) * F.col("g").cast(dec)).alias("_b"),
    )
    cos = F.col("_num").cast("double") / (
        F.sqrt(F.col("_a").cast("double")) * F.sqrt(F.col("_b").cast("double"))
    )
    return out.select(
        "part",
        "n_vecs",
        cos.alias("cosine"),
        (F.lit(1.0) - cos).alias("drift"),
    )


def correlation_by_partition(
    df: DataFrame,
    x_expr: str,
    y_expr: str,
    part_col: str | None = None,
) -> DataFrame:
    """Per-partition Pearson correlation of two INTEGER-VALUED expressions
    — the relationship member of the drift family: quantile / categorical
    / KS / centroid drift all watch one column's MARGINAL distribution,
    but a corpus can keep every marginal intact while the relationship
    between columns silently breaks (response length no longer tracks
    prompt length; value no longer follows time of day). Correlation
    drift is the standard analyzer for that failure class.

    Exact in the family's discipline (ks_statistic_by_partition,
    embedding_centroid_drift): the five moment sums (Σx, Σy, Σx², Σy²,
    Σxy) are DECIMAL(38,0)-exact and order-independent — per-row products
    are formed at DECIMAL(19,0) so |x|,|y| up to ~10^18 never wrap, and
    10^12-row sums sit far inside the 10^38 headroom — then ONE float
    transition at the end:

        corr = (n·Σxy − Σx·Σy) / (√(n·Σx² − Σx²̄) · √(n·Σy² − Σy²̄))

    evaluated in float64 from the exact moments, so an independent engine
    (DuckDB sums to HUGEINT) reproduces every row bit-for-bit; a
    float-accumulated ``corr()`` aggregate cannot promise that across
    partition orders, let alone engines. Non-integer inputs: quantize
    first (``round(value*1000)``), the KS family's documented move —
    Pearson r is invariant under the affine part and the quantization
    error is the caller's stated tolerance.

    Rows where EITHER expression is NULL are dropped (pairwise-complete
    semantics); degenerate partitions (n < 2, or zero variance on either
    side) yield corr = NULL rather than a misleading 0. ``part_col``
    None = one global row (part = 'all'). Plan: one projection + ONE
    map-side-combinable hash aggregation — no window, no second pass.

    Returns (part, n, corr).
    """
    keys = (
        F.col(part_col).cast("string").alias("part")
        if part_col is not None
        else F.lit("all").alias("part")
    )
    d = df.select(
        keys,
        F.expr(x_expr).cast("long").alias("_x"),
        F.expr(y_expr).cast("long").alias("_y"),
    ).filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    dec = "decimal(19,0)"
    x, y = F.col("_x").cast(dec), F.col("_y").cast(dec)
    m = d.groupBy("part").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * x).alias("_sxx"),
        F.sum(y * y).alias("_syy"),
        F.sum(x * y).alias("_sxy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxx = F.col("_sxx").cast("double")
    syy = F.col("_syy").cast("double")
    sxy = F.col("_sxy").cast("double")
    num = nd * sxy - sx * sy
    vx = nd * sxx - sx * sx
    vy = nd * syy - sy * sy
    corr = F.when(
        (F.col("n") >= 2) & (vx > 0) & (vy > 0),
        num / (F.sqrt(vx) * F.sqrt(vy)),
    )
    return m.select("part", "n", corr.alias("corr"))


def correlation_drift(
    df: DataFrame,
    x_expr: str,
    y_expr: str,
    part_col: str,
    baseline: DataFrame | None = None,
    baseline_corr: float | None = None,
) -> DataFrame:
    """Per-partition correlation vs a baseline's GLOBAL correlation:
    (part, n, corr, corr_base, delta = |corr − corr_base|). Baseline
    None = the frame itself (each partition vs the corpus relationship —
    the self-baseline mode every drift sibling defaults to);
    ``baseline_corr`` pins an inline stored value instead (the manifest /
    suite-document mode every sibling also offers) and skips the baseline
    pass entirely. The baseline row is a 1-row broadcast; delta is NULL
    when either side is degenerate — surface those rows, don't hide them
    (a partition that LOST its variance is drift too; the violations
    helper flags it)."""
    per_part = correlation_by_partition(df, x_expr, y_expr, part_col)
    if baseline_corr is not None:
        return per_part.select(
            "part",
            "n",
            "corr",
            F.lit(float(baseline_corr)).alias("corr_base"),
            F.abs(F.col("corr") - F.lit(float(baseline_corr))).alias("delta"),
        )
    base = correlation_by_partition(
        baseline if baseline is not None else df, x_expr, y_expr, None
    ).select(
        F.col("n").alias("n_base"), F.col("corr").alias("corr_base")
    )
    j = per_part.join(F.broadcast(base), how="cross")
    return j.select(
        "part",
        "n",
        "corr",
        "corr_base",
        F.abs(F.col("corr") - F.col("corr_base")).alias("delta"),
    )


def correlation_drift_violations(
    cd: DataFrame, threshold: float, check_id: str
) -> DataFrame:
    """Violation rows (engine schema) for partitions whose correlation
    moved more than ``threshold`` from the baseline — or went degenerate
    (corr NULL: n < 2 or zero variance) while the baseline has a real
    relationship to drift from."""
    fired = cd.filter(
        (F.col("delta") > threshold)
        | (F.col("corr").isNull() & F.col("corr_base").isNotNull())
    )
    return fired.select(
        F.col("part"),
        F.lit(check_id).alias("check_id"),
        F.lit(None).cast("string").alias("conv_id"),
        F.lit(None).cast("int").alias("turn_idx"),
        F.when(
            F.col("corr").isNull(),
            F.format_string(
                "corr degenerate (n=%s) vs baseline %s",
                F.col("n").cast("string"),
                F.round("corr_base", 6).cast("string"),
            ),
        )
        .otherwise(
            F.format_string(
                f"corr delta %s > {threshold} (corr=%s base=%s)",
                F.round("delta", 6).cast("string"),
                F.round("corr", 6).cast("string"),
                F.round("corr_base", 6).cast("string"),
            )
        )
        .alias("detail"),
    )


def conditional_counts(
    df: DataFrame, cond_expr: str, cat_expr: str
) -> dict[tuple[str, str], int]:
    """Baseline contingency table {(cond, cat): count} as a plain dict
    (tiny: one row per observed (cond, cat) pair). The collect is over the
    post-aggregation frame — |conds|·|cats| rows regardless of input size.
    Both axes accept SQL expressions (``least(floor(value/100), 4)``), cast
    to string with NULLs folded into the shared ``NULL_CATEGORY``."""
    rows = (
        df.groupBy(
            F.coalesce(F.expr(cond_expr).cast("string"),
                       F.lit(NULL_CATEGORY)).alias("_k"),
            F.coalesce(F.expr(cat_expr).cast("string"),
                       F.lit(NULL_CATEGORY)).alias("_c"),
        )
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    return {(r["_k"], r["_c"]): r["_n"] for r in rows}


def conditional_tv(
    df: DataFrame,
    cond_expr: str,
    cat_expr: str,
    part_col: str,
    baseline_counts: dict[tuple[str, str], int],
) -> DataFrame:
    """Per-(partition, conditioning value) total-variation distance of the
    CONDITIONAL distribution P(cat | cond) from the baseline's global
    P(cat | cond) — the categorical-RELATIONSHIP member of the drift
    family, completing the pair with :func:`correlation_drift`: categorical
    TV watches one column's marginal, correlation drift watches a numeric
    relationship, and this watches a categorical relationship. Both
    marginals can stay bit-identical while P(cat | cond) breaks (every
    tool keeps its volume, every role keeps its share, but which roles a
    given tool co-occurs with silently shifts) — the contingency-table
    failure class no marginal check can see.

    Exact in the family's discipline (categorical_tv): for each
    (part, cond) the statistic is

        TV = 1/2 · Σ_c | n(part,cond,c)/N(part,cond) − n_b(cond,c)/N_b(cond) |

    with each category term the cross-multiplied INTEGER
    ``|n·N_b(cond) − n_b·N(part,cond)|``, summed as BIGINT
    (order-independent), ONE float division at the end — bit-for-bit
    reproducible by an independent engine. Products stay < 2^63 up to
    ~3·10^9 rows per conditioning value per side; past that, pre-scale the
    baseline table (TV needs only the baseline's per-cond *proportions*,
    so a common per-cond divisor is lossless for the verdict).

    A conditioning value observed in a partition but ABSENT from the
    baseline has no distribution to compare against: its row surfaces with
    tv = NULL (n_base NULL) rather than a fabricated 0 — the violations
    helper fires it as its own "novel conditioning value" class.

    Plan shape: the input is touched EXACTLY ONCE — one grouped count
    (map-side partial agg, shuffle keyed (part, cond, cat)). Everything
    after runs over the |parts|·|conds|·|cats| grid: per-(part, cond)
    totals via one grid-sized window, the baseline through broadcast
    joins. Baseline categories MISSING from a (part, cond) never need a
    grid row: their numerator mass is the closed form
    ``(N_b(cond) − Σ_present n_b) · N(part, cond)`` — materializing them
    (the naive union-of-categories grid) would re-derive the category
    axis from the input and, because Catalyst collapses the
    aggregate-over-aggregate into a second direct aggregation of the
    input, re-execute the whole data-sized subtree (a second scan here; a
    second lag/lead window pass in :func:`transition_drift`).

    Returns (part, cond, n_part, n_base, tv_num, tv) — one row per
    (partition, conditioning value) observed in ``df``.
    """
    from ..schema import literal_frame

    if not baseline_counts:
        raise ValueError("baseline_counts must hold at least one observation")

    cond = F.coalesce(F.expr(cond_expr).cast("string"), F.lit(NULL_CATEGORY))
    cat = F.coalesce(F.expr(cat_expr).cast("string"), F.lit(NULL_CATEGORY))
    counts = df.groupBy(
        F.col(part_col).cast("string").alias("part"),
        cond.alias("_k"),
        cat.alias("_c"),
    ).agg(F.count(F.lit(1)).alias("_n"))
    base = literal_frame(
        df.sparkSession,
        [(str(k), str(c), int(n))
         for (k, c), n in sorted(baseline_counts.items())],
        "_k string, _c string, _nb long",
    )
    base_tot = base.groupBy("_k").agg(F.sum("_nb").alias("n_base"))
    w = Window.partitionBy("part", "_k")
    stats = (
        counts.join(F.broadcast(base), ["_k", "_c"], "left")
        .join(F.broadcast(base_tot), ["_k"], "left")
        .select(
            "*",
            F.sum("_n").over(w).alias("n_part"),
            F.sum(F.coalesce(F.col("_nb"), F.lit(0)))
            .over(w)
            .alias("_nb_present"),
        )
    )
    # categories observed in the partition: exact cross-multiplied term;
    # baseline categories the partition lacks: n = 0, so each contributes
    # n_b·n_part — summed in closed form from the per-group present mass
    term = F.abs(
        F.col("_n") * F.col("n_base")
        - F.coalesce(F.col("_nb"), F.lit(0)) * F.col("n_part")
    )
    return (
        stats.groupBy("part", "_k", "n_part", "n_base", "_nb_present")
        .agg(F.sum(term).alias("_present_num"))
        .select(
            "part",
            F.col("_k").alias("cond"),
            "n_part",
            "n_base",
            (
                F.col("_present_num")
                + (F.col("n_base") - F.col("_nb_present")) * F.col("n_part")
            ).alias("tv_num"),
        )
        .select(
            "*",
            (
                F.col("tv_num")
                / (F.lit(2.0) * F.col("n_part") * F.col("n_base"))
            ).alias("tv"),
        )
    )


def conditional_drift_violations(
    ct: DataFrame, threshold: float, check_id: str
) -> DataFrame:
    """Violation rows (engine schema) for (partition, conditioning value)
    pairs whose conditional distribution moved more than ``threshold`` TV
    from the baseline — or whose conditioning value the baseline has never
    seen (tv NULL: no distribution to compare against)."""
    fired = ct.filter((F.col("tv") > threshold) | F.col("tv").isNull())
    return fired.select(
        F.col("part"),
        F.lit(check_id).alias("check_id"),
        F.lit(None).cast("string").alias("conv_id"),
        F.lit(None).cast("int").alias("turn_idx"),
        F.when(
            F.col("tv").isNull(),
            F.format_string(
                "novel conditioning value %s (n=%s) absent from baseline",
                F.col("cond"),
                F.col("n_part").cast("string"),
            ),
        )
        .otherwise(
            F.format_string(
                f"conditional_tv=%s > {threshold} (cond=%s)",
                F.round("tv", 6).cast("string"),
                F.col("cond"),
            )
        )
        .alias("detail"),
    )


# ---------------------------------------------------------------------------
# transition (bigram / Markov-row) drift — the SEQUENTIAL-structure member
# ---------------------------------------------------------------------------

#: boundary sentinels for transition_pairs. A first turn contributes the
#: transition (START_TOKEN -> state), a last turn (state -> END_TOKEN), so
#: opening/closing-protocol drift is visible (a corpus whose conversations
#: stop opening with role=user shifts P(to | <start>) even when every
#: interior bigram is intact). Real state values must not collide with
#: these; pass custom tokens if they can.
START_TOKEN = "<start>"
END_TOKEN = "<end>"

_TRANSITION_INTERNAL = {"_s", "_prev", "_islast", "_p"}


def transition_pairs(
    df: DataFrame,
    seq_col: str,
    order_cols: Sequence[str],
    state_expr: str,
    *,
    include_boundaries: bool = True,
    start_token: str = START_TOKEN,
    end_token: str = END_TOKEN,
) -> DataFrame:
    """One row per STATE TRANSITION within each sequence: the input columns
    plus (``from_state``, ``to_state``) string columns, under the stable
    order ``order_cols`` within ``seq_col``. The sequential building block
    of :func:`transition_drift`. (The corpus-PROFILING sibling,
    operators/distribution.py:transition_matrix, reports global bigram
    counts for audit/SequenceCheck-derivation; the drift family instead
    needs every input column preserved — for per-partition attribution —
    plus boundary sentinels and NULL-state disambiguation.)

    ONE lag/lead window partitioned by the sequence id — conversations are
    bounded (thousands of turns, not billions), so the window never sees a
    hot key the way a global window would; no other shuffle. Each row owns
    the transition that COMPLETES at it (``prev -> state``, the first row's
    ``prev`` being ``start_token``), so a transition crossing a partition
    boundary (e.g. a conversation spanning two ingest days) is attributed
    to the later row's partition — the deterministic convention the oracle
    replays. The last row additionally emits (``state -> end_token``).

    NULL states are folded into ``NULL_CATEGORY`` BEFORE the lag, so a
    NULL ``lag`` unambiguously means "first row of the sequence" — a
    genuine NULL state mid-sequence cannot masquerade as a boundary.
    """
    clash = _TRANSITION_INTERNAL | {"from_state", "to_state"}
    hit = clash & set(df.columns)
    if hit:
        raise ValueError(
            f"input columns collide with transition_pairs internals: "
            f"{sorted(hit)}"
        )
    s = F.coalesce(F.expr(state_expr).cast("string"), F.lit(NULL_CATEGORY))
    w = Window.partitionBy(seq_col).orderBy(*[F.col(c) for c in order_cols])
    staged = (
        df.withColumn("_s", s)
        .withColumn("_prev", F.lag("_s").over(w))
        .withColumn("_islast", F.lead("_s").over(w).isNull())
    )
    if include_boundaries:
        head = F.struct(
            F.coalesce(F.col("_prev"), F.lit(start_token)).alias("from_state"),
            F.col("_s").alias("to_state"),
        )
        tail = F.struct(
            F.col("_s").alias("from_state"),
            F.lit(end_token).alias("to_state"),
        )
        pairs = F.when(F.col("_islast"), F.array(head, tail)).otherwise(
            F.array(head)
        )
        out = staged.withColumn("_p", F.explode(pairs)).select(
            *df.columns, F.col("_p.from_state"), F.col("_p.to_state")
        )
    else:
        out = staged.filter(F.col("_prev").isNotNull()).select(
            *df.columns,
            F.col("_prev").alias("from_state"),
            F.col("_s").alias("to_state"),
        )
    return out


def transition_counts(
    df: DataFrame,
    seq_col: str,
    order_cols: Sequence[str],
    state_expr: str,
    *,
    include_boundaries: bool = True,
    start_token: str = START_TOKEN,
    end_token: str = END_TOKEN,
) -> dict[tuple[str, str], int]:
    """Baseline bigram table {(from_state, to_state): count} — tiny
    (|states|² + boundary rows at most), collected post-aggregation."""
    pairs = transition_pairs(
        df,
        seq_col,
        order_cols,
        state_expr,
        include_boundaries=include_boundaries,
        start_token=start_token,
        end_token=end_token,
    )
    return conditional_counts(pairs, "from_state", "to_state")


def transition_drift(
    df: DataFrame,
    seq_col: str,
    order_cols: Sequence[str],
    state_expr: str,
    part_col: str,
    baseline_counts: dict[tuple[str, str], int],
    *,
    include_boundaries: bool = True,
    start_token: str = START_TOKEN,
    end_token: str = END_TOKEN,
) -> DataFrame:
    """Per-(partition, from_state) total-variation distance of the outgoing
    TRANSITION distribution P(to_state | from_state) from the baseline's —
    the SEQUENTIAL-structure member of the drift family. Its siblings watch
    marginals (quantile/categorical/KS/centroid) or co-occurrence within a
    row (correlation, conditional); none of them can see a corpus whose
    every marginal AND every per-row contingency stays bit-identical while
    the ORDER of turns breaks — tool turns no longer followed by assistant
    turns, conversations that stop closing with the assistant, retry loops
    (assistant->assistant) appearing. The Markov transition matrix is the
    standard analyzer for that failure class; its rows are conditional
    distributions, so the exact cross-multiplied-integer TV machinery of
    :func:`conditional_tv` applies verbatim — each term
    ``|n(part,from,to)·N_b(from) − n_b(from,to)·N(part,from)|`` summed as
    BIGINT, ONE float division at the end, bit-for-bit reproducible by an
    independent engine.

    Plan shape: ONE bounded lag/lead window keyed by the sequence id (the
    only per-row pass), ONE grouped count (map-side partial agg); everything
    after is broadcast-grid-sized (|parts|·|states|² rows).

    Returns (part, from_state, n_part, n_base, tv_num, tv) — ``n_part`` /
    ``n_base`` count TRANSITIONS out of ``from_state``, not rows. A
    from-state the baseline never saw surfaces with tv = NULL and fires as
    its own violation class in :func:`transition_drift_violations`.
    """
    pairs = transition_pairs(
        df,
        seq_col,
        order_cols,
        state_expr,
        include_boundaries=include_boundaries,
        start_token=start_token,
        end_token=end_token,
    )
    ct = conditional_tv(
        pairs, "from_state", "to_state", part_col, baseline_counts
    )
    return ct.withColumnRenamed("cond", "from_state")


def transition_drift_violations(
    td: DataFrame, threshold: float, check_id: str
) -> DataFrame:
    """Violation rows (engine schema) for (partition, from_state) pairs
    whose outgoing-transition distribution moved more than ``threshold``
    TV from the baseline — or whose from-state the baseline has never seen
    (tv NULL: no transition row to compare against)."""
    fired = td.filter((F.col("tv") > threshold) | F.col("tv").isNull())
    return fired.select(
        F.col("part"),
        F.lit(check_id).alias("check_id"),
        F.lit(None).cast("string").alias("conv_id"),
        F.lit(None).cast("int").alias("turn_idx"),
        F.when(
            F.col("tv").isNull(),
            F.format_string(
                "novel from-state %s (n=%s transitions) absent from baseline",
                F.col("from_state"),
                F.col("n_part").cast("string"),
            ),
        )
        .otherwise(
            F.format_string(
                f"transition_tv=%s > {threshold} (from=%s)",
                F.round("tv", 6).cast("string"),
                F.col("from_state"),
            )
        )
        .alias("detail"),
    )
