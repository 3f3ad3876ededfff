"""Soft (frequency-proportional) deduplication — downsample duplicate
clusters instead of hard-dropping them.

Hard exact dedup keeps exactly one copy per cluster; training-data work
often wants the SOFTER policy: keep each member of an n-copy cluster
with probability ``target_copies / n``, so a document's expected
surviving count is ``target_copies`` regardless of how many times the
crawl found it (the "count every document once in expectation" rule
discussed in public data-constrained-scaling work). Unlike hard dedup,
the surviving copy set is a weighted sample, which preserves the
diversity of boilerplate-adjacent clusters instead of always electing
the min-id member.

Determinism: the keep decision is the same hash predicate as
operators/sampling.py (``hash_bucket(id, seed) < floor(B*t/n)``) — a
pure function of (id, seed, cluster size), so reruns, resumes, engines
(md5 mode) and cluster sizes all keep the SAME rows.

Scale shape: cluster sizes come from a ``groupBy(fingerprint).count()``
— partial (map-side) aggregation, so the pathological mega-cluster (a
boilerplate page crawled 10^9 times) costs each map task one combiner
row, where a window count would serialize those 10^9 rows through one
task. The count frame (one row per DISTINCT fingerprint) joins back on
the fingerprint; AQE broadcasts it when small and skew-splits when not.
The threshold ``floor(B * t / n)`` is computed with values < 2^53, so
the double division is exact and engine-portable.

Beyond-reference training-pipeline operator (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint
from ..operators.sampling import SAMPLE_BUCKETS, hash_bucket


def soft_dedup_verdict(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_copies: int = 1,
    seed: int = 0,
    hash_fn: str = "xxhash64",
    group_expr: Column | None = None,
) -> DataFrame:
    """Every input row plus ``n_copies`` (its exact-dup cluster size) and
    ``kept`` — true with probability ``min(1, target_copies/n_copies)``,
    decided by the deterministic id hash. ``group_expr`` overrides the
    cluster key (default: the normalized-text ``fingerprint``; pass e.g.
    a URL or the raw normalized string for an engine-portable key).

    Clusters of size <= target_copies keep everything (threshold
    saturates at the bucket count); the expected survivor count per
    cluster is exactly ``target_copies`` otherwise."""
    if target_copies < 1:
        raise ValueError(f"target_copies must be >= 1, got {target_copies}")
    reserved = {"_grp", "n_copies", "kept"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"columns {sorted(reserved)} collide with soft_dedup's "
            "output/internal names; rename them first"
        )
    grp = group_expr if group_expr is not None else fingerprint(text_col)
    tagged = df.withColumn("_grp", grp)
    thr = F.least(
        F.lit(float(SAMPLE_BUCKETS)),
        F.floor(
            F.lit(float(SAMPLE_BUCKETS * target_copies))
            / F.col("n_copies").cast("double")
        ).cast("double"),
    )
    # copy count via a window over the group partition instead of a
    # groupBy + join back onto the same frame (which re-derived the
    # fingerprint projection and paid a second exchange) — identical
    # values, same output columns
    from pyspark.sql import Window

    return (
        tagged.withColumn(
            "n_copies", F.count(F.lit(1)).over(Window.partitionBy("_grp"))
        )
        .withColumn(
            "kept", hash_bucket([id_col], seed, hash_fn).cast("double") < thr
        )
        .drop("_grp")
    )


def soft_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_copies: int = 1,
    seed: int = 0,
    hash_fn: str = "xxhash64",
    group_expr: Column | None = None,
) -> DataFrame:
    """The filtered form of :func:`soft_dedup_verdict`: only the kept
    rows, original columns only."""
    return (
        soft_dedup_verdict(
            df, text_col, id_col, target_copies, seed, hash_fn, group_expr
        )
        .filter(F.col("kept"))
        .select(*df.columns)
    )
