"""Hierarchy/relational navigation operators.

The reference stores nested samples as flattened per-level tables linked by
positional ids and navigates them relationally
(/root/reference/tacotoolbox/_metadata.py:69-78 documents the SQL:
``level1.parent_id = level0.current_id``; keys built at _metadata.py:117-127).
Here the parent-child link is a first-class join, positions are window
functions, and completeness is a left_anti join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def add_row_position(
    df: DataFrame,
    order_cols: list[str],
    partition_cols: list[str] | None = None,
    out_col: str = "current_id",
    n_buckets: int = 64,
) -> DataFrame:
    """0-based position per (optional) group — reference W1 current_id
    (_metadata.py:117-120). With ``partition_cols`` the window shuffles on
    those keys only. Without, the GLOBAL position is computed as a
    distributed prefix count: per-bucket row_number over a deterministic
    order-monotone coarse bucket plus a broadcast offset table (one tiny
    count per bucket) — round 1 used Window.partitionBy(lit(1)), which
    funneled the whole table through a single task."""
    if partition_cols:
        w = Window.partitionBy(*partition_cols).orderBy(
            *[F.col(c) for c in order_cols]
        )
        return df.withColumn(out_col, F.row_number().over(w) - 1)

    from .partitioning import _monotone_bucket

    b = df.withColumn(
        "_rp_bucket", _monotone_bucket(df, order_cols[0], n_buckets)
    )
    counts = b.groupBy("_rp_bucket").agg(F.count(F.lit(1)).alias("_rp_n"))
    w_off = Window.orderBy("_rp_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "_rp_bucket",
        F.coalesce(F.sum("_rp_n").over(w_off), F.lit(0)).alias("_rp_off"),
    )
    w_local = Window.partitionBy("_rp_bucket").orderBy(
        *[F.col(c) for c in order_cols]
    )
    return (
        b.join(F.broadcast(offsets), "_rp_bucket")
        .withColumn(
            out_col, F.row_number().over(w_local) - 1 + F.col("_rp_off")
        )
        .drop("_rp_bucket", "_rp_off")
    )


def parent_child_join(
    child: DataFrame,
    parent: DataFrame,
    child_fk: str = "parent_id",
    parent_key: str = "current_id",
    how: str = "inner",
    broadcast_parent: bool = False,
) -> DataFrame:
    """J3 parent-child navigation. Broadcast the parent when it's a small
    dimension (reference J1's lookup joins are all broadcast-sized)."""
    p = F.broadcast(parent) if broadcast_parent else parent
    return child.join(p, child[child_fk] == p[parent_key], how)


def completeness_violations(
    df: DataFrame, required: DataFrame, keys: list[str], sample: int = 5
) -> DataFrame:
    """V12 completeness: rows of ``required`` with no match in ``df``
    (reference anti-join over offsets, zip_writer.py:447-479), first
    ``sample`` under canonical key order."""
    missing = required.join(df, keys, "left_anti")
    return missing.orderBy(*[F.col(k) for k in keys]).limit(sample)


def child_count_signature(
    child: DataFrame,
    group_col: str,
    sig_cols: list[str],
    order_col: str,
) -> DataFrame:
    """PIT-analog structural signature (reference taco/datamodel.py:294-390):
    per group, an order-insensitive hash of the ordered (position, cols)
    tuples + the child count. Groups are isomorphic iff signatures equal.
    Uses sum-of-hashes (commutative) instead of collect_list so hot groups
    don't OOM a reducer — the order sensitivity comes from hashing the
    order column *into* each term."""
    term = F.xxhash64(F.col(order_col), *[F.col(c) for c in sig_cols])
    return child.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_children"),
        F.sum(term).alias("signature"),
    )


def per_position_pattern(
    child: DataFrame,
    pos_col: str,
    pattern_cols: list[str],
    count_col: str = "n",
) -> DataFrame:
    """J4/V6 completion: the dominant (modal) value-tuple at each child
    position — the reference's PIT per-position pattern, which picks a
    canonical group and reads its (id, type) per position
    (_metadata.py:364-386 `_process_level1`, :413-423 folder-position
    filtering). Under the homogeneity guarantee the mode IS the canonical
    pattern; with violations present it is the pattern the most groups
    conform to (deviants surface via isomorphism_violations).

    One groupBy(pos, cols) count (map-side combined) + a row_number over the
    TINY counts frame (positions x distinct tuples), ties broken by value
    order so the result is deterministic. Returns one row per position:
    (pos_col, *pattern_cols, count_col)."""
    counts = child.groupBy(pos_col, *pattern_cols).agg(
        F.count(F.lit(1)).alias(count_col)
    )
    w = Window.partitionBy(pos_col).orderBy(
        F.col(count_col).desc(), *[F.col(c) for c in pattern_cols]
    )
    return (
        counts.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
        .orderBy(pos_col)
    )


def pit_schema(
    levels: list[DataFrame],
    pos_col: str,
    pattern_cols: list[str],
) -> dict:
    """Assemble the reference's PIT schema dict
    (_metadata.py:452-509 `generate_pit_schema`): root count plus, per
    level, the per-position pattern. Each level's pattern is a tiny
    aggregate (collected rows = positions), so driver-side assembly is
    safe at any corpus size."""
    if not levels:
        raise ValueError("need at least one level DataFrame")
    root = {"n": levels[0].count()}
    hierarchy = {}
    for depth, lvl in enumerate(levels[1:], 1):
        rows = per_position_pattern(lvl, pos_col, pattern_cols).collect()
        hierarchy[str(depth)] = [
            {
                "pos": r[pos_col],
                **{c: r[c] for c in pattern_cols},
                "n": r["n"],
            }
            for r in rows
        ]
    return {"root": root, "hierarchy": hierarchy}


def isomorphism_violations(
    child: DataFrame, group_col: str, sig_cols: list[str], order_col: str
) -> DataFrame:
    """Groups whose structural signature differs from the dominant one
    (reference PIT: 'all folders must have identical child structure')."""
    sigs = child_count_signature(child, group_col, sig_cols, order_col)
    dominant = (
        sigs.groupBy("n_children", "signature")
        .count()
        .orderBy(F.col("count").desc(), "signature")
        .limit(1)
    )
    return sigs.join(
        F.broadcast(dominant.select("n_children", "signature")),
        ["n_children", "signature"],
        "left_anti",
    )
