"""Functional-dependency validation: determinant → dependent consistency.

A functional dependency (FD) ``X → Y`` holds when every distinct value of
the determinant columns X maps to exactly ONE combination of the dependent
columns Y. It is the classic declarative data-quality constraint the
uniqueness check cannot express: uniqueness says "X appears once"; an FD
says "X may repeat, but always with the same Y" — e.g. "every tool name is
used by exactly one role", "a conversation never changes partition day",
"a document id always carries the same language tag". Reference analog:
the reference enforces field consistency imperatively per datamodel object
(tortilla/datamodel.py:235-254 rejects id collisions; sample/datamodel.py
pins per-sample literals); the FD check is the set-oriented generalization
over arbitrary column pairs.

Scale shape — two stacked hash aggregations, no expand, no window:

  1. ``groupBy(determinant, dependent-combo) → count``: partial-aggregates
     map-side, so a hot determinant (one tool used by 10^9 turns) crosses
     the shuffle as one combiner row per (task, combo) — the combo grain
     absorbs determinant skew exactly like the soft-dedup cluster count.
  2. ``groupBy(determinant) → n_variants, n_rows, min/max combo``: the
     input is already one row per (determinant, combo) — tiny by
     construction — and min/max give deterministic witness values without
     collecting variant lists.

This deliberately avoids ``count_distinct`` (an Expand that doubles the
first shuffle's rows) and per-group windows (a hot determinant would
serialize one task).

The dependent combination is serialized with the package-wide sentinel
convention (operators/sampling.py: ``chr(31)`` separator, ``chr(0)`` NULL
marker) so NULL is a real value — (NULL) and ('') are different variants —
and an independent engine replays the exact strings. Batch variant
COUNTING groups by the actual dependent columns (exact for any values);
the serialized string is witness-display only. The streaming twin
(validate_stream.fd_violations_stateful) keeps first-seen state as the
serialized string, so values containing the separator/sentinel control
chars can collapse there — acceptable for the transcript payloads this
engine validates, documented for anything else.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.sampling import _NULL, _SEP

#: output/internal columns fd_violations appends
_OUT_COLS = ("n_variants", "n_rows", "variant_min", "variant_max")
_INTERNAL = ("_combo", "_n")


def dependent_combo(dependent: Sequence[str]) -> Column:
    """One engine-portable string per dependent-column combination:
    sentinel-separated, NULL-marked (NULL ≠ '' ≠ absent)."""
    return F.concat_ws(
        _SEP,
        *[
            F.coalesce(F.col(c).cast("string"), F.lit(_NULL))
            for c in dependent
        ],
    )


def validate_fd_args(
    determinant: Sequence[str],
    dependent: Sequence[str],
    partition_col: str | None = None,
) -> tuple[list[str], list[str]]:
    """Shared argument validation for the batch and streaming FD paths —
    one place so optional-key / overlap semantics can never diverge."""
    det = list(determinant)
    dep = list(dependent)
    if not det or not dep:
        raise ValueError("determinant and dependent must each name columns")
    overlap = set(det) & set(dep)
    if overlap:
        raise ValueError(
            f"columns {sorted(overlap)} appear in both determinant and "
            "dependent; an FD onto itself is vacuous"
        )
    if partition_col is not None and partition_col in set(det) | set(dep):
        raise ValueError(
            f"partition column {partition_col!r} cannot be part of the FD: "
            "as a dependent the per-partition scoping makes the combo "
            "constant (the check can never fail); as a determinant it "
            "duplicates the grouping key. Scope an FD ONTO the partition "
            "(e.g. conv_id -> part) by passing partition_col=None"
        )
    return det, dep


def null_free_determinant(det: Sequence[str]) -> Column:
    """Predicate: every determinant column is non-NULL — the optional-key
    exemption shared by batch and streaming FD."""
    pred = F.lit(True)
    for c in det:
        pred = pred & F.col(c).isNotNull()
    return pred


def fd_violations(
    df: DataFrame,
    determinant: Sequence[str],
    dependent: Sequence[str],
    partition_col: str | None = None,
    skip_null_determinant: bool = False,
) -> DataFrame:
    """Determinant values that break ``determinant → dependent``: one row
    per violating determinant (scoped within ``partition_col`` when given,
    matching the engine's per-partition verdict grain) with

    * ``n_variants`` — distinct dependent combinations observed (> 1),
    * ``n_rows``     — rows carrying this determinant,
    * ``variant_min`` / ``variant_max`` — lexicographic extreme combos,
      deterministic human-readable witnesses of the disagreement.

    Empty result ⟺ the FD holds. NULL determinants form a group of their
    own (GROUP BY NULL semantics agree across engines); NULL dependents
    are a distinct variant via the sentinel serialization.
    ``skip_null_determinant`` exempts rows where ANY determinant column is
    NULL — the "optional key" semantics (a transcript turn with no tool is
    not a counterexample to "each tool is used by one role"); the filter
    is a scan-level predicate, pushdown-eligible.
    """
    det, dep = validate_fd_args(determinant, dependent, partition_col)
    reserved = set(_OUT_COLS + _INTERNAL) & set(df.columns)
    if reserved:
        raise ValueError(
            f"columns {sorted(reserved)} collide with fd_violations' "
            "output/internal names; rename them first"
        )
    if skip_null_determinant:
        df = df.filter(null_free_determinant(det))
    keys = ([partition_col] if partition_col else []) + det
    # variants are counted at the grain of the ACTUAL dependent columns —
    # exact and injective for any values. The serialized combo is built
    # only AFTER the grouping, as the human-readable witness: a dependent
    # value that itself contains the chr(31) separator can make two
    # distinct variants RENDER identically in variant_min/max, but it can
    # no longer collapse them in the count (which would have been a false
    # pass — review finding)
    combos = (
        df.select(*keys, *dep)
        .groupBy(*keys, *dep)
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(*keys, dependent_combo(dep).alias("_combo"), "_n")
    )
    return (
        combos.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.sum("_n").alias("n_rows"),
            F.min("_combo").alias("variant_min"),
            F.max("_combo").alias("variant_max"),
        )
        .filter(F.col("n_variants") > 1)
    )
