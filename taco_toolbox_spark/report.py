"""Human-readable validation reports.

The reference surfaces failures as typed exceptions with formatted reports
listing offending values capped at a fixed count
(/root/reference/tacotoolbox/_exceptions.py:19-171,
tortilla/datamodel.py:243-254 "first 10 duplicates"). The engine's
set-oriented outputs (verdict matrix + violation rows) render to the same
shape here — and can optionally *raise* like the reference for fail-fast
pipelines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .engine import ValidationResult, sample_violations


class TacoValidationError(Exception):
    """Raised by assert_valid when any (partition, check) cell fails —
    message carries the capped violation report (reference
    TacoValidationError analog)."""


def render_report(result: ValidationResult, max_examples: int = 10) -> str:
    """Format failing checks with up to ``max_examples`` violations each
    under canonical (conv_id, turn_idx) ordering."""
    failing = (
        result.verdicts.filter(~F.col("passed"))
        .groupBy("check_id")
        .agg(
            F.sum("n_violations").alias("n"),
            F.count(F.lit(1)).alias("parts"),
        )
        .orderBy("check_id")
        .collect()
    )
    if not failing:
        return "validation: PASS (all checks, all partitions)"
    lines = [f"validation: FAIL ({len(failing)} checks failing)"]
    examples = sample_violations(result.violations, max_examples).collect()
    by_check: dict[str, list] = {}
    for r in examples:
        by_check.setdefault(r["check_id"], []).append(r)
    for row in failing:
        cid = row["check_id"]
        lines.append(
            f"  {cid}: {row['n']} violations across {row['parts']} partitions"
        )
        for ex in sorted(
            by_check.get(cid, []),
            key=lambda r: (r["conv_id"] or "", r["turn_idx"] or -1),
        )[:max_examples]:
            where = ex["conv_id"] or "<partition>"
            if ex["turn_idx"] is not None:
                where += f"[{ex['turn_idx']}]"
            lines.append(f"    - {ex['part']} {where}: {ex['detail']}")
    return "\n".join(lines)


def assert_valid(result: ValidationResult, max_examples: int = 10) -> None:
    """Fail-fast mode: raise TacoValidationError with the formatted report
    if anything failed (reference construction-time validation behavior)."""
    report = render_report(result, max_examples)
    if not report.startswith("validation: PASS"):
        raise TacoValidationError(report)


def verdict_diff(prev, cur, include_unchanged: bool = False):
    """Regression diff between two validation runs' verdict matrices —
    the operational question a recurring validation job answers: WHAT
    CHANGED since the last run, not just what is red today.

    ``prev`` / ``cur`` are verdict frames (part, check_id, passed, ...).
    Returns (part, check_id, prev_passed, cur_passed, status) with status

    * ``new_failure``  — passed before, fails now (the page-the-owner row)
    * ``fixed``        — failed before, passes now
    * ``still_failing``— known-bad both runs
    * ``new_cell``     — (part, check) absent from prev (new partition
                         arrived, or a check was added)
    * ``removed_cell`` — present in prev, absent now (partition dropped
                         or check removed)

    ``include_unchanged`` adds ``still_passing`` rows (off by default —
    the diff is meant to be small). Both inputs are verdict-matrix-sized
    (|partitions| x |checks|), so the full-outer join is metadata-scale;
    no salting or skew handling warranted."""
    p = prev.select(
        F.col("part").alias("_pp_part"),
        F.col("check_id").alias("_pp_check"),
        F.col("passed").alias("prev_passed"),
    )
    c = cur.select(
        F.col("part").alias("_cp_part"),
        F.col("check_id").alias("_cp_check"),
        F.col("passed").alias("cur_passed"),
    )
    # null-safe key equality: a NULL-part cell (the engine stringifies raw
    # partition values, so NULL is representable) must match itself across
    # runs rather than splitting into a removed_cell + new_cell pair
    j = p.join(
        c,
        F.col("_pp_part").eqNullSafe(F.col("_cp_part"))
        & F.col("_pp_check").eqNullSafe(F.col("_cp_check")),
        "full_outer",
    )
    pp, cp = F.col("prev_passed"), F.col("cur_passed")
    status = (
        F.when(pp.isNull(), F.lit("new_cell"))
        .when(cp.isNull(), F.lit("removed_cell"))
        .when(pp & ~cp, F.lit("new_failure"))
        .when(~pp & cp, F.lit("fixed"))
        .when(~pp & ~cp, F.lit("still_failing"))
        .otherwise(F.lit("still_passing"))
    )
    out = j.select(
        F.coalesce(F.col("_pp_part"), F.col("_cp_part")).alias("part"),
        F.coalesce(F.col("_pp_check"), F.col("_cp_check")).alias("check_id"),
        "prev_passed",
        "cur_passed",
        status.alias("status"),
    )
    if not include_unchanged:
        out = out.filter(F.col("status") != "still_passing")
    return out
