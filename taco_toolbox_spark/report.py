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
