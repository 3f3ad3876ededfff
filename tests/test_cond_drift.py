"""Conditional-distribution drift (checks/drift.py:conditional_tv family).

The categorical-RELATIONSHIP member of the drift family: exact
cross-multiplied integer TV of P(cat | cond) vs the baseline's global
conditional, one float division at the end, novel conditioning values
surfaced as NULL tv (and fired as their own violation class).
"""

import pytest
from pyspark.sql import functions as F

from taco_toolbox_spark.checks.drift import (
    conditional_counts,
    conditional_drift_violations,
    conditional_tv,
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "part string, k string, c string")


def _tv(rows_part, base):
    """Python reference: exact conditional TV for one (part, cond)."""
    n_part = sum(rows_part.values())
    n_base = sum(base.values())
    cats = set(rows_part) | set(base)
    num = sum(
        abs(rows_part.get(c, 0) * n_base - base.get(c, 0) * n_part)
        for c in cats
    )
    return num / (2.0 * n_part * n_base)


def test_conditional_tv_matches_python_reference(spark):
    rows = (
        [("p1", "t", "a")] * 30 + [("p1", "t", "b")] * 10
        + [("p2", "t", "a")] * 10 + [("p2", "t", "b")] * 30
        + [("p1", "u", "a")] * 20 + [("p2", "u", "a")] * 20
    )
    df = _frame(spark, rows)
    base = conditional_counts(df, "k", "c")
    out = {
        (r["part"], r["cond"]): r
        for r in conditional_tv(df, "k", "c", "part", base).collect()
    }
    base_t = {"a": 40, "b": 40}
    assert out[("p1", "t")]["tv"] == pytest.approx(
        _tv({"a": 30, "b": 10}, base_t), abs=0
    )
    assert out[("p2", "t")]["tv"] == pytest.approx(
        _tv({"a": 10, "b": 30}, base_t), abs=0
    )
    # cond 'u' is identical everywhere: zero drift, integer-exact
    assert out[("p1", "u")]["tv"] == 0.0 and out[("p1", "u")]["tv_num"] == 0
    assert out[("p1", "t")]["n_part"] == 40
    assert out[("p1", "t")]["n_base"] == 80


def test_conditional_tv_sees_broken_relationship_intact_marginals(spark):
    # THE failure class this check exists for: both marginals identical
    # across partitions (each part: 20 t + 20 u; 20 a + 20 c), but the
    # contingency flips — in p1 t<->a and u<->c, in p2 t<->c and u<->a.
    rows = (
        [("p1", "t", "a")] * 20 + [("p1", "u", "c")] * 20
        + [("p2", "t", "c")] * 20 + [("p2", "u", "a")] * 20
    )
    df = _frame(spark, rows)
    base = conditional_counts(df, "k", "c")  # pooled: t -> 50/50 a,c
    out = {
        (r["part"], r["cond"]): r["tv"]
        for r in conditional_tv(df, "k", "c", "part", base).collect()
    }
    # every (part, cond) sits at TV 0.5 from the pooled 50/50 conditional
    assert all(v == pytest.approx(0.5, abs=0) for v in out.values())
    # ...while the marginal check (cat TV of c alone per part) sees NOTHING
    from taco_toolbox_spark.checks.drift import (
        categorical_counts,
        categorical_tv,
    )

    marg = categorical_tv(df, "c", "part", categorical_counts(df, "c"))
    assert all(r["tv"] == 0.0 for r in marg.collect())


def test_conditional_tv_bit_identical_across_partitioning(spark):
    rows = [
        ("p", f"k{i % 3}", f"c{(i * 7) % 5}") for i in range(500)
    ] + [("q", f"k{i % 3}", f"c{(i * 11) % 5}") for i in range(300)]
    df = _frame(spark, rows)
    base = conditional_counts(df, "k", "c")
    one = {
        (r["part"], r["cond"]): (r["tv_num"], r["tv"])
        for r in conditional_tv(
            df.coalesce(1), "k", "c", "part", base
        ).collect()
    }
    many = {
        (r["part"], r["cond"]): (r["tv_num"], r["tv"])
        for r in conditional_tv(
            df.repartition(7), "k", "c", "part", base
        ).collect()
    }
    # == not approx: integer tv_num and one final division -> identical
    # doubles regardless of partitioning/merge order
    assert one == many


def test_conditional_tv_novel_cond_and_violations(spark):
    rows = [("p1", "t", "a")] * 10 + [("p1", "t", "b")] * 10
    df = _frame(spark, rows)
    base = conditional_counts(df, "k", "c")
    cur = _frame(
        spark,
        [("p1", "t", "a")] * 19 + [("p1", "t", "b")]  # drifted to 95/5
        + [("p2", "zz", "a")] * 4,  # cond 'zz' absent from baseline
    )
    ct = conditional_tv(cur, "k", "c", "part", base)
    out = {(r["part"], r["cond"]): r for r in ct.collect()}
    assert out[("p2", "zz")]["tv"] is None
    assert out[("p2", "zz")]["n_base"] is None
    assert out[("p1", "t")]["tv"] == pytest.approx(0.45, abs=0)
    details = sorted(
        r["detail"]
        for r in conditional_drift_violations(ct, 0.25, "cd").collect()
    )
    assert len(details) == 2
    assert any("conditional_tv" in d and "cond=t" in d for d in details)
    assert any("novel conditioning value zz" in d for d in details)
    # mass the baseline has but the partition lacks still contributes:
    # a partition with ONLY 'a' under cond t is TV 0.5 from the 50/50 base
    only_a = conditional_tv(
        _frame(spark, [("p3", "t", "a")] * 8), "k", "c", "part", base
    ).collect()
    assert only_a[0]["tv"] == pytest.approx(0.5, abs=0)


def test_conditional_tv_null_categories_and_exprs(spark):
    df = spark.createDataFrame(
        [("p", None, 10.0), ("p", None, 10.0), ("p", "t", None),
         ("p", "t", 250.0)],
        "part string, k string, v double",
    )
    bucket = "CAST(LEAST(CAST(FLOOR(v / 100) AS INT), 4) AS STRING)"
    base = conditional_counts(df, "k", bucket)
    # NULL cond folds into '<null>'; expression axes work end to end
    assert base[("<null>", "0")] == 2
    assert ("t", "2") in base
    out = {
        r["cond"]: r["tv"]
        for r in conditional_tv(df, "k", bucket, "part", base).collect()
    }
    assert out["<null>"] == 0.0 and out["t"] == 0.0


def test_conditional_drift_check_in_engine_battery(spark):
    from taco_toolbox_spark.checks.base import ConditionalDriftCheck
    from taco_toolbox_spark.engine import EngineConfig, run_validation

    rows = []
    for part, flip in (("p0", False), ("p1", False), ("p2", True)):
        for i in range(40):
            k = f"t{i % 2}"
            c = f"c{(i % 2) ^ 1}" if flip else f"c{i % 2}"
            rows.append((part, f"cv{i % 5}", i, k, c))
    df = spark.createDataFrame(
        rows, "part string, conv_id string, turn_idx int, k string, c string"
    )
    base = spark.createDataFrame(
        [("b", "c0", 0, f"t{i % 2}", f"c{i % 2}") for i in range(80)],
        "part string, conv_id string, turn_idx int, k string, c string",
    )
    cfg = EngineConfig(partition_col="part", group_col="conv_id",
                       order_col="turn_idx", key_cols=("conv_id", "turn_idx"))
    res = run_validation(
        df,
        [ConditionalDriftCheck(check_id="c_given_k", cond_expr="k",
                               cat_expr="c", threshold=0.5)],
        cfg,
        baseline=base,
    )
    verdicts = {r["part"]: r["passed"] for r in res.verdicts.collect()}
    assert verdicts == {"p0": True, "p1": True, "p2": False}
    v = res.violations.collect()
    assert {x["part"] for x in v} == {"p2"}
    assert all(x["check_id"] == "c_given_k" for x in v)

    with pytest.raises(ValueError, match="c_given_k"):
        run_validation(
            df,
            [ConditionalDriftCheck(check_id="c_given_k", cond_expr="k",
                                   cat_expr="c")],
            cfg,
        )


def test_cond_drift_suite_type(spark):
    from taco_toolbox_spark.suite import SuiteError, parse_suite

    spec = {
        "engine": {"partition_col": "part", "group_col": "conv_id",
                   "order_col": "turn_idx"},
        "checks": [
            {"type": "cond_drift", "id": "role_given_tool",
             "cond": "tool", "cat": "role",
             "baseline_counts": {"search": {"assistant": 90, "user": 10}}},
        ],
    }
    suite = parse_suite(spec)
    c = suite.checks[0]
    assert c.cond_expr == "tool"
    assert c.baseline_counts == {("search", "assistant"): 90,
                                 ("search", "user"): 10}
    dumped = suite.dump()["checks"][0]
    assert dumped["threshold"] == 0.25
    assert parse_suite(suite.dump()).dump() == suite.dump()

    with pytest.raises(SuiteError, match="missing required key 'cat'"):
        parse_suite({"checks": [
            {"type": "cond_drift", "id": "bad", "cond": "tool"}]})
    with pytest.raises(SuiteError, match="nested object"):
        parse_suite({"checks": [
            {"type": "cond_drift", "id": "bad", "cond": "a", "cat": "b",
             "baseline_counts": {"x": 3}}]})
    with pytest.raises(SuiteError, match="unparseable"):
        parse_suite({"checks": [
            {"type": "cond_drift", "id": "bad", "cond": "SELEC bogus (",
             "cat": "b"}]})
