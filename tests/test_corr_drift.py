"""Correlation drift (checks/drift.py:correlation_by_partition family).

The relationship member of the drift family: exact DECIMAL moment sums,
one float transition, pairwise-complete NULL semantics, degenerate
partitions surfaced as NULL corr (and flagged by the violations helper
when the baseline has a relationship to drift from).
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from taco_toolbox_spark.checks.drift import (
    correlation_by_partition,
    correlation_drift,
    correlation_drift_violations,
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "part string, x long, y long")


def test_corr_matches_numpy(spark):
    rng = np.random.RandomState(7)
    rows = []
    for part, slope in (("a", 3), ("b", -2)):
        xs = rng.randint(0, 1000, 200)
        noise = rng.randint(-50, 50, 200)
        rows += [
            (part, int(x), int(slope * x + e)) for x, e in zip(xs, noise)
        ]
    got = {
        r["part"]: r["corr"]
        for r in correlation_by_partition(
            _frame(spark, rows), "x", "y", "part"
        ).collect()
    }
    for part in ("a", "b"):
        xs = np.array([x for p, x, _ in rows if p == part], dtype=float)
        ys = np.array([y for p, _, y in rows if p == part], dtype=float)
        want = float(np.corrcoef(xs, ys)[0, 1])
        assert got[part] == pytest.approx(want, abs=1e-12)
    assert got["a"] > 0.9 and got["b"] < -0.9  # real signal


def test_corr_bit_identical_across_partitioning(spark):
    rng = np.random.RandomState(11)
    rows = [
        ("p", int(x), int(x * 2 + e))
        for x, e in zip(rng.randint(0, 10**6, 500), rng.randint(-9, 9, 500))
    ]
    df = _frame(spark, rows)
    one = correlation_by_partition(df.coalesce(1), "x", "y", "part").collect()
    many = correlation_by_partition(
        df.repartition(7), "x", "y", "part"
    ).collect()
    # == not approx: exact integer moments -> identical doubles regardless
    # of partitioning/merge order (the float-accumulated corr() aggregate
    # cannot promise this)
    assert one[0]["corr"] == many[0]["corr"]
    assert one[0]["n"] == many[0]["n"] == 500


def test_corr_degenerate_and_null_semantics(spark):
    rows = [
        ("single", 1, 10),           # n = 1 -> NULL
        ("flat", 5, 1), ("flat", 5, 2), ("flat", 5, 3),  # zero x-variance
        ("ok", 1, 1), ("ok", 2, 2), ("ok", 3, 3),
    ]
    df = spark.createDataFrame(rows, "part string, x long, y long")
    with_nulls = df.unionByName(
        spark.createDataFrame(
            [("ok", None, 99), ("ok", 99, None)],
            "part string, x long, y long",
        )
    )
    got = {
        r["part"]: r
        for r in correlation_by_partition(
            with_nulls, "x", "y", "part"
        ).collect()
    }
    assert got["single"]["corr"] is None and got["single"]["n"] == 1
    assert got["flat"]["corr"] is None
    # NULL-bearing rows dropped pairwise-complete: n stays 3, corr exact 1
    assert got["ok"]["n"] == 3
    assert got["ok"]["corr"] == pytest.approx(1.0, abs=1e-15)


def test_corr_drift_flags_inverted_partition(spark):
    rng = np.random.RandomState(23)
    rows = []
    # the drifted partition is a small minority, so the SELF-baseline
    # (pooled corpus relationship) stays dominated by the healthy shape —
    # the realistic "one source went wrong" scenario this check exists for
    for part, slope, m in (("d1", 1, 150), ("d2", 1, 150), ("bad", -1, 15)):
        for x, e in zip(rng.randint(0, 1000, m), rng.randint(-30, 30, m)):
            rows.append((part, int(x), int(slope * x + e)))
    rows += [("dead", 7, 1), ("dead", 7, 2)]  # zero variance, n >= 2
    df = _frame(spark, rows)
    cd = correlation_drift(df, "x", "y", "part")
    by_part = {r["part"]: r for r in cd.collect()}
    assert by_part["d1"]["delta"] < 0.35
    assert by_part["bad"]["delta"] > 1.0  # inverted vs positive baseline
    assert by_part["dead"]["corr"] is None
    assert all(
        math.isclose(r["corr_base"], by_part["d1"]["corr_base"])
        for r in by_part.values()
    )
    fired = {
        r["part"]: r["detail"]
        for r in correlation_drift_violations(cd, 0.5, "corr_xy").collect()
    }
    assert set(fired) == {"bad", "dead"}
    assert "degenerate" in fired["dead"]
    assert "delta" in fired["bad"]


def test_corr_drift_external_baseline(spark):
    base_rows = [("b", i, 2 * i) for i in range(100)]
    cur_rows = [("p1", i, 2 * i) for i in range(100)] + [
        ("p2", i, -2 * i) for i in range(100)
    ]
    cd = correlation_drift(
        _frame(spark, cur_rows),
        "x",
        "y",
        "part",
        baseline=_frame(spark, base_rows),
    )
    got = {r["part"]: r for r in cd.collect()}
    assert got["p1"]["corr_base"] == pytest.approx(1.0, abs=1e-15)
    assert got["p1"]["delta"] == pytest.approx(0.0, abs=1e-12)
    assert got["p2"]["delta"] == pytest.approx(2.0, abs=1e-12)


def test_corr_global_when_no_part(spark):
    rows = [("z", i, i * i) for i in range(1, 50)]
    out = correlation_by_partition(_frame(spark, rows), "x", "y", None).collect()
    assert len(out) == 1 and out[0]["part"] == "all" and out[0]["n"] == 49


def test_corr_drift_check_in_engine_battery(spark):
    from taco_toolbox_spark.checks.base import CorrelationDriftCheck
    from taco_toolbox_spark.engine import EngineConfig, run_validation

    rows = []
    for part, slope in (("p0", 2), ("p1", 2), ("p2", -2)):
        for i in range(60):
            rows.append((part, f"c{i%7}", i, i, slope * i + (i % 5)))
    df = spark.createDataFrame(
        rows, "part string, conv_id string, turn_idx int, x long, y long"
    )
    base = spark.createDataFrame(
        [("b", "c0", 0, i, 2 * i + (i % 5)) for i in range(120)],
        "part string, conv_id string, turn_idx int, x long, y long",
    )
    cfg = EngineConfig(partition_col="part", group_col="conv_id",
                       order_col="turn_idx", key_cols=("conv_id", "turn_idx"))
    res = run_validation(
        df,
        [CorrelationDriftCheck(check_id="xy_corr", x_expr="x", y_expr="y",
                               threshold=0.5)],
        cfg,
        baseline=base,
    )
    verdicts = {r["part"]: r["passed"] for r in res.verdicts.collect()}
    assert verdicts == {"p0": True, "p1": True, "p2": False}
    v = res.violations.collect()
    assert len(v) == 1 and v[0]["check_id"] == "xy_corr"
    assert v[0]["part"] == "p2" and "delta" in v[0]["detail"]

    # no baseline anywhere -> loud error naming the check
    with pytest.raises(ValueError, match="xy_corr"):
        run_validation(
            df,
            [CorrelationDriftCheck(check_id="xy_corr", x_expr="x",
                                   y_expr="y")],
            cfg,
        )

    # inline stored baseline: no baseline frame needed
    res2 = run_validation(
        df,
        [CorrelationDriftCheck(check_id="xy_corr", x_expr="x", y_expr="y",
                               threshold=0.5, baseline_corr=1.0)],
        cfg,
    )
    verdicts2 = {r["part"]: r["passed"] for r in res2.verdicts.collect()}
    assert verdicts2 == {"p0": True, "p1": True, "p2": False}


def test_corr_drift_suite_type(spark):
    from taco_toolbox_spark.suite import SuiteError, parse_suite

    spec = {
        "engine": {"partition_col": "part", "group_col": "conv_id",
                   "order_col": "turn_idx"},
        "checks": [
            {"type": "corr_drift", "id": "len_vs_turn",
             "x": "turn_idx", "y": "length(text)",
             "baseline_corr": 0.9},
        ],
    }
    suite = parse_suite(spec)
    c = suite.checks[0]
    assert c.x_expr == "turn_idx" and c.baseline_corr == 0.9
    # default threshold resolved back into the dump (audit-trail contract)
    dumped = suite.dump()["checks"][0]
    assert dumped["threshold"] == 0.25
    # round-trip: parsing the dump yields the same normalized spec
    assert parse_suite(suite.dump()).dump() == suite.dump()

    with pytest.raises(SuiteError, match="missing required key 'y'"):
        parse_suite({"checks": [
            {"type": "corr_drift", "id": "bad", "x": "turn_idx"}]})
    with pytest.raises(SuiteError, match="unknown keys"):
        parse_suite({"checks": [
            {"type": "corr_drift", "id": "bad", "x": "a", "y": "b",
             "threshhold": 0.5}]})
    with pytest.raises(SuiteError, match="unparseable"):
        parse_suite({"checks": [
            {"type": "corr_drift", "id": "bad", "x": "SELEC bogus (",
             "y": "b"}]})
    with pytest.raises(SuiteError, match="baseline_corr"):
        parse_suite({"checks": [
            {"type": "corr_drift", "id": "bad", "x": "a", "y": "b",
             "baseline_corr": True}]})
