"""operators/outliers.py — robust median/MAD flagging + winsorization."""

import pytest
from pyspark.sql import functions as F

from taco_toolbox_spark.operators.outliers import robust_outliers, winsorize


def test_robust_outliers_hand_computed(spark):
    """Group a: values 1..5 + spike 100 → med 3.5, deviations
    {2.5,1.5,.5,.5,1.5,96.5} → MAD 1.5; only the spike exceeds 3·MAD.
    NULLs: never outliers, excluded from medians."""
    rows = [("a", float(v)) for v in [1, 2, 3, 4, 5, 100]] + [("a", None)]
    df = spark.createDataFrame(rows, "grp string, value double")
    out = {
        (r["grp"], r["value"]): (r["med"], r["mad"], r["is_outlier"])
        for r in robust_outliers(
            df, "value", ["grp"], k=3.0, method="exact"
        ).collect()
    }
    assert out[("a", 100.0)] == (3.5, 1.5, True)
    for v in [1.0, 2.0, 3.0, 4.0, 5.0]:
        assert out[("a", v)] == (3.5, 1.5, False), v
    assert out[("a", None)][2] is None or out[("a", None)][2] is False


def test_robust_outliers_zero_mad_and_ungrouped(spark):
    """>= half identical values → MAD 0: every differing value flags (the
    documented MAD-rule behavior); ungrouped mode broadcasts one global
    row."""
    df = spark.createDataFrame(
        [(float(v),) for v in [7, 7, 7, 7, 9]], "value double"
    )
    out = {r["value"]: r["is_outlier"] for r in
           robust_outliers(df, "value", method="exact").collect()}
    assert out == {7.0: False, 9.0: True}


def test_winsorize_clips_to_quantiles(spark):
    """Exact type-7 quantiles of 1..10 at (0.1, 0.9) are 1.9 and 9.1;
    values clip into [1.9, 9.1], NULL stays NULL."""
    df = spark.createDataFrame(
        [(float(v),) for v in range(1, 11)] + [(None,)], "value double"
    )
    out = winsorize(df, "value", lo=0.1, hi=0.9, method="exact")
    got = {r["value"]: r["value_wins"] for r in out.collect()}
    assert got[1.0] == 1.9 and got[10.0] == 9.1
    assert got[5.0] == 5.0 and got[None] is None


def test_outliers_partitioning_invariant_and_guards(spark):
    df = spark.createDataFrame(
        [(f"g{i % 3}", float(i % 17)) for i in range(120)],
        "grp string, value double",
    )
    a = sorted(
        tuple(r)
        for r in robust_outliers(
            df.coalesce(1), "value", ["grp"], method="exact"
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in robust_outliers(
            df.repartition(7), "value", ["grp"], method="exact"
        ).collect()
    )
    assert a == b
    # approx agrees with exact on this small frame (sketch is exact when
    # the group fits one sketch buffer)
    c = sorted(
        tuple(r)
        for r in robust_outliers(df, "value", ["grp"], method="approx").collect()
    )
    assert c == a
    with pytest.raises(ValueError, match="k must"):
        robust_outliers(df, "value", k=0)
    with pytest.raises(ValueError, match="method"):
        robust_outliers(df, "value", method="bogus")
    with pytest.raises(ValueError, match="collide"):
        robust_outliers(df.withColumn("mad", F.lit(1)), "value")
    with pytest.raises(ValueError, match="lo < hi"):
        winsorize(df, "value", lo=0.9, hi=0.1)
    with pytest.raises(ValueError, match="collide"):
        winsorize(df.withColumn("value_wins", F.lit(1)), "value")
