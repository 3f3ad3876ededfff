import os

import pytest

from taco_toolbox_spark.operators.bucketing import (
    bucketed_join_is_shuffle_free,
    write_bucketed,
)
from taco_toolbox_spark.sources.catalog import load_table, snapshot_id


def test_bucketed_join_no_shuffle(spark, corpus, tmp_path):
    # default warehouse dir (spark-warehouse/, gitignored): the conf is
    # static and can't be changed on a live session
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    write_bucketed(
        corpus.corrupted.select("conv_id", "turn_idx", "text"),
        "t_bucketed_a",
        ["conv_id"],
        n_buckets=8,
        sort_cols=["conv_id", "turn_idx"],
    )
    write_bucketed(
        corpus.clean.select("conv_id", "turn_idx", "text"),
        "t_bucketed_b",
        ["conv_id"],
        n_buckets=8,
        sort_cols=["conv_id", "turn_idx"],
    )
    joined, no_shuffle = bucketed_join_is_shuffle_free(
        spark, "t_bucketed_a", "t_bucketed_b", ["conv_id"]
    )
    assert no_shuffle, "bucketed join should not exchange"
    assert joined.count() > 0
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.sql("DROP TABLE IF EXISTS t_bucketed_a")
    spark.sql("DROP TABLE IF EXISTS t_bucketed_b")


def test_load_table_and_snapshot(spark, corpus, tmp_path):
    path = str(tmp_path / "snap")
    corpus.clean.limit(50).write.mode("overwrite").parquet(path)
    df = load_table(spark, path)
    assert df.count() == 50
    s1 = snapshot_id(spark, path)
    s2 = snapshot_id(spark, path)
    assert s1 == s2 and len(s1) == 16
    corpus.clean.limit(60).write.mode("overwrite").parquet(path)
    assert snapshot_id(spark, path) != s1  # data version changed
    with pytest.raises(NotImplementedError, match="Iceberg"):
        load_table(spark, "iceberg:db.tbl")


def test_jsonl_quarantine_split(tmp_path, spark):
    """Parseable lines land schema-aligned in good (missing fields null,
    extras dropped); unparseable lines land raw in quarantine — and are
    NOT silently nulled into plausible-looking rows."""
    from taco_toolbox_spark.sources.jsonl import read_jsonl_quarantined

    lines = [
        '{"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "hi", '
        '"tool": null, "ts": "2025-01-01T00:00:00Z", "part": "2025-01-01"}',
        '{"conv_id": "c1", "turn_idx": 1, "role": "assistant", "text": "yo", '
        '"extra_field": 42, "ts": "2025-01-01T00:00:01Z"}',  # extra + missing
        # stringified int + non-numeric turn_idx: PARSEABLE, so they must
        # stay good (cast: "2"→2, "bad"→NULL) — not be dumped in quarantine
        '{"conv_id": "c1", "turn_idx": "2", "role": "user", "text": "k"}',
        '{"conv_id": "c1", "turn_idx": "bad", "role": "user", "text": "m"}',
        '{not json at all',
        '{"conv_id": "c2"',  # truncated
    ]
    p = tmp_path / "in.jsonl"
    p.write_text("\n".join(lines) + "\n")
    good, quar, release = read_jsonl_quarantined(spark, str(p))
    g = good.orderBy("turn_idx").collect()
    assert [r.turn_idx for r in g] == [None, 0, 1, 2]  # "bad"→NULL first
    assert {r.conv_id for r in g} == {"c1"}
    assert "extra_field" not in good.columns
    assert dict(good.dtypes)["turn_idx"] == "int"  # aligned, not stringly
    q = quar.collect()
    assert sorted(r.raw for r in q) == ['{"conv_id": "c2"', "{not json at all"]
    assert all(r.line_hash is not None for r in q)
    # quarantined lines never leak into good as all-null rows
    assert good.filter("conv_id IS NULL").count() == 0
    release()
