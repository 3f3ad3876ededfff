"""Conversation-level operators (operators/transcripts.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from taco_toolbox_spark.operators.transcripts import (
    conversation_profile,
    truncate_to_token_budget,
)

SCHEMA = "conv_id string, turn_idx int, role string, text string, ts timestamp"
T0 = dt.datetime(2025, 1, 1)


def _s(sec):
    return T0 + dt.timedelta(seconds=sec)


def test_conversation_profile_fields(spark):
    df = spark.createDataFrame(
        [
            ("a", 0, "system", "sys prompt", _s(0)),
            ("a", 1, "user", "hi there", _s(10)),
            ("a", 2, "tool", "result", _s(25)),
            ("a", 3, "assistant", None, _s(30)),
            ("b", 0, "system", "x", _s(0)),
        ],
        SCHEMA,
    )
    p = {r["conv_id"]: r.asDict() for r in conversation_profile(df).collect()}
    a = p["a"]
    assert a["n_turns"] == 4 and a["n_roles"] == 4 and a["n_tool_turns"] == 1
    assert a["duration_s"] == 30.0
    assert a["n_chars"] == len("sys prompt") + len("hi there") + len("result")
    assert a["opening_role"] == "system" and a["closing_role"] == "assistant"
    b = p["b"]
    assert b["n_turns"] == 1 and b["duration_s"] == 0.0


def test_truncate_prefix_semantics(spark):
    """Turns are whole: the turn that crosses the budget is dropped along
    with everything after it — no gaps, no partial turns."""
    df = spark.createDataFrame(
        [
            ("a", 0, "system", "one two three", _s(0)),        # 3 -> cum 3
            ("a", 1, "user", "four five six seven", _s(1)),    # 4 -> cum 7
            ("a", 2, "assistant", "eight nine", _s(2)),        # 2 -> cum 9 > 8
            ("a", 3, "user", "x", _s(3)),
            ("b", 0, "system", "a b", _s(0)),                  # fits whole
        ],
        SCHEMA,
    )
    out = truncate_to_token_budget(df, budget=8)
    rows = {(r["conv_id"], r["turn_idx"]): r.asDict() for r in out.collect()}
    assert set(rows) == {("a", 0), ("a", 1), ("b", 0)}
    assert rows[("a", 1)]["cum_tokens"] == 7
    assert rows[("a", 0)]["truncated"] is True
    assert rows[("b", 0)]["truncated"] is False


def test_truncate_null_text_counts_zero(spark):
    df = spark.createDataFrame(
        [
            ("a", 0, "system", None, _s(0)),
            ("a", 1, "user", "w1 w2", _s(1)),
        ],
        SCHEMA,
    )
    out = {r["turn_idx"]: r["turn_tokens"] for r in
           truncate_to_token_budget(df, budget=10).collect()}
    assert out == {0: 0, 1: 2}


def test_truncate_reserved_and_modes(spark):
    df = spark.createDataFrame(
        [("a", 0, "user", "hello world", _s(0))], SCHEMA
    ).withColumn("cum_tokens", F.lit(1))
    with pytest.raises(ValueError, match="cum_tokens"):
        truncate_to_token_budget(df, budget=5)
    ok = spark.createDataFrame([("a", 0, "user", "hello, world!", _s(0))], SCHEMA)
    bpe = truncate_to_token_budget(ok, budget=100, count_mode="bpe_ish")
    assert bpe.first()["turn_tokens"] >= 2
    with pytest.raises(ValueError, match="count_mode"):
        truncate_to_token_budget(ok, budget=5, count_mode="chars")


# ------------------------------------------------------------------ reindex


def test_reindex_turns_contiguous_after_filter(spark):
    from taco_toolbox_spark.operators.transcripts import reindex_turns

    df = spark.createDataFrame(
        [
            ("a", 0, "system", "s", _s(0)),
            ("a", 1, "user", "u", _s(1)),
            ("a", 3, "tool", "t", _s(2)),
            ("a", 5, "assistant", "r", _s(3)),
            ("b", 2, "user", "x", _s(0)),
        ],
        SCHEMA,
    )
    out = reindex_turns(df.filter(F.col("role") != "tool"))
    rows = {
        (r["conv_id"], r["orig_turn_idx"]): r["turn_idx"]
        for r in out.collect()
    }
    assert rows == {
        ("a", 0): 0, ("a", 1): 1, ("a", 5): 2, ("b", 2): 0,
    }
    assert dict(out.dtypes)["turn_idx"] == "int"
    assert set(out.columns) == set(df.columns) | {"orig_turn_idx"}


def test_reindex_turns_drop_original(spark):
    from taco_toolbox_spark.operators.transcripts import reindex_turns

    df = spark.createDataFrame([("a", 7, "user", "u", _s(0))], SCHEMA)
    out = reindex_turns(df, keep_original=None)
    assert out.columns == df.columns
    assert out.first()["turn_idx"] == 0


def test_reindex_turns_collision_raises(spark):
    from taco_toolbox_spark.operators.transcripts import reindex_turns

    df = spark.createDataFrame([("a", 0, "user", "u", _s(0))], SCHEMA)
    with pytest.raises(ValueError, match="collides"):
        reindex_turns(df, keep_original="turn_idx")
    with pytest.raises(ValueError, match="collides"):
        reindex_turns(df.withColumn("orig_turn_idx", F.lit(1)))


# ------------------------------------------------------------------- render


def test_render_conversations_order_and_nulls(spark):
    from taco_toolbox_spark.operators.transcripts import render_conversations

    df = spark.createDataFrame(
        [
            ("a", 1, "user", "hello", _s(1)),
            ("a", 0, "system", "be nice", _s(0)),
            ("a", 2, None, None, _s(2)),
            ("b", 0, "user", "solo", _s(0)),
        ],
        SCHEMA,
    )
    rows = {r["conv_id"]: r for r in render_conversations(df).collect()}
    assert rows["a"]["text"] == "<system> be nice\n<user> hello\n<> "
    assert rows["a"]["n_turns"] == 3
    assert rows["a"]["n_chars"] == len(rows["a"]["text"])
    assert rows["b"]["text"] == "<user> solo"


def test_render_conversations_tie_stability(spark):
    """Duplicate turn_idx values (corrupted corpus) must render the same
    text regardless of partitioning — the line is in the sort key."""
    from taco_toolbox_spark.operators.transcripts import render_conversations

    df = spark.createDataFrame(
        [
            ("a", 0, "user", "zzz", _s(0)),
            ("a", 0, "user", "aaa", _s(1)),
        ],
        SCHEMA,
    )
    t1 = render_conversations(df.coalesce(1)).first()["text"]
    t2 = render_conversations(df.repartition(7)).first()["text"]
    assert t1 == t2 == "<user> aaa\n<user> zzz"


# ------------------------------------------------------------------- chunk


def test_chunk_windows_overlap_and_bounds(spark):
    from taco_toolbox_spark.operators.transcripts import chunk_conversations

    df = spark.createDataFrame(
        [("a", i, "user", "t", _s(i)) for i in range(6)], SCHEMA
    )
    out = chunk_conversations(df, window_turns=4, stride_turns=2)
    wins = {}
    for r in out.collect():
        wins.setdefault(r["window_id"], []).append(r["turn_idx"])
    # window w covers positions [2w, 2w+4)
    assert sorted(wins[0]) == [0, 1, 2, 3]
    assert sorted(wins[1]) == [2, 3, 4, 5]
    assert sorted(wins[2]) == [4, 5]
    # replication factor exactly ceil(window/stride) = 2 for interior turns
    assert out.count() == 6 + 4  # turns 2..5 appear twice


def test_chunk_windows_nonoverlapping_default_and_guards(spark):
    from taco_toolbox_spark.operators.transcripts import chunk_conversations

    df = spark.createDataFrame(
        [("a", i, "user", "t", _s(i)) for i in range(5)]
        + [("a", -1, "user", "corrupt", _s(9))],
        SCHEMA,
    )
    out = chunk_conversations(df, window_turns=3)
    got = {(r["turn_idx"], r["window_id"]) for r in out.collect()}
    # back-to-back windows, one window per turn; the negative position drops
    assert got == {(0, 0), (1, 0), (2, 0), (3, 1), (4, 1)}
    with pytest.raises(ValueError, match="skip turns"):
        chunk_conversations(df, window_turns=2, stride_turns=3)
    with pytest.raises(ValueError, match="window_turns"):
        chunk_conversations(df, window_turns=0)
    with pytest.raises(ValueError, match="window_id"):
        chunk_conversations(df.withColumn("window_id", F.lit(1)), 2)


def test_render_with_loss_spans_slices_and_parity(spark):
    from taco_toolbox_spark.operators.transcripts import (
        render_conversations,
        render_with_loss_spans,
    )

    df = spark.createDataFrame(
        [
            ("c1", 0, "system", "be good"),
            ("c1", 1, "user", "hi"),
            ("c1", 2, "assistant", "hello there"),
            ("c1", 3, "assistant", "more"),
            ("c2", 0, "user", "no assistant here"),
            ("c3", 0, None, None),  # NULL role/text render empty, never masked
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    out = {r["conv_id"]: r for r in render_with_loss_spans(df).collect()}
    # rendered text identical to the plain renderer
    plain = {r["conv_id"]: r["text"] for r in render_conversations(df).collect()}
    assert {k: v["text"] for k, v in out.items()} == plain
    # every span slices to a full assistant line
    spans = out["c1"]["spans"]
    assert [out["c1"]["text"][s["start"]:s["end"]] for s in spans] == [
        "<assistant> hello there",
        "<assistant> more",
    ]
    assert out["c2"]["spans"] == [] and out["c3"]["spans"] == []


def test_render_with_loss_spans_custom_roles_and_dup_order(spark):
    from taco_toolbox_spark.operators.transcripts import render_with_loss_spans

    df = spark.createDataFrame(
        [("c", 0, "tool", "a"), ("c", 0, "tool", "b"), ("c", 1, "user", "x")],
        "conv_id string, turn_idx int, role string, text string",
    )
    r = render_with_loss_spans(df, mask_roles=("tool",)).collect()[0]
    # duplicate order keys sort deterministically by (order, line)
    assert r["text"] == "<tool> a\n<tool> b\n<user> x"
    assert [r["text"][s["start"]:s["end"]] for s in r["spans"]] == [
        "<tool> a",
        "<tool> b",
    ]
