"""Segment-level boilerplate removal (dedup/lines.py)."""

import pytest
from pyspark.sql import functions as F

from taco_toolbox_spark.dedup.lines import (
    common_segments,
    remove_common_segments,
    segments,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_line_mode_removes_repeated_lines(spark):
    """delim='\\n', block_words=1 is classic line-dedup: the footer shared
    by three docs disappears, unique lines survive in order."""
    df = _docs(
        spark,
        [
            (1, "alpha\nshared footer\nbeta"),
            (2, "gamma\nshared footer"),
            (3, "shared footer\ndelta"),
            (4, "unique only"),
        ],
    )
    out = remove_common_segments(
        df, min_docs=3, delim="\n", block_words=1
    ).orderBy("doc_id")
    got = [(r["doc_id"], r["text_clean"], r["n_removed"]) for r in out.collect()]
    assert got == [
        (1, "alpha\nbeta", 1),
        (2, "gamma", 1),
        (3, "delta", 1),
        (4, "unique only", 0),
    ]


def test_block_mode_and_alignment(spark):
    """6-word blocks are aligned: the same words shifted by one position
    segment differently and do NOT match (the documented block semantics,
    not a sliding window)."""
    common = "a b c d e f"
    df = _docs(
        spark,
        [
            (1, f"{common} tail words here x y z"),
            (2, f"{common} other ending w1 w2 w3"),
            (3, f"shift {common} w1 w2 w3 w4 w5"),  # misaligned: no hit
        ],
    )
    out = {
        r["doc_id"]: (r["n_removed"], r["text_clean"])
        for r in remove_common_segments(
            df, min_docs=2, block_words=6
        ).collect()
    }
    assert out[1] == (1, "tail words here x y z")
    assert out[2] == (1, "other ending w1 w2 w3")
    assert out[3][0] == 0


def test_all_blocks_removed_and_null_text(spark):
    """A document that is ALL boilerplate cleans to the empty string (it
    still exists — dropping it is the caller's policy); NULL text passes
    through NULL with n_removed = 0."""
    df = _docs(spark, [(1, "x y"), (2, "x y"), (3, None)])
    out = {
        r["doc_id"]: (r["text_clean"], r["n_removed"])
        for r in remove_common_segments(
            df, min_docs=2, block_words=2
        ).collect()
    }
    assert out[1] == ("", 1) and out[2] == ("", 1)
    assert out[3] == (None, 0)


def test_untouched_doc_keeps_verbatim_text(spark):
    """Docs with no boilerplate keep their text byte-for-byte (the NULL-map
    fast path, not a re-join of blocks — odd spacing is the witness)."""
    df = _docs(spark, [(1, "a  b   c"), (2, "p q r s"), (3, "p q r s t")])
    out = remove_common_segments(df, min_docs=2, block_words=2)
    assert out.filter("doc_id = 1").first()["text_clean"] == "a  b   c"


def test_common_segments_dictionary(spark):
    df = _docs(spark, [(1, "x y z w"), (2, "x y q r"), (3, "x y z w")])
    d = {
        r["segment"]: r["n_docs"]
        for r in common_segments(df, min_docs=2, block_words=2).collect()
    }
    assert d == {"x y": 3, "z w": 2}


def test_reserved_name_guard(spark):
    df = spark.createDataFrame(
        [(1, "a b", 0)], "doc_id int, text string, n_removed int"
    )
    with pytest.raises(ValueError, match="n_removed"):
        remove_common_segments(df)


def test_plan_python_free_and_pruned(spark, tmp_path):
    """The whole operator is JVM column expressions (no Python eval in the
    plan) and the frequency pass scans only (id, text)."""
    p = str(tmp_path / "docs")
    _docs(spark, [(i, f"w{i} w{i+1} common text here now") for i in range(6)]).write.parquet(p)
    df = spark.read.parquet(p)
    out = remove_common_segments(df, min_docs=2, block_words=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
