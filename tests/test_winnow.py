"""Winnowing fingerprints (dedup/winnow.py)."""

import hashlib

from pyspark.sql import functions as F

from taco_toolbox_spark.dedup.winnow import (
    winnow_fingerprints,
    winnow_overlap_pairs,
    winnow_selection,
)


def _h(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16)


def _ref_winnow(text: str, k: int = 3, w: int = 4) -> set[tuple[int, int]]:
    """Independent Python reference: leftmost-min winnowing."""
    words = text.split(" ")
    hs = [_h(" ".join(words[i : i + k])) for i in range(len(words) - k + 1)]
    if not hs:
        return set()
    out = set()
    n_windows = max(len(hs) - w + 1, 1)
    for j in range(n_windows):
        win = hs[j : j + w]
        m = min(win)
        out.add((j + win.index(m), m))
    return out


def test_matches_python_reference(spark):
    texts = [
        "a b c d e f g h i j k l m",
        "q r s t u v w x",
        "one two three",          # exactly k words -> 1 gram
        "one two",                # < k words -> empty
        "z z z z z z z z",        # all-equal grams: leftmost ties
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {
        (r["doc_id"], r["pos"], r["h"])
        for r in winnow_fingerprints(df, hash_fn="md5").collect()
    }
    want = {
        (i, p, h) for i, t in enumerate(texts) for (p, h) in _ref_winnow(t)
    }
    assert got == want and got


def test_hash_families_agree_on_pairs(spark):
    """The md5 (oracle-portable) and xxhash64 (library default) gram-hash
    families run the identical selection/join pipeline; on a corpus with
    planted shared runs they must produce the same near-dup pair set —
    the parity that lets the md5-mode oracle carry the default path."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, f"intro words {shared} tail one two"),
        (2, f"{shared} other ending entirely here"),
        (3, "unrelated content with no overlap at all"),
        (4, f"prefix {shared} and some more shared suffix text"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    md5_pairs = {
        (r["id_a"], r["id_b"])
        for r in winnow_overlap_pairs(df, min_shared=1, hash_fn="md5").collect()
    }
    xx_pairs = {
        (r["id_a"], r["id_b"])
        for r in winnow_overlap_pairs(df, min_shared=1).collect()
    }
    assert md5_pairs == xx_pairs and (1, 2) in xx_pairs

    import pytest

    with pytest.raises(ValueError):
        winnow_fingerprints(df, hash_fn="sha1").collect()


def test_null_and_empty_text(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "x")], "doc_id int, text string"
    )
    assert winnow_fingerprints(df).count() == 0


def test_shared_run_guarantee(spark):
    """Two documents sharing a run of >= w + k - 1 words must share at
    least one selected fingerprint (the winnowing guarantee)."""
    shared = "alpha beta gamma delta epsilon zeta"  # 6 words = w + k - 1
    df = spark.createDataFrame(
        [
            (1, f"p q r {shared} s t u"),
            (2, f"{shared} completely different tail here"),
            (3, "nothing in common with those at all"),
        ],
        "doc_id int, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in winnow_overlap_pairs(df, min_shared=1).collect()
    }
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_selection_density(spark):
    """Winnowing stores far fewer fingerprints than the full gram set —
    expected density ~2/(w+1); assert a loose upper bound on real data."""
    df = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(100)
    )
    n_grams = df.select(
        F.sum(F.greatest(F.size(F.split("text", " ")) - 2, F.lit(0)))
    ).first()[0]
    n_sel = winnow_fingerprints(df, k=3, w=4).count()
    assert 0 < n_sel < 0.6 * n_grams  # 2/(w+1)=0.4 expected


def test_plan_python_free(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id int, text string")
    plan = (
        winnow_fingerprints(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_overlap_pairs_capped(spark):
    """A hash selected by more docs than max_hash_freq is dropped before
    the self-join (boilerplate cap)."""
    boiler = "x y z x y z x y z"
    df = spark.createDataFrame(
        [(i, boiler) for i in range(5)], "doc_id int, text string"
    )
    assert winnow_overlap_pairs(df, min_shared=1, max_hash_freq=4).count() == 0
    assert winnow_overlap_pairs(df, min_shared=1, max_hash_freq=5).count() == 10


def test_winnow_tokenizes_like_the_other_dedup_paths(spark):
    """A shared verbatim run that differs only in whitespace (newline vs
    space, double spaces, leading/trailing) must still produce identical
    gram hashes — winnow uses the package tokenizer, not a literal
    single-space split (review finding)."""
    from taco_toolbox_spark.dedup.winnow import winnow_fingerprints

    run = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, run),
            (2, "  alpha beta\ngamma  delta\tepsilon zeta eta theta "),
        ],
        "doc_id long, text string",
    )
    fp = winnow_fingerprints(docs, "text", "doc_id", k=3, w=4)
    by_doc = {
        r["doc_id"]: frozenset(x["h"] for x in fp.filter(
            F.col("doc_id") == r["doc_id"]).collect())
        for r in docs.collect()
    }
    assert by_doc[1] == by_doc[2] and by_doc[1]
