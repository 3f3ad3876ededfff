"""Round-5 additions: substring-run dedup, incremental corpus-update dedup,
distinctive-term ranking."""

import pytest
from pyspark.sql import functions as F

from taco_toolbox_spark.dedup.incremental import (
    apply_incremental_dedup,
    incremental_dedup_verdicts,
)
from taco_toolbox_spark.dedup.substring import (
    positional_shingles,
    substring_run_pairs,
)
from taco_toolbox_spark.operators.terms import distinctive_terms, term_frequencies


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- substring


def test_positional_shingles_keep_repeats(spark):
    d = _docs(spark, [(1, "a b a b a b")])
    got = {
        (r["pos"], r["shingle"])
        for r in positional_shingles(d, "text", "doc_id", 2).collect()
    }
    # every occurrence with its position — repeats NOT collapsed
    assert got == {(1, "a b"), (2, "b a"), (3, "a b"), (4, "b a"), (5, "a b")}


def test_substring_run_finds_shared_paragraph_jaccard_misses(spark):
    # two long docs sharing ONE verbatim 8-token paragraph: Jaccard over
    # 3-gram sets is tiny (6 shared of ~60), but the run is unmistakable —
    # the exact contamination shape this operator exists for
    para = "pack my box with five dozen liquor jugs"
    fill_a = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(10))
    fill_b = " ".join(f"delta{i} epsil{i} zeta{i}" for i in range(10))
    d = _docs(
        spark,
        [(1, f"{fill_a} {para} {fill_a}"), (2, f"{fill_b} {para} {fill_b}")],
    )
    rows = substring_run_pairs(
        d, "text", "doc_id", n=3, min_tokens=8, max_shingle_freq=None
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["max_run_tokens"] == 8 and r["n_runs"] == 1


def test_substring_run_threshold_and_multiple_runs(spark):
    p1 = "one two three four five"
    p2 = "six seven eight nine ten"
    d = _docs(
        spark,
        [
            (1, f"{p1} xa xb xc {p2} xd xe"),
            (2, f"ya yb {p1} yc yd {p2}"),
        ],
    )
    rows = substring_run_pairs(
        d, "text", "doc_id", n=3, min_tokens=5, max_shingle_freq=None
    ).collect()
    assert len(rows) == 1 and rows[0]["n_runs"] == 2
    assert rows[0]["max_run_tokens"] == 5
    # raising the bar above both runs: nothing qualifies
    assert (
        substring_run_pairs(
            d, "text", "doc_id", n=3, min_tokens=6, max_shingle_freq=None
        ).count()
        == 0
    )


def test_substring_run_frequency_cap_splits_runs(spark):
    # a 6-token shared run; its middle shingle also occurs in many other
    # docs, so a cap of 3 drops it and the reported run shortens —
    # conservative (under-reports), never overstates
    run = "u1 u2 hot1 hot2 hot3 u3"
    others = [(10 + i, f"f{i} g{i} hot1 hot2 hot3 h{i} k{i}") for i in range(5)]
    d = _docs(spark, [(1, f"aa bb {run}"), (2, f"cc dd ee {run}")] + others)
    exact = substring_run_pairs(
        d, "text", "doc_id", n=3, min_tokens=6, max_shingle_freq=None
    ).filter("id_a = 1 and id_b = 2")
    assert exact.first()["max_run_tokens"] == 6
    capped = substring_run_pairs(
        d, "text", "doc_id", n=3, min_tokens=6, max_shingle_freq=3
    ).filter("id_a = 1 and id_b = 2")
    assert capped.count() == 0  # run split below threshold: dropped, not inflated


def test_substring_run_min_tokens_validation(spark):
    d = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        substring_run_pairs(d, "text", "doc_id", n=3, min_tokens=2)


# -------------------------------------------------------------- incremental


@pytest.fixture(scope="module")
def corpus_split(spark):
    existing = _docs(
        spark,
        [
            (100, "the quick brown fox jumps over the lazy dog today"),
            (101, "completely unrelated text about distributed query engines"),
        ],
    )
    new = _docs(
        spark,
        [
            (1, "The QUICK brown   fox jumps over the lazy dog today"),  # exact (norm) of 100
            (2, "the quick brown fox jumps over the lazy cat today"),  # near of 100
            (3, "fresh document with entirely novel content and words"),
            (4, "fresh document with entirely novel content and words"),  # batch dup of 3
        ],
    )
    return new, existing


def test_incremental_verdicts(corpus_split):
    new, existing = corpus_split
    v = dict(
        (r["id"], r["verdict"])
        for r in incremental_dedup_verdicts(
            new, existing, n=3, threshold=0.3
        ).collect()
    )
    assert v == {1: "exact_dup", 2: "near_dup", 3: "keep", 4: "exact_dup"}


def test_incremental_portable_key_parity(corpus_split):
    new, existing = corpus_split
    a = incremental_dedup_verdicts(new, existing, n=3, threshold=0.3)
    b = incremental_dedup_verdicts(
        new, existing, n=3, threshold=0.3, portable_key=True
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_apply_incremental_dedup_keeps_only_keep(corpus_split):
    new, existing = corpus_split
    kept = apply_incremental_dedup(new, existing, n=3, threshold=0.3)
    assert [r["doc_id"] for r in kept.collect()] == [3]
    assert kept.columns == new.columns


def test_incremental_exact_beats_near(spark):
    # a doc that is BOTH an exact and a near duplicate reports exact_dup
    ex = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta")])
    new = _docs(spark, [(1, "alpha beta gamma delta epsilon zeta")])
    v = incremental_dedup_verdicts(new, ex, n=3, threshold=0.1).collect()
    assert v[0]["verdict"] == "exact_dup"


# -------------------------------------------------------------------- terms


def test_term_frequencies_lowercase_counts(spark):
    d = _docs(spark, [(1, "Apple apple banana"), (2, "banana")])
    got = {(r["id"], r["term"]): r["tf"] for r in term_frequencies(d, "text", "doc_id").collect()}
    assert got == {(1, "apple"): 2, (1, "banana"): 1, (2, "banana"): 1}


def test_distinctive_terms_ranking(spark):
    # 'rare' appears twice in doc 1 only; 'common' is everywhere — the
    # integer score must rank rare above common despite equal tf
    d = _docs(
        spark,
        [
            (1, "rare rare common filler1"),
            (2, "common other filler2"),
            (3, "common more filler3"),
        ],
    )
    top = distinctive_terms(d, "text", "doc_id", k=2).filter("id = 1").collect()
    assert [r["term"] for r in sorted(top, key=lambda r: r["rank"])][0] == "rare"
    r0 = [r for r in top if r["term"] == "rare"][0]
    assert r0["tf"] == 2 and r0["df"] == 1 and r0["score"] == 2_000_000


def test_distinctive_terms_deterministic_ties(spark):
    # equal score -> term-ascending tiebreak, stable across runs
    d = _docs(spark, [(1, "zz aa mm")])
    rows = distinctive_terms(d, "text", "doc_id", k=3).collect()
    assert [r["term"] for r in sorted(rows, key=lambda r: r["rank"])] == [
        "aa",
        "mm",
        "zz",
    ]


def test_distinctive_terms_log_idf_mode(spark):
    d = _docs(spark, [(1, "rare rare common"), (2, "common x"), (3, "common y")])
    rows = distinctive_terms(d, "text", "doc_id", k=1, use_log_idf=True).filter(
        "id = 1"
    ).collect()
    assert rows[0]["term"] == "rare" and rows[0]["score"] > 0
