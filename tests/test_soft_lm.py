"""dedup/soft.py (frequency-proportional soft dedup) and
operators/lm_score.py (corpus-bigram quality scoring)."""

import pytest
from pyspark.sql import functions as F

from taco_toolbox_spark.dedup.soft import soft_dedup, soft_dedup_verdict
from taco_toolbox_spark.operators.lm_score import bigram_frequency_score
from taco_toolbox_spark.operators.sampling import SAMPLE_BUCKETS, hash_bucket


@pytest.fixture(scope="module")
def dup_corpus(spark):
    """Clusters of sizes 1, 3, and 10 (identical normalized text)."""
    rows = (
        [(0, "unique zero text")]
        + [(10 + i, "tri cluster text") for i in range(3)]
        + [(100 + i, "deca  CLUSTER text") for i in range(10)]
    )
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_soft_dedup_verdict_matches_hash_rule(dup_corpus):
    """kept must equal the documented rule exactly: hash_bucket(id, seed)
    < floor(B * t / n) — recomputed independently per row; singletons
    always survive (threshold saturates at B)."""
    out = soft_dedup_verdict(dup_corpus, target_copies=1, seed=5)
    rows = out.withColumn(
        "b", hash_bucket(["doc_id"], seed=5)
    ).collect()
    for r in rows:
        thr = min(SAMPLE_BUCKETS, SAMPLE_BUCKETS // r["n_copies"])
        assert r["kept"] == (r["b"] < thr), r["doc_id"]
    n = {r["doc_id"]: r["n_copies"] for r in rows}
    assert n[0] == 1 and n[10] == 3 and n[100] == 10
    assert all(r["kept"] for r in rows if r["n_copies"] == 1)


def test_soft_dedup_target_copies_and_filter_form(dup_corpus):
    """target_copies=10 saturates the deca cluster (all kept); the
    filtered form returns exactly the verdict's kept rows with the input
    columns."""
    all_kept = soft_dedup_verdict(dup_corpus, target_copies=10, seed=5)
    assert all(r["kept"] for r in all_kept.collect())
    v = soft_dedup_verdict(dup_corpus, target_copies=1, seed=5)
    want = {r["doc_id"] for r in v.collect() if r["kept"]}
    got = soft_dedup(dup_corpus, target_copies=1, seed=5)
    assert got.columns == ["doc_id", "text"]
    assert {r["doc_id"] for r in got.collect()} == want


def test_soft_dedup_deterministic_across_partitioning(dup_corpus):
    a = sorted(
        tuple(r)
        for r in soft_dedup_verdict(dup_corpus.coalesce(1), seed=3).collect()
    )
    b = sorted(
        tuple(r)
        for r in soft_dedup_verdict(
            dup_corpus.repartition(7), seed=3
        ).collect()
    )
    assert a == b


def test_soft_dedup_custom_group_and_guards(dup_corpus, spark):
    """A coarser group key (text prefix) merges the clusters; guards
    reject bad target_copies and reserved-name collisions."""
    v = soft_dedup_verdict(
        dup_corpus, group_expr=F.substring("text", 1, 1), seed=0
    )
    # 'unique...'/'tri...' keep their own groups; 'deca...' groups by 'd'
    n = {r["doc_id"]: r["n_copies"] for r in v.collect()}
    assert n[100] == 10 and n[0] == 1
    with pytest.raises(ValueError, match="target_copies"):
        soft_dedup_verdict(dup_corpus, target_copies=0)
    with pytest.raises(ValueError, match="collide"):
        soft_dedup_verdict(dup_corpus.withColumn("kept", F.lit(True)))


def test_bigram_score_hand_computed(spark):
    """Corpus: 'a b a b', 'a b', 'x', 'c c c' → bigram corpus counts
    {'a b': 3, 'b a': 1, 'c c': 2}; per-doc sums verified by hand,
    rare_threshold=2; the 1-token doc surfaces with zeros."""
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "x"), (4, "c c c")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["sum_freq"], r["n_rare"])
        for r in bigram_frequency_score(df).collect()
    }
    assert got == {
        1: (3, 7, 1),  # 'a b'(3) + 'b a'(1) + 'a b'(3); rare: 'b a'
        2: (1, 3, 0),
        3: (0, 0, 0),
        4: (2, 4, 2),  # 'c c' twice, corpus freq 2 <= 2 -> both rare
    }


def test_bigram_score_partitioning_invariant_and_guards(spark):
    df = spark.createDataFrame(
        [(i, f"w{i % 3} common w{i % 5}") for i in range(60)],
        "doc_id long, text string",
    )
    a = sorted(tuple(r) for r in bigram_frequency_score(df.coalesce(1)).collect())
    b = sorted(
        tuple(r) for r in bigram_frequency_score(df.repartition(8)).collect()
    )
    assert a == b and len(a) == 60
    with pytest.raises(ValueError, match="rare_threshold"):
        bigram_frequency_score(df, rare_threshold=0)
    with pytest.raises(ValueError, match="collide"):
        bigram_frequency_score(df.withColumn("_bg", F.lit(1)))


def test_deterministic_shuffle_permutation_properties(spark):
    """(shard, pos) is a valid permutation: positions are 0..n_s-1 within
    each shard, the mapping is bit-identical across partitionings and
    hash families' own reruns, different seeds give different orders, and
    the order matches an independent sort of the same hash."""
    from taco_toolbox_spark.operators.shuffling import deterministic_shuffle

    df = spark.createDataFrame(
        [(f"d{i:03d}",) for i in range(200)], "doc_id string"
    )
    out = deterministic_shuffle(df, ["doc_id"], n_shards=4, seed=1)
    rows = out.collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(4))
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps))), s
    a = sorted(tuple(r) for r in rows)
    b = sorted(
        tuple(r)
        for r in deterministic_shuffle(
            df.repartition(7), ["doc_id"], n_shards=4, seed=1
        ).collect()
    )
    assert a == b
    c = sorted(
        tuple(r)
        for r in deterministic_shuffle(df, ["doc_id"], 4, seed=2).collect()
    )
    assert a != c  # a new seed is a new epoch order
    with pytest.raises(ValueError, match="n_shards"):
        deterministic_shuffle(df, ["doc_id"], 0)
    with pytest.raises(ValueError, match="collide"):
        deterministic_shuffle(df.withColumn("pos", F.lit(1)), ["doc_id"], 2)
