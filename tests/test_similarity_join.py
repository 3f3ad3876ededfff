"""similarity/join.py — batch top-k similarity join (exact anchor,
blocked map-side-top-k scale path, LSH candidate path)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from taco_toolbox_spark.similarity.ann import brute_force_topk
from taco_toolbox_spark.similarity.join import (
    cosine_topk_join,
    cosine_topk_join_blocked,
    lsh_topk_join,
)


@pytest.fixture(scope="module")
def qc(spark):
    """(queries, corpus, vecs): 200 gaussian vectors; ids % 40 == 0 are
    the query side (5 queries), the rest the corpus; one planted
    near-dup of query 0 at id 50."""
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(200, 16)).astype(np.float32)
    vecs[50] = vecs[0] + rng.normal(scale=0.01, size=16).astype(np.float32)
    rows = [(i, v.tolist()) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter("vec_id % 40 = 0")
    c = df.filter("vec_id % 40 <> 0")
    return q, c, vecs


def test_topk_join_matches_single_query_brute(qc):
    """The join restricted to one query equals brute_force_topk for that
    query — identical ids, identical rounded cos (the single-query
    operator IS the join's semantics)."""
    q, c, vecs = qc
    joined = cosine_topk_join(q, c, k=5).collect()
    by_q = {}
    for r in joined:
        by_q.setdefault(r["query_id"], []).append((r["vec_id"], r["cos"]))
    assert set(by_q) == {0, 40, 80, 120, 160}
    for qid in by_q:
        want = [
            (r["vec_id"], r["cos"])
            for r in brute_force_topk(
                c, vecs[qid].astype(np.float64).tolist(), k=5
            ).collect()
        ]
        assert by_q[qid] == want, qid
    # the planted near-dup is query 0's top hit
    assert by_q[0][0][0] == 50


def test_blocked_parity_is_exact(qc):
    """The mapInPandas scale path returns the EXACT anchor rows — same
    ids, bit-identical rounded cos — across a multi-partition corpus
    (several Arrow batches exercise the local-top-k + final-window
    merge)."""
    q, c, _ = qc
    anchor = {
        (r["query_id"], r["vec_id"], r["cos"])
        for r in cosine_topk_join(q, c, k=7).collect()
    }
    blocked = {
        (r["query_id"], r["vec_id"], r["cos"])
        for r in cosine_topk_join_blocked(q, c.repartition(6), k=7).collect()
    }
    assert blocked == anchor


def test_blocked_tiny_batches_force_merge(qc, spark):
    """With Arrow batches of 16 rows the local top-k emits many
    per-batch survivor groups; the final window must still reduce to the
    exact anchor answer."""
    q, c, _ = qc
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        anchor = {
            tuple(r) for r in cosine_topk_join(q, c, k=3).collect()
        }
        blocked = {
            tuple(r)
            for r in cosine_topk_join_blocked(q, c.repartition(2), k=3).collect()
        }
        assert blocked == anchor
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_tie_break_by_corpus_id(spark):
    """Duplicate corpus vectors produce rounded-cos ties; both paths must
    order them by ascending corpus id (the brute_force_topk rule)."""
    q = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    c = spark.createDataFrame(
        [(9, [1.0, 0.1]), (3, [1.0, 0.1]), (7, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    for fn in (cosine_topk_join, cosine_topk_join_blocked):
        got = [(r["vec_id"], r["cos"]) for r in fn(q, c, k=2).collect()]
        assert [i for i, _ in got] == [3, 9], fn.__name__
        assert got[0][1] == got[1][1]


def test_lsh_join_finds_planted_near_dup(qc):
    """LSH candidates must surface the genuinely-near neighbor (the LSH
    contract) and every returned pair must carry the exact rounded cos
    the anchor computes."""
    q, c, _ = qc
    got = lsh_topk_join(q, c, k=5)
    rows = got.collect()
    top0 = [r for r in rows if r["query_id"] == 0]
    assert top0 and top0[0]["vec_id"] == 50
    exact = {
        (r["query_id"], r["vec_id"]): r["cos"]
        for r in cosine_topk_join(q, c, k=200).collect()
    }
    for r in rows:
        assert r["cos"] == exact[(r["query_id"], r["vec_id"])]


def test_guards(qc, spark):
    q, c, _ = qc
    with pytest.raises(ValueError, match="k must be"):
        cosine_topk_join(q, c, k=0)
    with pytest.raises(ValueError, match="max_queries"):
        cosine_topk_join_blocked(q, c, k=1, max_queries=2)
    with pytest.raises(ValueError, match="collides"):
        cosine_topk_join(q, c.withColumn("query_id", F.lit(1)), k=1)
    with pytest.raises(ValueError, match="internal"):
        lsh_topk_join(q, c.withColumn("_sig", F.lit(1)), k=1)
    # empty query side: empty result with the contracted schema
    empty = cosine_topk_join_blocked(q.filter("vec_id < 0"), c, k=3)
    assert empty.count() == 0
    assert empty.columns == ["query_id", "vec_id", "cos"]
