"""Content digests + conversation-grain dedup (operators/digest.py)."""

import pytest
from pyspark.sql import functions as F

from taco_toolbox_spark.operators.digest import (
    content_digest,
    digest_mismatches,
    duplicate_conversation_groups,
    row_digest,
)


def _docs(spark):
    rows = [
        ("a", 1, "x"),
        ("a", 2, "y"),
        ("b", 1, "x"),
        ("b", 2, None),
    ]
    return spark.createDataFrame(rows, "g string, i int, t string")


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5"])
def test_digest_order_and_partitioning_invariant(spark, hash_fn):
    d = _docs(spark)
    base = content_digest(d, ["i", "t"], ["g"], hash_fn=hash_fn)
    # same rows, reversed order, different partitioning
    shuffled = content_digest(
        d.orderBy(F.desc("i")).repartition(7), ["i", "t"], ["g"],
        hash_fn=hash_fn,
    )
    assert sorted(map(tuple, base.collect())) == sorted(
        map(tuple, shuffled.collect())
    )


def test_digest_detects_drop_alter_duplicate(spark):
    d = _docs(spark)
    base = content_digest(d, ["i", "t"], ["g"])
    dropped = content_digest(d.filter("NOT (g='a' AND i=2)"), ["i", "t"], ["g"])
    altered = content_digest(
        d.withColumn("t", F.when(F.expr("g='b' AND i=1"), "X").otherwise(F.col("t"))),
        ["i", "t"], ["g"],
    )
    duplicated = content_digest(d.union(d.filter("g='a' AND i=1")), ["i", "t"], ["g"])
    for other, group in [(dropped, "a"), (altered, "b"), (duplicated, "a")]:
        mm = digest_mismatches(base, other, ["g"]).collect()
        assert [r["g"] for r in mm] == [group]
        assert mm[0]["status"] == "changed"


def test_digest_null_vs_empty_distinct(spark):
    # ('', NULL) must not collide with (NULL, '') or ('',''): sentinel
    # coalescing keeps positions distinguishable in md5 mode too
    a = spark.createDataFrame([("", None)], "x string, y string")
    b = spark.createDataFrame([(None, "")], "x string, y string")
    for fn in ("xxhash64", "md5"):
        ha = a.select(row_digest(["x", "y"], fn).alias("h")).first()["h"]
        hb = b.select(row_digest(["x", "y"], fn).alias("h")).first()["h"]
        assert ha != hb, fn


def test_digest_mismatch_missing_sides(spark):
    base = content_digest(_docs(spark), ["i", "t"], ["g"])
    only_a = content_digest(_docs(spark).filter("g='a'"), ["i", "t"], ["g"])
    mm = {r["g"]: r["status"] for r in digest_mismatches(base, only_a, ["g"]).collect()}
    assert mm == {"b": "missing_right"}
    mm2 = {r["g"]: r["status"] for r in digest_mismatches(only_a, base, ["g"]).collect()}
    assert mm2 == {"b": "missing_left"}


def test_digest_guards(spark):
    with pytest.raises(ValueError, match="content_cols"):
        content_digest(_docs(spark), [], ["g"])
    with pytest.raises(ValueError, match="hash_fn"):
        _docs(spark).select(row_digest(["g"], "sha9000"))


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5"])
def test_duplicate_conversations_found(spark, hash_fn):
    rows = []
    for conv, (roles, texts) in {
        "c1": ("ua", ("hi", "yo")),
        "c2": ("ua", ("hi", "yo")),     # dup of c1
        "c3": ("ua", ("hi", "NO")),     # same roles, different text
        "c4": ("au", ("hi", "yo")),     # same texts, roles swapped
        "c5": ("ua", ("hi", "yo")),     # dup of c1 again
    }.items():
        for i, (r, t) in enumerate(zip(roles, texts)):
            rows.append((conv, i, {"u": "user", "a": "assistant"}[r], t))
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    out = duplicate_conversation_groups(df, hash_fn=hash_fn).collect()
    assert len(out) == 1
    assert out[0]["conv_ids"] == ["c1", "c2", "c5"]
    assert out[0]["n_convs"] == 3
    assert out[0]["n_turns"] == 2


def test_duplicate_conversations_order_encoded(spark):
    # identical turn MULTISET but different order => different digests
    rows = [
        ("c1", 0, "user", "hi"), ("c1", 1, "assistant", "yo"),
        ("c2", 0, "assistant", "yo"), ("c2", 1, "user", "hi"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    assert duplicate_conversation_groups(df).count() == 0


def test_duplicate_conversations_on_corpus(spark, corpus):
    # planted duplicates: re-keyed copies of a deterministic slice must
    # come back paired with their originals, and nothing else may pair up
    src = corpus.clean.select("conv_id", "turn_idx", "role", "text")
    picked = src.filter(F.crc32(F.col("conv_id")) % 10 == 0)
    planted = picked.withColumn("conv_id", F.concat("conv_id", F.lit("~dup")))
    out = duplicate_conversation_groups(src.union(planted)).collect()
    n_picked = picked.select("conv_id").distinct().count()
    assert n_picked > 0 and len(out) == n_picked
    for r in out:
        assert r["n_convs"] == 2
        a, b = r["conv_ids"]
        assert b == a + "~dup"


def test_certify_rewrite_consolidation_roundtrip(spark, tmp_path):
    """The motivating flow: consolidate -> write -> read back -> certify."""
    from taco_toolbox_spark.operators.digest import certify_rewrite
    from taco_toolbox_spark.operators.partitioning import consolidate

    a = spark.createDataFrame([("a", 1, "x"), ("a", 2, "y")], "g string, i int, t string")
    b = spark.createDataFrame([("b", 1, "x"), ("b", 2, None)], "g string, i int, t string")
    merged = consolidate([a, b], ["fa", "fb"])
    out = str(tmp_path / "merged")
    merged.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    # per-group and global certification both come back clean
    assert certify_rewrite(merged, back, ["i", "t"], ["g"]).count() == 0
    assert certify_rewrite(merged, back, ["g", "i", "t"]).count() == 0
    # a lost row is caught globally (no groups to hide in)
    assert certify_rewrite(merged, back.limit(3), ["g", "i", "t"]).count() == 1


def test_digest_union_equals_full_rescan(spark):
    """The incremental-maintenance algebra: digest(A ∪ B ∪ C) ==
    digest_union(digest(A), digest(B), digest(C)), per group and
    globally — including groups present in only some inputs."""
    from taco_toolbox_spark.operators.digest import content_digest, digest_union

    a = spark.createDataFrame(
        [("a", 1, "x"), ("a", 2, "y"), ("b", 1, "x")], "g string, i int, t string"
    )
    b = spark.createDataFrame(
        [("a", 1, "x"), ("c", 9, None)], "g string, i int, t string"  # dup row + new group
    )
    c = spark.createDataFrame([("b", 2, "z")], "g string, i int, t string")
    full = a.unionAll(b).unionAll(c)
    for gcols in (["g"], []):
        want = sorted(
            map(tuple, content_digest(full, ["i", "t"], gcols or None).collect())
        )
        got = sorted(
            map(
                tuple,
                digest_union(
                    [content_digest(x, ["i", "t"], gcols or None) for x in (a, b, c)],
                    gcols or None,
                ).collect(),
            )
        )
        assert got == want

    with pytest.raises(ValueError, match="missing"):
        digest_union([a], ["g"])
    with pytest.raises(ValueError, match="non-empty"):
        digest_union([])


def test_digest_drilldown_pins_exact_rows(spark):
    """certify -> flagged groups -> exact row witnesses, with
    multiplicity: a duplicated row shows up once as unexpected, a dropped
    row once as missing, and untouched groups contribute nothing."""
    from taco_toolbox_spark.operators.digest import (
        certify_rewrite,
        digest_drilldown,
    )

    before = spark.createDataFrame(
        [("a", 1, "x"), ("a", 2, "y"), ("b", 1, "x"), ("c", 1, "z")],
        "g string, i int, t string",
    )
    # rewrite: drops (a,2,y), duplicates (b,1,x), alters (c,1,z)->(c,1,Z)
    after = spark.createDataFrame(
        [("a", 1, "x"), ("b", 1, "x"), ("b", 1, "x"), ("c", 1, "Z")],
        "g string, i int, t string",
    )
    mm = certify_rewrite(before, after, ["i", "t"], ["g"])
    assert sorted(r["g"] for r in mm.collect()) == ["a", "b", "c"]
    wit = digest_drilldown(before, after, ["i", "t"], ["g"], mm)
    got = sorted(map(tuple, wit.collect()))
    assert got == sorted(
        [
            ("a", 2, "y", "missing_after"),
            ("b", 1, "x", "unexpected_after"),
            ("c", 1, "z", "missing_after"),
            ("c", 1, "Z", "unexpected_after"),
        ]
    )


def test_certify_identical_empty_corpora(spark):
    """Two identical EMPTY corpora must certify clean: an empty group
    digests to (0, NULL, NULL) and the reconcile must be null-safe
    (regression: NULL==NULL flagged 'changed' before)."""
    from taco_toolbox_spark.operators.digest import certify_rewrite

    e1 = spark.createDataFrame([], "g string, i int, t string")
    e2 = spark.createDataFrame([], "g string, i int, t string")
    assert certify_rewrite(e1, e2, ["i", "t"]).count() == 0
    assert certify_rewrite(e1, e2, ["i", "t"], ["g"]).count() == 0
    # and empty-vs-nonempty still fails
    ne = spark.createDataFrame([("a", 1, "x")], "g string, i int, t string")
    assert certify_rewrite(e1, ne, ["i", "t"]).count() == 1


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5"])
def test_digest_over_array_columns(spark, hash_fn):
    """Embedding-style array columns digest like scalars in both
    families (xxhash64 hashes arrays natively; md5 casts to the
    deterministic string rendering), and element-level changes or
    null-vs-missing arrays change the digest."""
    from taco_toolbox_spark.operators.digest import content_digest

    base = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [1.0, None])],
        "id long, emb array<double>",
    )
    d0 = content_digest(base, ["id", "emb"], None, hash_fn=hash_fn).first()
    altered = spark.createDataFrame(
        [(1, [1.0, 2.5]), (2, None), (3, [1.0, None])],
        "id long, emb array<double>",
    )
    d1 = content_digest(altered, ["id", "emb"], None, hash_fn=hash_fn).first()
    assert d0["n_rows"] == d1["n_rows"] == 3
    assert (d0["xor_d"], d0["sum_d"]) != (d1["xor_d"], d1["sum_d"])
