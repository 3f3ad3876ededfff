"""Bloom filter: no-false-negatives invariant, merge = whole-corpus build,
false-positive rate sanity, incremental-dedup prefilter parity, manifest
state roundtrip."""

import pytest
from pyspark.sql import functions as F

from taco_toolbox_spark.checkpoint import (
    CheckpointManifest,
    merged_bloom_from_manifest,
    record_bloom_state,
)
from taco_toolbox_spark.dedup.incremental import (
    exact_keys,
    incremental_dedup_verdicts,
)
from taco_toolbox_spark.sketches import (
    bloom_maybe_contains,
    bloom_merge,
    bloom_parameters,
    bloom_positions,
)

BITS, HASHES = 4096, 5


def test_bloom_parameters_standard_formulas():
    m, k = bloom_parameters(1000, 0.01)
    # canonical values: m ≈ 9585.06 → 9586, k ≈ 6.64 → 7
    assert m == 9586
    assert k == 7
    with pytest.raises(ValueError):
        bloom_parameters(0, 0.01)
    with pytest.raises(ValueError):
        bloom_parameters(10, 1.5)


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5"])
def test_bloom_never_false_negative(corpus, hash_fn):
    """Every inserted key must test True — the guarantee the incremental
    prefilter's 'definitely new' verdict rests on."""
    df = corpus.clean.select("conv_id").distinct()
    pos = bloom_positions(df, ["conv_id"], BITS, HASHES, hash_fn=hash_fn)
    tested = bloom_maybe_contains(
        pos, df, ["conv_id"], BITS, HASHES, hash_fn=hash_fn
    )
    assert tested.filter(~F.col("_maybe")).count() == 0


def test_bloom_fpp_near_design_rate(spark):
    """Non-members false-positive at roughly the design rate (loose 3x
    bound — the point is 'small', not the exact constant)."""
    n = 2000
    m, k = bloom_parameters(n, fpp=0.02)
    members = spark.range(n).select(
        F.concat(F.lit("in-"), F.col("id")).alias("key")
    )
    outsiders = spark.range(n, 5 * n).select(
        F.concat(F.lit("out-"), F.col("id")).alias("key")
    )
    pos = bloom_positions(members, ["key"], m, k)
    tested = bloom_maybe_contains(pos, outsiders, ["key"], m, k)
    fp = tested.filter(F.col("_maybe")).count()
    assert fp / (4 * n) < 0.06


def test_bloom_merge_equals_whole_table(corpus):
    """Union of per-partition position sets == one whole-table build."""
    df = corpus.clean.select("part", "conv_id")
    whole = {
        r["_pos"]
        for r in bloom_positions(df, ["conv_id"], BITS, HASHES).collect()
    }
    merged = {
        r["_pos"]
        for r in bloom_merge(
            bloom_positions(df, ["conv_id"], BITS, HASHES, part_col="part")
        ).collect()
    }
    assert whole == merged


def test_bloom_reserved_name_collision_raises(spark):
    df = spark.range(3).select(F.col("id"), F.lit(0).alias("_pos"))
    with pytest.raises(ValueError, match="_pos"):
        bloom_positions(df, ["id"], BITS, HASHES)
    with pytest.raises(ValueError, match="collide"):
        bloom_maybe_contains(
            spark.range(1).select(F.col("id").alias("_pos")),
            df,
            ["id"],
            BITS,
            HASHES,
        )


def test_bloom_bad_geometry_raises(spark):
    df = spark.range(3)
    with pytest.raises(ValueError, match="num_bits"):
        bloom_positions(df, ["id"], 1, 2)
    with pytest.raises(ValueError, match="num_bits"):
        bloom_positions(df, ["id"], 64, 0)


def test_bloom_state_manifest_roundtrip(tmp_path, corpus, spark):
    """Per-partition positions persisted to the manifest, merged back ==
    whole-corpus filter; the merged frame drives bloom_maybe_contains."""
    man = CheckpointManifest.load_or_create(
        str(tmp_path / "m.json"), "r1", "in"
    )
    df = corpus.clean
    record_bloom_state(man, df, ["conv_id"], num_bits=BITS, num_hashes=HASHES)
    man.save()
    man2 = CheckpointManifest.load_or_create(
        str(tmp_path / "m.json"), "r1", "in"
    )
    merged = merged_bloom_from_manifest(spark, man2, ["conv_id"])
    whole = {
        r["_pos"]
        for r in bloom_positions(df, ["conv_id"], BITS, HASHES).collect()
    }
    assert {r["_pos"] for r in merged.collect()} == whole
    keys = df.select("conv_id").distinct()
    tested = bloom_maybe_contains(merged, keys, ["conv_id"], BITS, HASHES)
    assert tested.filter(~F.col("_maybe")).count() == 0
    assert merged_bloom_from_manifest(spark, man2, ["no_such"]) is None


def test_bloom_state_geometry_mismatch_raises(tmp_path, corpus, spark):
    man = CheckpointManifest.load_or_create(
        str(tmp_path / "m.json"), "r1", "in"
    )
    parts = [r["part"] for r in corpus.clean.select("part").distinct().collect()]
    a = corpus.clean.filter(F.col("part") == parts[0])
    b = corpus.clean.filter(F.col("part") == parts[1])
    record_bloom_state(man, a, ["conv_id"], num_bits=BITS, num_hashes=HASHES)
    record_bloom_state(man, b, ["conv_id"], num_bits=BITS * 2, num_hashes=HASHES)
    with pytest.raises(ValueError, match="geometry mismatch"):
        merged_bloom_from_manifest(spark, man, ["conv_id"])


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


@pytest.fixture(scope="module")
def inc_corpus(spark):
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
            (1, "The QUICK brown   fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy cat today"),
            (3, "fresh document with entirely novel content and words"),
            (4, "fresh document with entirely novel content and words"),
        ],
    )
    return new, existing


@pytest.mark.parametrize("portable", [False, True])
def test_incremental_bloom_prefilter_parity(inc_corpus, portable):
    """Verdicts with the bloom prefilter must be IDENTICAL to verdicts
    without it (no false negatives ⇒ no 'maybe seen' row is lost)."""
    new, existing = inc_corpus
    hash_fn = "md5" if portable else "xxhash64"
    ex_keys = exact_keys(existing, portable_key=portable)
    bloom = bloom_positions(ex_keys, ["_k"], BITS, HASHES, hash_fn=hash_fn)
    base = {
        (r["id"], r["verdict"])
        for r in incremental_dedup_verdicts(
            new, existing, portable_key=portable
        ).collect()
    }
    with_bloom = {
        (r["id"], r["verdict"])
        for r in incremental_dedup_verdicts(
            new,
            existing,
            portable_key=portable,
            existing_bloom=bloom,
            bloom_geometry=(BITS, HASHES),
            bloom_hash_fn=hash_fn,
        ).collect()
    }
    assert with_bloom == base
    assert {v for _, v in base} == {"exact_dup", "near_dup", "keep"}


def test_incremental_bloom_requires_geometry(inc_corpus, spark):
    new, existing = inc_corpus
    bloom = spark.range(1).select(F.col("id").alias("_pos"))
    with pytest.raises(ValueError, match="bloom_geometry"):
        incremental_dedup_verdicts(new, existing, existing_bloom=bloom)


# ------------------------------------------------------- packed-word form


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5"])
def test_bloom_packed_words_match_relational_test(corpus, spark, hash_fn):
    """bloom_test_col over the packed literal words must agree with
    bloom_maybe_contains row-for-row — same filter, two realizations
    (broadcast join vs pure projection)."""
    from taco_toolbox_spark.sketches import bloom_pack_words, bloom_test_col

    members = corpus.clean.select("conv_id").distinct().limit(100)
    everyone = corpus.clean.select("conv_id").distinct()
    pos = bloom_positions(members, ["conv_id"], BITS, HASHES, hash_fn=hash_fn)
    words = bloom_pack_words(pos, BITS)
    assert len(words) == BITS // 64
    via_join = {
        r["conv_id"]: r["_maybe"]
        for r in bloom_maybe_contains(
            pos, everyone, ["conv_id"], BITS, HASHES, hash_fn=hash_fn
        ).collect()
    }
    via_col = {
        r["conv_id"]: r["m"]
        for r in everyone.select(
            "conv_id",
            bloom_test_col(["conv_id"], words, HASHES, hash_fn=hash_fn).alias("m"),
        ).collect()
    }
    assert via_col == via_join
    assert sum(via_join.values()) >= 100  # all members test True


def test_bloom_pack_words_validation(spark):
    from taco_toolbox_spark.sketches import bloom_pack_words

    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_pack_words([1], 100)
    with pytest.raises(ValueError, match="outside"):
        bloom_pack_words([64], 64)
    # bit 63 wraps into a signed long
    words = bloom_pack_words([63], 64)
    assert words == [-(1 << 63)]
