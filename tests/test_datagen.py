"""Generator determinism + corpus invariants (reference analog: seeded
golden fixtures, /root/reference/tests/fixtures/regenerate.py)."""

import pyspark.sql.functions as F

from taco_toolbox_spark.datagen import ROW_KINDS, generate_transcripts


def test_deterministic(spark):
    a = generate_transcripts(spark, n_convs=50, seed=7, hot_conv_every=0)
    b = generate_transcripts(spark, n_convs=50, seed=7, hot_conv_every=0)
    ha = a.corrupted.select(F.sum(F.xxhash64(*a.corrupted.columns))).first()[0]
    hb = b.corrupted.select(F.sum(F.xxhash64(*b.corrupted.columns))).first()[0]
    assert ha == hb
    assert a.corrupted.count() == b.corrupted.count()


def test_seed_changes_data(spark):
    a = generate_transcripts(spark, n_convs=50, seed=7, hot_conv_every=0)
    b = generate_transcripts(spark, n_convs=50, seed=8, hot_conv_every=0)
    ha = a.clean.select(F.sum(F.xxhash64("conv_id"))).first()[0]
    hb = b.clean.select(F.sum(F.xxhash64("conv_id"))).first()[0]
    assert ha != hb


def test_all_kinds_injected(corpus):
    kinds = {r["kind"] for r in corpus.manifest.select("kind").distinct().collect()}
    assert set(ROW_KINDS) | {"bad_conv"} == kinds


def test_clean_is_clean(clean_pdf):
    g = clean_pdf.groupby("conv_id")["turn_idx"]
    assert (g.min() == 0).all() and (g.nunique() == g.count()).all()
    assert clean_pdf["text"].notna().all()
    assert set(clean_pdf["role"]) <= {"system", "user", "assistant", "tool"}
    # ts monotone per conversation
    s = clean_pdf.sort_values(["conv_id", "turn_idx"])
    prev = s.groupby("conv_id")["ts"].shift()
    assert not (prev > s["ts"]).any()


def test_corrupted_has_dups_and_hot_convs(corrupted_pdf):
    dup = corrupted_pdf.groupby(["conv_id", "turn_idx"]).size()
    assert (dup > 1).any()
    lengths = corrupted_pdf.groupby("conv_id").size()
    assert lengths.max() >= 200 and lengths.median() < 20  # heavy tail
