"""Count-min sketch: over-count-only guarantee, merge exactness,
heavy-hitter candidate soundness, manifest state roundtrip."""

import pytest

from taco_toolbox_spark.checkpoint import (
    CheckpointManifest,
    merged_cms_from_manifest,
    record_cms_state,
)
from taco_toolbox_spark.sketches import (
    cms_counters,
    cms_heavy_hitters,
    cms_lookup,
    cms_merge,
    cms_total,
)

DEPTH, WIDTH = 4, 256


def _exact_counts(pdf, col):
    return pdf[col].value_counts().to_dict()


def test_cms_never_undercounts(corpus, clean_pdf):
    """Every estimate must be ≥ the exact count (the CMS guarantee the
    heavy-hitter filter's no-false-negative claim rests on)."""
    df = corpus.clean
    counters = cms_merge(cms_counters(df, ["role"], DEPTH, WIDTH))
    cand = df.select("role").distinct()
    est = {
        r["role"]: r["_est"]
        for r in cms_lookup(counters, cand, ["role"], DEPTH, WIDTH).collect()
    }
    exact = _exact_counts(clean_pdf, "role")
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert est[k] >= n


def test_cms_total_equals_rows(corpus, clean_pdf):
    counters = cms_merge(cms_counters(corpus.clean, ["role"], DEPTH, WIDTH))
    assert cms_total(counters) == len(clean_pdf)


def test_cms_merge_equals_whole_table(corpus):
    """Summing per-partition counters must give the IDENTICAL sketch as
    one whole-table pass (integer addition is exact)."""
    df = corpus.clean
    whole = {
        (r["_d"], r["_bucket"]): r["_cnt"]
        for r in cms_merge(cms_counters(df, ["role"], DEPTH, WIDTH)).collect()
    }
    merged = {
        (r["_d"], r["_bucket"]): r["_cnt"]
        for r in cms_merge(
            cms_counters(df, ["role"], DEPTH, WIDTH, part_col="part")
        ).collect()
    }
    assert whole == merged


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5"])
def test_heavy_hitters_exact_verified(corpus, clean_pdf, hash_fn):
    """After exact verification the result must equal the brute-force
    heavy-hitter set — sketch false positives removed, none missed."""
    frac = 0.05
    got = {
        (r["role"],): r["n"]
        for r in cms_heavy_hitters(
            corpus.clean, ["role"], frac, DEPTH, WIDTH, hash_fn=hash_fn
        ).collect()
    }
    import math

    floor = math.ceil(len(clean_pdf) * frac)
    want = {
        (k,): n for k, n in _exact_counts(clean_pdf, "role").items()
        if n >= floor
    }
    assert got == want
    assert got  # the corpus must actually exercise the filter


def test_heavy_hitters_estimate_mode(corpus, clean_pdf):
    """verify_exact=False returns sketch estimates: a superset of the true
    heavy hitters with _est ≥ exact count."""
    frac = 0.05
    rows = cms_heavy_hitters(
        corpus.clean, ["role"], frac, DEPTH, WIDTH, verify_exact=False
    ).collect()
    exact = _exact_counts(clean_pdf, "role")
    import math

    floor = math.ceil(len(clean_pdf) * frac)
    true_hh = {k for k, n in exact.items() if n >= floor}
    got = {r["role"] for r in rows}
    assert true_hh <= got
    for r in rows:
        assert r["_est"] >= exact.get(r["role"], 0)


def test_reserved_name_collision_raises(corpus):
    bad = corpus.clean.withColumn("_est", corpus.clean["turn_idx"])
    with pytest.raises(ValueError, match="_est"):
        cms_counters(bad, ["role"], DEPTH, WIDTH)


def test_bad_geometry_raises(corpus):
    with pytest.raises(ValueError, match="depth"):
        cms_counters(corpus.clean, ["role"], depth=0)
    with pytest.raises(ValueError, match="min_fraction"):
        cms_heavy_hitters(corpus.clean, ["role"], 0.0).collect()


def test_cms_state_manifest_roundtrip(tmp_path, corpus, clean_pdf, spark):
    """Persist per-partition counters, reload in a fresh manifest, merge —
    the merged sketch must estimate every role ≥ its exact count and its
    total must equal the table size (state survives the roundtrip
    losslessly)."""
    path = str(tmp_path / "m.json")
    m = CheckpointManifest.load_or_create(path, "r", "mem://c")
    record_cms_state(m, corpus.clean, ["role"], DEPTH, WIDTH)
    m.save()

    m2 = CheckpointManifest.load_or_create(path, "r", "mem://c")
    counters = merged_cms_from_manifest(spark, m2, ["role"])
    assert counters is not None
    assert cms_total(counters) == len(clean_pdf)
    est = {
        r["role"]: r["_est"]
        for r in cms_lookup(
            counters, corpus.clean.select("role").distinct(),
            ["role"], DEPTH, WIDTH,
        ).collect()
    }
    for k, n in _exact_counts(clean_pdf, "role").items():
        assert est[k] >= n
    assert merged_cms_from_manifest(spark, m2, ["no_such"]) is None
