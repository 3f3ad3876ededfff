"""End-to-end contract of the rewrite-certification job (jobs/certify.py):
exit 0 + empty mismatches on a faithful rewrite, exit 1 + a written
mismatch report on a broken one."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jobs.certify import main as certify_main  # noqa: E402


@pytest.fixture(scope="module")
def corpus_pair(spark, tmp_path_factory):
    """A blessed corpus and a faithful rewrite of it: re-partitioned,
    re-ordered, written through a second parquet round-trip."""
    from taco_toolbox_spark.datagen import generate_transcripts

    d = tmp_path_factory.mktemp("certify")
    corpus = generate_transcripts(spark, n_convs=120, seed=5, violation_denom=200)
    before = str(d / "before")
    after = str(d / "after")
    corpus.corrupted.write.mode("overwrite").parquet(before)
    (
        spark.read.parquet(before)
        .orderBy("text")
        .repartition(7)
        .write.mode("overwrite")
        .parquet(after)
    )
    return before, after


def test_certify_faithful_rewrite(spark, corpus_pair, tmp_path):
    before, after = corpus_pair
    out = str(tmp_path / "run")
    rc = certify_main(
        [
            "--before", before,
            "--after", after,
            "--content-cols", "conv_id,turn_idx,role,text",
            "--group-cols", "part",
            "--output", out,
        ],
        stop_session=False,
    )
    assert rc == 0
    assert spark.read.parquet(os.path.join(out, "mismatches")).count() == 0
    doc = json.load(open(os.path.join(out, "summary.json")))
    assert doc["status"] == "certified" and doc["n_mismatches"] == 0


@pytest.mark.parametrize("hash_fn", ["xxhash64", "md5"])
def test_certify_broken_rewrite(spark, corpus_pair, tmp_path, hash_fn):
    before, after = corpus_pair
    broken = str(tmp_path / "broken")
    # drop one conversation: a loss no row-count-per-part gate at coarse
    # grain would localize, but the digest pins to the exact part
    df = spark.read.parquet(after)
    victim = df.select("conv_id").first()[0]
    df.filter(f"conv_id <> '{victim}'").write.mode("overwrite").parquet(broken)
    out = str(tmp_path / "run")
    rc = certify_main(
        [
            "--before", before,
            "--after", broken,
            "--content-cols", "conv_id,turn_idx,role,text",
            "--group-cols", "part",
            "--hash", hash_fn,
            "--output", out,
            "--drilldown",
        ],
        stop_session=False,
    )
    assert rc == 1
    mm = spark.read.parquet(os.path.join(out, "mismatches")).collect()
    assert len(mm) >= 1
    assert all(r["status"] == "changed" for r in mm)
    doc = json.load(open(os.path.join(out, "summary.json")))
    assert doc["status"] == "mismatch" and doc["n_mismatches"] == len(mm)
    # --drilldown pins the loss to the exact rows: every witness row is
    # the dropped conversation, on the missing side
    wit = spark.read.parquet(os.path.join(out, "witnesses")).collect()
    assert wit and all(
        r["conv_id"] == victim and r["side"] == "missing_after" for r in wit
    )


def test_certify_missing_column_is_an_arg_error(spark, corpus_pair):
    before, after = corpus_pair
    with pytest.raises(SystemExit) as e:
        certify_main(
            [
                "--before", before,
                "--after", after,
                "--content-cols", "conv_id,no_such_col",
            ],
            stop_session=False,
        )
    assert "no_such_col" in str(e.value)


def test_certify_against_manifest_without_rescanning_before(
    spark, corpus_pair, tmp_path
):
    """Manifest mode: a validation run records digests; a later rewrite
    certifies against the manifest alone — the blessed corpus path is
    never read. Recorded params are authoritative; conflicts refuse."""
    from taco_toolbox_spark.checkpoint import CheckpointManifest
    from taco_toolbox_spark.checkpoint import record_digest_state

    before, after = corpus_pair
    mpath = str(tmp_path / "manifest.json")
    m = CheckpointManifest.load_or_create(mpath, "r", before)
    record_digest_state(
        m, spark.read.parquet(before), ["conv_id", "turn_idx", "role", "text"]
    )
    m.save()

    out = str(tmp_path / "run")
    rc = certify_main(
        ["--before-manifest", mpath, "--after", after, "--output", out],
        stop_session=False,
    )
    assert rc == 0
    doc = json.load(open(os.path.join(out, "summary.json")))
    assert doc["status"] == "certified" and doc["before_is_manifest"]
    assert doc["content_cols"] == ["conv_id", "turn_idx", "role", "text"]

    # a truncated rewrite is caught by the stored digests
    broken = str(tmp_path / "broken")
    spark.read.parquet(after).filter("turn_idx < 9").write.mode(
        "overwrite"
    ).parquet(broken)
    rc = certify_main(
        ["--before-manifest", mpath, "--after", broken],
        stop_session=False,
    )
    assert rc == 1

    # conflicting --content-cols refuse before any Spark work
    with pytest.raises(SystemExit, match="conflicts"):
        certify_main(
            ["--before-manifest", mpath, "--after", after,
             "--content-cols", "conv_id,text"],
            stop_session=False,
        )
    # drilldown needs rows, not digests
    with pytest.raises(SystemExit, match="manifest mode"):
        certify_main(
            ["--before-manifest", mpath, "--after", after,
             "--output", out, "--drilldown"],
            stop_session=False,
        )
