"""Resumable runs: a second invocation must skip finished partitions."""

import pyspark.sql.functions as F

from taco_toolbox_spark.checkpoint import CheckpointManifest, run_resumable
from taco_toolbox_spark.checks import transcript_checks
from taco_toolbox_spark.engine import EngineConfig


def _checks():
    # drop drift/text-eq to keep the fixture light (no baseline needed)
    return [
        c
        for c in transcript_checks()
        if c.check_id not in ("text_len_drift", "text_equality")
    ]


def test_resume_skips_done(tmp_path, corpus):
    path = str(tmp_path / "manifest.json")
    m = CheckpointManifest.load_or_create(path, "run1", "mem://corpus")
    parts = [r["part"] for r in corpus.corrupted.select("part").distinct().collect()]

    # simulate a killed run: first half of the partitions already done
    done = sorted(parts)[: len(parts) // 2]
    first_half = corpus.corrupted.filter(F.col("part").isin(done))
    res1 = run_resumable(first_half, _checks(), m)
    assert res1 is not None
    m2 = CheckpointManifest.load_or_create(path, "run1", "mem://corpus")
    assert sorted(m2.finished_partitions()) == sorted(done)

    # resume over the full table: only pending partitions are validated
    res2 = run_resumable(corpus.corrupted, _checks(), m2)
    validated = {r["part"] for r in res2.verdicts.select("part").distinct().collect()}
    assert validated == set(parts) - set(done)

    # third run: nothing left
    m3 = CheckpointManifest.load_or_create(path, "run1", "mem://corpus")
    assert run_resumable(corpus.corrupted, _checks(), m3) is None
    assert sorted(m3.finished_partitions()) == sorted(parts)
    rec = m3.doc["partitions"][sorted(parts)[0]]
    assert rec["status"] == "done" and rec["n_rows"] > 0 and "verdicts" in rec


def test_manifest_input_mismatch(tmp_path):
    path = str(tmp_path / "m.json")
    m = CheckpointManifest.load_or_create(path, "r", "a://x")
    m.save()
    try:
        CheckpointManifest.load_or_create(path, "r", "b://y")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
