"""Streaming validation smoke: the same RowChecks over readStream."""

import pyspark.sql.functions as F

from taco_toolbox_spark.checks import transcript_checks
from taco_toolbox_spark.checks.base import RowCheck
from taco_toolbox_spark.streaming.validate_stream import run_memory_smoke


def test_stream_matches_batch(tmp_path, corpus, corrupted_pdf):
    path = str(tmp_path / "stream_in")
    corpus.corrupted.drop("part").write.mode("overwrite").parquet(path)
    checks = [c for c in transcript_checks() if isinstance(c, RowCheck)]

    out = run_memory_smoke(
        corpus.corrupted.sparkSession, path, checks, query_name="t_stream"
    ).toPandas()

    # total violations per check must equal the batch row-pass counts
    batch_counts = {}
    import taco_toolbox_spark.schema as S

    batch_counts["role_vocab"] = int((~corrupted_pdf.role.isin(S.ROLE_VOCAB)).sum())
    batch_counts["text_not_null"] = int(corrupted_pdf.text.isna().sum())
    got = out.groupby("check_id").n_violations.sum()
    for check_id, want in batch_counts.items():
        assert got.get(check_id, 0) == want, check_id
    # windowed: every row fits a window; window bounds are 1h-aligned
    assert (out.window_end > out.window_start).all()


def test_stateful_ordering_matches_batch(tmp_path, corpus, corrupted_pdf):
    """The stateful stream check must find exactly the batch lag-window
    regressions (each conversation lives in one part file here, so
    micro-batch boundaries don't split conversations)."""
    from taco_toolbox_spark.streaming.validate_stream import run_ordering_smoke

    path = str(tmp_path / "ord_in")
    corpus.corrupted.write.mode("overwrite").parquet(path)

    out = run_ordering_smoke(corpus.corrupted.sparkSession, path).toPandas()
    got = set(zip(out.conv_id, out.turn_idx))

    s = corrupted_pdf.sort_values(["conv_id", "turn_idx"], kind="stable")
    prev = s.groupby("conv_id")["ts"].shift()
    bad = s[prev > s["ts"]]
    want = set(zip(bad.conv_id, bad.turn_idx))
    assert got == want and len(want) > 0
