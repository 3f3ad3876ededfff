"""Engine exactness: for every check, the violation-row set must equal an
independently computed (pandas) expected set on the corrupted corpus —
the analog of the reference's negative-path validator tests
(/root/reference/tests/unit/tortilla/test_datamodel.py)."""

import pandas as pd
import pytest

from taco_toolbox_spark.checks import transcript_checks
from taco_toolbox_spark.engine import EngineConfig, run_validation, sample_violations
from taco_toolbox_spark.schema import ROLE_VOCAB, TOOL_VOCAB

CONV_RE = r"^conv_[a-z0-9]{8}$"


@pytest.fixture(scope="module")
def result(corpus):
    checks = transcript_checks(reference=corpus.clean)
    res = run_validation(
        corpus.corrupted, checks, EngineConfig(persist_violations=True),
        baseline=corpus.clean,
    )
    return res


@pytest.fixture(scope="module")
def viol_pdf(result):
    return result.violations.toPandas()


def keys_of(viol_pdf, check_id, with_turn=True):
    v = viol_pdf[viol_pdf.check_id == check_id]
    if with_turn:
        return set(zip(v.conv_id, v.turn_idx))
    return set(v.conv_id)


def test_unique_turn(viol_pdf, corrupted_pdf):
    sz = corrupted_pdf.groupby(["conv_id", "turn_idx"]).size()
    expected = set(sz[sz > 1].index)
    assert keys_of(viol_pdf, "unique_turn") == expected


def test_role_vocab(viol_pdf, corrupted_pdf):
    bad = corrupted_pdf[~corrupted_pdf.role.isin(ROLE_VOCAB)]
    assert keys_of(viol_pdf, "role_vocab") == set(zip(bad.conv_id, bad.turn_idx))


def test_tool_vocab(viol_pdf, corrupted_pdf):
    bad = corrupted_pdf[
        corrupted_pdf.tool.notna() & ~corrupted_pdf.tool.isin(TOOL_VOCAB)
    ]
    assert keys_of(viol_pdf, "tool_vocab") == set(zip(bad.conv_id, bad.turn_idx))


def test_tool_iff_role(viol_pdf, corrupted_pdf):
    bad = corrupted_pdf[
        (corrupted_pdf.role == "tool") != corrupted_pdf.tool.notna()
    ]
    assert keys_of(viol_pdf, "tool_iff_role") == set(zip(bad.conv_id, bad.turn_idx))


def test_conv_id_format(viol_pdf, corrupted_pdf):
    bad = corrupted_pdf[~corrupted_pdf.conv_id.str.match(CONV_RE)]
    assert keys_of(viol_pdf, "conv_id_format") == set(zip(bad.conv_id, bad.turn_idx))


def test_text_not_null(viol_pdf, corrupted_pdf):
    bad = corrupted_pdf[corrupted_pdf.text.isna()]
    assert keys_of(viol_pdf, "text_not_null") == set(zip(bad.conv_id, bad.turn_idx))


def test_ts_monotone(viol_pdf, corrupted_pdf):
    s = corrupted_pdf.sort_values(["conv_id", "turn_idx"], kind="stable")
    prev = s.groupby("conv_id")["ts"].shift()
    bad = s[prev > s["ts"]]
    assert keys_of(viol_pdf, "ts_monotone") == set(zip(bad.conv_id, bad.turn_idx))


def test_turn_contiguous(viol_pdf, corrupted_pdf):
    g = corrupted_pdf.groupby("conv_id")["turn_idx"]
    ok = (g.min() == 0) & (g.max() == g.count() - 1) & (g.nunique() == g.count())
    expected = set(ok[~ok].index)
    assert keys_of(viol_pdf, "turn_contiguous", with_turn=False) == expected


def test_text_equality(viol_pdf, corrupted_pdf, clean_pdf):
    m = corrupted_pdf.merge(
        clean_pdf[["conv_id", "turn_idx", "text"]].rename(columns={"text": "ref"}),
        on=["conv_id", "turn_idx"],
        how="left",
        indicator=True,
    )
    missing = m["_merge"] == "left_only"
    neq = ~missing & ~(
        (m.text.isna() & m.ref.isna()) | (m.text.notna() & m.ref.notna() & (m.text == m.ref))
    )
    bad = m[missing | neq]
    assert keys_of(viol_pdf, "text_equality") == set(zip(bad.conv_id, bad.turn_idx))


def test_drift_flags_only_drifted_partition(viol_pdf, corpus):
    flagged = set(viol_pdf[viol_pdf.check_id == "text_len_drift"].part)
    assert flagged == set(corpus.drifted_parts)


def test_manifest_coverage(viol_pdf, corpus):
    """Every injected violation surfaces in its mapped check (recall=1)."""
    kind_to_check = {
        "dup_turn": "unique_turn",
        "bad_role": "role_vocab",
        "bad_tool": "tool_vocab",
        "tool_on_chat": "tool_iff_role",
        "null_text": "text_not_null",
        "mutated_text": "text_equality",
        "ts_regress": "ts_monotone",
        "bad_conv": "conv_id_format",
        "gap_turn": "turn_contiguous",
    }
    manifest = corpus.manifest.toPandas()
    for kind, check in kind_to_check.items():
        got = keys_of(viol_pdf, check, with_turn=(check != "turn_contiguous"))
        rows = manifest[manifest.kind == kind]
        want = (
            set(zip(rows.conv_id, rows.turn_idx))
            if check != "turn_contiguous"
            else set(rows.conv_id)
        )
        assert want <= got, f"{kind} -> {check}: missing {want - got}"


def test_verdict_matrix_consistent(result, viol_pdf, corpus):
    verdicts = result.verdicts.toPandas()
    n_parts = corpus.corrupted.select("part").distinct().count()
    n_checks = verdicts.check_id.nunique()
    assert len(verdicts) == n_parts * n_checks  # full grid
    counted = (
        viol_pdf.groupby(["part", "check_id"]).size().rename("n").reset_index()
    )
    m = verdicts.merge(counted, on=["part", "check_id"], how="left").fillna({"n": 0})
    assert (m.n_violations == m.n).all()
    assert ((m.n_violations == 0) == m.passed).all()


def test_clean_corpus_passes(spark):
    # a drift-free clean corpus must pass the full battery on every partition
    from taco_toolbox_spark.datagen import generate_transcripts

    c = generate_transcripts(
        spark, n_convs=150, seed=9, hot_conv_every=0, inject_drift=False
    )
    checks = transcript_checks(reference=c.clean)
    res = run_validation(c.clean, checks, baseline=c.clean)
    bad = res.verdicts.filter("NOT passed").toPandas()
    assert len(bad) == 0, bad


def test_drift_survives_in_clean_partition(corpus):
    # the designated drift partition is a distribution anomaly, present in
    # clean data too — the engine must flag it even without row corruption
    checks = [c for c in transcript_checks() if c.check_id == "text_len_drift"]
    res = run_validation(corpus.clean, checks, baseline=corpus.clean)
    bad = res.verdicts.filter("NOT passed").toPandas()
    assert set(bad.part) == set(corpus.drifted_parts)


def test_sample_violations_cap(result):
    capped = sample_violations(result.violations, k=3).toPandas()
    sizes = capped.groupby(["part", "check_id"]).size()
    assert (sizes <= 3).all()


def test_violation_rows_carry_detail(viol_pdf):
    assert viol_pdf.detail.notna().all()
    assert (viol_pdf.detail.str.len() > 0).all()
