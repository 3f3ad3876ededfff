import pyspark.sql.functions as F
import pytest

from taco_toolbox_spark.functions.text import (
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    quality_features,
    rolling_fingerprint,
    token_count,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "The cat and the dog sat in the garden."),
        (1, "Der Hund und die Katze sind nicht im Haus."),
        (2, "  The   cat and the dog sat in the garden.  "),
        (3, "xyzzy plugh"),
        (4, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_counts(docs):
    out = docs.filter("doc_id = 0").select(
        token_count("text").alias("n"), bpe_ish_token_count("text").alias("b")
    ).first()
    assert out["n"] == 9
    assert out["b"] == 10  # 9 words + trailing period


def test_quality_features(docs):
    q = docs.filter("doc_id = 0").select(quality_features("text").alias("q")).first()["q"]
    assert q["n_chars"] == 38
    assert q["n_tokens"] == 9
    assert q["punct_ratio"] == pytest.approx(1 / 38)
    assert q["upper_ratio"] == pytest.approx(1 / 38)
    # set-based: distinct stopwords present {the, and, in} over 9 tokens
    assert q["stopword_ratio"] == pytest.approx(3 / 9)


def test_fingerprint_normalizes(docs):
    fps = dict(
        docs.filter("doc_id in (0, 2)")
        .select("doc_id", fingerprint("text").alias("fp"))
        .collect()
    )
    assert fps[0] == fps[2]  # case/whitespace-insensitive... same lowercase


def test_lang_id(docs):
    out = dict(
        docs.filter("text is not null")
        .select("doc_id", lang_id(F.col("text")).alias("lang"))
        .collect()
    )
    assert out[0] == "en" and out[1] == "de" and out[3] == "und"


def test_rolling_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "c b a"), (2, "a b c")], "doc_id long, text string"
    )
    out = dict(
        df.select("doc_id", rolling_fingerprint(F.col("text")).alias("h")).collect()
    )
    assert out[0] == out[2]
    assert out[0] != out[1]  # order matters (unlike a set fingerprint)


def test_repetition_features_hand_computed(spark):
    """Every metric against hand-computed values on crafted docs:
    duplicated lines, a dominant bigram, repeated trigrams, and the
    degenerate all-same-token text where overlap-counting legitimately
    exceeds 1.0."""
    from taco_toolbox_spark.functions.text import repetition_features

    rows = [
        # lines: ["a b a b", "x", "x"] -> 3 lines, 2 distinct;
        # dup line instances: both "x" rows = 2 chars of 9 line chars.
        # tokens [a b a b x x]: bigrams {"a b":2,"b a":1,"b x":1,"x x":1}
        # top = "a b" (2 occ x 3 chars = 6) over n_chars=11;
        # trigrams all distinct -> 0.
        (0, "a b a b\nx\nx"),
        # 4 identical tokens, n_chars=7: bigram "t t" 3x3=9/7 (>1),
        # trigram "t t t" 2x5=10/7 (>1) -- documented overlap behavior
        (1, "t t t t"),
        # single token: no grams, one line, all zeros
        (2, "hello"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", repetition_features("text").alias("rf")
        ).select("doc_id", "rf.*").collect()
    }
    r0 = out[0]
    assert r0["n_lines"] == 3
    assert r0["dup_line_frac"] == pytest.approx(1 / 3)
    assert r0["dup_line_char_frac"] == pytest.approx(2 / 9)
    assert r0["top_bigram_frac"] == pytest.approx(6 / 11)
    assert r0["dup_trigram_frac"] == 0.0
    r1 = out[1]
    assert r1["n_lines"] == 1
    assert r1["dup_line_frac"] == 0.0
    assert r1["top_bigram_frac"] == pytest.approx(9 / 7)
    assert r1["dup_trigram_frac"] == pytest.approx(10 / 7)
    r2 = out[2]
    assert (
        r2["n_lines"],
        r2["dup_line_frac"],
        r2["dup_line_char_frac"],
        r2["top_bigram_frac"],
        r2["dup_trigram_frac"],
    ) == (1, 0.0, 0.0, 0.0, 0.0)


def test_repetition_features_plan_is_python_free(spark):
    """The whole struct stays JVM-side: no BatchEvalPython / ArrowEval
    in the plan (per-row array higher-order functions only)."""
    from taco_toolbox_spark.functions.text import repetition_features

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = df.select(
        repetition_features("text").alias("rf")
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEval" not in plan


def test_pii_counts_and_redaction(spark):
    from taco_toolbox_spark.functions.pii import pii_counts, redact_pii

    rows = [
        (0, "mail me at jane.doe+spam@sub.example.co.uk or bob@x.io"),
        (1, "server 192.168.1.254 talked to 10.0.0.1 on port 443"),
        (2, "ssn 123-45-6789 phone +44-207-946-0958"),
        (3, "no pii here, just 42 and v1.2 and a@b"),  # a@b: TLD too short
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: (r["p"]["email"], r["p"]["ipv4"], r["p"]["ssn"], r["p"]["phone"])
        for r in df.select("id", pii_counts("text").alias("p")).collect()
    }
    assert got[0] == (2, 0, 0, 0)
    assert got[1] == (0, 2, 0, 0)
    assert got[2] == (0, 0, 1, 1)
    assert got[3] == (0, 0, 0, 0)
    assert got[4] == (None, None, None, None)  # null text -> null counts

    red = {
        r["id"]: r["r"]
        for r in df.select("id", redact_pii("text").alias("r")).collect()
    }
    assert red[0] == "mail me at [email] or [email]"
    assert red[1] == "server [ipv4] talked to [ipv4] on port 443"
    assert red[2] == "ssn [ssn] phone [phone]"
    assert red[3] == rows[3][1]  # untouched

    # kind subset + custom token
    only_ip = {
        r["id"]: r["r"]
        for r in df.select(
            "id", redact_pii("text", kinds=["ipv4"], token="<PII>").alias("r")
        ).collect()
    }
    assert only_ip[2] == rows[2][1]  # ssn/phone untouched when only ipv4 asked
    assert only_ip[1] == "server <PII> talked to <PII> on port 443"


def test_pii_unknown_kind_raises(spark):
    import pytest as _pytest

    from taco_toolbox_spark.functions.pii import pii_count

    with _pytest.raises(ValueError, match="unknown PII kind"):
        pii_count("text", "iban")
