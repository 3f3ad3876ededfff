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
