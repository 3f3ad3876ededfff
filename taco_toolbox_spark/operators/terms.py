"""Corpus term statistics: document frequency and TF-IDF-shaped
distinctive-term ranking.

The classic corpus-analysis pass a training-data pipeline runs before
filtering: which terms characterize each document against the corpus?
Standard TF-IDF scores tf * ln(N/df); ln() is not bit-reproducible across
engines, so the ORACLE-EXACT default here ranks by the integer score

    score = (tf * 1_000_000) DIV df

which is monotone in tf (df fixed) and anti-monotone in df (tf fixed) —
the same preference structure, pure BIGINT arithmetic, identical in every
engine. ``use_log_idf=True`` switches to the float tf*idf score
(idf = ln((N+1)/(df+1)) + 1, smoothed) for production ranking quality;
that path is pytest-covered, not oracle-hashed.

Distributed shape: tf is one hash agg keyed by (doc, term) with map-side
combine; df is one hash agg keyed by term over the tf frame (already one
row per (doc, term), so count(*) IS document frequency — no
countDistinct); the join back is term-keyed; the top-k is one window
keyed by doc. Nothing driver-side, no UDFs, every key well-distributed
(hot terms have high df hence LOW scores — skew and relevance
anti-correlate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def term_frequencies(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, term, tf): per-document lowercased whitespace-token counts.
    The input is spread to the session parallelism when under-partitioned
    (scale.spread_for_compute — single-row-group files scan as one split;
    a plan no-op at warehouse scale). Counts are exact integers, so the
    spread cannot change any value."""
    from ..scale import spread_for_compute

    return (
        spread_for_compute(df.select(F.col(id_col), F.col(text_col)))
        .select(
            F.col(id_col).alias("id"),
            F.explode(tokens(text_col)).alias("term"),
        )
        .select("id", F.lower(F.col("term")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def distinctive_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    use_log_idf: bool = False,
) -> DataFrame:
    """Top-k distinctive terms per document. Columns: id, term, tf, df,
    score, rank (1-based; ties broken by term ascending — deterministic).

    Integer-score mode (default) is exactly reproducible cross-engine; see
    module docstring for the DIV-score rationale."""
    tf = term_frequencies(df, text_col, id_col)
    # document frequency via a window COUNT over the term partition
    # instead of a groupBy + join back onto tf: the join form re-derived
    # the whole tf subtree (scan, token explode, (id, term) aggregation)
    # a second time. tf is one row per (id, term), so the partition count
    # IS the document frequency — identical values, one derivation and
    # one join fewer.
    scored = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    if use_log_idf:
        n_docs = df.select(F.countDistinct(id_col)).first()[0]
        idf = F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1.0
        scored = scored.withColumn("score", F.col("tf") * idf)
    else:
        scored = scored.withColumn(
            "score", F.expr("tf * 1000000 DIV df").cast("bigint")
        )
    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id", "term", "tf", "df", "score", "rank")
    )
