"""n-gram Jaccard near-duplicate detection.

Distributed shape (no cross join): explode distinct word n-gram shingles,
self-equi-join on the shingle (Catalyst shuffle-hash/sort-merge on the
shingle key — a well-distributed key), count shared shingles per pair, then
Jaccard = shared / (|A| + |B| - shared). The pair-generation join is the
only quadratic-ish step and it only pairs documents that actually share a
shingle. Very common shingles (stopword runs) explode pair counts at scale,
so ``max_shingle_freq`` drops shingles shared by more than that many docs —
the standard frequency-cap trick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle)."""
    toks = tokens(text_col)
    sh = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return (
        df.filter(F.size(toks) >= n)  # docs shorter than one shingle: no output
        .select(F.col(id_col).alias("id"), F.explode(F.array_distinct(sh)).alias("shingle"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
    max_shingle_freq: int | None = 1000,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b) with exact n-gram Jaccard ≥
    threshold. Columns: id_a, id_b, jaccard.

    ``max_shingle_freq`` defaults ON (1000): a shingle appearing in f docs
    emits C(f,2) pairs, so one stopword-run shingle shared by 10^6 docs
    would alone produce 5*10^11 pairs at corpus scale. Dropping shingles
    with f > 1000 bounds the worst single-shingle fan-out at ~500k pairs
    while leaving near-duplicate signal intact (near-dups share many RARE
    shingles). Pass None to disable for small corpora where exactness
    against an uncapped definition matters."""
    sh = shingles(df, text_col, id_col, n)
    return pairs_from_shingles(sh, threshold, max_shingle_freq)


def pairs_from_shingles(
    sh: DataFrame,
    threshold: float = 0.2,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Jaccard pairs from a prebuilt (id, shingle) frame — lets callers
    (MinHash verification) reuse one persisted shingle computation."""
    if max_shingle_freq is not None:
        freq = sh.groupBy("shingle").count().filter(F.col("count") <= max_shingle_freq)
        sh = sh.join(freq.select("shingle"), "shingle", "left_semi")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    shared = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        shared.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "na"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "nb"), "id_b")
        .withColumn(
            "jaccard",
            F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
