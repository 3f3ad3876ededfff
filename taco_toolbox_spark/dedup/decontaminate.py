"""Benchmark decontamination: flag corpus documents that share word
n-grams with an evaluation/benchmark set.

The reference has no decontamination operator; this belongs to the
beyond-reference LLM-training-data surface (GPT-3 appendix C / The Pile
style): a corpus document is *contaminated* if it shares at least
``min_overlap`` distinct word n-grams with any benchmark item, and a
decontaminated corpus drops every such document.

Distributed shape — designed for "100 TB corpus vs MB-scale eval suite":
the benchmark n-gram set is tiny relative to the corpus (eval suites are
thousands of items vs billions of documents), so it is **broadcast** and
the corpus side streams through one narrow pass: scan → per-doc distinct
shingles (array_distinct before explode — no shuffle, see
``ngram.shingles``) → broadcast hash join → partial/final count keyed by
(doc, bench). No corpus-side shuffle on the shingle key ever happens; the
only exchange is the final (doc_id, bench_id) aggregation, whose input is
already reduced to matching shingles only. Cost is linear in corpus size
and independent of corpus duplicate density.

If the benchmark outgrows broadcast size, pass ``broadcast_benchmark=
False`` to fall back to a shuffle equi-join on the shingle key (the same
well-distributed key the n-gram dedup family joins on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ngram import shingles


def contamination_matches(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
    n: int = 3,
    min_overlap: int = 1,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """(doc_id, bench_id, n_shared) for every corpus×benchmark pair sharing
    ≥ ``min_overlap`` distinct word ``n``-grams.

    ``n_shared`` counts DISTINCT shared shingles (both sides are per-doc
    distinct by construction, so a plain count over the join is exact)."""
    c_sh = shingles(corpus, text_col, id_col, n).withColumnRenamed("id", "doc_id")
    b_sh = shingles(benchmark, bench_text_col, bench_id_col, n).withColumnRenamed(
        "id", "bench_id"
    )
    if broadcast_benchmark:
        b_sh = F.broadcast(b_sh)
    return (
        c_sh.join(b_sh, "shingle")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_overlap)
    )


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
    n: int = 3,
    min_overlap: int = 1,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-document contamination summary: (doc_id, n_bench_hits,
    max_shared) — how many benchmark items the document collides with and
    the largest distinct-shingle overlap among them."""
    m = contamination_matches(
        corpus,
        benchmark,
        text_col,
        id_col,
        bench_text_col,
        bench_id_col,
        n,
        min_overlap,
        broadcast_benchmark,
    )
    return m.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bench_hits"),
        F.max("n_shared").alias("max_shared"),
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
    n: int = 3,
    min_overlap: int = 1,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """The corpus minus every contaminated document (left anti-join on the
    flagged id set). Schema is the input corpus schema, untouched."""
    flagged = contamination_matches(
        corpus,
        benchmark,
        text_col,
        id_col,
        bench_text_col,
        bench_id_col,
        n,
        min_overlap,
        broadcast_benchmark,
    ).select("doc_id").distinct()
    return corpus.join(
        flagged.withColumnRenamed("doc_id", "__contam_id"),
        corpus[id_col] == F.col("__contam_id"),
        "left_anti",
    )
