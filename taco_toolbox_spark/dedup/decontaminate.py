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


# ---------------------------------------------------------------------------
# semantic (embedding-cosine) decontamination — the n-gram family's
# semantic sibling: verbatim n-gram overlap misses paraphrased or
# re-templated benchmark items; embedding cosine catches them.
# ---------------------------------------------------------------------------


def semantic_contamination_matches(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "doc_id",
    bench_vec_col: str = "embedding",
    bench_id_col: str = "bench_id",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """(id_col, bench_id, cos) for every corpus×benchmark pair whose
    embedding cosine (round-4 — the similarity family's portable
    precision, HALF-UP on both engines) is ≥ ``threshold``.

    Distributed shape — same contract as the n-gram family: the benchmark
    side is tiny (eval suites are thousands of rows vs billions of corpus
    docs), so it is BROADCAST with its norms precomputed, and the corpus
    streams through ONE narrow pass: scan → per-row norm (computed once
    per corpus row, not once per pair) → broadcast nested-loop score →
    threshold filter. Cost is |corpus|·|benchmark| dot products with no
    corpus shuffle at all — the filter collapses the pair stream before
    anything exchanges. For benchmark sets too large to broadcast, band
    the two sides with ``similarity.join.lsh_topk_join``'s signatures
    instead (candidate equi-join, exact re-rank).

    The cosine is the similarity family's sequential-fold double
    arithmetic (``similarity.ann._dot/_norm``) — bit-identical to
    ``cosine_topk_join`` and reproducible by the DuckDB oracle."""
    from ..similarity.ann import _dot, _norm

    if bench_id_col == id_col:
        raise ValueError(
            f"bench_id_col must differ from id_col (both {id_col!r}) — "
            "alias the benchmark id before joining"
        )
    internal = {"_bv", "_bn", "_cv", "_cn", "cos"}
    if id_col in internal or bench_id_col in internal:
        raise ValueError(
            f"id_col/bench_id_col may not use internal names {sorted(internal)}"
        )
    clash = (internal | {bench_id_col}) & set(corpus.columns)
    if clash:
        raise ValueError(
            f"corpus columns collide with internal names: {sorted(clash)}"
        )
    # zero-norm vectors have no defined cosine: excluded on BOTH sides
    # rather than left to divide-by-zero (NULL under non-ANSI silently
    # drops the pair; stock ANSI Spark would kill the job outright)
    b = benchmark.select(
        F.col(bench_id_col).alias(bench_id_col),
        F.col(bench_vec_col).alias("_bv"),
        _norm(F.col(bench_vec_col)).alias("_bn"),
    ).filter(F.col("_bn") > 0)
    if broadcast_benchmark:
        b = F.broadcast(b)
    # |benchmark| dot folds per corpus row in the scan stage: spread an
    # under-partitioned corpus to the session parallelism (plan no-op at
    # warehouse scale; per-row scores are partitioning-independent)
    from ..scale import spread_for_compute

    c = spread_for_compute(corpus.select(F.col(id_col), F.col(vec_col))).select(
        F.col(id_col), F.col(vec_col).alias("_cv"),
        _norm(F.col(vec_col)).alias("_cn"),
    ).filter(F.col("_cn") > 0)
    cos = F.round(
        _dot(F.col("_cv"), F.col("_bv")) / (F.col("_cn") * F.col("_bn")), 4
    )
    return (
        c.crossJoin(b)
        .select(id_col, bench_id_col, cos.alias("cos"))
        .filter(F.col("cos") >= F.lit(float(threshold)))
    )


def semantic_contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.9,
    **kwargs,
) -> DataFrame:
    """Per-document semantic contamination summary: (id_col, n_bench_hits,
    max_cos) — how many benchmark items the document sits within
    ``threshold`` cosine of, and the closest one's score."""
    id_col = kwargs.get("id_col", "doc_id")
    m = semantic_contamination_matches(corpus, benchmark, threshold, **kwargs)
    return m.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bench_hits"),
        F.max("cos").alias("max_cos"),
    )


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.9,
    **kwargs,
) -> DataFrame:
    """The corpus minus every semantically contaminated document (left
    anti-join on the flagged id set). Schema untouched."""
    id_col = kwargs.get("id_col", "doc_id")
    flagged = (
        semantic_contamination_matches(corpus, benchmark, threshold, **kwargs)
        .select(id_col)
        .distinct()
    )
    return corpus.join(
        flagged.withColumnRenamed(id_col, "__sem_contam_id"),
        corpus[id_col] == F.col("__sem_contam_id"),
        "left_anti",
    )
