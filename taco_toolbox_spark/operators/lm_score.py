"""Corpus-bigram frequency scoring — an LM-free stand-in for the
perplexity quality filter.

Production pipelines score documents with a small language model and
drop the high-perplexity tail (the CCNet recipe). The distribution-
friendly core of that idea needs no model at all: a document whose
bigrams are RARE IN THE CORPUS ITSELF is exactly the document a corpus-
trained LM would find surprising — OCR noise, wrong-language fragments,
markup soup. This operator computes, per document, exact integer
statistics of its bigrams' corpus frequencies; callers threshold on
``n_rare / n_bigrams`` or ``sum_freq / n_bigrams`` (kept as integers
here so the whole operator is engine-exact — a log-probability variant
would trade oracle-exactness for scale-invariance without changing the
plan shape).

Scale shape (two shuffle keys, both well-distributed):
  1. bigram explode is a pure narrow map (scan → project → explode) —
     frequency-weighted, NOT distinct: a doc repeating one bigram 100x
     should weight it 100x;
  2. corpus counts: ``groupBy(bigram).count()`` with partial (map-side)
     combine — the stopword-pair mega-bigram costs each map task one
     combiner row, never one reducer 10^9 rows;
  3. count join back on the bigram key (AQE skew-splits hot bigrams),
     then one doc-keyed aggregation.
Docs with < 2 tokens surface with zero counts via the final left join —
a quality filter must SEE empty docs, not lose them.

Beyond-reference training-pipeline operator (SURVEY.md §6); tokenization
matches dedup/ngram.py's shingle convention (whitespace split) so the
DuckDB oracle shares the corpus's single-space text contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def bigram_frequency_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    rare_threshold: int = 2,
) -> DataFrame:
    """Per-document corpus-bigram statistics: ``n_bigrams`` (occurrences,
    duplicates counted), ``sum_freq`` (sum of each occurrence's corpus-
    wide frequency), ``n_rare`` (occurrences whose bigram appears
    <= ``rare_threshold`` times in the corpus). One row per input row,
    zeros for docs shorter than two tokens. All-integer output — exact
    across engines."""
    if rare_threshold < 1:
        raise ValueError(f"rare_threshold must be >= 1, got {rare_threshold}")
    reserved = {"_bg", "_c", "_tk"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"columns {sorted(reserved)} collide with "
            "bigram_frequency_score's internal names; rename them first"
        )
    from ..scale import spread_for_compute

    slim = spread_for_compute(df.select(F.col(id_col), F.col(text_col)))
    # Materialized token column: an inline tokens(text) captured by the
    # bigram lambda is re-split once per gram (HOF expression
    # substitution — see dedup/winnow.py:_selection_from_hashes).
    toks = F.col("_tk")
    bg = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
    )
    occ = (
        slim.withColumn("_tk", tokens(text_col))
        .filter(F.size(toks) >= 2)
        .select(F.col(id_col), F.explode(bg).alias("_bg"))
    )
    # corpus bigram frequency via a window COUNT over the bigram
    # partition instead of a groupBy + join back, which re-derived the
    # token-explode subtree a second time (round-6; identical values —
    # the partition row count IS the corpus occurrence count)
    from pyspark.sql import Window

    per_doc = (
        occ.withColumn(
            "_c", F.count(F.lit(1)).over(Window.partitionBy("_bg"))
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("_c").alias("sum_freq"),
            F.sum(
                F.when(F.col("_c") <= rare_threshold, 1).otherwise(0)
            ).alias("n_rare"),
        )
    )
    # null-safe id join: a NULL doc_id still contributed its bigrams to
    # the corpus counts above (groupBy treats NULL as one group), and a
    # plain equi-join would drop that match and report the row as empty
    # (n_rare=0 on a possibly-junk document) — review finding
    ids = df.select(id_col)
    pd_r = per_doc.withColumnRenamed(id_col, "_pd_id")
    return ids.join(
        pd_r, ids[id_col].eqNullSafe(pd_r["_pd_id"]), "left"
    ).select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.coalesce("sum_freq", F.lit(0)).alias("sum_freq"),
        F.coalesce("n_rare", F.lit(0)).alias("n_rare"),
    )
