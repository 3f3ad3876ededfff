"""Shared-substring near-duplicate detection via positional shingle runs.

Jaccard (ngram.py) and MinHash (minhash.py) measure SET overlap — they miss
the classic contamination shape where two long documents share one verbatim
paragraph (tiny Jaccard, huge verbatim run). Exact-substring dedup over a
corpus-wide suffix array (Lee et al. 2022, "Deduplicating Training Data
Makes Language Models Better" — public paper, method re-derived here in
relational form) is the reference technique; a suffix array is not a Spark
shape, but its decision rule — "flag pairs sharing a token run of length
>= L" — IS expressible as a gaps-and-islands computation over positional
shingles:

  a run of R CONSECUTIVE matching n-gram shingle positions (A[p+j..] ==
  B[q+j..] for j = 0..R-1) is exactly a shared verbatim window of
  R + n - 1 tokens.

Distributed shape (all well-keyed, nothing quadratic in corpus size):

1. positional shingles (id, pos, shingle) — a pure narrow map (no
   ``array_distinct``: positions matter here, repeats stay).
2. optional document-frequency cap on the shingle key — the same fan-out
   bound as ngram.py: a shingle in f docs emits O(f^2) joined rows. Hot
   shingles (stopword runs) are dropped; a verbatim run passing through a
   dropped shingle splits into two shorter runs, so with a cap the
   reported run length is a LOWER bound (conservative: may miss, never
   overstates). cap=None is exact.
3. self-equi-join on the shingle key; each matched position pair lies on
   the diagonal ``diff = pos_a - pos_b``. Within one (pair, diff) group a
   given pos_a appears at most once (pos_b is determined), so
4. the island id ``pos_a - row_number() over (pair, diff order by pos_a)``
   groups maximal consecutive runs — one shuffle keyed by the pair, which
   is well-distributed (duplicate pairs, not hot shingles, carry the
   weight).

At 100 TB the frequency cap is mandatory (step 2) and the shingle join is
the same key-distribution story as ngram.py — this operator adds no new
scale risk over the Jaccard path it complements.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def positional_shingles(
    df: DataFrame, text_col: str, id_col: str, n: int = 3
) -> DataFrame:
    """(id, pos, shingle) with pos the 1-based token index of the shingle
    start. Unlike ngram.shingles this keeps EVERY occurrence — repeats and
    their positions are the signal for run detection. Narrow map over an
    input spread to the session parallelism when under-partitioned
    (scale.spread_for_compute; no-op at warehouse scale)."""
    from ..scale import spread_for_compute

    if "_toks" in (id_col, text_col):
        raise ValueError("positional_shingles reserves column name '_toks'")
    df = spread_for_compute(df.select(F.col(id_col), F.col(text_col)))
    # Materialized token column: an inline tokens(text) captured by the
    # gram lambda is re-split once per gram (HOF expression substitution
    # — see dedup/winnow.py:_selection_from_hashes).
    toks = F.col("_toks")
    sh = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return (
        df.withColumn("_toks", tokens(text_col))
        .filter(F.size(toks) >= n)
        .select(F.col(id_col).alias("id"), F.posexplode(sh).alias("pos0", "shingle"))
        .select("id", (F.col("pos0") + 1).alias("pos"), "shingle")
    )


def substring_run_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_tokens: int = 8,
    max_shingle_freq: int | None = 1000,
) -> DataFrame:
    """Pairs (id_a < id_b) sharing a verbatim token run of >= ``min_tokens``
    whitespace tokens. Columns: id_a, id_b, max_run_tokens (longest shared
    verbatim window, in tokens), n_runs (distinct maximal qualifying runs).

    ``min_tokens`` must be >= n; a run of R consecutive shingle matches
    attests R + n - 1 shared tokens, so the shingle-run threshold is
    ``min_tokens - n + 1``.
    """
    if min_tokens < n:
        raise ValueError(f"min_tokens ({min_tokens}) must be >= n ({n})")
    min_run = min_tokens - n + 1

    sh = positional_shingles(df, text_col, id_col, n)
    if max_shingle_freq is not None:
        # document frequency via windows over the shingle partition
        # instead of a countDistinct aggregation + semi-join: the
        # semi-join form re-derived the positional-shingle subtree (scan,
        # tokenize, gram explode) a second time for the count; here
        # dense_rank over (shingle ORDER BY id) + its partition max IS
        # the distinct-id count, computed on the ONE exchange the
        # self-join below needs anyway — both join sides then share an
        # identical subtree (runtime ReusedExchange). Identical cap
        # semantics; the sort by (shingle, id) is work the sort-merge
        # self-join would do regardless.
        w_rank = Window.partitionBy("shingle").orderBy("id")
        w_all = Window.partitionBy("shingle")
        sh = (
            sh.withColumn("_dr", F.dense_rank().over(w_rank))
            .withColumn("_f", F.max("_dr").over(w_all))
            .filter(F.col("_f") <= max_shingle_freq)
            .drop("_dr", "_f")
        )

    a = sh.select(F.col("id").alias("id_a"), F.col("pos").alias("pa"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), F.col("pos").alias("pb"), "shingle")
    # merge hint on the self-join: both sides are the SAME positional
    # subtree, already partitioned and sorted by the join key from the
    # cap windows, so sort-merge shares ONE subtree at runtime
    # (ReusedExchange) and inserts no new exchange. Left to its size
    # estimates the planner BROADCASTS one side on small-to-mid corpora,
    # re-deriving the window sort for the broadcast arm — a cost that
    # GROWS with duplicate density: measured at 4x the sf0.1 corpus with
    # 4x near-dup density, auto 12.4/11.0 s vs merge 8.3/5.9 s
    # (first/warm); at sf0.1 the two are within noise. At corpus scale
    # neither side broadcasts and the hint pins the planner's own
    # choice.
    matched = (
        a.join(b.hint("merge"), "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "pa", "pb", (F.col("pa") - F.col("pb")).alias("diff"))
    )
    w = Window.partitionBy("id_a", "id_b", "diff").orderBy("pa")
    islands = matched.withColumn("island", F.col("pa") - F.row_number().over(w))
    runs = (
        islands.groupBy("id_a", "id_b", "diff", "island")
        .agg(F.count(F.lit(1)).alias("run_len"))
        .filter(F.col("run_len") >= min_run)
    )
    return (
        runs.groupBy("id_a", "id_b")
        .agg(
            (F.max("run_len") + F.lit(n - 1)).alias("max_run_tokens"),
            F.count(F.lit(1)).alias("n_runs"),
        )
    )
