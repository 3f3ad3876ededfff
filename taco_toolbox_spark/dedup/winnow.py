"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003 —
the MOSS local fingerprinting algorithm) as pure JVM column expressions.

Each document yields the set of (position, hash) pairs selected by
winnowing its word k-gram hashes: every window of ``w`` consecutive gram
hashes contributes its minimum (leftmost position on ties), duplicates
collapsed. The guarantee: any shared run of at least ``w + k - 1`` words
between two documents produces at least one IDENTICAL selected
fingerprint in both — so near-dup detection joins on the (much smaller)
fingerprint sets instead of all shingles. Density is ~2/(w+1) of the
gram count, which is the whole point at 100 TB: the join-side state per
document shrinks by ~(w+1)/2 versus a full shingle join with the same
run-detection guarantee (dedup/substring.py is the exact-run
complement; this is the bounded-state screen).

Implementation notes (scale):
  * Gram hashing, windowing, min-selection, and dedup are ALL
    higher-order-function expressions over the split array — one
    projection, no word-level explode/regroup shuffle; the only shuffle
    in pair finding is the equi-join on the selected hash.
  * Two gram-hash families (dedup/minhash.py discipline): xxhash64 is
    the library default — native 64-bit JVM hash, no hex decode — and
    "md5" is the engine-portable 32-bit prefix every oracled pipeline
    replica in this repo uses (DuckDB reproduces it bit-for-bit). Tie
    frequency is negligible for selection at either width (ties resolve
    leftmost deterministically anyway).
  * Hot (boilerplate) fingerprints are frequency-capped in the pair
    join, the same discipline as the shingle/minhash paths.

Reference analog: content-digest duplicate detection
(tortilla/datamodel.py:235-254), realized as the sub-document
fingerprint a curation pipeline actually stores.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _gram_hashes(text: Column, k: int, hash_fn: str = "xxhash64") -> Column:
    """Array of gram hashes of the k-word grams of ``text`` (empty array
    when the text has fewer than k words — including NULL text, which
    tokenizes to no words).

    ``hash_fn="xxhash64"`` (library default): native 64-bit JVM hash —
    the fast path; no hex decode, no base conversion. ``hash_fn="md5"``:
    32-bit md5-prefix, the engine-portable family every oracled pipeline
    replica in this repo uses (DuckDB reproduces it bit-for-bit). Same
    dual-family discipline as dedup/minhash.py:shingle_hash: the
    selection/join structure is identical under either family, so the
    md5-mode oracle plus pytest parity carries correctness for both."""
    # the package tokenizer (trim + \s+), NOT a literal single-space
    # split: winnow's shared-run guarantee must agree with the other
    # dedup paths (ngram/minhash/substring all tokenize via tokens()) on
    # text containing newlines/tabs/runs of spaces — a verbatim run that
    # differs only in whitespace must still collide (review finding)
    from ..functions.text import tokens

    words = tokens(text)
    ng = F.greatest(F.size(words) - (k - 1), F.lit(0))
    if hash_fn == "xxhash64":
        def gram_hash(i: Column) -> Column:
            return F.xxhash64(F.array_join(F.slice(words, i, k), " "))
    elif hash_fn == "md5":
        def gram_hash(i: Column) -> Column:
            return F.conv(
                F.substring(
                    F.md5(F.array_join(F.slice(words, i, k), " ")), 1, 8
                ),
                16,
                10,
            ).cast("long")
    else:
        raise ValueError(
            f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}"
        )
    arr = F.transform(
        # sequence throws on start > stop: clamp, and return empty below
        F.sequence(F.lit(1), F.greatest(ng, F.lit(1)), F.lit(1)),
        gram_hash,
    )
    return F.when(ng < 1, F.array().cast("array<bigint>")).otherwise(arr)


def _selection_from_hashes(hs: Column, w: int) -> Column:
    """Winnowing selection over an ALREADY-MATERIALIZED gram-hash array
    column. ``hs`` must be a plain column reference, not an inline
    expression: Catalyst substitutes lambda-captured expression TREES
    into every reference inside higher-order functions, so an inline
    ``transform(...)`` gram-hash array is re-evaluated per window — the
    selection degenerates to O(n_windows x n_grams) gram hashing per
    document (measured 19s -> 2.2s on 5k docs / 250k windows at
    local[32] after materializing). ``winnow_fingerprints`` binds the
    hash array with ``withColumn`` first; CollapseProject leaves the
    projection split because the reference count is > 1."""
    ng = F.size(hs)
    n_windows = F.greatest(ng - (w - 1), F.least(ng, F.lit(1)))
    sel = F.transform(
        # sequence is 0-based window starts; slice is 1-based. sequence
        # throws on start > stop: clamp, and return empty below
        F.sequence(F.lit(0), F.greatest(n_windows - 1, F.lit(0)), F.lit(1)),
        lambda j: F.struct(
            (
                j
                + F.array_position(
                    F.slice(hs, j + 1, w),
                    F.array_min(F.slice(hs, j + 1, w)),
                )
                - 1
            ).cast("int").alias("pos"),
            F.array_min(F.slice(hs, j + 1, w)).alias("h"),
        ),
    )
    return F.when(
        ng < 1, F.array().cast("array<struct<pos:int,h:bigint>>")
    ).otherwise(F.array_distinct(sel))


def winnow_selection(
    text: Column, k: int = 3, w: int = 4, hash_fn: str = "xxhash64"
) -> Column:
    """The winnowing fingerprint set of ``text`` as an array of
    ``struct(pos int, h long)`` — ``pos`` is the 0-based gram position.
    Documents with fewer than ``w`` grams contribute the single minimum
    of all their grams (the standard short-document convention).

    Column-level convenience for composing into arbitrary expressions;
    the INLINE gram-hash array is re-evaluated per window inside the
    selection lambdas (the HOF expression-substitution pitfall documented
    at :func:`_selection_from_hashes`), so on wide tables prefer
    :func:`winnow_fingerprints`, which materializes the hash array as a
    column first (measured ~9x faster on real documents)."""
    return _selection_from_hashes(_gram_hashes(text, k, hash_fn), w)


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Exploded fingerprint table ``(id_col, pos, h)`` — what a curation
    pipeline persists per document. Two stacked narrow projections + one
    explode; column pruning keeps the scan to (id, text). The gram-hash
    array is materialized as its own column BEFORE the selection lambdas
    reference it — inlining it re-evaluates the whole hash array per
    window (see :func:`_selection_from_hashes`; measured 19s -> 2.2s on
    5k docs at local[32]). Per-row-heavy work, so an under-partitioned
    input is spread to the session parallelism first
    (scale.spread_for_compute — measured 390s → seconds on a
    one-row-group file at local[32]; no-op at scale)."""
    from ..scale import spread_for_compute

    if "_hs" in (id_col, text_col):
        raise ValueError("winnow_fingerprints reserves column name '_hs'")
    df = spread_for_compute(df.select(F.col(id_col), F.col(text_col)))
    return (
        df.withColumn("_hs", _gram_hashes(F.col(text_col), k, hash_fn))
        .select(
            F.col(id_col),
            F.explode(
                _selection_from_hashes(F.col("_hs"), w)
            ).alias("fp"),
        )
        .select(id_col, "fp.pos", "fp.h")
    )


def winnow_overlap_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_hash_freq: int = 100,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Candidate near-dup pairs by shared winnowing fingerprints:
    ``(id_a, id_b, n_shared)`` with ``id_a < id_b`` and at least
    ``min_shared`` shared selected hashes. Hashes selected by more than
    ``max_hash_freq`` documents are boilerplate and dropped before the
    self-join (the skew cap every candidate-pair path in this repo
    applies); the join is a plain equi-join on the hash — never
    all-pairs."""
    from pyspark.sql import Window

    from ..scale import spread_for_compute

    if "_hs" in (id_col, text_col):
        raise ValueError("winnow_overlap_pairs reserves column name '_hs'")
    # Per-doc DISTINCT selected hashes computed IN the projection
    # (array_distinct over the selection's hash field) instead of an
    # exploded row-level .distinct(): same (id, h) set, one exchange
    # fewer. The gram-hash array stays a bound column so the selection
    # lambdas never inline it (see _selection_from_hashes).
    base = spread_for_compute(df.select(F.col(id_col), F.col(text_col)))
    staged = base.withColumn(
        "_hs", _gram_hashes(F.col(text_col), k, hash_fn)
    )
    sel = _selection_from_hashes(F.col("_hs"), w)
    fp = staged.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array_distinct(F.transform(sel, lambda x: x["h"]))
        ).alias("h"),
    )
    # boilerplate cap via a window COUNT over the hash partition instead
    # of a groupBy + join: the join form re-derived the whole winnowing
    # projection (gram hashing + window-min selection, the operator's
    # dominant per-row cost) a second time for the frequency count and
    # twice more for the self-join sides; the window rides the exchange
    # the self-join needs anyway, and both join sides share one identical
    # subtree (runtime ReusedExchange). Identical cap semantics: fp is
    # distinct per (_id, h), so the partition row count IS the number of
    # documents selecting the hash.
    wcap = Window.partitionBy("h")
    fp = (
        fp.withColumn("_n", F.count(F.lit(1)).over(wcap))
        .filter(F.col("_n") <= max_hash_freq)
        .drop("_n")
    )
    a = fp.select(F.col("_id").alias("id_a"), "h")
    b = fp.select(F.col("_id").alias("id_b"), "h")
    # merge hint on the self-join: identical-subtree sides riding the
    # cap window's hash-partitioned exchange — sort-merge shares one
    # subtree (ReusedExchange) where the planner's broadcast choice
    # re-runs the winnowing selection for the broadcast arm. Measured at
    # 4x the sf0.1 corpus with 4x near-dup density: auto 4.6/4.0 s vs
    # merge 3.2/2.9 s (first/warm); within noise at sf0.1. At corpus
    # scale neither side broadcasts and the hint pins the planner's own
    # choice. (The prefix/jaccard/minhash self-joins measured
    # wash-to-negative under the same hint at both sizes and keep the
    # planner's freedom — see OPTIMIZATION_r06.md.)
    return (
        a.join(b.hint("merge"), "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
