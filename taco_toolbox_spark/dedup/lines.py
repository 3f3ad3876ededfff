"""Segment-level boilerplate removal: drop text segments that repeat across
many documents (the line-dedup stage of web-corpus curation pipelines —
repeated headers, footers, canned notices — generalized to corpora whose
text has no newlines).

A *segment* is a run of ``block_words`` consecutive ``delim``-separated
elements, aligned to block boundaries: ``delim='\\n', block_words=1`` is
classic line-level dedup; ``delim=' ', block_words=6`` segments plain text
into 6-word blocks. A segment is *boilerplate* when its exact text occurs
in at least ``min_docs`` DISTINCT documents; cleaned text is the original
with those blocks spliced out (order of survivors preserved).

The 100-TB plan (everything below is pure JVM column expressions — no
Python in the hot path):

  1. Segmentation is a higher-order-function expression over the split
     array (``transform(sequence(...), i -> array_join(slice(...)))``) —
     NO explode-then-regroup shuffle of individual words.
  2. The frequency pass shuffles (segment, doc_id) pairs once into a
     count-distinct aggregation; column pruning keeps the scan to
     (id, text).
  3. The removal map is ONLY (doc_id, removed-block-indexes) for documents
     that actually lose a block — the full text NEVER crosses a second
     shuffle. Splicing recomputes segments from the original text column
     inside the final projection (codegen) and drops flagged indexes.
  4. The removal frame is duplicate-dense by construction (most docs lose
     nothing) → AQE broadcasts it when small; otherwise it is an equi-join
     on the id, well-distributed.

Reference analog: the reference dedups repeated assets by content digest
(tortilla/datamodel.py:235-254); this is the sub-document realization a
training-data pipeline needs.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def segments_from_words(words: Column, delim: str, block_words: int) -> Column:
    """Array of aligned segments of ``block_words`` elements each (the
    last may be shorter) over an ALREADY-MATERIALIZED word-array column.
    ``words`` must be a plain column reference: the block lambda inlines
    its captured expression tree, so an inline split re-splits the whole
    text once per block (the HOF pitfall documented at
    dedup/winnow.py:_selection_from_hashes)."""
    n_blocks = F.ceil(F.size(words) / F.lit(block_words)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_blocks - 1),
        lambda i: F.array_join(
            F.slice(words, i * block_words + 1, block_words), delim
        ),
    )


def segments(text: Column, delim: str, block_words: int) -> Column:
    """Array of aligned segments of ``block_words`` elements each (the
    last may be shorter). NULL text -> NULL array. Column-level
    convenience; the inline split re-evaluates per block, so DataFrame
    paths materialize the word array and use
    :func:`segments_from_words`."""
    return segments_from_words(
        F.split(text, re.escape(delim)), delim, block_words
    )


def common_segments(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    delim: str = " ",
    block_words: int = 6,
) -> DataFrame:
    """The boilerplate dictionary: ``(segment, n_docs)`` for every segment
    occurring in >= ``min_docs`` distinct documents. One shuffle
    (count-distinct agg over (segment, id) pairs). The segmentation HOF is
    the heavy per-row stage, so an under-partitioned input is spread to
    the session parallelism first (scale.spread_for_compute; plan no-op at
    warehouse scale)."""
    from ..scale import spread_for_compute

    src = spread_for_compute(df.select(F.col(id_col), F.col(text_col)))
    seg = src.withColumn(
        "_words", F.split(F.col(text_col), re.escape(delim))
    ).select(
        F.col(id_col).alias("_id"),
        F.explode(
            segments_from_words(F.col("_words"), delim, block_words)
        ).alias("segment"),
    )
    return (
        seg.groupBy("segment")
        .agg(F.countDistinct("_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def remove_common_segments(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    delim: str = " ",
    block_words: int = 6,
    out_col: str = "text_clean",
) -> DataFrame:
    """All input columns plus ``out_col`` (text with boilerplate segments
    spliced out) and ``n_removed`` (blocks dropped). Documents untouched by
    the dictionary keep their text verbatim through a NULL-map fast path."""
    reserved = {"_rm", "_blk", "_seg", "_words", "n_removed", out_col} & set(
        df.columns
    )
    if reserved:
        raise ValueError(f"input columns collide with internals: {reserved}")
    from pyspark.sql import Window

    from ..scale import spread_for_compute

    seg_arr = segments_from_words(F.col("_words"), delim, block_words)
    exploded = (
        spread_for_compute(df.select(F.col(id_col), F.col(text_col)))
        .withColumn("_words", F.split(F.col(text_col), re.escape(delim)))
        .select(
            F.col(id_col),
            F.posexplode(seg_arr).alias("_blk", "_seg"),
        )
    )
    # boilerplate detection via windows over the segment partition instead
    # of a separate common_segments aggregation joined back: that form
    # re-derived the segmentation subtree (split + HOF blocking, the
    # operator's dominant per-row cost) a second time. dense_rank over
    # (segment ORDER BY id) + its partition max IS countDistinct(id) —
    # identical threshold semantics, one derivation and one join fewer.
    # Only docs that actually lose a block reach the removal map.
    w_rank = Window.partitionBy("_seg").orderBy(id_col)
    w_all = Window.partitionBy("_seg")
    removal = (
        exploded.withColumn("_dr", F.dense_rank().over(w_rank))
        .withColumn("_nd", F.max("_dr").over(w_all))
        .filter(F.col("_nd") >= min_docs)
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_set("_blk")).alias("_rm"))
    )
    # the splice projection below re-runs the segmentation HOF over EVERY
    # row — the same per-row cost class as the dictionary passes — so the
    # full frame needs the spread too (all columns: the rewrite keeps them)
    out = (
        spread_for_compute(df)
        .join(removal, id_col, "left")
        .withColumn("_words", F.split(F.col(text_col), re.escape(delim)))
    )
    kept = F.filter(
        seg_arr,
        lambda s, i: ~F.array_contains(F.col("_rm"), i),
    )
    return out.select(
        *[F.col(c) for c in df.columns],
        F.when(F.col("_rm").isNull(), F.col(text_col))
        .otherwise(F.array_join(kept, delim))
        .alias(out_col),
        # size(NULL) is -1 with ANSI off — branch explicitly
        F.when(F.col("_rm").isNull(), F.lit(0))
        .otherwise(F.size("_rm"))
        .cast("int")
        .alias("n_removed"),
    )
