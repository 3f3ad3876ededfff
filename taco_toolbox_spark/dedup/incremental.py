"""Incremental (corpus-update) deduplication: a NEW batch against an
EXISTING corpus.

The production shape for a continuously-growing training corpus: the
existing store is already deduplicated; each arriving batch must be checked
(a) for exact duplicates of existing docs, (b) for exact duplicates within
itself, and (c) for near-duplicates of existing docs — WITHOUT re-running
dedup over the full corpus. Every check here touches the existing corpus
only through key-joins:

* exact: one equi-join on the normalized-text fingerprint (left_semi — the
  existing side ships only fingerprints, not text). At 100 TB the existing
  side is a pre-materialized fingerprint store, so the scan reads one
  BIGINT column.
* within-batch exact: a window over the batch only (batches are small
  relative to the corpus).
* near: shingle-keyed join between BATCH shingles and EXISTING shingles —
  fan-out is |batch| x (docs sharing a shingle), bounded by the same
  document-frequency cap as ngram.py, and the batch side is small. The
  existing side's shingles are likewise a pre-materialized (id, shingle)
  store at scale; this module recomputes them from text for self-contained
  use.

Verdict precedence: exact_dup > near_dup > keep (a doc that is byte-equal
to an existing doc reports exact_dup even if it also near-matches others).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint
from .ngram import shingles


def _norm_md5_key(text_col: str) -> Column:
    """Engine-portable exact-dup key: md5 of normalized text (lowercase,
    collapsed whitespace). Same normalization as functions.text.fingerprint
    but reproducible in any engine (xxhash64 is Spark-only)."""
    return F.md5(F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))))


def exact_keys(
    df: DataFrame,
    text_col: str = "text",
    id_col: str | None = None,
    portable_key: bool = False,
) -> DataFrame:
    """The exact-dup key frame this module joins on — ``(_k)`` or
    ``(id, _k)`` with ``id_col``. Exposed so callers can pre-materialize
    the existing corpus's fingerprint store AND build the Bloom membership
    state over the SAME key the verdict join uses::

        keys = exact_keys(existing, portable_key=True)
        bloom = bloom_positions(keys, ["_k"], num_bits, num_hashes, hash_fn="md5")
    """
    key = _norm_md5_key(text_col) if portable_key else fingerprint(text_col)
    cols = [F.col(id_col).alias("id")] if id_col else []
    return df.select(*cols, key.alias("_k"))


def incremental_dedup_verdicts(
    new_df: DataFrame,
    existing_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
    portable_key: bool = False,
    check_within_batch: bool = True,
    existing_bloom: DataFrame | None = None,
    bloom_geometry: tuple[int, int] | None = None,
    bloom_hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-new-doc verdict frame: (id, verdict) with verdict in
    {'exact_dup', 'near_dup', 'keep'}.

    * exact_dup — normalized text matches an existing doc, or (if
      ``check_within_batch``, the default) an earlier (smaller id) doc in
      the same batch. Callers that already exact-deduped the batch (e.g.
      jobs/curate.py) pass False and skip that window pass.
    * near_dup — n-gram Jaccard vs some EXISTING doc >= threshold (batch
      docs are not near-matched against each other: run the in-corpus
      dedup over the kept batch afterwards if that is wanted).
    * keep — neither.

    ``portable_key=True`` uses the md5 normalized-text key (cross-engine
    reproducible, used by the oracle); default is the xxhash64 fingerprint
    (faster: no string materialization of the hash).

    ``existing_bloom`` (a positions frame from
    :func:`~taco_toolbox_spark.sketches.bloom_positions` over
    :func:`exact_keys` of the existing corpus, or the merged manifest
    state from ``checkpoint.merged_bloom_from_manifest``) pre-filters the
    exact check: batch rows whose key MISSES the filter are definitely new
    (Bloom never false-negatives), so only the "maybe seen" sliver pays
    the semi-join against the existing fingerprint store. At 100 TB the
    bloom is ≤ num_bits broadcast rows standing in for a corpus-sized
    shuffle side — verdicts are IDENTICAL with or without it.
    ``bloom_geometry`` is the required ``(num_bits, num_hashes)`` the
    filter was built with; ``bloom_hash_fn`` its hash family.
    """
    key = (
        _norm_md5_key(text_col)
        if portable_key
        else fingerprint(text_col)
    )
    new_k = new_df.select(F.col(id_col).alias("id"), key.alias("_k"))
    ex_k = existing_df.select(key.alias("_k"))

    # (a) exact vs existing: semi-join on the fingerprint key, optionally
    # shrunk to the bloom's "maybe seen" sliver first
    probe = new_k
    if existing_bloom is not None:
        if bloom_geometry is None:
            raise ValueError(
                "existing_bloom requires bloom_geometry=(num_bits, num_hashes) "
                "matching how the filter was built"
            )
        from ..sketches import bloom_maybe_contains

        num_bits, num_hashes = bloom_geometry
        probe = (
            bloom_maybe_contains(
                existing_bloom, new_k, ["_k"],
                num_bits=num_bits, num_hashes=num_hashes,
                hash_fn=bloom_hash_fn,
            )
            .filter(F.col("_maybe"))
            .drop("_maybe")
        )
    exact_ids = probe.join(ex_k, "_k", "left_semi").select("id")
    if check_within_batch:
        # (b) exact within batch: keep the smallest id per key, flag the rest
        w = Window.partitionBy("_k").orderBy("id")
        within_batch = (
            new_k.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") > 1)
            .select("id")
        )
        exact_ids = exact_ids.union(within_batch).distinct()

    # (c) near vs existing: cross-corpus shingle join -> Jaccard
    sh_new = shingles(new_df, text_col, id_col, n)
    sh_ex = shingles(existing_df, text_col, id_col, n)
    if max_shingle_freq is not None:
        freq = (
            sh_new.select("shingle")
            .union(sh_ex.select("shingle"))
            .groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_f"))
            .filter(F.col("_f") <= max_shingle_freq)
        )
        sh_new = sh_new.join(freq.select("shingle"), "shingle", "left_semi")
        sh_ex = sh_ex.join(freq.select("shingle"), "shingle", "left_semi")
    # per-doc shingle counts via a window over the id partition instead
    # of groupBy + join back: the aggregation form re-derived each side's
    # shingle subtree a second time (round-6 plan audit: 32 exchanges in
    # this operator); na/nb now ride the shingle join and the pair
    # aggregation keys. Identical values — sh_* is distinct per
    # (id, shingle), so the partition count is the set size.
    w_id = Window.partitionBy("id")
    near_ids = (
        sh_new.withColumn("na", F.count(F.lit(1)).over(w_id))
        .select(F.col("id").alias("id_new"), "shingle", "na")
        .join(
            sh_ex.withColumn("nb", F.count(F.lit(1)).over(w_id)).select(
                F.col("id").alias("id_ex"), "shingle", "nb"
            ),
            "shingle",
        )
        .groupBy("id_new", "id_ex", "na", "nb")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(
            F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))
            >= threshold
        )
        .select(F.col("id_new").alias("id"))
        .distinct()
    )

    return (
        new_df.select(F.col(id_col).alias("id"))
        .join(exact_ids.withColumn("_e", F.lit(1)), "id", "left")
        .join(near_ids.withColumn("_n", F.lit(1)), "id", "left")
        .select(
            "id",
            F.when(F.col("_e").isNotNull(), F.lit("exact_dup"))
            .when(F.col("_n").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("keep"))
            .alias("verdict"),
        )
    )


def apply_incremental_dedup(
    new_df: DataFrame,
    existing_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """The kept rows of the new batch (all original columns), i.e. the rows
    safe to append to the existing corpus."""
    v = incremental_dedup_verdicts(new_df, existing_df, text_col, id_col, **kwargs)
    keep = v.filter(F.col("verdict") == "keep").select(F.col("id").alias(id_col))
    return new_df.join(keep, id_col, "left_semi")
