"""Deterministic corpus shuffling — a seeded global permutation as
(shard, position), the layout a training dataloader consumes.

Training runs need the corpus in a shuffled order that is (a) actually
uniform — not correlated with crawl order, source, or time, which all
survive naive file order and bias gradient batches — and (b) EXACTLY
reproducible: restarts, re-runs, and different cluster sizes must read
the identical sequence, and ``rand()`` gives none of that (a retried
task re-rolls). The deterministic construction: order rows by a seeded
hash of their key. The hash order is a pseudorandom permutation that is
a pure function of (key, seed) — stable everywhere — and changing the
seed reshuffles for the next epoch without rewriting anything upstream.

Output: ``shard`` (which of ``n_shards`` output files the row belongs
to) and ``pos`` (its 0-based read position within the shard). Readers
stream shards in pos order; the concatenation over shards in shard
order IS the permutation.

Scale shape: shard assignment is a zero-shuffle projection; positions
are ONE row_number window keyed by shard — each task sorts 1/n_shards
of the data, so pick ``n_shards`` with scale.bucket_count-style sizing
(~10^5-10^6 rows per shard) and no task outgrows memory. No global
sort, no driver state. A GLOBAL position would need a total order (one
reducer or a two-phase prefix count); the (shard, pos) pair carries the
same information without either.

Beyond-reference training-pipeline operator (SURVEY.md §6); shares the
hash family convention of operators/sampling.py (xxhash64 default, md5
engine-portable mode — the DuckDB oracle replays it verbatim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sampling import _NULL, _SEP


def _order_hash(key_cols: list[str], seed: int, hash_fn: str):
    """Full-range ordering hash (NOT the 1e6-bucket sampling hash — a
    million buckets over a billion rows would make position depend on
    the tie-break everywhere)."""
    if hash_fn == "xxhash64":
        return F.xxhash64(*[F.col(c) for c in key_cols], F.lit(seed))
    if hash_fn == "md5":
        key = F.concat_ws(
            _SEP,
            *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL))
              for c in key_cols],
        )
        # first 15 hex chars = 60 bits, exact in a BIGINT
        return F.conv(
            F.substring(
                F.md5(F.concat(key, F.lit(_SEP + str(seed)))), 1, 15
            ),
            16,
            10,
        ).cast("long")
    raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")


def deterministic_shuffle(
    df: DataFrame,
    key_cols: list[str],
    n_shards: int,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Every input row plus ``shard`` in [0, n_shards) and ``pos`` (0-based
    position within its shard), both pure functions of (key, seed) and the
    corpus content — identical at any partitioning, parallelism, or rerun.
    Hash ties order by the key columns themselves, so the permutation is
    total even for adversarial keys. Re-seed per epoch for fresh orders."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if not key_cols:
        raise ValueError("key_cols must name at least one column")
    reserved = {"shard", "pos", "_h"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"columns {sorted(reserved)} collide with "
            "deterministic_shuffle's output/internal names; rename them first"
        )
    h = _order_hash(key_cols, seed, hash_fn)
    w = Window.partitionBy("shard").orderBy(
        "_h", *[F.col(c) for c in key_cols]
    )
    return (
        df.withColumn("_h", h)
        .withColumn("shard", F.pmod(F.col("_h"), F.lit(n_shards)).cast("int"))
        .withColumn("pos", F.row_number().over(w) - 1)
        .drop("_h")
    )
