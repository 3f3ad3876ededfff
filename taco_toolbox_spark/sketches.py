"""Bounded, mergeable sketch state: count-min (frequency) and Bloom
(membership).

At 10^12 turns an exact per-key histogram over an open vocabulary (user
ids, tool names in the wild, n-grams) is unbounded state; a count-min
sketch caps it at ``depth × width`` BIGINT counters with a one-sided
guarantee (estimates only ever OVER-count, by ≤ e·N/width with
probability 1−e^−depth). That one-sidedness is what makes it a sound
heavy-hitter *candidate generator*: no true heavy hitter is ever missed,
and an exact verification pass removes the false positives.

Construction is pure JVM: each row contributes ``depth`` (row, bucket)
pairs via :func:`~taco_toolbox_spark.operators.sampling.hash_bucket`
(xxhash64 fast path, md5 portability mode — the DuckDB oracle replays the
identical arithmetic), then ONE grouped count. Map-side partial
aggregation collapses each task's output to ≤ depth·width rows before the
shuffle, so shuffle volume is bounded by ``tasks × depth × width``
REGARDLESS of input rows — the property that lets the same job run at
10^12 turns. Merging sketches (across partitions, runs, or engines) is
element-wise integer addition, which is why the per-partition counters
checkpoint into the manifest (checkpoint.py:record_cms_state) and resume
without rescanning finished partitions.

Reference parity: tacotoolbox keeps exact per-band/per-field histograms
(tacotoolbox/datamodel inventories) — viable only because its datasets
are single-machine; this is the bounded-state analog SURVEY.md §6 calls
for at 100 TB.

The Bloom filter is the membership sibling: ``num_hashes`` bucket
positions per key into a ``num_bits`` bit space, represented RELATIONALLY
as the distinct set of set-bit positions (≤ num_bits rows — broadcastable
by construction). One-sided like the CMS: a membership test can
false-POSITIVE but never false-negative, which is exactly the guarantee
an incremental-dedup prefilter needs (a "definitely new" verdict from the
filter is final; only "maybe seen" rows pay the exact join against the
existing corpus — dedup/incremental.py wires this). Merging filters is
set union of positions; per-partition position sets checkpoint into the
manifest (checkpoint.py:record_bloom_state) and a resumed or appending
run rebuilds corpus membership state without rescanning finished
partitions.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .operators.sampling import hash_bucket

#: Internal column names this module appends during construction; caller
#: frames must not already use them (mirrors operators/asof.py's guard).
_RESERVED = {"_d", "_bucket", "_cnt", "_est"}


def _check_reserved(df: DataFrame) -> None:
    clash = _RESERVED & set(df.columns)
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with count-min "
            f"internal names {sorted(_RESERVED)}"
        )


def cms_counters(
    df: DataFrame,
    key_cols: list[str],
    depth: int = 4,
    width: int = 1024,
    part_col: str | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Count-min counters for ``key_cols``: one row per non-empty
    ``(d, bucket)`` cell — ``([part,] _d, _bucket, _cnt)``. Row ``d``
    buckets with seed ``d`` (md5 mode: first-32-md5-bits of the
    ``'\\x1f'``-joined key string with the seed appended, mod ``width`` —
    engine-portable). With ``part_col`` the counters are PER PARTITION
    (mergeable state for the checkpoint manifest); without, corpus-wide.

    Plan shape: scan → depth-way posexplode (pure column expressions, no
    Python) → partial count (map-side, caps task output at depth·width
    rows) → one shuffle of ≤ tasks·depth·width rows → final count.
    """
    if depth < 1 or width < 2:
        raise ValueError(f"need depth ≥ 1 and width ≥ 2, got {depth}/{width}")
    _check_reserved(df)
    buckets = F.array(
        *[
            hash_bucket(key_cols, seed=d, hash_fn=hash_fn, buckets=width)
            for d in range(depth)
        ]
    )
    group = ([part_col] if part_col else []) + ["_d", "_bucket"]
    return (
        df.select(
            *([part_col] if part_col else []),
            F.posexplode(buckets).alias("_d", "_bucket"),
        )
        .groupBy(*group)
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )


def cms_merge(counters: DataFrame) -> DataFrame:
    """Merge per-partition counters into one sketch: element-wise integer
    sum over ``(_d, _bucket)``. The input is already ≤ parts·depth·width
    rows, so this is a trivial aggregation — the partial→final pattern
    across partitions (and, via the manifest, across runs)."""
    return counters.groupBy("_d", "_bucket").agg(F.sum("_cnt").alias("_cnt"))


def cms_total(counters: DataFrame) -> int:
    """Total observations N recorded in a merged sketch — every row of
    the table contributes exactly once to depth row 0, so N is the sum of
    that one row's counters. One action over ≤ width rows."""
    row = counters.filter(F.col("_d") == 0).agg(
        F.coalesce(F.sum("_cnt"), F.lit(0)).alias("n")
    ).first()
    return int(row["n"])


def cms_lookup(
    counters: DataFrame,
    candidates: DataFrame,
    key_cols: list[str],
    depth: int = 4,
    width: int = 1024,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Estimated count for each candidate row: ``min`` over the sketch's
    ``depth`` rows of the candidate's bucket counter (an absent cell is
    0). Appends ``_est`` to ``candidates``. The sketch is ≤ depth·width
    rows, so the join side is broadcast — estimating any candidate set
    costs one narrow pass over the candidates, never a rescan of the
    data the sketch summarizes."""
    _check_reserved(candidates)
    buckets = F.array(
        *[
            hash_bucket(key_cols, seed=d, hash_fn=hash_fn, buckets=width)
            for d in range(depth)
        ]
    )
    exploded = candidates.select(
        *candidates.columns, F.posexplode(buckets).alias("_d", "_bucket")
    )
    return (
        exploded.join(F.broadcast(counters), ["_d", "_bucket"], "left")
        .groupBy(*candidates.columns)
        .agg(F.min(F.coalesce(F.col("_cnt"), F.lit(0))).alias("_est"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_cols: list[str],
    min_fraction: float,
    depth: int = 4,
    width: int = 1024,
    hash_fn: str = "xxhash64",
    verify_exact: bool = True,
) -> DataFrame:
    """Keys whose frequency is ≥ ``min_fraction`` of the table, found via
    the sketch: distinct keys → CMS estimate → keep ``_est ≥ ⌈f·N⌉``
    (over-count-only ⇒ NO false negatives) → exact verification count of
    the surviving candidates only. Returns ``(*key_cols, n)`` with the
    EXACT count, so the result is engine-portable (the DuckDB oracle is a
    plain GROUP BY … HAVING) while the plan never builds an exact
    histogram over the full key universe — the candidate set after the
    sketch filter is ≤ 1/f keys plus the sketch's bounded false-positive
    tail, and the verify join broadcasts it.

    ``verify_exact=False`` returns the sketch estimates themselves
    (``(*key_cols, _est)``) — the streaming/monitoring mode where a
    second pass over the data is unavailable.
    """
    if not (0.0 < min_fraction <= 1.0):
        raise ValueError(f"min_fraction must be in (0, 1], got {min_fraction}")
    counters = cms_merge(
        cms_counters(df, key_cols, depth=depth, width=width, hash_fn=hash_fn)
    )
    n = cms_total(counters)
    floor = math.ceil(n * min_fraction)
    cand = cms_lookup(
        counters,
        df.select(*key_cols).distinct(),
        key_cols,
        depth=depth,
        width=width,
        hash_fn=hash_fn,
    ).filter(F.col("_est") >= F.lit(floor))
    if not verify_exact:
        return cand
    return (
        df.join(F.broadcast(cand.select(*key_cols)), key_cols, "inner")
        .groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= F.lit(floor))
    )


# ---------------------------------------------------------------------------
# Bloom filter — bounded, mergeable MEMBERSHIP state
# ---------------------------------------------------------------------------

#: Internal column names the Bloom functions append; caller frames must not
#: already use them (same contract as the count-min _RESERVED set above).
_BLOOM_RESERVED = {"_pos", "_hit", "_maybe"}


def _check_bloom_reserved(df: DataFrame) -> None:
    clash = _BLOOM_RESERVED & set(df.columns)
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with Bloom internal "
            f"names {sorted(_BLOOM_RESERVED)}"
        )


def bloom_parameters(expected_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Standard Bloom sizing: ``(num_bits, num_hashes)`` for an expected
    item count at a target false-positive probability —
    ``m = −n·ln p / (ln 2)²``, ``k = (m/n)·ln 2``. Callers that persist a
    filter must size for the CORPUS the filter will eventually describe,
    not the current batch: a Bloom filter cannot be grown, only rebuilt."""
    if expected_items < 1:
        raise ValueError(f"expected_items must be ≥ 1, got {expected_items}")
    if not (0.0 < fpp < 1.0):
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    ln2 = math.log(2.0)
    m = max(2, math.ceil(-expected_items * math.log(fpp) / (ln2 * ln2)))
    k = max(1, round((m / expected_items) * ln2))
    return m, k


def bloom_positions(
    df: DataFrame,
    key_cols: list[str],
    num_bits: int,
    num_hashes: int,
    part_col: str | None = None,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """The filter itself, relationally: the DISTINCT set of set-bit
    positions ``([part,] _pos)`` after inserting every row's key. Each key
    sets ``num_hashes`` positions via
    :func:`~taco_toolbox_spark.operators.sampling.hash_bucket` with seeds
    ``0..num_hashes−1`` (md5 mode is engine-portable — the DuckDB oracle
    replays the identical arithmetic). With ``part_col`` the positions are
    PER PARTITION (mergeable checkpoint state); without, corpus-wide.

    Plan shape: scan → ``num_hashes``-way explode (pure column
    expressions) → grouped count-free distinct. Map-side partial
    aggregation caps each task's shuffle output at ``num_bits`` rows, so
    shuffle volume is bounded by ``tasks × num_bits`` REGARDLESS of input
    rows — the same property that lets the count-min build run at 10^12
    turns."""
    if num_bits < 2 or num_hashes < 1:
        raise ValueError(
            f"need num_bits ≥ 2 and num_hashes ≥ 1, got {num_bits}/{num_hashes}"
        )
    _check_bloom_reserved(df)
    positions = F.array(
        *[
            hash_bucket(key_cols, seed=d, hash_fn=hash_fn, buckets=num_bits)
            for d in range(num_hashes)
        ]
    )
    group = ([part_col] if part_col else []) + ["_pos"]
    return (
        df.select(
            *([part_col] if part_col else []),
            F.explode(positions).alias("_pos"),
        )
        .select(*group)
        .distinct()
    )


def bloom_merge(positions: DataFrame) -> DataFrame:
    """Merge per-partition position sets into one filter: set union =
    distinct over ``_pos``. Input is already ≤ parts·num_bits rows."""
    return positions.select("_pos").distinct()


def bloom_maybe_contains(
    positions: DataFrame,
    candidates: DataFrame,
    key_cols: list[str],
    num_bits: int,
    num_hashes: int,
    hash_fn: str = "xxhash64",
    result_col: str = "_maybe",
) -> DataFrame:
    """Membership test: appends boolean ``result_col`` to ``candidates`` —
    True iff ALL ``num_hashes`` of the candidate's bit positions are set
    (may false-positive at the filter's design rate; NEVER
    false-negatives an inserted key). The filter is ≤ num_bits rows, so
    the join side broadcasts: testing any candidate set costs one narrow
    pass over the candidates, never a rescan of the corpus the filter
    summarizes."""
    _check_bloom_reserved(candidates)
    pos_arr = F.array(
        *[
            hash_bucket(key_cols, seed=d, hash_fn=hash_fn, buckets=num_bits)
            for d in range(num_hashes)
        ]
    )
    exploded = candidates.select(
        *candidates.columns, F.explode(pos_arr).alias("_pos")
    )
    marked = positions.select("_pos").distinct().withColumn("_hit", F.lit(1))
    return (
        exploded.join(F.broadcast(marked), "_pos", "left")
        .groupBy(*candidates.columns)
        .agg(
            (F.count("_hit") == F.lit(num_hashes)).alias(result_col)
        )
    )


def bloom_pack_words(positions, num_bits: int) -> list[int]:
    """Pack a positions frame (or iterable of ints) into the 64-bit-word
    bitmap representation: ``num_bits/64`` signed longs. One small driver
    action over ≤ num_bits rows. The packed form embeds as a LITERAL
    array in :func:`bloom_test_col` — a pure projection with no join and
    no aggregation, which is the form a STREAM can evaluate statelessly
    and a filter pushdown can sit above the scan."""
    if num_bits % 64 != 0:
        raise ValueError(f"num_bits must be a multiple of 64, got {num_bits}")
    if isinstance(positions, DataFrame):
        pos_iter = (int(r["_pos"]) for r in positions.select("_pos").collect())
    else:
        pos_iter = (int(p) for p in positions)
    words = [0] * (num_bits // 64)
    for p in pos_iter:
        if not (0 <= p < num_bits):
            raise ValueError(f"position {p} outside [0, {num_bits})")
        words[p // 64] |= 1 << (p % 64)
    # Java longs are signed: wrap bit 63 into two's complement
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_test_col(
    key_cols: list[str],
    words: list[int],
    num_hashes: int,
    hash_fn: str = "xxhash64",
) -> Column:
    """Membership test as ONE boolean column expression over the packed
    filter: per seed, ``getbit(words[pos div 64], pos mod 64)``. No join,
    no aggregation, no state — evaluates inside WholeStageCodegen right
    above the scan, streams without a watermark, and composes into any
    predicate context (the one-sided guarantee is unchanged: inserted
    keys ALWAYS test true). The word array is a literal of
    ``num_bits/64`` longs (e.g. 64 longs for a 4096-bit filter) — driver
    plan size, not data size."""
    num_bits = len(words) * 64
    arr = F.array(*[F.lit(int(w)).cast("long") for w in words])
    test = F.lit(True)
    for d in range(num_hashes):
        pos = hash_bucket(key_cols, seed=d, hash_fn=hash_fn, buckets=num_bits)
        word = F.element_at(arr, (pos / F.lit(64)).cast("int") + F.lit(1))
        test = test & (
            F.getbit(word, (pos % F.lit(64)).cast("int")) == F.lit(1)
        )
    return test
