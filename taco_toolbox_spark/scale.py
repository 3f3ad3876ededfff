"""Data-size-driven deployment defaults.

Round 3's weak-scaling runs (4x the corpus on the same hardware) surfaced
two rules that previously lived only in ``bench.py``; a real deployment
must get them without reading the bench harness, so they are library API
consumed by the engine CLI and the bucketed-layout writer:

1. **Bucket count follows rows-per-bucket, not a fixed count.** With 64
   fixed buckets, growing 16M -> 64M turns quadrupled per-task sort/join
   state and throughput fell 606k -> 201k turns/s (1M-row bucket tasks
   spill). Scaling buckets to ~250k turns each restored linear per-turn
   cost. The warehouse rule is bytes/rows per bucket.

2. **Concurrent-vs-sequential actions have a working-set crossover.**
   Pipelining independent actions (battery summary + stats scan) overlaps
   one query's scheduler/AQE round-trips with the other's compute and wins
   while the combined working set stays cache/bandwidth-resident (measured
   35.6s -> 26.0s at 16M turns). Past the crossover the concurrent scans
   thrash shared cache/memory bandwidth and sequential wins big (measured
   106s vs 181s at 64M turns).

The constants encode measurements from THIS 32-vCPU / 128 GiB class of
worker; on a cluster they are per-executor-resources knobs, overridable at
every call site.
"""

from __future__ import annotations

#: target rows per bucket for bucketed layouts (~250k turns keeps a bucket
#: task's sort/join state comfortably in memory on a 4 GiB-heap executor).
ROWS_PER_BUCKET = 250_000

#: never fewer buckets than this — keeps small corpora wide enough to use
#: every core, and bucket counts stable across small-corpus reruns.
MIN_BUCKETS = 64

#: above this many rows per engine pass, concurrently-pipelined actions
#: start thrashing shared cache/memory bandwidth — run actions sequentially.
CONCURRENT_ACTIONS_MAX_ROWS = 32_000_000


def bucket_count(
    n_rows: int,
    rows_per_bucket: int = ROWS_PER_BUCKET,
    min_buckets: int = MIN_BUCKETS,
) -> int:
    """Bucket count for a bucketed table of ``n_rows`` rows (rule 1)."""
    return max(min_buckets, n_rows // rows_per_bucket)


def concurrent_actions(
    n_rows: int, max_rows: int = CONCURRENT_ACTIONS_MAX_ROWS
) -> bool:
    """True when independent actions over ``n_rows`` input rows should be
    pipelined concurrently rather than run sequentially (rule 2)."""
    return n_rows <= max_rows


def pack_bucket_count(
    n_rows: int, rows_per_bucket: int = ROWS_PER_BUCKET
) -> int:
    """Bucket count for distributed greedy packing (greedy_pack_bins).
    Unlike ``bucket_count`` there is no MIN floor: packing buckets are
    walked exactly and a bin never spans a bucket boundary, so every
    bucket beyond what row count requires costs one potentially
    under-filled bin — a 433-doc corpus packed across 64 buckets emits 64
    ragged shards where 1 bucket emits the optimal walk. Scaling with
    rows keeps each bucket's sequential pandas walk bounded (~250k rows)
    while small corpora get the exact single-walk result."""
    return max(1, -(-n_rows // rows_per_bucket))


def spread_for_compute(df, min_partitions: int | None = None):
    """Give a compute-heavy per-row stage at least the session's
    parallelism beneath it — rule 3, surfaced by the round-5 bench: a
    single-row-group parquet file scans as ONE partition no matter the
    split settings, so md5 gram hashing / winnowing HOF projections above
    it serialize behind one core (measured: winnowing 5k docs ran 390s
    using 2-3 of 32 cores; the same work spreads to seconds).

    The repartition triggers ONLY when the input has fewer partitions
    than ``min_partitions`` (default: the session's default parallelism)
    — at warehouse scale inputs carry thousands of splits and this is a
    plan no-op with zero added shuffle. A round-robin repartition of the
    (column-pruned) input is exactly one narrow-row shuffle when it does
    trigger — the price of using the other 30 cores.

    Known blind spot, accepted deliberately: the partition COUNT is the
    planner's split count, so one HUGE single-row-group file (splittable
    by byte range but readable only from the split holding the row
    group's start) shows many splits with all rows in one of them, and
    the spread won't trigger. Detecting that case needs a row-count job —
    costlier than the problem. Writers in this package never produce such
    files (session.py row-group sizing); for foreign data, pass
    ``min_partitions`` explicitly or repartition upstream."""
    if df.isStreaming:  # micro-batch sizing is the source's job
        return df
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
