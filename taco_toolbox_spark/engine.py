"""Validation engine: compiles a declarative check battery into a minimal
set of Spark passes and emits (verdict matrix, violation rows, stats).

Pass plan (the scale story — adding checks never adds scans):

  row pass      all RowChecks in ONE shuffle-free projection: per row an
                array of failed-check structs, array_compact + explode.
                Filters/column pruning push to the parquet/Iceberg scan.
  window pass   all MonotoneChecks + GapChecks (bounded adjacent step) +
                SequenceChecks (adjacent-pair grammar) over ONE window
                (single shuffle on the group key, all lags computed in one
                Window operator); SequenceCheck opening/closing-value rules
                ride one min_by/max_by group-agg piece; RateChecks
                (trailing time-window burst bound) add RANGE-frame windows
                on the SAME group-key exchange; RunLengthChecks (stuck-
                value run bound) stack two Window selects (gaps-and-
                islands) on that exchange with one sort; PeriodicLoopChecks
                (period-p ping-pong bound) stack three the same way.
  agg pass      Uniqueness on the full key (fine-grained → no hot key);
                Contiguity + GroupAggChecks share ONE groupBy(group) agg
                (Spark's partial aggregation = map-side combine).
  drift pass    two-phase salted sketch merge (checks/drift.py);
                categorical drift = one grouped count + broadcast grid
                joins, TV distance exact in integer arithmetic.
  text pass     key join + vectorized pandas UDF (checks/text_equality.py).

Verdict aggregation replaces the reference's typed-exception reports
(/root/reference/tacotoolbox/_exceptions.py:19-171): per (partition, check)
pass/fail + violation counts, with violation rows capped for reporting under
a canonical (conv_id, turn_idx) ordering — the set-oriented equivalent of
the reference's "first 10 duplicates" report
(tortilla/datamodel.py:243-254).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .checks.base import (
    CardinalityAnomalyCheck,
    CategoricalDriftCheck,
    Check,
    CompletenessDriftCheck,
    ConditionalDriftCheck,
    ContiguityCheck,
    CorrelationDriftCheck,
    DriftCheck,
    FunctionalDependencyCheck,
    GapCheck,
    GroupAggCheck,
    MonotoneCheck,
    PeriodicLoopCheck,
    RateCheck,
    RowCheck,
    RunLengthCheck,
    SequenceCheck,
    TextEqualityCheck,
    TransitionDriftCheck,
    UniquenessCheck,
    VolumeAnomalyCheck,
)
from .checks.fd import fd_violations
from .checks.drift import (
    approx_global_quantiles,
    approx_quantiles_by_partition,
    categorical_counts,
    categorical_drift_violations,
    categorical_tv,
    conditional_counts,
    conditional_drift_violations,
    conditional_tv,
    correlation_drift,
    correlation_drift_violations,
    drift_violations,
    drift_violations_approx,
    exact_global_quantiles,
    exact_quantiles_by_partition,
    global_quantiles,
    sketch_by_partition,
    transition_counts,
    transition_drift,
    transition_drift_violations,
)
from .checks.text_equality import text_equality_violations
from .schema import literal_frame

VIOLATION_COLS = ("part", "check_id", "conv_id", "turn_idx", "detail")


@dataclass
class EngineConfig:
    """Data contract: every window/aggregation pass is keyed by
    ``(partition_col, group_col)`` — ONE shared exchange, and violation
    attribution is always a single partition value. This assumes groups are
    NESTED WITHIN partitions (a conversation never spans two partition
    values — true for the transcript layout, where ``part`` is derived from
    the conversation's start date). If a group DID span partitions, its
    cross-partition duplicates/order regressions/contiguity breaks would not
    be detected; run :func:`assert_groups_nested` first when ingesting a
    layout that doesn't guarantee nesting by construction."""

    partition_col: str = "part"
    group_col: str = "conv_id"
    order_col: str = "turn_idx"
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx")
    drift_salt_buckets: int = 16
    drift_centroids: int = 128
    persist_violations: bool = False
    #: pre-shuffle the input once by the group key and persist it, so the
    #: window pass and every group aggregation consume ONE exchange instead
    #: of re-shuffling per pass. Worth it whenever >1 shuffled pass runs;
    #: at cluster scale pair with StorageLevel DISK_ONLY if memory-tight.
    share_group_shuffle: bool = False
    #: fold uniqueness of (group, order) into the window pass: a duplicate
    #: key shows up as order == lag(order), so only flagged rows are
    #: aggregated — avoids shuffling every row by the full key.
    uniqueness_via_window: bool = True
    #: when set, window passes partition by (group, floor(order/chunk)) so a
    #: pathologically hot conversation (10^7+ turns) never lands on one
    #: task; chunk-boundary rows are reconciled with a tiny join of
    #: per-chunk first/last values. None = plain per-group windows.
    window_chunk_size: int | None = None
    #: whether a driver (CLI, bench) should pipeline independent actions
    #: (battery summary + stats scan) concurrently. None = decide from the
    #: input size via scale.concurrent_actions — pipelining wins while the
    #: combined working set is cache/bandwidth-resident and loses past the
    #: crossover (measured r3 weak scaling: 35.6s->26.0s at 16M turns, but
    #: 181s vs 106s at 64M). True/False forces the mode.
    concurrent_actions: bool | None = None

    def resolve_concurrent_actions(self, n_rows: int) -> bool:
        """The action mode a driver should use for an ``n_rows`` pass."""
        if self.concurrent_actions is not None:
            return self.concurrent_actions
        from .scale import concurrent_actions

        return concurrent_actions(n_rows)


@dataclass
class ValidationResult:
    verdicts: DataFrame  # (part, check_id, passed, n_violations)
    violations: DataFrame  # (part, check_id, conv_id, turn_idx, detail)
    #: input persisted by share_group_shuffle (None otherwise)
    cached_input: DataFrame | None = None

    def release(self) -> None:
        """Unpersist everything this run cached (persist_violations,
        share_group_shuffle) — call after the terminal action in long-lived
        sessions so repeated runs don't accumulate executor storage."""
        self.violations.unpersist()
        if self.cached_input is not None:
            self.cached_input.unpersist()

    def summary(self) -> dict:
        """Materialize the battery with ONE action and return headline
        numbers: ``{"n_violations": int, "failed_part_checks": int}``.

        The single aggregation over ``violations`` evaluates every check
        pass exactly once (populating the violations cache when
        ``persist_violations`` is set, so follow-up consumers — reports,
        violation sinks — read cached rows). Compare the naive
        count-then-aggregate protocol, which pays two full scheduler
        round-trips for the same answer. Deliberately NOT computed from
        ``verdicts``: the full pass/fail matrix needs the distinct-partition
        list, i.e. another scan of the input — a failed cell is any
        (part, check) with >=1 violation, derivable from violations alone."""
        row = (
            self.violations.groupBy("part", "check_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(
                F.sum("n").alias("nv"),
                F.count(F.lit(1)).alias("nf"),
            )
            .first()
        )
        return {
            "n_violations": int(row["nv"] or 0),
            "failed_part_checks": int(row["nf"] or 0),
        }


def assert_groups_nested(df: DataFrame, cfg: EngineConfig) -> None:
    """Verify the EngineConfig data contract: no group spans more than one
    partition value. One cheap aggregation (map-side combined); raises with
    an example offender. Call once when ingesting a layout that doesn't
    guarantee group-in-partition nesting by construction."""
    offender = (
        df.groupBy(cfg.group_col)
        .agg(F.countDistinct(cfg.partition_col).alias("n_parts"))
        .filter(F.col("n_parts") > 1)
        .first()
    )
    if offender is not None:
        raise ValueError(
            f"group {offender[cfg.group_col]!r} spans {offender['n_parts']} "
            f"{cfg.partition_col!r} values — the engine's "
            "(partition, group)-keyed passes require groups nested within "
            "partitions; repartition the input or choose a coarser "
            "partition_col"
        )


def _viol(cfg: EngineConfig, df: DataFrame, check_id, detail, conv=None, turn=None):
    return df.select(
        F.col(cfg.partition_col).cast("string").alias("part"),
        (F.lit(check_id) if isinstance(check_id, str) else check_id).alias("check_id"),
        (F.col(cfg.group_col) if conv is None else conv).cast("string").alias("conv_id"),
        (F.col(cfg.order_col) if turn is None else turn).cast("int").alias("turn_idx"),
        detail.cast("string").alias("detail"),
    )


def _row_pass(df: DataFrame, checks: list[RowCheck], cfg: EngineConfig) -> DataFrame:
    # two-step: a cheap codegen'd boolean OR-chain filters down to the
    # violating sliver (~0.1% of rows) BEFORE any struct/array allocation or
    # detail formatting — the allocation-heavy projection never touches
    # passing rows. The boolean filter also pushes partially into the scan.
    any_fail = F.lit(False)
    for c in checks:
        any_fail = any_fail | ~c.holds()
    sliver = df.filter(any_fail)
    structs = [
        F.when(
            ~c.holds(),
            F.struct(
                F.lit(c.check_id).alias("check_id"), c.detail_col().alias("detail")
            ),
        )
        for c in checks
    ]
    fails = sliver.select(
        F.col(cfg.partition_col).cast("string").alias("part"),
        F.col(cfg.group_col).cast("string").alias("conv_id"),
        F.col(cfg.order_col).cast("int").alias("turn_idx"),
        F.array_compact(F.array(*structs)).alias("fails"),
    ).filter(F.size("fails") > 0)
    return fails.select(
        "part",
        F.explode("fails").alias("f"),
        "conv_id",
        "turn_idx",
    ).select("part", "f.check_id", "conv_id", "turn_idx", "f.detail")


def _adjacent_fail(c, prev, cur) -> F.Column:
    """The failed-check struct (or NULL) for one adjacent (prev, cur) value
    pair — shared by the plain window pass, the chunked window pass, and
    the chunk-boundary reconciliation join, so all three realize identical
    semantics. ``prev`` is NULL on a group's (or chunk's) first row — and
    when the previous row's VALUE is NULL, which `lag` cannot distinguish
    from absence: adjacent-pair checks never fire off a NULL prev (the
    NULL-valued row itself is caught as a bad *current* value, and role
    NULLs additionally fail the vocab row check). SequenceCheck
    first-value rules run in their own group-agg piece, where the TRUE
    first row is known even under chunking."""
    cur = F.col(cur) if isinstance(cur, str) else cur
    if isinstance(c, SequenceCheck):
        bad = prev.isNotNull() & ~c.pair_ok(prev, cur)
        detail = F.format_string(
            f"{c.value_col} transition not allowed: %s -> %s",
            F.coalesce(prev.cast("string"), F.lit("null")),
            F.coalesce(cur.cast("string"), F.lit("null")),
        )
    elif isinstance(c, GapCheck):
        bad = c.step_bad(prev, cur)
        detail = F.format_string(
            f"{c.value_col} step out of "
            f"[{c.min_step if c.min_step is not None else '-inf'}, "
            f"{c.max_step if c.max_step is not None else 'inf'}]: %s -> %s",
            F.coalesce(prev.cast("string"), F.lit("null")),
            F.coalesce(cur.cast("string"), F.lit("null")),
        )
    else:
        bad = prev > cur if not c.strict else prev >= cur
        bad = F.coalesce(bad, F.lit(False))
        detail = F.format_string(
            f"{c.value_col} regression: %s -> %s",
            prev.cast("string"),
            cur.cast("string"),
        )
    return F.when(
        bad,
        F.struct(F.lit(c.check_id).alias("check_id"), detail.alias("detail")),
    )


def _window_pass(
    df: DataFrame, checks: list[MonotoneCheck | GapCheck | SequenceCheck], cfg: EngineConfig
) -> DataFrame:
    # keyed (partition, group) like every other pass: one shared exchange,
    # and attribution stays correct even if a group spans partitions
    w = Window.partitionBy(cfg.partition_col, cfg.group_col).orderBy(cfg.order_col)
    structs = []
    for c in checks:
        prev = F.lag(F.col(c.value_col)).over(w)
        structs.append(_adjacent_fail(c, prev, c.value_col))
    fails = df.select(
        F.col(cfg.partition_col).cast("string").alias("part"),
        F.col(cfg.group_col).cast("string").alias("conv_id"),
        F.col(cfg.order_col).cast("int").alias("turn_idx"),
        F.array_compact(F.array(*structs)).alias("fails"),
    ).filter(F.size("fails") > 0)
    return fails.select(
        "part", F.explode("fails").alias("f"), "conv_id", "turn_idx"
    ).select("part", "f.check_id", "conv_id", "turn_idx", "f.detail")


def _rate_pass(
    df: DataFrame, checks: list[RateCheck], cfg: EngineConfig
) -> DataFrame:
    """Trailing-rate rules: one RANGE-frame window per distinct
    (value_col, seconds) pair, all sharing the engine-key exchange the
    lag window uses (same partitioning — Catalyst reuses the shuffle;
    only the sort/frame differs). Determinism: frames key on the
    truncated epoch second (operators/rolling.py contract), so intra-
    second row order cannot move a row between frames."""
    from .operators.rolling import _trunc_epoch

    structs = []
    for c in checks:
        e = _trunc_epoch(df, c.value_col)
        w = (
            Window.partitionBy(cfg.partition_col, cfg.group_col)
            .orderBy(e)
            .rangeBetween(-int(c.seconds), 0)
        )
        n = F.count(F.lit(1)).over(w)
        bad = e.isNotNull() & (n > F.lit(int(c.max_events)))
        detail = F.format_string(
            f"%s rows in trailing {c.seconds}s > {c.max_events}",
            n.cast("string"),
        )
        structs.append(
            F.when(
                bad,
                F.struct(
                    F.lit(c.check_id).alias("check_id"),
                    detail.alias("detail"),
                ),
            )
        )
    fails = df.select(
        F.col(cfg.partition_col).cast("string").alias("part"),
        F.col(cfg.group_col).cast("string").alias("conv_id"),
        F.col(cfg.order_col).cast("int").alias("turn_idx"),
        F.array_compact(F.array(*structs)).alias("fails"),
    ).filter(F.size("fails") > 0)
    return fails.select(
        "part", F.explode("fails").alias("f"), "conv_id", "turn_idx"
    ).select("part", "f.check_id", "conv_id", "turn_idx", "f.detail")


def _runlength_pass(
    df: DataFrame, checks: list[RunLengthCheck], cfg: EngineConfig
) -> DataFrame:
    """Stuck-value run rules: the gaps-and-islands identity
    (operators/runs.py) per checked column — row_number + lag start
    markers in one select, a running max over the markers in a second —
    all window specs identical to the lag pass's (same partitioning,
    same order), so Catalyst stacks the Window operators on the shared
    engine-key exchange with ONE sort. Only overflow rows (run position
    > max_run) fire."""
    w = Window.partitionBy(cfg.partition_col, cfg.group_col).orderBy(
        cfg.order_col
    )
    rn = F.row_number().over(w)
    # keep the ORIGINAL key/order columns through the intermediate select:
    # the second window keys on them verbatim, so Catalyst reuses the
    # exchange AND the sort (string-cast keys here would force a second
    # shuffle — the casts happen only in the final projection)
    marked = df.select(
        F.col(cfg.partition_col),
        F.col(cfg.group_col),
        F.col(cfg.order_col),
        rn.alias("_rn"),
        *[
            (
                (rn == F.lit(1))
                | ~F.lag(F.col(c.value_col)).over(w).eqNullSafe(
                    F.col(c.value_col)
                )
            ).alias(f"_new_{i}")
            for i, c in enumerate(checks)
        ],
    )
    wc = (
        Window.partitionBy(cfg.partition_col, cfg.group_col)
        .orderBy(cfg.order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    structs = []
    for i, c in enumerate(checks):
        start = F.max(F.when(F.col(f"_new_{i}"), F.col("_rn"))).over(wc)
        pos = F.col("_rn") - start + F.lit(1)
        detail = F.format_string(
            f"{c.value_col} run position %s > {c.max_run}",
            pos.cast("string"),
        )
        structs.append(
            F.when(
                pos > F.lit(int(c.max_run)),
                F.struct(
                    F.lit(c.check_id).alias("check_id"),
                    detail.alias("detail"),
                ),
            )
        )
    fails = marked.select(
        F.col(cfg.partition_col).cast("string").alias("part"),
        F.col(cfg.group_col).cast("string").alias("conv_id"),
        F.col(cfg.order_col).cast("int").alias("turn_idx"),
        F.array_compact(F.array(*structs)).alias("fails"),
    ).filter(F.size("fails") > 0)
    return fails.select(
        "part", F.explode("fails").alias("f"), "conv_id", "turn_idx"
    ).select("part", "f.check_id", "conv_id", "turn_idx", "f.detail")


def _periodic_pass(
    df: DataFrame, checks: list["PeriodicLoopCheck"], cfg: EngineConfig
) -> DataFrame:
    """Ping-pong (period-p loop) rules: per check, a lag-``period``
    null-safe continuing indicator, island-start markers over it, and a
    running max — the same stacked-window shape as the run pass
    (operators/runs.py:periodic_runs has the full rationale), every spec
    keyed identically to the engine's lag pass, so Catalyst shares the
    exchange and the sort. A row fires when it extends its stretch past
    ``max_reps * period`` total rows (stretch-so-far = continuing-run
    position + period), so dropping exactly the flagged rows leaves at
    most ``max_reps`` full repetitions."""
    w = Window.partitionBy(cfg.partition_col, cfg.group_col).orderBy(
        cfg.order_col
    )
    rn = F.row_number().over(w)
    conts = []
    for i, c in enumerate(checks):
        cont = (rn > F.lit(int(c.period))) & F.col(c.value_col).eqNullSafe(
            F.lag(F.col(c.value_col), int(c.period)).over(w)
        )
        conts.append(cont.alias(f"_c_{i}"))
    marked = df.select(
        F.col(cfg.partition_col),
        F.col(cfg.group_col),
        F.col(cfg.order_col),
        rn.alias("_rn"),
        *conts,
    )
    # island-start markers need a second stacked select (they lag the
    # continuing indicators computed above)
    marked = marked.select(
        "*",
        *[
            (
                F.col(f"_c_{i}")
                & ~F.lag(F.col(f"_c_{i}"), 1, False).over(w)
            ).alias(f"_new_{i}")
            for i in range(len(checks))
        ],
    )
    wc = (
        Window.partitionBy(cfg.partition_col, cfg.group_col)
        .orderBy(cfg.order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    structs = []
    for i, c in enumerate(checks):
        start = F.max(F.when(F.col(f"_new_{i}"), F.col("_rn"))).over(wc)
        stretch = F.col("_rn") - start + F.lit(1) + F.lit(int(c.period))
        bad = F.col(f"_c_{i}") & (
            stretch > F.lit(int(c.max_reps) * int(c.period))
        )
        detail = F.format_string(
            f"{c.value_col} period-{c.period} stretch row %s > "
            f"{c.max_reps} reps",
            stretch.cast("string"),
        )
        structs.append(
            F.when(
                bad,
                F.struct(
                    F.lit(c.check_id).alias("check_id"),
                    detail.alias("detail"),
                ),
            )
        )
    fails = marked.select(
        F.col(cfg.partition_col).cast("string").alias("part"),
        F.col(cfg.group_col).cast("string").alias("conv_id"),
        F.col(cfg.order_col).cast("int").alias("turn_idx"),
        F.array_compact(F.array(*structs)).alias("fails"),
    ).filter(F.size("fails") > 0)
    return fails.select(
        "part", F.explode("fails").alias("f"), "conv_id", "turn_idx"
    ).select("part", "f.check_id", "conv_id", "turn_idx", "f.detail")


def _window_pass_chunked(
    df: DataFrame, checks: list[MonotoneCheck | GapCheck | SequenceCheck], cfg: EngineConfig
) -> DataFrame:
    """Skew-proof adjacent-pair pass: windows over (group, order-chunk)
    bound every task to ≤ chunk_size rows even for a single enormous
    conversation; cross-chunk pairs (regressions / disallowed transitions)
    are caught by joining each chunk's last value with the next chunk's
    first value (a join over n_chunks rows — negligible)."""
    chunk = cfg.window_chunk_size
    dfc = df.withColumn("_chunk", F.floor(F.col(cfg.order_col) / chunk))
    w = Window.partitionBy(cfg.partition_col, cfg.group_col, "_chunk").orderBy(
        cfg.order_col
    )

    structs = []
    for c in checks:
        prev = F.lag(F.col(c.value_col)).over(w)
        structs.append(_adjacent_fail(c, prev, c.value_col))
    in_chunk = (
        dfc.select(
            F.col(cfg.partition_col).cast("string").alias("part"),
            F.col(cfg.group_col).cast("string").alias("conv_id"),
            F.col(cfg.order_col).cast("int").alias("turn_idx"),
            F.array_compact(F.array(*structs)).alias("fails"),
        )
        .filter(F.size("fails") > 0)
        .select("part", F.explode("fails").alias("f"), "conv_id", "turn_idx")
        .select("part", "f.check_id", "conv_id", "turn_idx", "f.detail")
    )

    # boundary reconciliation: per chunk, first/last value of each checked
    # column; compare chunk c's last against chunk c+1's first
    aggs = [
        F.min(F.col(cfg.partition_col).cast("string")).alias("part"),
        F.min(F.struct(cfg.order_col)).alias("_first_key"),
    ]
    for c in checks:
        aggs += [
            F.min_by(F.col(c.value_col), F.col(cfg.order_col)).alias(f"_first_{c.check_id}"),
            F.max_by(F.col(c.value_col), F.col(cfg.order_col)).alias(f"_last_{c.check_id}"),
        ]
    per_chunk = dfc.groupBy(cfg.group_col, "_chunk").agg(*aggs)
    # chunks may be sparse (a gap-shifted row sits alone in a far chunk):
    # pair consecutive OCCUPIED chunks by rank, not by chunk id arithmetic.
    # per_chunk is tiny (one row per occupied chunk), so this window is free.
    rk = Window.partitionBy(cfg.group_col).orderBy("_chunk")
    per_chunk = per_chunk.withColumn("_rk", F.row_number().over(rk))
    nxt = per_chunk.select(
        F.col(cfg.group_col).alias("_g"),
        (F.col("_rk") - 1).alias("_rk"),
        F.col("part").alias("_next_part"),
        F.col("_first_key").alias("_next_first_key"),
        *[F.col(f"_first_{c.check_id}").alias(f"_next_first_{c.check_id}") for c in checks],
    )
    joined = per_chunk.join(
        nxt,
        (per_chunk[cfg.group_col] == nxt["_g"]) & (per_chunk["_rk"] == nxt["_rk"]),
        "inner",
    )
    bstructs = []
    for c in checks:
        last, nfirst = F.col(f"_last_{c.check_id}"), F.col(f"_next_first_{c.check_id}")
        bstructs.append(_adjacent_fail(c, last, nfirst))
    boundary = (
        joined.select(
            F.col("_next_part").alias("part"),
            F.col(cfg.group_col).cast("string").alias("conv_id"),
            F.col("_next_first_key")[cfg.order_col].cast("int").alias("turn_idx"),
            F.array_compact(F.array(*bstructs)).alias("fails"),
        )
        .filter(F.size("fails") > 0)
        .select("part", F.explode("fails").alias("f"), "conv_id", "turn_idx")
        .select("part", "f.check_id", "conv_id", "turn_idx", "f.detail")
    )
    return in_chunk.unionAll(boundary)


def _seq_endpoint_pass(
    df: DataFrame, checks: list[SequenceCheck], cfg: EngineConfig
) -> DataFrame:
    """Endpoint rules of SequenceChecks: per group, the value at the
    smallest order must be in ``check.first`` and/or the value at the
    LARGEST order in ``check.last``. ONE groupBy over (partition, group)
    for every endpoint rule in the battery — ``min``/``min_by``/``max_by``
    partial-aggregate map-side, so the shuffle carries one row per group
    per task regardless of group size (hot conversations included), and
    the rules see the TRUE first/last rows even when the window pass runs
    chunked. Opening violations land at the group's min order, closing
    violations at its max order."""
    aggs = [
        F.min(F.col(cfg.order_col)).alias("_first_idx"),
        F.max(F.col(cfg.order_col)).alias("_last_idx"),
    ]
    for c in checks:
        if c.first is not None:
            aggs.append(
                F.min_by(F.col(c.value_col), F.col(cfg.order_col)).alias(
                    f"_vf_{c.check_id}"
                )
            )
        if c.last is not None:
            aggs.append(
                F.max_by(F.col(c.value_col), F.col(cfg.order_col)).alias(
                    f"_vl_{c.check_id}"
                )
            )
    g = df.groupBy(
        F.col(cfg.partition_col).cast("string").alias("part"),
        F.col(cfg.group_col).cast("string").alias("conv_id"),
    ).agg(*aggs)

    # one projection over the single agg: each failed-rule struct carries
    # its OWN coordinate (min order for opening rules, max order for
    # closing rules), so both rule families ride one branch — the agg is
    # never evaluated twice
    structs = []
    for c in checks:
        for kind, vocab, idx in (
            ("first", c.first, "_first_idx"),
            ("last", c.last, "_last_idx"),
        ):
            if vocab is None:
                continue
            v = F.col(f"_v{kind[0]}_{c.check_id}")
            ok = F.coalesce(v.isin(list(vocab)), F.lit(False))
            structs.append(
                F.when(
                    ~ok,
                    F.struct(
                        F.lit(c.check_id).alias("check_id"),
                        F.format_string(
                            f"{kind} {c.value_col} not in {sorted(vocab)}: %s",
                            F.coalesce(v.cast("string"), F.lit("null")),
                        ).alias("detail"),
                        F.col(idx).cast("int").alias("turn_idx"),
                    ),
                )
            )
    fails = g.select(
        "part",
        "conv_id",
        F.array_compact(F.array(*structs)).alias("fails"),
    ).filter(F.size("fails") > 0)
    return fails.select(
        "part", F.explode("fails").alias("f"), "conv_id"
    ).select("part", "f.check_id", "conv_id", "f.turn_idx", "f.detail")


def _uniqueness_pass(
    df: DataFrame, check: UniquenessCheck, cfg: EngineConfig
) -> DataFrame:
    keys = list(check.keys or cfg.key_cols)
    dups = (
        df.groupBy(cfg.partition_col, *keys)
        .count()
        .filter(F.col("count") > 1)
    )
    return _viol(
        cfg,
        dups,
        check.check_id,
        F.format_string("duplicate key (n=%s)", F.col("count").cast("string")),
        conv=F.col(keys[0]),
        turn=F.col(keys[1]) if len(keys) > 1 else F.lit(None),
    )


def _uniqueness_via_window(
    df: DataFrame, check: UniquenessCheck, cfg: EngineConfig
) -> DataFrame:
    """Duplicate (group, order) keys detected inside the shared window sort:
    a dup row has order == lag(order). Only the flagged rows (a ~0.1%
    sliver) are then aggregated for per-key counts — the full-key shuffle
    of every row is gone."""
    w = Window.partitionBy(cfg.partition_col, cfg.group_col).orderBy(cfg.order_col)
    flagged = (
        df.withColumn("_prev", F.lag(cfg.order_col).over(w))
        .filter(F.col("_prev").isNotNull() & (F.col("_prev") == F.col(cfg.order_col)))
        .groupBy(cfg.partition_col, cfg.group_col, cfg.order_col)
        .agg((F.count(F.lit(1)) + 1).alias("count"))
    )
    return _viol(
        cfg,
        flagged,
        check.check_id,
        F.format_string("duplicate key (n=%s)", F.col("count").cast("string")),
    )


def _fd_pass(
    df: DataFrame, check: FunctionalDependencyCheck, cfg: EngineConfig
) -> DataFrame:
    """Functional-dependency violations as standard violation rows. The
    two-stage agg (checks/fd.py) is scoped by the engine's partition
    column — per-partition verdicts like every other pass. The violation
    coordinate is the FULL determinant value tuple (comma-joined, NULLs
    marked) so multi-column determinants stay distinguishable; the detail
    carries the variant count and both witness combos so the row is
    actionable without a second query."""
    viol = fd_violations(
        df,
        check.determinant,
        check.dependent,
        cfg.partition_col,
        skip_null_determinant=check.skip_null_determinant,
    )
    det_vals = F.concat_ws(
        ",",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("<null>"))
            for c in check.determinant
        ],
    )
    return _viol(
        cfg,
        viol,
        check.check_id,
        F.format_string(
            "%s=(%s) -> %s broken: %s variants over %s rows (e.g. %s vs %s)",
            F.lit(",".join(check.determinant)),
            det_vals,
            F.lit(",".join(check.dependent)),
            F.col("n_variants").cast("string"),
            F.col("n_rows").cast("string"),
            F.col("variant_min"),
            F.col("variant_max"),
        ),
        conv=det_vals,
        turn=F.lit(None),
    )


def _group_agg_pass(
    df: DataFrame,
    contig: list[ContiguityCheck],
    group_checks: list[GroupAggCheck],
    cfg: EngineConfig,
) -> DataFrame:
    """Contiguity + generic group-agg checks share one aggregation.

    Distinct counts ride the group-key window sort instead of a
    countDistinct expand: after sorting by the idx within the group, the
    number of rows where idx != lag(idx) (+1 for the first row) IS the
    distinct count — and the window exchange is byte-identical to the
    monotone/uniqueness passes' exchange, so Spark's ReusedExchange makes
    all window-keyed passes pay for ONE shuffle of the input."""
    aggs: list = []
    structs: list = []
    for idx_col in sorted({c.idx_col for c in contig}):
        prev = F.lag(idx_col).over(
            # must match the aggregation key (partition, group): a window
            # keyed by group alone would split one group's _is_new flags
            # across partition values and mis-count distincts
            Window.partitionBy(cfg.partition_col, cfg.group_col).orderBy(idx_col)
        )
        df = df.withColumn(
            f"_is_new_{idx_col}",
            (prev.isNull() | (F.col(idx_col) != prev)).cast("int"),
        )
    for c in contig:
        n = F.count(F.lit(1)).alias(f"_{c.check_id}_n")
        nd = F.sum(f"_is_new_{c.idx_col}").alias(f"_{c.check_id}_nd")
        mn = F.min(c.idx_col).alias(f"_{c.check_id}_mn")
        mx = F.max(c.idx_col).alias(f"_{c.check_id}_mx")
        aggs += [n, nd, mn, mx]
    for c in group_checks:
        aggs += list(c.aggs)
    agg_df = df.groupBy(cfg.partition_col, cfg.group_col).agg(*aggs)
    for c in contig:
        n, nd = F.col(f"_{c.check_id}_n"), F.col(f"_{c.check_id}_nd")
        mn, mx = F.col(f"_{c.check_id}_mn"), F.col(f"_{c.check_id}_mx")
        ok = (mn == 0) & (mx == n - 1) & (nd == n)
        structs.append(
            F.when(
                ~F.coalesce(ok, F.lit(False)),
                F.struct(
                    F.lit(c.check_id).alias("check_id"),
                    F.format_string(
                        "idx not 0..n-1: n=%s distinct=%s min=%s max=%s",
                        n.cast("string"),
                        nd.cast("string"),
                        mn.cast("string"),
                        mx.cast("string"),
                    ).alias("detail"),
                ),
            )
        )
    for c in group_checks:
        structs.append(
            F.when(
                ~F.coalesce(c.predicate, F.lit(False)),
                F.struct(
                    F.lit(c.check_id).alias("check_id"),
                    (c.detail if c.detail is not None else F.lit(c.description))
                    .cast("string")
                    .alias("detail"),
                ),
            )
        )
    fails = agg_df.select(
        F.col(cfg.partition_col).cast("string").alias("part"),
        F.col(cfg.group_col).cast("string").alias("conv_id"),
        F.array_compact(F.array(*structs)).alias("fails"),
    ).filter(F.size("fails") > 0)
    return fails.select("part", F.explode("fails").alias("f"), "conv_id").select(
        "part",
        "f.check_id",
        "conv_id",
        F.lit(None).cast("int").alias("turn_idx"),
        "f.detail",
    )


def _health_pass(
    df: DataFrame,
    vol_checks: list[VolumeAnomalyCheck],
    comp_checks: list[CompletenessDriftCheck],
    card_checks: list[CardinalityAnomalyCheck],
    cfg: EngineConfig,
) -> DataFrame:
    """Volume / completeness / cardinality checks share ONE grouped
    aggregation over the partition grain (checks/health.py contract): the
    input is scanned once no matter how many health checks run, the
    profile frame is one row per partition, and every robust band /
    corpus baseline is a whole-frame window over that tiny frame sharing
    a single single-partition exchange. Violations are partition-grain
    (conv_id/turn_idx NULL), built as structs in one select and exploded
    — the _group_agg_pass pattern, so N checks never means N branches
    re-executing the data-sized subtree."""
    from .checks.health import partition_profile, robust_band

    # ids key the shared profile's metric columns and the band-column
    # prefixes: a duplicate would silently overwrite a sibling's metric
    # (dict collapse) — loud, like the suite's duplicate-id rule
    ids = [c.check_id for c in (*vol_checks, *comp_checks, *card_checks)]
    dupes = {i for i in ids if ids.count(i) > 1}
    if dupes:
        raise ValueError(
            f"duplicate health check_id(s) {sorted(dupes)} — each "
            "volume/completeness/cardinality check needs a unique id"
        )
    valid = {c.check_id: F.expr(c.value_col) for c in comp_checks}
    distinct = {c.check_id: F.expr(c.value_col) for c in card_checks}
    frame = partition_profile(
        df, cfg.partition_col, valid=valid, distinct=distinct
    )
    w = Window.partitionBy(F.lit(1))

    def _banded(frame, c, metric):
        p = f"_{c.check_id}_"
        if getattr(c, "history_counts", None) is not None:
            # band from a previous blessed run, injected as exact
            # literals (history_band: interpolated median, identical to
            # the window percentile's arithmetic)
            med, mad = c.history_band()
            frame = frame.withColumn(f"{p}med", F.lit(med))
            frame = frame.withColumn(
                f"{p}dev",
                F.abs(F.col(metric).cast("double") - F.col(f"{p}med")),
            )
            frame = frame.withColumn(f"{p}mad", F.lit(mad))
            return frame.withColumn(
                f"{p}flag",
                F.col(f"{p}dev") > F.lit(float(c.k)) * F.col(f"{p}mad"),
            )
        season = None
        if c.season is not None:
            frame = frame.withColumn(
                f"_{c.check_id}_season", F.expr(c.season)
            )
            season = f"_{c.check_id}_season"
        return robust_band(
            frame, metric, c.k, prefix=p, season_col=season
        )

    for c in vol_checks:
        frame = _banded(frame, c, "n")
        p = f"_{c.check_id}_"
        extra = F.lit(False)
        if c.rel is not None:
            extra = extra | (
                F.col(f"{p}dev") > F.lit(float(c.rel)) * F.col(f"{p}med")
            )
        if c.min_rows is not None:
            extra = extra | (F.col("n") < F.lit(int(c.min_rows)))
        if c.max_rows is not None:
            extra = extra | (F.col("n") > F.lit(int(c.max_rows)))
        if c.rel is not None or c.min_rows is not None or c.max_rows is not None:
            frame = frame.withColumn(
                f"{p}flag", F.col(f"{p}flag") | extra
            )
    for c in card_checks:
        frame = _banded(frame, c, f"d_{c.check_id}")
        if c.rel is not None:
            p = f"_{c.check_id}_"
            frame = frame.withColumn(
                f"{p}flag",
                F.col(f"{p}flag")
                | (
                    F.col(f"{p}dev")
                    > F.lit(float(c.rel)) * F.col(f"{p}med")
                ),
            )
    for c in comp_checks:
        nf = (F.col("n") - F.col(f"v_{c.check_id}")).cast(
            "double"
        ) / F.col("n").cast("double")
        frame = frame.withColumn(f"_{c.check_id}_nf", nf)
        if c.baseline_frac is None:
            base = (
                (F.sum("n").over(w) - F.sum(f"v_{c.check_id}").over(w)).cast(
                    "double"
                )
                / F.sum("n").over(w).cast("double")
            )
        else:
            base = F.lit(float(c.baseline_frac))
        frame = frame.withColumn(f"_{c.check_id}_bf", base)

    structs: list[Column] = []
    for c in vol_checks:
        p = f"_{c.check_id}_"
        # name every configured rule part: a floor-fired row must not
        # read as a band violation
        rule = f"median±{c.k}·MAD"
        if c.rel is not None:
            rule += f", rel={c.rel}"
        if c.min_rows is not None:
            rule += f", min_rows={c.min_rows}"
        if c.max_rows is not None:
            rule += f", max_rows={c.max_rows}"
        structs.append(
            F.when(
                F.coalesce(F.col(f"{p}flag"), F.lit(False)),
                F.struct(
                    F.lit(c.check_id).alias("check_id"),
                    F.format_string(
                        f"partition_rows=%s violates volume rule [{rule}] "
                        "(med=%s mad=%s)",
                        F.col("n").cast("string"),
                        F.col(f"{p}med").cast("string"),
                        F.col(f"{p}mad").cast("string"),
                    ).alias("detail"),
                ),
            )
        )
    for c in card_checks:
        p = f"_{c.check_id}_"
        structs.append(
            F.when(
                F.coalesce(F.col(f"{p}flag"), F.lit(False)),
                F.struct(
                    F.lit(c.check_id).alias("check_id"),
                    F.format_string(
                        f"n_distinct=%s outside median±{c.k}·MAD "
                        "(med=%s mad=%s)",
                        F.col(f"d_{c.check_id}").cast("string"),
                        F.col(f"{p}med").cast("string"),
                        F.col(f"{p}mad").cast("string"),
                    ).alias("detail"),
                ),
            )
        )
    for c in comp_checks:
        p = f"_{c.check_id}_"
        drifted = F.abs(
            F.col(f"{p}nf") - F.col(f"{p}bf")
        ) > F.lit(float(c.tol))
        structs.append(
            F.when(
                F.coalesce(drifted, F.lit(False)),
                F.struct(
                    F.lit(c.check_id).alias("check_id"),
                    F.format_string(
                        f"null_frac=%s vs baseline=%s (|delta| > {c.tol})",
                        F.round(f"{p}nf", 6).cast("string"),
                        F.round(f"{p}bf", 6).cast("string"),
                    ).alias("detail"),
                ),
            )
        )
    fails = frame.select(
        "part", F.array_compact(F.array(*structs)).alias("fails")
    ).filter(F.size("fails") > 0)
    return fails.select("part", F.explode("fails").alias("f")).select(
        "part",
        "f.check_id",
        F.lit(None).cast("string").alias("conv_id"),
        F.lit(None).cast("int").alias("turn_idx"),
        "f.detail",
    )


def run_validation(
    df: DataFrame,
    checks: list[Check],
    cfg: EngineConfig | None = None,
    baseline: DataFrame | None = None,
) -> ValidationResult:
    """Run the battery; returns lazily-evaluated verdicts + violations.

    ``baseline`` (clean reference table) resolves DriftCheck baselines that
    were not given explicit quantiles.
    """
    cfg = cfg or EngineConfig()
    spark = df.sparkSession

    cached_input = None
    if cfg.share_group_shuffle:
        n = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        df = cached_input = df.repartition(n, cfg.group_col).persist()

    row_checks = [c for c in checks if isinstance(c, RowCheck)]
    mono_checks = [c for c in checks if isinstance(c, MonotoneCheck)]
    gap_checks = [c for c in checks if isinstance(c, GapCheck)]
    rate_checks = [c for c in checks if isinstance(c, RateCheck)]
    run_checks = [c for c in checks if isinstance(c, RunLengthCheck)]
    loop_checks = [c for c in checks if isinstance(c, PeriodicLoopCheck)]
    seq_checks = [c for c in checks if isinstance(c, SequenceCheck)]
    uniq_checks = [c for c in checks if isinstance(c, UniquenessCheck)]
    fd_checks = [c for c in checks if isinstance(c, FunctionalDependencyCheck)]
    contig_checks = [c for c in checks if isinstance(c, ContiguityCheck)]
    group_checks = [c for c in checks if isinstance(c, GroupAggCheck)]
    drift_checks = [c for c in checks if isinstance(c, DriftCheck)]
    cat_drift_checks = [c for c in checks if isinstance(c, CategoricalDriftCheck)]
    corr_drift_checks = [
        c for c in checks if isinstance(c, CorrelationDriftCheck)
    ]
    cond_drift_checks = [
        c for c in checks if isinstance(c, ConditionalDriftCheck)
    ]
    trans_drift_checks = [
        c for c in checks if isinstance(c, TransitionDriftCheck)
    ]
    text_checks = [c for c in checks if isinstance(c, TextEqualityCheck)]
    vol_checks = [c for c in checks if isinstance(c, VolumeAnomalyCheck)]
    comp_checks = [
        c for c in checks if isinstance(c, CompletenessDriftCheck)
    ]
    card_checks = [
        c for c in checks if isinstance(c, CardinalityAnomalyCheck)
    ]

    pieces: list[DataFrame] = []
    if row_checks:
        pieces.append(_row_pass(df, row_checks, cfg))
    # one shared lag window for every adjacent-pair rule; endpoint-only
    # SequenceChecks (allowed=None) have no pair rule and skip it
    adj_checks = (
        mono_checks
        + gap_checks
        + [c for c in seq_checks if c.allowed is not None]
    )
    if adj_checks:
        if cfg.window_chunk_size:
            pieces.append(_window_pass_chunked(df, adj_checks, cfg))
        else:
            pieces.append(_window_pass(df, adj_checks, cfg))
    seq_endpoint = [
        c for c in seq_checks if c.first is not None or c.last is not None
    ]
    if seq_endpoint:
        pieces.append(_seq_endpoint_pass(df, seq_endpoint, cfg))
    if rate_checks:
        pieces.append(_rate_pass(df, rate_checks, cfg))
    if run_checks:
        pieces.append(_runlength_pass(df, run_checks, cfg))
    if loop_checks:
        pieces.append(_periodic_pass(df, loop_checks, cfg))
    for c in uniq_checks:
        keys = tuple(c.keys or cfg.key_cols)
        if (
            cfg.uniqueness_via_window
            and not cfg.window_chunk_size  # chunked windows can't see dups across chunks
            and keys == (cfg.group_col, cfg.order_col)
        ):
            pieces.append(_uniqueness_via_window(df, c, cfg))
        else:
            pieces.append(_uniqueness_pass(df, c, cfg))
    for c in fd_checks:
        pieces.append(_fd_pass(df, c, cfg))
    if contig_checks or group_checks:
        pieces.append(_group_agg_pass(df, contig_checks, group_checks, cfg))
    for c in drift_checks:
        bq = c.baseline_quantiles
        if bq is None:
            if baseline is None:
                raise ValueError(
                    f"DriftCheck {c.check_id} has no baseline quantiles and no "
                    "baseline DataFrame was provided"
                )
            if c.method == "tdigest":
                bq = global_quantiles(
                    baseline, c.value_expr, c.probes, cfg.drift_centroids
                )
            elif c.method == "exact":
                bq = exact_global_quantiles(baseline, c.value_expr, c.probes)
            else:
                bq = approx_global_quantiles(baseline, c.value_expr, c.probes)
        if c.method == "tdigest":
            sk = sketch_by_partition(
                df,
                c.value_expr,
                cfg.partition_col,
                cfg.drift_centroids,
                cfg.drift_salt_buckets,
            )
            pieces.append(
                drift_violations(sk, bq, c.probes, c.threshold, c.check_id)
            )
        else:
            if c.method == "exact":
                q = exact_quantiles_by_partition(
                    df, c.value_expr, c.probes, cfg.partition_col
                )
            else:
                q = approx_quantiles_by_partition(
                    df, c.value_expr, c.probes, cfg.partition_col
                )
            pieces.append(
                drift_violations_approx(q, bq, c.threshold, c.check_id)
            )
    for c in cat_drift_checks:
        bc = c.baseline_counts
        if bc is None:
            if baseline is None:
                raise ValueError(
                    f"CategoricalDriftCheck {c.check_id} has no baseline "
                    "counts and no baseline DataFrame was provided"
                )
            bc = categorical_counts(baseline, c.cat_col)
        tv = categorical_tv(df, c.cat_col, cfg.partition_col, bc)
        pieces.append(categorical_drift_violations(tv, c.threshold, c.check_id))
    for c in corr_drift_checks:
        if c.baseline_corr is None and baseline is None:
            raise ValueError(
                f"CorrelationDriftCheck {c.check_id} has no baseline_corr "
                "and no baseline DataFrame was provided"
            )
        cd = correlation_drift(
            df,
            c.x_expr,
            c.y_expr,
            cfg.partition_col,
            baseline=baseline,
            baseline_corr=c.baseline_corr,
        )
        pieces.append(
            correlation_drift_violations(cd, c.threshold, c.check_id)
        )
    for c in cond_drift_checks:
        bc = c.baseline_counts
        if bc is None:
            if baseline is None:
                raise ValueError(
                    f"ConditionalDriftCheck {c.check_id} has no baseline "
                    "counts and no baseline DataFrame was provided"
                )
            bc = conditional_counts(baseline, c.cond_expr, c.cat_expr)
        ct = conditional_tv(
            df, c.cond_expr, c.cat_expr, cfg.partition_col, bc
        )
        pieces.append(
            conditional_drift_violations(ct, c.threshold, c.check_id)
        )
    for c in trans_drift_checks:
        seq = c.seq_col or cfg.group_col
        order = tuple(c.order_cols) or (cfg.order_col,)
        bc = c.baseline_counts
        if bc is None:
            if baseline is None:
                raise ValueError(
                    f"TransitionDriftCheck {c.check_id} has no baseline "
                    "counts and no baseline DataFrame was provided"
                )
            bc = transition_counts(
                baseline,
                seq,
                order,
                c.state_expr,
                include_boundaries=c.include_boundaries,
            )
        td = transition_drift(
            df,
            seq,
            order,
            c.state_expr,
            cfg.partition_col,
            bc,
            include_boundaries=c.include_boundaries,
        )
        pieces.append(
            transition_drift_violations(td, c.threshold, c.check_id)
        )
    for c in text_checks:
        pieces.append(
            text_equality_violations(
                df,
                c.reference,
                cfg.key_cols,
                c.text_col,
                cfg.partition_col,
                c.check_id,
                colocated=c.colocated,
            )
        )

    if vol_checks or comp_checks or card_checks:
        pieces.append(
            _health_pass(df, vol_checks, comp_checks, card_checks, cfg)
        )

    if not pieces:
        raise ValueError(
            "no supported checks: every entry in `checks` must be a known "
            "Check subclass (RowCheck, MonotoneCheck, SequenceCheck, "
            "RateCheck, RunLengthCheck, PeriodicLoopCheck, "
            "UniquenessCheck, FunctionalDependencyCheck, ContiguityCheck, "
            "GroupAggCheck, DriftCheck, CategoricalDriftCheck, "
            "CorrelationDriftCheck, ConditionalDriftCheck, "
            "TransitionDriftCheck, TextEqualityCheck, VolumeAnomalyCheck, "
            "CompletenessDriftCheck, CardinalityAnomalyCheck)"
        )
    violations = pieces[0]
    for p in pieces[1:]:
        violations = violations.unionAll(p)
    if cfg.persist_violations:
        violations = violations.persist()

    parts = df.select(
        F.col(cfg.partition_col).cast("string").alias("part")
    ).distinct()
    # literal_frame, NOT createDataFrame: the check registry is re-broadcast
    # on every verdict action, and a Python-parallelize plan re-spawns Python
    # workers each time (measured ~20s/action of zero-CPU wait on a loaded
    # box); the literal projection evaluates JVM-side in microseconds
    checks_df = literal_frame(
        spark,
        [(c.check_id, c.description) for c in checks],
        "check_id string, description string",
    )
    counts = violations.groupBy("part", "check_id").agg(
        F.count(F.lit(1)).alias("n_violations")
    )
    verdicts = (
        parts.crossJoin(F.broadcast(checks_df.select("check_id")))
        .join(counts, ["part", "check_id"], "left")
        .select(
            "part",
            "check_id",
            F.coalesce(F.col("n_violations"), F.lit(0)).alias("n_violations"),
            (F.coalesce(F.col("n_violations"), F.lit(0)) == 0).alias("passed"),
        )
    )
    return ValidationResult(
        verdicts=verdicts, violations=violations, cached_input=cached_input
    )


def sample_violations(violations: DataFrame, k: int = 10) -> DataFrame:
    """Reference-style capped report ("first 10 duplicates",
    tortilla/datamodel.py:243-254) under the canonical (conv_id, turn_idx)
    ordering, so truncation is deterministic under distribution."""
    w = Window.partitionBy("part", "check_id").orderBy(
        F.col("conv_id").asc_nulls_last(), F.col("turn_idx").asc_nulls_last(), "detail"
    )
    return (
        violations.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
