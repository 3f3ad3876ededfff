"""Deterministic hash-based sampling — reproducible corpus subsetting.

A 100-TB training-data pipeline cannot use ``rand()`` sampling: a retried
task re-rolls the dice, a resumed run samples a different subset, and two
engines can never agree on what was kept. Hash sampling fixes all three:
a row is kept iff ``h(key, seed) mod D < fraction * D``, a pure
deterministic function of the row's key — stable across retries, resumes,
engines, and cluster sizes, and consistent ACROSS TABLES (sampling two
tables by the same join key keeps matching rows in both, so joins survive
the sample).

Scale shape: the predicate is a pure JVM column expression — no shuffle,
no state, evaluated inside WholeStageCodegen right above the scan. At any
data size the cost is one hash per row; the selectivity reaches Parquet
row-group pruning only via stats on the key column (none for a hash), so
the scan is full but the downstream pipeline sees ``fraction`` of rows.

Two hash families, mirroring dedup/minhash.py's convention
(minhash.py:16-29): ``xxhash64`` (library default, fastest, engine-
specific) and ``md5`` (portable: the first 8 hex chars as a 32-bit int is
reproducible in any engine — the DuckDB oracle replicates it verbatim).

Reference parity: tacotoolbox exposes no sampler; this is one of the
beyond-reference training-pipeline operators (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Modulus for the keep-threshold arithmetic. 1e6 buckets give sampling
#: fractions a resolution of 1e-6 while keeping md5-mode arithmetic in
#: 32-bit-safe range on every engine.
SAMPLE_BUCKETS = 1_000_000

#: Separator for multi-column keys — a control char that cannot appear in
#: the id/text columns sampled here, so ("ab","c") never collides with
#: ("a","bc").
_SEP = "\x1f"

#: Sentinel standing in for a NULL key column in md5 mode. concat_ws
#: SKIPS null inputs entirely, which would serialize ('a', NULL, 'b') and
#: ('a', 'b', NULL) both as 'a\\x1fb' — breaking _SEP's injectivity
#: guarantee. Coalescing each column to this control-char sentinel keeps
#: every position present (control chars cannot appear in the id/text
#: columns sampled here, so no real value collides with it).
_NULL = "\x00"


def md5_prefix_long(
    key_cols: list[str], seed: int, hex_chars: int
) -> Column:
    """THE engine-portable md5 key hash, in one place: columns cast to
    string, coalesced to the ``_NULL`` sentinel (injectivity under
    concat_ws's null-skipping), '\\x1f'-joined, seed appended behind one
    more separator, first ``hex_chars`` hex chars parsed as a
    non-negative long (4 bits each). Every md5-family operator
    (sampling buckets at 8 chars, digests at 10) and every DuckDB oracle
    replay derives from this exact arithmetic — change it here and the
    oracles break loudly, change a copy and they'd diverge silently."""
    key = F.concat_ws(
        _SEP,
        *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL))
          for c in key_cols],
    )
    return F.conv(
        F.substring(
            F.md5(F.concat(key, F.lit(_SEP + str(seed)))), 1, hex_chars
        ),
        16,
        10,
    ).cast("long")


def hash_bucket(
    key_cols: list[str],
    seed: int = 0,
    hash_fn: str = "xxhash64",
    buckets: int = SAMPLE_BUCKETS,
) -> Column:
    """Uniform bucket in [0, buckets) as a deterministic function of the
    key columns + seed. ``xxhash64``: native 64-bit hash (fast path).
    ``md5``: first-32-bits-of-md5 over the '\\x1f'-joined key string with
    the seed appended — portable to any engine with md5."""
    if hash_fn == "xxhash64":
        h = F.xxhash64(*[F.col(c) for c in key_cols], F.lit(seed))
    elif hash_fn == "md5":
        h = md5_prefix_long(key_cols, seed, 8)
    else:  # pragma: no cover - guarded by callers
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")
    return F.pmod(h, F.lit(buckets))


def hash_keep_predicate(
    key_cols: list[str],
    fraction: float,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> Column:
    """The keep-decision of ``hash_sample`` as a standalone boolean Column
    — composable into a single-pass funnel aggregation (count kept rows
    without a separate filtered scan) or any other expression context."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    thr = int(round(fraction * SAMPLE_BUCKETS))
    return hash_bucket(key_cols, seed, hash_fn) < F.lit(thr)


def hash_sample(
    df: DataFrame,
    key_cols: list[str],
    fraction: float,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows, selected by key hash.

    The kept set is a function of (key, seed) only: rerunning, resuming,
    or scaling the job keeps EXACTLY the same rows, and sampling another
    table by the same key keeps the matching rows there too.
    """
    return df.filter(hash_keep_predicate(key_cols, fraction, seed, hash_fn))


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str | None, float],
    key_cols: list[str],
    default_fraction: float = 0.0,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum value gets its own
    keep-fraction (unlisted strata get ``default_fraction``; a ``None``
    key sets the fraction for NULL strata — a plain equality would
    NULL-compare and silently drop them). The per-stratum threshold is a
    broadcast literal CASE expression — still zero-shuffle, still
    WholeStageCodegen; this is ``df.sampleBy`` minus the nondeterminism.
    Down-weighting over-represented sources (web crawl vs books) is the
    canonical training-mix use."""
    return df.filter(
        stratified_keep_predicate(
            strata_col, fractions, key_cols, default_fraction, seed, hash_fn
        )
    )


def stratified_keep_predicate(
    strata_col: str,
    fractions: dict[str | None, float],
    key_cols: list[str],
    default_fraction: float = 0.0,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> Column:
    """``stratified_hash_sample``'s keep-decision as a boolean Column —
    see ``hash_keep_predicate`` for why the predicate form exists."""
    for v, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {v!r} must be in [0, 1], got {frac}")
    thr = F.lit(int(round(default_fraction * SAMPLE_BUCKETS)))
    for v, frac in sorted(fractions.items(), key=lambda kv: (kv[0] is None, str(kv[0]))):
        cond = (
            F.col(strata_col).isNull()
            if v is None
            else F.col(strata_col) == F.lit(v)
        )
        thr = F.when(cond, F.lit(int(round(frac * SAMPLE_BUCKETS)))).otherwise(thr)
    return hash_bucket(key_cols, seed, hash_fn) < thr


def weighted_keep_predicate(
    weight: Column,
    key_cols: list[str],
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> Column:
    """Per-row weighted deterministic sampling: keep a row with
    probability ``weight`` (a per-row Column in [0, 1] — e.g. a quality
    score), decided by the same key hash the uniform samplers use, so the
    kept set stays a pure function of (key, seed, weight expression).

    Weights are clamped into [0, 1]; NULL weights keep nothing (NULL
    comparison is falsy). The threshold uses ``floor`` (truncation), not
    ``round``, so any engine replaying the same float64 arithmetic lands
    on the identical bucket cutoff. Quality-weighted corpus thinning
    ("keep good docs with p≈1, boilerplate with p≈0.05") is the canonical
    use — the DoReMi/quality-resampling shape."""
    w = F.least(F.greatest(weight.cast("double"), F.lit(0.0)), F.lit(1.0))
    thr = F.floor(w * F.lit(float(SAMPLE_BUCKETS))).cast("long")
    return hash_bucket(key_cols, seed, hash_fn) < thr


def weighted_hash_sample(
    df: DataFrame,
    weight: Column,
    key_cols: list[str],
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Keep each row with probability = its ``weight`` column (clamped to
    [0, 1]), deterministically — see ``weighted_keep_predicate``. Still a
    pure zero-shuffle JVM predicate above the scan."""
    return df.filter(weighted_keep_predicate(weight, key_cols, seed, hash_fn))


def mixture_sample(
    df: DataFrame,
    source_col: str,
    target_props: dict[str, float],
    total_target: int,
    key_cols: list[str],
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Data mixing: subsample each source so the output approximates
    ``total_target`` rows in the given per-source proportions.

    Each source's keep-rate is ``min(1, target_props[s] * total_target /
    n_s)`` — the plain mixing rule (a source too small to fill its quota
    saturates at rate 1 and the realized mix under-represents it; callers
    who need exact proportions must shrink ``total_target`` to the
    binding source). Sources absent from ``target_props`` get rate 0.

    Fully declarative, no driver round-trip: per-source counts come from
    one cheap low-cardinality aggregation that is **broadcast** back onto
    the corpus scan, and the keep decision is the same deterministic hash
    predicate as ``hash_sample`` with a per-source float64 threshold
    (``floor`` truncation — engine-replayable). At 100 TB this is two
    corpus scans (count pass + filter pass) with no corpus-side shuffle;
    persist the counts frame to make the second scan the only full one."""
    if total_target < 0:
        raise ValueError(f"total_target must be >= 0, got {total_target}")
    for s, p in target_props.items():
        if p < 0:
            raise ValueError(f"target proportion for {s!r} must be >= 0, got {p}")
    if "_n" in df.columns:
        raise ValueError("column '_n' collides with mixture_sample's internal name")
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    prop = F.lit(0.0)
    for s, p in sorted(target_props.items()):
        prop = F.when(F.col(source_col) == F.lit(s), F.lit(float(p))).otherwise(prop)
    rate = F.least(
        F.lit(1.0), prop * F.lit(float(total_target)) / F.col("_n").cast("double")
    )
    thr = F.floor(rate * F.lit(float(SAMPLE_BUCKETS))).cast("long")
    return (
        df.join(F.broadcast(counts), source_col)
        .filter(hash_bucket(key_cols, seed, hash_fn) < thr)
        .select(*df.columns)  # drop _n, restore the input column order
    )


def temperature_rates(counts: dict[str, int], alpha: float, total_target: int) -> dict[str, float]:
    """Temperature-based mixing rates (multilingual-LM style): target
    proportions ∝ ``n_s ** alpha`` (alpha < 1 flattens the source
    distribution, alpha = 1 is proportional = no reweighting), scaled so
    the expected output is ``total_target`` rows, each rate capped at 1.

    Driver-side pure function over the per-source count dict (sources are
    few); feed the result to ``stratified_hash_sample`` /
    ``stratified_keep_predicate``. ``pow`` keeps this out of the exact
    cross-engine oracle path — covered by tolerance tests instead."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if min(counts.values(), default=1) < 1:
        raise ValueError("per-source counts must be >= 1")
    w = {s: float(n) ** alpha for s, n in counts.items()}
    z = sum(w.values())
    return {
        s: min(1.0, (w[s] / z) * total_target / counts[s]) for s in counts
    }


def hash_sample_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    key_cols: list[str],
    k: int,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic uniform without-replacement sample of (at most) ``k``
    rows per group: rank each group's rows by key hash, keep the k
    smallest. The distributed, rerun-stable analog of per-group reservoir
    sampling — fixed OUTPUT SIZE per group where the fraction samplers fix
    the rate, which is what eval-set carving and per-source caps need.

    Scale shape: one shuffle on the group key + a per-group
    row_number window (rank <= k prunes early under WholeStageCodegen);
    no global sort, no driver state. Hash ties are broken by the key
    columns themselves, so the kept set is total-order deterministic."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    reserved = {"_h", "_rank"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"columns {sorted(reserved)} collide with "
            "hash_sample_k_per_group's internal names; rename them first"
        )
    from .topk import topk_per_group

    h = hash_bucket(key_cols, seed, hash_fn)
    return topk_per_group(
        df.withColumn("_h", h),
        group_cols,
        [F.col("_h"), *[F.col(c) for c in key_cols]],
        k,
        rank_col="_rank",
    ).drop("_h", "_rank")


def hash_split(
    df: DataFrame,
    key_cols: list[str],
    splits: dict[str, float],
    seed: int = 0,
    hash_fn: str = "xxhash64",
    split_col: str = "split",
    buckets: int = 1_000_000,
) -> DataFrame:
    """Deterministic train/val/test assignment: each row gets a split
    label from its key hash, so the SAME key always lands in the SAME
    split — across runs, engines (md5 mode), corpus growth, and
    re-partitioning. Split boundaries are cumulative bucket ranges in the
    given dict order (insertion-ordered; document your order once and
    keep it). Pure projection: zero shuffle, zero actions — the label is
    a column expression the scan can pipeline, and a filter on it
    composes with every other keep-predicate in this module.

    ``splits`` maps label -> fraction; fractions must sum to <= 1 (any
    remainder is labelled NULL — useful for holding data back). Keying by
    a GROUP id (e.g. conv_id) keeps whole conversations in one split —
    the leakage rule every eval pipeline needs."""
    if split_col in df.columns:
        raise ValueError(f"input already has a {split_col!r} column")
    total = sum(splits.values())
    if total > 1 + 1e-9 or any(v < 0 for v in splits.values()):
        raise ValueError(f"split fractions must be >= 0 and sum <= 1: {splits}")
    b = hash_bucket(key_cols, seed=seed, buckets=buckets, hash_fn=hash_fn)
    expr = F.lit(None).cast("string")
    edges = []
    acc = 0.0
    for name, frac in splits.items():
        lo = int(round(acc * buckets))
        acc += frac
        hi = int(round(acc * buckets))
        edges.append((name, lo, hi))
    # build the CASE from the last range backward so the first range ends
    # up outermost (readable plan, same semantics)
    for name, lo, hi in reversed(edges):
        expr = F.when((b >= lo) & (b < hi), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)
