"""Trailing time-window aggregates (RANGE-frame windows) — event-rate /
burst validation over transcripts and event streams.

The engine's window passes so far are all ROW-frame (lag/lead ordering
checks, running totals); rate rules need a TIME frame: "no more than K
events per key in any trailing W seconds" (abuse / retry-storm / runaway-
agent detection — a turn-rate rule over conversations, an event-rate rule
over users). Expressed declaratively as a ``rangeBetween`` window over
truncated epoch seconds, Catalyst evaluates it in the SAME single sort
per key that the ordering checks use — no self-join, no explosion of
(row x window) pairs, one shuffle on the key.

Determinism contract: the frame is keyed on the INTEGER second
(``floor`` of epoch seconds — TIMESTAMP_NTZ parquet reads routed through
TIMESTAMP, ``operators/_time.py``; an independent engine reproduces it
as ``floor(epoch(ts))``). Rows sharing a truncated second share one frame
(RANGE semantics), so the result is independent of intra-second row
order — the property that makes the count reproducible bit-for-bit
across partitionings and engines. Only order-independent aggregates are
exposed (count / min / max); a float ``sum`` over a sliding frame would
hash-diverge across tie orders and engines.

Scale: one shuffle on ``keys``; a hot key serializes its own window sort
exactly like the engine's per-conversation ordering checks. Unlike those
(bounded conversations), rate keys can be UNBOUNDED-hot (one bot user =
one executor's month of events), so the mitigation is implemented
in-operator: ``chunk_seconds`` pre-splits every key by coarse time bucket
and reconciles the boundary by bin replication — each row is the EMITTER
in its own bucket and, when it falls within ``seconds`` of the next
bucket's start, also a non-emitting CONTEXT copy in that next bucket
(the rangejoin.py bin-replication move applied to a window). With
``chunk_seconds >= seconds`` a frame spans at most one boundary, so the
per-(key, bucket) RANGE window sees exactly the plain window's frame and
the counts are bit-identical (the ``w11_burst_rate_chunked`` oracle
replays the chunked path against the PLAIN window in DuckDB).
Replication is bounded by the fraction ``seconds / chunk_seconds``; the
hot key's sort shrinks from its full history to one bucket.

Beyond-reference training-pipeline/validation operator (SURVEY.md §6);
the reference validator has no time-rate rule surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ._time import epoch_seconds


def _trunc_epoch(df: DataFrame, ts_col: str) -> Column:
    """Truncated integer epoch second for the RANGE frame — routed
    through epoch_seconds so TIMESTAMP_NTZ (what a parquet read yields)
    works; floor(double seconds) == the oracle's floor(epoch(ts))."""
    return F.floor(epoch_seconds(df, ts_col)).cast("long")


#: Internal column names the chunked path appends; guarded against
#: collisions exactly like asof.py's reserved names.
_RESERVED = ("_epoch_s", "_bucket", "_ghost")


def _trailing_frame(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    seconds: int,
    chunk_seconds: int | None,
):
    """Shared scaffolding for the trailing-window family: returns
    ``(frame, window, chunked)`` where ``frame`` carries ``_epoch_s``
    (plus ``_bucket``/``_ghost`` on the chunked path) and ``window`` is
    the RANGE frame to aggregate over. Callers filter ``NOT _ghost``
    after windowing when ``chunked`` and drop :data:`_RESERVED`.

    Chunked exactness argument: a row at truncated second ``s`` in bucket
    ``b = floor(s / C)`` has frame ``[s - W, s]`` with ``W <= C``, so the
    frame reaches at most into bucket ``b - 1``; every bucket-``b-1`` row
    at second ``s' >= s - W >= b*C - W`` satisfies the ghost predicate
    ``s' >= (b'+1)*C - W`` (its own ``b' = b - 1``) and is therefore
    present as a context copy in bucket ``b``'s partition. No double
    count: a row's ghost lives only in the NEXT bucket's partition, never
    its own. NULL timestamps bucket to NULL — their own partition — which
    matches the plain window bit-for-bit because RANGE frames never mix
    NULL and non-NULL order keys."""
    if seconds < 0:
        raise ValueError(f"seconds must be >= 0, got {seconds}")
    clash = set(_RESERVED) & set(df.columns)
    if clash:
        raise ValueError(
            f"input columns collide with internal names: {sorted(clash)}"
        )
    base = df.withColumn("_epoch_s", _trunc_epoch(df, ts_col))
    if chunk_seconds is None:
        w = (
            Window.partitionBy(*[F.col(k) for k in keys])
            .orderBy(F.col("_epoch_s"))
            .rangeBetween(-int(seconds), 0)
        )
        return base, w, False
    c = int(chunk_seconds)
    if c < 1 or c < seconds:
        raise ValueError(
            f"chunk_seconds must be >= max(seconds, 1); got "
            f"chunk_seconds={chunk_seconds} seconds={seconds}"
        )
    bucket = F.floor(F.col("_epoch_s") / F.lit(c))
    real = base.withColumn("_bucket", bucket).withColumn(
        "_ghost", F.lit(False)
    )
    ghost = (
        base.filter(
            F.col("_epoch_s")
            >= (bucket + F.lit(1)) * F.lit(c) - F.lit(int(seconds))
        )
        .withColumn("_bucket", bucket + F.lit(1))
        .withColumn("_ghost", F.lit(True))
    )
    w = (
        Window.partitionBy(*[F.col(k) for k in keys], F.col("_bucket"))
        .orderBy(F.col("_epoch_s"))
        .rangeBetween(-int(seconds), 0)
    )
    return real.unionByName(ghost), w, True


def trailing_counts(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    seconds: int = 3600,
    out_col: str = "n_trailing",
    chunk_seconds: int | None = None,
) -> DataFrame:
    """Every input row plus ``out_col`` = how many rows of the same key
    fall in the trailing ``[t - seconds, t]`` window (both ends
    INCLUSIVE, at one-second resolution — the row itself counts, so the
    minimum value is 1). ``chunk_seconds`` (>= ``seconds``) switches to
    the skew-proof bucketed path (module docstring) with bit-identical
    output."""
    if out_col in df.columns:
        raise ValueError(f"input already has {out_col!r} — rename first")
    frame, w, chunked = _trailing_frame(
        df, keys, ts_col, seconds, chunk_seconds
    )
    out = frame.withColumn(out_col, F.count(F.lit(1)).over(w))
    if chunked:
        out = out.filter(~F.col("_ghost"))
    return out.drop(*_RESERVED)


def trailing_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    ts_col: str = "ts",
    seconds: int = 3600,
    chunk_seconds: int | None = None,
) -> DataFrame:
    """General trailing-window form: ``aggs`` maps output column name →
    aggregate Column (caller's responsibility to keep them
    order-independent — count/min/max/countDistinct-free; see module
    docstring). Each is evaluated over the same trailing RANGE frame.
    ``chunk_seconds`` as in :func:`trailing_counts` — valid for exactly
    the order-independent aggregates this form already requires (a ghost
    context copy contributes the same value as the original row)."""
    clash = (set(aggs) | set(_RESERVED)) & set(df.columns)
    if clash:
        raise ValueError(f"output names collide with input: {sorted(clash)}")
    reserved = set(aggs) & set(_RESERVED)
    if reserved:
        raise ValueError(
            f"agg output names collide with internal names: "
            f"{sorted(reserved)}"
        )
    out, w, chunked = _trailing_frame(
        df, keys, ts_col, seconds, chunk_seconds
    )
    for name, col in aggs.items():
        out = out.withColumn(name, col.over(w))
    if chunked:
        out = out.filter(~F.col("_ghost"))
    return out.drop(*_RESERVED)


def burst_violations(
    df: DataFrame,
    keys: Sequence[str],
    max_events: int,
    ts_col: str = "ts",
    seconds: int = 3600,
    check_id: str = "burst_rate",
    chunk_seconds: int | None = None,
) -> DataFrame:
    """Violation rows for the rate rule "at most ``max_events`` rows per
    key in any trailing ``seconds`` window": one row per input row whose
    trailing count exceeds the bound, carrying (check_id, keys..., ts,
    n_trailing). The FIRST ``max_events`` rows of a burst are compliant
    by construction — only the overflow rows fire, so fixing a burst
    means dropping exactly the flagged rows. ``chunk_seconds`` as in
    :func:`trailing_counts` (bit-identical output; pick it when a single
    key's history outgrows one task's sort)."""
    if max_events < 1:
        raise ValueError(f"max_events must be >= 1, got {max_events}")
    # NULL timestamps never fire a rate rule (they are the row pass's
    # not-null problem) — the same exemption the engine RateCheck and the
    # streaming twin apply, so all three emit identical violation sets
    counted = trailing_counts(
        df.filter(F.col(ts_col).isNotNull()), keys, ts_col, seconds,
        chunk_seconds=chunk_seconds,
    )
    return counted.filter(F.col("n_trailing") > max_events).select(
        F.lit(check_id).alias("check_id"),
        *[F.col(k) for k in keys],
        F.col(ts_col),
        F.col("n_trailing"),
    )
