"""Conversation-level operators for transcript corpora: structural
profiles and token-budget truncation — the per-conversation prep stages a
training pipeline runs between validation and packing.

Both are single-pass by construction: the profile is ONE groupBy with
map-side partial aggregation (one row per conversation crosses the
shuffle regardless of conversation length); truncation is ONE cumulative
window over the same (conv, turn) key shape every other pass in this
repo shuffles by — co-located inputs (operators/bucketing.py) run it
exchange-free.

Reference analog: per-collection structural summaries
(tacotoolbox metadata/stats families) realized at the conversation
grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def conversation_profile(
    df: DataFrame,
    group_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Per-conversation structural profile: turn count, distinct roles,
    tool-turn count, wall-clock duration (seconds), total text characters,
    opening/closing roles. One map-side-combined aggregation; every field
    is exact integer/epoch arithmetic so an independent engine reproduces
    it bit-for-bit."""
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.countDistinct(role_col).alias("n_roles"),
        F.sum(
            F.when(F.col(role_col) == "tool", 1).otherwise(0)
        ).alias("n_tool_turns"),
        (
            F.max(F.col(ts_col)).cast("double")
            - F.min(F.col(ts_col)).cast("double")
        ).alias("duration_s"),
        F.sum(
            F.coalesce(F.length(text_col), F.lit(0)).cast("bigint")
        ).alias("n_chars"),
        F.min_by(F.col(role_col), F.col(order_col)).alias("opening_role"),
        F.max_by(F.col(role_col), F.col(order_col)).alias("closing_role"),
    )


def truncate_to_token_budget(
    df: DataFrame,
    budget: int,
    group_col: str = "conv_id",
    order_col: str = "turn_idx",
    text_col: str = "text",
    count_mode: str = "whitespace",
) -> DataFrame:
    """Keep each conversation's PREFIX of turns whose cumulative token
    count fits ``budget`` (a turn that would cross the budget is dropped
    with everything after it — conversations are never cut mid-turn, and
    a retained suffix gap never appears). Adds ``turn_tokens``, ``
    cum_tokens`` and a per-conversation ``truncated`` flag. One cumulative
    window by (group, order); token counting is the repo's JVM-side
    whitespace or BPE-ish regex counter (functions/text.py) — no Python.

    NULL text counts 0 tokens (it is the validation battery's problem,
    not the packer's)."""
    from ..functions.text import bpe_ish_token_count, token_count

    if count_mode == "whitespace":
        toks = token_count(F.col(text_col))
    elif count_mode == "bpe_ish":
        toks = bpe_ish_token_count(F.col(text_col))
    else:
        raise ValueError(
            f"count_mode must be 'whitespace' or 'bpe_ish', got {count_mode!r}"
        )
    reserved = {"turn_tokens", "cum_tokens", "truncated"} & set(df.columns)
    if reserved:
        raise ValueError(f"input columns collide with outputs: {reserved}")
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wg = Window.partitionBy(group_col)
    out = (
        df.withColumn(
            "turn_tokens",
            # explicit NULL branch: size(NULL) is -1 with ANSI off
            F.when(F.col(text_col).isNull(), F.lit(0))
            .otherwise(toks)
            .cast("bigint"),
        )
        .withColumn("cum_tokens", F.sum("turn_tokens").over(w))
        .withColumn("truncated", F.max(F.col("cum_tokens") > budget).over(wg))
    )
    return out.filter(F.col("cum_tokens") <= budget)


def chunk_conversations(
    df: DataFrame,
    window_turns: int,
    stride_turns: int | None = None,
    group_col: str = "conv_id",
    order_col: str = "turn_idx",
) -> DataFrame:
    """Sliding context windows over each conversation: window ``w`` covers
    turn POSITIONS ``[w·stride, w·stride + window)`` (positions =
    ``order_col`` values, which are 0..n−1 contiguous after
    :func:`reindex_turns`), so every consecutive-``window_turns`` slice at
    ``stride_turns`` spacing becomes a training context. Appends
    ``window_id``; a turn belonging to several overlapping windows is
    REPLICATED once per window — the replication factor is exactly
    ``⌈window/stride⌉``, a constant chosen by the caller, never data-
    dependent (contrast a self-join formulation, whose fan-out floats
    with conversation length).

    Pure narrow plan: one ``explode(sequence(lo, hi))`` over integer
    arithmetic — no shuffle, no window pass, no state. Downstream
    grouping by (group, window_id) shuffles the replicated rows once,
    exactly like any other battery pass. ``stride_turns=None`` means
    non-overlapping back-to-back windows (stride = window)."""
    stride = window_turns if stride_turns is None else stride_turns
    if window_turns < 1 or stride < 1:
        raise ValueError(
            f"need window_turns ≥ 1 and stride_turns ≥ 1, got "
            f"{window_turns}/{stride}"
        )
    if stride > window_turns:
        raise ValueError(
            f"stride_turns {stride} > window_turns {window_turns} would "
            "skip turns entirely"
        )
    if "window_id" in df.columns:
        raise ValueError("input column 'window_id' collides with the output")
    p = F.col(order_col).cast("bigint")
    # windows whose span [w*stride, w*stride+window) contains position p:
    # ceil((p - window + 1) / stride) <= w <= floor(p / stride), clamped at 0
    lo = F.greatest(
        F.lit(0),
        -F.floor((F.lit(window_turns - 1) - p) / F.lit(stride)),
    ).cast("bigint")
    hi = F.floor(p / F.lit(stride)).cast("bigint")
    # hi < lo only for NEGATIVE positions (a validation problem, not a
    # chunking one) — drop such rows rather than let sequence() run
    # DESCENDING and fabricate windows
    wins = F.when(hi >= lo, F.sequence(lo, hi))
    return df.withColumn("window_id", F.explode(wins))


def render_conversations(
    df: DataFrame,
    group_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Flatten each conversation into ONE training document:
    ``<role> text`` lines joined by ``sep`` in turn order — the chat→flat
    rendering step between validation and tokenization. Returns
    ``(group, text, n_turns, n_chars)``.

    One grouped aggregation: lines collect per conversation and sort by
    ``(order, line)`` — the line is in the sort key so duplicate order
    values (a corrupted corpus) still render identically on any engine —
    then join. NULL role/text render as empty strings (never a NULL line,
    so no engine-specific NULL-skipping ambiguity). State per group is
    bounded by conversation length; hot conversations are a bounded-skew
    concern, not an unbounded one, and the shuffle carries one struct per
    turn (no window pass)."""
    line = F.concat(
        F.lit("<"),
        F.coalesce(F.col(role_col).cast("string"), F.lit("")),
        F.lit("> "),
        F.coalesce(F.col(text_col), F.lit("")),
    )
    pairs = df.select(
        group_col,
        F.struct(F.col(order_col).alias("o"), line.alias("l")).alias("p"),
    )
    out = pairs.groupBy(group_col).agg(
        F.array_sort(F.collect_list("p")).alias("_ps"),
        F.count(F.lit(1)).alias("n_turns"),
    )
    text = F.array_join(F.transform(F.col("_ps"), lambda s: s["l"]), sep)
    return out.select(
        group_col,
        text.alias("text"),
        "n_turns",
        F.length(text).cast("bigint").alias("n_chars"),
    )


def render_with_loss_spans(
    df: DataFrame,
    group_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    sep: str = "\n",
    mask_roles: tuple[str, ...] = ("assistant",),
) -> DataFrame:
    """:func:`render_conversations` plus LOSS SPANS — the SFT training-prep
    primitive: each conversation flattens to one document AND an array of
    (start, end) character offsets covering exactly the rendered lines
    whose role is in ``mask_roles`` (default: train on assistant turns
    only). Offsets are 0-based, end-exclusive, over the rendered text; a
    span covers the WHOLE ``<role> text`` line including the tag (the
    tokenizer-side masker decides whether to drop the tag — character
    truth is what this operator owes it). Returns
    ``(group, text, spans array<struct<start,end>>, n_turns, n_chars)``.

    Same single grouped aggregation as the renderer — the span arithmetic
    is ONE ``F.aggregate`` left-fold over the already-sorted line array
    (running char position + conditional span append), pure JVM
    expressions, no window pass, no second shuffle. Duplicate order keys
    sort by (order, line, role) so corrupted corpora render and mask
    identically on any engine; NULL role/text render as empty strings and
    a NULL role is never in ``mask_roles``."""
    line = F.concat(
        F.lit("<"),
        F.coalesce(F.col(role_col).cast("string"), F.lit("")),
        F.lit("> "),
        F.coalesce(F.col(text_col), F.lit("")),
    )
    pairs = df.select(
        group_col,
        F.struct(
            F.col(order_col).alias("o"),
            line.alias("l"),
            F.coalesce(F.col(role_col).cast("string"), F.lit("")).alias("r"),
        ).alias("p"),
    )
    out = pairs.groupBy(group_col).agg(
        F.array_sort(F.collect_list("p")).alias("_ps"),
        F.count(F.lit(1)).alias("n_turns"),
    )
    sep_len = len(sep)
    roles = [F.lit(r) for r in mask_roles]
    zero = F.struct(
        F.lit(0).cast("long").alias("pos"),
        F.array().cast("array<struct<start:bigint,end:bigint>>").alias(
            "spans"
        ),
    )
    spans = F.aggregate(
        F.col("_ps"),
        zero,
        lambda acc, s: F.struct(
            (acc["pos"] + F.length(s["l"]) + F.lit(sep_len)).alias("pos"),
            F.when(
                s["r"].isin(*roles) if roles else F.lit(False),
                F.array_append(
                    acc["spans"],
                    F.struct(
                        acc["pos"].alias("start"),
                        (acc["pos"] + F.length(s["l"])).alias("end"),
                    ),
                ),
            )
            .otherwise(acc["spans"])
            .alias("spans"),
        ),
        lambda acc: acc["spans"],
    )
    text = F.array_join(F.transform(F.col("_ps"), lambda s: s["l"]), sep)
    return out.select(
        group_col,
        text.alias("text"),
        spans.alias("spans"),
        "n_turns",
        F.length(text).cast("bigint").alias("n_chars"),
    )


def reindex_turns(
    df: DataFrame,
    group_col: str = "conv_id",
    order_col: str = "turn_idx",
    keep_original: str | None = "orig_turn_idx",
) -> DataFrame:
    """Renumber ``order_col`` to be exactly contiguous ``0..n−1`` per
    conversation, preserving the existing order — the repair step after
    any turn-dropping stage (quality filters, token-budget truncation,
    PII row quarantine) so downstream consumers can rely on the
    ContiguityCheck invariant again. Ties on ``order_col`` are impossible
    for inputs that pass the uniqueness check; for dirty inputs the
    renumbering is still deterministic (ties broken by the original value
    only, which is the whole ordering key).

    ``keep_original`` names a column that retains the pre-repair index
    (lineage for violation-row joins); None drops it. One window over the
    battery's (group, order) key shape — exchange-free on co-located
    (bucketed) layouts, exactly like the truncation pass above."""
    if keep_original in (group_col, order_col):
        raise ValueError(
            f"keep_original {keep_original!r} collides with an input column"
        )
    if keep_original is not None and keep_original in df.columns:
        raise ValueError(
            f"input column {keep_original!r} collides with keep_original"
        )
    w = Window.partitionBy(group_col).orderBy(order_col)
    renumbered = df.withColumn(
        "_new_idx", (F.row_number().over(w) - F.lit(1)).cast("int")
    )
    out_cols = []
    for c in df.columns:
        if c == order_col:
            out_cols.append(F.col("_new_idx").alias(order_col))
            if keep_original is not None:
                out_cols.append(F.col(order_col).alias(keep_original))
        else:
            out_cols.append(F.col(c))
    return renumbered.select(*out_cols)
