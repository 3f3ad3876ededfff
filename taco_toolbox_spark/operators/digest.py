"""Order-insensitive content digests: migration checks + conversation dedup.

A validation engine that blesses a corpus must also be able to say "this
REWRITE of the corpus is the same corpus": consolidation (S10), sharding,
re-partitioning, engine migrations, and resume-after-crash all need a
cheap proof that no row was lost, duplicated, or altered. Collecting and
comparing rows is impossible at 10^12 turns; instead each row hashes to a
small integer map-side and the digest is a pair of COMMUTATIVE combiners
over those hashes:

- ``n_rows``  — plain count;
- ``xor_d``   — ``bit_xor`` of the row hashes: order-independent,
  overflow-free at ANY group size, and mergeable across partials (the
  same algebra HLL/count-min state uses elsewhere in this repo);
- ``sum_d``   — sum of the row hashes, folded by ``pmod`` into the hash
  domain. Sum distinguishes the one case xor is blind to: a row appearing
  an EVEN number of times xors to nothing, so (count, xor) alone would
  match a corpus where one row was duplicated and another dropped twice.
  Exact (pre-fold) while a group holds < 2^23 rows at 40-bit hashes; past
  that Spark's non-ANSI long addition wraps mod 2^64 — still deterministic
  and order-independent (Java add is commutative/associative), just no
  longer bit-equal to an engine summing in 128-bit. The cross-engine
  oracle therefore runs at a scale where the sum is exact, and the
  at-scale contract is "compare digests produced by THIS library".

Everything is one map-side-combinable hash aggregation over a projection
— no window, no collect, no Python; the shuffle carries one partial
digest per (group, task). Two hash families, the repo-wide convention
(dedup/minhash.py:16-29, operators/sampling.py): ``xxhash64`` native
default, ``md5`` engine-portable (first 10 hex chars = 40 bits, replayed
verbatim by the DuckDB oracle).

Conversation-grain exact dedup falls out of the same digest: two
conversations are content-equal iff their per-turn (turn_idx, role, text)
multisets agree — ORDER IS ENCODED IN THE HASHED TUPLE (turn_idx is part
of the key), so the commutative combiner still certifies sequence
equality. That is the transcripts analog of document exact-dedup
(dedup/exact.py): the reference's duplicate-id report
(/root/reference/tacotoolbox/tortilla/datamodel.py:235-254) lifted from
rows to whole conversations, without ever materializing a rendered
conversation string.

Digest-grade, like every fingerprint dedup in this repo: equality is
certified up to hash collisions (~120 combined bits here: 40-bit xor +
40-bit sum + count); a paranoid pipeline can re-verify flagged groups
with operators/transcripts.render_conversations + a string compare.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import md5_prefix_long

#: Digest hash width. 40 bits keeps md5-mode arithmetic portable (a
#: 10-hex-char prefix parses exactly on any engine) and leaves 23 bits of
#: headroom under 2^63 for the sum combiner's exactness bound.
DIGEST_BITS = 40
_DOMAIN = 1 << DIGEST_BITS


def row_digest(
    cols: list[str], hash_fn: str = "xxhash64", seed: int = 0
) -> Column:
    """Per-row hash in [0, 2^40) over the listed columns — the map-side
    half of every digest here. NULL columns stay distinguishable from
    empty/absent ones: xxhash64 hashes NULL natively per position; md5
    mode coalesces each position to the control-char sentinel before the
    '\\x1f' join (same injectivity argument as operators/sampling.py)."""
    if hash_fn == "xxhash64":
        # Spark's xxhash64 SKIPS null arguments in its left fold, so
        # (NULL, '') and ('', NULL) would collide on the values alone.
        # Interleaving a per-position isnull flag keeps positions
        # injective without casting values to string.
        args: list[Column] = []
        for c in cols:
            args.append(F.isnull(F.col(c)).cast("tinyint"))
            args.append(F.col(c))
        h = F.xxhash64(*args, F.lit(seed))
        # top 40 of the 64 hash bits, as a non-negative long
        return F.shiftrightunsigned(h, 64 - DIGEST_BITS)
    if hash_fn == "md5":
        # the package-wide md5 key arithmetic (operators/sampling.py), at
        # the digest's 10-hex-char = 40-bit width
        return md5_prefix_long(cols, seed, DIGEST_BITS // 4)
    raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")


def digest_aggs() -> list[Column]:
    """The digest's commutative combiner triple over a ``_h`` row-hash
    column — the ONE definition batch ``content_digest``, the windowed
    streaming digest, and any future grouping share, so the documented
    batch==stream parity can't drift."""
    return [
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(_h)").alias("xor_d"),
        F.pmod(F.sum("_h"), F.lit(_DOMAIN)).alias("sum_d"),
    ]


def content_digest(
    df: DataFrame,
    content_cols: list[str],
    group_cols: list[str] | None = None,
    hash_fn: str = "xxhash64",
    seed: int = 0,
) -> DataFrame:
    """Per-group (or whole-frame) content digest: ``group_cols +
    (n_rows, xor_d, sum_d)``. Two frames hold the same multiset of
    ``content_cols`` tuples per group iff the digests match (up to the
    documented collision bound). ONE hash aggregation over a projection;
    digest rows are group-cardinality-sized — compare them with a join,
    or feed them to report.verdict_diff-style reconciliation."""
    if not content_cols:
        raise ValueError("content_cols must be non-empty")
    from ..scale import spread_for_compute

    # Hash compute runs where the rows sit: spread the column-pruned
    # input first so a single-row-group file doesn't serialize the whole
    # digest behind one core (scale.py rule 3 — a plan no-op at
    # warehouse scale, where scans already carry >= parallelism splits).
    pruned = list(dict.fromkeys([*(group_cols or []), *content_cols]))
    src = spread_for_compute(df.select(*pruned))
    h = row_digest(content_cols, hash_fn, seed).alias("_h")
    gb = src.select(*(group_cols or []), h).groupBy(*(group_cols or []))
    return gb.agg(*digest_aggs())


def digest_mismatches(
    left: DataFrame,
    right: DataFrame,
    group_cols: list[str],
) -> DataFrame:
    """Reconcile two ``content_digest`` outputs keyed by ``group_cols``:
    one row per group whose digest differs (or that exists on one side
    only), with both sides' components and a ``status`` in
    {'missing_right', 'missing_left', 'changed'}. Null-safe on group
    keys; the join is digest-cardinality-sized, not data-sized."""
    # Alias-qualify both sides: left and right often share lineage (the
    # "same corpus, rewritten" use case digests the SAME source twice),
    # which makes unqualified key references ambiguous in the self-join.
    lt = left.select(
        *[F.col(c).alias(f"_lk_{c}") for c in group_cols],
        *[F.col(c).alias(f"{c}_left") for c in ("n_rows", "xor_d", "sum_d")],
    )
    rt = right.select(
        *[F.col(c).alias(f"_rk_{c}") for c in group_cols],
        *[F.col(c).alias(f"{c}_right") for c in ("n_rows", "xor_d", "sum_d")],
    )
    cond = None
    for c in group_cols:
        eq = F.col(f"_lk_{c}").eqNullSafe(F.col(f"_rk_{c}"))
        cond = eq if cond is None else (cond & eq)
    j = lt.join(rt, on=cond, how="full_outer")
    status = (
        F.when(F.col("n_rows_right").isNull(), F.lit("missing_right"))
        .when(F.col("n_rows_left").isNull(), F.lit("missing_left"))
        .otherwise(F.lit("changed"))
    )
    # component compare must be null-safe: an EMPTY group digests to
    # (n_rows=0, xor_d=NULL, sum_d=NULL) — Spark's bit_xor/sum of zero
    # rows — and NULL == NULL would flag two identical empty corpora as
    # 'changed' (confirmed live before this guard)
    same = (
        F.col("n_rows_left").eqNullSafe(F.col("n_rows_right"))
        & F.col("xor_d_left").eqNullSafe(F.col("xor_d_right"))
        & F.col("sum_d_left").eqNullSafe(F.col("sum_d_right"))
    )
    keys = [
        F.coalesce(F.col(f"_lk_{c}"), F.col(f"_rk_{c}")).alias(c)
        for c in group_cols
    ]
    return (
        j.filter(~F.coalesce(same, F.lit(False)))
        .select(
            *keys,
            status.alias("status"),
            "n_rows_left",
            "n_rows_right",
            "xor_d_left",
            "xor_d_right",
            "sum_d_left",
            "sum_d_right",
        )
    )


def digest_union(
    digests: list[DataFrame],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Fold digest frames into the digest of the UNION of their inputs —
    the incremental-maintenance half of the algebra: append a partition,
    digest only the DELTA, and ``digest_union([old, delta])`` equals a
    full rescan (count adds, xor xors, sum adds mod 2^40 — all
    commutative AND associative, so any grouping/order of partials
    agrees). Compaction audits, snapshot digests, and rolling ingest
    certification all become digest-sized arithmetic instead of data
    passes. Input frames must share the digest schema
    (group_cols + n_rows/xor_d/sum_d) and the SAME hash family/seed —
    digests from different families are meaningless to combine."""
    if not digests:
        raise ValueError("digests must be non-empty")
    gcols = list(group_cols or [])
    need = set(gcols) | {"n_rows", "xor_d", "sum_d"}
    for i, d in enumerate(digests):
        missing = need - set(d.columns)
        if missing:
            raise ValueError(f"digest frame {i} is missing {sorted(missing)}")
    allp = digests[0]
    for d in digests[1:]:
        allp = allp.unionByName(d.select(*allp.columns))
    return allp.groupBy(*gcols).agg(
        F.sum("n_rows").alias("n_rows"),
        F.expr("bit_xor(xor_d)").alias("xor_d"),
        F.pmod(F.sum("sum_d"), F.lit(_DOMAIN)).alias("sum_d"),
    )


def certify_rewrite(
    before: DataFrame,
    after: DataFrame,
    content_cols: list[str],
    group_cols: list[str] | None = None,
    hash_fn: str = "xxhash64",
    seed: int = 0,
) -> DataFrame:
    """The consolidation / re-sharding / migration gate: certify that
    ``after`` holds the same multiset of ``content_cols`` tuples as
    ``before`` (per group, or globally) — empty result iff certified
    equal up to the documented collision bound. One pass over each side
    plus a digest-cardinality join; the pipeline shape is
    S10-consolidate → write → read-back → certify_rewrite(original,
    read_back) with zero row comparison. Reference analog: the
    row-count consistency gates of the validator
    (tortilla/datamodel.py:212-254) strengthened to content equality."""
    gcols = list(group_cols or [])
    a = content_digest(before, content_cols, gcols or None, hash_fn, seed)
    b = content_digest(after, content_cols, gcols or None, hash_fn, seed)
    if not gcols:
        # global digests are single rows; give the reconcile join a key
        a = a.withColumn("_scope", F.lit("all"))
        b = b.withColumn("_scope", F.lit("all"))
        gcols = ["_scope"]
    return digest_mismatches(a, b, gcols)


def digest_drilldown(
    before: DataFrame,
    after: DataFrame,
    content_cols: list[str],
    group_cols: list[str],
    mismatches: DataFrame,
) -> DataFrame:
    """Row-level witnesses for flagged groups — the paranoid second pass
    the digest docstring promises: restrict BOTH corpora to the groups
    ``certify_rewrite``/``digest_mismatches`` flagged (broadcast semi-join
    against the digest-sized mismatch frame) and diff exact rows with
    multiplicity (``exceptAll`` both ways). Output: group_cols +
    content_cols + ``side`` in {'missing_after', 'unexpected_after'}.

    Scale shape: the full corpus is scanned once per side but only
    flagged-group rows survive the semi-join into the (expensive)
    set-diff shuffle; with partition-grain groups, filter the scans by
    the flagged partition values first for partition pruning."""
    from pyspark.sql.functions import broadcast

    keys = mismatches.select(*group_cols).distinct()

    def _side(df: DataFrame) -> DataFrame:
        cond = None
        for c in group_cols:
            eq = df[c].eqNullSafe(keys[c])
            cond = eq if cond is None else (cond & eq)
        return df.join(broadcast(keys), cond, "left_semi").select(
            *group_cols, *content_cols
        )

    b, a = _side(before), _side(after)
    return b.exceptAll(a).withColumn(
        "side", F.lit("missing_after")
    ).unionAll(a.exceptAll(b).withColumn("side", F.lit("unexpected_after")))


def duplicate_conversation_groups(
    df: DataFrame,
    group_col: str = "conv_id",
    order_col: str = "turn_idx",
    content_cols: tuple[str, ...] = ("role", "text"),
    hash_fn: str = "xxhash64",
    seed: int = 0,
) -> DataFrame:
    """Conversation-grain exact dedup: groups of conversations whose
    whole turn sequence — (order, *content) per turn — is identical.
    Returns one row per duplicate group: ``(n_turns, xor_d, sum_d,
    n_convs, conv_ids)`` with the member ids sorted.

    Two shuffles, both bounded: the digest aggregation (one partial row
    per conversation per task) and the digest-keyed group (rows = number
    of conversations, never turns). No rendered-string materialization,
    no collect_list of turns — a 400-turn hot conversation costs its
    tasks 400 hash-and-fold steps, not a 400-line string build."""
    per_conv = content_digest(
        df,
        [order_col, *content_cols],
        group_cols=[group_col],
        hash_fn=hash_fn,
        seed=seed,
    )
    return (
        per_conv.groupBy(
            F.col("n_rows").alias("n_turns"), "xor_d", "sum_d"
        )
        .agg(
            F.count(F.lit(1)).alias("n_convs"),
            F.sort_array(F.collect_list(group_col)).alias("conv_ids"),
        )
        .filter(F.col("n_convs") > 1)
    )
