"""n-gram Jaccard near-duplicate detection.

Distributed shape (no cross join): explode distinct word n-gram shingles,
self-equi-join on the shingle (Catalyst shuffle-hash/sort-merge on the
shingle key — a well-distributed key), count shared shingles per pair, then
Jaccard = shared / (|A| + |B| - shared). The pair-generation join is the
only quadratic-ish step and it only pairs documents that actually share a
shingle. Very common shingles (stopword runs) explode pair counts at scale,
so ``max_shingle_freq`` drops shingles shared by more than that many docs —
the standard frequency-cap trick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens


def shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Precondition: ``id_col`` is a document key (one row per id). Per-doc
    distinctness comes from ``array_distinct`` BEFORE the explode, so the
    output needs no row-level ``.distinct()`` — each (id, shingle) row is
    unique by construction and the operator is a narrow map (scan →
    project → explode). The input is spread to the session's parallelism
    first when it arrives under-partitioned (scale.spread_for_compute —
    a single-row-group parquet file scans as ONE partition and would
    serialize the gram work behind one core; at warehouse scale the
    spread is a plan no-op).

    The token array is materialized as its own projection column before
    the gram lambda references it: a lambda inlines its captured
    expression tree, so an inline ``tokens(text)`` re-splits the whole
    text once PER GRAM — O(grams x text_len) per document (the HOF
    pitfall documented at dedup/winnow.py:_selection_from_hashes;
    measured ~1.8x on this builder at sf0.1)."""
    from ..scale import spread_for_compute

    if "_toks" in (id_col, text_col):
        raise ValueError("shingles reserves column name '_toks'")
    df = spread_for_compute(df.select(F.col(id_col), F.col(text_col)))
    toks = F.col("_toks")
    sh = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return (
        df.withColumn("_toks", tokens(text_col))
        .filter(F.size(toks) >= n)  # docs shorter than one shingle: no output
        .select(
            F.col(id_col).alias("id"),
            F.explode(F.array_distinct(sh)).alias("shingle"),
        )
    )


def doc_shingle_arrays(
    df: DataFrame, text_col: str, id_col: str, n: int = 3
) -> DataFrame:
    """Per-document DISTINCT shingle set as an ARRAY column: (id, sh_arr).
    The pre-explode form of :func:`shingles` — same tokenization, same
    ``array_distinct``, same short-doc filter, so
    ``explode(sh_arr)`` ≡ ``shingles(...)`` row-for-row. Verification
    stages use it to compute pair intersections with ONE
    ``array_intersect`` per candidate pair instead of re-deriving and
    re-shuffling the exploded shingle table (two full explode+join passes
    saved per verify)."""
    from ..scale import spread_for_compute

    if "_toks" in (id_col, text_col):
        raise ValueError("doc_shingle_arrays reserves column name '_toks'")
    df = spread_for_compute(df.select(F.col(id_col), F.col(text_col)))
    toks = F.col("_toks")
    sh = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return (
        df.withColumn("_toks", tokens(text_col))
        .filter(F.size(toks) >= n)
        .select(
            F.col(id_col).alias("id"),
            F.array_distinct(sh).alias("sh_arr"),
        )
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
    max_shingle_freq: int | None = 1000,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b) with exact n-gram Jaccard ≥
    threshold. Columns: id_a, id_b, jaccard.

    ``max_shingle_freq`` defaults ON (1000): a shingle appearing in f docs
    emits C(f,2) pairs, so one stopword-run shingle shared by 10^6 docs
    would alone produce 5*10^11 pairs at corpus scale. Dropping shingles
    with f > 1000 bounds the worst single-shingle fan-out at ~500k pairs
    while leaving near-duplicate signal intact (near-dups share many RARE
    shingles). Pass None to disable for small corpora where exactness
    against an uncapped definition matters."""
    sh = shingles(df, text_col, id_col, n)
    return pairs_from_shingles(sh, threshold, max_shingle_freq)


def jaccard_pairs_prefix(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard pairs via prefix filtering (AllPairs /
    PPJoin family — Bayardo et al. WWW'07, Xiao et al. WWW'08; public
    algorithms, no code consulted). Same result set as
    ``jaccard_pairs(..., max_shingle_freq=None)`` — exact, NO frequency
    cap — but candidate generation joins only each document's PREFIX:
    its first ``L - ceil(t*L) + 1`` shingles in a global
    rarest-first order.

    Why this is the 100-TB shape for EXACT joins (the capped brute join
    stays the oracle anchor; minhash stays the approximate path):

    * A shingle shared by f docs emits C(f,2) pairs in the brute join —
      super-linear in duplicate density. Here a hot shingle sits at the
      END of the rarest-first order, so it enters a doc's prefix only
      when the doc consists almost entirely of hot shingles: candidate
      fan-out concentrates on RARE shingles, which is where near-dup
      signal lives. Exactness is preserved (the frequency cap is not).
    * Prefix theorem: J(A,B) >= t implies |A∩B| >= t*|A| (since the
      length filter gives |B| >= t*|A|), so A's shared elements cannot
      all hide in its last ceil(t*|A|) - 1 positions — every qualifying
      pair collides on some prefix element of BOTH sides under the
      common total order.
    * Candidates are then pruned by the LENGTH filter
      (t*|A| <= |B| <= |A|/t, necessary for J >= t) and a POSITIONAL
      bound: with (pa, pb) the earliest matching prefix positions,
      |A∩B| <= least(pa, pb) - 1 + 1 + least(|A|-pa, |B|-pb); pairs
      whose bound falls below ceil(t/(1+t)*(|A|+|B|)) are dropped
      before exact verification. Both filters are necessary conditions,
      so the survivor set still contains every true pair.
    * Exact Jaccard is computed ONLY for survivors — one
      ``array_intersect`` over the two docs' distinct-shingle arrays per
      candidate pair (attached by id) — linear in candidate count, never
      the all-shared-shingle-pairs blowup.

    Shuffles: freq window + rank window (shingle then id key), prefix
    self-join (shingle key, rare keys by construction), verification
    joins (pair/id keys). All well-distributed; nothing quadratic in a
    hot shingle's document frequency.

    Columns: id_a, id_b, jaccard (>= threshold).
    """
    sh = shingles(df, text_col, id_col, n)
    # document frequency via a window COUNT over the shingle partition
    # instead of a groupBy + join back: the join form re-derived the
    # shingle subtree (scan, tokenize, gram explode) a second time for
    # the frequency table. sh is distinct per (id, shingle), so the
    # partition row count IS the shingle's document frequency — identical
    # values, one derivation and one join fewer.
    w_freq = Window.partitionBy("shingle")
    # rarest-first rank ordered by (_f, hash, shingle) instead of
    # (_f, shingle): the prefix theorem holds for ANY globally consistent
    # total order, and comparing a 64-bit hash is cheaper than comparing
    # shingle strings in the per-doc sort (the string stays as the final
    # tiebreak so hash collisions cannot make the order non-total; the
    # verified result set is order-invariant — exact jaccard >= t decides
    # membership, which the independent capless oracle checks end-to-end)
    w_rank = Window.partitionBy("id").orderBy(
        "_f", F.xxhash64("shingle"), "shingle"
    )
    w_all = Window.partitionBy("id")
    ranked = (
        sh.withColumn("_f", F.count(F.lit(1)).over(w_freq))
        .select(
            "id",
            "shingle",
            F.row_number().over(w_rank).alias("_p"),
            F.count(F.lit(1)).over(w_all).alias("_l"),
        )
    )
    t = float(threshold)
    prefix = ranked.filter(
        F.col("_p") <= F.col("_l") - F.ceil(F.lit(t) * F.col("_l")) + 1
    )
    a = prefix.select(
        F.col("id").alias("id_a"),
        "shingle",
        F.col("_p").alias("_pa"),
        F.col("_l").alias("_la"),
    )
    b = prefix.select(
        F.col("id").alias("id_b"),
        "shingle",
        F.col("_p").alias("_pb"),
        F.col("_l").alias("_lb"),
    )
    cand = (
        a.join(b, "shingle")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            # length filter: t*|A| <= |B| and t*|B| <= |A|
            & (F.col("_lb") >= F.lit(t) * F.col("_la"))
            & (F.col("_la") >= F.lit(t) * F.col("_lb"))
        )
        .groupBy("id_a", "id_b", "_la", "_lb")
        .agg(
            F.min("_pa").alias("_pam"),
            F.min("_pb").alias("_pbm"),
            F.max("_pa").alias("_pax"),
            F.max("_pb").alias("_pbx"),
            F.count(F.lit(1)).alias("_c"),
        )
        # positional overlap upper bounds vs the required overlap
        # alpha = ceil(t/(1+t) * (|A|+|B|)). Two valid bounds, both
        # applied (a pair must satisfy each, since each is an upper
        # bound on the true overlap):
        #  (1) first-collision bound (classic PPJoin): at most
        #      min(pa,pb)-1 shared elements can precede the first
        #      collision, plus min(|A|-pa, |B|-pb) after it.
        #  (2) collision-count bound (tighter when several prefix
        #      elements match): the join emits EVERY shingle lying in
        #      both prefixes, so _c counts all prefix-prefix matches.
        #      Positions are ranks in one GLOBAL total order
        #      ((_f, hash, string) is a function of the shingle alone),
        #      so the collision with the largest global rank holds BOTH
        #      maxima (_pax, _pbx); any shared element that is not a
        #      collision would, if it ranked before that last collision,
        #      sit inside both prefixes and therefore BE a collision —
        #      contradiction. Hence every extra shared element ranks
        #      after the last collision in both docs and
        #      overlap <= _c + min(|A|-_pax, |B|-_pbx).
        #      Measured at sf0.1/t=0.5: survivors 308.7k -> 119.7k, and
        #      the verify stage's work falls proportionally. Both
        #      filters are necessary conditions only — the exact-verify
        #      stage still decides membership, and the independent
        #      capless DuckDB oracle checks completeness end-to-end.
        .filter(
            (
                F.least("_pam", "_pbm")
                + F.least(
                    F.col("_la") - F.col("_pam"), F.col("_lb") - F.col("_pbm")
                )
                >= F.ceil(F.lit(t / (1.0 + t)) * (F.col("_la") + F.col("_lb")))
            )
            & (
                F.col("_c")
                + F.least(
                    F.col("_la") - F.col("_pax"), F.col("_lb") - F.col("_pbx")
                )
                >= F.ceil(F.lit(t / (1.0 + t)) * (F.col("_la") + F.col("_lb")))
            )
        )
        # _la/_lb are the docs' shingle counts — thread them as na/nb so
        # verification skips its own size pass over the shingles
        .select(
            "id_a", "id_b",
            F.col("_la").alias("na"), F.col("_lb").alias("nb"),
        )
    )
    # Verify via per-doc shingle ARRAYS attached by id, not the exploded
    # fan join (round 6): at realistic thresholds the length/positional
    # filters leave many candidates (308k at sf0.1 for 25 true pairs), so
    # the fan materializes sum-over-pairs |A| rows (~15M here) through a
    # (id_b, shingle) exchange, while one array_intersect per candidate
    # pair touches only the candidate docs' arrays (id-keyed joins; AQE
    # broadcasts the array side when small). |A∩B| over already-distinct
    # arrays equals the exploded join's shared count exactly — measured
    # value-identical, first execution 8.1s -> 3.7s at sf0.1/local[32].
    # (The minhash verify keeps the fan form: its bucket-capped candidate
    # set is orders of magnitude smaller, where array materialization
    # costs more than it saves — measured both ways.)
    arr = doc_shingle_arrays(df, text_col, id_col, n)
    pairs = cand.join(
        arr.select(F.col("id").alias("id_a"), F.col("sh_arr").alias("_sa")),
        "id_a",
    ).join(
        arr.select(F.col("id").alias("id_b"), F.col("sh_arr").alias("_sb")),
        "id_b",
    )
    shared = F.size(F.array_intersect(F.col("_sa"), F.col("_sb")))
    return (
        pairs.withColumn("shared", shared)
        .withColumn(
            "jaccard",
            F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _shared_counts(
    sh: DataFrame, max_shingle_freq: int | None = None
) -> DataFrame:
    """(id_a < id_b, shared, na, nb) for every pair sharing ≥ 1 shingle —
    the common core of the Jaccard and containment pair builders. Shingle
    frequency cap applied BEFORE sizing, so na/nb count capped shingles
    consistently with the shared count."""
    # One shingle derivation, windows instead of aggregations + joins
    # back (round-6): the groupBy+semi-join cap and the per-id size
    # aggregation each re-derived the shingle subtree (5 derivations
    # total including the self-join sides); here the frequency cap is a
    # COUNT over the shingle partition (sh is distinct per (id, shingle),
    # so the partition count IS the document frequency), the sizes na/nb
    # are a COUNT over the id partition riding one more exchange, and the
    # two self-join sides then share a single identical subtree (runtime
    # ReusedExchange). na/nb ride the pair join and the final groupBy
    # keys — no size joins at all. Values identical by construction.
    if max_shingle_freq is not None:
        w_freq = Window.partitionBy("shingle")
        sh = (
            sh.withColumn("_f", F.count(F.lit(1)).over(w_freq))
            .filter(F.col("_f") <= max_shingle_freq)
            .drop("_f")
        )
    w_id = Window.partitionBy("id")
    sized = sh.withColumn("n_sh", F.count(F.lit(1)).over(w_id))
    a = sized.select(
        F.col("id").alias("id_a"), "shingle", F.col("n_sh").alias("na")
    )
    b = sized.select(
        F.col("id").alias("id_b"), "shingle", F.col("n_sh").alias("nb")
    )
    return (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("shared"))
        .select("id_a", "id_b", "shared", "na", "nb")
    )


def pairs_from_shingles(
    sh: DataFrame,
    threshold: float = 0.2,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Jaccard pairs from a prebuilt (id, shingle) frame — lets callers
    (MinHash verification) reuse one persisted shingle computation."""
    return (
        _shared_counts(sh, max_shingle_freq)
        .withColumn(
            "jaccard",
            F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def containment_from_shingles(
    sh: DataFrame,
    threshold: float = 0.9,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Containment pairs from a prebuilt (id, shingle) frame: see
    :func:`containment_pairs`."""
    sc = _shared_counts(sh, max_shingle_freq)
    return (
        sc.withColumn(
            "containment", F.col("shared") / F.least("na", "nb")
        )
        .filter(F.col("containment") >= threshold)
        .withColumn(
            "contained_id",
            F.when(F.col("na") <= F.col("nb"), F.col("id_a")).otherwise(
                F.col("id_b")
            ),
        )
        .select("id_a", "id_b", "containment", "contained_id")
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.9,
    max_shingle_freq: int | None = 1000,
) -> DataFrame:
    """ASYMMETRIC near-duplicate pairs: shingle-set containment
    ``|A∩B| / min(|A|, |B|)`` ≥ threshold — the smaller document's shingles
    are (almost) all inside the larger one. Catches the doc-inside-doc
    shape symmetric Jaccard structurally misses: a 50-shingle quote fully
    embedded in a 5000-shingle page has containment 1.0 but Jaccard ~0.01,
    invisible at any sane Jaccard threshold (Broder's resemblance vs
    containment distinction, SEQUENCES'97 — public formulation). The
    standard curation use: drop or down-weight the contained copy
    (``contained_id`` — the smaller side, ties to ``id_a``) while keeping
    the containing page.

    Same distributed shape as :func:`jaccard_pairs` — shingle equi-join,
    never a cross join; the frequency cap bounds hot-shingle fan-out
    identically (capped shingles leave both the shared count AND the set
    sizes, so the ratio stays internally consistent). Columns: id_a, id_b
    (id_a < id_b), containment, contained_id."""
    sh = shingles(df, text_col, id_col, n)
    return containment_from_shingles(sh, threshold, max_shingle_freq)
