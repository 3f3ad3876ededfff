"""SimHash near-duplicate fingerprints — pure Spark bit arithmetic.

64-bit simhash: each token hashes to 64 bits; each bit position accumulates
+1/-1 over tokens; the sign per position forms the fingerprint. Documents
are near-duplicates when hamming(simhash_a, simhash_b) ≤ k.

Implementation avoids per-row Python entirely: explode tokens, compute the
per-bit ±1 contributions with shiftright/bitwise-and column expressions,
aggregate 64 sums per doc, reassemble the fingerprint. The candidate join
uses hamming-ball blocking on 4 16-bit chunks (two fingerprints within
hamming distance 3 must agree on at least one chunk — pigeonhole).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def _md5_halves(c) -> tuple[F.Column, F.Column]:
    """(hi32, lo32) of the first 64 bits of md5(c) — an engine-portable
    token hash: DuckDB's ``('0x' || substr(md5(x),1,8))::BIGINT`` computes
    the identical value, so an md5-mode simhash pipeline can be replicated
    bit-for-bit in oracle SQL (each half < 2^32, no sign issues)."""
    m = F.md5(c)
    hi = F.conv(F.substring(m, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(m, 9, 8), 16, 10).cast("long")
    return hi, lo


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, simhash long): 64-bit simhash per document.

    ``hash_fn``: "xxhash64" (default — fastest, Spark-only) or "md5"
    (first 64 bits of md5, bit-identical to DuckDB's md5() so the whole
    pipeline is independently recomputable by another engine; ~2x slower
    token hashing, same everything else). An under-partitioned input is
    spread to the session parallelism before the token explode
    (scale.spread_for_compute; no-op at warehouse scale)."""
    from ..scale import spread_for_compute

    slim = spread_for_compute(df.select(F.col(id_col), F.col(text_col)))
    tok = slim.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("tok")
    )
    if hash_fn == "xxhash64":
        tok = tok.withColumn("h", F.xxhash64("tok"))

        def bit(b: int) -> F.Column:
            return F.shiftright("h", b).bitwiseAND(F.lit(1))

    elif hash_fn == "md5":
        hi, lo = _md5_halves(F.col("tok"))
        tok = tok.withColumn("hi", hi).withColumn("lo", lo)

        def bit(b: int) -> F.Column:
            half = F.col("lo") if b < 32 else F.col("hi")
            return F.shiftright(half, b % 32).bitwiseAND(F.lit(1))

    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")
    # per-bit contribution: +1 if bit set else -1, branch-free
    # (2*bit - 1 instead of CASE WHEN: 64 CASE branches blow up the
    # whole-stage-codegen method size and fall back to interpreted)
    sums = tok.groupBy("id").agg(
        *[F.sum(bit(b) * 2 - 1).alias(f"b{b}") for b in range(bits)]
    )
    # balanced XOR reduction: a depth-64 chain makes Catalyst analysis and
    # codegen quadratic (20s one-time cost); a log-depth tree is instant
    terms = [
        F.shiftleft((F.col(f"b{b}") > 0).cast("long"), b) for b in range(bits)
    ]
    while len(terms) > 1:
        terms = [
            terms[i].bitwiseXOR(terms[i + 1]) if i + 1 < len(terms) else terms[i]
            for i in range(0, len(terms), 2)
        ]
    return sums.select("id", terms[0].alias("simhash"))


def hamming(a, b) -> F.Column:
    return F.bit_count(F.col(a).bitwiseXOR(F.col(b)))


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket_size: int | None = 10_000,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Pairs (id_a < id_b) with hamming(simhash) ≤ max_hamming, found via
    16-bit-chunk blocking (no cross join). Chunk buckets larger than
    ``max_bucket_size`` are dropped (a k-doc degenerate bucket would emit
    k² candidates). The self-join is built from ONE chunks plan via
    aliases, so the expensive 64-way simhash aggregation shuffles once and
    both join sides read the same exchange (ReusedExchange) — round 1
    persisted the signatures instead and leaked the cache."""
    sh = simhash(df, text_col, id_col, hash_fn=hash_fn)
    chunks = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("simhash", c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cb"),
    ).select("id", "simhash", "cb.chunk", "cb.key")
    if max_bucket_size is not None:
        # window COUNT over the (chunk, key) partition instead of a
        # groupBy + semi-join: the semi-join re-derived the 64-way
        # simhash aggregation a second time for the count; the window
        # rides the exchange the pair self-join needs anyway. Identical
        # cap semantics (partition count == groupBy count).
        from pyspark.sql import Window

        wcap = Window.partitionBy("chunk", "key")
        chunks = (
            chunks.withColumn("_bc", F.count(F.lit(1)).over(wcap))
            .filter(F.col("_bc") <= max_bucket_size)
            .drop("_bc")
        )
    a = chunks.alias("a")
    b = chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
