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


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """(id, simhash long): 64-bit simhash per document."""
    tok = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    # per-bit contribution: +1 if bit set else -1
    sums = tok.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(bits)
        ]
    )
    fp = None
    for b in range(bits):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, b)
        fp = term if fp is None else fp.bitwiseXOR(term)
    return sums.select("id", fp.alias("simhash"))


def hamming(a, b) -> F.Column:
    return F.bit_count(F.col(a).bitwiseXOR(F.col(b)))


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs (id_a < id_b) with hamming(simhash) ≤ max_hamming, found via
    16-bit-chunk blocking (no cross join)."""
    sh = simhash(df, text_col, id_col)
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
    a = chunks.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), "chunk", "key"
    )
    b = chunks.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), "chunk", "key"
    )
    return (
        a.join(b, ["chunk", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming("sh_a", "sh_b").alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
