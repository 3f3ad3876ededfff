"""MinHash + LSH near-duplicate detection — the 100 TB scale path.

Pipeline (all JVM-side, zero Python UDFs):
  shingle -> k minhash values        explode + groupBy(id) with k min(hash)
  signature -> b bands of r rows     band hash = xxhash64 of the band slice
  band bucket join                   candidates = pairs sharing any bucket
  verify                             exact Jaccard on candidates only

Unlike brute-force Jaccard (pairs every doc sharing a shingle), LSH bounds
the join fan-out: only documents agreeing on an entire band collide. With
b bands of r rows, P(collide) = 1-(1-j^r)^b — tuned so pairs above the
threshold are found w.h.p. while sub-threshold pairs rarely collide.

Each of the k hash functions is xxhash64(shingle, seed_i) — deterministic,
no RNG state to ship.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ngram import pairs_from_shingles, shingles


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """(id, sig array<long>[num_hashes]): per-doc minhash signature.
    One explode + ONE aggregation computing all k minima (map-side combine
    shrinks the shuffle to k longs per doc)."""
    sh = shingles(df, text_col, id_col, n)
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy("id").agg(*mins)
    return sig.select("id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing ≥1 LSH band bucket."""
    band_rows = []
    for b in range(bands):
        band_rows.append(
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at("sig", b * rows_per_band + r + 1)
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("bucket"),
            )
        )
    buckets = signatures.select(
        "id", F.explode(F.array(*band_rows)).alias("bb")
    ).select("id", "bb.band", "bb.bucket")
    a = buckets.select(F.col("id").alias("id_a"), "band", "bucket")
    b2 = buckets.select(F.col("id").alias("id_b"), "band", "bucket")
    return (
        a.join(b2, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """LSH-candidate generation + exact-Jaccard verification on candidates
    only. Columns: id_a, id_b, jaccard (≥ threshold)."""
    rows_per_band = num_hashes // bands
    # one shingle computation feeds BOTH signature minima and jaccard
    # verification (persisted — it's the expensive explode)
    sh = shingles(df, text_col, id_col, n).persist()
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy("id").agg(*mins).select(
        "id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig")
    )
    cand = lsh_candidate_pairs(sig, bands, rows_per_band)
    cand_ids = (
        cand.select(F.col("id_a").alias("id"))
        .union(cand.select("id_b"))
        .distinct()
    )
    sh_subset = sh.join(cand_ids, "id", "left_semi")
    exact = pairs_from_shingles(sh_subset, threshold)
    return exact.join(cand, ["id_a", "id_b"], "left_semi")
