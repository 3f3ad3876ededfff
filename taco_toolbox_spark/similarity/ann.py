"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a single scan with a JVM-side
zip_with/aggregate dot product against a broadcast query vector (no UDF,
no shuffle except the final top-k).

Scale path: LSH with deterministic random-hyperplane signatures (sign of
dot with seed-derived planes), bucket join, then exact re-rank within
buckets — the bucket key bounds the candidate set so a 10^9-vector table
never cross-joins.

Embedding near-duplicate pairs: cosine ≥ threshold via the same LSH
blocking.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    """Sequential double-precision dot product (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_to_query(
    df: DataFrame, query_vec: list[float], vec_col: str = "embedding"
) -> F.Column:
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec)) or 1.0
    return _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k vs one query vector. Scan + local top-k per
    partition + global merge (orderBy/limit = TakeOrdered, no full sort)."""
    return (
        df.select(
            F.col(id_col),
            F.round(cosine_to_query(df, query_vec, vec_col), 4).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col(id_col))
        .limit(k)
    )


def hyperplane_signature(
    vec_col: str, dim: int, n_planes: int = 16, seed: int = 42
) -> F.Column:
    """Deterministic LSH bucket id: sign pattern of dot products with
    pseudo-random hyperplanes. Plane components derive from xxhash64-free
    arithmetic: plane[p][i] = sin(seed + p*dim + i) — fixed, cheap,
    direction-uniform enough for bucketing, and identical on every executor
    without shipping state."""
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        comps = [math.sin(seed + p * dim + i) for i in range(dim)]
        plane = F.array(*[F.lit(c) for c in comps])
        d = _dot(F.col(vec_col), plane)
        sig = sig.bitwiseXOR(F.shiftleft(F.when(d > 0, 1).otherwise(0).cast("long"), p))
    return sig


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 12,
    probe_hamming: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: restrict the exact re-rank to vectors whose
    hyperplane signature is within ``probe_hamming`` of the query's
    (multi-probe LSH). Same output schema as brute_force_topk."""
    dim = len(query_vec)
    sigs = df.withColumn(
        "_sig", hyperplane_signature(vec_col, dim, n_planes, seed)
    )
    # query signature computed driver-side with the same plane formula
    qsig = 0
    for p in range(n_planes):
        d = sum(
            float(query_vec[i]) * math.sin(seed + p * dim + i) for i in range(dim)
        )
        qsig ^= (1 if d > 0 else 0) << p
    cand = sigs.filter(
        F.bit_count(F.col("_sig").bitwiseXOR(F.lit(qsig))) <= probe_hamming
    )
    return brute_force_topk(cand, query_vec, k, vec_col, id_col)


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 12,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b) with cosine ≥ threshold, via signature-bucket
    blocking + exact verification (near-identical vectors share all plane
    signs w.h.p.)."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    sigs = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        hyperplane_signature(vec_col, dim, n_planes, seed).alias("sig"),
    )
    a = sigs.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("sig")
    )
    b = sigs.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("sig")
    )
    pairs = a.join(b, "sig").filter(F.col("id_a") < F.col("id_b"))
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        pairs.select("id_a", "id_b", F.round(cos, 4).alias("cos"))
        .filter(F.col("cos") >= threshold)
        .distinct()
    )
