"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a single scan with a JVM-side
zip_with/aggregate dot product against a broadcast query vector (no UDF,
no shuffle except the final top-k).

Scale path: banded random-hyperplane LSH. Signatures come from a seeded
gaussian plane matrix (numpy RandomState — direction-uniform, identical on
every executor, and the planes travel inside the pickled UDF closure rather
than as dim×planes plan literals). A vectorized pandas UDF computes ALL
band signatures for a batch in one matmul (V @ P.T), the cheapest possible
shape — round 1 used per-plane JVM aggregate lambdas, which were
interpreted per element and put ~9k literals in the plan at dim=768.

Near-duplicate pairs use OR-amplified banding (any of ``bands`` agreeing
r-bit signatures makes a candidate): recall at cosine c is
1-(1-p^r)^bands with p = 1-acos(c)/pi, so 8 bands x 8 planes gives ~0.99
recall at c=0.95 — the round-1 single-band AND construction had ~0.28 and
its w.h.p. docstring was wrong.

Reference analog: the sample-level extension contract
(/root/reference/tacotoolbox/sample/datamodel.py:40-75); the banding math
mirrors dedup/minhash.py, which already amplified correctly.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


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


def lsh_planes(dim: int, bands: int, rows_per_band: int, seed: int) -> np.ndarray:
    """Deterministic gaussian plane matrix (bands*rows_per_band, dim).
    RandomState(seed) is bit-reproducible across platforms and executors."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((bands * rows_per_band, dim))


def _pack_signatures(V: np.ndarray, P: np.ndarray, bands: int, r: int) -> np.ndarray:
    """(n, bands) int64: per-band sign patterns of V @ P.T, r bits each."""
    signs = (V @ P.T) > 0  # (n, bands*r)
    weights = (1 << np.arange(r, dtype=np.int64)).reshape(1, 1, r)
    return (signs.reshape(len(V), bands, r) * weights).sum(axis=2)


def band_signature_col(
    dim: int, bands: int = 8, rows_per_band: int = 8, seed: int = 42
):
    """Column function: array<long>[bands] of band signatures for a vector
    column. One Arrow batch = one matmul."""
    if rows_per_band > 62:
        raise ValueError("rows_per_band must fit in a long")
    P = lsh_planes(dim, bands, rows_per_band, seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sigs(vs: pd.Series) -> pd.Series:
        V = np.array(vs.tolist(), dtype=np.float64)
        packed = _pack_signatures(V, P, bands, rows_per_band)
        return pd.Series(list(packed))

    return sigs


def query_signatures(
    query_vec: list[float], bands: int = 8, rows_per_band: int = 8, seed: int = 42
) -> list[int]:
    """Driver-side band signatures for the query (same planes)."""
    P = lsh_planes(len(query_vec), bands, rows_per_band, seed)
    return [
        int(s)
        for s in _pack_signatures(
            np.array([query_vec], dtype=np.float64), P, bands, rows_per_band
        )[0]
    ]


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bands: int = 8,
    rows_per_band: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: exact re-rank restricted to vectors agreeing with
    the query on >= 1 band signature (OR-amplified LSH). The candidate
    filter is scan-shaped (no index), which is the right first cut on an
    unindexed 10^9-row table: the signature matmul is one Arrow batch pass
    and the re-rank touches only colliding vectors. Recall is high exactly
    when LSH theory grants it — for genuinely similar vectors; uniformly
    random near-orthogonal 'neighbors' may be pruned (that is the
    approximation, not a bug). Same output schema as brute_force_topk."""
    dim = len(query_vec)
    sig_fn = band_signature_col(dim, bands, rows_per_band, seed)
    qsigs = query_signatures(query_vec, bands, rows_per_band, seed)
    qarr = F.array(*[F.lit(s).cast("long") for s in qsigs])
    cand = (
        df.withColumn("_sigs", sig_fn(F.col(vec_col)))
        .filter(
            F.exists(
                F.zip_with(F.col("_sigs"), qarr, lambda s, q: s == q),
                lambda x: x,
            )
        )
        .drop("_sigs")
    )
    return brute_force_topk(cand, query_vec, k, vec_col, id_col)


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bands: int = 8,
    rows_per_band: int = 8,
    seed: int = 42,
    dim: int | None = None,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Pairs (id_a < id_b) with cosine >= threshold: OR-amplified band
    blocking + exact cosine verification on candidates only.

    Expected recall at cosine c: 1-(1-p^r)^b, p = 1-acos(c)/pi — at the
    default 8x8 and c=0.95 that is ~0.99 (pytest-asserted on a seeded
    corpus). ``max_bucket_size`` drops degenerate buckets (e.g. the
    all-zeros signature of near-zero vectors) that would otherwise create
    k^2 candidates; dropped buckets only cost recall for vector clusters
    larger than the cap, which at the default means 10^8 candidate pairs
    from a single bucket — already pathological.

    Only (id, band, sig) rows enter the candidate join; vectors are joined
    back for the candidate pairs only, so shuffle volume is bands x 16
    bytes per row, not bands x dim."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    sig_fn = band_signature_col(dim, bands, rows_per_band, seed)
    slim = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    sigs = slim.select(
        "id", F.posexplode(sig_fn(F.col("v"))).alias("band", "sig")
    )
    if max_bucket_size is not None:
        ok = (
            sigs.groupBy("band", "sig")
            .count()
            .filter(F.col("count") <= max_bucket_size)
            .drop("count")
        )
        sigs = sigs.join(ok, ["band", "sig"], "left_semi")
    a = sigs.alias("a")
    b = sigs.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    pairs = cand.join(
        slim.select(F.col("id").alias("id_a"), F.col("v").alias("va")), "id_a"
    ).join(slim.select(F.col("id").alias("id_b"), F.col("v").alias("vb")), "id_b")
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        pairs.select("id_a", "id_b", F.round(cos, 4).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
