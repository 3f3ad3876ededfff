"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a single scan with a JVM-side
zip_with/aggregate dot product against a broadcast query vector (no UDF,
no shuffle except the final top-k).

Scale paths: banded random-hyperplane LSH (scan-shaped, no index) and an
IVF coarse quantizer (``ivf_topk``: cells are a write-time partition
column at scale, so probing becomes partition pruning at the parquet
scan). Signatures for the LSH path come from a seeded
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
from pyspark.sql import DataFrame, Window
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
    q = F.lit([float(x) for x in query_vec])
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
    partition + global merge (orderBy/limit = TakeOrdered, no full sort).
    The input is spread to the session parallelism when under-partitioned
    (scale.spread_for_compute — a single-row-group file scans as ONE
    split and would serialize the dim-length dot folds behind one core;
    a plan no-op at warehouse scale). Per-row scores are order-
    independent and the top-k merge is a total order, so the spread
    cannot change the result."""
    from ..scale import spread_for_compute

    df = spread_for_compute(df)
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
    from ..scale import spread_for_compute

    dim = len(query_vec)
    sig_fn = band_signature_col(dim, bands, rows_per_band, seed)
    qsigs = query_signatures(query_vec, bands, rows_per_band, seed)
    qarr = F.lit([int(s) for s in qsigs])
    cand = (
        spread_for_compute(df).withColumn("_sigs", sig_fn(F.col(vec_col)))
        .filter(
            F.exists(
                F.zip_with(F.col("_sigs"), qarr, lambda s, q: s == q),
                lambda x: x,
            )
        )
        .drop("_sigs")
    )
    return brute_force_topk(cand, query_vec, k, vec_col, id_col)


def ivf_centroids(dim: int, n_centroids: int, seed: int = 7) -> list[list[float]]:
    """Deterministic unit-norm coarse-quantizer centroids (seeded gaussian
    directions — RandomState is bit-reproducible everywhere, and the values
    can be inlined as oracle literals). A data-dependent k-means refinement
    would sharpen the cells but make the assignment depend on
    summation-order-sensitive float group averages; fixed directions keep
    the whole pipeline engine-portable and deterministic."""
    rng = np.random.RandomState(seed)
    C = rng.standard_normal((n_centroids, dim))
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    return [[float(x) for x in row] for row in C]


def ivf_cell_col(vec_col: str, centroids: list[list[float]]) -> F.Column:
    """Cell id = argmax over centroids of the (sequential, double) dot
    product — array_max over (dot, cid) structs, so ties break to the
    larger cid, a rule any engine can mirror (ORDER BY dot DESC, cid
    DESC). Pure JVM expressions; at dim >> 100 swap in a pandas-UDF matmul
    (band_signature_col's shape) — values are identical either way."""
    entries = [
        F.struct(
            _dot(F.col(vec_col), F.lit([float(x) for x in row])).alias("dot"),
            F.lit(cid).alias("cid"),
        )
        for cid, row in enumerate(centroids)
    ]
    return F.array_max(F.array(*entries))["cid"]


def ivf_probe_cells(
    query_vec: list[float], centroids: list[list[float]], n_probe: int
) -> list[int]:
    """Driver-side: the n_probe cells nearest the query (dot DESC, cid
    DESC — the same tie rule as the row assignment). Accumulation is
    left-to-right, matching the engine-side sequential aggregate."""
    dots = []
    for cid, row in enumerate(centroids):
        acc = 0.0
        for a, b in zip(query_vec, row):
            acc += float(a) * b
        dots.append((acc, cid))
    return [cid for _, cid in sorted(dots, key=lambda t: (-t[0], -t[1]))[:n_probe]]


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 7,
) -> DataFrame:
    """IVF-partitioned approximate top-k: vectors are bucketed into
    ``n_centroids`` coarse cells, the query probes its ``n_probe`` nearest
    cells, and the exact cosine re-rank touches only those cells'
    vectors — the inverted-file structure as a composition of built-ins.

    100 TB shape: in production the cell id is a WRITE-TIME partition
    column (``.partitionBy("cell")``), so this probe filter becomes
    partition pruning at the parquet scan and a query reads n_probe/n_
    centroids of the corpus; here the assignment is computed in-plan so
    the operator is self-contained. Scanned fraction ~= n_probe /
    n_centroids; recall is high for clustered corpora and degrades toward
    that fraction for adversarially uniform ones (the IVF approximation,
    not a bug). Same output schema as brute_force_topk."""
    from ..scale import spread_for_compute

    C = ivf_centroids(len(query_vec), n_centroids, seed)
    probes = ivf_probe_cells(query_vec, C, n_probe)
    cand = spread_for_compute(df).withColumn(
        "_cell", ivf_cell_col(vec_col, C)
    ).filter(F.col("_cell").isin(probes))
    return brute_force_topk(cand.drop("_cell"), query_vec, k, vec_col, id_col)


def ivf_write_index(
    df: DataFrame,
    path: str,
    dim: int,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    seed: int = 7,
) -> None:
    """Materialize the IVF structure ``ivf_topk``'s docstring promises at
    scale: assign every vector its coarse cell and write parquet
    PARTITIONED BY the cell id. Probing then becomes partition pruning —
    a query's scan touches only n_probe/n_centroids of the files, which
    is the difference between reading 100 TB and reading 25 GB at
    n_probe=4/n_centroids=16... ×1000 executors. Write once, probe
    forever; re-write to change n_centroids/seed (the cell assignment is
    a pure function of (vector, centroids))."""
    C = ivf_centroids(dim, n_centroids, seed)
    (
        df.withColumn("cell", ivf_cell_col(vec_col, C))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )


def ivf_topk_indexed(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Probe-pruned top-k over an ``ivf_write_index`` layout: the cell
    membership filter lands in the scan's PartitionFilters (locked by
    tests/test_plan_assertions.py), so non-probed cells are never read —
    the at-scale realization of ``ivf_topk``, bit-identical to it for the
    same (n_centroids, n_probe, seed). The session reads partition values
    as strings (partitionColumnTypeInference disabled — session.py), so
    probes are compared as string literals, keeping the filter a pure
    partition predicate."""
    C = ivf_centroids(len(query_vec), n_centroids, seed)
    probes = [str(c) for c in ivf_probe_cells(query_vec, C, n_probe)]
    cand = spark.read.parquet(path).filter(F.col("cell").isin(probes))
    return brute_force_topk(cand.drop("cell"), query_vec, k, vec_col, id_col)


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
        # window COUNT over the (band, sig) partition instead of a
        # groupBy + semi-join: the semi-join re-derived the signature
        # subtree — including the pandas-UDF matmul — once more per
        # side (8 Python eval nodes in the round-6 plan audit); the
        # window rides the exchange the pair self-join needs anyway.
        # Identical cap semantics (partition count == groupBy count).
        wcap = Window.partitionBy("band", "sig")
        sigs = (
            sigs.withColumn("_bc", F.count(F.lit(1)).over(wcap))
            .filter(F.col("_bc") <= max_bucket_size)
            .drop("_bc")
        )
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
    # Norms ride the vector joins (one fold per ROW, not per pair): the
    # same float64 subexpression as computing them pairwise, evaluated
    # once per side — bit-identical cos, fewer folds when ids recur
    # across many candidate pairs.
    slim_n = slim.withColumn("n", _norm(F.col("v")))
    pairs = cand.join(
        slim_n.select(
            F.col("id").alias("id_a"), F.col("v").alias("va"),
            F.col("n").alias("na"),
        ),
        "id_a",
    ).join(
        slim_n.select(
            F.col("id").alias("id_b"), F.col("v").alias("vb"),
            F.col("n").alias("nb"),
        ),
        "id_b",
    )
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        pairs.select("id_a", "id_b", F.round(cos, 4).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
