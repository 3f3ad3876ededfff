"""Batch similarity top-k JOIN — k nearest corpus vectors for EVERY
query row.

The single-query operators in ann.py answer "what's near THIS vector";
real retrieval workloads ask the JOIN form: score an eval set against
the corpus (retrieval benchmarks), find what each new document is
closest to (cross-corpus contamination), attach k nearest exemplars to
every training row (kNN labeling). The join is not k independent
single-query runs — one corpus scan must serve all queries at once.

Three realizations, one semantics (exact cosine, round-4, ties by id):

* ``cosine_topk_join`` — the EXACT ANCHOR: broadcast the query side
  against one corpus scan, cosine per pair via the same sequential-fold
  double arithmetic as ann.brute_force_topk, per-query top-k window.
  The |Q|x|C| pair frame is materialized only as (qid, cid, cos)
  triples, but the top-k window still shuffles all of them — correct at
  any |C|, affordable while |Q|x|C| triples fit a shuffle. This is the
  oracle-bearing definition the fast paths must reproduce.
* ``cosine_topk_join_blocked`` — the 100-TB path: queries are collected
  once to the driver (an eval/probe set is small BY CONTRACT — guarded
  by ``max_queries``) and closed over a ``mapInPandas`` pass that
  computes, per Arrow batch, the cosine of all batch rows against all
  queries as vectorized float64 ops IN THE SAME ORDER as the JVM fold
  (sequential over dimensions), rounds with the same HALF-UP rule, and
  keeps only each batch's per-query top-k. State is O(|Q| x k) per
  batch; the final window ranks n_batches x |Q| x k survivors — the
  shuffle no longer scales with |C|. Bit-identical to the anchor
  (locked by pytest exact-equality parity AND the same DuckDB oracle).
* ``lsh_topk_join`` — the sublinear candidate path: band signatures
  (ann.band_signature_col, the same seeded planes) on BOTH sides, an
  equi-join on (band, signature) proposes candidates, exact re-rank on
  candidates only. Shuffle volume is bands x 16 bytes per row; recall
  follows LSH theory — high for genuinely-near neighbors, so the k-th
  result can differ from exact when true neighbors are near-orthogonal
  (the approximation, not a bug). Corpus-side bucket caps bound the
  join fan-out exactly as ann.embedding_near_duplicates does.

Beyond-reference training-pipeline operator (SURVEY.md §6); the
reference has no vector-join surface (its extensions are per-sample
metadata transforms, tacotoolbox/extensions/).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ann import _dot, _norm, band_signature_col


def _check_names(
    corpus: DataFrame, out_query_col: str, internal: set[str]
) -> None:
    if out_query_col in corpus.columns:
        raise ValueError(
            f"output column {out_query_col!r} collides with a corpus "
            "column; pass a different out_query_col"
        )
    clash = internal & set(corpus.columns)
    if clash:
        raise ValueError(
            f"columns {sorted(clash)} collide with the join's internal "
            "names; rename them first"
        )


def cosine_topk_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    q_vec: str = "embedding",
    q_id: str = "vec_id",
    c_vec: str = "embedding",
    c_id: str = "vec_id",
    out_query_col: str = "query_id",
) -> DataFrame:
    """Exact batch top-k: for every query row, the ``k`` corpus rows with
    the highest cosine (round-4; ties broken by ascending corpus id —
    the ann.brute_force_topk rule). Output: (out_query_col, c_id, cos).

    Plan: the query side is broadcast (one copy per executor, no corpus
    shuffle to form pairs); the per-query top-k window shuffles the
    (qid, cid, cos) triples — see ``cosine_topk_join_blocked`` for the
    variant whose shuffle does not scale with the corpus."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    _check_names(corpus, out_query_col, {"_qv", "_qn", "_rn", "cos"})
    q = queries.select(
        F.col(q_id).alias(out_query_col),
        F.col(q_vec).alias("_qv"),
        _norm(F.col(q_vec)).alias("_qn"),
    )
    pairs = corpus.select(F.col(c_id), F.col(c_vec)).crossJoin(F.broadcast(q))
    cos = _dot(F.col(c_vec), F.col("_qv")) / (
        _norm(F.col(c_vec)) * F.col("_qn")
    )
    w = Window.partitionBy(out_query_col).orderBy(
        F.col("cos").desc(), F.col(c_id)
    )
    return (
        pairs.select(out_query_col, c_id, F.round(cos, 4).alias("cos"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def _sequential_cosine(V: np.ndarray, Q: np.ndarray) -> np.ndarray:
    """(n, m) cosine matrix accumulated IN FOLD ORDER: dot and squared
    norms are built by one float64 add per dimension, left to right —
    the exact operation sequence of ann._dot/_norm, so every value is
    bit-identical to the JVM expression (vectorized over rows, which
    changes nothing: IEEE ops are elementwise)."""
    n, dim = V.shape
    m = Q.shape[0]
    acc = np.zeros((n, m))
    nv = np.zeros(n)
    nq = np.zeros(m)
    for d in range(dim):
        acc += np.outer(V[:, d], Q[:, d])
        nv += V[:, d] * V[:, d]
        nq += Q[:, d] * Q[:, d]
    return acc / (np.sqrt(nv)[:, None] * np.sqrt(nq)[None, :])


def _round_half_up(x: np.ndarray, digits: int = 4) -> np.ndarray:
    """HALF-UP (away from zero) rounding — java.math/DuckDB semantics;
    np.round would round half to EVEN and diverge from F.round at exact
    .5 boundaries."""
    p = 10.0**digits
    return np.sign(x) * np.floor(np.abs(x) * p + 0.5) / p


def cosine_topk_join_blocked(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    q_vec: str = "embedding",
    q_id: str = "vec_id",
    c_vec: str = "embedding",
    c_id: str = "vec_id",
    out_query_col: str = "query_id",
    max_queries: int = 1_000_000,
) -> DataFrame:
    """``cosine_topk_join`` with map-side top-k: one corpus scan, per-
    Arrow-batch cosine matmul against the (driver-collected, closure-
    broadcast) query matrix, only each batch's per-query top-k survives
    to the final window — so the shuffle is O(n_batches x |Q| x k), not
    O(|Q| x |C|). Arithmetic is fold-ordered float64 + HALF-UP rounding,
    bit-identical to the anchor (pytest-locked exact parity; shares the
    anchor's DuckDB oracle). ``max_queries`` guards the by-contract-small
    query side; use ``lsh_topk_join`` past it."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    _check_names(corpus, out_query_col, {"_rn", "cos"})
    qpdf = queries.select(F.col(q_id), F.col(q_vec)).limit(
        max_queries + 1
    ).toPandas()
    if len(qpdf) > max_queries:
        raise ValueError(
            f"query side exceeds max_queries={max_queries}; broadcast-"
            "collecting it would not be the right plan — use "
            "lsh_topk_join (candidate equi-join) instead"
        )
    if qpdf.empty:
        sch = f"{out_query_col} {queries.schema[q_id].dataType.simpleString()}"
        return corpus.sparkSession.createDataFrame(
            [],
            f"{sch}, {c_id} {corpus.schema[c_id].dataType.simpleString()}, "
            "cos double",
        )
    Q = np.stack([np.asarray(v, dtype=np.float64) for v in qpdf[q_vec]])
    qids = qpdf[q_id].to_numpy()
    # pre-fold the query norms once (same per-dim order as the batch pass)
    out_schema = (
        f"{out_query_col} {queries.schema[q_id].dataType.simpleString()}, "
        f"{c_id} {corpus.schema[c_id].dataType.simpleString()}, cos double"
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            V = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[c_vec]]
            )
            cids = pdf[c_id].to_numpy()
            cos = _round_half_up(_sequential_cosine(V, Q))
            kk = min(k, len(pdf))
            parts = []
            for j in range(len(qids)):
                # primary: rounded cos desc; secondary: corpus id asc
                top = np.lexsort((cids, -cos[:, j]))[:kk]
                parts.append(
                    pd.DataFrame(
                        {
                            out_query_col: np.repeat(qids[j], kk),
                            c_id: cids[top],
                            "cos": cos[top, j],
                        }
                    )
                )
            yield pd.concat(parts, ignore_index=True)

    survivors = corpus.select(F.col(c_id), F.col(c_vec)).mapInPandas(
        score, out_schema
    )
    w = Window.partitionBy(out_query_col).orderBy(
        F.col("cos").desc(), F.col(c_id)
    )
    return (
        survivors.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def lsh_topk_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    q_vec: str = "embedding",
    q_id: str = "vec_id",
    c_vec: str = "embedding",
    c_id: str = "vec_id",
    out_query_col: str = "query_id",
    bands: int = 8,
    rows_per_band: int = 8,
    seed: int = 42,
    dim: int | None = None,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Approximate batch top-k: candidates are (query, corpus) pairs
    agreeing on >= 1 band signature (OR-amplified LSH, the same seeded
    planes as ann.lsh_topk), exact fold-cosine re-rank on candidates
    only. Sublinear in |Q| x |C|: signature rows shuffle at bands x 16
    bytes each and the equi-join replaces the all-pairs product.
    Corpus-side buckets larger than ``max_bucket_size`` are dropped
    (degenerate signatures would fan out k^2 candidates — the
    embedding_near_duplicates cap). Queries with no colliding candidate
    return no rows (report, don't guess). Same output schema and tie
    rule as ``cosine_topk_join``."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    _check_names(
        corpus, out_query_col, {"_qv", "_qn", "_cv", "_band", "_sig", "_rn", "cos"}
    )
    if dim is None:
        dim = len(queries.select(q_vec).first()[0])
    sig_fn = band_signature_col(dim, bands, rows_per_band, seed)
    qs = queries.select(
        F.col(q_id).alias(out_query_col),
        F.col(q_vec).alias("_qv"),
        _norm(F.col(q_vec)).alias("_qn"),
    )
    qsig = queries.select(
        F.col(q_id).alias(out_query_col),
        F.posexplode(sig_fn(F.col(q_vec))).alias("_band", "_sig"),
    )
    cs = corpus.select(F.col(c_id), F.col(c_vec).alias("_cv"))
    csig = corpus.select(
        F.col(c_id), F.posexplode(sig_fn(F.col(c_vec))).alias("_band", "_sig")
    )
    if max_bucket_size is not None:
        # window COUNT over the (band, sig) partition instead of a
        # groupBy + semi-join, which re-derived the corpus signature
        # subtree (pandas-UDF matmul included) a second time; the window
        # rides the exchange the candidate equi-join needs anyway.
        # Identical cap semantics (partition count == groupBy count).
        wcap = Window.partitionBy("_band", "_sig")
        csig = (
            csig.withColumn("_bc", F.count(F.lit(1)).over(wcap))
            .filter(F.col("_bc") <= max_bucket_size)
            .drop("_bc")
        )
    cand = (
        qsig.join(csig, ["_band", "_sig"])
        .select(out_query_col, c_id)
        .distinct()
    )
    # id-keyed shuffle joins (AQE broadcasts a small side on its own —
    # forcing broadcast here would be wrong in exactly the large-|Q|
    # regime this variant exists for)
    pairs = cand.join(qs, out_query_col).join(cs, c_id)
    cos = _dot(F.col("_cv"), F.col("_qv")) / (
        _norm(F.col("_cv")) * F.col("_qn")
    )
    w = Window.partitionBy(out_query_col).orderBy(
        F.col("cos").desc(), F.col(c_id)
    )
    return (
        pairs.select(out_query_col, c_id, F.round(cos, 4).alias("cos"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
