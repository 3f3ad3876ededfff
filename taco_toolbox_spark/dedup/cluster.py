"""Duplicate-pair → cluster resolution via distributed connected
components (alternating large-star / small-star).

Every near-dup stage in this package (exact, ngram, minhash, simhash,
embedding) emits PAIRS — but a dedup pipeline must finally pick one
canonical document per GROUP, and near-duplication is not transitive:
A~B and B~C pairs must collapse into one {A,B,C} cluster even when A~C
was never emitted. That closure is connected components on the pair
graph.

Algorithm — the alternating star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14; public algorithm, no code
consulted). Edges are kept directed large→small. Per round:

  large-star(u): connect every strictly-larger neighbor of u to
      m = min(Γ(u) ∪ {u})  — long chains fold toward small ids;
  small-star(u): connect u and all its smaller neighbors to
      m = min(Γ_<(u))       — partial stars contract onto their min.

Fixpoint: the edge set is a union of disjoint depth-1 stars, each
centered on its component's minimum id; rounds needed are
O(log diameter) in practice (dup graphs are near-clique blobs plus
short chains), ``max_iter`` bounds pathological inputs.

Why this shape for 100 TB (vs the hash-min label propagation it
replaced in round 5):

* every groupBy/join in the loop is keyed by a NODE id — a
  well-distributed key. The old pointer-jump step self-joined labels on
  the LABEL key, which concentrates an entire giant component onto one
  reducer once labels converge; here a giant component never shares a
  join key (its members key by their own ids; the star hub is one group
  whose min-aggregation is map-side combinable, and the hub-keyed join
  is exactly the skew shape AQE skew-join splitting handles).
* driver barriers are amortized: the convergence test runs every
  ``check_every`` rounds (plus at the horizon) as ONE count action over
  a union-of-violations frame — "some source has two distinct parents"
  UNION "some parent is itself a source". Zero violations certifies
  disjoint stars; both star ops preserve component connectivity, so
  disjoint stars ⇒ one star per component, centered on its min.
* lineage is cut with an eager ``localCheckpoint`` per round (without
  it the plan doubles per round and the driver dies planning a 2^20
  tree); each superseded checkpoint is explicitly ``unpersist``-ed once
  its successor is materialized, so checkpointed blocks do NOT
  accumulate across rounds or calls (on a cluster, prefer
  ``setCheckpointDir`` + ``checkpoint()`` for fault-tolerant
  truncation; localCheckpoint trades that for speed).
* edge-set size never grows: each round emits at most one edge per
  directed input edge before ``distinct()``, so the working set shrinks
  monotonically toward one edge per non-min node.

Beyond-reference training-pipeline operator (SURVEY.md §6); the oracle
replicates the closure with a DuckDB recursive CTE over the same edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _star_round(edges: DataFrame) -> DataFrame:
    """One large-star + small-star round over a large→small directed,
    self-loop-free edge set. Returns the new directed edge set
    (un-checkpointed, caller materializes)."""
    # ---- large-star: for each node u, attach every neighbor v > u to
    # m = min(Γ(u) ∪ {u}). Needs the symmetric view so u sees both
    # smaller and larger neighbors.
    sym = edges.unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("_mn"))
        .select("u", F.least("_mn", "u").alias("m"))
    )
    # m <= u < v, so the emitted (v, m) stays strictly large→small.
    # NOT distinct-ed here: the small-star min-agg and the final
    # distinct dedupe anyway, and each undirected edge emits exactly one
    # candidate (only its smaller endpoint's group passes the v > u
    # filter), so duplicate inflation is bounded by node fan-in — a
    # shuffle saved per round beats rare duplicate rows.
    large = (
        sym.filter(F.col("v") > F.col("u"))
        .join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    # ---- small-star: every edge already points large→small, so Γ_<(u)
    # is exactly u's targets; attach u and each non-min target to the min
    mins2 = large.groupBy("u").agg(F.min("v").alias("m"))
    j = large.join(mins2, "u")
    return (
        j.select("u", F.col("m").alias("v"))
        .unionAll(
            j.filter(F.col("v") != F.col("m")).select(
                F.col("v").alias("u"), F.col("m").alias("v")
            )
        )
        .distinct()
    )


def _not_star_violations(edges: DataFrame) -> DataFrame:
    """Rows witnessing that ``edges`` is NOT yet a disjoint-star forest:
    a source with >1 distinct parents, or an edge whose parent is itself
    a source (a chain). Empty ⟺ converged. Both branches evaluate in the
    single count job the caller runs."""
    multi_parent = (
        edges.groupBy("u")
        .agg(F.count_distinct("v").alias("_nd"))
        .filter(F.col("_nd") > 1)
        .select(F.lit(1).alias("_viol"))
    )
    chain = (
        edges.join(
            edges.select(F.col("u").alias("v")).distinct(), "v", "leftsemi"
        ).select(F.lit(1).alias("_viol"))
    )
    return multi_parent.unionAll(chain)


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    check_every: int = 1,
    stats: dict | None = None,
) -> DataFrame:
    """Resolve an undirected pair list into components.

    Returns (node, cluster_id): one row per distinct node appearing in
    ``pairs``, where cluster_id is the minimum node id reachable from
    it. Pairs with a NULL endpoint are dropped at entry (a NULL id is
    not a node and must not poison min-aggregations or the convergence
    test). Raises RuntimeError if ``max_iter`` star rounds don't reach
    fixpoint — raise it or pre-contract the graph.

    ``check_every`` trades the driver-synchronized convergence action
    against wasted rounds: a star ROUND is several shuffles while the
    structural check is one cheap count over the checkpointed edges, and
    dup graphs (near-clique blobs) usually converge in 1-2 rounds — so
    the default checks every round; raise it for deep-chain graphs where
    many rounds are certain and the barrier dominates (the final round
    always checks). ``stats``, when a dict is passed, receives
    ``{"rounds": r, "convergence_checks": c}`` for tests and telemetry.
    """
    # materialize the cleaned pair list ONCE: nodes and edges below each
    # trigger an eager checkpoint, and without this the caller's pair
    # pipeline (typically a full minhash/LSH candidate scan) would run
    # twice — measured as ~1/3 of the curation job's wall time
    p = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .localCheckpoint(eager=True)
    )
    # node universe includes self-paired ids (they are singletons)
    nodes = (
        p.select(F.col("a").alias("node"))
        .unionAll(p.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    edges = (
        p.filter(F.col("a") != F.col("b"))
        .select(F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    p.unpersist()  # both children are materialized; blocks are dead
    rounds = checks = 0
    converged = False
    try:
        for it in range(1, max_iter + 1):
            new_edges = _star_round(edges).localCheckpoint(eager=True)
            edges.unpersist()  # successor is materialized; block is dead
            edges = new_edges
            rounds = it
            if it % check_every == 0 or it == max_iter:
                checks += 1
                if _not_star_violations(edges).count() == 0:
                    converged = True
                    break
        if stats is not None:
            stats["rounds"] = rounds
            stats["convergence_checks"] = checks
        if not converged:
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} "
                "star rounds"
            )
        labels = edges.select(
            F.col("u").alias("node"), F.col("v").alias("cluster_id")
        )
        # centers and singletons carry their own id
        return (
            nodes.join(labels, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("cluster_id"), F.col("node")).alias(
                    "cluster_id"
                ),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        edges.unpersist()
        nodes.unpersist()


def canonical_docs(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    prefer_col: str | None = None,
) -> DataFrame:
    """Dedup verdict per document: every doc in ``docs`` mapped to its
    cluster (singletons cluster with themselves) plus ``is_canonical`` —
    the row a dedup pipeline keeps. Default representative: the min-id
    member (pure tie-free rule, zero extra passes). ``prefer_col`` (a
    numeric quality column on ``docs``) switches to QUALITY-AWARE
    election: the member with the highest value wins, ties broken by
    min id — "keep the longest / highest-scoring copy", the curation
    rule min-id cannot express. The component join is on the doc id
    (well-distributed); docs never paired survive via the left join +
    coalesce, so the output is a full keep/drop decision for the corpus,
    not just for the paired subset.

    Quality election costs two map-side-combinable aggregations keyed by
    cluster_id (max prefer, then min id among the maxima) — deliberately
    NOT a per-cluster window: a giant near-dup cluster would serialize a
    window task, while partial aggs give every map task one combiner row
    per cluster. NULL prefer values never win unless the whole cluster
    is NULL (then min id, the default rule)."""
    cols = [F.col(id_col)] + ([F.col(prefer_col)] if prefer_col else [])
    comp = connected_components(pairs, src, dst)
    labeled = (
        docs.select(*cols)
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id"),
            *([F.col(prefer_col)] if prefer_col else []),
        )
    )
    if prefer_col is None:
        return labeled.withColumn(
            "is_canonical", F.col(id_col) == F.col("cluster_id")
        )
    best = labeled.groupBy("cluster_id").agg(
        F.max(prefer_col).alias("_best")
    )
    winner = (
        labeled.join(best, "cluster_id")
        .filter(
            F.col(prefer_col).eqNullSafe(F.col("_best"))
        )
        .groupBy("cluster_id")
        .agg(F.min(id_col).alias("_win"))
    )
    return (
        labeled.join(winner, "cluster_id")
        .select(
            id_col,
            "cluster_id",
            (F.col(id_col) == F.col("_win")).alias("is_canonical"),
        )
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    splits: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 0,
    hash_fn: str = "xxhash64",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Train/val/test assignment where near-duplicate CLUSTERS never
    straddle splits: the split label is a deterministic hash of the
    cluster REPRESENTATIVE (min-id member), not of the document — so a
    near-copy of a training doc can never leak into eval. Keying the
    plain hash split by doc id does NOT give this guarantee (two
    near-dups hash independently); keying by the component closes it.

    ``pairs`` is any near-dup pair frame (n-gram Jaccard, minhash+LSH,
    embedding cosine — whatever edge definition "leak" means for the
    corpus). Appends ``cluster_id`` and ``split``. Plan: the components
    fixpoint over the PAIRS (small relative to the corpus), one
    id-keyed join onto the docs, then the zero-shuffle hash-split
    projection (operators/sampling.py:hash_split semantics, including
    the insertion-ordered cumulative ranges and the md5 portability
    mode)."""
    from ..operators.sampling import hash_split

    cl = canonical_docs(pairs, df, id_col, src, dst).select(
        id_col, "cluster_id"
    )
    return hash_split(
        df.join(cl, id_col), ["cluster_id"], splits,
        seed=seed, hash_fn=hash_fn,
    )


def split_leakage_violations(
    labeled: DataFrame,
    pairs: DataFrame,
    split_col: str = "split",
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Validation twin of :func:`leakage_safe_split`: the near-dup pairs
    whose endpoints were assigned DIFFERENT splits — exact violation rows
    for the "no near-duplicate straddles train/eval" invariant. Empty ⟺
    no connected component of the pair graph straddles splits: any path
    from a train member to an eval member must cross a differently-
    labeled EDGE, so checking edges is complete without computing the
    closure (and the violating edges are the human-readable witnesses a
    validator should emit, unlike a closure's opaque component ids).

    ``labeled`` carries (id_col, split_col) for every document. Two
    id-keyed shuffle joins of pairs against the label projection — both
    on well-distributed document ids; no closure fixpoint, no iteration.
    NULL splits (hash_split's held-back remainder) count as a split of
    their own: a near-dup half in train and half held back is still a
    leak hazard, so NULL≠'train' fires (null-safe inequality)."""
    lab = labeled.select(F.col(id_col), F.col(split_col))
    a = lab.select(
        F.col(id_col).alias(src), F.col(split_col).alias("split_a")
    )
    b = lab.select(
        F.col(id_col).alias(dst), F.col(split_col).alias("split_b")
    )
    return (
        pairs.select(src, dst)
        .join(a, src)
        .join(b, dst)
        .filter(~F.col("split_a").eqNullSafe(F.col("split_b")))
        .select(src, dst, "split_a", "split_b")
    )
