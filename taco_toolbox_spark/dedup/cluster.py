"""Duplicate-pair → cluster resolution via distributed connected
components (hash-min label propagation).

Every near-dup stage in this package (exact, ngram, minhash, simhash,
embedding) emits PAIRS — but a dedup pipeline must finally pick one
canonical document per GROUP, and near-duplication is not transitive:
A~B and B~C pairs must collapse into one {A,B,C} cluster even when A~C
was never emitted. That closure is connected components on the pair
graph.

Algorithm: iterative hash-min with pointer jumping. Each node's label
starts as its own id; every iteration each node takes the min of its
label, its neighbors' labels, AND its label's label (the pointer jump —
classic shortcutting); fixpoint = every node carries the min id of its
component.

Scale shape per iteration: two shuffle joins (labels onto edges, labels
onto labels — both keyed by node id, a well-distributed key) + one
groupBy-min (map-side partial combine). The jump makes chains collapse
in O(log diameter) rounds rather than O(diameter), and duplicate-cluster
graphs are shallow anyway (near-clique blobs plus short chains), so a
handful of iterations close real corpora; ``max_iter`` bounds
pathological chains. Each iteration costs one driver-synchronized
convergence action, so fewer rounds = fewer barriers — measured as the
residual Amdahl cost in the curation pipeline's 4->16 scaling
(BENCH/BASELINE.md supplementary).
Lineage is cut with an eager ``localCheckpoint`` every iteration —
without it the plan doubles per iteration and the driver dies at
iteration ~20 planning a 2^20-node tree (on a cluster, prefer
``spark.sparkContext.setCheckpointDir`` + ``checkpoint()`` for
fault-tolerant truncation; localCheckpoint trades that for speed).
Convergence is detected distributedly: a count of label changes per
iteration (one lightweight action on the already-computed frame), no
label collection to the driver. The alternating large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond") halves iteration counts on long chains; hash-min is chosen for
its 2-op inner loop since dup-graph diameters are small.

Beyond-reference training-pipeline operator (SURVEY.md §6); the oracle
replicates the closure with a DuckDB recursive CTE over the same edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve an undirected pair list into components.

    Returns (node, cluster_id): one row per distinct node appearing in
    ``pairs``, where cluster_id is the minimum node id reachable from it.
    Raises RuntimeError if ``max_iter`` iterations don't reach fixpoint
    (graph diameter > max_iter — raise it or pre-contract the graph).
    """
    e = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    edges = e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    edges = edges.localCheckpoint(eager=True)  # pairs plan evaluated once
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # neighbor labels: edge (a,b) proposes b's current label to a
        proposed = edges.join(
            labels.withColumnRenamed("node", "b").withColumnRenamed(
                "label", "nb_label"
            ),
            "b",
        ).select(F.col("a").alias("node"), F.col("nb_label").alias("label"))
        # pointer jump: also propose label(label) — classic shortcutting
        # that makes long chains converge in O(log diameter) rounds
        # instead of O(diameter), i.e. fewer driver-synchronized
        # barriers (each iteration costs one convergence-check action)
        jumped = labels.join(
            labels.select(
                F.col("node").alias("label"),
                F.col("label").alias("jump_label"),
            ),
            "label",
        ).select("node", F.col("jump_label").alias("label"))
        new_labels = (
            labels.unionByName(proposed)
            .unionByName(jumped)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(
                labels.withColumnRenamed("label", "old"), "node"
            )
            .filter(F.col("label") != F.col("old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(
                F.col("node"), F.col("label").alias("cluster_id")
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations"
    )


def canonical_docs(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Dedup verdict per document: every doc in ``docs`` mapped to its
    cluster (singletons cluster with themselves) plus ``is_canonical`` —
    true for the min-id member, the row a dedup pipeline keeps. The
    component join is on the doc id (well-distributed); docs never paired
    survive via the left join + coalesce, so the output is a full
    keep/drop decision for the corpus, not just for the paired subset."""
    comp = connected_components(pairs, src, dst)
    return (
        docs.select(F.col(id_col))
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id"),
        )
        .withColumn("is_canonical", F.col(id_col) == F.col("cluster_id"))
    )
