"""Connected components over pair relations (dedup clustering).

Near-dup detection emits PAIRS (minhash_lsh_pairs, simhash_hamming_
pairs, embedding_near_dup_pairs); a real training-data pipeline then
needs one canonical document per duplicate CLUSTER — the transitive
closure of the pair relation. That is an iterative fixpoint, not a
single SQL query, so it gets a driver-looped Spark implementation:

min-label propagation with pointer doubling. Each iteration joins the
current labels across edges AND across the label graph itself (a node
adopts the label of its label), which contracts chains in O(log
diameter) instead of O(diameter) rounds. Each round is two
shuffle-joins + an aggregate; lineage is cut with localCheckpoint so
the plan does not grow with iterations. Convergence is detected with
one count per round (a scalar driver-side aggregate — no data
collect).

The DuckDB oracle is a recursive CTE computing min-reachable-node,
feasible at test scale; at 100 TB the Spark loop is the only game in
town and its round count is logarithmic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst",
                         max_iter: int = 25) -> DataFrame:
    """(node, component) for every node in ``edges``; component =
    smallest node id in the connected component.

    Pointer-doubling min-label propagation: converges in
    O(log diameter) rounds; raises if ``max_iter`` rounds do not reach
    the fixpoint (2^25 ≈ 3e7 diameter — beyond any dedup graph).
    """
    e = (edges.select(F.col(src).cast("long").alias("a"),
                      F.col(dst).cast("long").alias("b")))
    sym = e.union(e.select(F.col("b").alias("a"),
                           F.col("a").alias("b"))).distinct()
    sym = sym.localCheckpoint()
    labels = (sym.select(F.col("a").alias("node")).distinct()
              .withColumn("label", F.col("node"))
              .localCheckpoint())

    for _ in range(max_iter):
        # 1-hop: min label over graph neighbors
        nbr = (sym.join(labels, sym["b"] == labels["node"])
               .groupBy("a").agg(F.min("label").alias("nbr_min")))
        one_hop = (labels.join(nbr, labels["node"] == nbr["a"], "left")
                   .select("node",
                           F.least("label",
                                   F.coalesce("nbr_min", "label"))
                           .alias("label")))
        # pointer doubling: adopt the label of one's label
        lab2 = one_hop.select(F.col("node").alias("l_node"),
                              F.col("label").alias("l_label"))
        doubled = (one_hop.join(lab2,
                                one_hop["label"] == lab2["l_node"])
                   .select("node",
                           F.least("label", "l_label").alias("label"))
                   .localCheckpoint())
        changed = (doubled.alias("n")
                   .join(labels.alias("o"), "node")
                   .where(F.col("n.label") != F.col("o.label"))
                   .count())
        labels = doubled
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(f"no fixpoint after {max_iter} rounds")


def dedup_clusters(docs: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id",
                   pair_a: str = "doc_a",
                   pair_b: str = "doc_b") -> DataFrame:
    """Every document labeled with its duplicate-cluster id (the
    smallest doc_id in its near-dup component; singletons label
    themselves) plus the cluster size and a keep flag (the canonical
    representative). The downstream filter ``keep`` is the actual
    dedup step of a training-data pipeline."""
    comp = connected_components(pairs, pair_a, pair_b)
    out = (docs.select(F.col(id_col).cast("long").alias("doc_id"))
           .join(comp, F.col("doc_id") == F.col("node"), "left")
           .select("doc_id",
                   F.coalesce("component", "doc_id").alias("cluster_id")))
    sizes = out.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    return (out.join(sizes, "cluster_id")
            .select("doc_id", "cluster_id", "cluster_size",
                    (F.col("doc_id") == F.col("cluster_id"))
                    .alias("keep")))
