package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the step that
  * turns near-duplicate PAIRS into duplicate CLUSTERS so a corpus can
  * keep one representative per cluster.
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with its own id; each round a node takes the min of its label and its
  * neighbors' labels; fixpoint ⇒ every node carries the min id of its
  * component. Rounds needed ≈ graph diameter — near-dup clusters are
  * small and dense, so a handful.
  *
  * Scale notes: each round is one join (labels ⋈ edges) + one
  * aggregation, both hash-partitioned on node id — the same key every
  * round, so AQE/exchange reuse keeps re-partitioning cheap. Lineage is
  * truncated with localCheckpoint every round (iterative DataFrames
  * otherwise grow an unbounded plan). The convergence check is a
  * count of changed labels — one action per round. For web-scale graphs
  * swap in the large-star/small-star variant; the API stays the same.
  */
object Components {

  /** (id, component) for every node in `edges` (ida, idb); component =
    * min node id reachable. Deterministic.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val e = edges.select(col("ida").as("src"), col("idb").as("dst"))
    // undirected: both directions. The edge/label frames are orders of
    // magnitude smaller than the corpus (only near-dup members) — run the
    // iteration narrow so each round isn't 32 near-empty tasks.
    val adj = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .repartition(8, col("src"))
      .localCheckpoint(eager = true)
    var labels = adj.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .repartition(8, col("id"))
      .localCheckpoint(eager = true)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // neighbor labels: for each dst, min label among its neighbors
      val neighborMin = adj
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min("label").as("nlabel"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nlabel"), col("label")))
            .as("label"))
        .localCheckpoint(eager = true)
      val changed = next.join(labels.withColumnRenamed("label", "old"), "id")
        .filter(col("label") =!= col("old")).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    labels.select(col("id"), col("label").as("component"))
  }

  /** Cluster assignments for near-duplicate documents plus the canonical
    * representative (min doc id) per cluster — the "which docs to drop"
    * table: keep rows where id == component.
    */
  def dupClusters(pairs: DataFrame): DataFrame =
    connectedComponents(pairs)
      .withColumn("is_canonical", (col("id") === col("component")).cast("int"))

  /** The cleaned corpus: documents that survive dedup. A doc is kept iff
    * it is NOT a non-canonical member of a near-dup cluster (exact dups
    * are jaccard-1.0 pairs, so they land in clusters too — one canonical
    * survives per group). Anti-join keeps the big side unshuffled beyond
    * the (tiny) drop-list broadcast.
    */
  def cleanCorpus(docs: DataFrame, pairs: DataFrame,
                  idCol: String): DataFrame = {
    val drop = dupClusters(pairs)
      .filter(col("is_canonical") === 0)
      .select(col("id").as(idCol))
    docs.join(broadcast(drop), Seq(idCol), "left_anti")
  }
}
