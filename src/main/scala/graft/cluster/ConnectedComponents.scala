package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative connected components over DataFrames — min-label
  * propagation, the scalable replacement for the reference's driver-side
  * union-find-ish cluster bookkeeping
  * (src/kg_gen/steps/_3_cluster_graph.py:259-261, _process_batch) and the
  * BFS used by the visualizer (src/kg_gen/utils/visualize_kg.py:144-169).
  *
  * Design for scale (SURVEY.md §4):
  *   - each iteration is one shuffle (groupBy node, min(label)); partial
  *     aggregation (map-side combine) absorbs hub-node skew, so hot keys
  *     never concentrate raw rows on one reducer;
  *   - every iteration is persisted and the previous one unpersisted:
  *     cache substitution keeps the iterated plan shallow (no lineage
  *     blowup) without retaining every round's blocks;
  *   - convergence detected by an aggregate checksum whose action ALSO
  *     materializes the round's cache — one job per iteration total —
  *     with an O(diameter) iteration bound; surface-variant clusters
  *     have single-digit diameters, so the loop is short in practice.
  */
object ConnectedComponents {

  /** @param edges columns (src, dst) — undirected semantics
    * @param nodes one column `node`; isolated nodes keep their own label
    * @return (node, component) where component = min node label reachable
    */
  def run(edges: DataFrame, nodes: DataFrame, maxIterations: Int = 20): DataFrame = {
    val und = edges
      .select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist()

    var labels = nodes
      .select(col("node"))
      .distinct()
      .withColumn("label", col("node"))
      .persist()

    // order-independent, overflow-free label fingerprint; the action also
    // materializes the df's cache — ONE job per iteration does both the
    // propagation step and the convergence check
    def checksum(df: DataFrame): Long = {
      val r = df.agg(bit_xor(xxhash64(col("node"), col("label")))).head
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    var converged = false
    var iter = 0
    var prevSum = checksum(labels)
    while (!converged && iter < maxIterations) {
      val nbr = und
        .join(labels, und("src") === labels("node"))
        .select(und("dst").as("node"), col("label"))
      // caching each round keeps the iterated plan shallow too: the
      // cache manager substitutes InMemoryRelation for the previous
      // round's subtree, so analysis cost stays O(1) per iteration
      val next = nbr
        .union(labels.select("node", "label"))
        .groupBy("node")
        .agg(min("label").as("label"))
        .persist()
      val sumNow = checksum(next)
      converged = sumNow == prevSum
      prevSum = sumNow
      labels.unpersist(false)
      labels = next
      iter += 1
    }
    und.unpersist(false)
    labels.withColumnRenamed("label", "component")
  }
}
