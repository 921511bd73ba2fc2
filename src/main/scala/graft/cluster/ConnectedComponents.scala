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
  *   - `localCheckpoint` after every iteration truncates lineage
  *     (iterative plans otherwise grow exponentially);
  *   - convergence detected by an aggregate checksum (one tiny job) with
  *     an O(diameter) iteration bound; surface-variant clusters have
  *     single-digit diameters, so the loop is short in practice.
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
      .localCheckpoint()

    var labels = nodes
      .select(col("node"))
      .distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()

    def checksum(df: DataFrame): Long = {
      // order-independent, overflow-free (ANSI mode) label fingerprint
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
      val next = nbr
        .union(labels.select("node", "label"))
        .groupBy("node")
        .agg(min("label").as("label"))
        .localCheckpoint()
      val sumNow = checksum(next)
      converged = sumNow == prevSum
      prevSum = sumNow
      labels = next
      iter += 1
    }
    labels.withColumnRenamed("label", "component")
  }
}
