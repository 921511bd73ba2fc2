package graft.util

import org.apache.spark.sql.DataFrame

/** Shared materialization strategy for multi-reference / iterative
  * operators (same policy as ConnectedComponents): when the caller set a
  * RELIABLE checkpoint dir (`sparkContext.setCheckpointDir` — the right
  * choice on a real multi-executor cluster, where localCheckpoint's
  * unreplicated executor-local blocks make the job unrecoverable on
  * executor loss), use reliable checkpoints; otherwise (local/bench)
  * localCheckpoint. Eager: the checkpoint job runs now, so every later
  * reference — including several references inside ONE downstream job —
  * reads the materialized blocks instead of re-deriving the lineage.
  * Blocks are released by the ContextCleaner when the returned Dataset
  * goes out of scope.
  */
object Materialize {
  def stage(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(true)
    else df.localCheckpoint(true)

  /** [[stage]], then re-bind the result to FRESH attributes: the
    * repeated union/anti-join of checkpointed rounds in iterative
    * operators (BFS, transitive closure, betweenness) otherwise trips
    * Spark's Union constraint rewrite on stale expression ids ("key
    * not found") — a fresh LogicalRDD per round carries no
    * constraints. One definition so the rebind discipline cannot
    * drift between the iterative operators.
    */
  def stageFresh(df: DataFrame): DataFrame = {
    val m = stage(df)
    m.sparkSession.createDataFrame(m.rdd, m.schema)
  }
}
