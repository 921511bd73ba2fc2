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
}
