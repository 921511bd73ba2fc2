package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.functions.broadcast

/** Size-gated plan hints. */
object PlanHints {

  /** Above this many rows a dictionary is no longer assumed
    * broadcast-safe (~hundreds of MB of surface forms at typical string
    * lengths — beyond the default executor broadcast budget).
    */
  val BroadcastMaxRows = 5000000L

  /** Broadcast `df` only when it is provably small: either every leaf of
    * the analyzed plan is a driver-local LocalRelation (the adaptive
    * small-dictionary cluster path collects its members first, so its
    * outputs are local and bounded), or the caller supplies a known row
    * count under [[BroadcastMaxRows]]. Otherwise the frame is returned
    * unhinted and AQE converts the join to broadcast at runtime from
    * OBSERVED sizes — at the 10^12-doc design point the distinct-surface
    * dictionary can be billions of rows, where an unconditional
    * compile-time `broadcast()` is an executor OOM, not a plan choice.
    */
  /** True when every leaf of the analyzed plan is a driver-local
    * LocalRelation — the frame is provably bounded by data the driver
    * already holds.
    */
  def isDriverLocal(df: DataFrame): Boolean = {
    val leaves = df.queryExecution.analyzed.collectLeaves()
    leaves.nonEmpty && leaves.forall(_.isInstanceOf[LocalRelation])
  }

  def maybeBroadcast(df: DataFrame, knownRows: Option[Long] = None): DataFrame =
    if (knownRows.exists(_ <= BroadcastMaxRows) || (knownRows.isEmpty && isDriverLocal(df)))
      broadcast(df)
    else df
}
