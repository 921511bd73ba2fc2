package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triple-set delta between two committed KG snapshots — the incremental
  * maintenance primitive for the generate → cluster → aggregate pipeline:
  * when a new crawl lands, downstream consumers want (added, removed)
  * triples between the previous canonical graph and the new one, not a
  * full re-read (the reference's aggregate() only unions graphs,
  * src/kg_gen/kg_gen.py:291-304; the delta view is its inverse).
  *
  * Scale shape: ONE shuffle. Instead of two anti-joins (2 exchanges of
  * the full triple sets + join build sides), each side is tagged ±1 and
  * a single groupBy(subject, predicate, obj).sum classifies every key:
  * net +1 = added, −1 = removed, 0 = unchanged (dropped). Map-side
  * partial aggregation halves the exchanged volume when either side has
  * locality, and AQE coalesces the post-shuffle partitions. At 100 TB
  * the inputs are bucketed snapshot tables on the same key layout, so
  * the exchange disappears entirely on co-bucketed reads.
  *
  * Precondition: both inputs carry set semantics (distinct triples) —
  * exactly what `TokenRules.triples` and the pipeline's committed
  * canonical tables guarantee; nets are then exactly −1/0/+1.
  */
object GraphDiff {

  /** (subject, predicate, obj, change∈{added,removed}) between two
    * distinct-triple snapshots.
    */
  def triples(oldTriples: DataFrame, newTriples: DataFrame): DataFrame = {
    val o = oldTriples.select(
      col("subject"), col("predicate"), col("obj"), lit(-1L).as("w"))
    val n = newTriples.select(
      col("subject"), col("predicate"), col("obj"), lit(1L).as("w"))
    o.union(n)
      .groupBy("subject", "predicate", "obj")
      .agg(sum("w").as("net"))
      .where(col("net") =!= 0L)
      .select(
        col("subject"),
        col("predicate"),
        col("obj"),
        when(col("net") > 0, lit("added")).otherwise(lit("removed")).as("change")
      )
  }
}
