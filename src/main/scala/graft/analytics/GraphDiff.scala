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
  * Inputs are expected to carry set semantics (distinct triples) —
  * exactly what `TokenRules.triples` and the pipeline's committed
  * canonical tables guarantee — but the classification reads per-side
  * presence counts, so a duplicated triple on one side still lands on
  * the correct side of the diff.
  */
object GraphDiff {

  /** The shared tag-and-sum classification: side-tagged union grouped on
    * the triple key, aggregating PER-SIDE presence counts (c_old, c_new)
    * in the same single exchange. Membership is read off c_old > 0 /
    * c_new > 0, so the classification is correct even when a caller
    * violates the distinct-snapshot precondition (a triple duplicated
    * on one side never flips sides). ONE definition so [[triples]] and
    * [[predicateChurn]] can never disagree about what changed.
    */
  private def taggedNet(oldTriples: DataFrame, newTriples: DataFrame): DataFrame = {
    val o = oldTriples.select(
      col("subject"), col("predicate"), col("obj"), lit(-1L).as("w"))
    val n = newTriples.select(
      col("subject"), col("predicate"), col("obj"), lit(1L).as("w"))
    o.union(n)
      .groupBy("subject", "predicate", "obj")
      .agg(
        count(when(col("w") === -1L, lit(1))).as("c_old"),
        count(when(col("w") === 1L, lit(1))).as("c_new")
      )
  }

  /** (subject, predicate, obj, change∈{added,removed}) between two
    * distinct-triple snapshots.
    */
  def triples(oldTriples: DataFrame, newTriples: DataFrame): DataFrame =
    taggedNet(oldTriples, newTriples)
      .where(col("c_old") === 0L || col("c_new") === 0L)
      .select(
        col("subject"),
        col("predicate"),
        col("obj"),
        when(col("c_new") > 0, lit("added")).otherwise(lit("removed")).as("change")
      )

  /** Per-predicate recrawl churn rollup — the relation-level "what
    * actually moved" dashboard over the same two snapshots: for every
    * predicate, how many distinct triples each side holds, how many
    * were added/removed, and the symmetric-difference churn rate
    * 1000·(added+removed) div (n_old+n_new) in permille (0 = the
    * relation is recrawl-stable, 1000 = full turnover — the signal
    * that a predicate's extractions are crawl-noise rather than
    * facts). Output:
    * (predicate, n_old, n_new, n_added, n_removed, churn_permille).
    *
    * Shape at scale: the [[triples]] tag-and-sum classification (ONE
    * triple-keyed exchange — per-side presence counts per key, so
    * duplicate-side inputs cannot be misclassified) followed by a predicate-keyed
    * partial-aggregated exchange bounded by the relation vocabulary.
    * No anti-joins, no second corpus pass.
    */
  def predicateChurn(oldTriples: DataFrame, newTriples: DataFrame): DataFrame =
    taggedNet(oldTriples, newTriples)
      .groupBy("predicate")
      .agg(
        count(when(col("c_old") > 0L, lit(1))).as("n_old"),
        count(when(col("c_new") > 0L, lit(1))).as("n_new"),
        count(when(col("c_old") === 0L, lit(1))).as("n_added"),
        count(when(col("c_new") === 0L, lit(1))).as("n_removed")
      )
      .select(
        col("predicate"),
        col("n_old"),
        col("n_new"),
        col("n_added"),
        col("n_removed"),
        expr("(1000 * (n_added + n_removed)) div (n_old + n_new)").as("churn_permille")
      )
}
