package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training mixtures. Every rule is
  * plain 64-bit integer arithmetic (a multiplicative-congruential hash
  * of doc_id), so the sample is reproducible across engines and runs,
  * embarrassingly parallel (a per-row filter — no shuffle, no state),
  * and stable under corpus growth: a document's fate depends only on
  * its own id, never on which partition or batch it arrived in.
  */
object Sampling {

  /** Hash bucket in [0, 100): a Knuth-style multiplicative hash folded
    * to a percentage. Distinct multipliers give the independent streams
    * used by sampling vs splitting (so mixture sampling never biases
    * the eval split).
    */
  private def pctBucket(mult: Long, add: Long): Column =
    expr(s"pmod(doc_id * ${mult}L + ${add}L, 4294967296L) % 100")

  /** Training-mixture sampling: keep each document with the per-row
    * probability `ratePct` (0-100), typically a per-domain weight.
    * Nested by construction: the docs kept at rate r are a subset of
    * those kept at any r' > r, so re-weighting a mixture only adds or
    * removes documents monotonically.
    */
  def mixtureSample(docs: DataFrame, ratePct: Column): DataFrame =
    docs
      .select(col("doc_id"), col("source"), ratePct.cast("long").as("rate_pct"))
      .where(pctBucket(2654435761L, 97L) < col("rate_pct"))

  /** Deterministic train/val/test assignment: valPct% to 'val', the
    * next testPct% to 'test', the rest to 'train'. A per-row projection
    * — the 100 TB shape is a scan with zero exchanges.
    */
  def hashSplit(docs: DataFrame, valPct: Int = 1, testPct: Int = 1): DataFrame =
    docs.select(
      col("doc_id"),
      when(pctBucket(1103515245L, 12345L) < valPct, lit("val"))
        .when(pctBucket(1103515245L, 12345L) < valPct + testPct, lit("test"))
        .otherwise(lit("train"))
        .as("split")
    )
}
