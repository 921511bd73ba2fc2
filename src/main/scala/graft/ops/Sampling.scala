package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.extract.TokenRules

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

  /** Token budget of one packed training sequence. */
  val PackCapacity = 512

  /** Concat-and-cut sequence packing: within each source shard, the
    * token streams of documents (in doc_id order) are conceptually
    * concatenated and cut every `capacity` tokens — the standard
    * pretraining batch-packing rule. Emits, per document, the first and
    * last sequence index it lands in (a document may span a cut).
    *
    * Shape at scale: one shuffle keyed by source + a running-sum window
    * inside each shard — packing is inherently per-shard (a global
    * order would serialize), and the shard IS the unit a packing job
    * writes, so this is the correct 100 TB decomposition. Skewed shard
    * sizes are a data-layout choice upstream, not a join-key skew.
    */
  def seqPack(docs: DataFrame, capacity: Int = PackCapacity): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
    docs
      .select(
        col("doc_id"),
        col("source"),
        size(TokenRules.tokens(col("text"))).cast("long").as("n_tokens")
      )
      .where(col("n_tokens") > 0)
      .withColumn("cum", sum("n_tokens").over(w))
      .select(
        col("doc_id"),
        col("source"),
        col("n_tokens"),
        expr(s"(cum - n_tokens) div $capacity").as("seq_start"),
        expr(s"(cum - 1) div $capacity").as("seq_end")
      )
  }

  /** Quality-weighted resampling (DCLM-style): keep each document with
    * probability quality_milli/1000, decided by an independent
    * deterministic hash stream — upweights long/stopword-dense docs
    * without any randomness. Composes [[TextAnalysis.quality]] (a pure
    * projection) with a per-row filter: zero exchanges end to end.
    */
  def qualitySample(docs: DataFrame): DataFrame =
    TextAnalysis
      .quality(docs)
      .where(expr("pmod(doc_id * 2246822519L + 11L, 4294967296L) % 1000") < col("quality_milli"))
      .select("doc_id", "quality_milli")

  /** Curriculum quality binning: every document's exact quality DECILE
    * (1..10), the ordering key curriculum-learning schedules consume
    * (train easy/high-quality bins first, or anneal mixture weights per
    * bin). Rule shared with the oracle: decile =
    * ceil(10 * cum / n) where cum = number of docs whose quality_milli
    * is <= this doc's — ties share a decile by construction. Output:
    * (doc_id, quality_milli, decile).
    *
    * Shape at scale: the same histogram-cumulative trick as exact
    * percentiles — the only data-sized exchanges are the
    * groupBy(quality value) count and the value-keyed join back
    * (AQE broadcasts the tiny cumulative table); the rank window runs
    * over DISTINCT QUALITY VALUES (bounded — quality_milli is capped at
    * 1000), never over corpus rows. Exact global deciles with no global
    * sort: the shape that stays payable at 100 TB.
    */
  def qualityDeciles(docs: DataFrame): DataFrame = {
    // staged: the quality lineage feeds the count, the histogram build
    // AND the join probe — unstaged it would scan the corpus three times
    val q = graft.util.Materialize.stage(
      TextAnalysis.quality(docs).select(col("doc_id"), col("quality_milli"))
    )
    val n = q.count()
    val cum = q
      .groupBy("quality_milli")
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum("c").over(Window.orderBy("quality_milli")))
      .select(col("quality_milli"), col("cum"))
    q.join(cum, "quality_milli")
      .select(
        col("doc_id"),
        col("quality_milli"),
        expr(s"(10 * cum + ${n}L - 1) div ${n}L").as("decile")
      )
  }

  /** Fixed-quota stratified sample: exactly `k` documents per source
    * (fewer only when the stratum is smaller), chosen as the k smallest
    * md5(doc_id) keys — a deterministic uniform draw whose membership
    * is reproducible across engines and stable per document. Unlike
    * [[mixtureSample]] (Bernoulli — quota only in expectation), this is
    * the exact-quota form used for eval-set carving and per-domain
    * caps. Output: (doc_id, source, rnk).
    *
    * Shape at scale: one exchange on source + per-partition sort — and
    * because rank is bounded by k, Spark plans the window with a
    * running TopK filter (WindowGroupLimit) so each partition retains
    * at most k rows per stratum before the final rank, never the
    * whole stratum in memory.
    */
  def stratifiedSample(docs: DataFrame, k: Int = 50): DataFrame =
    docs
      .select(col("doc_id"), col("source"), md5(col("doc_id").cast("string")).as("h"))
      .withColumn(
        "rnk",
        row_number().over(Window.partitionBy("source").orderBy(col("h"), col("doc_id"))).cast("long")
      )
      .where(col("rnk") <= k)
      .select("doc_id", "source", "rnk")
}
