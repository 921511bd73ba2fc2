package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins over the events table — the two classic time-series
  * join shapes (as-of and bounded range) expressed so neither ever
  * materializes an unbounded time-range cross product.
  *
  * These are the operators the brief calls out as "what Spark lacks";
  * both are composed from existing relational ops (preference (a)):
  * as-of as a union-and-window merge, range as a bucketed interval
  * equi-join.
  */
object Temporal {

  /** The registry's shared value quantization (milli-units, half-up). */
  private def vMilli = expr("CAST(floor(CAST(value AS DOUBLE) * 1000 + 0.5) AS BIGINT)")

  /** As-of join: every `probeType` event is paired with the latest
    * `quoteType` event of the SAME user at-or-before its timestamp (the
    * market-data "each trade gets the prevailing quote" shape).
    *
    * Implementation is the union-and-window form, not a join: tag each
    * side, sort per user by (ts, side, event_id) — quotes order before
    * probes on an equal timestamp, so at-or-before includes ties, and
    * the unique event_id makes the order total — then carry the last
    * non-null quote forward with one running-frame window.
    *
    * Scale shape: ONE exchange on user_id and one sort feed both
    * `last` columns (same partition/order/frame ⇒ a single Sort+Window
    * pair). There is no join operator at all, so there is no
    * time-range blow-up to contain — this is the point-in-time merge
    * of two sorted streams, the plan an as-of join compiles to in
    * engines that have it natively. Output values are quantized
    * integers so the oracle replays it bit-identically.
    */
  /** SCD2 dimension build — the slowly-changing-dimension pass a
    * lakehouse warehouse runs to turn an event stream into validity
    * intervals: per user, each `quoteType` event opens a version row
    * (user_id, value_milli, valid_from, valid_to) whose valid_to is the
    * NEXT version's start (NULL = current). The standard
    * effective-dating shape joins and as-of lookups read from. Values
    * are quantized to integer milli so both engines agree exactly.
    *
    * Shape at scale: one exchange keyed by user + one lead window per
    * partition — the same single-sort pattern as sessionize; no join,
    * no global sort.
    */
  def scd2(events: DataFrame, quoteType: String = "view"): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .where(col("event_type") === quoteType)
      .select(col("user_id"), col("ts"), col("event_id"), vMilli.as("value_milli"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(
        col("user_id"),
        col("value_milli"),
        col("ts").as("valid_from"),
        col("valid_to")
      )
  }

  def asofJoin(
      events: DataFrame,
      probeType: String = "purchase",
      quoteType: String = "view"
  ): DataFrame = {
    val tagged = events
      .where(col("event_type").isin(probeType, quoteType))
      .select(
        col("user_id"),
        col("ts"),
        col("event_id"),
        when(col("event_type") === probeType, lit(1L)).otherwise(lit(0L)).as("side"),
        when(col("event_type") === quoteType, col("event_id")).as("q_id"),
        when(col("event_type") === quoteType, vMilli).as("q_milli")
      )
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("quote_id", last(col("q_id"), ignoreNulls = true).over(w))
      .withColumn("quote_milli", last(col("q_milli"), ignoreNulls = true).over(w))
      .where(col("side") === 1L)
      .select(
        col("event_id").as("probe_id"),
        col("user_id"),
        col("quote_id"),
        col("quote_milli")
      )
  }

  /** Bounded-range (interval) join: every `probeType` event is paired
    * with each `targetType` event of the same user whose timestamp
    * falls in [probe, probe + horizon) — e.g. "purchases within an hour
    * of each signup". Time compares in whole epoch seconds
    * (unix_timestamp ≡ DuckDB floor(epoch(ts))), making the boundary an
    * engine-independent fact.
    *
    * Scale shape: the horizon itself is the bucket width, so a target
    * can only land in its probe's bucket or the next one — the probe
    * side fans out to exactly 2 bucket keys and the join becomes a
    * plain equi-join on (user_id, bucket) with the exact range
    * predicate as a post-filter. Each qualifying pair matches in
    * exactly one bucket (the target's own), so no dedup pass is
    * needed. Never a per-user cross product, never a
    * BroadcastNestedLoopJoin: candidate volume is bounded by true
    * temporal locality, and AQE's skew handling applies because it is
    * a shuffle hash join like any other.
    */
  def rangeJoin(
      events: DataFrame,
      probeType: String = "signup",
      targetType: String = "purchase",
      horizonMinutes: Int = 60
  ): DataFrame = {
    val horizonSec = horizonMinutes * 60L
    val probes = events
      .where(col("event_type") === probeType)
      .select(
        col("user_id"),
        col("event_id").as("probe_id"),
        unix_timestamp(col("ts")).as("p_sec")
      )
      .withColumn("b0", floor(col("p_sec") / lit(horizonSec)).cast("long"))
      .withColumn("bucket", explode(array(col("b0"), col("b0") + lit(1L))))
      .drop("b0")
    val targets = events
      .where(col("event_type") === targetType)
      .select(
        col("user_id").as("t_user_id"),
        col("event_id").as("target_id"),
        unix_timestamp(col("ts")).as("t_sec")
      )
      .withColumn("t_bucket", floor(col("t_sec") / lit(horizonSec)).cast("long"))
    probes
      .join(targets, col("user_id") === col("t_user_id") && col("bucket") === col("t_bucket"))
      .where(col("t_sec") >= col("p_sec") && col("t_sec") < col("p_sec") + lit(horizonSec))
      .select(
        col("probe_id"),
        col("user_id"),
        col("target_id"),
        (col("t_sec") - col("p_sec")).as("lag_sec")
      )
  }

  /** Conversion-latency histogram over the [[rangeJoin]] pair rule —
    * the signup→purchase delay distribution in log2 buckets (bucket 0
    * = instant, bucket k = lags in [2^(k−1), 2^k)), with the exact
    * min/max lag per bucket: the funnel-latency shape a growth report
    * reads ("most conversions land within 2^7 s"). Output:
    * (bucket, n_pairs, min_lag_sec, max_lag_sec).
    *
    * Shape at scale: the bounded-range equi-join's pair stream folds
    * through ONE partial-aggregated exchange into ≤ log2(horizon)
    * buckets; nothing beyond the shared join is added.
    */
  def latencyHistogram(
      events: DataFrame,
      probeType: String = "signup",
      targetType: String = "purchase",
      horizonMinutes: Int = 60
  ): DataFrame =
    rangeJoin(events, probeType, targetType, horizonMinutes)
      .groupBy(
        expr("CASE WHEN lag_sec = 0 THEN 0L ELSE CAST(length(bin(lag_sec)) AS BIGINT) END").as("bucket")
      )
      .agg(
        count(lit(1)).as("n_pairs"),
        min(col("lag_sec")).as("min_lag_sec"),
        max(col("lag_sec")).as("max_lag_sec")
      )
}
