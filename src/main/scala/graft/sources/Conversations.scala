package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table-scale conversation ingest (S1/T1): a messages table
  * (conversation_id, seq, role, content) flattened to one document per
  * conversation, ready for the extraction pipeline.
  *
  * Reference semantics (src/kg_gen/kg_gen.py:176-195): keep only the
  * user/assistant turns of a `list[{role, content}]`, render each as
  * "role: content", join with newlines in list order. The reference
  * processes ONE conversation per call and relies on Python list order;
  * at table scale the order is the explicit `seq` column and every
  * conversation flattens independently in one groupBy — no driver loop,
  * no per-conversation job.
  *
  * Shuffle shape: a single hash aggregate on conversation_id. Message
  * order inside each group is restored by sorting the collected
  * (seq, line) structs — collect_list order is nondeterministic across
  * retries, array_sort is not.
  */
object Conversations {

  val KeptRoles: Seq[String] = Seq("user", "assistant")

  def flatten(messages: DataFrame): DataFrame =
    messages
      .where(col("role").isin(KeptRoles: _*))
      .select(
        col("conversation_id"),
        struct(
          col("seq"),
          concat(col("role"), lit(": "), col("content")).as("line")
        ).as("m")
      )
      .groupBy("conversation_id")
      .agg(
        array_join(
          transform(array_sort(collect_list(col("m"))), m => m.getField("line")),
          "\n"
        ).as("flattened")
      )

  /** Per-conversation turn-structure stats — the filter signals an
    * SFT-data pipeline reads before a conversation enters training:
    * kept-message count, per-role counts, total content length, and
    * the number of role ALTERNATIONS in seq order (a 40-message
    * conversation with 1 switch is a monologue dump, not a dialogue).
    * Only the kept user/assistant turns count, same as [[flatten]].
    * Output: (conversation_id, n_messages, n_user, n_assistant,
    * content_chars, n_switches).
    *
    * Shuffle shape: ONE exchange — the per-conversation lag() window
    * and the same-key aggregate share the hash partitioning, so the
    * groupBy adds no second Exchange.
    */
  def stats(messages: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("conversation_id")
      .orderBy("seq")
    messages
      .where(col("role").isin(KeptRoles: _*))
      .withColumn("prev_role", lag(col("role"), 1).over(w))
      .groupBy("conversation_id")
      .agg(
        count(lit(1)).as("n_messages"),
        count(when(col("role") === "user", lit(1))).as("n_user"),
        count(when(col("role") === "assistant", lit(1))).as("n_assistant"),
        sum(length(col("content"))).cast("long").as("content_chars"),
        count(
          when(col("prev_role").isNotNull && col("role") =!= col("prev_role"), lit(1))
        ).as("n_switches")
      )
  }
}
