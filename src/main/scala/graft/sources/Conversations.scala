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
}
