package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.Dedup

/** Streaming face of the incremental delta-crawl dedup
  * ([[graft.ops.Dedup.incrementalKeep]]): documents arrive as an
  * unbounded stream and each micro-batch is deduplicated against the
  * committed base corpus through its band-index + token-set snapshot
  * artifacts — the live-ingest version of the recrawl story.
  *
  * Shape: foreachBatch applying the batch operator per micro-batch. The
  * verdict for a delta document is a PURE function of (that document,
  * the static base artifacts) — delta docs never interact — so any
  * micro-batch split of the same delta set produces exactly the batch
  * operator's verdict rows (sbt parity test), and a replayed
  * micro-batch reproduces its rows verbatim: an idempotent upsert by
  * doc_id at the sink gives exactly-once content. No streaming state
  * store is needed at all — the "state" is the committed base snapshot.
  */
object DedupStream {

  /** Start the verdict stream: each micro-batch's
    * (doc_id, dup_of, keep) frame is handed to `onBatch`.
    */
  def keepVerdicts(
      delta: DataFrame,
      baseIndex: DataFrame,
      baseToks: DataFrame,
      onBatch: (DataFrame, Long) => Unit,
      thetaPct: Int = 90,
      seeds: Int = 16,
      bands: Int = 8,
      maxBucket: Option[Int] = None,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery =
    delta.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        onBatch(
          Dedup.incrementalKeepIndexed(
            baseIndex, baseToks, batch, thetaPct, seeds, bands, maxBucket),
          id
        )
      }
      .start()
}
