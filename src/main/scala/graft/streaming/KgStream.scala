package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.extract.{Extract, PatternScorer, Scorer}
import graft.model.{Page, Triple}
import graft.store.MemoryStore

/** Streaming KG construction — the batch generate() dataflow applied to
  * an unbounded page stream (the reference's incremental analogue is the
  * MCP add_memories loop, mcp/server.py:131-166: each new text batch
  * extends the persistent graph with its new triples).
  *
  * The extraction stages ([[Extract.chunks]], [[Extract.extractions]])
  * are NARROW transforms (flatMap / mapPartitions), so they run
  * unchanged per micro-batch; global set semantics — each (s, p, o)
  * appears exactly once across the stream's whole lifetime — comes from
  * [[EventsStream.newTriples]]'s flatMapGroupsWithState state store
  * rather than a batch-wide distinct (which streaming cannot express).
  * State is one boolean per distinct triple, partitioned by the triple
  * key: the streaming equivalent of the batch pipeline's final
  * HashAggregate, with the same shuffle key.
  *
  * Batch/stream parity (sbt-tested): feeding the same pages in any
  * micro-batch split yields exactly the batch pipeline's triple set.
  */
object KgStream {

  /** pages stream -> stream of first-occurrence canonical-form triples.
    * Works on batch Datasets too (parity tests run both).
    */
  def triples(
      pages: Dataset[Page],
      scorer: Scorer = PatternScorer,
      cfg: Extract.Config = Extract.Config()
  ): Dataset[Triple] = {
    import pages.sparkSession.implicits._
    val ex = Extract.extractions(Extract.chunks(pages, cfg), scorer, cfg)
    val valid = Extract.tripleMentions(ex)
      .select("subject", "predicate", "obj")
      .as[Triple]
    EventsStream.newTriples(valid)
  }

  /** The MCP add_memories loop LIVE on a page stream: each micro-batch's
    * extracted triples merge into the persistent [[MemoryStore]] via
    * foreachBatch (reference: mcp/server.py:131-166 — generate a graph
    * from new text, aggregate into the store, save). The store's own
    * anti-join MERGE dedup makes the per-batch distinct sufficient — no
    * cross-batch state needed here, so this variant is fully
    * restart-safe: a replayed micro-batch re-merges rows the store
    * already holds and lands as an empty delta (exactly-once CONTENT,
    * the same idempotence Iceberg MERGE gives a replayed writer).
    *
    * Returns the started query; the caller owns its lifecycle.
    */
  def intoStore(
      pages: Dataset[Page],
      store: MemoryStore,
      scorer: Scorer = PatternScorer,
      cfg: Extract.Config = Extract.Config(),
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery = {
    val ex = Extract.extractions(Extract.chunks(pages, cfg), scorer, cfg)
    ex.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[graft.extract.ChunkExtraction], _: Long) =>
        // persist: the scorer pass feeds both tables and the store's
        // several commit actions — run it once per micro-batch
        val exb = batch.persist()
        try {
          // ALL mentioned entities, not just triple endpoints — batch
          // generate() (and the reference's add_memories) stores
          // entities that appear in no valid triple too
          val entities = Extract.entitySet(exb)
          val tdf = Extract.tripleTable(Extract.tripleMentions(exb))
          store.addMemories(entities, tdf)
        } finally exb.unpersist()
        ()
      }
      .start()
  }
}
