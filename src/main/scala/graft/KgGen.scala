package graft

import org.apache.spark.sql.SparkSession
import graft.analytics.Analytics
import graft.cluster.CandidatePairs.ClusterConfig
import graft.cluster.ClusterGraph
import graft.extract.{Extract, PatternScorer, Scorer}
import graft.model.{Graph, GraphJson, Message, Page}

/** The reference's public API surface, Spark-native — one class with the
  * same verbs as `KGGen` (reference: src/kg_gen/kg_gen.py:25 — `generate`,
  * `cluster`, `aggregate`, `from_file`, plus retrieval): a user of the
  * reference can switch call-for-call.
  *
  * This facade is the *driver-convenience* layer: inputs are strings or
  * small conversations and outputs are materialized [[Graph]]s, exactly
  * like the reference. The scale path is the same code underneath —
  * [[graft.extract.Extract]] / [[graft.cluster.ClusterGraph]] over
  * `Dataset[Page]` — driven by [[graft.pipeline.KgGenJob]] for whole-table
  * runs (the reference has no analogue of that path; its scale story is
  * thread pools).
  *
  * Differences from the reference, all intentional (SURVEY.md §7.5):
  *   - the LLM is a pluggable deterministic [[Scorer]];
  *   - clustering is an order-independent fixpoint, not a greedy LLM
  *     loop — the reference's own tests only assert properties that hold
  *     here by construction;
  *   - `context` steering of clustering is an explicit [[ClusterConfig]]
  *     (synonym sets), not free prompt text.
  */
final class KgGen(
    spark: SparkSession,
    scorer: Scorer = PatternScorer,
    chunkSize: Int = graft.textprep.Chunker.DefaultMaxChunkSize
) {

  /** generate: text -> Graph (reference: kg_gen.py:149-268). Optional
    * clustering mirrors `generate(cluster=True)` (kg_gen.py:244-245);
    * `context` mirrors `generate(context=...)` — the domain hint that
    * steers relation extraction (kg_gen.py:149-174), here the
    * deterministic [[graft.extract.ContextScorer]] gate.
    */
  def generate(
      text: String,
      cluster: Boolean = false,
      clusterConfig: ClusterConfig = ClusterConfig(),
      context: String = ""
  ): Graph = {
    val g = generateRaw(text, isConversation = false, context)
    if (cluster) this.cluster(g, clusterConfig) else g
  }

  /** generate from a conversation (reference: kg_gen.py:176-195): keep
    * user/assistant messages, flatten to "role: content" lines in order.
    */
  def generateConversation(
      messages: Seq[Message],
      cluster: Boolean = false,
      clusterConfig: ClusterConfig = ClusterConfig()
  ): Graph = {
    val flattened = messages
      .sortBy(_.seq)
      .filter(m => m.role == "user" || m.role == "assistant")
      .map(m => s"${m.role}: ${m.content}")
      .mkString("\n")
    val g = generateRaw(flattened, isConversation = true)
    if (cluster) this.cluster(g, clusterConfig) else g
  }

  private def generateRaw(text: String, isConversation: Boolean, context: String = ""): Graph = {
    val effectiveScorer =
      if (context.nonEmpty) graft.extract.ContextScorer(scorer, context) else scorer
    import spark.implicits._
    val page = Page(
      url = "inline://text/0",
      warc_ts = new java.sql.Timestamp(0L),
      html = Array.emptyByteArray,
      text = text,
      lang = "en"
    )
    val pages = spark.createDataset(Seq(page))
    val cfg = Extract.Config(chunkSize = chunkSize, isConversation = isConversation)
    // inline pages carry no html; chunk directly from `text` (the html
    // path and its byte-identical invariant are exercised by the table
    // pipeline, not this convenience entry)
    val chunks = pages.flatMap { p =>
      graft.textprep.Chunker
        .chunk(p.text, cfg.chunkSize)
        .iterator
        .zipWithIndex
        .map { case (t, i) => graft.model.Chunk(p.url, i, t) }
    }
    val ex = Extract.extractions(chunks, effectiveScorer, cfg)
    val tm = Extract.tripleMentions(ex)
    val triples = Extract.tripleTable(tm)
    Extract.toGraph(Extract.entityTable(Extract.mentions(ex)), triples, Extract.edgeTable(triples))
  }

  /** cluster: canonicalize entities and edges, rewrite relations
    * (reference: kg_gen.py:270-289 -> steps/_3_cluster_graph.py:279-325).
    */
  def cluster(g: Graph, cfg: ClusterConfig = ClusterConfig()): Graph =
    ClusterGraph.clusterDriverGraph(spark, g, cfg)

  /** aggregate: n-way set union, cluster maps dropped
    * (reference: kg_gen.py:291-304).
    */
  def aggregate(graphs: Seq[Graph]): Graph = Graph.aggregate(graphs)

  /** from_file / save: the reference's JSON graph format
    * (kg_gen.py:139-147, :247-266).
    */
  def fromFile(path: String): Graph = GraphJson.read(path)
  def save(g: Graph, path: String): Unit = GraphJson.write(g, path)

  /** retrieve: top-k relevant nodes -> 2-hop context sentences joined to
    * one string (reference: kg_gen.py:348-368).
    */
  def retrieve(g: Graph, query: String, k: Int = 3): String = {
    import spark.implicits._
    val entities = g.entities.toSeq.toDF("entity")
    val triples = g.relations.toSeq.toDF("subject", "predicate", "obj")
    val rows = Analytics.retrieve(entities, triples, query, k).collect()
    if (rows.isEmpty || rows.head.isNullAt(0)) "" else rows.head.getString(0)
  }
}
