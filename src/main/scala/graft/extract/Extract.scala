package graft.extract

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model._
import graft.textprep.{Chunker, TextExtract}

/** One chunk's extraction result — the per-chunk structured output of the
  * scorer (entities + triples ride in the row, so the reference's
  * subject/object-in-entities filter needs no join).
  */
final case class ChunkExtraction(
    url: String,
    chunkId: Int,
    entities: Seq[String],
    triples: Seq[Triple]
)

/** The generate() pipeline re-expressed as Spark dataflow
  * (reference lifecycle: src/kg_gen/kg_gen.py:149-268; SURVEY.md §3.1):
  *
  *   pages --filter(lang)--> flatMap(clean+chunk) --mapPartitions(score)-->
  *   explode --membership filter--> union/distinct --> graph tables
  *
  * Scale design notes:
  *   - chunking is a narrow flatMap: parallelism = input partitions (the
  *     reference's ThreadPoolExecutor, kg_gen.py:227-231, for free);
  *   - scoring is micro-batched per partition (north-star shape);
  *   - the reference's hard filter (E3, _2_get_relations.py:101-105) is a
  *     per-row array_contains on the chunk's own entity list — chunk
  *     scope means no shuffle join is ever needed for it;
  *   - set semantics (E4, kg_gen.py:233-241) = one distinct per output
  *     table, fused at the end rather than per stage (SURVEY.md §7.5
  *     risk 4) — partial aggregation makes these map-side combines.
  */
object Extract {

  final case class Config(
      chunkSize: Int = Chunker.DefaultMaxChunkSize,
      lang: Option[String] = Some("en"),
      isConversation: Boolean = false,
      scoreBatchSize: Int = 32
  )

  /** pages -> chunks: lang filter (pushed to the parquet scan when pages
    * come from a file source), byte-deterministic clean, chunk.
    */
  def chunks(pages: Dataset[Page], cfg: Config = Config()): Dataset[Chunk] = {
    import pages.sparkSession.implicits._
    val filtered = cfg.lang match {
      case Some(l) => pages.filter(col("lang") === lit(l))
      case None    => pages
    }
    filtered.flatMap { p =>
      val text = TextExtract.extract(p.html)
      Chunker.chunk(text, cfg.chunkSize).iterator.zipWithIndex.map {
        case (t, i) => Chunk(p.url, i, t)
      }
    }
  }

  /** chunks -> per-chunk entities + triples via micro-batched scoring. */
  def extractions(
      chunks: Dataset[Chunk],
      scorer: Scorer = PatternScorer,
      cfg: Config = Config()
  ): Dataset[ChunkExtraction] = {
    import chunks.sparkSession.implicits._
    val batchSize = cfg.scoreBatchSize
    val isConv = cfg.isConversation
    chunks.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val results = scorer.extract(batch.map(_.text), isConv)
        // fail fast on a broken Scorer: zipping a short result list
        // would silently drop the tail chunks' extractions
        require(
          results.size == batch.size,
          s"Scorer returned ${results.size} results for a ${batch.size}-chunk batch"
        )
        batch.lazyZip(results).map { (c, r) =>
          ChunkExtraction(c.url, c.chunkId, r._1, r._2)
        }
      }
    }
  }

  /** E1 output with provenance: (url, chunkId, entity), distinct per chunk. */
  def mentions(ex: Dataset[ChunkExtraction]): DataFrame =
    ex.select(col("url"), col("chunkId"), explode(col("entities")).as("entity"))
      .dropDuplicates("url", "chunkId", "entity")

  /** E2+E3 output with provenance: the membership filter is declarative
    * (array_contains against the row's own entity list).
    */
  def tripleMentions(ex: Dataset[ChunkExtraction]): DataFrame =
    ex.select(col("url"), col("chunkId"), col("entities"), explode(col("triples")).as("t"))
      .where(
        array_contains(col("entities"), col("t.subject")) &&
          array_contains(col("entities"), col("t.obj"))
      )
      .select(col("url"), col("chunkId"), col("t.subject"), col("t.predicate"), col("t.obj"))

  /** Global entity set (E4 union + distinct). */
  def entityTable(mentions: DataFrame): DataFrame =
    mentions.select("entity").distinct()

  /** Global entity set directly off extractions — one explode + global
    * distinct, skipping the per-chunk provenance dedup (same set as
    * `entityTable(mentions(ex))`; the lean-pipeline derivation).
    */
  def entitySet(ex: Dataset[ChunkExtraction]): DataFrame =
    ex.select(explode(col("entities")).as("entity")).distinct()

  /** Global triple set (E4 union + distinct). */
  def tripleTable(tripleMentions: DataFrame): DataFrame =
    tripleMentions.select("subject", "predicate", "obj").distinct()

  /** Derived edges (E5: kg_gen.py:241). */
  def edgeTable(triples: DataFrame): DataFrame =
    triples.select("predicate").distinct()

  /** Full generate() dataflow returning the three graph tables. */
  def generate(
      pages: Dataset[Page],
      scorer: Scorer = PatternScorer,
      cfg: Config = Config()
  ): (DataFrame, DataFrame, DataFrame) = {
    import pages.sparkSession.implicits._
    // the scorer pass feeds all three output tables (and triples feeds
    // edges) — stage it once, or each table's action replays chunking +
    // scoring over the corpus (KgGenJob commits this stage as its
    // 'extracted' snapshot for the same reason)
    val ex = graft.util.Materialize
      .stage(extractions(chunks(pages, cfg), scorer, cfg).toDF())
      .as[ChunkExtraction]
    val tm = tripleMentions(ex)
    val triples = tripleTable(tm)
    (entityTable(mentions(ex)), triples, edgeTable(triples))
  }

  /** Driver-side Graph materialization — test/golden scale only. */
  def toGraph(entities: DataFrame, triples: DataFrame, edges: DataFrame): Graph = {
    val e = entities.collect().map(_.getString(0)).toSet
    val t = triples.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val ed = edges.collect().map(_.getString(0)).toSet
    Graph(e, ed, t)
  }
}
