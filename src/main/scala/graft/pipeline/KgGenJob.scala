package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.analytics.Analytics
import graft.cluster.CandidatePairs.ClusterConfig
import graft.cluster.ClusterGraph
import graft.corpus.CorpusGen
import graft.extract.{Extract, PatternScorer, Scorer}
import graft.model.Page
import graft.store.SnapshotTable

/** The end-to-end kg-gen job: clean -> chunk -> extract -> aggregate ->
  * cluster -> materialize (SURVEY.md §3.1-§3.3, §7.2 build order step 6).
  *
  * Commit strategy (round-3 rework, driven by measured stage walls): the
  * durable contract is the EXTRACTION snapshot (the expensive stage — at
  * real scale it holds the LLM/scorer outputs that must never be paid
  * twice) plus the FIVE canonical outputs. Everything between is a cheap
  * narrow derivation of the extraction snapshot, and committing it
  * (pages, chunks, mentions, triple_mentions — round 2's 13-barrier
  * chain) doubled the pipeline's write volume while adding pure
  * level-independent wall time: the provenance wave alone was ~27 s of a
  * 39 s local[8] run at 1 M docs. Those commits are now opt-in
  * (`commitProvenance = true`) for audits that want per-chunk lineage
  * tables on disk; resumability is unchanged — a crash after extraction
  * resumes from the extraction snapshot and recomputes only narrow
  * derivations (per-partition lineage and counters live in the snapshot
  * manifests as before).
  *
  * Scale wiring (north-star requirements, live even in local runs):
  *   - explicit `repartitionByRange` on xxhash64(url) after ingest: a
  *     uniform, order-free re-balance so chunk extraction load never
  *     follows crawl locality;
  *   - AQE + skew-join enabled in the session (see [[KgGenJob.session]]);
  *   - the canonical dictionaries inside ClusterGraph are broadcast when
  *     provably small, AQE-decided otherwise (size-gated hint);
  *   - every committed stage anchors downstream lineage at its snapshot,
  *     so a restart resumes from the last commit.
  */
object KgGenJob {

  final case class JobConfig(
      tableRoot: String,
      corpus: CorpusGen.Config = CorpusGen.Config(),
      extract: Extract.Config = Extract.Config(),
      cluster: ClusterConfig = ClusterConfig(),
      parallelism: Int = 32,
      /** Also commit pages/chunks/mentions/triple_mentions/entities/
        * triples as their own snapshots (full per-stage provenance; the
        * round-2 commit chain). Off by default — see object scaladoc.
        */
      commitProvenance: Boolean = false,
      /** Commit node/predicate embedding feature tables off the
        * canonical outputs (S5 — the reference caches embedding
        * matrices on disk: experiments/wikiqa/utils/
        * cluster_and_deduplication.py:61-126).
        */
      commitEmbeddings: Boolean = false,
      /** Dedup ingested pages by canonical url before chunking
        * (freshest crawl wins — [[graft.textprep.UrlCanon.dedupPages]]):
        * the crawl-table hygiene pass a real Common-Crawl ingest runs
        * first. Off by default (the synthetic corpus has unique urls).
        */
      dedupUrls: Boolean = false,
      /** When > 0, the canonical entities/triples/edges snapshots are
        * laid out as hash-bucket directory partitions
        * (`bucket = pmod(xxhash64(key), n)`, Iceberg bucket-transform
        * style) and the output frames carry the `bucket` column — reads
        * filtered on bucket prune to its directories, the layout a
        * 100 TB canonical table needs for key-range access. 0 (default)
        * keeps the flat single-directory layout.
        */
      partitionBuckets: Int = 0
  ) {
    /** Stage fingerprints chain: a stage's identity includes everything
      * upstream that shapes its output.
      */
    def corpusFp: String = corpus.toString
    def chunksFp: String =
      s"$corpusFp|chunk=${extract.chunkSize}|lang=${extract.lang}" +
        (if (dedupUrls) "|urldedup" else "")
    def extractFp: String = s"$chunksFp|scorer=pattern|batch=${extract.scoreBatchSize}"
    def clusterFp: String =
      s"$extractFp|${cluster.toString}" +
        (if (partitionBuckets > 0) s"|buckets=$partitionBuckets" else "")
  }

  final case class Result(
      entities: DataFrame,
      triples: DataFrame,
      edges: DataFrame,
      entityAssignments: DataFrame,
      edgeAssignments: DataFrame
  )

  def session(master: String, appName: String = "graft-kggen"): SparkSession = {
    val s = SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // see Bench.session: keep mid-size reduce sides wider than the
      // 64m default would (one-partition reduce stages serialize)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Run all stages on a generated corpus (bench/test path); each stage
    * resumes from its snapshot when already committed.
    */
  def run(spark: SparkSession, cfg: JobConfig, scorer: Scorer = PatternScorer): Result = {
    import spark.implicits._
    val table = new SnapshotTable(spark, cfg.tableRoot)
    val verbose = sys.env.contains("SPARK_GRAFT_STAGE_TIMING")
    def timed[T](stage: String)(body: => T): T =
      if (!verbose) body
      else {
        val t0 = System.nanoTime()
        val r = body
        System.err.println(f"[stage] $stage%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        r
      }

    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration

    // stage 1: ingest -> clean -> chunk -> score. Lean default: ONE fused
    // narrow dataflow committed once (the scorer snapshot); opt-in
    // provenance mode commits each step separately.
    val extracted: DataFrame =
      if (cfg.commitProvenance) {
        val pages = timed("pages") { table.resumeOrCompute("pages", cfg.corpusFp) {
          CorpusGen.pagesPartitioned(spark, cfg.corpus, cfg.parallelism).toDF()
        } }
        val ingested =
          if (cfg.dedupUrls) graft.textprep.UrlCanon.dedupPages(pages.as[Page]).toDF()
          else pages
        val chunks = timed("chunks") { table.resumeOrCompute("chunks", cfg.chunksFp) {
          Extract.chunks(ingested.as[Page], cfg.extract).toDF()
        } }
        timed("extracted") { table.resumeOrCompute("extracted", cfg.extractFp) {
          Extract.extractions(chunks.as[graft.model.Chunk], scorer, cfg.extract).toDF()
        } }
      } else {
        timed("extracted") { table.resumeOrCompute("extracted", cfg.extractFp) {
          val pages0 = CorpusGen.pagesPartitioned(spark, cfg.corpus, cfg.parallelism)
          val pages =
            if (cfg.dedupUrls) graft.textprep.UrlCanon.dedupPages(pages0)
            else pages0
          Extract.extractions(Extract.chunks(pages, cfg.extract), scorer, cfg.extract).toDF()
        } }
      }
    val ex = extracted.as[graft.extract.ChunkExtraction]

    // stage 2: global entity/triple sets off the committed extraction
    // snapshot. Lean default: narrow explode+distinct derivations, no
    // intermediate snapshots (triples cached in memory for its two
    // downstream uses). Provenance mode: the round-2 commit chains, two
    // driver threads so the write barriers overlap.
    val (entities: DataFrame, triples: DataFrame, cached: Option[DataFrame]) =
      if (cfg.commitProvenance) {
        val entityChain = Future {
          val mentions = timed("mentions") { table.resumeOrCompute("mentions", cfg.extractFp) {
            Extract.mentions(ex)
          } }
          timed("entities") { table.resumeOrCompute("entities", cfg.extractFp) {
            Extract.entityTable(mentions)
          } }
        }
        val tripleChain = Future {
          val tripleMentions = timed("triple_mentions") { table.resumeOrCompute("triple_mentions", cfg.extractFp) {
            Extract.tripleMentions(ex)
          } }
          timed("triples") { table.resumeOrCompute("triples", cfg.extractFp) {
            Extract.tripleTable(tripleMentions)
          } }
        }
        (Await.result(entityChain, Duration.Inf), Await.result(tripleChain, Duration.Inf), None)
      } else {
        val tri = Extract.tripleTable(Extract.tripleMentions(ex)).persist()
        (Extract.entitySet(ex), tri, Some(tri))
      }

    // stage 3: cluster + rewrite, materialize canonical tables. The five
    // outputs all hang off the cluster assignments, so their commits are
    // independent — one concurrent commit wave instead of five serial
    // barriers.
    val clustered = timed("cluster_plan") { ClusterGraph.clusterGraph(entities, triples, cfg.cluster) }
    // provably-small outputs (driver-clustered LocalRelation lineage)
    // write one file instead of a shuffle-partition fan of near-empty
    // files — fewer task launches, footer opens and commit renames, all
    // of which are level-independent wall time
    def shrink(df: DataFrame): DataFrame =
      if (graft.util.PlanHints.isDriverLocal(df)) df.coalesce(1) else df
    def commitF(stage: String, df: => DataFrame, partitionBy: Seq[String] = Nil): Future[DataFrame] =
      Future(timed(stage) { table.resumeOrCompute(stage, cfg.clusterFp, partitionBy)(shrink(df)) })
    // opt-in bucketed layout for the canonical tables: hash-bucket the
    // natural key into directory partitions (Iceberg bucket transform)
    def bucketed(df: DataFrame, key: String): (DataFrame, Seq[String]) =
      if (cfg.partitionBuckets <= 0) (df, Nil)
      else (df.withColumn("bucket", pmod(xxhash64(col(key)), lit(cfg.partitionBuckets))), Seq("bucket"))
    def commitBucketed(stage: String, df: DataFrame, key: String): Future[DataFrame] = {
      val (b, p) = bucketed(df, key)
      commitF(stage, b, p)
    }
    val fEntAssign = commitF("entity_clusters", clustered.entityAssignments)
    val fEdgeAssign = commitF("edge_clusters", clustered.edgeAssignments)
    val fCanonTriples = commitBucketed("canonical_triples", clustered.triples, "subject")
    val fCanonEntities = commitBucketed("canonical_entities", clustered.entities, "entity")
    val fCanonEdges = commitBucketed("canonical_edges", clustered.edges, "predicate")

    val result = Result(
      Await.result(fCanonEntities, Duration.Inf),
      Await.result(fCanonTriples, Duration.Inf),
      Await.result(fCanonEdges, Duration.Inf),
      Await.result(fEntAssign, Duration.Inf),
      Await.result(fEdgeAssign, Duration.Inf)
    )
    cached.foreach(_.unpersist(false))

    // stage 4 (opt-in): embedding feature tables off the canonical graph
    // — committed + resumable like any stage (S5)
    if (cfg.commitEmbeddings) {
      val fNodeEmb = commitF("node_embeddings", Analytics.nodeEmbeddings(result.entities))
      val fPredEmb = commitF("predicate_embeddings", Analytics.relationEmbeddings(result.triples))
      Await.result(fNodeEmb, Duration.Inf)
      Await.result(fPredEmb, Duration.Inf)
    }
    result
  }

  /** Committed embedding feature tables (node, predicate) for a job that
    * ran with `commitEmbeddings = true` — the S5 read surface.
    */
  def embeddingTables(spark: SparkSession, cfg: JobConfig): (DataFrame, DataFrame) = {
    val table = new SnapshotTable(spark, cfg.tableRoot)
    (table.read("node_embeddings", cfg.clusterFp), table.read("predicate_embeddings", cfg.clusterFp))
  }

  /** spark-submit entry: KgGenJob <tableRoot> [nDocs] [master]. */
  def main(args: Array[String]): Unit = {
    val tableRoot = if (args.length > 0) args(0) else "/tmp/graft-kggen"
    val nDocs = if (args.length > 1) args(1).toLong else 1000L
    val master = if (args.length > 2) args(2) else s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]"
    val spark = session(master)
    val cfg = JobConfig(tableRoot = tableRoot, corpus = CorpusGen.Config(nDocs = nDocs))
    val t0 = System.nanoTime()
    val res = run(spark, cfg)
    val nTriples = res.triples.count()
    val nEntities = res.entities.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(
      f"""{"job":"kggen","docs":$nDocs,"entities":$nEntities,"canonical_triples":$nTriples,"seconds":$secs%.3f,"triples_per_sec":${nTriples / secs}%.1f}"""
    )
    spark.stop()
  }
}
