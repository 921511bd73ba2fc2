package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.cluster.CandidatePairs.ClusterConfig
import graft.cluster.ClusterGraph
import graft.corpus.CorpusGen
import graft.extract.{Extract, PatternScorer, Scorer}
import graft.model.Page
import graft.store.SnapshotTable

/** The end-to-end kg-gen job: clean -> chunk -> extract -> aggregate ->
  * cluster -> materialize, every stage committed as a resumable snapshot
  * (SURVEY.md §3.1-§3.3, §7.2 build order step 6).
  *
  * Scale wiring (north-star requirements, live even in local runs):
  *   - explicit `repartitionByRange` on xxhash64(url) after ingest: a
  *     uniform, order-free re-balance so chunk extraction load never
  *     follows crawl locality;
  *   - AQE + skew-join enabled in the session (see [[KgGenJob.session]]);
  *   - the canonical dictionaries inside ClusterGraph are broadcast;
  *   - every stage anchors downstream lineage at its committed snapshot,
  *     so a restart resumes from the last commit (per-partition lineage
  *     and counters live in the snapshot manifests).
  */
object KgGenJob {

  final case class JobConfig(
      tableRoot: String,
      corpus: CorpusGen.Config = CorpusGen.Config(),
      extract: Extract.Config = Extract.Config(),
      cluster: ClusterConfig = ClusterConfig(),
      parallelism: Int = 32
  ) {
    /** Stage fingerprints chain: a stage's identity includes everything
      * upstream that shapes its output.
      */
    def corpusFp: String = corpus.toString
    def chunksFp: String = s"$corpusFp|chunk=${extract.chunkSize}|lang=${extract.lang}"
    def extractFp: String = s"$chunksFp|scorer=pattern|batch=${extract.scoreBatchSize}"
    def clusterFp: String = s"$extractFp|${cluster.toString}"
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

    // stage 1: ingest — corpus as the pages table, rebalanced by url hash
    val pages = timed("pages") { table.resumeOrCompute("pages", cfg.corpusFp) {
      CorpusGen.pagesPartitioned(spark, cfg.corpus, cfg.parallelism).toDF()
    } }

    // stage 2: clean + chunk
    val chunks = timed("chunks") { table.resumeOrCompute("chunks", cfg.chunksFp) {
      Extract.chunks(pages.as[Page], cfg.extract).toDF()
    } }

    // stage 3: extraction — committed ONCE as its own snapshot (the
    // scorer is the expensive stage; deriving mentions and triple
    // mentions from the committed snapshot evaluates it exactly once)
    val extracted = timed("extracted") { table.resumeOrCompute("extracted", cfg.extractFp) {
      Extract.extractions(chunks.as[graft.model.Chunk], scorer, cfg.extract).toDF()
    } }
    val ex = extracted.as[graft.extract.ChunkExtraction]

    // stages 3b/4: the mentions->entities and triple_mentions->triples
    // commit chains are independent dataflows off the same committed
    // extraction snapshot — submit them from two driver threads so their
    // write+read-back barriers overlap (concurrent jobs interleave in the
    // scheduler; each commit barrier stops one chain, not the pipeline).
    // Commit count is unchanged — only the serialization between commits
    // goes away (it was a large share of the level-independent wall time
    // that capped N->4N scaling efficiency in round 1).
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    // two independent chains off the committed extraction snapshot, run
    // concurrently: each chain commits its heavy provenance table once
    // (one scan+explode of the nested extraction columns) and derives
    // the cheap global set from THAT committed (already-deduplicated)
    // output — never a second scan of the extraction snapshot. Four
    // serial barriers become two concurrent waves; total work unchanged.
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
    val entities = Await.result(entityChain, Duration.Inf)
    val triples = Await.result(tripleChain, Duration.Inf)

    // stage 5: cluster + rewrite, materialize canonical tables. The five
    // outputs all hang off the checkpoint-materialized cluster
    // assignments, so their commits are independent — one concurrent
    // commit wave instead of five serial barriers.
    val clustered = timed("cluster_plan") { ClusterGraph.clusterGraph(entities, triples, cfg.cluster) }
    def commitF(stage: String, df: => DataFrame): Future[DataFrame] =
      Future(timed(stage) { table.resumeOrCompute(stage, cfg.clusterFp)(df) })
    val fEntAssign = commitF("entity_clusters", clustered.entityAssignments)
    val fEdgeAssign = commitF("edge_clusters", clustered.edgeAssignments)
    val fCanonTriples = commitF("canonical_triples", clustered.triples)
    val fCanonEntities = commitF("canonical_entities", clustered.entities)
    val fCanonEdges = commitF("canonical_edges", clustered.edges)

    Result(
      Await.result(fCanonEntities, Duration.Inf),
      Await.result(fCanonTriples, Duration.Inf),
      Await.result(fCanonEdges, Duration.Inf),
      Await.result(fEntAssign, Duration.Inf),
      Await.result(fEdgeAssign, Duration.Inf)
    )
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
