package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.corpus.CorpusGen
import graft.pipeline.KgGenJob

/** Per-round benchmark main (driver contract + BASELINE.json north_rule).
  *
  * Emits ONE JSON line:
  *   - `queries`: per-query wall seconds for every SparkEntry query over
  *     SPARK_GRAFT_SF_DIR at local[32];
  *   - `kggen`: end-to-end clean→chunk→extract→cluster→materialize
  *     throughput (triples/sec) for the same synthetic corpus at two
  *     parallelism levels — local[8] (N) and local[32] (4N) — plus the
  *     scaling efficiency `(tp32/tp8)/4` (the sandbox stand-in for the
  *     north rule's N-vs-4N-executor criterion; see BASELINE.md).
  *
  * Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  * SPARK_GRAFT_BENCH_DOCS (corpus size for the scaling runs),
  * SPARK_GRAFT_SKIP_SCALING=1 (queries only, for quick iteration).
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One full pipeline run on a fresh snapshot root (no resume reuse);
    * returns (seconds, canonicalTriples).
    */
  private def pipelineRun(spark: SparkSession, nDocs: Long): (Double, Long) = {
    val root = Files.createTempDirectory("graft-bench").toString
    val cfg = KgGenJob.JobConfig(
      tableRoot = root,
      corpus = CorpusGen.Config(nDocs = nDocs),
      parallelism = spark.sparkContext.defaultParallelism
    )
    val t0 = System.nanoTime()
    val res = KgGenJob.run(spark, cfg)
    val n = res.triples.count()
    ((System.nanoTime() - t0) / 1e9, n)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "40000").toLong
    val skipScaling = sys.env.get("SPARK_GRAFT_SKIP_SCALING").contains("1")

    // --- phase 1: registry queries at local[32] ---
    val spark32 = session(32)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark32, sfDir).count()
      catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val total = results.map(_._2).sum

    // --- phase 2: kg-gen pipeline throughput at 4N (=32) then N (=8) ---
    var kggenJson = "null"
    if (!skipScaling) {
      val (warmS, _) = pipelineRun(spark32, benchDocs / 10) // JIT/codegen warmup
      val (s32, n32) = pipelineRun(spark32, benchDocs)
      spark32.stop()
      val spark8 = session(8)
      val (s8, n8) = pipelineRun(spark8, benchDocs)
      spark8.stop()
      val tp32 = n32 / s32
      val tp8 = n8 / s8
      val eff = (tp32 / tp8) / 4.0
      kggenJson =
        f"""{"docs":$benchDocs,"triples":$n32,"warmup_sec":$warmS%.2f,""" +
          f""""sec_local8":$s8%.2f,"sec_local32":$s32%.2f,""" +
          f""""triples_per_sec_local8":$tp8%.1f,"triples_per_sec_local32":$tp32%.1f,""" +
          f""""scaling_efficiency":$eff%.3f}"""
    } else spark32.stop()

    val qs = results
      .map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    println(
      f"""{"metric":"total_query_sec","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","kggen":$kggenJson}"""
    )
  }
}
