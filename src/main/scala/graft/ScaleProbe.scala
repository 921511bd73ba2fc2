package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.corpus.CorpusGen
import graft.pipeline.KgGenJob

/** Scratch experiment: isolate cores vs partition-count overhead. */
object ScaleProbe {
  private def session(cores: Int, parts: Int): SparkSession = {
    val s = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(s"probe-$cores-$parts")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_GRAFT_TMP", "/tmp"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def run(spark: SparkSession, nDocs: Long, parts: Int): Double = {
    val root = Files.createTempDirectory(java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_TMP", "/tmp")), "probe").toString
    val cfg = KgGenJob.JobConfig(
      tableRoot = root,
      corpus = CorpusGen.Config(nDocs = nDocs),
      parallelism = parts
    )
    val t0 = System.nanoTime()
    val res = KgGenJob.run(spark, cfg)
    res.triples.count()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 200000L
    val combos = Seq((4, 8), (1, 2))
    // warmup
    val w = session(32, 32)
    run(w, nDocs, 32)
    w.stop()
    combos.foreach { case (cores, parts) =>
      val s = session(cores, parts)
      val t = run(s, nDocs, parts)
      s.stop()
      println(f"PROBE cores=$cores parts=$parts: $t%.2f s")
    }
  }
}
