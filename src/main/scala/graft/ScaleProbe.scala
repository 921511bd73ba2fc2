package graft

import java.nio.file.Files
import java.util.concurrent.atomic.LongAdder
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import graft.corpus.CorpusGen
import graft.pipeline.KgGenJob

/** Scratch experiment tool: pipeline wall time at cores/partitions combos,
  * plus executor CPU-vs-wall accounting per run (SparkListener) — the
  * difference is scheduler delay + GC + shuffle/IO stall, i.e. the
  * non-scaling component that caps N->4N efficiency.
  */
object ScaleProbe {

  private final class CpuListener extends SparkListener {
    val cpuNs = new LongAdder
    val runMs = new LongAdder
    val gcMs = new LongAdder
    val tasks = new LongAdder
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        cpuNs.add(m.executorCpuTime)
        runMs.add(m.executorRunTime)
        gcMs.add(m.jvmGCTime)
        tasks.add(1)
      }
    }
  }

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
    val root = Files
      .createTempDirectory(java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_TMP", "/tmp")), "probe")
      .toString
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
    // partition count is level-independent (Bench methodology): a fixed
    // input's partitioning is a property of the data, not the cluster
    val combos = Seq((8, 32), (2, 32), (8, 32), (2, 32))
    // full-scale warmup pays the one-time at-scale JIT tax
    val w = session(32, 64)
    run(w, nDocs, 64)
    w.stop()
    combos.foreach { case (cores, parts) =>
      val s = session(cores, parts)
      val listener = new CpuListener
      s.sparkContext.addSparkListener(listener)
      val t = run(s, nDocs, parts)
      s.sparkContext.removeSparkListener(listener)
      s.stop()
      val cpuS = listener.cpuNs.sum() / 1e9
      val runS = listener.runMs.sum() / 1e3
      val gcS = listener.gcMs.sum() / 1e3
      val wallCoreS = t * cores
      println(
        f"PROBE cores=$cores parts=$parts: wall $t%.2f s | task-run $runS%.1f s | " +
          f"task-cpu $cpuS%.1f s | task-gc $gcS%.1f s | " +
          f"stall(run-cpu) ${runS - cpuS}%.1f s | idle(wall*cores-run) ${wallCoreS - runS}%.1f core-s | " +
          f"tasks ${listener.tasks.sum()}"
      )
    }
  }
}
