package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import graft.corpus.CorpusGen
import graft.pipeline.KgGenJob

/** Scratch diagnostic: why does the materialize phase scale worse than
  * extraction? Commits the extraction snapshot once, then re-runs ONLY
  * the cluster+materialize phase (resume path) at two core counts with a
  * per-stage listener printing task counts and walls — the stage whose
  * task count stays below the core count is the scaling leak.
  */
object CanonProbe {

  private final class StageListener extends SparkListener {
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val s = e.stageInfo
      val ms = for {
        a <- s.completionTime; b <- s.submissionTime
      } yield a - b
      val rdds = s.rddInfos.sortBy(_.id).map(r => r.name).distinct.mkString(">")
      System.err.println(
        f"[stageinfo] id=${s.stageId}%4d tasks=${s.numTasks}%4d wall=${ms.getOrElse(0L) / 1e3}%7.2f s  ${s.name.takeWhile(_ != '\n').take(50)} rdds=${rdds.take(160)}"
      )
    }
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 3000000L
    val root = "/dev/shm/graft-canonprobe"
    deleteRecursively(Paths.get(root))
    val cfg = KgGenJob.JobConfig(
      tableRoot = root,
      corpus = CorpusGen.Config(nDocs = nDocs),
      parallelism = Bench.ScalePartitions
    )
    // phase 0: commit extraction once at full width
    val warm = Bench.session(32, Some(Bench.ScalePartitions))
    KgGenJob.run(warm, cfg)
    warm.stop()

    Seq(8, 2, 8, 2).foreach { cores =>
      // drop the cluster-phase snapshots so only stages 2-4 recompute
      val dataDir = Paths.get(root, "data")
      val metaDir = Paths.get(root, "meta")
      for (d <- Seq(dataDir, metaDir) if Files.isDirectory(d)) {
        Files.list(d).forEach { p =>
          if (!p.getFileName.toString.startsWith("extracted")) deleteRecursively(p)
        }
      }
      val s = Bench.session(cores, Some(Bench.ScalePartitions))
      val listener = new StageListener
      s.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      KgGenJob.run(s, cfg)
      System.err.println(f"[canonprobe] cores=$cores resume-run wall ${(System.nanoTime() - t0) / 1e9}%.2f s")
      s.sparkContext.removeSparkListener(listener)
      s.stop()
    }
    deleteRecursively(Paths.get(root))
  }
}
