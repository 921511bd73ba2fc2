package graft.store

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Iceberg-style snapshot table layer — partitioned parquet data files
  * plus JSON snapshot manifests and an atomically-swapped version hint.
  *
  * No Iceberg/Delta runtime jar exists in this offline environment
  * (SURVEY.md §7.1), so this thin layer supplies the properties the
  * north rule actually requires — committed snapshots, per-partition
  * (per-file) row-count lineage, counter metrics, and resumability —
  * behind an interface deliberately swappable for real Iceberg. It is
  * the Spark-scale analogue of the reference's incremental checkpoint
  * sink (`dedup_progress.json` save/resume —
  * experiments/wikiqa/utils/cluster_and_deduplication.py:303-331,444-464)
  * and its skip-if-exists memoization
  * (experiments/wikiqa/_2_generate_kgs.py:127-129).
  *
  * Layout under `root/`:
  * {{{
  *   data/<snapshotId>/part-*.parquet
  *   meta/<snapshotId>.json       // stage, fingerprint, parent, counters,
  *                                // per-file row counts
  *   version-hint.txt             // current snapshot id (atomic rename)
  * }}}
  *
  * A snapshot id is `<stage>-<hash(fingerprint)>`: deterministic in the
  * stage inputs, so "has this exact computation already committed?" is a
  * metadata lookup — the resume path never re-runs committed stages.
  */
final class SnapshotTable(spark: SparkSession, root: String) {

  private val mapper = new ObjectMapper()
  private def dataDir(id: String): Path = Paths.get(root, "data", id)
  private def metaPath(id: String): Path = Paths.get(root, "meta", id + ".json")
  private def hintPath: Path = Paths.get(root, "version-hint.txt")

  /** Per-column zone map of one data file: primitive type plus min/max
    * rendered as strings (longs decimal, strings UTF-8). Only INT64 and
    * BINARY columns carry stats — enough for every key column here.
    */
  private[store] final case class ColStat(tpe: String, min: String, max: String)

  /** (file, rows, zone maps) per data file, from parquet footers
    * (driver-side metadata read — O(files), not O(rows)). The zone maps
    * are the Iceberg-manifest file-skipping statistics: at 100 TB,
    * reading the manifest instead of the footers of ten thousand files
    * is what makes a point lookup on a committed table a metadata
    * operation.
    */
  private def footerRowCounts(dir: Path): Array[(String, Long, Map[String, ColStat])] = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    val conf = spark.sparkContext.hadoopConfiguration
    val hdir = new HPath(dir.toString)
    val fs = FileSystem.get(hdir.toUri, conf)
    // footer opens run concurrently: a commit wave touches dozens of
    // files per stage and these driver-side opens were a measurable
    // serial tax on the pipeline's scaling efficiency
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    // recursive: partitioned layouts nest data files under
    // <partitionCol>=<value>/ directories
    val it = fs.listFiles(hdir, true)
    val files = Iterator
      .continually(if (it.hasNext) Some(it.next()) else None)
      .takeWhile(_.isDefined)
      .flatten
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .toSeq
    val reads = files.map { s =>
      Future {
        val reader = ParquetFileReader.open(HadoopInputFile.fromStatus(s, conf))
        try {
          val footer = reader.getFooter
          val rows = footer.getBlocks.asScala.map(_.getRowCount).sum
          // fold per-block column-chunk statistics into one per-file
          // zone map; any chunk without usable stats poisons its column
          // (a partial bound is not a bound)
          val longs = scala.collection.mutable.Map.empty[String, (Long, Long)]
          val bins = scala.collection.mutable.Map
            .empty[String, (org.apache.parquet.io.api.Binary, org.apache.parquet.io.api.Binary)]
          val poisoned = scala.collection.mutable.Set.empty[String]
          footer.getBlocks.asScala.flatMap(_.getColumns.asScala).foreach { c =>
            val name = c.getPath.toDotString
            val st = c.getStatistics
            val ok = st != null && !st.isEmpty && st.hasNonNullValue
            c.getPrimitiveType.getPrimitiveTypeName match {
              case PrimitiveTypeName.INT64 if ok =>
                val mn = st.genericGetMin.asInstanceOf[java.lang.Long].longValue()
                val mx = st.genericGetMax.asInstanceOf[java.lang.Long].longValue()
                val cur = longs.getOrElse(name, (Long.MaxValue, Long.MinValue))
                longs(name) = (math.min(cur._1, mn), math.max(cur._2, mx))
              case PrimitiveTypeName.BINARY if ok =>
                val mn = st.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary]
                val mx = st.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary]
                bins.get(name) match {
                  case None => bins(name) = (mn, mx)
                  case Some((a, b)) =>
                    bins(name) = (
                      if (mn.compareTo(a) < 0) mn else a,
                      if (mx.compareTo(b) > 0) mx else b
                    )
                }
              case PrimitiveTypeName.INT64 | PrimitiveTypeName.BINARY =>
                poisoned += name
              case _ => () // other types carry no zone map here
            }
          }
          val stats =
            (longs.view.filterKeys(!poisoned(_)).map { case (k, (mn, mx)) =>
              k -> ColStat("long", mn.toString, mx.toString)
            } ++ bins.view.filterKeys(!poisoned(_)).map { case (k, (mn, mx)) =>
              k -> ColStat("string", mn.toStringUsingUTF8, mx.toStringUsingUTF8)
            }).toMap
          (s.getPath.toString, rows, stats)
        } finally reader.close()
      }
    }
    Await.result(Future.sequence(reads), Duration.Inf).toArray.sortBy(_._1)
  }

  def snapshotId(stage: String, fingerprint: String): String = {
    val h = java.security.MessageDigest
      .getInstance("MD5")
      .digest(fingerprint.getBytes(StandardCharsets.UTF_8))
      .take(8)
      .map(b => f"$b%02x")
      .mkString
    s"$stage-$h"
  }

  def exists(stage: String, fingerprint: String): Boolean = {
    val m = metaPath(snapshotId(stage, fingerprint))
    Files.exists(m) && {
      val node = mapper.readTree(Files.readAllBytes(m))
      node.get("committed").asBoolean(false)
    }
  }

  def read(stage: String, fingerprint: String): DataFrame =
    spark.read.parquet(dataDir(snapshotId(stage, fingerprint)).toString)

  /** Write `df` as a committed snapshot; returns the re-read DataFrame
    * (reading back the committed files keeps downstream lineage anchored
    * at the snapshot, not at the upstream computation).
    *
    * `partitionBy` lays the snapshot out as directory partitions of the
    * named columns (Iceberg-style identity/bucket partitioning: project
    * the bucket column first — e.g. `pmod(xxhash64(subject), n)` — then
    * name it here). Reads filtered on a partition column prune to its
    * directories (PartitionFilters in the scan), which is what makes a
    * 100 TB canonical table queryable by key range without a full scan.
    */
  def commit(
      df: DataFrame,
      stage: String,
      fingerprint: String,
      partitionBy: Seq[String] = Nil
  ): DataFrame = {
    val id = snapshotId(stage, fingerprint)
    val dir = dataDir(id)
    val verbose = sys.env.contains("SPARK_GRAFT_COMMIT_TIMING")
    def sub[T](step: String)(body: => T): T =
      if (!verbose) body
      else {
        val t0 = System.nanoTime()
        val r = body
        System.err.println(f"[commit] $stage%-18s $step%-8s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
        r
      }
    sub("write") {
      val w = df.write.mode("overwrite")
      (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(dir.toString)
    }

    // per-file lineage from parquet FOOTER metadata — no data re-read, no
    // executor job (the same metadata-only manifest strategy Iceberg
    // uses). The read-back reuses the known schema: no inference pass.
    // Partitioned layouts re-discover partition columns from the
    // directory names, then restore the original column order.
    val back = sub("readback") {
      if (partitionBy.isEmpty) spark.read.schema(df.schema).parquet(dir.toString)
      else spark.read.parquet(dir.toString).select(df.schema.fieldNames.map(col): _*)
    }
    val perFile = sub("footers") { footerRowCounts(dir) }
    val totalRows = perFile.map(_._2).sum

    // commits may run concurrently from several driver threads (KgGenJob
    // submits independent chains in parallel): serialize the metadata +
    // version-hint section so parent pointers and the hint swap stay
    // consistent (the data write above is per-snapshot-directory and
    // needs no lock)
    this.synchronized { commitMeta(id, stage, fingerprint, perFile, totalRows) }
    back
  }

  private def commitMeta(
      id: String,
      stage: String,
      fingerprint: String,
      perFile: Array[(String, Long, Map[String, ColStat])],
      totalRows: Long
  ): Unit = {
    val meta: ObjectNode = mapper.createObjectNode()
    meta.put("snapshotId", id)
    meta.put("stage", stage)
    meta.put("fingerprint", fingerprint)
    meta.put("parent", currentSnapshot.orNull)
    meta.put("committed", true)
    meta.put("rowCount", totalRows)
    meta.put("fileCount", perFile.length)
    meta.put("committedAtMs", System.currentTimeMillis())
    val files = mapper.createArrayNode()
    perFile.foreach { case (f, n, stats) =>
      val fn = mapper.createObjectNode()
      fn.put("file", f.replaceFirst("^file:", ""))
      fn.put("rows", n)
      if (stats.nonEmpty) {
        val sn = mapper.createObjectNode()
        stats.toSeq.sortBy(_._1).foreach { case (colName, cs) =>
          val cn = mapper.createObjectNode()
          cn.put("type", cs.tpe)
          cn.put("min", cs.min)
          cn.put("max", cs.max)
          sn.set[ObjectNode](colName, cn)
        }
        fn.set[ObjectNode]("stats", sn)
      }
      files.add(fn)
    }
    meta.set[ObjectNode]("files", files)

    Files.createDirectories(metaPath(id).getParent)
    Files.write(metaPath(id), mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(meta))

    // atomic version-hint swap (commit point)
    val tmp = Paths.get(root, s".version-hint.$id.tmp")
    Files.createDirectories(tmp.getParent)
    Files.write(tmp, id.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, hintPath, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** The resumable-stage primitive: reuse the committed snapshot if this
    * exact (stage, fingerprint) already exists, else compute + commit.
    */
  def resumeOrCompute(stage: String, fingerprint: String, partitionBy: Seq[String] = Nil)(
      compute: => DataFrame
  ): DataFrame =
    if (exists(stage, fingerprint)) read(stage, fingerprint)
    else commit(compute, stage, fingerprint, partitionBy)

  def currentSnapshot: Option[String] =
    if (Files.exists(hintPath))
      Some(new String(Files.readAllBytes(hintPath), StandardCharsets.UTF_8).trim)
    else None

  def manifest(id: String): Option[Map[String, Any]] = {
    val m = metaPath(id)
    if (!Files.exists(m)) None
    else {
      val node = mapper.readTree(Files.readAllBytes(m))
      Some(
        node.properties().asScala.map(e => e.getKey -> (e.getValue: Any)).toMap
      )
    }
  }

  def rowCount(stage: String, fingerprint: String): Option[Long] = {
    val m = metaPath(snapshotId(stage, fingerprint))
    if (!Files.exists(m)) None
    else Some(mapper.readTree(Files.readAllBytes(m)).get("rowCount").asLong())
  }

  /** Per-partition lineage of a committed snapshot as a DataFrame:
    * one row per data file with its exact row count (the counter metrics
    * the manifest recorded at commit), plus the snapshot identity — the
    * queryable form of the north rule's "per-partition lineage + counter
    * metrics" (what `DESCRIBE ... FILES` is to Iceberg).
    */
  def lineage(stage: String, fingerprint: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val id = snapshotId(stage, fingerprint)
    val node = mapper.readTree(Files.readAllBytes(metaPath(id)))
    val rows = node.get("files").elements().asScala.toSeq.map { f =>
      (id, stage, f.get("file").asText(), f.get("rows").asLong())
    }
    import spark.implicits._
    rows.toDF("snapshot_id", "stage", "file", "rows")
  }

  /** Manifest zone-map file skipping (the Iceberg data-skipping read
    * path): return the snapshot restricted to data files whose
    * per-column [min, max] from the commit-time manifest can contain
    * `value` — a pure METADATA decision, no footer opens, no scan of
    * skipped files. On a 100 TB canonical table laid out by key
    * (repartitionByRange / bucketed commit), a point or range probe
    * touches a handful of files instead of all of them. Files without
    * stats for the column are kept (a missing bound prunes nothing);
    * the result is always row-identical to
    * `read(...).where(col(column) === value)` pre-filtered at file
    * granularity — callers still apply their own predicate.
    *
    * `value`: Long/Int for INT64 columns, String for BINARY columns.
    * String bounds compare in unsigned-byte (UTF-8) order — the order
    * parquet statistics are written in (a JVM String compare would
    * disagree beyond ASCII).
    */
  def prunedRead(stage: String, fingerprint: String, column: String, value: Any): DataFrame = {
    val id = snapshotId(stage, fingerprint)
    val full = read(stage, fingerprint)
    def unsignedLeq(a: String, b: String): Boolean = {
      val x = a.getBytes(StandardCharsets.UTF_8)
      val y = b.getBytes(StandardCharsets.UTF_8)
      java.util.Arrays.compareUnsigned(x, y) <= 0
    }
    val node = mapper.readTree(Files.readAllBytes(metaPath(id)))
    val files = node.get("files").elements().asScala.toSeq
    // partition columns live in directory names, never in footer stats:
    // their zone map IS the `column=value` path segment
    def partitionDirValue(path: String): Option[String] = {
      val marker = s"/$column="
      val i = path.lastIndexOf(marker)
      if (i < 0) None
      else {
        val s0 = i + marker.length
        val e = path.indexOf('/', s0)
        if (e < 0) None else Some(path.substring(s0, e))
      }
    }
    def keep(f: com.fasterxml.jackson.databind.JsonNode): Boolean = {
      val cs = Option(f.get("stats")).flatMap(s => Option(s.get(column)))
      cs match {
        case None =>
          partitionDirValue(f.get("file").asText) match {
            case Some(dv) if !dv.contains("%") =>
              // equality-prune on the identity partition value; an
              // escaped dir value ('%xx') is never guessed at — keep
              value match {
                case l: Long   => scala.util.Try(dv.toLong == l).getOrElse(true)
                case i2: Int   => scala.util.Try(dv.toLong == i2.toLong).getOrElse(true)
                case s2: String => dv == s2
                case _          => true
              }
            case _ => true
          }
        case Some(c) =>
          val t = c.get("type").asText
          val mn = c.get("min").asText
          val mx = c.get("max").asText
          (t, value) match {
            case ("long", l: Long) => mn.toLong <= l && l <= mx.toLong
            case ("long", i: Int)  => mn.toLong <= i && i <= mx.toLong
            case ("string", s: String) => unsignedLeq(mn, s) && unsignedLeq(s, mx)
            case _ => true // type mismatch: never prune on a guess
          }
      }
    }
    val kept = files.filter(keep).map(_.get("file").asText)
    if (kept.isEmpty) full.where(lit(false))
    else
      // basePath keeps directory-partition columns in the leaf-file
      // read: without it a partitioned snapshot's partition column
      // would come back all-NULL, breaking the row-identical contract
      spark.read
        .option("basePath", dataDir(id).toUri.toString)
        .schema(full.schema)
        .parquet(kept: _*)
  }

  /** The snapshot chain from the current version hint back to the first
    * commit (newest first) — each element a (snapshotId, stage,
    * rowCount). Walks manifest parent pointers.
    */
  def history: Seq[(String, String, Long)] = {
    @annotation.tailrec
    def walk(id: Option[String], acc: List[(String, String, Long)]): List[(String, String, Long)] =
      id match {
        case Some(s) if Files.exists(metaPath(s)) =>
          val n = mapper.readTree(Files.readAllBytes(metaPath(s)))
          val parent = Option(n.get("parent")).filterNot(_.isNull).map(_.asText())
          walk(parent, (s, n.get("stage").asText(), n.get("rowCount").asLong()) :: acc)
        case _ => acc
      }
    walk(currentSnapshot, Nil).reverse
  }
}
