package graft.store

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import scala.jdk.CollectionConverters._
import graft.analytics.Analytics

/** Incremental memory merge — the table-scale re-expression of the
  * reference's MCP `add_memories` loop (reference: mcp/server.py:131-166:
  * generate a graph from new text, aggregate it into the persistent
  * store's graph, save). Merge = set union, exactly the reference's
  * `aggregate` semantics (src/kg_gen/kg_gen.py:291-304).
  *
  * Storage is O(delta) per merge, the way Iceberg's
  * MERGE INTO ... WHEN NOT MATCHED THEN INSERT actually lands: each
  * version commits ONLY the new rows (incoming anti-join committed) as
  * fresh data files, and a per-version manifest lists the version's file
  * set as `parent dirs + this delta dir`. `read` unions the manifest's
  * dir list — the accumulated store is never rewritten, so a 100 TB
  * memory store pays per-merge cost proportional to the delta (plus one
  * read-side scan for the anti-join dedup, which any exact set-union
  * must pay). `compact()` folds the chain back into single data dirs
  * when the manifest grows long.
  *
  * Delta snapshots are content-addressed: the stage fingerprint folds in
  * an order-insensitive xxhash64 of the delta rows, so a crash mid-merge
  * followed by a retry with a DIFFERENT delta can never silently reuse
  * the stale half-committed snapshot — a different delta hashes to a
  * different snapshot id. Identical retries resume for free.
  *
  * Associativity (tested): merging graphs g1 then g2 yields identical
  * tables to merging aggregate(g1, g2) once — set union is associative
  * and row order inside files is irrelevant (comparisons sort).
  */
final class MemoryStore(spark: SparkSession, root: String) {

  private val table = new SnapshotTable(spark, root)
  private val mapper = new ObjectMapper()
  private def versionPath = Paths.get(root, "memory-version.txt")
  private def manifestPath(v: Int) = Paths.get(root, "memory-meta", s"v$v.json")

  /** (table stage name, key columns). All-string schemas per the
    * reference data model (SURVEY.md §1.1: strings are the only scalar).
    */
  private val tableKeys: Seq[(String, Seq[String])] = Seq(
    "memory_entities" -> Seq("entity"),
    "memory_triples" -> Seq("subject", "predicate", "obj"),
    "memory_edges" -> Seq("predicate")
  )

  def version: Int =
    if (Files.exists(versionPath))
      new String(Files.readAllBytes(versionPath), StandardCharsets.UTF_8).trim.toInt
    else 0

  private def schemaFor(keys: Seq[String]): StructType =
    StructType(keys.map(c => StructField(c, StringType)))

  /** Data dirs composing table `name` at version `v` (manifest lookup). */
  private[store] def dirsFor(v: Int, name: String): Seq[String] = {
    val node = mapper.readTree(Files.readAllBytes(manifestPath(v)))
    node.get("tables").get(name).get("dirs").elements().asScala.map(_.asText()).toSeq
  }

  private def emptyDf(keys: Seq[String]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      schemaFor(keys)
    )

  private def readTable(name: String, keys: Seq[String]): DataFrame = {
    val v = version
    if (v == 0) emptyDf(keys)
    else {
      // empty-delta merges append no dirs, so a table can exist in the
      // manifest with an empty dir list (e.g. v1 committed only triples)
      val ds = dirsFor(v, name)
      if (ds.isEmpty) emptyDf(keys)
      else spark.read.schema(schemaFor(keys)).parquet(ds: _*)
    }
  }

  def entities: DataFrame = readTable("memory_entities", Seq("entity"))
  def triples: DataFrame = readTable("memory_triples", Seq("subject", "predicate", "obj"))
  def edges: DataFrame = readTable("memory_edges", Seq("predicate"))

  /** Order-insensitive content fingerprint of a (distinct-row) DataFrame:
    * xor of per-row xxhash64 over all columns. One small aggregate job.
    */
  private def contentFp(df: DataFrame): String = contentFpAndCount(df)._1

  /** Fingerprint + row count in ONE aggregate job (the count decides
    * whether a delta commits any files at all).
    */
  private def contentFpAndCount(df: DataFrame): (String, Long) = {
    val cols = df.columns.map(col).toSeq
    val r = df.agg(bit_xor(xxhash64(cols: _*)), count(lit(1))).head
    val h = if (r.isNullAt(0)) 0L else r.getLong(0)
    (java.lang.Long.toHexString(h), r.getLong(1))
  }

  /** Merge a new graph into the committed store; returns the new version.
    * Inputs: entities(entity), triples(subject, predicate, obj),
    * edges(predicate) — edges may be omitted (derived from triples).
    */
  def addMemories(
      newEntities: DataFrame,
      newTriples: DataFrame,
      newEdges: Option[DataFrame] = None
  ): Int = {
    val v = version
    val nextV = v + 1

    def commitDelta(name: String, keys: Seq[String], incoming: DataFrame): (Option[String], String) = {
      val parentDirs = if (v == 0) Nil else dirsFor(v, name)
      val projected = incoming.select(keys.map(col): _*).distinct()
      val delta =
        if (parentDirs.isEmpty) projected
        else projected.join(spark.read.schema(schemaFor(keys)).parquet(parentDirs: _*), keys, "left_anti")
      // persist: the anti-join against the accumulated store runs once —
      // the fingerprint action caches the (small) delta, the commit write
      // replays it from cache
      delta.persist()
      try {
        val (hash, n) = contentFpAndCount(delta)
        val fp = s"v$nextV-$hash"
        if (n == 0L) (None, fp) // nothing new: append no data dir, so a
        // steady replay stream can't grow the read-side file list
        else {
          table.resumeOrCompute(name + "_delta", fp)(delta)
          (Some(table.snapshotId(name + "_delta", fp)), fp)
        }
      } finally delta.unpersist()
    }

    val edgeDelta = newEdges.getOrElse(newTriples.select(col("predicate")))
    val committed = Seq(
      ("memory_entities", Seq("entity"), newEntities),
      ("memory_triples", Seq("subject", "predicate", "obj"), newTriples),
      ("memory_edges", Seq("predicate"), edgeDelta)
    ).map { case (name, keys, incoming) =>
      val (snapId, fp) = commitDelta(name, keys, incoming)
      val parentDirs = if (v == 0) Nil else dirsFor(v, name)
      (name, parentDirs ++ snapId.map(id => Paths.get(root, "data", id).toString), fp)
    }

    writeManifest(nextV, committed)
    flipVersion(nextV)
    nextV
  }

  /** Fold the version chain into single data dirs (one per table) as a
    * new version — the occasional maintenance pass that keeps `read`'s
    * file-list (and open cost) bounded as merges accumulate.
    */
  def compact(): Int = {
    val v = version
    if (v == 0) return 0
    val nextV = v + 1
    val committed = tableKeys.map { case (name, keys) =>
      val full = readTable(name, keys)
      full.persist()
      try {
        val fp = s"v$nextV-compact-${contentFp(full)}"
        table.resumeOrCompute(name + "_delta", fp)(full)
        (name, Seq(Paths.get(root, "data", table.snapshotId(name + "_delta", fp)).toString), fp)
      } finally full.unpersist()
    }
    writeManifest(nextV, committed)
    flipVersion(nextV)
    nextV
  }

  private def writeManifest(v: Int, tables: Seq[(String, Seq[String], String)]): Unit = {
    val m: ObjectNode = mapper.createObjectNode()
    m.put("version", v)
    val ts = mapper.createObjectNode()
    tables.foreach { case (name, dirs, fp) =>
      val t = mapper.createObjectNode()
      t.put("fingerprint", fp)
      val arr = mapper.createArrayNode()
      dirs.foreach(arr.add)
      t.set[ObjectNode]("dirs", arr)
      ts.set[ObjectNode](name, t)
    }
    m.set[ObjectNode]("tables", ts)
    val p = manifestPath(v)
    Files.createDirectories(p.getParent)
    val tmp = p.resolveSibling(s".v$v.json.tmp")
    Files.write(tmp, mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(m))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Commit point: the version counter flips only after all three tables
    * and the manifest landed — a crash mid-merge resumes idempotently
    * (identical retries hit the content-addressed snapshots; divergent
    * retries land in fresh snapshot dirs and the stale half-commit is
    * never referenced by any manifest).
    */
  private def flipVersion(v: Int): Unit = {
    val tmp = Paths.get(root, s".memory-version.$v.tmp")
    Files.createDirectories(tmp.getParent)
    Files.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, versionPath, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  // --- store-level retrieval surface (reference: mcp/server.py:169-258:
  // retrieve_relevant_memories / get_memory_stats compose retrieval over
  // the persistent store, not over an in-flight graph) ---

  /** Relevant-memory retrieval over the committed store: trigram-overlap
    * node matches seeded into 2-hop context sentences, joined into one
    * context string (Analytics.retrieve over the store tables).
    */
  def retrieve(query: String, k: Int = 3): DataFrame =
    Analytics.retrieve(entities, triples, query, k)

  /** Substring entity match over the committed store
    * (mcp/server.py memory search's exact-match arm).
    */
  def searchEntities(query: String, k: Int = 10): DataFrame =
    Analytics.substringEntities(entities, query, k)

  /** Store summary stats: entity/triple/edge counts at the current
    * version (mcp/server.py:get_memory_stats).
    */
  def stats: Map[String, Long] = Map(
    "version" -> version.toLong,
    "entities" -> entities.count(),
    "triples" -> triples.count(),
    "edges" -> edges.count()
  )
}
