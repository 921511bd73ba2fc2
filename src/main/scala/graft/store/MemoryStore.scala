package graft.store

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental memory merge — the table-scale re-expression of the
  * reference's MCP `add_memories` loop (reference: mcp/server.py:131-166:
  * generate a graph from new text, aggregate it into the persistent
  * store's graph, save). Each merge commits a NEW versioned snapshot of
  * the three graph tables (entities, triples, edges) into a
  * [[SnapshotTable]]; versions are linked by snapshot parents, so the
  * store keeps the same resumability/lineage guarantees as the pipeline
  * stages.
  *
  * Merge = set union, exactly the reference's `aggregate` semantics
  * (src/kg_gen/kg_gen.py:291-304), implemented as APPEND + anti-join
  * dedup rather than union+distinct: the committed state is already
  * distinct, so only the (small) incoming delta is deduplicated against
  * it — one left-anti join per table, broadcastable when the delta is
  * small, never a re-shuffle of the accumulated store. (Under a real
  * Iceberg catalog this is MERGE INTO WHEN NOT MATCHED THEN INSERT; the
  * snapshot layer rewrites data files copy-on-write, which is what
  * Iceberg's COW mode does too.)
  *
  * Associativity (tested): merging graphs g1 then g2 yields byte-identical
  * tables to merging aggregate(g1, g2) once — set union is associative
  * and every commit re-sorts nothing (row order inside files is
  * irrelevant; comparisons sort).
  */
final class MemoryStore(spark: SparkSession, root: String) {

  private val table = new SnapshotTable(spark, root)
  private def versionPath = Paths.get(root, "memory-version.txt")

  def version: Int =
    if (Files.exists(versionPath))
      new String(Files.readAllBytes(versionPath), StandardCharsets.UTF_8).trim.toInt
    else 0

  private def fp(v: Int): String = s"memory-v$v"

  private def emptyDf(cols: String*): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(cols.map(c => StructField(c, StringType)))
    )
  }

  def entities: DataFrame =
    if (version == 0) emptyDf("entity") else table.read("memory_entities", fp(version))
  def triples: DataFrame =
    if (version == 0) emptyDf("subject", "predicate", "obj")
    else table.read("memory_triples", fp(version))
  def edges: DataFrame =
    if (version == 0) emptyDf("predicate") else table.read("memory_edges", fp(version))

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

    def mergeInto(stage: String, committed: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame = {
      val delta = incoming.select(keys.map(col): _*).distinct()
      val appended =
        if (v == 0) delta
        else committed.unionByName(delta.join(committed, keys, "left_anti"))
      table.resumeOrCompute(stage, fp(nextV))(appended)
    }

    val edgeDelta = newEdges.getOrElse(newTriples.select(col("predicate")))
    mergeInto("memory_entities", entities, newEntities, Seq("entity"))
    mergeInto("memory_triples", triples, newTriples, Seq("subject", "predicate", "obj"))
    mergeInto("memory_edges", edges, edgeDelta, Seq("predicate"))

    // commit point: the version counter flips only after all three
    // tables committed — a crash mid-merge resumes idempotently (the
    // per-stage fingerprints make re-running the same merge a no-op)
    val tmp = Paths.get(root, s".memory-version.$nextV.tmp")
    Files.createDirectories(tmp.getParent)
    Files.write(tmp, nextV.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, versionPath, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    nextV
  }
}
