package graft.pipeline

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.corpus.CorpusGen
import graft.model.Triple

/** End-to-end job: generate -> cluster -> materialize with snapshot
  * resume (SURVEY.md §5 test plan items 3 and 5).
  */
class KgGenJobSpec extends AnyFunSuite with SparkTestBase {

  test("end-to-end job meets the P/R gate and resumes byte-identically") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-job").toString
    val cfg = KgGenJob.JobConfig(
      tableRoot = root,
      corpus = CorpusGen.Config(nDocs = 150L, seed = 11L)
    )
    val res = KgGenJob.run(spark, cfg)
    val got = res.triples.as[Triple].collect().map(t => (t.subject, t.predicate, t.obj)).toSet

    // canonical triples vs the generating graph: with variantRate=0 the
    // cluster step must be near-identity (identical base surfaces), so
    // P/R vs the oracle stays >= the 0.95 gate
    val oracle = CorpusGen.oracleGraph(cfg.corpus).relations
    val tp = (got & oracle).size.toDouble
    val p = tp / got.size
    val r = tp / oracle.size
    assert(p >= 0.95, s"precision $p")
    assert(r >= 0.95, s"recall $r")

    // resume: rerunning the identical config must not recompute —
    // and must produce the identical canonical tables
    val res2 = KgGenJob.run(spark, cfg)
    val got2 = res2.triples.as[Triple].collect().map(t => (t.subject, t.predicate, t.obj)).toSet
    assert(got2 == got)
    val ents1 = res.entities.as[String].collect().toSet
    val ents2 = res2.entities.as[String].collect().toSet
    assert(ents1 == ents2)
  }

  test("lean and provenance commit modes produce identical canonical tables") {
    import spark.implicits._
    val corpus = CorpusGen.Config(nDocs = 120L, seed = 7L, variantRate = 0.2)
    def canon(cfg: KgGenJob.JobConfig): (Set[String], Set[(String, String, String)], Set[String]) = {
      val r = KgGenJob.run(spark, cfg)
      (
        r.entities.as[String].collect().toSet,
        r.triples.as[Triple].collect().map(t => (t.subject, t.predicate, t.obj)).toSet,
        r.edges.as[String].collect().toSet
      )
    }
    val lean = canon(KgGenJob.JobConfig(Files.createTempDirectory("graft-lean").toString, corpus = corpus))
    val prov = canon(
      KgGenJob.JobConfig(
        Files.createTempDirectory("graft-prov").toString,
        corpus = corpus,
        commitProvenance = true
      )
    )
    assert(lean == prov)
    assert(lean._2.nonEmpty)
  }

  test("embedding feature stage commits, resumes, and reads back (S5)") {
    val root = Files.createTempDirectory("graft-emb").toString
    val cfg = KgGenJob.JobConfig(
      tableRoot = root,
      corpus = CorpusGen.Config(nDocs = 60L, seed = 5L),
      commitEmbeddings = true
    )
    KgGenJob.run(spark, cfg)
    val table = new graft.store.SnapshotTable(spark, root)
    assert(table.exists("node_embeddings", cfg.clusterFp))
    assert(table.exists("predicate_embeddings", cfg.clusterFp))
    val (nodeEmb, predEmb) = KgGenJob.embeddingTables(spark, cfg)
    assert(nodeEmb.count() > 0 && predEmb.count() > 0)

    // resume: file set untouched by a second run (snapshot hit, no
    // recompute), content identical
    val dir = java.nio.file.Paths.get(root, "data", table.snapshotId("node_embeddings", cfg.clusterFp))
    import scala.jdk.CollectionConverters._
    def state = Files.list(dir).iterator().asScala.map(f => f.toString -> Files.getLastModifiedTime(f).toMillis).toMap
    val before = state
    KgGenJob.run(spark, cfg)
    assert(state == before)
  }

  test("bucketed layout: directory partitions, pruned reads, same triples") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val corpus = CorpusGen.Config(nDocs = 120L, seed = 7L, variantRate = 0.2)
    val flatCfg = KgGenJob.JobConfig(Files.createTempDirectory("graft-flat").toString, corpus = corpus)
    val bktRoot = Files.createTempDirectory("graft-bkt").toString
    val bktCfg = KgGenJob.JobConfig(bktRoot, corpus = corpus, partitionBuckets = 8)
    val flat = KgGenJob.run(spark, flatCfg)
    val bkt = KgGenJob.run(spark, bktCfg)

    // identical canonical triple set (bucket is additive layout only)
    val f = flat.triples.as[Triple].collect().map(t => (t.subject, t.predicate, t.obj)).toSet
    val b = bkt.triples.select("subject", "predicate", "obj").as[(String, String, String)].collect().toSet
    assert(b == f)

    // on-disk layout is bucket=*/ directory partitions
    val table = new graft.store.SnapshotTable(spark, bktRoot)
    val dir = java.nio.file.Paths.get(bktRoot, "data", table.snapshotId("canonical_triples", bktCfg.clusterFp))
    import scala.jdk.CollectionConverters._
    val subdirs = Files.list(dir).iterator().asScala.map(_.getFileName.toString).filter(_.startsWith("bucket=")).toSeq
    assert(subdirs.nonEmpty && subdirs.size <= 8, subdirs.toString)

    // a bucket-filtered read prunes to that bucket's directory: the
    // predicate lands in the scan's PartitionFilters (directory-level
    // pruning), not as a post-scan row filter
    val snap = table.read("canonical_triples", bktCfg.clusterFp)
    val one = snap.where(col("bucket") === 3)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && """PartitionFilters: \[[^\]]*bucket""".r.findFirstIn(plan).isDefined, plan.take(800))
    assert(one.count() < snap.count() && one.count() > 0)

    // manifest lineage still counts every row across partition dirs
    assert(table.rowCount("canonical_triples", bktCfg.clusterFp).contains(f.size.toLong))
  }

  test("changed config yields new snapshots without disturbing old ones") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-job2").toString
    val small = KgGenJob.JobConfig(root, corpus = CorpusGen.Config(nDocs = 40L, seed = 3L))
    val bigger = small.copy(corpus = small.corpus.copy(nDocs = 80L))
    val a = KgGenJob.run(spark, small).triples.count()
    val b = KgGenJob.run(spark, bigger).triples.count()
    assert(b > a)
    // original still resumable and unchanged
    assert(KgGenJob.run(spark, small).triples.count() == a)
  }

  test("dedupUrls wiring: no-op on a unique-url corpus, distinct fingerprint, both branches") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-job-urls").toString
    val base = KgGenJob.JobConfig(
      tableRoot = root,
      corpus = CorpusGen.Config(nDocs = 40L, seed = 7L)
    )
    val deduped = base.copy(dedupUrls = true)
    // the flag is part of the stage identity: a resumed run must never
    // serve a non-deduped snapshot to a dedupUrls config (or vice versa)
    assert(base.chunksFp != deduped.chunksFp)
    def triples(cfg: KgGenJob.JobConfig) =
      KgGenJob.run(spark, cfg).triples.as[Triple].collect()
        .map(t => (t.subject, t.predicate, t.obj)).toSet
    // the synthetic corpus has unique urls, so dedup must be a no-op in
    // BOTH commit branches — this drives the .as[Page] round-trip and
    // the ingest placement through the real job
    val plain = triples(base)
    assert(triples(deduped) == plain)
    assert(triples(deduped.copy(commitProvenance = true)) == plain)
    assert(plain.nonEmpty)
  }
}
