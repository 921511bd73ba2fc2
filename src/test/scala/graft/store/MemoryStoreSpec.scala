package graft.store

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class MemoryStoreSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-mem").toString

  private val g1Ents = Seq("paris", "france", "seine")
  private val g1Tris = Seq(("paris", "capital of", "france"), ("seine", "flows through", "paris"))
  private val g2Ents = Seq("france", "europe", "paris")
  private val g2Tris = Seq(("france", "part of", "europe"), ("paris", "capital of", "france"))

  private def ents(xs: Seq[String]) = xs.toDF("entity")
  private def tris(xs: Seq[(String, String, String)]) = xs.toDF("subject", "predicate", "obj")

  private def tables(s: MemoryStore) = (
    s.entities.as[String].collect().sorted.toSeq,
    s.triples.as[(String, String, String)].collect().sorted.toSeq,
    s.edges.as[String].collect().sorted.toSeq
  )

  test("two sequential merges equal one aggregate-then-commit (set-union semantics)") {
    val seqStore = new MemoryStore(spark, freshRoot())
    assert(seqStore.addMemories(ents(g1Ents), tris(g1Tris)) == 1)
    assert(seqStore.addMemories(ents(g2Ents), tris(g2Tris)) == 2)

    val oneShot = new MemoryStore(spark, freshRoot())
    oneShot.addMemories(ents(g1Ents ++ g2Ents), tris(g1Tris ++ g2Tris))

    assert(tables(seqStore) == tables(oneShot))
    // no duplicates despite the overlap between g1 and g2
    val (e, t, ed) = tables(seqStore)
    assert(e == e.distinct && t == t.distinct && ed == ed.distinct)
    assert(e.contains("europe") && t.size == 3 && ed.size == 3)
  }

  test("resume: a fresh store handle on the same root sees the committed state") {
    val root = freshRoot()
    val s1 = new MemoryStore(spark, root)
    s1.addMemories(ents(g1Ents), tris(g1Tris))
    val s2 = new MemoryStore(spark, root)
    assert(s2.version == 1)
    assert(tables(s2) == tables(s1))
    // re-merging the SAME delta bumps the version but stays a set union
    s2.addMemories(ents(g1Ents), tris(g1Tris))
    assert(s2.version == 2)
    assert(tables(s2)._2.size == 2)
    // ... and commits NO new data dirs (the delta was empty), so a
    // steady replay stream can't grow the read-side file list
    Seq("memory_entities", "memory_triples", "memory_edges").foreach { name =>
      assert(s2.dirsFor(2, name) == s2.dirsFor(1, name), name)
    }
  }

  test("empty store reads as empty tables, not errors") {
    val s = new MemoryStore(spark, freshRoot())
    assert(s.version == 0)
    assert(s.entities.count() == 0 && s.triples.count() == 0 && s.edges.count() == 0)
  }

  test("merge is O(delta): a second merge never rewrites version-1 data files") {
    val root = freshRoot()
    val s = new MemoryStore(spark, root)
    s.addMemories(ents(g1Ents), tris(g1Tris))

    // snapshot the v1 file set (path -> lastModified) before merging again
    val v1Dirs = s.dirsFor(1, "memory_triples")
    assert(v1Dirs.size == 1)
    import scala.jdk.CollectionConverters._
    def fileState(dirs: Seq[String]): Map[String, Long] =
      dirs.flatMap { d =>
        Files.list(java.nio.file.Paths.get(d)).iterator().asScala
          .filter(_.toString.endsWith(".parquet"))
          .map(f => f.toString -> Files.getLastModifiedTime(f).toMillis)
          .toSeq
      }.toMap
    val before = fileState(v1Dirs)
    assert(before.nonEmpty)

    s.addMemories(ents(g2Ents), tris(g2Tris))

    // v1 data files are byte-untouched; v2's manifest REFERENCES them
    // plus exactly one new delta dir
    assert(fileState(v1Dirs) == before)
    val v2Dirs = s.dirsFor(2, "memory_triples")
    assert(v2Dirs.startsWith(v1Dirs) && v2Dirs.size == 2)

    // and the chained read equals aggregate-then-commit
    val oneShot = new MemoryStore(spark, freshRoot())
    oneShot.addMemories(ents(g1Ents ++ g2Ents), tris(g1Tris ++ g2Tris))
    assert(tables(s) == tables(oneShot))
  }

  test("divergent retry of the same version cannot reuse a stale half-commit") {
    // two stores racing on the same root at the same base version with
    // DIFFERENT deltas: content-addressed snapshots keep their data dirs
    // disjoint, so the loser's files are never referenced by the winner's
    // manifest (advice round 2: fp(nextV) by version number alone allowed
    // silent stale reuse)
    val root = freshRoot()
    val a = new MemoryStore(spark, root)
    a.addMemories(ents(g1Ents), tris(g1Tris))
    val b = new MemoryStore(spark, root)
    b.addMemories(ents(Seq("zeta")), tris(Seq(("zeta", "orbits", "zeta"))))
    // a retry that merges a different delta at version 3
    a.addMemories(ents(Seq("omega")), tris(Seq(("omega", "precedes", "zeta"))))
    val (e, t, _) = tables(a)
    assert(e.contains("zeta") && e.contains("omega"))
    assert(t.size == 4)
  }

  test("compact folds the chain into single dirs with identical content") {
    val s = new MemoryStore(spark, freshRoot())
    s.addMemories(ents(g1Ents), tris(g1Tris))
    s.addMemories(ents(g2Ents), tris(g2Tris))
    val before = tables(s)
    val v = s.compact()
    assert(v == 3)
    assert(s.dirsFor(v, "memory_triples").size == 1)
    assert(tables(s) == before)
  }

  test("store-level retrieval: 2-hop context and stats over the merged store") {
    val s = new MemoryStore(spark, freshRoot())
    s.addMemories(ents(g1Ents), tris(g1Tris))
    s.addMemories(ents(g2Ents), tris(g2Tris))
    // retrieval must see BOTH merges: "paris" seeds 2-hop context that
    // includes the g2-only triple france->europe
    val ctx = s.retrieve("paris").as[String].collect().head
    assert(ctx.contains("paris capital of france"))
    assert(ctx.contains("france part of europe"))
    val hits = s.searchEntities("fran").as[String].collect()
    assert(hits.contains("france"))
    assert(s.stats("entities") == 4L && s.stats("triples") == 3L && s.stats("version") == 2L)
  }
}
