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
  }

  test("empty store reads as empty tables, not errors") {
    val s = new MemoryStore(spark, freshRoot())
    assert(s.version == 0)
    assert(s.entities.count() == 0 && s.triples.count() == 0 && s.edges.count() == 0)
  }
}
