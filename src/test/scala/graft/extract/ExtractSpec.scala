package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.corpus.CorpusGen
import graft.model.Triple
import graft.textprep.TextExtract

/** End-to-end extraction parity: pages rendered from known graphs must be
  * recovered exactly (P = R = 1.0 vs the generating triples; the
  * BASELINE gate is >= 0.95). Mirrors the shape of the reference's
  * generate tests (tests/test_basic.py, tests/test_chunked.py) with the
  * fuzzy LLM matcher replaced by exact set comparison.
  */
class ExtractSpec extends AnyFunSuite with SparkTestBase {

  private val cfg = CorpusGen.Config(nDocs = 200L, seed = 42L)

  test("per-row invariant: TextExtract(html) is byte-identical to text") {
    val pages = CorpusGen.pages(spark, cfg).collect()
    assert(pages.nonEmpty)
    pages.foreach { p =>
      assert(TextExtract.extract(p.html) == p.text, s"url=${p.url}")
    }
  }

  test("extraction recovers the generating triples exactly (P=R=1.0)") {
    import spark.implicits._
    val pages = CorpusGen.pages(spark, cfg)
    val (entities, triples, edges) = Extract.generate(pages)

    val got = triples.as[Triple].collect().map(t => (t.subject, t.predicate, t.obj)).toSet
    val expected = CorpusGen.oracleGraph(cfg).relations
    val tp = (got & expected).size.toDouble
    val precision = tp / got.size
    val recall = tp / expected.size
    assert(precision == 1.0, s"precision $precision; spurious: ${(got -- expected).take(5)}")
    assert(recall == 1.0, s"recall $recall; missed: ${(expected -- got).take(5)}")

    // entities and edges are exactly the endpoint/predicate projections
    val gotEnts = entities.as[String].collect().toSet
    val oracleEnts = expected.flatMap(t => Seq(t._1, t._3))
    assert(gotEnts == oracleEnts)
    val gotEdges = edges.as[String].collect().toSet
    assert(gotEdges == expected.map(_._2))
  }

  test("non-en pages are filtered out") {
    import spark.implicits._
    val pages = CorpusGen.pages(spark, cfg)
    assert(pages.filter(col("lang") =!= "en").count() > 0, "corpus must contain non-en pages")
    val chunks = Extract.chunks(pages)
    val nonEnUrls = pages.filter(col("lang") =!= "en").select("url").as[String].collect().toSet
    val chunkUrls = chunks.select("url").distinct().as[String].collect().toSet
    assert(chunkUrls.intersect(nonEnUrls).isEmpty)
  }

  test("chunked and unchunked extraction agree on the triple set") {
    // mirrors tests/test_chunked.py:14-60 (diff of modes), asserted
    import spark.implicits._
    val small = CorpusGen.Config(nDocs = 50L, seed = 7L)
    val pages = CorpusGen.pages(spark, small)
    val chunked = Extract.generate(pages, cfg = Extract.Config(chunkSize = 120))._2
    val unchunked = Extract.generate(pages, cfg = Extract.Config(chunkSize = 1 << 20))._2
    val a = chunked.as[Triple].collect().toSet
    val b = unchunked.as[Triple].collect().toSet
    assert(a == b)
  }

  test("membership filter drops triples whose endpoints are not chunk entities") {
    // E3 hard filter semantics (_2_get_relations.py:101-105): feed a scorer
    // that emits an out-of-vocabulary triple and check it is filtered.
    import spark.implicits._
    val rogue = new Scorer {
      def entities(chunks: Seq[String], isConv: Boolean): Seq[Seq[String]] =
        chunks.map(_ => Seq("Alice", "Bob"))
      def relations(batch: Seq[(String, Seq[String])], isConv: Boolean): Seq[Seq[Triple]] =
        batch.map(_ =>
          Seq(
            Triple("Alice", "knows", "Bob"), // valid
            Triple("Alice", "knows", "Mallory"), // obj not an entity
            Triple("Eve", "knows", "Bob") // subject not an entity
          )
        )
    }
    val pages = CorpusGen.pages(spark, CorpusGen.Config(nDocs = 5L, nonEnRate = 0.0))
    val (_, triples, _) = Extract.generate(pages, scorer = rogue)
    val got = triples.as[Triple].collect().toSet
    assert(got == Set(Triple("Alice", "knows", "Bob")))
  }

  test("PatternScorer.extract equals the entities+relations composition") {
    // the single-parse fast path must be observationally identical to the
    // reference-shaped two-call path it overrides
    val texts = CorpusGen.pages(spark, CorpusGen.Config(nDocs = 60L, seed = 9L))
      .collect().map(_.text).toSeq
    for (isConv <- Seq(false, true)) {
      val fast = PatternScorer.extract(texts, isConv)
      val ents = PatternScorer.entities(texts, isConv)
      val rels = PatternScorer.relations(texts.zip(ents), isConv)
      assert(fast.map(_._1) == ents)
      assert(fast.map(_._2) == rels)
    }
  }

  test("conversation mode: role filter, speaker entities, speaker relations") {
    // mirrors tests/test_basic.py:123-136 semantics with the deterministic scorer
    val convo = "user: What is the capital of France?\nassistant: The capital of France is Paris."
    val ents = PatternScorer.entities(Seq(convo), isConversation = true).head
    assert(ents.contains("user") && ents.contains("assistant"))
    assert(ents.contains("France") && ents.contains("Paris"))
    val rels = PatternScorer.relations(Seq((convo, ents)), isConversation = true).head
    assert(rels.contains(Triple("user", "says", "What")))
  }

  test("docDensity: row-local mention/window counts and per-kilo units") {
    import spark.implicits._
    val d = Seq(
      // 5 tokens, mentions {aaaa, cccc, dddd}; windows: (aaaa bb cccc)
      // and (cccc dddd aaaa) valid, (bb cccc dddd) has a short subject
      (1L, "aaaa bb cccc dddd aaaa"),
      // short tokens only: no mentions, no valid windows
      (2L, "xx yy"),
      // repeated windows dedup: {(aaaa bbbb aaaa), (bbbb aaaa bbbb)}
      (3L, "aaaa bbbb aaaa bbbb aaaa"),
      // empty after tokenization: filtered out entirely
      (4L, " ")
    ).toDF("doc_id", "text")
    val got = TokenRules.docDensity(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == Set(
      (1L, 5L, 3L, 2L, 600L, 400L),
      (2L, 2L, 0L, 0L, 0L, 0L),
      (3L, 5L, 2L, 2L, 400L, 400L)
    ))
  }
}
