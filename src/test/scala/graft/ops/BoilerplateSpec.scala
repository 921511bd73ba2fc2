package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Per-source boilerplate segment detection (TextAnalysis.boilerplate) —
  * the registry query text_boilerplate is oracle-checked end-to-end;
  * this pins the segmentation boundary, the per-source scoping, and the
  * coverage arithmetic on a hand-built fixture.
  */
class BoilerplateSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // 6-token site chrome shared by all s1 docs, then a unique 6-token tail
  private val chrome = "nav home about contact login search"

  private def fixture = Seq(
    (1L, s"$chrome one two three four five six", "s1"),
    (2L, s"$chrome seven eight nine ten eleven twelve", "s1"),
    (3L, s"$chrome alpha beta gamma delta eps zeta", "s1"),
    (4L, "totally different words with no repeats at", "s2"),
    (5L, "another unique page of fresh tokens here too", "s2")
  ).toDF("doc_id", "text", "source")

  test("boilerplate: repeated chrome segment found with exact coverage") {
    val got = TextAnalysis.boilerplate(fixture, span = 6, minDocs = 2L)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    // the chrome spans docs 1-3 of s1 (3 of 3 docs = 1000 permille); the
    // unique tails never repeat; s2 has no repeated segment at all
    assert(got == Set(("s1", chrome, 3L, 1000L)))
  }

  test("boilerplate: scope is per source — same segment in two sources never pools") {
    val d = Seq(
      (1L, "shared chrome line here again now", "s1"),
      (2L, "shared chrome line here again now", "s2")
    ).toDF("doc_id", "text", "source")
    // one occurrence per source: below minDocs within each source
    assert(TextAnalysis.boilerplate(d, span = 6, minDocs = 2L).isEmpty)
  }

  test("boilerplate: within-doc repetition counts once (distinct doc rule)") {
    val seg = "aa bb cc dd ee ff"
    val d = Seq(
      (1L, s"$seg $seg", "s1"), // segment appears twice in ONE doc
      (2L, "unique tokens in this doc right here", "s1")
    ).toDF("doc_id", "text", "source")
    assert(TextAnalysis.boilerplate(d, span = 6, minDocs = 2L).isEmpty)
  }
}
