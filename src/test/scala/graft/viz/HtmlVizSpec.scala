package graft.viz

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.analytics.Analytics

/** Golden test for the standalone HTML visualization artifact (VERDICT
  * r3 #5, reference parity with visualize_kg.py:261-304). The artifact
  * must be byte-deterministic for identical input and carry the full
  * view model (nodes with degrees/component/color, edges, top lists,
  * stats) embedded as JSON.
  */
class HtmlVizSpec extends AnyFunSuite with SparkTestBase {

  private def fixture = {
    import spark.implicits._
    val ents = Seq("alpha", "beta", "gamma", "lone").toDF("entity")
    val tris = Seq(
      ("alpha", "likes", "beta"),
      ("beta", "likes", "gamma"),
      ("gamma", "sees", "alpha")
    ).toDF("subject", "predicate", "obj")
    (ents, tris)
  }

  test("render is byte-deterministic and self-contained") {
    val (ents, tris) = fixture
    val viz = Analytics.vizModel(ents, tris)
    val h1 = HtmlViz.render(viz, tris)
    val h2 = HtmlViz.render(Analytics.vizModel(ents, tris), tris)
    assert(h1 == h2, "two renders of the same graph diverged")
    assert(h1.startsWith("<!doctype html>"))
    assert(!h1.contains("/*DATA*/null"), "view model was not spliced in")
    assert(!h1.contains("http://") || h1.contains("xmlns"), "no external fetches")
    assert(!h1.contains("https://"), "no external fetches")
  }

  test("script-breaking entity text is escaped (no literal </script> in the artifact)") {
    import spark.implicits._
    val evil = "</script><script>alert(1)</script>"
    val ents = Seq(evil, "safe").toDF("entity")
    val tris = Seq((evil, "pred", "safe")).toDF("subject", "predicate", "obj")
    val html = HtmlViz.render(Analytics.vizModel(ents, tris), tris)
    // the artifact has exactly ONE closing script tag — its own
    assert("</script>".r.findAllIn(html).size == 1, "entity text broke out of the script block")
    assert(html.contains("\\u003c/script>"), "JSON escaping for '<' missing")
  }

  test("JS line separators U+2028/U+2029 are escaped in the embedded JSON") {
    import spark.implicits._
    val sep = "a\u2028b\u2029c"
    val ents = Seq(sep, "safe").toDF("entity")
    val tris = Seq((sep, "pred", "safe")).toDF("subject", "predicate", "obj")
    val html = HtmlViz.render(Analytics.vizModel(ents, tris), tris)
    assert(!html.contains('\u2028') && !html.contains('\u2029'),
      "raw JS line terminator leaked into the inline script")
    assert(html.contains("a\\u2028b\\u2029c"), "escaped form missing")
  }

  test("embedded view model carries nodes, edges, top lists and stats") {
    val (ents, tris) = fixture
    val html = HtmlViz.render(Analytics.vizModel(ents, tris), tris)
    // node with its md5 color and degrees
    assert(html.contains(""""id":"alpha""""))
    assert(html.contains(""""outdegree":1,"indegree":1,"degree":2"""))
    // edges sorted by (predicate, subject, object): e0/e1 are the two
    // 'likes' edges, e2 the 'sees' edge
    assert(
      html.contains(""""id":"e0","source":"alpha","predicate":"likes","target":"beta"""")
    )
    assert(
      html.contains(""""id":"e2","source":"gamma","predicate":"sees","target":"alpha"""")
    )
    // predicate colors follow the same md5 rule as node colors
    assert(html.contains(s""""predicate":"likes","count":2,"color":"${HtmlViz
        .md5Color("likes")}""""))
    // stats block: 4 entities (one isolated), 3 relations, 2 predicates,
    // 2 components, avg degree 6/4, density 3/(4*3)
    assert(
      html.contains(
        """"stats":{"entities":4,"relations":3,"relationTypes":2,"isolatedEntities":1,""" +
          """"components":2,"averageDegree":1.5,"density":0.25}"""
      )
    )
  }

  test("golden: fixture graph renders to the recorded digest") {
    val (ents, tris) = fixture
    val html = HtmlViz.render(Analytics.vizModel(ents, tris), tris)
    val digest = java.security.MessageDigest
      .getInstance("SHA-256")
      .digest(html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"${b & 0xff}%02x")
      .mkString
    // recorded from the committed template + fixture; update only on an
    // intentional template change
    assert(digest == GoldenDigest, s"HTML artifact changed: $digest")
  }

  private val GoldenDigest =
    sys.props.getOrElse("graft.viz.golden", DefaultGolden)
  private def DefaultGolden = GoldenHtmlDigest.value
}

/** The recorded digest lives in its own object so an intentional template
  * change touches exactly one constant.
  */
object GoldenHtmlDigest {
  val value = "7816e1b6411e0f083bf4b2eb1d1cb9032e44c6bf897de34b5c6274e3f8aa4b47"
}
