package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Generic BGP evaluator semantics (constants, shared variables,
  * repeated variables, disconnection guard) plus walk-PPMI's exact
  * integer arithmetic — both registry queries (kg_bgp, kg_ppmi) are
  * oracle-checked end-to-end; these tests pin the evaluator paths the
  * fixed registry pattern doesn't exercise.
  */
class BgpPpmiSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def triplesDf(ts: (String, String, String)*) =
    ts.toDF("subject", "predicate", "obj")

  test("bgpMatch: two-atom chain with constant predicates binds shared variable") {
    val tr = triplesDf(
      ("ann", "knows", "bob"),
      ("bob", "knows", "cid"),
      ("ann", "likes", "cid"),
      ("cid", "knows", "dan")
    )
    val got = Analytics
      .bgpMatch(tr, Seq(("?x", "knows", "?y"), ("?y", "knows", "?z")))
      .collect()
      .map(r => (r.getAs[String]("x"), r.getAs[String]("y"), r.getAs[String]("z")))
      .toSet
    assert(got == Set(("ann", "bob", "cid"), ("bob", "cid", "dan")))
  }

  test("bgpMatch: constant subject narrows to that subject's bindings") {
    val tr = triplesDf(("ann", "knows", "bob"), ("cid", "knows", "dan"))
    val got = Analytics
      .bgpMatch(tr, Seq(("ann", "?p", "?o")))
      .collect()
      .map(r => (r.getAs[String]("p"), r.getAs[String]("o")))
      .toSet
    assert(got == Set(("knows", "bob")))
  }

  test("bgpMatch: repeated variable inside one atom means equality (self-loops)") {
    val tr = triplesDf(("ann", "is", "ann"), ("ann", "is", "bob"), ("cid", "is", "cid"))
    val got = Analytics
      .bgpMatch(tr, Seq(("?x", "is", "?x")))
      .collect()
      .map(_.getAs[String]("x"))
      .toSet
    assert(got == Set("ann", "cid"))
  }

  test("bgpMatch: triangle pattern with predicate variables matches the closed wedge only") {
    val tr = triplesDf(
      ("ann", "p1", "bob"),
      ("bob", "p2", "cid"),
      ("ann", "p3", "cid"), // closes ann->bob->cid
      ("bob", "p1", "dan")  // open wedge, no ann->dan edge
    )
    val got = Analytics
      .bgpMatch(tr, Seq(("?a", "?p", "?b"), ("?b", "?q", "?c"), ("?a", "?r", "?c")))
      .collect()
      .map(r =>
        (r.getAs[String]("a"), r.getAs[String]("p"), r.getAs[String]("b"),
          r.getAs[String]("q"), r.getAs[String]("c"), r.getAs[String]("r")))
      .toSet
    assert(got == Set(("ann", "p1", "bob", "p2", "cid", "p3")))
  }

  test("bgpMatch: disconnected pattern is rejected, empty pattern is rejected") {
    val tr = triplesDf(("ann", "knows", "bob"))
    intercept[IllegalArgumentException] {
      Analytics.bgpMatch(tr, Seq(("?a", "knows", "?b"), ("?c", "knows", "?d")))
    }
    intercept[IllegalArgumentException] {
      Analytics.bgpMatch(tr, Seq.empty)
    }
  }

  test("walkPpmi: matches brute-force exact-integer PPMI over the co-occurrence table") {
    // ring + chord graph — enough structure for non-uniform marginals
    val tr = triplesDf(
      ("aaaa", "r", "bbbb"), ("bbbb", "r", "cccc"), ("cccc", "r", "dddd"),
      ("dddd", "r", "aaaa"), ("aaaa", "r", "cccc")
    )
    val cooc = Analytics.walkCooccurrence(tr, steps = 3, window = 2)
      .collect()
      .map(r => ((r.getAs[String]("node"), r.getAs[String]("context")), r.getAs[Long]("cnt")))
      .toMap
    val total = BigInt(cooc.values.sum)
    val nodeSum = cooc.groupBy(_._1._1).map { case (n, m) => n -> BigInt(m.values.sum) }
    val ctxSum = cooc.groupBy(_._1._2).map { case (c, m) => c -> BigInt(m.values.sum) }
    val expected = cooc.flatMap { case ((n, c), cnt) =>
      val ratio = (BigInt(cnt) * total * 1000) / (nodeSum(n) * ctxSum(c))
      if (ratio > 1000) Some((n, c, cnt, ratio.toLong)) else None
    }.toSet
    assert(expected.nonEmpty) // fixture must exercise the positive-PMI filter
    val got = Analytics.walkPpmi(tr, steps = 3, window = 2)
      .collect()
      .map(r =>
        (r.getAs[String]("node"), r.getAs[String]("context"),
          r.getAs[Long]("cnt"), r.getAs[Long]("pmi_ratio_permille")))
      .toSet
    assert(got == expected)
  }
}
