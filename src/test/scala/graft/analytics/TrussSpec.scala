package graft.analytics

import graft.{GenSampling, SparkTestBase}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** trussDecomposition vs an in-memory brute-force peel on random small
  * graphs, plus the edgeSupport/triangle cross-check it builds on.
  */
class TrussSpec extends AnyFunSuite with SparkTestBase with GenSampling {

  import spark.implicits._

  private def toTriples(edges: Seq[(String, String)]) =
    edges.zipWithIndex
      .map { case ((a, b), i) => (a, s"p$i", b) }
      .toDF("subject", "predicate", "obj")

  /** Reference truss: iterative peel over scala collections. */
  private def bruteTruss(edges: Set[(String, String)], kMax: Int): Map[(String, String), Int] = {
    def support(es: Set[(String, String)]): Map[(String, String), Int] = {
      val nb = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1)
        .map { case (v, s) => v -> s.map(_._2) }
      es.map { case (a, b) => (a, b) -> (nb(a) & nb(b)).size }.toMap
    }
    var live = es2canon(edges)
    var out = Map.empty[(String, String), Int]
    var k = 3
    while (k <= kMax && live.nonEmpty) {
      var changed = true
      while (changed) {
        val sup = support(live)
        val dead = live.filter(e => sup(e) < k - 2)
        if (dead.isEmpty) changed = false
        else {
          out ++= dead.map(_ -> (k - 1))
          live --= dead
        }
      }
      k += 1
    }
    out ++ live.map(_ -> kMax)
  }

  private def es2canon(edges: Set[(String, String)]): Set[(String, String)] =
    edges.collect { case (a, b) if a != b => if (a < b) (a, b) else (b, a) }

  private val graphGen: Gen[Seq[(String, String)]] =
    Gen.choose(5, 40).flatMap { n =>
      Gen.listOfN(
        n,
        Gen.zip(Gen.choose(0, 9), Gen.choose(0, 9)).map { case (x, y) => (s"n$x", s"n$y") }
      )
    }

  test("trussDecomposition matches brute-force peel on random graphs") {
    forAllSamples(graphGen, n = 6) { edges =>
      val canon = es2canon(edges.toSet)
      if (canon.nonEmpty) {
        val expected = bruteTruss(canon, kMax = 6)
        val actual = Analytics
          .trussDecomposition(toTriples(edges), kMax = 6)
          .collect()
          .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2).toInt)
          .toMap
        assert(actual == expected)
      }
    }
  }

  test("edgeSupport equals brute common-neighbor counts and sums to 3x triangles") {
    forAllSamples(graphGen, n = 6) { edges =>
      val canon = es2canon(edges.toSet)
      if (canon.nonEmpty) {
        val nb = canon
          .flatMap { case (a, b) => Seq(a -> b, b -> a) }
          .groupBy(_._1)
          .map { case (v, s) => v -> s.map(_._2) }
        val expected = canon.map { case (a, b) => (a, b) -> (nb(a) & nb(b)).size.toLong }.toMap
        val actual = Analytics
          .edgeSupport(toTriples(edges))
          .collect()
          .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
          .toMap
        assert(actual == expected)
        val triangles = Analytics
          .triangleCounts(toTriples(edges))
          .agg(sum("triangles"))
          .collect()(0)
          .getLong(0)
        // node-credited triangle count = 3 per triangle; edge-credited
        // support sums to the same 3x (each triangle backs 3 edges)
        assert(actual.values.sum == triangles)
      }
    }
  }

  test("truss on a clique plus pendant edge: clique edges get kMax-capped truss, pendant gets 2") {
    // K4 on a,b,c,d (truss 4) plus pendant d-e (truss 2)
    val k4 = Seq("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c", "b" -> "d", "c" -> "d")
    val edges = k4 :+ ("d" -> "e")
    val out = Analytics
      .trussDecomposition(toTriples(edges), kMax = 8)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out(("d", "e")) == 2L)
    k4.foreach { case (a, b) => assert(out((a, b)) == 4L, s"edge ($a,$b)") }
  }
}
