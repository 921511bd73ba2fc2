package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Generic BGP evaluator semantics (constants, shared variables,
  * repeated variables, disconnection guard) plus walk-PPMI's exact
  * integer arithmetic — both registry queries (kg_bgp, kg_ppmi) are
  * oracle-checked end-to-end; these tests pin the evaluator paths the
  * fixed registry pattern doesn't exercise.
  */
class BgpPpmiSpec extends AnyFunSuite with SparkTestBase with graft.GenSampling {

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

  test("bgpMatch: property — random connected patterns equal brute-force SPARQL semantics") {
    import org.scalacheck.Gen
    // reference evaluator: unification over a binding environment,
    // SPARQL set semantics via the final toSet
    def brute(
        triples: Seq[(String, String, String)],
        pattern: Seq[(String, String, String)]
    ): Set[Map[String, String]] = {
      def unify(b: Option[Map[String, String]], term: String, value: String) =
        b.flatMap { m =>
          if (term.startsWith("?")) m.get(term) match {
            case Some(v) => if (v == value) Some(m) else None
            case None => Some(m + (term -> value))
          }
          else if (term == value) Some(m) else None
        }
      pattern
        .foldLeft(Seq(Map.empty[String, String])) { (bs, atom) =>
          bs.flatMap(b =>
            triples.flatMap { case (s, p, o) =>
              unify(unify(unify(Some(b), atom._1, s), atom._2, p), atom._3, o)
            })
        }
        .toSet
    }
    val nodes = Seq("n1", "n2", "n3", "n4")
    val preds = Seq("p1", "p2")
    val genTriples = Gen.listOfN(
      8,
      for { s <- Gen.oneOf(nodes); p <- Gen.oneOf(preds); o <- Gen.oneOf(nodes) } yield (s, p, o)
    )
    // two atoms always connected through ?y; terms mix constants and
    // variables (including a repeated ?x across atoms)
    val genPattern = for {
      t1 <- Gen.oneOf("?x", "n1")
      t2 <- Gen.oneOf("?p", "p1")
      t3 <- Gen.oneOf("?q", "p2", "?p")
      t4 <- Gen.oneOf("?z", "n2", "?x")
    } yield Seq((t1, t2, "?y"), ("?y", t3, t4))
    forAllSamples2(genTriples, genPattern, n = 25) { (ts, pat) =>
      val distinctTs = ts.distinct
      val expected = brute(distinctTs, pat).map(b => b.map { case (k, v) => k.stripPrefix("?") -> v })
      val df = Analytics.bgpMatch(distinctTs.toDF("subject", "predicate", "obj"), pat)
      val cols = df.columns
      val got = df.collect().map(r => cols.zipWithIndex.map { case (c, i) => c -> r.getString(i) }.toMap).toSet
      assert(got == expected, s"pattern $pat over $distinctTs")
    }
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("bowtie: matches brute-force seed-relative reach classification") {
    // directed cycle a->b->c->a with an in-tail (t->a), an out-tail
    // (c->o), and a disconnected pair (x->y); whoever the md5-min seed
    // is, the brute-force classification below recomputes the same rule
    val edges = Seq(
      ("aaaa", "r", "bbbb"), ("bbbb", "r", "cccc"), ("cccc", "r", "aaaa"),
      ("tttt", "r", "aaaa"), ("cccc", "r", "oooo"), ("xxxx", "r", "yyyy")
    )
    val tr = edges.toDF("subject", "predicate", "obj")
    val dir = edges.map(e => (e._1, e._3)).toSet
    val nodes = dir.flatMap(e => Seq(e._1, e._2))
    val seed = nodes.toSeq.sortBy(v => (md5hex(v), v)).head
    def reach(from: String => Set[String], start: String): Set[String] = {
      var seen = Set(start); var frontier = Set(start)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(from) -- seen
        seen ++= next; frontier = next
      }
      seen
    }
    val fwd = reach(v => dir.collect { case (a, b) if a == v => b }, seed)
    val bwd = reach(v => dir.collect { case (a, b) if b == v => a }, seed)
    val expected = Map(
      "core" -> nodes.count(v => fwd(v) && bwd(v)).toLong,
      "in" -> nodes.count(v => bwd(v) && !fwd(v)).toLong,
      "out" -> nodes.count(v => fwd(v) && !bwd(v)).toLong,
      "other" -> nodes.count(v => !fwd(v) && !bwd(v)).toLong
    )
    val got = Analytics.bowtie(tr).collect()
      .map(r => r.getAs[String]("region") -> r.getAs[Long]("n_nodes")).toMap
    assert(got == expected)
    assert(got.values.sum == nodes.size.toLong)
    // the fixture guarantees every region is exercised whichever node
    // seeds: cycle members see a nonempty core; the disconnected pair is
    // always other-classified from any seed in the main component (and
    // vice versa)
    assert(got("other") >= 2L)
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
