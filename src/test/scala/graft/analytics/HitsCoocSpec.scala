package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** HITS hubs/authorities and entity co-occurrence PMI lift — the two
  * round-4 graph-signal additions. The registry queries (kg_hits,
  * kg_cooc) are oracle-checked end-to-end; these tests pin the exact
  * integer arithmetic on hand-computable fixtures plus the hub df-cap
  * guard path the degenerate synthetic corpus can't exercise.
  */
class HitsCoocSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def triplesDf(ts: (String, String, String)*) =
    ts.toDF("subject", "predicate", "obj")

  private def docsDf(ds: (Long, String)*) =
    // the coocLift mention rule needs (doc_id, text); give every doc a
    // constant source column shape-compatible with the corpus tables
    ds.map { case (id, t) => (id, t, "s0") }.toDF("doc_id", "text", "source")

  test("hits: star graph — center is the hub, leaves the authorities") {
    // center -> {a, b, c}: every leaf's auth raw is the same, so L-inf
    // normalization pins leaves at exactly 1,000,000; the center is the
    // only node with out-edges, so hub(center) = 1,000,000 and leaf hubs
    // are 0; center has no in-edges, so auth(center) = 0. This fixed
    // point is reached in round 1 and stable at any iteration count.
    val tr = triplesDf(("hub0", "r", "aaaa"), ("hub0", "r", "bbbb"), ("hub0", "r", "cccc"))
    val got = Analytics.hits(tr, iterations = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      ("hub0", 0L, 1000000L),
      ("aaaa", 1000000L, 0L),
      ("bbbb", 1000000L, 0L),
      ("cccc", 1000000L, 0L)
    ))
  }

  test("hits: mutual reinforcement orders hubs by the authority mass they reach") {
    // u1 -> {a, b}, u2 -> {a}: a collects both hubs (top authority), u1
    // covers more authority mass than u2 (top hub); ordering is stable
    // from round 1 onward, so assert the order, not drifting magnitudes
    val tr = triplesDf(("u1", "r", "aaaa"), ("u1", "r", "bbbb"), ("u2", "r", "aaaa"))
    val m = Analytics.hits(tr, iterations = 5).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m("aaaa")._1 == 1000000L) // max authority normalizes to 1e6
    assert(m("aaaa")._1 > m("bbbb")._1 && m("bbbb")._1 > 0L)
    assert(m("u1")._2 == 1000000L) // max hub normalizes to 1e6
    assert(m("u1")._2 > m("u2")._2 && m("u2")._2 > 0L)
    assert(m("u1")._1 == 0L && m("u2")._1 == 0L) // no in-edges
    assert(m("aaaa")._2 == 0L && m("bbbb")._2 == 0L) // no out-edges
  }

  test("coocLift: exact integer lift and min-support gate") {
    // bbbb+cccc co-occur in docs 1,2 (support 2); dddd appears once with
    // each (support 1 — gated out). N=4, c_bbbb=c_cccc=2 =>
    // lift = 1000*4*2 div (2*2) = 2000.
    val d = docsDf(
      (1L, "bbbb cccc"),
      (2L, "bbbb cccc dddd"),
      (3L, "eeee"),
      (4L, "ffff")
    )
    val got = Analytics.coocLift(d, minSupport = 2L, dfCapPermille = 1000).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(("bbbb", "cccc", 2L, 2000L)))
  }

  test("hits: equals a driver-side replay of the integer fixed point on random graphs") {
    val nodeGen = org.scalacheck.Gen.oneOf("na", "nb", "nc", "nd", "ne", "nf")
    val edgeGen = for { a <- nodeGen; b <- nodeGen } yield (a, "r", b)
    val gen = org.scalacheck.Gen.nonEmptyListOf(edgeGen).map(_.take(12))
    new graft.GenSampling {}.forAllSamples(gen, n = 8) { rows =>
      val ed = rows.map { case (a, _, b) => (a, b) }.distinct
      val nodes = (ed.map(_._1) ++ ed.map(_._2)).distinct.sorted
      // driver replay of the exact arithmetic (L-inf integer norm)
      var hub = nodes.map(_ -> 1000000L).toMap
      var auth = nodes.map(_ -> 0L).toMap
      for (_ <- 1 to 3) {
        val araw = ed.groupBy(_._2).map { case (v, es) => v -> es.map(e => hub(e._1)).sum }
        val amax = math.max(if (araw.isEmpty) 1L else araw.values.max, 1L)
        auth = nodes.map(v => v -> (1000000L * araw.getOrElse(v, 0L)) / amax).toMap
        val hraw = ed.groupBy(_._1).map { case (u, es) => u -> es.map(e => auth(e._2)).sum }
        val hmax = math.max(if (hraw.isEmpty) 1L else hraw.values.max, 1L)
        hub = nodes.map(v => v -> (1000000L * hraw.getOrElse(v, 0L)) / hmax).toMap
      }
      val got = Analytics.hits(triplesDf(rows: _*), iterations = 3).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == nodes.map(v => v -> ((auth(v), hub(v)))).toMap)
    }
  }

  test("coocLift: pair support never exceeds either side's document frequency") {
    val tokGen = org.scalacheck.Gen.oneOf("aaaa", "bbbb", "cccc", "dddd", "eeee")
    val docGen = org.scalacheck.Gen.nonEmptyListOf(tokGen).map(_.take(6).mkString(" "))
    val gen = org.scalacheck.Gen.nonEmptyListOf(docGen).map(_.take(8))
    new graft.GenSampling {}.forAllSamples(gen, n = 6) { texts =>
      val d = docsDf(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }: _*)
      val df = texts.zipWithIndex
        .flatMap { case (t, i) => t.split(" ").distinct.map(_ -> i) }
        .groupBy(_._1).map { case (e, xs) => e -> xs.size.toLong }
      val n = texts.size.toLong
      Analytics.coocLift(d, minSupport = 1L, dfCapPermille = 1000).collect().foreach { r =>
        val (a, b, pd, lift) = (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))
        assert(a < b, "pair not ordered")
        assert(pd <= math.min(df(a), df(b)), "support exceeds a side's df")
        assert(lift == (1000L * n * pd) / (df(a) * df(b)), "lift arithmetic")
      }
    }
  }

  test("score expressions survive webgraph-scale magnitudes (128-bit intermediates)") {
    // raw near Long.MaxValue: a plain 1e6 * raw Long multiply wraps
    // negative; the DECIMAL(38,0) widening must return the exact quotient
    val big = 9000000000000000000L
    val norm = Seq((big, big)).toDF("raw", "mx")
      .select(Analytics.hitsNormExpr.as("s")).collect()(0).getLong(0)
    assert(norm == 1000000L)
    val half = Seq((big / 2, big)).toDF("raw", "mx")
      .select(Analytics.hitsNormExpr.as("s")).collect()(0).getLong(0)
    assert(half == 500000L)
    // 1000 * N * pair_docs = 1e21 — past Long — exact quotient 1000
    val lift = Seq((10000000000L, 100000000L, 1000000000L, 1000000000L))
      .toDF("n_docs", "pair_docs", "df_a", "df_b")
      .select(Analytics.coocLiftExpr.as("l")).collect()(0).getLong(0)
    assert(lift == 1000L)
  }

  test("predicateProfile: exact cardinalities and integer fan-outs") {
    // p1: s1->o1, s1->o2, s2->o1  => 3 triples, 2 subj, 2 obj,
    // fanout 1500 milli, inv 1500; p2 functional: 1 triple, 1000/1000
    val tr = triplesDf(
      ("s1", "p1", "o1"), ("s1", "p1", "o2"), ("s2", "p1", "o1"),
      ("s3", "p2", "o3")
    )
    val got = Analytics.predicateProfile(tr).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == Set(
      ("p1", 3L, 2L, 2L, 1500L, 1500L),
      ("p2", 1L, 1L, 1L, 1000L, 1000L)
    ))
  }

  test("functionalConflicts: only multi-object (subject, predicate) pairs surface") {
    val tr = triplesDf(
      ("s1", "p1", "o1"), ("s1", "p1", "o2"), ("s1", "p1", "o2"), // dup obj counts once
      ("s2", "p1", "o1"), // functional — excluded
      ("s1", "p2", "o9") // functional — excluded
    )
    val got = Analytics.functionalConflicts(tr).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("s1", "p1", 2L)))
  }

  test("coocLift: df cap drops stopword-grade hubs before the pair join") {
    // "hubx" is in every doc (df 1000 permille): with the cap at 600 it
    // is excluded BEFORE pair generation, leaving only the bbbb/cccc
    // pair; uncapped, hubx pairs with everything it co-occurs with
    val d = docsDf(
      (1L, "hubx bbbb cccc"),
      (2L, "hubx bbbb cccc"),
      (3L, "hubx eeee"),
      (4L, "hubx ffff")
    )
    val capped = Analytics.coocLift(d, minSupport = 2L, dfCapPermille = 600).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(capped == Set(("bbbb", "cccc")))
    val uncapped = Analytics.coocLift(d, minSupport = 2L, dfCapPermille = 1000).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(uncapped == Set(("bbbb", "cccc"), ("bbbb", "hubx"), ("cccc", "hubx")))
  }

  test("corroboration: distinct doc/source support per valid triple") {
    // entities need >= MinEntityLen (4) chars; the short "bb"/"yy"
    // windows are valid as PREDICATES only
    val d = Seq(
      (1L, "aaaa bb cccc", "s1"),
      (2L, "aaaa bb cccc dd", "s1"), // trailing window has a short subject — invalid
      (3L, "aaaa bb cccc", "s2"),
      (4L, "xxxx yy zzzz xxxx yy zzzz", "s2") // repeated in ONE doc: corroborates once
    ).toDF("doc_id", "text", "source")
    val got = Analytics.corroboration(d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .toSet
    // doc 4's other windows have a short subject or object — invalid,
    // so its only valid triple is (xxxx, yy, zzzz), counted once
    assert(got == Set(
      ("aaaa", "bb", "cccc", 3L, 2L),
      ("xxxx", "yy", "zzzz", 1L, 1L)
    ))
  }

  test("provenance: exact support + first-5 sorted asserting doc ids") {
    // (aaaa, bb, cccc) asserted by 7 docs — the provenance string keeps
    // only the 5 smallest ids; support stays the exact count. Shard-
    // local min-K (ids spread over doc_id % 16 shards 1..7) must merge
    // to the same global min-5 the oracle's naive sorted slice yields.
    val d = (1L to 7L).map(i => (i, "aaaa bb cccc", "s1")) :+ ((8L, "xxxx yy zzzz", "s2"))
    val df = d.toDF("doc_id", "text", "source")
    val got = Analytics.provenance(df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3), r.getString(4)))
      .toSet
    assert(got == Set(
      ("aaaa", "bb", "cccc", 7L, "1,2,3,4,5"),
      ("xxxx", "yy", "zzzz", 1L, "8")
    ))
  }

  test("tripleHistory: first/last version, version count, latest survival") {
    // versions = doc_id % 4: (aaaa,bb,cccc) in docs 1,2,5 → versions
    // {1, 2} (5 % 4 = 1 collapses with doc 1), never in version 3;
    // (xxxx,yy,zzzz) in docs 3,7 → version 3 only — in the latest crawl
    val df = Seq(
      (1L, "aaaa bb cccc", "s1"),
      (2L, "aaaa bb cccc", "s1"),
      (5L, "aaaa bb cccc", "s1"),
      (3L, "xxxx yy zzzz", "s2"),
      (7L, "xxxx yy zzzz", "s2")
    ).toDF("doc_id", "text", "source")
    val got = Analytics.tripleHistory(df).collect()
      .map(r =>
        (r.getString(0), r.getString(1), r.getString(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSet
    assert(got == Set(
      ("aaaa", "bb", "cccc", 1L, 2L, 2L, 0L),
      ("xxxx", "yy", "zzzz", 3L, 3L, 1L, 1L)
    ))
  }

  test("entityHistory: per-entity version span; short tokens excluded") {
    // aaaa in docs 1 and 5 — both version 1 (5 % 4 = 1), so one version;
    // xxxx only in doc 3 — version 3, the latest crawl; bb is below
    // MinEntityLen and never becomes an entity
    val df = Seq(
      (1L, "aaaa bb cccc", "s1"),
      (5L, "aaaa", "s1"),
      (3L, "xxxx", "s2")
    ).toDF("doc_id", "text", "source")
    val got = Analytics.entityHistory(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == Set(
      ("aaaa", 1L, 1L, 1L, 0L),
      ("cccc", 1L, 1L, 1L, 0L),
      ("xxxx", 3L, 3L, 1L, 1L)
    ))
  }
}
