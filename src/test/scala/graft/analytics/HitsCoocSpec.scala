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
}
