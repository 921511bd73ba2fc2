package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import graft.{GenSampling, SparkTestBase}

class AnalyticsSpec extends AnyFunSuite with SparkTestBase with GenSampling {

  import spark.implicits._

  private def triplesDf(ts: (String, String, String)*) =
    ts.toDF("subject", "predicate", "obj")

  test("degrees: single-pass in/out/total") {
    val tr = triplesDf(("a", "r", "b"), ("a", "r", "c"), ("b", "q", "a"))
    val d = Analytics.degrees(tr).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(d == Set(("a", 2L, 1L, 3L), ("b", 1L, 1L, 2L), ("c", 0L, 1L, 1L)))
  }

  test("2-hop context: exactly edges within two hops of seed") {
    // path graph: a->b->c->d->e ; from seed a, 2-hop context = edges
    // incident to {a} plus edges incident to neighbors of a ({a,b}) =
    // (a b), (b c); NOT (c d) or (d e)
    val tr = triplesDf(("a", "r", "b"), ("b", "r", "c"), ("c", "r", "d"), ("d", "r", "e"))
    val ctx = Analytics.twoHopContext(tr, "a").as[String].collect().toSet
    assert(ctx == Set("a r b.", "b r c."))
  }

  test("2-hop context follows incoming edges too") {
    // reference BFS explores predecessors as well (kg_gen.py:398-402)
    val tr = triplesDf(("x", "r", "seed"), ("y", "r", "x"), ("z", "r", "y"))
    val ctx = Analytics.twoHopContext(tr, "seed").as[String].collect().toSet
    assert(ctx == Set("x r seed.", "y r x."))
  }

  test("collapsedEdges: parallel edges collapse deterministically") {
    val tr = triplesDf(("a", "zzz", "b"), ("a", "aaa", "b"), ("a", "r", "c"))
    val c = Analytics.collapsedEdges(tr).collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(c == Set(("a", "b", "aaa"), ("a", "c", "r")))
  }

  test("retrieveRelevantNodes ranks the query's own surface first") {
    val ents = Seq("streaming", "stream", "table", "zebra").toDF("entity")
    val top = Analytics.retrieveRelevantNodes(ents, "stream", 4).collect()
    assert(top.head.getString(0) == "stream") // exact match = cosine 1
    val scores = top.map(_.getLong(1))
    assert(scores.sorted.reverse.sameElements(scores), "descending scores")
    assert(top.map(_.getString(0)).contains("streaming"))
  }

  test("embedQuery matches the Column-side formula") {
    val ents = Seq("stream").toDF("entity")
    val fromDf = Analytics.nodeEmbeddings(ents).collect()
      .map(r => (r.getLong(1).toInt, r.getLong(2))).toMap
    assert(fromDf == Analytics.embedQuery("stream"))
  }

  test("substring retrieval caps deterministically") {
    val ents = (1 to 30).map(i => f"bar$i%02d").toDF("entity")
    val got = Analytics.substringEntities(ents, "AR", 10).as[String].collect()
    assert(got.length == 10 && got.head == "bar01" && got.last == "bar10")
  }

  test("retrieve composes seeds and contexts into one sorted string") {
    val ents = Seq("alpha", "beta", "gamma").toDF("entity")
    val tr = triplesDf(("alpha", "r", "beta"), ("beta", "r", "gamma"))
    val ctx = Analytics.retrieve(ents, tr, "alpha", 1).as[String].head()
    assert(ctx == "alpha r beta. beta r gamma.")
  }

  test("relationEmbeddings embeds distinct predicate surfaces like nodes") {
    val tr = triplesDf(("a", "stream", "b"), ("c", "stream", "d"), ("a", "xy", "b"))
    val rel = Analytics.relationEmbeddings(tr).collect()
      .map(r => (r.getString(0), r.getLong(1).toInt, r.getLong(2)))
    // 'xy' is shorter than a trigram -> no rows; 'stream' matches the
    // node-embedding rule exactly
    assert(rel.forall(_._1 == "stream"))
    val asMap = rel.map { case (_, d, c) => d -> c }.toMap
    assert(asMap == Analytics.embedQuery("stream"))
  }

  test("vizModel assembles degrees, components, color and top flag per entity") {
    val ents = Seq("a", "b", "c", "iso").toDF("entity")
    val tr = triplesDf(("a", "r", "b"), ("a", "r", "c"))
    val rows = Analytics.vizModel(ents, tr).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getLong(5), r.getString(6))))
      .toMap
    assert(rows.keySet == Set("a", "b", "c", "iso"))
    assert(rows("a")._1 == 2 && rows("a")._3 == 2) // out_degree, degree
    assert(rows("iso") == ((0L, 0L, 0L, "iso", 0L, rows("iso")._6))) // isolated: own component
    assert(rows("b")._4 == "a" && rows("c")._4 == "a") // min-label component
    assert(rows.values.forall(v => v._6.matches("#[0-9a-f]{6}")))
    // only 3 connected entities -> all of them are top-10, iso has degree 0
    assert(rows("a")._5 == 1 && rows("iso")._5 == 0)
  }

  test("pageRank matches the hand-computed integer fixed point") {
    // a<->b cycle plus c->a; outdeg(a)=outdeg(b)=outdeg(c)=1
    val tr = triplesDf(("a", "r", "b"), ("b", "r", "a"), ("c", "r", "a"))
    // iter1: contrib(a)=r(b)+r(c)=2e6 -> 150000+850*2e6/1000=1850000
    //        contrib(b)=r(a)=1e6     -> 1000000 ; c: no in-edges -> 150000
    // iter2: contrib(a)=1000000+150000 -> 150000+977500=1127500
    //        contrib(b)=1850000        -> 150000+1572500=1722500
    val r = Analytics.pageRank(tr, 2).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("a" -> 1127500L, "b" -> 1722500L, "c" -> 150000L))
  }

  test("pageRank: rank of an isolated-in node is the base term") {
    val tr = triplesDf(("a", "r", "b"))
    val r = Analytics.pageRank(tr, 5).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("a") == 150000L) // no in-edges after iter 1
  }

  test("personalizedPageRank seeds teleport mass only at matching nodes") {
    // chain ar1 -> b -> c; seed substring "ar" matches only ar1
    // r0: ar1=1e6, b=0, c=0 ; outdeg all 1
    // iter1: contrib(b)=1e6 -> r(b)=0+850000; contrib(c)=0 -> 0; ar1: base 150000
    // iter2: contrib(b)=r(ar1)=150000 -> 127500; contrib(c)=r(b)=850000 -> 722500
    //        ar1 -> 150000
    val tr = triplesDf(("ar1", "r", "b"), ("b", "r", "c"))
    val r = Analytics.personalizedPageRank(tr, "ar", 2).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("ar1" -> 150000L, "b" -> 127500L, "c" -> 722500L))
  }

  test("personalizedPageRank with no matching seed is all zeros") {
    val tr = triplesDf(("a", "r", "b"))
    val r = Analytics.personalizedPageRank(tr, "zz", 3).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("a" -> 0L, "b" -> 0L))
  }

  test("triangleCounts credits each triangle to all three corners") {
    // triangle a-b-c plus pendant c-d: a,b,c get 1, d gets 0
    val tr = triplesDf(("a", "r", "b"), ("b", "r", "c"), ("c", "r", "a"), ("c", "r", "d"))
    val got = Analytics.triangleCounts(tr).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(got == Map("a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 0L))
  }

  test("triangleCounts: K4 has 4 triangles, 3 per corner; direction-insensitive") {
    // complete graph on 4 nodes, edges in mixed directions and duplicated
    val es = Seq("a" -> "b", "c" -> "a", "a" -> "d", "b" -> "c", "d" -> "b", "c" -> "d", "b" -> "a")
    val tr = triplesDf(es.map { case (s, o) => (s, "r", o) }: _*)
    val got = Analytics.triangleCounts(tr).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(got == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
  }

  test("clusteringCoefficient: permille closure per node, pendant gets 0") {
    // triangle a-b-c plus pendant c-d: a,b close fully (2·1/(2·1)=1000);
    // c has degree 3, one triangle -> 2000/(3·2)=333; d degree 1 -> 0
    val tr = triplesDf(("a", "r", "b"), ("b", "r", "c"), ("c", "r", "a"), ("c", "r", "d"))
    val got = Analytics.clusteringCoefficient(tr).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(got == Map(
      "a" -> ((2L, 1L, 1000L)),
      "b" -> ((2L, 1L, 1000L)),
      "c" -> ((3L, 1L, 333L)),
      "d" -> ((1L, 0L, 0L))
    ))
  }

  test("clusteringCoefficient: K4 is fully closed everywhere") {
    val k4 = Seq("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c", "b" -> "d", "c" -> "d")
    val tr = triplesDf(k4.map { case (s, o) => (s, "r", o) }: _*)
    val got = Analytics.clusteringCoefficient(tr).collect()
    assert(got.length == 4 && got.forall(r => r.getLong(3) == 1000L))
  }

  test("transitiveClosure: min hops along a chain, depth-capped") {
    // chain a->b->c->d->e->f on the dominant predicate; maxHops 4 means
    // (a,f) at distance 5 is NOT emitted; a shortcut a->c keeps min hops
    val chain = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e", "e" -> "f")
    val tr = triplesDf((chain.map { case (s, o) => (s, "p", o) } :+ (("a", "p", "c"))): _*)
    val got = Analytics.transitiveClosure(tr, maxHops = 4).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got(("a", "b")) == 1L && got(("a", "c")) == 1L)
    assert(got(("a", "d")) == 2L && got(("a", "e")) == 3L && got(("a", "f")) == 4L)
    assert(got(("b", "f")) == 4L && !got.contains(("f", "a")))
  }

  test("transitiveClosure: follows only the most frequent predicate, drops self-pairs") {
    // p wins the frequency vote (2 vs 1); the q edge must not bridge;
    // the p-cycle a->b->a produces (a,b) and (b,a) but no (a,a)/(b,b)
    val tr = triplesDf(("a", "p", "b"), ("b", "p", "a"), ("b", "q", "z"))
    val got = Analytics.transitiveClosure(tr).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("a", "b") -> 1L, ("b", "a") -> 1L))
  }

  test("degreeMixing: log2 buckets over the star-plus-edge graph") {
    // hub h -> x1..x4 (out-degree 4 -> bucket 2, each xi in-degree 1 ->
    // bucket 0); plus x1 -> x2 (out 1 -> bucket 0, x2 in-degree 2 -> bucket 1)
    val es = (1 to 4).map(i => ("h", "r", s"x$i")) :+ (("x1", "r", "x2"))
    val tr = triplesDf(es: _*)
    val got = Analytics.degreeMixing(tr).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((2L, 0L) -> 3L, (2L, 1L) -> 1L, (0L, 1L) -> 1L))
  }

  test("kCore: 3-core of K4 plus pendant chain is exactly the K4") {
    val k4 = Seq("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c", "b" -> "d", "c" -> "d")
    val chain = Seq("d" -> "e", "e" -> "f")
    val tr = triplesDf((k4 ++ chain).map { case (s, o) => (s, "r", o) }: _*)
    val got = Analytics.kCore(tr, k = 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L))
  }

  test("kCore: peeling cascades — a path has no 2-core, a cycle is its own 2-core") {
    val path = triplesDf(("a", "r", "b"), ("b", "r", "c"), ("c", "r", "d"))
    assert(Analytics.kCore(path, k = 2).count() == 0L)
    val cycle = triplesDf(("a", "r", "b"), ("b", "r", "c"), ("c", "r", "a"))
    val got = Analytics.kCore(cycle, k = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
  }

  test("kCore matches brute-force peeling on a pseudo-random graph") {
    // sparse pseudo-random part (mostly peels) + a K5 anchored into it
    // (survives) so the fixpoint is neither empty nor the whole graph
    val k5 = for { i <- 0 until 5; j <- i + 1 until 5 } yield (s"c$i", s"c$j")
    val es = (0 until 220).map(i => (s"n${i % 41}", s"n${(i * 17 + 3) % 41}")) ++
      k5 ++ Seq(("c0", "n0"), ("c1", "n1"))
    val tr = triplesDf(es.map { case (s, o) => (s, "r", o) }: _*)
    val got = Analytics.kCore(tr, k = 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // driver-side reference peeling over the same undirected simple graph
    var edges = es.filter { case (s, o) => s != o }
      .flatMap { case (s, o) => Seq((s, o), (o, s)) }.distinct.toSet
    var done = false
    while (!done) {
      val deg = edges.groupBy(_._1).view.mapValues(_.size).toMap
      val bad = deg.filter(_._2 < 3).keySet
      if (bad.isEmpty) done = true
      else edges = edges.filter { case (v, u) => !bad(v) && !bad(u) }
    }
    val want = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(got == want)
    assert(want.nonEmpty, "fixture degenerate: empty 3-core exercises nothing")
  }

  test("harmonicCentrality: exact micro sums on a path, components stay isolated") {
    // all 6 nodes become seeds (nSeeds > |V|) -> exact harmonic centrality
    val tr = triplesDf(("a", "r", "b"), ("b", "r", "c"), ("c", "r", "d"), ("e", "r", "f"))
    val got = Analytics.harmonicCentrality(tr, nSeeds = 10).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      "a" -> ((3L, 1833333L)), // 1/1 + 1/2 + 1/3 in micro
      "b" -> ((3L, 2500000L)), // 1 + 1 + 1/2
      "c" -> ((3L, 2500000L)),
      "d" -> ((3L, 1833333L)),
      "e" -> ((1L, 1000000L)), // other component never credited
      "f" -> ((1L, 1000000L))
    ))
  }

  test("harmonicCentrality: single deterministic seed — BFS distances, seed excluded") {
    val tr = triplesDf(("a", "r", "b"), ("b", "r", "c"), ("c", "r", "a"))
    val r1 = Analytics.harmonicCentrality(tr, nSeeds = 1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val r2 = Analytics.harmonicCentrality(tr, nSeeds = 1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(r1 == r2)
    assert(r1.size == 2, r1.toString) // the two non-seed corners
    assert(r1.forall { case (_, n, h) => n == 1L && h == 1000000L })
  }

  test("randomWalks: deterministic, correct length, edges only") {
    val tr = triplesDf(("a", "r", "b"), ("b", "r", "c"), ("c", "r", "a"))
    val w1 = Analytics.randomWalks(tr, 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val w2 = Analytics.randomWalks(tr, 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(w1 == w2) // bit-identical across runs
    // one row per (start, step): 3 starts x 4 steps (0..3)
    assert(w1.size == 12 || {
      // sets collapse equal (start, node, step) rows; count via collect
      Analytics.randomWalks(tr, 3).count() == 12
    })
    // every consecutive hop is a real undirected edge
    val und = Set("a" -> "b", "b" -> "a", "b" -> "c", "c" -> "b", "c" -> "a", "a" -> "c")
    val byWalk = Analytics.randomWalks(tr, 3).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getString(1)))
      .groupBy(_._1)
    byWalk.values.foreach { rows =>
      val path = rows.sortBy(_._2).map(_._3)
      path.sliding(2).foreach { case Array(x, y) => assert(und.contains(x -> y)) }
    }
  }

  test("randomWalks: isolated self-loop-only node never starts a walk") {
    val tr = triplesDf(("a", "r", "b"), ("x", "r", "x"))
    val starts = Analytics.randomWalks(tr, 2).collect().map(_.getString(0)).toSet
    assert(starts == Set("a", "b"))
  }

  test("walkCooccurrence is symmetric with the exact corpus pair total") {
    val tr = triplesDf(("a", "r", "b"), ("b", "r", "c"), ("c", "r", "a"))
    val rows = Analytics.walkCooccurrence(tr, steps = 4, window = 2).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // the join condition is symmetric in (center, context)
    rows.foreach { case ((n, c), cnt) => assert(rows((c, n)) == cnt) }
    // 3 walks x per-position context counts (2,3,4,3,2) = 42 total pairs
    assert(rows.values.sum == 42L)
  }

  test("tfidfKeywords ranks rare tokens above corpus-wide ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha alpha common", "en", "s1", 0L),
      (2L, "beta common common", "en", "s1", 0L),
      (3L, "gamma common delta", "en", "s1", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.ops.TextAnalysis.tfidfKeywords(docs, k = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // doc 1: alpha tf=2 df=1 -> 6000; common tf=1 df=3 -> 1000
    assert(got.filter(_._1 == 1L).sortBy(_._4).map(x => (x._2, x._3)).toSeq ==
      Seq(("alpha", 6000L), ("common", 1000L)))
    // doc 3: gamma/delta tf=1 df=1 -> 3000 each; tie breaks on token
    assert(got.filter(_._1 == 3L).sortBy(_._4).map(_._2).toSeq == Seq("delta", "gamma"))
  }

  test("linkPredict: non-adjacent pairs with common neighbors, exact jaccard") {
    // star x->{a,b,c} plus a->b; undirected neighborhoods:
    // nb(a)={x,b}, nb(b)={x,a}, nb(c)={x}, nb(x)={a,b,c}
    // surviving non-adjacent pairs: (a,c) and (b,c), common={x},
    // jaccard = 1000*1 div (2+1-1) = 500
    val tr = triplesDf(("x", "r", "a"), ("x", "r", "b"), ("x", "r", "c"), ("a", "r", "b"))
    val got = Analytics.linkPredict(tr).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(("a", "c", 1L, 500L), ("b", "c", 1L, 500L)))
  }

  test("linkPredict: wedge cap drops hub centers") {
    // cap 2 removes x (undirected degree 3) as a wedge center; remaining
    // centers a and b only produce pairs that are already adjacent
    val tr = triplesDf(("x", "r", "a"), ("x", "r", "b"), ("x", "r", "c"), ("a", "r", "b"))
    assert(Analytics.linkPredict(tr, maxWedgeDegree = 2L).isEmpty)
  }

  test("negativeSamples: properties hold on random graphs (seeded sampling)") {
    // random sparse graphs over a small alphabet: valid negatives only,
    // deterministic, and every emitted (s, p, o) is a real triple
    val gen = for {
      n <- org.scalacheck.Gen.choose(3, 30)
      tr <- org.scalacheck.Gen.listOfN(
        n,
        for {
          s <- org.scalacheck.Gen.oneOf("n1", "n2", "n3", "n4", "n5", "n6")
          p <- org.scalacheck.Gen.oneOf("p1", "p2")
          o <- org.scalacheck.Gen.oneOf("n1", "n2", "n3", "n4", "n5", "n6")
        } yield (s, p, o)
      )
    } yield tr.distinct
    new graft.GenSampling {}.forAllSamples(gen, n = 12) { rows =>
      val tr = triplesDf(rows: _*)
      val got = Analytics.negativeSamples(tr).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      val real = rows.toSet
      got.foreach { case (s, p, o, ng) =>
        assert(real.contains((s, p, o)), "emitted a non-input triple")
        assert(ng != o, "self negative")
        assert(!real.contains((s, p, ng)), "corruption exists in the graph")
      }
      val again = Analytics.negativeSamples(tr).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      assert(got.sorted.sameElements(again.sorted), "nondeterministic")
    }
  }

  test("labelPropagation: two triangles + bridge converge to two communities") {
    // triangle {a,b,c}, triangle {d,e,f}, bridge c-d; sync LPA with
    // min-tie — hand-unrolled 4 rounds: {a,b,c} -> a, {d,e,f} -> c
    val tr = triplesDf(
      ("a", "r", "b"), ("b", "r", "c"), ("c", "r", "a"),
      ("d", "r", "e"), ("e", "r", "f"), ("f", "r", "d"),
      ("c", "r", "d")
    )
    val got = Analytics.labelPropagation(tr, iterations = 4).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "c", "e" -> "c", "f" -> "c"))
  }

  test("labelPropagation: round 1 is the min-neighbor label (tie rule)") {
    // path x-y-z: after 1 round every node holds its min neighbor
    val tr = triplesDf(("x", "r", "y"), ("y", "r", "z"))
    val got = Analytics.labelPropagation(tr, iterations = 1).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("x" -> "y", "y" -> "x", "z" -> "y"))
  }

  test("communityStats: sizes, internal edges, and shared cross edge") {
    // two triangles bridged by c-d; communities {a,b,c}->a, {d,e,f}->c
    // (hand-unrolled above); each triangle has 3 internal edges, the
    // bridge counts once for EACH side
    val tr = triplesDf(
      ("a", "r", "b"), ("b", "r", "c"), ("c", "r", "a"),
      ("d", "r", "e"), ("e", "r", "f"), ("f", "r", "d"),
      ("c", "r", "d")
    )
    val got = Analytics.communityStats(tr, iterations = 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(("a", 3L, 3L, 1L), ("c", 3L, 3L, 1L)))
  }

  test("negativeSamples: exact replay of the seeded window rule, filtered") {
    // sparse bipartite 'likes' graph (skip (i+j)%3==0 pairs so real
    // triples exist for the anti-join to catch) + one singleton relation
    val likes = for {
      i <- 0 until 8; j <- 0 until 5 if (i + j) % 3 != 0
    } yield (s"s$i", "likes", s"o$j")
    val rows = likes :+ (("x", "knows", "y"))
    val tr = triplesDf(rows: _*)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // independent replay: group by (predicate, first md5 hex char),
    // sort by (h, subject, obj), pair with the next row wrapping to the
    // first, drop self-negatives and corruptions that exist in the graph
    val expected = rows
      .groupBy(t => (t._2, md5hex(t._1 + "|" + t._3).substring(0, 1)))
      .values
      .flatMap { grp =>
        val sorted = grp.sortBy(t => (md5hex(t._1 + "|" + t._3), t._1, t._3))
        sorted.zipWithIndex.map { case ((s, p, o), i) =>
          (s, p, o, sorted((i + 1) % sorted.size)._3)
        }
      }
      .filter { case (s, p, o, n) => n != o && !rows.contains((s, p, n)) }
      .toSet
    val got = Analytics.negativeSamples(tr).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    assert(got == expected)
    assert(got.nonEmpty, "fixture produced no negatives — weak test")
    // no emitted negative is a real triple, none equals its own object
    assert(got.forall { case (s, p, o, n) => n != o && !rows.contains((s, p, n)) })
    // the singleton relation can only wrap to itself — never emitted
    assert(got.forall(_._2 == "likes"))
  }

  test("bfsDistances: single-seed shortest distances, undirected, round-capped") {
    // path a-b-c-d-e plus a shortcut a-c: dist(c)=1 via the shortcut,
    // not 2 via b; seed = md5-first endpoint
    val tr = triplesDf(
      ("a", "r", "b"), ("b", "r", "c"), ("c", "r", "d"), ("d", "r", "e"), ("a", "q", "c"))
    val nodes = Seq("a", "b", "c", "d", "e")
    val seed = nodes.minBy(n => (java.security.MessageDigest.getInstance("MD5")
      .digest(n.getBytes("UTF-8")).map("%02x".format(_)).mkString, n))
    val got = Analytics.bfsDistances(tr, nSeeds = 1, maxRounds = 8).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.forall(_._1 == seed))
    val dist = got.map(t => t._2 -> t._3).toMap
    assert(dist(seed) == 0L)
    // verify against a driver-side BFS over the same undirected edges
    val adj = Seq("ab", "bc", "cd", "de", "ac")
      .flatMap(e => Seq(e(0).toString -> e(1).toString, e(1).toString -> e(0).toString))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var expect = Map(seed -> 0L)
    var frontier = Seq(seed)
    var d = 0L
    while (frontier.nonEmpty) {
      d += 1L
      val next = frontier.flatMap(adj.getOrElse(_, Nil)).distinct.filterNot(expect.contains)
      next.foreach(n => expect += n -> d)
      frontier = next
    }
    assert(dist == expect)
  }

  test("graphDiff: added/removed classified, unchanged dropped") {
    val oldT = triplesDf(("a", "r", "b"), ("b", "r", "c"), ("c", "r", "d"))
    val newT = triplesDf(("a", "r", "b"), ("c", "r", "d"), ("d", "r", "e"), ("e", "q", "a"))
    val got = GraphDiff.triples(oldT, newT).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    assert(got == Set(
      ("b", "r", "c", "removed"),
      ("d", "r", "e", "added"),
      ("e", "q", "a", "added")
    ))
  }

  test("graphDiff: identical snapshots yield an empty delta") {
    val t = triplesDf(("a", "r", "b"), ("b", "r", "c"))
    assert(GraphDiff.triples(t, t).count() == 0)
  }

  test("degreeDistribution: exact (degree, count) table") {
    // a: out 2 + in 1 = 3; b: 1+1 = 2; c: 0+1 = 1
    val tr = triplesDf(("a", "r", "b"), ("a", "r", "c"), ("b", "q", "a"))
    val got = Analytics.degreeDistribution(tr).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((3L, 1L), (2L, 1L), (1L, 1L)))
  }

  test("reciprocity: same-predicate reverse edges only, self-loops excluded") {
    val tr = triplesDf(
      ("a", "p1", "b"), ("b", "p1", "a"), ("a", "p1", "c"), // 2 of 3 reciprocated
      ("x", "p2", "x"), // self-loop only: predicate drops out entirely
      ("a", "p3", "b"), ("b", "p4", "a") // reverse exists under ANOTHER predicate: not reciprocal
    )
    val got = Analytics.reciprocity(tr).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      ("p1", 3L, 2L, 666L),
      ("p3", 1L, 0L, 0L),
      ("p4", 1L, 0L, 0L)
    ))
  }

  test("ruleSupport: path/pair/closure counts with reflexive exclusion") {
    val tr = triplesDf(("a", "p", "b"), ("b", "q", "c"), ("a", "r", "c"), ("c", "q", "a"))
    // paths: p∘q a→b→c (closed by the direct a-r-c edge), q∘q b→c→a,
    // q∘p c→a→b; r∘q a→c→a and q∘r c→a→c are reflexive — excluded
    val got = Analytics.ruleSupport(tr).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == Set(
      ("p", "q", 1L, 1L, 1L, 1000L),
      ("q", "q", 1L, 1L, 0L, 0L),
      ("q", "p", 1L, 1L, 0L, 0L)
    ))
  }

  test("ruleSupport: path multiplicity vs distinct pairs; hub-mid fanout cap") {
    val tr = triplesDf(
      ("a", "p", "m"), ("a2", "p", "m"), ("m", "q", "z1"), ("m", "q", "z2"),
      ("a", "p", "m2"), ("m2", "q", "z1")
    )
    // (a,z1) reached via BOTH mids: 5 paths over 4 distinct pairs
    val got = Analytics.ruleSupport(tr).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == Set(("p", "q", 5L, 4L, 0L)))
    // cap 3 drops mid m (in 2 × out 2 = 4 > 3); m2 (1×1) survives
    val capped = Analytics.ruleSupport(tr, midFanoutCap = 3L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(capped == Set(("p", "q", 1L, 1L)))
  }

  test("sameAsCandidates: shared-context pairs, jaccard, and the context cap") {
    val tr = triplesDf(
      ("x", "p", "c"), ("x", "q", "d"),
      ("y", "p", "c"), ("y", "q", "d"), // x,y share both subject contexts
      ("z", "p", "c"), // z shares only (s,p,c) with x,y — below minShared
      ("u", "r", "m"), ("u", "t", "m2"),
      ("v", "r", "m"), ("v", "t", "m2") // u,v share two 2-entity contexts
    )
    val got = Analytics.sameAsCandidates(tr).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == Set(
      ("x", "y", 2L, 2L, 2L, 1000L),
      ("u", "v", 2L, 2L, 2L, 1000L)
    ))
    // cap 2 drops (s,p,c) — shared by x,y,z — so the (x,y) pair falls
    // below minShared; (u,v)'s contexts are 2-entity and survive intact
    val capped = Analytics.sameAsCandidates(tr, ctxCap = 2L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet
    assert(capped == Set(("u", "v", 2L, 2L, 2L, 1000L)))
  }

  test("entityTypes: signature grouping over sorted role:predicate profiles") {
    val tr = triplesDf(
      ("a", "p", "c"), ("a", "q", "d"),
      ("b", "p", "e"), ("b", "q", "f"), // a,b: identical {s:p, s:q} profile
      ("d", "r", "g") // d gains a subject role on top of o:q — splits from f
    )
    val rows = Analytics.entityTypes(tr).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // grouping: {a,b} {c,e} {d} {f} {g}
    assert(rows("a")._1 == rows("b")._1)
    assert(rows("c")._1 == rows("e")._1)
    assert(Set(rows("a")._1, rows("c")._1, rows("d")._1, rows("f")._1, rows("g")._1).size == 5)
    assert(rows("a") == (rows("a")._1, 2L, 2L))
    assert(rows("c") == (rows("c")._1, 1L, 2L))
    assert(rows("d") == (rows("d")._1, 2L, 1L))
    assert(rows("f") == (rows("f")._1, 1L, 1L))
    assert(rows("g") == (rows("g")._1, 1L, 1L))
  }

  test("predicateSynonyms: shared endpoint pairs with edge-set jaccard") {
    val tr = triplesDf(
      ("a", "p", "b"), ("a", "q", "b"),
      ("c", "p", "d"), ("c", "q", "d"), // p,q share (a,b) and (c,d)
      ("e", "p", "f"), // p-only edge dilutes the jaccard
      ("a", "r", "b") // r shares one pair with p and q — below minShared
    )
    val got = Analytics.predicateSynonyms(tr).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet
    // jaccard = 1000*2 div (3 + 2 - 2) = 666
    assert(got == Set(("p", "q", 2L, 3L, 2L, 666L)))
  }

  test("motifCensus: one of each motif, parallel predicates collapse") {
    val tr = triplesDf(
      ("a", "r", "b"), ("b", "r", "c"), ("a", "r", "c"), // ffl
      ("a", "q", "b"), // parallel predicate — same distinct edge
      ("d", "r", "e"), ("e", "r", "d"), // reciprocal dyad
      ("f", "r", "g"), ("g", "r", "h"), ("h", "r", "f") // 3-cycle, once
    )
    val got = Analytics.motifCensus(tr).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("recip" -> 1L, "ffl" -> 1L, "cycle" -> 1L))
  }

  test("motifCensus: midFanoutCap drops hub-mid wedges only") {
    val tr = triplesDf(
      ("a", "r", "b"), ("b", "r", "c"), ("a", "r", "c"), // mid b: 1·1 = 1
      ("x1", "r", "m"), ("x2", "r", "m"), // hub mid m: in 2 · out 2 = 4
      ("m", "r", "y1"), ("m", "r", "y2"),
      ("x1", "r", "y1") // shortcut → ffl through m
    )
    val off = Analytics.motifCensus(tr).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(off("ffl") == 2L)
    val capped = Analytics.motifCensus(tr, midFanoutCap = 3L).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(capped("ffl") == 1L) // the b-mid FFL survives, the m-mid one is capped away
  }

  test("condenseGraph: quotient counts match the LPA partition exactly") {
    val edges = Seq(
      ("a1", "a2"), ("a2", "a3"), ("a3", "a1"),
      ("b1", "b2"), ("b2", "b3"), ("b3", "b1"),
      ("a2", "b1"), ("b2", "a1"),
      ("a2", "b1"), // duplicate edge — must not double count
      // isolated pair: sync LPA's 2-node oscillation lands them in
      // DIFFERENT communities after an even round count, guaranteeing
      // at least one cross-community edge in the fixture
      ("c1", "c2")
    )
    val tr = triplesDf(edges.map { case (s, o) => (s, "r", o) }: _*)
    val labels = Analytics.labelPropagation(tr, iterations = 4).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    // recompute the quotient from the labels over the distinct edge set
    // (intra-community edges land on the supernode self-loop)
    val expected = edges.distinct
      .map { case (s, o) => (labels(s), labels(o)) }
      .groupBy(identity)
      .map { case (k, v) => (k._1, k._2, v.size.toLong) }
      .toSet
    val got = Analytics.condenseGraph(tr, iterations = 4).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // fixture sanity: the quotient must have both a cross edge and a self-loop
    assert(expected.exists { case (a, b, _) => a != b })
    assert(expected.exists { case (a, b, _) => a == b })
    assert(got == expected)
  }

  test("seedEccentricity: per-seed max/count/sum over BFS distances") {
    // path a-b-c-d; all four nodes become seeds (nSeeds covers them)
    val tr = triplesDf(("a", "r", "b"), ("b", "r", "c"), ("c", "r", "d"))
    val got = Analytics.seedEccentricity(tr, nSeeds = 8).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // ends see (1,2,3): ecc 3, sum 6; middles see (1,1,2): ecc 2, sum 4
    assert(got == Set(
      ("a", 3L, 3L, 6L), ("d", 3L, 3L, 6L),
      ("b", 2L, 3L, 4L), ("c", 2L, 3L, 4L)
    ))
  }

  test("graphDiff plan shape: one exchange, no join operator") {
    val oldT = triplesDf(("a", "r", "b"))
    val newT = triplesDf(("a", "r", "b"), ("b", "r", "c"))
    val plan = GraphDiff.triples(oldT, newT).queryExecution.executedPlan.toString
    // the delta is a union + single groupBy, never an anti-join pair:
    // exactly one shuffle of the tagged triple stream
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("predicateChurn: side membership off the tag-and-sum, two exchanges") {
    val oldT = triplesDf(("a", "r", "b"), ("a", "r", "c"), ("a", "q", "b"))
    val newT = triplesDf(("a", "r", "b"), ("a", "r", "d"), ("a", "q", "b"))
    val df = GraphDiff.predicateChurn(oldT, newT)
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet
    // r: 2 old, 2 new, 1 added (a,r,d), 1 removed (a,r,c) → 500‰;
    // q: untouched → 0‰
    assert(got == Set(("r", 2L, 2L, 1L, 1L, 500L), ("q", 1L, 1L, 0L, 0L, 0L)))
    // after execution the AQE plan prints final AND initial trees —
    // count shuffles in the final section only
    val plan = df.queryExecution.executedPlan.toString
    val finalPlan = plan.indexOf("Initial Plan") match {
      case -1 => plan
      case i  => plan.substring(0, i)
    }
    assert("Exchange hashpartitioning".r.findAllIn(finalPlan).size == 2, finalPlan)
    assert(!finalPlan.contains("Join"), finalPlan)
  }

  test("graphDiff: duplicate rows on one side never flip the classification") {
    // (a,r,b) appears TWICE in old and not at all in new: under the old
    // (net, cnt) read it had net=-2, cnt=2 and was misread as present on
    // both sides; per-side presence counts classify it as removed
    val oldT = triplesDf(("a", "r", "b"), ("a", "r", "b"), ("a", "r", "c"))
    val newT = triplesDf(("a", "r", "c"), ("a", "r", "d"))
    val got = GraphDiff.triples(oldT, newT).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    assert(got == Set(("a", "r", "b", "removed"), ("a", "r", "d", "added")))
    val churn = GraphDiff.predicateChurn(oldT, newT).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    // r: 2 distinct old, 2 distinct new, 1 added, 1 removed
    assert(churn == Set(("r", 2L, 2L, 1L, 1L)))
  }

  test("modularity: edge-free graph yields a zero row, not NULLs") {
    // all-self-loop triples → zero edges after the a =!= b filter; the
    // community aggregate runs over zero rows and must coalesce to zeros
    val tr = triplesDf(("a", "r", "a"), ("b", "q", "b"))
    val row = Analytics.modularity(tr, iterations = 2).collect().head
    assert(row.getLong(0) == 0L, "n_edges")
    assert(row.getLong(1) == 0L, "n_communities")
    assert(row.getLong(2) == 0L, "n_internal")
    assert(row.getLong(3) == 0L, "q_permille")
  }

  test("transitivity: triangle+pendant closes 3 of 5 wedges") {
    // triangle a-b-c plus pendant c-d: 1 triangle, wedges = Σd(d−1)/2
    // = (2+2+6+0)/2 = 5 → 3000·1 div 5 = 600 permille
    val tr = triplesDf(("a", "r", "b"), ("b", "r", "c"), ("c", "r", "a"), ("c", "r", "d"))
    val got = Analytics.transitivity(tr).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 5L, 600L)))
  }

  test("transitivity: star graph has wedges but zero closure") {
    val tr = triplesDf(("hub", "r", "x"), ("hub", "r", "y"), ("hub", "r", "z"))
    val got = Analytics.transitivity(tr).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((0L, 3L, 0L)))
  }

  test("predicateGini: skewed counts score 250, uniform scores 0") {
    val skew = triplesDf(("a", "q", "b"), ("a", "r", "b"), ("a", "r", "c"), ("b", "r", "c"))
    // counts q=1, r=3: G = (2·(1+6) − 3·4)·1000 / (2·4) = 250
    val g1 = Analytics.predicateGini(skew).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(g1.toSeq == Seq((2L, 4L, 250L)))
    val even = triplesDf(("a", "q", "b"), ("c", "q", "d"), ("a", "r", "b"), ("c", "r", "d"))
    val g2 = Analytics.predicateGini(even).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(g2.toSeq == Seq((2L, 4L, 0L)))
  }

  test("reachCurve: per-seed shell sizes and cumulative reach on a path") {
    val tr = triplesDf(("a", "r", "b"), ("b", "r", "c"), ("c", "r", "d"))
    val got = Analytics.reachCurve(tr).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      ("a", 1L, 1L, 1L), ("a", 2L, 1L, 2L), ("a", 3L, 1L, 3L),
      ("d", 1L, 1L, 1L), ("d", 2L, 1L, 2L), ("d", 3L, 1L, 3L),
      ("b", 1L, 2L, 2L), ("b", 2L, 1L, 3L),
      ("c", 1L, 2L, 2L), ("c", 2L, 1L, 3L)
    ))
  }

  test("betweenness: path graph accumulates chain dependencies") {
    // path a–b–c–d, all 4 nodes are seeds. Per endpoint seed the two
    // interior nodes take δ = 2000 / 1000; per interior seed the other
    // interior takes 1000. Totals: interior 4000, endpoints 0.
    val tr = triplesDf(("a", "r", "b"), ("b", "r", "c"), ("c", "r", "d"))
    val got = Analytics.betweenness(tr).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 0L), ("b", 4000L), ("c", 4000L), ("d", 0L)))
  }

  test("betweenness: 4-cycle splits sigma across the two shortest paths") {
    // diamond a–b–d–c–a: every opposite pair has TWO shortest paths, so
    // each mid node takes (1·(1000+0)) div 2 = 500 per traversal;
    // by symmetry every node totals 1000
    val tr = triplesDf(("a", "r", "b"), ("a", "r", "c"), ("b", "r", "d"), ("c", "r", "d"))
    val got = Analytics.betweenness(tr).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 1000L), ("b", 1000L), ("c", 1000L), ("d", 1000L)))
  }

  test("betweenness: matches an in-memory Brandes with the same integer rule") {
    // seeded random graphs, every node a seed (≤ 8 nodes, nSeeds = 8):
    // the Spark dataflow must replay the reference algorithm exactly —
    // shells, sigma sums, and the per-edge floor-divided delta rule
    import org.scalacheck.Gen
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def reference(edges: Set[(String, String)]): Map[String, Long] = {
      val adj = (edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) })
        .groupBy(_._1).map { case (v, ps) => v -> ps.map(_._2).toSet }
      val nodes = adj.keySet
      val seeds = nodes.toSeq.sortBy(v => (md5hex(v), v)).take(8)
      val bc = scala.collection.mutable.Map.empty[String, BigInt]
      val universe = scala.collection.mutable.Set.empty[String]
      for (s <- seeds) {
        val dist = scala.collection.mutable.Map(s -> 0)
        val sigma = scala.collection.mutable.Map(s -> BigInt(1))
        val shells = scala.collection.mutable.ArrayBuffer(Seq(s))
        var frontier = Seq(s)
        var d = 0
        while (frontier.nonEmpty && d < 8) {
          val nxt = scala.collection.mutable.Map.empty[String, BigInt]
          for (v <- frontier; u <- adj(v) if !dist.contains(u))
            nxt(u) = nxt.getOrElse(u, BigInt(0)) + sigma(v)
          val nf = nxt.keys.toSeq.sorted
          nf.foreach { u => dist(u) = d + 1; sigma(u) = nxt(u) }
          frontier = nf
          if (nf.nonEmpty) shells += nf
          d += 1
        }
        val delta = scala.collection.mutable.Map.empty[String, BigInt]
        for (k <- (shells.length - 2) to 1 by -1; v <- shells(k)) {
          val acc = adj(v).toSeq
            .filter(w => dist.get(w).contains(k + 1))
            .map(w => sigma(v) * (1000 + delta.getOrElse(w, BigInt(0))) / sigma(w))
            .sum
          delta(v) = acc
        }
        for ((v, dd) <- dist if dd >= 1) {
          universe += v
          bc(v) = bc.getOrElse(v, BigInt(0)) + delta.getOrElse(v, BigInt(0))
        }
      }
      universe.map(v => v -> bc.getOrElse(v, BigInt(0)).toLong).toMap
    }
    val edgeGen = Gen
      .listOfN(12, Gen.zip(Gen.choose(0, 7), Gen.choose(0, 7)))
      .map(_.collect { case (a, b) if a != b => (s"n$a", s"n$b") }.toSet)
      .suchThat(_.nonEmpty)
    forAllSamples(edgeGen, n = 6) { edges =>
      val tr = edges.toSeq.map { case (a, b) => (a, "r", b) }.toDF("subject", "predicate", "obj")
      val got = Analytics.betweenness(tr).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == reference(edges), s"edges: $edges")
    }
  }

  test("modularity: two disjoint triangles score exactly Q = 1/2") {
    // LPA converges to one label per triangle; m = 6, each community
    // has e_c = 3 internal edges and degree mass d_c = 6, so
    // Q = 2·(3/6 − (6/12)²) = 0.5 → 500 permille exactly
    val tr = triplesDf(
      ("a", "r", "b"), ("b", "r", "c"), ("c", "r", "a"),
      ("d", "r", "e"), ("e", "r", "f"), ("f", "r", "d")
    )
    val got = Analytics.modularity(tr).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((6L, 2L, 6L, 500L)))
  }

  test("modularity: single clique clamps at 0 (all mass on one community)") {
    // one community holding every edge: Q = e/m − (2m/2m)² = 1 − 1 = 0;
    // the identity's numerator is exactly 0, the clamp keeps it there
    val tr = triplesDf(("a", "r", "b"), ("b", "r", "c"), ("c", "r", "a"))
    val got = Analytics.modularity(tr).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((3L, 1L, 3L, 0L)))
  }
}
