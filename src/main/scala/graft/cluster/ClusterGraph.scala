package graft.cluster

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.cluster.CandidatePairs.ClusterConfig
import graft.model.Graph

/** The cluster() step re-expressed as one deterministic Spark pass
  * (reference: cluster_graph, src/kg_gen/steps/_3_cluster_graph.py:279-325;
  * SURVEY.md §2.5/§3.2):
  *
  *   normalize -> block -> candidate pairs -> connected components ->
  *   representative (shortest-then-lex) -> rewrite relations
  *   (3 broadcast joins) -> distinct
  *
  * The reference's greedy, order-dependent LLM loop becomes an
  * order-independent fixpoint; its tests assert clustering *properties*
  * (shrinkage, case-fold merging, no-over-merge, rep membership), which
  * hold here by construction (SURVEY.md §7.5 risk 5).
  */
object ClusterGraph {

  /** member -> (member, representative): every item lands in exactly one
    * cluster; singletons are their own representative (the reference
    * keeps singleton clusters too — _3_cluster_graph.py:209-214).
    */
  def clusterItems(items: DataFrame, cfg: ClusterConfig = ClusterConfig()): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val distinctItems = items.select(col("member")).distinct()

    // Adaptive small-input path (cfg.driverClusterThreshold): `take` is
    // incremental — it stops as soon as threshold+1 distinct members are
    // found, so at web scale this probe reads a partition or two, decides
    // "big", and the distributed fixpoint below runs unchanged. When the
    // dictionary IS small (a few MB of surface forms), candidate edges
    // AND the union-find run driver-side (CandidatePairs.edgesLocal, the
    // channel-identical twin): the whole cluster phase is then ONE Spark
    // job (the probe) instead of ~10 — at this size the distributed
    // path's cost is driver scheduling latency, not data.
    val probe = distinctItems.as[String].take(cfg.driverClusterThreshold + 1)
    if (probe.length <= cfg.driverClusterThreshold) {
      val members = probe
      val parent = scala.collection.mutable.HashMap.from(members.map(m => m -> m))
      def find(x: String): String = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      CandidatePairs.edgesLocal(members.toSeq, cfg).foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(ra) = rb
      }
      // representative: shortest surface, then lexicographic, per
      // component — identical rule to the distributed path below,
      // including its string semantics: Spark length = code points and
      // Spark string order = UTF-8 bytes (see CandidatePairs' parity
      // note), so JVM String.length/compareTo would flip reps beyond
      // the BMP when the dictionary crosses the driver threshold
      val repOrd: Ordering[(Int, String)] =
        Ordering.Tuple2(Ordering.Int, CandidatePairs.utf8Order)
      val assignments = members
        .groupBy(find)
        .iterator
        .flatMap { case (_, ms) =>
          val rep = ms.minBy(m => (CandidatePairs.cpLen(m), m))(repOrd)
          ms.map(m => (m, rep))
        }
        .toSeq
      assignments.toDF("member", "representative")
    } else {
      val comp = ConnectedComponents.run(
        CandidatePairs.edges(distinctItems, cfg),
        distinctItems.select(col("member").as("node")),
        cfg.maxIterations
      )
      // representative via groupBy+join rather than a whole-partition
      // Window: partial aggregation keeps giant components skew-safe.
      val reps = comp
        .groupBy("component")
        .agg(min(struct(length(col("node")), col("node"))).as("rep"))
      comp
        .join(reps, "component")
        .select(col("node").as("member"), col("rep.node").as("representative"))
    }
  }

  final case class Clustered(
      entities: DataFrame, // (entity)
      edges: DataFrame, // (predicate)
      triples: DataFrame, // (subject, predicate, obj)
      entityAssignments: DataFrame, // (member, representative)
      edgeAssignments: DataFrame // (member, representative)
  )

  /** Full cluster_graph: cluster entities and predicates, rewrite every
    * triple onto representatives, set-dedup (colliding triples merge —
    * _3_cluster_graph.py:317).
    *
    * The member->representative dictionaries are the broadcast candidates
    * named in the north star: their cardinality is the *distinct surface
    * form* count, orders of magnitude below the triple count, so a
    * broadcast hash join keeps the rewrite shuffle-free.
    */
  def clusterGraph(
      entities: DataFrame,
      triples: DataFrame,
      cfg: ClusterConfig = ClusterConfig()
  ): Clustered = {
    // entity and predicate clustering are independent chains of many small
    // jobs (candidate channels + CC iterations); submitting them from two
    // driver threads lets the scheduler interleave those jobs, halving the
    // serial small-job latency that otherwise caps scaling efficiency
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val entF = Future(clusterItems(entities.select(col("entity").as("member")), cfg))
    val predF = Future(clusterItems(triples.select(col("predicate").as("member")), cfg))
    val entAssign = Await.result(entF, Duration.Inf)
    val predAssign = Await.result(predF, Duration.Inf)

    // size-gated broadcast (round-2 advice): the hint fires only when the
    // dictionary is provably small (driver-clustered LocalRelation);
    // otherwise AQE decides from observed sizes — a forced broadcast of a
    // billion-row dictionary at the design scale would be an OOM
    def dict(assign: DataFrame, memberCol: String, repCol: String): DataFrame =
      graft.util.PlanHints.maybeBroadcast(
        assign.select(col("member").as(memberCol), col("representative").as(repCol))
      )

    val rewritten = triples
      .join(dict(entAssign, "sMember", "sRep"), col("subject") === col("sMember"), "left")
      .join(dict(predAssign, "pMember", "pRep"), col("predicate") === col("pMember"), "left")
      .join(dict(entAssign, "oMember", "oRep"), col("obj") === col("oMember"), "left")
      .select(
        coalesce(col("sRep"), col("subject")).as("subject"),
        coalesce(col("pRep"), col("predicate")).as("predicate"),
        coalesce(col("oRep"), col("obj")).as("obj")
      )
      .distinct()

    Clustered(
      entities = entAssign.select(col("representative").as("entity")).distinct(),
      edges = predAssign.select(col("representative").as("predicate")).distinct(),
      triples = rewritten,
      entityAssignments = entAssign,
      edgeAssignments = predAssign
    )
  }

  /** Driver-side materialization of the reference Graph shape including
    * the rep -> members cluster dicts (test/golden scale only).
    */
  def toGraph(c: Clustered): Graph = {
    def clusterMap(assign: DataFrame): Map[String, Set[String]] =
      assign
        .collect()
        .map(r => (r.getString(0), r.getString(1)))
        .groupBy(_._2)
        .map { case (rep, ms) => rep -> ms.map(_._1).toSet }

    Graph(
      entities = c.entities.collect().map(_.getString(0)).toSet,
      edges = c.edges.collect().map(_.getString(0)).toSet,
      relations = c.triples.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet,
      entityClusters = Some(clusterMap(c.entityAssignments)),
      edgeClusters = Some(clusterMap(c.edgeAssignments))
    )
  }

  /** Small-graph convenience for fixture tests: cluster a driver-side
    * Graph exactly like the reference entry point
    * (kg_gen.cluster -> cluster_graph).
    */
  def clusterDriverGraph(
      spark: SparkSession,
      g: Graph,
      cfg: ClusterConfig = ClusterConfig()
  ): Graph = {
    import spark.implicits._
    val ents = g.entities.toSeq.toDF("entity")
    val tris = g.relations.toSeq.toDF("subject", "predicate", "obj")
    if (g.entities.isEmpty && g.relations.isEmpty && g.edges.isEmpty) {
      // empty graph -> empty cluster dicts, not null
      // (tests/test_clustering.py:245-256)
      return g.copy(entityClusters = Some(Map.empty), edgeClusters = Some(Map.empty))
    }
    // edges may contain predicates not present in any triple; cluster the
    // union so every edge lands in a cluster (reference clusters
    // graph.edges — _3_cluster_graph.py:291)
    val allPreds = (g.edges ++ g.relations.map(_._2)).toSeq.toDF("subject")
    val predAssign = clusterItems(allPreds.select(col("subject").as("member")), cfg)
    val entAssign = clusterItems(ents.select(col("entity").as("member")), cfg)

    def dict(assign: DataFrame, memberCol: String, repCol: String): DataFrame =
      graft.util.PlanHints.maybeBroadcast(
        assign.select(col("member").as(memberCol), col("representative").as(repCol))
      )

    val rewritten = tris
      .join(dict(entAssign, "sMember", "sRep"), col("subject") === col("sMember"), "left")
      .join(dict(predAssign, "pMember", "pRep"), col("predicate") === col("pMember"), "left")
      .join(dict(entAssign, "oMember", "oRep"), col("obj") === col("oMember"), "left")
      .select(
        coalesce(col("sRep"), col("subject")).as("subject"),
        coalesce(col("pRep"), col("predicate")).as("predicate"),
        coalesce(col("oRep"), col("obj")).as("obj")
      )
      .distinct()

    val c = Clustered(
      entities = entAssign.select(col("representative").as("entity")).distinct(),
      edges = predAssign.select(col("representative").as("predicate")).distinct(),
      triples = rewritten,
      entityAssignments = entAssign,
      edgeAssignments = predAssign
    )
    toGraph(c)
  }
}
