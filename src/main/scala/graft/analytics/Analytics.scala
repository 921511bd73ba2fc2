package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph analytics and retrieval over the (entities, triples) tables —
  * the Spark re-expression of the reference's visualization/retrieval
  * surface (SURVEY.md §2.4/§2.6).
  *
  * All operators are declarative Column pipelines: single-pass endpoint
  * explodes instead of repeated scans, broadcast-friendly joins for
  * frontier expansion, and integer-unit scores where results cross the
  * DuckDB oracle boundary (no float drift).
  */
object Analytics {

  /** A2 — per-entity out/in/total degree in one pass
    * (visualize_kg.py:97-114).
    */
  def degrees(triples: DataFrame): DataFrame =
    triples
      .select(
        explode(
          array(
            struct(col("subject").as("entity"), lit(1L).as("o"), lit(0L).as("i")),
            struct(col("obj").as("entity"), lit(0L).as("o"), lit(1L).as("i"))
          )
        ).as("e")
      )
      .select("e.*")
      .groupBy("entity")
      .agg(
        sum("o").as("out_degree"),
        sum("i").as("in_degree"),
        sum(col("o") + col("i")).as("degree")
      )

  /** A3 — top-k relations by (-count, predicate)
    * (visualize_kg.py:204-216); deterministic total order before limit.
    */
  def topRelations(triples: DataFrame, k: Int = 10): DataFrame =
    triples
      .groupBy("predicate")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("predicate"))
      .limit(k)

  /** G1 — the nx.DiGraph projection: parallel edges between the same
    * (subject, obj) collapse to one relation. The reference's collapse is
    * python-set-iteration "last wins" (kg_gen.py:321-330) — here it is
    * the deterministic min predicate.
    */
  def collapsedEdges(triples: DataFrame): DataFrame =
    triples
      .groupBy("subject", "obj")
      .agg(min("predicate").as("predicate"))

  /** G4 — 2-hop context: all edges incident to the seed or to any
    * neighbor of the seed, rendered "s p o." (kg_gen.py:386-405; BFS
    * depth 2 over out- and in-edges). Frontier expansion is two
    * broadcast-able semi-join rounds, not an iterative loop.
    */
  def twoHopContext(triples: DataFrame, seed: String): DataFrame = {
    val spark = triples.sparkSession
    import spark.implicits._
    twoHopContextSet(triples, Seq(seed).toDF("seed"))
  }

  /** Seed-set 2-hop context: the union of per-seed BFS contexts equals
    * one set-level expansion (edges incident to any seed, then edges
    * incident to those edges' endpoints) — so multi-seed retrieval is
    * two semi-join rounds total, independent of seed count.
    */
  def twoHopContextSet(triples: DataFrame, seeds: DataFrame): DataFrame = {
    val sentences = triples.select(
      col("subject"),
      col("obj"),
      concat_ws(" ", col("subject"), col("predicate"), col("obj")).as("s")
    )
    // "incident to any node in `set`" as a UNION of two EQUI semi-joins,
    // never an OR join condition: an OR disjunction is not an equi-join,
    // so Catalyst would plan BroadcastNestedLoopJoin — O(edges × set)
    // comparisons. Two hash semi-joins stay O(edges). No broadcast hint:
    // a hub seed's frontier is unbounded, so the build side is AQE's
    // runtime decision, not a compile-time promise.
    def incident(set: DataFrame, k: String): DataFrame =
      sentences
        .join(set, sentences("subject") === set(k), "left_semi")
        .union(sentences.join(set, sentences("obj") === set(k), "left_semi"))
    val e1 = incident(seeds.select(col("seed")), "seed")
    val frontier = e1
      .select(col("subject").as("n"))
      .union(e1.select(col("obj").as("n")))
      .distinct()
    val e2 = incident(frontier, "n")
    e1.select("s")
      .union(e2.select("s"))
      .select(concat(col("s"), lit(".")).as("sentence"))
      .distinct()
  }

  /** G8 — case-insensitive substring retrieval, capped
    * (mcp/server.py:169-210); cap applied after a deterministic order.
    */
  def substringEntities(entities: DataFrame, q: String, k: Int = 10): DataFrame =
    entities
      .where(lower(col("entity")).contains(q.toLowerCase))
      .orderBy(col("entity"))
      .limit(k)

  // ------------------------------------------------------------------
  // G2/G3 — deterministic node embeddings + cosine top-k retrieval
  // ------------------------------------------------------------------

  /** Embedding dimensionality of the char-trigram TF vectors. */
  val EmbedDims = 64

  /** Polynomial trigram hash -> dimension; identical formula in
    * [[trigramDimSqlExpr]] for the oracle.
    */
  def trigramDim(tri: String): Int =
    math.floorMod(tri.charAt(0) * 961 + tri.charAt(1) * 31 + tri.charAt(2), EmbedDims)

  def trigramDimSqlExpr(sh: String): String =
    s"(ascii(substr($sh, 1, 1)) * 961 + ascii(substr($sh, 2, 1)) * 31 + ascii(substr($sh, 3, 1))) % $EmbedDims"

  /** Driver-side embedding of a short query string: dim -> count. */
  def embedQuery(q: String): Map[Int, Long] = {
    val s = q.toLowerCase
    if (s.length < 3) Map.empty
    else s.sliding(3).toSeq.groupBy(trigramDim).map { case (d, xs) => d -> xs.size.toLong }
  }

  /** G2 — long-format node embeddings: (entity, dim, cnt). TF counts of
    * hashed lowercase character trigrams — the deterministic offline
    * stand-in for SentenceTransformer vectors (kg_gen.py:332-346),
    * computed entirely in codegen'd Column expressions.
    */
  def nodeEmbeddings(entities: DataFrame): DataFrame =
    entities
      .where(length(col("entity")) >= 3) // sequence(1, len-2) needs len >= 3
      .select(
        col("entity"),
        explode(
          expr("transform(sequence(1, length(lower(entity)) - 2), i -> substr(lower(entity), i, 3))")
        ).as("tri")
      )
      .select(col("entity"), expr(trigramDimSqlExpr("tri")).cast("long").as("dim"))
      .groupBy("entity", "dim")
      .agg(count(lit(1)).as("cnt"))

  /** G3 — top-k nodes by cosine similarity to a query string
    * (kg_gen.py:370-384, k=8 default). The score is the integer-exact
    * monotone transform score_micro = 1e6 * dot^2 div (|a|^2 * |q|^2)
    * (dot >= 0 for TF counts), so ranking is bit-identical across
    * engines; ties break on entity.
    */
  def retrieveRelevantNodes(entities: DataFrame, query: String, k: Int = 8): DataFrame = {
    val spark = entities.sparkSession
    import spark.implicits._
    val emb = nodeEmbeddings(entities)
    val qv = embedQuery(query).toSeq.toDF("dim", "qcnt")
    val qNorm = embedQuery(query).values.map(c => c * c).sum
    val dots = emb
      .join(broadcast(qv), Seq("dim"))
      .groupBy("entity")
      .agg(sum(col("cnt") * col("qcnt")).as("dot"))
    val norms = emb.groupBy("entity").agg(sum(col("cnt") * col("cnt")).as("na"))
    dots
      .join(norms, "entity")
      .withColumn("score_micro", expr(s"(1000000 * dot * dot) div (na * $qNorm)"))
      .select("entity", "score_micro")
      .orderBy(desc("score_micro"), asc("entity"))
      .limit(k)
  }

  /** G2 (relations) — the reference embeds predicates alongside nodes
    * (kg_gen.py:332-346 returns node AND relation embeddings); same
    * trigram-TF rule over the distinct predicate surfaces.
    */
  def relationEmbeddings(triples: DataFrame): DataFrame =
    nodeEmbeddings(triples.select(col("predicate").as("entity")).distinct())
      .withColumnRenamed("entity", "predicate")

  /** G7 — the assembled visualization view model
    * (visualize_kg.py:30-258): one render record per entity — degrees
    * (0 for isolated nodes), connected component, hash-seeded color, and
    * a top-10-by-degree flag — everything the reference's HTML template
    * consumes, as one exportable table. Colors are md5-seeded (the
    * reference seeds per-name sha1; the *property* is a deterministic
    * per-name color, which md5 gives both engines).
    *
    * Plan shape: one degree aggregation, one CC run, a broadcast top-10
    * flag join — no global sort, no driver loop.
    */
  def vizModel(entities: DataFrame, triples: DataFrame): DataFrame = {
    val deg = degrees(triples)
    val edgesDf = triples.select(col("subject").as("src"), col("obj").as("dst"))
    val nodes = entities.select(col("entity").as("node"))
    val comp = graft.cluster.ConnectedComponents
      .run(edgesDf, nodes)
      .withColumnRenamed("node", "entity")
    val top = deg
      .select(col("entity"), col("degree"))
      .orderBy(desc("degree"), asc("entity"))
      .limit(10)
      .select(col("entity"), lit(1L).as("is_top"))
    entities
      .join(deg, Seq("entity"), "left")
      .join(comp, Seq("entity"), "left")
      .join(broadcast(top), Seq("entity"), "left")
      .select(
        col("entity"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"),
        coalesce(col("degree"), lit(0L)).as("degree"),
        coalesce(col("component"), col("entity")).as("component"),
        coalesce(col("is_top"), lit(0L)).as("is_top"),
        concat(lit("#"), substring(md5(col("entity").cast("binary")), 1, 6)).as("color")
      )
  }

  /** G5 — retrieve: top-k relevant nodes, union of their 2-hop contexts,
    * flattened to one deterministic context string
    * (kg_gen.py:348-368; the reference joins an unordered set with
    * spaces — here the sentence set is sorted first).
    */
  def retrieve(entities: DataFrame, triples: DataFrame, query: String, k: Int = 3): DataFrame = {
    val seeds = retrieveRelevantNodes(entities, query, k)
      .select(col("entity").as("seed"))
    twoHopContextSet(triples, seeds).agg(
      array_join(array_sort(collect_list(col("sentence"))), " ").as("context")
    )
  }
}
