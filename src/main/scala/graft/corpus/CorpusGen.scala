package graft.corpus

import java.sql.Timestamp
import scala.util.Random
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.{Graph, Page, Triple}

/** Deterministic synthetic web-page corpus, rendered *from* known graphs
  * so that extraction precision/recall is computable exactly
  * (FIXTURES.md §6, SURVEY.md §7.5 risk 2).
  *
  * Every page is a pure function of (seed, docId) — generation is
  * embarrassingly parallel and runs through `spark.range(n).mapPartitions`
  * so bench corpora are built distributed, never on the driver.
  *
  * Renderer invariants the PatternScorer inverts:
  *   - each triple renders as one sentence "Subject predicate Object.";
  *   - entity surfaces are runs of Capitalized tokens, predicates are
  *     all-lowercase token sequences;
  *   - `html` wraps the text such that TextExtract.extract(html) is
  *     byte-identical to `text` (the per-row invariant);
  *   - non-"en" pages carry junk and are excluded from the oracle graphs
  *     (they must be filtered by the pipeline's lang predicate).
  */
object CorpusGen {

  final case class Config(
      nDocs: Long = 1000L,
      seed: Long = 42L,
      triplesPerDoc: Int = 8,
      entityPoolSize: Int = 500,
      /** probability a triple's subject is the global hub entity (pool
        * index 0) — exercises skew/salting paths.
        */
      hubRate: Double = 0.05,
      /** probability an entity renders as a surface variant (case/plural/
        * abbreviation) — exercises the clustering pipeline; 0.0 gives the
        * exactly-invertible corpus for P/R tests.
        */
      variantRate: Double = 0.0,
      nonEnRate: Double = 0.05
  )

  private val firstSyllables = Vector(
    "Ba", "Do", "Fi", "Ka", "Lu", "Mo", "Ne", "Pi", "Ra", "Su",
    "Ta", "Ve", "Zo", "Chi", "Gar", "Len", "Nor", "Pel", "Quin", "Ros"
  )
  private val secondSyllables = Vector(
    "bel", "dan", "fir", "gon", "hal", "kin", "lor", "mir", "nos", "par",
    "quil", "rin", "sol", "tor", "van", "wex", "yor", "zan", "dral", "moth"
  )
  private val surnames = Vector(
    "Abbot", "Brink", "Calder", "Dunmore", "Ellery", "Fenwick", "Garrow",
    "Hale", "Ingram", "Jardine", "Keller", "Lowell", "Mercer", "Norwood",
    "Ogden", "Pratt", "Quimby", "Rutledge", "Sandoval", "Thorne"
  )

  val predicates: Vector[String] = Vector(
    "is mother of", "is father of", "is brother of", "is sister of",
    "is aunt of", "is nephew of", "is same as", "works with", "lives in",
    "owns", "likes", "teaches", "studies under", "leads", "follows",
    "is married to", "knows", "employs", "mentors", "visits", "helps",
    "admires", "supports", "manages", "reports to", "is friend of",
    "founded", "invested in", "writes about", "travels with"
  )

  /** Deterministic base surface form for pool index i; ~half are
    * two-token names so multi-token entity runs are exercised.
    */
  def entityName(i: Int): String = {
    val f = firstSyllables(i % firstSyllables.size) +
      secondSyllables((i / firstSyllables.size) % secondSyllables.size)
    if (i % 2 == 1) f + " " + surnames((i / 3) % surnames.size) else f
  }

  /** Surface variants of a base name — same-meaning forms per the
    * reference's clustering criterion ("different tenses, plural forms,
    * stem forms, or cases" — src/kg_gen/steps/_3_cluster_graph.py:36-39;
    * wikiqa adds abbreviation/shorthand).
    */
  def variants(base: String): Vector[String] = {
    val abbrev = {
      val head = base.split(" ").head
      if (head.length > 4) head.take(4) + (base.split(" ").drop(1) match {
        case rest if rest.nonEmpty => " " + rest.mkString(" ")
        case _                     => ""
      })
      else base
    }
    Vector(base, base.toUpperCase, base + "s", abbrev)
  }

  /** Independent deterministic streams per (doc, purpose) so the lang
    * decision, triple generation, and surface-variant draws never
    * correlate.
    */
  private def rng(cfg: Config, docId: Long, stream: Int): Random =
    new Random(cfg.seed * 1000003L + docId * 7919L + stream * 104729L + 17L)

  /** The generating (oracle) triples of a document — base surfaces. */
  def docTriples(cfg: Config, docId: Long): Seq[Triple] = {
    val r = rng(cfg, docId, 1)
    (0 until cfg.triplesPerDoc).map { _ =>
      val sIdx =
        if (r.nextDouble() < cfg.hubRate) 0
        else r.nextInt(cfg.entityPoolSize)
      var oIdx = r.nextInt(cfg.entityPoolSize)
      if (oIdx == sIdx) oIdx = (oIdx + 1) % cfg.entityPoolSize
      val p = predicates(r.nextInt(predicates.size))
      Triple(entityName(sIdx), p, entityName(oIdx))
    }.distinct
  }

  private def surface(cfg: Config, r: Random, base: String): String =
    if (cfg.variantRate > 0 && r.nextDouble() < cfg.variantRate) {
      val v = variants(base)
      v(1 + r.nextInt(v.size - 1))
    } else base

  def isEn(cfg: Config, docId: Long): Boolean =
    rng(cfg, docId, 0).nextDouble() >= cfg.nonEnRate

  /** Render one page. Pure in (cfg, docId). */
  def page(cfg: Config, docId: Long): Page = {
    val en = isEn(cfg, docId)
    val url = f"https://example.test/doc/$docId%08d"
    val ts = new Timestamp(1700000000000L + docId * 1000L)
    if (!en) {
      val text = s"inhalt der seite $docId ohne relevante daten"
      Page(url, ts, htmlFor(text), text, "de")
    } else {
      val r = rng(cfg, docId, 2)
      val triples = docTriples(cfg, docId)
      val sentences = triples.map { t =>
        s"${surface(cfg, r, t.subject)} ${t.predicate} ${surface(cfg, r, t.obj)}."
      }
      val text = sentences.mkString(" ")
      Page(url, ts, htmlFor(text), text, "en")
    }
  }

  private def htmlFor(text: String): Array[Byte] =
    s"<html><head><title></title></head><body><p>$text</p></body></html>"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** Distributed corpus: one row per page. */
  def pages(spark: SparkSession, cfg: Config): Dataset[Page] = {
    import spark.implicits._
    spark.range(cfg.nDocs).mapPartitions(_.map(id => page(cfg, id)))
  }

  /** Corpus pre-balanced by `repartitionByRange` on xxhash64(url) (the
    * north-rule ingest re-balance). The range partitioner samples its key
    * — so the shuffle key is computed from the id column alone and pages
    * are rendered *after* the exchange; sampling never renders a page.
    */
  def pagesPartitioned(spark: SparkSession, cfg: Config, numPartitions: Int): Dataset[Page] = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    spark
      .range(cfg.nDocs)
      .select(
        col("id"),
        format_string("https://example.test/doc/%08d", col("id")).as("url")
      )
      .repartitionByRange(numPartitions, xxhash64(col("url")))
      .select(col("id"))
      .as[Long]
      .mapPartitions(_.map(id => page(cfg, id)))
  }

  /** Distributed oracle: the generating triples of every en page
    * (base surfaces — what extraction must recover when variantRate=0).
    */
  def oracleTriples(spark: SparkSession, cfg: Config): Dataset[Triple] = {
    import spark.implicits._
    spark
      .range(cfg.nDocs)
      .mapPartitions(_.flatMap { id =>
        if (isEn(cfg, id)) docTriples(cfg, id) else Seq.empty
      })
  }

  /** Driver-side oracle graph for small test corpora. */
  def oracleGraph(cfg: Config): Graph = {
    val ts = (0L until cfg.nDocs).flatMap { id =>
      if (isEn(cfg, id)) docTriples(cfg, id) else Seq.empty
    }
    Graph(
      entities = ts.flatMap(t => Seq(t.subject, t.obj)).toSet,
      edges = ts.map(_.predicate).toSet,
      relations = ts.map(t => (t.subject, t.predicate, t.obj)).toSet
    )
  }

}
