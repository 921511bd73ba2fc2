package graft.extract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic token-level extraction rules over the `documents` table
  * (webtext word-bag corpus). These are the engine's SQL-checkable face of
  * the reference's extraction operators (SURVEY.md §2.3): the reference's
  * LLM "mention detection" becomes a fixed mention rule, and its
  * (subject, predicate, object) extraction becomes a sliding token window
  * — both expressed as pure Column expressions (no UDFs) so the whole
  * stage stays inside Catalyst codegen and the scan only reads the
  * columns it needs.
  *
  * Rules (shared verbatim with the DuckDB oracles in SparkEntry):
  *   - tokens      = split(text, ' ') minus empties
  *   - entity rule = token with length >= MinEntityLen (mirrors the
  *     reference's get_entities "key entity" prompt filter,
  *     src/kg_gen/steps/_1_get_entities.py:5-19, made deterministic)
  *   - raw triple  = (toks[i], toks[i+1], toks[i+2]) sliding window
  *     (the deterministic stand-in for get_relations,
  *     src/kg_gen/steps/_2_get_relations.py:60-78)
  *   - validity    = subject and object both satisfy the entity rule —
  *     the reference's hard membership filter
  *     (src/kg_gen/steps/_2_get_relations.py:101-105)
  *   - set semantics: global DISTINCT (src/kg_gen/kg_gen.py:233-241)
  */
object TokenRules {

  val MinEntityLen = 4

  /** Non-empty tokens of a text column. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= lit(""))

  def isEntity(tok: Column): Column = length(tok) >= MinEntityLen

  /** Per-document entity mentions, distinct within the frame given.
    * Output columns: doc_id, entity.
    */
  def mentions(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), explode(tokens(col("text"))).as("entity"))
      .where(isEntity(col("entity")))
      .distinct()

  /** Raw sliding-window triples with provenance (pre-filter, pre-distinct).
    * Output columns: doc_id, subject, predicate, obj.
    *
    * Built with sequence+transform+explode so extraction is a single
    * narrow (no-shuffle) whole-stage-codegen pass per input partition.
    */
  def rawTriples(documents: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    documents
      .select(col("doc_id"), toks.as("toks"))
      .where(size(col("toks")) >= 3)
      .select(
        col("doc_id"),
        explode(
          transform(
            sequence(lit(0), size(col("toks")) - 3),
            i =>
              struct(
                element_at(col("toks"), i + 1).as("subject"),
                element_at(col("toks"), i + 2).as("predicate"),
                element_at(col("toks"), i + 3).as("obj")
              )
          )
        ).as("t")
      )
      .select(col("doc_id"), col("t.subject"), col("t.predicate"), col("t.obj"))
  }

  /** Valid triples: the reference's hard subject/object-in-entities filter
    * applied to the sliding window, global set semantics.
    * Output columns: subject, predicate, obj (distinct).
    */
  def triples(documents: DataFrame): DataFrame =
    rawTriples(documents)
      .where(isEntity(col("subject")) && isEntity(col("obj")))
      .select("subject", "predicate", "obj")
      .distinct()

  /** Derived edge set: distinct predicates (src/kg_gen/kg_gen.py:241). */
  def edges(triples: DataFrame): DataFrame =
    triples.select(col("predicate")).distinct()

  /** Per-document extraction-yield profile — the audit row a corpus
    * curator reads before trusting the KG: token count, distinct
    * mention count, distinct valid-triple count, and both densities in
    * per-kilo-token integer units. A 5k-token page yielding 2 triples
    * is boilerplate/garbage for extraction purposes no matter what its
    * text-quality score says; density is the signal that routes
    * documents between the KG pipeline and the discard/LLM-retry
    * queues. Output: (doc_id, n_tokens, n_mentions, n_triples,
    * mentions_per_kilo, triples_per_kilo), one row per non-empty doc.
    *
    * Shape at scale: ONE zero-Exchange codegen'd scan — mentions and
    * valid windows are counted row-locally with
    * filter/transform/array_distinct over the token array; nothing is
    * exploded, nothing shuffles (the oracle reaches the same counts
    * through its long-format CTEs).
    */
  def docDensity(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .where(size(col("toks")) > 0)
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        expr(
          s"CAST(size(array_distinct(filter(toks, t -> length(t) >= $MinEntityLen))) AS BIGINT)"
        ).as("n_mentions"),
        expr(
          "CASE WHEN size(toks) >= 3 THEN CAST(size(array_distinct(filter(" +
            "transform(sequence(0, size(toks) - 3), i -> struct(" +
            "element_at(toks, i + 1) AS s, element_at(toks, i + 2) AS p, element_at(toks, i + 3) AS o)), " +
            s"w -> length(w.s) >= $MinEntityLen AND length(w.o) >= $MinEntityLen))) AS BIGINT) " +
            "ELSE CAST(0 AS BIGINT) END"
        ).as("n_triples")
      )
      .withColumn("mentions_per_kilo", expr("(1000 * n_mentions) div n_tokens"))
      .withColumn("triples_per_kilo", expr("(1000 * n_triples) div n_tokens"))

  /** The matching DuckDB SQL building blocks (kept adjacent to the Scala
    * so rule changes update both sides together).
    */
  object Sql {
    val toksCte: String =
      "SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents"

    val rawTriplesCte: String =
      "SELECT doc_id, unnest(toks[1:len(toks)-2]) AS subject, " +
        "unnest(toks[2:len(toks)-1]) AS predicate, unnest(toks[3:len(toks)]) AS obj " +
        "FROM toks_cte WHERE len(toks) >= 3"

    val triplesCte: String =
      s"SELECT DISTINCT subject, predicate, obj FROM raw_cte " +
        s"WHERE length(subject) >= $MinEntityLen AND length(obj) >= $MinEntityLen"

    /** WITH prefix providing tr (valid distinct triples). */
    val withTriples: String =
      s"WITH toks_cte AS ($toksCte), raw_cte AS ($rawTriplesCte), tr AS ($triplesCte) "
  }
}
