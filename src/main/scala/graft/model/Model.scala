package graft.model

import java.sql.Timestamp

/** Core data model of the engine.
  *
  * Mirrors the reference's `Graph` pydantic model
  * (reference: src/kg_gen/models.py:6-15) re-expressed as typed Spark
  * Datasets instead of driver-resident Python sets:
  *
  *   - `entities: set[str]`   -> Dataset[Entity]
  *   - `edges: set[str]`      -> Dataset[Edge] (derived: distinct predicates)
  *   - `relations: set[(s,p,o)]` -> Dataset[Triple]
  *   - `entity_clusters / edge_clusters: dict[str, set[str]]`
  *       -> long-format Dataset[ClusterAssignment]; the dict-of-sets shape
  *          exists only at the JSON sink (groupBy(rep).agg(collect_set)).
  *
  * All scalar values are strings — the reference data model has no other
  * scalar type (SURVEY.md §1.1).
  */

/** One Common-Crawl-style web page (BASELINE input_hint):
  * pages(url, warc_ts, html, text, lang).
  */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String
)

/** One chunk of a page's extracted text (reference: chunk_text,
  * src/kg_gen/utils/chunk_text.py:17-66). `chunkId` preserves in-document
  * order; (url, chunkId) is the chunk key.
  */
final case class Chunk(url: String, chunkId: Int, text: String)

/** An entity mention with provenance (reference keeps bare strings —
  * src/kg_gen/models.py:7-9; provenance columns are our scale addition).
  */
final case class Mention(url: String, chunkId: Int, entity: String)

/** One (subject, predicate, object) triple (reference:
  * src/kg_gen/models.py:11-13). Column named `obj` because `object` is a
  * Scala keyword; at SQL boundaries it is exposed as `obj` too.
  */
final case class Triple(subject: String, predicate: String, obj: String)

/** Triple with provenance, pre-aggregation. */
final case class TripleMention(
    url: String,
    chunkId: Int,
    subject: String,
    predicate: String,
    obj: String
)

/** member -> representative assignment for one item kind
  * (kind in {"entity", "edge"}); the normalized long form of the
  * reference's `entity_clusters` / `edge_clusters` dicts
  * (src/kg_gen/models.py:14-15).
  */
final case class ClusterAssignment(member: String, representative: String, kind: String)

/** One message of a conversation input (reference accepts
  * list[{role, content}] — src/kg_gen/kg_gen.py:176-195). `seq` makes the
  * Python list order explicit.
  */
final case class Message(seq: Int, role: String, content: String)

/** A fully materialized graph in driver memory — used only at test scale
  * and at the JSON sink boundary; at scale the graph lives as Datasets.
  * Shape matches the reference JSON sink exactly
  * (src/kg_gen/kg_gen.py:250-263).
  */
final case class Graph(
    entities: Set[String],
    edges: Set[String],
    relations: Set[(String, String, String)],
    entityClusters: Option[Map[String, Set[String]]] = None,
    edgeClusters: Option[Map[String, Set[String]]] = None
)

object Graph {
  val empty: Graph = Graph(Set.empty, Set.empty, Set.empty)

  /** Set-union aggregate of graphs; drops cluster maps — exactly
    * KGGen.aggregate (reference: src/kg_gen/kg_gen.py:291-304).
    */
  def aggregate(graphs: Seq[Graph]): Graph =
    Graph(
      entities = graphs.iterator.flatMap(_.entities).toSet,
      edges = graphs.iterator.flatMap(_.edges).toSet,
      relations = graphs.iterator.flatMap(_.relations).toSet
    )
}
