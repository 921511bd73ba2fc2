package graft.model

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** JSON codec for the reference's on-disk graph format
  * (reference: src/kg_gen/kg_gen.py:250-263 sink, :139-147 source;
  * examples at app/examples/&#42;.json):
  *
  * {{{
  * { "entities": [...], "relations": [[s,p,o], ...], "edges": [...],
  *   "entity_clusters": {rep: [members...]} | null,
  *   "edge_clusters":   {rep: [members...]} | null }
  * }}}
  *
  * Sets serialize as sorted lists so the sink is byte-deterministic (the
  * reference emits Python-set iteration order; our tests compare as sets).
  * This codec is a driver-side boundary for goldens and the MCP-style
  * memory file; at scale graphs persist as partitioned parquet tables.
  */
object GraphJson {
  private val mapper = new ObjectMapper()

  def toJson(g: Graph): String = {
    val root = mapper.createObjectNode()
    def strArr(xs: Iterable[String]): ArrayNode = {
      val a = mapper.createArrayNode()
      xs.toSeq.sorted.foreach(a.add)
      a
    }
    root.set[ObjectNode]("entities", strArr(g.entities))
    val rels = mapper.createArrayNode()
    g.relations.toSeq.sorted.foreach { case (s, p, o) =>
      val t = mapper.createArrayNode(); t.add(s); t.add(p); t.add(o); rels.add(t)
    }
    root.set[ObjectNode]("relations", rels)
    root.set[ObjectNode]("edges", strArr(g.edges))
    def clusters(c: Option[Map[String, Set[String]]], field: String): Unit =
      c match {
        case None => root.putNull(field)
        case Some(m) =>
          val node = mapper.createObjectNode()
          m.toSeq.sortBy(_._1).foreach { case (rep, members) =>
            node.set[ObjectNode](rep, strArr(members))
          }
          root.set[ObjectNode](field, node)
      }
    clusters(g.entityClusters, "entity_clusters")
    clusters(g.edgeClusters, "edge_clusters")
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  def fromJson(json: String): Graph = {
    val root = mapper.readTree(json)
    def strSet(field: String): Set[String] =
      Option(root.get(field)).filterNot(_.isNull) match {
        case Some(a) => a.elements().asScala.map(_.asText()).toSet
        case None    => Set.empty
      }
    val relations: Set[(String, String, String)] =
      Option(root.get("relations")).filterNot(_.isNull) match {
        case Some(a) =>
          a.elements().asScala.map { t =>
            val it = t.elements().asScala.map(_.asText()).toSeq
            (it(0), it(1), it(2))
          }.toSet
        case None => Set.empty
      }
    def clusters(field: String): Option[Map[String, Set[String]]] =
      Option(root.get(field)).filterNot(_.isNull).map { node =>
        node.properties().asScala.map { e =>
          e.getKey -> e.getValue.elements().asScala.map(_.asText()).toSet
        }.toMap
      }
    Graph(strSet("entities"), strSet("edges"), relations,
      clusters("entity_clusters"), clusters("edge_clusters"))
  }

  def write(g: Graph, path: String): Unit = {
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.write(p, toJson(g).getBytes(StandardCharsets.UTF_8))
  }

  def read(path: String): Graph =
    fromJson(new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8))
}
