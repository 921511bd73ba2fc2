package graft.model

import org.scalatest.funsuite.AnyFunSuite

/** Round-trip tests for the reference graph JSON format
  * (reference: src/kg_gen/kg_gen.py:250-263 sink, :139-147 source,
  * mcp/server.py:82-123).
  */
class GraphJsonSpec extends AnyFunSuite {

  private val g = Graph(
    entities = Set("Linda", "Joshua", "Josh", "Ben"),
    edges = Set("is mother of", "is brother of"),
    relations = Set(
      ("Linda", "is mother of", "Joshua"),
      ("Ben", "is brother of", "Josh")
    ),
    entityClusters = Some(Map("Josh" -> Set("Josh", "Joshua"))),
    edgeClusters = Some(Map.empty)
  )

  test("round-trip preserves all fields") {
    assert(GraphJson.fromJson(GraphJson.toJson(g)) == g)
  }

  test("null clusters round-trip as None") {
    val g2 = g.copy(entityClusters = None, edgeClusters = None)
    val parsed = GraphJson.fromJson(GraphJson.toJson(g2))
    assert(parsed.entityClusters.isEmpty && parsed.edgeClusters.isEmpty)
  }

  test("reads the reference sink shape") {
    val json =
      """{"entities": ["a", "b"], "relations": [["a", "r", "b"]],
         |"edges": ["r"], "entity_clusters": null, "edge_clusters": {"r": ["r", "rr"]}}""".stripMargin
    val parsed = GraphJson.fromJson(json)
    assert(parsed.entities == Set("a", "b"))
    assert(parsed.relations == Set(("a", "r", "b")))
    assert(parsed.edges == Set("r"))
    assert(parsed.entityClusters.isEmpty)
    assert(parsed.edgeClusters.contains(Map("r" -> Set("r", "rr"))))
  }

  test("deterministic serialization") {
    assert(GraphJson.toJson(g) == GraphJson.toJson(g))
  }

  test("aggregate is pure set union dropping clusters") { // kg_gen.py:291-304
    val g2 = Graph(Set("X"), Set("r2"), Set(("X", "r2", "Linda")))
    val agg = Graph.aggregate(Seq(g, g2))
    assert(agg.entities == g.entities ++ g2.entities)
    assert(agg.relations == g.relations ++ g2.relations)
    assert(agg.edges == g.edges ++ g2.edges)
    assert(agg.entityClusters.isEmpty && agg.edgeClusters.isEmpty)
  }
}
