package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.model.{Graph, Message}

/** The reference's public-API composition tests, against the [[KgGen]]
  * facade (mirrors tests/test_basic.py:56-98 and tests/test_configs.py:
  * 28-84 with the fuzzy LLM matcher replaced by exact set logic; family
  * sentences use the corpus renderer's sentence shapes).
  */
class KgGenSpec extends AnyFunSuite with SparkTestBase {

  private lazy val kg = new KgGen(spark)

  private val family1 =
    "Linda is mother of Joshua. Ben is brother of Josh. Andrew is father of Josh."
  private val family2 =
    "Judy is sister of Andrew. Josh is nephew of Judy. Judy is aunt of Josh. Josh is same as Joshua."

  test("generate: entities, triples, and derived edges from plain text") {
    val g = kg.generate(family1)
    assert(g.entities == Set("Linda", "Joshua", "Ben", "Josh", "Andrew"))
    assert(
      g.relations == Set(
        ("Linda", "is mother of", "Joshua"),
        ("Ben", "is brother of", "Josh"),
        ("Andrew", "is father of", "Josh")
      )
    )
    assert(g.edges == Set("is mother of", "is brother of", "is father of"))
  }

  test("generate -> generate -> aggregate -> cluster composition") {
    val g1 = kg.generate(family1)
    val g2 = kg.generate(family2)
    val agg = kg.aggregate(Seq(g1, g2))
    assert(agg.entities == g1.entities ++ g2.entities)
    assert(agg.relations == g1.relations ++ g2.relations)
    assert(agg.entityClusters.isEmpty) // aggregate drops cluster maps

    val clustered = kg.cluster(agg)
    // Josh / Joshua unify (abbreviation-prefix rule); rep is the shorter
    val cl = clustered.entityClusters.get
    val joshRep = cl.collectFirst { case (rep, ms) if ms.contains("Joshua") => rep }.get
    assert(joshRep == "Josh")
    assert(cl(joshRep).contains("Josh") && cl(joshRep).contains("Joshua"))
    assert(!clustered.entities.contains("Joshua"))
    // every original relation survives, rewritten onto representatives
    assert(clustered.relations.contains(("Linda", "is mother of", "Josh")))
    assert(clustered.relations.contains(("Judy", "is aunt of", "Josh")))
  }

  test("conversation entry: role filter and flatten order") {
    val msgs = Seq(
      Message(0, "user", "Paris is capital of France."),
      Message(1, "system", "You are a helpful assistant."),
      Message(2, "assistant", "France is home of Paris.")
    )
    val g = kg.generateConversation(msgs)
    assert(g.entities.contains("Paris") && g.entities.contains("France"))
    assert(g.relations.contains(("Paris", "is capital of", "France")))
    assert(g.relations.contains(("France", "is home of", "Paris")))
    // the system message never contributes
    assert(!g.entities.contains("You"))
  }

  test("save / fromFile round trip preserves the graph exactly") {
    val g = kg.cluster(kg.generate(family1))
    val path = Files.createTempDirectory("kggen").resolve("g.json").toString
    kg.save(g, path)
    assert(kg.fromFile(path) == g)
  }

  test("retrieve returns 2-hop context sentences for a relevant query") {
    val g = kg.generate(family1)
    val ctx = kg.retrieve(g, "Joshua mother")
    assert(ctx.nonEmpty)
    assert(ctx.contains("Linda is mother of Joshua."))
  }

  test("empty input yields the empty graph") {
    assert(kg.generate("") == Graph.empty)
  }

  test("context steers relation extraction (generate(context=...) analogue)") {
    val text = "Linda is mother of Joshua. Linda works with Ben."
    val all = kg.generate(text)
    assert(all.relations.map(_._2) == Set("is mother of", "works with"))
    // a family-domain hint gates relations to predicates sharing a token
    val steered = kg.generate(text, context = "family mother father")
    assert(steered.relations == Set(("Linda", "is mother of", "Joshua")))
    // entities are NOT gated — the hint steers relations only
    assert(steered.entities == all.entities)
    // empty context = no steering
    assert(kg.generate(text, context = "") == all)
  }
}
