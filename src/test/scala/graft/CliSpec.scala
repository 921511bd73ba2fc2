package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.model.GraphJson

/** CLI plumbing test for the driver-only verb (the Spark-backed verbs —
  * cluster/visualize/memory-* — create and stop their own session, so
  * they are driven end-to-end outside sbt; see COVERAGE.md).
  */
class CliSpec extends AnyFunSuite {

  test("aggregate verb set-unions graph files") {
    val dir = Files.createTempDirectory("graft-cli")
    val g1 = dir.resolve("g1.json").toString
    val g2 = dir.resolve("g2.json").toString
    val out = dir.resolve("agg.json").toString
    GraphJson.write(
      graft.model.Graph(Set("a", "b"), Set("p"), Set(("a", "p", "b"))), g1)
    GraphJson.write(
      graft.model.Graph(Set("b", "c"), Set("q"), Set(("b", "q", "c"))), g2)
    Cli.main(Array("aggregate", out, g1, g2))
    val agg = GraphJson.read(out)
    assert(agg.entities == Set("a", "b", "c"))
    assert(agg.relations == Set(("a", "p", "b"), ("b", "q", "c")))
    assert(agg.edges == Set("p", "q"))
  }
}
