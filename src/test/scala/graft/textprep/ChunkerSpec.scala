package graft.textprep

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.GenSampling

/** 1:1 port of the reference's chunker tests
  * (reference: tests/test_chunk_text.py:6-85) plus ScalaCheck properties
  * (FIXTURES.md §4).
  */
class ChunkerSpec extends AnyFunSuite with GenSampling {

  test("single short sentence fits in one chunk") { // test_chunk_text.py:6-11
    val result = Chunker.chunk("Hello world.", 50)
    assert(result.length == 1)
    assert(result.head == "Hello world.")
  }

  test("multiple short sentences combine into one chunk") { // :13-21
    val result = Chunker.chunk("Hello world. This is a test.", 50)
    assert(result.length == 1)
    assert(result.head == "Hello world. This is a test.")
  }

  test("multiple sentences exceeding the limit split into chunks <= max") { // :23-38
    val text = "Sentence number one is not too long. " +
      "Sentence number two might push us over the limit. " +
      "Short last sentence."
    val result = Chunker.chunk(text, 50)
    assert(result.length > 1)
    result.foreach(c => assert(c.length <= 50, s"Chunk too long: $c"))
  }

  test("long sentence falls back to word chunking") { // :40-57
    val text = Seq.fill(100)("word").mkString(" ") + "."
    val result = Chunker.chunk(text, 20)
    result.foreach(c => assert(c.length <= 20, s"Chunk too long: $c"))
    assert(result.mkString(" ").contains("word"))
  }

  test("mixed short and long sentences") { // :59-84
    val text = "Short sentence. " + Seq.fill(30)("longword").mkString(" ") +
      ". " + "Another short sentence."
    val result = Chunker.chunk(text, 50)
    assert(result.length >= 3)
    result.foreach(c => assert(c.length <= 50, s"Chunk too long: $c"))
    assert(result.head.startsWith("Short sentence."))
    assert(result.last.contains("Another short sentence."))
  }

  // ---- properties beyond the reference suite ----

  private val wordGen = Gen.choose(1, 12).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))
  private val textGen: Gen[String] = for {
    sentences <- Gen.listOfN(8, Gen.choose(1, 15).flatMap(Gen.listOfN(_, wordGen)))
  } yield sentences.map(ws => ws.mkString(" ").capitalize + ".").mkString(" ")

  test("property: every chunk within limit when words fit") {
    forAllSamples2(textGen, Gen.choose(30, 200)) { (text: String, max: Int) =>
      Chunker.chunk(text, max).foreach(c => assert(c.length <= max))
    }
  }

  test("property: word sequence preserved") {
    forAllSamples(textGen) { text =>
      val original = text.split("\\s+").filter(_.nonEmpty).toSeq
      val rejoined = Chunker.chunk(text, 80).mkString(" ").split("\\s+").filter(_.nonEmpty).toSeq
      assert(rejoined == original)
    }
  }

  test("property: deterministic") {
    forAllSamples(textGen) { text =>
      assert(Chunker.chunk(text, 60) == Chunker.chunk(text, 60))
    }
  }
}
