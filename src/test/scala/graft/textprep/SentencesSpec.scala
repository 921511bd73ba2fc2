package graft.textprep

import org.scalatest.funsuite.AnyFunSuite

class SentencesSpec extends AnyFunSuite {

  test("simple sentences") {
    assert(Sentences.split("Hello world. This is a test.")
      == Seq("Hello world.", "This is a test."))
  }

  test("exclamation and question marks") {
    assert(Sentences.split("Really? Yes! Good.") == Seq("Really?", "Yes!", "Good."))
  }

  test("abbreviations do not split") {
    assert(Sentences.split("Dr. Smith visited. Mr. Jones left.")
      == Seq("Dr. Smith visited.", "Mr. Jones left."))
  }

  test("initials do not split") {
    assert(Sentences.split("J. Smith wrote it. K. Jones read it.")
      == Seq("J. Smith wrote it.", "K. Jones read it."))
  }

  test("decimal numbers do not split") {
    assert(Sentences.split("Pi is 3.14 roughly. True.")
      == Seq("Pi is 3.14 roughly.", "True."))
  }

  test("no terminal punctuation yields one sentence") {
    assert(Sentences.split("no punctuation here") == Seq("no punctuation here"))
  }

  test("empty text") {
    assert(Sentences.split("") == Seq.empty)
    assert(Sentences.split("   ") == Seq.empty)
  }

  test("lowercase continuation does not split") {
    assert(Sentences.split("It cost 5. dollars more.") == Seq("It cost 5. dollars more."))
  }

  test("closing quote after period") {
    assert(Sentences.split("He said \"stop.\" Then left.")
      == Seq("He said \"stop.\"", "Then left."))
  }
}
