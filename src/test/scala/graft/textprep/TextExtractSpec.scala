package graft.textprep

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

/** Golden byte tests for the html->text extractor — the per-row invariant
  * of the input contract (BASELINE input_hint: byte-identical extracted
  * text per url).
  */
class TextExtractSpec extends AnyFunSuite {

  private def ex(s: String): String =
    TextExtract.extract(s.getBytes(StandardCharsets.UTF_8))

  test("simple page") {
    assert(ex("<html><body><p>Hello world.</p></body></html>") == "Hello world.")
  }

  test("tags become single spaces, whitespace collapses") {
    assert(ex("<p>Linda is Joshua's mother.</p>\n<p>Ben  is  Josh's brother.</p>")
      == "Linda is Joshua's mother. Ben is Josh's brother.")
  }

  test("script and style content dropped") {
    assert(ex("<p>keep</p><script>var x = 'drop';</script><style>p{}</style><p>also keep</p>")
      == "keep also keep")
  }

  test("entities decoded") {
    assert(ex("a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39; &#x41;") == "a & b <c> \"d\" 'e' A")
  }

  test("unknown entity left intact") {
    assert(ex("R&D dept; x &bogus; y") == "R&D dept; x &bogus; y")
  }

  test("unterminated tag drops the tail") {
    assert(ex("ok <broken") == "ok")
  }

  test("pure function: same bytes, same text (golden)") {
    val html = "<html><head><title>T</title></head><body><h1>Head</h1><p>Body &amp; soul.</p></body></html>"
    val expected = "T Head Body & soul."
    (1 to 3).foreach(_ => assert(ex(html) == expected))
  }

  test("utf-8 multibyte preserved") {
    assert(ex("<p>naïve café — über</p>") == "naïve café — über")
  }
}
