package graft.textprep

import java.nio.charset.StandardCharsets

/** Per-page text extraction: html BINARY -> extracted text STRING.
  *
  * The BASELINE input contract carries both `html` and `text` columns and
  * demands a *byte-identical per-url* extracted text. This function IS the
  * spec (SURVEY.md §7.5): a pure, total function with golden byte tests.
  * The reference consumes pre-extracted plain text (its inputs are `str` —
  * src/kg_gen/kg_gen.py:149-195), so the extractor here is the inverse of
  * the corpus generator's html renderer plus whitespace normalization.
  *
  * Determinism rules (applied in order):
  *   1. UTF-8 decode (malformed bytes -> U+FFFD, the JDK default — total).
  *   2. Strip `<script>`/`<style>` elements including content.
  *   3. Replace every remaining tag with a single space; decode the five
  *      basic entities (&amp; &lt; &gt; &quot; &#39;) and numeric refs.
  *   4. Collapse runs of whitespace to one space; trim.
  *
  * All regex-free scanning: single left-to-right pass, O(n), no
  * backtracking — safe against adversarial pages at 10^12-document scale.
  */
object TextExtract {

  def extract(html: Array[Byte]): String =
    extractFromString(new String(html, StandardCharsets.UTF_8))

  def extractFromString(html: String): String = {
    val n = html.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        val close = html.indexOf('>', i + 1)
        if (close < 0) { i = n } // unterminated tag: drop the tail
        else {
          val tag = html.substring(i + 1, close)
          val name = tagName(tag)
          if (name == "script" || name == "style") {
            // skip to the matching close tag (case-insensitive)
            val end = indexOfCloseTag(html, close + 1, name)
            out.append(' ')
            i = if (end < 0) n else end
          } else {
            out.append(' ')
            i = close + 1
          }
        }
      } else if (c == '&') {
        // bounded probe: an entity is accepted only within 10 chars, so
        // never scan further for the ';' — an unbounded indexOf is O(n)
        // per '&', quadratic on a page of bare ampersands
        var semi = -1
        var j = i + 1
        val lim = math.min(n, i + 11)
        while (semi < 0 && j < lim) { if (html.charAt(j) == ';') semi = j; j += 1 }
        if (semi > i && semi - i <= 10) {
          val ent = html.substring(i + 1, semi)
          decodeEntity(ent) match {
            case Some(d) => out.append(d); i = semi + 1
            case None    => out.append(c); i += 1
          }
        } else { out.append(c); i += 1 }
      } else {
        out.append(c); i += 1
      }
    }
    collapseWhitespace(out.toString)
  }

  private def tagName(tag: String): String = {
    var s = 0
    if (s < tag.length && tag.charAt(s) == '/') s += 1
    var e = s
    while (e < tag.length && Character.isLetter(tag.charAt(e))) e += 1
    // Locale.ROOT: tag names are ASCII but a tr default locale would
    // fold "DIV" to "dıv" and miss every uppercase tag
    tag.substring(s, e).toLowerCase(java.util.Locale.ROOT)
  }

  /** Index just past `</name ...>` at or after `from`, or -1.
    *
    * Amortized O(n): the next-'>' pointer is monotone (no '>' exists
    * between consecutive '<' probes and the cached position, by
    * construction), and the closing-tag check compares characters in
    * place — a page of a million '<'s before one '>' costs one pass,
    * not the quadratic rescans + substrings of the naive form.
    */
  private def indexOfCloseTag(html: String, from: Int, name: String): Int = {
    var i = from
    var gt = -1
    val n = html.length
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) return -1
      if (gt <= lt) gt = html.indexOf('>', lt + 1)
      if (gt < 0) return -1
      // in-place equivalent of tagName(substring(lt+1, gt)) == name:
      // '/' then the letter run, compared ASCII-case-insensitively
      if (lt + 1 < gt && html.charAt(lt + 1) == '/') {
        val s = lt + 2
        var e = s
        while (e < gt && Character.isLetter(html.charAt(e))) e += 1
        if (e - s == name.length && html.regionMatches(true, s, name, 0, name.length))
          return gt + 1
      }
      i = lt + 1
    }
    -1
  }

  private def decodeEntity(ent: String): Option[String] = ent match {
    case "amp"  => Some("&")
    case "lt"   => Some("<")
    case "gt"   => Some(">")
    case "quot" => Some("\"")
    case "apos" => Some("'")
    case "nbsp" => Some(" ")
    case _ if ent.startsWith("#x") || ent.startsWith("#X") =>
      try Some(new String(Character.toChars(Integer.parseInt(ent.drop(2), 16))))
      catch { case _: Exception => None }
    case _ if ent.startsWith("#") =>
      try Some(new String(Character.toChars(Integer.parseInt(ent.drop(1)))))
      catch { case _: Exception => None }
    case _ => None
  }

  def collapseWhitespace(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) pendingSpace = true
      else {
        if (pendingSpace && out.length > 0) out.append(' ')
        out.append(c)
        pendingSpace = false
      }
      i += 1
    }
    out.toString
  }
}
