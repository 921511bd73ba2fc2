package graft.textprep

import scala.collection.mutable.ArrayBuffer

/** Deterministic rule-based sentence segmenter — the engine's stand-in for
  * NLTK punkt (reference: nltk.sent_tokenize at
  * src/kg_gen/utils/chunk_text.py:27). Punkt is a trained statistical
  * model; shipping one offline is impossible, so segmentation here is a
  * fixed rule set and the corpus generator only emits sentence shapes on
  * which the two agree (SURVEY.md §7.2, §7.5 risk 1).
  *
  * Rules (single pass, O(n), no regex backtracking):
  *   - A sentence ends at '.', '!' or '?' — optionally followed by closing
  *     quotes/brackets ("'")]’”) — when followed by whitespace and then a
  *     plausible sentence start (uppercase letter, digit, or opening
  *     quote/bracket), or at end of text.
  *   - A '.' does NOT end a sentence when it terminates a known
  *     abbreviation (mr, mrs, ms, dr, prof, sr, jr, st, vs, etc, e.g, i.e,
  *     fig, no, vol, inc, ltd, co, u.s, u.k), when it is part of a number
  *     (digit on both sides), or when it follows a single capital letter
  *     (an initial, "J. Smith").
  *   - Whitespace between sentences is consumed; each sentence is emitted
  *     trimmed, with internal whitespace intact (punkt also returns the
  *     original sentence spans).
  */
object Sentences {

  private val abbreviations: Set[String] = Set(
    "mr", "mrs", "ms", "dr", "prof", "sr", "jr", "st", "vs", "etc",
    "e.g", "i.e", "fig", "no", "vol", "inc", "ltd", "co", "u.s", "u.k",
    "approx", "dept", "est", "jan", "feb", "mar", "apr", "jun", "jul",
    "aug", "sep", "sept", "oct", "nov", "dec"
  )

  private def isCloser(c: Char): Boolean =
    c == '"' || c == '\'' || c == ')' || c == ']' || c == '’' || c == '”'

  private def isOpener(c: Char): Boolean =
    c == '"' || c == '\'' || c == '(' || c == '[' || c == '‘' || c == '“'

  private def isSentenceStart(c: Char): Boolean =
    Character.isUpperCase(c) || Character.isDigit(c) || isOpener(c)

  /** The word (letters and internal dots) immediately before index `i`
    * (exclusive), lower-cased; used for abbreviation detection.
    */
  private def wordBefore(text: String, i: Int): String = {
    var s = i
    while (s > 0 && {
        val c = text.charAt(s - 1)
        Character.isLetter(c) || c == '.'
      }) s -= 1
    // Locale.ROOT: abbreviation matching must be locale-independent
    // ("I" folds to dotless ı under a tr default locale)
    text.substring(s, i).toLowerCase(java.util.Locale.ROOT).stripPrefix(".")
  }

  def split(text: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    val n = text.length
    var start = 0
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (c == '.' || c == '!' || c == '?') {
        var end = i + 1
        while (end < n && isCloser(text.charAt(end))) end += 1
        val boundary =
          if (c != '.') true
          else {
            val prevDigit = i > 0 && Character.isDigit(text.charAt(i - 1))
            val nextDigit = i + 1 < n && Character.isDigit(text.charAt(i + 1))
            val w = wordBefore(text, i)
            val isAbbrev = abbreviations.contains(w)
            val isInitial = w.length == 1 && i > 0 && Character.isUpperCase(text.charAt(i - 1))
            !(prevDigit && nextDigit) && !isAbbrev && !isInitial
          }
        if (boundary) {
          // need whitespace then a sentence start, or end of text
          var j = end
          while (j < n && Character.isWhitespace(text.charAt(j))) j += 1
          val atEof = j >= n
          val starts = !atEof && j > end && isSentenceStart(text.charAt(j))
          if (atEof || starts) {
            val s = text.substring(start, end).trim
            if (s.nonEmpty) out += s
            start = j
            i = j
          } else i = end
        } else i = end
      } else i += 1
    }
    if (start < n) {
      val s = text.substring(start).trim
      if (s.nonEmpty) out += s
    }
    out.toSeq
  }
}
