package graft.cluster

/** Deterministic surface-form normalization — the blocking key that
  * replaces the reference's LLM clustering criterion: items "the same in
  * meaning, with different tenses, plural forms, stem forms, or cases"
  * (src/kg_gen/steps/_3_cluster_graph.py:36-39,53-56).
  *
  * Case folding handles "cases"; the suffix rules below (a Porter-step-1
  * style first-match list) handle plural/tense/stem. They are shared
  * verbatim with the DuckDB oracle (`Sql.normCase`), so the driver's
  * correctness gate checks the exact same rule set the engine runs.
  */
object Normalize {

  /** First-match suffix rule for a single lowercase word. */
  def word(w: String): String =
    if (w.length > 4 && w.endsWith("ies")) w.dropRight(3) + "i"
    else if (w.length > 5 && w.endsWith("sses")) w.dropRight(2)
    else if (w.endsWith("ss")) w
    else if (w.length > 3 && w.endsWith("s")) w.dropRight(1)
    else if (w.length > 5 && w.endsWith("ing")) w.dropRight(3)
    else if (w.length > 4 && w.endsWith("ed")) w.dropRight(2)
    else w

  /** Full surface normalization: trim, collapse whitespace, lowercase,
    * per-word suffix rule.
    */
  def apply(surface: String): String =
    surface.trim
      .split("\\s+")
      .filter(_.nonEmpty)
      // Locale.ROOT: the distributed twin lowercases with Spark's
      // locale-independent lower(); a tr/az default locale would
      // otherwise fold 'I' differently and split the blocking keys
      .map(t => word(t.toLowerCase(java.util.Locale.ROOT)))
      .mkString(" ")

  /** Character k-shingles of a normalized form (whole string if shorter
    * than k) — the similarity unit for near-duplicate surface detection.
    */
  def shingles(s: String, k: Int = 3): Seq[String] =
    if (s.length <= k) Seq(s) else s.sliding(k).toSeq

  def jaccard(a: String, b: String, k: Int = 3): Double = {
    val sa = shingles(a, k).toSet
    val sb = shingles(b, k).toSet
    val inter = (sa & sb).size
    if (inter == 0) 0.0 else inter.toDouble / (sa | sb).size
  }

  /** One surface a prefix of the other, with length ratio >= `ratio` —
    * catches stem truncation ("purs"/"pursue") and abbreviation
    * ("Josh"/"Joshua"; the wikiqa dedup criterion adds abbreviation/
    * shorthand — experiments/wikiqa/utils/cluster_and_deduplication.py:269).
    */
  def prefixMatch(a: String, b: String, ratio: Double): Boolean = {
    val (short, long) = if (a.length <= b.length) (a, b) else (b, a)
    long.startsWith(short) && short.length.toDouble / long.length >= ratio
  }

  object Sql {
    /** The suffix rule as a CASE expression over an expression `w`
      * (already lowercased/trimmed, single-word) — valid in both Spark
      * SQL and DuckDB.
      */
    def normCase(w: String): String =
      s"CASE WHEN length($w) > 4 AND $w LIKE '%ies' THEN substr($w, 1, length($w)-3) || 'i' " +
        s"WHEN length($w) > 5 AND $w LIKE '%sses' THEN substr($w, 1, length($w)-2) " +
        s"WHEN $w LIKE '%ss' THEN $w " +
        s"WHEN length($w) > 3 AND $w LIKE '%s' THEN substr($w, 1, length($w)-1) " +
        s"WHEN length($w) > 5 AND $w LIKE '%ing' THEN substr($w, 1, length($w)-3) " +
        s"WHEN length($w) > 4 AND $w LIKE '%ed' THEN substr($w, 1, length($w)-2) " +
        s"ELSE $w END"
  }
}
