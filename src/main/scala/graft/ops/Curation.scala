package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The assembled corpus-prep decision: every document's final
  * keep/drop verdict with the reason a data-prep job would log —
  * quality-rule failures first ([[TextAnalysis.curate]]), then exact
  * duplicates ([[Dedup.exact]]), then mixture down-sampling
  * ([[Sampling.mixtureSample]]'s rule). This is the table a 100 TB
  * curation run actually writes: one row per input document, auditable
  * (every drop carries its rule), and re-runnable (all three inputs are
  * deterministic).
  */
object Curation {

  /** RE2-compatible PII patterns (no backreferences/lookaround, so the
    * Java-regex and DuckDB-RE2 engines match identically).
    */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhoneRe = "\\d{3}-\\d{3}-\\d{4}"

  /** PII redaction — the scrub pass a web-corpus curation run applies
    * before training (emails and phone-shaped numbers replaced with
    * typed placeholders, counts kept for audit). Output:
    * (doc_id, n_emails, n_phones, text_clean).
    *
    * Shape at scale: a pure per-row projection — counts and the double
    * regexp_replace evaluate inside one codegen'd expression tree, so
    * scrubbing 100 TB costs exactly one scan with zero exchanges.
    * Counts are taken on the ORIGINAL text (replacement order can't
    * perturb them), and the email pass runs before the phone pass so
    * the composition is deterministic.
    */
  def redact(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      regexp_count(col("text"), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(PhoneRe)).cast("long").as("n_phones"),
      regexp_replace(
        regexp_replace(col("text"), lit(EmailRe), lit("<email>")),
        lit(PhoneRe),
        lit("<phone>")
      ).as("text_clean")
    )

  /** Per-document verdict: (doc_id, source, verdict, keep).
    *
    * Verdict precedence mirrors the order a pipeline applies the
    * filters: the curation chain's first failing rule, else
    * 'duplicate' (an earlier doc has identical text), else
    * 'sampled_out' (the deterministic mixture hash exceeds this
    * domain's rate), else 'keep'.
    *
    * Shape at scale: the curation signals are a zero-shuffle
    * projection; exact-dup needs one shuffle of (fingerprint, doc_id);
    * the dup flag and reason join back on doc_id (the dup side is the
    * duplicate subset — AQE broadcasts it when small). No step touches
    * document bodies after the first scan.
    */
  def corpusDecision(docs: DataFrame, ratePct: Column): DataFrame = {
    val reasons = TextAnalysis.curate(docs).select(col("doc_id"), col("reason"))
    val dups = Dedup.exact(docs).select(col("doc_id"), lit(1L).as("is_dup"))
    docs
      .select(col("doc_id"), col("source"), ratePct.cast("long").as("rate_pct"))
      .join(reasons, Seq("doc_id"), "left")
      .join(dups, Seq("doc_id"), "left")
      .withColumn(
        "verdict",
        expr(
          """CASE
             WHEN COALESCE(reason, 'too_short') <> 'ok' THEN COALESCE(reason, 'too_short')
             WHEN is_dup = 1 THEN 'duplicate'
             WHEN pmod(doc_id * 2654435761L + 97L, 4294967296L) % 100 >= rate_pct THEN 'sampled_out'
             ELSE 'keep' END"""
        )
      )
      .select(
        col("doc_id"),
        col("source"),
        col("verdict"),
        expr("IF(verdict = 'keep', 1L, 0L)").as("keep")
      )
  }

  /** Curation funnel — the pipeline-observability rollup of
    * [[corpusDecision]]: per verdict (keep / each drop reason /
    * duplicate / sampled_out), the document count, its permille of the
    * corpus, and how many distinct sources the verdict touches. The
    * one table a corpus-prep run prints to say where the bytes went.
    * Output: (verdict, n_docs, permille, n_sources).
    *
    * Shape at scale: the shared decision pass plus ONE verdict-keyed
    * aggregate (≤ a dozen groups) and a 1-row total crossJoin.
    */
  def funnel(docs: DataFrame, ratePct: Column): DataFrame = {
    val dec = graft.util.Materialize.stage(corpusDecision(docs, ratePct))
    val total = dec.agg(count(lit(1)).as("total"))
    dec
      .groupBy("verdict")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources")
      )
      .crossJoin(total)
      .select(
        col("verdict"),
        col("n_docs"),
        expr("(1000 * n_docs) div total").as("permille"),
        col("n_sources")
      )
  }
}
