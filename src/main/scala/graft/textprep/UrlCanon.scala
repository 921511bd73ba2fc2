package graft.textprep

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.Page

/** URL canonicalization for Common-Crawl-style ingest: the same page is
  * crawled under fragment/tracking-parameter/port/case variants, and a
  * web-scale pipeline dedups by CANONICAL url before any content pass
  * (the cheapest dedup tier — pure per-row string work, zero shuffle
  * until the keep-list aggregate). The reference ingests pre-cleaned
  * text and never faces this; it is part of the corpus-hygiene surface
  * a 100 TB crawl table needs in front of generate().
  *
  * Canonical form (rule shared verbatim with the DuckDB oracle; each
  * step is a plain regexp/CASE both engines evaluate identically):
  *   1. drop the fragment (`#...`);
  *   2. lowercase the `scheme://host[:port]` head (path/query case is
  *      significant, host case is not);
  *   3. drop a default port (`:80` on http, `:443` on https);
  *   4. drop `utm_*` tracking parameters, fixing `?`/`&` stitching;
  *   5. drop trailing slashes of a query-less path.
  * A string with no `scheme://host` head is returned unchanged.
  *
  * All steps are codegen'd string expressions — no UDF, no shuffle.
  */
object UrlCanon {

  def canonical(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*", "")
    val head = regexp_extract(noFrag, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", 0)
    val rest = noFrag.substr(length(head) + 1, length(noFrag))
    val hl = lower(head)
    val h2 = when(hl.startsWith("http://") && hl.endsWith(":80"), hl.substr(lit(1), length(hl) - 3))
      .when(hl.startsWith("https://") && hl.endsWith(":443"), hl.substr(lit(1), length(hl) - 4))
      .otherwise(hl)
    val r1 = regexp_replace(rest, "&utm_[^=&]*=[^&]*", "")
    val r2 = regexp_replace(r1, "\\?utm_[^=&]*=[^&]*&", "?")
    val r3 = regexp_replace(r2, "\\?utm_[^=&]*=[^&]*$", "")
    val r4 = when(!r3.contains("?"), regexp_replace(r3, "/+$", "")).otherwise(r3)
    when(head === "", u).otherwise(concat(h2, r4))
  }

  /** Keep-list by canonical url: adds `url_canon` and `keep` (1 for the
    * minimum `idCol` of each canonical group — the deterministic "first
    * crawl wins" representative). Map-side-combined groupBy-min + an
    * equi-join back, NOT a min-over-window: a hot canonical url (a page
    * duplicated across the whole crawl) is exactly the skewed key here,
    * and the window form would sort that group's full population in one
    * task while the partial aggregate collapses it map-side.
    */
  def canonicalKeep(df: DataFrame, urlCol: String = "url", idCol: String = "doc_id"): DataFrame = {
    val withCanon = df.withColumn("url_canon", canonical(col(urlCol)))
    val minIds = withCanon
      .groupBy("url_canon")
      .agg(min(idCol).as("__min_id"))
    withCanon
      .join(minIds, Seq("url_canon"))
      .withColumn("keep", when(col(idCol) === col("__min_id"), 1L).otherwise(0L))
      .drop("__min_id")
  }

  /** Crawl-table page dedup: one page per canonical url, freshest crawl
    * wins (max warc_ts, ties broken by min raw url, then by content
    * hash — fully deterministic even when a duplicated ingest row
    * carries the same url+timestamp with divergent payloads). The
    * ingest-side guard the KG pipeline runs before chunking when the
    * same page was fetched under several url variants or across
    * recrawls ([[graft.pipeline.KgGenJob.JobConfig.dedupUrls]]).
    */
  def dedupPages(pages: Dataset[Page]): Dataset[Page] = {
    import pages.sparkSession.implicits._
    val df = pages.toDF()
    // min_by over a composite sort key (negated epoch-micros = freshest
    // first, then url, then content hash) — ONE map-side-combined hash
    // aggregate per canonical group. The row_number-window formulation
    // would sort a hot canonical group's entire population in one task;
    // a page duplicated across the crawl is exactly that hot key.
    // the tie-break covers EVERY payload field (text, html bytes, lang):
    // rows identical in (ts, url, text) but divergent in html would
    // otherwise be picked by aggregation encounter order
    val ord = struct(
      (-unix_micros(col("warc_ts"))).as("nts"),
      col("url"),
      md5(col("text")).as("h"),
      md5(col("html")).as("hh"),
      col("lang")
    )
    df.withColumn("url_canon", canonical(col("url")))
      .groupBy("url_canon")
      .agg(min_by(struct(df.columns.map(col): _*), ord).as("p"))
      .select("p.*")
      .as[Page]
  }
}
