package graft.textprep

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class UrlCanonSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def canon(us: String*): Seq[String] =
    us.toDF("url")
      .select(UrlCanon.canonical(col("url")).as("c"))
      .as[String]
      .collect()
      .toSeq

  test("canonical: fragment, host case, default ports, utm params, trailing slash") {
    val got = canon(
      "HTTPS://Example.COM:443/Docs/A/?utm_source=f&ref=1#frag",
      "http://example.com:80/a/b/",
      "http://example.com:8080/a",          // non-default port survives
      "https://example.com/p?utm_a=1&utm_b=2", // all-utm query vanishes
      "https://example.com/p?ref=1&utm_b=2&utm_c=3",
      "https://example.com/P?Ref=1",        // path/query case significant
      "not a url at all"                    // headless input unchanged
    )
    assert(got == Seq(
      "https://example.com/Docs/A/?ref=1",
      "http://example.com/a/b",
      "http://example.com:8080/a",
      "https://example.com/p",
      "https://example.com/p?ref=1",
      "https://example.com/P?Ref=1",
      "not a url at all"
    ))
  }

  test("canonical: bare host roots collapse together") {
    val got = canon(
      "https://EXAMPLE.com",
      "https://example.com/",
      "https://example.com:443//"
    )
    assert(got.toSet == Set("https://example.com"))
  }

  test("dedupPages: freshest crawl wins per canonical url, ties by min raw url") {
    import graft.model.Page
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val pages = Seq(
      Page("https://a.com/x?utm_s=1", ts("2024-01-01 00:00:00"), Array[Byte](), "stale", "en"),
      Page("HTTPS://A.COM/x", ts("2024-02-01 00:00:00"), Array[Byte](), "fresh", "en"),
      Page("https://a.com/y", ts("2024-01-15 00:00:00"), Array[Byte](), "only", "en"),
      // same canonical AND same warc_ts as the fresh one: min url wins
      Page("https://a.com/x#f", ts("2024-02-01 00:00:00"), Array[Byte](), "tiebreak", "en")
    ).toDS()
    val kept = UrlCanon.dedupPages(pages).collect().map(_.text).toSet
    assert(kept == Set("fresh", "only"))
  }

  test("canonicalKeep: min doc_id per canonical group wins") {
    val df = Seq(
      (1L, "https://a.com/x?utm_s=1"),
      (2L, "HTTPS://A.COM/x"),
      (3L, "https://a.com/y")
    ).toDF("doc_id", "url")
    val got = UrlCanon.canonicalKeep(df).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("url_canon"), r.getAs[Long]("keep")))
      .toSet
    assert(got == Set(
      (1L, "https://a.com/x", 1L),
      (2L, "https://a.com/x", 0L),
      (3L, "https://a.com/y", 1L)
    ))
  }
}
