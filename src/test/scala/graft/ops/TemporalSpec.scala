package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class TemporalSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, String, Long, Double)]) =
    rows
      .toDF("event_id", "user_id", "event_type", "sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .drop("sec")

  test("scd2: validity intervals chain per user, open-ended current row") {
    val events = ev(
      Seq(
        (1L, 1L, "view", 10L, 1.5),
        (2L, 1L, "view", 20L, 2.0),
        (3L, 1L, "purchase", 15L, 9.9), // other type: ignored
        (4L, 2L, "view", 30L, 0.25)
      )
    )
    val got = Temporal.scd2(events).collect()
      .map(r =>
        (r.getLong(0), r.getLong(1),
          r.getTimestamp(2).getTime / 1000,
          Option(r.getTimestamp(3)).map(_.getTime / 1000))
      )
      .toSet
    assert(got == Set(
      (1L, 1500L, 10L, Some(20L)),
      (1L, 2000L, 20L, None),
      (2L, 250L, 30L, None)
    ))
  }

  test("asofJoin: at-or-before with tie inclusion, per-user isolation, same-ts quote tiebreak") {
    val events = ev(
      Seq(
        (1L, 1L, "view", 10L, 2.0), // quote
        (2L, 1L, "purchase", 10L, 9.9), // probe, ties with quote 1 -> included
        (3L, 1L, "purchase", 5L, 9.9), // probe before any quote -> null
        (4L, 1L, "view", 20L, 3.5),
        (5L, 1L, "view", 20L, 4.0), // same-ts quotes: event_id order -> 5 wins
        (6L, 1L, "purchase", 25L, 9.9),
        (7L, 2L, "purchase", 100L, 9.9) // other user: no quotes of its own
      )
    )
    val got = Temporal
      .asofJoin(events)
      .collect()
      .map(r => (r.getLong(0), Option(r.get(2)).map(_.asInstanceOf[Long]), Option(r.get(3)).map(_.asInstanceOf[Long])))
      .toSet
    val want = Set(
      (2L, Some(1L), Some(2000L)),
      (3L, None, None),
      (6L, Some(5L), Some(4000L)),
      (7L, None, None)
    )
    assert(got == want)
  }

  test("rangeJoin: [t, t+horizon) boundaries, next-bucket candidates, per-user isolation") {
    val events = ev(
      Seq(
        (1L, 1L, "signup", 0L, 0.0),
        (2L, 1L, "purchase", 0L, 1.0), // lag 0: in
        (3L, 1L, "purchase", 3599L, 1.0), // lag 3599: in
        (4L, 1L, "purchase", 3600L, 1.0), // lag 3600: out (half-open)
        (5L, 1L, "signup", 3590L, 0.0),
        (6L, 1L, "purchase", 7180L, 1.0), // bucket 1 vs signup-5 bucket 0: next-bucket path, lag 3590 in
        (7L, 1L, "purchase", 7190L, 1.0), // lag 3600 from signup 5: out
        (8L, 2L, "purchase", 10L, 1.0) // other user: never joined
      )
    )
    val got = Temporal
      .rangeJoin(events)
      .select("probe_id", "target_id", "lag_sec")
      .as[(Long, Long, Long)]
      .collect()
      .toSet
    val want = Set(
      (1L, 2L, 0L),
      (1L, 3L, 3599L),
      (5L, 3L, 9L), // purchase 3 (sec 3599) is also inside signup 5's window
      (5L, 4L, 10L), // purchase 4 (sec 3600) is inside signup 5's window
      (5L, 6L, 3590L)
    )
    assert(got == want)
  }

  test("latencyHistogram: log2 lag buckets with exact min/max per bucket") {
    val events = ev(
      Seq(
        (1L, 1L, "signup", 0L, 0.0),
        (2L, 1L, "purchase", 0L, 1.0), // lag 0 → bucket 0
        (3L, 1L, "purchase", 1L, 1.0), // lag 1 → bucket 1
        (4L, 1L, "purchase", 5L, 1.0), // lag 5 → bin(101) → bucket 3
        (5L, 1L, "purchase", 100L, 1.0), // lag 100 → 7-bit → bucket 7
        (6L, 1L, "purchase", 4000L, 1.0) // outside the 3600 s horizon
      )
    )
    val got = Temporal.latencyHistogram(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      (0L, 1L, 0L, 0L),
      (1L, 1L, 1L, 1L),
      (3L, 1L, 5L, 5L),
      (7L, 1L, 100L, 100L)
    ))
  }
}
