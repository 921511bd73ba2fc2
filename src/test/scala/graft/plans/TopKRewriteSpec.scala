package graft.plans

import graft.functions.GraftFunctions
import graft.{GenSampling, SparkTestBase}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** TopKRewrite: same rows as the un-rewritten window plan, Window node
  * gone from matching plans, non-matching patterns untouched.
  */
class TopKRewriteSpec extends AnyFunSuite with GenSampling with SparkTestBase {

  private lazy val optSession: SparkSession = {
    val s = spark.newSession()
    GraftFunctions.installOptimizations(s)
    s
  }

  private def hasWindow(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists {
      case _: org.apache.spark.sql.catalyst.plans.logical.Window => true
      case _                                                     => false
    }

  private def topkQuery(s: SparkSession, rows: Seq[(Long, Long, Long)], k: Int): DataFrame = {
    import s.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val df = rows.toDF("q", "n", "score").repartition(5)
    val w = Window.partitionBy("q").orderBy(desc("score"), asc("n"))
    df.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select("q", "n", "score", "rnk")
  }

  private val rowsGen: Gen[List[(Long, Long, Long)]] =
    Gen.choose(20, 80).flatMap { n =>
      Gen.listOfN(
        n,
        for {
          q <- Gen.choose(0L, 4L)
          id <- Gen.choose(0L, 300L)
          sc <- Gen.choose(-5L, 5L) // ties guaranteed
        } yield (q, id, sc)
      )
    }

  test("rewritten plan drops the Window and matches the window results") {
    forAllSamples(rowsGen, n = 10) { raw =>
      val rows = raw.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq // unique (q, n)
      val plain = topkQuery(spark, rows, 3)
      val opt = topkQuery(optSession, rows, 3)
      assert(hasWindow(plain), "baseline session must keep the window")
      assert(!hasWindow(opt), "rule session must rewrite the window away")
      val a = plain.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
      val b = opt.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
      assert(b == a)
    }
  }

  test("global top-k (no partitionBy) rewrites too") {
    import optSession.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val df = (1L to 50L).map(i => (i, i * 7 % 13)).toDF("id", "v").repartition(4)
    val w = Window.orderBy(desc("v"), asc("id"))
    val q = df.withColumn("rnk", row_number().over(w)).where(col("rnk") <= 5)
    assert(!hasWindow(q))
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toList.sortBy(_._3)
    val expected = (1L to 50L)
      .map(i => (i, i * 7 % 13))
      .sortBy { case (id, v) => (-v, id) }
      .take(5)
      .zipWithIndex
      .map { case ((id, v), i) => (id, v, i + 1) }
      .toList
    assert(got == expected)
  }

  test("the cast('long') idiom rewrites too") {
    import optSession.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val df = Seq((1L, 10L, 5L), (1L, 11L, 9L), (1L, 12L, 7L), (2L, 13L, 1L)).toDF("q", "n", "score")
      .repartition(3)
    val w = Window.partitionBy("q").orderBy(desc("score"), asc("n"))
    val q = df
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= 2L)
    assert(!hasWindow(q), "cast-wrapped rnk filter must still rewrite")
    val out = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(out == Set((1L, 11L, 9L, 1L), (1L, 12L, 7L, 2L), (2L, 13L, 1L, 1L)))
  }

  test("non-matching patterns keep their window") {
    import optSession.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val df = Seq((1L, 2L, 3L), (1L, 3L, 4L)).toDF("q", "n", "score")
    val w = Window.partitionBy("q").orderBy(desc("score"))
    // rank() instead of row_number()
    assert(hasWindow(df.withColumn("r", rank().over(w)).where(col("r") <= 2)))
    // filter direction not a top-k bound
    assert(hasWindow(df.withColumn("r", row_number().over(w)).where(col("r") > 2)))
    // k over the rewrite cap
    assert(hasWindow(df.withColumn("r", row_number().over(w)).where(col("r") <= 100000)))
    // non-heap-comparable payload column (array) must bail
    val withArr = df.withColumn("arr", array(col("n")))
    assert(hasWindow(withArr.withColumn("r", row_number().over(w)).where(col("r") <= 2)))
  }

  test("rnk aliases and downstream projections survive the rewrite") {
    import optSession.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val df = Seq((1L, 10L, 5L), (1L, 11L, 9L), (1L, 12L, 7L), (2L, 13L, 1L)).toDF("q", "n", "score")
    val w = Window.partitionBy("q").orderBy(desc("score"), asc("n"))
    val out = df
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= 2)
      .select(col("q"), col("n"), (col("rnk") * 10).as("rnk10"), col("score"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .toSet
    assert(out == Set((1L, 11L, 10, 9L), (1L, 12L, 20, 7L), (2L, 13L, 10, 1L)))
  }
}
