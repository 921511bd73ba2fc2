package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.extract.TokenRules

/** Document deduplication operators for a training-data pipeline over the
  * `documents` table — exact, n-gram Jaccard, MinHash+LSH, and SimHash.
  * Every variant is a declarative Column pipeline whose rules are shared
  * verbatim with the DuckDB oracles (integer/string-only comparisons, no
  * float drift).
  *
  * Scale design:
  *   - exact dedup is one hash aggregate (map-side combined);
  *   - pairwise variants never go quadratic: block-scoped self-joins
  *     (`source`) for the exact-Jaccard baseline, banded-MinHash buckets
  *     with a deterministic sorted-window cap for the global LSH path;
  *   - MinHash signatures are md5-order minima — pure codegen'd
  *     expressions (array_min over transform), no UDF.
  */
object Dedup {

  /** Distinct sorted token set per document. */
  private def tokenSets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("source"),
      array_sort(array_distinct(TokenRules.tokens(col("text")))).as("toks")
    )

  /** Exact duplicate assignment: (doc_id, dup_of = min doc_id with
    * byte-identical text), emitted only for true duplicates.
    */
  def exact(docs: DataFrame): DataFrame = {
    val canon = docs
      .groupBy("text")
      .agg(min("doc_id").as("dup_of"))
    docs
      .join(canon, "text")
      .where(col("doc_id") =!= col("dup_of"))
      .select("doc_id", "dup_of")
  }

  /** Exact n-gram (token-set) Jaccard pairs within `source` blocks:
    * emits (a, b, inter, uni) for 100*inter >= thetaPct*uni. Integer
    * comparison — bit-identical across engines.
    */
  def ngramJaccardPairs(docs: DataFrame, thetaPct: Int = 90): DataFrame = {
    val t = tokenSets(docs)
    val a = t.select(col("source"), col("doc_id").as("a"), col("toks").as("atoks"))
    val b = t.select(col("source"), col("doc_id").as("b"), col("toks").as("btoks"))
    a.join(b, Seq("source"))
      .where(col("a") < col("b"))
      .select(
        col("a"),
        col("b"),
        size(array_intersect(col("atoks"), col("btoks"))).cast("long").as("inter"),
        size(array_union(col("atoks"), col("btoks"))).cast("long").as("uni")
      )
      .where(lit(100) * col("inter") >= lit(thetaPct) * col("uni"))
  }

  /** md5-order MinHash signature column: per seed i, the minimum of
    * md5("i:" + token) over the document's distinct tokens. Shared rule
    * with the oracle: list_min(list_transform(...)) there.
    */
  private def minhashSig(toksCol: String, seeds: Int): Seq[org.apache.spark.sql.Column] =
    (0 until seeds).map { i =>
      expr(s"array_min(transform($toksCol, t -> md5(concat('$i:', t))))").as(s"mh$i")
    }

  /** Global (un-blocked) MinHash+LSH near-duplicate pairs:
    * shingle->minhash->band->bucket-join, then exact token-set Jaccard
    * verification at thetaPct. Candidates inside a band bucket pair
    * sorted-window style (each doc with the next `cap` docs by doc_id) —
    * deterministic and never quadratic in bucket size.
    */
  def minhashLshPairs(
      docs: DataFrame,
      thetaPct: Int = 90,
      seeds: Int = 16,
      bands: Int = 8,
      cap: Int = 10
  ): DataFrame = {
    val rows = seeds / bands
    val t = tokenSets(docs)
    val sig = t.select(col("doc_id") +: col("toks") +: minhashSig("toks", seeds): _*)
    val bandKeyCols = (0 until bands).map { bIdx =>
      md5(concat_ws("|", (0 until rows).map(r => col(s"mh${bIdx * rows + r}")): _*)).as("bandKey")
    }
    val banded = bandKeyCols
      .map(k => sig.select(col("doc_id"), k))
      .reduce(_ union _)
      .distinct()
    val w = Window.partitionBy("bandKey").orderBy("doc_id")
    val windowCands = (1 to cap)
      .map(d => banded.withColumn("b", lead(col("doc_id"), d).over(w)))
      .reduce(_ union _)
      .where(col("b").isNotNull)
      .select(col("doc_id").as("a"), col("b"))
    // star edges to the bucket minimum: O(bucket) extra candidates that
    // catch partners beyond the window cap
    val starCands = banded
      .withColumn("a", min("doc_id").over(Window.partitionBy("bandKey")))
      .where(col("a") < col("doc_id"))
      .select(col("a"), col("doc_id").as("b"))
    val cands = windowCands.union(starCands).distinct()
    val ta = t.select(col("doc_id").as("a"), col("toks").as("atoks"))
    val tb = t.select(col("doc_id").as("b"), col("toks").as("btoks"))
    cands
      .join(ta, "a")
      .join(tb, "b")
      .select(
        col("a"),
        col("b"),
        size(array_intersect(col("atoks"), col("btoks"))).cast("long").as("inter"),
        size(array_union(col("atoks"), col("btoks"))).cast("long").as("uni")
      )
      .where(lit(100) * col("inter") >= lit(thetaPct) * col("uni"))
  }

  val SimhashBits = 16

  /** 16-bit SimHash per document over the token multiset. Bit j of a
    * token's hash is the high bit of hex nibble j of md5(token); the
    * document bit is the sign of the summed ±1 contributions. All string
    * and integer ops — identical in both engines.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(TokenRules.tokens(col("text"))).as("tok"))
    val withH = toks.withColumn("h", md5(col("tok").cast("binary")))
    val bitSums = (0 until SimhashBits).map { j =>
      sum(
        when(substring(col("h"), j + 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1L)
          .otherwise(-1L)
      ).as(s"s$j")
    }
    val agg = withH.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val shExpr = (0 until SimhashBits)
      .map(j => s"(CASE WHEN s$j > 0 THEN ${1L << j}L ELSE 0L END)")
      .mkString(" + ")
    agg.select(col("doc_id"), expr(shExpr).as("simhash"))
  }

  /** SimHash near-duplicate pairs within source blocks: hamming distance
    * (popcount of xor) at most `maxHamming`.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sh = simhash(docs)
      .join(docs.select("doc_id", "source"), "doc_id")
    val a = sh.select(col("source"), col("doc_id").as("a"), col("simhash").as("sa"))
    val b = sh.select(col("source"), col("doc_id").as("b"), col("simhash").as("sb"))
    a.join(b, Seq("source"))
      .where(col("a") < col("b"))
      .withColumn("hamming", expr("bit_count(sa ^ sb)").cast("long"))
      .where(col("hamming") <= maxHamming)
      .select("a", "b", "hamming")
  }
}
