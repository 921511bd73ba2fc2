package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: sparse BM25 candidate generation, dense cosine
  * re-ranking, reciprocal-rank fusion — the production two-stage search
  * shape, and the Spark re-expression of the reference's rank-fusion
  * retrieval (0.5·BM25 + 0.5·cosine candidate ranking in
  * experiments/wikiqa/utils/cluster_and_deduplication.py:128-149; RRF is
  * the rank-space version that needs no score normalization and stays
  * integer-exact).
  */
object Hybrid {

  /** Two-stage hybrid search: documents matching the text query are
    * ranked by BM25, re-scored by quantized cosine against the query
    * vector (`qVec`'s embedding), and fused with reciprocal-rank fusion
    * rrf_micro = 10^6 div (kRrf + bm25_rank) + 10^6 div (kRrf + cos_rank)
    * (k = 60, the standard RRF constant). Output: top-`k`
    * (rank, doc_id, bm25_rank, cos_rank, rrf_micro).
    *
    * Shape at scale: the dense stage runs ONLY over the sparse stage's
    * candidates — the classic retrieve-then-rerank contract, so the
    * rank windows order the candidate set (bounded by documents
    * containing a query term), never the corpus; the query vector is a
    * 1-row broadcast; the final top-k is a TakeOrderedAndProject.
    */
  def rrfSearch(
      docs: DataFrame,
      embeddings: DataFrame,
      query: String,
      qVec: Long = 0L,
      k: Int = 10,
      kRrf: Int = 60
  ): DataFrame = {
    val wB = Window.orderBy(col("score_milli").desc, col("doc_id"))
    val bR = TextAnalysis
      .bm25Scores(docs, query)
      .withColumn("bm25_rank", row_number().over(wB).cast("long"))
      .select("doc_id", "bm25_rank")
    val q = Similarity.quantized(embeddings)
    val qRow = q.where(col("vec_id") === qVec).select(col("v").as("qv"))
    // cosine arm runs over the EMBEDDED candidates (Similarity's shared
    // zip_with scorer); a BM25 hit with no embedding row stays in the
    // fusion with only its sparse-arm contribution (cos_rank NULL)
    // rather than silently vanishing
    val wC = Window.orderBy(col("score_milli").desc, col("doc_id"))
    val cosRanked = Similarity
      .pairsScored(
        bR.join(q.select(col("vec_id").as("doc_id"), col("v").as("nv")), "doc_id")
          .crossJoin(broadcast(qRow))
      )
      .withColumn("cos_rank", row_number().over(wC).cast("long"))
      .select("doc_id", "cos_rank")
    val wF = Window.orderBy(col("rrf_micro").desc, col("doc_id"))
    bR
      .join(cosRanked, Seq("doc_id"), "left")
      .withColumn(
        "rrf_micro",
        expr(s"1000000 div ($kRrf + bm25_rank) + coalesce(1000000 div ($kRrf + cos_rank), 0L)")
      )
      .orderBy(col("rrf_micro").desc, col("doc_id"))
      .limit(k)
      .withColumn("rank", row_number().over(wF).cast("long"))
      .select("rank", "doc_id", "bm25_rank", "cos_rank", "rrf_micro")
  }
}
