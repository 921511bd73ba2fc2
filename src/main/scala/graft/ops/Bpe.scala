package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.extract.TokenRules

/** BPE merge learning — the tokenizer-training pass itself (Sennrich et
  * al.): starting from characters, repeatedly find the most frequent
  * adjacent symbol pair over the corpus and merge it, emitting the
  * ranked merge table a byte-pair tokenizer ships as its vocabulary.
  * Deterministic end-to-end: argmax ties break on (pair lexicographic),
  * and within a run of equal symbols merges apply leftmost-greedy
  * (positions 0-1, 2-3, … of the run) — the classic rule, and the one
  * the oracle replays positionally.
  *
  * Shape at scale: BPE trains on the WORD-FREQUENCY table, not the
  * corpus — one corpus scan builds (word, freq), and every one of the
  * `rounds` iterations runs over the vocab-sized symbol table: a
  * partial-aggregated pair count (map-side combined), a 1-row argmax to
  * the driver (TakeOrderedAndProject — corpus-size-independent), and a
  * zero-shuffle per-word fold applying the merge. Rounds re-stage
  * through Materialize so iteration lineage never replays. This is
  * exactly how production BPE trainers stay payable on 100 TB: the
  * corpus is touched once, the loop is vocab-bound.
  */
object Bpe {

  /** Leftmost-greedy merge of pair (a, b) inside one symbol array,
    * as a single codegen'd fold: scan left to right, replacing the
    * accumulator's tail [.., a] + b with [.., ab]. A merged symbol can
    * never equal `a` again (ab is strictly longer), so the fold merges
    * exactly the leftmost-greedy original positions.
    */
  private def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(
      syms,
      struct(expr("CAST(array() AS array<string>)").as("acc")),
      (st, x) => {
        val acc = st.getField("acc")
        val canMerge = size(acc) > 0 && element_at(acc, -1) === lit(a) && (x === lit(b))
        struct(
          when(
            canMerge,
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b)))
          ).otherwise(concat(acc, array(x))).as("acc")
        )
      },
      st => st.getField("acc")
    )

  /** The trainer loop shared by [[learnMerges]] and [[segment]]:
    * returns the learned merge list and the FINAL per-word symbol
    * table. Stops early if the vocabulary runs out of adjacent pairs
    * (every word fully merged).
    */
  private def train(
      docs: DataFrame,
      rounds: Int
  ): (Seq[(Long, String, String, String, Long)], DataFrame) = {
    var syms = graft.util.Materialize.stage(
      docs
        .select(explode(TokenRules.tokens(col("text"))).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("freq"))
        .select(
          col("word"),
          col("freq"),
          expr("transform(sequence(1, length(word)), i -> substr(word, i, 1))").as("syms")
        )
    )
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    var r = 1
    var dry = false
    while (r <= rounds && !dry) {
      val top = syms
        // sequence(1, 0) DESCENDS in Spark — fully-merged single-symbol
        // words must be filtered, not fed to the pair transform
        .where(size(col("syms")) >= 2)
        .select(
          col("freq"),
          explode(
            expr(
              "transform(sequence(1, size(syms) - 1), " +
                "i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))"
            )
          ).as("p")
        )
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), asc("a"), asc("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) dry = true
      else {
        val (a, b, cnt) = (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        out += ((r.toLong, a, b, a + b, cnt))
        syms = graft.util.Materialize.stage(
          syms.select(col("word"), col("freq"), applyMerge(col("syms"), a, b).as("syms"))
        )
        r += 1
      }
    }
    (out.toSeq, syms)
  }

  /** Learn `rounds` merges over the corpus; output one row per learned
    * merge: (rnk, lhs, rhs, merged, cnt).
    */
  def learnMerges(docs: DataFrame, rounds: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, rounds)._1.toDF("rnk", "lhs", "rhs", "merged", "cnt")
  }

  /** Segment the corpus with the merges learned by [[learnMerges]]:
    * per document, the whitespace token count and the BPE symbol count
    * after applying all `rounds` merges — the number the batch planner
    * actually packs on (compression ratio = n_tokens / n_bpe_syms).
    * Output: (doc_id, n_tokens, n_bpe_syms) for non-empty docs.
    *
    * Shape at scale: the merges are learned once (vocab-bound rounds,
    * see learnMerges); segmentation itself is ONE corpus scan — the
    * per-word symbol counts live in the vocab-sized table the trainer
    * already built, and each document joins its distinct words against
    * it (AQE broadcasts the vocab when it fits), then re-aggregates on
    * doc_id weighted by per-doc word counts.
    */
  def segment(docs: DataFrame, rounds: Int = 4): DataFrame = {
    val wordSyms = train(docs, rounds)._2
      .select(col("word"), size(col("syms")).cast("long").as("n_syms"))
    docs
      .select(col("doc_id"), explode(TokenRules.tokens(col("text"))).as("word"))
      .groupBy("doc_id", "word")
      .agg(count(lit(1)).as("n"))
      .join(wordSyms, "word")
      .groupBy("doc_id")
      .agg(
        sum("n").as("n_tokens"),
        sum(col("n") * col("n_syms")).as("n_bpe_syms")
      )
  }
}
