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
  * corpus — one corpus scan builds (word, freq), and everything after is
  * vocab-bound. The merge loop itself is ADAPTIVE (mirroring
  * `Dedup.groupsFromCached`'s driver gate): when the vocabulary fits
  * under `driverVocabThreshold` it is collected once and ALL merge
  * rounds run in driver memory with incrementally-maintained pair
  * counts — O(affected-word length) per round after the initial count,
  * no per-round Spark job. That is how a real 32k-merge tokenizer stays
  * payable: the alternative (one distributed aggregate + driver argmax
  * PER ROUND) schedules ~64k jobs of pure coordination overhead. The
  * distributed loop remains as the fallback for vocabularies too large
  * to collect, and the two paths are merge-for-merge identical (same
  * counts, same UTF-8-binary tie-break, same leftmost-greedy
  * application — asserted by BpeSpec's parity test at 64 rounds).
  */
object Bpe {

  /** Vocabulary-size gate for the in-memory trainer: at or below this
    * many distinct words the (word, freq) table collects to the driver
    * (a few hundred MB at the default — same order as
    * `Dedup.groupsFromCached`'s pair gate); above it the distributed
    * per-round loop runs instead.
    */
  val DriverVocabThreshold: Long = 2L << 20

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

  /** UTF-8-binary string comparison (unsigned byte lexicographic) — the
    * ordering Spark's UTF8String gives `asc(...)`, which differs from
    * Java's UTF-16 `compareTo` above the BMP; the driver path must
    * tie-break identically to the distributed argmax.
    */
  private def utf8Lt(x: String, y: String): Boolean = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    a.length < b.length
  }

  /** Leftmost-greedy merge on a plain array — the driver twin of
    * [[applyMerge]], same rule verbatim.
    */
  private def mergeWord(syms: Array[String], a: String, b: String, ab: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      val x = syms(i)
      if (out.nonEmpty && out(out.length - 1) == a && x == b) out(out.length - 1) = ab
      else out += x
      i += 1
    }
    out.toArray
  }

  /** All merge rounds in driver memory over the collected
    * word-frequency table. Pair counts are maintained incrementally: a
    * round's merge touches only the words that contain the winning pair
    * (tracked in an inverted pair→word-indices index), and a merge can
    * never resurrect a zeroed pair (neighbors become adjacent to the
    * NEW symbol, never to each other), so zero-count entries are dropped
    * and the per-round argmax scans a shrinking vocab-bound map.
    */
  private def trainInMemory(
      wordFreq: Array[(String, Long)],
      rounds: Int
  ): (Seq[(Long, String, String, String, Long)], Array[(String, Long, Array[String])]) = {
    val nWords = wordFreq.length
    val syms = new Array[Array[String]](nWords)
    val freqs = new Array[Long](nWords)
    var i = 0
    while (i < nWords) {
      // one symbol per CODE POINT, matching the SQL path's
      // substr(word, i, 1) (character, not byte, indexing)
      syms(i) = wordFreq(i)._1.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
      freqs(i) = wordFreq(i)._2
      i += 1
    }
    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val index = scala.collection.mutable.HashMap.empty[(String, String), scala.collection.mutable.Set[Int]]
    def addWord(w: Int, sign: Long): Unit = {
      val s = syms(w)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        counts.update(p, counts.getOrElse(p, 0L) + sign * freqs(w))
        if (sign > 0) index.getOrElseUpdate(p, scala.collection.mutable.Set.empty[Int]) += w
        j += 1
      }
    }
    i = 0
    while (i < nWords) { addWord(i, 1L); i += 1 }

    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    var r = 1
    var dry = false
    while (r <= rounds && !dry) {
      var best: (String, String) = null
      var bestCnt = 0L
      counts.foreach { case (p, c) =>
        if (c > 0) {
          if (
            best == null || c > bestCnt ||
            (c == bestCnt && (utf8Lt(p._1, best._1) || (p._1 == best._1 && utf8Lt(p._2, best._2))))
          ) { best = p; bestCnt = c }
        }
      }
      if (best == null) dry = true
      else {
        val (a, b) = best
        val ab = a + b
        out += ((r.toLong, a, b, ab, bestCnt))
        // merge only the words that (still) contain the pair; index
        // entries can be stale after earlier merges, so re-check
        val touched = index.getOrElse(best, scala.collection.mutable.Set.empty[Int]).toArray
        touched.foreach { w =>
          val s = syms(w)
          var has = false
          var j = 0
          while (!has && j < s.length - 1) { has = s(j) == a && s(j + 1) == b; j += 1 }
          if (has) {
            addWord(w, -1L)
            syms(w) = mergeWord(s, a, b, ab)
            addWord(w, 1L)
          }
        }
        counts.filterInPlace((_, c) => c > 0)
        index.remove(best)
        r += 1
      }
    }
    val finalSyms = new Array[(String, Long, Array[String])](nWords)
    i = 0
    while (i < nWords) { finalSyms(i) = (wordFreq(i)._1, freqs(i), syms(i)); i += 1 }
    (out.toSeq, finalSyms)
  }

  /** The trainer loop shared by [[learnMerges]] and [[segment]]:
    * returns the learned merge list and the FINAL per-word symbol
    * table. Stops early if the vocabulary runs out of adjacent pairs
    * (every word fully merged). Below `driverVocabThreshold` distinct
    * words the rounds run in driver memory (see [[trainInMemory]]);
    * above it, one distributed pair-count + 1-row argmax + zero-shuffle
    * merge fold per round.
    */
  private def train(
      docs: DataFrame,
      rounds: Int,
      driverVocabThreshold: Long = DriverVocabThreshold
  ): (Seq[(Long, String, String, String, Long)], DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wordFreq = graft.util.Materialize.stage(
      docs
        .select(explode(TokenRules.tokens(col("text"))).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("freq"))
    )
    if (wordFreq.count() <= driverVocabThreshold) {
      val collected = wordFreq.as[(String, Long)].collect()
      val (merges, finalSyms) = trainInMemory(collected, rounds)
      val symsDf = spark
        .createDataset(finalSyms.toSeq.map { case (w, f, s) => (w, f, s.toSeq) })
        .toDF("word", "freq", "syms")
      (merges, symsDf)
    } else trainDistributed(wordFreq, rounds)
  }

  private def trainDistributed(
      wordFreq: DataFrame,
      rounds: Int
  ): (Seq[(Long, String, String, String, Long)], DataFrame) = {
    // wordFreq arrives already staged by train(); the initial symbol
    // split is a narrow projection of it, so staging it AGAIN would
    // materialize a second vocab-sized table on exactly the path that
    // exists because the vocab is too big to collect. Round 1 reads the
    // projection on the fly; every merge round re-stages below, keeping
    // plan depth constant.
    var syms =
      wordFreq.select(
        col("word"),
        col("freq"),
        expr("transform(sequence(1, length(word)), i -> substr(word, i, 1))").as("syms")
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
  def learnMerges(
      docs: DataFrame,
      rounds: Int = 4,
      driverVocabThreshold: Long = DriverVocabThreshold
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    train(docs, rounds, driverVocabThreshold)._1.toDF("rnk", "lhs", "rhs", "merged", "cnt")
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
  def segment(
      docs: DataFrame,
      rounds: Int = 4,
      driverVocabThreshold: Long = DriverVocabThreshold
  ): DataFrame = {
    val wordSyms = train(docs, rounds, driverVocabThreshold)._2
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
