package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.extract.TokenRules

/** Text-analysis operators for a training-data pipeline: language ID,
  * quality scoring, token counting, and winnowing document fingerprints.
  * All rules are integer/string-exact and shared with the DuckDB oracles.
  */
object TextAnalysis {

  /** Tiny marker-token vocabularies per language (deterministic n-gram
    * heuristic stand-in for a trained language identifier).
    */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "is", "of", "to", "in", "a"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "es" -> Seq("el", "los", "que", "es", "una", "por"),
    "fr" -> Seq("le", "les", "des", "est", "dans", "une")
  )

  private def markerCount(lang: String) = {
    val set = markers(lang).map(m => s"'$m'").mkString(", ")
    expr(s"size(filter(toks, t -> t IN ($set)))").cast("long").as(s"c_$lang")
  }

  /** (doc_id, c_en, c_de, c_es, c_fr, lang_pred): strict-argmax language
    * vote; ties or zero evidence predict 'und'.
    */
  /** Strict-argmax language vote over the c_* marker counts; shared by
    * [[langId]] and [[domainRollup]].
    */
  private val LangVote =
    """CASE
       WHEN c_en > c_de AND c_en > c_es AND c_en > c_fr THEN 'en'
       WHEN c_de > c_en AND c_de > c_es AND c_de > c_fr THEN 'de'
       WHEN c_es > c_en AND c_es > c_de AND c_es > c_fr THEN 'es'
       WHEN c_fr > c_en AND c_fr > c_de AND c_fr > c_es THEN 'fr'
       ELSE 'und' END"""

  def langId(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), TokenRules.tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        markerCount("en"),
        markerCount("de"),
        markerCount("es"),
        markerCount("fr")
      )
      .withColumn("lang_pred", expr(LangVote))

  /** Code-vs-prose detection — the standard webtext routing signal
    * (code goes to a code-corpus pipeline with its own dedup and
    * quality rules, not through prose filters that would shred it):
    * per document, the non-alphanumeric symbol share in permille plus
    * exact brace/bracket/paren and semicolon/equals counts, and the
    * declared verdict is_code = (symbol share ≥ 50‰ AND
    * structural hits ≥ 3). All counts are RE2-compatible regex counts
    * — one zero-shuffle codegen'd scan, same engine-exact shape as
    * text_redact. Output:
    * (doc_id, n_chars, symbol_permille, brace_hits, op_hits, is_code).
    */
  def codeDetect(docs: DataFrame): DataFrame =
    docs
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        regexp_count(col("text"), lit("[^A-Za-z0-9 ]")).cast("long").as("symbols"),
        regexp_count(col("text"), lit("[{}()\\[\\]]")).cast("long").as("brace_hits"),
        regexp_count(col("text"), lit("[;=]")).cast("long").as("op_hits")
      )
      .where(col("n_chars") > 0)
      .select(
        col("doc_id"),
        col("n_chars"),
        expr("(1000 * symbols) div n_chars").as("symbol_permille"),
        col("brace_hits"),
        col("op_hits"),
        expr(
          "CAST(CASE WHEN (1000 * symbols) div n_chars >= 50 AND brace_hits + op_hits >= 3 THEN 1 ELSE 0 END AS BIGINT)"
        ).as("is_code")
      )

  /** Language-ID confusion matrix — the heuristic classifier evaluated
    * against the corpus's ground-truth `lang` column: for every
    * (truth, prediction) pair, the document count and its permille
    * share of the truth language's documents (diagonal = per-language
    * recall). The eval loop the langid heuristic ships with — when a
    * language's diagonal drops, its marker list needs work BEFORE the
    * filter runs over a crawl. Output:
    * (lang, lang_pred, n, permille_of_lang).
    *
    * Shape at scale: the zero-shuffle langId scan, one doc-keyed join
    * to attach truth, a (truth, pred)-keyed aggregate bounded by
    * langs², and an AQE-broadcast per-truth total join.
    */
  def langConfusion(docs: DataFrame): DataFrame = {
    // staged: the langs²-row matrix feeds both the per-truth totals
    // and the final join — unstaged, the langId corpus scan runs twice
    val cm = graft.util.Materialize.stage(
      langId(docs)
        .select(col("doc_id"), col("lang_pred"))
        .join(docs.select(col("doc_id"), col("lang")), "doc_id")
        .groupBy("lang", "lang_pred")
        .agg(count(lit(1)).as("n"))
    )
    val tot = cm.groupBy("lang").agg(sum("n").as("lang_total"))
    cm.join(tot, "lang")
      .select(
        col("lang"),
        col("lang_pred"),
        col("n"),
        expr("(1000 * n) div lang_total").as("permille_of_lang")
      )
  }

  /** Heuristic quality features, all integer-exact:
    * n_chars, n_tokens, avg token length (milli), stopword ratio (pct),
    * and a composite quality score (milli, capped at 1000).
    */
  def quality(docs: DataFrame): DataFrame = {
    val stopSet = markers("en").map(m => s"'$m'").mkString(", ")
    docs
      .select(col("doc_id"), col("text"), TokenRules.tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(col("toks")).cast("long").as("n_tokens"),
        expr("aggregate(toks, 0L, (acc, t) -> acc + length(t))").as("tok_chars"),
        expr(s"size(filter(toks, t -> t IN ($stopSet)))").cast("long").as("stop_hits")
      )
      .where(col("n_tokens") > 0)
      .withColumn("avg_tok_len_milli", expr("(1000 * tok_chars) div n_tokens"))
      .withColumn("stop_pct", expr("(100 * stop_hits) div n_tokens"))
      .withColumn(
        "quality_milli",
        least(lit(1000L), expr("(1000 * stop_hits) div n_tokens + n_tokens"))
      )
      .select("doc_id", "n_chars", "n_tokens", "avg_tok_len_milli", "stop_pct", "quality_milli")
  }

  /** Does document length predict the quality score? Exact-integer
    * Pearson diagnostics over [[quality]]'s (n_tokens, quality_milli)
    * pairs: one summary row (n_docs, slope_milli, r2_ppm) with
    * slope = cov/var(x) in milli-units and r² in ppm, both in exact
    * DECIMAL(38,0)/HUGEINT arithmetic. Negative-slope sign is applied
    * OUTSIDE the integer division (Spark `div` truncates toward zero,
    * DuckDB `//` floors — they disagree on negatives, so the division
    * only ever sees magnitudes). Zero-variance sides emit 0, the same
    * guard rule as transitivity/modularity. Bounds: |cov| < 10^19
    * stays exact through the r² square under ~10^9 docs at
    * y ≤ 10^3, x ≤ 10^4 — past that, scale y down before correlating.
    *
    * Shape at scale: the quality projection is codegen'd per row and
    * the five moments partial-aggregate into ONE 1-row reduce — the
    * whole diagnostic is a single scan with a scalar exchange.
    */
  def qualityCorr(docs: DataFrame): DataFrame =
    quality(docs)
      .select(
        col("n_tokens").cast("decimal(38,0)").as("x"),
        col("quality_milli").cast("decimal(38,0)").as("y")
      )
      .agg(
        count(lit(1)).cast("decimal(38,0)").as("n"),
        sum("x").as("sx"),
        sum("y").as("sy"),
        sum(expr("x * y")).as("sxy"),
        sum(expr("x * x")).as("sxx"),
        sum(expr("y * y")).as("syy")
      )
      .select(
        col("n").cast("long").as("n_docs"),
        expr("n * sxy - sx * sy").as("cov"),
        expr("n * sxx - sx * sx").as("varx"),
        expr("n * syy - sy * sy").as("vary")
      )
      .select(
        col("n_docs"),
        expr(
          "CAST(CASE WHEN varx = 0 THEN 0 ELSE " +
            "(CASE WHEN cov < 0 THEN -1 ELSE 1 END) * ((1000 * abs(cov)) div varx) END AS BIGINT)"
        ).as("slope_milli"),
        expr(
          "CAST(CASE WHEN varx = 0 OR vary = 0 THEN 0 ELSE " +
            "(1000000 * cov * cov) div (varx * vary) END AS BIGINT)"
        ).as("r2_ppm")
      )

  /** Whitespace token count plus a BPE-ish regex token count
    * (letter runs, digit runs, single non-alphanumeric marks).
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(TokenRules.tokens(col("text"))).cast("long").as("ws_tokens"),
      regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast("long").as("bpe_tokens")
    )

  /** Per-document n-gram novelty in crawl order — for each document,
    * how many of its distinct 8-token grams appear HERE FIRST (their
    * minimum doc_id is this doc): the order-sensitive complement of
    * [[dupGramFraction]]'s corpus-global dup share, and the streaming
    * intuition ("how much genuinely new text did this crawl batch
    * add") as an exact batch fact. A long doc with near-zero novelty
    * is recycled content even if no single partner clears a pairwise
    * dedup threshold. Output:
    * (doc_id, n_grams, n_new, novelty_permille).
    *
    * Shape at scale: the same staged distinct (doc, gram) table as
    * dupGramFraction (one gram-keyed partial-aggregated exchange for
    * the min-doc owner, map-side combined), joined back on the gram
    * key and folded per doc. Slim keys only — gram strings and ids,
    * never bodies.
    */
  def gramNovelty(docs: DataFrame, gramLen: Int = TokenGramLen): DataFrame = {
    val k = gramLen
    val grams = docGrams(docs, k)
    val first = grams.groupBy("gram").agg(min(col("doc_id")).as("first_doc"))
    grams
      .join(first, "gram")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_grams"),
        count(when(col("first_doc") === col("doc_id"), lit(1))).as("n_new")
      )
      .withColumn("novelty_permille", expr("(1000 * n_new) div n_grams"))
  }

  /** Per-source hapax-legomena profile — lexical richness per domain:
    * token mass, vocabulary size, words occurring exactly ONCE in the
    * source (hapax), and hapax share of the vocabulary in permille.
    * A source whose hapax share collapses is template/boilerplate
    * output (the same strings over and over); one that explodes is
    * OCR noise or id-spam — both are crawl-quality flags next to the
    * dup-rate table. Output:
    * (source, n_tokens, vocab, hapax, hapax_permille).
    *
    * Shape at scale: one (source, token)-keyed partial-aggregated
    * exchange (map-side combine absorbs hot words), then a
    * source-keyed rollup bounded by the domain vocabulary.
    */
  def hapaxProfile(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), explode(TokenRules.tokens(col("text"))).as("token"))
      .groupBy("source", "token")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("source")
      .agg(
        sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        count(when(col("cnt") === 1L, lit(1))).as("hapax")
      )
      .withColumn("hapax_permille", expr("(1000 * hapax) div vocab"))

  /** Flesch–Kincaid-style readability grade in exact integer milli
    * units — the grade-level curriculum signal (order easy → hard)
    * computed without a single float: with w = words, s = sentences
    * (clamped ≥ 1 — headline-only docs have no terminator), y =
    * syllables (vowel-group runs `[aeiouy]+`, clamped ≥ w — every word
    * has at least one syllable), the FK grade
    * 0.39·w/s + 11.8·y/w − 15.59, scaled ×1000, becomes the single
    * rational (390·w² + 11800·y·s − 15590·s·w) / (s·w) — reported as
    * grade_milli with the numerator clamped at 0 BEFORE the integer
    * division so truncation (Spark DIV) and floor (DuckDB //) agree.
    * The numerator is widened to DECIMAL(38,0) (HUGEINT on the oracle
    * side): 11800·y·s crosses Long around 3×10^7 words when sentence
    * count is comparable (e.g. "a. a. a." spam docs), and Long would
    * wrap silently where DuckDB's BIGINT raises. The quotient is
    * bounded by ~390·w (s ≥ 1), well inside BIGINT. Output:
    * (doc_id, n_words, n_sentences, n_syllables, grade_milli).
    *
    * Shape at scale: one zero-shuffle codegen'd scan — three
    * RE2-compatible regex counts and integer arithmetic per row,
    * nothing aggregated.
    */
  def readability(docs: DataFrame): DataFrame =
    docs
      .select(
        col("doc_id"),
        size(TokenRules.tokens(col("text"))).cast("long").as("n_words"),
        greatest(lit(1L), regexp_count(col("text"), lit("[.!?]+")).cast("long")).as("n_sentences"),
        regexp_count(col("text"), lit("[aeiouy]+")).cast("long").as("raw_syll")
      )
      .where(col("n_words") > 0)
      .withColumn("n_syllables", greatest(col("n_words"), col("raw_syll")))
      .withColumn(
        "grade_milli",
        expr(
          "CAST(greatest(CAST(0 AS DECIMAL(38,0)), " +
            "390 * CAST(n_words AS DECIMAL(38,0)) * n_words " +
            "+ 11800 * CAST(n_syllables AS DECIMAL(38,0)) * n_sentences " +
            "- 15590 * CAST(n_sentences AS DECIMAL(38,0)) * n_words) DIV " +
            "(CAST(n_sentences AS DECIMAL(38,0)) * n_words) AS BIGINT)"
        )
      )
      .select("doc_id", "n_words", "n_sentences", "n_syllables", "grade_milli")

  /** Token-level n-gram length for benchmark decontamination (the
    * standard 8-token collision rule) and the deterministic eval-split
    * modulus used to synthesise an "eval suite" from the corpus.
    */
  val TokenGramLen = 8
  val EvalMod = 10

  /** Over a SORTED gram array: (longest equal run, number of distinct
    * values), via one linear fold. Equal grams are adjacent after the
    * sort, so the longest run is the top gram's occurrence count and
    * run boundaries count distinct grams.
    */
  private def runStats(sortedArr: String): Column =
    expr(
      s"""aggregate(
            $sortedArr,
            named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L, 'nd', 0L),
            (acc, x) -> named_struct(
              'prev', x,
              'run',  IF(x <=> acc.prev, acc.run + 1L, 1L),
              'best', greatest(acc.best, IF(x <=> acc.prev, acc.run + 1L, 1L)),
              'nd',   acc.nd + IF(x <=> acc.prev, 0L, 1L)),
            acc -> named_struct('best', acc.best, 'nd', acc.nd))"""
    )

  /** Over a SORTED gram array: (sum of squared run lengths, number of
    * distinct values) — the Σn_i² fold lexical-diversity needs; runs
    * are adjacent after the sort, so one linear pass suffices.
    */
  private def runSumSq(sortedArr: String): Column =
    expr(
      s"""aggregate(
            $sortedArr,
            named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'ss', 0L, 'nd', 0L),
            (acc, x) -> named_struct(
              'prev', x,
              'run',  IF(x <=> acc.prev, acc.run + 1L, 1L),
              'ss',   IF(x <=> acc.prev, acc.ss, acc.ss + acc.run * acc.run),
              'nd',   acc.nd + IF(x <=> acc.prev, 0L, 1L)),
            acc -> named_struct('ss', acc.ss + acc.run * acc.run, 'nd', acc.nd))"""
    )

  /** Lexical diversity per document — the Gini–Simpson index in exact
    * ppm: 10^6 − (10^6 · Σ n_i²) div n², where n_i are per-token
    * occurrence counts. The probability two random token draws differ —
    * a repetition/diversity quality signal orthogonal to
    * [[repetition]]'s positional n-gram fractions (no log, so no float
    * crosses the oracle). Output:
    * (doc_id, n_tokens, distinct_tokens, simpson_ppm).
    *
    * Shape at scale: a pure per-row projection — the token array is
    * sorted and folded inside one expression tree, ZERO exchanges (the
    * oracle states the same rule as a per-token group-by; results are
    * provably equal since runs of a sorted array are the groups).
    */
  def diversity(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), TokenRules.tokens(col("text")).as("toks"))
      .where(size(col("toks")) > 0)
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        runSumSq("array_sort(toks)").as("r")
      )
      .select(
        col("doc_id"),
        col("n_tokens"),
        col("r.nd").as("distinct_tokens"),
        expr("1000000 - (1000000 * r.ss) div (n_tokens * n_tokens)").as("simpson_ppm")
      )

  /** Gopher-style repetition signals per document: the fraction of
    * bigram occurrences taken by the single most frequent bigram, and
    * the fraction of trigram occurrences that are repeats (occurrences
    * beyond each trigram's first). Both integer-exact percentages.
    *
    * Shape at scale: a pure per-row projection — grams are built,
    * sorted, and folded inside one expression tree, so a per-document
    * statistic costs a scan with ZERO exchanges (the first cut exploded
    * grams through two corpus-volume shuffles; a doc-local metric never
    * needs the cluster to agree on anything).
    */
  def repetition(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), TokenRules.tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 3)
      .select(
        col("doc_id"),
        expr("array_sort(transform(sequence(1, size(toks) - 1), i -> concat_ws(' ', slice(toks, i, 2))))").as("bg"),
        expr("array_sort(transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', slice(toks, i, 3))))").as("tg")
      )
      .select(
        col("doc_id"),
        size(col("bg")).cast("long").as("n_bigrams"),
        runStats("bg").as("b"),
        size(col("tg")).cast("long").as("n_trigrams"),
        runStats("tg").as("t")
      )
      .select(
        col("doc_id"),
        col("n_bigrams"),
        expr("(100 * b.best) div n_bigrams").as("top_bigram_pct"),
        col("n_trigrams"),
        expr("(100 * (n_trigrams - t.nd)) div n_trigrams").as("dup_trigram_pct")
      )

  /** Benchmark decontamination: flag training documents sharing any
    * 8-token gram with the eval split (docs where doc_id % EvalMod = 0
    * — a deterministic stand-in for a fixed benchmark suite). Returns
    * (doc_id, n_collisions): the count of distinct colliding grams per
    * flagged training doc.
    *
    * The eval side is by construction a bounded benchmark suite, so at
    * production scale its distinct-gram set is small; the join is left
    * unhinted so AQE picks broadcast when it fits rather than forcing
    * one (cf. the size-gated-broadcast rule in EXPLAIN.md).
    */
  def decontam(docs: DataFrame): DataFrame = {
    val k = TokenGramLen
    val grams = docs
      .select(col("doc_id"), TokenRules.tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= k)
      .select(
        col("doc_id"),
        explode(
          expr(s"transform(sequence(1, size(toks) - ${k - 1}), i -> concat_ws(' ', slice(toks, i, $k)))")
        ).as("gram")
      )
    val evalGrams = grams.where(col("doc_id") % EvalMod === 0).select("gram").distinct()
    grams
      .where(col("doc_id") % EvalMod =!= 0)
      .join(evalGrams, Seq("gram"), "leftsemi")
      .select("doc_id", "gram")
      .distinct()
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_collisions"))
  }

  /** Bloom-filter geometry for [[bloomDecontam]]: 2^16 bits (2048
    * words, 32 bits used per word — shift stays below the BIGINT sign
    * bit, which DuckDB raises on and Spark silently wraps) and 3 hash
    * functions. Bit position for seed s is the first 16 bits of
    * md5("s:" || gram) — exactly 4 hex chars, so no modulo is involved
    * and the rule states identically in both engines.
    */
  val BloomBits = 65536
  val BloomHashes = 3

  /** Benchmark decontamination through a broadcast Bloom filter — the
    * shape the exact [[decontam]] join takes at 100 TB: the benchmark
    * side compresses to a fixed 16 KiB register table (2048 words,
    * bit_or-merged — mergeable across shards like the CMS/HLL sketches),
    * and the corpus probes it with a BROADCAST join instead of shuffling
    * its gram stream to meet the benchmark grams. Emits one summary row
    * (n_train_docs, n_flagged_bloom, n_flagged_exact, n_false_positive
    * docs): Bloom flags can only over-approximate (no false negatives —
    * asserted in the spec and by n_false_positive ≥ 0 construction), so
    * the row is the measured precision of the 16 KiB filter against the
    * exact join on the same corpus.
    *
    * Shape at scale: one gram scan feeds both sides; the filter build
    * aggregates to ≤2048 rows (map-side combined); the probe is a
    * per-gram constant ×[[BloomHashes]] fan-out joined BROADCAST against
    * the word table, then per-doc aggregation — the benchmark never
    * shuffles, and the only corpus-sized exchange is the per-doc rollup
    * the exact variant pays too.
    */
  def bloomDecontam(docs: DataFrame): DataFrame = {
    val k = TokenGramLen
    val grams = graft.util.Materialize.stage(
      docs
        .select(col("doc_id"), TokenRules.tokens(col("text")).as("toks"))
        .where(size(col("toks")) >= k)
        .select(
          col("doc_id"),
          explode(
            expr(s"transform(sequence(1, size(toks) - ${k - 1}), i -> concat_ws(' ', slice(toks, i, $k)))")
          ).as("gram")
        )
    )
    def bitPos(seed: Int): Column =
      conv(substring(md5(concat(lit(s"$seed:"), col("gram"))), 1, 4), 16, 10).cast("long")
    val seeds = (0 until BloomHashes).map(bitPos)
    val bloomWords = grams
      .where(col("doc_id") % EvalMod === 0)
      .select(col("gram")).distinct()
      .select(explode(array(seeds: _*)).as("bit"))
      .select(
        (col("bit") / 32).cast("long").as("word_idx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 32 AS INT))").as("mask")
      )
      .groupBy("word_idx")
      .agg(expr("bit_or(mask)").as("bits"))
    val probed = grams
      .where(col("doc_id") % EvalMod =!= 0)
      .select(col("doc_id"), col("gram")).distinct()
      .select(col("doc_id"), col("gram"), explode(array(seeds: _*)).as("bit"))
      .select(
        col("doc_id"), col("gram"),
        (col("bit") / 32).cast("long").as("word_idx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 32 AS INT))").as("mask")
      )
      .join(broadcast(bloomWords), Seq("word_idx"), "left")
      .groupBy("doc_id", "gram")
      .agg(min((coalesce(col("bits"), lit(0L)).bitwiseAND(col("mask")) === col("mask")).cast("int")).as("all_hit"))
      .groupBy("doc_id")
      .agg(max("all_hit").as("bloom_flag"))
    val exact = decontam(docs).select(col("doc_id"), lit(1).as("exact_flag"))
    probed
      .join(exact, Seq("doc_id"), "left")
      .agg(
        count(lit(1)).as("n_train_docs"),
        sum(col("bloom_flag")).cast("long").as("n_flagged_bloom"),
        sum(coalesce(col("exact_flag"), lit(0))).cast("long").as("n_flagged_exact"),
        sum(when(col("bloom_flag") === 1 && col("exact_flag").isNull, 1).otherwise(0))
          .cast("long")
          .as("n_false_positive")
      )
  }

  /** Per-domain (source) corpus composition: doc counts, char/token
    * volumes, mean doc length (milli-tokens), and each domain's share
    * of all tokens in ppm. One shuffle keyed by source; the global
    * token total is a window over the already-aggregated domain table
    * (bounded by the number of domains, not the corpus).
    */
  def domainStats(docs: DataFrame): DataFrame =
    docs
      .select(
        col("source"),
        length(col("text")).cast("long").as("chars"),
        size(TokenRules.tokens(col("text"))).cast("long").as("ntok")
      )
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("chars").as("total_chars"),
        sum("ntok").as("total_tokens")
      )
      .select(
        col("source"),
        col("n_docs"),
        col("total_chars"),
        col("total_tokens"),
        expr("(1000 * total_tokens) div n_docs").as("avg_doc_tokens_milli"),
        expr("(1000000 * total_tokens) div (sum(total_tokens) OVER ())").as("token_share_ppm")
      )

  /** Curation-filter thresholds (C4/Gopher-style), shared with the
    * DuckDB oracle. Rules fire in order; the first failure is the
    * reject reason.
    */
  val MinDocTokens = 20
  val MinStopPct = 2
  val MaxStopPct = 30
  val MaxTopBigramPct = 10
  val MaxDupTrigramPct = 7

  /** The assembled corpus-curation filter: every per-document quality
    * signal (length, language vote, stopword density, repetition) plus
    * the keep/reject verdict and first-failing-rule reason, computed in
    * ONE scan with ZERO exchanges — each signal is a per-row expression
    * (the repetition stats reuse the sorted-array fold), so curating
    * 100 TB costs exactly one pass with no cluster coordination.
    */
  def curate(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), TokenRules.tokens(col("text")).as("toks"))
      .where(size(col("toks")) > 0)
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        markerCount("en"),
        markerCount("de"),
        markerCount("es"),
        markerCount("fr"),
        expr("IF(size(toks) >= 3, array_sort(transform(sequence(1, size(toks) - 1), i -> concat_ws(' ', slice(toks, i, 2)))), array())").as("bg"),
        expr("IF(size(toks) >= 3, array_sort(transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', slice(toks, i, 3)))), array())").as("tg")
      )
      .withColumn("lang_pred", expr(LangVote))
      .withColumn("stop_pct", expr("(100 * c_en) div n_tokens"))
      .withColumn("b", runStats("bg"))
      .withColumn("t", runStats("tg"))
      .withColumn("top_bigram_pct", expr("IF(size(bg) > 0, (100 * b.best) div size(bg), 0L)"))
      .withColumn("dup_trigram_pct", expr("IF(size(tg) > 0, (100 * (size(tg) - t.nd)) div size(tg), 0L)"))
      .withColumn(
        "reason",
        expr(
          s"""CASE
              WHEN n_tokens < $MinDocTokens THEN 'too_short'
              WHEN lang_pred <> 'en' THEN 'lang'
              WHEN stop_pct < $MinStopPct THEN 'low_stopword'
              WHEN stop_pct >= $MaxStopPct THEN 'high_stopword'
              WHEN top_bigram_pct >= $MaxTopBigramPct OR dup_trigram_pct >= $MaxDupTrigramPct THEN 'repetitive'
              ELSE 'ok' END"""
        )
      )
      .withColumn("keep", expr("IF(reason = 'ok', 1L, 0L)"))
      .select(
        "doc_id", "n_tokens", "lang_pred", "stop_pct",
        "top_bigram_pct", "dup_trigram_pct", "keep", "reason"
      )

  /** Corpus length distribution: documents and token mass per
    * 10-token-wide length bucket. One partially-aggregated shuffle on a
    * small integer key — the full-corpus histogram costs one scan.
    */
  def lengthHistogram(docs: DataFrame): DataFrame =
    docs
      .select(size(TokenRules.tokens(col("text"))).cast("long").as("ntok"))
      .groupBy(expr("ntok div 10").as("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum("ntok").as("total_tokens"))

  /** Top-k cutoff for vocabulary construction. */
  val VocabK = 100

  /** Tokenizer-vocabulary construction: global token frequencies
    * (occurrences + document frequency) ranked by (count desc, token),
    * cut at the top k — the counting pass a BPE/unigram trainer runs
    * first over the corpus.
    *
    * Shape at scale: one partial-agg shuffle keyed by token (map-side
    * combine collapses each partition's counts before the exchange),
    * then a distributed TakeOrderedAndProject for the top-k — the rank
    * window runs over the k retained rows only, never the full vocab.
    */
  def vocabTopK(docs: DataFrame, k: Int = VocabK): DataFrame = {
    // the rank window's input is the k retained rows, not the vocab:
    // a single partition is bounded by construction (the constant
    // partition key documents that and silences WindowExec's
    // all-data-to-one-partition warning)
    val byRank = Window.partitionBy(lit(1)).orderBy(col("occurrences").desc, col("token"))
    docs
      .select(col("doc_id"), explode(TokenRules.tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("occurrences"), count_distinct(col("doc_id")).as("n_docs"))
      .orderBy(col("occurrences").desc, col("token"))
      .limit(k)
      .withColumn("rnk", row_number().over(byRank).cast("long"))
  }

  /** Zipf frequency spectrum of the corpus vocabulary: for each log2
    * occurrence bucket (⌊log2 f⌋ via length(bin(f)) − 1 — the same pure
    * integer log2 as the degree-mixing matrix), the number of distinct
    * words whose corpus frequency lands in it and their total
    * occurrence mass. The spectrum is the whole-vocabulary complement
    * of [[vocabTopK]]'s head sample: its slope is the Zipf exponent, a
    * singleton-heavy tail (bucket 0) flags OCR noise / boilerplate
    * churn, a fat head flags template dominance — standard corpus
    * pathology checks before tokenizer training.
    *
    * Shape at scale: one token-keyed partial-agg exchange (the vocab
    * count), then a second partial agg into ≤ 64 buckets — the final
    * exchange carries at most 64 rows per map task. No windows, no
    * joins.
    */
  def zipfSpectrum(docs: DataFrame): DataFrame =
    docs
      .select(explode(TokenRules.tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("f"))
      .select((length(bin(col("f"))) - 1).cast("bigint").as("freq_bucket"), col("f"))
      .groupBy("freq_bucket")
      .agg(count(lit(1)).as("n_words"), sum(col("f")).cast("bigint").as("occurrences"))

  /** Heaps'-law vocabulary-growth curve: at every power-of-two doc_id
    * checkpoint p (docs with doc_id < p), the cumulative document
    * count, token count and DISTINCT-word count. Sub-linear distinct
    * growth is the expected Heaps regime; a curve that stays near-linear
    * flags an id-correlated corpus (e.g. crawl shards with disjoint
    * vocabularies) — the capacity-planning input for tokenizer and
    * vocab sizing. Checkpoints key off doc_id VALUES, so the rule is
    * stable under re-partitioning and needs no global row ordering.
    *
    * Shape at scale: each word's FIRST-occurrence doc (one token-keyed
    * partial-agg exchange — min doc_id) maps to the first checkpoint
    * containing it (length(bin(f)) — integer ceil-log2); per-doc token
    * counts fold into the same ≤ 64 buckets in a zero-join scan. Both
    * bucket tables and the checkpoint spine (sequence-exploded from the
    * 1-row max-id aggregate) are ≤ 64 rows, so the cumulative window
    * runs over ≤ 64 rows on one partition by construction.
    */
  def heapsCurve(docs: DataFrame): DataFrame = {
    // first checkpoint exponent containing doc d: 0 for d=0 (p=1),
    // floor(log2 d)+1 = length(bin(d)) otherwise
    def ckExp(c: Column): Column =
      when(c === 0L, lit(0L)).otherwise(length(bin(c)).cast("bigint"))
    val spine = docs
      .agg(max(col("doc_id")).as("mx"))
      .select(explode(sequence(lit(0L), ckExp(col("mx")))).as("k"))
    val newWords = docs
      .select(col("doc_id"), explode(TokenRules.tokens(col("text"))).as("token"))
      .groupBy("token")
      .agg(min(col("doc_id")).as("f"))
      .groupBy(ckExp(col("f")).as("k"))
      .agg(count(lit(1)).as("nw"))
    val docStats = docs
      .select(col("doc_id"), TokenRules.tokens(col("text")).as("toks"))
      .groupBy(ckExp(col("doc_id")).as("k"))
      .agg(count(lit(1)).as("nd"), sum(size(col("toks"))).cast("bigint").as("nt"))
    val w = Window.partitionBy(lit(1)).orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(newWords, Seq("k"), "left")
      .join(docStats, Seq("k"), "left")
      .select(
        expr("shiftleft(CAST(1 AS BIGINT), CAST(k AS INT))").as("checkpoint"),
        sum(coalesce(col("nd"), lit(0L))).over(w).as("n_docs"),
        sum(coalesce(col("nt"), lit(0L))).over(w).as("cum_tokens"),
        sum(coalesce(col("nw"), lit(0L))).over(w).as("distinct_words")
      )
  }

  /** Cross-domain contamination matrix: for every source pair, the
    * number of shared distinct 8-token grams and the gram-set Jaccard
    * (integer pct) — the standard measure of inter-domain duplication
    * when deciding what a mixture actually adds.
    *
    * Shape at scale: distinct (source, gram) shuffled on gram, an
    * equi-join on gram (per-gram fan-out bounded by n_sources², not
    * corpus size), and a tiny n_sources²-row aggregate; the per-source
    * gram totals join back via AQE-chosen broadcast.
    */
  def sourceOverlap(
      docs: DataFrame,
      gramLen: Int = TokenGramLen,
      /** Hot-gram fan-out guard for many-source corpora: when set, grams
        * present in MORE than `maxSources` sources are dropped before
        * the self-join. A gram shared by s sources fans out to s·(s−1)/2
        * pair rows — at thousands of sources one boilerplate gram is a
        * multi-million-row explosion carrying ~no Jaccard signal (it
        * raises every pair's numerator equally). With the cap the pair
        * join is bounded by maxSources²·n_grams instead of n_sources².
        * Per-source denominators still count ALL grams, so jaccard_pct
        * becomes a lower bound under the cap. None (the default)
        * preserves the exact measure — right at the current
        * handful-of-sources design point.
        */
      maxSources: Option[Int] = None
  ): DataFrame = {
    val grams = docs
      .select(col("source"), TokenRules.tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= gramLen)
      .select(
        col("source"),
        explode(
          expr(s"transform(sequence(1, size(toks) - ${gramLen - 1}), i -> concat_ws(' ', slice(toks, i, $gramLen)))")
        ).as("gram")
      )
      .distinct()
    val perSource = grams.groupBy("source").agg(count(lit(1)).as("n_grams"))
    val joinable = maxSources match {
      case Some(k) =>
        val hot = grams
          .groupBy("gram")
          .agg(count(lit(1)).as("ns"))
          .where(col("ns") > k)
          .select("gram")
        grams.join(hot, Seq("gram"), "left_anti")
      case None => grams
    }
    joinable
      .as("a")
      .join(joinable.as("b"), col("a.gram") === col("b.gram") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("shared_grams"))
      .join(perSource.select(col("source").as("src_a"), col("n_grams").as("grams_a")), Seq("src_a"))
      .join(perSource.select(col("source").as("src_b"), col("n_grams").as("grams_b")), Seq("src_b"))
      .select(
        col("src_a"),
        col("src_b"),
        col("shared_grams"),
        col("grams_a"),
        col("grams_b"),
        expr("(100 * shared_grams) div (grams_a + grams_b - shared_grams)").as("jaccard_pct")
      )
  }

  val GramLen = 8
  val WinnowWindow = 4

  /** Hash width carried per gram: 8 hex chars (32 bits), not the full
    * 32-char md5 — window minima only need enough entropy to be
    * distinct, and the narrow key keeps the per-row hash array small.
    */
  val HashHexLen = 8

  /** Winnowing fingerprints: truncated md5 of every 8-char gram,
    * robust-window minimum over each 4-gram window, distinct per
    * document. The standard containment-detection sketch (Schleimer et
    * al.).
    *
    * Shape at scale: winnowing is PER-DOCUMENT ROW-LOCAL, so the whole
    * sketch — gram hashes, window minima, per-doc distinct — is computed
    * inside array expressions on each row, and only the final (small)
    * fingerprint set is exploded. Zero pre-aggregation Exchange: the
    * round-3 explode+window formulation shuffled ~20 bytes per CHARACTER
    * of corpus (a ~2 PB exchange at 100 TB) through Exchange+Sort to
    * evaluate a window that never crosses a row boundary; this plan is
    * scan → project → explode, the same zero-Exchange shape as
    * `ann_buckets`. Same rule, same oracle.
    */
  def fingerprints(docs: DataFrame): DataFrame =
    docs
      // need at least one complete window: WinnowWindow grams, i.e.
      // GramLen + WinnowWindow - 1 chars (shorter docs produced no rows
      // in the windowed formulation either — `pos >= WinnowWindow`
      // filtered every incomplete window)
      .where(length(col("text")) >= GramLen + WinnowWindow - 1)
      .select(
        col("doc_id"),
        // native one-pass winnowing (graft.functions.WinnowFingerprints):
        // byte-identical to the two-transform SQL rule the oracle
        // replays — per-gram md5-hex prefix, window minimum, distinct —
        // with a monotonic-deque O(n) sliding min and no intermediate
        // gram/slice arrays
        explode(
          graft.functions.GraftFunctions
            .winnowFingerprints(col("text"), GramLen, HashHexLen, WinnowWindow)
        ).as("fp")
      )
  // no trailing distinct: doc_id is the documents table's key (one row
  // per document), so the per-row array_distinct IS the per-document
  // distinct — a global .distinct() here would only re-add an
  // output-sized Exchange to dedupe rows that cannot collide.

  /** TF-IDF keyword extraction: the top-`k` most distinctive tokens per
    * document, scored with the integer-exact surrogate
    * score_milli = (1000 * tf * N) div df (monotone in tf·N/df, the
    * plain tf-idf ratio without the log — same ranking for fixed tf).
    * Ties break on the token, so the per-document top-k is a total
    * order. The corpus-wide keyword table is what source labeling,
    * topic bucketing and retrieval indexes key on.
    *
    * Scale shape: one exchange for tf (doc_id, token), one
    * partial-aggregated exchange for df (token), a join back on token
    * (AQE decides broadcast vs shuffle from the observed df size), and
    * the rank window partitioned BY DOCUMENT — millions of small
    * partitions, never a global sort. N comes from the DataFrame's
    * count() — on parquet a metadata-only action.
    */
  /** Number of registers in [[distinctSketch]]. */
  val SketchBuckets = 64

  /** Mergeable distinct-count sketch per source — the HLL register shape
    * at nibble granularity, built from md5 so it is bit-identical across
    * engines: a token routes to register
    * (ascii(h[1])*256 + ascii(h[2])) % 64 and contributes rank = 1 +
    * length of the run of leading '0' hex chars in h[3..18]; the
    * register keeps the max. Registers merge by max — union of two
    * corpora's sketches equals the sketch of the union (OpsSpec asserts
    * it) — which is the property that matters at 100 TB: per-partition
    * registers combine in one tiny exchange, where exact count_distinct
    * must shuffle every distinct value. (The estimator on top is the
    * standard harmonic mean; it is floating-point, so the engine exposes
    * the registers — the mergeable, storable artifact — and leaves the
    * final estimate to the reader.)
    */
  /** Numeric value of one lowercase hex character column. Bucket routing
    * uses the first md5 BYTE — hexVal(h1)*16 + hexVal(h2), uniform over
    * 0..255 — NOT ascii arithmetic: ascii(h1)*256 ≡ 0 (mod 64) and hex
    * chars span only 16 ascii codes, so the old ascii routing collapsed
    * 64 registers onto 16 (silently — merge properties still held).
    * Rule shared verbatim with the DuckDB oracles.
    */
  private def hexVal(c: org.apache.spark.sql.Column) =
    ascii(c) - when(ascii(c) >= 97, lit(87)).otherwise(lit(48))

  def distinctSketch(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), explode(TokenRules.tokens(col("text"))).as("tok"))
      .withColumn("h", md5(col("tok")))
      .select(
        col("source"),
        pmod(hexVal(substring(col("h"), 1, 1)) * lit(16) + hexVal(substring(col("h"), 2, 1)), lit(SketchBuckets))
          .cast("long")
          .as("bucket"),
        (length(regexp_extract(substring(col("h"), 3, 16), "^(0*)", 1)) + lit(1)).cast("long").as("rank")
      )
      .groupBy("source", "bucket")
      .agg(max("rank").as("max_rank"))

  /** Count-min sketch depth (rows) and width (columns). */
  val CmsDepth = 4
  val CmsWidth = 64

  /** Mergeable count-min sketch of the corpus token-frequency
    * distribution: `CmsDepth` independent md5-routed rows of `CmsWidth`
    * counters; a token occurrence adds 1 to one counter per row.
    * Registers merge by SUM — sketch(A ∪ B) = sketch(A) + sketch(B)
    * (OpsSpec asserts it), and a point estimate min over rows never
    * under-counts (the CMS one-sided guarantee, also asserted). The
    * companion to [[distinctSketch]] (HLL shape, max-merge): together
    * they are the pair of mergeable register artifacts a 100 TB corpus
    * profile stores per shard instead of exact value-level shuffles.
    * Output: (row, col, cnt) — CmsDepth × CmsWidth rows total.
    *
    * Shape at scale: one scan, a constant ×CmsDepth row fan-out inside
    * the projection, and ONE partial-aggregated exchange on the tiny
    * (row, col) key — per-partition registers combine map-side exactly
    * like production sketch pipelines.
    */
  def cmSketch(docs: DataFrame): DataFrame = {
    val rows = (0 until CmsDepth).map { r =>
      val h = md5(concat(lit(s"$r:"), col("tok")))
      // first md5 BYTE as one conv(hex2, 16, 10) — the md5 subexpression
      // appears ONCE per seed. The hexVal(h1)*16 + hexVal(h2) spelling
      // inlined md5 four times per seed inside the Generate (Generate
      // args get no codegen subexpression elimination), i.e. 16 md5
      // evaluations per token instead of 4 — measured 4.2 s vs 1.5 s at
      // sf0.1 for identical output (conv(·,16,10) is exactly
      // hexVal(h1)·16 + hexVal(h2)).
      struct(
        lit(r.toLong).as("row"),
        pmod(conv(substring(h, 1, 2), 16, 10).cast("long"), lit(CmsWidth)).as("col")
      )
    }
    docs
      .select(explode(TokenRules.tokens(col("text"))).as("tok"))
      .select(explode(array(rows: _*)).as("rc"))
      .groupBy(col("rc.row").as("row"), col("rc.col").as("col"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Word2vec skip-gram pair table over raw text (the text-side analog
    * of the graph walk co-occurrence table): for every token, its
    * neighbors within ±`window` positions, counted over the corpus and
    * cut to the top `k` contexts per center (cnt desc, context asc) so
    * the emitted table is vocab-bounded. Output:
    * (center, context, cnt, rnk).
    *
    * Shape at scale: pairs are built INSIDE the scan projection
    * (flatten of per-position windows — constant ×2·window fan-out, no
    * join), then one partial-aggregated exchange on (center, context)
    * and a per-center rank window over the already-aggregated table.
    */
  def skipgrams(docs: DataFrame, window: Int = 2, k: Int = 5): DataFrame = {
    val pairs = docs
      .select(TokenRules.tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 2)
      .select(
        explode(
          expr(
            s"""flatten(transform(sequence(1, size(toks)), i ->
                filter(
                  transform(sequence(greatest(1, i - $window), least(size(toks), i + $window)),
                            j -> IF(j = i, CAST(NULL AS struct<center: string, context: string>),
                                    struct(element_at(toks, i) AS center, element_at(toks, j) AS context))),
                  x -> x IS NOT NULL)))"""
          )
        ).as("p")
      )
      .select("p.*")
      .groupBy("center", "context")
      .agg(count(lit(1)).as("cnt"))
    val byCenter = Window.partitionBy("center").orderBy(col("cnt").desc, col("context"))
    pairs
      .withColumn("rnk", row_number().over(byCenter).cast("long"))
      .where(col("rnk") <= k)
  }

  def tfidfKeywords(docs: DataFrame, k: Int = 3): DataFrame = {
    val n = docs.count()
    // tf feeds both the document-frequency aggregate and the final
    // join — stage it once so the corpus is scanned once, not twice
    val tf = graft.util.Materialize.stage(
      docs
        .select(col("doc_id"), explode(TokenRules.tokens(col("text"))).as("keyword"))
        .groupBy("doc_id", "keyword")
        .agg(count(lit(1)).as("tf"))
    )
    val df = tf.groupBy("keyword").agg(count(lit(1)).as("df"))
    val byDoc = Window.partitionBy("doc_id").orderBy(col("score_milli").desc, col("keyword"))
    tf.join(df, "keyword")
      .withColumn("score_milli", expr(s"(1000 * tf * ${n}L) div df"))
      .withColumn("rnk", row_number().over(byDoc).cast("long"))
      .where(col("rnk") <= k)
      .select("doc_id", "keyword", "score_milli", "rnk")
  }

  /** Bigram language-model table: for each head word w1 the top-`k`
    * following words by count, with the conditional probability
    * p(w2|w1) and the collocation lift n·c(w1,w2)/(c(w1,·)·c(·,w2)) —
    * both in exact integer milli (the PMI exponent without the log, so
    * no float crosses the oracle). The counting pass an n-gram LM or a
    * collocation miner runs over a corpus.
    *
    * Scale shape: one explode to adjacent pairs (narrow, no shuffle),
    * ONE exchange for the (w1, w2) count — the only data-sized shuffle;
    * the two marginals re-aggregate the already-tiny bigram table and
    * join back on it (vocab-sized, AQE broadcasts), and the per-head
    * top-k windows over the same table. The grand total is one scalar
    * action on the counted table, not a second corpus pass. Lift stays
    * in BIGINT here; at 10^12-token scale the n·c product needs
    * DECIMAL(38) or log-space floats — noted, not silently wrong.
    */
  def lmBigrams(docs: DataFrame, k: Int = 5): DataFrame = {
    // the counted table feeds both marginals, the scalar total AND the
    // final join — stage it once or every reference re-scans the corpus
    val bi = graft.util.Materialize.stage(
      docs
        .select(TokenRules.tokens(col("text")).as("toks"))
        .where(size(col("toks")) >= 2)
        .select(
          explode(
            expr(
              "transform(sequence(1, size(toks) - 1), " +
                "i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))"
            )
          ).as("b")
        )
        .select("b.*")
        .groupBy("w1", "w2")
        .agg(count(lit(1)).as("cnt"))
    )
    val w1tot = bi.groupBy("w1").agg(sum("cnt").as("w1_cnt"))
    val w2tot = bi.groupBy("w2").agg(sum("cnt").as("w2_cnt"))
    // sum over zero rows is NULL (degenerate corpus: no doc has 2+
    // tokens) — guard the read; bi is then empty, so the placeholder
    // never reaches an evaluated row
    val nRow = bi.agg(sum("cnt")).collect()(0)
    val n = if (nRow.isNullAt(0)) 1L else nRow.getLong(0)
    val byHead = Window.partitionBy("w1").orderBy(col("cnt").desc, col("w2"))
    bi.join(w1tot, "w1")
      .join(w2tot, "w2")
      .withColumn("p_cond_milli", expr("(1000 * cnt) div w1_cnt"))
      .withColumn("lift_milli", expr(s"(1000 * ${n}L * cnt) div (w1_cnt * w2_cnt)"))
      .withColumn("rnk", row_number().over(byHead).cast("long"))
      .where(col("rnk") <= k)
      .select("w1", "w2", "cnt", "p_cond_milli", "lift_milli")
  }

  /** Per-document language-model fit score — the CCNet-style quality
    * signal (Wenzek et al., "CCNet: Extracting High Quality Monolingual
    * Datasets from Web Crawl Data"): documents whose token transitions
    * the corpus LM finds predictable are "in-distribution"; gibberish
    * and boilerplate-mangled text score low. CCNet uses KenLM perplexity;
    * this engine keeps the oracle exact by scoring with the MEAN BIGRAM
    * CONDITIONAL PROBABILITY in integer milli (monotone in the same
    * direction as negative log-perplexity for fixed length, with no
    * float/log crossing the engine boundary), plus the minimum — the
    * document's single most surprising transition. The LM is the corpus
    * itself, so every observed bigram has count >= 1 and the join is
    * total. Output per doc with >= 2 tokens:
    * (doc_id, n_bigrams, mean_p_milli, min_p_milli).
    *
    * Shape at scale: the per-occurrence bigram frame is staged once and
    * feeds (a) the (w1,w2) count — the only data-sized aggregate, (b)
    * the head marginal (re-aggregating the already-small bigram table),
    * and (c) the score join back on (w1,w2) — an ordinary equi-join
    * whose hot keys (stopword pairs) are AQE-skew-splittable; the final
    * regroup is on doc_id. No global sort, nothing quadratic.
    */
  def lmScore(docs: DataFrame): DataFrame = {
    val occ = graft.util.Materialize.stage(
      docs
        .select(col("doc_id"), TokenRules.tokens(col("text")).as("toks"))
        .where(size(col("toks")) >= 2)
        .select(
          col("doc_id"),
          explode(
            expr(
              "transform(sequence(1, size(toks) - 1), " +
                "i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))"
            )
          ).as("b")
        )
        .select(col("doc_id"), col("b.w1"), col("b.w2"))
    )
    val bi = occ.groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
    val w1tot = bi.groupBy("w1").agg(sum("cnt").as("w1_cnt"))
    occ
      .join(bi, Seq("w1", "w2"))
      .join(w1tot, Seq("w1"))
      .withColumn("p_milli", expr("(1000 * cnt) div w1_cnt"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum("p_milli").as("sp"),
        min("p_milli").as("min_p_milli")
      )
      .withColumn("mean_p_milli", expr("sp div n_bigrams"))
      .select("doc_id", "n_bigrams", "mean_p_milli", "min_p_milli")
  }

  /** Trigram-order LM fit score — [[lmScore]]'s rule one order up: each
    * document scored by the MEAN and MIN conditional probability of its
    * trigrams, p(w3 | w1 w2) = cnt(w1 w2 w3) / cnt(w1 w2 ·), in integer
    * milli (the context count is the trigram table's own (w1, w2)
    * marginal, so every observed trigram has a defined context and the
    * join is total). The order-2 vs order-3 score GAP per document is
    * the repetition signal bigram models miss: templated text is far
    * more predictable at order 3 than order 2.
    *
    * Shape at scale: identical to lmScore — the staged per-occurrence
    * trigram frame feeds (a) the (w1,w2,w3) count, (b) the (w1,w2)
    * marginal re-aggregated from that already-small table, (c) the
    * score join back; final regroup on doc_id. Nothing quadratic, hot
    * stopword contexts are AQE-skew-splittable.
    */
  def trigramLmScore(docs: DataFrame): DataFrame = {
    val occ = graft.util.Materialize.stage(
      docs
        .select(col("doc_id"), TokenRules.tokens(col("text")).as("toks"))
        .where(size(col("toks")) >= 3)
        .select(
          col("doc_id"),
          explode(
            expr(
              "transform(sequence(1, size(toks) - 2), " +
                "i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2, element_at(toks, i + 2) AS w3))"
            )
          ).as("t")
        )
        .select(col("doc_id"), col("t.w1"), col("t.w2"), col("t.w3"))
    )
    val tri = occ.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("cnt3"))
    val ctx = tri.groupBy("w1", "w2").agg(sum("cnt3").as("cnt2"))
    occ
      .join(tri, Seq("w1", "w2", "w3"))
      .join(ctx, Seq("w1", "w2"))
      .withColumn("p_milli", expr("(1000 * cnt3) div cnt2"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_trigrams"),
        sum("p_milli").as("sp"),
        min("p_milli").as("min_p_milli")
      )
      .withColumn("mean_p_milli", expr("sp div n_trigrams"))
      .select("doc_id", "n_trigrams", "mean_p_milli", "min_p_milli")
  }

  /** Per-source distribution drift: total-variation distance (in ppm)
    * between each source's token distribution and the whole corpus's —
    * the mixture-monitoring number that says "this shard stopped
    * looking like the blend". Pure integer end-to-end: shares are ppm
    * by integer division, TV = floor(Σ|ppm_src − ppm_all| / 2).
    *
    * Scale shape: ONE data-sized exchange — the (source, token) count;
    * everything after re-aggregates that table. Tokens a source never
    * emits still contribute |0 − ppm_all| WITHOUT materializing a
    * sources×vocab grid: Σ_absent ppm_all = S_all − Σ_present ppm_all,
    * so the absent-token mass folds into two scalars and the whole op
    * is a plain equi-join on token — no cross product at any vocab
    * size.
    */
  def sourceDrift(docs: DataFrame): DataFrame = {
    // referenced by both marginals, two scalar actions and the final
    // join — stage once, same policy as lmBigrams
    val srcCnt = graft.util.Materialize.stage(
      docs
        .select(col("source"), explode(TokenRules.tokens(col("text"))).as("tok"))
        .groupBy("source", "tok")
        .agg(count(lit(1)).as("cnt"))
    )
    val srcTot = srcCnt.groupBy("source").agg(sum("cnt").as("n_tokens"))
    val allCnt = srcCnt.groupBy("tok").agg(sum("cnt").as("acnt"))
    // NULL-sum guards, same rule as lmBigrams: an all-empty corpus
    // leaves srcCnt empty, both sums NULL, and the result (correctly)
    // empty — the placeholder divisor never evaluates on a row
    val nRow = allCnt.agg(sum("acnt")).collect()(0)
    val n = if (nRow.isNullAt(0)) 1L else nRow.getLong(0)
    val vocabPpm = allCnt.select(col("tok"), expr(s"(1000000 * acnt) div ${n}L").as("all_ppm"))
    val sAllRow = vocabPpm.agg(sum("all_ppm")).collect()(0)
    val sAll = if (sAllRow.isNullAt(0)) 0L else sAllRow.getLong(0)
    srcCnt
      .join(srcTot, "source")
      .join(vocabPpm, "tok")
      .withColumn("src_ppm", expr("(1000000 * cnt) div n_tokens"))
      .groupBy("source")
      .agg(
        max("n_tokens").as("n_tokens"),
        expr(s"CAST((sum(abs(src_ppm - all_ppm)) + (${sAll}L - sum(all_ppm))) div 2 AS BIGINT)")
          .as("tv_ppm")
      )
  }

  /** C4-style span-level dedup with text reassembly: the corpus is cut
    * into consecutive non-overlapping `span`-token segments (the stand-in
    * for C4's "three-sentence span" on a corpus with no sentence
    * boundaries), every segment occurrence except the globally first —
    * ordered by (doc_id, seg_idx) — is removed, and each document is
    * re-assembled from its surviving segments in order. Output per
    * non-empty document: (doc_id, n_segs, n_kept, text_clean).
    * Duplicates WITHIN a document also collapse to the first occurrence,
    * exactly like C4's corpus-global rule.
    *
    * Shape at scale: segments are built narrowly inside the scan
    * projection (transform over the token array — no gram explode of
    * overlapping windows). The keeper is min(struct(doc_id, seg_idx))
    * per segment — a partial-aggregated groupBy, so a boilerplate
    * segment occurring a billion times combines map-side instead of
    * flooding one reducer (the row_number-window formulation would).
    * Then one equi-join back on the segment (AQE skew split applies —
    * ordinary shuffle join) and one regroup on doc_id to reassemble.
    * Three data-sized exchanges total, none quadratic, no global sort.
    */
  def lineDedup(docs: DataFrame, span: Int = 12): DataFrame = {
    // the segment frame feeds BOTH the keeper aggregate and the join
    // back — stage it once so the corpus is exploded once, not twice
    val segs = graft.util.Materialize.stage(
      docs
        .select(col("doc_id"), TokenRules.tokens(col("text")).as("toks"))
        .where(size(col("toks")) > 0)
        .select(
          col("doc_id"),
          posexplode(segmentArray(span)).as(Seq("seg_idx", "seg"))
        )
        .withColumn("seg_idx", col("seg_idx").cast("long"))
    )
    val keeper = segs
      .groupBy("seg")
      .agg(min(struct(col("doc_id"), col("seg_idx"))).as("first"))
      .select(col("seg"), col("first.doc_id").as("k_doc"), col("first.seg_idx").as("k_idx"))
    segs
      .join(keeper, "seg")
      .withColumn("keep", col("doc_id") === col("k_doc") && col("seg_idx") === col("k_idx"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        concat_ws(
          " ",
          transform(
            array_sort(collect_list(when(col("keep"), struct(col("seg_idx"), col("seg"))))),
            x => x.getField("seg")
          )
        ).as("text_clean")
      )
  }

  /** Per-source boilerplate segments — fixed-span token segments (the
    * same segmentation rule as [[lineDedup]], shorter default span) that
    * repeat across ≥ `minDocs` DISTINCT documents of one source: the
    * batch analog of template/navigation-chrome detection in web-crawl
    * cleaning (a line appearing on many pages of one site is site
    * furniture, not content — the within-site counterpart of
    * [[dupGramFraction]]'s corpus-global signal). Output per qualifying
    * (source, segment): (source, seg, n_docs, doc_permille) where
    * doc_permille = 1000 * n_docs div (documents in that source) — the
    * caller's removal threshold operates on that coverage fraction.
    *
    * Shape at scale: segments are built narrowly inside the scan
    * projection (non-overlapping spans — no quadratic gram explode),
    * deduped to (source, seg, doc_id), then counted with a
    * partial-aggregated groupBy, so a segment stamped on a billion pages
    * combines map-side instead of flooding one reducer. The dedup is
    * the only full-data exchange; the per-(source, seg) count
    * re-shuffles already-deduped rows, and the per-source doc count is
    * a tiny aggregate joined back (AQE broadcasts it).
    */
  /** Non-overlapping `span`-token segments of the `toks` array column —
    * the ONE segmentation rule shared by [[lineDedup]] and
    * [[boilerplate]] (and locked against the DuckDB oracles of both):
    * editing it here updates every consumer together.
    */
  private def segmentArray(span: Int) =
    expr(
      s"transform(sequence(0, CAST(ceil(size(toks) / ${span}.0) AS INT) - 1), " +
        s"i -> array_join(slice(toks, i * $span + 1, $span), ' '))"
    )

  def boilerplate(docs: DataFrame, span: Int = 6, minDocs: Long = 2L): DataFrame = {
    val segs = docs
      .select(col("doc_id"), col("source"), TokenRules.tokens(col("text")).as("toks"))
      .where(size(col("toks")) > 0)
      .select(col("doc_id"), col("source"), explode(segmentArray(span)).as("seg"))
      .select("source", "seg", "doc_id")
      .distinct()
    val perSource = docs.groupBy("source").agg(count(lit(1)).as("src_docs"))
    segs
      .groupBy("source", "seg")
      .agg(count(lit(1)).as("n_docs"))
      .where(col("n_docs") >= minDocs)
      .join(perSource, "source")
      .select(
        col("source"),
        col("seg"),
        col("n_docs"),
        expr("(1000 * n_docs) div src_docs").as("doc_permille")
      )
  }

  /** Staged distinct (doc_id, gram) table — the ONE k-token-gram rule
    * shared by [[dupGramFraction]] and [[gramNovelty]], so the two
    * operators can never disagree about what a gram is.
    */
  private def docGrams(docs: DataFrame, k: Int): DataFrame =
    graft.util.Materialize.stage(
      docs
        .select(col("doc_id"), TokenRules.tokens(col("text")).as("toks"))
        .where(size(col("toks")) >= k)
        .select(
          col("doc_id"),
          explode(
            expr(s"transform(sequence(1, size(toks) - ${k - 1}), i -> concat_ws(' ', slice(toks, i, $k)))")
          ).as("gram")
        )
        .distinct()
    )

  /** Cross-document duplication signal (the "how much of this document
    * exists elsewhere in the corpus" cut rule from exact-substring
    * training-data dedup): per document, the fraction — in ppm — of its
    * DISTINCT `TokenGramLen`-token grams that also appear in at least
    * one OTHER document. Distinct from [[repetition]] (within-doc) and
    * [[decontam]] (vs a fixed eval split): this is the corpus-global
    * signal used to drop or trim heavily-duplicated pages. Output:
    * (doc_id, n_grams, n_dup_grams, dup_ppm) for docs with >= gram-len
    * tokens.
    *
    * Shape at scale: one distinct over (doc_id, gram), one
    * partial-aggregated count per gram, one join back, one regroup on
    * doc_id. The per-gram doc count combines map-side, so a viral
    * boilerplate gram is a single-row hotspot in the aggregate, not a
    * reducer flood; the join is an ordinary AQE-skew-splittable
    * shuffle join.
    */
  def dupGramFraction(docs: DataFrame): DataFrame = {
    val k = TokenGramLen
    // referenced by both the per-gram doc count and the join back —
    // stage the distinct (doc, gram) set so the gram explode runs once
    val grams = docGrams(docs, k)
    val docsPerGram = grams.groupBy("gram").agg(count(lit(1)).as("n_docs"))
    grams
      .join(docsPerGram, "gram")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("n_docs") >= 2, 1L).otherwise(0L)).as("n_dup_grams")
      )
      .withColumn("dup_ppm", expr("(1000000 * n_dup_grams) div n_grams"))
  }

  /** BM25 document retrieval: rank the corpus against a whitespace
    * query with the standard Okapi BM25 weight (k1 = 1.2, b = 0.75),
    * computed entirely in integer surrogate space so the ranking is
    * engine-exact: idf_milli = 1000 * (N - df + 1) div (df + 1) is the
    * milli-scaled idf ratio (log dropped — monotone in the ratio, so
    * order-preserving and integer-exact), and the tf saturation term
    * uses milli-scaled doc-length normalization. score_milli =
    * sum over query terms of idf_milli * tf * 2200 div
    * (tf * 1000 + 1200 * (250 + 750 * dl_milli_over_avg div 1000) / 1000)
    * — folded to one integer expression both engines evaluate
    * identically. Output: top-k (rank, doc_id, score_milli).
    *
    * Shape at scale: the per-(doc, term) tf table is one
    * partial-aggregated exchange; df and avg-dl are aggregates OF that
    * table (vocab- and scalar-sized, never a second corpus pass —
    * the tf table is staged once); the query-term filter shrinks
    * everything to |query| terms per doc before scoring, and the top-k
    * is a TakeOrderedAndProject, never a global sort.
    */
  /** The full BM25 score table (doc_id, score_milli) for every document
    * matching at least one query term — shared by [[bm25]] (top-k) and
    * the hybrid rank-fusion retrieval (Hybrid.rrfSearch).
    */
  private[ops] def bm25Scores(docs: DataFrame, query: String): DataFrame = {
    val terms = query.split("\\s+").filter(_.nonEmpty).distinct.toSeq
    // typed literals, not SQL splicing: a query term containing a quote
    // must be data, not syntax
    val termFilter = col("term").isin(terms: _*)
    val tf = graft.util.Materialize.stage(
      docs
        .select(col("doc_id"), explode(TokenRules.tokens(col("text"))).as("term"))
        .groupBy("doc_id", "term")
        .agg(count(lit(1)).as("tf"))
    )
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("total_dl")).collect()(0)
    val nDocs = stats.getLong(0)
    if (nDocs == 0L || terms.isEmpty)
      // degenerate corpus/query: empty scores, schema preserved (the
      // NULL total_dl below would otherwise NPE at getLong)
      return tf
        .select(col("doc_id"), lit(0L).as("score_milli"))
        .where(lit(false))
    val totalDl = stats.getLong(1)
    val df = tf
      .where(termFilter)
      .groupBy("term")
      .agg(count(lit(1)).as("df"))
    tf
      .where(termFilter)
      .join(df, "term")
      .join(dl, "doc_id")
      .withColumn("dl_ratio_milli", expr(s"(1000 * dl * ${nDocs}L) div ${totalDl}L"))
      .withColumn("idf_milli", expr(s"(1000 * (${nDocs}L - df + 1)) div (df + 1)"))
      .withColumn(
        "term_score",
        expr("(idf_milli * tf * 2200) div (tf * 1000 + (1200 * (250 + (750 * dl_ratio_milli) div 1000)) div 1000)")
      )
      .groupBy("doc_id")
      .agg(sum("term_score").as("score_milli"))
  }

  def bm25(docs: DataFrame, query: String, k: Int = 10): DataFrame =
    bm25Scores(docs, query)
      .orderBy(col("score_milli").desc, col("doc_id"))
      .limit(k)
      .withColumn(
        "rank",
        row_number().over(Window.orderBy(col("score_milli").desc, col("doc_id"))).cast("long")
      )
      .select("rank", "doc_id", "score_milli")

  /** Inverted-index construction — the retrieval artifact behind
    * [[bm25]]: per term, the document frequency and the sorted posting
    * list (comma-joined so the row is comparator-safe across engines).
    * Output: (term, df, postings).
    *
    * Shape at scale: one distinct over (doc, term) and one grouped
    * collect — both partial-aggregated. Posting lists are skewed by
    * nature (a stopword's list is corpus-sized): this operator emits
    * the LOGICAL index; a production writer shards a hot term's list
    * into segment files under a term-bucketed layout (the same
    * manifest-per-bucket pattern SnapshotTable's partitionBuckets
    * uses) rather than one row. The df column comes for free and is
    * what the BM25 scorer actually consumes.
    */
  /** Hierarchical corpus composition: doc and token volumes by
    * (source, predicted language) with ROLLUP subtotals — per source,
    * and the grand total — in one aggregation pass (Spark plans
    * rollup as a single Expand + partial-aggregated exchange, never
    * three scans). Null grouping slots render as '(all)' so the rows
    * compare bit-for-bit across engines. Output:
    * (source, lang_pred, n_docs, total_tokens).
    */
  def domainRollup(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), TokenRules.tokens(col("text")).as("toks"))
      .select(
        col("source"),
        size(col("toks")).cast("long").as("ntok"),
        markerCount("en"),
        markerCount("de"),
        markerCount("es"),
        markerCount("fr")
      )
      .withColumn("lang_pred", expr(LangVote))
      .rollup("source", "lang_pred")
      .agg(count(lit(1)).as("n_docs"), sum("ntok").as("total_tokens"))
      .select(
        coalesce(col("source"), lit("(all)")).as("source"),
        coalesce(col("lang_pred"), lit("(all)")).as("lang_pred"),
        col("n_docs"),
        col("total_tokens")
      )

  /** Wide-format corpus composition: one row per source, one column per
    * predicted language (the fixed marker-vocabulary set + 'und'),
    * value = document count — the `pivot` relational shape a
    * composition dashboard reads directly. The pivot value list is
    * EXPLICIT, so Spark skips the extra distinct-values job and the
    * output schema is deterministic; the aggregation itself is one
    * partial-aggregated exchange on source (pivot compiles to a single
    * HashAggregate with one conditional count per column).
    */
  def domainPivot(docs: DataFrame): DataFrame = {
    val langs = markers.keys.toSeq.sorted :+ "und"
    docs
      .select(col("source"), TokenRules.tokens(col("text")).as("toks"))
      .select(
        col("source"),
        markerCount("en"),
        markerCount("de"),
        markerCount("es"),
        markerCount("fr")
      )
      .withColumn("lang_pred", expr(LangVote))
      .groupBy("source")
      .pivot("lang_pred", langs)
      .agg(count(lit(1)))
      .select(col("source") +: langs.map(l => coalesce(col(l), lit(0L)).as(s"n_$l")): _*)
  }

  /** Exact integer token-length percentiles (p50/p90/p99, the
    * percentile_disc rule: smallest length whose cumulative doc count
    * reaches ceil(q·n/100)) — via the distinct-length histogram, so the
    * only data-sized exchange is the groupBy(length); the cumulative
    * window runs over distinct length VALUES (bounded, hundreds), never
    * the corpus. This is how exact percentiles stay payable at 100 TB
    * where a global sort or single-partition rank would not.
    */
  def lengthQuantiles(docs: DataFrame): DataFrame = {
    val lens = docs.select(size(TokenRules.tokens(col("text"))).cast("long").as("ntok"))
    val n = lens.count()
    def k(q: Int): Long = (q * n + 99) / 100
    val hist = lens.groupBy("ntok").agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("cum", sum("c").over(Window.orderBy("ntok")))
    cum.agg(
      min(when(col("cum") >= k(50), col("ntok"))).as("p50_tokens"),
      min(when(col("cum") >= k(90), col("ntok"))).as("p90_tokens"),
      min(when(col("cum") >= k(99), col("ntok"))).as("p99_tokens")
    )
  }

  def invertedIndex(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(TokenRules.tokens(col("text"))).as("term"))
      .distinct()
      .groupBy("term")
      .agg(
        count(lit(1)).as("df"),
        concat_ws(",", transform(array_sort(collect_list(col("doc_id"))), x => x.cast("string")))
          .as("postings")
      )
}
