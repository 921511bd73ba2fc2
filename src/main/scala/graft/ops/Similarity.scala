package graft.ops

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (vec_id, embedding: array<float>, label).
  *
  * Exactness strategy: embeddings are quantized once to integer
  * centi-units (floor(double(x)*100 + 0.5)); every similarity after that
  * is exact int64 arithmetic, so scores and rankings are bit-identical
  * across engines and runs — no float summation-order drift. The ranking
  * score is the monotone integer transform
  * score_milli = 1000 * dot * |dot| div (|a|^2 * |b|^2) (sign-preserving
  * cosine^2 in milli-units).
  *
  * Scale paths:
  *   - [[bruteTopK]]: exact baseline — broadcast the (small) query set,
  *     one pass over the corpus, per-query top-k via window;
  *   - [[lshTopK]]: sign-bit hyperplane buckets (deterministic integer
  *     hyperplanes) restrict each query to its own cell — the IVF-style
  *     scale path: cells shrink candidate sets by ~2^planes.
  */
object Similarity {

  /** (vec_id, label, v: array<bigint>) quantized embeddings. */
  def quantized(embeddings: DataFrame): DataFrame =
    embeddings.select(
      col("vec_id"),
      col("label"),
      // native codegen'd quantizer — bit-identical to
      // transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100 + 0.5) AS BIGINT))
      GraftFunctions.quantize100(col("embedding")).as("v")
    )

  /** Long-format (vec_id, d, x) with per-vector squared norm attached. */
  private def exploded(q: DataFrame): DataFrame =
    q.select(col("vec_id"), posexplode(col("v")).as(Seq("d", "x")))

  private def norms(q: DataFrame): DataFrame =
    q.select(
      col("vec_id"),
      // native codegen'd norm (graft.functions) — same value as
      // aggregate(v, 0L, (acc, x) -> acc + x * x), fused loop
      GraftFunctions.normSqLong(col("v")).as("n2")
    )

  /** The shared integer cosine score: monotone in cosine, exact in
    * BIGINT (sign-preserving square over the norm product). Every
    * ANN/rerank path — and each path's DuckDB oracle — uses this ONE
    * formula over columns (dot, nn, qn); editing it here moves all of
    * them together.
    */
  private[ops] val CosScoreMilli = "(1000 * dot * abs(dot)) div (nn * qn)"

  /** Broadcast-query dot products via the dimension-exploded join — one
    * corpus pass, partial-aggregated — then norm joins and the shared
    * score. Output (q, n, dot, nn, qn, score_milli); shared by
    * [[bruteTopK]] and [[hardNegatives]].
    */
  private def queryScored(q: DataFrame, queries: DataFrame): DataFrame =
    exploded(q)
      .join(
        broadcast(exploded(queries).select(col("vec_id").as("q"), col("d"), col("x").as("qx"))),
        Seq("d")
      )
      .groupBy(col("q"), col("vec_id").as("n"))
      .agg(sum(col("x") * col("qx")).as("dot"))
      .where(col("q") =!= col("n"))
      .join(norms(q).select(col("vec_id").as("n"), col("n2").as("nn")), "n")
      .join(broadcast(norms(queries).select(col("vec_id").as("q"), col("n2").as("qn"))), "q")
      .withColumn("score_milli", expr(CosScoreMilli))

  /** zip_with dot+norm scoring over (qv, nv) array pairs — the
    * bucket/cell-pruned paths' scorer ([[lshTopK]], [[ivfTopK]]) and
    * [[Hybrid.rrfSearch]]'s dense rerank arm.
    */
  private[ops] def pairsScored(pairs: DataFrame): DataFrame =
    pairs
      // one fused native pass per pair (graft.functions) instead of four
      // CodegenFallback higher-order folds; identical values and null
      // rules, and the projection stays inside whole-stage codegen
      .withColumn("cp", GraftFunctions.cosinePartsMilli(col("qv"), col("nv")))
      .withColumn("dot", col("cp.dot"))
      .withColumn("qn", col("cp.qn"))
      .withColumn("nn", col("cp.nn"))
      .withColumn("score_milli", col("cp.score_milli"))
      .drop("cp")

  /** Per-query top-k over a scored pair frame: (q, n, score_milli, rnk).
    *
    * Runs as the bounded-heap aggregate [[graft.functions.TopKRows]]
    * (map-side partial aggregation keeps k rows per query per map task;
    * the exchange carries k × queries × tasks rows, not the full scored
    * stream), NOT a partition-sorting window — same rows and ranks, the
    * order is the identical (score desc, n asc) unique total order.
    */
  private def perQueryTopK(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy("q")
      .agg(
        GraftFunctions
          .topKRows(struct(col("score_milli"), col("n")), k, Seq(true, false))
          .as("top")
      )
      .select(col("q"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(
        col("q"),
        col("t.n").as("n"),
        col("t.score_milli").as("score_milli"),
        (col("pos") + 1).cast("long").as("rnk")
      )

  /** Exact brute-force top-k: for each query vector (vec_id < nQueries),
    * the k nearest other vectors by quantized cosine. Query side is
    * broadcast; the corpus is scanned once.
    */
  def bruteTopK(embeddings: DataFrame, nQueries: Int = 20, k: Int = 8): DataFrame = {
    val q = quantized(embeddings)
    val queries = q.where(col("vec_id") < nQueries)
    perQueryTopK(queryScored(q, queries), k)
  }

  /** Hard-negative mining for contrastive-embedding training: for each
    * query vector (vec_id < nQueries), the k most SIMILAR vectors with a
    * DIFFERENT label — the high-cosine wrong-class candidates a
    * retrieval/embedding trainer pairs against in-label positives (the
    * step that separates "hard" negative sampling from uniform
    * sampling). Same quantized integer cosine score as [[bruteTopK]];
    * same-label candidates are excluded before ranking. Output:
    * (q, n, score_milli, rnk).
    *
    * Scale shape: identical to bruteTopK — broadcast query side, one
    * corpus pass, per-query top-k window (partitions = queries, never a
    * global sort); the label exclusion is a per-row predicate on the
    * joined pair. When the corpus outgrows one scored pass, the
    * LSH/IVF cell restriction composes in front unchanged.
    */
  def hardNegatives(embeddings: DataFrame, nQueries: Int = 20, k: Int = 8): DataFrame = {
    val q = quantized(embeddings)
    val queries = q.where(col("vec_id") < nQueries)
    // bruteTopK's scorer plus the different-label exclusion (Catalyst
    // pushes the predicate below the score projection)
    val scored = queryScored(q, queries)
      .join(q.select(col("vec_id").as("n"), col("label").as("nl")), "n")
      .join(broadcast(queries.select(col("vec_id").as("q"), col("label").as("ql"))), "q")
      .where(col("nl") =!= col("ql"))
    perQueryTopK(scored, k)
  }

  /** Per-label embedding centroids in long format (label, dim, cval) —
    * the exact floor-mean of each label's quantized vectors per
    * dimension (same integer mean rule as the IVF trainer, so both
    * engines agree bit-for-bit). The per-class centroid table is what
    * domain-drift monitors and prototype classifiers read.
    *
    * Shape at scale: one posexplode (constant ×dims fan-out) and ONE
    * partial-aggregated exchange on (label, dim) — label count × dims
    * output rows, corpus passes: one.
    */
  def centroids(embeddings: DataFrame): DataFrame =
    quantized(embeddings)
      .select(col("label"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim"))
      .agg(sum("x").as("s"), count(lit(1)).as("c"))
      .select(
        col("label").cast("long").as("label"),
        col("dim").cast("long").as("dim"),
        // floor division that is exact for negative sums too (same
        // expression the IVF/PQ trainers and their oracles share)
        expr("(s - (((s % c) + c) % c)) div c").as("cval")
      )

  /** Within-class scatter per label: vector count and the exact summed
    * squared distance to the label centroid — the intra-class variance
    * numerator (in quantized-unit²) a clustering-quality or
    * embedding-collapse monitor tracks. Output: (label, n, spread_d2).
    *
    * Shape at scale: the centroid table is label×dims rows (tiny — AQE
    * broadcasts it); the corpus is exploded once and joined on
    * (label, dim), then one partial-aggregated exchange on label.
    */
  def centroidSpread(embeddings: DataFrame): DataFrame = {
    val cent = centroids(embeddings)
    quantized(embeddings)
      .select(
        col("vec_id"),
        col("label").cast("long").as("label"),
        posexplode(col("v")).as(Seq("dim", "x"))
      )
      .withColumn("dim", col("dim").cast("long"))
      .join(cent, Seq("label", "dim"))
      .withColumn("d", col("x") - col("cval"))
      .groupBy("label")
      .agg(
        count_distinct(col("vec_id")).as("n"),
        sum(col("d") * col("d")).as("spread_d2")
      )
  }

  /** Per-dimension statistics — dead-dimension detection: for every
    * embedding dimension, the exact integer min/max/sum and sample
    * variance (n·Σx² − (Σx)²) div (n·(n−1)) over centi units. A
    * dimension whose variance pins at 0 carries no signal (a dead
    * unit upstream); one whose range dwarfs the others dominates
    * unnormalized distances — both are pre-index audits. Products
    * widen to DECIMAL(38,0)/HUGEINT (n·Σx² passes a Long at ~10^9
    * vectors). Output: (d, n, min_x, max_x, sum_x, var_centi2).
    *
    * Shape at scale: one posexplode scan and ONE dims-bounded
    * partial-aggregated exchange.
    */
  def dimStats(embeddings: DataFrame): DataFrame =
    exploded(quantized(embeddings))
      .groupBy(col("d").cast("long").as("d"))
      .agg(
        count(lit(1)).as("n"),
        min(col("x")).as("min_x"),
        max(col("x")).as("max_x"),
        sum(col("x")).as("sum_x"),
        expr(
          "CAST(IF(count(1) > 1, (CAST(count(1) AS DECIMAL(38,0)) * sum(CAST(x AS DECIMAL(38,0)) * x) " +
            "- CAST(sum(x) AS DECIMAL(38,0)) * sum(x)) DIV (CAST(count(1) AS DECIMAL(38,0)) * (count(1) - 1)), 0) AS BIGINT)"
        ).as("var_centi2")
      )

  /** Per-query label margin — the metric-learning separability eval:
    * for each query vector, its best same-label score and best
    * different-label score under the shared integer cosine, and their
    * difference. margin ≤ 0 means the nearest neighbor is
    * wrong-labeled — the per-example failure row a retrieval-embedding
    * audit drills into; a query whose label has no other member
    * reports NULL best_same (both engines agree on the NULL rule).
    * Output: (q, best_same_milli, best_diff_milli, margin_milli).
    *
    * Shape at scale: the broadcast-query brute scorer with label
    * columns attached, folded by ONE query-keyed aggregate — no
    * top-k window, no second corpus pass.
    */
  def labelMargin(embeddings: DataFrame, nQueries: Int = 20): DataFrame = {
    val q = quantized(embeddings)
    val queries = q.where(col("vec_id") < nQueries)
    queryScored(q, queries)
      .join(q.select(col("vec_id").as("n"), col("label").as("nl")), "n")
      .join(broadcast(queries.select(col("vec_id").as("q"), col("label").as("ql"))), "q")
      .groupBy("q")
      .agg(
        max(when(col("nl") === col("ql"), col("score_milli"))).as("best_same_milli"),
        max(when(col("nl") =!= col("ql"), col("score_milli"))).as("best_diff_milli")
      )
      .withColumn("margin_milli", col("best_same_milli") - col("best_diff_milli"))
  }

  /** Per-label norm profile — the embedding-collapse monitor's other
    * gauge: vector count and the exact min/max/floor-mean of the
    * squared quantized norm per label (a label whose norm spread
    * pinches toward a point is collapsing; one whose max runs away
    * holds outliers before they show up in distance space). All
    * integer: norms are exact centi-unit sums of squares, the mean is
    * floor(Σ div n). Output: (label, n, min_n2, max_n2, avg_n2).
    *
    * Shape at scale: one zero-join scan computes each row's norm
    * inside codegen; one labels-bounded partial-aggregated exchange.
    */
  def normProfile(embeddings: DataFrame): DataFrame =
    quantized(embeddings)
      .select(
        col("label").cast("long").as("label"),
        GraftFunctions.normSqLong(col("v")).as("n2")
      )
      .groupBy("label")
      .agg(
        count(lit(1)).as("n"),
        min(col("n2")).as("min_n2"),
        max(col("n2")).as("max_n2"),
        expr("sum(n2) div count(1)").as("avg_n2")
      )

  /** Per-vector centroid-distance outlier score — label-noise mining:
    * each vector's exact squared distance to its label centroid,
    * normalized by the label's MEAN squared distance as
    * ratio_milli = 1000·d²·n div Σd² (a ratio ≫ 1000 marks a vector
    * sitting far outside its class — a mislabeled example or an
    * embedding-model failure, the rows a training-data audit pulls
    * first). All integer: the 1000·d²·n product widens to
    * DECIMAL(38,0) (HUGEINT in the oracle) since n alone can be 10^9
    * at corpus scale; a collapsed label (Σd² = 0) scores 0 by rule.
    * Output: (vec_id, label, d2, ratio_milli).
    *
    * Shape at scale: the label×dims centroid table joins the exploded
    * corpus (AQE broadcast), ONE (vec_id, label)-keyed
    * partial-aggregated exchange builds d², and the label rollup is a
    * labels-sized aggregate joined back broadcast. One corpus pass
    * after the centroid aggregate.
    */
  def centroidOutliers(embeddings: DataFrame): DataFrame = {
    val cent = centroids(embeddings)
    // staged: the corpus-sized explode+join+aggregate feeds BOTH the
    // label rollup and the final join — unstaged it would run twice
    val d2 = graft.util.Materialize.stage(
      quantized(embeddings)
        .select(
          col("vec_id"),
          col("label").cast("long").as("label"),
          posexplode(col("v")).as(Seq("dim", "x"))
        )
        .join(cent, Seq("label", "dim"))
        .groupBy("vec_id", "label")
        .agg(sum(expr("(x - cval) * (x - cval)")).as("d2"))
    )
    val lbl = d2.groupBy("label").agg(sum(col("d2")).as("sum_d2"), count(lit(1)).as("n"))
    d2.join(lbl, "label")
      .select(
        col("vec_id"),
        col("label"),
        col("d2"),
        expr(
          "CASE WHEN sum_d2 = 0 THEN CAST(0 AS BIGINT) " +
            "ELSE CAST((CAST(1000 AS DECIMAL(38,0)) * d2 * n) DIV sum_d2 AS BIGINT) END"
        ).as("ratio_milli")
      )
  }

  /** Inter-class centroid separation: exact squared L2 distance between
    * every label-centroid pair (label_a < label_b) in quantized-unit² —
    * read next to [[centroidSpread]]'s intra-class scatter it gives the
    * Fisher-style separation ratio an embedding-collapse monitor
    * tracks (inter-distance shrinking toward intra-spread = the space
    * is folding). Output: (label_a, label_b, centroid_d2).
    *
    * Shape at scale: everything downstream of the centroid aggregate
    * operates on the labels×dims table (tiny); the pair join is an
    * equi-join on dim with the staged centroid table on both sides —
    * labels² × dims intermediate rows, independent of corpus size.
    */
  def centroidSeparation(embeddings: DataFrame): DataFrame = {
    val cent = graft.util.Materialize.stage(centroids(embeddings))
    cent.as("a")
      .join(
        cent.as("b"),
        col("a.dim") === col("b.dim") && col("a.label") < col("b.label")
      )
      .select(
        col("a.label").as("label_a"),
        col("b.label").as("label_b"),
        (col("a.cval") - col("b.cval")).as("d")
      )
      .groupBy("label_a", "label_b")
      .agg(sum(col("d") * col("d")).as("centroid_d2"))
  }

  val Planes = 8

  /** Deterministic integer hyperplane weight for (plane j, dim d) —
    * shared with the oracle SQL.
    */
  def planeWeightExpr(j: String, d: String): String =
    s"(($j * 31 + $d * 17) % 7) - 3"

  /** Sign-bit LSH bucket per vector: bit j = [dot(v, r_j) > 0].
    *
    * All `Planes` hyperplane dot products are one nested higher-order
    * array expression evaluated per row inside whole-stage codegen —
    * zero shuffles, zero joins. (Round 1 posexploded to 64 rows/vector,
    * joined a plane table and ran two shuffled groupBys for the same
    * arithmetic.)
    */
  def bucketExpr(v: String): String = sketchExpr(v, Planes)

  def buckets(embeddings: DataFrame): DataFrame =
    quantized(embeddings)
      .select(col("vec_id"), sketchCol("v", Planes).as("bucket"))

  /** Width of the binary similarity sketch used by [[hammingTopK]] —
    * wider than the 8-bit LSH bucket (buckets partition, sketches
    * RANK); 48 keeps every shiftleft below the sign bit so the packed
    * value is identical arithmetic in both engines.
    */
  val SketchBits = 48

  /** The single n-bit packed sign-sketch definition — [[bucketExpr]]
    * is exactly this at `Planes` bits, so the bucket ≡ sketch-low-byte
    * invariant (unit-tested) holds by construction.
    */
  /** Native evaluation of [[sketchExpr]] (graft.functions.SignSketch —
    * identical integer values, fused codegen loop instead of the
    * interpreted triple-nested fold). All Spark-side sketch/bucket
    * sites go through this; [[sketchExpr]] remains the documented
    * shared rule the DuckDB oracles replay.
    */
  private[ops] def sketchCol(v: String, bits: Int): org.apache.spark.sql.Column =
    graft.functions.GraftFunctions.signSketch(col(v), bits).cast("long")

  def sketchExpr(v: String, bits: Int): String =
    s"aggregate(transform(sequence(0, ${bits - 1}), j -> " +
      s"CASE WHEN aggregate(zip_with($v, sequence(0, size($v) - 1), " +
      s"(x, d) -> x * (${planeWeightExpr("j", "d")})), 0L, (a2, x2) -> a2 + x2) > 0 " +
      "THEN shiftleft(1L, j) ELSE 0L END), 0L, (acc, b) -> acc + b)"

  /** Binary-sketch ANN ranking: every vector is packed to a 48-bit
    * sign sketch (one row-local array expression — the [[buckets]]
    * arithmetic, 6× wider), and each query ranks the corpus by sketch
    * HAMMING distance (ties by id) — the 1-bit-per-plane extreme of
    * the quantization family next to [[sqTopK]] (8 bits/dim) and
    * [[pqCodes]]: the memory shape billion-vector prefilters actually
    * ship (48 bits/vector), with exact cosine rerank composing behind
    * it. Output: (q, n, hamming, rnk).
    *
    * Shape at scale: sketching is a zero-shuffle scan; ranking is a
    * broadcast-queries × corpus pass on 8-byte sketches (XOR +
    * bit_count per pair — no dim-exploded join at all), then the
    * per-query top-k window. The corpus-side payload is the sketch,
    * never the vector.
    */
  def hammingTopK(embeddings: DataFrame, nQueries: Int = 20, k: Int = 8): DataFrame = {
    val sk = graft.util.Materialize.stage(
      quantized(embeddings)
        .select(col("vec_id"), sketchCol("v", SketchBits).as("sk"))
    )
    // same bounded-heap top-k as perQueryTopK, ordered (hamming asc,
    // n asc) — the sketch stream never crosses an exchange in full
    sk.select(col("vec_id").as("n"), col("sk").as("nsk"))
      .crossJoin(broadcast(
        sk.where(col("vec_id") < nQueries).select(col("vec_id").as("q"), col("sk").as("qsk"))
      ))
      .where(col("q") =!= col("n"))
      .select(col("q"), col("n"), expr("CAST(bit_count(qsk ^ nsk) AS BIGINT)").as("hamming"))
      .groupBy("q")
      .agg(
        GraftFunctions
          .topKRows(struct(col("hamming"), col("n")), k, Seq(false, false))
          .as("top")
      )
      .select(col("q"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(
        col("q"),
        col("t.n").as("n"),
        col("t.hamming").as("hamming"),
        (col("pos") + 1).cast("long").as("rnk")
      )
  }

  /** Recall@k of the 48-bit Hamming ranking against the exact brute
    * ranking — how much neighborhood structure survives 1-bit
    * quantization (the prefilter-quality gate: low recall here means
    * the sketch needs more bits before it can gate an exact rerank).
    * Output: (q, n_true, n_hits_hamming, recall_hamming_permille).
    */
  def annRecallHamming(embeddings: DataFrame, nQueries: Int = 20, k: Int = 8): DataFrame =
    recallVsBrute(embeddings, hammingTopK(embeddings, nQueries, k), "hamming", nQueries, k)

  /** The ONE recall-vs-brute harness behind [[annRecallSq]] and
    * [[annRecallHamming]]: stage the exact top-k, left-semi intersect
    * the approximate ranking per query, coalesce missing queries to 0
    * hits. One definition so the recall rule cannot drift between
    * quantizer gates.
    */
  private def recallVsBrute(
      embeddings: DataFrame,
      approx: DataFrame,
      suffix: String,
      nQueries: Int,
      k: Int
  ): DataFrame = {
    val brute = graft.util.Materialize.stage(
      bruteTopK(embeddings, nQueries, k).select(col("q"), col("n"))
    )
    val hits = brute
      .join(approx.select("q", "n"), Seq("q", "n"), "left_semi")
      .groupBy("q")
      .agg(count(lit(1)).as("h"))
    brute
      .groupBy("q")
      .agg(count(lit(1)).as("n_true"))
      .join(hits, Seq("q"), "left")
      .select(
        col("q"),
        col("n_true"),
        coalesce(col("h"), lit(0L)).as(s"n_hits_$suffix"),
        expr("(1000 * coalesce(h, 0L)) div n_true").as(s"recall_${suffix}_permille")
      )
  }

  /** Bucketed ANN: like [[bruteTopK]] but each query only scans its own
    * sign-bit cell. Approximate (recall < 1) by design — the scale path.
    */
  def lshTopK(embeddings: DataFrame, nQueries: Int = 20, k: Int = 8): DataFrame = {
    // bucket is a per-row expression — attach it in the scan projection
    // instead of self-joining a separate buckets() frame
    val q = quantized(embeddings).withColumn("bucket", sketchCol("v", Planes))
    val queries = q.where(col("vec_id") < nQueries)
    val corpus = q.select(col("vec_id").as("n"), col("bucket"), col("v").as("nv"))
    val pairs = pairsScored(
      broadcast(queries.select(col("vec_id").as("q"), col("bucket"), col("v").as("qv")))
        .join(corpus, Seq("bucket"))
        .where(col("q") =!= col("n"))
    )
    perQueryTopK(pairs, k)
  }

  /** Multi-probe bucketed ANN — like [[lshTopK]], but each query also
    * scans every bucket at Hamming distance 1 from its own (the standard
    * multi-probe LSH recall fix: a near neighbor that lands on the other
    * side of ONE hyperplane is still found). The probe set is built by
    * EXPANDING the broadcast query side into its Planes+1 probe buckets
    * and equi-joining on bucket — never a bit_count theta-join, which
    * would plan as a nested-loop over the corpus. Candidate volume is
    * (Planes+1)× the single-bucket path, still a vanishing fraction of
    * brute force at real bucket counts.
    */
  def lshTopKProbed(embeddings: DataFrame, nQueries: Int = 20, k: Int = 8): DataFrame = {
    val q = quantized(embeddings).withColumn("bucket", sketchCol("v", Planes))
    val queries = q
      .where(col("vec_id") < nQueries)
      .select(
        col("vec_id").as("q"),
        col("v").as("qv"),
        explode(
          expr(
            s"array_union(array(bucket), " +
              s"transform(sequence(0, ${Planes - 1}), j -> bucket ^ shiftleft(1L, j)))"
          )
        ).as("bucket")
      )
    val corpus = q.select(col("vec_id").as("n"), col("bucket"), col("v").as("nv"))
    val pairs = pairsScored(
      broadcast(queries).join(corpus, Seq("bucket")).where(col("q") =!= col("n"))
    )
    perQueryTopK(pairs, k)
  }

  /** ANN self-evaluation — per query, recall@k of the sign-bit-LSH paths
    * (single-bucket [[lshTopK]] and Hamming-1 multi-probe
    * [[lshTopKProbed]]) against the exact brute-force ranking:
    * (q, n_true, n_hits_lsh, recall_lsh_permille, n_hits_probe,
    * recall_probe_permille). This is the table an operator actually
    * watches when tuning the approximate path (bucket bits, probe
    * count): the lossy variants' quality quantified against their own
    * baseline, corpus-resident — no external ground truth needed.
    *
    * Scale shape: one brute scoring pass (the evaluation's cost floor —
    * run it on a sampled query set, as here) + the two bucketed passes,
    * then left-semi joins of (nQueries × k)-row tables. All rankings use
    * the identical deterministic tie-break (score desc, neighbor asc),
    * so recall is a pure set intersection, not rank-order-sensitive.
    */
  def annRecall(embeddings: DataFrame, nQueries: Int = 20, k: Int = 8): DataFrame = {
    val brute = graft.util.Materialize.stage(
      bruteTopK(embeddings, nQueries, k).select(col("q"), col("n"))
    )
    def hitsOf(approx: DataFrame, name: String): DataFrame =
      brute
        .join(approx.select("q", "n"), Seq("q", "n"), "left_semi")
        .groupBy("q")
        .agg(count(lit(1)).as(name))
    val hLsh = hitsOf(lshTopK(embeddings, nQueries, k), "h_lsh")
    val hProbe = hitsOf(lshTopKProbed(embeddings, nQueries, k), "h_probe")
    brute
      .groupBy("q")
      .agg(count(lit(1)).as("n_true"))
      .join(hLsh, Seq("q"), "left")
      .join(hProbe, Seq("q"), "left")
      .select(
        col("q"),
        col("n_true"),
        coalesce(col("h_lsh"), lit(0L)).as("n_hits_lsh"),
        expr("(1000 * coalesce(h_lsh, 0L)) div n_true").as("recall_lsh_permille"),
        coalesce(col("h_probe"), lit(0L)).as("n_hits_probe"),
        expr("(1000 * coalesce(h_probe, 0L)) div n_true").as("recall_probe_permille")
      )
  }

  private def centroidsLit(cvs: Seq[Seq[Long]]): String =
    cvs.zipWithIndex
      .map { case (cv, i) =>
        s"named_struct('cell', CAST($i AS BIGINT), 'cv', array(${cv.mkString("L, ")}L))"
      }
      .mkString("array(", ", ", ")")

  private def d2Expr(v: String, cv: String): String =
    s"aggregate(zip_with($v, $cv, (x, c) -> (x - c) * (x - c)), 0L, (a, e) -> a + e)"

  /** (d2, cell) structs sorted ascending — argmin with cell tiebreak. */
  private def rankedCellsExpr(cvs: Seq[Seq[Long]], v: String): String =
    s"array_sort(transform(${centroidsLit(cvs)}, s -> " +
      s"named_struct('d2', ${d2Expr(v, "s.cv")}, 'cell', s.cell)))"

  private def assignExpr(cvs: Seq[Seq[Long]], v: String): String =
    s"element_at(${rankedCellsExpr(cvs, v)}, 1).cell"

  /** Deterministic k-means: the `nCells` rows minimizing
    * (md5(vec_id), vec_id) seed the codebook, refined by `iters` exact
    * floor-mean Lloyd rounds. Distributed component sums, driver mean
    * sync — k-means always syncs centroids per round; the per-round
    * driver payload is nCells×dim longs regardless of corpus size.
    * Shared by [[ivfTopK]] (full vectors) and [[pqCodes]] (one call
    * per subspace on sliced vectors).
    */
  private def trainKmeans(q: DataFrame, nCells: Int, iters: Int): Seq[Seq[Long]] = {
    val seedRows = q
      .select(col("vec_id"), col("v"))
      .withColumn("h", md5(col("vec_id").cast("string")))
      .orderBy("h", "vec_id")
      .limit(nCells)
      .collect()
    val seedCvs: Seq[Seq[Long]] = seedRows.map(_.getSeq[Long](1).toSeq).toSeq
    (1 to iters).foldLeft(seedCvs) { (cvs, _) =>
      val sums = q
        .withColumn("cell", expr(assignExpr(cvs, "v")))
        .select(col("cell"), posexplode(col("v")).as(Seq("d", "x")))
        .groupBy("cell", "d")
        .agg(sum("x").as("s"), count(lit(1)).as("c"))
        .collect()
        .map(r => (r.getLong(0).toInt, r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      cvs.zipWithIndex.map { case (prev, cell) =>
        prev.indices.map { d =>
          sums.get((cell, d)) match {
            case Some((s, c)) => (s - (((s % c) + c) % c)) / c // exact floor mean
            case None         => prev(d) // empty cell keeps its centroid
          }
        }
      }
    }
  }

  /** Product-quantization codes (the IVF-PQ compression path): the
    * vector is split into `m` contiguous subspaces, each subspace gets
    * its own deterministically-trained codebook of `nCodes` centroids
    * (same md5-seeded k-means as [[ivfTopK]], run per subspace), and
    * every vector is encoded as its m nearest-sub-centroid ids plus the
    * exact squared reconstruction error. Output:
    * (vec_id, code_0..code_{m-1}, err_d2).
    *
    * Why it matters at 100 TB: a 64-dim int vector compresses to m
    * small codes (here 4 bytes), so the ANN index holds the codes and
    * the m tiny codebooks instead of raw vectors — the memory shape
    * IVF-PQ systems use to keep billion-vector indexes resident.
    * Training syncs m × nCodes × (dim/m) longs to the driver per Lloyd
    * round (= one codebook set, corpus-size-independent); encoding is a
    * zero-shuffle scan projection.
    */
  def pqCodes(embeddings: DataFrame, m: Int = 4, nCodes: Int = 8, lloydIters: Int = 1): DataFrame = {
    val q = quantized(embeddings)
    val dimRow = q.select(size(col("v"))).take(1)
    if (dimRow.isEmpty)
      // empty embeddings: empty codes frame with the real path's schema
      // (all-BIGINT), matching the sibling ANN ops' return-empty rule
      return q.select(
        col("vec_id") +:
          ((0 until m).map(j => lit(0L).as(s"code_$j")) :+ lit(0L).as("err_d2")): _*
      )
    val dim = dimRow(0).getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by $m subspaces")
    val sub = dim / m
    val books: Seq[Seq[Seq[Long]]] = (0 until m).map { j =>
      trainKmeans(
        q.select(col("vec_id"), expr(s"slice(v, ${j * sub + 1}, $sub)").as("v")),
        nCodes,
        lloydIters
      )
    }
    val assigned = q.select(
      col("vec_id") +:
        (0 until m).map { j =>
          expr(s"element_at(${rankedCellsExpr(books(j), s"slice(v, ${j * sub + 1}, $sub)")}, 1)")
            .as(s"a_$j")
        }: _*
    )
    assigned.select(
      col("vec_id") +:
        ((0 until m).map(j => col(s"a_$j.cell").as(s"code_$j")) :+
          (0 until m).map(j => col(s"a_$j.d2")).reduce(_ + _).as("err_d2")): _*
    )
  }

  /** Per-dimension [min, max] stats folded to a 1-row sorted struct
    * array — the SQ trainer table shared by [[sqCodes]] and
    * [[sqRecon]].
    */
  private def sqStats(q: DataFrame): DataFrame =
    exploded(q)
      .groupBy("d")
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .agg(expr("array_sort(collect_list(struct(d, mn, mx)))").as("st"))

  /** SQ8 code for one (x, s) zip_with pair — inlined where used
    * because SQL lambdas have no let-binding.
    */
  private val SqCode = "(CASE WHEN s.mx = s.mn THEN 0L " +
    "ELSE (510 * (x - s.mn) + (s.mx - s.mn)) div (2 * (s.mx - s.mn)) END)"

  /** (vec_id, label, v) with v REPLACED by its SQ8 reconstruction —
    * the decoded view an SQ-compressed index actually ranks with.
    */
  private def sqRecon(q: DataFrame): DataFrame =
    q.crossJoin(sqStats(q))
      .select(
        col("vec_id"),
        col("label"),
        expr(
          s"zip_with(v, st, (x, s) -> s.mn + (2 * $SqCode * (s.mx - s.mn) + 255) div 510)"
        ).as("v")
      )

  /** Scalar (SQ8-style) quantization — the memory-tier companion to
    * [[pqCodes]]: every dimension is affinely mapped to an 8-bit code
    * against its corpus-wide [min, max] range (the FAISS
    * ScalarQuantizer rule), and the exact reconstruction error is
    * reported per vector so an index builder can decide SQ8-vs-PQ per
    * corpus. All arithmetic is exact-integer over the shared
    * centi-quantized vectors: code = round(255·(x−mn)/r) as
    * (510·(x−mn)+r) div (2r), recon = mn + (2·code·r+255) div 510,
    * both non-negative so truncation == floor across engines; a
    * constant dimension (r = 0) codes to 0 and reconstructs exactly.
    * Output: (vec_id, label, code_sum, err_sum_centi, err_max_centi)
    * — code_sum pins the code assignment itself to the oracle, the
    * err columns the reconstruction rule.
    *
    * Shape at scale: one dimension-keyed partial-aggregated exchange
    * (≤ dims rows out) folded into a 1-row sorted struct array that
    * crossJoins back (broadcast — the kg_stats scalar pattern), then
    * ONE zero-shuffle codegen'd corpus pass does codes + errors
    * row-locally via zip_with. Two corpus scans total (train + encode)
    * — the standard SQ shape; nothing per-vector ever shuffles.
    */
  def sqCodes(embeddings: DataFrame): DataFrame = {
    val q = quantized(embeddings)
    val st = sqStats(q)
    val code = SqCode
    q.crossJoin(st)
      .select(
        col("vec_id"),
        col("label").cast("long").as("label"),
        expr(
          s"zip_with(v, st, (x, s) -> struct($code AS c, " +
            s"abs(x - (s.mn + (2 * $code * (s.mx - s.mn) + 255) div 510)) AS e))"
        ).as("pe")
      )
      .select(
        col("vec_id"),
        col("label"),
        expr("aggregate(pe, 0L, (a, e) -> a + e.c)").as("code_sum"),
        expr("aggregate(pe, 0L, (a, e) -> a + e.e)").as("err_sum_centi"),
        expr("aggregate(pe, 0L, (a, e) -> greatest(a, e.e))").as("err_max_centi")
      )
  }

  /** Exact top-k over the SQ8-RECONSTRUCTED vectors — what an
    * SQ-compressed index actually returns before any exact rerank.
    * Same broadcast-query brute shape as [[bruteTopK]], scoring the
    * decoded values with the shared integer cosine. Output:
    * (q, n, score_milli, rnk).
    */
  def sqTopK(embeddings: DataFrame, nQueries: Int = 20, k: Int = 8): DataFrame = {
    val qr = graft.util.Materialize.stage(sqRecon(quantized(embeddings)))
    perQueryTopK(queryScored(qr, qr.where(col("vec_id") < nQueries)), k)
  }

  /** Recall@k of the SQ8-reconstructed ranking against the exact brute
    * ranking — the accept/reject gate on the quantizer itself (the
    * [[annRecall]] harness pointed at lossy compression instead of
    * bucket pruning): if recall here is low, SQ8 is destroying
    * neighborhoods and the index needs PQ or more bits, no matter how
    * good the reconstruction-error numbers look. Output:
    * (q, n_true, n_hits_sq, recall_sq_permille).
    *
    * Shape at scale: two brute passes (exact + reconstructed — each
    * broadcast-queries × one corpus scan) and a per-query semi-join;
    * the recall table is nQueries rows.
    */
  def annRecallSq(embeddings: DataFrame, nQueries: Int = 20, k: Int = 8): DataFrame =
    recallVsBrute(embeddings, sqTopK(embeddings, nQueries, k), "sq", nQueries, k)

  /** IVF ANN with TRAINED centroids — the scale path beyond fixed
    * hyperplanes: a deterministic hash-seeded sample of `nCells` vectors
    * is refined by one Lloyd iteration (assign-all → integer-mean
    * update), every vector is indexed by its nearest trained centroid,
    * and each query probes only its `nProbe` nearest cells.
    *
    * Determinism/exactness: seeds are the `nCells` rows minimizing
    * (md5(vec_id), vec_id); distances are integer squared-euclidean in
    * centi-units; centroid means use exact floor division
    * ((s - mod(s, c)) / c with mathematical mod, identical in both
    * engines regardless of their integer-division convention); argmin
    * ties break by cell id. The DuckDB oracle replays the identical
    * training, so results are bit-identical — the approximation is in
    * the DECLARED probe rule, not in engine drift.
    *
    * Scale shape: training is two tiny driver syncs (the seed sample and
    * the 16×dim component sums — k-means always syncs centroids per
    * round) around fully-distributed per-row expressions; the index
    * assignment is a zero-shuffle scan projection, and the query join is
    * broadcast-queries × cell-pruned corpus, exactly [[lshTopK]]'s
    * shape with learned cells instead of sign bits.
    */
  def ivfTopK(
      embeddings: DataFrame,
      nCells: Int = 16,
      nProbe: Int = 6,
      nQueries: Int = 20,
      k: Int = 8,
      lloydIters: Int = 2
  ): DataFrame = {
    val q = quantized(embeddings)
    val trained = trainKmeans(q, nCells, lloydIters)

    // --- index: every vector's nearest trained centroid (scan projection) ---
    val indexed = q.select(
      col("vec_id").as("n"),
      col("v").as("nv"),
      expr(assignExpr(trained, "v")).as("cell")
    )

    // --- query: probe the nProbe nearest cells ---
    val queries = q
      .where(col("vec_id") < nQueries)
      .select(
        col("vec_id").as("q"),
        col("v").as("qv"),
        explode(
          expr(s"transform(slice(${rankedCellsExpr(trained, "v")}, 1, $nProbe), p -> p.cell)")
        ).as("cell")
      )
    val pairs = pairsScored(
      broadcast(queries)
        .join(indexed, Seq("cell"))
        .where(col("q") =!= col("n"))
    )
    perQueryTopK(pairs, k)
  }

  /** Threshold near-duplicate pairs by embedding cosine, restricted to
    * (label, sign-bit bucket) blocks: (a, b, score_milli) with
    * score >= thetaMilli.
    *
    * Scale shape: the self-join key includes the LSH bucket, so each
    * label block is further cut ~2^Planes ways — near-duplicate pairs
    * land in the same bucket with high probability, and candidate
    * volume stays ~linear instead of O(label-block^2). Approximate by
    * design (a declared recall tradeoff, like lshTopK); the oracle
    * encodes the same bucket rule.
    */
  def cosineNearDupPairs(embeddings: DataFrame, thetaMilli: Int = 150): DataFrame = {
    val q = quantized(embeddings).withColumn("bucket", sketchCol("v", Planes))
    val a = q.select(col("label"), col("bucket"), col("vec_id").as("a"), col("v").as("av"))
    val b = q.select(col("label"), col("bucket"), col("vec_id").as("b"), col("v").as("bv"))
    a.join(b, Seq("label", "bucket"))
      .where(col("a") < col("b"))
      // fused native scorer; score_milli is bit-identical to the
      // spelled-out (1000 * dot * abs(dot)) div (na * nb) rule
      .withColumn("score_milli", GraftFunctions.cosinePartsMilli(col("av"), col("bv")).getField("score_milli"))
      .where(col("score_milli") >= thetaMilli)
      .select("a", "b", "score_milli")
  }

  /** SemDeDup-style semantic duplicate clusters: connected components
    * over the verified cosine near-dup pair graph, so transitive chains
    * (a~b, b~c) collapse into one cluster even when a~c misses the
    * threshold. Emits (vec_id, dup_group = min member id) — the
    * keep-one-per-cluster decision an embedding-level dedup pass
    * applies. Same adaptive CC as the MinHash group operator.
    */
  def cosineGroups(embeddings: DataFrame, thetaMilli: Int = 50): DataFrame =
    Dedup.groupsFromPairs(
      cosineNearDupPairs(embeddings, thetaMilli).select(col("a"), col("b")),
      "vec_id"
    )
}
