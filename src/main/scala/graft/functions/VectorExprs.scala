package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd vector primitives over quantized `array<long>`
  * embeddings.
  *
  * Why these exist: Spark's higher-order functions (`transform`,
  * `zip_with`, `aggregate`) are `CodegenFallback` — every use drops the
  * whole projection out of whole-stage codegen and evaluates the lambda
  * per element through the interpreted path, allocating an intermediate
  * array per call. The ANN scorers ([[graft.ops.Similarity]]) sit on
  * exactly those expressions in their hottest loop (corpus-side scoring
  * of candidate pairs). These expressions compute the identical values
  * in a single fused compiled loop — no intermediate arrays, no lambda
  * dispatch — so the scoring projection stays inside
  * `WholeStageCodegen`.
  *
  * Null semantics are bit-compatible with the SQL forms they replace
  * (the DuckDB oracle hash-compare depends on this):
  *   - `dot_long(a, b)` == `aggregate(zip_with(a, b, (x,y) -> x*y), 0L,
  *     (acc,x) -> acc + x)`: null input → null; length mismatch → null
  *     (zip_with pads with null, the sum then poisons) unless both are
  *     empty (→ 0); any null element → null; overflow wraps like Java
  *     (Spark non-ANSI Multiply/Add semantics).
  *   - `normsq_long(v)` == `aggregate(v, 0L, (acc,x) -> acc + x*x)`:
  *     null input → null; any null element → null.
  *   - `cosine_parts_milli(qv, nv)` fuses dot + both norms + the shared
  *     integer score rule [[graft.ops.Similarity.CosScoreMilli]]
  *     (`(1000 * dot * abs(dot)) div (nn * qn)`, `div` = Spark
  *     IntegralDivide: truncate toward zero, null divisor-zero) into
  *     one pass, returning struct(dot, qn, nn, score_milli).
  */
object VectorExprUtil {

  /** True iff the two arrays have equal length and no null element in
    * either — the precondition under which the fused dot is non-null.
    */
  private def cleanPair(a: ArrayData, b: ArrayData): Boolean = {
    val n = a.numElements()
    if (n != b.numElements()) return false
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return false
      i += 1
    }
    true
  }

  /** Fused single-pass dot + norms + milli-cosine; see class doc for the
    * exact null rules each field follows.
    */
  def cosineParts(qv: ArrayData, nv: ArrayData): InternalRow = {
    val out = new Array[Any](4)
    var qn: java.lang.Long = null
    var nn: java.lang.Long = null
    var dot: java.lang.Long = null
    if (noNulls(qv)) {
      var acc = 0L; var i = 0; val n = qv.numElements()
      while (i < n) { val x = qv.getLong(i); acc += x * x; i += 1 }
      qn = acc
    }
    if (noNulls(nv)) {
      var acc = 0L; var i = 0; val n = nv.numElements()
      while (i < n) { val x = nv.getLong(i); acc += x * x; i += 1 }
      nn = acc
    }
    if (cleanPair(qv, nv)) {
      var acc = 0L; var i = 0; val n = qv.numElements()
      while (i < n) { acc += qv.getLong(i) * nv.getLong(i); i += 1 }
      dot = acc
    }
    out(0) = dot
    out(1) = qn
    out(2) = nn
    out(3) =
      if (dot == null || qn == null || nn == null) null
      else {
        val denom = nn.longValue() * qn.longValue()
        if (denom == 0L) null
        else java.lang.Long.valueOf(1000L * dot.longValue() * math.abs(dot.longValue()) / denom)
      }
    new GenericInternalRow(out)
  }

  private def noNulls(a: ArrayData): Boolean = {
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i)) return false
      i += 1
    }
    true
  }
}

/** `dot_long(a, b)`: fused integer dot product over two `array<long>`
  * columns — see [[VectorExprUtil]] for the exact SQL equivalence.
  */
case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>), got (${l.simpleString}, ${r.simpleString})"
      )
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $x.getLong($i) * $y.getLong($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `normsq_long(v)`: fused integer squared norm over `array<long>`. */
case class NormSqLong(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${other.simpleString}"
      )
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "normsq_long"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getLong(i)
      acc += v * v
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $x.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final long $v = $x.getLong($i);
         |  $acc += $v * $v;
         |}
         |if (!${ev.isNull}) ${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `cosine_parts_milli(qv, nv)`: one-pass
  * struct(dot, qn, nn, score_milli) — the fused form of the ANN
  * scorers' four-column projection. Codegen emits a single static call
  * into [[VectorExprUtil.cosineParts]] (loop JIT-compiles there), which
  * keeps the surrounding projection inside whole-stage codegen.
  */
case class CosinePartsMilli(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>), got (${l.simpleString}, ${r.simpleString})"
      )
  }
  override def dataType: DataType = StructType(
    Seq(
      StructField("dot", LongType, nullable = true),
      StructField("qn", LongType, nullable = true),
      StructField("nn", LongType, nullable = true),
      StructField("score_milli", LongType, nullable = true)
    )
  )
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_parts_milli"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorExprUtil.cosineParts(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (x, y) => s"${ev.value} = graft.functions.VectorExprUtil.cosineParts($x, $y);"
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `quantize100(v)`: per-element
  * `CAST(floor(CAST(x AS DOUBLE) * 100 + 0.5) AS BIGINT)` over an
  * `array<float>` (or `array<double>`) embedding — the shared
  * float→integer quantization rule every ANN path and its DuckDB oracle
  * agree on ([[graft.ops.Similarity.quantized]]). Native for the same
  * reason as the scorers: `transform` is CodegenFallback, and this runs
  * on every corpus scan of every embedding query. IEEE operation order
  * is preserved exactly ((x * 100) + 0.5, floor, truncate-to-long), so
  * values are bit-identical to the SQL form. Null elements stay null;
  * null array stays null.
  */
case class Quantize100(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double>, got ${other.simpleString}"
      )
  }
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quantize100"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Any](n)
    val float = isFloat
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        val d = if (float) x.getFloat(i).toDouble else x.getDouble(i)
        out(i) = java.lang.Long.valueOf(math.floor(d * 100d + 0.5d).toLong)
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "(double) $x.getFloat($i)" else "$x.getDouble($i)"
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val d = ctx.freshName("d")
      val getCall = get.replace("$x", x).replace("$i", i)
      s"""
         |final int $n = $x.numElements();
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i)) {
         |    final double $d = $getCall;
         |    $out[$i] = java.lang.Long.valueOf((long) java.lang.Math.floor($d * 100d + 0.5d));
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `sign_sketch(v, bits)`: the packed sign-bit LSH sketch — bit j set
  * iff Σ_d v[d] · w(j, d) > 0 with the shared deterministic hyperplane
  * weight w(j, d) = ((j·31 + d·17) % 7) − 3
  * ([[graft.ops.Similarity.planeWeightExpr]], same rule in the DuckDB
  * oracles). Native for the same CodegenFallback reason as the other
  * vector primitives — the SQL form is a triple-nested higher-order
  * fold evaluated interpreted per row. Values are identical: integer
  * arithmetic only, and a null element poisons every plane's dot in
  * the SQL form (`null > 0` is false), so the sketch degrades to 0 —
  * reproduced here.
  */
case class SignSketch(child: Expression, bits: Int) extends UnaryExpression {

  require(bits > 0 && bits < 63, s"bits must be in [1, 62], got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${other.simpleString}"
      )
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sign_sketch"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var i = 0
    while (i < n) { if (x.isNullAt(i)) return 0L; i += 1 }
    var acc = 0L
    var j = 0
    while (j < bits) {
      var dot = 0L
      var d = 0
      while (d < n) {
        dot += x.getLong(d) * (((j * 31 + d * 17) % 7) - 3)
        d += 1
      }
      if (dot > 0L) acc |= 1L << j
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val dot = ctx.freshName("dot")
      val anyNull = ctx.freshName("anyNull")
      s"""
         |final int $n = $x.numElements();
         |boolean $anyNull = false;
         |for (int $i = 0; $i < $n; $i++) { if ($x.isNullAt($i)) { $anyNull = true; break; } }
         |long $acc = 0L;
         |if (!$anyNull) {
         |  for (int $j = 0; $j < $bits; $j++) {
         |    long $dot = 0L;
         |    for (int $d = 0; $d < $n; $d++) {
         |      $dot += $x.getLong($d) * ((($j * 31 + $d * 17) % 7) - 3);
         |    }
         |    if ($dot > 0L) $acc |= 1L << $j;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `distinct_intersect_size(a, b)`: |a ∩ b| for two arrays whose
  * elements are already DISTINCT within each array — the verification
  * kernel of every Jaccard/containment dedup check. Equal to
  * `size(array_intersect(a, b))` under that precondition (each side's
  * callers build their arrays with `array_distinct`; union size then
  * derives as `size(a) + size(b) - inter`, so neither the intersection
  * nor the union array is ever materialized). Null elements match each
  * other, as in `array_intersect`. Why native: the built-in builds an
  * OpenHashSet AND the output array per pair; candidate verification
  * runs this over every PPJoin/LSH candidate pair, where only the
  * COUNT is consumed. Element equality is Java value equality
  * (UTF8String/boxed integrals — the callers' types); float arrays
  * would diverge from SQL equality on signed zero, so keep it off
  * float sets.
  */
case class DistinctIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(le, _), ArrayType(re, _)) if le == re => TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two arrays of the same element type, got (${l.simpleString}, ${r.simpleString})"
      )
  }
  private lazy val elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "distinct_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // probe with the smaller side's hash set
    val (small, large) = if (x.numElements() <= y.numElements()) (x, y) else (y, x)
    val set = new java.util.HashSet[Any](math.max(8, small.numElements() * 2))
    var hasNullSmall = false
    var i = 0
    val ns = small.numElements()
    while (i < ns) {
      if (small.isNullAt(i)) hasNullSmall = true
      else set.add(small.get(i, elemType))
      i += 1
    }
    var cnt = 0L
    var nullCounted = false
    var j = 0
    val nl = large.numElements()
    while (j < nl) {
      if (large.isNullAt(j)) {
        if (hasNullSmall && !nullCounted) { cnt += 1; nullCounted = true }
      } else if (set.contains(large.get(j, elemType))) cnt += 1
      j += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the loop lives in the compiled helper; one static call keeps the
    // surrounding projection in whole-stage codegen
    val ref = ctx.addReferenceObj("disExpr", this, classOf[DistinctIntersectSize].getName)
    nullSafeCodeGen(ctx, ev, (x, y) => s"${ev.value} = ((java.lang.Long) $ref.nullSafeEval($x, $y)).longValue();")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
