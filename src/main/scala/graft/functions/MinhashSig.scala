package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MinHash signature: for each seed `i` in `[0, seeds)`,
  * the minimum of `md5(concat('i:', token))` over the document's token
  * array — byte-identical to the per-seed SQL rule the DuckDB oracle
  * runs (`list_min(list_transform(toks, t -> md5('i:' || t)))`,
  * [[graft.ops.Dedup]] `minhashSig`).
  *
  * Why native: the SQL form is `seeds` separate `transform` passes, each
  * a `CodegenFallback` that materializes an intermediate array of
  * 32-char hex strings per document and dispatches an interpreted
  * lambda per token. This expression walks the token array once,
  * digesting `seeds` prefixed MD5s per token into a reused 16-byte
  * scratch and keeping only the running byte-wise minimum per seed —
  * hex-encoding happens `seeds` times per document, not
  * `seeds × tokens` times. Ordering is preserved exactly: lowercase-hex
  * strings compare (as UTF8 binary) in the same order as their digest
  * bytes compare unsigned, so taking the min over raw digests and
  * hex-encoding at the end is the same min.
  *
  * Null semantics match the SQL form: null token array → null; null
  * tokens are skipped (`array_min`/`list_min` ignore nulls); an empty
  * (or all-null) token array yields a signature of `seeds` nulls
  * (`array_min([])` is null), NOT a null array.
  */
object MinhashUtil {

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** "i:" prefix bytes per seed index, grown on demand; seeds counts are
    * tiny compile-time constants (16 in the dedup state), so the cache
    * is effectively one array allocated once per JVM.
    */
  @volatile private var prefixes: Array[Array[Byte]] = Array.empty

  private def prefixFor(i: Int): Array[Byte] = {
    var p = prefixes
    if (i >= p.length) synchronized {
      p = prefixes
      if (i >= p.length) {
        val np = java.util.Arrays.copyOf(p, math.max(i + 1, math.max(16, p.length * 2)))
        var j = p.length
        while (j < np.length) {
          np(j) = (j.toString + ":").getBytes("UTF-8")
          j += 1
        }
        prefixes = np
        p = np
      }
    }
    p(i)
  }

  private val HexChars = "0123456789abcdef".toCharArray

  private def hex(b: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((b(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexChars(b(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  def sig(toks: ArrayData, seeds: Int): ArrayData = {
    val md = digests.get()
    val mins = new Array[Array[Byte]](seeds)
    val scratch = new Array[Byte](16)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val tb = toks.getUTF8String(i).getBytes
        var s = 0
        while (s < seeds) {
          md.reset()
          md.update(prefixFor(s))
          md.update(tb)
          md.digest(scratch, 0, 16)
          if (mins(s) == null) mins(s) = java.util.Arrays.copyOf(scratch, 16)
          else if (unsignedLess(scratch, mins(s))) System.arraycopy(scratch, 0, mins(s), 0, 16)
          s += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](seeds)
    var s = 0
    while (s < seeds) {
      out(s) = if (mins(s) == null) null else hex(mins(s))
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** `minhash_sig(toks, seeds)` — see [[MinhashUtil]]. `seeds` is a plan
  * constant (signature width is part of the committed dedup-state
  * schema), so it is a case-class field, not a child expression.
  */
case class MinhashSig(child: Expression, seeds: Int)
    extends UnaryExpression {

  require(seeds > 0, s"seeds must be positive, got $seeds")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.simpleString}"
      )
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(a: Any): Any =
    MinhashUtil.sig(a.asInstanceOf[ArrayData], seeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = graft.functions.MinhashUtil.sig($x, $seeds);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
