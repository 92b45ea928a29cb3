package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, NullType}

/** `zorder2(a, b)` -> bigint: the 32-bit Morton (Z-order) key interleaving
  * the low 16 bits of two integer columns — bit i of `a` lands at z-bit 2i,
  * bit i of `b` at z-bit 2i+1.
  *
  * Why it exists: sorting a table by `zorder2(x, y)` before writing gives
  * every file/row-group a tight min/max envelope in BOTH dimensions, so
  * min/max-based skipping (parquet row-group stats, lake file pruning)
  * serves 2-D range predicates — a single-column sort-order only ever
  * bounds one dimension. This is the layout lever for the 100 TB scan
  * path; see q79 for the measurable locality effect.
  *
  * Codegen emits the five-step spread/merge bit twiddle INLINE (pure long
  * arithmetic, no object call, no boxing), so the expression stays inside
  * WholeStageCodegen at full speed. Values above 2^16-1 fold onto the low
  * 16 bits (`& 0xFFFF`) — the standard treatment for Z-ordering a wider
  * domain is to first rank/bucket each column into 16 bits; documents and
  * TPC-H keys at test scale fit directly. */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ZOrder2 = copy(left = l, right = r)

  private def intOrLong(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | NullType => true
    case _                                 => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (intOrLong(left.dataType) && intOrLong(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"zorder2 requires int/bigint arguments, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "zorder2"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val va = a match { case i: java.lang.Integer => i.toLong; case l: java.lang.Long => l.longValue }
    val vb = b match { case i: java.lang.Integer => i.toLong; case l: java.lang.Long => l.longValue }
    java.lang.Long.valueOf(ZOrder2.interleave(va, vb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one call into the SAME static twiddle `nullSafeEval` uses — a static
    // method on primitive longs is JIT-inlined (no boxing, no virtual
    // dispatch), and keeping a single copy means interpreted and codegen
    // paths cannot drift
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrder2.interleave((long) $a, (long) $b);")
}

object ZOrder2 {
  /** Spread the low 16 bits of x to even bit positions (0, 2, .., 30). */
  private def spread(x: Long): Long = {
    var v = x & 0xFFFFL
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}

/** `dhash64(bytes)` -> bigint: 64-bit difference hash (dHash) of a binary
  * payload — the classic perceptual fingerprint for image near-dup
  * detection, computed here over the RAW payload bytes because no image
  * decoder exists in this container (same honest-stub contract as
  * [[graft.ops.Multimodal.MediaCodec]]: in production the input is the
  * decoded + 8x9-downsampled grayscale grid; the hashing, bucketing and
  * pair machinery downstream are unchanged).
  *
  * Semantics: sample 72 bytes at evenly spaced offsets `floor(n*g/72)`
  * (g = 0..71), view them as an 8-row x 9-column grid, and set bit
  * `r*8 + c` iff `px(r, c+1) > px(r, c)` — each row contributes 8
  * gradient-sign bits. Empty payloads hash to 0 (identical-empty is a
  * legitimate dup signal). Near-identical payloads differ in few bits, so
  * Hamming distance over the 64-bit key approximates visual similarity;
  * candidate pairs come from 16-bit-chunk equi-joins exactly like SimHash
  * (pigeonhole: Hamming <= 3 guarantees one equal chunk of 4).
  *
  * One compiled pass per row (72 loads, no allocation) via the shared
  * static kernel — stays inside WholeStageCodegen like the text hashes. */
case class DHash64(child: Expression) extends UnaryExpression {
  override protected def withNewChildInternal(c: Expression): DHash64 =
    copy(child = c)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType | NullType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"dhash64 requires a binary argument, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dhash64"

  override protected def nullSafeEval(b: Any): Any =
    java.lang.Long.valueOf(DHash64.hash(b.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.DHash64.hash($b);")
}

object DHash64 {
  /** Grid geometry: 8 rows x 9 cols = 72 samples -> 64 gradient bits. */
  val Samples = 72

  def hash(bytes: Array[Byte]): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    var h = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        val g = r * 9 + c
        // n*g stays well inside Long for any realistic payload size
        val p1 = bytes(((n.toLong * g) / Samples).toInt) & 0xff
        val p2 = bytes(((n.toLong * (g + 1)) / Samples).toInt) & 0xff
        if (p2 > p1) h |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    h
  }
}
