package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, NullType}

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
