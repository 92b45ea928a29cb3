package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expressions for INTEGER vector math — the exact-arithmetic
  * tier under the clustering/semantic-dedup operators (k-means q85, SemDeDup
  * q86). Embeddings are quantized once to a fixed integer grid
  * ([[IntVecQuant]]); every downstream kernel (distance, dot, norm) is then
  * pure int64 arithmetic, which two independent engines reproduce
  * bit-for-bit — the DuckDB oracle checks these operators EXACTLY, with no
  * float-summation-order caveats. Same design rationale as
  * [[graft.functions.VecExprs]]: higher-order array lambdas
  * (`transform`/`aggregate`) evaluate interpreted; these are one compiled
  * pass per row and stay inside WholeStageCodegen.
  *
  * Scale note: at 1e9+ rows the assignment kernel ([[IntVecNearest]]) is the
  * hot loop of Lloyd's iteration — K*D multiply-adds per row, no allocation,
  * no boxing inside the loop. Quantization to int also halves shuffle width
  * vs double vectors when signatures must move.
  */
object IntVecExprs {
  private[functions] def isNumVec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _)             => true
    case org.apache.spark.sql.types.NullType              => true
    case _                                                => false
  }

  private[functions] def isLongVec(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _)                           => true
    case org.apache.spark.sql.types.NullType              => true
    case _                                                => false
  }

  /** Round-half-away-from-zero of a double, exactly — the semantic BOTH
    * Spark's `round(x)` (BigDecimal HALF_UP on the binary double) and
    * DuckDB's `round(x)` (std::round) implement. `v - floor(v)` is exact
    * for |v| < 2^52, so the tie comparison is exact too — no `x + 0.5`
    * representation drift. */
  private[functions] def roundAway(v: Double): Long = {
    val a = math.abs(v)
    val fa = math.floor(a)
    val m = fa.toLong + (if (a - fa >= 0.5) 1L else 0L)
    if (v < 0) -m else m
  }

  /** Extract a foldable array<array<bigint>> literal (the per-iteration
    * centroid table compiled into the plan — the broadcast-side of Lloyd's
    * assignment, bounded by K*D). */
  private[graft] def foldableLongMatrix(e: Expression, fn: String): Array[Array[Long]] = {
    require(e.foldable, s"$fn: centroid argument must be a literal")
    val outer = e.eval(null).asInstanceOf[ArrayData]
    require(outer != null && outer.numElements() > 0, s"$fn: empty centroid table")
    Array.tabulate(outer.numElements()) { i =>
      val inner = outer.getArray(i)
      Array.tabulate(inner.numElements())(j => inner.getLong(j))
    }
  }
}

/** `ivec_quant(vec, scale, offset)` -> array<bigint>:
  * `round(x_as_double * scale) + offset` per element, round half away from
  * zero ([[IntVecExprs.roundAway]]) — bit-identical to DuckDB's
  * `list_transform(v, x -> round(x::DOUBLE * scale)::BIGINT + offset)`.
  * The offset lets callers shift onto a non-negative grid so downstream
  * integer division (centroid means) has no floor-vs-truncate ambiguity. */
case class IntVecQuant(child: Expression, scale: Int, offset: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (IntVecExprs.isNumVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double>, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def withNewChildInternal(c: Expression): IntVecQuant =
    copy(child = c)

  @transient private lazy val isFloat: Boolean =
    child.dataType match { case ArrayType(FloatType, _) => true; case _ => false }

  def compute(a: ArrayData): Any = {
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      out(i) = IntVecExprs.roundAway(v * scale) + offset
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivq", this, classOf[IntVecQuant].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }
}

/** Shared scaffold for binary int-vector kernels: long-typed result, null on
  * length mismatch (loud surface for dimension bugs — see
  * [[graft.functions.VecDot]] for the parity rationale). */
trait BinaryIntVecExpr extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (IntVecExprs.isLongVec(left.dataType) && IntVecExprs.isLongVec(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  def compute(a: ArrayData, b: ArrayData): Any

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bive", this, classOf[BinaryIntVecExpr].getName)
    val r = ctx.freshName("r")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |Object $r = $ref.compute($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${GenHelp.unbox(r, dataType)}; }
       """.stripMargin
    })
  }
}

/** `ivec_dot(a, b)` -> bigint: exact integer inner product. */
case class IntVecDot(left: Expression, right: Expression) extends BinaryIntVecExpr {
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntVecDot =
    copy(left = l, right = r)

  override def compute(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    java.lang.Long.valueOf(s)
  }
}

/** `ivec_norm2(a)` -> bigint: exact squared L2 norm. */
case class IntVecNorm2(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (IntVecExprs.isLongVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def withNewChildInternal(c: Expression): IntVecNorm2 =
    copy(child = c)

  def compute(a: ArrayData): Long = {
    var s = 0L
    var i = 0
    val n = a.numElements()
    while (i < n) { val v = a.getLong(i); s += v * v; i += 1 }
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivn", this, classOf[IntVecNorm2].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }
}

/** `ivec_nearest(q, centroids)` -> array<bigint> `[index, d2]`: the index
  * (0-based, ties -> lowest) of the centroid minimizing exact squared L2
  * distance to `q`, and that distance. The centroid table is a plan-time
  * literal (K*D longs — Lloyd's broadcast side); the kernel is one compiled
  * K*D multiply-add pass per row, no allocation until the 2-element result.
  * Null when `q`'s dimension differs from the table's. */
case class IntVecNearest(child: Expression, centroids: Array[Array[Long]])
    extends UnaryExpression {
  require(centroids.nonEmpty, "ivec_nearest: empty centroid table")

  override def checkInputDataTypes(): TypeCheckResult =
    if (IntVecExprs.isLongVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def withNewChildInternal(c: Expression): IntVecNearest =
    copy(child = c)

  def compute(a: ArrayData): Any = {
    val d = a.numElements()
    if (d != centroids(0).length) return null
    var best = -1
    var bestD2 = Long.MaxValue
    var k = 0
    while (k < centroids.length) {
      val c = centroids(k)
      var s = 0L
      var i = 0
      while (i < d) { val t = a.getLong(i) - c(i); s += t * t; i += 1 }
      if (s < bestD2) { bestD2 = s; best = k }
      k += 1
    }
    new GenericArrayData(Array(best.toLong, bestD2))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivnear", this, classOf[IntVecNearest].getName)
    val r = ctx.freshName("r")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |Object $r = $ref.compute($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
       """.stripMargin
    })
  }
}
