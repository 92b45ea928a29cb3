package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, NullType}

/** Native Catalyst expressions for the vector-similarity operators
  * (graft.ops.Similarity, embedding dedup/kNN — SURVEY.md §2.C2/C3).
  *
  * Why custom expressions: the declarative cosine/dot formulations need
  * higher-order array lambdas (`aggregate(zip_with(...))`), which Spark
  * evaluates INTERPRETED — BENCH_r02 measured the identical kNN logic at
  * 14.6 s through the lambda path (q25) vs 1.06 s when the score is
  * materialized once through a serialization boundary (q49); the gap is the
  * per-(row x query) interpreted lambda evaluation, re-run for every
  * consumer of the projection. Each expression here is one compiled loop
  * per row over the raw `ArrayData` (no per-element boxing, no lambda
  * dispatch), inlined into WholeStageCodegen via the same
  * `addReferenceObj` pattern as [[SingleArgHashExpr]].
  *
  * Both `array<float>` and `array<double>` inputs are accepted; float
  * elements are widened to double per element (exact), so results are
  * bit-identical to an explicit `transform(v, x -> cast(x as double))`
  * pipeline and to the DuckDB oracle's `::DOUBLE[]` math.
  */
object VecExprs {
  private[functions] def isVec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case NullType                             => true // NULL literals are void-typed
    case _                                    => false
  }

  private[functions] def vecTypeError(name: String, dts: DataType*): TypeCheckResult =
    TypeCheckResult.TypeCheckFailure(
      s"$name requires array<float|double> arguments, got " +
        dts.map(_.catalogString).mkString(", "))
}

/** Shared helper for two-vector expressions: generated code calls `compute`
  * on the instance reference — one virtual call per row, the loop in
  * compiled Scala (see [[SingleArgHashExpr]] for the unary sibling). */
trait BinaryVecExpr extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (VecExprs.isVec(left.dataType) && VecExprs.isVec(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else VecExprs.vecTypeError(prettyName, left.dataType, right.dataType)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  @transient private lazy val leftFloat: Boolean =
    left.dataType match { case ArrayType(FloatType, _) => true; case _ => false }
  @transient private lazy val rightFloat: Boolean =
    right.dataType match { case ArrayType(FloatType, _) => true; case _ => false }

  protected final def elemL(a: ArrayData, i: Int): Double =
    if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
  protected final def elemR(a: ArrayData, i: Int): Double =
    if (rightFloat) a.getFloat(i).toDouble else a.getDouble(i)

  def compute(a: ArrayData, b: ArrayData): Any

  override protected def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vecExpr", this, classOf[BinaryVecExpr].getName)
    val r = ctx.freshName("r") // two expressions can share one codegen scope
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |Object $r = $ref.compute($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${GenHelp.unbox(r, dataType)}; }
       """.stripMargin
    })
  }
}

/** `vec_dot(a, b)` -> double: inner product, accumulated in double.
  * NULL on length mismatch — parity with the zip_with lambda this replaced
  * (null-padded tail -> null sum) and a loud surface for dimension bugs in
  * the corpus; DuckDB's list functions error outright on mismatch, so a
  * silent min-length result would mask exactly the rows the oracle trips
  * on. */
case class VecDot(left: Expression, right: Expression) extends BinaryVecExpr {
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)

  override def compute(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) { s += elemL(a, i) * elemR(b, i); i += 1 }
    java.lang.Double.valueOf(s)
  }
}

/** `vec_cosine(a, b)` -> double: cosine similarity
  * `dot(a,b) / (|a| * |b|)`, computed in one pass. Null when either norm
  * is zero (DuckDB's `list_cosine_similarity` would divide by zero) and on
  * length mismatch — see [[VecDot]] for the parity rationale. */
case class VecCosine(left: Expression, right: Expression) extends BinaryVecExpr {
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecCosine =
    copy(left = l, right = r)

  override def compute(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = elemL(a, i)
      val y = elemR(b, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
}

/** `rhp_bucket(v, nPlanes)` -> bigint: the random-hyperplane (sign) LSH
  * bucket — bit j set iff `dot(v, plane_j) >= 0` — computed for all planes
  * in ONE compiled pass over the vector. Planes come from the deterministic
  * table in [[graft.ops.Similarity.planeTable]] (same literals the DuckDB
  * oracle injects); `nPlanes` must be a foldable integer in [1, 63].
  *
  * Scale note: bucket count is 2^nPlanes; pick
  * nPlanes ≈ log2(corpus / target_bucket_size) so per-bucket candidate sets
  * stay bounded (e.g. 1e9 vectors, ~16k/bucket -> 16 planes / 65k buckets).
  */
case class RhpBucket(child: Expression, nPlanes: Int) extends UnaryExpression {
  require(nPlanes >= 1 && nPlanes <= 63, s"nPlanes must be in [1,63], got $nPlanes")

  override def checkInputDataTypes(): TypeCheckResult =
    if (VecExprs.isVec(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else VecExprs.vecTypeError(prettyName, child.dataType)

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def withNewChildInternal(c: Expression): RhpBucket =
    copy(child = c)

  @transient private lazy val childFloat: Boolean =
    child.dataType match { case ArrayType(FloatType, _) => true; case _ => false }
  // regenerated per executor from the fixed-seed LCG (tiny, deterministic)
  @transient private lazy val planes: Array[Array[Long]] =
    graft.ops.Similarity.planeTable(nPlanes)

  def compute(v: ArrayData): Any = {
    var bucket = 0L
    var j = 0
    while (j < nPlanes) {
      val p = planes(j)
      val n = math.min(v.numElements(), p.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        s += (if (childFloat) v.getFloat(i).toDouble else v.getDouble(i)) * p(i)
        i += 1
      }
      if (s >= 0) bucket |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(bucket)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rhpExpr", this, classOf[RhpBucket].getName)
    val r = ctx.freshName("r") // two expressions can share one codegen scope
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |Object $r = $ref.compute($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${GenHelp.unbox(r, dataType)}; }
       """.stripMargin
    })
  }
}

object BinaryVecExpr {
  /** Extract a foldable int literal (the registration-time plane count). */
  private[graft] def foldableInt(e: Expression, fn: String): Int = {
    require(e.foldable, s"$fn: argument must be a literal integer")
    e.eval(null) match {
      case i: Int  => i
      case l: Long => l.toInt
      case other =>
        throw new IllegalArgumentException(
          s"$fn: argument must be a literal integer, got $other")
    }
  }
}
