package graft.functions

import graft.TestSpark
import graft.ops.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native vector expressions: bit-parity with the declarative (interpreted
  * higher-order lambda) formulations they replaced, float/double input
  * handling, and the hyperplane table's prefix property. */
class VecExprsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def emb = {
    graft.ops.Tables.t(spark, sf, "embeddings") // registers the functions
      .select(col("vec_id"), col("embedding"))
  }

  test("vec_cosine == the aggregate/zip_with lambda cosine, bit for bit") {
    val lambda =
      """aggregate(zip_with(v, qv, (x, y) -> x * y), cast(0 as double), (a, x) -> a + x)
        | / (sqrt(aggregate(v, cast(0 as double), (a, x) -> a + x * x))
        |    * sqrt(aggregate(qv, cast(0 as double), (a, x) -> a + x * x)))""".stripMargin
    val pairs = emb.limit(20)
      .select(expr("transform(embedding, x -> cast(x as double))").as("v"))
      .crossJoin(emb.limit(5)
        .select(expr("transform(embedding, x -> cast(x as double))").as("qv")))
    val diffs = pairs
      .select((expr("vec_cosine(v, qv)") - expr(lambda)).as("diff"))
      .collect().map(_.getAs[Double]("diff"))
    assert(diffs.forall(_ == 0.0), s"max diff ${diffs.map(math.abs).max}")
  }

  test("vec_cosine on raw array<float> == on the widened array<double>") {
    val both = emb.limit(20).select(col("embedding").as("f"),
      expr("transform(embedding, x -> cast(x as double))").as("d"))
      .crossJoin(emb.limit(5).select(col("embedding").as("qf"),
        expr("transform(embedding, x -> cast(x as double))").as("qd")))
    val diffs = both
      .select((expr("vec_cosine(f, qf)") - expr("vec_cosine(d, qd)")).as("diff"))
      .collect().map(_.getAs[Double]("diff"))
    assert(diffs.forall(_ == 0.0))
  }

  test("vec_dot: known values, null propagation, zero-norm cosine is null") {
    import spark.implicits._
    graft.functions.TextHashExprs.register(spark)
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b")
    val r = df.select(
      expr("vec_dot(a, b)").as("dot"),
      expr("vec_cosine(a, array(cast(0 as double), cast(0 as double), cast(0 as double)))").as("zero"),
      expr("vec_dot(a, null)").as("n")).collect().head
    assert(r.getAs[Double]("dot") == 32.0)
    assert(r.isNullAt(1), "zero-norm cosine must be null")
    assert(r.isNullAt(2), "null input must propagate")
  }

  test("length-mismatched vectors yield null, not a min-length result") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0))).toDF("a", "b")
    val r = df.select(expr("vec_dot(a, b)").as("d"),
      expr("vec_cosine(a, b)").as("c")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1),
      "dimension bugs must surface as null (prior lambda semantics), " +
        "never as a silent min-length number")
  }

  test("rhp_bucket == the per-plane CASE/lambda bucket, for every corpus row") {
    val planes = Similarity.hyperplanes
    val caseSql = planes.zipWithIndex.map { case (p, j) =>
      s"""(CASE WHEN aggregate(zip_with(v, ${p.mkString("array(", ",", ")")}, (x, c) -> x * c),
         |  cast(0 as double), (a, x) -> a + x) >= 0 THEN ${1 << j} ELSE 0 END)"""
        .stripMargin
    }.mkString(" + ")
    val rows = emb
      .select(expr("transform(embedding, x -> cast(x as double))").as("v"))
      .select(expr(s"rhp_bucket(v, ${Similarity.NumPlanes})").as("native"),
        expr(caseSql).cast("long").as("declarative"))
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("native") == r.getAs[Long]("declarative")))
  }

  test("planeTable(m) starts with planeTable(n) for m > n (scale-up safety)") {
    val p6 = Similarity.planeTable(6)
    val p16 = Similarity.planeTable(16)
    assert(p16.take(6).map(_.toSeq).toSeq == p6.map(_.toSeq).toSeq)
    assert(p16.length == 16 && p16.forall(_.length == 64))
  }

  test("kNN scoring runs inside WholeStageCodegen with the native cosine") {
    val plan = Similarity.q25KnnBrute(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("veccosine") || plan.contains("vec_cosine"),
      plan.take(1500))
    // the interpreted higher-order lambda must be gone from the hot path
    assert(!plan.contains("aggregate(zip_with"), plan.take(1500))
  }
}
