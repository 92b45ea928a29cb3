package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Integer vector kernels (quantize / dot / norm / nearest-centroid): exact
  * rounding semantics at the engine boundary (ties away from zero, matching
  * both Spark's and DuckDB's round()), parity with the declarative lambda
  * formulation, and the loud-null dimension contract. */
class IntVecExprsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def emb = graft.ops.Tables.t(spark, sf, "embeddings") // registers fns

  test("roundAway: ties away from zero, exact fraction comparison") {
    assert(IntVecExprs.roundAway(12.5) == 13L)
    assert(IntVecExprs.roundAway(-12.5) == -13L)
    assert(IntVecExprs.roundAway(12.4999999999) == 12L)
    assert(IntVecExprs.roundAway(-12.4999999999) == -12L)
    assert(IntVecExprs.roundAway(0.49999999999999994) == 0L) // nearest-double-below-0.5
    assert(IntVecExprs.roundAway(0.0) == 0L)
  }

  test("ivec_quant == round(x*scale)+offset via the SQL round (same semantic)") {
    emb // force registration
    val rows = emb.limit(50)
      .select(expr("ivec_quant(embedding, 1000, 1024)").as("native"),
        expr("transform(embedding, x -> cast(round(cast(x as double) * 1000, 0) as bigint) + 1024)")
          .as("lambda"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("ivec_dot / ivec_norm2: exact integers, norm2 == self-dot") {
    val rows = emb.limit(20)
      .select(expr("ivec_quant(embedding, 1000, 0)").as("q"))
      .select(expr("ivec_dot(q, q)").as("selfdot"),
        expr("ivec_norm2(q)").as("n2"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    assert(rows.forall(_.getLong(1) > 0))
  }

  test("ivec_dot: null on dimension mismatch (loud, not silent truncation)") {
    val r = spark.sql(
      "SELECT ivec_dot(array(1L, 2L), array(1L, 2L, 3L)) AS d").collect()(0)
    assert(r.isNullAt(0))
  }

  test("ivec_nearest: picks min-distance centroid, ties to lowest index") {
    emb
    // centroids: [0,0] and [4,0]; q=[2,0] is equidistant -> index 0
    val r = spark.sql(
      """SELECT ivec_nearest(array(2L, 0L),
        |  array(array(0L, 0L), array(4L, 0L))) AS a""".stripMargin).collect()(0)
    assert(r.getSeq[Long](0) == Seq(0L, 4L))
    // q=[3,0] -> index 1, d2 = 1
    val r2 = spark.sql(
      """SELECT ivec_nearest(array(3L, 0L),
        |  array(array(0L, 0L), array(4L, 0L))) AS a""".stripMargin).collect()(0)
    assert(r2.getSeq[Long](0) == Seq(1L, 1L))
    // dimension mismatch -> null
    val r3 = spark.sql(
      "SELECT ivec_nearest(array(1L), array(array(0L, 0L))) AS a").collect()(0)
    assert(r3.isNullAt(0))
  }
}
