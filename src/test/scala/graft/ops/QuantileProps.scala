package graft.ops

import graft.TestSpark
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the weighted lower-quantile convention behind q139's
  * medians and q147's winsorization cuts: on ARBITRARY weighted value sets
  * the marginal-window implementation must equal the definition computed
  * directly on the expanded multiset — smallest value whose cumulative
  * count reaches ⌈n·num/den⌉ — including ties, duplicate-heavy sets, and
  * the n = 1 edge. */
class QuantileProps extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // small value domain -> heavy ties; sizes down to 1
  private val corpusGen: Gen[List[Long]] = for {
    n <- Gen.choose(1, 120)
    vs <- Gen.listOfN(n, Gen.choose(0L, 15L))
  } yield vs

  private def refQuantile(vs: Seq[Long], num: Int, den: Int): Long = {
    val sorted = vs.sorted
    val k = (vs.size.toLong * num + den - 1) / den // ceil(n*num/den), >= 1
    sorted((k - 1).toInt.max(0))
  }

  test("marginal-window quantiles equal the multiset definition") {
    import spark.implicits._
    samples(corpusGen, 8).foreach { vs =>
      val docs = vs.zipWithIndex.map { case (v, i) =>
        (i.toLong, "x", "en", "u", v)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      val dir = java.nio.file.Files.createTempDirectory("quantprops").toString
      docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      // q139's median and MAD, recomputed from the definition
      val med = refQuantile(vs, 1, 2)
      val mad = refQuantile(vs.map(v => math.abs(v - med)), 1, 2)
      val r139 = TextOps.q139LengthOutliers(spark, dir).collect().head
      assert(r139.getAs[Long]("med_chars") == med, s"median on $vs")
      assert(r139.getAs[Long]("mad_chars") == mad, s"MAD on $vs")
      // q147's p5/p95 cuts, recomputed from the definition
      val r147 = TextOps.q147WinsorizedStats(spark, dir).collect().head
      assert(r147.getAs[Long]("p05_chars") == refQuantile(vs, 5, 100),
        s"p05 on $vs")
      assert(r147.getAs[Long]("p95_chars") == refQuantile(vs, 95, 100),
        s"p95 on $vs")
      val win = vs.map(v => v.max(refQuantile(vs, 5, 100))
        .min(refQuantile(vs, 95, 100))).sum
      assert(r147.getAs[Long]("win_sum_chars") == win, s"winsorized sum on $vs")
    }
  }
}
