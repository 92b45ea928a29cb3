package graft.ops

import graft.TestSpark
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the PQ trainer behind q137/q138/q141: on ARBITRARY
  * corpora the fused Spark Lloyd's loop ([[Similarity.pqFit]]) must equal a
  * straight-line in-memory reference that restates the contract — K-lowest
  * seeding, argmin assignment with lowest-position ties, integer-mean
  * updates, survivor labels keeping seed identity — for every subspace.
  * Covers n < K (dead seeds from the start), heavy duplication (clusters
  * collapsing mid-iteration) and the n > K steady state. Quantization
  * itself is pinned separately (IntVec specs + the q137 oracle); the
  * reference consumes the ENGINE's quantized vectors so this pins the
  * loop, not the grid. */
class PqFitProps extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // few distinct values + duplicated rows → clusters die and collapse
  private val vecGen: Gen[List[Float]] = Gen.frequency(
    3 -> Gen.listOfN(64, Gen.choose(-1000, 1000).map(_ / 1000.0f)),
    1 -> Gen.const(List.fill(64)(0.5f))) // duplicate magnet
  private val corpusGen: Gen[Seq[Seq[Float]]] = for {
    n <- Gen.choose(1, 40)
    vecs <- Gen.listOfN(n, vecGen)
  } yield vecs.map(_.toSeq)

  private def refPqFit(qs: Seq[(Long, Array[Long])])
      : Array[(Array[Long], Array[Array[Long]])] = {
    val sorted = qs.sortBy(_._1)
    val k = Similarity.kmeansKFor(qs.size.toLong) // adaptive K, engine rule
    Array.tabulate(Similarity.PqM) { m =>
      val lo = m * Similarity.PqSubDim
      def sub(v: Array[Long]) = v.slice(lo, lo + Similarity.PqSubDim)
      val subs = qs.map { case (_, v) => sub(v) }
      var labels = (0 until k).map(_.toLong).toArray
      var cents = sorted.take(k).map(p => sub(p._2)).toArray
      for (_ <- 1 to Similarity.KMeansIters) {
        val asg = subs.map { sv =>
          val ds = cents.map(c =>
            sv.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
          ds.indexOf(ds.min) // lowest-position tie-break, as ivec_nearest
        }
        val byIdx = asg.zip(subs).groupBy(_._1)
        val present = byIdx.keys.toArray.sorted
        cents = present.map { i =>
          val members = byIdx(i).map(_._2)
          Array.tabulate(Similarity.PqSubDim)(dd =>
            members.map(_(dd)).sum / members.size)
        }
        labels = present.map(labels(_))
      }
      (labels, cents)
    }
  }

  test("Spark PQ fit equals the in-memory reference on random corpora") {
    import spark.implicits._
    samples(corpusGen, 6).foreach { vecs =>
      val dir = java.nio.file.Files.createTempDirectory("pqprops").toString
      vecs.zipWithIndex.map { case (v, i) => (i.toLong, v, 0) }
        .toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val qs = Similarity.quantized(spark, dir, Similarity.QuantOffset)
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toSeq
      val expect = refPqFit(qs)
      val got = Similarity.pqFit(spark, dir)
      (0 until Similarity.PqM).foreach { m =>
        assert(got(m)._1.toSeq == expect(m)._1.toSeq,
          s"subspace $m labels diverge (n=${vecs.size})")
        assert(got(m)._2.map(_.toSeq).toSeq == expect(m)._2.map(_.toSeq).toSeq,
          s"subspace $m centroids diverge (n=${vecs.size})")
      }
    }
  }
}
