package graft.ops

import graft.TestSpark
import graft.lake.DirectoryLakeCatalog
import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r6 #4: the trained ANN index survives the session that trained
  * it. Train + persist the codebook in session A, install it in a fresh
  * session B, and probe — with the Lloyd's-loop counter proving session B
  * never retrained. */
class CodebookPersistenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("train in A, persist, probe in B with zero k-means fits") {
    val cat = DirectoryLakeCatalog.temp(spark)
    val ns = s"cb_${System.nanoTime()}"

    // session A: train (memoized fit) + persist
    val persisted = Similarity.codebookTable(spark, sf, cat, ns)
    assert(persisted.count() == Similarity.KMeansK,
      "no cluster died on the test corpus — codebook is K rows")
    val refIvf = Similarity.q53KnnIvf(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("sim"))).toSet

    // session B: fresh SparkSession (separate memo key — the fit cache is
    // per-session), install the persisted index, probe
    val b = spark.newSession()
    val fitsBefore = Similarity.kmeansFits.get()
    Similarity.installCodebook(b, sf, cat, ns)
    val bIvf = Similarity.q53KnnIvf(b, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("sim"))).toSet
    assert(bIvf == refIvf, "probing the persisted codebook reproduces the " +
      "trainer session's IVF results exactly")

    // the recall monitor runs green against the installed index too
    val recall = Similarity.q105AnnRecall(b, sf).collect()
    assert(recall.nonEmpty)
    val ivfTier = recall.filter(_.getAs[String]("tier") == "ivf")
    assert(ivfTier.nonEmpty, "recall monitor reports the IVF tier")

    assert(Similarity.kmeansFits.get() == fitsBefore,
      "session B observed ZERO Lloyd's loops — the persisted index was " +
        "probed, not retrained")
    cat.dropNamespace(ns)
  }

  test("installCodebook refuses an empty table") {
    val cat = DirectoryLakeCatalog.temp(spark)
    val ns = s"cbe_${System.nanoTime()}"
    import org.apache.spark.sql.types._
    cat.ensureTable(ns, "ann_codebook", StructType(Seq(
      StructField("idx", IntegerType), StructField("label", LongType),
      StructField("centroid", ArrayType(LongType)))))
    val e = intercept[IllegalArgumentException](
      Similarity.installCodebook(spark.newSession(), sf, cat, ns))
    assert(e.getMessage.contains("empty"))
    cat.dropNamespace(ns)
  }
}
