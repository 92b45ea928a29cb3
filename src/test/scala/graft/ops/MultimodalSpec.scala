package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal envelope + batched feature extraction: schema of the binary
  * envelope, determinism of the (stubbed) decode, and batch-shape bounds. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("envelope carries binary payload + typed metadata") {
    val env = Multimodal.envelope(spark, sf)
    val sch = env.schema
    assert(sch("bytes").dataType == org.apache.spark.sql.types.BinaryType)
    assert(sch("meta").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
    val r = env.orderBy("doc_id").head()
    assert(r.getAs[String]("uri").startsWith("doc://"))
    assert(r.getAs[Array[Byte]]("bytes").nonEmpty)
  }

  test("feature extraction is deterministic and returns the declared dim") {
    val f1 = Multimodal.q35MultimodalFeatures(spark, sf).collect()
    val f2 = Multimodal.q35MultimodalFeatures(spark, sf).collect()
    assert(f1.toSeq == f2.toSeq)
    assert(f1.forall(_.getAs[Long]("dim") == Multimodal.MediaCodec.FeatureDim.toLong))
    // histogram is normalized -> l2norm of a distribution is in (0, 1]
    assert(f1.forall { r =>
      val n = r.getAs[Double]("l2norm"); n > 0 && n <= 1.0001
    })
  }

  test("decode stub batches bound memory (grouped iteration reaches every row)") {
    val env = Multimodal.envelope(spark, sf)
    val n = env.count()
    assert(Multimodal.extractFeatures(spark, env).count() == n)
  }

  test("frame sampling emits k deterministic frames per doc, resized to bound") {
    val frames = Multimodal.q50MultimodalFrames(spark, sf).collect()
    val again = Multimodal.q50MultimodalFrames(spark, sf).collect()
    assert(frames.toSeq == again.toSeq)
    val perDoc = frames.groupBy(_.getAs[Long]("doc_id"))
    perDoc.foreach { case (_, fs) =>
      assert(fs.length == Multimodal.MediaCodec.FramesPerDoc)
      fs.foreach { f =>
        assert(f.getAs[Long]("frame_len") > 0)
        assert(f.getAs[Long]("resized_len") <= 32)
      }
    }
  }
}
