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

  test("phash audit: one row per doc, mate stats consistent, dup flag exact") {
    val rows = Multimodal.q96PhashNearDup(spark, sf).collect()
    val docs = Tables.documents(spark, sf).count()
    assert(rows.length == docs)
    rows.foreach { r =>
      val nm = r.getAs[Long]("n_bucket_mates")
      val mh = Option(r.get(r.fieldIndex("min_hamming"))).map(_.asInstanceOf[Long])
      assert(nm >= 0)
      // min_hamming exists iff there is at least one bucket mate
      assert(mh.isDefined == (nm > 0))
      // a bucket mate shares a 16-bit chunk, so >= 16 bits already agree
      mh.foreach(h => assert(h >= 0 && h <= 48))
      assert(r.getAs[Boolean]("is_near_dup") ==
        mh.exists(_ <= Multimodal.MaxPhashHamming))
    }
  }

  test("phash machinery finds planted perceptual dups (pigeonhole recall)") {
    import spark.implicits._
    graft.functions.TextHashExprs.register(spark)
    // two byte-identical payloads + one locally-edited near copy must land
    // in the same chunk bucket and flag as near-dups END-TO-END through
    // q96's chunk join, dedup cascade and flag logic; an unrelated payload
    // must not. Payloads are crafted as ASCII text (the envelope encodes
    // text as UTF-8, so text bytes ARE the payload).
    val mk = (f: Int => Int) =>
      new String((0 until 720).map(i => (32 + f(i) % 95).toChar).toArray)
    val base = mk(i => i * 37)
    val near = { val a = base.toCharArray; a(300) = ' '; a(310) = ' '; new String(a) }
    val far = mk(i => i * 91 + 13)
    val docs = Seq(
      (1L, base, "en", "s0", 720L), (2L, base, "en", "s0", 720L),
      (3L, near, "en", "s1", 720L), (4L, far, "en", "s2", 720L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("phash").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Multimodal.q96PhashNearDup(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("is_near_dup"))
      .toMap
    assert(out(1L) && out(2L), "byte-identical payloads must flag")
    assert(out(3L), "locally-edited near copy must flag (pigeonhole recall)")
    assert(!out(4L), "unrelated payload must not flag")
  }

  test("frame dedup: identical payloads share all frames, unique docs none") {
    import spark.implicits._
    val base = (0 until 400).map(i => (32 + (i * 7) % 95).toChar).mkString
    val other = (0 until 400).map(i => (32 + (i * 11 + 3) % 95).toChar).mkString
    val docs = Seq(
      (1L, base, "en", "s0", 400L),
      (2L, base, "en", "s1", 400L),  // exact copy -> 4 shared frames
      (3L, other, "en", "s0", 400L)  // unique -> contributes nothing
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("framededup").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val fams = Multimodal.frameDupFamilies(spark, dir).collect()
    assert(fams.length == Multimodal.MediaCodec.FramesPerDoc,
      s"one family per frame position, got ${fams.length}")
    fams.foreach { r =>
      assert(r.getAs[Long]("n_docs") == 2L)
      assert(r.getAs[Long]("n_frames") == 2L)
      assert(r.getAs[Long]("keep_id") == 1L)
    }
    // the registered profile: per position 3 frames, 2 distinct contents,
    // 1 redundant copy, 1 cross-doc recurring content
    val prof = Multimodal.q127FrameProfile(spark, dir).collect()
    assert(prof.map(_.getAs[Long]("frame_idx")).toSeq ==
      (0L until Multimodal.MediaCodec.FramesPerDoc.toLong))
    prof.foreach { r =>
      assert(r.getAs[Long]("n_frames") == 3L)
      assert(r.getAs[Long]("n_distinct") == 2L)
      assert(r.getAs[Long]("n_dup_frames") == 1L)
      assert(r.getAs[Long]("n_crossdoc_contents") == 1L)
    }
  }

  test("frame hashing is BYTE-based: multibyte text frames on UTF-8 bytes") {
    // Pins the engine side of q127's documented ASCII-oracle contract: the
    // payload is the UTF-8 byte array, so frame boundaries and md5 inputs
    // are byte slices — NOT character slices. A doc with a multibyte char
    // must hash to the md5 of its byte-sliced frames (and char slicing
    // must disagree), so nobody "fixes" the engine to match the oracle's
    // character arithmetic on non-ASCII input.
    import spark.implicits._
    val text = "héllo wörld — multibyte contenté " * 8 // é/ö/— are 2-3 bytes
    val docs = Seq((1L, text, "fr", "s0", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("bytesframe").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Multimodal.frameHashes(spark, Multimodal.envelope(spark, dir))
      .collect().sortBy(_.frame_idx)
    val bytes = text.getBytes("UTF-8")
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(b: Array[Byte]) = b.map(x => f"$x%02x").mkString
    val want = Multimodal.MediaCodec
      .sampleFramesStub(bytes, Multimodal.MediaCodec.FramesPerDoc)
      .map(f => hex(md.digest(f)))
    assert(got.map(_.fh).toSeq == want, "engine must frame on bytes")
    // and char-based framing (the oracle's arithmetic) differs here
    val k = Multimodal.MediaCodec.FramesPerDoc
    val n = bytes.length // oracle uses BYTE length for offsets...
    val charFrames = (0 until k).flatMap { i =>
      val off = (n.toLong * i / k).toInt
      val len = math.min(math.max(n / k, 1), n - off)
      if (off < text.length) // ...but slices CHARACTERS
        Some(hex(md.digest(
          text.substring(off, math.min(off + len, text.length)).getBytes("UTF-8"))))
      else None
    }
    assert(got.map(_.fh).toSeq != charFrames,
      "multibyte text must expose the byte-vs-char divergence")
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

  test("phash clusters: identical payloads collapse, singletons absent") {
    import spark.implicits._
    // two exact-payload families (Hamming 0 within each) + one unique doc
    val a = "the quick brown fox jumps over the lazy dog once more today ok"
    val b = "completely different payload bytes for the second family here yo"
    val docs = Seq(
      (1L, a, "en", "s", 1L), (2L, a, "en", "s", 1L), (3L, a, "en", "s", 1L),
      (4L, b, "en", "s", 1L), (5L, b, "en", "s", 1L),
      (6L, "a singleton with no perceptual twin anywhere in this corpus x",
        "en", "s", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("phashcc").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Multimodal.phashClusters(spark, dir).collect()
    val byCluster = out.groupBy(_.getAs[Long]("cluster_id"))
      .map { case (c, rs) => c -> rs.map(_.getAs[Long]("doc_id")).toSet }
    assert(byCluster == Map(1L -> Set(1L, 2L, 3L), 4L -> Set(4L, 5L)),
      s"clusters were $byCluster")
    out.foreach { r =>
      assert(r.getAs[Boolean]("is_keeper") ==
        (r.getAs[Long]("doc_id") == r.getAs[Long]("cluster_id")))
      assert(r.getAs[Long]("cluster_size") ==
        byCluster(r.getAs[Long]("cluster_id")).size)
    }
  }

  test("q151: the registered face surfaces exactly the fixture clusters") {
    // on the real corpus (no sub-threshold pairs) the drop list is exactly
    // the crafted fixture: the verbatim pair and the Hamming-1 mutation
    // pair cluster; the singleton fixture row and all 500 corpus docs are
    // absent
    val out = Multimodal.q151PhashClusters(spark, "/root/testdata/sf0.001")
      .collect()
    val byCluster = out.groupBy(_.getAs[Long]("cluster_id"))
      .map { case (c, rs) => c -> rs.map(_.getAs[Long]("doc_id")).toSet }
    assert(byCluster == Map(
      9300001L -> Set(9300001L, 9300002L),
      9300003L -> Set(9300003L, 9300004L)), s"clusters were $byCluster")
    assert(out.forall(r => r.getAs[Boolean]("is_keeper") ==
      (r.getAs[Long]("doc_id") == r.getAs[Long]("cluster_id"))))
  }

  test("q182 frame runs: fixture runs land exactly, corpus is run-free") {
    val out = Multimodal.q182FrameRuns(spark, sf).collect()
      .map(r => r.getAs[Long]("max_run") -> r.getAs[Long]("n_docs")).toMap
    val nDocs = Tables.documents(spark, sf).count()
    // frozen payload: all 4 frames identical; two-scene: run 2; the
    // live fixture and every corpus doc have no consecutive repeats
    assert(out(4L) == 1L)
    assert(out(2L) == 1L)
    assert(out(1L) == nDocs + 1L)
    assert(out.values.sum == nDocs + Multimodal.FrameRunFixture.length)
  }

  test("q201 video near-dup: fixture votes land exactly (4/4, 3/4, 2/4), " +
    "majority threshold splits the flag, singleton absent") {
    val out = Multimodal.q201VideoNearDup(spark, sf).collect()
    val byPair = out.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
      ((r.getAs[Long]("n_match_frames"), r.getAs[Long]("min_ham"),
        r.getAs[Boolean]("is_video_dup")))).toMap
    // verbatim pair: every position matches at Hamming 0
    assert(byPair((9600001L, 9600002L)) == ((4L, 0L, true)))
    // one swapped frame: 3/4 — AT the majority threshold, still a dup;
    // the swapped position must NOT have sneaked in as a 4th match (the
    // disjoint-vocabulary quarters are beyond MaxPhashHamming)
    assert(byPair((9600003L, 9600004L)) == ((3L, 0L, true)))
    // half swapped: 2/4 — below the majority, flag must read false
    assert(byPair((9600005L, 9600006L)) == ((2L, 0L, false)))
    // the singleton pairs with nothing, and no fixture crosses families
    val fixturePairs = byPair.keySet.filter(p => p._1 >= 9600001L)
    assert(fixturePairs == Set((9600001L, 9600002L), (9600003L, 9600004L),
      (9600005L, 9600006L)), s"unexpected fixture pairs: $fixturePairs")
    assert(!byPair.keySet.exists(p => p._1 == 9600007L || p._2 == 9600007L))
  }
}
