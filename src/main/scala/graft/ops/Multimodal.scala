package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal-column support (SURVEY.md §2.C6): media payloads travel as an
  * opaque `binary` column inside a typed envelope (uri, mime, bytes, meta),
  * which parquet stores natively — the standard pattern for image/audio/video
  * in a 100 TB training-data lake.
  *
  * The decode/feature step runs as a typed `mapPartitions` with explicit
  * micro-batching (the Scala analog of `mapInPandas`: per-partition batch
  * iteration, bounded memory, schema declared by the case-class encoder).
  * A real image/audio decoder is NOT available in this environment, so
  * [[MediaCodec.decodeStub]] is a clearly-marked deterministic stand-in: the
  * Spark-side plumbing (envelope schema, partitioning, batch shape, feature
  * vector contract) is real and tested; only the pixel math is fake.
  */
object Multimodal {
  import Tables._

  final case class MediaMeta(n_chars: Long, lang: String)
  final case class MediaEnvelope(doc_id: Long, uri: String, mime: String,
                                 bytes: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(doc_id: Long, width: Int, height: Int,
                                 dim: Int, l2norm: Double)

  object MediaCodec {
    val FeatureDim = 16
    val BatchSize = 64

    /** STUB — stands in for an image/audio decoder (no media libs in this
      * container). Deterministic: "dimensions" derive from the byte length,
      * "features" are the normalized 16-bin byte histogram. Replace with a
      * real codec binding in production; the surrounding plumbing does not
      * change. */
    def decodeStub(bytes: Array[Byte]): (Int, Int, Array[Double]) = {
      val hist = new Array[Double](FeatureDim)
      bytes.foreach(b => hist((b & 0xff) % FeatureDim) += 1.0)
      val n = math.max(bytes.length, 1).toDouble
      (1 + bytes.length % 64, 1 + bytes.length % 48, hist.map(_ / n))
    }

    val FramesPerDoc = 4

    /** STUB frame sampler — stands in for video frame extraction: k frames
      * at evenly-spaced byte offsets, each a fixed-size slice of the payload
      * (a real codec decodes at timestamps; the slicing/batching plumbing is
      * identical). Deterministic. */
    def sampleFramesStub(bytes: Array[Byte], k: Int): Seq[Array[Byte]] = {
      if (bytes.isEmpty) return Seq.empty
      val frameLen = math.max(bytes.length / math.max(k, 1), 1)
      (0 until k).flatMap { i =>
        val off = (bytes.length.toLong * i / k).toInt
        if (off < bytes.length)
          Some(bytes.slice(off, math.min(off + frameLen, bytes.length)))
        else None
      }
    }

    /** STUB resize — stands in for image resampling: byte payload folded to
      * a fixed target length by strided max (shape + determinism real,
      * pixel math fake). */
    def resizeStub(bytes: Array[Byte], target: Int): Array[Byte] = {
      if (bytes.isEmpty) return bytes
      val out = new Array[Byte](math.min(target, bytes.length))
      val stride = math.max(bytes.length / out.length, 1)
      var i = 0
      while (i < out.length) {
        var best = bytes(math.min(i * stride, bytes.length - 1))
        var j = i * stride
        while (j < math.min((i + 1) * stride, bytes.length)) {
          if ((bytes(j) & 0xff) > (best & 0xff)) best = bytes(j)
          j += 1
        }
        out(i) = best
        i += 1
      }
      out
    }
  }

  final case class MediaFrame(doc_id: Long, frame_idx: Int, frame_len: Int,
                              resized_len: Int)

  /** Frame-sample + resize over the binary column via mapPartitions.
    * Streams ONE envelope at a time — peak task memory is a single
    * payload. A REAL vectorized decoder (the mapInPandas shape) would
    * re-introduce batching at its own call site, sized to what the
    * decode kernel amortizes; buffering payload batches around per-element
    * stubs would only multiply peak memory by the batch size. Emits
    * per-frame metadata — at production scale the frame bytes would flow
    * onward to the feature extractor. */
  def sampleFrames(s: SparkSession, env: DataFrame): Dataset[MediaFrame] = {
    import s.implicits._
    env.as[MediaEnvelope].mapPartitions { it =>
      it.flatMap { e =>
        MediaCodec.sampleFramesStub(e.bytes, MediaCodec.FramesPerDoc)
          .zipWithIndex.map { case (frame, i) =>
            MediaFrame(e.doc_id, i, frame.length,
              MediaCodec.resizeStub(frame, 32).length)
          }
      }
    }
  }

  /** C6 frame pipeline. The stub's offset/length math is SQL-expressible
    * (floor divisions over the byte length), so the oracle hash-checks the
    * whole mapPartitions frame pipeline — same approach as [[q35]]; ints
    * widen to long on both sides for type parity. */
  def q50MultimodalFrames(s: SparkSession, d: String): DataFrame =
    sampleFrames(s, envelope(s, d)).toDF()
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("frame_len").cast("long").as("frame_len"),
        col("resized_len").cast("long").as("resized_len"))
      .orderBy("doc_id", "frame_idx")

  /** Documents wrapped as media envelopes (bytes = UTF-8 payload — the
    * "opaque blob" stand-in; for real media this is the encoded frame). */
  def envelope(s: SparkSession, d: String): DataFrame =
    envelopeOf(documents(s, d))

  /** The envelope projection over ANY document-shaped frame — shared by
    * the corpus face and the fixture-enriched q182. */
  private[ops] def envelopeOf(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      concat(lit("doc://"), col("doc_id")).as("uri"),
      lit("text/plain").as("mime"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(col("n_chars"), col("lang")).as("meta"))

  /** Decode + feature extraction over the binary column. Streams one
    * envelope at a time — peak task memory is ONE payload; see
    * [[sampleFrames]] for why batching belongs at a real vectorized
    * decoder's call site, not around a per-element stub. */
  def extractFeatures(s: SparkSession, env: DataFrame): Dataset[MediaFeatures] = {
    import s.implicits._
    env.as[MediaEnvelope].mapPartitions { it =>
      it.map { e =>
        val (w, h, feats) = MediaCodec.decodeStub(e.bytes)
        MediaFeatures(e.doc_id, w, h, feats.length,
          math.sqrt(feats.map(x => x * x).sum))
      }
    }
  }

  final case class FrameHash(doc_id: Long, frame_idx: Int, fh: String)

  /** Content hash per sampled frame — the frame-granular identity the
    * cross-doc dedup (q127) keys on. Same streaming mapPartitions shape as
    * [[sampleFrames]]; the MD5 instance is per-task and reset by digest(). */
  def frameHashes(s: SparkSession, env: DataFrame): Dataset[FrameHash] = {
    import s.implicits._
    env.as[MediaEnvelope].mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val tab = "0123456789abcdef"
      it.flatMap { e =>
        MediaCodec.sampleFramesStub(e.bytes, MediaCodec.FramesPerDoc)
          .zipWithIndex.map { case (frame, i) =>
            val dg = md.digest(frame)
            val hex = new StringBuilder(32)
            dg.foreach { b =>
              hex.append(tab((b >> 4) & 0xf)).append(tab(b & 0xf))
            }
            FrameHash(e.doc_id, i, hex.toString)
          }
      }
    }
  }

  /** Cross-document frame-dup families: frame content hashes recurring in
    * MORE THAN ONE document — the static-intro/shared-outro/test-pattern
    * detail listing behind [[q127FrameProfile]]'s counters, exposed as a
    * library call (its row count is the duplication actually present,
    * which on a dup-free corpus is legitimately zero — the registered
    * profile stays informative either way). */
  def frameDupFamilies(s: SparkSession, d: String): DataFrame =
    frameHashes(s, envelope(s, d)).toDF()
      .groupBy("fh")
      .agg(countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("n_frames"), min("doc_id").as("keep_id"))
      .filter(col("n_docs") >= 2)
      .orderBy("fh")

  /** C6 frame-uniqueness profile: per frame POSITION, how many sampled
    * frames exist, how many distinct contents they collapse to, how many
    * are redundant copies, and how many contents recur across documents —
    * the frame-granular duplication dashboard a video corpus watches
    * (whole-payload identity and perceptual near-dup (q96) both miss
    * frame-level sharing). Position-resolved because duplication
    * concentrates at openings/closings (static intros, credit outros).
    *
    * Scale shape: the hash pass streams one payload at a time
    * (mapPartitions, no batch buffering around a per-element stub); then
    * a (frame_idx, fh)-keyed aggregate with map-side partial agg and a
    * FramesPerDoc-row rollup.
    *
    * Oracle parity is BYTE-exact for any encoding (VERDICT r7 #4): the
    * engine frames and md5s the raw UTF-8 byte array; the oracle slices
    * hex(encode(text)) at doubled offsets — the same byte boundaries —
    * and groups frames by the hex content itself (injective, so counts
    * equal the engine's md5 grouping). No byte == codepoint assumption
    * remains; the multibyte case is exercised end-to-end by
    * tools/multibyte_oracle_check.sh and engine-side by
    * [[MultimodalSpec]]'s byte-vs-char framing test. */
  def q127FrameProfile(s: SparkSession, d: String): DataFrame =
    frameHashes(s, envelope(s, d)).toDF()
      .groupBy("frame_idx", "fh")
      .agg(count(lit(1)).as("c"), countDistinct("doc_id").as("nd"))
      .groupBy("frame_idx")
      .agg(sum("c").as("n_frames"), count(lit(1)).as("n_distinct"),
        sum(when(col("c") > 1, col("c") - 1).otherwise(0L))
          .as("n_dup_frames"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L))
          .as("n_crossdoc_contents"))
      .select(col("frame_idx").cast("long").as("frame_idx"),
        col("n_frames"), col("n_distinct"), col("n_dup_frames"),
        col("n_crossdoc_contents"))
      .orderBy("frame_idx")

  /** Crafted payloads appended by [[q182FrameRuns]]: a FROZEN payload
    * (uniform bytes — all four sampled frames identical, run 4), a
    * two-scene payload (two static halves, run 2) and a live payload
    * (distinct frames, run 1). The synthetic corpus has no intra-doc
    * frame repetition, so without these the run histogram would prove
    * only the absence side — the q151/q173 fixture discipline. */
  private[ops] val FrameRunFixture: Seq[(Long, String)] = Seq(
    9200001L -> ("x" * 64),
    9200002L -> ("a" * 32 + "b" * 32),
    9200003L -> "plain distinct content with no repetition structure here")

  /** Static-content run profile (q182): per asset, the LONGEST run of
    * identical consecutive sampled frames, rolled into a (max_run →
    * assets) histogram. q127 counts duplication across documents at each
    * position; this measures it along TIME within each asset — the
    * frozen-stream detector for a video corpus (a stuck encoder, a
    * slideshow, a test card all ship runs at FramesPerDoc while live
    * footage sits at 1), which is a drop/down-weight signal no cross-doc
    * view produces.
    *
    * Scale shape: one streaming frame-hash pass (the q127 mapPartitions),
    * then lag/sum windows PARTITIONED BY doc_id over FramesPerDoc rows
    * each (bounded, high-cardinality key) and two bounded rollups.
    * Byte-exact oracle: the engine compares frame md5s, the oracle the
    * injective hex slices at the same byte boundaries. First-frame rule:
    * `lag <> fh` is NULL on the first frame in both engines → no run
    * break, matching islands semantics. */
  def q182FrameRuns(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val fixture = FrameRunFixture.map { case (id, t) =>
      (id, t, "en", "fixture", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val env = envelopeOf(documents(s, d)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .unionAll(fixture))
    val byDoc = Window.partitionBy("doc_id").orderBy("frame_idx")
    frameHashes(s, env).toDF()
      .withColumn("chg",
        when(lag("fh", 1).over(byDoc) =!= col("fh"), 1L).otherwise(0L))
      .withColumn("run_id", sum("chg").over(
        byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("doc_id", "run_id").agg(count(lit(1)).as("len"))
      .groupBy("doc_id").agg(max("len").as("max_run"))
      .groupBy("max_run").agg(count(lit(1)).as("n_docs"))
      .orderBy("max_run")
  }

  /** C6 oracle query: envelope metadata projection — proves the binary
    * envelope (byte length survives the encode round-trip). */
  def q34MultimodalMeta(s: SparkSession, d: String): DataFrame =
    envelope(s, d).select(col("doc_id"), col("uri"), col("mime"),
        octet_length(col("bytes")).cast("long").as("nbytes"),
        col("meta.lang").as("lang"))
      .orderBy("doc_id")

  /** C6 feature pipeline. The stub's math (dims from byte length, l2norm
    * of the normalized 16-bin byte histogram) is SQL-expressible
    * BYTE-exactly — the oracle reads each UTF-8 byte from a
    * hex(encode(text)) slice, so the check holds on any encoding, not
    * just ASCII; ints are widened to long on both sides for type parity. */
  def q35MultimodalFeatures(s: SparkSession, d: String): DataFrame =
    extractFeatures(s, envelope(s, d)).toDF()
      .select(col("doc_id"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("dim").cast("long").as("dim"),
        round(col("l2norm"), 4).as("l2norm"))
      .orderBy("doc_id")

  /** Near-dup pairs are "real" below this Hamming distance over the 64-bit
    * perceptual hash; <= 3 also makes the 4x16-bit chunk join EXACT recall
    * (pigeonhole: 3 flipped bits cannot touch all 4 chunks). */
  val MaxPhashHamming = 3

  /** C6 perceptual-hash near-dup audit over the BINARY payload — image
    * dedup for the multimodal lake: the native codegen'd
    * [[graft.functions.DHash64]] fingerprints every payload in one
    * compiled pass (in production the input is the decoded 8x9 grayscale
    * grid; here the raw bytes, per the honest-stub contract), candidates
    * come from a 16-bit-chunk self-EQUI-join, and the exact Hamming check
    * runs in-row — the same scale architecture as SimHash (q24): no
    * all-pairs comparison ever, quadratic work confined to hash-collision
    * buckets, AQE skew-join splits hot chunks,
    * [[Dedup.DefaultMaxBucket]] drops degenerate ones.
    *
    * Output is one AUDIT row per document — its perceptual key, how many
    * other payloads collide with it in at least one chunk, and the closest
    * Hamming distance among them (pigeonhole: any true near-dup at
    * Hamming <= [[MaxPhashHamming]] MUST appear as a bucket-mate, so
    * `is_near_dup` is exact up to the bucket cap) — rather than the bare
    * pair list, which is legitimately empty on a corpus with no
    * perceptually-identical payloads. The [[Dedup.DefaultMaxBucket]] cap is
    * a semantic choice MIRRORED IN THE ORACLE (keep CTE + the same
    * smallest-shared-chunk cascade): a pair whose first hash-agreeing chunk
    * sits in an oversize bucket — a degenerate collision floor, the q98
    * stop-anchor analog — is dropped by BOTH engines, so the exactness
    * claim is scoped to sub-cap buckets rather than silently diverging.
    * Like q35/q50, the whole pipeline is hash-checked end-to-end by a
    * DuckDB oracle that recomputes the dHash via BYTE-exact hex-slice
    * arithmetic — valid on any encoding, not just ASCII. */
  def q96PhashNearDup(s: SparkSession, d: String): DataFrame = {
    // checkpointed: (doc_id, ph) is ~16 B/doc, while re-deriving it for the
    // trailing left join would re-read and re-hash every payload — at
    // production scale payloads are large binaries, so the second scan is
    // the expensive half of the query (the q81 lesson; the self-join sides
    // below already share one exchange via AQE stage reuse, but the left
    // join side would not)
    val hashed = envelope(s, d)
      .select(col("doc_id"), expr("dhash64(bytes)").as("ph"))
      .localCheckpoint(true)
    val mates = phashPairStream(hashed)
      .groupBy(col("id_a").as("doc_id"))
      .agg(count(lit(1)).as("nm"), min(col("ham")).as("mh"))
    hashed.join(mates, Seq("doc_id"), "left")
      .select(col("doc_id"), col("ph"),
        coalesce(col("nm"), lit(0L)).as("n_bucket_mates"),
        col("mh").as("min_hamming"),
        coalesce(col("mh") <= MaxPhashHamming, lit(false)).as("is_near_dup"))
      .orderBy("doc_id")
  }

  /** The capped, chunk16-banded ordered pHash pair stream — (id_a, id_b,
    * ham) for every bucket-mate pair, each ordered pair exactly once (the
    * smallest-shared-chunk cascade, decided in-row from the carried
    * hashes — no blocking distinct). ONE definition feeds q96's per-doc
    * rollup and q151's cluster propagation. */
  private def phashPairStream(hashed: DataFrame): DataFrame = {
    val chunks = hashed.select(col("doc_id"), col("ph"),
      posexplode(expr(
        "transform(sequence(0,3), j -> shiftright(ph, 16 * j) & 65535)"))
        .as(Seq("chunk", "ckey")))
    val bounded =
      Dedup.capBuckets(chunks, Seq("chunk", "ckey"), Some(Dedup.DefaultMaxBucket))
    val l = bounded.select(col("chunk"), col("ckey"),
      col("doc_id").as("id_a"), col("ph").as("ph_a"))
    val r = bounded.select(col("chunk"), col("ckey"),
      col("doc_id").as("id_b"), col("ph").as("ph_b"))
    l.join(r, Seq("chunk", "ckey"))
      .filter(col("id_a") =!= col("id_b"))
      // keep each ordered pair only at its SMALLEST shared chunk — decided
      // in-row from ph_a/ph_b (already carried), no blocking distinct over
      // the pair stream (same codegen-friendly cascade as simhashPairs)
      .filter(expr(SmallestSharedChunkCascade))
      .select(col("id_a"), col("id_b"),
        expr("cast(bit_count(ph_a ^ ph_b) as long)").as("ham"))
  }

  /** ONE definition of the smallest-shared-chunk dedup cascade over
    * (chunk, ph_a, ph_b) — shared by the whole-payload pair stream and the
    * per-frame q201 variant. */
  private val SmallestSharedChunkCascade: String =
    """chunk = 0 OR (
      |  (ph_a & 65535) != (ph_b & 65535) AND (
      |    chunk = 1 OR (
      |      (shiftright(ph_a, 16) & 65535) != (shiftright(ph_b, 16) & 65535) AND (
      |        chunk = 2 OR
      |        (shiftright(ph_a, 32) & 65535) != (shiftright(ph_b, 32) & 65535)))))"""
      .stripMargin

  /** C6g pHash duplicate clusters: connected components over the near-dup
    * pair graph q96 scores — the image-dedup CLUSTER report (which
    * perceptual variants collapse together, who the keeper is) that turns
    * q96's pairwise audit into an executable drop list, the same step q70
    * performs for text dups. Pairs come from the one [[phashPairStream]]
    * (capped, exact-by-pigeonhole at Hamming ≤ [[MaxPhashHamming]]);
    * clustering reuses [[graft.ops.Dedup.propagateMinLabels]] — the
    * checkpointed min-label propagation with its convergence probe — and
    * the q70 report shape ([[graft.ops.Dedup.clustersOf]]). Docs with no
    * near-dup mate are absent by design (singletons carry no action).
    *
    * The corpus-only face stays informative on a dup-free corpus (empty
    * drop list); the REGISTERED face is [[q151PhashClusters]], which
    * unions the crafted [[PhashFixture]] so the oracle checks real
    * clusters, not 0 == 0. */
  def phashClusters(s: SparkSession, d: String): DataFrame =
    phashClustersOf(s, envelope(s, d))

  /** The cluster chain over any envelope frame (doc_id, ..., bytes) —
    * shared by the corpus face and the fixture-enriched q151. */
  private def phashClustersOf(s: SparkSession, env: DataFrame): DataFrame = {
    val hashed = env
      .select(col("doc_id"), expr("dhash64(bytes)").as("ph"))
      .localCheckpoint(true)
    val nd = phashPairStream(hashed)
      .filter(col("ham") <= MaxPhashHamming && col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    Dedup.clustersOf(Dedup.propagateMinLabels(s, nd))
  }

  /** Crafted near-dup payloads appended to the corpus by [[q151]]: two
    * verbatim duplicates (Hamming 0) and a one-character mutation pair
    * measured at Hamming 1 under [[graft.functions.DHash64]] — the
    * sub-threshold pairs the synthetic corpus lacks (its measured minimum
    * among bucket mates is 19). Ids sit far above any corpus doc_id AND —
    * like q173's 9100001+ / q182's 9200001+ — keep `id mod 1_000_000`
    * above the base doc_id range, so the key-offset replication the 10×
    * stress corpora use (copy c ↦ doc_id + c·1e6, tools/scale_corpus.py)
    * can never mint a corpus doc with a fixture id. (9000001–9000005
    * violated this: copy 9 spans 9000000–9000499, and the colliding ids
    * made the oracle's per-doc bit_or fold two different payloads into one
    * garbage hash — the round-9 10× gate caught it.) */
  private[ops] val PhashFixture: Seq[(Long, String)] = Seq(
    9300001L -> "phash fixture: duplicate payload replicated verbatim for cluster alpha",
    9300002L -> "phash fixture: duplicate payload replicated verbatim for cluster alpha",
    9300003L -> "the quick brown fox jumps over the lazy dog while the cat watches quietly",
    9300004L -> "ahe quick brown fox jumps over the lazy dog while the cat watches quietly",
    9300005L -> "phash fixture: a singleton payload with no perceptual mate anywhere")

  /** C6g registered face of [[phashClusters]] (VERDICT r7 #3): the corpus
    * UNION the crafted [[PhashFixture]] rows, so the drop-list math runs
    * under the full oracle discipline — the fixture guarantees
    * sub-threshold pairs exist (two clusters must come out), while the 500
    * corpus docs prove the absence side (no false cluster from real
    * payloads; the oracle recomputes every hash, bucket cap and the
    * recursive min-label walk from scratch). Singletons are absent by
    * design — the output is an executable drop list. */
  def q151PhashClusters(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val fixture = PhashFixture.toDF("doc_id", "text")
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("bytes"))
    phashClustersOf(s,
      documents(s, d).select(col("doc_id"),
        encode(col("text"), "UTF-8").as("bytes"))
        .unionAll(fixture))
  }

  final case class FrameSlice(doc_id: Long, frame_idx: Int, fb: Array[Byte])

  /** Sampled frame BYTES per asset — the [[frameHashes]] shape emitting the
    * payload slices themselves, so a perceptual (rather than exact) frame
    * identity can hash them downstream with the native dhash64. Streams one
    * payload at a time. */
  private def frameSlices(s: SparkSession, env: DataFrame): Dataset[FrameSlice] = {
    import s.implicits._
    env.as[MediaEnvelope].mapPartitions { it =>
      it.flatMap { e =>
        MediaCodec.sampleFramesStub(e.bytes, MediaCodec.FramesPerDoc)
          .zipWithIndex.map { case (frame, i) => FrameSlice(e.doc_id, i, frame) }
      }
    }
  }

  /** A video pair is a near-dup when at least this many of its
    * [[MediaCodec.FramesPerDoc]] frame positions match perceptually
    * (Hamming ≤ [[MaxPhashHamming]]) — the majority vote that absorbs one
    * re-encoded or swapped frame (a replaced title card, a re-rendered
    * outro) without letting two-scene-overlap pairs through. */
  val VideoDupMinFrames = 3

  /** Crafted "videos" appended by [[q201VideoNearDup]] (quarter-aligned
    * payloads: 4 frames of exactly 40 bytes each, vocabulary-DISJOINT
    * across families so no cross-family frame can match): a verbatim pair
    * (4/4 positions), a last-frame-swapped pair (3/4 — at the majority
    * threshold), a half-swapped pair (2/4 — BELOW it, flag must read
    * false), and a singleton. The synthetic corpus has no frame-level
    * near-dups, so without these the pair list proves only absence — the
    * q151 fixture discipline; ids follow the FixtureIdSpec residue
    * convention (mod 1e6 far above any base doc_id). */
  private[ops] val VideoFixture: Seq[(Long, String)] = {
    // md5-hex quarters: a repeated single word is PERIODIC, and two
    // periodic byte patterns dhash within Hamming 3 of each other easily
    // (the first cut of this fixture paired the singleton with the
    // b-family); 40 high-entropy hex chars keep distinct quarters far
    // apart under any gradient hash
    def quarter(seed: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      def hx(x: String) =
        md.digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (hx(seed) + hx(seed + "x")).take(40)
    }
    val (a1, a2, a3, a4) = (quarter("alpha"), quarter("bravo"),
      quarter("cedar"), quarter("delta"))
    val (b1, b2, b3, b4, b5) = (quarter("fjord"), quarter("glyph"),
      quarter("harbor"), quarter("insect"), quarter("jungle"))
    val (c1, c2, c3, c4, c5, c6) = (quarter("koala"), quarter("lumen"),
      quarter("meadow"), quarter("nectar"), quarter("onyx"), quarter("quartz"))
    Seq(
      9600001L -> (a1 + a2 + a3 + a4),
      9600002L -> (a1 + a2 + a3 + a4), // verbatim: 4/4
      9600003L -> (b1 + b2 + b3 + b4),
      9600004L -> (b1 + b2 + b3 + b5), // last frame swapped: 3/4
      9600005L -> (c1 + c2 + c3 + c4),
      9600006L -> (c1 + c2 + c5 + c6), // back half swapped: 2/4
      9600007L -> (quarter("zephyr") + quarter("yonder") +
        quarter("willow") + quarter("vortex"))) // singleton
  }

  /** C6 video-level near-dup (q201): pairs of assets whose sampled frame
    * SEQUENCES match position-by-position — per pair, the number of frame
    * positions whose dhash64 Hamming distance is ≤ [[MaxPhashHamming]],
    * the closest such distance, and the [[VideoDupMinFrames]]-of-4
    * majority verdict. q96/q151 dedup single images and q127/q182 count
    * exact frame sharing; this is the missing VIDEO-grain decision — two
    * re-encodes of the same clip agree perceptually frame-by-frame without
    * a single byte-identical frame, and one swapped title card must not
    * break the match (hence the vote, not all-positions-equal).
    *
    * Scale shape: the frame pass streams one payload at a time; per-frame
    * hashes are 4×16-bit-chunk banded PER POSITION, so candidates come
    * from a (frame_idx, chunk, ckey) equi-join — never all-pairs, hot
    * buckets capped ([[Dedup.DefaultMaxBucket]], mirrored in the oracle) —
    * and every MATCHED position is discoverable by pigeonhole (≤3 flipped
    * bits leave one 16-bit chunk intact), so the vote count is exact up to
    * the cap. The pair rollup is keyed by the pair itself — bounded by
    * true collision volume, not corpus². Registered over corpus ∪
    * [[VideoFixture]] so both presence (4/4, 3/4) and sub-majority
    * rejection (2/4) are oracle-checked. */
  def q201VideoNearDup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val fixture = VideoFixture.map { case (id, t) =>
      (id, t, "en", "fixture", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val env = envelopeOf(documents(s, d)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .unionAll(fixture))
    // (doc, frame) → perceptual hash: ~32 B/frame; checkpointed so the
    // self-join's two sides and the rollup never re-read payloads
    val hashed = frameSlices(s, env).toDF()
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        expr("dhash64(fb)").as("ph"))
      .localCheckpoint(true)
    val chunks = hashed.select(col("doc_id"), col("frame_idx"), col("ph"),
      posexplode(expr(
        "transform(sequence(0,3), j -> shiftright(ph, 16 * j) & 65535)"))
        .as(Seq("chunk", "ckey")))
    val bounded = Dedup.capBuckets(chunks,
      Seq("frame_idx", "chunk", "ckey"), Some(Dedup.DefaultMaxBucket))
    val l = bounded.select(col("frame_idx"), col("chunk"), col("ckey"),
      col("doc_id").as("id_a"), col("ph").as("ph_a"))
    val r = bounded.select(col("frame_idx"), col("chunk"), col("ckey"),
      col("doc_id").as("id_b"), col("ph").as("ph_b"))
    l.join(r, Seq("frame_idx", "chunk", "ckey"))
      .filter(col("id_a") < col("id_b"))
      .filter(expr(SmallestSharedChunkCascade))
      .select(col("id_a"), col("id_b"),
        expr("cast(bit_count(ph_a ^ ph_b) as long)").as("ham"))
      .filter(col("ham") <= MaxPhashHamming)
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_match_frames"), min("ham").as("min_ham"))
      .withColumn("is_video_dup",
        col("n_match_frames") >= VideoDupMinFrames)
      .orderBy("id_a", "id_b")
  }

  private def videoFixtureValuesSql: String =
    VideoFixture.map { case (id, t) =>
      s"($id, '" + t.replace("'", "''") + "')"
    }.mkString(", ")

  /** q201 oracle: byte-exact per-frame dHash (the [[phashPairCtes]] bit
    * arithmetic applied to each frame's hex slice), the same per-position
    * chunk banding + cap + smallest-shared-chunk cascade, then the pair
    * vote rollup. */
  private def videoNearDupOracle: String = s"""
      WITH aug AS (SELECT doc_id, text FROM documents
                   UNION ALL SELECT * FROM (VALUES
                     $videoFixtureValuesSql) fx(doc_id, text)),
      ${frameSliceCtes("aug")},
      fbyt AS (SELECT doc_id, frame_idx, fr, length(fr) // 2 AS nf FROM f),
      bits AS (
        SELECT fb.doc_id, fb.frame_idx,
               CASE WHEN ('0x' || substr(fb.fr,
                        2 * ((fb.nf * ((k.k // 8) * 9 + (k.k % 8) + 1)) // ${graft.functions.DHash64.Samples}) + 1, 2))::INT
                   > ('0x' || substr(fb.fr,
                        2 * ((fb.nf * ((k.k // 8) * 9 + (k.k % 8))) // ${graft.functions.DHash64.Samples}) + 1, 2))::INT
                    THEN CASE WHEN k.k = 63 THEN (-9223372036854775807 - 1)::BIGINT
                              ELSE 1::BIGINT << k.k END
                    ELSE 0::BIGINT END AS bv
        FROM fbyt fb, (SELECT unnest(generate_series(0, 63)) AS k) k),
      h AS (SELECT doc_id, frame_idx, bit_or(bv) AS ph
            FROM bits GROUP BY 1, 2),
      chunks AS (SELECT doc_id, frame_idx, ph, j.j AS chunk,
                        (ph >> (16 * j.j)) & 65535 AS ckey
                 FROM h, (SELECT unnest(generate_series(0, 3)) AS j) j),
      keep AS (SELECT frame_idx, chunk, ckey FROM chunks
               GROUP BY 1, 2, 3
               HAVING count(*) <= ${Dedup.DefaultMaxBucket}),
      kchunks AS (SELECT c.* FROM chunks c
                  JOIN keep USING (frame_idx, chunk, ckey)),
      mates AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               bit_count(xor(a.ph, b.ph))::BIGINT AS ham
        FROM kchunks a JOIN kchunks b
          ON a.frame_idx = b.frame_idx AND a.chunk = b.chunk
         AND a.ckey = b.ckey AND a.doc_id < b.doc_id
        WHERE a.chunk = 0 OR (
          (a.ph & 65535) != (b.ph & 65535) AND (
            a.chunk = 1 OR (
              ((a.ph >> 16) & 65535) != ((b.ph >> 16) & 65535) AND (
                a.chunk = 2 OR
                ((a.ph >> 32) & 65535) != ((b.ph >> 32) & 65535))))))
      SELECT id_a, id_b, count(*)::BIGINT AS n_match_frames,
             min(ham)::BIGINT AS min_ham,
             (count(*) >= $VideoDupMinFrames) AS is_video_dup
      FROM mates WHERE ham <= $MaxPhashHamming
      GROUP BY 1, 2 ORDER BY 1, 2"""

  /** ONE byte-exact frame-slicing CTE chain (`d` → `f`, frames as hex
    * slices at 2-bytes-per-char offsets) shared by the q127 and q182
    * oracles — the framing rule exists once on the oracle side too. */
  private def frameSliceCtes(docsSrc: String): String = s"""
      d AS (SELECT doc_id, hex(encode(text)) AS hx,
                   octet_length(encode(text)) AS n
            FROM $docsSrc),
      f AS (
        SELECT doc_id, i.i AS frame_idx,
               substr(hx, 2 * ((n * i.i) // ${MediaCodec.FramesPerDoc}) + 1,
                 2 * least(greatest(n // ${MediaCodec.FramesPerDoc}, 1),
                       n - ((n * i.i) // ${MediaCodec.FramesPerDoc}))) AS fr
        FROM d, (SELECT unnest(generate_series(0,
                   ${MediaCodec.FramesPerDoc - 1})) AS i) i
        WHERE n > 0 AND ((n * i.i) // ${MediaCodec.FramesPerDoc}) < n)"""

  /** DuckDB-side dHash recomputation, BYTE-exact for any text encoding:
    * DuckDB 1.0 cannot index a BLOB directly, but `hex(encode(text))` can
    * be sliced at 2·offset to read any UTF-8 BYTE as an integer — so bit k
    * (k = r*8+c) compares the exact bytes the engine samples at grid cells
    * g=r*9+c and g+1 (offset floor(n*g/72)), with no byte == codepoint
    * assumption. The sign bit (k=63) cannot be built by `1 << 63` under
    * DuckDB's checked shift, so it ORs the Long.MinValue literal instead. */
  private def phashPairCtes(docsSrc: String = "documents"): String = s"""
      d AS (SELECT doc_id, hex(encode(text)) AS hx,
                   octet_length(encode(text)) AS n
                 FROM $docsSrc),
      bits AS (
        SELECT d.doc_id,
               CASE WHEN ('0x' || substr(d.hx,
                        2 * ((d.n * ((k.k // 8) * 9 + (k.k % 8) + 1)) // ${graft.functions.DHash64.Samples}) + 1, 2))::INT
                   > ('0x' || substr(d.hx,
                        2 * ((d.n * ((k.k // 8) * 9 + (k.k % 8))) // ${graft.functions.DHash64.Samples}) + 1, 2))::INT
                    THEN CASE WHEN k.k = 63 THEN (-9223372036854775807 - 1)::BIGINT
                              ELSE 1::BIGINT << k.k END
                    ELSE 0::BIGINT END AS bv
        FROM d, (SELECT unnest(generate_series(0, 63)) AS k) k),
      h AS (SELECT doc_id, bit_or(bv) AS ph FROM bits GROUP BY doc_id),
      chunks AS (SELECT doc_id, ph, j.j AS chunk, (ph >> (16 * j.j)) & 65535 AS ckey
                 FROM h, (SELECT unnest(generate_series(0, 3)) AS j) j),
      -- mirror the engine's Dedup.DefaultMaxBucket cap: oversize (chunk,
      -- ckey) buckets are boilerplate collisions, dropped BEFORE the join
      keep AS (SELECT chunk, ckey FROM chunks GROUP BY chunk, ckey
               HAVING count(*) <= ${Dedup.DefaultMaxBucket}),
      kchunks AS (SELECT c.* FROM chunks c JOIN keep USING (chunk, ckey)),
      -- mirror the engine's smallest-shared-chunk cascade (no DISTINCT):
      -- a pair survives only at the first chunk where its hashes agree,
      -- so a capped chunk-0 bucket suppresses the pair entirely — exactly
      -- the engine's semantics, not an approximation of them
      mates AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               bit_count(xor(a.ph, b.ph))::BIGINT AS ham
        FROM kchunks a JOIN kchunks b
          ON a.chunk = b.chunk AND a.ckey = b.ckey AND a.doc_id != b.doc_id
        WHERE a.chunk = 0 OR (
          (a.ph & 65535) != (b.ph & 65535) AND (
            a.chunk = 1 OR (
              ((a.ph >> 16) & 65535) != ((b.ph >> 16) & 65535) AND (
                a.chunk = 2 OR
                ((a.ph >> 32) & 65535) != ((b.ph >> 32) & 65535))))))"""

  private def phashOracle: String = s"""
      WITH ${phashPairCtes()},
      agg AS (SELECT id_a, count(*) AS nm, min(ham) AS mh
              FROM mates GROUP BY id_a)
      SELECT h.doc_id, h.ph, coalesce(a.nm, 0) AS n_bucket_mates,
             a.mh AS min_hamming,
             coalesce(a.mh <= $MaxPhashHamming, false) AS is_near_dup
      FROM h LEFT JOIN agg a ON a.id_a = h.doc_id
      ORDER BY h.doc_id"""

  /** q151 oracle: the same pair CTEs over corpus ∪ fixture, then a
    * recursive min-label walk (the q70 ccOracle shape) and the clustersOf
    * rollup. */
  /** The ONE definition of the fixture on the oracle side too: the SQL
    * VALUES list interpolates from [[PhashFixture]], so editing a fixture
    * row can never silently desync the two engines' corpora (the
    * ttrFromTokens/TtrSql single-definition discipline). */
  private def fixtureValuesSql: String =
    PhashFixture.map { case (id, t) =>
      s"($id, '" + t.replace("'", "''") + "')"
    }.mkString(", ")

  private def phashClusterOracle: String = s"""
      WITH RECURSIVE ${phashPairCtes(s"""(SELECT doc_id, text FROM documents
          UNION ALL SELECT * FROM (VALUES
            $fixtureValuesSql) fx(doc_id, text))""")},
      nd AS (SELECT id_a, id_b FROM mates
             WHERE ham <= $MaxPhashHamming AND id_a < id_b),
      edges AS (SELECT id_a AS src, id_b AS dst FROM nd
                UNION ALL SELECT id_b, id_a FROM nd),
      walk AS (
        SELECT src AS node, src AS comp FROM edges
        UNION
        SELECT e.dst AS node, w.comp FROM walk w JOIN edges e ON e.src = w.node
      ),
      comps AS (SELECT node, min(comp) AS cluster_id FROM walk GROUP BY node),
      sizes AS (SELECT cluster_id, count(*) AS cluster_size
                FROM comps GROUP BY cluster_id)
      SELECT c.node AS doc_id, c.cluster_id, s2.cluster_size,
             (c.node = c.cluster_id) AS is_keeper
      FROM comps c JOIN sizes s2 USING (cluster_id)
      ORDER BY doc_id"""

  val registry: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q96_phash_neardup" -> ((q96PhashNearDup _, phashOracle)),
    "q201_video_neardup" -> ((q201VideoNearDup _, videoNearDupOracle)),
    "q151_phash_clusters" -> ((q151PhashClusters _, phashClusterOracle)),
    "q182_frame_runs" -> ((q182FrameRuns _, {
      val rows = FrameRunFixture.map { case (id, t) => s"($id, '$t')" }
        .mkString(",\n        ")
      s"""
      WITH aug AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT * FROM (VALUES
        $rows) v(doc_id, text)),
      ${frameSliceCtes("aug")},
      flag AS (
        SELECT doc_id, frame_idx,
               CASE WHEN lag(fr) OVER (PARTITION BY doc_id
                      ORDER BY frame_idx) <> fr
                    THEN 1 ELSE 0 END AS chg
        FROM f),
      runs AS (
        SELECT doc_id, sum(chg) OVER (PARTITION BY doc_id ORDER BY frame_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
        FROM flag),
      rl AS (SELECT doc_id, run_id, count(*) AS len FROM runs GROUP BY 1, 2),
      mx AS (SELECT doc_id, max(len)::BIGINT AS max_run FROM rl GROUP BY 1)
      SELECT max_run, count(*)::BIGINT AS n_docs
      FROM mx GROUP BY 1 ORDER BY 1"""
    })),
    "q127_frame_profile" -> ((q127FrameProfile _, s"""
      -- BYTE-exact framing: frames are slices of hex(encode(text)) at
      -- 2-bytes-per-char offsets, so boundaries fall on the same BYTE
      -- positions the engine cuts regardless of encoding. The engine
      -- groups frames by md5(frame bytes); the oracle groups by the hex
      -- content itself — hex is injective, so every count is identical
      -- (md5 here is an identity fingerprint, not an output value)
      WITH ${frameSliceCtes("documents")},
      g AS (SELECT frame_idx, fr AS fh, count(*) AS c,
                   count(DISTINCT doc_id) AS nd
            FROM f GROUP BY 1, 2)
      SELECT frame_idx::BIGINT AS frame_idx,
             cast(sum(c) AS BIGINT) AS n_frames,
             count(*) AS n_distinct,
             cast(sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS BIGINT)
               AS n_dup_frames,
             cast(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_crossdoc_contents
      FROM g GROUP BY frame_idx ORDER BY frame_idx""")),
    "q34_multimodal_meta" -> ((q34MultimodalMeta _, """
      SELECT doc_id, 'doc://' || doc_id AS uri, 'text/plain' AS mime,
             octet_length(encode(text))::BIGINT AS nbytes, lang
      FROM documents ORDER BY doc_id""")),
    "q35_multimodal_features" -> ((q35MultimodalFeatures _, s"""
      WITH d AS (SELECT doc_id, hex(encode(text)) AS hx,
                        octet_length(encode(text)) AS n
                 FROM documents),
      ch AS (
        -- byte-exact histogram: every UTF-8 BYTE value via the hex slice,
        -- matching the engine's byte loop on any encoding
        SELECT doc_id, n,
               ('0x' || substr(hx, 2 * r.i - 1, 2))::INT
                 % ${MediaCodec.FeatureDim} AS bin
        FROM d, unnest(generate_series(1, n)) AS r(i)
      ),
      hist AS (
        SELECT doc_id, any_value(n) AS n, bin, count(*) AS c
        FROM ch GROUP BY doc_id, bin
      ),
      norm AS (
        SELECT doc_id,
               round(sqrt(sum((c::DOUBLE / n) * (c::DOUBLE / n))), 4) AS l2norm
        FROM hist GROUP BY doc_id
      )
      SELECT d.doc_id,
             (1 + d.n % 64)::BIGINT AS width,
             (1 + d.n % 48)::BIGINT AS height,
             ${MediaCodec.FeatureDim}::BIGINT AS dim,
             coalesce(nm.l2norm, 0.0) AS l2norm
      FROM d LEFT JOIN norm nm ON nm.doc_id = d.doc_id
      ORDER BY d.doc_id""")),
    "q50_multimodal_frames" -> ((q50MultimodalFrames _, s"""
      WITH d AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
      f AS (
        SELECT doc_id, i.i AS frame_idx,
               least((n * i.i // ${MediaCodec.FramesPerDoc}) + greatest(n // ${MediaCodec.FramesPerDoc}, 1), n)
                 - (n * i.i // ${MediaCodec.FramesPerDoc}) AS frame_len
        FROM d, (SELECT unnest(generate_series(0, ${MediaCodec.FramesPerDoc - 1})) AS i) i
        WHERE n >= 1 AND (n * i.i // ${MediaCodec.FramesPerDoc}) < n
      )
      SELECT doc_id, frame_idx::BIGINT AS frame_idx,
             frame_len::BIGINT AS frame_len,
             least(frame_len, 32)::BIGINT AS resized_len
      FROM f ORDER BY doc_id, frame_idx"""))
  )
}
