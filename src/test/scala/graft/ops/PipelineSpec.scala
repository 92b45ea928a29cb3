package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end curation pipeline: the single-call composition must agree
  * exactly with the oracle-verified operators it chains, and the result
  * must round-trip through the lake catalog. */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("curateCorpus: ledger ∩ gate keep-set, q80 splits, lake round-trip") {
    val cat = graft.lake.DirectoryLakeCatalog.temp(spark)
    val curated = Pipeline.curateCorpus(spark, sf, cat, "curation")
    val rows = curated.collect()
    val keeps = Dedup.q129DedupLedger(spark, sf)
      .filter(col("action") === "keep").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val pass = TextOps.gateDecisions(spark, sf)
      .filter(col("gate_pass")).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == keeps.intersect(pass))
    assert(rows.nonEmpty && rows.length < keeps.size,
      "curation must keep some docs and gate out others")
    // split labels are exactly the leakage-safe assignment's
    val splits = Dedup.splitAssigned(spark, sf)
      .select("doc_id", "split").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    rows.foreach(r => assert(
      r.getAs[String]("split") == splits(r.getAs[Long]("doc_id"))))
    // the returned frame IS the lake table (fresh load sees the same rows)
    assert(cat.load("curation", "documents_curated").count() == rows.length)
    // scoreboard conserves docs and char mass
    val rep = Pipeline.curationReport(curated).collect()
    assert(rep.map(_.getAs[Long]("n_docs")).sum == rows.length.toLong)
    assert(rep.map(_.getAs[Long]("n_chars")).sum ==
      rows.map(_.getAs[Long]("n_chars")).sum)
    // re-running overwrites, never duplicates
    assert(Pipeline.curateCorpus(spark, sf, cat, "curation").count()
      == rows.length.toLong)
  }

  test("curateIncrement: index dedup + gate, index grows, replay is a no-op") {
    import spark.implicits._
    val cat = graft.lake.DirectoryLakeCatalog.temp(spark)
    Dedup.signaturesTable(spark, sf, cat, "inc")
    Pipeline.curateCorpus(spark, sf, cat, "inc")
    val before = cat.load("inc", "documents_curated").count()
    val sigBefore = cat.load("inc", "dedup_signatures").count()
    // a corpus doc's verbatim copy, a junk doc (gated), and a clean novel doc
    val corpusText = Tables.documents(spark, sf)
      .orderBy("doc_id").limit(1).collect()(0).getAs[String]("text")
    val novel = "the migratory patterns of arctic terns span hemispheres " +
      "while coastal winds carry them across open water toward nesting " +
      "grounds that shift gradually with every warming season in turn " +
      "and researchers tracking individual birds recorded journeys " +
      "exceeding seventy thousand kilometers within a single year " +
      "making these seabirds the most widely traveled vertebrates known"
    val batch = Seq(
      (9300001L, corpusText, "en", "crawl", corpusText.length.toLong),
      (9300002L, "tiny", "en", "crawl", 4L),
      (9300003L, novel, "en", "crawl", novel.length.toLong)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rep = Pipeline.curateIncrement(spark, batch, cat, "inc").collect()(0)
    assert(rep.getAs[Long]("n_incoming") == 3L)
    assert(rep.getAs[Long]("n_dup") == 1L)      // the verbatim copy
    assert(rep.getAs[Long]("n_gated") == 1L)    // the tiny doc
    assert(rep.getAs[Long]("n_appended") == 1L) // the novel doc
    assert(rep.getAs[Long]("n_preexisting") == 0L)
    val curated = cat.load("inc", "documents_curated")
    assert(curated.count() == before + 1)
    assert(curated.filter(col("doc_id") === 9300003L).count() == 1)
    // every non-dup doc was indexed (junk included — it was SEEN)
    assert(cat.load("inc", "dedup_signatures").count() == sigBefore + 2)
    // replaying the same batch: all index hits, nothing appended
    val rep2 = Pipeline.curateIncrement(spark, batch, cat, "inc").collect()(0)
    assert(rep2.getAs[Long]("n_dup") >= 2L) // copy + novel doc now indexed
    assert(rep2.getAs[Long]("n_appended") == 0L)
    assert(cat.load("inc", "documents_curated").count() == before + 1)
  }

  test("curateIncrement: intra-batch copies dedup before the index sees them") {
    import spark.implicits._
    val cat = graft.lake.DirectoryLakeCatalog.temp(spark)
    Dedup.signaturesTable(spark, sf, cat, "intra")
    Pipeline.curateCorpus(spark, sf, cat, "intra")
    val before = cat.load("intra", "documents_curated").count()
    val novel = "the migratory patterns of arctic terns span hemispheres " +
      "while coastal winds carry them across open water toward nesting " +
      "grounds that shift gradually with every warming season in turn " +
      "and researchers tracking individual birds recorded journeys " +
      "exceeding seventy thousand kilometers within a single year " +
      "making these seabirds the most widely traveled vertebrates known"
    // TWO verbatim copies of the same novel page in ONE batch — the index
    // cannot see either; intra-batch dedup must keep exactly the min id
    val batch = Seq(
      (9400001L, novel, "en", "crawl", novel.length.toLong),
      (9400002L, novel, "en", "crawl", novel.length.toLong)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rep = Pipeline.curateIncrement(spark, batch, cat, "intra").collect()(0)
    assert(rep.getAs[Long]("n_incoming") == 2L)
    assert(rep.getAs[Long]("n_dup") == 1L)      // the higher-id copy
    assert(rep.getAs[Long]("n_appended") == 1L)
    val curated = cat.load("intra", "documents_curated")
    assert(curated.count() == before + 1)
    assert(curated.filter(col("doc_id") === 9400001L).count() == 1)
    assert(curated.filter(col("doc_id") === 9400002L).count() == 0)
  }

  test("retireDocuments: purged from curated + signature tables, " +
    "time-travelable until expiry, idempotent") {
    import spark.implicits._
    val cat = graft.lake.DirectoryLakeCatalog.temp(spark)
    Dedup.signaturesTable(spark, sf, cat, "ret")
    Pipeline.curateCorpus(spark, sf, cat, "ret")
    val novel = "the migratory patterns of arctic terns span hemispheres " +
      "while coastal winds carry them across open water toward nesting " +
      "grounds that shift gradually with every warming season in turn " +
      "and researchers tracking individual birds recorded journeys " +
      "exceeding seventy thousand kilometers within a single year " +
      "making these seabirds the most widely traveled vertebrates known"
    val batch = Seq((9500001L, novel, "en", "crawl", novel.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    Pipeline.curateIncrement(spark, batch, cat, "ret")
    def inCurated() = cat.load("ret", "documents_curated")
      .filter(col("doc_id") === 9500001L).count()
    def inSigs() = cat.load("ret", "dedup_signatures")
      .filter(col("doc_id") === 9500001L).count()
    assert(inCurated() == 1L && inSigs() == 1L)
    val preDelete = cat.snapshotIds("ret", "documents_curated").max
    val rep = Pipeline.retireDocuments(cat, "ret",
      Seq(9500001L).toDF("doc_id")).collect()(0)
    assert(rep.getAs[Long]("n_purged_curated") == 1L)
    assert(rep.getAs[Long]("n_purged_signatures") == 1L)
    assert(inCurated() == 0L && inSigs() == 0L)
    // retired, not yet forgotten: older snapshots still hold the doc until
    // expiry — the documented retire + expire contract
    assert(cat.loadAt("ret", "documents_curated", preDelete)
      .filter(col("doc_id") === 9500001L).count() == 1L)
    cat.expireSnapshots("ret", "documents_curated", keepLast = 1)
    intercept[IllegalArgumentException](
      cat.loadAt("ret", "documents_curated", preDelete))
    // replaying the purge matches nothing and publishes no snapshot
    val snaps = cat.snapshotIds("ret", "documents_curated")
    val rep2 = Pipeline.retireDocuments(cat, "ret",
      Seq(9500001L).toDF("doc_id")).collect()(0)
    assert(rep2.getAs[Long]("n_purged_curated") == 0L)
    assert(rep2.getAs[Long]("n_purged_signatures") == 0L)
    assert(cat.snapshotIds("ret", "documents_curated") == snaps)
    // the other curated rows are untouched by the purge
    assert(cat.load("ret", "documents_curated").count() > 0L)
  }

  test("curateIncrement: upstream doc_id reuse with NEW text is absorbed " +
    "into n_preexisting — the ledger balances, the first write wins, the " +
    "new text still joins the dedup index") {
    import spark.implicits._
    val cat = graft.lake.DirectoryLakeCatalog.temp(spark)
    Dedup.signaturesTable(spark, sf, cat, "reuse")
    Pipeline.curateCorpus(spark, sf, cat, "reuse")
    def batchOf(text: String) =
      Seq((9450001L, text, "en", "crawl", text.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rep1 = Pipeline.curateIncrement(spark, batchOf(novelA), cat, "reuse")
      .collect()(0)
    assert(rep1.getAs[Long]("n_appended") == 1L)
    // same id, unrelated novel text: not a dup, not gated — but the id is
    // taken, so the append is absorbed and COUNTED, never silent
    val rep2 = Pipeline.curateIncrement(spark, batchOf(novelB), cat, "reuse")
      .collect()(0)
    assert(rep2.getAs[Long]("n_preexisting") == 1L)
    assert(rep2.getAs[Long]("n_incoming") ==
      rep2.getAs[Long]("n_dup") + rep2.getAs[Long]("n_gated") +
        rep2.getAs[Long]("n_appended") + rep2.getAs[Long]("n_preexisting"))
    val stored = cat.load("reuse", "documents_curated")
      .filter(col("doc_id") === 9450001L).collect()
    assert(stored.length == 1 && stored(0).getAs[String]("text") == novelA,
      "first write wins; id reuse never duplicates or replaces")
    // the reused id's NEW text was still signature-indexed under the
    // keeper id: a future copy of it classifies as a dup
    val rep3 = Pipeline.curateIncrement(spark,
      Seq((9450002L, novelB, "en", "crawl", novelB.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars"), cat, "reuse")
      .collect()(0)
    assert(rep3.getAs[Long]("n_dup") == 1L)
  }

  // ≥ GateMinTokens distinct-word docs; mutually non-near-dup so only the
  // copies we PLANT dedup
  private val novelA = "the migratory patterns of arctic terns span " +
    "hemispheres while coastal winds carry them across open water toward " +
    "nesting grounds that shift gradually with every warming season in " +
    "turn and researchers tracking individual birds recorded journeys " +
    "exceeding seventy thousand kilometers within a single year making " +
    "these seabirds the most widely traveled vertebrates known"
  private val novelB = "volcanic glass forms when molten rock cools too " +
    "quickly for crystals to arrange themselves and ancient toolmakers " +
    "prized the resulting obsidian for edges sharper than surgical steel " +
    "trading cores of it along routes that archaeologists now reconstruct " +
    "by matching trace element fingerprints between quarry outcrops and " +
    "distant settlement sites across several continents"
  private val novelC = "deep ocean vents sustain ecosystems that never " +
    "see sunlight where bacteria oxidize dissolved minerals to power " +
    "food webs of tube worms and blind shrimp and every expedition to " +
    "these ridges catalogs species unknown to science suggesting the " +
    "chemosynthetic biosphere rivals surface life in its diversity while " +
    "remaining almost entirely unexplored by humanity"

  private def doc(id: Long, text: String) =
    (id, text, "en", "crawl", text.length.toLong)

  private def seeded(ns: String): graft.lake.DirectoryLakeCatalog = {
    val cat = graft.lake.DirectoryLakeCatalog.temp(spark)
    Dedup.signaturesTable(spark, sf, cat, ns)
    Pipeline.curateCorpus(spark, sf, cat, ns)
    cat
  }

  test("curateStream: one epoch equals curateIncrement on the same batch; " +
    "a replayed batch is a no-op (one-definition-two-modes)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val catB = seeded("cs")
    val catS = seeded("cs")
    val corpusText = Tables.documents(spark, sf)
      .orderBy("doc_id").limit(1).collect()(0).getAs[String]("text")
    val batch = Seq(
      doc(9500001L, corpusText),      // index dup
      (9500002L, "tiny", "en", "crawl", 4L), // gated
      doc(9500003L, novelA))          // kept
    val batchDf = batch.toDF("doc_id", "text", "lang", "source", "n_chars")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cs-ckpt").toString
    val in = MemoryStream[(Long, String, String, String, Long)]
    val q = Pipeline.curateStream(
      in.toDF().toDF("doc_id", "text", "lang", "source", "n_chars"),
      catS, "cs", ckpt)
    try {
      in.addData(batch)
      q.processAllAvailable()
      val repB = Pipeline.curateIncrement(spark, batchDf, catB, "cs")
        .collect()(0)
      val led = catS.load("cs", "curation_epochs").collect()
      assert(led.length == 1 && led(0).getAs[Long]("epoch") == 0L)
      Seq("n_incoming", "n_dup", "n_gated", "n_appended",
        "n_preexisting").foreach(c =>
        assert(led(0).getAs[Long](c) == repB.getAs[Long](c),
          s"$c: streamed=${led(0).getAs[Long](c)} batch=${repB.getAs[Long](c)}"))
      def state(cat: graft.lake.LakeCatalog) = (
        cat.load("cs", "documents_curated").select("doc_id", "split")
          .collect().map(r => (r.getLong(0), r.getString(1))).toSet,
        cat.load("cs", "dedup_signatures").select("doc_id")
          .collect().map(_.getLong(0)).toSet)
      assert(state(catS) == state(catB),
        "streamed epoch diverged from the batch face")
      // replay the same docs as a NEW epoch: all index hits on both faces
      in.addData(batch)
      q.processAllAvailable()
      val repB2 = Pipeline.curateIncrement(spark, batchDf, catB, "cs")
        .collect()(0)
      val led2 = catS.load("cs", "curation_epochs")
        .filter(col("epoch") === 1L).collect()(0)
      Seq("n_incoming", "n_dup", "n_gated", "n_appended",
        "n_preexisting").foreach(c =>
        assert(led2.getAs[Long](c) == repB2.getAs[Long](c)))
      assert(led2.getAs[Long]("n_appended") == 0L)
      assert(state(catS) == state(catB))
    } finally {
      q.stop()
      catB.dropNamespace("cs"); catS.dropNamespace("cs")
    }
  }

  test("curateStream mid-epoch crash: appends persisted but epoch " +
    "uncommitted — restart replays it to exactly-once tables and ledger") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val cat = seeded("ccr")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ccr-ckpt").toString
    val in = MemoryStream[(Long, String, String, String, Long)]
    def start() = Pipeline.curateStream(
      in.toDF().toDF("doc_id", "text", "lang", "source", "n_chars"),
      cat, "ccr", ckpt)
    val q1 = start()
    try {
      in.addData(Seq(doc(9600001L, novelA)))
      q1.processAllAvailable() // epoch 0, clean
      val curated0 = cat.load("ccr", "documents_curated").count()
      val sigs0 = cat.load("ccr", "dedup_signatures").count()
      Streaming.CrashHook.arm()
      in.addData(Seq(doc(9600002L, novelB), doc(9600003L, novelC)))
      intercept[Exception](q1.processAllAvailable()) // dies post-append
      assert(q1.exception.isDefined)
      // the at-least-once window is REAL: epoch 1's writes all landed,
      // only the checkpoint commit is missing
      assert(cat.load("ccr", "documents_curated").count() == curated0 + 2)
      assert(cat.load("ccr", "dedup_signatures").count() == sigs0 + 2)
      assert(cat.load("ccr", "curation_epochs")
        .filter(col("epoch") === 1L).count() == 1)
      // restart from the same checkpoint: epoch 1 redelivers and every
      // guard must absorb it
      val q2 = start()
      try {
        q2.processAllAvailable()
        assert(cat.load("ccr", "documents_curated").count() == curated0 + 2,
          "replayed epoch duplicated curated rows")
        assert(cat.load("ccr", "dedup_signatures").count() == sigs0 + 2,
          "replayed epoch duplicated signatures")
        val led = cat.load("ccr", "curation_epochs").collect()
        assert(led.count(_.getAs[Long]("epoch") == 1L) == 1,
          "replayed epoch duplicated its ledger row")
        // the ledger row is the ORIGINAL (pre-crash) truth, not the
        // replay's all-dup recount
        val e1 = led.find(_.getAs[Long]("epoch") == 1L).get
        assert(e1.getAs[Long]("n_appended") == 2L &&
          e1.getAs[Long]("n_dup") == 0L)
        // the stream continues past the recovered epoch
        in.addData(Seq(doc(9600001L, novelA))) // dup of epoch 0's doc
        q2.processAllAvailable()
        val e2 = cat.load("ccr", "curation_epochs")
          .filter(col("epoch") === 2L).collect()(0)
        assert(e2.getAs[Long]("n_dup") == 1L &&
          e2.getAs[Long]("n_appended") == 0L)
      } finally q2.stop()
    } finally {
      Streaming.CrashHook.disarm()
      q1.stop()
      cat.dropNamespace("ccr")
    }
  }

  test("curateStream bootstraps from an empty catalog (no pre-seeded index)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val cat = graft.lake.DirectoryLakeCatalog.temp(spark)
    cat.ensureNamespace("boot")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-boot-ckpt").toString
    val in = MemoryStream[(Long, String, String, String, Long)]
    val q = Pipeline.curateStream(
      in.toDF().toDF("doc_id", "text", "lang", "source", "n_chars"),
      cat, "boot", ckpt)
    try {
      in.addData(Seq(doc(1L, novelA), doc(2L, novelA))) // intra-batch pair
      q.processAllAvailable()
      assert(cat.load("boot", "documents_curated").select("doc_id")
        .collect().map(_.getLong(0)).toSet == Set(1L))
      in.addData(Seq(doc(3L, novelA), doc(4L, novelB))) // cross-epoch dup
      q.processAllAvailable()
      assert(cat.load("boot", "documents_curated").select("doc_id")
        .collect().map(_.getLong(0)).toSet == Set(1L, 4L))
      // signatures carry the SURVIVORS only: 1 (epoch 0) and 4 (epoch 1);
      // the intra-batch copy 2 and the index hit 3 were never novel
      assert(cat.load("boot", "dedup_signatures").select("doc_id")
        .collect().map(_.getLong(0)).toSet == Set(1L, 4L))
    } finally {
      q.stop()
      cat.dropNamespace("boot")
    }
  }

  test("curateCorpus partitioned by split: same rows, prunable layout") {
    val cat = graft.lake.DirectoryLakeCatalog.temp(spark)
    val flat = Pipeline.curateCorpus(spark, sf, cat, "flat")
    val part = Pipeline.curateCorpus(spark, sf, cat, "by_split",
      partitionBy = Seq("split"))
    assert(part.count() == flat.count())
    assert(part.select("doc_id").collect().map(_.getLong(0)).toSet ==
      flat.select("doc_id").collect().map(_.getLong(0)).toSet)
  }
}
