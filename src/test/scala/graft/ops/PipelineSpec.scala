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
