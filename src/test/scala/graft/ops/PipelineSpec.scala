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
