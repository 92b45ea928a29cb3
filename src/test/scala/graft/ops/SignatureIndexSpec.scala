package graft.ops

import graft.TestSpark
import graft.lake.DirectoryLakeCatalog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cross-session dedup state: signatures persisted by one session, an
  * incoming batch deduped against them by a fresh session with ZERO corpus
  * text reads — the ingest-side companion of CodebookPersistenceSpec. */
class SignatureIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("persist in A, dedup an incoming batch in B without touching corpus text") {
    val cat = DirectoryLakeCatalog.temp(spark)
    val ns = s"sig_${System.nanoTime()}"

    // session A: one corpus text scan -> signature table
    val index = Dedup.signaturesTable(spark, sf, cat, ns)
    val corpusN = Tables.documents(spark, sf).count()
    assert(index.count() == corpusN)

    // pick a long corpus doc to build the incoming batch from
    val probe = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), length(col("text")).as("len"))
      .orderBy(desc("len"), col("doc_id")).head()
    val srcId = probe.getLong(0)
    val srcText = probe.getString(1)
    val words = srcText.split(" ")
    assert(words.length > 20, "need a long doc for a stable near-dup")
    val nearText = (words.take(3) ++ Array("graftXnearY") ++
      words.drop(4)).mkString(" ")

    // session B: fresh session, index loaded from the lake
    val b = spark.newSession()
    import b.implicits._
    val bIndex = new DirectoryLakeCatalog(b, cat.root)
      .load(ns, "dedup_signatures")
    val incoming = Seq(
      (900001L, srcText),                        // exact dup of srcId
      (900002L, nearText),                       // near dup of srcId
      (900003L, ("novelzz " * 40).trim)          // no match
    ).toDF("doc_id", "text")
    val result = Dedup.dedupAgainstIndex(b, incoming, bIndex)
    val rows = result.collect()

    val exact = rows.filter(_.getAs[String]("match_kind") == "exact")
    assert(exact.map(r => (r.getAs[Long]("incoming_id"),
      r.getAs[Long]("corpus_id"))).contains((900001L, srcId)))
    assert(exact.forall(_.getAs[Double]("est_jaccard") == 1.0))

    val near = rows.filter(r =>
      r.getAs[String]("match_kind") == "near" &&
        r.getAs[Long]("incoming_id") == 900002L)
    assert(near.map(_.getAs[Long]("corpus_id")).contains(srcId),
      s"one-word edit must band-collide with its source; got " +
        rows.mkString("; "))
    val est = near.find(_.getAs[Long]("corpus_id") == srcId).get
      .getAs[Double]("est_jaccard")
    assert(est > 0.5 && est < 1.0, s"estimate $est should be high but not 1")

    assert(!rows.exists(_.getAs[Long]("incoming_id") == 900003L),
      "novel doc matched nothing")
    // exact pairs are never re-reported as near
    assert(!rows.exists(r => r.getAs[String]("match_kind") == "near" &&
      r.getAs[Long]("incoming_id") == 900001L &&
      r.getAs[Long]("corpus_id") == srcId))

    // the contract: session B's plan reads the SIGNATURE table, never the
    // corpus parquet
    val plan = result.queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      "incremental dedup must not re-read corpus text:\n" + plan.take(1500))
    cat.dropNamespace(ns)
  }
}
