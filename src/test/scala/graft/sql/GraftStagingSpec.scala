package graft.sql

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Atomic `CREATE/REPLACE TABLE ... AS SELECT` through the
  * [[org.apache.spark.sql.connector.catalog.StagingTableCatalog]] face:
  * a failed select leaves no half-created table, RTAS on an unchanged
  * shape is ONE overwrite snapshot (history preserved — the non-atomic
  * path would have dropped and recreated), and a shape-changing RTAS
  * materializes the select before any drop so the old table survives a
  * failing query. */
class GraftStagingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val cat: String = {
    val wh = Files.createTempDirectory("graft-stage-").toString
    spark.conf.set("spark.sql.catalog.gstage", "graft.sql.GraftSqlCatalog")
    spark.conf.set("spark.sql.catalog.gstage.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gstage.s")
    spark.udf.register("graft_boom",
      (x: Long) => { throw new RuntimeException("boom"); x })
    "gstage"
  }

  private def lake = spark.sessionState.catalogManager.catalog("gstage")
    .asInstanceOf[GraftSqlCatalog].lake

  test("CTAS lands schema + rows in one go; a FAILING select leaves no " +
    "table behind") {
    cat
    spark.sql(s"CREATE TABLE $cat.s.src (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $cat.s.src VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"CREATE TABLE $cat.s.ct AS " +
      s"SELECT id, v FROM $cat.s.src WHERE id > 1")
    assert(spark.sql(s"SELECT id, v FROM $cat.s.ct").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((2L, "b")))
    intercept[Exception](spark.sql(s"CREATE TABLE $cat.s.ct_fail AS " +
      s"SELECT graft_boom(id) AS id, v FROM $cat.s.src"))
    assert(!lake.tableExists("s", "ct_fail"),
      "failed CTAS left a half-created table")
  }

  test("RTAS on an unchanged shape is ONE overwrite snapshot — history " +
    "preserved and time-travelable") {
    cat
    val t = s"$cat.s.rt"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b')")
    val before = lake.snapshotIds("s", "rt")
    // self-referential replace: the select reads the table it replaces
    spark.sql(s"REPLACE TABLE $t AS " +
      s"SELECT id + 10 AS id, v FROM $t WHERE id = 1")
    val after = lake.snapshotIds("s", "rt")
    assert(after.length == before.length + 1,
      s"expected ONE new snapshot, got $before -> $after")
    assert(spark.sql(s"SELECT id FROM $t").collect()
      .map(_.getLong(0)).toSeq == Seq(11L))
    // the pre-replace state is still a snapshot away
    val rows = spark.sql(
      s"SELECT id FROM $t VERSION AS OF ${before.last} ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(1L, 2L))
    val ops = spark.sql(s"SELECT operation FROM $t.snapshots " +
      "ORDER BY snapshot_id").collect().map(_.getString(0)).toSeq
    assert(ops.last == "overwrite", ops.toString)
  }

  test("shape-changing RTAS replaces schema; a FAILING shape-changing " +
    "select leaves the old table intact") {
    cat
    val t = s"$cat.s.rs"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a')")
    // failure first: the select materializes BEFORE any drop
    intercept[Exception](spark.sql(s"REPLACE TABLE $t AS " +
      s"SELECT graft_boom(id) AS id, v, 1.5 AS extra FROM $t"))
    assert(spark.sql(s"SELECT id, v FROM $t").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "a")),
      "failed shape-changing RTAS damaged the target")
    // then the successful shape change
    spark.sql(s"REPLACE TABLE $t AS " +
      s"SELECT id, v, CAST(id * 1.5 AS DOUBLE) AS extra FROM $t")
    assert(spark.sql(s"SELECT id, v, extra FROM $t").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq((1L, "a", 1.5)))
  }

  test("CREATE OR REPLACE creates when missing, replaces when present; " +
    "plain REPLACE on a missing table refuses") {
    cat
    val t = s"$cat.s.cor"
    spark.sql(s"CREATE OR REPLACE TABLE $t AS SELECT 1L AS id")
    assert(spark.sql(s"SELECT id FROM $t").collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    spark.sql(s"CREATE OR REPLACE TABLE $t AS SELECT 2L AS id")
    assert(spark.sql(s"SELECT id FROM $t").collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
    val e = intercept[Exception](spark.sql(
      s"REPLACE TABLE $cat.s.nosuch AS SELECT 1L AS id"))
    assert(e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      e.getMessage.toLowerCase.contains("not found") ||
      e.getMessage.toLowerCase.contains("cannot be found"), e.getMessage)
  }
}
