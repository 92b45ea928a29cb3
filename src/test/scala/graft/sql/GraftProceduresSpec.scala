package graft.sql

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** SQL `CALL` maintenance procedures (`graft.system.*`): each is a thin
  * face over a spec-proven lake op — this suite drives the statement
  * layer (positional + named args, result rows, loud failures) and the
  * end-to-end lifecycle composition (WAP stage → audit → fast-forward,
  * compact → expire → remove orphans). */
class GraftProceduresSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val cat: String = {
    val wh = Files.createTempDirectory("graft-proc-").toString
    spark.conf.set("spark.sql.catalog.gproc", "graft.sql.GraftSqlCatalog")
    spark.conf.set("spark.sql.catalog.gproc.warehouse", wh)
    "gproc"
  }

  private def lake = spark.sessionState.catalogManager.catalog(cat)
    .asInstanceOf[GraftSqlCatalog].lake

  test("compact + expire_snapshots + remove_orphan_files: the retention " +
    "lifecycle through CALL, named and positional args") {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.m")
    val t = s"$cat.m.t"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    (1 to 3).foreach(i =>
      spark.sql(s"INSERT INTO $t VALUES ($i, 'v$i')"))
    val c = spark.sql(
      s"CALL $cat.system.compact(table => 'm.t', target_files => 1)")
      .collect()(0)
    assert(c.getString(0) == "m.t" && c.getInt(1) == 1,
      "compact reports one live file")
    val e = spark.sql(s"CALL $cat.system.expire_snapshots('m.t', 1)")
      .collect()(0)
    assert(e.getInt(1) == 1, "one snapshot retained")
    assert(spark.sql(s"SELECT count(*) FROM $t").head().getLong(0) == 3)
    val o = spark.sql(
      s"CALL $cat.system.remove_orphan_files('m.t', CAST(0 AS BIGINT))")
      .collect()(0)
    assert(o.getLong(1) >= 0L && o.getLong(2) >= 0L)
  }

  test("rollback_to_snapshot restores a prior state as a NEW commit") {
    val t = s"$cat.m.rb"
    spark.sql(s"CREATE TABLE $t (id BIGINT)")
    spark.sql(s"INSERT INTO $t VALUES (1)")
    val sid = spark.sql(s"SELECT snapshot_id FROM $t.snapshots " +
      "ORDER BY snapshot_id DESC LIMIT 1").head().getLong(0)
    spark.sql(s"INSERT INTO $t VALUES (2)")
    assert(spark.sql(s"SELECT count(*) FROM $t").head().getLong(0) == 2)
    spark.sql(s"CALL $cat.system.rollback_to_snapshot('m.rb', $sid)")
    assert(spark.sql(s"SELECT count(*) FROM $t").head().getLong(0) == 1)
  }

  test("WAP through CALL: stage on a branch, diverge main, cherry-pick " +
    "publishes the staged append; fast_forward publishes a linear branch") {
    import spark.implicits._
    val t = s"$cat.m.wap"
    spark.sql(s"CREATE TABLE $t (id BIGINT)")
    spark.sql(s"INSERT INTO $t VALUES (1)")
    // cherry-pick path: stage, diverge, publish by re-parent
    lake.stageAppend("m", "wap", "audit", Seq(10L).toDF("id"))
    val staged = lake.listRefs("m", "wap")("audit")._2
    spark.sql(s"INSERT INTO $t VALUES (2)") // main diverges
    spark.sql(s"CALL $cat.system.cherrypick_snapshot('m.wap', $staged)")
    assert(spark.sql(s"SELECT id FROM $t ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L, 10L))
    // fast-forward path: linear branch publishes directly
    lake.stageAppend("m", "wap", "ff", Seq(20L).toDF("id"))
    spark.sql(s"CALL $cat.system.fast_forward('m.wap', 'ff')")
    assert(spark.sql(s"SELECT id FROM $t ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 2L, 10L, 20L))
  }

  test("loud failures: unknown procedure names the known set; a " +
    "malformed table identifier refuses") {
    val e1 = intercept[Exception] {
      spark.sql(s"CALL $cat.system.nope('m.t')").collect()
    }
    // Spark wraps the catalog's error in FAILED_TO_LOAD_ROUTINE; our
    // known-set message rides the cause chain
    def msgs(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(e0 =>
        Option(e0.getMessage).toSeq ++ msgs(e0.getCause))
    assert(msgs(e1).exists(m => m.contains("expire_snapshots") ||
      m.contains("FAILED_TO_LOAD_ROUTINE")),
      s"unknown procedure must fail loudly: ${msgs(e1)}")
    spark.sql(s"CREATE TABLE $cat.m.bad (id BIGINT)")
    val e2 = intercept[Exception] {
      spark.sql(s"CALL $cat.system.expire_snapshots('justtable', 1)")
        .collect()
    }
    assert(e2.getMessage.contains("namespace.table"))
  }
}
