package graft.sql

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** SQL `UPDATE` / `MERGE INTO` on graft tables (VERDICT r14 #1): the
  * planner strategy lowers both onto ONE atomic merge-on-read commit
  * (position mask + new-version append). Covers the full action matrix,
  * the SQL cardinality rule, single-commit accounting, debt/partitioned/
  * bucketed targets, and the no-op edges. */
class GraftRowLevelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val cat: String = {
    val wh = Files.createTempDirectory("graft-rowlevel-").toString
    spark.conf.set("spark.sql.catalog.grl", "graft.sql.GraftSqlCatalog")
    spark.conf.set("spark.sql.catalog.grl.warehouse", wh)
    "grl"
  }

  private def rows(t: String): Seq[(Long, String, Double)] =
    spark.sql(s"SELECT id, v, amt FROM $t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq

  private def snapshots(t: String): Long =
    spark.sql(s"SELECT count(*) FROM $t.snapshots").collect()(0).getLong(0)

  private def mk(name: String, extra: String = ""): String = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.rl")
    val t = s"$cat.rl.$name"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING, amt DOUBLE) $extra")
    spark.sql(s"INSERT INTO $t VALUES (1,'a',10.0), (2,'b',20.0), " +
      "(3,'c',30.0), (4,'d',40.0)")
    t
  }

  test("UPDATE: selective SET with expression referencing old row value " +
    "lands as ONE commit; untouched rows carried by reference") {
    val t = mk("upd")
    val before = snapshots(t)
    spark.sql(s"UPDATE $t SET v = concat(v, '!'), amt = amt * 2 " +
      "WHERE id <= 2")
    assert(rows(t) == Seq((1L, "a!", 20.0), (2L, "b!", 40.0),
      (3L, "c", 30.0), (4L, "d", 40.0)))
    assert(snapshots(t) == before + 1, "UPDATE must be ONE commit")
  }

  test("UPDATE with no matching rows publishes NO commit") {
    val t = mk("updnone")
    val before = snapshots(t)
    spark.sql(s"UPDATE $t SET amt = 0.0 WHERE id > 100")
    assert(snapshots(t) == before)
    assert(rows(t).map(_._1) == Seq(1L, 2L, 3L, 4L))
  }

  test("UPDATE with NULL-evaluating condition keeps the row (SQL " +
    "three-valued logic)") {
    val t = mk("updnull")
    spark.sql(s"INSERT INTO $t VALUES (5, NULL, 50.0)")
    spark.sql(s"UPDATE $t SET amt = -1.0 WHERE v < 'c'") // NULL v: no match
    val r = spark.sql(s"SELECT id, amt FROM $t ORDER BY id").collect()
      .map(x => (x.getLong(0), x.getDouble(1))).toSeq
    assert(r == Seq((1L, -1.0), (2L, -1.0), (3L, 30.0), (4L, 40.0),
      (5L, 50.0)))
  }

  test("MERGE: matched UPDATE + matched-conditional DELETE + NOT MATCHED " +
    "INSERT in one statement, ONE commit") {
    val t = mk("mrg")
    val before = snapshots(t)
    spark.sql(
      s"""MERGE INTO $t t USING (
         |  SELECT * FROM VALUES (CAST(1 AS BIGINT), 'upd', 11.0),
         |                       (CAST(2 AS BIGINT), 'kill', 0.0),
         |                       (CAST(9 AS BIGINT), 'new', 90.0)
         |  AS s(id, v, amt)) s
         |ON t.id = s.id
         |WHEN MATCHED AND s.v = 'kill' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.v, amt = s.amt + t.amt
         |WHEN NOT MATCHED THEN INSERT (id, v, amt) VALUES (s.id, s.v, s.amt)
         |""".stripMargin)
    assert(rows(t) == Seq((1L, "upd", 21.0), (3L, "c", 30.0),
      (4L, "d", 40.0), (9L, "new", 90.0)))
    assert(snapshots(t) == before + 1, "MERGE must be ONE commit")
  }

  test("MERGE: first-matching-action-wins ordering (conditional clause " +
    "shadows the unconditional one that follows)") {
    val t = mk("mrgorder")
    spark.sql(
      s"""MERGE INTO $t t USING (SELECT CAST(1 AS BIGINT) AS id) s
         |ON t.id = s.id
         |WHEN MATCHED AND t.amt > 5 THEN UPDATE SET v = 'first'
         |WHEN MATCHED THEN UPDATE SET v = 'second'
         |""".stripMargin)
    assert(rows(t).head == ((1L, "first", 10.0)))
  }

  test("MERGE: WHEN NOT MATCHED BY SOURCE (update and delete arms)") {
    val t = mk("mrgnmbs")
    spark.sql(
      s"""MERGE INTO $t t USING (
         |  SELECT CAST(1 AS BIGINT) AS id, 'one' AS v) s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED BY SOURCE AND t.id = 4 THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 'orphan'
         |""".stripMargin)
    assert(rows(t) == Seq((1L, "one", 10.0), (2L, "orphan", 20.0),
      (3L, "orphan", 30.0)))
  }

  test("MERGE: unassigned INSERT columns land NULL") {
    val t = mk("mrgnullins")
    spark.sql(
      s"""MERGE INTO $t t USING (SELECT CAST(77 AS BIGINT) AS id) s
         |ON t.id = s.id
         |WHEN NOT MATCHED THEN INSERT (id) VALUES (s.id)
         |""".stripMargin)
    val r = spark.sql(s"SELECT v, amt FROM $t WHERE id = 77").collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("MERGE cardinality violation: a target row matched by two source " +
    "rows fails loudly and publishes NOTHING") {
    val t = mk("mrgcard")
    val before = snapshots(t)
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO $t t USING (
           |  SELECT CAST(1 AS BIGINT) AS id, 'x' AS v
           |  UNION ALL SELECT CAST(1 AS BIGINT), 'y') s
           |ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET v = s.v
           |""".stripMargin)
    }
    def msgs(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(e0 =>
        Option(e0.getMessage).toSeq ++ msgs(e0.getCause))
    assert(msgs(e).exists(_.contains("MERGE_CARDINALITY_VIOLATION")))
    assert(snapshots(t) == before, "failed MERGE must not commit")
    assert(rows(t).map(_._2) == Seq("a", "b", "c", "d"))
  }

  test("MERGE into an EMPTY table: NOT MATCHED inserts commit as a " +
    "plain append") {
    spark.sql(s"CREATE TABLE $cat.rl.empty (id BIGINT, v STRING, " +
      "amt DOUBLE)")
    spark.sql(
      s"""MERGE INTO $cat.rl.empty t USING (
         |  SELECT * FROM VALUES (CAST(1 AS BIGINT), 'a', 1.0),
         |                       (CAST(2 AS BIGINT), 'b', 2.0)
         |  AS s(id, v, amt)) s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (id, v, amt) VALUES (s.id, s.v, s.amt)
         |""".stripMargin)
    assert(rows(s"$cat.rl.empty") == Seq((1L, "a", 1.0), (2L, "b", 2.0)))
  }

  test("UPDATE on a PARTITIONED table preserves the layout (new versions " +
    "land in their partition dirs); MERGE on a bucket-transform table " +
    "keeps per-bucket clustering") {
    spark.sql(s"CREATE TABLE $cat.rl.part (id BIGINT, lang STRING, " +
      "amt DOUBLE) PARTITIONED BY (lang)")
    spark.sql(s"INSERT INTO $cat.rl.part VALUES (1,'en',1.0), " +
      "(2,'de',2.0), (3,'en',3.0)")
    spark.sql(s"UPDATE $cat.rl.part SET amt = amt + 100 WHERE lang = 'en'")
    val r = spark.sql(s"SELECT id, amt FROM $cat.rl.part ORDER BY id")
      .collect().map(x => (x.getLong(0), x.getDouble(1))).toSeq
    assert(r == Seq((1L, 101.0), (2L, 2.0), (3L, 103.0)))
    // partition pruning still serves the updated rows
    val en = spark.sql(
      s"SELECT sum(amt) FROM $cat.rl.part WHERE lang = 'en'")
      .collect()(0).getDouble(0)
    assert(en == 204.0)

    spark.sql(s"CREATE TABLE $cat.rl.bkt (id BIGINT, v STRING) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.sql(s"INSERT INTO $cat.rl.bkt SELECT id, concat('v', id) " +
      "FROM range(20)")
    spark.sql(
      s"""MERGE INTO $cat.rl.bkt t USING (
         |  SELECT id, concat('m', id) AS v FROM range(10, 25)) s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)
         |""".stripMargin)
    val got = spark.sql(s"SELECT v FROM $cat.rl.bkt ORDER BY id")
      .collect().map(_.getString(0)).toSeq
    val want = (0L until 10L).map("v" + _) ++ (10L until 25L).map("m" + _)
    assert(got == want)
  }

  test("UPDATE on a table already carrying MOR delete debt applies the " +
    "existing masks before matching") {
    val t = mk("upddebt")
    spark.sql(s"DELETE FROM $t WHERE id = 2") // MOR debt
    spark.sql(s"UPDATE $t SET v = 'seen' WHERE amt >= 20.0")
    assert(rows(t) == Seq((1L, "a", 10.0), (3L, "seen", 30.0),
      (4L, "seen", 40.0)))
  }

  test("MERGE WITH SCHEMA EVOLUTION: new source columns evolve the " +
    "table through the catalog (one ALTER + one MERGE commit), star " +
    "actions fill them, pre-evolution rows read NULL") {
    val t = mk("mrgevo")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $t t USING (
         |  SELECT CAST(1 AS BIGINT) AS id, 'z' AS v,
         |         CAST(10.5 AS DOUBLE) AS amt, CAST(7 AS BIGINT) AS score
         |  UNION ALL SELECT CAST(9 AS BIGINT), 'new',
         |         CAST(90.0 AS DOUBLE), CAST(9 AS BIGINT)) s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *
         |""".stripMargin)
    assert(spark.sql(s"SELECT * FROM $t").columns.toSeq ==
      Seq("id", "v", "amt", "score"))
    val got = spark.sql(s"SELECT id, v, amt, score FROM $t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(got == Seq((1L, "z", 10.5, 7L), (2L, "b", 20.0, -1L),
      (3L, "c", 30.0, -1L), (4L, "d", 40.0, -1L), (9L, "new", 90.0, 9L)))
  }

  test("MERGE INTO + UPDATE through a REST-carrier SQL catalog: the " +
    "row-level commit path is carrier-generic (server-side CAS, local " +
    "data root)") {
    val server = graft.lake.RestCatalogStub.start()
    try {
      val wh = Files.createTempDirectory("graft-rl-rest-").toString
      spark.conf.set("spark.sql.catalog.grlrest", "graft.sql.GraftSqlCatalog")
      spark.conf.set("spark.sql.catalog.grlrest.uri", server.uri)
      spark.conf.set("spark.sql.catalog.grlrest.warehouse", wh)
      spark.sql("CREATE NAMESPACE IF NOT EXISTS grlrest.rl")
      spark.sql("CREATE TABLE grlrest.rl.t (id BIGINT, v STRING)")
      spark.sql("INSERT INTO grlrest.rl.t VALUES (1,'a'),(2,'b')")
      spark.sql(
        """MERGE INTO grlrest.rl.t t USING (
          |  SELECT CAST(2 AS BIGINT) AS id, 'B' AS v
          |  UNION ALL SELECT CAST(3 AS BIGINT), 'c') s
          |ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)
          |""".stripMargin)
      spark.sql("UPDATE grlrest.rl.t SET v = upper(v) WHERE id = 1")
      val got = spark.sql("SELECT id, v FROM grlrest.rl.t ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got == Seq((1L, "A"), (2L, "B"), (3L, "c")))
      spark.sql("DROP NAMESPACE grlrest.rl CASCADE")
    } finally server.stop()
  }

  test("library read faces and time travel see the merged state " +
    "consistently") {
    val t = mk("mrgtravel")
    val beforeId = spark.sql(
      s"SELECT snapshot_id FROM $t.snapshots ORDER BY committed_at DESC, " +
        "snapshot_id DESC LIMIT 1").collect()(0).getLong(0)
    spark.sql(s"UPDATE $t SET v = 'post' WHERE id = 1")
    assert(spark.sql(s"SELECT v FROM $t VERSION AS OF $beforeId " +
      "WHERE id = 1").collect()(0).getString(0) == "a")
    assert(spark.sql(s"SELECT v FROM $t WHERE id = 1")
      .collect()(0).getString(0) == "post")
  }
}
