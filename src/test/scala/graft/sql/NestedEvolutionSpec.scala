package graft.sql

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** NESTED additive schema evolution (`ALTER TABLE t ADD COLUMNS
  * (s.x TYPE)`, the last fragment of VERDICT r14 #5): the parent struct
  * widens by appending, old files never rewrite, and the read path
  * rebuilds evolved structs BY NAME — pre-evolution rows read the new
  * field as NULL and a NULL struct stays NULL. Nested RENAME/DROP stay
  * refused (they would need a nested name history the positional id
  * model does not carry). */
class NestedEvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val cat: String = {
    val wh = Files.createTempDirectory("graft-nested-").toString
    spark.conf.set("spark.sql.catalog.gnest", "graft.sql.GraftSqlCatalog")
    spark.conf.set("spark.sql.catalog.gnest.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gnest.s")
    "gnest"
  }

  private def lake = spark.sessionState.catalogManager.catalog("gnest")
    .asInstanceOf[GraftSqlCatalog].lake

  test("ADD COLUMNS (s.x): old rows null-fill, a NULL struct stays " +
    "NULL, new-shape rows land beside old files") {
    val t = s"$cat.s.ev"
    spark.sql(s"CREATE TABLE $t (id BIGINT, s STRUCT<a: BIGINT>)")
    spark.sql(s"INSERT INTO $t VALUES " +
      "(1, named_struct('a', CAST(10 AS BIGINT))), " +
      "(2, CAST(NULL AS STRUCT<a: BIGINT>))")
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (s.x DOUBLE)")
    // the evolved schema face
    assert(spark.table(t).schema("s").dataType.simpleString ==
      "struct<a:bigint,x:double>")
    // old rows: s.x null; row 2's s itself must STAY null
    val pre = spark.sql(
      s"SELECT id, s.a, s.x, s IS NULL FROM $t ORDER BY id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        r.isNullAt(2), r.getBoolean(3))).toSeq
    assert(pre == Seq((1L, 10L, true, false), (2L, -1L, true, true)),
      pre.toString)
    // new-shape rows mix with old files
    spark.sql(s"INSERT INTO $t VALUES " +
      "(3, named_struct('a', CAST(30 AS BIGINT), 'x', CAST(1.5 AS DOUBLE)))")
    val all = spark.sql(s"SELECT id, s.a, s.x FROM $t ORDER BY id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toSeq
    assert(all == Seq((1L, 10L, -1.0), (2L, -1L, -1.0), (3L, 30L, 1.5)),
      all.toString)
  }

  test("deep nesting (s.t.y) widens the inner struct; filters and " +
    "aggregates run over the aligned read") {
    val t = s"$cat.s.deep"
    spark.sql(
      s"CREATE TABLE $t (id BIGINT, s STRUCT<t: STRUCT<a: BIGINT>>)")
    spark.sql(s"INSERT INTO $t VALUES " +
      "(1, named_struct('t', named_struct('a', CAST(1 AS BIGINT))))")
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (s.t.y STRING)")
    spark.sql(s"INSERT INTO $t VALUES (2, named_struct('t', " +
      "named_struct('a', CAST(2 AS BIGINT), 'y', 'new')))")
    val got = spark.sql(s"SELECT id, s.t.a, s.t.y FROM $t " +
      "WHERE s.t.a > 0 ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) "-" else r.getString(2))).toSeq
    assert(got == Seq((1L, 1L, "-"), (2L, 2L, "new")), got.toString)
    assert(spark.sql(s"SELECT count(s.t.y) FROM $t").head().getLong(0)
      == 1L)
  }

  test("refusals: duplicate nested name, non-struct parent, missing " +
    "parent, non-nullable field, nested RENAME/DROP") {
    val t = s"$cat.s.ref"
    spark.sql(s"CREATE TABLE $t (id BIGINT, s STRUCT<a: BIGINT>)")
    def fails(sql: String, needle: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      def walk(t0: Throwable): Boolean = t0 != null &&
        (Option(t0.getMessage).exists(_.contains(needle)) ||
          walk(t0.getCause))
      assert(walk(e), s"$sql -> ${e.toString.take(300)}")
    }
    fails(s"ALTER TABLE $t ADD COLUMNS (s.a STRING)", "already exists")
    fails(s"ALTER TABLE $t ADD COLUMNS (id.z STRING)", "not a struct")
    // the analyzer resolves the parent before our face sees it
    fails(s"ALTER TABLE $t ADD COLUMNS (nope.z STRING)",
      "cannot be resolved")
    val e = intercept[IllegalArgumentException](
      lake.addNestedColumn("s", "ref", Seq("s"),
        org.apache.spark.sql.types.StructField("z",
          org.apache.spark.sql.types.StringType, nullable = false)))
    assert(e.getMessage.contains("nullable"), e.getMessage)
    fails(s"ALTER TABLE $t RENAME COLUMN s.a TO b", "top-level")
    fails(s"ALTER TABLE $t DROP COLUMN s.a", "top-level")
  }

  test("nested evolution through the DECLARED-SCHEMA path (A12): " +
    "ensureTable widens the struct, and an OLD-shape append null-fills") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val narrow = StructType(Seq(StructField("id", LongType),
      StructField("s", StructType(Seq(StructField("a", LongType))))))
    val wide = StructType(Seq(StructField("id", LongType),
      StructField("s", StructType(Seq(StructField("a", LongType),
        StructField("x", StringType))))))
    lake.ensureTable("s", "decl", narrow)
    val r1 = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(1L,
        org.apache.spark.sql.Row(10L))), narrow)
    lake.append("s", "decl", r1)
    // a stream now DECLARES the nested add: one metadata commit
    lake.ensureTable("s", "decl", wide)
    assert(spark.table(s"$cat.s.decl").schema("s").dataType
      .simpleString == "struct<a:bigint,x:string>")
    // an old-shape frame still appends (conform null-fills by name)
    val r2 = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(2L,
        org.apache.spark.sql.Row(20L))), narrow)
    lake.append("s", "decl", r2)
    val r3 = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(3L,
        org.apache.spark.sql.Row(30L, "new"))), wide)
    lake.append("s", "decl", r3)
    val got = spark.sql(s"SELECT id, s.a, s.x FROM $cat.s.decl " +
      "ORDER BY id").collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) "-" else r.getString(2))).toSeq
    assert(got == Seq((1L, 10L, "-"), (2L, 20L, "-"), (3L, 30L, "new")),
      got.toString)
  }

  test("MERGE WITH SCHEMA EVOLUTION carries a nested source field " +
    "through the evolution rule") {
    val t = s"$cat.s.mev"
    spark.sql(s"CREATE TABLE $t (id BIGINT, s STRUCT<a: BIGINT>)")
    spark.sql(s"INSERT INTO $t VALUES " +
      "(1, named_struct('a', CAST(1 AS BIGINT)))")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $t t USING (
         |  SELECT CAST(2 AS BIGINT) AS id,
         |         named_struct('a', CAST(2 AS BIGINT), 'x', 'nested') AS s
         |) s ON t.id = s.id
         |WHEN NOT MATCHED THEN INSERT *
         |""".stripMargin)
    val got = spark.sql(s"SELECT id, s.a, s.x FROM $t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) "-" else r.getString(2))).toSeq
    assert(got == Seq((1L, 1L, "-"), (2L, 2L, "nested")), got.toString)
  }

  test("the SESSION carrier evolves nested declares too (promotion " +
    "rewrite with by-name alignment)") {
    import org.apache.spark.sql.types._
    val sess = new graft.lake.SessionLakeCatalog(spark)
    val ns = s"nest_sess_${System.nanoTime()}"
    val narrow = StructType(Seq(StructField("id", LongType),
      StructField("s", StructType(Seq(StructField("a", LongType))))))
    val wide = StructType(Seq(StructField("id", LongType),
      StructField("s", StructType(Seq(StructField("a", LongType),
        StructField("x", DoubleType))))))
    sess.ensureTable(ns, "t", narrow)
    sess.append(ns, "t", spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(1L,
        org.apache.spark.sql.Row(10L))), narrow))
    sess.ensureTable(ns, "t", wide) // the locked rewrite path
    sess.append(ns, "t", spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(2L,
        org.apache.spark.sql.Row(20L, 2.5))), wide))
    val got = sess.load(ns, "t").orderBy("id").collect()
      .map { r =>
        val s = r.getStruct(1)
        (r.getLong(0), s.getLong(0),
          if (s.isNullAt(1)) -1.0 else s.getDouble(1))
      }.toSeq
    assert(got == Seq((1L, 10L, -1.0), (2L, 20L, 2.5)), got.toString)
    sess.dropNamespace(ns)
  }

  test("nested TYPE promotion (ALTER COLUMN s.a TYPE BIGINT): old " +
    "files keep the narrow physical type, reads cast up by name") {
    val t = s"$cat.s.promo"
    spark.sql(s"CREATE TABLE $t (id BIGINT, s STRUCT<a: INT, b: STRING>)")
    spark.sql(s"INSERT INTO $t VALUES (1, named_struct('a', 7, 'b', 'x'))")
    spark.sql(s"ALTER TABLE $t ALTER COLUMN s.a TYPE BIGINT")
    assert(spark.table(t).schema("s").dataType.simpleString ==
      "struct<a:bigint,b:string>")
    spark.sql(s"INSERT INTO $t VALUES " +
      "(2, named_struct('a', CAST(4000000000 AS BIGINT), 'b', 'y'))")
    val got = spark.sql(s"SELECT id, s.a, s.b FROM $t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSeq
    assert(got == Seq((1L, 7L, "x"), (2L, 4000000000L, "y")),
      got.toString)
    // narrowing refuses loudly — Spark's own analyzer rejects it
    // before our face; a drift-class change (string) reaches the face's
    // promotion-lattice refusal instead
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE $t ALTER COLUMN s.a TYPE INT"))
    def walk(t0: Throwable, needle: String): Boolean = t0 != null &&
      (Option(t0.getMessage).exists(_.contains(needle)) ||
        walk(t0.getCause, needle))
    assert(walk(e, "NOT_SUPPORTED_CHANGE_COLUMN"), e.toString)
    val e2 = intercept[Exception](lake.updateNestedColumnType(
      "s", "promo", Seq("s", "b"),
      org.apache.spark.sql.types.LongType))
    assert(walk(e2, "promotion"), e2.toString)
  }

  test("the evolved table stays fully operational: UPDATE, DELETE, " +
    "time travel, and compact fold the evolution away") {
    val t = s"$cat.s.ops"
    spark.sql(s"CREATE TABLE $t (id BIGINT, s STRUCT<a: BIGINT>)")
    spark.sql(s"INSERT INTO $t VALUES " +
      "(1, named_struct('a', CAST(1 AS BIGINT))), " +
      "(2, named_struct('a', CAST(2 AS BIGINT)))")
    val preId = spark.sql(s"SELECT max(snapshot_id) FROM $t.snapshots")
      .head().getLong(0)
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (s.x BIGINT)")
    spark.sql(s"UPDATE $t SET s = named_struct('a', s.a, " +
      "'x', CAST(99 AS BIGINT)) WHERE id = 1")
    spark.sql(s"DELETE FROM $t WHERE id = 2")
    val got = spark.sql(s"SELECT id, s.a, s.x FROM $t ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(got == Seq((1L, 1L, 99L)), got.toString)
    // time travel reads pre-evolution data (new field nulls)
    assert(spark.sql(
      s"SELECT count(*) FROM $t VERSION AS OF $preId").head().getLong(0)
      == 2L)
    // compact folds delete debt; the evolved read survives it
    lake.compact("s", "ops", 1)
    assert(spark.sql(s"SELECT id, s.x FROM $t").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 99L)))
  }
}
