package graft.sql

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Branch/tag tables through SQL (`graft.ns.t.branch_x` / `.tag_v1`) +
  * the ref procedures: the full WRITE-AUDIT-PUBLISH loop in pure SQL —
  * stage with INSERT INTO the branch table, audit by reading it, publish
  * with CALL fast_forward or abandon with CALL drop_ref; tags pin
  * audited snapshots by name and refuse writes. */
class GraftBranchSqlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val cat: String = {
    val wh = Files.createTempDirectory("graft-branch-").toString
    spark.conf.set("spark.sql.catalog.gref", "graft.sql.GraftSqlCatalog")
    spark.conf.set("spark.sql.catalog.gref.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gref.s")
    "gref"
  }

  private def ids(t: String): Seq[Long] =
    spark.sql(s"SELECT id FROM $t ORDER BY id").collect()
      .map(_.getLong(0)).toSeq

  test("WAP in pure SQL: INSERT INTO branch_ stages (readers see " +
    "nothing), branch read audits, CALL fast_forward publishes") {
    val t = s"$cat.s.wap"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'main')")
    // first staged INSERT births the branch off main's head
    spark.sql(s"INSERT INTO $t.branch_audit VALUES (2, 'staged')")
    spark.sql(s"INSERT INTO $t.branch_audit VALUES (3, 'staged')")
    assert(ids(t) == Seq(1L), "staging leaked into the published table")
    assert(ids(s"$t.branch_audit") == Seq(1L, 2L, 3L),
      "the staged read must see main's base plus both staged commits")
    spark.sql(s"CALL $cat.system.fast_forward('s.wap', 'audit')")
    assert(ids(t) == Seq(1L, 2L, 3L))
  }

  test("CALL create_tag pins a snapshot readable as tag_; tags refuse " +
    "writes; CALL drop_ref abandons a branch leaving main untouched") {
    val t = s"$cat.s.tags"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a')")
    val sid = spark.sql(s"SELECT max(snapshot_id) FROM $t.snapshots")
      .head().getLong(0)
    spark.sql(s"INSERT INTO $t VALUES (2, 'b')")
    spark.sql(s"CALL $cat.system.create_tag('s.tags', 'v1', $sid)")
    assert(ids(s"$t.tag_v1") == Seq(1L))
    assert(ids(t) == Seq(1L, 2L))
    val e = intercept[Exception](
      spark.sql(s"INSERT INTO $t.tag_v1 VALUES (9, 'x')"))
    def mentions(t0: Throwable, s: String): Boolean = t0 != null &&
      (Option(t0.getMessage).exists(_.contains(s)) ||
        mentions(t0.getCause, s))
    assert(mentions(e, "immutable"), e.toString)
    // abandon a staged branch: refs drop, main unchanged, staged dirs
    // become ordinary expiry debt
    spark.sql(s"INSERT INTO $t.branch_tmp VALUES (7, 'z')")
    spark.sql(s"CALL $cat.system.drop_ref('s.tags', 'tmp')")
    assert(ids(t) == Seq(1L, 2L))
    val e2 = intercept[Exception](ids(s"$t.branch_tmp"))
    assert(mentions(e2, "no ref"), e2.toString)
  }

  test("INSERT OVERWRITE a branch refuses (not a WAP shape); ref reads " +
    "track the ref as it moves") {
    val t = s"$cat.s.mv"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a')")
    spark.sql(s"INSERT INTO $t.branch_b VALUES (2, 'b')")
    // refused at ANALYSIS: the branch table carries no TRUNCATE
    // capability, so Spark itself rejects the overwrite (the V1 insert
    // callback's WAP-shape require is defense-in-depth behind this)
    val e = intercept[Exception](
      spark.sql(s"INSERT OVERWRITE $t.branch_b VALUES (9, 'x')"))
    def mentions(t0: Throwable): Boolean = t0 != null &&
      (Option(t0.getMessage).exists(m => m.contains("WAP") ||
        m.contains("does not support truncate")) ||
        mentions(t0.getCause))
    assert(mentions(e), e.toString)
    // a second staged append moves the branch; the next read sees it
    spark.sql(s"INSERT INTO $t.branch_b VALUES (3, 'c')")
    assert(ids(s"$t.branch_b") == Seq(1L, 2L, 3L))
  }
}
