package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Session-conf contract of the table readers: the library pins what it
  * needs only where UNSET — an explicit user setting is never flipped, even
  * when respecting it makes a read fail loudly. */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("explicit session conf survives table reads — never flipped") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    s2.conf.set("spark.sql.session.timeZone", "America/New_York")
    assert(Tables.t(s2, sf, "nation").count() > 0)
    assert(s2.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "false")
    assert(s2.conf.get("spark.sql.session.timeZone") == "America/New_York")
    // respecting the explicit nanosAsLong=false means the NANOS-typed events
    // table fails loudly instead of being silently read under a flipped conf
    val e = intercept[Exception](Tables.events(s2, sf).collect())
    assert(e.getMessage.toLowerCase.contains("parquet"), e.getMessage)
    assert(s2.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "false")
  }

  test("reads work under an externally-built session (conf pinned when unset)") {
    val s3 = spark.newSession()
    // TestSpark's builder conf reached the shared SparkConf, so this session
    // inherits UTC/nanosAsLong; prepareSession must keep reads working and
    // register the native functions either way
    assert(Tables.events(s3, sf).count() > 0)
    assert(s3.conf.get("spark.sql.session.timeZone") == "UTC")
    assert(Tables.documents(s3, sf)
      .selectExpr("shingle_minhash(text)").count() > 0)
  }
}
