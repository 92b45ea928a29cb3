package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Session-conf contract of the table readers: the library pins what it
  * needs only where UNSET — an explicit user setting is never flipped.
  * (The loud-failure corollary — an explicit `nanosAsLong=false` making a
  * NANOS-typed events read throw — only applies to the rounds-1-5 NANOS
  * testdata layout; under the round-6+ MICROS layout the read succeeds and
  * the contract is observable purely as conf survival.) */
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
    // respecting explicit settings means the events read runs under them
    // verbatim: a NANOS-layout file throws PARQUET_TYPE_ILLEGAL (nanosAsLong
    // respected as false), a MICROS-layout file simply reads — either way
    // the explicit conf must come back untouched
    val attempt = scala.util.Try(Tables.events(s2, sf).count())
    attempt.fold(
      e => assert(e.getMessage.toLowerCase.contains("parquet"), e.getMessage),
      n => assert(n > 0))
    assert(s2.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "false")
    assert(s2.conf.get("spark.sql.session.timeZone") == "America/New_York")
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

  test("events.ts normalizes to TimestampType under every driver layout") {
    val df = Tables.events(spark, sf)
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(df.count() > 0)
  }
}
