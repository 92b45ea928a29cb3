package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions deployment route must resolve the native
  * functions without any imperative registration call.
  *
  * Extensions apply only when a session is BUILT, so this spec asserts only
  * when it gets to create the JVM's first session (and leaves it running —
  * stopping the shared SparkContext breaks every later suite; TestSpark's
  * getOrCreate then layers its runtime confs on top). When another suite won
  * the race the check is covered by the spark-submit drive in
  * `.claude/skills/verify` instead. */
class GraftExtensionsSpec extends AnyFunSuite {
  test("extensions-configured session resolves the injected functions") {
    assume(SparkSession.getActiveSession.isEmpty &&
      SparkSession.getDefaultSession.isEmpty,
      "a shared session already exists; extensions only apply at build time")
    val wh = java.nio.file.Files.createTempDirectory("graft-ext-wh").toString
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val r = s.sql(
      "SELECT size(shingle_minhash('a b c d')) AS n, token_simhash('x y') AS sh").head()
    assert(r.getAs[Int]("n") == graft.ops.Dedup.NumHashes)
    assert(!r.isNullAt(1))
    val r5 = s.sql("SELECT dhash64(encode('abcdef', 'UTF-8')) AS dh, " +
      "anchor_fingerprints('some text long enough for a window') AS af").head()
    assert(r5.getLong(0) ==
      graft.functions.DHash64.hash("abcdef".getBytes("UTF-8")))
    assert(!r5.isNullAt(1))
  }
}
