package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access for the driver's testdata star schema
  * (`/root/repo/TESTDATA.md`). Reads go through `spark.read.parquet` so
  * Catalyst's parquet scan gets predicate pushdown + column pruning for free.
  *
  * Timestamp note: `events.ts` is parquet TIMESTAMP(NANOS); Spark reads nanos
  * only via `spark.sql.legacy.parquet.nanosAsLong` or truncation depending on
  * version — [[Tables.events]] normalizes it to a microsecond TimestampType
  * column named `ts` either way, so every operator sees one shape.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Date/epoch queries must agree with the (UTC) DuckDB oracle regardless
    // of who built the session: pin the session timezone once if the host
    // harness left it on a machine-local default.
    if (!spark.conf.getOption("spark.sql.session.timeZone").contains("UTC"))
      spark.conf.set("spark.sql.session.timeZone", "UTC")
    // native text-hash expressions used by Dedup/TextOps (registered once)
    if (!spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("shingle_minhash")))
      graft.functions.TextHashExprs.register(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // Spark rejects parquet TIMESTAMP(NANOS) outright (PARQUET_TYPE_ILLEGAL);
    // the supported route is reading nanos as Long, then converting. The flag
    // is set at session build in Verify/Bench/TestSpark; this is a fallback
    // for externally-built sessions, applied only when absent so repeated
    // calls never flip an explicit setting.
    if (!s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }
}
