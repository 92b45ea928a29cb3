package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query registries live with their operator families (graft.ops.*); this
  * object is the flat aggregation the driver harness consumes. */
object SparkEntry {
  private def allRegistries
      : Map[String, ((SparkSession, String) => DataFrame, String)] =
    ops.Relational.registry ++ ops.Dedup.registry ++ ops.Similarity.registry ++
      ops.TextOps.registry ++ ops.Multimodal.registry ++
      ops.Streaming.registry ++ ops.Skew.registry ++ ops.SqlFace.registry

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allRegistries.map { case (k, (fn, _)) => k -> fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (driver then records a weaker rows-only check). */
  def oracleSql: Map[String, String] =
    allRegistries.collect { case (k, (_, sql)) if sql.trim.nonEmpty =>
      k -> sql.trim.stripMargin
    }
}
