package graft.xform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Per-stream declarative transforms — the Spark-native equivalent of the
  * Singer SDK "stream maps" capability the reference declares
  * (`/root/reference/meltano.yml:14`): rename/drop/derive columns, filter
  * rows, alias the target stream. Expressions are Spark SQL (`expr`), the
  * analog of the SDK's inline expression language; everything stays inside
  * Catalyst (codegen, pushdown through the map when possible).
  *
  * Config shape mirrors the SDK's public semantics:
  *   - `columns(name) = None`          -> drop the column
  *   - `columns(name) = Some("expr")`  -> add/replace with a SQL expression
  *     (a bare column reference is a rename-with-copy; pair with a drop of
  *     the source for a pure rename)
  *   - `filter = Some("predicate")`    -> keep only matching rows
  *   - `alias = Some("other_name")`    -> load into a different table name
  */
final case class StreamMapConfig(
    columns: Map[String, Option[String]] = Map.empty,
    filter: Option[String] = None,
    alias: Option[String] = None)

object StreamMaps {
  /** Apply filter -> derives -> drops (derives may reference the dropped
    * source columns, matching SDK evaluation order). */
  def apply(df: DataFrame, cfg: StreamMapConfig): DataFrame = {
    val filtered = cfg.filter.fold(df)(f => df.filter(expr(f)))
    val derived = cfg.columns.toSeq.sortBy(_._1).collect {
      case (c, Some(e)) => c -> e
    }.foldLeft(filtered) { case (d, (c, e)) => d.withColumn(c, expr(e)) }
    val drops = cfg.columns.collect { case (c, None) => c }.toSeq
    if (drops.isEmpty) derived else derived.drop(drops: _*)
  }

  /** Record flattening (`meltano.yml:15`): nested struct fields become
    * top-level `parent__child` columns down to `maxDepth`; structs still
    * nested at the depth limit are serialized to JSON strings (the SDK's
    * behavior for over-deep objects). Pure projection — no shuffle. */
  def flatten(df: DataFrame, maxDepth: Int, sep: String = "__"): DataFrame = {
    def cols(schema: StructType, prefix: Seq[String], depth: Int)
        : Seq[org.apache.spark.sql.Column] =
      schema.fields.toSeq.flatMap { f =>
        val path = prefix :+ f.name
        val ref = col(path.map(p => s"`$p`").mkString("."))
        val name = path.mkString(sep)
        f.dataType match {
          case st: StructType if depth < maxDepth => cols(st, path, depth + 1)
          case _: StructType => Seq(to_json(ref).as(name))
          case _ => Seq(ref.as(name))
        }
      }
    df.select(cols(df.schema, Nil, 0): _*)
  }
}
