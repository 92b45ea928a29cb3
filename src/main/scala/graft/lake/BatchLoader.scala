package graft.lake

import graft.singer.{SchemaConv, SingerMessage}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The Singer load path: JSONL message feed -> typed, batched, append-only
  * table commits — the Spark-native equivalent of the reference's
  * `Target`/`BatchSink` lifecycle (SURVEY.md §3.1):
  *
  *   SCHEMA -> declare stream schema ([[SchemaConv]]);
  *   RECORD -> validated typed rows (`from_json` under the declared schema);
  *   batch drain every `batchSize` records (reference `max_size = 10000`,
  *   `/root/reference/target_iceberg/sinks.py:18`);
  *   STATE  -> echoed only after pending appends are durable.
  *
  * Two batching modes:
  *   - '''scale mode''' (default): ONE append per stream with
  *     `maxRecordsPerFile = batchSize` — same bounded-batch file layout, one
  *     snapshot commit, no per-batch driver loop; this is the 100 TB path.
  *   - '''strict mode''': one append per `batchSize` slice in input order,
  *     faithfully reproducing the reference's per-batch commit cadence
  *     (sinks.py:36-100) for protocol-fidelity tests. O(rows/batchSize)
  *     Spark jobs — test-scale only, never the production path.
  */
final class BatchLoader(
    spark: SparkSession,
    catalog: LakeCatalog,
    namespace: String,
    batchSize: Int = BatchLoader.DefaultBatchSize,
    addRecordMetadata: Boolean = false,
    strictBatches: Boolean = false) extends Serializable {

  import BatchLoader._

  /** Decode a JSONL feed and load every stream it declares.
    * Returns the per-stream row counts and the STATE payloads to echo,
    * in input order (only valid to emit now that appends are durable). */
  def load(lines: Dataset[String]): LoadReport = {
    import spark.implicits._
    val msgs: Dataset[RawMsg] = spark.createDataset(
      lines.rdd.zipWithIndex().mapPartitions(_.flatMap { case (line, seq) =>
        SingerMessage.decode(line).map {
          case SingerMessage.Schema(s, js, kp) => RawMsg("SCHEMA", s, js, kp, seq)
          case SingerMessage.Record(s, r)      => RawMsg("RECORD", s, r, Nil, seq)
          case SingerMessage.State(v)          => RawMsg("STATE", "", v, Nil, seq)
          case SingerMessage.ActivateVersion(s, v) =>
            RawMsg("ACTIVATE_VERSION", s, v.toString, Nil, seq)
        }
      }))

    // Control-plane messages are rare by construction (one SCHEMA per stream,
    // occasional STATE) — driver-side collect is bounded and correct at scale.
    val control = msgs.filter($"mtype" =!= "RECORD").collect().sortBy(_.seq)
    val schemas: Map[String, (StructType, Seq[String])] =
      control.collect { case RawMsg("SCHEMA", s, js, kp, _) =>
        s -> ((SchemaConv.toStructType(js), kp))
      }.toMap // last SCHEMA per stream wins, matching SDK sink replacement

    val records = msgs.filter($"mtype" === "RECORD").cache()
    try {
      val counts = schemas.map { case (stream, (schema, _)) =>
        val streamRecs = records.filter($"stream" === stream)
        val rows = typedRows(streamRecs, schema)
        catalog.ensureTable(namespace, stream, rows.drop("seq").schema)
        val n =
          if (strictBatches) appendStrict(stream, rows)
          else appendScale(stream, rows)
        stream -> n
      }
      val states = control.collect { case RawMsg("STATE", _, v, _, _) => v }.toSeq
      LoadReport(counts, states)
    } finally records.unpersist()
  }

  /** RECORD payloads -> typed rows under the declared schema. Invalid rows
    * (schema mismatch / corrupt JSON) are dropped, mirroring SDK record
    * validation (SURVEY.md §2.B2); `_sdc_*` metadata columns appended when
    * `addRecordMetadata` (reference config `target.py:16`, SDK behavior B5). */
  private def typedRows(recs: Dataset[RawMsg], schema: StructType): DataFrame = {
    val parsed = recs
      .select(col("seq"), from_json(col("payload"), schema).as("r"))
      .filter(col("r").isNotNull)
    val base = parsed.select((schema.fieldNames.map(f => col(s"r.`$f`")) :+ col("seq")): _*)
    val withMeta =
      if (!addRecordMetadata) base
      else base
        .withColumn("_sdc_received_at", current_timestamp())
        .withColumn("_sdc_batched_at", current_timestamp())
        .withColumn("_sdc_sequence", col("seq"))
    withMeta
  }

  private def appendScale(stream: String, rows: DataFrame): Long = {
    val data = rows.drop("seq")
    val n = data.count()
    data.write.option("maxRecordsPerFile", batchSize.toLong)
      .format("parquet").mode("append").saveAsTable(s"$namespace.$stream")
    n
  }

  private def appendStrict(stream: String, rows: DataFrame): Long = {
    // row_number over global input order: single-partition window — strict
    // mode is protocol-fidelity testing only (see class doc).
    val w = Window.orderBy("seq")
    val sliced = rows
      .withColumn("__batch", ((row_number().over(w) - 1) / batchSize).cast("long"))
      .cache()
    try {
      val batchIds = sliced.select("__batch").distinct()
        .collect().map(_.getLong(0)).sorted
      var total = 0L
      batchIds.foreach { b =>
        val slice = sliced.filter(col("__batch") === b).drop("__batch", "seq")
        catalog.append(namespace, stream, slice)
        total += slice.count()
      }
      total
    } finally sliced.unpersist()
  }
}

object BatchLoader {
  /** Reference batch-drain size (`sinks.py:18`). */
  val DefaultBatchSize = 10000

  private[lake] final case class RawMsg(
      mtype: String, stream: String, payload: String,
      keyProps: Seq[String], seq: Long)

  final case class LoadReport(rowsPerStream: Map[String, Long],
                              statesToEcho: Seq[String])
}
