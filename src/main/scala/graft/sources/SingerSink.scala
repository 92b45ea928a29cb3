package graft.sources

import com.fasterxml.jackson.core.JsonFactory
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, DateTimeUtils}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types._

/** Batch write support for the Singer source: `df.write.format("singer")
  * .option("stream", "users").save(dir)` emits Singer JSONL — each task
  * writes one part file beginning with the stream's SCHEMA message (the
  * Singer contract: schema precedes records in every feed) followed by one
  * RECORD line per row. The output of this sink is a valid input to the
  * [[SingerDataSource]] batch/streaming reader AND to the reference's
  * target CLI — the engine can round-trip the wire format in both
  * directions.
  *
  * Scale shape: embarrassingly parallel — one writer per partition, no
  * coordination beyond the commit handshake; `SaveMode.Overwrite` truncates
  * the directory driver-side before launching tasks (document: non-atomic,
  * like every direct-to-directory file sink without a commit protocol).
  */
private[sources] class SingerWriteBuilder(info: LogicalWriteInfo,
                                          options: Map[String, String])
    extends WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      val path = options.getOrElse("path",
        throw new IllegalArgumentException("singer sink requires a path"))
      val stream = options.getOrElse("stream", "data")
      new SingerBatchWrite(path, stream, info.schema(),
        info.queryId(), doTruncate,
        options.get("batch_config").map(BatchWriteConfig.parse(_, path)))
    }
  }
}

/** SDK batch write mode (`batch_config` setting, same JSON shape as
  * singer-sdk's: `{"encoding":{"format":"jsonl","compression":"gzip"},
  * "storage":{"root":"<dir>"}}`). When set, the sink emits BATCH
  * file-reference messages instead of inline RECORDs: records land as bare
  * JSONL (optionally gzip) part files under the storage root, and the feed
  * carries SCHEMA + one BATCH message per partition whose manifest names
  * the part — the shape [[graft.singer.SingerMessage.Batch]] and the
  * BatchLoader expansion read back. */
private[sources] final case class BatchWriteConfig(compression: String,
                                                   root: String) {
  require(compression == "gzip" || compression == "none",
    s"batch_config compression must be gzip or none, got '$compression'")
}

private[sources] object BatchWriteConfig {
  def parse(json: String, sinkPath: String): BatchWriteConfig = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val enc = Option(node.get("encoding"))
    val fmt = enc.flatMap(e => Option(e.get("format")).map(_.asText()))
      .getOrElse("jsonl")
    require(fmt == "jsonl",
      s"batch_config format must be jsonl, got '$fmt'")
    BatchWriteConfig(
      enc.flatMap(e => Option(e.get("compression")).map(_.asText()))
        .getOrElse("gzip"),
      Option(node.get("storage"))
        .flatMap(s => Option(s.get("root")).map(_.asText()))
        .getOrElse(new Path(sinkPath, "batches").toString))
  }
}

private[sources] class SingerBatchWrite(path: String, stream: String,
                                        schema: StructType, queryId: String,
                                        truncate: Boolean,
                                        batchConfig: Option[BatchWriteConfig])
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(SingerSourceUtil.hadoopConf())
    if (truncate && fs.exists(dir))
      fs.listStatus(dir).foreach(st => fs.delete(st.getPath, true))
    fs.mkdirs(dir)
    batchConfig.foreach(bc => fs.mkdirs(new Path(bc.root)))
    SingerWriterFactory(path, stream, schema, queryId, batchConfig)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] case class SingerWriterFactory(path: String, stream: String,
                                                schema: StructType,
                                                queryId: String,
                                                batchConfig: Option[BatchWriteConfig])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val feed = new Path(path, f"part-$partitionId%05d-$queryId.jsonl")
    batchConfig match {
      case Some(bc) =>
        new SingerBatchModeWriter(feed, taskId, stream, schema, bc,
          partitionId, queryId)
      case None => new SingerDataWriter(feed, taskId, stream, schema)
    }
  }
}

/** Writes to an ATTEMPT-UNIQUE hidden temp file (taskId in the name; the
  * reader's listing skips dot-files) and renames to the canonical part
  * name on commit — so a speculative or retried attempt never interleaves
  * with the winner's output, and a losing attempt's abort deletes only its
  * OWN temp, never a committed file. Spark's commit coordinator authorizes
  * exactly one attempt per partition to commit. */
private[sources] class SingerDataWriter(file: Path, taskId: Long,
                                        stream: String, schema: StructType)
    extends DataWriter[InternalRow] {
  private val tmp = new Path(file.getParent, s".${file.getName}.$taskId.tmp")
  private val fs = file.getFileSystem(new Configuration())
  private val writer = new java.io.BufferedWriter(
    new java.io.OutputStreamWriter(fs.create(tmp, true),
      java.nio.charset.StandardCharsets.UTF_8))
  // every part file is a self-contained Singer feed: SCHEMA first
  writer.write(
    s"""{"type":"SCHEMA","stream":${SingerJson.str(stream)},"schema":${SingerJson.schemaJson(schema)}}""")
  writer.newLine()
  // the message envelope is constant per writer — escape the stream once,
  // not per row
  private val recordPrefix =
    s"""{"type":"RECORD","stream":${SingerJson.str(stream)},"record":"""

  override def write(row: InternalRow): Unit = {
    writer.write(recordPrefix)
    writer.write(SingerJson.rowJson(row, schema))
    writer.write("}")
    writer.newLine()
  }

  override def commit(): WriterCommitMessage = {
    writer.close()
    fs.delete(file, false) // a leftover from a dead earlier job, not an attempt
    if (!fs.rename(tmp, file))
      throw new java.io.IOException(s"singer sink: rename $tmp -> $file failed")
    new WriterCommitMessage {}
  }

  override def abort(): Unit = {
    try writer.close() catch { case _: Exception => () }
    try fs.delete(tmp, false) catch { case _: Exception => () }
  }

  override def close(): Unit =
    try writer.close() catch { case _: Exception => () }
}

/** Batch write mode: records go to a bare-JSONL part file (gzip per
  * [[BatchWriteConfig.compression]]) under the batch storage root; the feed
  * part carries SCHEMA + ONE BATCH message whose manifest names the part —
  * singer-sdk's `batch_config` wire behavior. Same attempt-unique
  * temp-then-rename discipline as the inline writer, with commit ORDER
  * making the reference safe: the records part renames first, the feed
  * that points at it second, so a visible feed never names a missing
  * part. An empty partition still commits (its part decodes to zero
  * records — valid). Throughput is the point at scale: the feed is O(1)
  * lines per partition and the record stream is compressed bulk bytes the
  * downstream target can route without re-parsing the envelope. */
private[sources] class SingerBatchModeWriter(feed: Path, taskId: Long,
                                             stream: String, schema: StructType,
                                             bc: BatchWriteConfig,
                                             partitionId: Int, queryId: String)
    extends DataWriter[InternalRow] {
  private val ext = if (bc.compression == "gzip") ".jsonl.gz" else ".jsonl"
  private val part = new Path(bc.root,
    f"$stream-$partitionId%05d-$queryId$ext")
  private val fs = feed.getFileSystem(new Configuration())
  private val feedTmp = new Path(feed.getParent, s".${feed.getName}.$taskId.tmp")
  private val partTmp = new Path(part.getParent, s".${part.getName}.$taskId.tmp")
  private val partWriter = {
    val raw: java.io.OutputStream = fs.create(partTmp, true)
    val out = if (bc.compression == "gzip")
      new java.util.zip.GZIPOutputStream(raw) else raw
    new java.io.BufferedWriter(new java.io.OutputStreamWriter(out,
      java.nio.charset.StandardCharsets.UTF_8))
  }

  override def write(row: InternalRow): Unit = {
    // bare record object per line — the SDK JSONL batch layout (no envelope)
    partWriter.write(SingerJson.rowJson(row, schema))
    partWriter.newLine()
  }

  override def commit(): WriterCommitMessage = {
    partWriter.close()
    fs.delete(part, false)
    if (!fs.rename(partTmp, part))
      throw new java.io.IOException(s"singer sink: rename $partTmp -> $part failed")
    val manifestEntry = fs.makeQualified(part).toString
    val w = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      fs.create(feedTmp, true), java.nio.charset.StandardCharsets.UTF_8))
    try {
      w.write(s"""{"type":"SCHEMA","stream":${SingerJson.str(stream)},"schema":${SingerJson.schemaJson(schema)}}""")
      w.newLine()
      w.write(s"""{"type":"BATCH","stream":${SingerJson.str(stream)},"encoding":{"format":"jsonl","compression":"${bc.compression}"},"manifest":[${SingerJson.str(manifestEntry)}]}""")
      w.newLine()
    } finally w.close()
    fs.delete(feed, false)
    if (!fs.rename(feedTmp, feed))
      throw new java.io.IOException(s"singer sink: rename $feedTmp -> $feed failed")
    new WriterCommitMessage {}
  }

  override def abort(): Unit = {
    try partWriter.close() catch { case _: Exception => () }
    try fs.delete(partTmp, false) catch { case _: Exception => () }
    try fs.delete(feedTmp, false) catch { case _: Exception => () }
  }

  override def close(): Unit =
    try partWriter.close() catch { case _: Exception => () }
}

/** StructType -> Singer JSON Schema (the inverse of
  * [[graft.singer.SchemaConv]]) and InternalRow -> Singer record JSON.
  * Date/timestamp render ISO-8601 (`format: date` / `date-time`) so the
  * declared formats parse back to the same Catalyst types on read. */
private[sources] object SingerJson {
  private val jsonFactory = new JsonFactory()

  def str(s: String): String = {
    val w = new java.io.StringWriter()
    val g = jsonFactory.createGenerator(w)
    g.writeString(s); g.close()
    w.toString
  }

  def schemaJson(st: StructType): String = {
    val props = st.fields.map { f =>
      // a micros-long carrying the singer:format=time provenance tag
      // ([[graft.singer.SchemaConv.SingerFormatKey]]) re-emits the Singer
      // shape it came from — the type name survives the round-trip
      val fs =
        if (graft.singer.SchemaConv.isTimeField(f)) {
          val ty = if (f.nullable) """["string","null"]""" else "\"string\""
          s"""{"type":$ty,"format":"time"}"""
        } else if (graft.singer.SchemaConv.isDecimalStringField(f)) {
          // string-borne singer.decimal re-emits the string shape it came
          // from (values as quoted plain strings, see appendRow)
          val d = f.dataType.asInstanceOf[DecimalType]
          val ty = if (f.nullable) """["string","null"]""" else "\"string\""
          s"""{"type":$ty,"format":"singer.decimal",""" +
            s""""precision":${d.precision},"scale":${d.scale}}"""
        } else fieldSchema(f.dataType, f.nullable)
      str(f.name) + ":" + fs
    }.mkString(",")
    s"""{"type":"object","properties":{$props}}"""
  }

  private def fieldSchema(dt: DataType, nullable: Boolean): String = {
    def typed(t: String, format: Option[String] = None): String = {
      val ty = if (nullable) s"""["$t","null"]""" else s""""$t""""
      format.map(f => s"""{"type":$ty,"format":"$f"}""")
        .getOrElse(s"""{"type":$ty}""")
    }
    dt match {
      case LongType | IntegerType | ShortType | ByteType => typed("integer")
      case DoubleType | FloatType => typed("number")
      case d: DecimalType =>
        // number-borne exact decimal: format + precision/scale round-trip
        // the exact DecimalType through SchemaConv; multipleOf carries the
        // scale for classic singer-python consumers
        val ty = if (nullable) """["number","null"]""" else "\"number\""
        val step = java.math.BigDecimal.valueOf(1L, d.scale).toPlainString
        s"""{"type":$ty,"format":"singer.decimal",""" +
          s""""precision":${d.precision},"scale":${d.scale},""" +
          s""""multipleOf":$step}"""
      case BooleanType            => typed("boolean")
      case StringType             => typed("string")
      case DateType               => typed("string", Some("date"))
      case TimestampType          => typed("string", Some("date-time"))
      case ArrayType(et, en) =>
        val ty = if (nullable) s"""["array","null"]""" else s""""array""""
        s"""{"type":$ty,"items":${fieldSchema(et, en)}}"""
      case MapType(StringType, vt, vn) =>
        // JSON Schema's map shape: no fixed properties, a value schema
        // under additionalProperties (SchemaConv round-trips it)
        val ty = if (nullable) s"""["object","null"]""" else s""""object""""
        s"""{"type":$ty,"additionalProperties":${fieldSchema(vt, vn)}}"""
      case st: StructType =>
        val props = st.fields.map(f =>
          str(f.name) + ":" + fieldSchema(f.dataType, f.nullable)).mkString(",")
        val ty = if (nullable) s"""["object","null"]""" else s""""object""""
        s"""{"type":$ty,"properties":{$props}}"""
      case other =>
        throw new IllegalArgumentException(
          s"singer sink cannot encode ${other.catalogString}")
    }
  }

  def rowJson(row: InternalRow, schema: StructType): String = {
    val sb = new java.lang.StringBuilder(64)
    appendRow(sb, row, schema)
    sb.toString
  }

  private def appendRow(sb: java.lang.StringBuilder, row: InternalRow,
                        schema: StructType): Unit = {
    sb.append('{')
    var first = true
    var i = 0
    while (i < schema.length) {
      val f = schema(i)
      if (!row.isNullAt(i)) {
        if (!first) sb.append(',')
        first = false
        sb.append(str(f.name)).append(':')
        if (graft.singer.SchemaConv.isTimeField(f))
          // the declared format is time -> the value must be a time string
          sb.append('"')
            .append(graft.singer.SchemaConv.microsToTimeString(row.getLong(i)))
            .append('"')
        else if (graft.singer.SchemaConv.isDecimalStringField(f)) {
          // string-borne decimal: quoted plain string (no exponent — it
          // must re-parse exactly on any consumer)
          val d = f.dataType.asInstanceOf[DecimalType]
          sb.append('"')
            .append(row.getDecimal(i, d.precision, d.scale)
              .toJavaBigDecimal.toPlainString)
            .append('"')
        } else appendValue(sb, row, i, f.dataType)
      }
      i += 1
    }
    sb.append('}')
  }

  private def appendValue(sb: java.lang.StringBuilder,
                          get: org.apache.spark.sql.catalyst.expressions.SpecializedGetters,
                          i: Int, dt: DataType): Unit = dt match {
    case LongType    => sb.append(get.getLong(i))
    case IntegerType => sb.append(get.getInt(i))
    case ShortType   => sb.append(get.getShort(i).toInt)
    case ByteType    => sb.append(get.getByte(i).toInt)
    // NaN/Infinity are not JSON — emit null rather than corrupt the line
    case DoubleType =>
      val v = get.getDouble(i)
      if (java.lang.Double.isFinite(v)) sb.append(v) else sb.append("null")
    case FloatType =>
      val v = get.getFloat(i).toDouble
      if (java.lang.Double.isFinite(v)) sb.append(v) else sb.append("null")
    case BooleanType => sb.append(get.getBoolean(i))
    case d: DecimalType =>
      // decimals are always finite; plain string keeps the exact value
      sb.append(get.getDecimal(i, d.precision, d.scale)
        .toJavaBigDecimal.toPlainString)
    case StringType  => sb.append(str(get.getUTF8String(i).toString))
    case DateType =>
      sb.append('"')
        .append(java.time.LocalDate.ofEpochDay(get.getInt(i).toLong))
        .append('"')
    case TimestampType =>
      sb.append('"')
        .append(DateTimeUtils.microsToInstant(get.getLong(i)))
        .append('"')
    case at: ArrayType =>
      val arr: ArrayData = get.getArray(i)
      sb.append('[')
      var j = 0
      while (j < arr.numElements()) {
        if (j > 0) sb.append(',')
        if (arr.isNullAt(j)) sb.append("null")
        else appendValue(sb, arr, j, at.elementType)
        j += 1
      }
      sb.append(']')
    case mt @ MapType(StringType, vt, _) =>
      val m = get.getMap(i)
      val keys = m.keyArray(); val vals = m.valueArray()
      sb.append('{')
      var j = 0
      while (j < m.numElements()) {
        if (j > 0) sb.append(',')
        sb.append(str(keys.getUTF8String(j).toString)).append(':')
        if (vals.isNullAt(j)) sb.append("null")
        else appendValue(sb, vals, j, vt)
        j += 1
      }
      sb.append('}')
    case st: StructType =>
      appendRow(sb, get.getStruct(i, st.length), st)
    case other =>
      throw new IllegalArgumentException(
        s"singer sink cannot encode ${other.catalogString}")
  }
}
