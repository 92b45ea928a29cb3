package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.singer.{SchemaConv, SingerMessage}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.mapreduce.lib.input.{FileSplit, LineRecordReader}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import scala.jdk.CollectionConverters._

/** DataSourceV2 batch source for Singer JSONL files:
  * `spark.read.format("singer").option("stream", "users").load(path)`.
  *
  * The reference's only source is the Singer stdin pipe consumed by the SDK
  * `Target` CLI (`/root/reference/target_iceberg/target.py:64-65`); this is
  * the same wire format surfaced the Spark-idiomatic way — as a table the
  * whole query engine composes over (joins, aggregates, predicate-bearing
  * scans), not just a load path.
  *
  * Engine integration, designed for the 100 TB case:
  *   - '''Schema from the stream's own SCHEMA message''' (same
  *     [[graft.singer.SchemaConv]] walk as the load path) — inference reads
  *     each file only until the declaration, never the data body.
  *   - '''Byte-range splits''': files split at
  *     `spark.sql.files.maxPartitionBytes` granularity and line boundaries
  *     are healed per split by Hadoop's `LineRecordReader` (the
  *     TextInputFormat contract: a split consumes the line that starts in
  *     it, skips the partial head line unless it starts at offset 0) — a
  *     single giant tap dump parallelizes across the cluster instead of
  *     pinning one task per file.
  *   - '''Column pruning pushdown''' ([[SupportsPushDownRequiredColumns]]):
  *     `SELECT a, b` materializes ONLY fields a and b out of each record's
  *     JSON — unrequested fields are never converted (visible as the
  *     narrowed ReadSchema in `.explain`).
  *
  * Field typing follows the source contract of Spark's own JSON reader:
  * a field whose JSON value does not match the declared type reads as NULL
  * (the query surface must stay total); the LOAD path ([[graft.lake
  * .BatchLoader]]) layers strict per-record validation with reject counts
  * on top — SURVEY §2.B2's two-tier story.
  */
class SingerDataSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "singer"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SingerSourceUtil.inferSchema(options)

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    // force-nullable like Spark's own file sources: any record can omit or
    // mistype any field, and a non-nullable column whose reader emits null
    // silently decodes as 0/epoch garbage under codegen
    new SingerTable(SingerSourceUtil.forceNullable(schema),
      new CaseInsensitiveStringMap(properties))
}

private[graft] object SingerSourceUtil {
  /** Recursive nullable-forcing (StructType.asNullable is private[spark]). */
  def forceNullable(st: StructType): StructType =
    StructType(st.fields.map { f =>
      f.copy(nullable = true, dataType = f.dataType match {
        case s: StructType => forceNullable(s)
        case ArrayType(s: StructType, _) => ArrayType(forceNullable(s), true)
        case ArrayType(et, _) => ArrayType(et, containsNull = true)
        case other => other
      })
    })

  /** Resolve the path/glob options to data-file statuses — ONE metadata
    * round per file (the status carries the length callers need; no
    * re-stat). */
  def listFiles(options: CaseInsensitiveStringMap): Seq[org.apache.hadoop.fs.FileStatus] = {
    val raw = Option(options.get("paths"))
      .map(p => new ObjectMapper().readTree(p).elements().asScala
        .map(_.asText()).toSeq)
      .orElse(Option(options.get("path")).map(Seq(_)))
      .getOrElse(throw new IllegalArgumentException(
        "singer source requires a path"))
    listFiles(raw, hadoopConf())
  }

  /** Path/dir/glob strings -> data-file statuses (shared with the load
    * path's [[graft.lake.BatchLoader.loadPaths]], which needs the same
    * listing discipline outside a DSv2 scan). */
  def listFiles(raw: Seq[String],
                conf: Configuration): Seq[org.apache.hadoop.fs.FileStatus] =
    raw.flatMap { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      val matches = Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Seq.empty)
      matches.flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile)
        else Seq(st)
      }
        // the standard file-source convention: _metadata/.crc etc. are not data
        .filterNot(st => st.getPath.getName.startsWith("_") ||
          st.getPath.getName.startsWith("."))
    }

  def paths(options: CaseInsensitiveStringMap): Seq[Path] =
    listFiles(options).map(_.getPath)

  /** Capped-admission boundary for a file span `[from, len)`: the largest
    * LINE-ALIGNED offset admitting at most `rowBudget` lines and (softly,
    * Spark's file-source convention — the straddling line is admitted) at
    * most `byteBudget` bytes; always at least one line when the span is
    * nonempty, so a cap smaller than one line still makes progress.
    * Returns (boundary, linesCounted). The bytes-only fast path seeks
    * straight to the cap and scans only to the next newline — it never
    * reads the admitted span, and reports 0 lines (its callers only
    * track a row budget when a row cap exists). Driver-side I/O bounded
    * by the CAP, never the backlog. */
  def admitSpan(path: String, from: Long, len: Long,
                rowBudget: Long, byteBudget: Long): (Long, Long) = {
    val p = new Path(path)
    val fs = p.getFileSystem(hadoopConf())
    if (rowBudget == Long.MaxValue) {
      if (byteBudget >= len - from) return (len, 0L)
      val in = fs.open(p)
      try {
        val target = from + math.max(byteBudget, 1L)
        in.seek(target)
        val lr = new org.apache.hadoop.util.LineReader(in)
        val n = lr.readLine(new Text())
        // Two documented over-admission edges (ADVICE r11), both benign
        // under the soft-byte-cap contract: (a) when the cap lands EXACTLY
        // on a line boundary, the seek sits at the start of the next line
        // and the readLine consumes that whole line — one full extra line
        // admitted, not just a straddling remainder; (b) the boundary is
        // clamped to the LISTED length `len` so a file that grew between
        // listFiles and this scan never yields an offset past what the
        // planning pass recorded (bytes appended after listing belong to
        // the next trigger's listing, keeping offsets ⊆ listings).
        (if (n == 0) len else math.min(len, target + n), 0L)
      } finally in.close()
    } else {
      val in = fs.open(p)
      try {
        in.seek(from)
        val lr = new org.apache.hadoop.util.LineReader(in)
        val t = new Text()
        var consumed = 0L
        var count = 0L
        var done = false
        while (!done && count < rowBudget && from + consumed < len) {
          val n = lr.readLine(t)
          if (n == 0) done = true
          else {
            consumed += n; count += 1
            if (consumed >= byteBudget) done = true
          }
        }
        // same listed-length clamp as the fast path (edge (b) above)
        (math.min(len, from + consumed), count)
      } finally in.close()
    }
  }

  /** The stream every reader must bind to: the explicit option, or — so
    * that ALL partitions agree — the stream whose SCHEMA message schema
    * inference would pick (the first one found). Resolved ONCE driver-side;
    * per-partition first-record binding would let different splits of a
    * multi-stream feed decode different streams against one schema. */
  def resolveStream(options: CaseInsensitiveStringMap): Option[String] =
    Option(options.get("stream")).orElse {
      val conf = hadoopConf()
      paths(options).iterator
        .flatMap(p => firstSchema(p, None, conf))
        .nextOption()
        .map(_._1)
    }

  def hadoopConf(): Configuration =
    SparkSession.active.sessionState.newHadoopConf()

  /** Read each file only until the target stream's SCHEMA message (Singer
    * taps emit it before any RECORD) — bounded by [[MaxInferBytes]] so a
    * malformed feed cannot turn inference into a full scan. */
  val MaxInferBytes: Long = 8L * 1024 * 1024

  def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val stream = Option(options.get("stream"))
    val conf = hadoopConf()
    paths(options).iterator
      .flatMap(p => firstSchema(p, stream, conf))
      .nextOption()
      .map { case (_, json) => SchemaConv.toStructType(json) }
      .getOrElse(throw new IllegalArgumentException(
        stream.map(s => s"no SCHEMA message for stream '$s' found")
          .getOrElse("no SCHEMA message found in input")))
  }

  private def firstSchema(p: Path, stream: Option[String],
                          conf: Configuration): Option[(String, String)] = {
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(
          org.apache.commons.io.input.BoundedInputStream.builder()
            .setInputStream(in).setMaxCount(MaxInferBytes).get(),
          java.nio.charset.StandardCharsets.UTF_8))
      Iterator.continually(reader.readLine()).takeWhile(_ != null)
        .flatMap(SingerMessage.decode)
        .collectFirst {
          case SingerMessage.Schema(s, json, _)
              if stream.forall(_ == s) => (s, json)
        }
    } finally in.close()
  }
}

private[sources] class SingerTable(schema: StructType,
                                   options: CaseInsensitiveStringMap)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String =
    "singer:" + Option(options.get("stream")).getOrElse("<first-stream>")
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new java.util.HashMap[String, String](options.asCaseSensitiveMap())
    merged.putAll(opts.asCaseSensitiveMap())
    new SingerScanBuilder(schema, new CaseInsensitiveStringMap(merged))
  }

  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    val merged = new java.util.HashMap[String, String](options.asCaseSensitiveMap())
    merged.putAll(info.options().asCaseSensitiveMap())
    new SingerWriteBuilder(info, merged.asScala.toMap.map {
      case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v })
  }
}

private[sources] class SingerScanBuilder(full: StructType,
                                         options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    SingerScan(required, SingerSourceUtil.resolveStream(options),
      options.asCaseSensitiveMap().asScala.toMap)
}

private[sources] case class SingerInputPartition(path: String, start: Long,
                                                 length: Long)
    extends InputPartition

private[sources] case class SingerScan(required: StructType,
                                       stream: Option[String],
                                       optionsMap: Map[String, String])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"singer stream=${stream.getOrElse("<first>")} " +
      s"ReadSchema: ${required.catalogString}"
  /** Splits computed lazily HERE (the batch path only) — the streaming
    * path plans from offsets instead and must not pay a full listing+split
    * pass at scan build. One listing; the statuses carry the lengths. */
  override def planInputPartitions(): Array[InputPartition] = {
    val opts = new CaseInsensitiveStringMap(optionsMap.asJava)
    val maxSplit = SparkSession.active.sessionState.conf.filesMaxPartitionBytes
    SingerSourceUtil.listFiles(opts).flatMap { st =>
      val len = st.getLen
      if (len == 0) Seq.empty
      else (0L until len by maxSplit).map(start =>
        SingerInputPartition(st.getPath.toString, start,
          math.min(maxSplit, len - start)))
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    SingerReaderFactory(required, stream)
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SingerMicroBatchStream(required, stream, optionsMap)
}

/** Streaming continuation range of one file: `start` is a PREVIOUS file
  * length, i.e. a line boundary under the Singer contract (taps write whole
  * lines). Unlike batch splits there is no partial head line to skip and no
  * tail line to chase past `length` — the range is read EXACTLY. */
private[sources] case class SingerStreamPartition(path: String, start: Long,
                                                  length: Long)
    extends InputPartition

private[sources] case class SingerReaderFactory(required: StructType,
                                                stream: Option[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case p: SingerInputPartition =>
        new SingerPartitionReader(p, required, stream)
      case p: SingerStreamPartition =>
        new SingerAlignedRangeReader(p, required, stream)
    }
}

/** Per-file growth offsets for the micro-batch stream, serialized as a
  * sorted JSON object (deterministic for checkpoint equality). */
private[sources] case class SingerStreamOffset(files: Map[String, Long])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String =
    files.toSeq.sortBy(_._1)
      .map { case (f, len) =>
        "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\":" + len }
      .mkString("{", ",", "}")
}

private[sources] object SingerStreamOffset {
  def fromJson(json: String): SingerStreamOffset = {
    val node = new ObjectMapper().readTree(json)
    SingerStreamOffset(node.properties().asScala.iterator
      .map(e => e.getKey -> e.getValue.asLong()).toMap)
  }
}

/** Micro-batch streaming over a growing set of Singer JSONL files — the
  * structured-streaming face of the same wire format (`spark.readStream
  * .format("singer")...`): tail the tap's output directory instead of
  * re-ingesting it. Offsets are per-file byte lengths; each batch reads
  * exactly the bytes appended since the last one (plus newly appeared
  * files from offset 0), through the same converter/pruning path as the
  * batch scan. Assumes line-atomic appends — the Singer CLI contract
  * (line-buffered stdout); a mid-line snapshot would split a record.
  * At scale each batch's work is proportional to NEW data only, and the
  * per-file ranges parallelize exactly like batch splits.
  *
  * BACKPRESSURE (admission control): without a cap, a huge backlog (the
  * tap ran for hours before the stream started, or one giant appended
  * file) lands as ONE micro-batch — a single epoch sized like a batch
  * job, blowing right past any checkpoint-interval/latency target.
  * `maxBytesPerTrigger` caps the total bytes admitted per batch;
  * `maxRecordsPerTrigger` caps admitted Singer MESSAGES (lines — the
  * unit the wire grows by; SCHEMA/STATE lines count like the SDK's
  * message counters do). Both split a large file MID-FILE on an exact
  * line boundary: the capped offset is found by a bounded driver-side
  * forward scan (bytes: a few bytes past the cap to the next newline;
  * records: one LineReader pass over the ADMITTED span only — cost
  * bounded by the cap itself, never the backlog). Files the budget
  * does not reach carry their start offsets forward, so nothing is
  * skipped or re-read — exactly-once totals across any split. */
private[sources] class SingerMicroBatchStream(required: StructType,
                                              stream: Option[String],
                                              optionsMap: Map[String, String])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private def options = new CaseInsensitiveStringMap(optionsMap.asJava)

  override def initialOffset(): Offset = SingerStreamOffset(Map.empty)

  override def getDefaultReadLimit: ReadLimit = {
    val maxRecs = Option(options.get("maxRecordsPerTrigger")).map(_.toLong)
    val maxBytes = Option(options.get("maxBytesPerTrigger")).map(_.toLong)
    (maxRecs, maxBytes) match {
      case (Some(r), Some(b)) =>
        ReadLimit.compositeLimit(Array(ReadLimit.maxRows(r),
          ReadLimit.maxBytes(b)))
      case (Some(r), None) => ReadLimit.maxRows(r)
      case (None, Some(b)) => ReadLimit.maxBytes(b)
      case _               => ReadLimit.allAvailable()
    }
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this")

  override def reportLatestOffset(): Offset =
    SingerStreamOffset(SingerSourceUtil.listFiles(options)
      .map(st => st.getPath.toString -> st.getLen).toMap)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, ReadMaxBytes, ReadMaxRows}
    val startFiles = start.asInstanceOf[SingerStreamOffset].files
    val avail = SingerSourceUtil.listFiles(options)
      .map(st => st.getPath.toString -> st.getLen).toMap
    def limits(l: ReadLimit): Seq[ReadLimit] = l match {
      case c: CompositeReadLimit => c.getReadLimits.toSeq.flatMap(limits)
      case other                 => Seq(other)
    }
    val rowCap = limits(limit).collectFirst {
      case r: ReadMaxRows => r.maxRows() }
    val byteCap = limits(limit).collectFirst {
      case b: ReadMaxBytes => b.maxBytes() }
    if (rowCap.isEmpty && byteCap.isEmpty)
      return SingerStreamOffset(avail)
    var rowBudget = rowCap.getOrElse(Long.MaxValue)
    var byteBudget = byteCap.getOrElse(Long.MaxValue)
    val admitted = scala.collection.mutable.Map[String, Long]() ++ startFiles
    avail.toSeq.sortBy(_._1).foreach { case (f, len) =>
      val from = startFiles.getOrElse(f, 0L)
      if (len > from && (rowBudget > 0 && byteBudget > 0)) {
        val (boundary, lines) = SingerSourceUtil.admitSpan(
          f, from, len, rowBudget, byteBudget)
        if (boundary > from) admitted(f) = boundary
        else admitted.getOrElseUpdate(f, from)
        rowBudget -= lines
        byteBudget -= (boundary - from)
      } else admitted.getOrElseUpdate(f, from)
    }
    SingerStreamOffset(admitted.toMap)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SingerStreamOffset].files
    val e = end.asInstanceOf[SingerStreamOffset].files
    e.toSeq.sortBy(_._1).flatMap { case (f, len) =>
      val from = s.getOrElse(f, 0L)
      if (len > from) Some(SingerStreamPartition(f, from, len - from)) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    SingerReaderFactory(required, stream)

  override def deserializeOffset(json: String): Offset =
    SingerStreamOffset.fromJson(json)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Exact [start, start+length) line reader for streaming continuation
  * ranges: Hadoop's [[org.apache.hadoop.util.LineReader]] reports bytes
  * consumed per line, so the reader stops precisely at the snapshot
  * boundary and never chases lines written after it. */
private[sources] class SingerAlignedRangeReader(part: SingerStreamPartition,
                                                required: StructType,
                                                stream: Option[String])
    extends PartitionReader[InternalRow] {
  private val in = {
    val p = new Path(part.path)
    val s = p.getFileSystem(new Configuration()).open(p)
    s.seek(part.start)
    s
  }
  private val lines = new org.apache.hadoop.util.LineReader(in)
  private val text = new Text()
  private var consumed = 0L
  private var boundStream: Option[String] = stream
  private var current: InternalRow = _

  override def next(): Boolean = {
    current = null
    while (current == null) {
      if (consumed >= part.length) return false
      val n = lines.readLine(text)
      if (n == 0) return false
      consumed += n
      SingerMessage.decode(text.toString) match {
        case Some(SingerMessage.Record(s, json)) if boundStream.forall(_ == s) =>
          if (boundStream.isEmpty) boundStream = Some(s)
          current = JsonRecordConverter.convert(json, required)
        case _ => ()
      }
    }
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = lines.close()
}

/** Reads one byte range of one JSONL file. Line-boundary healing is
  * delegated to Hadoop's [[LineRecordReader]] — the exact TextInputFormat
  * semantics every distributed text format relies on. The executor-side
  * `new Configuration()` resolves local/HDFS default filesystems; a
  * credential-bearing deployment would broadcast the driver conf instead. */
private[sources] class SingerPartitionReader(part: SingerInputPartition,
                                             required: StructType,
                                             stream: Option[String])
    extends PartitionReader[InternalRow] {
  private val lines = new LineRecordReader()
  lines.initialize(
    new FileSplit(new Path(part.path), part.start, part.length, Array.empty),
    new org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl(
      new Configuration(), new org.apache.hadoop.mapreduce.TaskAttemptID()))

  // `stream` arrives resolved driver-side (option or first SCHEMA) so all
  // partitions agree; the first-record fallback below only fires for a
  // schema-less feed read under a user-supplied schema
  private var boundStream: Option[String] = stream
  private var current: InternalRow = _

  override def next(): Boolean = {
    current = null
    while (current == null) {
      if (!lines.nextKeyValue()) return false
      val line = lines.getCurrentValue.toString
      SingerMessage.decode(line) match {
        case Some(SingerMessage.Record(s, json)) if boundStream.forall(_ == s) =>
          if (boundStream.isEmpty) boundStream = Some(s)
          current = JsonRecordConverter.convert(json, required)
        case _ => () // SCHEMA/STATE/other streams: not rows of this table
      }
    }
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = lines.close()
}

/** Jackson → InternalRow for the [[graft.singer.SchemaConv]] type surface
  * (long, double, boolean, string, date, timestamp, array, struct). Only
  * the REQUIRED (pruned) fields are materialized; type-mismatched values
  * read as null (the query-surface contract — strict validation lives in
  * the load path). */
private[sources] object JsonRecordConverter {
  // USE_BIG_DECIMAL_FOR_FLOATS: JSON floats parse as DecimalNode, so a
  // number-carried singer.decimal keeps every digit — the default
  // DoubleNode would round to ~16 significant digits BEFORE the
  // DecimalType conversion saw the text (silent corruption the load
  // path's from_json, which reads the token text digit-exact, never had)
  @transient private lazy val mapper = new ObjectMapper()
    .configure(com.fasterxml.jackson.databind.DeserializationFeature
      .USE_BIG_DECIMAL_FOR_FLOATS, true)

  def convert(recordJson: String, schema: StructType): InternalRow = {
    val node = mapper.readTree(recordJson)
    fromObject(node, schema)
  }

  private def fromObject(node: JsonNode, schema: StructType): GenericInternalRow = {
    val values = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      val f = schema(i)
      values(i) =
        if (SchemaConv.isTimeField(f)) convTime(node.get(f.name))
        else conv(node.get(f.name), f.dataType)
      i += 1
    }
    new GenericInternalRow(values)
  }

  /** A `format: time` field (micros-long with the singer:format tag):
    * Singer-native `HH:mm:ss[.SSSSSS]` strings parse to micros-since-
    * midnight; bare numbers (this engine's own earlier representation)
    * read as micros directly — but only within `[0, MicrosPerDay)`, the
    * range the sink's time-string encoder can represent (the load path
    * enforces the same bound, `BatchLoader.fieldValue`). */
  private def convTime(n: JsonNode): Any = {
    if (n == null || n.isNull) null
    else if (n.isTextual) SchemaConv.timeStringToMicros(n.asText)
    else if (n.canConvertToLong && n.asLong >= 0 &&
      n.asLong < SchemaConv.MicrosPerDay) n.asLong
    else null
  }

  private def conv(n: JsonNode, dt: DataType): Any = {
    if (n == null || n.isNull) return null
    dt match {
      // the SchemaConv surface plus the narrower numerics a user-supplied
      // schema (supportsExternalMetadata) may declare — the sink encodes
      // them, so the reader must decode them
      case LongType    => if (n.canConvertToLong) n.asLong else null
      case IntegerType => if (n.canConvertToInt) n.asInt else null
      case ShortType   =>
        if (n.canConvertToInt && n.asInt >= Short.MinValue &&
          n.asInt <= Short.MaxValue) n.asInt.toShort else null
      case ByteType    =>
        if (n.canConvertToInt && n.asInt >= Byte.MinValue &&
          n.asInt <= Byte.MaxValue) n.asInt.toByte else null
      case DoubleType  => if (n.isNumber) n.asDouble else null
      case FloatType   => if (n.isNumber) n.asDouble.toFloat else null
      case d: DecimalType =>
        // number- or string-carried exact decimal (format singer.decimal /
        // multipleOf): same acceptance as the load path's from_json —
        // unparseable text or precision overflow reads null
        val txt = if (n.isTextual || n.isNumber) n.asText else null
        if (txt == null) null
        else try {
          val dec = org.apache.spark.sql.types.Decimal(
            new java.math.BigDecimal(txt))
          if (dec.changePrecision(d.precision, d.scale)) dec else null
        } catch { case _: NumberFormatException => null }
      case BooleanType => if (n.isBoolean) n.asBoolean else null
      case StringType  =>
        UTF8String.fromString(if (n.isTextual) n.asText else n.toString)
      case DateType =>
        if (!n.isTextual) null
        else try java.lang.Integer.valueOf(
          LocalDate.parse(n.asText).toEpochDay.toInt)
        catch { case _: Exception => null }
      case TimestampType =>
        if (!n.isTextual) null else parseTimestampMicros(n.asText)
      case at: ArrayType =>
        if (!n.isArray) null
        else new GenericArrayData(
          n.elements().asScala.map(conv(_, at.elementType)).toArray)
      case mt: MapType =>
        // JSON-Schema additionalProperties map shape (string keys)
        if (!n.isObject) null
        else {
          val entries = n.properties().asScala.toSeq
          org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
            entries.map(e => UTF8String.fromString(e.getKey)).toArray,
            entries.map(e => conv(e.getValue, mt.valueType)).toArray)
        }
      case st: StructType =>
        if (!n.isObject) null else fromObject(n, st)
      case _ => null // NullType fields carry no data
    }
  }

  /** Timestamp strings parse through Spark's own
    * [[org.apache.spark.sql.catalyst.util.DateTimeUtils.stringToTimestamp]]
    * (as UTC) — the exact semantics the load path's `from_json` applies
    * under the UTC session, so the two ingestion surfaces cannot drift. */
  private def parseTimestampMicros(s: String): java.lang.Long =
    org.apache.spark.sql.catalyst.util.DateTimeUtils
      .stringToTimestamp(UTF8String.fromString(s), ZoneOffset.UTC)
      .map(java.lang.Long.valueOf(_)).orNull
}
