package graft.lake

import graft.singer.{SchemaConv, SingerMessage}
import graft.xform.{StreamMapConfig, StreamMaps}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.QueryExecutionListener

/** The Singer load path: JSONL message feed -> typed, batched, append-only
  * table commits — the Spark-native equivalent of the reference's
  * `Target`/`BatchSink` lifecycle (SURVEY.md §3.1):
  *
  *   SCHEMA -> declare stream schema ([[SchemaConv]]);
  *   RECORD -> validated typed rows (`from_json` under the declared schema);
  *   batch drain every `batchSize` records (reference `max_size = 10000`,
  *   `/root/reference/target_iceberg/sinks.py:18`);
  *   STATE  -> echoed only after pending appends are durable;
  *   ACTIVATE_VERSION -> full-table swap (this load's rows replace the
  *     table — `overwrite` commit instead of `append`).
  *
  * Two batching modes:
  *   - '''scale mode''' (default): ONE append per stream with
  *     `maxRecordsPerFile = batchSize` — same bounded-batch file layout, one
  *     snapshot commit, no per-batch driver loop; this is the 100 TB path.
  *     The row count rides the write job via `observe()` (no second scan).
  *   - '''strict mode''': one append per `batchSize` slice in input order,
  *     faithfully reproducing the reference's per-batch commit cadence
  *     (sinks.py:36-100) for protocol-fidelity tests. O(rows/batchSize)
  *     Spark jobs — test-scale only, never the production path.
  *
  * Mid-stream SCHEMA changes follow the SDK's drain-then-switch: each RECORD
  * is typed under the schema most recently declared before it (the feed
  * splits into per-SCHEMA segments, one write each; segment count is bounded
  * by SCHEMA messages, not data volume).
  *
  * Documented divergences from the SDK (intentional, batch-mode semantics):
  *   - records for streams with no SCHEMA message are dropped, not an error;
  *   - records PRECEDING their stream's first SCHEMA are rejected and
  *     counted in `rejectedPerStream` (the SDK fails the whole run);
  *   - scale mode echoes only the LAST STATE (after all appends are
  *     durable) — bounds driver memory O(1) against STATE-per-record taps;
  *     strict mode echoes every checkpoint in input order (SDK cadence).
  */
final class BatchLoader(
    spark: SparkSession,
    catalog: LakeCatalog,
    namespace: String,
    batchSize: Int = BatchLoader.DefaultBatchSize,
    addRecordMetadata: Boolean = false,
    strictBatches: Boolean = false,
    streamMaps: Map[String, StreamMapConfig] = Map.empty,
    flatteningEnabled: Boolean = false,
    flatteningMaxDepth: Int = 1,
    partitionBy: Map[String, Seq[String]] = Map.empty) extends Serializable {

  import BatchLoader._

  /** Decode a JSONL feed and load every stream it declares. Returns per-table
    * row counts and the final STATE payload to echo (only valid to emit now
    * that appends are durable). */
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
      })).cache() // one decode of the feed serves control, STATE, and records

    // Control plane: SCHEMA/ACTIVATE_VERSION are bounded by the stream count
    // (one-ish each per stream) so the driver collect is O(streams); STATE —
    // which a tap may legally emit per record — is reduced distributed-side
    // to the single final checkpoint before anything reaches the driver.
    val control = msgs
      .filter($"mtype" === "SCHEMA" || $"mtype" === "ACTIVATE_VERSION")
      .collect().sortBy(_.seq)
    // Scale mode: only the final checkpoint is meaningful after a batch load
    // and the reduction is distributed-side (a tap may legally emit STATE per
    // record — O(1) driver memory). Strict mode reproduces SDK cadence and
    // echoes EVERY checkpoint in input order (test-scale only, like the mode
    // itself).
    val statesToEcho: Seq[String] =
      if (strictBatches)
        msgs.filter($"mtype" === "STATE").orderBy("seq").collect()
          .map(_.payload).toSeq
      else
        msgs.filter($"mtype" === "STATE")
          .orderBy(desc("seq")).limit(1).collect().map(_.payload).toSeq
    // SDK drain-then-switch semantics (SURVEY §3.1): each RECORD is typed
    // under the schema most recently declared BEFORE it, so a stream's feed
    // splits into one segment per SCHEMA message (almost always one). The
    // segment count — and with it the write-job count — is bounded by the
    // number of SCHEMA messages, not by data volume.
    val segments: Map[String, Seq[SchemaSegment]] =
      control.collect { case RawMsg("SCHEMA", s, js, kp, seq) =>
        (s, SchemaConv.toStructType(js), kp, seq)
      }.groupBy(_._1).map { case (stream, decls) =>
        val ordered = decls.sortBy(_._4)
        stream -> ordered.zipWithIndex.map { case ((_, st, _, seq), i) =>
          val hi = if (i + 1 < ordered.length) ordered(i + 1)._4 else Long.MaxValue
          SchemaSegment(st, seq, hi)
        }.toSeq
      }
    val activatedVersions: Map[String, Long] =
      control.collect { case RawMsg("ACTIVATE_VERSION", s, v, _, _) =>
        s -> v.toLong
      }.toMap // last version wins

    val records = msgs.filter($"mtype" === "RECORD").cache()
    try {
      val perStream = segments.toSeq.map { case (stream, segs) =>
        val version = activatedVersions.get(stream)
        val target = streamMaps.get(stream).flatMap(_.alias).getOrElse(stream)
        var total = 0L
        var totalRejected = 0L
        segs.zipWithIndex.foreach { case (seg, i) =>
          // The FIRST segment also scoops up records PRECEDING the stream's
          // first SCHEMA: they have no declared schema to validate against
          // (the SDK errors the whole run), so B2 rejects and counts them —
          // via the same observe metric riding the write job, no extra
          // scan. Streams with no SCHEMA at all remain the documented drop
          // divergence.
          val lowerBound = if (i == 0) Long.MinValue else seg.fromSeq
          val segRecs = records.filter($"stream" === stream &&
            $"seq" > lowerBound && $"seq" < seg.untilSeq)
          val rejectBefore = if (i == 0) seg.fromSeq else Long.MinValue
          val typed = typedRows(segRecs, seg.schema, version, rejectBefore)
          val mapped = applyTransforms(stream, typed.valid)
          // segment schemas evolve the table in declaration order (A12)
          catalog.ensureTable(namespace, target, mapped.drop(SeqCol).schema,
            partitionBy.getOrElse(stream, Nil))
          // the table may have more columns than this segment declares
          // (earlier schemas/feeds) — align by name, null-fill the rest
          val aligned = alignTo(mapped, catalog.load(namespace, target).schema)
          // ACTIVATE_VERSION swaps the table on the FIRST write, appends after
          val overwrite = version.isDefined && i == 0
          val (n, rejected) =
            if (strictBatches)
              (appendStrict(target, aligned, overwrite), typed.rejectedExact())
            else appendScale(target, aligned, overwrite, typed)
          total += n
          totalRejected += rejected
        }
        target -> ((total, totalRejected))
      }
      // an ACTIVATE_VERSION for a stream with NO SCHEMA in this feed (a pure
      // version-swap signal) still truncates the existing table — ignoring
      // it would keep every stale row while the tap believes the new
      // version is active
      val activatedOnly = activatedVersions.keys
        .filterNot(segments.contains).toSeq.flatMap { stream =>
          val target = streamMaps.get(stream).flatMap(_.alias).getOrElse(stream)
          if (catalog.tableExists(namespace, target)) {
            // an INDEPENDENT empty frame — overwriting with a limit(0) read
            // of the same table is rejected (UNSUPPORTED_OVERWRITE)
            val schema = catalog.load(namespace, target).schema
            catalog.overwrite(namespace, target, spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
            Some(target -> ((0L, 0L)))
          } else None
        }
      // merge by target SUMMING — two streams aliased onto one table (or a
      // mid-feed alias change) must not overwrite each other's counts
      val counts = (perStream ++ activatedOnly)
        .groupBy(_._1).map { case (t, vs) =>
          t -> ((vs.map(_._2._1).sum, vs.map(_._2._2).sum))
        }
      LoadReport(counts.map { case (t, (n, _)) => t -> n },
        statesToEcho,
        counts.map { case (t, (_, r)) => t -> r })
    } finally { records.unpersist(); msgs.unpersist() }
  }

  /** RECORD payloads -> typed rows under the declared schema, with full B2
    * record validation (SURVEY.md §2.B2; the reference inherits it from SDK
    * `BatchSink`, `/root/reference/target_iceberg/sinks.py:6,15`): a record
    * whose JSON is corrupt OR whose fields violate the declared types (e.g.
    * a string in an `"integer"` field) is REJECTED — dropped and counted —
    * never null-coerced into the table. Detection is `from_json`'s
    * PERMISSIVE corrupt-record column: wrong-typed fields set it while legit
    * JSON nulls don't, so validation rides the same compiled parse as the
    * load itself. The rejected count is observed on the write job
    * ([[Typed.rejectMetric]]) — no extra scan in scale mode;
    * [[Typed.rejectedExact]] is the test-scale fallback (one extra parse).
    * The full six `_sdc_*` metadata columns are appended when
    * `addRecordMetadata` (reference config `target.py:16`, SDK B5). */
  private def typedRows(recs: Dataset[RawMsg], schema: StructType,
                        version: Option[Long],
                        rejectBefore: Long = Long.MinValue): Typed = {
    val corruptCol = "_graft_corrupt_record"
    // every engine-internal column lives under the _graft_ prefix so a
    // legal Singer field named e.g. "seq" cannot collide with the load
    // plumbing (duplicate-column crash or silent drop of user data)
    Seq(corruptCol, SeqCol, BatchCol).foreach { reserved =>
      require(!schema.fieldNames.contains(reserved),
        s"stream schema may not declare the reserved column $reserved")
    }
    val schemaC = StructType(schema.fields :+ StructField(corruptCol, StringType))
    val parsedAll = recs.select(col("seq").as(SeqCol),
      from_json(col("payload"), schemaC,
        Map("columnNameOfCorruptRecord" -> corruptCol, "mode" -> "PERMISSIVE"))
        .as("r"))
    // positional rejection (records before the stream's first SCHEMA) joins
    // the content-based checks so all rejects share one metric/filter.
    // B2 also rejects a null in a field whose declared type excludes null:
    // from_json's corrupt column does not fire for explicit JSON nulls, but
    // the SDK's jsonschema validation rejects them, and admitting one puts
    // a null into a column the table declares non-nullable (which Spark
    // does not runtime-enforce on writes — downstream IsNotNull pruning
    // would then return wrong results). A MISSING key types identically;
    // the reference's arrow conversion fails the whole batch on it, so
    // reject-and-count is the gentler superset.
    val nonNullViolation = schema.fields.filterNot(_.nullable)
      .map(f => col(s"r.`${f.name}`").isNull)
      .reduceOption(_ || _).getOrElse(lit(false))
    val isRejected = col("r").isNull || col(s"r.`$corruptCol`").isNotNull ||
      nonNullViolation || col(SeqCol) < lit(rejectBefore)
    val rejMetric = s"graft_rejected_${java.util.UUID.randomUUID()}"
    val parsed = parsedAll
      .observe(rejMetric, coalesce(sum(when(isRejected, 1L).otherwise(0L)),
        lit(0L)).as("rejected"))
      .filter(!isRejected)
    val base = parsed.select(
      (schema.fieldNames.toIndexedSeq.map(f => col(s"r.`$f`")) :+ col(SeqCol)): _*)
    val valid =
      if (!addRecordMetadata) base
      else base
        // the tap's own extraction time is not carried by this feed shape;
        // SDK semantics default it to receipt time when absent
        .withColumn("_sdc_extracted_at", current_timestamp())
        .withColumn("_sdc_received_at", current_timestamp())
        .withColumn("_sdc_batched_at", current_timestamp())
        .withColumn("_sdc_deleted_at", lit(null).cast("timestamp"))
        .withColumn("_sdc_sequence", col(SeqCol))
        .withColumn("_sdc_table_version",
          version.map(lit(_)).getOrElse(lit(null)).cast("long"))
    Typed(valid, rejMetric, () => parsedAll.filter(isRejected).count())
  }

  /** Order/column alignment against the live table schema: name-resolved,
    * missing columns null-filled (rows from before a column was added), the
    * engine-internal `seq` carried through. */
  private def alignTo(df: DataFrame, tableSchema: StructType): DataFrame = {
    val present = df.columns.toSet
    val cols = tableSchema.fields.toSeq.map { f =>
      if (present(f.name)) col(s"`${f.name}`")
      else lit(null).cast(f.dataType).as(f.name)
    } :+ col(SeqCol)
    df.select(cols: _*)
  }

  /** Stream maps + flattening (B3/B4), applied after typing, before write;
    * `seq` is engine-internal and restored around the user transform. */
  private def applyTransforms(stream: String, df: DataFrame): DataFrame = {
    val mapped = streamMaps.get(stream) match {
      case Some(cfg) => StreamMaps(df, cfg)
      case None      => df
    }
    if (!flatteningEnabled) mapped
    else StreamMaps.flatten(mapped, flatteningMaxDepth)
  }

  /** One write job per stream; the written-row count AND the rejected-record
    * count both ride the write job via `observe` + listener, so the
    * parse/validate/transform pipeline executes once — no separate count()
    * scan (at 100 TB a second scan doubles ingest cost). */
  private def appendScale(stream: String, rows: DataFrame,
                          overwrite: Boolean, typed: Typed): (Long, Long) = {
    val data = rows.drop(SeqCol)
    val metricName = s"graft_rows_${stream}_${java.util.UUID.randomUUID()}"
    val observed = data.observe(metricName, count(lit(1)).as("n"))
    @volatile var counted = -1L
    @volatile var rejected = -1L
    val latch = new java.util.concurrent.CountDownLatch(1)
    val listener = new QueryExecutionListener {
      override def onSuccess(fn: String, qe: QueryExecution, ns: Long): Unit = {
        // both observe nodes live in the one write plan -> same QueryExecution
        qe.observedMetrics.get(typed.rejectMetric).foreach { row =>
          rejected = if (row.isNullAt(0)) 0L else row.getLong(0)
        }
        qe.observedMetrics.get(metricName).foreach { row =>
          counted = row.getLong(0); latch.countDown()
        }
      }
      override def onFailure(fn: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    // The writer OPTION `maxRecordsPerFile` is ignored on inserts into
    // existing catalog tables (observed empirically), so the file bound is
    // enforced via the session conf, scoped to this write and restored after.
    val confKey = "spark.sql.files.maxRecordsPerFile"
    val prevMax = spark.conf.getOption(confKey)
    spark.conf.set(confKey, batchSize.toString)
    try {
      val opts = Map("maxRecordsPerFile" -> batchSize.toString)
      if (overwrite) catalog.overwrite(namespace, stream, observed, opts)
      else catalog.append(namespace, stream, observed, opts)
      // listener fires async after commit; fall back to counts only if the
      // metrics never arrive (defensive — should not happen)
      if (latch.await(30, java.util.concurrent.TimeUnit.SECONDS) && counted >= 0)
        (counted, if (rejected >= 0) rejected else typed.rejectedExact())
      else (data.count(), typed.rejectedExact())
    } finally {
      spark.listenerManager.unregister(listener)
      prevMax match {
        case Some(v) => spark.conf.set(confKey, v)
        case None    => spark.conf.unset(confKey)
      }
    }
  }

  /** Per-slice commit cadence; with `overwrite` (ACTIVATE_VERSION) the FIRST
    * slice replaces the table contents and later slices append — same final
    * table as scale mode's single overwrite commit, per-batch cadence kept. */
  private def appendStrict(stream: String, rows: DataFrame,
                           overwrite: Boolean = false): Long = {
    // row_number over global input order: single-partition window — strict
    // mode is protocol-fidelity testing only (see class doc).
    val w = Window.orderBy(SeqCol)
    val sliced = rows
      .withColumn(BatchCol, ((row_number().over(w) - 1) / batchSize).cast("long"))
      .cache()
    try {
      val batchIds = sliced.select(BatchCol).distinct()
        .collect().map(_.getLong(0)).sorted
      var total = 0L
      batchIds.zipWithIndex.foreach { case (b, i) =>
        val slice = sliced.filter(col(BatchCol) === b).drop(BatchCol, SeqCol)
        if (overwrite && i == 0) catalog.overwrite(namespace, stream, slice)
        else catalog.append(namespace, stream, slice)
        total += slice.count()
      }
      // an ACTIVATE_VERSION with zero records still truncates (full swap)
      if (overwrite && batchIds.isEmpty)
        catalog.overwrite(namespace, stream, sliced.drop(BatchCol, SeqCol).limit(0))
      total
    } finally sliced.unpersist()
  }
}

object BatchLoader {
  /** Reference batch-drain size (`sinks.py:18`). */
  val DefaultBatchSize = 10000

  /** Engine-internal column names — _graft_-prefixed so they cannot
    * collide with legal Singer field names (which "seq"/"__batch" could). */
  private[lake] val SeqCol = "_graft_seq"
  private[lake] val BatchCol = "_graft_batch"

  /** Build from a validated [[TargetConfig]] (CLI path) — the ONE place
    * config fields map onto loader parameters; the CLI passes only the
    * flags that are not config-file surface. */
  def fromConfig(spark: SparkSession, catalog: LakeCatalog,
                 cfg: TargetConfig, strictBatches: Boolean = false): BatchLoader =
    new BatchLoader(spark, catalog,
      namespace = cfg.icebergCatalogNamespaceName,
      batchSize = cfg.batchSize,
      addRecordMetadata = cfg.addRecordMetadata,
      strictBatches = strictBatches,
      streamMaps = cfg.streamMaps,
      flatteningEnabled = cfg.flatteningEnabled,
      flatteningMaxDepth = cfg.flatteningMaxDepth,
      partitionBy = cfg.partitionBy)

  private[lake] final case class RawMsg(
      mtype: String, stream: String, payload: String,
      keyProps: Seq[String], seq: Long)

  /** One per-stream SCHEMA declaration and the half-open seq interval of the
    * records it governs (drain-then-switch, SURVEY §3.1). */
  private[lake] final case class SchemaSegment(schema: StructType,
                                               fromSeq: Long, untilSeq: Long)

  /** A stream's validated rows plus the two ways to learn how many records
    * validation rejected: the observe metric riding the write job (scale
    * path, free) and an exact re-parse (strict/test path, one extra job). */
  private[lake] final case class Typed(valid: DataFrame, rejectMetric: String,
                                       rejectedExact: () => Long)

  /** @param rejectedPerStream records dropped by B2 validation (corrupt JSON
    *   or type-violating fields), keyed like `rowsPerStream`. */
  final case class LoadReport(rowsPerStream: Map[String, Long],
                              statesToEcho: Seq[String],
                              rejectedPerStream: Map[String, Long] = Map.empty)
}
