package graft.sql

import graft.functions.IcebergBucket
import graft.lake.SnapshotLakeCatalog
import graft.lake.SnapshotLakeCatalog.{SqlDataFile, SqlPartField, SqlScanState}
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportPartitioning, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.connector.write.SupportsTruncate
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.{AlwaysTrue, And => FAnd, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, InsertableRelation, IsNotNull, IsNull, LessThan, LessThanOrEqual, Not => FNot, Or => FOr}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.unsafe.types.UTF8String

import java.util.{OptionalLong, Set => JSet}
import scala.jdk.CollectionConverters._

/** A DSv2 table whose read can (or must) be served by a library-composed
  * DataFrame plan — the contract [[GraftComposedRead]] substitutes on. */
trait GraftComposable {
  def needsComposition: Boolean
  def composedFrame(): DataFrame
}

/** One snapshot-lake table through Spark's DSv2 `Table` face (VERDICT r13
  * #1). Reads plan NATIVELY off the table's Avro manifests — exact file
  * lists, partition/bucket pruning, vectorized parquet, and
  * `KeyGroupedPartitioning` for bucket-transform tables (the
  * storage-partitioned-join handle, VERDICT r13 #2) — whenever the
  * snapshot is representable as plain files: no delete debt, one schema
  * generation, one spec generation. Otherwise [[needsComposition]] holds
  * and [[GraftComposedRead]] (injected by `graft.GraftExtensions`) swaps
  * in the library's proven composed plan (delete anti-joins, rename
  * aliases, promotion casts); without the extensions such a table fails
  * LOUDLY at scan planning rather than reading wrong.
  *
  * Writes ride the V1 fallback ([[InsertableRelation]]): `INSERT INTO` is
  * one [[SnapshotLakeCatalog.append]] snapshot commit, `INSERT OVERWRITE`
  * one `overwrite` — the same commit/rebase semantics as the library
  * faces, because they ARE the library faces.
  *
  * `pinnedSnapshot`: Some(id) for `VERSION AS OF`/`TIMESTAMP AS OF` reads
  * (writes refuse); None reads pin the CURRENT snapshot at load time, so
  * one query never sees two commits. */
class GraftTable(val lake: SnapshotLakeCatalog, catalogName: String,
                 val ns: String, val tableName: String,
                 val pinnedSnapshot: Option[Long])
    extends Table with SupportsRead with SupportsWrite with GraftComposable
    with org.apache.spark.sql.connector.catalog.SupportsDelete {

  private[sql] lazy val state: SqlScanState =
    lake.sqlScanState(ns, tableName, pinnedSnapshot)

  override def needsComposition: Boolean = state.composed.isDefined

  /** The composed read plan (library load/loadAt), pinned to the SAME
    * snapshot [[state]] planned against. */
  override def composedFrame(): DataFrame =
    if (state.snapshotId >= 0)
      lake.composedFrame(ns, tableName, Some(state.snapshotId))
    else lake.composedFrame(ns, tableName, None)

  override def name(): String = s"$catalogName.$ns.$tableName"
  override def schema(): StructType = state.schema

  override def capabilities(): JSet[TableCapability] =
    // AUTOMATIC_SCHEMA_EVOLUTION: the analyzer's MERGE WITH SCHEMA
    // EVOLUTION rule alters the table through THIS catalog (our CAS
    // addColumns/promotion faces), reloads it, and expands star actions
    // against the evolved schema — the lake's additive-evolution
    // contract, surfaced through SQL
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.STREAMING_WRITE,
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION).asJava

  override def partitioning(): Array[Transform] =
    state.partFields.map { f =>
      f.transform match {
        case "identity" => Expressions.identity(f.srcName)
        case "day"      => Expressions.days(f.srcName)
        case "month"    => Expressions.months(f.srcName)
        case "hour"     => Expressions.hours(f.srcName)
        case "year"     => Expressions.years(f.srcName)
        case t if t.startsWith("bucket[") =>
          Expressions.bucket(
            t.stripPrefix("bucket[").stripSuffix("]").toInt, f.srcName)
        case t if t.startsWith("truncate[") =>
          Expressions.apply("truncate",
            Expressions.literal(
              t.stripPrefix("truncate[").stripSuffix("]").toInt),
            Expressions.column(f.srcName))
        case other =>
          Expressions.apply(other, Expressions.column(f.srcName))
      }
    }.toArray

  override def properties(): java.util.Map[String, String] =
    (state.properties + ("provider" -> "graft")).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // a composed table still hands out a ScanBuilder — planners build
    // scans they never execute (e.g. the pushdown pass under a
    // DeleteFromTable that the metadata-only conversion then replaces);
    // the loud failure moves to EXECUTION (GraftUnreadableScan), so a
    // debt-table DELETE works while an actual extension-less read still
    // fails instead of reading wrong
    if (needsComposition) {
      val msg =
        s"${name()}: the native SQL scan cannot represent this table — " +
          s"${state.composed.get}. Install graft.GraftExtensions " +
          "(spark.sql.extensions) for the composed read, or fold the " +
          "state away (compact())."
      // DEBT-ONLY composition keeps the native builder with its batch
      // face deferred-unreadable: delete files never mask APPENDED rows
      // (sequence scoping), so the micro-batch STREAM of such a table
      // stays native-exact while batch still requires the composed plan
      if (state.composed.contains(SnapshotLakeCatalog.DeleteDebtReason))
        new GraftScanBuilder(SparkSession.active, this, options,
          batchUnreadable = Some(msg))
      else new GraftUnreadableScanBuilder(state.schema, msg)
    } else new GraftScanBuilder(SparkSession.active, this, options)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinnedSnapshot.isEmpty,
      s"${name()}: cannot write to a time-travel (VERSION/TIMESTAMP AS " +
        "OF) relation")
    new GraftWriteBuilder(lake, ns, tableName, info, this)
  }

  // ---- DELETE FROM (row-level, merge-on-read) ----------------------------

  override def canDeleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    pinnedSnapshot.isEmpty &&
      filters.forall(GraftFilterColumns.toColumn(_).isDefined)

  /** `DELETE FROM graft.ns.t WHERE ...` lands as ONE merge-on-read
    * snapshot commit ([[SnapshotLakeCatalog.deleteWhereMOR]]): a position
    * delete file over the matched rows, NO data rewrite — the cheap v2
    * delete path whose read-time debt [[SnapshotLakeCatalog.compact]]
    * folds away (until then the SQL scan serves the table through the
    * composed plan). Untranslatable predicates are refused at
    * [[canDeleteWhere]], so Spark fails the statement loudly instead of
    * deleting the wrong rows. */
  override def deleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    val cond = filters.flatMap(GraftFilterColumns.toColumn)
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    lake.deleteWhereMOR(ns, tableName, cond)
  }
}

/** Iceberg-style METADATA TABLES through SQL: `SELECT * FROM
  * graft.ns.t.snapshots|history|files|manifests|partitions|refs` resolves
  * here ([[GraftSqlCatalog.loadTable]] recognizes the 4-part identifier)
  * and reads through [[graft.lake.SnapshotLakeCatalog.metaTable]] via the
  * composed-read substitution — always composed (the faces are computed
  * frames, not parquet), so the extensions are required, same as any
  * debt-carrying table. */
class GraftMetaTable(lake: SnapshotLakeCatalog, catalogName: String,
                     ns: String, tableName: String, kind: String)
    extends Table with SupportsRead with GraftComposable {
  override def needsComposition: Boolean = true
  override def composedFrame(): DataFrame =
    lake.metaTable(ns, tableName, kind)
  override def name(): String = s"$catalogName.$ns.$tableName.$kind"
  // analysis probes schema() repeatedly; building the face once per
  // table instance keeps the manifest reads off that path
  private lazy val cachedSchema: StructType = composedFrame().schema
  override def schema(): StructType = cachedSchema
  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftUnreadableScanBuilder(schema(),
      s"${name()}: metadata tables read through the composed plan — " +
        "install graft.GraftExtensions (spark.sql.extensions)")
}

/** Branch/tag tables through SQL — Iceberg's identifier convention:
  * `SELECT ... FROM graft.ns.t.branch_audit` reads the branch head (and
  * `.tag_v1` a tag) through the composed read — ref resolution at READ
  * time, so each query sees the ref's current target; `INSERT INTO
  * graft.ns.t.branch_audit ...` STAGES onto the branch
  * ([[graft.lake.SnapshotLakeCatalog.stageAppend]]: advances only
  * `refs[branch]`, readers of the table see nothing until `CALL
  * fast_forward` publishes — the WRITE-AUDIT-PUBLISH loop in pure SQL,
  * with `CALL cherrypick_snapshot`/`dropRef` as the audit verdicts).
  * A fresh branch is born by its first staged INSERT (parent = main's
  * head, Iceberg's implicit branch creation); tags refuse writes. */
class GraftBranchTable(lake: SnapshotLakeCatalog, catalogName: String,
                       ns: String, tableName: String, ref: String,
                       isTag: Boolean)
    extends Table with SupportsRead with SupportsWrite with GraftComposable {
  override def needsComposition: Boolean = true
  override def composedFrame(): DataFrame =
    lake.loadRef(ns, tableName, ref)
  override def name(): String =
    s"$catalogName.$ns.$tableName.${if (isTag) "tag_" else "branch_"}$ref"
  // schema follows the TABLE (additive evolution; a ref pins data, not
  // the schema face) — and stays answerable for an unborn branch whose
  // first INSERT creates it
  private lazy val cachedSchema: StructType =
    lake.sqlScanState(ns, tableName, None).schema
  override def schema(): StructType = cachedSchema
  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE).asJava
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftUnreadableScanBuilder(schema(),
      s"${name()}: ref reads go through the composed plan — install " +
        "graft.GraftExtensions (spark.sql.extensions)")
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(!isTag,
      s"${name()}: tags are immutable — stage onto a branch_* instead")
    new WriteBuilder {
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame,
                                overwrite: Boolean): Unit = {
              require(!overwrite,
                s"$ns.$tableName.branch_$ref: INSERT OVERWRITE on a " +
                  "staged branch is not a WAP shape — stage appends, " +
                  "audit, then publish or drop the branch")
              lake.stageAppend(ns, tableName, ref, data)
            }
          }
      }
    }
  }
}

/** The deferred-failure scan for tables only the composed plan can read:
  * building succeeds (planner passes probe scans they never run),
  * EXECUTING throws the actionable message. */
class GraftUnreadableScanBuilder(full: StructType, msg: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] =
      throw new UnsupportedOperationException(msg)
    override def createReaderFactory(): PartitionReaderFactory =
      throw new UnsupportedOperationException(msg)
    // streaming has no composed-plan substitution: fail at plan time
    // with the actionable reason, not the generic default
    override def toMicroBatchStream(checkpointLocation: String)
        : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
      throw new UnsupportedOperationException(msg)
  }
}

/** v1 source Filter → Column translation for the DELETE face — exact or
  * nothing (None = not translatable; the statement is refused, never
  * approximated). */
object GraftFilterColumns {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col => c, lit}
  import org.apache.spark.sql.sources._

  /** Connector Predicate → v1 Filter, for the runtime-filtering path —
    * only the shapes a DPP subquery emits (IN, =, AND/OR). Literal values
    * arrive as CATALYST values (UTF8String, epoch-day int, micros long)
    * and convert to the external forms the v1 Filter contract carries. */
  def v2ToV1(p: org.apache.spark.sql.connector.expressions.filter.Predicate,
             schema: StructType): Option[Filter] = {
    import org.apache.spark.sql.connector.expressions.{Expression => VExpr, Literal => VLit, NamedReference}
    def ref(e: VExpr): Option[String] = e match {
      case r: NamedReference => Some(r.fieldNames().mkString("."))
      case _ => None
    }
    def ext(e: VExpr): Option[Any] = e match {
      case l: VLit[_] => Some(l.dataType() match {
        case StringType => String.valueOf(l.value())
        case DateType => java.time.LocalDate.ofEpochDay(
          l.value().asInstanceOf[Number].longValue())
        case TimestampType | TimestampNTZType =>
          val us = l.value().asInstanceOf[Number].longValue()
          java.time.Instant.ofEpochSecond(
            Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)
        case _ => l.value()
      })
      case _ => None
    }
    val kids = p.children()
    p.name() match {
      case "IN" if kids.length >= 2 =>
        for (a <- ref(kids(0));
             vs <- Option(kids.drop(1).map(ext))
               .filter(_.forall(_.isDefined)))
          yield In(a, vs.map(_.get))
      case "=" if kids.length == 2 =>
        for (a <- ref(kids(0)); v <- ext(kids(1))) yield EqualTo(a, v)
      case ">" if kids.length == 2 =>
        for (a <- ref(kids(0)); v <- ext(kids(1)))
          yield org.apache.spark.sql.sources.GreaterThan(a, v)
      case ">=" if kids.length == 2 =>
        for (a <- ref(kids(0)); v <- ext(kids(1)))
          yield org.apache.spark.sql.sources.GreaterThanOrEqual(a, v)
      case "<" if kids.length == 2 =>
        for (a <- ref(kids(0)); v <- ext(kids(1)))
          yield org.apache.spark.sql.sources.LessThan(a, v)
      case "<=" if kids.length == 2 =>
        for (a <- ref(kids(0)); v <- ext(kids(1)))
          yield org.apache.spark.sql.sources.LessThanOrEqual(a, v)
      case "AND" =>
        val sub = p.asInstanceOf[
          org.apache.spark.sql.connector.expressions.filter.And]
        for (l <- v2ToV1(sub.left(), schema);
             r <- v2ToV1(sub.right(), schema)) yield FAnd(l, r)
      case "OR" =>
        val sub = p.asInstanceOf[
          org.apache.spark.sql.connector.expressions.filter.Or]
        for (l <- v2ToV1(sub.left(), schema);
             r <- v2ToV1(sub.right(), schema)) yield FOr(l, r)
      case _ => None
    }
  }

  def toColumn(f: Filter): Option[Column] = f match {
    case AlwaysTrue()  => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case EqualTo(a, v)            => Some(c(s"`$a`") === lit(v))
    case EqualNullSafe(a, v)      => Some(c(s"`$a`") <=> lit(v))
    case GreaterThan(a, v)        => Some(c(s"`$a`") > lit(v))
    case GreaterThanOrEqual(a, v) => Some(c(s"`$a`") >= lit(v))
    case LessThan(a, v)           => Some(c(s"`$a`") < lit(v))
    case LessThanOrEqual(a, v)    => Some(c(s"`$a`") <= lit(v))
    case In(a, vs)                => Some(c(s"`$a`").isin(vs.toSeq: _*))
    case IsNull(a)                => Some(c(s"`$a`").isNull)
    case IsNotNull(a)             => Some(c(s"`$a`").isNotNull)
    case StringStartsWith(a, v)   => Some(c(s"`$a`").startsWith(v))
    case StringEndsWith(a, v)     => Some(c(s"`$a`").endsWith(v))
    case StringContains(a, v)     => Some(c(s"`$a`").contains(v))
    case And(l, r) => for (lc <- toColumn(l); rc <- toColumn(r))
      yield lc && rc
    case Or(l, r)  => for (lc <- toColumn(l); rc <- toColumn(r))
      yield lc || rc
    case Not(x)    => toColumn(x).map(!_)
    case _ => None
  }
}

/** Column pruning + v1 filter pushdown over the manifest file list. The
  * pushed filters prune at TWO levels before any byte is read: whole
  * files via partition-tuple evaluation here ([[GraftPartitionPruning]]),
  * then row groups/pages via the parquet reader they are handed to. All
  * filters stay residual (Spark re-evaluates exactly). */
class GraftScanBuilder(spark: SparkSession, table: GraftTable,
                       options: CaseInsensitiveStringMap =
                         CaseInsensitiveStringMap.empty(),
                       batchUnreadable: Option[String] = None)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = table.state.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val tableCols = table.state.schema.fieldNames.toSet
    pushed = filters.filter(_.references.forall(tableCols.contains))
    filters // all residual: file/row-group pruning is a superset bound
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    val st = table.state
    val identityNames = st.partFields
      .filter(_.transform == "identity").map(_.srcName).toSet
    // readSchema order: data columns first, then identity partition
    // columns — the shape FileFormat readers emit (values appended from
    // the partition tuple)
    val reqData = StructType(required.fields.filterNot(f =>
      identityNames.contains(f.name)))
    val reqPart = StructType(required.fields.filter(f =>
      identityNames.contains(f.name)))
    // three pruning tiers, cheapest first: (1) DIR tier — manifest-list
    // field_summary bounds drop whole dirs WITHOUT opening their
    // manifests (planning cost scales with surviving dirs, the 100 TB
    // discipline); (2) partition-tuple tier per file; (3) column-bounds
    // stats tier per file
    val files = st.dirEntries
      .filter(d => pushed.forall(flt =>
        GraftPartitionPruning.dirMayMatch(d.summaries, st.partFields, flt)))
      .flatMap(st.filesOf)
      .filter(f => pushed.forall(flt =>
        GraftPartitionPruning.mayMatch(f, st.partFields, flt) &&
          GraftPartitionPruning.statsMayMatch(f, st.schema, flt)))
    new GraftScan(spark, table, reqData, reqPart, pushed, files, options,
      batchUnreadable)
  }
}

/** One planned snapshot scan = its own [[Batch]]: manifest-exact file
  * slices, per-file partition values restored from the spec tuple, and —
  * when the spec is bucket-transform and every file carries its bucket id
  * — `KeyGroupedPartitioning(bucket(N, src))` with one input partition
  * per live bucket, each [[HasPartitionKey]]. Two tables bucketed with
  * the same (N, family) then equi-join with ZERO Exchange once
  * `spark.sql.sources.v2.bucketing.enabled` is on (the catalog resolves
  * `bucket` to [[GraftBucketFunction]] for the compatibility proof).
  * Statistics report manifest-summed bytes/rows so the planner can
  * broadcast a small side without listing a single directory. */
class GraftScan(spark: SparkSession, table: GraftTable,
                reqData: StructType, reqPart: StructType,
                pushed: Array[Filter], files: Seq[SqlDataFile],
                options: CaseInsensitiveStringMap =
                  CaseInsensitiveStringMap.empty(),
                batchUnreadable: Option[String] = None)
    extends Scan with Batch
    with SupportsReportStatistics with SupportsReportPartitioning
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {

  private val st = table.state

  /** The post-runtime-filter file view: Spark calls [[filter]] on the
    * executed scan BEFORE [[planInputPartitions]], so a dynamic-partition-
    * pruning subquery (a join whose other side filters a partition-derived
    * column) drops whole files at runtime — the DSv2 analog of DPP. */
  private var liveFiles: Seq[SqlDataFile] = files

  /** Runtime-filterable columns: every partition-spec SOURCE. On the
    * bucket-grouped path the BUCKET source is excluded — shrinking the
    * key-grouped GROUP SET mid-plan would break the reported
    * KeyGroupedPartitioning (the SPJ contract) — but non-bucket sources
    * (e.g. the `days(ts)` of a `(days(ts), bucket(N, id))` table) still
    * runtime-filter: files drop WITHIN their bucket groups and empty
    * groups are retained, so the partitioning report stays exact while
    * a dim-filtered join skips the dropped days' files (VERDICT r14 #3). */
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] = {
    val fields =
      if (bucketGroups.isDefined)
        st.partFields.filterNot(_.transform.startsWith("bucket["))
      else st.partFields
    fields.map(_.srcName).distinct.map(
      org.apache.spark.sql.connector.expressions.Expressions
        .column).toArray
  }

  override def filter(predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    // conversion is BEST-EFFORT superset pruning: an unconvertible
    // predicate keeps every file (the engine re-applies exactly)
    val v1 = predicates.flatMap(GraftFilterColumns.v2ToV1(_, st.schema))
    liveFiles = liveFiles.filter(f => v1.forall(flt =>
      GraftPartitionPruning.mayMatch(f, st.partFields, flt)))
  }

  override def readSchema(): StructType =
    StructType(reqData.fields ++ reqPart.fields)

  override def toBatch: Batch = this

  /** `spark.readStream.table("graft.ns.t")` — incremental snapshot-chain
    * streaming ([[GraftMicroBatchStream]]); the scan's pushed filters and
    * column pruning carry over to every micro-batch. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new GraftMicroBatchStream(spark, table, reqData, reqPart, pushed,
      options)

  override def description(): String =
    s"graft native scan ${table.name()} snapshot=${st.snapshotId} " +
      s"files=${files.length} pushed=${pushed.mkString(",")}"

  override def estimateStatistics(): Statistics = new Statistics {
    // The broadcast-threshold comparison is against IN-MEMORY size, so
    // raw compressed parquet bytes understate the side by the compression
    // ratio (OOM risk on a "small" broadcast). Report the larger of the
    // conf-scaled file bytes (spark.sql.sources.fileCompressionFactor,
    // same knob Spark's file sources honor) and rows × decompressed row
    // width of the schema actually read.
    override def sizeInBytes(): OptionalLong = {
      val factor = org.apache.spark.sql.internal.SQLConf.get
        .fileCompressionFactor
      val scaled = (liveFiles.map(_.sizeBytes).sum * factor).toLong
      val rowEst = liveFiles.map(_.rows).sum * math.max(
        readSchema().defaultSize.toLong, 1L)
      OptionalLong.of(math.max(scaled, rowEst))
    }
    override def numRows(): OptionalLong =
      OptionalLong.of(liveFiles.map(_.rows).sum)
  }

  /** (bucket spec field name, source, N) when bucket-grouped planning is
    * on — requires every file to carry an int bucket tuple value. */
  private lazy val bucketGroups: Option[(String, Int, Seq[(Int, Seq[SqlDataFile])])] =
    st.bucket.flatMap { case (src, n) =>
      val fieldName = st.partFields
        .find(_.transform == s"bucket[$n]").map(_.specName)
      fieldName.flatMap { fn =>
        val keyed = files.map(f =>
          f.partition.get(fn).flatten.flatMap(_.toIntOption) -> f)
        if (keyed.exists(_._1.isEmpty)) None
        else Some((src, n,
          keyed.map { case (k, f) => (k.get, f) }
            .groupBy(_._1).view.mapValues(_.map(_._2)).toSeq.sortBy(_._1)))
      }.map { case (s2, n2, g) => (s2: String, n2, g) }
    } match {
      case Some((src, n, g)) => Some((src, n, g))
      case None => None
    }

  override def outputPartitioning(): Partitioning = bucketGroups match {
    case Some((src, n, groups)) =>
      new KeyGroupedPartitioning(
        Array(Expressions.bucket(n, src)), groups.size)
    case None => new UnknownPartitioning(liveFiles.length)
  }

  private def slices(fs: Seq[SqlDataFile]): Array[GraftFileSlice] =
    GraftParquetRead.slices(fs, reqPart)

  /** Spark's file-source sizing discipline
    * ([[GraftParquetRead.pack]] — shared with the micro-batch stream):
    * oversized files split, small files greedy-pack. */
  override def planInputPartitions(): Array[InputPartition] = {
    // the debt-only BATCH face fails deferred (planners probe scans they
    // never run; the extensions substitute the composed read before any
    // batch execution reaches here) — the STREAM face stays native
    batchUnreadable.foreach(m => throw new UnsupportedOperationException(m))
    bucketGroups match {
      case Some((_, _, groups)) =>
        // KeyGrouped partitions bind to bucket ids — files stay whole and
        // grouped (the SPJ contract); size skew inside a bucket is the
        // layout's own N-vs-data choice. Runtime filters drop files
        // WITHIN groups; a fully-filtered group stays as an EMPTY
        // partition so the group set matches the reported partitioning.
        val live = liveFiles.map(_.path).toSet
        groups.map { case (bucketId, fs) =>
          new KeyedGraftInputPartition(
            slices(fs.filter(f => live(f.path))), bucketId): InputPartition
        }.toArray
      case None =>
        GraftParquetRead.pack(spark, slices(liveFiles))
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    batchUnreadable.foreach(m => throw new UnsupportedOperationException(m))
    GraftParquetRead.readerFactory(spark, st.schema, st.partFields,
      reqData, reqPart, pushed)
  }
}

/** One parquet byte range + the identity-partition values its rows carry
  * (in the scan's required-partition-column order). `start`/`length`
  * bound the range (row groups align by midpoint), `fileSize` is the
  * whole file's. */
case class GraftFileSlice(path: String, start: Long, length: Long,
                          fileSize: Long,
                          partValues: Array[Any]) extends Serializable

class GraftInputPartition(val files: Array[GraftFileSlice])
    extends InputPartition

/** A bucket's worth of files: `partitionKey` is what
  * `KeyGroupedPartitioning` groups and the SPJ matcher compares. */
class KeyedGraftInputPartition(files: Array[GraftFileSlice],
                               val bucketId: Int)
    extends GraftInputPartition(files) with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucketId))
}

/** Executors run the SAME vectorized parquet closure Spark's own file
  * source ships ([[ParquetFileFormat.buildReaderWithPartitionValues]]):
  * whole-stage-friendly columnar batches when the schema supports them,
  * rows otherwise — one slice list in, one stream out. */
case class GraftReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow],
    columnar: Boolean) extends PartitionReaderFactory {

  private def rawIter(p: InputPartition): Iterator[InternalRow] =
    p.asInstanceOf[GraftInputPartition].files.iterator.flatMap { f =>
      readFunc(PartitionedFile(
        new GenericInternalRow(f.partValues),
        SparkPath.fromPathString(f.path), f.start, f.length,
        Array.empty[String], 0L, f.fileSize))
    }

  override def supportColumnarReads(p: InputPartition): Boolean = columnar

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val it = rawIter(p)
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { cur = it.next(); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }

  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] =
    new PartitionReader[ColumnarBatch] {
      // the parquet closure yields ColumnarBatch disguised as InternalRow
      // when built batch-capable — Spark's own FileScanRDD does this cast
      private val it = rawIter(p)
      private var cur: ColumnarBatch = _
      override def next(): Boolean =
        if (it.hasNext) { cur = it.next().asInstanceOf[ColumnarBatch]; true }
        else false
      override def get(): ColumnarBatch = cur
      override def close(): Unit = ()
    }
}

/** `INSERT INTO` = append, `INSERT OVERWRITE`/`TRUNCATE` = overwrite —
  * through the library's snapshot-commit faces via the V1 write fallback
  * (the incoming DataFrame is already resolved against the table schema;
  * partition layout, manifests, and commit rebase all happen in
  * [[SnapshotLakeCatalog]]). */
class GraftWriteBuilder(lake: SnapshotLakeCatalog, ns: String,
                        table: String, info: LogicalWriteInfo,
                        graftTable: GraftTable)
    extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false

  override def truncate(): WriteBuilder = { truncateFirst = true; this }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, overwrite: Boolean): Unit =
          if (truncateFirst || overwrite) lake.overwrite(ns, table, data)
          else lake.append(ns, table, data)
      }

    /** `df.writeStream.toTable("graft.ns.t")` — the exactly-once
      * streaming sink ([[GraftStreamingWrite]]). Every SPEC layout
      * streams natively: the fanout writer derives identity, time
      * (`days`/`months`/`hours`/`years`), `truncate[W]`, and
      * `bucket[N]` dir values per row, reproducing the batch writer's
      * Hive layout. Only legacy writeBucketed whole-table clustering
      * refuses (its layout is a frame-level repartition, not a per-row
      * derive) — rewrite via `writeBucketed`, or stream through
      * `foreachBatch` + `lake.append`. */
    override def toStreaming
        : org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
      val st = graftTable.state
      require(!st.clusterBucketed,
        s"${graftTable.name()}: the native streaming sink cannot " +
          "reproduce legacy writeBucketed whole-table clustering (a " +
          "frame-level repartition, not a per-row derive) — stream " +
          "into it with foreachBatch { (b, _) => lake.append(ns, t, " +
          "b) } instead")
      new GraftStreamingWrite(lake, ns, table, info.queryId(),
        info.schema(), st.partFields, truncateFirst)
    }
  }
}

/** Partition-tuple filter evaluation: a file is kept unless the tuple
  * PROVES no row can match. Identity fields compare typed values
  * (long/int/string/date), bucket fields compare the literal's spec hash,
  * time transforms (day/month/hour/year) compare the formatted dir string
  * lexicographically (the formats are chosen to order — the same property
  * [[graft.lake.SnapshotLakeCatalog.loadSlice]] exploits). Anything
  * unprovable keeps the file; the engine re-applies every filter exactly. */
object GraftPartitionPruning {
  /** Dir-string value → catalyst value for `dt` (the identity partition
    * column restore). */
  def catalystValue(raw: Option[String], dt: DataType): Any = raw match {
    case None => null
    case Some(s) => dt match {
      case StringType  => UTF8String.fromString(s)
      case LongType    => s.toLong
      case IntegerType => s.toInt
      case DateType    => java.time.LocalDate.parse(s).toEpochDay.toInt
      case other => throw new IllegalStateException(
        s"non-native identity partition type ${other.catalogString} " +
          "(sqlScanState should have composed)")
    }
  }

  /** STATS TIER (the loadSlice bounds discipline, through SQL): prune a
    * file when its manifest column bounds PROVE the pushed filter cannot
    * match — narrowly, for the types whose v1 literal domain is
    * unambiguous (long/int/string/date; timestamps ride the partition
    * tier and parquet row-group stats instead). Truncated string bounds
    * stay VALID bounds (lower = prefix, upper = incremented prefix —
    * spec-pinned), so comparing against them never wrong-prunes. A file
    * without bounds for the column is kept; the engine re-applies every
    * filter exactly. */
  def statsMayMatch(file: SqlDataFile, schema: StructType,
                    filter: Filter): Boolean = filter match {
    case FAnd(l, r) =>
      statsMayMatch(file, schema, l) && statsMayMatch(file, schema, r)
    case FOr(l, r) =>
      statsMayMatch(file, schema, l) || statsMayMatch(file, schema, r)
    case FNot(_) => true
    case EqualTo(a, v)            => boundStat(file, schema, a, v, 0)
    case GreaterThan(a, v)        => boundStat(file, schema, a, v, 1)
    case GreaterThanOrEqual(a, v) => boundStat(file, schema, a, v, 1)
    case LessThan(a, v)           => boundStat(file, schema, a, v, -1)
    case LessThanOrEqual(a, v)    => boundStat(file, schema, a, v, -1)
    case In(a, vs) => vs.exists(v => boundStat(file, schema, a, v, 0))
    case _ => true
  }

  /** op: 0 = equality (v must sit inside [lower, upper]), 1 = lower
    * bound (file survives iff upper >= v), -1 = upper bound (iff
    * lower <= v). Normalized domains: Long for long/int/date, UTF-8
    * bytes for string. Anything unprovable keeps the file. */
  private def boundStat(file: SqlDataFile, schema: StructType,
                        attr: String, v: Any, op: Int): Boolean = {
    if (v == null) return true
    val idx = schema.fieldNames.indexOf(attr)
    if (idx < 0) return true
    val ic = schema.fields(idx).dataType match {
      case LongType         => "long"
      case IntegerType      => "int"
      case StringType       => "string"
      case DateType         => "date"
      case TimestampType    => "timestamp"
      case TimestampNTZType => "timestamp"
      case _                => return true
    }
    val statId = idx + 1
    def decoded(side: Seq[(Int, Array[Byte])]): Option[Any] =
      side.find(_._1 == statId).map(_._2)
        .flatMap(graft.lake.AvroManifests.decodeBound(ic, _))
    def micros(i: java.time.Instant): Long =
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    val lit: Any = (ic, v) match {
      case ("long" | "int", n: Number) => n.longValue()
      case ("date", d: java.sql.Date) => d.toLocalDate.toEpochDay
      case ("date", d: java.time.LocalDate) => d.toEpochDay
      case ("string", s: String) =>
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      case ("string", u: UTF8String) => u.getBytes
      // timestamp bounds (VERDICT r14 #5): the manifest carries epoch
      // micros; every literal form Spark pushes normalizes to the same
      // domain (UTC session mandated, so NTZ LocalDateTime is unambiguous)
      case ("timestamp", t: java.sql.Timestamp) => micros(t.toInstant)
      case ("timestamp", i: java.time.Instant) => micros(i)
      case ("timestamp", l: java.time.LocalDateTime) =>
        micros(l.toInstant(java.time.ZoneOffset.UTC))
      case ("timestamp", m: java.lang.Long) => m.longValue()
      case _ => return true
    }
    def cmp(bound: Any): Option[Int] = (bound, lit) match {
      case (b: Long, l: Long) => Some(java.lang.Long.compare(b, l))
      case (b: Int, l: Long)  => Some(java.lang.Long.compare(b.toLong, l))
      case (b: Array[Byte], l: Array[Byte]) =>
        Some(graft.lake.AvroManifests.compareUnsigned(b, l))
      case _ => None
    }
    val lowerOk = decoded(file.lower).flatMap(cmp) // lower vs lit
    val upperOk = decoded(file.upper).flatMap(cmp) // upper vs lit
    op match {
      case 0  => lowerOk.forall(_ <= 0) && upperOk.forall(_ >= 0)
      case 1  => upperOk.forall(_ >= 0)
      case -1 => lowerOk.forall(_ <= 0)
      case _  => true
    }
  }

  def mayMatch(file: SqlDataFile, fields: Seq[SqlPartField],
               filter: Filter): Boolean = filter match {
    case FAnd(l, r) => mayMatch(file, fields, l) && mayMatch(file, fields, r)
    case FOr(l, r)  => mayMatch(file, fields, l) || mayMatch(file, fields, r)
    case FNot(_)    => true
    case AlwaysTrue() => true
    case EqualTo(a, v)            => boundCheck(file, fields, a, v, 0)
    case GreaterThan(a, v)        => boundCheck(file, fields, a, v, 1)
    case GreaterThanOrEqual(a, v) => boundCheck(file, fields, a, v, 1)
    case LessThan(a, v)           => boundCheck(file, fields, a, v, -1)
    case LessThanOrEqual(a, v)    => boundCheck(file, fields, a, v, -1)
    case In(a, vs) =>
      vs.exists(v => boundCheck(file, fields, a, v, 0))
    case IsNull(a) => fieldOf(fields, a, "identity") match {
      case Some(f) => file.partition.get(f.specName).forall(_.isEmpty)
      case None    => true
    }
    case IsNotNull(a) => fieldOf(fields, a, "identity") match {
      case Some(f) => file.partition.get(f.specName).forall(_.isDefined)
      case None    => true
    }
    case _ => true
  }

  private def fieldOf(fields: Seq[SqlPartField], attr: String,
                      transform: String): Option[SqlPartField] =
    fields.find(f => f.srcName == attr && (transform match {
      case "time" => Set("day", "month", "hour", "year")(f.transform)
      case "bucket" => f.transform.startsWith("bucket[")
      case t => f.transform == t
    }))

  /** `op`: 0 = equality, 1 = lower bound (>=, conservative for >), -1 =
    * upper bound. Returns false ONLY on a provable miss. */
  private def boundCheck(file: SqlDataFile, fields: Seq[SqlPartField],
                         attr: String, v: Any, op: Int): Boolean = {
    if (v == null) return true
    // identity: typed compare
    fieldOf(fields, attr, "identity").foreach { f =>
      file.partition.get(f.specName).flatten.foreach { dir =>
        typedCompare(dir, v, f.srcType).foreach { c =>
          if (op == 0 && c != 0) return false
          if (op == 1 && c < 0) return false
          if (op == -1 && c > 0) return false
        }
      }
    }
    // bucket: equality only — the hash is order-destroying by design
    if (op == 0) fieldOf(fields, attr, "bucket").foreach { f =>
      file.partition.get(f.specName).flatten
        .flatMap(_.toIntOption).foreach { fileBucket =>
        val n = f.transform.stripPrefix("bucket[").stripSuffix("]").toInt
        bucketOf(v, f.srcType, n).foreach { b =>
          if (b != fileBucket) return false
        }
      }
    }
    // time transforms: lexicographic on the formatted dir string
    fieldOf(fields, attr, "time").foreach { f =>
      file.partition.get(f.specName).flatten.foreach { dir =>
        formatTime(v, f.transform).foreach { lit =>
          val c = dir.compareTo(lit)
          if (op == 0 && c != 0) return false
          if (op == 1 && c < 0) return false
          if (op == -1 && c > 0) return false
        }
      }
    }
    true
  }

  private def typedCompare(dir: String, v: Any, dt: DataType): Option[Int] =
    try dt match {
      case LongType | IntegerType =>
        val lit = v match {
          case n: Number => n.longValue()
          case _         => return None
        }
        Some(java.lang.Long.compare(dir.toLong, lit))
      case StringType =>
        // Spark orders strings by UTF-8 BYTES (UTF8String.binaryCompare),
        // not UTF-16 code units — the orders diverge for supplementary
        // code points vs U+E000–U+FFFF, and a code-unit compare here
        // would WRONGLY prune a matching file (not merely keep extra).
        val litBytes: Array[Byte] = v match {
          case s: String => s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          case u: UTF8String => u.getBytes
          case _ => return None
        }
        Some(graft.lake.AvroManifests.compareUnsigned(
          dir.getBytes(java.nio.charset.StandardCharsets.UTF_8), litBytes))
      case DateType =>
        val lit = v match {
          case d: java.sql.Date => d.toLocalDate.toEpochDay
          case d: java.time.LocalDate => d.toEpochDay
          case _ => return None
        }
        Some(java.lang.Long.compare(
          java.time.LocalDate.parse(dir).toEpochDay, lit))
      case _ => None
    } catch { case _: IllegalArgumentException => None }

  private def bucketOf(v: Any, dt: DataType, n: Int): Option[Int] =
    try dt match {
      case LongType | IntegerType => v match {
        case num: Number => Some(IcebergBucket.bucketLong(num.longValue(), n))
        case _ => None
      }
      case StringType => v match {
        case s: String => Some(IcebergBucket.bucketBytes(
          s.getBytes(java.nio.charset.StandardCharsets.UTF_8), n))
        case u: UTF8String => Some(IcebergBucket.bucketBytes(u.getBytes, n))
        case _ => None
      }
      case DateType => v match {
        case d: java.sql.Date =>
          Some(IcebergBucket.bucketLong(d.toLocalDate.toEpochDay, n))
        case d: java.time.LocalDate =>
          Some(IcebergBucket.bucketLong(d.toEpochDay, n))
        case _ => None
      }
      case TimestampType | TimestampNTZType => toInstant(v)
        .map(i => IcebergBucket.bucketLong(
          java.util.concurrent.TimeUnit.SECONDS.toMicros(i.getEpochSecond) +
            i.getNano / 1000L, n))
      case _ => None
    } catch { case _: IllegalArgumentException => None }

  private def toInstant(v: Any): Option[java.time.Instant] = v match {
    case t: java.sql.Timestamp => Some(t.toInstant)
    case i: java.time.Instant  => Some(i)
    case l: java.time.LocalDateTime =>
      Some(l.toInstant(java.time.ZoneOffset.UTC))
    // the RUNTIME-filter path hands over CATALYST values: a timestamp
    // literal arrives as epoch MICROS (only ever reached for filters on
    // a time-transform SOURCE column, so the domain is unambiguous)
    case m: java.lang.Long => Some(java.time.Instant.ofEpochSecond(
      Math.floorDiv(m, 1000000L), Math.floorMod(m, 1000000L) * 1000L))
    case _ => None
  }

  /** DIR TIER (VERDICT r14 #2): prune a whole data directory off its
    * manifest-list `field_summary` bounds — evaluated BEFORE the dir's
    * manifest is ever opened, so planning cost scales with surviving
    * dirs. Same conservative contract as the file tiers: a dir is
    * dropped only on a PROVABLE miss; missing/unparseable summaries keep
    * it. Identity fields compare in the manifest carrier domain
    * (long/int numeric, everything else UTF-8 bytes of the path value —
    * ISO date strings order correctly by construction), time transforms
    * compare the formatted literal, bucket fields range-check the
    * literal's spec hash on equality. */
  def dirMayMatch(
      summaries: Option[Map[String, graft.lake.AvroManifests.FieldSummary]],
      fields: Seq[SqlPartField], filter: Filter): Boolean = summaries match {
    case None => true
    case Some(sm) => filter match {
      case FAnd(l, r) =>
        dirMayMatch(summaries, fields, l) && dirMayMatch(summaries, fields, r)
      case FOr(l, r) =>
        dirMayMatch(summaries, fields, l) || dirMayMatch(summaries, fields, r)
      case FNot(_)      => true
      case AlwaysTrue() => true
      case EqualTo(a, v)            => dirBound(sm, fields, a, v, 0)
      case GreaterThan(a, v)        => dirBound(sm, fields, a, v, 1)
      case GreaterThanOrEqual(a, v) => dirBound(sm, fields, a, v, 1)
      case LessThan(a, v)           => dirBound(sm, fields, a, v, -1)
      case LessThanOrEqual(a, v)    => dirBound(sm, fields, a, v, -1)
      case In(a, vs) => vs.exists(v => dirBound(sm, fields, a, v, 0))
      case IsNull(a) => fieldOf(fields, a, "identity") match {
        case Some(f) => sm.get(f.specName).forall(_.containsNull)
        case None    => true
      }
      case _ => true
    }
  }

  /** The manifest partition carrier type of a spec field — MUST mirror
    * the write side ([[graft.lake.SnapshotLakeCatalog]]'s
    * manifestPartitionFields): identity long/int keep their numerics,
    * every other identity and all path-valued transforms ride strings,
    * bucket tuples are ints. */
  private def dirCarrier(f: SqlPartField): String = f.transform match {
    case "identity" => f.srcType match {
      case LongType    => "long"
      case IntegerType => "int"
      case _           => "string"
    }
    case t if t.startsWith("bucket[") => "int"
    case _ => "string"
  }

  private def dirBound(
      sm: Map[String, graft.lake.AvroManifests.FieldSummary],
      fields: Seq[SqlPartField], attr: String, v: Any, op: Int): Boolean = {
    if (v == null) return true
    def rangeKeeps(fs: graft.lake.AvroManifests.FieldSummary,
                   ic: String, lit: Any): Boolean = {
      def cmp(bound: Any): Option[Int] = (bound, lit) match {
        case (b: Long, l: Long) => Some(java.lang.Long.compare(b, l))
        case (b: Int, l: Long)  => Some(java.lang.Long.compare(b.toLong, l))
        case (b: Array[Byte], l: Array[Byte]) =>
          Some(graft.lake.AvroManifests.compareUnsigned(b, l))
        case _ => None
      }
      def side(b: Option[Array[Byte]]): Option[Int] = b
        .flatMap(graft.lake.AvroManifests.decodeBound(ic, _)).flatMap(cmp)
      val lower = side(fs.lowerBound) // lower vs lit
      val upper = side(fs.upperBound) // upper vs lit
      op match {
        case 0  => lower.forall(_ <= 0) && upper.forall(_ >= 0)
        case 1  => upper.forall(_ >= 0)
        case -1 => lower.forall(_ <= 0)
        case _  => true
      }
    }
    // identity: typed range compare in the carrier domain
    fieldOf(fields, attr, "identity").foreach { f =>
      sm.get(f.specName).foreach { fs =>
        val ic = dirCarrier(f)
        val lit: Option[Any] = (ic, v) match {
          case ("long" | "int", n: Number) => Some(n.longValue())
          case ("string", str: String) => Some(str.getBytes(
            java.nio.charset.StandardCharsets.UTF_8))
          case ("string", u: UTF8String) => Some(u.getBytes)
          case ("string", d: java.sql.Date) => Some(d.toLocalDate.toString
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          case ("string", d: java.time.LocalDate) => Some(d.toString
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          case _ => None
        }
        lit.foreach(l => if (!rangeKeeps(fs, ic, l)) return false)
      }
    }
    // bucket: equality only — range-check the literal's spec hash
    if (op == 0) fieldOf(fields, attr, "bucket").foreach { f =>
      sm.get(f.specName).foreach { fs =>
        val n = f.transform.stripPrefix("bucket[").stripSuffix("]").toInt
        bucketOf(v, f.srcType, n).foreach { b =>
          if (!rangeKeeps(fs, "int", b.toLong)) return false
        }
      }
    }
    // time transforms: formatted-literal bytes vs string bounds
    fieldOf(fields, attr, "time").foreach { f =>
      sm.get(f.specName).foreach { fs =>
        formatTime(v, f.transform).foreach { lit =>
          if (!rangeKeeps(fs, "string", lit.getBytes(
              java.nio.charset.StandardCharsets.UTF_8))) return false
        }
      }
    }
    true
  }

  /** Format a filter literal the way the write layout formatted the dir
    * value (UTC — the engine mandates a UTC session). */
  private def formatTime(v: Any, transform: String): Option[String] = {
    val pattern = transform match {
      case "day"   => "yyyy-MM-dd"
      case "month" => "yyyy-MM"
      case "hour"  => "yyyy-MM-dd-HH"
      case "year"  => "yyyy"
      case _       => return None
    }
    val fmt = java.time.format.DateTimeFormatter.ofPattern(pattern)
      .withZone(java.time.ZoneOffset.UTC)
    v match {
      case d: java.sql.Date => Some(fmt.format(d.toLocalDate))
      case d: java.time.LocalDate => Some(fmt.format(d))
      case other => toInstant(other).map(fmt.format)
    }
  }
}
