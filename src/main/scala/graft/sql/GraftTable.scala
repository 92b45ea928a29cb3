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
    extends Table with SupportsRead with SupportsWrite {

  private[sql] lazy val state: SqlScanState =
    lake.sqlScanState(ns, tableName, pinnedSnapshot)

  private[sql] def needsComposition: Boolean = state.composed.isDefined

  /** The composed read plan (library load/loadAt), pinned to the SAME
    * snapshot [[state]] planned against. */
  private[sql] def composedFrame(): DataFrame =
    if (state.snapshotId >= 0)
      lake.composedFrame(ns, tableName, Some(state.snapshotId))
    else lake.composedFrame(ns, tableName, None)

  override def name(): String = s"$catalogName.$ns.$tableName"
  override def schema(): StructType = state.schema

  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

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
    if (needsComposition)
      throw new UnsupportedOperationException(
        s"${name()}: the native SQL scan cannot represent this table — " +
          s"${state.composed.get}. Install graft.GraftExtensions " +
          "(spark.sql.extensions) for the composed read, or fold the " +
          "state away (compact()).")
    new GraftScanBuilder(SparkSession.active, this)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinnedSnapshot.isEmpty,
      s"${name()}: cannot write to a time-travel (VERSION/TIMESTAMP AS " +
        "OF) relation")
    new GraftWriteBuilder(lake, ns, tableName)
  }
}

/** Column pruning + v1 filter pushdown over the manifest file list. The
  * pushed filters prune at TWO levels before any byte is read: whole
  * files via partition-tuple evaluation here ([[GraftPartitionPruning]]),
  * then row groups/pages via the parquet reader they are handed to. All
  * filters stay residual (Spark re-evaluates exactly). */
class GraftScanBuilder(spark: SparkSession, table: GraftTable)
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
    val files = st.files.filter(f => pushed.forall(flt =>
      GraftPartitionPruning.mayMatch(f, st.partFields, flt)))
    new GraftScan(spark, table, reqData, reqPart, pushed, files)
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
                pushed: Array[Filter], files: Seq[SqlDataFile])
    extends Scan with Batch
    with SupportsReportStatistics with SupportsReportPartitioning {

  private val st = table.state

  override def readSchema(): StructType =
    StructType(reqData.fields ++ reqPart.fields)

  override def toBatch: Batch = this

  override def description(): String =
    s"graft native scan ${table.name()} snapshot=${st.snapshotId} " +
      s"files=${files.length} pushed=${pushed.mkString(",")}"

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(files.map(_.sizeBytes).sum)
    override def numRows(): OptionalLong =
      OptionalLong.of(files.map(_.rows).sum)
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
    case None => new UnknownPartitioning(files.length)
  }

  private def slices(fs: Seq[SqlDataFile]): Array[GraftFileSlice] =
    fs.map { f =>
      val values: Array[Any] = reqPart.fields.map { pf =>
        GraftPartitionPruning.catalystValue(
          f.partition.get(pf.name).flatten, pf.dataType)
      }
      GraftFileSlice(f.path, f.sizeBytes, values)
    }.toArray

  override def planInputPartitions(): Array[InputPartition] =
    bucketGroups match {
      case Some((_, _, groups)) =>
        groups.map { case (bucketId, fs) =>
          new KeyedGraftInputPartition(slices(fs), bucketId): InputPartition
        }.toArray
      case None =>
        files.map(f =>
          new GraftInputPartition(slices(Seq(f))): InputPartition).toArray
    }

  override def createReaderFactory(): PartitionReaderFactory = {
    val identityNames = st.partFields
      .filter(_.transform == "identity").map(_.srcName).toSet
    val dataSchema = StructType(
      st.schema.fields.filterNot(f => identityNames.contains(f.name)))
    val dataCols = dataSchema.fieldNames.toSet
    val parquetFilters = pushed
      .filter(_.references.forall(dataCols.contains)).toSeq
    val fmt = new ParquetFileFormat()
    val columnar = fmt.supportBatch(spark, readSchema())
    val readFunc = fmt.buildReaderWithPartitionValues(
      spark, dataSchema, reqPart, reqData, parquetFilters,
      // the format requires the caller to declare the batch contract
      // explicitly (it must agree with supportBatch on the same schema)
      Map(org.apache.spark.sql.execution.datasources.FileFormat
        .OPTION_RETURNING_BATCH -> columnar.toString),
      spark.sessionState.newHadoopConfWithOptions(Map.empty))
    GraftReaderFactory(readFunc, columnar)
  }
}

/** One parquet file + the identity-partition values its rows carry (in
  * the scan's required-partition-column order). */
case class GraftFileSlice(path: String, length: Long,
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
        SparkPath.fromPathString(f.path), 0L, f.length))
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
class GraftWriteBuilder(lake: SnapshotLakeCatalog, ns: String, table: String)
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
      case StringType => v match {
        case s: String => Some(dir.compareTo(s))
        case u: UTF8String => Some(dir.compareTo(u.toString))
        case _ => None
      }
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
    case _ => None
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
