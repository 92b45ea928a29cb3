package graft.sql

import graft.functions.IcebergBucket
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The catalog-level `bucket` function (Spark FunctionCatalog face) — the
  * SAME murmur3-seed-0 kernel as the write path's codegen'd
  * [[graft.functions.IcebergBucket]] expression, exposed the way Spark's
  * storage-partitioned join machinery needs it: when two scans report
  * `KeyGroupedPartitioning(bucket(N, k))`, Catalyst resolves the `bucket`
  * transform against the table's catalog ([[GraftSqlCatalog.loadFunction]])
  * and compares the BOUND functions' `canonicalName` to decide the sides
  * are co-partitioned — only then does the equi-join plan without an
  * Exchange. One kernel, two faces: the spec pins them to the same
  * Appendix-B vectors (IcebergBucketSpec), so a mismatch is impossible by
  * construction.
  *
  * Argument shape follows Spark's own bucket transform
  * (`Expressions.bucket(N, col)`): `(numBuckets INT, value)`. */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, value): Iceberg bucket transform " +
      "(murmur3_x86_32 seed 0 over the spec's type byte forms)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets, value), got ${inputType.simpleString}")
    require(inputType.fields(0).dataType == IntegerType,
      s"bucket's first argument is the INT bucket count, got " +
        inputType.fields(0).dataType.catalogString)
    val vt = inputType.fields(1).dataType
    vt match {
      case IntegerType | LongType | DateType | TimestampType |
           TimestampNTZType | StringType | BinaryType | _: DecimalType =>
        GraftBoundBucket(vt)
      case dt => throw new UnsupportedOperationException(
        s"bucket has no spec byte form for ${dt.catalogString} " +
          "(int/long/date/timestamp/string/binary/decimal only)")
    }
  }
}

/** The bound half: pure, deterministic, null-on-null — mirrors
  * [[graft.functions.IcebergBucket]]'s eval exactly. `canonicalName` is
  * intentionally value-type-INSENSITIVE across the int/long widening
  * family (the spec's `hashInt(v) == hashLong(v)` identity rule): a table
  * bucketed on an INT key co-partitions with one bucketed on a LONG key. */
case class GraftBoundBucket(valueType: DataType)
    extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] =
    Array(IntegerType, valueType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = {
    // the widening identity: int/date hash as longs, so the canonical
    // form groups them with long/timestamp
    val family = valueType match {
      case IntegerType | LongType | DateType | TimestampType |
           TimestampNTZType => "long"
      case StringType => "string"
      case BinaryType => "binary"
      case _: DecimalType => "decimal"
      case other => other.catalogString
    }
    s"graft.bucket($family)"
  }
  override def isResultNullable: Boolean = true

  override def produceResult(input: InternalRow): Integer =
    if (input.isNullAt(0) || input.isNullAt(1)) null
    else {
      val n = input.getInt(0)
      valueType match {
        case IntegerType | DateType =>
          IcebergBucket.bucketLong(input.getInt(1).toLong, n)
        case LongType | TimestampType | TimestampNTZType =>
          IcebergBucket.bucketLong(input.getLong(1), n)
        case StringType =>
          IcebergBucket.bucketBytes(input.getUTF8String(1).getBytes, n)
        case BinaryType =>
          IcebergBucket.bucketBytes(input.getBinary(1), n)
        case d: DecimalType =>
          IcebergBucket.bucketBytes(input.getDecimal(1, d.precision, d.scale)
            .toJavaBigDecimal.unscaledValue.toByteArray, n)
        case other => throw new IllegalStateException(
          s"unreachable: bind-checked input ${other.catalogString}")
      }
    }
}
