package graft.sql

import graft.lake.SnapshotLakeCatalog
import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** One committed task's output: the file it wrote and its row count. */
case class GraftFileMessage(path: String, rows: Long)
    extends WriterCommitMessage

/** The native streaming SINK of the lake —
  * `df.writeStream.toTable("graft.ns.t")` — closing the loop the
  * micro-batch read opened: a lake table is both a streaming source and
  * a streaming sink through plain Spark SQL surfaces, no foreachBatch
  * glue.
  *
  * Exactly-once: executors write one parquet file per task into a fresh
  * per-epoch-attempt directory (Spark's commit coordinator picks one
  * winner per partition; losers abort and delete their file), then
  * [[SnapshotLakeCatalog.commitStreamingEpoch]] publishes the directory
  * as ONE snapshot and records the epoch marker in the SAME atomic
  * metadata swap — a replayed epoch after a restart finds the marker and
  * publishes nothing. Files from crashed attempts whose abort never ran
  * are pruned against the coordinated winner list before the manifest
  * scan. Output mode `append` commits append snapshots; `complete`
  * (truncate) makes each epoch an overwrite snapshot.
  *
  * Scale shape: the write path is executor-parallel parquet (the same
  * `ParquetFileFormat` write support Spark's own file sink uses, one
  * file per task, vectorizable downstream); the driver handles only the
  * commit — manifest from footer stats, one CAS swap per epoch. An
  * epoch's cost is its own rows; table size never enters.
  *
  * Partitioned/bucketed targets are refused loudly (their snapshot dirs
  * carry a Hive `k=v` layout the per-task writers don't produce) — route
  * those through `foreachBatch` + `lake.append`, which shapes layout per
  * batch. */
class GraftStreamingWrite(lake: SnapshotLakeCatalog, ns: String,
                          table: String, queryId: String,
                          schema: StructType, replaceEach: Boolean)
    extends StreamingWrite {

  /** The current epoch attempt's directory — assigned when Spark builds
    * the epoch's writer factory (once per micro-batch, just before its
    * execution; micro-batches of one query run strictly one at a time).
    * Fresh per ATTEMPT: a replayed epoch writes into its own directory
    * and the commit-time marker decides whether it publishes. */
  @volatile private var epochDir: String = _

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    epochDir =
      s"stream-${System.nanoTime()}-${java.util.UUID.randomUUID()}"
    val spark = SparkSession.active
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    // the same write support Spark's file sink ships — carries the
    // session's parquet conf (compression, TIMESTAMP_MICROS output type
    // = the lake's stats-bearing default) into the serialized job conf
    val factory = new ParquetFileFormat()
      .prepareWrite(spark, job, Map.empty, schema)
    new GraftStreamingDataWriterFactory(
      lake.streamingDir(ns, table, epochDir).toString, schema, factory,
      new SerializableConfiguration(job.getConfiguration))
  }

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect { case m: GraftFileMessage => m }
    if (files.isEmpty || files.forall(_.rows == 0L)) {
      // an empty epoch publishes nothing (and leaves the marker alone:
      // replaying an empty epoch is itself a no-op)
      abort(epochId, messages)
      return
    }
    lake.commitStreamingEpoch(ns, table, queryId, epochId, epochDir,
      files.map(_.path).toSet, replaceEach)
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit = {
    val dir = lake.streamingDir(ns, table, epochDir)
    if (java.nio.file.Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      scala.util.Using.resource(java.nio.file.Files.walk(dir))(
        _.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.toSeq)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}

/** Executor side: one parquet file per task, written through Spark's own
  * parquet [[OutputWriterFactory]]. Task abort deletes the file, so only
  * commit-coordinated winners survive for the driver's manifest. */
class GraftStreamingDataWriterFactory(dir: String, schema: StructType,
                                      factory: OutputWriterFactory,
                                      conf: SerializableConfiguration)
    extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] = {
    val tac = new TaskAttemptContextImpl(conf.value,
      new TaskAttemptID(new TaskID(new JobID("graft-stream", 0),
        TaskType.MAP, partitionId), (taskId % Int.MaxValue).toInt))
    val path = s"$dir/part-$epochId-$partitionId-" +
      s"${java.util.UUID.randomUUID()}${factory.getFileExtension(tac)}"
    val writer = factory.newInstance(path, schema, tac)
    new DataWriter[InternalRow] {
      private var rows = 0L
      override def write(record: InternalRow): Unit = {
        writer.write(record); rows += 1
      }
      override def commit(): WriterCommitMessage = {
        writer.close()
        GraftFileMessage(path, rows)
      }
      override def abort(): Unit = {
        writer.close()
        java.nio.file.Files.deleteIfExists(java.nio.file.Path.of(path))
      }
      override def close(): Unit = ()
    }
  }
}
