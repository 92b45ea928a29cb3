package graft.sql

import graft.TestSpark
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** `spark.readStream.table("graft.ns.t")` — the micro-batch streaming
  * read of the snapshot lake ([[GraftMicroBatchStream]]): snapshot-id
  * offsets, append-only exactness, checkpoint restart, admission-control
  * pacing, and the loud-failure contract on non-append history. */
class GraftStreamReadSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val cat: String = {
    val wh = Files.createTempDirectory("graft-stream-").toString
    spark.conf.set("spark.sql.catalog.gstream", "graft.sql.GraftSqlCatalog")
    spark.conf.set("spark.sql.catalog.gstream.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gstream.s")
    "gstream"
  }

  /** Drain the table's stream with Trigger.AvailableNow through a
    * foreachBatch collector (the memory sink cannot recover from a
    * checkpoint, and checkpoint RESTART is exactly what these tests
    * prove); returns (rows as (id, v), batches that carried input). */
  private def drain(table: String, checkpoint: String,
                    options: Map[String, String] = Map.empty,
                    filter: Option[String] = None)
      : (Seq[(Long, String)], Int) = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    var reader = spark.readStream
    options.foreach { case (k, v) => reader = reader.option(k, v) }
    val df0 = reader.table(table)
    val df = filter.map(df0.filter).getOrElse(df0)
    val q = df.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.collect().map(r => (r.getLong(0), r.getString(1)))
        if (rows.nonEmpty) {
          buf.synchronized { buf ++= rows }
          batches.incrementAndGet()
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    (buf.synchronized(buf.toSeq.sorted), batches.get())
  }

  test("full-history stream, then checkpoint restart reads ONLY new " +
    "appends (snapshot-id offsets survive the restart)") {
    val t = s"$cat.s.basic"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"INSERT INTO $t VALUES (3, 'c')")
    val ckpt = Files.createTempDirectory("ckpt-basic-").toString
    val (rows1, _) = drain(t, ckpt)
    assert(rows1 == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // restart from the SAME checkpoint: only the new snapshot streams
    spark.sql(s"INSERT INTO $t VALUES (4, 'd')")
    val (rows2, batches2) = drain(t, ckpt)
    assert(rows2 == Seq((4L, "d")), s"restart re-read old data: $rows2")
    assert(batches2 == 1)
    // nothing new: a third drain emits zero batches
    val (rows3, batches3) = drain(t, ckpt)
    assert(rows3.isEmpty && batches3 == 0)
  }

  test("maxFilesPerTrigger paces at snapshot granularity; " +
    "stream-from-latest starts past existing history") {
    val t = s"$cat.s.paced"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    (1 to 3).foreach(i => spark.sql(s"INSERT INTO $t VALUES ($i, 'v$i')"))
    val (rows, batches) = drain(t,
      Files.createTempDirectory("ckpt-paced-").toString,
      Map("maxFilesPerTrigger" -> "1"))
    assert(rows.map(_._1) == Seq(1L, 2L, 3L))
    assert(batches == 3, s"expected one batch per snapshot, got $batches")
    // from-latest: existing snapshots are the start position, not data
    val ckpt2 = Files.createTempDirectory("ckpt-latest-").toString
    val (empty, _) = drain(t, ckpt2, Map("stream-from-latest" -> "true"))
    assert(empty.isEmpty)
    spark.sql(s"INSERT INTO $t VALUES (9, 'new')")
    val (fresh, _) = drain(t, ckpt2, Map("stream-from-latest" -> "true"))
    assert(fresh == Seq((9L, "new")))
  }

  test("a DELETE snapshot fails the stream loudly; " +
    "streaming-skip-delete-snapshots streams appends only") {
    val t = s"$cat.s.deleted"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"DELETE FROM $t WHERE id = 1")
    spark.sql(s"INSERT INTO $t VALUES (3, 'c')")
    val e = intercept[StreamingQueryException](
      drain(t, Files.createTempDirectory("ckpt-del-").toString))
    assert(e.getMessage.contains("streaming-skip-delete-snapshots") ||
      Option(e.getCause).exists(
        _.getMessage.contains("streaming-skip-delete-snapshots")),
      e.getMessage)
    val (rows, _) = drain(t,
      Files.createTempDirectory("ckpt-del2-").toString,
      Map("streaming-skip-delete-snapshots" -> "true"))
    // appends only: the MOR-deleted row still streamed (emitted rows
    // cannot be retracted — the documented skip semantics)
    assert(rows == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("an OVERWRITE snapshot fails loudly; skip option skips its " +
    "re-added directories (no duplicated rows)") {
    val t = s"$cat.s.overwritten"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a')")
    spark.sql(s"INSERT OVERWRITE $t VALUES (2, 'b')")
    spark.sql(s"INSERT INTO $t VALUES (3, 'c')")
    val e = intercept[StreamingQueryException](
      drain(t, Files.createTempDirectory("ckpt-ow-").toString))
    assert(e.getMessage.contains("streaming-skip-overwrite-snapshots") ||
      Option(e.getCause).exists(
        _.getMessage.contains("streaming-skip-overwrite-snapshots")),
      e.getMessage)
    val (rows, _) = drain(t,
      Files.createTempDirectory("ckpt-ow2-").toString,
      Map("streaming-skip-overwrite-snapshots" -> "true"))
    assert(rows == Seq((1L, "a"), (3L, "c")), s"overwrite leaked: $rows")
  }

  test("pushed filters prune each micro-batch (partition tier), and a " +
    "filtered stream stays exact across appends") {
    val t = s"$cat.s.parted"
    spark.sql(s"CREATE TABLE $t (id BIGINT, lang STRING) " +
      "PARTITIONED BY (lang)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'en'), (2, 'de')")
    spark.sql(s"INSERT INTO $t VALUES (3, 'en'), (4, 'fr')")
    // pins CURRENT Spark behavior: the planner builds streaming scans
    // WITHOUT pushFilters (parity with Iceberg's/Kafka's streaming
    // reads), so the source ingests every appended file (4 rows) and
    // the filter applies above the scan. The per-batch pruning plumbing
    // (partition tuple + column bounds over `pushed`) is shared with
    // the batch scan and lights up the release Spark starts pushing —
    // this assertion flipping to 2 is that release's tell.
    val read = new java.util.concurrent.atomic.AtomicLong(0)
    val q = spark.readStream.table(t).filter("lang = 'en'")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect(); ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("ckpt-part-").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q.recentProgress.foreach(p => read.addAndGet(p.numInputRows))
    assert(read.get() == 4L,
      s"streaming scan read ${read.get()} rows — if this is 2, Spark " +
        "now pushes filters into streaming scans: move this pin to " +
        "assert the pruned count and update the scaladoc")
    // the filtered results are exact regardless
    val (rows, _) = drain(t,
      Files.createTempDirectory("ckpt-part2-").toString,
      filter = Some("lang = 'en'"))
    assert(rows == Seq((1L, "en"), (3L, "en")))
  }

  test("schema-evolution history refuses the stream with an actionable " +
    "message (native-read discipline, per batch)") {
    val t = s"$cat.s.evolved"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a')")
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (extra DOUBLE)")
    spark.sql(s"INSERT INTO $t VALUES (2, 'b', 2.5)")
    val e = intercept[Exception](
      drain(t, Files.createTempDirectory("ckpt-evo-").toString))
    def mentions(t0: Throwable): Boolean = t0 != null &&
      (Option(t0.getMessage).exists(m => m.contains("evolution") ||
        m.contains("composed")) || mentions(t0.getCause))
    assert(mentions(e), e.toString)
  }

  test("streaming-start-snapshot-id starts past a named snapshot") {
    val t = s"$cat.s.fromid"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a')")
    val sid = spark.sql(
      s"SELECT max(snapshot_id) FROM $t.snapshots").collect().head.getLong(0)
    spark.sql(s"INSERT INTO $t VALUES (2, 'b')")
    val (rows, _) = drain(t,
      Files.createTempDirectory("ckpt-fromid-").toString,
      Map("streaming-start-snapshot-id" -> sid.toString))
    assert(rows == Seq((2L, "b")))
  }
}
