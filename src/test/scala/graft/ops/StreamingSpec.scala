package graft.ops

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp
import scala.jdk.CollectionConverters._

// top-level so the Dataset encoder needs no outer-instance capture
final case class Ev(ts: Timestamp, user_id: Long,
                    event_type: String, value: Double)

/** True Structured Streaming behavior of the C7 operators: the same
  * transforms that the oracle verifies in batch run over readStream input,
  * watermarks drop late data, and stream results match batch results. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private def ev(hhmm: String, user: Long = 1L, typ: String = "view",
                 v: Double = 1.0): Ev =
    Ev(Timestamp.valueOf(s"2024-01-01 $hhmm:00"), user, typ, v)

  test("tumbling window with watermark drops events later than 1h") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = Streaming.tumblingHourlyStream(in.toDF())
      .select(unix_timestamp(col("window.start")).as("h"), col("n"))
      .writeStream.format("memory").queryName("late_drop")
      .outputMode("append").start()
    try {
      in.addData(ev("10:00"), ev("10:30"))
      q.processAllAvailable()
      in.addData(ev("13:00")) // advances watermark to 12:00
      q.processAllAvailable()
      in.addData(ev("10:05")) // late beyond watermark -> must be dropped
      in.addData(ev("16:00")) // pushes watermark past hour 13
      q.processAllAvailable()
      val out = spark.table("late_drop").collect()
        .map(r => r.getAs[Long]("h") -> r.getAs[Long]("n")).toMap
      val hour10 = Timestamp.valueOf("2024-01-01 10:00:00").getTime / 1000
      assert(out(hour10) == 2L, s"late event leaked into closed window: $out")
    } finally q.stop()
  }

  test("streamed tumbling agg equals the batch operator on the same rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = (0 until 500).map(i =>
      Ev(new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime +
        i * 137000L), i % 7, s"t${i % 3}", i * 0.5))
    val in = MemoryStream[Ev]
    in.addData(rows: _*)
    val q = Streaming.tumblingHourly(in.toDF())
      .writeStream.format("memory").queryName("parity")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("parity")
        .select(unix_timestamp(col("window.start")).as("h"),
          col("event_type"), col("n"), col("sum_value"))
        .collect().map(_.toSeq).toSet
      val batch = Streaming.tumblingHourly(rows.toDF())
        .select(unix_timestamp(col("window.start")).as("h"),
          col("event_type"), col("n"), col("sum_value"))
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("sessionization splits on gaps >= the session gap") {
    import spark.implicits._
    val df = Seq(ev("00:00"), ev("00:30"), ev("13:00"), // 12h30 gap -> new session
      ev("01:00", user = 2L)).toDF()
    val out = Streaming.sessionized(df)
      .select(col("user_id"), col("n_events")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events")))
      .sorted
    assert(out.toSeq == Seq((1L, 1L), (1L, 2L), (2L, 1L)))
  }

  test("mapGroupsWithState carries per-user state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = Streaming.userRunningStats(spark, in.toDF())
      .writeStream.format("memory").queryName("user_state")
      .outputMode("update").start()
    try {
      in.addData(ev("10:00", user = 1, v = 2.0), ev("10:05", user = 1, v = 4.0))
      q.processAllAvailable()
      in.addData(ev("11:00", user = 1, v = 6.0)) // second micro-batch
      q.processAllAvailable()
      val rows = spark.table("user_state")
        .filter($"user_id" === 1).collect()
      // update mode emits one row per batch; the LAST must reflect all 3
      val last = rows.maxBy(_.getAs[Long]("n_events"))
      assert(last.getAs[Long]("n_events") == 3L)
      assert(last.getAs[Double]("sum_value") == 12.0)
    } finally q.stop()
  }

  test("q180 session conversion matches a driver sessionization replay") {
    val out = Streaming.q180SessionConversion(spark, sf).collect()
    assert(out.nonEmpty)
    // q37 and q180 must count the SAME sessions
    val q37n = Streaming.q37EventsSessions(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_sessions")).sum == q37n)
    // replay: 12h-gap islands per user, converted = any purchase >= first view
    val ev = graft.ops.Tables.events(spark, sf)
      .select("user_id", "ts", "event_type").collect()
      .map { r =>
        val i = r.getAs[java.sql.Timestamp]("ts").toInstant
        (r.getAs[Long]("user_id"),
          i.getEpochSecond * 1000000L + i.getNano / 1000L,
          r.getAs[String]("event_type"))
      }
    val gapUs = Streaming.SessionGapHours * 3600L * 1000000L
    val sessions = ev.groupBy(_._1).iterator.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      val buf = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer(sorted.head))
      sorted.tail.foreach { e =>
        if (e._2 - buf.last.last._2 >= gapUs)
          buf += scala.collection.mutable.ArrayBuffer(e)
        else buf.last += e
      }
      buf.map { s =>
        val v0 = s.collect { case (_, t, "view") => t }.minOption
        val p1 = s.collect { case (_, t, "purchase") => t }.maxOption
        val conv = v0.nonEmpty && p1.nonEmpty && p1.get >= v0.get
        (s.head._2 / 1000000L / 3600L * 3600L, conv)
      }
    }.toSeq
    val expected = sessions.groupBy(_._1).map { case (h, ss) =>
      h -> ((ss.size.toLong, ss.count(_._2).toLong))
    }
    val got = out.map(r => r.getAs[Long]("hour_epoch") ->
      ((r.getAs[Long]("n_sessions"), r.getAs[Long]("n_converted")))).toMap
    assert(got == expected)
    out.foreach(r => assert(r.getAs[Long]("conv_ppm") ==
      r.getAs[Long]("n_converted") * 1000000L / r.getAs[Long]("n_sessions")))
  }

  test("q181 multi-touch: credit sums to exactly 1e6; rnk=1 slice equals q124") {
    val out = Streaming.q181MultiTouch(spark, sf).collect()
    assert(out.nonEmpty)
    for ((_, rows) <- out.groupBy(_.getAs[Long]("purchase_id"))) {
      assert(rows.map(_.getAs[Long]("weight_ppm")).sum == 1000000L)
      assert(rows.map(_.getAs[Long]("rnk")).sorted.toSeq ==
        (1L to rows.length).toSeq)
      assert(rows.forall(_.getAs[Long]("n_views") == rows.length.toLong))
      // split is fair: weights differ by at most 1 ppm
      val w = rows.map(_.getAs[Long]("weight_ppm"))
      assert(w.max - w.min <= 1L)
    }
    // last-touch slice reproduces q124 for purchases that have views
    val last = out.filter(_.getAs[Long]("rnk") == 1L)
      .map(r => r.getAs[Long]("purchase_id") -> r.getAs[Long]("view_id")).toMap
    Streaming.q124PurchaseAttribution(spark, sf).collect()
      .filter(_.getAs[Long]("n_views") > 0L)
      .foreach { r =>
        assert(last(r.getAs[Long]("purchase_id")) ==
          r.getAs[Long]("attributed_view_id"))
      }
  }

  test("q180 streamed session conversion equals the batch face on the same rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // sessions with and without conversions, across users and hours
    val rows = (0 until 300).flatMap { i =>
      val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime +
        (i % 5) * 50L * 3600000L + (i / 5) * 60000L
      val user = (i % 7).toLong
      Seq(Ev(new Timestamp(base), user, "view", 1.0),
        Ev(new Timestamp(base + 30000L), user,
          if (i % 3 == 0) "purchase" else "click", 1.0))
    }
    val in = MemoryStream[Ev]
    in.addData(rows: _*)
    val q = Streaming.sessionDecisionsOf(in.toDF())
      .writeStream.format("memory").queryName("sess_conv")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      // the stateful session stage agrees row-for-row (as multisets)
      val streamed = spark.table("sess_conv").collect()
        .map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
      val batchDecisions = Streaming.sessionDecisionsOf(rows.toDF())
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
      assert(streamed == batchDecisions)
      // and the report rollup over the streamed state equals the batch face
      val reportFromStream = spark.table("sess_conv")
        .groupBy("hour_epoch")
        .agg(count(lit(1)).as("n_sessions"), sum("conv").as("n_converted"))
        .withColumn("conv_ppm",
          expr("n_converted * 1000000 div n_sessions"))
        .collect().map(_.toSeq).toSet
      val batch = Streaming.sessionConversionOf(rows.toDF())
        .collect().map(_.toSeq).toSet
      assert(reportFromStream == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("q143 batch face equals the streaming operator's final per-user state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evs = Seq(
      ev("10:00", user = 1, v = 2.25), ev("10:05", user = 1, v = 4.50),
      ev("11:00", user = 1, v = 6.75), ev("09:30", user = 2, v = 0.01))
    // streaming: drive the operator over two micro-batches, keep each
    // user's LAST update (the final state)
    val in = MemoryStream[Ev]
    val q = Streaming.userRunningStats(spark, in.toDF())
      .writeStream.format("memory").queryName("q143_stream")
      .outputMode("update").start()
    val streamed = try {
      in.addData(evs.take(2)); q.processAllAvailable()
      in.addData(evs.drop(2)); q.processAllAvailable()
      spark.table("q143_stream").collect()
        .groupBy(_.getAs[Long]("user_id")).map { case (u, rs) =>
          val last = rs.maxBy(_.getAs[Long]("n_events"))
          (u, last.getAs[Long]("n_events"),
            math.round(last.getAs[Double]("sum_value") * 100),
            last.getAs[Long]("last_seen_epoch"))
        }.toSet
    } finally q.stop()
    // batch face: the SAME operator over the same rows via q143's shape
    val dir = java.nio.file.Files.createTempDirectory("q143").toString
    evs.toDF().write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val batch = Streaming.q143UserStats(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("sum_cents"), r.getAs[Long]("last_seen_epoch"))).toSet
    assert(batch == streamed, s"batch=$batch streamed=$streamed")
    assert(batch.exists(t => t._1 == 1L && t._2 == 3L && t._3 == 1350L))
  }

  test("tumbling agg runs on the RocksDB state store (production state path)") {
    // the 100 TB deployment keeps streaming state off-heap in RocksDB; prove
    // that path actually runs in this Spark build, not just the default
    // HDFS-backed in-memory store
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s2.implicits._
    implicit val sqlCtx = s2.sqlContext
    val in = MemoryStream[Ev]
    val q = Streaming.tumblingHourlyStream(in.toDF())
      .select(unix_timestamp(col("window.start")).as("h"), col("n"))
      .writeStream.format("memory").queryName("rocksdb_path")
      .outputMode("append").start()
    try {
      in.addData(ev("10:00"), ev("10:30"))
      q.processAllAvailable()
      in.addData(ev("13:00")) // watermark passes 11:00 -> hour-10 window closes
      q.processAllAvailable()
      val out = s2.table("rocksdb_path").collect()
        .map(r => r.getAs[Long]("h") -> r.getAs[Long]("n")).toMap
      val hour10 = Timestamp.valueOf("2024-01-01 10:00:00").getTime / 1000
      assert(out.get(hour10).contains(2L), out.toString)
      // the state operator must report RocksDB-specific metrics — proof the
      // provider engaged rather than silently falling back
      val metrics = q.lastProgress.stateOperators.head.customMetrics
      assert(metrics.keySet().iterator().asScala.exists(_.startsWith("rocksdb")),
        metrics.toString)
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits only CLOSED sessions (event-time timeout)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = Streaming.closedSessions(spark, in.toDF())
      .writeStream.format("memory").queryName("closed_sessions")
      .outputMode("append").start()
    def closed = spark.table("closed_sessions").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Double]("sum_value")))
    try {
      in.addData(ev("00:00", v = 2.0), ev("00:30", v = 3.0))
      q.processAllAvailable()
      assert(closed.isEmpty, "open session must not be emitted")
      // 22.5h gap closes session 1 inside the batch (2 events, sum 5)
      in.addData(ev("23:00", v = 7.0))
      q.processAllAvailable()
      assert(closed.toSeq == Seq((1L, 2L, 5.0)), closed.mkString(","))
      // another user's far-future event drives the watermark past
      // 23:00 + 12h gap -> the second session times out and closes
      in.addData(Ev(Timestamp.valueOf("2024-01-03 00:00:00"), 2L, "view", 1.0))
      q.processAllAvailable()
      q.processAllAvailable() // timeout fires on the following batch
      assert(closed.toSet.contains((1L, 1L, 7.0)), closed.mkString(","))
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases to in-horizon views") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // (event_id, ts, user_id, event_type, value)
    val in = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = in.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = Streaming.purchaseAttribution(
      df.filter(col("event_type") === "view"),
      df.filter(col("event_type") === "purchase"))
      .writeStream.format("memory").queryName("attribution")
      .outputMode("append").start()
    def at(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    try {
      in.addData(
        (1L, at("08:00"), 7L, "view", 0.0),     // outside the 1h horizon
        (2L, at("10:00"), 7L, "view", 0.0),     // inside
        (3L, at("10:15"), 9L, "view", 0.0),     // other user
        (4L, at("10:30"), 7L, "purchase", 42.0))
      q.processAllAvailable()
      // advance both watermarks so the joined row is emittable in append mode
      in.addData((5L, at("13:00"), 1L, "view", 0.0),
        (6L, at("13:00"), 1L, "purchase", 1.0))
      q.processAllAvailable()
      val out = spark.table("attribution")
        .filter(col("purchase_id") === 4L).collect()
        .map(r => (r.getAs[Long]("view_id"), r.getAs[Double]("p_value")))
      assert(out.toSeq == Seq((2L, 42.0)),
        s"exactly the in-horizon same-user view must match: ${out.mkString(",")}")
    } finally q.stop()
  }

  test("q124 batch face: last-touch per purchase, view-less purchases kept") {
    val out = Streaming.q124PurchaseAttribution(spark, sf).collect()
    assert(out.nonEmpty)
    // replay against the same normalized events read
    // replay in MICROSECONDS: the engine's interval predicate compares
    // full timestamp precision, and the round-6 events layout is
    // TIMESTAMP(MICROS) — a millisecond replay would disagree with the
    // engine on a view landing exactly at the horizon boundary with
    // sub-millisecond micros (the micros-precise-replay convention)
    def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    val ev = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type").collect()
      .map(r => (r.getAs[Long]("event_id"),
        micros(r.getAs[java.sql.Timestamp]("ts")), r.getAs[Long]("user_id"),
        r.getAs[String]("event_type")))
    val views = ev.filter(_._4 == "view")
    val purchases = ev.filter(_._4 == "purchase")
    assert(out.length == purchases.length,
      "one row per purchase, even with zero in-horizon views")
    val byId = out.map(r => r.getAs[Long]("purchase_id") -> r).toMap
    purchases.foreach { case (pid, pms, puser, _) =>
      val inWin = views.filter { case (_, vms, vuser, _) =>
        vuser == puser && vms <= pms && vms >= pms - 3600000000L }
      val r = byId(pid)
      assert(r.getAs[Long]("n_views") == inWin.length.toLong, s"n_views($pid)")
      if (inWin.isEmpty)
        assert(r.isNullAt(r.fieldIndex("attributed_view_id")), s"null($pid)")
      else {
        val expect = inWin.maxBy(v => (v._2, v._1))._1
        assert(r.getAs[Long]("attributed_view_id") == expect, s"last($pid)")
      }
    }
  }

  test("closed session widens to include late in-watermark events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = Streaming.closedSessions(spark, in.toDF())
      .writeStream.format("memory").queryName("late_session")
      .outputMode("append").start()
    try {
      in.addData(ev("10:00", user = 3L, v = 1.0))
      q.processAllAvailable()
      // late but inside the 1h watermark: must LOWER the session start
      in.addData(ev("09:30", user = 3L, v = 2.0))
      q.processAllAvailable()
      in.addData(ev("23:30", user = 3L, v = 4.0)) // 13.5h gap -> closes
      q.processAllAvailable()
      val s0930 = Timestamp.valueOf("2024-01-01 09:30:00").getTime / 1000
      val closed = spark.table("late_session")
        .filter($"user_id" === 3L).collect()
        .map(r => (r.getAs[Long]("start_epoch"), r.getAs[Long]("n_events")))
      assert(closed.toSeq == Seq((s0930, 2L)),
        s"late event must widen the session start: ${closed.mkString(",")}")
    } finally q.stop()
  }

  test("streaming dedup drops re-delivered ids, state bounded by watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Double)]
    val q = Streaming.dedupedStream(
      in.toDF().toDF("event_id", "ts", "value"))
      .writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").start()
    def at(hhmm: String) = Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    try {
      in.addData((1L, at("10:00"), 1.0), (2L, at("10:01"), 2.0))
      q.processAllAvailable()
      // same id re-delivered in a later micro-batch, inside the watermark
      in.addData((1L, at("10:02"), 1.0), (3L, at("10:03"), 3.0))
      q.processAllAvailable()
      val ids = spark.table("stream_dedup").select("event_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids.sorted == Seq(1L, 2L, 3L), s"dup leaked or row lost: $ids")
    } finally q.stop()
  }

  test("foreachBatch sink appends micro-batches into a lake catalog table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ns = s"stream_sink_${System.nanoTime()}"
    val cat = new graft.lake.SessionLakeCatalog(spark)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val in = MemoryStream[Ev]
    val q = Streaming.sinkToLake(in.toDF(), cat, ns, "ev", ckpt)
    try {
      in.addData(ev("10:00"), ev("10:30"))
      q.processAllAvailable()
      assert(cat.load(ns, "ev").count() == 2)
      in.addData(ev("11:00")) // second epoch appends, not overwrites
      q.processAllAvailable()
      assert(cat.load(ns, "ev").count() == 3)
    } finally {
      q.stop()
      cat.dropNamespace(ns)
    }
  }

  test("streaming incremental dedup: only novel fingerprints reach the lake") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ns = s"stream_dedup_${System.nanoTime()}"
    val cat = new graft.lake.SessionLakeCatalog(spark)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dedup-ckpt").toString
    val in = MemoryStream[(Long, String)]
    val q = Streaming.dedupedSinkToLake(
      in.toDF().toDF("doc_id", "text"), cat, ns, "docs", "docs_fp", ckpt)
    try {
      // epoch 1: an intra-batch dup pair + a fresh doc
      in.addData((1L, "alpha beta"), (2L, "alpha beta"), (3L, "gamma delta"))
      q.processAllAvailable()
      assert(cat.load(ns, "docs").select("doc_id").collect()
        .map(_.getLong(0)).toSet == Set(1L, 3L))
      // epoch 2: a dup of epoch 1 (caught by the fingerprint table, modulo
      // whitespace/case) + a fresh doc
      in.addData((4L, "  ALPHA beta "), (5L, "epsilon zeta"))
      q.processAllAvailable()
      assert(cat.load(ns, "docs").select("doc_id").collect()
        .map(_.getLong(0)).toSet == Set(1L, 3L, 5L))
      assert(cat.load(ns, "docs_fp").count() == 3)
    } finally {
      q.stop()
      cat.dropNamespace(ns)
    }
  }

  test("streaming index dedup: decisions match the batch operator per epoch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ns = s"sidx_${System.nanoTime()}"
    val cat = graft.lake.DirectoryLakeCatalog.temp(spark)
    // the static side: a persisted signature index over the test corpus
    val index = Dedup.signaturesTable(spark, sf, cat, ns)
    val probe = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), length(col("text")).as("len"))
      .orderBy(desc("len"), col("doc_id")).head()
    val srcId = probe.getLong(0)
    val srcText = probe.getString(1)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sidx-ckpt").toString
    val in = MemoryStream[(Long, String)]
    val q = Streaming.indexDedupSink(
      in.toDF().toDF("doc_id", "text"), index, cat, ns, "decisions", ckpt)
    try {
      in.addData((800001L, srcText), (800002L, ("brandnew " * 30).trim))
      q.processAllAvailable()
      val d1 = cat.load(ns, "decisions").collect()
      assert(d1.exists(r => r.getAs[Long]("incoming_id") == 800001L &&
        r.getAs[Long]("corpus_id") == srcId &&
        r.getAs[String]("match_kind") == "exact"))
      assert(!d1.exists(_.getAs[Long]("incoming_id") == 800002L))
      // epoch 2 appends, epoch 1 decisions retained
      in.addData((800003L, srcText))
      q.processAllAvailable()
      val d2 = cat.load(ns, "decisions").collect()
      assert(d2.length > d1.length)
      assert(d2.exists(r => r.getAs[Long]("incoming_id") == 800003L &&
        r.getAs[String]("match_kind") == "exact"))
      // per-epoch equivalence with the batch operator
      val batch = Dedup.dedupAgainstIndex(spark,
        Seq((800001L, srcText)).toDF("doc_id", "text"), index).collect()
        .map(r => (r.getAs[Long]("incoming_id"), r.getAs[Long]("corpus_id"),
          r.getAs[String]("match_kind"))).toSet
      val streamed = d2.filter(_.getAs[Long]("incoming_id") == 800001L)
        .map(r => (r.getAs[Long]("incoming_id"), r.getAs[Long]("corpus_id"),
          r.getAs[String]("match_kind"))).toSet
      assert(streamed == batch)
    } finally {
      q.stop()
      cat.dropNamespace(ns)
    }
  }

  test("stats sink: totals match batch aggregation, replayed epochs add zero") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ns = s"cst_${System.nanoTime()}"
    val cat = graft.lake.DirectoryLakeCatalog.temp(spark)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cst-ckpt").toString
    val in = MemoryStream[(Long, String, String)]
    val q = Streaming.statsSink(
      in.toDF().toDF("doc_id", "text", "source"), cat, ns, "stats", ckpt)
    try {
      in.addData((1L, "a b c", "web"), (2L, "d e", "web"), (3L, "x", "book"))
      q.processAllAvailable()
      in.addData((4L, "y z", "book"))
      q.processAllAvailable()
      val totals = Streaming.corpusStats(cat, ns, "stats").collect()
        .map(r => r.getAs[String]("source") ->
          (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
            r.getAs[Long]("n_chars"))).toMap
      assert(totals("web") == ((2L, 5L, 8L)))
      assert(totals("book") == ((2L, 3L, 4L)))
      // at-least-once replay: re-running an already-persisted epoch's
      // batch through the same epoch id must contribute ZERO new rows
      val before = cat.load(ns, "stats").count()
      Streaming.statsEpoch(
        Seq((1L, "a b c", "web")).toDF("doc_id", "text", "source"),
        epoch = 0L, cat, ns, "stats")
      assert(cat.load(ns, "stats").count() == before)
      // a genuinely new epoch still lands
      Streaming.statsEpoch(
        Seq((5L, "k", "web")).toDF("doc_id", "text", "source"),
        epoch = 99L, cat, ns, "stats")
      val after = Streaming.corpusStats(cat, ns, "stats").collect()
        .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_docs")).toMap
      assert(after("web") == 3L)
    } finally {
      q.stop()
      cat.dropNamespace(ns)
    }
  }

  test("stats sink mid-epoch crash: delta appended, commit lost — restart " +
    "replays to unchanged totals") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ns = s"cstc_${System.nanoTime()}"
    val cat = graft.lake.DirectoryLakeCatalog.temp(spark)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cstc").toString
    val in = MemoryStream[(Long, String, String)]
    def start() = Streaming.statsSink(
      in.toDF().toDF("doc_id", "text", "source"), cat, ns, "stats", ckpt)
    val q1 = start()
    try {
      in.addData((1L, "a b c", "web"))
      q1.processAllAvailable() // epoch 0, clean
      Streaming.CrashHook.arm()
      in.addData((2L, "d e", "web"), (3L, "x", "book"))
      intercept[Exception](q1.processAllAvailable()) // epoch 1 dies post-append
      assert(q1.exception.isDefined)
      // the delta rows DID land — the at-least-once window is real
      assert(cat.load(ns, "stats").filter(col("epoch") === 1L).count() == 2)
      val q2 = start() // same checkpoint: epoch 1 redelivers
      try {
        q2.processAllAvailable()
        val totals = Streaming.corpusStats(cat, ns, "stats").collect()
          .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_docs")).toMap
        assert(totals == Map("web" -> 2L, "book" -> 1L),
          s"replayed epoch double-counted: $totals")
        assert(cat.load(ns, "stats").filter(col("epoch") === 1L).count() == 2)
        in.addData((4L, "y z", "book")) // the stream continues
        q2.processAllAvailable()
        assert(Streaming.corpusStats(cat, ns, "stats").collect()
          .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_docs"))
          .toMap == Map("web" -> 2L, "book" -> 2L))
      } finally q2.stop()
    } finally {
      Streaming.CrashHook.disarm()
      q1.stop()
      cat.dropNamespace(ns)
    }
  }

  test("compactStats folds the delta table to base rows with totals and " +
    "replay semantics intact — even when compaction lands between a " +
    "crashed epoch's append and its replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ns = s"cstf_${System.nanoTime()}"
    val cat = graft.lake.DirectoryLakeCatalog.temp(spark)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cstf").toString
    val in = MemoryStream[(Long, String, String)]
    def start() = Streaming.statsSink(
      in.toDF().toDF("doc_id", "text", "source"), cat, ns, "stats", ckpt)
    def totals() = Streaming.corpusStats(cat, ns, "stats").collect()
      .map(r => (r.getAs[String]("source"),
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))).toMap
    val q1 = start()
    try {
      in.addData((1L, "a b c", "web"))
      q1.processAllAvailable() // epoch 0
      in.addData((2L, "d e", "web"), (3L, "x", "book"))
      q1.processAllAvailable() // epoch 1
      val before = totals()
      Streaming.compactStats(cat, ns, "stats")
      // folded to one row per source, totals identical, newest epoch kept
      assert(cat.load(ns, "stats").count() == 2)
      assert(totals() == before, "compaction changed the running totals")
      assert(cat.load(ns, "stats").agg(max("epoch")).collect()(0)
        .getLong(0) == 1L)
      // the dangerous interleaving: epoch 2 appends, crashes uncommitted,
      // compaction folds ITS rows too, then the restart replays it — the
      // folded base rows carry epoch 2 (the global max), so the replay
      // must still anti-join away
      Streaming.CrashHook.arm()
      in.addData((4L, "p q r s", "web"))
      intercept[Exception](q1.processAllAvailable())
      Streaming.CrashHook.disarm()
      val afterCrash = totals()
      assert(afterCrash("web")._1 == 3L) // the at-least-once window is real
      Streaming.compactStats(cat, ns, "stats")
      assert(cat.load(ns, "stats").count() == 2)
      val q2 = start()
      try {
        q2.processAllAvailable() // epoch 2 redelivers
        assert(totals() == afterCrash,
          "replay after compaction double-counted the folded epoch")
        in.addData((5L, "t u", "book")) // the stream continues past it
        q2.processAllAvailable()
        assert(totals()("book") == ((2L, 3L)))
      } finally q2.stop()
    } finally {
      Streaming.CrashHook.disarm()
      q1.stop()
      cat.dropNamespace(ns)
    }
  }

  test("deduped sink mid-epoch crash between its two appends: docs landed, " +
    "fingerprints lost — restart completes the epoch exactly-once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ns = s"ddc_${System.nanoTime()}"
    val cat = graft.lake.DirectoryLakeCatalog.temp(spark)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ddc").toString
    val in = MemoryStream[(Long, String)]
    def start() = Streaming.dedupedSinkToLake(
      in.toDF().toDF("doc_id", "text"), cat, ns, "docs", "docs_fp", ckpt)
    val q1 = start()
    try {
      in.addData((1L, "alpha beta"))
      q1.processAllAvailable() // epoch 0, clean
      // the crash hook fires AFTER both appends; the harder interleaving
      // (docs appended, fingerprints not) is exercised below by hand-
      // running the replay against a doctored fp table — here we prove the
      // full-epoch replay first
      Streaming.CrashHook.arm()
      in.addData((2L, "gamma delta"))
      intercept[Exception](q1.processAllAvailable())
      assert(cat.load(ns, "docs").count() == 2) // appends landed
      val q2 = start()
      try {
        q2.processAllAvailable() // epoch 1 replays: fp anti-join absorbs it
        assert(cat.load(ns, "docs").select("doc_id").collect()
          .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L),
          "replayed epoch duplicated document rows")
        assert(cat.load(ns, "docs_fp").count() == 2)
        // the BETWEEN-appends crash: simulate its persisted state by
        // deleting doc 2's fingerprint row (docs present, fp missing) and
        // replaying the same batch — the doc_id guard must absorb the doc
        // append and only the fingerprint append may run
        val fps = cat.load(ns, "docs_fp").filter(col("doc_id") === 1L)
          .collect().map(r => (r.getString(0), r.getLong(1)))
        cat.overwrite(ns, "docs_fp", fps.toSeq.toDF("fp", "doc_id"))
        in.addData((2L, "gamma delta")) // redelivery of the same doc
        q2.processAllAvailable()
        assert(cat.load(ns, "docs").select("doc_id").collect()
          .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L),
          "doc_id guard failed: between-appends replay duplicated the doc")
        assert(cat.load(ns, "docs_fp").select("doc_id").collect()
          .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L),
          "fingerprint append did not complete the interrupted epoch")
      } finally q2.stop()
    } finally {
      Streaming.CrashHook.disarm()
      q1.stop()
      cat.dropNamespace(ns)
    }
  }

  test("index dedup sink mid-epoch crash: decision log replays exactly-once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ns = s"sidc_${System.nanoTime()}"
    val cat = graft.lake.DirectoryLakeCatalog.temp(spark)
    val index = Dedup.signaturesTable(spark, sf, cat, ns)
    val probe = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), length(col("text")).as("len"))
      .orderBy(desc("len"), col("doc_id")).head()
    val srcText = probe.getString(1)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sidc").toString
    val in = MemoryStream[(Long, String)]
    def start() = Streaming.indexDedupSink(
      in.toDF().toDF("doc_id", "text"), index, cat, ns, "decisions", ckpt)
    val q1 = start()
    try {
      in.addData((810001L, srcText))
      q1.processAllAvailable() // epoch 0, clean
      val d0 = cat.load(ns, "decisions").count()
      assert(d0 >= 1)
      Streaming.CrashHook.arm()
      in.addData((810002L, srcText))
      intercept[Exception](q1.processAllAvailable())
      val d1 = cat.load(ns, "decisions").count()
      assert(d1 > d0) // epoch 1's decisions landed before the crash
      val q2 = start()
      try {
        q2.processAllAvailable() // replay: incoming_id anti-join absorbs it
        assert(cat.load(ns, "decisions").count() == d1,
          "replayed epoch duplicated decision rows")
        assert(cat.load(ns, "decisions")
          .groupBy("incoming_id", "corpus_id").count()
          .filter(col("count") > 1).count() == 0)
      } finally q2.stop()
    } finally {
      Streaming.CrashHook.disarm()
      q1.stop()
      cat.dropNamespace(ns)
    }
  }

  test("session windows run under readStream with watermark (smoke)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = Streaming.sessionizedStream(in.toDF())
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    try {
      in.addData(ev("00:00"), ev("00:10"))
      q.processAllAvailable()
      in.addData(ev("23:00")) // watermark passes 12h session close
      q.processAllAvailable()
      val rows = spark.table("sess_stream").collect()
      assert(rows.exists(_.getAs[Long]("n_events") == 2L),
        rows.mkString(","))
    } finally q.stop()
  }
}
