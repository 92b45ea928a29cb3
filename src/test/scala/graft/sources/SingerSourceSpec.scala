package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}

/** DataSourceV2 Singer source: schema inference from SCHEMA messages,
  * record filtering per stream, column-pruning pushdown, byte-range split
  * correctness (no dropped/duplicated lines across split boundaries), and
  * the null-on-type-mismatch query-surface contract. */
class SingerSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeFeed(lines: Seq[String]): Path = {
    val f = Files.createTempFile("singer-feed", ".jsonl")
    Files.writeString(f, lines.mkString("", "\n", "\n"))
    f
  }

  private val usersSchema =
    """{"type":"SCHEMA","stream":"users","key_properties":["id"],
      |"schema":{"type":"object","properties":{
      |"id":{"type":"integer"},"name":{"type":"string"},
      |"score":{"type":"number"},
      |"joined":{"type":"string","format":"date"}}}}"""
      .stripMargin.replace("\n", "")

  private def userRecord(id: Int, name: String, score: Double, joined: String) =
    s"""{"type":"RECORD","stream":"users","record":{"id":$id,"name":"$name","score":$score,"joined":"$joined"}}"""

  test("reads RECORDs of the declared stream with the inferred schema") {
    val f = writeFeed(Seq(
      usersSchema,
      userRecord(1, "ada", 9.5, "2024-01-02"),
      """{"type":"STATE","value":{"bookmark":1}}""",
      userRecord(2, "bob", 7.25, "2024-02-03"),
      """{"type":"SCHEMA","stream":"other","schema":{"type":"object","properties":{"x":{"type":"integer"}}}}""",
      """{"type":"RECORD","stream":"other","record":{"x":42}}"""))
    val df = spark.read.format("singer").option("stream", "users")
      .load(f.toString)
    assert(df.schema.fieldNames.toSeq == Seq("id", "name", "score", "joined"))
    val rows = df.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "ada")
    assert(rows(0).getAs[java.sql.Date]("joined").toString == "2024-01-02")
    assert(rows(1).getDouble(2) == 7.25)
  }

  test("without a stream option, binds to the first SCHEMA's stream") {
    val f = writeFeed(Seq(
      usersSchema,
      userRecord(1, "ada", 1.0, "2024-01-02"),
      """{"type":"RECORD","stream":"other","record":{"x":1}}"""))
    val df = spark.read.format("singer").load(f.toString)
    assert(df.count() == 1) // the "other" record is not a users row
  }

  test("multi-stream feed without option: ALL splits bind to the inferred stream") {
    // regression: per-partition first-record binding let a split whose
    // first record belonged to another stream decode that stream against
    // the inferred schema; the bound stream is now resolved driver-side
    val lines = usersSchema +:
      """{"type":"SCHEMA","stream":"other","schema":{"type":"object","properties":{"x":{"type":"integer"}}}}""" +:
      (1 to 200).flatMap(i => Seq(
        userRecord(i, s"user-$i-padpadpadpadpad", i * 1.0, "2024-01-02"),
        s"""{"type":"RECORD","stream":"other","record":{"x":$i}}"""))
    val f = writeFeed(lines)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
    try {
      val df = spark.read.format("singer").load(f.toString)
      assert(df.rdd.getNumPartitions > 3)
      val rows = df.collect()
      assert(rows.length == 200, s"expected 200 users rows, got ${rows.length}")
      assert(rows.forall(!_.isNullAt(1)), "an 'other' record decoded as users")
    } finally spark.conf.unset("spark.sql.files.maxPartitionBytes")
  }

  test("column pruning reaches the scan (ReadSchema narrows)") {
    val f = writeFeed(Seq(usersSchema, userRecord(1, "ada", 1.0, "2024-01-02")))
    val df = spark.read.format("singer").option("stream", "users")
      .load(f.toString).select("name")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }.get
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("name"),
      s"pruned read schema expected, got ${scan.scan.readSchema()}")
    assert(df.collect().map(_.getString(0)).toSeq == Seq("ada"))
  }

  test("type-mismatched fields read as null; missing fields read as null") {
    val f = writeFeed(Seq(
      usersSchema,
      """{"type":"RECORD","stream":"users","record":{"id":"not-a-number","name":7,"score":1.5}}"""))
    val r = spark.read.format("singer").option("stream", "users")
      .load(f.toString).collect()(0)
    assert(r.isNullAt(r.fieldIndex("id")))       // string where integer declared
    assert(r.getString(r.fieldIndex("name")) == "7") // JSON text of the value
    assert(r.isNullAt(r.fieldIndex("joined")))   // absent
  }

  test("byte-range splits: no dropped or duplicated rows at any split size") {
    val n = 500
    val lines = usersSchema +: (1 to n).map(i =>
      userRecord(i, s"user-$i-padding-padding-padding", i * 1.5, "2024-01-02"))
    val f = writeFeed(lines)
    val whole = spark.read.format("singer").option("stream", "users")
      .load(f.toString).agg(count(lit(1)), sum("id")).collect()(0)
    assert(whole.getLong(0) == n)
    // force many tiny splits: every boundary lands mid-line somewhere
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
    try {
      val df = spark.read.format("singer").option("stream", "users")
        .load(f.toString)
      assert(df.rdd.getNumPartitions > 4,
        s"expected many splits, got ${df.rdd.getNumPartitions}")
      val split = df.agg(count(lit(1)), sum("id")).collect()(0)
      assert(split.getLong(0) == n, "split reading dropped/duplicated rows")
      assert(split.getLong(1) == whole.getLong(1))
    } finally spark.conf.unset("spark.sql.files.maxPartitionBytes")
  }

  test("streaming: micro-batches read exactly the appended bytes") {
    val dir = Files.createTempDirectory("singer-stream")
    val f = dir.resolve("feed.jsonl")
    Files.writeString(f, Seq(
      usersSchema,
      userRecord(1, "ada", 1.0, "2024-01-02"),
      userRecord(2, "bob", 2.0, "2024-01-03")).mkString("", "\n", "\n"))
    val q = spark.readStream.format("singer").option("stream", "users")
      .load(dir.toString + "/*.jsonl")
      .writeStream.format("memory").queryName("singer_stream_t")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("singer_stream_t").count() == 2)
      // append two more records (line-atomic, like a tap)
      Files.writeString(f, Seq(
        userRecord(3, "eve", 3.0, "2024-01-04"),
        userRecord(4, "kim", 4.0, "2024-01-05")).mkString("", "\n", "\n"),
        java.nio.file.StandardOpenOption.APPEND)
      // and a brand-new file discovered mid-stream
      Files.writeString(dir.resolve("feed2.jsonl"),
        usersSchema + "\n" + userRecord(5, "lee", 5.0, "2024-01-06") + "\n")
      q.processAllAvailable()
      val ids = spark.table("singer_stream_t").select("id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.sameElements(Array(1L, 2L, 3L, 4L, 5L)),
        s"expected 1..5, got ${ids.mkString(",")}")
    } finally q.stop()
  }

  test("sink round-trip: write format(singer) then read back identically") {
    import spark.implicits._
    val dir = Files.createTempDirectory("singer-sink").toString
    val df = Seq(
      (1L, "ada", Some(9.5), java.sql.Date.valueOf("2024-01-02"),
        java.sql.Timestamp.valueOf("2024-01-02 03:04:05"), Seq(1L, 2L)),
      (2L, "bob", None, java.sql.Date.valueOf("2024-02-03"),
        java.sql.Timestamp.valueOf("2024-02-03 04:05:06"), Seq.empty[Long]))
      .toDF("id", "name", "score", "d", "ts", "xs")
    df.write.format("singer").option("stream", "users")
      .mode("append").save(dir)
    val back = spark.read.format("singer").option("stream", "users").load(dir)
    assert(back.schema.fieldNames.toSeq == df.schema.fieldNames.toSeq)
    val a = df.orderBy("id").collect().map(_.toSeq).toSeq
    val b = back.orderBy("id").collect().map(_.toSeq).toSeq
    assert(a == b, s"round-trip mismatch:\n$a\n$b")
    // the emitted feed is valid Singer: SCHEMA precedes RECORDs per file
    import scala.jdk.CollectionConverters._
    Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".jsonl")).foreach { f =>
        val first = Files.readAllLines(f).get(0)
        assert(first.contains("\"SCHEMA\""), s"file $f must start with SCHEMA")
      }
    // overwrite truncates previous part files
    df.limit(1).repartition(1).write.format("singer")
      .option("stream", "users").mode("overwrite").save(dir)
    assert(spark.read.format("singer").option("stream", "users")
      .load(dir).count() == 1)
  }

  test("batch write mode: gzip JSONL parts + BATCH feed round-trip the load path") {
    import spark.implicits._
    val dir = Files.createTempDirectory("singer-batch-sink").toString
    val df = (1L to 50L).map(i => (i, s"user$i", i * 1.5))
      .toDF("id", "name", "score").repartition(3)
    df.write.format("singer").option("stream", "users")
      .option("batch_config",
        """{"encoding":{"format":"jsonl","compression":"gzip"}}""")
      .mode("append").save(dir)

    import scala.jdk.CollectionConverters._
    val feeds = Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".jsonl")).toSeq.sortBy(_.toString)
    assert(feeds.size == 3, s"one feed part per partition, got ${feeds.size}")
    feeds.foreach { f =>
      val lines = Files.readAllLines(f).asScala
      assert(lines.size == 2, "feed is SCHEMA + one BATCH, nothing inline")
      assert(lines.head.contains("\"SCHEMA\""))
      assert(lines(1).contains("\"BATCH\"") &&
        lines(1).contains("\"compression\":\"gzip\""))
      assert(!lines.exists(_.contains("\"RECORD\"")))
    }
    val parts = Files.list(java.nio.file.Paths.get(dir, "batches"))
      .iterator().asScala.filter(!_.getFileName.toString.startsWith("."))
      .toSeq
    assert(parts.size == 3 &&
      parts.forall(_.getFileName.toString.endsWith(".jsonl.gz")))
    parts.foreach { p => // really gzip: magic bytes
      val bytes = Files.readAllBytes(p)
      assert((bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b,
        s"$p is not gzip")
    }

    // round-trip: the emitted feed drives the Singer load path (87df6cb's
    // BATCH expansion) back into a lake table identical to the input
    val ns = s"sbw_${System.nanoTime()}"
    val cat = new graft.lake.SessionLakeCatalog(spark)
    val loader = new graft.lake.BatchLoader(spark, cat, ns)
    val lines = feeds.flatMap(f => Files.readAllLines(f).asScala)
    val report = loader.load(spark.createDataset(lines))
    assert(report.rowsPerStream("users") == 50L)
    val back = cat.load(ns, "users").select("id", "name", "score")
    assert(back.orderBy("id").collect().map(_.toSeq).toSeq ==
      df.orderBy("id").collect().map(_.toSeq).toSeq)
    cat.dropNamespace(ns)
  }

  test("batch write mode validates its config") {
    import spark.implicits._
    val dir = Files.createTempDirectory("singer-batch-bad").toString
    val e = intercept[Exception] {
      Seq((1L, "a")).toDF("id", "name").write.format("singer")
        .option("stream", "users")
        .option("batch_config", """{"encoding":{"format":"parquet"}}""")
        .mode("append").save(dir)
    }
    assert(e.getMessage != null)
  }

  test("format:time round-trips: tagged micros-long -> time string -> tagged micros-long") {
    val dir = Files.createTempDirectory("singer-time").toString
    // a tap-authored feed with a format:time property and string values
    Files.write(java.nio.file.Paths.get(dir, "feed.jsonl"), java.util.List.of(
      """{"type":"SCHEMA","stream":"sh","schema":{"properties":{"id":{"type":["integer"]},"at":{"type":["string","null"],"format":"time"}}}}""",
      """{"type":"RECORD","stream":"sh","record":{"id":1,"at":"12:34:56"}}""",
      """{"type":"RECORD","stream":"sh","record":{"id":2,"at":"23:59:59.250000"}}""",
      """{"type":"RECORD","stream":"sh","record":{"id":3,"at":null}}""",
      // bare micros outside [0, MicrosPerDay) cannot reach the sink's
      // time-string encoder — the reader nulls them like any type mismatch
      """{"type":"RECORD","stream":"sh","record":{"id":4,"at":86400000000}}"""))
    val read1 = spark.read.format("singer").option("stream", "sh").load(dir)
    val atField = read1.schema("at")
    assert(graft.singer.SchemaConv.isTimeField(atField),
      "format:time must land as tagged micros-long")
    val vals = read1.orderBy("id").collect()
      .map(r => Option(r.get(r.fieldIndex("at"))))
    assert(vals(0).contains((12 * 3600 + 34 * 60 + 56) * 1000000L))
    assert(vals(1).contains((23 * 3600 + 59 * 60 + 59) * 1000000L + 250000L))
    assert(vals(2).isEmpty)
    assert(vals(3).isEmpty)
    // write back through the sink: the SCHEMA must re-declare format:time
    // and the values must be time strings again
    val out = Files.createTempDirectory("singer-time-out").toString
    read1.write.format("singer").option("stream", "sh")
      .mode("append").save(out)
    import scala.jdk.CollectionConverters._
    val lines = Files.list(java.nio.file.Paths.get(out)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".jsonl"))
      .flatMap(f => Files.readAllLines(f).asScala).toSeq
    val schemaLine = lines.find(_.contains("\"SCHEMA\"")).get
    assert(schemaLine.contains("\"format\":\"time\""), schemaLine)
    assert(lines.exists(_.contains("\"12:34:56\"")), lines.mkString("\n"))
    assert(lines.exists(_.contains("\"23:59:59.250000\"")), lines.mkString("\n"))
    // and the written feed reads back to the same tagged micros
    val read2 = spark.read.format("singer").option("stream", "sh").load(out)
    assert(graft.singer.SchemaConv.isTimeField(read2.schema("at")))
    assert(read2.orderBy("id").collect().map(_.toSeq).toSeq ==
      read1.orderBy("id").collect().map(_.toSeq).toSeq)
  }

  test("singer.decimal round-trips: number- and string-carried decimals " +
    "land exact, re-emit their wire shape, and re-read identically") {
    val dir = Files.createTempDirectory("singer-dec").toString
    Files.write(java.nio.file.Paths.get(dir, "feed.jsonl"), java.util.List.of(
      """{"type":"SCHEMA","stream":"dm","schema":{"properties":{""" +
        """"id":{"type":["integer"]},""" +
        """"amt":{"type":["number","null"],"multipleOf":0.01},""" +
        """"px":{"type":["string","null"],"format":"singer.decimal","precision":12,"scale":4}}}}""",
      """{"type":"RECORD","stream":"dm","record":{"id":1,"amt":12.34,"px":"0.1234"}}""",
      """{"type":"RECORD","stream":"dm","record":{"id":2,"amt":-0.05,"px":"-99999999.9999"}}""",
      // a double that cannot represent 0.1+0.2 exactly DOES have an exact
      // decimal: the wire text parses digit-exact, never through float64
      """{"type":"RECORD","stream":"dm","record":{"id":3,"amt":0.3,"px":null}}""",
      // precision overflow and junk text read null (type-mismatch rule)
      """{"type":"RECORD","stream":"dm","record":{"id":4,"px":"123456789.0000"}}""",
      """{"type":"RECORD","stream":"dm","record":{"id":5,"px":"abc"}}""",
      // >16 significant digits in a NUMBER-carried decimal: a reader that
      // routes JSON floats through a double loses the trailing .01
      """{"type":"RECORD","stream":"dm","record":{"id":6,"amt":10000000000000000.01}}"""))
    val read1 = spark.read.format("singer").option("stream", "dm").load(dir)
    assert(read1.schema("amt").dataType ==
      org.apache.spark.sql.types.DecimalType(38, 2))
    assert(read1.schema("px").dataType ==
      org.apache.spark.sql.types.DecimalType(12, 4))
    assert(graft.singer.SchemaConv.isDecimalStringField(read1.schema("px")))
    val byId = read1.collect()
      .map(r => r.getLong(0) -> (Option(r.getDecimal(1)), Option(r.getDecimal(2))))
      .toMap
    assert(byId(1) == ((Some(new java.math.BigDecimal("12.34")),
      Some(new java.math.BigDecimal("0.1234")))))
    assert(byId(2) == ((Some(new java.math.BigDecimal("-0.05")),
      Some(new java.math.BigDecimal("-99999999.9999")))))
    assert(byId(3)._1.contains(new java.math.BigDecimal("0.30")))
    assert(byId(4)._2.isEmpty, "precision overflow must read null")
    assert(byId(5)._2.isEmpty, "junk text must read null")
    assert(byId(6)._1.contains(
      new java.math.BigDecimal("10000000000000000.01")),
      s"number-carried decimal must keep every digit: ${byId(6)._1}")
    // sink re-emits each decimal in its declared wire shape
    val out = Files.createTempDirectory("singer-dec-out").toString
    read1.write.format("singer").option("stream", "dm")
      .mode("append").save(out)
    import scala.jdk.CollectionConverters._
    val lines = Files.list(java.nio.file.Paths.get(out)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".jsonl"))
      .flatMap(f => Files.readAllLines(f).asScala).toSeq
    val schemaLine = lines.find(_.contains("\"SCHEMA\"")).get
    assert(schemaLine.contains("\"multipleOf\":0.01"), schemaLine)
    assert(schemaLine.contains("\"format\":\"singer.decimal\""), schemaLine)
    assert(schemaLine.contains("\"precision\":12") &&
      schemaLine.contains("\"scale\":4"), schemaLine)
    assert(lines.exists(l => l.contains("\"amt\":12.34") &&
      l.contains("\"px\":\"0.1234\"")), "number bare, string quoted")
    // and the written feed reads back value-identical
    val read2 = spark.read.format("singer").option("stream", "dm").load(out)
    assert(read2.schema("amt").dataType == read1.schema("amt").dataType &&
      read2.schema("px").dataType == read1.schema("px").dataType)
    assert(read2.orderBy("id").collect().map(_.toSeq).toSeq ==
      read1.orderBy("id").collect().map(_.toSeq).toSeq)
  }

  test("additionalProperties maps round-trip: dynamic keys land as " +
    "MapType, re-emit the same wire shape, and re-read identically") {
    val dir = Files.createTempDirectory("singer-map").toString
    Files.write(java.nio.file.Paths.get(dir, "feed.jsonl"), java.util.List.of(
      """{"type":"SCHEMA","stream":"mp","schema":{"properties":{""" +
        """"id":{"type":["integer"]},""" +
        """"tags":{"type":["object","null"],"additionalProperties":{"type":"integer"}}}}}""",
      """{"type":"RECORD","stream":"mp","record":{"id":1,"tags":{"a":3,"b":7}}}""",
      """{"type":"RECORD","stream":"mp","record":{"id":2,"tags":{}}}""",
      """{"type":"RECORD","stream":"mp","record":{"id":3,"tags":null}}""",
      """{"type":"RECORD","stream":"mp","record":{"id":4,"tags":{"zz":0,"q":null}}}"""))
    val read1 = spark.read.format("singer").option("stream", "mp").load(dir)
    assert(read1.schema("tags").dataType ==
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.LongType))
    val byId = read1.collect()
      .map(r => r.getLong(0) ->
        Option(r.getAs[Map[String, Any]]("tags"))).toMap
    assert(byId(1).contains(Map("a" -> 3L, "b" -> 7L)))
    assert(byId(2).contains(Map.empty[String, Any]))
    assert(byId(3).isEmpty)
    assert(byId(4).contains(Map("zz" -> 0L, "q" -> null)))
    // sink re-emits the additionalProperties shape and the map values
    val out = Files.createTempDirectory("singer-map-out").toString
    read1.write.format("singer").option("stream", "mp")
      .mode("append").save(out)
    import scala.jdk.CollectionConverters._
    val lines = Files.list(java.nio.file.Paths.get(out)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".jsonl"))
      .flatMap(f => Files.readAllLines(f).asScala).toSeq
    assert(lines.find(_.contains("\"SCHEMA\"")).get
      .contains("\"additionalProperties\""), lines.head)
    assert(lines.exists(l => l.contains("\"a\":3") && l.contains("\"b\":7")))
    val read2 = spark.read.format("singer").option("stream", "mp").load(out)
    assert(read2.schema("tags").dataType == read1.schema("tags").dataType)
    assert(read2.orderBy("id").collect().map(_.toSeq).toSeq ==
      read1.orderBy("id").collect().map(_.toSeq).toSeq)
  }

  test("maxRecordsPerTrigger backpressure: a 50k-line append lands as " +
    ">= 5 micro-batches, each under the cap, with exactly-once totals") {
    val dir = Files.createTempDirectory("singer-bp")
    val n = 50000
    val lines = new java.lang.StringBuilder()
    lines.append("""{"type":"SCHEMA","stream":"bp","schema":{"properties":{"id":{"type":["integer"]}}}}""")
      .append('\n')
    (1 to n).foreach(i => lines
      .append(s"""{"type":"RECORD","stream":"bp","record":{"id":$i}}""")
      .append('\n'))
    Files.writeString(dir.resolve("feed.jsonl"), lines.toString)
    val batches = new java.util.concurrent.CopyOnWriteArrayList[(Long, Long, Long)]()
    val q = spark.readStream.format("singer")
      .option("stream", "bp")
      .option("maxRecordsPerTrigger", "10000")
      .load(dir.toString)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val agg = df.agg(
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)),
          org.apache.spark.sql.functions.sum("id")).head()
        batches.add((id, agg.getLong(0),
          if (agg.isNullAt(1)) 0L else agg.getLong(1))): Unit
      }
      .option("checkpointLocation",
        Files.createTempDirectory("singer-bp-ck").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    import scala.jdk.CollectionConverters._
    val bs = batches.asScala.toSeq.filter(_._2 > 0)
    assert(bs.size >= 5,
      s"a 50k-line backlog must split into >= 5 capped batches: ${bs.size}")
    // the cap counts LINES (Singer messages): no batch admits more than
    // 10000 of them, so no batch carries more than 10000 records
    assert(bs.forall(_._2 <= 10000L), s"cap violated: $bs")
    // exactly-once across every split boundary: total count AND id-sum
    assert(bs.map(_._2).sum == n.toLong, s"records lost/duplicated: $bs")
    assert(bs.map(_._3).sum == n.toLong * (n + 1) / 2,
      "id checksum proves no record crossed a boundary twice or vanished")
  }

  test("maxBytesPerTrigger backpressure: mid-file splits land on exact " +
    "line boundaries — totals identical to an uncapped read") {
    val dir = Files.createTempDirectory("singer-bpb")
    val n = 400
    val body = (Seq("""{"type":"SCHEMA","stream":"bb","schema":{"properties":{"id":{"type":["integer"]}}}}""") ++
      (1 to n).map(i =>
        s"""{"type":"RECORD","stream":"bb","record":{"id":$i}}"""))
      .mkString("", "\n", "\n")
    Files.writeString(dir.resolve("feed.jsonl"), body)
    val batches = new java.util.concurrent.CopyOnWriteArrayList[(Long, Long)]()
    val q = spark.readStream.format("singer")
      .option("stream", "bb")
      .option("maxBytesPerTrigger", "2048") // far under the ~20 KB feed
      .load(dir.toString)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val agg = df.agg(
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)),
          org.apache.spark.sql.functions.sum("id")).head()
        batches.add((agg.getLong(0),
          if (agg.isNullAt(1)) 0L else agg.getLong(1))): Unit
      }
      .option("checkpointLocation",
        Files.createTempDirectory("singer-bpb-ck").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    import scala.jdk.CollectionConverters._
    val bs = batches.asScala.toSeq.filter(_._1 > 0)
    assert(bs.size >= 5, s"~20 KB at a 2 KB cap must split: ${bs.size}")
    // a split landing MID-LINE would corrupt a record (json parse null or
    // a mangled id) and break one of these exact totals
    assert(bs.map(_._1).sum == n.toLong, s"records lost/duplicated: $bs")
    assert(bs.map(_._2).sum == n.toLong * (n + 1) / 2, s"id checksum: $bs")
  }

  test("integration: singer stream -> watermarked dedup -> memory sink") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("singer-e2e")
    val schemaLine =
      """{"type":"SCHEMA","stream":"events","schema":{"type":"object","properties":{
        |"event_id":{"type":"integer"},
        |"ts":{"type":"string","format":"date-time"},
        |"v":{"type":"number"}}}}""".stripMargin.replace("\n", "")
    def rec(id: Int, ts: String, v: Double) =
      s"""{"type":"RECORD","stream":"events","record":{"event_id":$id,"ts":"$ts","v":$v}}"""
    val f = dir.resolve("events.jsonl")
    Files.writeString(f, Seq(schemaLine,
      rec(1, "2024-01-01T00:00:01Z", 1.0),
      rec(2, "2024-01-01T00:00:02Z", 2.0),
      rec(1, "2024-01-01T00:00:03Z", 99.0) // duplicate event_id
    ).mkString("", "\n", "\n"))
    val src = spark.readStream.format("singer").option("stream", "events")
      .load(dir.toString + "/*.jsonl")
      .select(col("event_id"), col("ts"), col("v"))
    val q = graft.ops.Streaming.dedupedStream(src)
      .writeStream.format("memory").queryName("singer_e2e_t")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("singer_e2e_t").count() == 2)
      Files.writeString(f, Seq(
        rec(2, "2024-01-01T00:00:04Z", 3.0), // dup again, later batch
        rec(3, "2024-01-01T00:00:05Z", 4.0)
      ).mkString("", "\n", "\n"), java.nio.file.StandardOpenOption.APPEND)
      q.processAllAvailable()
      val ids = spark.table("singer_e2e_t").select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.sameElements(Array(1L, 2L, 3L)),
        s"watermarked dedup over the singer stream: got ${ids.mkString(",")}")
    } finally q.stop()
  }

  test("inference fails loudly when the stream has no SCHEMA message") {
    val f = writeFeed(Seq(userRecord(1, "ada", 1.0, "2024-01-02")))
    val e = intercept[Exception] {
      spark.read.format("singer").option("stream", "users").load(f.toString)
    }
    assert(e.getMessage.contains("SCHEMA"))
  }
}
