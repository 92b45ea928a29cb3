package graft

import graft.lake.{BatchLoader, SessionLakeCatalog, TargetConfig}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** CLI-path contract: config file -> validated config -> end-to-end JSONL
  * file load into a catalog table (the console-script lifecycle of the
  * reference, target.py:64-65, minus the process boundary). */
class GraftTargetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val configJson =
    """{"aws_access_key_id":"k","aws_secret_access_key":"s",
      |"s3_endpoint":"http://localhost:9000","iceberg_rest_uri":"http://c",
      |"iceberg_catalog_name":"cat",
      |"iceberg_catalog_namespace_name":"NSNAME",
      |"add_record_metadata":true,"batch_size":7}"""
      .stripMargin.replaceAll("\n", "")

  test("config file drives an end-to-end file -> table load") {
    val ns = s"cli_${System.nanoTime()}"
    val cfg = TargetConfig.fromJson(configJson.replace("NSNAME", ns)).toOption.get
    assert(cfg.batchSize == 7 && cfg.addRecordMetadata)

    val msgs = Files.createTempFile("msgs", ".jsonl")
    val lines =
      """{"type":"SCHEMA","stream":"people","schema":{"properties":{"name":{"type":["string"]},"age":{"type":["integer","null"]}}}}""" +:
        (1 to 17).map(i => s"""{"type":"RECORD","stream":"people","record":{"name":"p$i","age":$i}}""") :+
        """{"type":"STATE","value":{"done":true}}"""
    Files.write(msgs, String.join("\n", lines: _*).getBytes)

    val cat = new SessionLakeCatalog(spark)
    val loader = BatchLoader.fromConfig(spark, cat, cfg)
    val report = loader.load(spark.read.textFile(msgs.toString))
    assert(report.rowsPerStream == Map("people" -> 17L))
    assert(report.statesToEcho == Seq("""{"done":true}"""))
    val back = cat.load(ns, "people")
    assert(back.count() == 17)
    assert(back.columns.contains("_sdc_sequence"))
    cat.dropNamespace(ns)
  }

  test("invalid config fails fast before any Spark work") {
    assert(TargetConfig.fromJson("""{"iceberg_catalog_name":"c"}""").isLeft)
  }

  test("--version reports a non-empty semantic version") {
    // the SDK CLI surface the reference inherits (target.py:64-65)
    assert(GraftTarget.Version.matches("""\d+\.\d+\.\d+.*"""),
      GraftTarget.Version)
  }

  test("--about markdown renders every setting and capability of the JSON") {
    val md = TargetConfig.aboutMarkdown
    val js = TargetConfig.aboutJson
    // same single source: every JSON property name appears in the table,
    // required keys marked, capabilities listed
    val names = """"(\w+)": \{"type"""".r.findAllMatchIn(js).map(_.group(1))
    names.foreach(n => assert(md.contains(s"| `$n` |"), s"missing $n"))
    TargetConfig.Capabilities.foreach(c => assert(md.contains(s"* `$c`")))
    TargetConfig.RequiredKeys.foreach { k =>
      val row = md.linesIterator.find(_.contains(s"| `$k` |")).get
      assert(row.contains("| yes |"), row)
    }
    // defaults surface verbatim (s3_bucket's quoted literal included)
    assert(md.contains("\"lakehouse\""))
  }

  test("a single compressed feed file routes to the legacy scan and loads") {
    val ns = s"cli_${System.nanoTime()}"
    val cfg = TargetConfig.fromJson(configJson.replace("NSNAME", ns)).toOption.get
    val dir = Files.createTempDirectory("gzfeed")
    val gz = dir.resolve("feed.jsonl.gz")
    val lines =
      """{"type":"SCHEMA","stream":"people","schema":{"properties":{"name":{"type":["string"]}}}}""" +:
        (1 to 3).map(i => s"""{"type":"RECORD","stream":"people","record":{"name":"p$i"}}""")
    val out = new java.util.zip.GZIPOutputStream(Files.newOutputStream(gz))
    out.write(lines.mkString("\n").getBytes); out.close()

    val cat = new SessionLakeCatalog(spark)
    val loader = BatchLoader.fromConfig(spark, cat, cfg)
    // ONE listing feeds the CLI routing decision and the load
    val files = BatchLoader.listInput(spark, Seq(dir.toString))
    assert(files.map(f => f.substring(f.lastIndexOf('/') + 1)) ==
      Seq("feed.jsonl.gz"))
    assert(files.forall(BatchLoader.isCompressed))
    // loadPaths must refuse: a codec stream reports no exact line offsets
    intercept[IllegalArgumentException](loader.loadPaths(Seq(gz.toString)))
    // the single-file fallback: codec-decoded by extension, one split, so
    // scan order IS feed order
    val report = loader.load(spark.read.textFile(files.head))
    assert(report.rowsPerStream == Map("people" -> 3L))
    assert(cat.load(ns, "people").count() == 3)

    // several files with ANY compressed: seq across codec files would
    // follow partition planning, not feed order — the CLI must refuse
    // (exercised here as the routing predicate it branches on)
    Files.writeString(dir.resolve("more.jsonl"),
      """{"type":"RECORD","stream":"people","record":{"name":"p4"}}""")
    val mixed = BatchLoader.listInput(spark, Seq(dir.toString))
    assert(mixed.length == 2 && mixed.exists(BatchLoader.isCompressed))
    cat.dropNamespace(ns)
  }
}
