package graft.lake

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Lake hygiene operations: compaction and partitioned layouts. */
class LakeCatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def parquetFiles(dir: Path): Seq[Path] =
    Files.walk(dir).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq

  private def tableDir(ns: String, table: String): Path = {
    val loc = spark.sql(s"DESCRIBE TABLE EXTENDED `$ns`.`$table`")
      .filter($"col_name" === "Location").select("data_type").head().getString(0)
    Paths.get(new java.net.URI(loc))
  }

  test("compact rewrites many small files into the target count, data intact") {
    val ns = s"cmp_${System.nanoTime()}"
    val cat = new SessionLakeCatalog(spark)
    val df = (1L to 1000L).toDF("id").repartition(10)
    cat.ensureTable(ns, "t", df.schema)
    // simulate many tiny appends
    (0 until 5).foreach(_ => cat.append(ns, "t", df))
    val before = parquetFiles(tableDir(ns, "t")).size
    assert(before >= 20, s"expected many small files, got $before")
    val sumBefore = cat.load(ns, "t").agg(org.apache.spark.sql.functions.sum("id"))
      .head().getLong(0)
    cat.compact(ns, "t", targetFiles = 2)
    val after = parquetFiles(tableDir(ns, "t")).size
    assert(after <= 3, s"compaction left $after files")
    assert(cat.load(ns, "t").count() == 5000)
    assert(cat.load(ns, "t").agg(org.apache.spark.sql.functions.sum("id"))
      .head().getLong(0) == sumBefore)
    cat.dropNamespace(ns)
  }

  test("compact rejects nonpositive file targets") {
    val cat = new SessionLakeCatalog(spark)
    intercept[IllegalArgumentException](cat.compact("x", "y", 0))
  }

  test("compact preserves partition layout — pruning survives compaction") {
    val ns = s"cmpp_${System.nanoTime()}"
    val cat = new SessionLakeCatalog(spark)
    val df = (1L to 400L).map(i => (i, s"c${i % 2}")).toDF("id", "cat")
    cat.ensureTable(ns, "t", df.schema, partitionBy = Seq("cat"))
    (0 until 4).foreach(_ => cat.append(ns, "t", df.repartition(5)))
    val before = parquetFiles(tableDir(ns, "t")).size
    assert(before >= 20, s"expected many small files, got $before")
    cat.compact(ns, "t", targetFiles = 2)
    assert(parquetFiles(tableDir(ns, "t")).size <= 4)
    // partition directories survived the rewrite...
    val dirs = Files.list(tableDir(ns, "t")).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("cat=")).toSet
    assert(dirs == Set("cat=c0", "cat=c1"), dirs.mkString(","))
    // ...and so did pruning and the data
    val plan = cat.load(ns, "t")
      .filter($"cat" === "c0").queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(cat"), plan.take(1500))
    assert(cat.load(ns, "t").count() == 1600)
    cat.dropNamespace(ns)
  }

  test("compact refuses bucketed tables (a rewrite would drop the bucket spec)") {
    val ns = s"cmpb_${System.nanoTime()}"
    val cat = new SessionLakeCatalog(spark)
    cat.writeBucketed(ns, "t", (1L to 100L).toDF("id"), Seq("id"), 4)
    val e = intercept[IllegalArgumentException](cat.compact(ns, "t", 2))
    assert(e.getMessage.contains("bucket"))
    cat.dropNamespace(ns)
  }

  test("partition_by config lands a partitioned directory layout") {
    val ns = s"part_${System.nanoTime()}"
    val cat = new SessionLakeCatalog(spark)
    val loader = new BatchLoader(spark, cat, ns,
      partitionBy = Map("ev" -> Seq("cat")))
    val schema =
      """{"type":"SCHEMA","stream":"ev","schema":{"properties":{
        |"id":{"type":["integer"]},"cat":{"type":["string"]}}}}"""
        .stripMargin.replaceAll("\n", "")
    val lines = Seq(schema) ++ (1 to 10).map(i =>
      s"""{"type":"RECORD","stream":"ev","record":{"id":$i,"cat":"c${i % 2}"}}""")
    val report = loader.load(spark.createDataset(lines))
    assert(report.rowsPerStream("ev") == 10L)
    val dirs = Files.list(tableDir(ns, "ev")).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("cat=")).toSet
    assert(dirs == Set("cat=c0", "cat=c1"), dirs.mkString(","))
    // partition pruning reaches the scan
    val plan = cat.load(ns, "ev")
      .filter($"cat" === "c0").queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(cat"), plan.take(1500))
    cat.dropNamespace(ns)
  }

  test("sorted_by config routes the load through sorted appends " +
    "(rows exact; snapshot carrier declares the sort order)") {
    val ns = s"srt_${System.nanoTime()}"
    val cat = DirectoryLakeCatalog.temp(spark)
    val loader = new BatchLoader(spark, cat, ns,
      sortedBy = Map("ev" -> Seq("id")))
    val schema =
      """{"type":"SCHEMA","stream":"ev","schema":{"properties":{
        |"id":{"type":["integer"]},"v":{"type":["string"]}}}}"""
        .stripMargin.replaceAll("\n", "")
    val shuffled = new scala.util.Random(5).shuffle((1 to 50).toList)
    val lines = Seq(schema) ++ shuffled.map(i =>
      s"""{"type":"RECORD","stream":"ev","record":{"id":$i,"v":"x$i"}}""")
    val report = loader.load(spark.createDataset(lines))
    assert(report.rowsPerStream("ev") == 50L)
    assert(cat.load(ns, "ev").collect().map(_.getLong(0)).sorted.toSeq ==
      (1L to 50L))
    // the write order is declared in the Iceberg metadata
    val meta = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      Files.readString {
        val md = cat.root.resolve(ns).resolve("ev").resolve("metadata")
        Files.list(md).iterator().asScala.map(_.getFileName.toString)
          .collect { case s if s.startsWith("v") &&
            s.endsWith(".metadata.json") =>
            s.stripPrefix("v").stripSuffix(".metadata.json").toInt }
          .toSeq.sorted.lastOption
          .map(v => md.resolve(s"v$v.metadata.json")).get
      })
    val declared = meta.get("sort-orders").elements().asScala
      .filter(_.get("fields").size() > 0).toSeq
    assert(declared.size == 1 &&
      declared.head.get("fields").get(0).get("source-id").asInt() == 1)
    assert(meta.get("default-sort-order-id").asInt() ==
      declared.head.get("order-id").asInt())
    cat.dropNamespace(ns)
  }

  test("sorted_by path still counts rejects exactly (the observe-based " +
    "tally is bypassed on this path)") {
    val ns = s"srtrej_${System.nanoTime()}"
    val cat = DirectoryLakeCatalog.temp(spark)
    val loader = new BatchLoader(spark, cat, ns,
      sortedBy = Map("ev" -> Seq("id")))
    val schema =
      """{"type":"SCHEMA","stream":"ev","schema":{"properties":{
        |"id":{"type":["integer"]},"v":{"type":["string"]}}}}"""
        .stripMargin.replaceAll("\n", "")
    val lines = Seq(schema,
      """{"type":"RECORD","stream":"ev","record":{"id":1,"v":"a"}}""",
      """{"type":"RECORD","stream":"ev","record":{"id":"NOT_AN_INT","v":"b"}}""",
      """{"type":"RECORD","stream":"ev","record":{"id":3,"v":"c"}}""")
    val report = loader.load(spark.createDataset(lines))
    assert(report.rowsPerStream("ev") == 2L)
    assert(report.rejectedPerStream.getOrElse("ev", 0L) == 1L,
      "sorted path lost the reject count")
    assert(cat.load(ns, "ev").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L))
    cat.dropNamespace(ns)
  }

  test("sorted_by composes with ACTIVATE_VERSION: the full refresh is " +
    "rewritten SORTED, the order is declared, files sized to the batch") {
    val ns = s"srtav_${System.nanoTime()}"
    val cat = DirectoryLakeCatalog.temp(spark)
    val loader = new BatchLoader(spark, cat, ns,
      sortedBy = Map("ev" -> Seq("id")))
    val schema =
      """{"type":"SCHEMA","stream":"ev","schema":{"properties":{
        |"id":{"type":["integer"]},"v":{"type":["string"]}}}}"""
        .stripMargin.replaceAll("\n", "")
    // seed the table, then a versioned feed swaps it wholesale
    loader.load(spark.createDataset(Seq(schema,
      """{"type":"RECORD","stream":"ev","record":{"id":999,"v":"old"}}""")))
    val shuffled = new scala.util.Random(9).shuffle((1 to 60).toList)
    val versioned = Seq(schema) ++ shuffled.map(i =>
        s"""{"type":"RECORD","stream":"ev","record":{"id":$i,"v":"x$i"}}""") ++
      Seq("""{"type":"ACTIVATE_VERSION","stream":"ev","version":7}""")
    val report = loader.load(spark.createDataset(versioned))
    assert(report.rowsPerStream("ev") == 60L)
    val out = cat.load(ns, "ev")
    assert(out.collect().map(_.getLong(0)).sorted.toSeq == (1L to 60L),
      "ACTIVATE_VERSION swap lost rows or kept the old generation")
    assert(out.inputFiles.length <= 2,
      s"sorted full refresh shattered into ${out.inputFiles.length} files")
    // the order was declared through the overwrite face too
    val md = cat.root.resolve(ns).resolve("ev").resolve("metadata")
    val meta = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      Files.readString(Files.list(md).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".metadata.json"))
        .maxBy(_.getFileName.toString
          .stripPrefix("v").stripSuffix(".metadata.json").toInt)))
    assert(meta.get("sort-orders").elements().asScala
      .exists(_.get("fields").size() > 0))
    cat.dropNamespace(ns)
  }

  test("sorted_by config parses beside partition_by (TargetConfig)") {
    val cfg = TargetConfig.fromJson(
      """{"aws_access_key_id":"k","aws_secret_access_key":"s",
        |"s3_endpoint":"e","iceberg_rest_uri":"u",
        |"iceberg_catalog_name":"c","iceberg_catalog_namespace_name":"n",
        |"sorted_by":{"ev":["id","ts"]},"partition_by":{"ev":["cat"]}}"""
        .stripMargin.replaceAll("\n", ""))
    assert(cfg.isRight)
    assert(cfg.toOption.get.sortedBy == Map("ev" -> Seq("id", "ts")))
    assert(cfg.toOption.get.partitionBy == Map("ev" -> Seq("cat")))
  }
}
