package graft.lake

import graft.TestSpark
import org.apache.spark.sql.functions.sum
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** The trait-isolation proof (VERDICT r6 #2): the FULL [[LakeCatalog]]
  * lifecycle contract — create/evolve/drift/append/overwrite/partition/
  * compact — run identically against BOTH implementations, plus the Singer
  * load path end-to-end through each. A real Iceberg/REST catalog binding
  * is a third row in this matrix, not a loader change. */
class LakeCatalogMatrixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** name + factory + a data-directory resolver for file-count assertions
    * (the one thing the trait deliberately does NOT expose). */
  private case class Impl(name: String, make: () => LakeCatalog,
                          dir: (LakeCatalog, String, String) => Path)

  private def sessionDir(cat: LakeCatalog, ns: String, table: String): Path = {
    val loc = spark.sql(s"DESCRIBE TABLE EXTENDED `$ns`.`$table`")
      .filter($"col_name" === "Location").select("data_type").head().getString(0)
    Paths.get(new java.net.URI(loc))
  }

  /** One stub catalog server for the whole suite (namespaces are fresh
    * per test); each rest make() gets its own warehouse + HTTP client. */
  private lazy val restServer = RestCatalogStub.start()

  private val impls = Seq(
    Impl("session", () => new SessionLakeCatalog(spark), sessionDir),
    Impl("directory", () => DirectoryLakeCatalog.temp(spark),
      (cat, ns, table) => cat.asInstanceOf[DirectoryLakeCatalog]
        .root.resolve(ns).resolve(table)),
    Impl("rest", () => new RestLakeCatalog(spark, restServer.uri,
        Files.createTempDirectory("graft-rest-wh-")),
      (cat, ns, table) => cat.asInstanceOf[RestLakeCatalog]
        .warehouse.resolve(ns).resolve(table)))

  private def parquetFiles(dir: Path): Seq[Path] =
    Files.walk(dir).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq

  private def freshNs(): String = s"mx_${System.nanoTime()}"

  // metadata-log parity (VERDICT r14 #8): BOTH snapshot carriers log one
  // entry per prior version naming a real, parseable metadata file — the
  // directory carrier logs its own version files, the REST carrier
  // mirrors prior versions client-side at commit time
  for (impl <- impls if impl.name != "session") {
    test(s"[${impl.name}] metadata-log names existing, parseable prior " +
      "metadata documents, capped by write.metadata.previous-versions-max") {
      val cat = impl.make().asInstanceOf[SnapshotLakeCatalog]
      val ns = freshNs()
      val df = Seq((1L, "a")).toDF("id", "v")
      cat.ensureTable(ns, "t", df.schema)
      cat.append(ns, "t", df)
      cat.append(ns, "t", Seq((2L, "b")).toDF("id", "v"))
      assert(cat.metadataLogSize(ns, "t") >= 2,
        "two commits after creation -> at least two prior versions logged")
      // the logged files exist and parse as metadata documents (the
      // q227-class __mlog contract, now on every snapshot carrier)
      val logged = cat.metadataLogFiles(ns, "t")
      assert(logged.size == cat.metadataLogSize(ns, "t"))
      logged.foreach { f =>
        val p = Paths.get(f)
        assert(Files.exists(p), s"logged metadata file must exist: $f")
        val doc = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(Files.readString(p))
        assert(doc.has("schemas") && doc.has("snapshots"),
          s"logged document must be a metadata json: $f")
      }
      // retention cap applies on every carrier
      cat.setProperties(ns, "t",
        Map("write.metadata.previous-versions-max" -> "2"))
      cat.append(ns, "t", Seq((3L, "c")).toDF("id", "v"))
      cat.append(ns, "t", Seq((4L, "d")).toDF("id", "v"))
      assert(cat.metadataLogSize(ns, "t") == 2,
        "retention must truncate to the 2 most recent priors")
      cat.dropNamespace(ns)
    }
  }

  for (impl <- impls) {
    test(s"[${impl.name}] create / append / overwrite / load lifecycle") {
      val cat = impl.make(); val ns = freshNs()
      val schema = StructType(Seq(StructField("id", LongType),
        StructField("name", StringType)))
      assert(!cat.tableExists(ns, "t"))
      cat.ensureTable(ns, "t", schema)
      assert(cat.tableExists(ns, "t"))
      assert(cat.load(ns, "t").schema.fieldNames.toSeq == Seq("id", "name"))
      assert(cat.load(ns, "t").count() == 0)
      cat.append(ns, "t", Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
      cat.append(ns, "t", Seq((3L, "c")).toDF("id", "name"))
      assert(cat.load(ns, "t").count() == 3)
      assert(cat.load(ns, "t").agg(sum("id")).head().getLong(0) == 6L)
      // ACTIVATE_VERSION semantics: full-table swap in one commit
      cat.overwrite(ns, "t", Seq((9L, "z")).toDF("id", "name"))
      assert(cat.load(ns, "t").collect().map(r => (r.getLong(0),
        r.getString(1))).toSeq == Seq((9L, "z")))
      cat.dropNamespace(ns)
      assert(!cat.tableExists(ns, "t"))
    }

    test(s"[${impl.name}] additive evolution: old rows read NULL in new column") {
      val cat = impl.make(); val ns = freshNs()
      cat.ensureTable(ns, "t", StructType(Seq(StructField("id", LongType))))
      cat.append(ns, "t", Seq(1L, 2L).toDF("id"))
      val widened = StructType(Seq(StructField("id", LongType),
        StructField("tag", StringType)))
      cat.ensureTable(ns, "t", widened) // A12: ALTER in the new column
      assert(cat.load(ns, "t").schema.fieldNames.toSeq == Seq("id", "tag"))
      cat.append(ns, "t", Seq((3L, "new")).toDF("id", "tag"))
      val rows = cat.load(ns, "t").orderBy("id").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
      assert(rows == Seq((1L, None), (2L, None), (3L, Some("new"))))
      cat.dropNamespace(ns)
    }

    test(s"[${impl.name}] type drift on an existing column fails loudly") {
      val cat = impl.make(); val ns = freshNs()
      cat.ensureTable(ns, "t", StructType(Seq(StructField("id", LongType))))
      val drifted = StructType(Seq(StructField("id", StringType)))
      val e = intercept[IllegalArgumentException](
        cat.ensureTable(ns, "t", drifted))
      assert(e.getMessage.contains("schema drift"))
      cat.dropNamespace(ns)
    }

    test(s"[${impl.name}] type promotion: int->long, float->double, " +
      "decimal widening evolve; old files read back widened; unsafe " +
      "changes still drift") {
      import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType,
        IntegerType}
      val cat = impl.make(); val ns = freshNs()
      val narrow = Seq((1, 1.25, "1.25"), (2, 2.75, "2.50"))
        .toDF("id0", "score0", "amt0")
        .select($"id0".cast(IntegerType).as("id"),
          $"score0".cast(FloatType).as("score"),
          $"amt0".cast(DecimalType(8, 2)).as("amt"))
      cat.ensureTable(ns, "t", narrow.schema)
      cat.append(ns, "t", narrow)
      val wide = StructType(Seq(StructField("id", LongType),
        StructField("score", DoubleType),
        StructField("amt", DecimalType(16, 2))))
      cat.ensureTable(ns, "t", wide) // VERDICT r11 #1: promotion evolution
      val sch = cat.load(ns, "t").schema
      assert(sch("id").dataType == LongType &&
        sch("score").dataType == DoubleType &&
        sch("amt").dataType == DecimalType(16, 2), sch.catalogString)
      // the PRE-promotion files read back under the widened types
      val old = cat.load(ns, "t").orderBy("id").collect()
        .map(r => (r.getLong(0), r.getDouble(1),
          r.getDecimal(2).toPlainString)).toSeq
      assert(old == Seq((1L, 1.25, "1.25"), (2L, 2.75, "2.50")), old)
      // values only the WIDE types can hold now land
      val big = Seq((5000000000L, 3.5, "123456789012.75"))
        .toDF("id", "score0", "amt0")
        .select($"id", $"score0".cast(DoubleType).as("score"),
          $"amt0".cast(DecimalType(16, 2)).as("amt"))
      cat.append(ns, "t", big)
      // a STILL-NARROW writer is accepted after the promotion (casts up)
      cat.append(ns, "t", Seq((7, 0.25, "0.25")).toDF("i", "s", "a")
        .select($"i".cast(IntegerType).as("id"),
          $"s".cast(FloatType).as("score"),
          $"a".cast(DecimalType(8, 2)).as("amt")))
      val agg = cat.load(ns, "t")
        .agg(sum("id"), sum("score"), sum("amt")).head()
      assert(agg.getLong(0) == 5000000010L, agg.toString)
      assert(agg.getDouble(1) == 7.75, agg.toString)
      assert(agg.getDecimal(2).toPlainString == "123456789016.75", agg)
      // unsafe changes keep failing loudly: decimal SCALE change
      val e = intercept[IllegalArgumentException](cat.ensureTable(ns, "t",
        StructType(Seq(StructField("amt", DecimalType(16, 3))))))
      assert(e.getMessage.contains("schema drift"), e.getMessage)
      // ... and narrowing is never an evolution either
      val e2 = intercept[IllegalArgumentException](cat.ensureTable(ns, "t",
        StructType(Seq(StructField("score", StringType)))))
      assert(e2.getMessage.contains("schema drift"), e2.getMessage)
      cat.dropNamespace(ns)
    }

    test(s"[${impl.name}] renameColumn: pre-rename files read under the " +
      "new name; layout-bearing columns are refused") {
      val cat = impl.make(); val ns = freshNs()
      cat.ensureTable(ns, "t", StructType(Seq(StructField("id", LongType),
        StructField("name", StringType))))
      cat.append(ns, "t", Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
      cat.renameColumn(ns, "t", "name", "title") // VERDICT r11 #2
      assert(cat.load(ns, "t").schema.fieldNames.toSeq ==
        Seq("id", "title"))
      // pre-rename data files read under the NEW name
      assert(cat.load(ns, "t").orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((1L, "a"), (2L, "b")))
      // post-rename writes + filters on the new name work end to end
      cat.append(ns, "t", Seq((3L, "c")).toDF("id", "title"))
      assert(cat.load(ns, "t").filter($"title" >= "b").count() == 2)
      val e = intercept[IllegalArgumentException](
        cat.renameColumn(ns, "t", "missing", "x"))
      assert(e.getMessage.contains("no column"), e.getMessage)
      val e2 = intercept[IllegalArgumentException](
        cat.renameColumn(ns, "t", "id", "title"))
      assert(e2.getMessage.contains("already has"), e2.getMessage)
      // identity partition source renames on EVERY carrier (round 15
      // closes the last session-carrier divergence): the session
      // carrier's rename is a staged rewrite anyway, so the new name
      // simply becomes the new directory layout; the snapshot carriers
      // rename it metadata-only as rename + spec generation (round 13)
      val df = Seq((1L, "x")).toDF("id", "cat")
      cat.ensureTable(ns, "p", df.schema, partitionBy = Seq("cat"))
      cat.append(ns, "p", df)
      cat.renameColumn(ns, "p", "cat", "category")
      cat.append(ns, "p", Seq((2L, "y")).toDF("id", "category"))
      assert(cat.load(ns, "p").orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((1L, "x"), (2L, "y")))
      cat.dropNamespace(ns)
    }

    if (impl.name == "session")
      test("[session] '__graft_stage' suffix is reserved: refused at " +
        "create; a pre-existing stage table fails the rewrite LOUDLY " +
        "instead of being clobbered") {
      val cat = impl.make(); val ns = freshNs()
      val df = Seq((1L, "a")).toDF("id", "name")
      val e = intercept[IllegalArgumentException](
        cat.ensureTable(ns, "u__graft_stage", df.schema))
      assert(e.getMessage.contains("reserved"), e.getMessage)
      cat.ensureTable(ns, "t", df.schema)
      cat.append(ns, "t", df)
      // a remnant under the staging name (e.g. a crashed prior rewrite)
      // must never be silently overwritten by the next rewrite
      Seq((99L, "keep")).toDF("id", "name").write.format("parquet")
        .saveAsTable(s"`$ns`.`t__graft_stage`")
      val e2 = intercept[IllegalStateException](
        cat.renameColumn(ns, "t", "name", "title"))
      assert(e2.getMessage.contains("already exists"), e2.getMessage)
      assert(spark.table(s"`$ns`.`t__graft_stage`").collect()
        .map(_.getLong(0)).toSeq == Seq(99L),
        "the pre-existing stage table must be untouched")
      assert(cat.load(ns, "t").schema.fieldNames.contains("name"),
        "the refused rewrite must leave the primary table unchanged")
      cat.dropNamespace(ns)
    }

    if (impl.name != "session")
      test(s"[${impl.name}] rename and promotion are METADATA-ONLY: " +
        "every data file byte-identical in place (VERDICT r12 #4)") {
      import org.apache.spark.sql.types.IntegerType
      val cat = impl.make(); val ns = freshNs()
      val df = Seq((1, "a"), (2, "b")).toDF("i", "n")
        .select($"i".cast(IntegerType).as("id"), $"n".as("name"))
      cat.ensureTable(ns, "t", df.schema)
      cat.append(ns, "t", df)
      def fileState(): Set[(String, Long, Long)] =
        parquetFiles(impl.dir(cat, ns, "t")).map(p =>
          (p.toString, Files.size(p),
            Files.getLastModifiedTime(p).toMillis)).toSet
      val before = fileState()
      cat.renameColumn(ns, "t", "name", "title")
      cat.ensureTable(ns, "t", StructType(Seq(
        StructField("id", LongType), StructField("title", StringType))))
      assert(fileState() == before,
        "rename/promotion must not touch a data file on a snapshot carrier")
      assert(cat.load(ns, "t").schema("id").dataType == LongType)
      assert(cat.load(ns, "t").orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((1L, "a"), (2L, "b")))
      cat.dropNamespace(ns)
    }

    if (impl.name != "session")
      test(s"[${impl.name}] a partition_by hint on a BUCKETED table is " +
        "skipped, not a hard failure (ADVICE r12)") {
      val cat = impl.make(); val ns = freshNs()
      val df = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      cat.writeBucketed(ns, "t", df, Seq("id"), numBuckets = 2)
      // a config that declares partition_by for a since-bucketed table
      // must keep loading — the hint is ignored, as before spec evolution
      cat.ensureTable(ns, "t", df.schema, partitionBy = Seq("name"))
      cat.append(ns, "t", Seq((3L, "c")).toDF("id", "name"))
      assert(cat.load(ns, "t").count() == 3L)
      // explicit spec evolution on a bucketed table still refuses loudly
      val cc = cat.asInstanceOf[SnapshotLakeCatalog]
      val e = intercept[IllegalArgumentException](
        cc.updatePartitionSpec(ns, "t", Seq("name")))
      assert(e.getMessage.contains("bucketed"), e.getMessage)
      cat.dropNamespace(ns)
    }

    test(s"[${impl.name}] partitioned layout: directories + scan pruning") {
      val cat = impl.make(); val ns = freshNs()
      val df = (1L to 100L).map(i => (i, s"c${i % 2}")).toDF("id", "cat")
      cat.ensureTable(ns, "t", df.schema, partitionBy = Seq("cat"))
      cat.append(ns, "t", df)
      val partDirs = Files.walk(impl.dir(cat, ns, "t")).iterator().asScala
        .filter(Files.isDirectory(_)).map(_.getFileName.toString)
        .filter(_.startsWith("cat=")).toSet
      assert(partDirs == Set("cat=c0", "cat=c1"), partDirs.mkString(","))
      val plan = cat.load(ns, "t").filter($"cat" === "c0")
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [isnotnull(cat"), plan.take(1500))
      assert(cat.load(ns, "t").filter($"cat" === "c0").count() == 50)
      cat.dropNamespace(ns)
    }

    test(s"[${impl.name}] compact: many small files -> target count, data intact") {
      val cat = impl.make(); val ns = freshNs()
      val df = (1L to 1000L).toDF("id").repartition(10)
      cat.ensureTable(ns, "t", df.schema)
      (0 until 5).foreach(_ => cat.append(ns, "t", df))
      val dir = impl.dir(cat, ns, "t")
      assert(parquetFiles(dir).size >= 20)
      cat.compact(ns, "t", targetFiles = 2)
      // directory impl keeps unreferenced old snapshots (expire-snapshots
      // debt); count only what load() actually reads
      val live = cat.load(ns, "t")
      assert(live.rdd.getNumPartitions <= 4,
        s"live read spans ${live.rdd.getNumPartitions} partitions")
      assert(live.count() == 5000)
      assert(live.agg(sum("id")).head().getLong(0) == 5 * 500500L)
      cat.dropNamespace(ns)
    }

    test(s"[${impl.name}] full replacements refuse bucketed tables " +
      "(overwrite / overwriteSorted would silently drop or orphan the " +
      "bucket spec); COW delete and merge are BUCKET-AWARE rewrites " +
      "(VERDICT r13 #3)") {
      val cat = impl.make(); val ns = freshNs()
      val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      cat.writeBucketed(ns, "t", df, Seq("id"), numBuckets = 2)
      val e1 = intercept[IllegalArgumentException](
        cat.overwrite(ns, "t", df))
      assert(e1.getMessage.contains("writeBucketed"), e1.getMessage)
      val e3 = intercept[IllegalArgumentException](
        cat.overwriteSorted(ns, "t", df, Seq("id")))
      assert(e3.getMessage.contains("writeBucketed"), e3.getMessage)
      if (impl.name == "session") {
        // the session carrier's merge rewrite cannot re-declare bucketBy
        // mid-write: still refused there (documented carrier divergence)
        val e2 = intercept[IllegalArgumentException](
          cat.merge(ns, "t", Seq("id"), Seq((1L, "x")).toDF("id", "v")))
        assert(e2.getMessage.contains("writeBucketed"), e2.getMessage)
        assert(cat.load(ns, "t").count() == 2L)
      } else {
        val cc = cat.asInstanceOf[SnapshotLakeCatalog]
        // merge on a bucketed table re-clusters the rewrite AND the
        // incoming dir through the spec's repartition — replace-by-key
        // lands, clustering contract intact
        cc.merge(ns, "t", Seq("id"), Seq((1L, "x")).toDF("id", "v"))
        assert(cat.load(ns, "t").orderBy("id").collect()
          .map(r => (r.getLong(0), r.getString(1))).toSeq ==
          Seq((1L, "x"), (2L, "b")))
        // COW delete: rewrites the touched group bucket-clustered (live
        // file count stays within the bucket budget) and the rows are
        // exactly the remainder
        assert(cc.deleteWhere(ns, "t", $"id" === 1L) == 1L)
        assert(cat.load(ns, "t").collect().map(_.getLong(0)).toSeq ==
          Seq(2L))
        assert(cat.load(ns, "t").inputFiles.length <= 2,
          "bucket-aware rewrite must keep the live set within the " +
            "bucket count")
        cat.append(ns, "t", Seq((1L, "re")).toDF("id", "v"))
        assert(cat.load(ns, "t").count() == 2L)
      }
      cat.dropNamespace(ns)
    }

    if (impl.name != "session")
      test(s"[${impl.name}] COW delete on a bucket(N, col) TRANSFORM " +
        "table keeps per-bucket directories: the partitions face still " +
        "reports bucket dirs and point-lookup pruning holds after the " +
        "delete (VERDICT r13 #3)") {
      val cat = impl.make().asInstanceOf[SnapshotLakeCatalog]
      val ns = freshNs()
      val df = (0L until 64L).map(i => (i, s"v$i")).toDF("id", "v")
      cat.ensureTable(ns, "t", df.schema, Seq("bucket(4, id)"))
      cat.append(ns, "t", df)
      def bucketDirs(): Set[String] = cat.metaTable(ns, "t", "partitions")
        .collect().map(_.getString(0)).toSet
      val before = bucketDirs()
      assert(before.nonEmpty && before.forall(_.startsWith("id_bucket=")),
        s"bucket transform dirs expected: $before")
      assert(cat.deleteWhere(ns, "t", $"id" % 2L === 0L) == 32L)
      val after = bucketDirs()
      assert(after == before,
        s"the rewrite must keep every bucket directory: $before -> $after")
      assert(cat.load(ns, "t").count() == 32L)
      // point-lookup pruning still bites: a single-id slice reads
      // strictly fewer files than the table holds
      val all = cat.load(ns, "t").inputFiles.length
      val one = cat.loadSlice(ns, "t", "id", "33", "33").inputFiles.length
      assert(one < all, s"bucket pruning after COW delete: $one vs $all")
      assert(cat.loadSlice(ns, "t", "id", "33", "33")
        .collect().map(_.getLong(0)).toSeq == Seq(33L))
      cat.dropNamespace(ns)
    }

    if (impl.name != "session")
      test(s"[${impl.name}] table properties mutate as CAS commits " +
        "(VERDICT r13 #8): set overwrites, remove drops, re-declaring " +
        "publishes nothing, absent table fails loudly") {
      val cat = impl.make().asInstanceOf[SnapshotLakeCatalog]
      val ns = freshNs()
      cat.ensureTable(ns, "t",
        StructType(Seq(StructField("id", LongType))))
      assert(cat.tableProperties(ns, "t").isEmpty)
      cat.setProperties(ns, "t", Map("a" -> "1", "b" -> "2"))
      cat.setProperties(ns, "t", Map("b" -> "3")) // overwrite
      assert(cat.tableProperties(ns, "t") == Map("a" -> "1", "b" -> "3"))
      // a no-change set publishes no new version: the next data commit
      // still lands (the CAS base did not move underneath it)
      cat.setProperties(ns, "t", Map("a" -> "1"))
      cat.removeProperties(ns, "t", Seq("a", "missing"))
      assert(cat.tableProperties(ns, "t") == Map("b" -> "3"))
      // properties survive data commits and carrier round trips
      cat.append(ns, "t", Seq(1L).toDF("id"))
      assert(cat.tableProperties(ns, "t") == Map("b" -> "3"))
      intercept[IllegalArgumentException](
        cat.setProperties(ns, "nope", Map("x" -> "y")))
      cat.dropNamespace(ns)
    }

    test(s"[${impl.name}] compact refuses bucketed tables and bad targets") {
      val cat = impl.make(); val ns = freshNs()
      cat.writeBucketed(ns, "t", (1L to 100L).toDF("id"), Seq("id"), 4)
      assert(cat.load(ns, "t").count() == 100)
      val e = intercept[IllegalArgumentException](cat.compact(ns, "t", 2))
      assert(e.getMessage.contains("bucket"))
      intercept[IllegalArgumentException](cat.compact(ns, "t", 0))
      cat.dropNamespace(ns)
    }

    // snapshot-carrier surface: time travel + expiry (both carriers — the
    // machinery is SnapshotLakeCatalog's, the carrier only stores bytes)
    if (impl.name != "session") test(s"[${impl.name}] time travel + expireSnapshots") {
      val cat = impl.make().asInstanceOf[SnapshotLakeCatalog]
      val ns = freshNs()
      cat.ensureTable(ns, "t", StructType(Seq(StructField("id", LongType))))
      cat.append(ns, "t", Seq(1L, 2L).toDF("id"))          // snapshot 1
      cat.append(ns, "t", Seq(3L).toDF("id"))              // snapshot 2
      cat.overwrite(ns, "t", Seq(9L).toDF("id"))           // snapshot 3
      assert(cat.snapshotIds(ns, "t") == Seq(1L, 2L, 3L))
      assert(cat.loadAt(ns, "t", 1L).collect().map(_.getLong(0)).sorted
        .toSeq == Seq(1L, 2L))
      assert(cat.loadAt(ns, "t", 2L).collect().map(_.getLong(0)).sorted
        .toSeq == Seq(1L, 2L, 3L))
      assert(cat.load(ns, "t").collect().map(_.getLong(0)).toSeq == Seq(9L))
      // expire everything but the current snapshot: history reads fail
      // loudly, current data intact, orphaned directories reclaimed
      val dataDir = impl.dir(cat, ns, "t").resolve("data")
      val before = Files.list(dataDir).iterator().asScala.size
      cat.expireSnapshots(ns, "t", keepLast = 1)
      assert(cat.snapshotIds(ns, "t") == Seq(3L))
      assert(cat.load(ns, "t").collect().map(_.getLong(0)).toSeq == Seq(9L))
      val after = Files.list(dataDir).iterator().asScala.size
      assert(after < before, s"expiry reclaimed nothing ($before -> $after)")
      val e = intercept[IllegalArgumentException](cat.loadAt(ns, "t", 1L))
      assert(e.getMessage.contains("expired") ||
        e.getMessage.contains("unknown"))
      intercept[IllegalArgumentException](
        cat.expireSnapshots(ns, "t", keepLast = 0))
      cat.dropNamespace(ns)
    }

    if (impl.name != "session") test(s"[${impl.name}] expireSnapshotsOlderThan: age-based retention keeps " +
      "young snapshots and composes with ref protection") {
      val cat = impl.make().asInstanceOf[SnapshotLakeCatalog]
      val ns = freshNs()
      cat.ensureTable(ns, "t", Seq((1L, "a")).toDF("id", "v").schema)
      cat.append(ns, "t", Seq((1L, "a")).toDF("id", "v"))   // snap 1
      cat.append(ns, "t", Seq((2L, "b")).toDF("id", "v"))   // snap 2
      cat.tag(ns, "t", "pin", 1L)
      val cut = System.currentTimeMillis()
      Thread.sleep(5)
      cat.append(ns, "t", Seq((3L, "c")).toDF("id", "v"))   // snap 3 (young)
      // cutoff between 2 and 3: snap 2 is old and unprotected -> expired;
      // snap 1 is old but TAGGED -> kept; snap 3 is young -> kept
      cat.expireSnapshotsOlderThan(ns, "t", olderThanMs = cut)
      assert(cat.snapshotIds(ns, "t") == Seq(1L, 3L),
        cat.snapshotIds(ns, "t").mkString(","))
      assert(cat.load(ns, "t").count() == 3L) // current state untouched
      assert(cat.loadRef(ns, "t", "pin").count() == 1L)
      // a cutoff in the future = everything old: degrades to keepLast+refs
      cat.expireSnapshotsOlderThan(ns, "t",
        olderThanMs = System.currentTimeMillis() + 3600000L)
      assert(cat.snapshotIds(ns, "t") == Seq(1L, 3L)) // keepLast=1 + tag
      cat.dropNamespace(ns)
    }

    if (impl.name != "session") test(s"[${impl.name}] maintenance report + storage audit: reclaimable is a kept promise") {
      val cat = impl.make().asInstanceOf[SnapshotLakeCatalog]
      val ns = freshNs()
      cat.ensureTable(ns, "t", StructType(Seq(StructField("id", LongType))))
      cat.append(ns, "t", Seq(1L, 2L).toDF("id"))          // snapshot 1
      cat.append(ns, "t", Seq(3L).toDF("id"))              // snapshot 2
      cat.overwrite(ns, "t", Seq(9L).toDF("id"))           // snapshot 3
      val rep = cat.maintenanceReport(ns, "t", keepLast = 1).collect()
        .map(r => r.getAs[Long]("snapshot_id") -> r).toMap
      assert(rep.keySet == Set(1L, 2L, 3L))
      assert(rep(3L).getAs[Boolean]("is_current") &&
        !rep(3L).getAs[Boolean]("expirable"))
      assert(rep(1L).getAs[Boolean]("expirable") &&
        rep(2L).getAs[Boolean]("expirable"))
      assert(rep(2L).getAs[Long]("n_dirs") == 2L) // append refs both dirs
      assert(rep.values.forall(r => r.getAs[Long]("bytes") > 0L &&
        r.getAs[Long]("n_files") > 0L))
      // plant an orphan dir (the interrupted-expiry residue)
      val orphan = impl.dir(cat, ns, "t").resolve("data")
        .resolve("snap-0-orphan")
      Files.createDirectories(orphan)
      Files.write(orphan.resolve("stray.bin"), Array[Byte](1, 2, 3))
      val audit = cat.storageAudit(ns, "t", keepLast = 1).collect()(0)
      assert(audit.getAs[Long]("n_snapshots") == 3L)
      assert(audit.getAs[Long]("n_orphan_dirs") == 1L)
      assert(audit.getAs[Long]("orphan_bytes") == 3L)
      assert(audit.getAs[Long]("current_bytes") > 0L)
      assert(audit.getAs[Long]("retained_bytes") >=
        audit.getAs[Long]("current_bytes"))
      val promised = audit.getAs[Long]("reclaimable_bytes")
      assert(promised > 0L)
      // the promise is kept: expiry frees exactly the audited bytes
      def tableBytes(): Long = {
        val dd = impl.dir(cat, ns, "t").resolve("data")
        Files.walk(dd).iterator().asScala.filter(Files.isRegularFile(_))
          .map(Files.size).sum
      }
      val before = tableBytes()
      cat.expireSnapshots(ns, "t", keepLast = 1)
      assert(before - tableBytes() == promised)
      cat.dropNamespace(ns)
    }

    if (impl.name != "session") test(s"[${impl.name}] removeOrphans: collects aged unreferenced dirs, grace window protects the young, referenced data untouched") {
      val cat = impl.make().asInstanceOf[SnapshotLakeCatalog]
      val ns = freshNs()
      cat.ensureTable(ns, "t", StructType(Seq(StructField("id", LongType))))
      cat.append(ns, "t", Seq(1L, 2L).toDF("id"))          // snapshot 1
      cat.append(ns, "t", Seq(3L).toDF("id"))              // snapshot 2
      // plant TWO orphans: one aged past any grace, one fresh
      val dataDir = impl.dir(cat, ns, "t").resolve("data")
      val aged = dataDir.resolve("snap-0-aged-orphan")
      Files.createDirectories(aged)
      Files.write(aged.resolve("stray.bin"), Array[Byte](1, 2, 3, 4))
      val old = java.nio.file.attribute.FileTime
        .fromMillis(System.currentTimeMillis() - 48L * 3600 * 1000)
      Files.setLastModifiedTime(aged.resolve("stray.bin"), old)
      Files.setLastModifiedTime(aged, old)
      val young = dataDir.resolve("snap-0-young-orphan")
      Files.createDirectories(young)
      Files.write(young.resolve("inflight.bin"), Array[Byte](9))
      // plus a dangling per-dir manifest (crash between deleteTree and
      // the manifest unlink) and an unreferenced manifest-list (CAS loser)
      val md = impl.dir(cat, ns, "t").resolve("metadata")
      val danglingMf = md.resolve("manifest-snap-0-gone.avro")
      Files.write(danglingMf, Array[Byte](0))
      Files.setLastModifiedTime(danglingMf, old)
      val loserMl = md.resolve("manifest-list-0-loser.avro")
      Files.write(loserMl, Array[Byte](0))
      Files.setLastModifiedTime(loserMl, old)
      val rep = cat.removeOrphans(ns, "t").collect()(0)
      assert(rep.getAs[Long]("n_orphan_dirs") == 2L)
      assert(rep.getAs[Long]("n_removed_dirs") == 1L, "only the aged dir")
      assert(rep.getAs[Long]("bytes_freed") == 4L)
      assert(rep.getAs[Long]("n_removed_manifests") == 1L)
      assert(rep.getAs[Long]("n_removed_manifest_lists") == 1L)
      assert(!Files.exists(aged) && Files.exists(young),
        "grace window must protect the young orphan")
      assert(!Files.exists(danglingMf) && !Files.exists(loserMl))
      // referenced data and history untouched: current + time travel read
      assert(cat.load(ns, "t").collect().map(_.getLong(0)).sorted
        .toSeq == Seq(1L, 2L, 3L))
      assert(cat.loadAt(ns, "t", 1L).collect().map(_.getLong(0)).sorted
        .toSeq == Seq(1L, 2L))
      // grace 0 collects the remaining orphan; a second pass is a no-op
      val rep2 = cat.removeOrphans(ns, "t", graceMs = 0L).collect()(0)
      assert(rep2.getAs[Long]("n_removed_dirs") == 1L)
      assert(!Files.exists(young))
      val rep3 = cat.removeOrphans(ns, "t", graceMs = 0L).collect()(0)
      assert(rep3.getAs[Long]("n_orphan_dirs") == 0L &&
        rep3.getAs[Long]("n_removed_dirs") == 0L &&
        rep3.getAs[Long]("n_removed_manifests") == 0L &&
        rep3.getAs[Long]("n_removed_manifest_lists") == 0L)
      assert(cat.storageAudit(ns, "t").collect()(0)
        .getAs[Long]("n_orphan_dirs") == 0L)
      assert(cat.load(ns, "t").count() == 3L)
      intercept[IllegalArgumentException](
        cat.removeOrphans(ns, "t", graceMs = -1L))
      cat.dropNamespace(ns)
    }

    if (impl.name != "session") test(s"[${impl.name}] snapshot diff: multiset changelog between any two snapshots") {
      val cat = impl.make().asInstanceOf[SnapshotLakeCatalog]
      val ns = freshNs()
      cat.ensureTable(ns, "t", StructType(Seq(StructField("id", LongType))))
      cat.append(ns, "t", Seq(1L, 1L, 2L).toDF("id"))      // snapshot 1
      cat.append(ns, "t", Seq(3L).toDF("id"))              // snapshot 2
      cat.overwrite(ns, "t", Seq(9L).toDF("id"))           // snapshot 3
      def ids(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.getLong(0)).sorted.toSeq
      val (a12, r12) = cat.snapshotDiff(ns, "t", 1L, 2L)
      assert(ids(a12) == Seq(3L) && ids(r12) == Seq.empty)
      val (a23, r23) = cat.snapshotDiff(ns, "t", 2L, 3L)
      assert(ids(a23) == Seq(9L))
      // multiset semantics: the duplicated 1L appears twice in removed
      assert(ids(r23) == Seq(1L, 1L, 2L, 3L))
      val (a31, r31) = cat.snapshotDiff(ns, "t", 3L, 1L)
      assert(ids(a31) == Seq(1L, 1L, 2L) && ids(r31) == Seq(9L))
      cat.dropNamespace(ns)
    }

    if (impl.name != "session") test(s"[${impl.name}] rollback: new commit, history intact, writes continue") {
      val cat = impl.make().asInstanceOf[SnapshotLakeCatalog]
      val ns = freshNs()
      cat.ensureTable(ns, "t", StructType(Seq(StructField("id", LongType))))
      cat.append(ns, "t", Seq(1L, 2L).toDF("id"))          // snapshot 1
      cat.append(ns, "t", Seq(3L).toDF("id"))              // snapshot 2
      cat.rollbackTo(ns, "t", 1L)                          // snapshot 3
      // rollback is a NEW snapshot pointing at the old live set —
      // history is preserved, current state is the target's
      assert(cat.snapshotIds(ns, "t") == Seq(1L, 2L, 3L))
      assert(cat.load(ns, "t").collect().map(_.getLong(0)).sorted
        .toSeq == Seq(1L, 2L))
      // the abandoned state stays time-travelable until expiry
      assert(cat.loadAt(ns, "t", 2L).collect().map(_.getLong(0)).sorted
        .toSeq == Seq(1L, 2L, 3L))
      // writes continue from the rolled-back state
      cat.append(ns, "t", Seq(7L).toDF("id"))              // snapshot 4
      assert(cat.load(ns, "t").collect().map(_.getLong(0)).sorted
        .toSeq == Seq(1L, 2L, 7L))
      // unknown id fails loudly, nothing committed
      intercept[IllegalArgumentException](cat.rollbackTo(ns, "t", 99L))
      assert(cat.snapshotIds(ns, "t") == Seq(1L, 2L, 3L, 4L))
      cat.dropNamespace(ns)
    }

    if (impl.name != "session") test(s"[${impl.name}] copy-on-write delete: only touched dirs rewritten, history intact") {
      val cat = impl.make().asInstanceOf[SnapshotLakeCatalog]
      val ns = freshNs()
      cat.ensureTable(ns, "t", StructType(Seq(StructField("id", LongType))))
      cat.append(ns, "t", Seq(1L, 2L).toDF("id"))          // snapshot 1, dir A
      cat.append(ns, "t", Seq(10L, 11L).toDF("id"))        // snapshot 2, dir B
      cat.append(ns, "t", Seq(20L).toDF("id"))             // snapshot 3, dir C
      val dataDir = impl.dir(cat, ns, "t").resolve("data")
      def dirs(): Set[String] = Files.list(dataDir).iterator().asScala
        .filter(Files.isDirectory(_)).map(_.getFileName.toString).toSet
      val before = dirs()
      assert(cat.deleteWhere(ns, "t", $"id" === 10L) == 1L) // snapshot 4
      assert(cat.load(ns, "t").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(1L, 2L, 11L, 20L))
      // only dir B was rewritten: exactly ONE new dir appeared on disk, and
      // the delete snapshot still references three dirs (A and C verbatim)
      assert((dirs() -- before).size == 1, s"expected 1 new dir, got ${dirs() -- before}")
      val rep = cat.maintenanceReport(ns, "t").collect()
        .map(r => r.getAs[Long]("snapshot_id") -> r.getAs[Long]("n_dirs")).toMap
      assert(rep(4L) == 3L, s"delete snapshot references ${rep(4L)} dirs")
      // history is intact: pre-delete snapshot still shows the row
      assert(cat.loadAt(ns, "t", 3L).collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(1L, 2L, 10L, 11L, 20L))
      // a delete matching nothing publishes NO snapshot
      assert(cat.deleteWhere(ns, "t", $"id" === 999L) == 0L)
      assert(cat.snapshotIds(ns, "t") == Seq(1L, 2L, 3L, 4L))
      // deleting every row of a dir carries no empty dir into the live set
      assert(cat.deleteWhere(ns, "t", $"id" < 3L) == 2L)    // snapshot 5: dir A gone
      assert(cat.load(ns, "t").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(11L, 20L))
      val rep2 = cat.maintenanceReport(ns, "t").collect()
        .map(r => r.getAs[Long]("snapshot_id") -> r.getAs[Long]("n_dirs")).toMap
      assert(rep2(5L) == 2L, s"empty rewrite dir leaked: ${rep2(5L)} dirs")
      // expiry reclaims the rewritten-away dirs; current reads unharmed
      cat.expireSnapshots(ns, "t", keepLast = 1)
      assert(cat.load(ns, "t").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(11L, 20L))
      cat.dropNamespace(ns)
    }

    if (impl.name != "session") test(s"[${impl.name}] purgeKeys is idempotent; NULL-predicate rows are kept") {
      val cat = impl.make().asInstanceOf[SnapshotLakeCatalog]
      val ns = freshNs()
      val df = Seq((1L, "a"), (2L, null), (3L, "b")).toDF("id", "tag")
      cat.ensureTable(ns, "t", df.schema)
      cat.append(ns, "t", df)
      // SQL DELETE semantics: the NULL-tag row is neither matched nor
      // dropped by a predicate it evaluates NULL under
      assert(cat.deleteWhere(ns, "t", $"tag" === "a") == 1L)
      assert(cat.load(ns, "t").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(2L, 3L))
      // ledger-driven purge: keys arrive as a DataFrame (data-sized at
      // scale), not a predicate
      assert(cat.purgeKeys(ns, "t", "id", Seq(3L, 99L).toDF("id")) == 1L)
      assert(cat.load(ns, "t").collect().map(_.getLong(0)).toSeq == Seq(2L))
      // replaying the purge matches nothing and publishes no snapshot
      val snaps = cat.snapshotIds(ns, "t")
      assert(cat.purgeKeys(ns, "t", "id", Seq(3L, 99L).toDF("id")) == 0L)
      assert(cat.snapshotIds(ns, "t") == snaps)
      cat.dropNamespace(ns)
    }

    if (impl.name == "directory") test("[directory] delete conflict: concurrent rewrite of a touched dir fails loudly") {
      // a compact lands between the delete's rewrite and its commit — a
      // blind rebase would resurrect the compacted-away rows, so the
      // validation must refuse (carrier-independent: the check lives in
      // SnapshotLakeCatalog's shared core)
      val ns = freshNs()
      var fired = false
      val cat = new DirectoryLakeCatalog(spark,
          Files.createTempDirectory("graft-del-conflict-")) {
        override protected def beforeDeleteCommit(n: String, t: String): Unit =
          if (!fired) { fired = true; compact(n, t, targetFiles = 1) }
      }
      cat.ensureTable(ns, "t", StructType(Seq(StructField("id", LongType))))
      cat.append(ns, "t", Seq(1L, 2L, 3L).toDF("id"))
      intercept[java.util.ConcurrentModificationException](
        cat.deleteWhere(ns, "t", $"id" === 2L))
      // nothing was lost: the compacted table still has every row
      assert(cat.load(ns, "t").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(1L, 2L, 3L))
      // the aborted delete's already-written remainder dir was cleaned on
      // the conflict throw — a dir referenced by NO snapshot is invisible
      // to expireSnapshots, so leaving it would be permanent orphan debt
      assert(cat.storageAudit(ns, "t").collect()(0)
        .getAs[Long]("n_orphan_dirs") == 0L,
        "conflict-aborted delete left an orphan rewrite dir")
      // the retry (against the post-compact snapshot) succeeds
      assert(cat.deleteWhere(ns, "t", $"id" === 2L) == 1L)
      assert(cat.load(ns, "t").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(1L, 3L))
      cat.dropNamespace(ns)
    }

    if (impl.name == "directory") test("[directory] compact re-runs on a stale base: a commit landing mid-compact is never discarded") {
      // compact's replace snapshot carries ONLY its rewrite dir and NO
      // delete files — committing it against a newer base would silently
      // drop a concurrent append's rows and resurrect a concurrent MOR
      // purge's masked rows (ADVICE r10). The commit must validate the
      // base (the foldReplace shape) and re-run against the winner.
      val ns = freshNs()
      var fired = false
      val cat = new DirectoryLakeCatalog(spark,
          Files.createTempDirectory("graft-compact-race-")) {
        override protected def beforeCompactCommit(n: String, t: String): Unit =
          if (!fired) {
            fired = true
            purgeKeysMOR(n, t, "id", Seq(2L).toDF("id"))
            append(n, t, Seq(10L).toDF("id"))
          }
      }
      cat.ensureTable(ns, "t", StructType(Seq(StructField("id", LongType))))
      cat.append(ns, "t", Seq(1L, 2L, 3L).toDF("id"))
      cat.compact(ns, "t", targetFiles = 1)
      // blind rebase would read {1,2,3}: 2 resurrected, 10 dropped
      assert(cat.load(ns, "t").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(1L, 3L, 10L),
        "compact must fold the concurrent purge and carry the append")
      // the compacted snapshot folded the delete debt away entirely
      assert(cat.deleteDebtReport(ns, "t").isEmpty)
      // the discarded stale rewrite left no orphan debt
      assert(cat.storageAudit(ns, "t").collect()(0)
        .getAs[Long]("n_orphan_dirs") == 0L,
        "stale compact rewrite dir must be cleaned up")
      cat.dropNamespace(ns)
    }

    if (impl.name == "directory") test("[directory] delete crash between rewrite and commit: table intact, residue is accounted orphan debt, retry clean") {
      val ns = freshNs()
      var crash = true
      val cat = new DirectoryLakeCatalog(spark,
          Files.createTempDirectory("graft-del-crash-")) {
        override protected def beforeDeleteCommit(n: String, t: String): Unit =
          if (crash) { crash = false; throw new RuntimeException("injected crash") }
      }
      cat.ensureTable(ns, "t", StructType(Seq(StructField("id", LongType))))
      cat.append(ns, "t", Seq(1L, 2L, 3L).toDF("id"))
      intercept[RuntimeException](cat.deleteWhere(ns, "t", $"id" === 2L))
      // nothing committed: the table reads exactly as before the crash
      assert(cat.load(ns, "t").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(1L, 2L, 3L))
      assert(cat.snapshotIds(ns, "t") == Seq(1L))
      // the dead rewrite dir is visible as ORPHAN debt, not silent leakage
      val audit = cat.storageAudit(ns, "t").collect()(0)
      assert(audit.getAs[Long]("n_orphan_dirs") == 1L,
        s"crashed rewrite left ${audit.getAs[Long]("n_orphan_dirs")} orphans")
      // the retry re-derives from live state and lands
      assert(cat.deleteWhere(ns, "t", $"id" === 2L) == 1L)
      assert(cat.load(ns, "t").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(1L, 3L))
      cat.dropNamespace(ns)
    }

    if (impl.name != "session") test(s"[${impl.name}] racing deletes on disjoint dirs: both land via rebase") {
      val cat = impl.make().asInstanceOf[SnapshotLakeCatalog]
      val ns = freshNs()
      cat.ensureTable(ns, "t", StructType(Seq(StructField("id", LongType))))
      cat.append(ns, "t", Seq(1L, 2L).toDF("id"))          // dir A
      cat.append(ns, "t", Seq(10L, 11L).toDF("id"))        // dir B
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val deleted = new java.util.concurrent.atomic.AtomicLong(0)
      val threads = Seq(1L, 10L).map { id =>
        new Thread(() => {
          try { barrier.await(); deleted.addAndGet(
            cat.deleteWhere(ns, "t", $"id" === id)) }
          catch { case t: Throwable => errs.add(t) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      // the two deletes touch DIFFERENT dirs: whoever loses the CAS race
      // re-derives against the winner's live set, validation passes (its
      // touched dir is still live) and both removals land
      assert(errs.isEmpty, s"racing delete failed: ${Option(errs.peek())}")
      assert(deleted.get() == 2L)
      assert(cat.load(ns, "t").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(2L, 11L))
      cat.dropNamespace(ns)
    }

    if (impl.name == "rest") test("[rest] names with '+', '%' and spaces survive the wire") {
      val cat = impl.make().asInstanceOf[RestLakeCatalog]
      // '+' (the form-encoding trap: URLEncoder alone sends space as '+'
      // and a path-decoding server then conflates the two) and a space
      // ('%' stays out only because Hadoop Path rejects stray escapes in
      // the DATA-plane directory name — the wire handles it fine)
      val ns = s"mx a+b c_${System.nanoTime()}"
      cat.ensureTable(ns, "t+1", StructType(Seq(StructField("id", LongType))))
      cat.append(ns, "t+1", Seq(1L, 2L).toDF("id"))
      assert(cat.tableExists(ns, "t+1"))
      assert(cat.load(ns, "t+1").count() == 2L)
      cat.dropNamespace(ns)
      assert(!cat.tableExists(ns, "t+1"))
    }

    test(s"[${impl.name}] concurrent appends: every racing snapshot survives") {
      // VERDICT r7 #2: the reference's REST catalog gives CAS server-side;
      // both local implementations must not lose a snapshot when writers
      // race. 8 threads append one distinct row each through one barrier;
      // afterwards EVERY row must be present exactly once.
      val cat = impl.make(); val ns = freshNs()
      cat.ensureTable(ns, "t", StructType(Seq(StructField("id", LongType))))
      val writers = 8
      val barrier = new java.util.concurrent.CyclicBarrier(writers)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (0 until writers).map { i =>
        new Thread(() => {
          try {
            val df = Seq(i.toLong).toDF("id")
            barrier.await()
            cat.append(ns, "t", df)
          } catch { case t: Throwable => errs.add(t) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(errs.isEmpty, s"writer failed: ${Option(errs.peek()).map(_.toString)}")
      val got = cat.load(ns, "t").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == (0L until writers.toLong),
        s"lost or duplicated a racing append: $got")
      cat.dropNamespace(ns)
    }

    // directory-catalog-only: the CAS loop's crash-recovery contract
    if (impl.name == "directory")
      test("[directory] a committed-but-unhinted version is not lost") {
        // a writer can die between the atomic v<N> claim (the commit) and
        // the version-hint flip; readers and later writers must resolve
        // PAST the stale hint, and the next commit must claim v<N+1>
        val cat = impl.make().asInstanceOf[DirectoryLakeCatalog]
        val ns = freshNs()
        cat.ensureTable(ns, "t", StructType(Seq(StructField("id", LongType))))
        cat.append(ns, "t", Seq(1L).toDF("id")) // v2 committed, hint=2
        val md = cat.root.resolve(ns).resolve("t").resolve("metadata")
        // simulate the crash: roll the hint back to v1 (claimed v2 stays)
        Files.write(md.resolve("version-hint.text"), "1".getBytes)
        assert(cat.load(ns, "t").collect().map(_.getLong(0)).toSeq == Seq(1L),
          "reader trusted the stale hint and lost the committed snapshot")
        cat.append(ns, "t", Seq(2L).toDF("id")) // must claim v3, not re-claim v2
        assert(Files.exists(md.resolve("v3.metadata.json")))
        assert(cat.load(ns, "t").collect().map(_.getLong(0)).sorted.toSeq ==
          Seq(1L, 2L))
        cat.dropNamespace(ns)
      }

    test(s"[${impl.name}] foldReplace replaces contents atomically") {
      val cat = impl.make(); val ns = freshNs()
      val df = Seq(("a", 1L), ("a", 2L), ("b", 5L)).toDF("k", "n")
      cat.ensureTable(ns, "t", df.schema)
      cat.append(ns, "t", df)
      cat.foldReplace(ns, "t")(_.groupBy("k").agg(sum("n").as("n")))
      val out = cat.load(ns, "t").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out == Map("a" -> 3L, "b" -> 5L))
      cat.dropNamespace(ns)
    }

    if (impl.name != "session") test(s"[${impl.name}] foldReplace re-folds when a concurrent append lands mid-fold") {
      // the ADVICE r9 lost-update scenario: an epoch row appended between
      // the fold's read and its replacing write must NOT be dropped — the
      // commit validation catches the superseded base and re-runs the fold
      val cat = impl.make().asInstanceOf[SnapshotLakeCatalog]
      val ns = freshNs()
      val df = Seq(("a", 1L), ("a", 2L)).toDF("k", "n")
      cat.ensureTable(ns, "t", df.schema)
      cat.append(ns, "t", df)
      var folds = 0
      cat.foldReplace(ns, "t") { t =>
        folds += 1
        if (folds == 1) cat.append(ns, "t", Seq(("b", 10L)).toDF("k", "n"))
        t.groupBy("k").agg(sum("n").as("n"))
      }
      assert(folds == 2, "stale fold was committed without re-running")
      val out = cat.load(ns, "t").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out == Map("a" -> 3L, "b" -> 10L),
        s"concurrent append dropped by the fold: $out")
      // the discarded stale rewrite left no orphan debt behind
      assert(cat.storageAudit(ns, "t").collect()(0)
        .getAs[Long]("n_orphan_dirs") == 0L)
      cat.dropNamespace(ns)
    }

    test(s"[${impl.name}] exceptExistingKeys fails loudly on a null key") {
      val cat = impl.make(); val ns = freshNs()
      val df = Seq(("a", 1L)).toDF("k", "n")
      cat.ensureTable(ns, "t", df.schema)
      cat.append(ns, "t", df)
      // non-null path: the guard drops the already-persisted key
      val ok = cat.exceptExistingKeys(ns, "t", "k",
        Seq(("a", 9L), ("b", 3L)).toDF("k", "n")).collect()
      assert(ok.map(_.getString(0)).toSeq == Seq("b"))
      // a null key can never be recognized as persisted (left_anti passes
      // it through on EVERY replay) — the guard must refuse, not re-append
      val bad = Seq((null.asInstanceOf[String], 2L)).toDF("k", "n")
      val ex = intercept[Exception](
        cat.exceptExistingKeys(ns, "t", "k", bad).collect())
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e =>
          Option(e.getMessage).toSeq ++ messages(e.getCause))
      assert(messages(ex).exists(_.contains("replay-guard")),
        s"expected the null-key guard failure, got: $ex")
      cat.dropNamespace(ns)
    }

    test(s"[${impl.name}] appendSorted lands range-sorted batches on " +
      "every carrier: rows exact, later appends compose") {
      val cat = impl.make(); val ns = freshNs()
      val shuffled = new scala.util.Random(3).shuffle((1L to 200L).toList)
        .map(i => (i, s"v$i")).toDF("id", "v")
      cat.ensureTable(ns, "t", shuffled.schema)
      cat.appendSorted(ns, "t", shuffled, Seq("id"), targetFiles = Some(4))
      cat.appendSorted(ns, "t",
        Seq((201L, "v201")).toDF("id", "v"), Seq("id"))
      assert(cat.load(ns, "t").collect().map(_.getLong(0)).sorted.toSeq ==
        (1L to 201L))
      intercept[IllegalArgumentException](
        cat.appendSorted(ns, "t", shuffled, Seq.empty))
      intercept[IllegalArgumentException](
        cat.appendSorted(ns, "t", shuffled, Seq("id"), Some(0)))
      cat.dropNamespace(ns)
    }

    test(s"[${impl.name}] merge upserts by key: updates replace, inserts " +
      "land, one atomic commit") {
      val cat = impl.make(); val ns = freshNs()
      // missing table: merge = insert
      cat.merge(ns, "t", Seq("id"),
        Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
      assert(cat.load(ns, "t").collect().map(r =>
        r.getLong(0) -> r.getString(1)).toMap == Map(1L -> "a", 2L -> "b"))
      // update one key, insert another
      cat.merge(ns, "t", Seq("id"),
        Seq((2L, "B"), (3L, "c")).toDF("id", "v"))
      assert(cat.load(ns, "t").collect().map(r =>
        r.getLong(0) -> r.getString(1)).toMap ==
        Map(1L -> "a", 2L -> "B", 3L -> "c"),
        "existing key replaced, new key inserted, untouched key kept")
      // exactly one row per key survives repeated merges (idempotent
      // replay of the same batch)
      cat.merge(ns, "t", Seq("id"), Seq((2L, "B")).toDF("id", "v"))
      assert(cat.load(ns, "t").groupBy("id").count()
        .collect().forall(_.getLong(1) == 1L))
      // an EMPTY incoming batch (an upsert feed that filtered to zero
      // rows) is a no-op — no crash, no rows touched
      cat.merge(ns, "t", Seq("id"),
        Seq.empty[(Long, String)].toDF("id", "v"))
      assert(cat.load(ns, "t").count() == 3L)
      cat.dropNamespace(ns)
    }

    if (impl.name != "session") test(s"[${impl.name}] upsertMOR: ONE " +
      "commit = equality delete + append, no data rewrite; re-appended " +
      "keys postdate the mask; pure inserts skip the delete file") {
      val cat = impl.make().asInstanceOf[SnapshotLakeCatalog]
      val ns = freshNs()
      val v1 = Seq((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))
        .toDF("id", "v", "ver")
      cat.upsertMOR(ns, "t", Seq("id"), v1) // missing table = plain insert
      val filesAfterV1 = parquetFiles(impl.dir(cat, ns, "t"))
        .map(_.toString).toSet
      assert(cat.load(ns, "t").count() == 3L)
      // replace 2, insert 4 — one commit; feed-1 files untouched on disk
      cat.upsertMOR(ns, "t", Seq("id"),
        Seq((2L, "B", 2L), (4L, "d", 2L)).toDF("id", "v", "ver"))
      assert(filesAfterV1.subsetOf(
        parquetFiles(impl.dir(cat, ns, "t")).map(_.toString).toSet),
        "upsertMOR must never rewrite an existing data file")
      assert(cat.load(ns, "t").orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
        Seq((1L, "a", 1L), (2L, "B", 2L), (3L, "c", 1L), (4L, "d", 2L)))
      // ONE snapshot for the replace (atomicity), carrying the eq group
      val snaps = cat.metaTable(ns, "t", "snapshots").collect()
      assert(snaps.length == 2, snaps.mkString(","))
      assert(cat.metaTable(ns, "t", "files")
        .filter($"content" === 2).count() == 1L)
      // pure-insert batch: appends, NO new delete group (no mask debt)
      cat.upsertMOR(ns, "t", Seq("id"),
        Seq((9L, "z", 3L)).toDF("id", "v", "ver"))
      assert(cat.metaTable(ns, "t", "files")
        .filter($"content" === 2).count() == 1L,
        "a no-overlap upsert must not mint a dangling delete file")
      assert(cat.load(ns, "t").count() == 5L)
      // multi-key tuples replace by the FULL tuple
      val mk = Seq((1L, "x", 10L), (1L, "y", 10L)).toDF("k1", "k2", "n")
        .toDF("id2", "part", "n")
      cat.upsertMOR(ns, "m", Seq("id2", "part"), mk)
      cat.upsertMOR(ns, "m", Seq("id2", "part"),
        Seq((1L, "x", 20L)).toDF("id2", "part", "n"))
      assert(cat.load(ns, "m").orderBy("part").collect()
        .map(r => (r.getString(1), r.getLong(2))).toSeq ==
        Seq(("x", 20L), ("y", 10L)))
      // compact folds the upsert debt away: same rows, zero delete files
      cat.compact(ns, "t", targetFiles = 1)
      assert(cat.metaTable(ns, "t", "files")
        .filter($"content" === 2).count() == 0L)
      assert(cat.load(ns, "t").count() == 5L)
      cat.dropNamespace(ns)
    }

    if (impl.name != "session") test(s"[${impl.name}] racing merges on disjoint keys both land (CAS rebase)") {
      val cat = impl.make().asInstanceOf[SnapshotLakeCatalog]
      val ns = freshNs()
      // separate dirs per key range so the rewrites are disjoint
      cat.ensureTable(ns, "t",
        Seq((0L, "")).toDF("id", "v").schema)
      cat.append(ns, "t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
      cat.append(ns, "t", Seq((10L, "x"), (11L, "y")).toDF("id", "v"))
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = Seq((1L, "A"), (10L, "X")).map { case (id, v) =>
        new Thread(() => {
          try {
            val df = Seq((id, v)).toDF("id", "v")
            barrier.await()
            cat.merge(ns, "t", Seq("id"), df)
          } catch { case t: Throwable => errs.add(t) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(errs.isEmpty, s"racing merge failed: ${Option(errs.peek())}")
      assert(cat.load(ns, "t").collect().map(r =>
        r.getLong(0) -> r.getString(1)).toMap ==
        Map(1L -> "A", 2L -> "b", 10L -> "X", 11L -> "y"))
      cat.dropNamespace(ns)
    }

    if (impl.name != "session") test(s"[${impl.name}] merge over a MOR-deleted table neither resurrects masked rows nor re-masks merged keys") {
      val cat = impl.make().asInstanceOf[SnapshotLakeCatalog]
      val ns = freshNs()
      cat.ensureTable(ns, "t", Seq((0L, "")).toDF("id", "v").schema)
      cat.append(ns, "t",
        Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
      assert(cat.purgeKeysMOR(ns, "t", "id", Seq(2L).toDF("id")) == 1L)
      // merging key 2 back in: the new dir postdates the equality delete
      // (sequence scoping), so the merged row is visible; key 3's rewrite
      // carries the delete-applied state
      cat.merge(ns, "t", Seq("id"),
        Seq((2L, "B"), (3L, "C")).toDF("id", "v"))
      assert(cat.load(ns, "t").collect().map(r =>
        r.getLong(0) -> r.getString(1)).toMap ==
        Map(1L -> "a", 2L -> "B", 3L -> "C"))
      cat.dropNamespace(ns)
    }

    test(s"[${impl.name}] Singer load path end-to-end: batches, evolution, swap") {
      val cat = impl.make(); val ns = freshNs()
      val loader = new BatchLoader(spark, cat, ns, batchSize = 10)
      val schema =
        """{"type":"SCHEMA","stream":"ev","schema":{"properties":{
          |"id":{"type":["integer"]},"v":{"type":["number","null"]}}},
          |"key_properties":["id"]}""".stripMargin.replaceAll("\n", "")
      val lines = Seq(schema) ++ (1 to 25).map(i =>
        s"""{"type":"RECORD","stream":"ev","record":{"id":$i,"v":${i * 1.5}}}""") ++
        Seq("""{"type":"STATE","value":{"bookmark":25}}""")
      val report = loader.load(spark.createDataset(lines))
      assert(report.rowsPerStream("ev") == 25L)
      assert(cat.load(ns, "ev").count() == 25)
      // evolved feed: a new column arrives mid-stream
      val schema2 =
        """{"type":"SCHEMA","stream":"ev","schema":{"properties":{
          |"id":{"type":["integer"]},"v":{"type":["number","null"]},
          |"tag":{"type":["string","null"]}}}}"""
          .stripMargin.replaceAll("\n", "")
      val lines2 = Seq(schema2,
        """{"type":"RECORD","stream":"ev","record":{"id":26,"v":1.0,"tag":"x"}}""")
      loader.load(spark.createDataset(lines2))
      val out = cat.load(ns, "ev")
      assert(out.count() == 26)
      assert(out.filter($"tag".isNotNull).count() == 1)
      cat.dropNamespace(ns)
    }
  }
}
