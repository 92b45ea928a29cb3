package graft.lake

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.TestSpark
import org.apache.spark.sql.functions.sum
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** The snapshot catalogs' metadata document follows the PUBLIC Iceberg v2
  * table-metadata field layout, and their manifest lists / manifests are
  * spec-schema AVRO files (the formats pyiceberg 0.6.1 writes for the
  * reference, `/root/reference/target_iceberg/sinks.py:96-100`). This
  * spec pins the conformant field lists — validating the Avro files by
  * reading them back with `org.apache.avro`'s GenericDatumReader, an
  * EXTERNAL reader's view — and the documented divergences: Spark
  * catalogStrings for nested field types, omitted optional per-column
  * stats, and the `spark-schema` / `live` / `operation` / `bucket-spec`
  * extension fields (Iceberg readers ignore unknown fields). */
class IcebergMetadataSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val mapper = new ObjectMapper()

  /** Read an Avro file as an external reader would: no reader schema
    * supplied — the file's embedded writer schema drives decoding. */
  private def readAvro(path: java.nio.file.Path)
      : (org.apache.avro.Schema, Seq[org.apache.avro.generic.GenericRecord]) = {
    val r = new org.apache.avro.file.DataFileReader(
      path.toFile,
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    try (r.getSchema, r.iterator().asScala.toSeq) finally r.close()
  }

  private def fieldIds(s: org.apache.avro.Schema): Map[String, Int] =
    s.getFields.asScala.map(f =>
      f.name() -> f.getObjectProp("field-id").asInstanceOf[Number].intValue())
      .toMap

  /** Read the current metadata JSON straight off the directory carrier —
    * an external reader's view, not this library's. */
  private def rawMeta(cat: DirectoryLakeCatalog, ns: String,
                      table: String): JsonNode = {
    val md = cat.root.resolve(ns).resolve(table).resolve("metadata")
    val versions = Files.list(md).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".metadata.json") =>
        s.stripPrefix("v").stripSuffix(".metadata.json").toInt }
      .toSeq
    assert(versions.nonEmpty, s"no metadata versions under $md")
    mapper.readTree(Files.readString(
      md.resolve(s"v${versions.max}.metadata.json")))
  }

  private def mkTable(cat: DirectoryLakeCatalog, ns: String): Unit = {
    import spark.implicits._
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5))
      .toDF("id", "name", "score")
    cat.ensureTable(ns, "t", df.schema)
    cat.append(ns, "t", df)
    cat.append(ns, "t", Seq((3L, "c", 3.5)).toDF("id", "name", "score"))
  }

  test("table metadata carries every required Iceberg v2 field") {
    val cat = DirectoryLakeCatalog.temp(spark)
    val ns = s"icemeta_${System.nanoTime()}"
    try {
      mkTable(cat, ns)
      val m = rawMeta(cat, ns, "t")
      // the v2 required top-level fields
      assert(m.get("format-version").asInt() == 2)
      assert(m.get("table-uuid").asText().matches(
        "[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"))
      assert(m.get("location").asText().endsWith(s"$ns/t"))
      assert(m.get("last-sequence-number").asLong() == 2L)
      assert(m.get("last-updated-ms").asLong() > 0L)
      assert(m.get("last-column-id").asInt() == 3)
      // schemas + current-schema-id resolve
      val curSchema = m.get("current-schema-id").asInt()
      val schema = m.get("schemas").elements().asScala
        .find(_.get("schema-id").asInt() == curSchema)
      assert(schema.isDefined, "current-schema-id must resolve in schemas")
      assert(schema.get.get("type").asText() == "struct")
      val fields = schema.get.get("fields").elements().asScala.toSeq
      assert(fields.map(f => (f.get("id").asInt(), f.get("name").asText(),
        f.get("type").asText())) ==
        Seq((1, "id", "long"), (2, "name", "string"), (3, "score", "double")),
        "field ids/names/Iceberg primitive types")
      assert(fields.forall(_.has("required")))
      // partition-specs + default-spec-id resolve; unpartitioned = no fields
      val specId = m.get("default-spec-id").asInt()
      val spec = m.get("partition-specs").elements().asScala
        .find(_.get("spec-id").asInt() == specId)
      assert(spec.isDefined && spec.get.get("fields").size() == 0)
      assert(m.get("last-partition-id").asInt() == 999)
      // sort-orders + default-sort-order-id resolve
      val orderId = m.get("default-sort-order-id").asInt()
      assert(m.get("sort-orders").elements().asScala
        .exists(_.get("order-id").asInt() == orderId))
      assert(m.get("properties").isObject)
      assert(m.has("metadata-log"))
    } finally cat.dropNamespace(ns)
  }

  test("snapshot refs: main branch tracks the current snapshot, tags pin " +
    "by name, expiry protects ref'd snapshots, loadRef == loadAt") {
    import spark.implicits._
    val cat = DirectoryLakeCatalog.temp(spark)
    val ns = s"icerefs_${System.nanoTime()}"
    try {
      val df = Seq((1L, "a")).toDF("id", "v")
      cat.ensureTable(ns, "t", df.schema)
      cat.append(ns, "t", df)                                  // snap 1
      cat.append(ns, "t", Seq((2L, "b")).toDF("id", "v"))      // snap 2
      cat.append(ns, "t", Seq((3L, "c")).toDF("id", "v"))      // snap 3
      cat.tag(ns, "t", "audited", 1L)
      assert(cat.listRefs(ns, "t") ==
        Map("main" -> (("branch", 3L)), "audited" -> (("tag", 1L))))
      // the raw metadata refs map is spec-shaped (external reader's view)
      val refs = rawMeta(cat, ns, "t").get("refs")
      assert(refs.get("main").get("type").asText() == "branch" &&
        refs.get("main").get("snapshot-id").asLong() == 3L)
      assert(refs.get("audited").get("type").asText() == "tag" &&
        refs.get("audited").get("snapshot-id").asLong() == 1L)
      assert(cat.loadRef(ns, "t", "audited").collect().toSeq ==
        cat.loadAt(ns, "t", 1L).collect().toSeq)
      // expiry keeps the TAGGED snapshot past the horizon; snap 2 goes
      cat.expireSnapshots(ns, "t", keepLast = 1)
      assert(cat.snapshotIds(ns, "t") == Seq(1L, 3L))
      assert(cat.loadRef(ns, "t", "audited").collect()
        .map(_.getLong(0)).toSeq == Seq(1L))
      intercept[IllegalArgumentException](cat.loadAt(ns, "t", 2L))
      // a data commit MOVES main, never the tag
      cat.append(ns, "t", Seq((4L, "d")).toDF("id", "v"))      // snap 4
      assert(cat.listRefs(ns, "t") ==
        Map("main" -> (("branch", 4L)), "audited" -> (("tag", 1L))))
      // drop the tag -> its snapshot becomes ordinary expiry debt
      cat.dropRef(ns, "t", "audited")
      cat.expireSnapshots(ns, "t", keepLast = 1)
      assert(cat.snapshotIds(ns, "t") == Seq(4L))
      intercept[IllegalArgumentException](cat.loadRef(ns, "t", "audited"))
      // main is writer-owned: neither taggable-over nor droppable
      intercept[IllegalArgumentException](cat.tag(ns, "t", "main", 4L))
      intercept[IllegalArgumentException](cat.dropRef(ns, "t", "main"))
      // tagging an unknown snapshot fails loudly
      intercept[IllegalArgumentException](cat.tag(ns, "t", "x", 99L))
    } finally cat.dropNamespace(ns)
  }

  test("write-audit-publish: staged branch appends are invisible to " +
    "load(), auditable by name, published atomically by fastForward; " +
    "divergence fails loudly; expiry keeps the staged lineage") {
    import spark.implicits._
    val cat = DirectoryLakeCatalog.temp(spark)
    val ns = s"icewap_${System.nanoTime()}"
    try {
      val base = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      cat.ensureTable(ns, "t", base.schema)
      cat.append(ns, "t", base)                                 // snap 1
      // STAGE two batches on a branch: main must not move
      cat.stageAppend(ns, "t", "wap", Seq((3L, "c")).toDF("id", "v")) // 2
      cat.stageAppend(ns, "t", "wap", Seq((4L, "d")).toDF("id", "v")) // 3
      assert(cat.load(ns, "t").count() == 2L,
        "staged rows must be invisible to readers")
      assert(cat.listRefs(ns, "t") ==
        Map("main" -> (("branch", 1L)), "wap" -> (("branch", 3L))))
      // the AUDIT read: the staged state by name, stacked commits visible
      assert(cat.loadRef(ns, "t", "wap").collect().map(_.getLong(0))
        .sorted.toSeq == Seq(1L, 2L, 3L, 4L))
      // expiry mid-audit keeps the whole staged lineage (snap 2 is not
      // ref'd directly, but it is the branch head's parent)
      cat.expireSnapshots(ns, "t", keepLast = 1)
      assert(cat.snapshotIds(ns, "t") == Seq(1L, 2L, 3L))
      // PUBLISH: one atomic fast-forward; history logs the publish
      cat.fastForward(ns, "t", "wap")
      assert(cat.load(ns, "t").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(1L, 2L, 3L, 4L))
      assert(cat.listRefs(ns, "t")("main") == (("branch", 3L)))
      // idempotent: publishing the published branch is a no-op
      cat.fastForward(ns, "t", "wap")
      // DIVERGENCE: stage again, land a direct commit, publish must fail
      cat.stageAppend(ns, "t", "wap2", Seq((5L, "e")).toDF("id", "v"))
      cat.append(ns, "t", Seq((9L, "z")).toDF("id", "v")) // main advances
      val e = intercept[IllegalArgumentException](
        cat.fastForward(ns, "t", "wap2"))
      assert(e.getMessage.contains("diverged"), e.getMessage)
      // abandoning the stage leaves main exactly as committed
      cat.dropRef(ns, "t", "wap2")
      assert(cat.load(ns, "t").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(1L, 2L, 3L, 4L, 9L))
      // guards: cannot stage onto main or a tag, cannot publish a tag
      intercept[IllegalArgumentException](
        cat.stageAppend(ns, "t", "main", base))
      cat.tag(ns, "t", "pin", 1L)
      intercept[IllegalArgumentException](
        cat.stageAppend(ns, "t", "pin", base))
      intercept[IllegalArgumentException](cat.fastForward(ns, "t", "pin"))
      // ... and cannot TAG a name an active BRANCH holds (ADVICE r12:
      // silently converting would orphan the staged chain mid-audit)
      val eTag = intercept[IllegalArgumentException](
        cat.tag(ns, "t", "wap", 1L))
      assert(eTag.getMessage.contains("branch"), eTag.getMessage)
      // re-pointing an existing TAG stays allowed (Iceberg replace-tag)
      cat.tag(ns, "t", "pin", 3L)
      assert(cat.listRefs(ns, "t")("pin") == (("tag", 3L)))
    } finally cat.dropNamespace(ns)
  }

  test("cherrypickSnapshot (VERDICT r13 #5): a staged APPEND publishes " +
    "onto a DIVERGED main by re-parenting; idempotent re-pick no-ops; " +
    "non-append staged snapshots refuse loudly") {
    import spark.implicits._
    val cat = DirectoryLakeCatalog.temp(spark)
    val ns = s"icepick_${System.nanoTime()}"
    try {
      cat.ensureTable(ns, "t", Seq((1L, "a")).toDF("id", "v").schema)
      cat.append(ns, "t", Seq((1L, "a"), (2L, "b")).toDF("id", "v")) // 1
      cat.stageAppend(ns, "t", "wap", Seq((3L, "c")).toDF("id", "v")) // 2
      cat.append(ns, "t", Seq((9L, "z")).toDF("id", "v")) // main -> 3
      val staged = cat.listRefs(ns, "t")("wap")._2
      // the exact fastForward refusal case...
      intercept[IllegalArgumentException](cat.fastForward(ns, "t", "wap"))
      // ...publishes via cherry-pick: staged rows land ON TOP of the
      // divergent commit, nothing lost on either line
      cat.cherrypickSnapshot(ns, "t", staged)
      assert(cat.load(ns, "t").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(1L, 2L, 3L, 9L))
      // re-picking the same snapshot is a no-op (rows already on main)
      val snaps = cat.snapshotIds(ns, "t")
      cat.cherrypickSnapshot(ns, "t", staged)
      assert(cat.snapshotIds(ns, "t") == snaps,
        "idempotent cherry-pick must publish nothing")
      // a staged snapshot carrying DELETE FILES is not a pure append:
      // its masks bind to the base it was staged on — refuse loudly
      cat.stageAppend(ns, "t", "audit", Seq((4L, "d")).toDF("id", "v"))
      assert(cat.deleteWhereMOR(ns, "t",
        org.apache.spark.sql.functions.col("id") === 2L,
        branch = "audit") == 1L)
      cat.append(ns, "t", Seq((8L, "y")).toDF("id", "v")) // diverge again
      val delStaged = cat.listRefs(ns, "t")("audit")._2
      val e = intercept[IllegalArgumentException](
        cat.cherrypickSnapshot(ns, "t", delStaged))
      assert(e.getMessage.contains("re-stage"), e.getMessage)
      // unknown snapshot fails loudly too
      intercept[IllegalArgumentException](
        cat.cherrypickSnapshot(ns, "t", 999L))
    } finally cat.dropNamespace(ns)
  }

  test("branch-scoped deleteWhereMOR: the audit step masks rows on the " +
    "branch only (shared dirs included), publish carries the masks, " +
    "and a racing stageAppend rebases cleanly (VERDICT r12 #2)") {
    import spark.implicits._
    val cat = DirectoryLakeCatalog.temp(spark)
    val ns = s"icewapdel_${System.nanoTime()}"
    try {
      val base = (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v")
      cat.ensureTable(ns, "t", base.schema)
      cat.append(ns, "t", base)                                  // snap 1
      cat.stageAppend(ns, "t", "wap",
        (11L to 20L).map(i => (i, s"v$i")).toDF("id", "v"))      // snap 2
      // the audit delete spans BOTH the shared published dir (ids 4, 8)
      // and the staged dir (ids 12, 16, 20)
      assert(cat.deleteWhereMOR(ns, "t", $"id" % 4 === 0,
        branch = "wap") == 5L)
      // main is untouched: all 10 published rows still visible
      assert(cat.load(ns, "t").collect().map(_.getLong(0)).sorted.toSeq ==
        (1L to 10L))
      // the branch read masks across both generations
      assert(cat.loadRef(ns, "t", "wap").collect().map(_.getLong(0))
        .sorted.toSeq == (1L to 20L).filterNot(_ % 4 == 0))
      // a SECOND stage after the audit delete stacks on the delete
      // snapshot and keeps its masks
      cat.stageAppend(ns, "t", "wap", Seq((21L, "x")).toDF("id", "v"))
      assert(cat.loadRef(ns, "t", "wap").collect().map(_.getLong(0))
        .sorted.toSeq == ((1L to 20L).filterNot(_ % 4 == 0) :+ 21L))
      // publish: ONE fast-forward carries data AND masks to main
      cat.fastForward(ns, "t", "wap")
      assert(cat.load(ns, "t").collect().map(_.getLong(0)).sorted.toSeq ==
        ((1L to 20L).filterNot(_ % 4 == 0) :+ 21L))
      // guards: main-scoped default unchanged; a tag cannot take deletes
      cat.tag(ns, "t", "pin", 1L)
      intercept[IllegalArgumentException](
        cat.deleteWhereMOR(ns, "t", $"id" === 1L, branch = "pin"))
      intercept[IllegalArgumentException](
        cat.deleteWhereMOR(ns, "t", $"id" === 1L, branch = "nope"))
      // the key-list audit face scopes to a branch identically: purge on
      // a fresh branch, main untouched, branch masked, and a key
      // re-staged AFTER the purge survives it (sequence scoping)
      cat.stageAppend(ns, "t", "wap3",
        Seq((300L, "p"), (301L, "p")).toDF("id", "v"))
      assert(cat.purgeKeysMOR(ns, "t", "id",
        Seq(300L, 2L).toDF("id"), branch = "wap3") == 2L)
      assert(cat.load(ns, "t").filter($"id".isin(2L, 300L)).count() == 1L,
        "main must not see the branch purge (id 2 still published)")
      val w3 = cat.loadRef(ns, "t", "wap3").collect()
        .map(_.getLong(0)).toSet
      assert(!w3.contains(300L) && !w3.contains(2L) && w3.contains(301L))
      cat.stageAppend(ns, "t", "wap3", Seq((300L, "re")).toDF("id", "v"))
      assert(cat.loadRef(ns, "t", "wap3").filter($"id" === 300L).count()
        == 1L, "a key re-staged after the branch purge must survive it")
      // CAS race: a concurrent stageAppend and a branch delete both land
      // (the stager only ADDS a dir; position deletes bind to files)
      cat.stageAppend(ns, "t", "wap2",
        (100L to 120L).map(i => (i, "r")).toDF("id", "v"))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      val fs = Seq(
        Future(cat.deleteWhereMOR(ns, "t", $"id".between(100L, 110L),
          branch = "wap2")),
        Future(cat.stageAppend(ns, "t", "wap2",
          (200L to 205L).map(i => (i, "s")).toDF("id", "v"))))
      Await.result(Future.sequence(fs), 120.seconds)
      pool.shutdown()
      val wap2 = cat.loadRef(ns, "t", "wap2").collect()
        .map(_.getLong(0)).toSet
      assert((200L to 205L).forall(wap2.contains),
        s"racing stage lost: ${wap2.size}")
      assert((100L to 110L).forall(id => !wap2.contains(id)),
        "racing branch delete lost its masks")
      assert((111L to 120L).forall(wap2.contains))
    } finally cat.dropNamespace(ns)
  }

  test("racing stageAppend commits on one branch both land via CAS " +
    "rebase; staging never disturbs a concurrent main writer") {
    import spark.implicits._
    val cat = DirectoryLakeCatalog.temp(spark)
    val ns = s"icewaprace_${System.nanoTime()}"
    try {
      cat.ensureTable(ns, "t", Seq((0L, "x")).toDF("id", "v").schema)
      cat.append(ns, "t", Seq((0L, "base")).toDF("id", "v"))
      // two stagers on the SAME branch + one direct main writer, all
      // racing: the stagers must stack (neither staged batch lost), the
      // main append must land, and neither side may see the other's rows
      val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      val fs = Seq(
        Future(cat.stageAppend(ns, "t", "wap",
          (1L to 50L).map((_, "s1")).toDF("id", "v"))),
        Future(cat.stageAppend(ns, "t", "wap",
          (51L to 100L).map((_, "s2")).toDF("id", "v"))),
        Future(cat.append(ns, "t",
          (201L to 210L).map((_, "m")).toDF("id", "v"))))
      Await.result(Future.sequence(fs), 120.seconds)
      pool.shutdown()
      // main: base + the direct append, NO staged rows
      assert(cat.load(ns, "t").count() == 11L)
      // branch: base + BOTH staged batches (stacked via rebase), plus
      // possibly the main append depending on fork timing — pin the
      // invariant that holds under every interleaving: all 101 staged-
      // lineage rows present, main rows a subset question
      val staged = cat.loadRef(ns, "t", "wap")
        .collect().map(_.getLong(0)).toSet
      assert((1L to 100L).forall(staged.contains) && staged.contains(0L),
        s"lost a staged batch: ${staged.size} rows")
    } finally cat.dropNamespace(ns)
  }

  test("loadAsOf: wall-clock time travel picks the snapshot current at " +
    "the timestamp; loadAppendsSince plans an incremental append scan " +
    "from manifests and refuses non-append ranges") {
    import spark.implicits._
    val cat = DirectoryLakeCatalog.temp(spark)
    val ns = s"iceinc_${System.nanoTime()}"
    try {
      cat.ensureTable(ns, "t", Seq((1L, "a")).toDF("id", "v").schema)
      cat.append(ns, "t", Seq((1L, "a"), (2L, "b")).toDF("id", "v")) // s1
      Thread.sleep(5)
      val between = System.currentTimeMillis()
      Thread.sleep(5)
      cat.append(ns, "t", Seq((3L, "c")).toDF("id", "v"))            // s2
      cat.append(ns, "t", Seq((4L, "d")).toDF("id", "v"))            // s3
      // AS OF a time between s1 and s2 reads exactly s1's state
      assert(cat.loadAsOf(ns, "t", between).collect()
        .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
      assert(cat.loadAsOf(ns, "t", System.currentTimeMillis())
        .count() == 4L)
      intercept[IllegalArgumentException](cat.loadAsOf(ns, "t", 1000L))
      // incremental: (s1, current] = the two appended batches, planned
      // from manifests — inputFiles stay inside the two new dirs
      val inc = cat.loadAppendsSince(ns, "t", 1L)
      assert(inc.collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L))
      // planned from the NEW dirs only: strictly fewer files than a full
      // scan, and no planned file holds a pre-range row
      assert(inc.inputFiles.nonEmpty &&
        inc.inputFiles.length < cat.load(ns, "t").inputFiles.length)
      inc.inputFiles.foreach(f => assert(
        spark.read.parquet(f).filter($"id" <= 2L).isEmpty, f))
      // explicit toId bounds the range; an empty range reads nothing
      assert(cat.loadAppendsSince(ns, "t", 1L, Some(2L)).collect()
        .map(_.getLong(0)).toSeq == Seq(3L))
      assert(cat.loadAppendsSince(ns, "t", 3L).count() == 0L)
      // ids reversed / unknown fail loudly
      intercept[IllegalArgumentException](
        cat.loadAppendsSince(ns, "t", 3L, Some(1L)))
      intercept[IllegalArgumentException](
        cat.loadAppendsSince(ns, "t", 99L))
      // a delete in the range makes a files-only scan WRONG: refused,
      // pointing at snapshotDiff
      assert(cat.deleteWhereMOR(ns, "t", $"id" === 2L) == 1L)     // s4
      cat.append(ns, "t", Seq((5L, "e")).toDF("id", "v"))         // s5
      val e = intercept[IllegalArgumentException](
        cat.loadAppendsSince(ns, "t", 1L))
      assert(e.getMessage.contains("snapshotDiff"), e.getMessage)
      // ... but the still-append-only subrange after the delete works,
      // and carried delete files never mask the new rows
      assert(cat.loadAppendsSince(ns, "t", 4L).collect()
        .map(_.getLong(0)).toSeq == Seq(5L))
    } finally cat.dropNamespace(ns)
  }

  test("metaTable: the standard snapshots/history/files/manifests/refs " +
    "read faces agree with the lifecycle that produced them") {
    import spark.implicits._
    val cat = DirectoryLakeCatalog.temp(spark)
    val ns = s"icemt_${System.nanoTime()}"
    try {
      val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v")
      cat.ensureTable(ns, "t", df.schema)
      cat.append(ns, "t", df)                                    // snap 1
      cat.append(ns, "t", Seq((5L, "e"), (6L, "f")).toDF("id", "v")) // 2
      assert(cat.deleteWhereMOR(ns, "t", $"id" === 2L) == 1L)    // snap 3
      // snapshots: ids, operations, summary rollups
      val snaps = cat.metaTable(ns, "t", "snapshots")
        .orderBy("snapshot_id").collect()
        .map(r => (r.getAs[Long]("snapshot_id"),
          r.getAs[String]("operation"), r.getAs[Long]("total_records"),
          r.getAs[Long]("total_delete_files")))
      assert(snaps.toSeq == Seq((1L, "append", 4L, 0L),
        (2L, "append", 6L, 0L), (3L, "delete", 6L, 1L)), snaps.mkString(","))
      // parent chain + committed_at monotone
      val parents = cat.metaTable(ns, "t", "snapshots")
        .orderBy("snapshot_id").collect()
        .map(r => Option(r.getAs[java.lang.Long]("parent_id")).map(_.toLong))
      assert(parents.toSeq == Seq(None, Some(1L), Some(2L)))
      // history: every entry an ancestor of current (linear chain)
      val hist = cat.metaTable(ns, "t", "history")
        .orderBy("snapshot_id").collect()
        .map(r => (r.getAs[Long]("snapshot_id"),
          r.getAs[Boolean]("is_current_ancestor")))
      assert(hist.toSeq == Seq((1L, true), (2L, true), (3L, true)))
      // a rollback ABANDONS the fork: snapshot 3 leaves the ancestor chain
      cat.rollbackTo(ns, "t", 2L)                                // snap 4
      val hist2 = cat.metaTable(ns, "t", "history").collect()
        .map(r => r.getAs[Long]("snapshot_id") ->
          r.getAs[Boolean]("is_current_ancestor")).toMap
      assert(hist2 == Map(1L -> true, 2L -> true, 3L -> false, 4L -> true),
        hist2.toString)
      // files: per-file rows of the current snapshot, record counts sum to
      // the table; the delete FILE from snap 3 is carried (rollback
      // restores target state = no deletes, so content=1 rows are gone)
      val files = cat.metaTable(ns, "t", "files")
      assert(files.filter($"content" === 0).agg(sum("record_count"))
        .head().getLong(0) == 6L)
      assert(files.filter($"content" =!= 0).count() == 0L,
        "rollback to a pre-delete snapshot carries no delete files")
      assert(files.filter(!$"file_path".endsWith(".parquet")).count() == 0L)
      // manifests: one content=0 entry per live data dir (2 appends)
      val mf = cat.metaTable(ns, "t", "manifests")
      assert(mf.filter($"content" === 0).count() == 2L)
      assert(mf.agg(sum("added_rows_count")).head().getLong(0) == 6L)
      // refs: main tracks current
      val refs = cat.metaTable(ns, "t", "refs").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      assert(refs == Seq(("main", "branch", 4L)), refs.toString)
      // unknown face fails loudly
      intercept[IllegalArgumentException](cat.metaTable(ns, "t", "nope"))
    } finally cat.dropNamespace(ns)
  }

  test("metadata-log populates per commit (VERDICT r13 #4): one entry " +
    "per PRIOR version, each naming a metadata file that exists and " +
    "parses; retention bounded by write.metadata.previous-versions-max") {
    import spark.implicits._
    val cat = DirectoryLakeCatalog.temp(spark)
    val ns = s"mlog_${System.nanoTime()}"
    val df = Seq((1L, "a")).toDF("id", "v")
    cat.ensureTable(ns, "t", df.schema) // v1 (no previous -> no entry)
    cat.append(ns, "t", df)             // v2 logs v1
    cat.append(ns, "t", Seq((2L, "b")).toDF("id", "v")) // v3 logs v2
    val log = rawMeta(cat, ns, "t").get("metadata-log")
    assert(log.size() == 2, s"expected 2 prior versions, got $log")
    val entries = log.elements().asScala.toSeq
    entries.foreach { e =>
      assert(e.has("timestamp-ms") && e.has("metadata-file"),
        s"spec field shape: $e")
      val f = java.nio.file.Path.of(e.get("metadata-file").asText())
      assert(Files.exists(f), s"logged metadata file must exist: $f")
      // metadata time travel: the logged document parses and carries the
      // schema history
      assert(mapper.readTree(Files.readString(f)).has("schemas"))
    }
    assert(entries.map(_.get("metadata-file").asText()).distinct.size == 2,
      "each commit logs its own prior version")
    // retention: cap at 2 via the Iceberg property, then commit twice —
    // the log holds only the 2 most recent priors
    cat.setProperties(ns, "t",
      Map("write.metadata.previous-versions-max" -> "2"))
    cat.append(ns, "t", Seq((3L, "c")).toDF("id", "v"))
    cat.append(ns, "t", Seq((4L, "d")).toDF("id", "v"))
    val capped = rawMeta(cat, ns, "t").get("metadata-log")
    assert(capped.size() == 2, s"retention must truncate: $capped")
    val loggedVs = capped.elements().asScala
      .map(e => e.get("metadata-file").asText()).toSeq
    assert(loggedVs == loggedVs.sorted && loggedVs.forall(f =>
      Files.exists(java.nio.file.Path.of(f))),
      s"kept entries are the most recent priors, oldest first: $loggedVs")
    cat.dropNamespace(ns)
  }

  test("snapshots carry the v2 snapshot fields; snapshot-log tracks them") {
    val cat = DirectoryLakeCatalog.temp(spark)
    val ns = s"icesnap_${System.nanoTime()}"
    try {
      mkTable(cat, ns)
      val m = rawMeta(cat, ns, "t")
      val snaps = m.get("snapshots").elements().asScala.toSeq
      assert(snaps.size == 2)
      snaps.foreach { s =>
        assert(s.get("snapshot-id").asLong() > 0L)
        assert(s.get("sequence-number").asLong() ==
          s.get("snapshot-id").asLong())
        assert(s.get("timestamp-ms").asLong() > 0L)
        assert(Set("append", "replace", "overwrite", "delete")
          .contains(s.get("summary").get("operation").asText()),
          "summary.operation uses the spec vocabulary")
        assert(s.has("schema-id"))
      }
      // standard summary metrics (string-valued, as Iceberg serializes
      // them): table sizing without opening a single manifest
      assert(snaps(0).get("summary").get("added-records").asText() == "2")
      assert(snaps(0).get("summary").get("total-records").asText() == "2")
      assert(snaps(1).get("summary").get("added-records").asText() == "1")
      assert(snaps(1).get("summary").get("total-records").asText() == "3")
      assert(snaps(1).get("summary").get("added-data-files").asText().toInt
        <= snaps(1).get("summary").get("total-data-files").asText().toInt)
      assert(snaps(1).get("summary")
        .get("total-delete-files").asText() == "0")
      // the second append's parent is the first snapshot
      assert(snaps(1).get("parent-snapshot-id").asLong() ==
        snaps(0).get("snapshot-id").asLong())
      assert(m.get("current-snapshot-id").asLong() ==
        snaps(1).get("snapshot-id").asLong())
      // snapshot-log: one entry per commit, ids resolve, time monotonic
      val log = m.get("snapshot-log").elements().asScala.toSeq
      assert(log.map(_.get("snapshot-id").asLong()) ==
        snaps.map(_.get("snapshot-id").asLong()))
      assert(log.map(_.get("timestamp-ms").asLong())
        .sliding(2).forall(w => w.size < 2 || w(0) <= w(1)))
    } finally cat.dropNamespace(ns)
  }

  test("a copy-on-write delete publishes a snapshot with " +
    "summary.operation = delete") {
    import org.apache.spark.sql.functions.col
    val cat = DirectoryLakeCatalog.temp(spark)
    val ns = s"icedel_${System.nanoTime()}"
    try {
      mkTable(cat, ns)
      assert(cat.deleteWhere(ns, "t", col("id") === 2L) == 1L)
      val snaps = rawMeta(cat, ns, "t").get("snapshots")
        .elements().asScala.toSeq
      val last = snaps.last
      assert(last.get("summary").get("operation").asText() == "delete")
      assert(last.get("operation").asText() == "delete")
      // the delete snapshot's parent is the pre-delete current snapshot
      assert(last.get("parent-snapshot-id").asLong() ==
        snaps(snaps.size - 2).get("snapshot-id").asLong())
    } finally cat.dropNamespace(ns)
  }

  test("manifest-list is a spec-schema Avro file an external reader opens: " +
    "v2 manifest_file fields with spec field-ids, carried manifests " +
    "reused with original sequence numbers") {
    val cat = DirectoryLakeCatalog.temp(spark)
    val ns = s"iceml_${System.nanoTime()}"
    try {
      mkTable(cat, ns)
      val m = rawMeta(cat, ns, "t")
      val cur = m.get("current-snapshot-id").asLong()
      val snap = m.get("snapshots").elements().asScala
        .find(_.get("snapshot-id").asLong() == cur).get
      val mlPath = Paths.get(snap.get("manifest-list").asText())
      assert(Files.exists(mlPath), s"manifest-list file missing: $mlPath")
      val (schema, entries) = readAvro(mlPath)
      // the spec's v2 manifest_file field set, ids carried as Avro props
      assert(schema.getName == "manifest_file")
      assert(fieldIds(schema) == Map(
        "manifest_path" -> 500, "manifest_length" -> 501,
        "partition_spec_id" -> 502, "content" -> 517,
        "sequence_number" -> 515, "min_sequence_number" -> 516,
        "added_snapshot_id" -> 503, "added_files_count" -> 504,
        "existing_files_count" -> 505, "deleted_files_count" -> 506,
        "added_rows_count" -> 512, "existing_rows_count" -> 513,
        "deleted_rows_count" -> 514, "partitions" -> 507))
      assert(entries.size == 2, "second append references both manifests")
      entries.foreach { e =>
        val mp = Paths.get(e.get("manifest_path").toString)
        assert(Files.isRegularFile(mp), s"manifest missing: $mp")
        assert(e.get("manifest_length").asInstanceOf[Long] == Files.size(mp),
          "manifest_length is the manifest file's actual size")
        assert(e.get("content") == 0 && e.get("partition_spec_id") == 0)
      }
      // manifest REUSE: the first append's manifest keeps its original
      // sequence/snapshot attribution in the second snapshot's list
      assert(entries.map(_.get("sequence_number").asInstanceOf[Long])
        .sorted.toSeq == Seq(1L, 2L))
      assert(entries.map(_.get("added_snapshot_id").asInstanceOf[Long])
        .sorted.toSeq == Seq(1L, 2L))
      // the FIRST snapshot's list references only its own manifest
      val firstMl = Paths.get(m.get("snapshots").get(0)
        .get("manifest-list").asText())
      assert(readAvro(firstMl)._2.size == 1)
    } finally cat.dropNamespace(ns)
  }

  test("per-directory manifests track individual data FILES: " +
    "manifest_entry/data_file spec fields, footer-true record counts, " +
    "inherited snapshot ids") {
    val cat = DirectoryLakeCatalog.temp(spark)
    val ns = s"icemf_${System.nanoTime()}"
    try {
      mkTable(cat, ns) // 2 appends: rows (1,2) then (3)
      val m = rawMeta(cat, ns, "t")
      val cur = m.get("current-snapshot-id").asLong()
      val snap = m.get("snapshots").elements().asScala
        .find(_.get("snapshot-id").asLong() == cur).get
      val mlEntries = readAvro(
        Paths.get(snap.get("manifest-list").asText()))._2
      val fileEntries = mlEntries.flatMap { mle =>
        val (es, recs) = readAvro(Paths.get(mle.get("manifest_path").toString))
        assert(es.getName == "manifest_entry")
        assert(fieldIds(es) == Map("status" -> 0, "snapshot_id" -> 1,
          "sequence_number" -> 3, "file_sequence_number" -> 4,
          "data_file" -> 2))
        val dfSchema = es.getField("data_file").schema()
        assert(fieldIds(dfSchema) == Map("content" -> 134,
          "file_path" -> 100, "file_format" -> 101, "partition" -> 102,
          "record_count" -> 103, "file_size_in_bytes" -> 104,
          "column_sizes" -> 108, "value_counts" -> 109,
          "null_value_counts" -> 110, "nan_value_counts" -> 137,
          "lower_bounds" -> 125, "upper_bounds" -> 128,
          "equality_ids" -> 135))
        recs
      }
      assert(fileEntries.nonEmpty)
      fileEntries.foreach { e =>
        assert(e.get("status") == 1, "entries written as ADDED")
        assert(e.get("snapshot_id") == null &&
          e.get("sequence_number") == null,
          "ids are null = INHERITED from the manifest-list entry (v2 " +
            "inheritance; what makes manifests commit-agnostic/reusable)")
        val df = e.get("data_file")
          .asInstanceOf[org.apache.avro.generic.GenericRecord]
        assert(df.get("content") == 0)
        assert(df.get("file_format").toString == "PARQUET")
        val p = Paths.get(df.get("file_path").toString)
        assert(Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
        assert(df.get("file_size_in_bytes").asInstanceOf[Long] ==
          Files.size(p))
      }
      // record counts are parquet-footer truth: they sum to the table count
      val totalRows = fileEntries.map(_.get("data_file")
        .asInstanceOf[org.apache.avro.generic.GenericRecord]
        .get("record_count").asInstanceOf[Long]).sum
      assert(totalRows == cat.load(ns, "t").count(),
        "sum of manifest record_count == table row count")
      // and the manifest-list rollups agree with the entries they cover
      assert(mlEntries.map(_.get("added_rows_count").asInstanceOf[Long]).sum
        == totalRows)
      assert(mlEntries.map(_.get("added_files_count").asInstanceOf[Int]).sum
        == fileEntries.size)
    } finally cat.dropNamespace(ns)
  }

  test("data_file entries carry per-column stats an external reader " +
    "decodes: value/null counts and Appendix-D binary bounds") {
    val cat = DirectoryLakeCatalog.temp(spark)
    val ns = s"icest_${System.nanoTime()}"
    try {
      mkTable(cat, ns) // id long=1, name string=2, score double=3; rows 1-3
      val m = rawMeta(cat, ns, "t")
      val cur = m.get("current-snapshot-id").asLong()
      val snap = m.get("snapshots").elements().asScala
        .find(_.get("snapshot-id").asLong() == cur).get
      val files = readAvro(Paths.get(snap.get("manifest-list").asText()))._2
        .flatMap(mle => readAvro(
          Paths.get(mle.get("manifest_path").toString))._2)
        .map(_.get("data_file")
          .asInstanceOf[org.apache.avro.generic.GenericRecord])
      assert(files.nonEmpty)
      def kvMap(df: org.apache.avro.generic.GenericRecord, field: String)
          : Map[Int, AnyRef] =
        Option(df.get(field)).map(_.asInstanceOf[java.util.List[
            org.apache.avro.generic.GenericRecord]].asScala
          .map(kv => kv.get("key").asInstanceOf[Int] -> kv.get("value"))
          .toMap).getOrElse(Map.empty)
      def le(df: org.apache.avro.generic.GenericRecord, field: String,
             id: Int): Array[Byte] = {
        val buf = kvMap(df, field)(id)
          .asInstanceOf[java.nio.ByteBuffer].duplicate()
        val a = new Array[Byte](buf.remaining()); buf.get(a); a
      }
      def leLong(b: Array[Byte]): Long = java.nio.ByteBuffer.wrap(b)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
      def leDouble(b: Array[Byte]): Double = java.nio.ByteBuffer.wrap(b)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getDouble
      files.foreach { df =>
        val rows = df.get("record_count").asInstanceOf[Long]
        // counts: every covered column counts every row, zero nulls
        (1 to 3).foreach { id =>
          assert(kvMap(df, "value_counts")(id) == rows)
          assert(kvMap(df, "null_value_counts")(id) == 0L)
        }
        // per-file bound sanity: lower <= upper in the decoded domain
        assert(leLong(le(df, "lower_bounds", 1)) <=
          leLong(le(df, "upper_bounds", 1)))
        assert(leDouble(le(df, "lower_bounds", 3)) <=
          leDouble(le(df, "upper_bounds", 3)))
      }
      // global fold across files recovers the true column ranges
      assert(files.map(df => leLong(le(df, "lower_bounds", 1))).min == 1L)
      assert(files.map(df => leLong(le(df, "upper_bounds", 1))).max == 3L)
      assert(files.map(df => new String(le(df, "lower_bounds", 2),
        java.nio.charset.StandardCharsets.UTF_8)).min == "a")
      assert(files.map(df => new String(le(df, "upper_bounds", 2),
        java.nio.charset.StandardCharsets.UTF_8)).max == "c")
      assert(files.map(df => leDouble(le(df, "lower_bounds", 3))).min == 1.5)
      assert(files.map(df => leDouble(le(df, "upper_bounds", 3))).max == 3.5)
    } finally cat.dropNamespace(ns)
  }

  test("string bounds truncate at 16 bytes (Iceberg truncate(16)): " +
    "lower is a prefix, upper is a prefix with the last code point " +
    "incremented, and both remain VALID bounds") {
    import java.nio.charset.StandardCharsets.UTF_8
    def b(s: String) = s.getBytes(UTF_8)
    // short strings pass through exact
    assert(AvroManifests.truncateLower(b("abc")).sameElements(b("abc")))
    assert(AvroManifests.truncateUpper(b("abc")).get.sameElements(b("abc")))
    // long lower: 16-byte prefix
    val lower = AvroManifests.truncateLower(b("abcdefghijklmnopqrstuvwx"))
    assert(lower.sameElements(b("abcdefghijklmnop")))
    // long upper: prefix with last code point bumped — still >= the input
    val upper = AvroManifests.truncateUpper(b("abcdefghijklmnopqrstuvwx")).get
    assert(upper.sameElements(b("abcdefghijklmnoq")))
    assert(AvroManifests.compareUnsigned(
      upper, b("abcdefghijklmnopqrstuvwx")) > 0)
    // multi-byte chars are never split: é is 2 bytes; a cut landing
    // mid-char backs off to the code-point boundary
    val accented = "ééééééééé" // 18 bytes
    val accLower = AvroManifests.truncateLower(b(accented))
    assert(accLower.length == 16 && new String(accLower, UTF_8) == "é" * 8)
    val accUpper = AvroManifests.truncateUpper(b(accented)).get
    assert(new String(accUpper, UTF_8) == "é" * 7 + "ê")
    assert(AvroManifests.compareUnsigned(accUpper, b(accented)) > 0)
    // an invalid-UTF-8 max falls back to a byte-level increment
    val raw = Array.fill[Byte](20)(0xC3.toByte) // lead bytes, no tails
    val rawUpper = AvroManifests.truncateUpper(raw).get
    assert(rawUpper.length == 16 && (rawUpper(15) & 0xff) == 0xC4)
    assert(AvroManifests.compareUnsigned(rawUpper, raw) > 0)
    // an unincrementable prefix (all 0xFF) publishes NO upper bound
    assert(AvroManifests.truncateUpper(
      Array.fill[Byte](20)(0xFF.toByte)).isEmpty)
  }

  test("truncated bounds still prune correctly: a long-string column " +
    "never wrong-prunes and still skips disjoint files") {
    import spark.implicits._
    val cat = DirectoryLakeCatalog.temp(spark)
    val ns = s"icetr_${System.nanoTime()}"
    try {
      // two appends with text values whose FIRST 16 BYTES already
      // separate them, plus long tails that truncation discards
      def doc(prefix: String, i: Int) = s"$prefix-document-$i-" + ("x" * 100)
      val a = (1 to 20).map(i => (i.toLong, doc("alpha", i))).toDF("id", "text")
      val z = (1 to 20).map(i => (i + 100L, doc("zulu", i))).toDF("id", "text")
      cat.ensureTable(ns, "t", a.schema)
      cat.append(ns, "t", a)
      cat.append(ns, "t", z)
      // manifest bounds for the text column are truncation-bounded
      val md = cat.root.resolve(ns).resolve("t").resolve("metadata")
      val manifests = scala.util.Using.resource(Files.list(md))(
        _.iterator().asScala.filter(_.getFileName.toString
          .startsWith("manifest-snap-")).toSeq)
      val textBounds = manifests.flatMap(AvroManifests.readManifest)
        .flatMap(e => e.lowerBounds ++ e.upperBounds)
        .collect { case (2, v) => v }
      assert(textBounds.nonEmpty && textBounds.forall(_.length <= 17),
        s"text bound leaked past truncation: ${textBounds.map(_.length)}")
      // a slice inside the alpha range prunes the zulu files...
      val slice = cat.loadSlice(ns, "t", "text",
        "alpha-document-0", "alpha-document-9z")
      assert(slice.count() == 20L)
      assert(slice.inputFiles.length < cat.load(ns, "t").inputFiles.length,
        "truncated bounds failed to skip the disjoint file set")
      // ...and never wrong-prunes rows whose tails truncation discarded
      val one = cat.loadSlice(ns, "t", "text", doc("zulu", 7), doc("zulu", 7))
      assert(one.collect().map(_.getLong(0)).toSeq == Seq(107L))
    } finally cat.dropNamespace(ns)
  }

  test("partitioned tables carry typed partition tuples in their " +
    "data_file entries (r102 record, values parsed from the Hive layout)") {
    import spark.implicits._
    val cat = DirectoryLakeCatalog.temp(spark)
    val ns = s"icept_${System.nanoTime()}"
    try {
      val df = Seq((1L, "x", "a"), (2L, "y", "b"), (3L, "z", "a"))
        .toDF("id", "v", "part")
      cat.ensureTable(ns, "p", df.schema, Seq("part"))
      cat.append(ns, "p", df)
      val m = rawMeta(cat, ns, "p")
      val snap = m.get("snapshots").get(0)
      val mle = readAvro(Paths.get(snap.get("manifest-list").asText()))._2
      val entries = readAvro(
        Paths.get(mle.head.get("manifest_path").toString))._2
      val partVals = entries.map { e =>
        val part = e.get("data_file")
          .asInstanceOf[org.apache.avro.generic.GenericRecord]
          .get("partition")
          .asInstanceOf[org.apache.avro.generic.GenericRecord]
        part.get("part").toString
      }
      assert(partVals.toSet == Set("a", "b"),
        s"partition tuple values parsed from the path: $partVals")
      // per-file counts respect the partition split (a=2 rows, b=1)
      val byPart = entries.groupBy(_.get("data_file")
        .asInstanceOf[org.apache.avro.generic.GenericRecord]
        .get("partition")
        .asInstanceOf[org.apache.avro.generic.GenericRecord]
        .get("part").toString)
        .view.mapValues(_.map(_.get("data_file")
          .asInstanceOf[org.apache.avro.generic.GenericRecord]
          .get("record_count").asInstanceOf[Long]).sum).toMap
      assert(byPart == Map("a" -> 2L, "b" -> 1L))
    } finally cat.dropNamespace(ns)
  }

  test("schema evolution appends a schema object and bumps " +
    "current-schema-id/last-column-id (history kept)") {
    import spark.implicits._
    val cat = DirectoryLakeCatalog.temp(spark)
    val ns = s"iceevo_${System.nanoTime()}"
    try {
      mkTable(cat, ns)
      cat.ensureTable(ns, "t",
        Seq((1L, "a", 1.5, 7L)).toDF("id", "name", "score", "extra").schema)
      val m = rawMeta(cat, ns, "t")
      val schemas = m.get("schemas").elements().asScala.toSeq
      assert(schemas.map(_.get("schema-id").asInt()) == Seq(0, 1))
      assert(m.get("current-schema-id").asInt() == 1)
      assert(m.get("last-column-id").asInt() == 4)
      assert(schemas(1).get("fields").elements().asScala.toSeq
        .map(_.get("name").asText()) == Seq("id", "name", "score", "extra"))
      // old snapshots still read, NULL-filled in the new column
      val rows = cat.load(ns, "t").collect()
      assert(rows.length == 3 && rows.forall(_.isNullAt(3)))
    } finally cat.dropNamespace(ns)
  }

  test("partitioned and bucketed tables express their layout as " +
    "partition-spec transforms") {
    import spark.implicits._
    val cat = DirectoryLakeCatalog.temp(spark)
    val ns = s"icepart_${System.nanoTime()}"
    try {
      val df = Seq((1L, "x", "a"), (2L, "y", "b")).toDF("id", "v", "part")
      cat.ensureTable(ns, "p", df.schema, Seq("part"))
      cat.append(ns, "p", df)
      val mp = rawMeta(cat, ns, "p")
      val pf = mp.get("partition-specs").get(0).get("fields").get(0)
      assert(pf.get("name").asText() == "part" &&
        pf.get("transform").asText() == "identity" &&
        pf.get("source-id").asInt() == 3 &&
        pf.get("field-id").asInt() == 1000)
      assert(mp.get("last-partition-id").asInt() == 1000)

      cat.writeBucketed(ns, "b", df, Seq("id"), 4, Seq("id"))
      val mb = rawMeta(cat, ns, "b")
      val bf = mb.get("partition-specs").get(0).get("fields").get(0)
      assert(bf.get("name").asText() == "id_bucket" &&
        bf.get("transform").asText() == "bucket[4]" &&
        bf.get("source-id").asInt() == 1)
      // bucket transforms describe layout, not directory partitioning:
      // the loader must NOT treat them as partition columns
      assert(cat.load(ns, "b").count() == 2)
    } finally cat.dropNamespace(ns)
  }

  test("expireSnapshots trims snapshot-log in step and deletes dropped " +
    "manifest-list files") {
    val cat = DirectoryLakeCatalog.temp(spark)
    val ns = s"iceexp_${System.nanoTime()}"
    try {
      mkTable(cat, ns)
      val before = rawMeta(cat, ns, "t")
      val droppedMl = Paths.get(before.get("snapshots").get(0)
        .get("manifest-list").asText())
      assert(Files.exists(droppedMl))
      cat.expireSnapshots(ns, "t", keepLast = 1)
      val m = rawMeta(cat, ns, "t")
      val ids = m.get("snapshots").elements().asScala
        .map(_.get("snapshot-id").asLong()).toSeq
      assert(ids.size == 1)
      assert(m.get("snapshot-log").elements().asScala
        .map(_.get("snapshot-id").asLong()).toSeq == ids,
        "snapshot-log entries must all resolve after expiry")
      assert(!Files.exists(droppedMl),
        "expired snapshot's manifest-list file reclaimed")
    } finally cat.dropNamespace(ns)
  }

  test("expiry GC reclaims CAS-loser manifest-list residue but never a " +
    "kept or higher-sequence file") {
    val cat = DirectoryLakeCatalog.temp(spark)
    val ns = s"icegc_${System.nanoTime()}"
    try {
      mkTable(cat, ns) // snapshots 1, 2
      val md = cat.root.resolve(ns).resolve("t").resolve("metadata")
      // a CAS loser's first attempt: a manifest-list at sequence 1 that no
      // committed snapshot references
      val loser = md.resolve("manifest-list-1-deadbeef-loser.json")
      Files.writeString(loser, "[]")
      // an in-flight writer's file ABOVE every committed sequence — GC
      // must leave it alone even though nothing references it yet
      val inflight = md.resolve("manifest-list-3-cafe-inflight.json")
      Files.writeString(inflight, "[]")
      cat.expireSnapshots(ns, "t", keepLast = 1) // drops snapshot 1
      assert(!Files.exists(loser), "loser residue at seq<=dropped reclaimed")
      assert(Files.exists(inflight), "uncommitted higher-seq file untouched")
      val keptMl = Paths.get(rawMeta(cat, ns, "t").get("snapshots").get(0)
        .get("manifest-list").asText())
      assert(Files.exists(keptMl), "kept snapshot's manifest-list survives")
    } finally cat.dropNamespace(ns)
  }

  test("a pre-v2 metadata document (single schema node, partition-spec " +
    "strings) migrates on read: load, append, evolve, expire all work and " +
    "the next commit persists the v2 layout") {
    import spark.implicits._
    val cat = DirectoryLakeCatalog.temp(spark)
    val ns = s"icemig_${System.nanoTime()}"
    try {
      // materialize a real data snapshot, then hand-write the LEGACY
      // metadata document around it (the exact pre-round-9 layout)
      val tdir = cat.root.resolve(ns).resolve("t")
      val dataDir = tdir.resolve("data").resolve("snap-legacy")
      Seq((1L, "a"), (2L, "b")).toDF("id", "name")
        .write.parquet(dataDir.toString)
      val schemaJson = Seq((1L, "a")).toDF("id", "name").schema.json
      val legacy = s"""{
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-000000000001",
        "schema": {"type": "struct", "fields": [
          {"id": 1, "name": "id", "required": false, "type": "bigint"},
          {"id": 2, "name": "name", "required": false, "type": "string"}],
          "spark-schema": ${new ObjectMapper().writeValueAsString(schemaJson)}},
        "partition-spec": [],
        "bucket-spec": null,
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1, "operation": "append",
          "live": ["snap-legacy"]}],
        "last-updated-ms": 0}"""
      val md = tdir.resolve("metadata")
      Files.createDirectories(md)
      Files.writeString(md.resolve("v1.metadata.json"), legacy)
      Files.writeString(md.resolve("version-hint.text"), "1")
      // read paths migrate in memory
      assert(cat.tableExists(ns, "t"))
      assert(cat.load(ns, "t").count() == 2)
      assert(cat.snapshotIds(ns, "t") == Seq(1L))
      assert(cat.loadAt(ns, "t", 1L).count() == 2)
      // a write commit persists the migrated v2 layout
      cat.append(ns, "t", Seq((3L, "c")).toDF("id", "name"))
      assert(cat.load(ns, "t").count() == 3)
      val m = rawMeta(cat, ns, "t")
      Seq("schemas", "current-schema-id", "partition-specs",
        "last-sequence-number", "snapshot-log", "metadata-log")
        .foreach(f => assert(m.has(f), s"migrated doc missing $f"))
      assert(!m.has("schema") && !m.has("partition-spec"),
        "legacy field names removed by migration")
      assert(m.get("last-sequence-number").asLong() == 2L)
      assert(m.get("current-snapshot-id").asLong() == 2L)
      // evolution + expiry over the migrated document
      cat.ensureTable(ns, "t", org.apache.spark.sql.types.StructType(
        Seq((1L, "a", 0.0)).toDF("id", "name", "score").schema.fields))
      assert(cat.load(ns, "t").columns.toSeq ==
        Seq("id", "name", "score"))
      cat.expireSnapshots(ns, "t", keepLast = 1)
      assert(cat.snapshotIds(ns, "t") == Seq(2L))
      assert(cat.load(ns, "t").count() == 3)
    } finally cat.dropNamespace(ns)
  }

  test("a partition column that is not a valid Avro identifier " +
    "(hyphen, leading digit) still commits: the manifest sanitizes the " +
    "Avro field name and keeps the real name in a prop") {
    // Avro names must match [A-Za-z_][A-Za-z0-9_]* — embedding a source
    // column name verbatim made Schema.Parser throw at manifest-write
    // time, failing EVERY commit on such a table (ADVICE r10)
    import spark.implicits._
    val cat = DirectoryLakeCatalog.temp(spark)
    val ns = s"iceav_${System.nanoTime()}"
    try {
      val df = Seq((1L, "x", "a"), (2L, "y", "b"), (3L, "z", "a"))
        .toDF("id", "v", "lang-code")
      cat.ensureTable(ns, "p", df.schema, Seq("lang-code"))
      cat.append(ns, "p", df) // threw before the fix
      // round-trip: partition values recover through the sanitized field
      assert(cat.load(ns, "p").select("lang-code").collect()
        .map(_.getString(0)).sorted.toSeq == Seq("a", "a", "b"))
      // external Avro view: sanitized name on the record field, the real
      // name in its real-name prop
      val m = rawMeta(cat, ns, "p")
      val mle = readAvro(Paths.get(
        m.get("snapshots").get(0).get("manifest-list").asText()))._2
      val entrySchema = readAvro(
        Paths.get(mle.head.get("manifest_path").toString))._1
      val r102 = entrySchema.getField("data_file").schema()
        .getField("partition").schema()
      val pf = r102.getFields.asScala.head
      assert(pf.name() == "_gp0", s"sanitized positional name: ${pf.name()}")
      assert(pf.getProp("real-name") == "lang-code")
      // loadSlice's bound check keys on the REAL name — pruning intact
      assert(cat.loadSlice(ns, "p", "lang-code", "a", "a").count() == 2L)
    } finally cat.dropNamespace(ns)
  }

  test("data_file entries carry column_sizes, exact nan_value_counts, " +
    "and decimal/binary Appendix-D bounds — an external reader decodes " +
    "all of them (the round-10 divergence list, closed)") {
    import spark.implicits._
    val cat = DirectoryLakeCatalog.temp(spark)
    val ns = s"icest2_${System.nanoTime()}"
    try {
      // one double column with a KNOWN NaN census (2 NaNs, 1 null), a
      // decimal with negatives (two's-complement bound ordering), binary
      val df = Seq(
        (1L, Some(Double.NaN), BigDecimal("-12.34"), Array[Byte](9, 9)),
        (2L, Some(1.5),        BigDecimal("-0.01"),  Array[Byte](1, 2)),
        (3L, Some(Double.NaN), BigDecimal("7.50"),   Array[Byte](0)),
        (4L, None: Option[Double], BigDecimal("99.99"), Array[Byte](5)))
        .toDF("id", "score", "price", "blob")
        .select($"id", $"score",
          $"price".cast("decimal(10,2)").as("price"), $"blob")
      cat.ensureTable(ns, "t", df.schema)
      cat.append(ns, "t", df.coalesce(1))
      val m = rawMeta(cat, ns, "t")
      val snap = m.get("snapshots").get(0)
      val files = readAvro(Paths.get(snap.get("manifest-list").asText()))._2
        .flatMap(mle => readAvro(
          Paths.get(mle.get("manifest_path").toString))._2)
        .map(_.get("data_file")
          .asInstanceOf[org.apache.avro.generic.GenericRecord])
      assert(files.size == 1)
      val f = files.head
      def kvMap(field: String): Map[Int, AnyRef] =
        Option(f.get(field)).map(_.asInstanceOf[java.util.List[
            org.apache.avro.generic.GenericRecord]].asScala
          .map(kv => kv.get("key").asInstanceOf[Int] -> kv.get("value"))
          .toMap).getOrElse(Map.empty)
      def bytesOf(field: String, id: Int): Array[Byte] = {
        val buf = kvMap(field)(id)
          .asInstanceOf[java.nio.ByteBuffer].duplicate()
        val a = new Array[Byte](buf.remaining()); buf.get(a); a
      }
      // nan_value_counts (spec id 137): exact — 2 NaNs in score (id 2);
      // the null row is NOT a NaN
      assert(kvMap("nan_value_counts") == Map(2 -> 2L),
        s"exact NaN census: ${kvMap("nan_value_counts")}")
      assert(kvMap("null_value_counts")(2) == 1L)
      // column_sizes (spec id 108): every covered column priced, positive,
      // and summing to less than the file itself
      val sizes = kvMap("column_sizes")
      assert(Set(1, 2, 3, 4).subsetOf(sizes.keySet), s"sizes: $sizes")
      assert(sizes.values.forall(_.asInstanceOf[Long] > 0L))
      assert(sizes.values.map(_.asInstanceOf[Long]).sum <=
        f.get("file_size_in_bytes").asInstanceOf[Long])
      // decimal bounds (id 3): minimal two's-complement big-endian
      // unscaled — the fold must order NEGATIVES below positives
      assert(new java.math.BigInteger(bytesOf("lower_bounds", 3))
        .longValueExact() == -1234L)
      assert(new java.math.BigInteger(bytesOf("upper_bounds", 3))
        .longValueExact() == 9999L)
      // binary bounds (id 4): raw bytes, unsigned order
      assert(bytesOf("lower_bounds", 4).toSeq == Seq[Byte](0))
      assert(bytesOf("upper_bounds", 4).toSeq == Seq[Byte](9, 9))
      // and the stats tier actually SKIPS on the decimal column: a slice
      // below every stored price reads zero rows without error
      assert(cat.loadSlice(ns, "t", "price", "-100.00", "-50.00")
        .isEmpty)
      assert(cat.loadSlice(ns, "t", "price", "-1.00", "8.00")
        .collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    } finally cat.dropNamespace(ns)
  }

  test("AvroManifests round-trips sanitized partition field names: " +
    "tuples keyed by the real names, collisions disambiguated") {
    val tmp = Files.createTempDirectory("graft-avro-name-")
    val pfs = Seq(
      AvroManifests.PartitionField("2lead", Some("long")),
      AvroManifests.PartitionField("ok_name", Some("string")),
      AvroManifests.PartitionField("weird-col", Some("string")))
    val entries = Seq(AvroManifests.DataFileEntry(
      status = 1, content = 0, filePath = "/x/f.parquet",
      fileFormat = "PARQUET",
      partition = Seq("2lead" -> Some("7"), "ok_name" -> Some("v"),
        "weird-col" -> Some("w")),
      recordCount = 3L, fileSizeInBytes = 10L))
    val p = tmp.resolve("m.avro")
    AvroManifests.writeManifest(p, entries, pfs)
    val back = AvroManifests.readManifest(p)
    assert(back.head.partition == Seq("2lead" -> Some("7"),
      "ok_name" -> Some("v"), "weird-col" -> Some("w")),
      s"real-name round-trip: ${back.head.partition}")
  }
}
