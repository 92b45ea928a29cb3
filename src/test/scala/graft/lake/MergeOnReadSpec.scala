package graft.lake

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Merge-on-read row deletes (VERDICT r9 #3): position/equality delete
  * FILES beside the copy-on-write path, reader-side application as
  * anti-joins with the spec's sequence-number scoping, compaction folding
  * the debt away. The core contract is EQUIVALENCE: on the same data and
  * predicates, a merge-on-read delete must read back identically to the
  * copy-on-write delete — including under concurrency conflicts. */
class MergeOnReadSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val restServer = RestCatalogStub.start()

  private case class Impl(name: String, make: () => SnapshotLakeCatalog)
  private val impls = Seq(
    Impl("directory", () => DirectoryLakeCatalog.temp(spark)),
    Impl("rest", () => new RestLakeCatalog(spark, restServer.uri,
      Files.createTempDirectory("graft-rest-mor-"))))

  private def freshNs(): String = s"mor_${System.nanoTime()}"

  private def seed(cat: SnapshotLakeCatalog, ns: String): Unit = {
    val a = Seq((1L, "x", "de"), (2L, "y", "en"), (3L, "z", "de"))
      .toDF("id", "v", "lang")
    cat.ensureTable(ns, "t", a.schema)
    cat.append(ns, "t", a)
    cat.append(ns, "t",
      Seq((4L, "w", "fr"), (5L, "q", "de")).toDF("id", "v", "lang"))
  }

  private def ids(cat: SnapshotLakeCatalog, ns: String): Seq[Long] =
    cat.load(ns, "t").collect().map(_.getLong(0)).sorted.toSeq

  for (impl <- impls) {
    test(s"[${impl.name}] refs + write-audit-publish round-trip the " +
      "carrier: tag survives expiry, staged branch publishes atomically") {
      // the refs map and branch-tip commits live in the shared
      // SnapshotLakeCatalog core, but THIS test proves they survive each
      // carrier's metadata round-trip (the REST row = real HTTP + the
      // server-side CAS + Jackson canonicalization on recovery paths)
      val cat = impl.make(); val ns = freshNs()
      seed(cat, ns) // snapshots 1, 2
      cat.tag(ns, "t", "audited", 1L)
      cat.stageAppend(ns, "t", "wap",
        Seq((9L, "r", "en")).toDF("id", "v", "lang"))
      assert(cat.load(ns, "t").count() == 5L, "staging must be invisible")
      assert(cat.loadRef(ns, "t", "wap").count() == 6L)
      cat.expireSnapshots(ns, "t", keepLast = 1)
      assert(cat.loadRef(ns, "t", "audited").count() == 3L,
        "the tagged snapshot must survive expiry through this carrier")
      cat.fastForward(ns, "t", "wap")
      assert(cat.load(ns, "t").count() == 6L)
      assert(cat.listRefs(ns, "t")("main")._2 ==
        cat.listRefs(ns, "t")("wap")._2)
      cat.dropNamespace(ns)
    }

    test(s"[${impl.name}] deleteWhereMOR reads back identically to " +
      "copy-on-write deleteWhere, without rewriting any data dir") {
      // separate namespaces: the rest impls share one stub server, so a
      // shared ns would interleave two warehouses' directory names
      val morCat = impl.make(); val cowCat = impl.make()
      val ns = freshNs(); val cowNs = freshNs()
      seed(morCat, ns); seed(cowCat, cowNs)
      val liveBefore = morCat.storageAudit(ns, "t").collect()(0)
      assert(morCat.deleteWhereMOR(ns, "t", col("lang") === "de") == 3L)
      assert(cowCat.deleteWhere(cowNs, "t", col("lang") === "de") == 3L)
      assert(ids(morCat, ns) == Seq(2L, 4L) && ids(cowCat, cowNs) ==
        Seq(2L, 4L), "MOR and COW must read back identically")
      // MOR rewrote nothing: current bytes only GREW (delete file added),
      // and both original data dirs still serve the current snapshot
      val after = morCat.storageAudit(ns, "t").collect()(0)
      assert(after.getAs[Long]("current_bytes") >
        liveBefore.getAs[Long]("current_bytes"),
        "position delete adds a delete file, rewrites no data")
      // deleting nothing publishes nothing (both faces)
      val snaps = morCat.snapshotIds(ns, "t")
      assert(morCat.deleteWhereMOR(ns, "t", col("lang") === "zz") == 0L)
      assert(morCat.snapshotIds(ns, "t") == snaps)
      // NULL-predicate rows are kept: v = "x" deleted already; a predicate
      // NULL on every row matches nothing
      assert(morCat.deleteWhereMOR(ns, "t",
        (col("v") === "nope") && (org.apache.spark.sql.functions
          .lit(null).cast("boolean"))) == 0L)
      morCat.dropNamespace(ns); cowCat.dropNamespace(cowNs)
    }

    test(s"[${impl.name}] purgeKeysMOR matches purgeKeys; a re-appended " +
      "key SURVIVES the older equality delete (sequence scoping)") {
      val morCat = impl.make(); val cowCat = impl.make()
      val ns = freshNs(); val cowNs = freshNs()
      seed(morCat, ns); seed(cowCat, cowNs)
      val keys = Seq(2L, 5L, 99L).toDF("id")
      assert(morCat.purgeKeysMOR(ns, "t", "id", keys) == 2L)
      assert(cowCat.purgeKeys(cowNs, "t", "id", keys) == 2L)
      assert(ids(morCat, ns) == ids(cowCat, cowNs))
      // replay: nothing left to purge, no snapshot published
      val snaps = morCat.snapshotIds(ns, "t")
      assert(morCat.purgeKeysMOR(ns, "t", "id", keys) == 0L)
      assert(morCat.snapshotIds(ns, "t") == snaps)
      // the spec's sequence rule: data appended AFTER the equality delete
      // has a higher sequence, so the purge must NOT mask it
      morCat.append(ns, "t", Seq((2L, "back", "en")).toDF("id", "v", "lang"))
      assert(ids(morCat, ns) == Seq(1L, 2L, 3L, 4L),
        "re-appended key must survive the older purge")
      morCat.dropNamespace(ns); cowCat.dropNamespace(cowNs)
    }

    test(s"[${impl.name}] position and equality deletes stack; time " +
      "travel and rollback see pre-delete state") {
      val cat = impl.make(); val ns = freshNs()
      seed(cat, ns)
      val preDelete = cat.snapshotIds(ns, "t").last
      assert(cat.deleteWhereMOR(ns, "t", col("lang") === "fr") == 1L)
      assert(cat.purgeKeysMOR(ns, "t", "id", Seq(1L).toDF("id")) == 1L)
      assert(ids(cat, ns) == Seq(2L, 3L, 5L))
      // time travel BEFORE the deletes reads the unmasked rows
      assert(cat.loadAt(ns, "t", preDelete).collect().length == 5)
      // rollback restores the pre-delete state as a NEW commit
      cat.rollbackTo(ns, "t", preDelete)
      assert(ids(cat, ns) == Seq(1L, 2L, 3L, 4L, 5L))
      cat.dropNamespace(ns)
    }

    test(s"[${impl.name}] copy-on-write delete over a MOR-deleted table " +
      "does not resurrect masked rows") {
      val cat = impl.make(); val ns = freshNs()
      seed(cat, ns)
      assert(cat.deleteWhereMOR(ns, "t", col("id") === 3L) == 1L)
      // the COW rewrite reads deletes-applied, so id=3 must stay gone even
      // though its dir gets rewritten
      assert(cat.deleteWhere(ns, "t", col("id") === 1L) == 1L)
      assert(ids(cat, ns) == Seq(2L, 4L, 5L))
      cat.dropNamespace(ns)
    }

    test(s"[${impl.name}] compact folds delete files away: rows unchanged, " +
      "delete dirs become expirable debt") {
      val cat = impl.make(); val ns = freshNs()
      seed(cat, ns)
      assert(cat.deleteWhereMOR(ns, "t", col("lang") === "de") == 3L)
      assert(cat.purgeKeysMOR(ns, "t", "id", Seq(4L).toDF("id")) == 1L)
      cat.compact(ns, "t", targetFiles = 1)
      assert(ids(cat, ns) == Seq(2L))
      // the compacted snapshot carries no delete files: reclaim everything
      // older and re-read
      cat.expireSnapshots(ns, "t", keepLast = 1)
      assert(ids(cat, ns) == Seq(2L))
      val audit = cat.storageAudit(ns, "t").collect()(0)
      assert(audit.getAs[Long]("n_orphan_dirs") == 0L,
        "expiry reclaimed the delete dirs (referenced-dir GC includes them)")
      cat.dropNamespace(ns)
    }
  }

  test("[directory] rollback across an intervening rewrite restores " +
    "equality-delete masking (restored dirs keep their original " +
    "sequence numbers)") {
    val cat = DirectoryLakeCatalog.temp(spark)
    val ns = freshNs()
    seed(cat, ns) // dirs A (seq 1), B (seq 2)
    assert(cat.purgeKeysMOR(ns, "t", "id", Seq(2L).toDF("id")) == 1L)
    val purgeSnap = cat.snapshotIds(ns, "t").last // seq 3
    assert(ids(cat, ns) == Seq(1L, 3L, 4L, 5L))
    // an intervening rewrite supersedes everything...
    cat.overwrite(ns, "t",
      Seq((99L, "z", "en")).toDF("id", "v", "lang")) // seq 4
    assert(ids(cat, ns) == Seq(99L))
    // ...and the rollback must restore the PURGED state: if the restored
    // data dirs were re-stamped with the new commit's sequence, they
    // would postdate the restored equality delete and key 2 would
    // silently resurrect
    cat.rollbackTo(ns, "t", purgeSnap)
    assert(ids(cat, ns) == Seq(1L, 3L, 4L, 5L),
      "rollback resurrected an equality-purged key")
    assert(cat.loadAt(ns, "t", purgeSnap).collect().map(_.getLong(0))
      .sorted.toSeq == Seq(1L, 3L, 4L, 5L))
    cat.dropNamespace(ns)
  }

  test("[directory] upsertMOR race on an OVERLAPPING new key: a racing " +
    "append landing rows for a key the batch inserts as new conflicts " +
    "loudly (the delete file never named it), cleans up, retry lands; " +
    "a DISJOINT-key race rebases cleanly") {
    val ns = freshNs()
    var inject: Option[() => Unit] = None
    val cat = new DirectoryLakeCatalog(spark,
        Files.createTempDirectory("graft-upsert-race-")) {
      override protected def beforeUpsertCommit(n: String, t: String): Unit = {
        val f = inject; inject = None; f.foreach(_.apply())
      }
    }
    seed(cat, ns) // ids 1..5
    // overlapping race: batch upserts {2 -> existing, 99 -> NEW}; the
    // racer appends its own id=99 row between presence scan and commit.
    // A blind rebase would leave BOTH 99-rows live (the equality mask
    // only names key 2) — the validation must refuse instead.
    inject = Some(() => cat.append(ns, "t",
      Seq((99L, "racer", "en")).toDF("id", "v", "lang")))
    intercept[java.util.ConcurrentModificationException](
      cat.upsertMOR(ns, "t", Seq("id"),
        Seq((2L, "upd", "en"), (99L, "new", "fr")).toDF("id", "v", "lang")))
    assert(cat.storageAudit(ns, "t").collect()(0)
      .getAs[Long]("n_orphan_dirs") == 0L,
      "aborted upsert cleaned up its data and delete dirs")
    // the retry sees the racer's row as PRESENT -> masks it; exactly one
    // id=99 row survives, with the retry's value
    cat.upsertMOR(ns, "t", Seq("id"),
      Seq((2L, "upd", "en"), (99L, "new", "fr")).toDF("id", "v", "lang"))
    val after = cat.load(ns, "t").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after.size == 6 && after(99L) == "new" && after(2L) == "upd",
      s"retry must land exactly one row per key: $after")
    // disjoint race: racer appends id=50, batch upserts {3, 77} — no
    // overlap, both commits land without conflict
    inject = Some(() => cat.append(ns, "t",
      Seq((50L, "other", "de")).toDF("id", "v", "lang")))
    cat.upsertMOR(ns, "t", Seq("id"),
      Seq((3L, "upd3", "de"), (77L, "new77", "en"))
        .toDF("id", "v", "lang"))
    assert(ids(cat, ns) == Seq(1L, 2L, 3L, 4L, 5L, 50L, 77L, 99L),
      "disjoint-key race must rebase, both commits visible")
    cat.dropNamespace(ns)
  }

  test("[directory] row-level (SQL UPDATE/MERGE) commit races: a compact " +
    "between scan and commit conflicts loudly and cleans up; a racing " +
    "append rebases cleanly — both commits land") {
    val ns = freshNs()
    var inject: Option[() => Unit] = None
    val cat = new DirectoryLakeCatalog(spark,
        Files.createTempDirectory("graft-rowlevel-race-")) {
      override protected def beforeRowLevelCommit(n: String, t: String): Unit = {
        val f = inject; inject = None; f.foreach(_.apply())
      }
    }
    seed(cat, ns) // ids 1..5
    def runUpdate(): Unit = {
      val (scan, live) = cat.rowLevelScan(ns, "t")
      val (fTag, pTag) = cat.rowLevelPosCols
      val delta = scan.filter(col("id") === 2L)
        .withColumn("v", org.apache.spark.sql.functions.lit("upd"))
        .localCheckpoint(true)
      cat.commitRowLevel(ns, "t",
        delta.select(col(fTag).as("file_path"), col(pTag).as("pos")),
        delta.select("id", "v", "lang"), live)
    }
    // compact rewrites the scanned dirs: the position mask would bind to
    // vanished files — a blind commit would silently lose the update
    inject = Some(() => cat.compact(ns, "t", targetFiles = 1))
    intercept[java.util.ConcurrentModificationException](runUpdate())
    assert(cat.storageAudit(ns, "t").collect()(0)
      .getAs[Long]("n_orphan_dirs") == 0L,
      "aborted row-level commit cleaned up its data and delete dirs")
    assert(cat.load(ns, "t").filter(col("id") === 2L)
      .head().getString(1) != "upd", "nothing committed")
    // retry against the compacted snapshot lands
    runUpdate()
    assert(cat.load(ns, "t").filter(col("id") === 2L)
      .head().getString(1) == "upd")
    // racing APPEND rebases cleanly: position masks bind to files the
    // racer never touches, its new dir is never named
    inject = Some(() => cat.append(ns, "t",
      Seq((50L, "racer", "de")).toDF("id", "v", "lang")))
    val (scan2, live2) = cat.rowLevelScan(ns, "t")
    val (fTag2, pTag2) = cat.rowLevelPosCols
    val delta2 = scan2.filter(col("id") === 3L)
      .withColumn("v", org.apache.spark.sql.functions.lit("upd3"))
      .localCheckpoint(true)
    cat.commitRowLevel(ns, "t",
      delta2.select(col(fTag2).as("file_path"), col(pTag2).as("pos")),
      delta2.select("id", "v", "lang"), live2)
    val after = cat.load(ns, "t").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after(3L) == "upd3" && after(50L) == "racer" &&
      after.size == 6, s"append race must rebase, both visible: $after")
    cat.dropNamespace(ns)
  }

  test("[directory] MOR delete conflict: a concurrent compact between the " +
    "delete-file write and its commit fails loudly, cleans up, and the " +
    "retry lands") {
    val ns = freshNs()
    var fired = false
    val cat = new DirectoryLakeCatalog(spark,
        Files.createTempDirectory("graft-mor-conflict-")) {
      override protected def beforeDeleteCommit(n: String, t: String): Unit =
        if (!fired) { fired = true; compact(n, t, targetFiles = 1) }
    }
    seed(cat, ns)
    // the compact rewrites both data dirs: the delete file's positions
    // would mask the WRONG rows (or none) — a blind commit would
    // silently resurrect the deleted rows
    intercept[java.util.ConcurrentModificationException](
      cat.deleteWhereMOR(ns, "t", col("id") === 2L))
    assert(ids(cat, ns) == Seq(1L, 2L, 3L, 4L, 5L), "nothing committed")
    assert(cat.storageAudit(ns, "t").collect()(0)
      .getAs[Long]("n_orphan_dirs") == 0L,
      "aborted MOR delete cleaned up its delete dir")
    assert(cat.deleteWhereMOR(ns, "t", col("id") === 2L) == 1L)
    assert(ids(cat, ns) == Seq(1L, 3L, 4L, 5L))
    cat.dropNamespace(ns)
  }

  test("[directory] deleteDebtReport prices masking vs dangling: live " +
    "masks count as masking, a rewrite turns them dangling, compact " +
    "clears the report") {
    val cat = DirectoryLakeCatalog.temp(spark)
    val ns = freshNs()
    seed(cat, ns)
    assert(cat.deleteWhereMOR(ns, "t", col("lang") === "de") == 3L)
    assert(cat.purgeKeysMOR(ns, "t", "id", Seq(2L).toDF("id")) == 1L)
    val r1 = cat.deleteDebtReport(ns, "t").collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_rows"),
        r.getAs[Long]("n_masking"), r.getAs[Long]("n_dangling"))).toMap
    assert(r1 == Map("position" -> ((3L, 3L, 0L)),
      "equality" -> ((1L, 1L, 0L))), s"fresh masks all masking: $r1")
    // a copy-on-write delete of id=4 rewrites ONLY dir B (ids 4,5): the
    // de-mask on id 5 dangles (its file is gone — and its row with it),
    // while the de-masks on ids 1,3 still suppress live dir-A rows; the
    // equality mask on id 2 keeps masking its untouched dir-A row
    assert(cat.deleteWhere(ns, "t", col("id") === 4L) == 1L)
    val r2 = cat.deleteDebtReport(ns, "t").collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_masking"),
        r.getAs[Long]("n_dangling"))).toMap
    assert(r2 == Map("position" -> ((2L, 1L)), "equality" -> ((1L, 0L))),
      s"partial rewrite dangles only the rewritten dir's masks: $r2")
    // compact folds the debt: the report empties and the masked rows are
    // physically gone (everything here was deleted by one face or other)
    cat.compact(ns, "t", targetFiles = 1)
    assert(cat.deleteDebtReport(ns, "t").collect().isEmpty)
    assert(ids(cat, ns) == Seq.empty)
    cat.dropNamespace(ns)
  }

  test("[directory] delete manifests are spec-shaped: content=1 list " +
    "entries, position/equality data_file content codes, equality_ids") {
    val ns = freshNs()
    val cat = DirectoryLakeCatalog.temp(spark)
    seed(cat, ns)
    assert(cat.deleteWhereMOR(ns, "t", col("id") === 1L) == 1L)
    assert(cat.purgeKeysMOR(ns, "t", "id", Seq(3L).toDF("id")) == 1L)
    val md = cat.root.resolve(ns).resolve("t").resolve("metadata")
    val versions = scala.util.Using.resource(Files.list(md))(
      _.iterator().asScala.map(_.getFileName.toString)
        .collect { case s if s.startsWith("v") &&
          s.endsWith(".metadata.json") =>
          s.stripPrefix("v").stripSuffix(".metadata.json").toInt }.toSeq)
    val meta = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      Files.readString(md.resolve(s"v${versions.max}.metadata.json")))
    val snaps = meta.get("snapshots").elements().asScala.toSeq
    val mlPath = java.nio.file.Paths.get(
      snaps.last.get("manifest-list").asText())
    val mlEntries = AvroManifests.readManifestList(mlPath)
    val (dataE, delE) = mlEntries.partition(_.content == 0)
    assert(dataE.size == 2 && delE.size == 2,
      s"2 data + 2 delete manifests, got $mlEntries")
    val delFiles = delE.flatMap(e =>
      AvroManifests.readManifest(java.nio.file.Paths.get(e.manifestPath)))
    assert(delFiles.map(_.content).sorted == Seq(1, 2),
      "position (1) and equality (2) delete data_file content codes")
    val eq = delFiles.find(_.content == 2).get
    assert(eq.equalityIds == Seq(1),
      "equality_ids names the id column (field id 1)")
    // delete-file sequence numbers postdate every data dir they mask
    val maxDataSeq = dataE.map(_.sequenceNumber).max
    assert(delE.forall(_.sequenceNumber > maxDataSeq))
    cat.dropNamespace(ns)
  }

  test("[directory] deleteDebtReport: a row masked by BOTH a position and " +
    "an equality delete counts as masking only for the position group") {
    // The overlap is reachable as a RACE: a position delete commits
    // between an equality purge's scan and its commit (delete-file
    // commits validate the live DIR set, which a racing delete file does
    // not change — both legitimately land). The purge's file then carries
    // a key whose only matching row the position delete already
    // suppresses; counting it as equality-masking would overstate
    // n_masking and understate n_dangling (ADVICE r10).
    val ns = freshNs()
    var fired = false
    val cat = new DirectoryLakeCatalog(spark,
        Files.createTempDirectory("graft-mor-overlap-")) {
      override protected def beforeDeleteCommit(n: String, t: String): Unit =
        if (!fired) { fired = true; deleteWhereMOR(n, t, col("id") === 3L) }
    }
    val rows = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("id", "v")
    cat.ensureTable(ns, "t", rows.schema)
    cat.append(ns, "t", rows)
    // the purge scans {1,2,3,4}, writes keys {3,4}; the seam injects the
    // position delete on id=3 before the purge's commit
    assert(cat.purgeKeysMOR(ns, "t", "id",
      Seq(3L, 4L).toDF("id")) == 2L)
    assert(ids(cat, ns) == Seq(1L, 2L))
    val debt = cat.deleteDebtReport(ns, "t").collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_rows"),
        r.getAs[Long]("n_masking"), r.getAs[Long]("n_dangling"))).toMap
    assert(debt("position") == ((1L, 1L, 0L)),
      s"position mask on id=3 is live: $debt")
    // key 3's only row is position-masked — the equality mask on it is
    // redundant residue, NOT masking; key 4's row is equality-suppressed
    assert(debt("equality") == ((2L, 1L, 1L)),
      s"equality group must not count the position-masked row: $debt")
    cat.dropNamespace(ns)
  }

  test("[directory] rename guards on the snapshot carrier: retired names " +
    "never resurrect, id-carrying equality deletes survive a rename of " +
    "their key column, legacy name-bound groups still pin it") {
    val ns = freshNs()
    val cat = DirectoryLakeCatalog.temp(spark)
    seed(cat, ns)
    // an r12+ equality delete carries the key's FIELD ID: renaming the
    // key column is legal and the mask keeps applying — the key FILE's
    // old-name column aliases to the current name like any data file
    assert(cat.purgeKeysMOR(ns, "t", "id", Seq(2L).toDF("id")) == 1L)
    cat.renameColumn(ns, "t", "id", "doc_id")
    assert(cat.load(ns, "t").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L, 4L, 5L), "the purge must keep masking post-rename")
    // sequence scoping is id-based too: the purged key RE-APPENDED under
    // the new name survives the old purge
    cat.append(ns, "t", Seq((2L, "y2", "en")).toDF("doc_id", "v", "lang"))
    assert(cat.load(ns, "t").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L))
    // a LEGACY (name-bound, pre-col-ids) group still refuses the rename:
    // simulate one by stripping col-ids from the live metadata document
    assert(cat.purgeKeysMOR(ns, "t", "doc_id", Seq(4L).toDF("doc_id")) == 1L)
    val md = cat.root.resolve(ns).resolve("t").resolve("metadata")
    val vmax = scala.util.Using.resource(Files.list(md))(
      _.iterator().asScala.map(_.getFileName.toString)
        .collect { case s if s.startsWith("v") &&
          s.endsWith(".metadata.json") =>
          s.stripPrefix("v").stripSuffix(".metadata.json").toInt }.toSeq).max
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val doc = mapper.readTree(
      Files.readString(md.resolve(s"v$vmax.metadata.json")))
    doc.get("snapshots").elements().asScala.foreach { sn =>
      Option(sn.get("delete-files")).foreach(_.elements().asScala.foreach(
        d => d.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          .remove("col-ids")))
    }
    Files.writeString(md.resolve(s"v${vmax + 1}.metadata.json"),
      doc.toString)
    val e = intercept[IllegalArgumentException](
      cat.renameColumn(ns, "t", "doc_id", "docid2"))
    assert(e.getMessage.contains("LEGACY"), e.getMessage)
    // compact folds the legacy debt away; the rename then proceeds
    cat.compact(ns, "t", targetFiles = 1)
    cat.renameColumn(ns, "t", "doc_id", "docid2")
    // ...and a LATER MOR delete + read both run under the new name
    cat.append(ns, "t", Seq((9L, "r", "en")).toDF("docid2", "v", "lang"))
    assert(cat.deleteWhereMOR(ns, "t", col("docid2") === 3L) == 1L)
    assert(cat.load(ns, "t").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 5L, 9L))
    // the retired name can never come back as a NEW column: the read
    // path maps old physical columns by name history, and a live column
    // wearing a retired name would make that mapping ambiguous
    val e2 = intercept[IllegalArgumentException](cat.ensureTable(ns, "t",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.StringType)))))
    assert(e2.getMessage.contains("retired"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](
      cat.renameColumn(ns, "t", "v", "id"))
    assert(e3.getMessage.contains("retired"), e3.getMessage)
    cat.dropNamespace(ns)
  }

  test("[directory] rename composes with promotion and deletes across " +
    "generations: old narrow files under the old name read back widened " +
    "under the new name") {
    val ns = freshNs()
    val cat = DirectoryLakeCatalog.temp(spark)
    import org.apache.spark.sql.types._
    val gen1 = Seq((1, "a"), (2, "b")).toDF("n0", "v")
      .select($"n0".cast(IntegerType).as("num"), $"v")
    cat.ensureTable(ns, "t", gen1.schema)
    cat.append(ns, "t", gen1)                        // int files, name num
    cat.ensureTable(ns, "t", StructType(Seq(         // promote num -> long
      StructField("num", LongType), StructField("v", StringType))))
    cat.append(ns, "t", Seq((3L, "c")).toDF("num", "v")) // long files
    cat.renameColumn(ns, "t", "num", "id")           // rename post-promote
    cat.append(ns, "t", Seq((4L, "d")).toDF("id", "v"))  // new-name files
    // all three file generations under one read: int-as-num, long-as-num,
    // long-as-id — aligned to long-as-id
    val rows = cat.load(ns, "t").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")), rows)
    // row-level delete by the CURRENT name hits the oldest generation
    assert(cat.deleteWhere(ns, "t", col("id") === 1L) == 1L)
    assert(cat.load(ns, "t").count() == 3L)
    // time travel to the pre-rename snapshot still reads that schema's
    // CURRENT view (metadata carries one current schema; history reads
    // align to it — Iceberg semantics: schema is table-level, not
    // per-snapshot, for reads through the current metadata)
    cat.dropNamespace(ns)
  }

  test("[directory] deleteDebtReport attribution is chronological: a " +
    "position delete committed AFTER an equality purge never " +
    "reclassifies the purge's masks as dangling") {
    // The mirror image of the race above (ADVICE r11): only position
    // deletes with a LOWER sequence than the equality group pre-apply to
    // its masking count — each group is scored against the state it
    // committed into. The later position delete masks the same row too
    // (a tie in the other direction: removing either alone keeps the row
    // suppressed, so both count it).
    val ns = freshNs()
    val cat = DirectoryLakeCatalog.temp(spark)
    val rows = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("id", "v")
    cat.ensureTable(ns, "t", rows.schema)
    cat.append(ns, "t", rows)
    assert(cat.purgeKeysMOR(ns, "t", "id", Seq(3L, 4L).toDF("id")) == 2L)
    assert(cat.deleteWhereMOR(ns, "t", col("id") === 3L) == 0L,
      "row 3 is already equality-masked, so the position face sees no row")
    // force a position delete that co-masks a purge-suppressed row: MOR
    // delete id=2 AND id=3 by position against the raw files — id=3's
    // stored row still physically exists, so target id 2 only (visible)
    // plus verify the report; then delete id=2 for a clean live mask
    assert(cat.deleteWhereMOR(ns, "t", col("id") === 2L) == 1L)
    assert(ids(cat, ns) == Seq(1L))
    val debt = cat.deleteDebtReport(ns, "t").collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_rows"),
        r.getAs[Long]("n_masking"), r.getAs[Long]("n_dangling"))).toMap
    // the equality group committed FIRST: both its keys matched live
    // rows then, and no EARLIER position delete existed — fully masking,
    // regardless of the later position delete on id=2
    assert(debt("equality") == ((2L, 2L, 0L)),
      s"later position deletes must not reclassify the purge: $debt")
    assert(debt("position") == ((1L, 1L, 0L)), s"live position mask: $debt")
    cat.dropNamespace(ns)
  }
}
